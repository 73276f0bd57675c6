"""Cross-engine-deterministic expression helpers.

The driver verifies each query by order-insensitive **value hashing** against
DuckDB (SURVEY.md §0.1 [V]) — so float results must be *bit-identical*, not
merely close.  Two hazards and their engine-wide mitigations:

1. **Cross-row float aggregation order.**  ``SUM(double)`` over shuffled
   partitions sums in a different order than DuckDB's scan → last-ulp drift,
   which at lineitem-money magnitudes (~1e9 at sf0.1) can flip even a
   4-decimal rounding.  Mitigation: aggregate through ``DECIMAL`` — exact,
   associative, order-insensitive — then cast the (identical) decimal back
   to double.  ``money_sum`` (2-decimal data), ``stat_sum`` (float32-ish
   data rounded to 6 decimals per row first, where double→decimal rounding
   is unambiguous in both engines).

2. **Per-row transcendentals** (ln/exp/sin): JVM vs libm can differ by one
   ulp.  Per-row results are rounded (``r6``); anything *aggregated* from
   them goes through the decimal path so a one-ulp input difference cannot
   survive into a group total.

At 100 TB you would relax decimals back to doubles + tolerance comparison;
this is a correctness-gate posture, isolated here so the swap is one-line.
Integer outputs are normalized to BIGINT on both engines, temporal outputs
to strings/epoch seconds (driver-side dtype normalization is unspecified).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money(col: Column | str) -> Column:
    """2-decimal monetary double -> exact DECIMAL(18,2)."""
    return _c(col).cast("decimal(18,2)")


def money_sum(col: Column | str, alias: str) -> Column:
    """Order-insensitive SUM for monetary columns, surfaced as double.

    DuckDB oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.
    """
    return F.sum(money(col)).cast("double").alias(alias)


def money_avg(col: Column | str, alias: str) -> Column:
    """AVG via exact decimal sum / count (identical IEEE division).

    DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/COUNT(x)``.
    """
    c = _c(col)
    return (F.sum(money(c)).cast("double") / F.count(c)).alias(alias)


def stat6(col: Column | str) -> Column:
    """float-ish value -> round 6 -> DECIMAL(18,6): deterministic row prep
    for order-insensitive statistics.  DuckDB twin:
    ``CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6))``."""
    return F.round(_c(col).cast("double"), 6).cast("decimal(18,6)")


def stat_sum(col: Column | str, alias: str) -> Column:
    """Order-insensitive sum of 6-decimal-quantized values, as double."""
    return F.sum(stat6(col)).cast("double").alias(alias)


def stat_avg(col: Column | str, alias: str) -> Column:
    c = _c(col)
    return (F.sum(stat6(c)).cast("double") / F.count(c)).alias(alias)


def big(col: Column | str, alias: str | None = None) -> Column:
    """Normalize derived integers (size(), row_number(), ...) to BIGINT."""
    out = _c(col).cast("bigint")
    return out.alias(alias) if alias else out


def r6(col: Column | str, alias: str | None = None) -> Column:
    """Round per-row float math to 6 decimals (transcendental insurance)."""
    out = F.round(_c(col).cast("double"), 6)
    return out.alias(alias) if alias else out


def r4(col: Column | str, alias: str | None = None) -> Column:
    out = F.round(_c(col).cast("double"), 4)
    return out.alias(alias) if alias else out


def day_str(ts_col: Column | str, alias: str | None = None) -> Column:
    """TIMESTAMP_NTZ -> 'yyyy-MM-dd' string (timezone-free; DuckDB twin:
    ``strftime(x, '%Y-%m-%d')``)."""
    out = F.date_format(_c(ts_col), "yyyy-MM-dd")
    return out.alias(alias) if alias else out


# --- DuckDB-side SQL fragment builders (keep the two dialects adjacent) ---

def dd_money_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def dd_money_avg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)/COUNT({expr}) AS {alias}"


def dd_stat6(expr: str) -> str:
    return f"CAST(round(CAST({expr} AS DOUBLE), 6) AS DECIMAL(18,6))"


def dd_stat_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM({dd_stat6(expr)}) AS DOUBLE) AS {alias}"


def dd_stat_avg(expr: str, alias: str) -> str:
    return f"CAST(SUM({dd_stat6(expr)}) AS DOUBLE)/COUNT({expr}) AS {alias}"
