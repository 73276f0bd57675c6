"""Tie-safety certificate for tumbling_window_events' FLOOR micros path.

r8 verdict #1: the per-row DECIMAL(18,6) micros conversion carried a ~13×
per-row constant vs DuckDB at 20× scale; the FLOOR(value*1e6 + 0.5) long
path is ~2× cheaper but only HALF_UP-equivalent on a restricted domain.
This module is the machine-checked half of the proof in
``streaming/batch_equiv.py``:

1. the real ``events.value`` domain IS the non-negative 2-dp money grid
   (every SF) — the proof's precondition, guarded against fixture
   regeneration;
2. the two conversions agree on the ENTIRE representable 2-dp grid up to
   10× the observed max (exhaustive, in-engine — not sampled);
3. they genuinely diverge on raw doubles — in BOTH directions — so the
   swap must never be generalized to unproven columns.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

_DEC = "CAST(CAST(ROUND(v, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
_FLO = "CAST(FLOOR(v * 1000000.0D + 0.5D) AS BIGINT)"


@pytest.mark.parametrize("sf_dir", sorted(glob.glob("/root/testdata/sf*")))
def test_events_value_domain_is_nonneg_2dp(spark, sf_dir):
    """Precondition of the proof, checked against the actual fixtures."""
    bad = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("value < 0 OR value != round(value, 2)")
        .count()
    )
    assert bad == 0, f"{sf_dir}: events.value left the non-neg 2-dp domain"


def test_floor_equals_decimal_on_entire_2dp_grid(spark):
    """Exhaustive sweep of v = fl(k/100) for k = 0..600000 (value max is
    ~560 at sf0.1; this covers 10× that).  k/100.0 in double arithmetic
    is exactly fl(k/100) — the same bits the parquet fixtures store."""
    mism = (
        spark.range(0, 600_001)
        .select((F.col("id") / 100.0).alias("v"))
        .where(F.expr(f"{_DEC} != {_FLO}"))
        .count()
    )
    assert mism == 0


def test_floor_and_decimal_diverge_on_raw_double_tie(spark):
    """Documented counterexamples, one per direction.  534.2380615's
    shortest repr IS an exact tie (decimal HALF_UP goes up) but the ×1e6
    product lands just below the boundary (FLOOR goes down);
    458.93395449999997's repr sits below the tie (decimal goes down) but
    the product rounds up ONTO the .5 boundary (FLOOR goes up).  Proves
    the swap is unsound without the 2-dp domain proof."""
    rows = (
        spark.createDataFrame([(534.2380615,), (458.93395449999997,)], "v double")
        .select("v", F.expr(_DEC).alias("dec"), F.expr(_FLO).alias("flo"))
        .orderBy("v")
        .collect()
    )
    assert (rows[0].dec, rows[0].flo) == (458933954, 458933955)
    assert (rows[1].dec, rows[1].flo) == (534238062, 534238061)
