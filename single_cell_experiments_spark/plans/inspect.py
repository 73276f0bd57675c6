"""Physical-plan inspection helpers — the engine's scale-posture assertions.

The reference had no planner to inspect (SURVEY.md §4.1); this engine's
contract is that Catalyst produces the *right* plan, and these helpers make
that checkable in tests rather than by eyeball:

- filters/columns must reach the parquet scan (``PushedFilters`` /
  ``ReadSchema`` — a scan reading all columns for a 2-column projection is
  a bug at 100 TB);
- small dimension joins must be ``BroadcastHashJoin`` (never shuffle the
  big fact side for a 25-row dim);
- per-group top-k must run as ``WindowGroupLimit`` (heap, not full sort);
- shuffle count is bounded per operator (every Exchange is a full
  re-materialization of the stream at scale).

``executed_plan`` triggers the query so AQE's *final* plan is inspected —
the plan that would actually run on a cluster, not the pre-adaptive guess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted explain output (pre-execution; AQE not yet final)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Execute the query and return the AQE-final physical plan string
    (the AdaptiveSparkPlan dump repeats the pre-adaptive tree under an
    '== Initial Plan ==' header — dropped, final plan only)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def scan_pushdown(df: DataFrame) -> tuple[str, str]:
    """(PushedFilters, ReadSchema) lines of the first parquet scan."""
    plan = formatted_plan(df)
    pushed, schema = "", ""
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:") and not pushed:
            pushed = line.removeprefix("PushedFilters:").strip()
        if line.startswith("ReadSchema:") and not schema:
            schema = line.removeprefix("ReadSchema:").strip()
    return pushed, schema


def count_in_plan(df: DataFrame, token: str, final: bool = True) -> int:
    plan = executed_plan(df) if final else formatted_plan(df)
    return plan.count(token)


def uses_broadcast_join(df: DataFrame) -> bool:
    return count_in_plan(df, "BroadcastHashJoin") > 0


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the final plan (broadcast exchanges
    excluded — those move only the small side)."""
    plan = executed_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "Reused" not in line
    )
