"""As-of join: nearest-earlier event matching by key + time.

Spark has no native batch as-of join (SURVEY.md §2.B "Joins — as-of"); the
engine expresses it as a composite: union both sides with a marker, one
window pass per key ordered by time carrying the last-seen left-side value
(``last(..., ignoreNulls=True)``).  This shape shuffles each input exactly
once on the key — the same cost as the equi-join it replaces — so it holds
at 100 TB, unlike a range-join rewrite (quadratic per key) or per-group
``pd.merge_asof`` (Python boundary; kept as the documented fallback for
semantics DataFrame ops can't express).

Oracle: DuckDB's native ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_ASOF_ORACLE = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       s.signup_ts_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN
     (SELECT user_id, ts, epoch_us(ts) AS signup_ts_us
      FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


@query("join_asof_purchase_signup", oracle=_ASOF_ORACLE, tags=("relational", "join", "asof"))
def join_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the latest signup of the same user at or before it.

    Union-and-carry as-of join: tag signups 1 / purchases 0, sort within
    user by (time, signup-first) so an equal-timestamp signup is visible to
    the purchase (inclusive as-of, matching DuckDB ``>=`` semantics), and
    carry the last signup time forward.
    """
    e = load_table(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup").select(
        "user_id", "ts_us", F.lit(1).alias("is_signup"), F.lit(None).cast("bigint").alias("event_id")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", F.lit(0).alias("is_signup"), "event_id"
    )
    unioned = signups.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.desc("is_signup"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn(
        "signup_ts_us",
        F.last(F.when(F.col("is_signup") == 1, F.col("ts_us")), ignorenulls=True).over(w),
    )
    return carried.where(F.col("is_signup") == 0).select(
        "event_id", "user_id", F.col("ts_us").alias("purchase_ts_us"), "signup_ts_us"
    )
