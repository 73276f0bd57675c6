"""Streaming semantics on ``events``, expressed as batch queries with exact
DuckDB oracles (north-star block; the reference has no streaming at all —
SURVEY.md §2.B "Streaming").

Each query is the batch-equivalent of a Structured Streaming job (the live
``readStream`` twins are in ``streaming/jobs.py`` and are asserted equal to
these in tests/test_streaming.py):

- ``tumbling_window_events``  : 1h tumbling counts (bench headliner)
- ``sliding_window_events``   : 1h windows sliding every 15min
- ``session_window_events``   : per-user 30-min-gap sessionization
- ``watermark_late_drop``     : 10-min watermark late-arrival drop
- ``stateful_dedup_events``   : first-event-wins keyed dedup
- ``stream_static_enrich``    : static-dimension broadcast enrichment

Time handling: ``events.ts`` is parquet TIMESTAMP(NANOS) — the catalog shim
exposes integer ``ts_s``/``ts_us`` (catalog.py), and window starts are
emitted as epoch seconds (BIGINT) so no engine's timezone/precision
rendering can touch the hash.  Spark groups with the native ``window()`` /
``session_window()`` operators over a seconds-truncated NTZ timestamp; the
oracle reproduces their arithmetic (windows are epoch-aligned; session
merging is inclusive: an event exactly ``gap`` after the previous one still
extends the session — verified empirically, events at t=0 and t=1800 with a
1800s gap produce ONE session [0, 3600)).

Scale: tumbling/sliding aggregation is keyed on (window, …) with native
partial aggregation; sessionization shuffles once on user_id.  The
watermark emulation uses a global arrival-order running max — that is the
*definition* of the watermark, which streaming maintains O(1) in the
engine; the batch twin exists for the oracle, not the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table, table_view
from ..functions.compat import big
from ..registry import query

SESSION_GAP_S = 1800
WATERMARK_DELAY_S = 600

_DD_TS = "epoch_us(ts) // 1000000"
_DD_VAL6 = "CAST(round(value, 6) AS DECIMAL(18,6))"


def _win_start_s(win_col: str = "win") -> F.Column:
    # NTZ -> TIMESTAMP is a UTC reinterpretation (session tz pinned by tune()).
    return F.unix_timestamp(F.col(f"{win_col}.start").cast("timestamp")).cast("bigint")


def _events_secs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a seconds-truncated NTZ event-time column (so Spark's
    window operators and the seconds-based oracle see identical times)."""
    e = load_table(spark, sf_dir, "events")
    return e.withColumn("t", F.to_timestamp_ntz(F.timestamp_seconds(F.col("ts_s"))))


# --- tumbling (bench headliner) ----------------------------------------------

_TUMBLING_ORACLE = f"""
SELECT ({_DD_TS}) // 3600 * 3600 AS w_start_s,
       COUNT(*) AS c,
       round(CAST(SUM({_DD_VAL6}) AS DOUBLE) / COUNT(*), 6) AS av
FROM events
GROUP BY 1
"""


@query("tumbling_window_events", oracle=_TUMBLING_ORACLE, tags=("streaming", "headline"))
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts + mean value (BASELINE.md headliner).

    The window key is the epoch-aligned integer bucket ``ts_s div 3600`` —
    by definition identical to the ``start`` of Spark's native tumbling
    ``window()`` for an epoch-aligned 1-hour width (the ``readStream`` twin
    in streaming/jobs.py uses the native operator; tests assert the two
    produce equal rows).  Integer bucketing keeps the whole scan stage in
    long arithmetic: the r6 plan's per-row window-struct construction +
    DECIMAL(18,6) sum (a BigDecimal-backed buffer — precision 28 after sum
    promotion) cost ~100 ms of the 245 ms fresh time at sf0.1.  The value
    sum aggregates exact integer MICROS; sums ≤ 2^53 keep the final double
    division correctly rounded — bit-equal to the decimal-path result the
    oracle computes.

    Tie-safety of the FLOOR micros path (r8 verdict #1).  The per-row
    conversion is ``CAST(FLOOR(value*1e6 + 0.5) AS BIGINT)`` — pure long/
    double arithmetic, no BigDecimal per row (the r8 path went through
    DECIMAL(18,6) and carried a ~13× per-row constant vs DuckDB at 20×
    scale, SCALE.md §5).  This equals the decimal HALF_UP conversion
    ``CAST(CAST(ROUND(value,6) AS DECIMAL(18,6))*1e6 AS BIGINT)`` on the
    ACTUAL events.value domain, which is the non-negative 2-dp money grid:
    ``value == round(value, 2)`` and ``value >= 0`` hold for every row at
    every SF (asserted against real data in tests/test_micros_tie_safety
    .py).  Proof, for v = fl(k/100), 0 ≤ k ≤ ~10^9: (a) decimal path —
    BigDecimal.valueOf(v) is v's shortest decimal repr, which round-trips
    to exactly "k/100" (≤ 9 sig digits); ROUND(·,6) and the DECIMAL(18,6)
    cast are then exact (scale 2 ≤ 6), yielding exactly k·10⁴.  (b) float
    path — |v − k/100| ≤ ½·ulp ≤ 4e-14 for v ≤ 600, so after the ×1e6
    multiply and +0.5 add (two roundings ≤ 2⁻⁵³·6e8 each) the argument of
    FLOOR lies within 3e-7 of k·10⁴ + 0.5, and FLOOR of anything in
    (k·10⁴, k·10⁴+1) is k·10⁴.  Non-negativity makes FLOOR(x+0.5) the
    same away-from-zero direction as decimal HALF_UP.  ∎  This is NOT a
    general swap: for raw doubles the two diverge in BOTH directions,
    because the decimal path rounds the SHORTEST DECIMAL REPR while the
    float path rounds the ×1e6 product.  Verified in-engine:
    v = 534.2380615 (shortest repr an exact tie → decimal 534238062, but
    fl(v·1e6) = 534238061.49999994 → floor 534238061) and
    v = 458.93395449999997 (repr below the tie → decimal 458933954, but
    the product rounds up onto the .5 boundary → floor 458933955) — both
    pinned by tests/test_micros_tie_safety.py.  Columns not proven ≤2-dp
    keep the decimal path.
    """
    e = table_view(spark, sf_dir, "events")
    # spark.sql form for driver-latency (catalog.table_view).  FLOOR
    # micros path — provably equal to the oracle's DECIMAL(18,6) HALF_UP
    # conversion on the 2-dp non-negative events.value domain (docstring
    # proof); the agg buffer and the per-row conversion are both longs.
    # Size-gated single-task fusion (r11): below the catalog gate the
    # inner COALESCE(1) collapses scan + both agg phases into one stage
    # (no exchange); above it the block is a no-op string and the
    # parallel two-stage plan stands.  See catalog.FUSE_SINGLE_TASK_MAX_BYTES.
    from ..catalog import fuse1_hint

    return spark.sql(f"""
        SELECT ts_s div 3600 * 3600 AS w_start_s,
               COUNT(1) AS c,
               ROUND(CAST(SUM(CAST(FLOOR(value * 1000000.0D + 0.5D) AS BIGINT)) AS DOUBLE)
                     / 1000000.0D / COUNT(1), 6) AS av
        FROM (SELECT {fuse1_hint(sf_dir, "events")}ts_s, value FROM {e})
        GROUP BY ts_s div 3600
    """)


# --- sliding -----------------------------------------------------------------

_SLIDING_ORACLE = f"""
SELECT (({_DD_TS}) // 900 - k) * 900 AS w_start_s,
       COUNT(*) AS c,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
FROM events, (SELECT unnest(range(0, 4)) AS k)
GROUP BY 1
"""


@query("sliding_window_events", oracle=_SLIDING_ORACLE, tags=("streaming", "sliding"))
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event lands in 4
    epoch-aligned windows — the oracle materializes that membership with a
    0..3 offset cross join; Spark uses the native sliding ``window()``)."""
    e = _events_secs(spark, sf_dir)
    return (
        e.groupBy(F.window("t", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("purchases"),
        )
        .select(_win_start_s().alias("w_start_s"), "c", "purchases")
    )


# --- session windows ---------------------------------------------------------

_SESSION_ORACLE = f"""
WITH e AS (SELECT user_id, {_DD_TS} AS ts_s, value FROM events),
marked AS (
  SELECT user_id, ts_s, value,
         CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s)
                   > {SESSION_GAP_S}
              OR lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
numbered AS (
  SELECT user_id, ts_s, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_s
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(ts_s) AS session_start_s,
       MAX(ts_s) + {SESSION_GAP_S} AS session_end_s,
       COUNT(*) AS n_events,
       CAST(SUM({_DD_VAL6}) AS DOUBLE) AS v_sum
FROM numbered
GROUP BY user_id, sid
"""


@query("session_window_events", oracle=_SESSION_ORACLE, tags=("streaming", "session"))
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessionization via the native
    ``session_window()`` operator; the oracle is the classic gap-island
    rewrite (lag → new-session marker → running sum → group).

    Spark's session end is last-event + gap (exclusive), reproduced as
    ``MAX(ts_s) + gap``; one shuffle keyed on user_id either way.
    """
    e = _events_secs(spark, sf_dir)
    return (
        e.groupBy("user_id", F.session_window("t", f"{SESSION_GAP_S} seconds").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double").alias("v_sum"),
        )
        .select(
            "user_id",
            _win_start_s().alias("session_start_s"),
            F.unix_timestamp(F.col("win.end").cast("timestamp")).cast("bigint").alias("session_end_s"),
            "n_events",
            "v_sum",
        )
    )


# --- watermark late-data drop ------------------------------------------------

_WATERMARK_ORACLE = f"""
WITH arr AS (
  SELECT event_type, {_DD_TS} AS ts_s,
         MAX({_DD_TS}) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING)
           - {WATERMARK_DELAY_S} AS wm
  FROM events
)
SELECT ts_s // 3600 * 3600 AS w_start_s, event_type,
       COUNT(*) AS n_kept
FROM arr
WHERE ts_s >= wm
GROUP BY 1, 2
"""


_WM_BLOCK = 4096  # arrival-order rows per prefix-scan block


@query("watermark_late_drop", oracle=_WATERMARK_ORACLE, tags=("streaming", "watermark"))
def watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch emulation of a 10-minute watermark: an event is late (dropped)
    if its event time is older than the running max event time over arrival
    order (event_id) minus the delay; survivors aggregate into 1h tumbling
    counts per type.  (The live job in streaming/jobs.py tracks the
    watermark O(1); this twin gives the oracle exact late-drop semantics.)

    The global running max is computed as a two-level parallel prefix scan
    — the standard scalable rewrite of an unpartitioned running aggregate:
    per-block running max (window *partitioned* by arrival block, parallel
    across blocks), plus a prefix max over the per-block maxima (rows/4096
    rows — broadcast back).  No stage orders the full table in one
    partition; at 100 TB widen the block or add a third level.
    """
    e = load_table(spark, sf_dir, "events")
    blk = F.expr(f"event_id div {_WM_BLOCK}")
    e2 = e.select("event_type", "ts_s", "event_id", blk.alias("blk"))
    block_max = e2.groupBy("blk").agg(F.max("ts_s").alias("bmax"))
    prev_w = W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)
    block_prefix = block_max.select(
        "blk", F.max("bmax").over(prev_w).alias("prev_max")
    )
    in_blk = (
        W.partitionBy("blk").orderBy("event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    arr = e2.join(F.broadcast(block_prefix), "blk").select(
        "event_type",
        "ts_s",
        (
            F.greatest(
                F.max("ts_s").over(in_blk),
                F.coalesce(F.col("prev_max"), F.lit(-(2**62))),
            )
            - WATERMARK_DELAY_S
        ).alias("wm"),
    )
    return (
        arr.where(F.col("ts_s") >= F.col("wm"))
        .groupBy((F.col("ts_s") - F.col("ts_s") % 3600).alias("w_start_s"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


# --- stateful dedup ----------------------------------------------------------

_DEDUP_ORACLE = """
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY epoch_us(ts), event_id) = 1
"""


@query("stateful_dedup_events", oracle=_DEDUP_ORACLE, tags=("streaming", "dedup"))
def stateful_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-event-wins dedup per (user_id, event_type) — the batch twin of
    streaming ``dropDuplicatesWithinWatermark`` (jobs.py), made
    deterministic by the (event-time, event_id) order.  One shuffle on the
    dedup key; WindowGroupLimit turns the rank into a per-key top-1 heap.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", big("ts_us", "ts_us"))
    )


# --- stream-stream join (click -> purchase attribution) ----------------------

ATTRIB_WINDOW_S = 1800

_SS_JOIN_ORACLE = f"""
WITH c AS (
  SELECT user_id, event_id, {_DD_TS} AS ts_s FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id, {_DD_TS} AS ts_s FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       p.ts_s - c.ts_s AS dt_s
FROM c JOIN p
  ON c.user_id = p.user_id
 AND p.ts_s >= c.ts_s AND p.ts_s <= c.ts_s + {ATTRIB_WINDOW_S}
"""


@query("stream_join_click_purchase", oracle=_SS_JOIN_ORACLE, tags=("streaming", "join"))
def stream_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of a watermarked stream-stream join: every purchase within
    30 min after a click by the same user (event-time range condition) —
    the canonical funnel-attribution join.  Live twin:
    ``streaming/jobs.py::run_stream_stream_join`` (both sides watermarked;
    the range condition is what lets each side's state expire).

    The batch plan uses the same band-join rewrite as
    ``join_range_bucketed``: purchases keyed on their 30-min time bucket,
    clicks exploded into (bucket, bucket+1), hash-equi join on
    (user_id, bucket), exact range filter after — never a per-user
    nested loop.
    """
    e = load_table(spark, sf_dir, "events")
    # Integer ``div``, not float "/"+cast: exact at any ts magnitude (the
    # float path only matches the oracle's "//" below 2^53).
    bkt = F.expr(f"ts_s div {ATTRIB_WINDOW_S}")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_s").alias("c_ts"),
        F.explode(F.array(bkt, bkt + 1)).alias("bucket"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_s").alias("p_ts"),
        bkt.alias("bucket"),
    )
    return (
        clicks.join(purchases, ["user_id", "bucket"])
        .where((F.col("p_ts") >= F.col("c_ts")) & (F.col("p_ts") <= F.col("c_ts") + ATTRIB_WINDOW_S))
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.col("p_ts") - F.col("c_ts")).alias("dt_s"),
        )
        .distinct()
    )


# --- stream-static broadcast enrichment --------------------------------------

_ENRICH_ORACLE = """
SELECT n.n_name AS nation, e.event_type,
       COUNT(*) AS c,
       CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v_cents
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY 1, 2
"""


@query("stream_static_enrich", oracle=_ENRICH_ORACLE, tags=("streaming", "enrich"))
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment, batch twin: every event joins a
    small static dimension (nation, keyed by ``user_id % 25`` — the
    classic "enrich the click with the reference table" shape), then
    aggregates per (nation, event_type).  The live ``readStream`` twin is
    ``jobs.run_stream_static_enrich`` (stream-static joins re-resolve the
    static side per micro-batch, which is exactly how slowly-changing
    reference tables reach a stream without restarting it).

    Scale: the dimension broadcasts (25 rows here; any true dim table);
    the fact stream never shuffles for the join — only the final keyed
    aggregation exchanges O(nations × types) partials.  The value sum is
    exact integer cents (FLOOR(x·100+0.5) == HALF_UP for the non-negative
    domain), so stream and batch agree bit-for-bit.
    """
    e = load_table(spark, sf_dir, "events")
    n = load_table(spark, sf_dir, "nation")
    joined = e.join(F.broadcast(n), e.user_id % 25 == n.n_nationkey)
    return joined.groupBy(
        F.col("n_name").alias("nation"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5D) AS BIGINT)")).alias("v_cents"),
    )


# --- event-time disorder profile ----------------------------------------------

#: deterministic LCG permutation of event_id == the simulated arrival
#: order: the synthetic feed is pre-sorted by event time (n_late would be
#: identically zero under its own order — vacuous), so arrival is a fixed
#: pseudo-random shuffle both engines compute identically; real feeds use
#: their ingestion offset here.  event_id is reduced mod 2^31 BEFORE the
#: multiply so the int64 product never overflows (DuckDB errors where
#: Spark would wrap, at event_id ≈ 8.4e9); the key is a bijection only
#: for event_id < 2^31 — beyond that arrival ties are possible, so both
#: window orderings carry an explicit event_id tiebreak to stay
#: order-deterministic across engines.
_ARRIVAL = "((event_id % 2147483648) * 1103515245 + 12345) % 2147483648"

_DISORDER_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ts_s < run_max THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(MAX(CASE WHEN ts_s < run_max THEN run_max - ts_s ELSE 0 END) AS BIGINT) AS max_lateness_s
FROM (
  SELECT user_id, ts_s,
         MAX(ts_s) OVER (PARTITION BY user_id ORDER BY arrival, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
  FROM (SELECT user_id, event_id, {_ARRIVAL} AS arrival, {_DD_TS} AS ts_s FROM events)
)
GROUP BY user_id
"""


@query("event_disorder_profile", oracle=_DISORDER_ORACLE, tags=("streaming", "quality"))
def event_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key event-time DISORDER profile: how many events arrive with an
    event time behind the key's running maximum, and the worst observed
    lateness — exactly the statistic that sizes a stream's watermark delay
    (``watermark_late_drop`` applies a fixed 10-minute delay; this
    measures what the data actually needs).  Arrival order is a
    deterministic LCG permutation of event_id (see ``_ARRIVAL``): the
    synthetic feed is pre-sorted by time, so under its own order every
    lateness column would be identically zero and the check vacuous.

    Scale: one shuffle keyed on user_id; the running max is a single
    partition-ordered window pass (same shape as the as-of join); outputs
    are O(keys).  All-integer arithmetic — exact on both engines.
    """
    e = load_table(spark, sf_dir, "events")
    arrival = F.expr(_ARRIVAL)
    run_max = F.max("ts_s").over(
        W.partitionBy("user_id")
        .orderBy("arrival", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    marked = e.select("user_id", "event_id", "ts_s", arrival.alias("arrival")).select(
        "user_id", "ts_s", run_max.alias("run_max")
    )
    late = F.when(F.col("ts_s") < F.col("run_max"), 1).otherwise(0)
    lateness = F.when(
        F.col("ts_s") < F.col("run_max"), F.col("run_max") - F.col("ts_s")
    ).otherwise(F.lit(0))
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(late).cast("bigint").alias("n_late"),
        F.max(lateness).cast("bigint").alias("max_lateness_s"),
    )


# --- stream-stream LEFT OUTER join (unattributed clicks surface) -------------

_SS_LEFT_ORACLE = f"""
WITH c AS (
  SELECT user_id, event_id, {_DD_TS} AS ts_s FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id, {_DD_TS} AS ts_s FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       p.ts_s - c.ts_s AS dt_s
FROM c LEFT JOIN p
  ON c.user_id = p.user_id
 AND p.ts_s >= c.ts_s AND p.ts_s <= c.ts_s + {ATTRIB_WINDOW_S}
"""


@query("stream_left_join_unattributed", oracle=_SS_LEFT_ORACLE, tags=("streaming", "join", "outer"))
def stream_left_join_unattributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream LEFT OUTER join: every
    click keeps a row — attributed ones carry each qualifying purchase,
    unattributed ones carry NULLs.  The outer side is what the inner
    attribution join (``stream_join_click_purchase``) cannot answer:
    "which clicks converted to NOTHING" — the abandonment signal.

    Spark-first decomposition: LEFT OUTER over a range predicate =
    band-rewrite INNER join (reused verbatim from the inner twin — same
    plan, Catalyst reuses the exchanges when both run in one job) UNION
    the anti-joined remainder with typed NULLs.  Both legs are hash-keyed
    (user/bucket equi-join; click_id anti-join) — the theta-outer form a
    naive plan would BNLJ never materializes.  Live twin:
    ``jobs.run_stream_stream_left_join`` — state expiry EMITS the
    unmatched rows once the watermark passes a click's attribution
    horizon, which is exactly the semantics this batch query states
    globally (the stream's final-watermark tail truncation is asserted in
    tests/test_streaming.py).
    """
    matched = stream_join_click_purchase(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id")
    )
    unmatched = clicks.join(
        matched.select("click_id"), "click_id", "left_anti"
    ).select(
        "user_id",
        "click_id",
        F.lit(None).cast("bigint").alias("purchase_id"),
        F.lit(None).cast("bigint").alias("dt_s"),
    )
    return matched.select("user_id", "click_id", "purchase_id", "dt_s").unionByName(
        unmatched
    )
