"""Advanced relational + pipeline operators: correlated subqueries,
deterministic distributed statistics, ordered string aggregation,
distribution window functions, date arithmetic, time-spine gap-fill, and a
salted (skew-resistant) aggregation.

None of this exists in the reference (SURVEY.md §2.B — its only dataflow is
chunk maps + driver reduces); these are the north-star engine surface a
large-scale training-data pipeline needs.  Scale posture per query is noted
in its docstring; the common themes:

- Correlated EXISTS lowers to a *semi join* (one shuffle on the join key,
  never a per-row subquery loop) — Catalyst's decorrelation is what makes
  the declarative form safe at 100 TB.
- Pearson corr / covariance are computed from DECIMAL power sums
  (Σx, Σy, Σxy, Σx², Σy²) — exact and associative, so partial aggregation
  is order-insensitive and the two-engine hash match survives any
  partitioning.  Native ``corr()`` would drift last-ulp across partition
  orders; the power-sum form is also the textbook single-pass distributed
  algorithm (one map-side partial per partition).
- The salted aggregation demonstrates the standard hot-key mitigation:
  pre-aggregate on (key, salt) to fan a skewed key across reducers, then
  final-aggregate on key.  With decimal partials the result is bit-equal to
  the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table, table_view
from ..functions.compat import big, day_str, dd_money_sum, money, money_sum, rev_sum
from ..registry import query

# --- correlated EXISTS (TPC-H Q4 shape) ------------------------------------

_EXISTS_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS cnt
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("exists_correlated_orders", oracle=_EXISTS_ORACLE, tags=("relational", "subquery"))
def exists_correlated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS as a LEFT SEMI join (TPC-H Q4 shape): orders with
    at least one line item shipped after the order date, counted per
    priority.

    Scale: the semi join shuffles both sides once on l_orderkey/o_orderkey
    and keeps only the equi-key columns + the range predicate inputs; no
    row explosion (semi join short-circuits on first match), and the
    9-group aggregation collapses map-side.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderpriority")
    )


# --- deterministic distributed Pearson correlation -------------------------

_CORR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
       round(sxy / n - (sx / n) * (sy / n), 6) AS covar_pop_qty_price
FROM s
ORDER BY l_returnflag
"""


@query("agg_corr_covar", oracle=_CORR_ORACLE, tags=("relational", "agg", "stats"))
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance of (quantity, price) per
    return flag, via exact DECIMAL power sums.

    This is the single-pass distributed moments algorithm: each partition
    emits partial (n, Σx, Σy, Σxy, Σx², Σy²) — decimal, so merging is
    exact and order-insensitive — and the closed form is evaluated on the
    merged totals.  Native ``corr()`` is float-accumulated and would not
    hash-match across engines/partitionings.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = money("l_quantity"), money("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    covar = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    return s.select(
        "l_returnflag",
        "n",
        F.round(corr, 6).alias("corr_qty_price"),
        F.round(covar, 6).alias("covar_pop_qty_price"),
    ).orderBy("l_returnflag")


# --- ordered string aggregation --------------------------------------------

_STRAGG_ORACLE = """
SELECT r.r_name,
       COUNT(*) AS n_nations,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


@query("string_agg_nations", oracle=_STRAGG_ORACLE, tags=("relational", "agg", "string"))
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: comma-joined sorted nation names per
    region.  ``collect_list`` is order-nondeterministic under shuffling, so
    the engine sorts the collected array before joining — the only safe way
    to emit LISTAGG-style output from a distributed aggregation.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        )
        .orderBy("r_name")
    )


# --- distribution window functions -----------------------------------------

_DIST_ORACLE = """
SELECT c_custkey,
       c_mktsegment,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd,
       ntile(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


@query("window_dist_funcs", oracle=_DIST_ORACLE, tags=("relational", "window"))
def window_dist_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile over customers per market segment.

    The ORDER BY carries c_custkey as a unique tie-break so every rank —
    and therefore every distribution value — is deterministic under any
    partitioning.  One shuffle on c_mktsegment; the sort is per-partition.
    """
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        big(F.ntile(4).over(w), "quartile"),
    ).orderBy("c_custkey")


# --- date arithmetic --------------------------------------------------------

_DATEARITH_ORACLE = """
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS due_3mo,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       isodow(o_orderdate) AS iso_dow,
       date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS days_to_1998
FROM orders
WHERE o_orderstatus = 'O'
ORDER BY o_orderkey
"""


@query("date_arith_orders", oracle=_DATEARITH_ORACLE, tags=("relational", "datetime"))
def date_arith_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic sweep: month truncation, interval addition with
    end-of-month clamping, last_day, ISO day-of-week, day difference.

    All outputs are normalized to strings/BIGINT so neither engine's
    temporal rendering touches the hash.  Narrow per-row projection —
    pushdown-filtered scan, no shuffle at all.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.where(F.col("o_orderstatus") == "O")
        .select(
            "o_orderkey",
            day_str(F.date_trunc("month", d), "month_start"),
            day_str(F.add_months(d, 3), "due_3mo"),
            day_str(F.last_day(d), "month_end"),
            # Spark weekday(): Monday=0 .. Sunday=6; DuckDB isodow: Mon=1..Sun=7
            big(F.weekday(d) + F.lit(1), "iso_dow"),
            big(F.datediff(F.lit("1998-01-01").cast("timestamp_ntz"), d), "days_to_1998"),
        )
        .orderBy("o_orderkey")
    )


# --- time-spine gap fill -----------------------------------------------------

_DD_TS_S = "epoch_us(ts) // 1000000"

_GAPFILL_ORACLE = f"""
WITH b AS (
  SELECT min(({_DD_TS_S}) // 3600) AS h0, max(({_DD_TS_S}) // 3600) AS h1 FROM events
),
spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM b),
agg AS (
  SELECT ({_DD_TS_S}) // 3600 AS h,
         COUNT(*) AS c,
         CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events GROUP BY 1
)
SELECT spine.h * 3600 AS w_start_s,
       COALESCE(agg.c, 0) AS c,
       round(COALESCE(agg.v, 0.0), 6) AS v
FROM spine LEFT JOIN agg ON spine.h = agg.h
ORDER BY w_start_s
"""


@query("gapfill_time_spine", oracle=_GAPFILL_ORACLE, tags=("relational", "timeseries"))
def gapfill_time_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly time series over the events span: generate an hour
    spine with ``sequence``/``explode``, left-join the hourly aggregate,
    zero-fill the gaps — the standard gap-fill for training-data
    time-series features.

    Scale: the spine is tiny (hours between min and max — a few thousand
    rows per year) so it broadcast-joins to the aggregate; the only real
    shuffle is the hourly groupBy, which partial-aggregates map-side.  The
    min/max bounds are one scalar aggregate over a pruned single-column
    scan.
    """
    e = load_table(spark, sf_dir, "events")
    hour = F.expr("ts_s div 3600")  # integer division: exact, engine-agnostic
    bounds = e.agg(
        F.min(hour).alias("h0"),
        F.max(hour).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    agg = e.groupBy(hour.alias("h")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double").alias("v"),
    )
    return (
        F.broadcast(spine)
        .join(agg, "h", "left")
        .select(
            (F.col("h") * 3600).alias("w_start_s"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
            F.round(F.coalesce(F.col("v"), F.lit(0.0)), 6).alias("v"),
        )
        .orderBy("w_start_s")
    )


# --- salted (skew-resistant) aggregation -------------------------------------

_SALTED_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS cnt,
       {dd_money_sum('l_extendedprice', 'rev')}
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_N_SALTS = 16


@query("skew_salted_agg", oracle=_SALTED_ORACLE, tags=("relational", "agg", "skew"))
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: revenue per return flag where the
    grouping key is low-cardinality/skewed.

    Phase 1 groups on (key, salt) — the salt (hash of the order key mod
    16) fans each hot key across 16 reducers; phase 2 merges the partials
    on the bare key.  Because the partials are DECIMAL (exact,
    associative), the result is bit-identical to the single-phase plan —
    which is exactly why salting is safe to apply mechanically to any
    sum/count aggregate with a hot key at 100 TB.  (For *this* 3-key
    aggregate Spark's map-side partial aggregation already avoids the hot
    spot; the query exists to pin the rewrite's correctness.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    salt = F.pmod(F.hash("l_orderkey"), F.lit(_N_SALTS))
    partial = (
        li.groupBy("l_returnflag", salt.alias("salt"))
        .agg(
            F.count(F.lit(1)).alias("p_cnt"),
            F.sum(money("l_extendedprice")).alias("p_rev"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("p_cnt").alias("cnt"),
            F.sum("p_rev").cast("double").alias("rev"),
        )
        .orderBy("l_returnflag")
    )


# --- salted/replicated (skew-resistant) join ---------------------------------

_SKEW_JOIN_ORACLE = """
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(e.value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""

_N_JOIN_SALTS = 8


@query("skew_salted_join", oracle=_SKEW_JOIN_ORACLE, tags=("relational", "join", "skew"))
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted/replicated shuffle join — the other standard hot-key fix
    (``skew_salted_agg`` covers aggregation): events⨝customer on the
    skewed ``user_id``, with the fact side salted ``hash(event_id) mod 8``
    and the dimension side replicated 8× (explode over the salt range), so
    each hot key's rows spread across 8 reducers instead of one.

    The join is hinted ``shuffle_hash`` so the salted path is actually
    exercised (an auto-broadcast would make salting moot — and at 100 TB
    the dimension can exceed broadcast size, which is exactly when this
    rewrite matters; AQE's skew-join split is the automatic alternative,
    this is the mechanical one).  Replication factor trades dim-side
    shuffle volume (8×|dim|) for hot-key parallelism.  The decimal partials
    make the post-join aggregate bit-identical to the unsalted plan —
    asserted by the plain-join oracle and a hypothesis property test.
    """
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    fact = e.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(_N_JOIN_SALTS)))
    dim = c.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_JOIN_SALTS - 1)))
    )
    joined = fact.join(
        dim.hint("shuffle_hash"),
        (fact["user_id"] == dim["c_custkey"]) & (fact["salt"] == dim["salt"]),
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


# --- range join via time-bucket equi-join ------------------------------------

_RANGE_BUCKET_ORACLE = """
SELECT e1.user_id,
       e1.event_id AS id1,
       e2.event_id AS id2,
       epoch_us(e2.ts) - epoch_us(e1.ts) AS dt_us
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND e1.event_id < e2.event_id
 AND abs(epoch_us(e2.ts) - epoch_us(e1.ts)) <= 60000000
"""

_BIN_US = 60_000_000  # 60 s


@query("join_range_bucketed", oracle=_RANGE_BUCKET_ORACLE, tags=("relational", "join", "range"))
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/range self-join — same-user event pairs within 60 s — rewritten
    as an *equi* join on (user_id, time bucket).

    The naive form is a theta join (|t2−t1| ≤ 60 s), which Spark can only
    execute as a nested-loop over each user group.  Bucketing time into
    band-width bins and exploding one side into its 3 adjacent bins turns
    it into a hash-equi join: every qualifying pair shares a (user_id,
    bin) key in exactly one of the 3 replicas, so the join is
    shuffle-hash/sort-merge with 3× replication of one side — the standard
    range-join rewrite (what dedicated engines' range-join optimizers do
    internally), and the difference between O(n·k) and O(n²/users) at
    100 TB.  The residual |Δt| ≤ 60 s predicate filters within buckets.
    """
    e = load_table(spark, sf_dir, "events")
    bin_ = F.expr(f"ts_us div {_BIN_US}")
    a = e.select(
        "user_id", F.col("event_id").alias("id1"), F.col("ts_us").alias("u1"),
        bin_.alias("bin1"),
    ).withColumn("jbin", F.explode(F.array(F.col("bin1") - 1, F.col("bin1"), F.col("bin1") + 1)))
    b = e.select(
        "user_id", F.col("event_id").alias("id2"), F.col("ts_us").alias("u2"),
        bin_.alias("jbin"),
    )
    return (
        a.join(b, ["user_id", "jbin"])
        .where(
            (F.col("id1") < F.col("id2"))
            & (F.abs(F.col("u2") - F.col("u1")) <= F.lit(_BIN_US))
        )
        .select("user_id", "id1", "id2", (F.col("u2") - F.col("u1")).alias("dt_us"))
    )


# --- unpivot / melt ----------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
FROM part
"""


@query("unpivot_part_metrics", oracle=_UNPIVOT_ORACLE, tags=("relational", "reshape"))
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT/MELT): part's numeric metrics as
    (key, metric, val) rows — the inverse of ``pivot_status_by_segment``.

    Uses the native ``unpivot`` operator (an Expand node: each input row
    fans out to one row per metric in a single narrow pass — no shuffle,
    no self-union rescan, which is what the UNION ALL oracle would cost if
    executed literally at 100 TB).
    """
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "val")


# --- correlated scalar subquery ----------------------------------------------

_CORR_SCALAR_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                      FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
"""


@query("scalar_subquery_correlated_max", oracle=_CORR_SCALAR_ORACLE, tags=("relational", "subquery"))
def scalar_subquery_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each customer's maximum-price orders),
    decorrelated to a window max — completing the subquery triad with
    ``scalar_subquery_above_avg`` (uncorrelated scalar) and
    ``exists_correlated_orders`` (correlated EXISTS).

    The literal per-row subquery would be a rescan per outer row; the
    window form is one shuffle on o_custkey and one pass.  (An aggregate +
    self-join is the other standard lowering — Catalyst picks that when
    you write the subquery in SQL; both are O(n) with one exchange.)
    """
    o = load_table(spark, sf_dir, "orders")
    mx = F.max("o_totalprice").over(W.partitionBy("o_custkey"))
    return (
        o.withColumn("mx", mx)
        .where(F.col("o_totalprice") == F.col("mx"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --- 6-way join graph (TPC-H Q5 shape) ---------------------------------------

_Q5_ORACLE = """
SELECT n.n_name,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS rev
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY rev DESC, n.n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("relational", "join"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from intra-nation (customer = supplier
    nation) trade in one region, per nation — the engine's join-graph
    stress query (6 tables, mixed dim/fact).

    Scale: region/nation/supplier are broadcast (bounded dims); the only
    fact-fact exchange is orders⨝lineitem on the order key; the date
    filter pushes into the orders scan, shrinking the build side before
    the join.  Catalyst orders the dim joins; AQE re-plans from runtime
    sizes.  Revenue rides the exact integer-cents path (`rev_sum`).
    """
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    asia_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    return (
        c.join(F.broadcast(asia_nations), c.c_nationkey == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (F.col("c_nationkey") == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(rev_sum("l_extendedprice", "l_discount", "rev"))
        .orderBy(F.desc("rev"), "n_name")
    )


# --- ratio to report (window over whole result) ------------------------------

_RATIO_ORACLE = """
WITH per_nation AS (
  SELECT n.n_name,
         CAST(SUM(CAST(c.c_acctbal AS DECIMAL(8,2))) AS DOUBLE) AS bal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, bal,
       round(bal / SUM(bal) OVER (), 6) AS share
FROM per_nation
ORDER BY n_name
"""


@query("window_ratio_to_report", oracle=_RATIO_ORACLE, tags=("relational", "window"))
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of total customer balance via
    an unpartitioned window sum over the *aggregated* (25-row) result.

    Scale: the whole-result window is safe only because it runs after the
    group-by collapsed the data to |nations| rows — the single-partition
    window stage touches KBs.  (Running it over raw rows would serialize
    the dataset through one task: the anti-pattern this query's shape
    documents.)  The balance sum rides the exact decimal path.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(money("c_acctbal")).cast("double").alias("bal"))
    )
    share = F.col("bal") / F.sum("bal").over(W.partitionBy())
    return per_nation.select(
        "n_name", "bal", F.round(share, 6).alias("share")
    ).orderBy("n_name")


# --- CDC upsert / MERGE INTO -------------------------------------------------

_MERGE_ORACLE = """
WITH src AS (
  SELECT o_orderkey, round(o_totalprice + 1000.00, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice
  FROM orders WHERE o_orderkey % 499 = 0
)
SELECT o_orderkey, o_totalprice, is_changed FROM (
  SELECT o.o_orderkey, o.o_totalprice, FALSE AS is_changed
  FROM orders o WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM src)
  UNION ALL
  SELECT o_orderkey, o_totalprice, TRUE FROM src
)
"""


@query("upsert_merge_orders", oracle=_MERGE_ORACLE, tags=("relational", "merge", "cdc"))
def upsert_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (CDC upsert) without a table format: a
    deterministic change batch (updates for orderkey % 97 == 0 with +1000
    price, inserts with shifted keys for % 499 == 0) merged into orders as
    anti-join(matched keys) ∪ source — matched rows replaced, new rows
    appended, untouched rows carried.

    Scale shape: one shuffle keyed on the merge key for the anti join (the
    source side is the small CDC batch — it broadcasts), then a union that
    needs no exchange.  On a lakehouse layout this is copy-on-write MERGE:
    join identifies affected files/partitions, only those rewrite —
    partition pruning on the merge key's partition column bounds the
    rewrite set (see ``partitioned_write_orders`` for the layout half).
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = (
        o.where(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey", F.round(F.col("o_totalprice") + 1000.00, 2).alias("o_totalprice"))
    )
    inserts = o.where(F.col("o_orderkey") % 499 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"), "o_totalprice"
    )
    src = updates.unionByName(inserts).withColumn("is_changed", F.lit(True))
    kept = o.join(
        F.broadcast(src.select("o_orderkey")), "o_orderkey", "left_anti"
    ).withColumn("is_changed", F.lit(False))
    return kept.unionByName(src)


# --- lag/lead event-sequence analytics ---------------------------------------

_LAGLEAD_ORACLE = f"""
SELECT user_id, event_id,
       ({_DD_TS_S}) AS t_s,
       ({_DD_TS_S}) - lag({_DD_TS_S}) OVER w AS gap_s,
       lead(event_type) OVER w AS next_type,
       first_value(event_type) OVER w AS first_type,
       CAST(row_number() OVER w AS BIGINT) AS seq
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY {_DD_TS_S}, event_id)
"""


@query("window_lag_lead_events", oracle=_LAGLEAD_ORACLE, tags=("relational", "window", "sequence"))
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence features via offset window functions:
    inter-event gap (``lag``), next event type (``lead``), session-first
    event type (``first_value``), and sequence position — the standard
    feature block for behavioral / clickstream training data.

    Scale: all four functions share ONE window spec, so Catalyst computes
    them in a single Window operator over a single hash-exchange on
    ``user_id`` — adding more offset features is free.  The sort inside
    each partition is local (no global order).  Ties broken by event_id so
    the frame is deterministic across partitionings.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.col("ts_s").alias("t_s"),
        (F.col("ts_s") - F.lag("ts_s").over(w)).alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


# --- multi-granularity time rollup (hypertable continuous aggregate) ---------

_MULTIGRAIN_ORACLE = f"""
SELECT CASE WHEN GROUPING(d) = 1 THEN -1 ELSE d END AS day_s,
       CASE WHEN GROUPING(h) = 1 THEN -1 ELSE h END AS hour_s,
       CAST(GROUPING(d) * 2 + GROUPING(h) AS INT) AS lvl,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS v
FROM (
  SELECT (({_DD_TS_S}) // 86400) * 86400 AS d,
         (({_DD_TS_S}) // 3600) * 3600 AS h,
         event_type, value
  FROM events
)
GROUP BY GROUPING SETS ((d, h, event_type), (d, event_type), (event_type))
"""


@query("rollup_multigrain_events", oracle=_MULTIGRAIN_ORACLE, tags=("relational", "timeseries", "rollup"))
def rollup_multigrain_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly, daily, and
    grand per-event-type totals from ONE scan via ``GROUPING SETS`` on
    truncated time buckets — the materialized-rollup shape TimescaleDB /
    Druid serve dashboards from.

    Scale: Spark's Expand node replicates each row once per grouping set
    BEFORE the exchange, and partial aggregation collapses the replicas
    map-side, so the shuffle carries one row per (bucket, type) per set —
    not 3x the fact table.  At 100 TB the hourly set dominates and is
    bounded by cardinality(hour x type), not row count.  NULL bucket ids
    from coarser sets are encoded as -1 (hash-stable across engines).
    """
    e = load_table(spark, sf_dir, "events")
    d = (F.expr("ts_s div 86400") * 86400).alias("d")
    h = (F.expr("ts_s div 3600") * 3600).alias("h")
    base = e.select(d, h, "event_type", "value")
    rolled = base.groupingSets(
        [["d", "h", "event_type"], ["d", "event_type"], ["event_type"]],
        "d", "h", "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double").alias("v"),
        F.grouping("d").alias("gd"),
        F.grouping("h").alias("gh"),
    )
    return rolled.select(
        F.when(F.col("gd") == 1, F.lit(-1)).otherwise(F.col("d")).alias("day_s"),
        F.when(F.col("gh") == 1, F.lit(-1)).otherwise(F.col("h")).alias("hour_s"),
        (F.col("gd") * 2 + F.col("gh")).cast("int").alias("lvl"),
        "event_type",
        "n",
        F.col("v"),
    )


# --- conversion funnel (ordered-step event analytics) ------------------------

_FUNNEL_ORACLE = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
  SELECT user_id, MIN({_DD_TS_S}) AS v_ts
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN({_DD_TS_S}) AS c_ts
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND ({_DD_TS_S}) >= v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN({_DD_TS_S}) AS p_ts
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND ({_DD_TS_S}) >= c.c_ts
  GROUP BY e.user_id
)
SELECT u.user_id,
       COALESCE(v.v_ts, -1) AS v_ts,
       COALESCE(c.c_ts, -1) AS c_ts,
       COALESCE(p.p_ts, -1) AS p_ts,
       CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
                 WHEN c.c_ts IS NOT NULL THEN 2
                 WHEN v.v_ts IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS stage
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       LEFT JOIN p USING (user_id)
"""


@query("funnel_view_click_purchase", oracle=_FUNNEL_ORACLE, tags=("relational", "events", "funnel"))
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step conversion funnel (view → click → purchase) per
    user: the first view, the first click at-or-after it, the first
    purchase at-or-after that, and the furthest stage reached — the
    ``windowFunnel``-style sequence-match analytics engines advertise.

    Scale shape: where the naive form runs one aggregation per step plus a
    join per dependency (each step's predicate references the previous
    step's result), this plan is ONE exchange (asserted against PLANS.md):
    every user's events collect in a single groupBy — non-funnel types ride
    along with an inert priority so no separate distinct-users pass or join
    exists — then the step state machine runs as a sequential ``aggregate``
    fold over the sorted array.  Views sort before clicks before purchases
    at equal timestamps (priority in the sort key), which makes the fold
    bit-equal to the oracle's MIN-sequence CTEs.  Missing stages surface as
    -1 sentinels so the output stays integer-typed.  Caveat at 100 TB: the
    per-user array is bounded by that user's event count; for adversarially
    hot keys pre-filter to funnel types or pre-aggregate per (user, day).
    """
    e = load_table(spark, sf_dir, "events")
    prio = (
        F.when(F.col("event_type") == "view", 0)
        .when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "purchase", 2)
        .otherwise(3)  # non-funnel events keep the user in scope, fold skips them
    )
    steps = e.select("user_id", F.col("ts_s").alias("t"), prio.alias("prio"))
    neg1 = F.lit(-1).cast("bigint")
    folded = (
        steps.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("t", "prio"))).alias("arr"))
        .select(
            "user_id",
            F.aggregate(
                F.col("arr"),
                F.struct(neg1.alias("v"), neg1.alias("c"), neg1.alias("p")),
                lambda acc, x: F.struct(
                    F.when((acc["v"] == -1) & (x["prio"] == 0), x["t"])
                    .otherwise(acc["v"])
                    .alias("v"),
                    F.when(
                        (acc["c"] == -1) & (acc["v"] != -1) & (x["prio"] == 1), x["t"]
                    )
                    .otherwise(acc["c"])
                    .alias("c"),
                    F.when(
                        (acc["p"] == -1) & (acc["c"] != -1) & (x["prio"] == 2), x["t"]
                    )
                    .otherwise(acc["p"])
                    .alias("p"),
                ),
            ).alias("st"),
        )
    )
    return folded.select(
        "user_id",
        F.col("st.v").alias("v_ts"),
        F.col("st.c").alias("c_ts"),
        F.col("st.p").alias("p_ts"),
        F.when(F.col("st.p") != -1, 3)
        .when(F.col("st.c") != -1, 2)
        .when(F.col("st.v") != -1, 1)
        .otherwise(0)
        .cast("int")
        .alias("stage"),
    )


# --- sessionization (per-event session assignment) ---------------------------

SESSION_GAP_S = 1800

_SESSIONIZE_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id, ({_DD_TS_S}) AS t_s,
         CASE WHEN ({_DD_TS_S}) - lag({_DD_TS_S})
                OVER (PARTITION BY user_id ORDER BY {_DD_TS_S}, event_id)
              > {SESSION_GAP_S} THEN 1
              WHEN lag({_DD_TS_S})
                OVER (PARTITION BY user_id ORDER BY {_DD_TS_S}, event_id) IS NULL THEN 1
              ELSE 0 END AS is_new
  FROM events
)
SELECT user_id, event_id, t_s,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY t_s, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
FROM t
"""


@query("sessionize_events", oracle=_SESSIONIZE_ORACLE, tags=("relational", "events", "session"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every event its per-user session ordinal under the 30-minute
    inactivity rule — the event-level twin of ``session_window_events``
    (which emits one row per session): a new session starts when the gap
    from the previous event exceeds the threshold (strictly greater —
    Spark's own ``session_window`` merges at exactly the gap), and the
    session id is the running count of session starts.

    Scale shape: one hash exchange on ``user_id``; both the ``lag`` flag
    and the running sum ride the same window sort, so Catalyst plans a
    single Window operator pair over one partitioning — no second shuffle.
    Event-id tiebreak keeps equal-timestamp ordering deterministic.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    prev = F.lag("ts_s").over(w)
    is_new = (
        F.when(F.col("ts_s") - prev > SESSION_GAP_S, 1)
        .when(prev.isNull(), 1)
        .otherwise(0)
    )
    return (
        e.select("user_id", "event_id", F.col("ts_s").alias("t_s"), is_new.alias("is_new"))
        .withColumn(
            "session_seq",
            F.sum("is_new")
            .over(
                W.partitionBy("user_id")
                .orderBy("t_s", "event_id")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            .cast("bigint"),
        )
        .drop("is_new")
    )


# --- weekly cohort retention -------------------------------------------------

_WEEK_S = 604800

_RETENTION_ORACLE = f"""
WITH uw AS (
  SELECT DISTINCT user_id, ({_DD_TS_S}) // {_WEEK_S} AS wk FROM events
),
cohort AS (SELECT user_id, MIN(wk) AS wk0 FROM uw GROUP BY user_id)
SELECT cohort.wk0 * {_WEEK_S} AS cohort_week_s,
       CAST(uw.wk - cohort.wk0 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
FROM uw JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


@query("retention_cohorts", oracle=_RETENTION_ORACLE, tags=("relational", "events", "retention"))
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active
    week, counted in each later week they return — the standard
    growth-analytics rollup.

    Scale shape: TWO exchanges total — the per-user cohort week is a
    window ``min`` over the ``user_id`` partitioning (no groupBy+self-join
    round trip), and the final (cohort, offset) distinct-count exchange is
    keyed on a tiny weeks-x-weeks domain (Spark expands count_distinct into
    a partial dedup on (cohort, offset, user), so the wide key never
    concentrates).  Week ids are integer division of epoch seconds — no
    calendar functions, so bucket edges are engine-exact.
    """
    e = load_table(spark, sf_dir, "events")
    uw = e.select("user_id", F.expr(f"ts_s div {_WEEK_S}").alias("wk"))
    wk0 = F.min("wk").over(W.partitionBy("user_id"))
    return (
        uw.withColumn("wk0", wk0)
        .groupBy(
            (F.col("wk0") * _WEEK_S).alias("cohort_week_s"),
            (F.col("wk") - F.col("wk0")).cast("bigint").alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"))
    )


# --- bloom-filter join pre-filter (confusion-matrix audit) -------------------

_BLOOM_WORDS = 4      # 64-bit words in the filter
_BLOOM_BITS = 62      # usable bits per word (stay positive under <<)
_BLOOM_M = _BLOOM_WORDS * _BLOOM_BITS
_BK1, _BK2 = 2654435761, 40503
_BLOOM_BAL = 9000.0   # "big spender" threshold on c_acctbal

_BLOOM_ORACLE = f"""
WITH spenders AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {_BLOOM_BAL}
),
bits AS (
  SELECT (h // {_BLOOM_BITS}) AS word, bit_or(1::BIGINT << (h % {_BLOOM_BITS})) AS w
  FROM (
    SELECT (c_custkey * {_BK1}) % {_BLOOM_M} AS h FROM spenders
    UNION ALL
    SELECT (c_custkey * {_BK2}) % {_BLOOM_M} AS h FROM spenders
  )
  GROUP BY 1
),
bloom AS (
  SELECT bit_or(CASE WHEN word = 0 THEN w ELSE 0 END) AS w0,
         bit_or(CASE WHEN word = 1 THEN w ELSE 0 END) AS w1,
         bit_or(CASE WHEN word = 2 THEN w ELSE 0 END) AS w2,
         bit_or(CASE WHEN word = 3 THEN w ELSE 0 END) AS w3
  FROM bits
),
probe AS (
  SELECT o.o_orderkey, o.o_custkey,
         ((CASE ((o.o_custkey * {_BK1}) % {_BLOOM_M}) // {_BLOOM_BITS}
             WHEN 0 THEN b.w0 WHEN 1 THEN b.w1 WHEN 2 THEN b.w2 ELSE b.w3 END
           >> ((o.o_custkey * {_BK1}) % {_BLOOM_M} % {_BLOOM_BITS})) & 1) = 1
         AND
         ((CASE ((o.o_custkey * {_BK2}) % {_BLOOM_M}) // {_BLOOM_BITS}
             WHEN 0 THEN b.w0 WHEN 1 THEN b.w1 WHEN 2 THEN b.w2 ELSE b.w3 END
           >> ((o.o_custkey * {_BK2}) % {_BLOOM_M} % {_BLOOM_BITS})) & 1) = 1
         AS bloom_pass,
         EXISTS (SELECT 1 FROM spenders s WHERE s.c_custkey = o.o_custkey)
         AS exact_pass
  FROM orders o, bloom b
)
SELECT bloom_pass, exact_pass, CAST(COUNT(*) AS BIGINT) AS n
FROM probe GROUP BY bloom_pass, exact_pass
"""


@query("bloom_prefilter_orders", oracle=_BLOOM_ORACLE, tags=("relational", "join", "bloom"))
def bloom_prefilter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-built bloom-filter join pre-filter, audited: hash big-spender
    custkeys twice into a 248-bit filter (four 62-bit words via ``bit_or``
    aggregation), broadcast the four words as one row, membership-test
    every order with pure bit arithmetic, and cross-tab the bloom verdict
    against the exact semi-join — the (bloom_pass, exact_pass) confusion
    matrix whose FALSE/TRUE cell is the measured false-positive count.
    This is the same mechanism as Spark's runtime row-level bloom
    (pinned in session.py) made explicit, exact, and oracle-checkable.

    Scale shape: the filter build aggregates to O(words) rows and the
    probe is a broadcast nested-loop of a 1-row dimension — the fact scan
    never shuffles; the exact-verify semi-join broadcasts the spender key
    set.  All arithmetic is integer (62-bit shifts keep words positive),
    so the hash matches bit-for-bit.  The demo filter is deliberately tiny
    (248 bits): at sf0.01 it shows a real false-positive cell, and at
    sf0.1 the key count saturates it (every probe passes) — the audit
    measuring exactly why production sizes m ≈ 10·n bits per the standard
    fill-factor math.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spenders = c.where(F.col("c_acctbal") > _BLOOM_BAL).select("c_custkey")
    h1 = (F.col("c_custkey") * _BK1) % _BLOOM_M
    h2 = (F.col("c_custkey") * _BK2) % _BLOOM_M
    hashes = spenders.select(h1.alias("h")).unionAll(spenders.select(h2.alias("h")))
    bits = hashes.groupBy(F.expr(f"CAST(h div {_BLOOM_BITS} AS BIGINT)").alias("word")).agg(
        F.expr(f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(h % {_BLOOM_BITS} AS INT)))").alias("w")
    )
    word_col = lambda i: F.bit_or(
        F.when(F.col("word") == i, F.col("w")).otherwise(F.lit(0).cast("bigint"))
    ).alias(f"w{i}")
    bloom = bits.agg(*[word_col(i) for i in range(_BLOOM_WORDS)])

    def member_sql(mult: int) -> str:
        h = f"((o_custkey * {mult}) % {_BLOOM_M})"
        w = (
            f"(CASE CAST({h} div {_BLOOM_BITS} AS INT) WHEN 0 THEN w0 WHEN 1 THEN w1"
            f" WHEN 2 THEN w2 ELSE w3 END)"
        )
        return f"((shiftright({w}, CAST({h} % {_BLOOM_BITS} AS INT)) & 1) = 1)"

    probe = o.select("o_orderkey", "o_custkey").crossJoin(F.broadcast(bloom)).select(
        "o_custkey",
        F.expr(f"{member_sql(_BK1)} AND {member_sql(_BK2)}").alias("bloom_pass"),
    )
    exact = spenders.select(F.col("c_custkey").alias("o_custkey")).withColumn(
        "exact_pass", F.lit(True)
    )
    return (
        probe.join(F.broadcast(exact), "o_custkey", "left")
        .select("bloom_pass", F.coalesce("exact_pass", F.lit(False)).alias("exact_pass"))
        .groupBy("bloom_pass", "exact_pass")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# --- equi-width histogram ----------------------------------------------------

_NB = 20  # histogram buckets

_HIST_ORACLE = f"""
WITH b AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events)
SELECT CAST(least({_NB} - 1, floor((e.value - b.mn) * {_NB} / (b.mx - b.mn))) AS INT)
         AS bucket,
       round(b.mn + least({_NB} - 1, floor((e.value - b.mn) * {_NB} / (b.mx - b.mn)))
             * (b.mx - b.mn) / {_NB}, 6) AS lo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e, b
GROUP BY 1, 2
"""


@query("value_histogram_events", oracle=_HIST_ORACLE, tags=("relational", "agg", "histogram"))
def value_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of ``events.value`` — the profiling
    primitive behind every optimizer statistic and monitoring dashboard.

    The min/max bounds are one scalar aggregate broadcast into the
    bucketing projection; bucket index and left edge apply identical IEEE
    double ops in both engines (no interpolation search), and the bucket
    aggregation partial-combines map-side, so the full scan shuffles only
    O(buckets) rows.
    """
    e = load_table(spark, sf_dir, "events")
    b = e.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    bucket = F.least(
        F.lit(_NB - 1),
        F.floor((F.col("value") - F.col("mn")) * _NB / (F.col("mx") - F.col("mn"))),
    )
    return (
        e.select("value")
        .crossJoin(F.broadcast(b))
        .select(
            bucket.cast("int").alias("bucket"),
            F.round(
                F.col("mn") + bucket * (F.col("mx") - F.col("mn")) / _NB, 6
            ).alias("lo"),
        )
        .groupBy("bucket", "lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# --- SCD Type-2 history build (CDC interval construction) --------------------

_SCD2_ORACLE = f"""
WITH t1 AS (
  SELECT user_id, event_id, event_type, ({_DD_TS_S}) AS t_s,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY {_DD_TS_S}, event_id)
           AS prev
  FROM events
),
t2 AS (
  SELECT user_id, event_id, event_type, t_s FROM t1
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, t_s AS valid_from,
       COALESCE(lead(t_s) OVER (PARTITION BY user_id ORDER BY t_s, event_id) - 1,
                -1) AS valid_to
FROM t2
"""


@query("scd2_intervals_events", oracle=_SCD2_ORACLE, tags=("relational", "cdc", "scd"))
def scd2_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build from a change
    stream: collapse each user's event-type runs to their change points,
    then stamp every version with a [valid_from, valid_to] interval
    (current version carries -1) — the standard dimension-history
    construction every CDC-fed lakehouse runs, and the batch complement of
    ``upsert_merge_orders``.

    Scale shape: the change-detection ``lag`` and the interval-closing
    ``lead`` share the ``user_id`` partitioning, so the plan is ONE
    exchange with two pipelined Window operators (the second runs on the
    filtered change rows).  Event-id tiebreak keeps equal-timestamp runs
    deterministic in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    changes = (
        e.select("user_id", "event_id", "event_type", F.col("ts_s").alias("t_s"))
        .withColumn("prev", F.lag("event_type").over(
            W.partitionBy("user_id").orderBy("t_s", "event_id")))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    w2 = W.partitionBy("user_id").orderBy("t_s", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("t_s").alias("valid_from"),
        F.coalesce(F.lead("t_s").over(w2) - 1, F.lit(-1).cast("bigint")).alias("valid_to"),
    )


# --- Z-order (space-filling curve) layout key --------------------------------

_Z_BITS = 10  # bits per dimension -> 20-bit z-value


def _interleave_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_ZORDER_ORACLE = f"""
SELECT o_orderkey,
       {_interleave_sql(f"(o_custkey % {1 << _Z_BITS})",
                        f"(CAST(floor(o_totalprice / 256) AS BIGINT) % {1 << _Z_BITS})")}
         AS zval
FROM orders
"""


@query("zorder_key_orders", oracle=_ZORDER_ORACLE, tags=("relational", "layout", "zorder"))
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key over (customer, price-band): interleave 10
    bits of each dimension into one 20-bit clustering value — the
    space-filling-curve layout key behind multi-column data skipping
    (Delta/Iceberg ``OPTIMIZE ZORDER BY``): sorting by ``zval`` co-locates
    rows close in BOTH dimensions, so min/max file stats prune scans
    filtered on either column.

    Pure row-local integer bit arithmetic (same expression text in both
    engines); at scale this projection feeds ``repartitionByRange(zval)``
    + ``sortWithinPartitions`` ahead of the write — the sort, not the key,
    is the only distributed cost.
    """
    o = load_table(spark, sf_dir, "orders")
    x = f"(o_custkey % {1 << _Z_BITS})"
    y = f"(CAST(floor(o_totalprice / 256) AS BIGINT) % {1 << _Z_BITS})"
    return o.select("o_orderkey", F.expr(_interleave_sql(x, y)).alias("zval"))


# --- time-based rolling feature window ---------------------------------------

_ROLL_W_S = 3600

_ROLLING_ORACLE = f"""
SELECT user_id, event_id, ({_DD_TS_S}) AS t_s,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS v_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY {_DD_TS_S}
             RANGE BETWEEN {_ROLL_W_S} PRECEDING AND CURRENT ROW)
"""


@query("rolling_1h_user_events", oracle=_ROLLING_ORACLE, tags=("relational", "window", "timeseries"))
def rolling_1h_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour activity features (count and value sum
    over a time-based RANGE frame per user) — the rolling-feature pattern
    behind fraud/abuse scoring and ML feature engineering, where every
    event needs its own trailing aggregate, not a bucketed one.

    Scale shape: one exchange on ``user_id``; the RANGE frame slides two
    pointers over each user's time-sorted partition (O(n) per partition,
    never re-scanning the window).  The value sum rides the decimal path
    so the trailing sum is order-exact; equal-timestamp events share a
    frame (RANGE semantics), making the result tie-independent.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-_ROLL_W_S, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.col("ts_s").alias("t_s"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.sum(F.round("value", 6).cast("decimal(18,6)")).over(w).cast("double").alias("v_1h"),
    )


# --- exponentially-weighted moving average (dyadic-exact) ---------------------

_EWMA_LAGS = 8  # trailing window length; alpha = 1/2 → weights 2^-j


def _ewma_terms() -> tuple[str, str]:
    """Numerator/denominator SQL for a trailing-``_EWMA_LAGS`` EWMA with
    alpha = 1/2, scaled by 2^(LAGS-1) so every term is an INTEGER: the
    weight of lag j is 2^(LAGS-1-j).  Ragged partition heads weight only
    the rows that exist (the denominator mirrors the CASE structure)."""
    s_terms, d_terms = [], []
    for j in range(_EWMA_LAGS):
        wt = 1 << (_EWMA_LAGS - 1 - j)
        if j == 0:
            s_terms.append(f"v6 * {wt}")
            d_terms.append(f"{wt}")
        else:
            ref = f"lag(v6, {j}) OVER w"
            s_terms.append(f"COALESCE({ref}, 0) * {wt}")
            d_terms.append(f"CASE WHEN {ref} IS NOT NULL THEN {wt} ELSE 0 END")
    return " + ".join(s_terms), " + ".join(d_terms)


def _ewma_sql(ts_expr: str, table: str, micros_expr: str) -> str:
    s, d = _ewma_terms()
    return f"""
SELECT user_id, event_id,
       round(CAST({s} AS DOUBLE) / ({d}) / 1000000.0, 6) AS ewma
FROM (SELECT user_id, event_id, {ts_expr} AS t_s,
             CAST({micros_expr} AS BIGINT) AS v6
      FROM {table})
WINDOW w AS (PARTITION BY user_id ORDER BY t_s, event_id)
"""


_EWMA_ORACLE = _ewma_sql(
    _DD_TS_S, "events", "FLOOR(value * 1000000.0 + 0.5)"
)


@query("ewma_user_value", oracle=_EWMA_ORACLE, tags=("relational", "window", "timeseries"))
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing exponentially-weighted moving average of
    ``value`` (alpha = 1/2 over the last 8 events per user) — the
    smoothing feature fraud/abuse scoring and time-series models want
    next to the linear rolling window (``rolling_1h_user_events``).

    EWMA is not frame-SUM-expressible (weights depend on distance from
    the current row), so the op expands the 8 ``lag`` terms explicitly —
    all over ONE window spec, so Spark plans a single Window operator on
    a single ``user_id`` exchange.  Exactness: values ride the FLOOR
    micros path (tie-safe on this column — the r9 proof in
    streaming/batch_equiv.py), weights are the dyadic ladder 2^(7-j)
    scaled integer, so numerator and denominator are exact BIGINTs
    (≤ 2^50) in any evaluation order; the single final double division +
    round(6) is bit-identical across engines.  Ragged heads (fewer than
    8 prior events) renormalize over the rows that exist — the standard
    adjusted-EWMA convention.

    Scale: one keyed exchange, O(1) state per row (8 lag slots), no
    frame re-scan — the same two-pointer cost class as the RANGE window.
    """
    e = table_view(spark, sf_dir, "events")
    return spark.sql(
        _ewma_sql("ts_s", e, "FLOOR(value * 1000000.0D + 0.5D)")
    )


# --- event-type transition matrix (sequence mining) ---------------------------


def _transitions_sql(ts_expr: str, table: str, intdiv: str) -> str:
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY {ts_expr}, event_id) AS prev_type
  FROM {table}
)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * 1000000 {intdiv} SUM(COUNT(*)) OVER (PARTITION BY prev_type)
            AS BIGINT) AS p_micro
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@query(
    "event_type_transitions",
    oracle=_transitions_sql(_DD_TS_S, "events", "//"),
    tags=("relational", "window", "sequence"),
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each ordered pair of
    consecutive event types within a user's stream, the transition count
    and its row-probability in integer micro-units — the Markov-chain
    summary behind next-action prediction, anomaly scoring, and funnel
    diagnostics (``funnel_conversion`` matches one fixed path; this
    measures ALL empirical transitions at once).

    Scale: one ``user_id``-keyed exchange for the lag, a bounded
    (|types|²) aggregation, and a window over the aggregate output keyed
    on prev_type — every post-lag structure is O(|vocabulary|²), corpus
    size only pays the single lag pass.  Probabilities ride exact
    integer division so the hash is partition-order-free.
    """
    e = table_view(spark, sf_dir, "events")
    return spark.sql(_transitions_sql("ts_s", e, "div"))


# --- time-series gap fill + forward fill ---------------------------------------


def _gap_fill_sql(
    ts_expr: str,
    table: str,
    micros_expr: str,
    intdiv: str,
    grid_from: str,
    last_nn: str,
) -> str:
    """Dialect-shared hourly gap-fill: observed per-hour readings, a dense
    per-user hour grid spanning [first, last] activity, and a forward-filled
    carry of the last observed reading onto the gap rows."""
    return f"""
WITH obs AS (
  SELECT user_id, ({ts_expr}) {intdiv} 3600 AS hb,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST({micros_expr} AS BIGINT)) AS BIGINT) AS v_micro
  FROM {table}
  GROUP BY user_id, ({ts_expr}) {intdiv} 3600
),
span AS (SELECT user_id, MIN(hb) AS h0, MAX(hb) AS h1 FROM obs GROUP BY user_id),
grid AS ({grid_from}),
joined AS (
  SELECT g.user_id, g.hb, o.n_events, o.v_micro
  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.hb = o.hb
)
SELECT user_id, hb * 3600 AS hour_start_s,
       COALESCE(n_events, CAST(0 AS BIGINT)) AS n_events,
       {last_nn} AS reading_micro,
       CAST(CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS INT) AS filled
FROM joined
WINDOW w AS (PARTITION BY user_id ORDER BY hb
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


_GAP_FILL_ORACLE = _gap_fill_sql(
    _DD_TS_S,
    "events",
    "FLOOR(value * 1000000.0 + 0.5)",
    "//",
    "SELECT user_id, unnest(generate_series(h0, h1)) AS hb FROM span",
    "last_value(v_micro IGNORE NULLS) OVER w",
)


@query(
    "gap_fill_user_hourly",
    oracle=_GAP_FILL_ORACLE,
    tags=("relational", "window", "timeseries"),
)
def gap_fill_user_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly time series per user with forward fill: every hour
    between a user's first and last event gets a row; hours with no
    events carry the most recent observed hourly reading forward
    (``filled = 1``) — the gap-fill + LOCF step that turns an irregular
    event stream into the regular grid downstream feature pipelines and
    time-series models require (TimescaleDB ``time_bucket_gapfill`` /
    ``locf`` semantics).

    Plan shape (verified executedPlan): TWO keyed exchanges total — one
    ``(user_id, hour)`` for the hourly pre-aggregation (partial agg
    collapses map-side first) and one ``user_id`` partitioning that
    Catalyst reuses across the span aggregate, the grid join, and the
    forward-fill window.  The grid explode is row-local from the
    3-column span table (one row per user), so the dense grid never
    shuffles raw events: at 100 TB the only corpus-sized pass is the
    first partial aggregation, and everything after is
    O(users × span-hours).

    Exactness: readings ride the FLOOR-micros path (tie-safe on
    ``events.value`` — the r9 proof in streaming/batch_equiv.py), the
    hourly SUM is an exact BIGINT, and the forward-fill window is
    deterministic (``hb`` is unique per user), so the carried value is
    bit-identical cross-engine.  First grid row per user is always
    observed (span starts at an observed hour), so ``reading_micro`` is
    never NULL.
    """
    e = table_view(spark, sf_dir, "events")
    return spark.sql(
        _gap_fill_sql(
            "ts_s",
            e,
            "FLOOR(value * 1000000.0D + 0.5D)",
            "div",
            "SELECT user_id, hb FROM span LATERAL VIEW explode(sequence(h0, h1)) AS hb",
            "last_value(v_micro, true) OVER w",
        )
    )


def _gap_interp_sql(
    ts_expr: str,
    table: str,
    micros_expr: str,
    intdiv: str,
    grid_from: str,
    nn: str,  # "spark" -> last_value(x, true); "duckdb" -> last_value(x IGNORE NULLS)
) -> str:
    """Dialect-shared linear-interpolation gap fill (same grid as
    ``_gap_fill_sql``; gap readings are the integer linear interpolation
    between the surrounding observed hours instead of a LOCF carry)."""

    def last_nn(x: str) -> str:
        return f"last_value({x}, true) OVER w1" if nn == "spark" else f"last_value({x} IGNORE NULLS) OVER w1"

    def first_nn(x: str) -> str:
        # next non-null AT OR AFTER the current hour.  Expressed as a
        # DESC running frame (last non-null from the partition top down
        # to the current row), NOT the equivalent ASC
        # ``first_value ... CURRENT ROW AND UNBOUNDED FOLLOWING``:
        # Spark evaluates an UnboundedFollowing frame by RECOMPUTING the
        # aggregate from each row to the partition end — O(rows²) per
        # partition (AggregateProcessor has no inverse op), which the
        # r11 20× stress caught as a single multi-minute window task
        # once AQE coalesced the grid into one partition — while both
        # engines evaluate a running UNBOUNDED PRECEDING frame
        # incrementally in O(rows).  Price: w2 needs its own DESC sort
        # (same hash exchange, one extra in-partition sort) — linear
        # always beats quadratic here.
        return f"last_value({x}, true) OVER w2" if nn == "spark" else f"last_value({x} IGNORE NULLS) OVER w2"

    return f"""
WITH obs AS (
  SELECT user_id, ({ts_expr}) {intdiv} 3600 AS hb,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST({micros_expr} AS BIGINT)) AS BIGINT) AS v_micro
  FROM {table}
  GROUP BY user_id, ({ts_expr}) {intdiv} 3600
),
span AS (SELECT user_id, MIN(hb) AS h0, MAX(hb) AS h1 FROM obs GROUP BY user_id),
grid AS ({grid_from}),
joined AS (
  SELECT g.user_id, g.hb, o.n_events, o.v_micro,
         CASE WHEN o.v_micro IS NOT NULL THEN g.hb END AS ob_h
  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.hb = o.hb
),
surround AS (
  SELECT user_id, hb, n_events, v_micro,
         {last_nn("v_micro")} AS pv, {last_nn("ob_h")} AS ph,
         {first_nn("v_micro")} AS nv, {first_nn("ob_h")} AS nh
  FROM joined
  WINDOW w1 AS (PARTITION BY user_id ORDER BY hb
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY user_id ORDER BY hb DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, hb * 3600 AS hour_start_s,
       COALESCE(n_events, CAST(0 AS BIGINT)) AS n_events,
       CASE WHEN v_micro IS NOT NULL THEN v_micro
            ELSE pv + ((nv - pv) * (hb - ph)) {intdiv} (nh - ph)
       END AS reading_micro,
       CAST(CASE WHEN v_micro IS NULL THEN 1 ELSE 0 END AS INT) AS filled
FROM surround
"""


_GAP_INTERP_ORACLE = _gap_interp_sql(
    _DD_TS_S,
    "events",
    "FLOOR(value * 1000000.0 + 0.5)",
    "//",
    "SELECT user_id, unnest(generate_series(h0, h1)) AS hb FROM span",
    "duckdb",
)


@query(
    "gap_fill_user_linear",
    oracle=_GAP_INTERP_ORACLE,
    tags=("relational", "window", "timeseries"),
)
def gap_fill_user_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation twin of ``gap_fill_user_hourly``: gap hours get
    the integer linear interpolation between the surrounding observed
    readings (``pv + (nv-pv)*(h-ph) div (nh-ph)`` in exact micro units)
    instead of a flat LOCF carry — the ``interpolate`` mode of
    TimescaleDB/InfluxDB gap filling, for signals where a reading drifts
    between observations rather than holding.

    Both surrounding observations exist for every gap row by
    construction (the span grid starts and ends at observed hours).
    Exactness: the interpolation is all-BIGINT; both engines TRUNCATE
    integer division toward zero (Spark ``div``, DuckDB ``//`` —
    verified on negative numerators, which occur whenever the next
    reading is below the previous), so the gap values are bit-identical
    with no float in the path.

    Plan shape: same two keyed exchanges as the LOCF twin; the
    backward- and forward-looking IGNORE NULLS fills share one
    ``user_id`` sort (same partitioning + ordering, per-function
    frames), so the interpolation adds window functions but no new
    exchange or sort.
    """
    e = table_view(spark, sf_dir, "events")
    return spark.sql(
        _gap_interp_sql(
            "ts_s",
            e,
            "FLOOR(value * 1000000.0D + 0.5D)",
            "div",
            "SELECT user_id, hb FROM span LATERAL VIEW explode(sequence(h0, h1)) AS hb",
            "spark",
        )
    )


# --- order-insensitive table integrity checksum --------------------------------

_CHECKSUM_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime, no bias on % mixes)


def _integrity_sql(table: str) -> str:
    """Deterministic cross-engine row hash: polynomial mix of the keyed
    numeric columns, each first reduced mod 2^31 so every product stays
    far under 2^63 in BOTH engines (DuckDB errors on int64 overflow
    where Spark wraps — the LCG lesson).  The linear mix is then
    SQUARED mod p before the cross-row SUM: a purely linear per-row
    hash would make the checksum a function of per-column sums only,
    so any corruption preserving column totals (row-to-row swaps,
    offsetting edits — exactly the structured sync errors this op
    targets) would pass undetected.  Squaring makes the hash nonlinear
    in the inputs while staying exact: mixed < p < 2^31, so
    mixed*mixed < 2^62 — safe int64 in both engines."""
    mixed = (
        f"(((o_orderkey % 2147483648) * 31"
        f" + (o_custkey % 2147483648) * 17"
        f" + (CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) % 2147483648) * 7)"
        f" % {_CHECKSUM_MOD})"
    )
    row_h = f"(({mixed} * {mixed}) % {_CHECKSUM_MOD})"
    return f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST({row_h} AS DECIMAL(28,0))) AS DECIMAL(28,0))
            % {_CHECKSUM_MOD} AS BIGINT) AS checksum
FROM {table}
GROUP BY o_orderstatus
"""


@query(
    "integrity_checksum_orders",
    oracle=_integrity_sql("orders"),
    tags=("relational", "integrity", "pipeline"),
)
def integrity_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-partition table fingerprint — the
    replication/migration validation primitive (compare source and
    target checksums per status partition instead of shipping rows; a
    mismatch names the slice to re-sync).  The row hash is a polynomial
    mix of key and money columns (cents via the proven FLOOR path), each
    reduced mod 2^31 BEFORE multiplying so the arithmetic is exact
    int64 in both engines, then squared mod p so the hash is NONLINEAR
    in the inputs — value swaps and offsetting edits that preserve
    per-column totals change the checksum (a linear mix would not
    detect them); the cross-row SUM is order-insensitive by
    construction and carried as DECIMAL(28,0) (a long sum could overflow
    at 100 TB row counts — decimal is exact and still map-side
    combinable), then reduced mod 2^31−1 to a BIGINT for the emitted
    fingerprint (decimal render formats differ across engines; the mod
    loses no comparison power — unequal sums collide with probability
    ~2^-31 per slice, same as any fingerprint).

    Scale: one scan, partial+final agg on a bounded key — the cheapest
    possible full-table pass; at 100 TB this is the op you run AFTER a
    migration, not a constraint you hope held.
    """
    o = table_view(spark, sf_dir, "orders")
    return spark.sql(_integrity_sql(o))


# --- incremental aggregate maintenance ---------------------------------------

_INCR_ORACLE = f"""
WITH base AS (
  SELECT ({_DD_TS_S}) // 86400 AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS v
  FROM events WHERE event_id % 10 <> 0
  GROUP BY 1, 2
),
delta AS (
  SELECT ({_DD_TS_S}) // 86400 AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS v
  FROM events WHERE event_id % 10 = 0
  GROUP BY 1, 2
)
SELECT COALESCE(b.day, d.day) AS day,
       COALESCE(b.event_type, d.event_type) AS event_type,
       COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n,
       CAST(COALESCE(b.v, 0) + COALESCE(d.v, 0) AS DOUBLE) AS v
FROM base b FULL OUTER JOIN delta d
  ON b.day = d.day AND b.event_type = d.event_type
"""


@query("incremental_agg_merge", oracle=_INCR_ORACLE, tags=("relational", "agg", "incremental"))
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: merge a new
    micro-batch's partial rollup (here: every 10th event standing in for
    the day's arrivals) into the standing daily rollup with a full-outer
    coalesce-and-add — the update step of every incrementally maintained
    dashboard table, equivalent to recomputing from scratch because count
    and decimal-sum are commutative mergeable states.

    Scale shape: both rollups aggregate partial/final down to the tiny
    (day × type) domain BEFORE the merge join, so the full-outer join is
    dimension-sized regardless of fact volume; at 100 TB the standing
    side reads from the previous materialization, not the fact table.
    """
    e = load_table(spark, sf_dir, "events")

    def rollup(pred):
        return (
            e.where(pred)
            .groupBy(
                F.expr("ts_s div 86400").alias("day"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.round("value", 6).cast("decimal(18,6)"))
                .cast("decimal(28,6)")
                .alias("v"),
            )
        )

    base = rollup(F.col("event_id") % 10 != 0)
    delta = rollup(F.col("event_id") % 10 == 0)
    b, d = base.alias("b"), delta.alias("d")
    return b.join(
        d,
        (F.col("b.day") == F.col("d.day"))
        & (F.col("b.event_type") == F.col("d.event_type")),
        "full_outer",
    ).select(
        F.coalesce(F.col("b.day"), F.col("d.day")).alias("day"),
        F.coalesce(F.col("b.event_type"), F.col("d.event_type")).alias("event_type"),
        (F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
        (
            F.coalesce(F.col("b.v"), F.lit(0).cast("decimal(28,6)"))
            + F.coalesce(F.col("d.v"), F.lit(0).cast("decimal(28,6)"))
        )
        .cast("double")
        .alias("v"),
    )


# --- exact percentile as a WINDOW aggregate (trailing median) ---------------

_WINDOW_MEDIAN_ORACLE = """
SELECT o_custkey, o_orderkey,
       median(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med_cents
FROM (SELECT o_custkey, o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders)
"""


@query("window_median_trailing", oracle=_WINDOW_MEDIAN_ORACLE, tags=("relational", "window", "percentile"))
def window_median_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact EXACT-percentile aggregate as a window function: per customer,
    the trailing-5-order median order value — the robust rolling
    center-line a monitoring pipeline prefers over a mean that outliers
    drag (``rolling_1h_user_events`` covers the sum/count frame; this is
    the order-statistic frame).

    Scale: one exchange keyed on ``o_custkey``, then a single ordered
    window pass; the ROWS frame holds ≤5 values per step so the per-row
    selection is O(frame log frame) with constant memory — unlike a
    whole-partition percentile, this never buffers a key's full history.
    Values ride integer CENTS (HALF_UP, the engine's money convention);
    both engines interpolate the even-count median as the mean of the two
    middle values, exact in double at cent granularity.
    """
    o = table_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT o_custkey, o_orderkey,
               percentile(cents, 0.5D) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med_cents
        FROM (SELECT o_custkey, o_orderkey,
                     CAST(FLOOR(o_totalprice * 100 + 0.5D) AS BIGINT) AS cents
              FROM {o})
    """)


# --- LATERAL correlated subquery (per-row dependent top-k) ------------------

_LATERAL_ORACLE = """
SELECT c.c_custkey, t.o_orderkey, t.cents
FROM customer c,
     LATERAL (SELECT o_orderkey,
                     CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM orders o
              WHERE o.o_custkey = c.c_custkey
              ORDER BY cents DESC, o_orderkey ASC
              LIMIT 3) t
WHERE c.c_custkey % 50 = 0
"""


@query("lateral_topk_per_customer", oracle=_LATERAL_ORACLE, tags=("relational", "lateral", "topk"))
def lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 4 lateral join): each sampled
    customer pairs with its own top-3 orders by value — the dependent-
    subquery surface ANSI/DuckDB users expect, distinct from the window
    formulation (``topk_per_group``) even though Catalyst decorrelates it
    into a join + per-key limit rather than a per-row loop.

    Scale: the decorrelated plan joins the (filtered) outer keys to the
    orders scan on ``o_custkey`` and applies the group limit — one keyed
    shuffle, no nested-loop re-execution; the ``% 50`` sample bounds the
    outer side the way a real probe query would.  Money rides integer
    cents; ORDER BY carries the orderkey tie-break for determinism.
    """
    c = table_view(spark, sf_dir, "customer")
    o = table_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT c.c_custkey, t.o_orderkey, t.cents
        FROM {c} c,
             LATERAL (SELECT o_orderkey,
                             CAST(FLOOR(o.o_totalprice * 100 + 0.5D) AS BIGINT) AS cents
                      FROM {o} o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY cents DESC, o_orderkey ASC
                      LIMIT 3) t
        WHERE c.c_custkey % 50 = 0
    """)


# --- recursive CTE (iteration INSIDE one SQL statement) ---------------------

_RECURSIVE_SPINE_ORACLE = """
WITH RECURSIVE bounds AS (
  SELECT min(epoch_us(ts) // 1000000 // 86400) AS d0,
         max(epoch_us(ts) // 1000000 // 86400) AS d1
  FROM events
),
spine(day, d1) AS (
  SELECT d0, d1 FROM bounds
  UNION ALL
  SELECT day + 1, d1 FROM spine WHERE day < d1
),
agg AS (
  SELECT epoch_us(ts) // 1000000 // 86400 AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT spine.day, COALESCE(agg.n_events, 0) AS n_events
FROM spine LEFT JOIN agg USING (day)
"""


@query("recursive_day_spine", oracle=_RECURSIVE_SPINE_ORACLE, tags=("relational", "recursive", "timeseries"))
def recursive_day_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (``WITH RECURSIVE``, Spark 4): generate the dense day
    spine over the events span by iteration inside one SQL statement,
    left-join the daily counts, zero-fill — the declarative-iteration
    surface (hierarchies, reachability, sequence generation) that the
    engine's driver-loop fixpoints (CC, PageRank) deliberately avoid; for
    a BOUNDED recursion like a date spine it belongs in SQL.
    ``gapfill_time_spine`` is the ``sequence()`` twin of the same result —
    prefer it when the bound is a plain range; the recursive form is the
    general one (step logic can depend on the previous row).

    Scale: the recursion carries the max bound as a column (no correlated
    scalar subquery in the step — portable and evaluated once); each
    iteration emits one row, the spine is O(days), and the only real
    shuffle is the daily aggregate.  All-integer day arithmetic — exact.
    """
    e = table_view(spark, sf_dir, "events")
    return spark.sql(f"""
        WITH RECURSIVE bounds AS (
          SELECT min(ts_s div 86400) AS d0, max(ts_s div 86400) AS d1 FROM {e}
        ),
        spine(day, d1) AS (
          SELECT d0, d1 FROM bounds
          UNION ALL
          SELECT day + 1, d1 FROM spine WHERE day < d1
        ),
        agg AS (
          SELECT ts_s div 86400 AS day, COUNT(*) AS n_events
          FROM {e} GROUP BY 1
        )
        SELECT spine.day, COALESCE(agg.n_events, 0) AS n_events
        FROM spine LEFT JOIN agg USING (day)
    """)


# --- mergeable distinct-count sketches (bitmap exact / DataSketches HLL) ----

_BITMAP_DISTINCT_ORACLE = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS distinct_customers
FROM orders
GROUP BY o_orderpriority
"""


@query(
    "bitmap_exact_distinct_customers",
    oracle=_BITMAP_DISTINCT_ORACLE,
    tags=("relational", "agg", "sketch"),
)
def bitmap_exact_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-at-scale via re-aggregatable roaring-style bitmaps
    (``bitmap_construct_agg`` / ``bitmap_or_agg`` / ``bitmap_count``,
    Spark 3.5+) — the pre-aggregated-distinct pattern ``COUNT(DISTINCT)``
    cannot give you: the inner level builds one bitmap per
    (priority, month, 32k-key bucket), the outer level OR-merges months
    into per-(priority, bucket) bitmaps and sums bucket cardinalities.
    Because bitmaps are mergeable, the monthly partials are exactly what a
    100 TB pipeline would PERSIST as an incremental daily rollup table:
    any ad-hoc grain (here: priority) is answered by OR-ing partials
    without ever rescanning the fact table — and unlike HLL the answer is
    exact.  The oracle is plain ``COUNT(DISTINCT)``: the hash passes only
    if construct → merge → count is lossless.

    Scale: the bucket key caps each bitmap at 32768 bits (4 KB dense) so
    no single group's bitmap grows with the key domain; both levels are
    partial-aggregated map-side (bitmap OR is associative+commutative),
    giving the standard two-exchange rollup with O(priorities × buckets)
    state — never a per-key distinct expansion.
    """
    o = table_view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT o_orderpriority,
               CAST(SUM(bitmap_count(merged)) AS BIGINT) AS distinct_customers
        FROM (
            SELECT o_orderpriority, bucket, bitmap_or_agg(bm) AS merged
            FROM (
                SELECT o_orderpriority,
                       (year(o_orderdate) * 100 + month(o_orderdate)) AS mon,
                       bitmap_bucket_number(o_custkey) AS bucket,
                       bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
                FROM {o}
                GROUP BY 1, 2, 3
            )
            GROUP BY 1, 2
        )
        GROUP BY o_orderpriority
    """)


#: Like approx_distinct_parts, the sketch VALUE is engine-specific — the
#: accuracy contract is the oracle: DataSketches HLL at default lgK=12 has
#: relative standard error ~1.04/sqrt(4096) ≈ 1.6%; the 5% flag is ~3σ, and
#: the sketch hash is seedless, so the flag is deterministic per dataset.
#: exact_customers is value-checked against DuckDB; a broken sketch or a
#: lossy union flips within_bounds and the hash.
_HLL_ROLLUP_ORACLE = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS within_bounds
FROM orders
GROUP BY o_orderpriority
"""


@query(
    "hll_sketch_rollup_customers",
    oracle=_HLL_ROLLUP_ORACLE,
    tags=("relational", "agg", "sketch", "approx"),
)
def hll_sketch_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable DataSketches HLL rollup (``hll_sketch_agg`` →
    ``hll_union_agg`` → ``hll_sketch_estimate``, Spark 3.5+) — the
    APPROXIMATE twin of ``bitmap_exact_distinct_customers`` and the other
    half of the persisted-partial pattern: per-(priority, month) sketches
    are what the 100 TB pipeline stores (a few KB each, constant in key
    cardinality — bitmaps grow with the domain, HLL does not), and any
    coarser grain is answered by unioning sketches without rescanning.
    ``approx_count_distinct`` gives the same estimate but NOT the
    re-aggregatable sketch column — this surfaces the sketch itself
    through a union re-aggregation before estimating.

    The exact count rides along purely as the oracle anchor (one extra
    distinct agg on the 5-row output grain, broadcast-joined); the bound
    flag asserts the merged estimate lands within 5% (~3σ at lgK=12) of
    it — see the oracle note.
    """
    o = load_table(spark, sf_dir, "orders")
    mon = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("mon")
    monthly = o.select("o_orderpriority", mon, "o_custkey").groupBy(
        "o_orderpriority", "mon"
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    merged = monthly.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    return exact.join(F.broadcast(merged), "o_orderpriority").select(
        "o_orderpriority",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("within_bounds"),
    )


# --- interval overlap join (two-sided range predicate, bucket-grid rewrite) ---


def _overlap_iv(ts_s: str, table: str, intdiv: str) -> str:
    return f"""
iv AS (
  SELECT user_id, ({ts_s}) {intdiv} 86400 AS d,
         MIN({ts_s}) AS s, MAX({ts_s}) AS e
  FROM {table}
  WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
"""


_OVERLAP_ORACLE = f"""
WITH {_overlap_iv(f"({_DD_TS_S})", "events", "//")}
SELECT CAST(a.d AS BIGINT) AS day_k,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS total_overlap_s
FROM iv a JOIN iv b
  ON a.d = b.d AND a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
GROUP BY a.d
"""


@query(
    "interval_overlap_pairs",
    oracle=_OVERLAP_ORACLE,
    tags=("relational", "join", "range", "timeseries"),
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP self-join — the two-sided range predicate
    (``a.s <= b.e AND b.s <= a.e``) that naive engines execute as a
    nested-loop theta join — rewritten to the bucket-grid form: each
    per-(user, day) purchase-activity interval explodes into the epoch
    HOURS it covers, candidates meet through a plain equi-join on the
    hour cell, and the exact predicate filters within the cell.  Two
    overlapping intervals always share the hour containing any overlap
    instant, so recall is exact; the pair key (day, u1, u2) is unique per
    day (one interval per user-day), so the post-join DISTINCT removes
    multi-cell duplicates.  Per day the result aggregates to pair count +
    total overlap seconds (all-integer arithmetic).

    The oracle runs the DIRECT theta join — same result through the
    opposite physical strategy, which is exactly what the rewrite must
    preserve.  Scale: candidate work is Σ(per-hour-cell²) instead of the
    theta join's Σ(per-day²); cell width tunes the explode-factor/
    selectivity trade (``join_range_bucketed`` makes the same argument
    for one-sided ranges), and intervals are day-bounded by construction
    (≤24 cells; unbounded intervals would split at day seams first).
    The join is ASYMMETRIC, which buys both dedup and candidate count:
    only one side (``cov``) explodes into the cells its span covers; the
    other (``st``) contributes its START cell alone.  Orient every pair
    so ``b`` is the later-starting interval — then the overlap starts at
    ``b.s``, lies in exactly one cell, and ``a`` covers that cell by
    definition: each qualifying pair is found EXACTLY once with no
    DISTINCT, and candidates are Σ(coverage·starts) per cell instead of
    Σ(coverage²).  Two earlier cuts measured at the 5× stress point:
    symmetric explode + SELECT DISTINCT 25.9 s (the duplicate pairs make
    a shuffle of the join output), symmetric explode + overlap-start-cell
    predicate 3.9 s (dedup free, candidates still quadratic in coverage),
    this form ~2 s — see SCALE.md §11.  Equal-start ties break on
    user_id so self-pairs and double-counts are excluded row-locally.
    """
    e = table_view(spark, sf_dir, "events")
    return spark.sql(f"""
        WITH {_overlap_iv("ts_s", e, "div")},
        cov AS (
          SELECT d, user_id, s, e,
                 explode(sequence(s div 3600, e div 3600)) AS cell
          FROM iv
        ),
        st AS (
          SELECT d, user_id, s, e, s div 3600 AS cell FROM iv
        )
        SELECT CAST(d AS BIGINT) AS day_k,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(oe - os) AS BIGINT) AS total_overlap_s
        FROM (
          SELECT a.d, b.s AS os, least(a.e, b.e) AS oe
          FROM cov a JOIN st b
            ON a.cell = b.cell AND a.d = b.d
          WHERE (a.s < b.s OR (a.s = b.s AND a.user_id < b.user_id))
            AND b.s <= a.e
        )
        GROUP BY d
    """)


# --- SCD2 point-in-time lookup (dimensional PIT join) -------------------------


def _pit_sql(ts_s: str, table: str) -> str:
    return f"""
WITH dim AS (
  SELECT user_id, event_type AS state, t_s AS valid_from,
         COALESCE(lead(t_s) OVER (PARTITION BY user_id ORDER BY t_s, event_id) - 1,
                  -1) AS valid_to
  FROM (
    SELECT user_id, event_id, event_type, ({ts_s}) AS t_s,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ({ts_s}), event_id) AS prev
    FROM {table} WHERE event_type <> 'purchase'
  )
  WHERE prev IS NULL OR prev <> event_type
),
fact AS (
  SELECT user_id, event_id AS purchase_id, ({ts_s}) AS p_t
  FROM {table} WHERE event_type = 'purchase'
)
SELECT f.purchase_id, f.user_id, d.state,
       d.valid_from AS state_since
FROM fact f LEFT JOIN dim d
  ON f.user_id = d.user_id
 AND d.valid_from <= f.p_t
 AND (d.valid_to = -1 OR f.p_t <= d.valid_to)
"""


@query(
    "scd2_point_in_time_purchases",
    oracle=_pit_sql(_DD_TS_S, "events"),
    tags=("relational", "scd", "join", "cdc"),
)
def scd2_point_in_time_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) dimension lookup over an SCD2 history — the
    canonical warehouse join: each fact row (purchase) joins the dimension
    VERSION that was valid at fact time (which non-purchase activity run
    the user was in), i.e. ``f.t BETWEEN d.valid_from AND d.valid_to``
    with an open current version.  LEFT keeps pre-first-state purchases
    (NULL state) — the outer PIT semantics reporting needs.  Complements
    ``scd2_intervals_events`` (builds the history) and
    ``join_asof_purchase_signup`` (the union-carry as-of form): PIT
    against an EXISTING interval table cannot re-derive carry state — the
    containment join IS the operator.

    Scale: the join is a plain EQUI join on the dimension's natural key
    (user_id) — co-partitioned both sides, broadcastable when the dim
    fits — and the containment predicate is a row-local post-filter.
    Per-key candidates are (facts/key × versions/key): bounded by version
    count per entity, which SCD2 bounds by change frequency, not corpus
    size; an entity whose version count explodes is the same skew any
    keyed join handles (salt or split its interval at time seams).  No
    interval explode is needed because intervals per key are disjoint —
    the Σ(cell²) machinery of ``interval_overlap_pairs`` solves the
    harder overlapping-set case.
    """
    e = table_view(spark, sf_dir, "events")
    return spark.sql(_pit_sql("ts_s", e))


# --- interval coalescing (gaps-and-islands with variable-length spans) --------

IC_BASE_S = 60   # minimum activity-interval length (seconds)
IC_MOD = 541     # event_id-keyed length spread (prime, up to ~9 min extra)

_IC_ORACLE = f"""
WITH iv AS (
  SELECT user_id, event_id, ({_DD_TS_S}) AS s,
         ({_DD_TS_S}) + {IC_BASE_S} + event_id % {IC_MOD} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e, event_id,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
                OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT user_id, CAST(island AS BIGINT) AS island_seq,
       CAST(MIN(s) AS BIGINT) AS start_s,
       CAST(MAX(e) AS BIGINT) AS end_s,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(e) - MIN(s) AS BIGINT) AS span_s
FROM islands GROUP BY user_id, island
"""


@query(
    "events_interval_coalesce",
    oracle=_IC_ORACLE,
    tags=("relational", "events", "intervals"),
)
def events_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge each user's overlapping/adjacent activity intervals into
    maximal islands — the interval-coalesce primitive (IP-lease merging,
    reservation consolidation, uptime stitching) that completes the
    interval family: ``interval_overlap_pairs`` finds crossings between
    sets, ``scd2_*`` versions rows, this FLATTENS one set.  Every event
    opens an interval [ts, ts + 60 + event_id % 541) — the
    variable-length spread is what makes this a genuinely different
    operator from ``sessionize_events``: with mixed lengths a long
    interval can swallow several short successors, so island detection
    MUST compare each start against the RUNNING MAX of all previous ends
    (a lag(end) gap test — sessionize's shape — would wrongly split
    whenever a short interval nests inside a long one's shadow).

    Scale shape: one hash exchange on user_id; the running-max flag and
    the running-sum island id ride the SAME window sort, so Catalyst plans
    the windows without a second exchange, and the final roll-up groups on
    (user_id, island) — a prefix of the existing partitioning.  All values
    are epoch-second BIGINTs (ns timestamps via the catalog's ts_s shim);
    event_id tiebreak keeps equal-start ordering total in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.col("ts_s").alias("s"),
        (F.col("ts_s") + IC_BASE_S + F.col("event_id") % IC_MOD).alias("e"),
    )
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_end = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "is_new",
        F.when(prev_max_end.isNull() | (F.col("s") > prev_max_end), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return islands.groupBy(
        "user_id", F.col("island").cast("bigint").alias("island_seq")
    ).agg(
        F.min("s").cast("bigint").alias("start_s"),
        F.max("e").cast("bigint").alias("end_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("e") - F.min("s")).cast("bigint").alias("span_s"),
    )


# --- time-weighted average (TWAP) ---------------------------------------------

_TWAP_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id, ({_DD_TS_S}) AS ts_s,
         ({_DD_TS_S}) // 86400 AS day_k,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v_c
  FROM events
),
g AS (
  SELECT user_id, day_k, ts_s, v_c,
         lead(ts_s) OVER (PARTITION BY user_id, day_k
                          ORDER BY ts_s, event_id) - ts_s AS gap
  FROM t
)
SELECT user_id, CAST(day_k * 86400 AS BIGINT) AS day_s,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS dwell_s,
       CAST(CASE WHEN COALESCE(SUM(gap), 0) = 0 THEN NULL
                 ELSE SUM(v_c * gap) // SUM(gap) END AS BIGINT) AS twap_c
FROM g GROUP BY user_id, day_k
"""


@query("twap_user_daily", oracle=_TWAP_ORACLE, tags=("relational", "events", "timeseries"))
def twap_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user-per-day TIME-weighted average of the event value — the
    TWAP/TWAS primitive (billing meters, position marks, sensor duty
    cycles) that complements the COUNT-weighted family (``ewma_user_value``
    weights by event order, plain AVG weights every event equally): each
    observation holds until the next one, so its weight is the gap to its
    successor, and the day's value is Σ(v·gap)/Σ(gap).  Days with a single
    event (or all events at one instant) have zero dwell and an undefined
    TWAP — emitted as NULL, never a fake zero.

    Fixed-point contract: values enter as exact integer cents
    (FLOOR(v·100+0.5) — the engine's proven money path), gaps are integer
    seconds, and the TWAP is one BIGINT division — no float crosses an
    aggregation in either engine.  Scale shape: one hash exchange on
    (user_id, day_k); the lead() gap and the roll-up group share that
    partitioning (no second exchange); duplicate timestamps get zero gap
    weight under the event_id-tiebroken order, identically in both
    engines.  At 100 TB this is the shape you want: day-keyed state,
    linear scan, no global sort.
    """
    e = load_table(spark, sf_dir, "events")
    t = e.select(
        "user_id",
        "event_id",
        "ts_s",
        F.expr("ts_s div 86400").alias("day_k"),
        F.expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)").alias("v_c"),
    )
    w = W.partitionBy("user_id", "day_k").orderBy("ts_s", "event_id")
    g = t.withColumn("gap", F.lead("ts_s").over(w) - F.col("ts_s"))
    return g.groupBy("user_id", "day_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.coalesce(F.sum("gap"), F.lit(0)).cast("bigint").alias("dwell_s"),
        F.when(
            F.coalesce(F.sum("gap"), F.lit(0)) == 0, F.lit(None).cast("bigint")
        )
        .otherwise(F.expr("sum(v_c * gap) div sum(gap)"))
        .cast("bigint")
        .alias("twap_c"),
    ).select(
        "user_id",
        (F.col("day_k") * 86400).cast("bigint").alias("day_s"),
        "n_events",
        "dwell_s",
        "twap_c",
    )


# --- per-key OLS trend (closed-form regression) ------------------------------

_TREND_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS xs,
         CAST(round(value * 100) AS BIGINT) AS yc
  FROM events
),
base AS (SELECT user_id, MIN(xs) AS x0 FROM ev GROUP BY user_id),
c AS (
  SELECT e.user_id, e.xs - b.x0 AS x, e.yc AS y
  FROM ev e JOIN base b USING (user_id)
),
s AS (
  SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM c GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(n * sxy - sx * sy AS BIGINT) AS num,
       CAST(n * sxx - sx * sx AS BIGINT) AS den,
       CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END
            * ((2000 * abs(n * sxy - sx * sy) + (n * sxx - sx * sx))
               // (2 * (n * sxx - sx * sx))) AS BIGINT) AS slope_e3
FROM s WHERE n * sxx - sx * sx > 0
"""


@query("trend_user_value", oracle=_TREND_ORACLE, tags=("timeseries", "regression"))
def trend_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event value over time — closed-form OLS
    from sufficient statistics (n, Σx, Σy, Σx², Σxy), the per-entity
    drift detector that flags decaying/ramping behavior without any
    iterative fit.

    Exactness: x is epoch seconds CENTERED on the user's first event
    (two-pass min-join — centering is what keeps Σx² inside BIGINT;
    raw 2024 epochs squared overflow 64 bits by 10×), y is integer
    cents.  The slope numerator/denominator are then exact BIGINT
    rationals, emitted as-is, plus a half-away-from-zero integer
    quotient at e3 (the nonneg-operand div regime both engines share).
    Single-point users (den = 0) are excluded — no NULL-vs-0 ambiguity.

    Scale shape: two user-keyed hash aggregations and one equi-join,
    all map-side combinable, output O(users).  The bound story is in
    the docstring because it matters at 100 TB: |num| ≤ n²·x̄·ȳ — for
    longer histories production re-centers per window or scales x to
    hours; the arithmetic is the same."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts_s").alias("xs"),
        F.round(F.col("value") * 100).cast("bigint").alias("yc"),
    )
    base = ev.groupBy("user_id").agg(F.min("xs").alias("x0"))
    c = ev.join(base, "user_id").select(
        "user_id", (F.col("xs") - F.col("x0")).alias("x"), F.col("yc").alias("y")
    )
    s = c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.select(
            "user_id",
            F.col("n").cast("bigint").alias("n_events"),
            num.cast("bigint").alias("num"),
            den.cast("bigint").alias("den"),
        )
        .where(F.col("den") > 0)
        .withColumn(
            "slope_e3",
            (
                F.when(F.col("num") < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.expr("(2000 * abs(num) + den) div (2 * den)")
            ).cast("bigint"),
        )
    )
