"""Scalar function coverage: string / date-time / math / array / JSON.

The reference's only scalar surface is NumPy elementwise math inside chunk
maps (SURVEY.md §2.A A4 [M]: ``scanpy_spark.py`` ``log1p``); everything here
is the additional engine surface of SURVEY.md §2.B, expressed with built-in
``pyspark.sql.functions`` so the expressions stay inside whole-stage codegen
(no Python in the hot path).

Cross-engine notes (Spark vs DuckDB oracle):
- day-of-week conventions differ (Spark ``dayofweek``=1..7 Sun-first vs
  DuckDB ``dayofweek``=0..6); the portable form used here is ISO
  (Mon=1..Sun=7): Spark ``weekday()+1`` == DuckDB ``isodow``.
- token counting uses ``regexp_extract_all('\\S+')``, which never produces
  empty tokens (``split`` keeps trailing empties in some engines).
- transcendentals (ln/exp) can differ by one ulp between the JVM and libm;
  per-row results are rounded to 6 decimals (see functions/compat.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.compat import big, day_str, r6
from ..registry import query

_STR_ORACLE = """
SELECT doc_id,
       lower(substr(text, 1, 16)) AS head_lower,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       n_chars,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       regexp_extract(text, '^\\s*(\\S+)', 1) AS first_token,
       concat_ws('|', lang, source) AS lang_source,
       CAST(levenshtein(substr(lower(text), 1, 12), 'information') AS BIGINT) AS lev_info,
       regexp_replace(lower(substr(text, 1, 40)), '[^a-z ]', '') AS alpha_head,
       contains(lower(text), 'data') AS mentions_data
FROM documents
"""


@query("str_funcs_documents", oracle=_STR_ORACLE, tags=("functions", "string"))
def str_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function sweep over documents (lower/substr/length/regexp/
    concat_ws/levenshtein/contains)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 16)).alias("head_lower"),
        big(F.length("text"), "n_chars_computed"),
        "n_chars",
        big(F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)")), "n_tokens"),
        F.regexp_extract("text", r"^\s*(\S+)", 1).alias("first_token"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        big(F.levenshtein(F.substring(F.lower("text"), 1, 12), F.lit("information")), "lev_info"),
        F.regexp_replace(F.lower(F.substring("text", 1, 40)), "[^a-z ]", "").alias("alpha_head"),
        F.contains(F.lower("text"), F.lit("data")).alias("mentions_data"),
    )


_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95
FROM orders
"""


@query("date_funcs_orders", oracle=_DATE_ORACLE, tags=("functions", "datetime"))
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time-function sweep (extract fields, trunc, interval math,
    last_day, datediff) — all emitted as BIGINT/string for oracle parity."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        big(F.year(d), "yr"),
        big(F.month(d), "mo"),
        big(F.dayofmonth(d), "dom"),
        big(F.quarter(d), "qtr"),
        big(F.weekday(d) + 1, "iso_dow"),
        day_str(F.date_trunc("month", d), "month_start"),
        day_str(F.date_add(d.cast("date"), 90), "plus_90d"),
        day_str(F.last_day(d), "month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since_95"),
    )


_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(ln(l_extendedprice), 6) AS ln_price,
       round(exp(l_discount), 6) AS exp_disc,
       round(sqrt(l_quantity), 6) AS sqrt_qty,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       abs(l_quantity - 25.0) AS qty_dev,
       floor(l_extendedprice / 1000) AS price_k_floor,
       ceil(l_extendedprice / 1000) AS price_k_ceil,
       round(l_extendedprice, -2) AS price_rounded,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
       round(log10(l_extendedprice), 6) AS log10_price
FROM lineitem
"""


@query("math_funcs_lineitem", oracle=_MATH_ORACLE, tags=("functions", "math"))
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function sweep (ln/exp/sqrt/pow/abs/floor/ceil/round/mod/log10)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    qty = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(F.log(price), "ln_price"),
        r6(F.exp("l_discount"), "exp_disc"),
        r6(F.sqrt(qty), "sqrt_qty"),
        r6(F.pow(qty, 2), "qty_sq"),
        F.abs(qty - 25.0).alias("qty_dev"),
        F.floor(price / 1000).cast("double").alias("price_k_floor"),
        F.ceil(price / 1000).cast("double").alias("price_k_ceil"),
        F.round(price, -2).alias("price_rounded"),
        (qty.cast("bigint") % 7).alias("qty_mod7"),
        r6(F.log10(price), "log10_price"),
    )


_ARRAY_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_v,
       round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS min_v,
       round(list_aggregate(list_transform(embedding[1:8],
             x -> CAST(x AS DOUBLE)), 'sum'), 6) AS head8_sum,
       CAST(embedding[1] > 0 AS BOOLEAN) AS first_pos
FROM embeddings
"""


@query("array_funcs_embeddings", oracle=_ARRAY_ORACLE, tags=("functions", "array"))
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate/slice) — the
    engine's wide-matrix idiom (SURVEY.md §1.1: one array per cell).

    The fold-based sums are sequential left-folds in both engines, so the
    doubles are bit-identical; rounding is only one-ulp insurance.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        big(F.size(emb), "dim"),
        r6(
            F.sqrt(F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x))),
            "l2_norm",
        ),
        big(F.size(F.filter(emb, lambda x: x > 0)), "n_pos"),
        r6(F.array_max(emb).cast("double"), "max_v"),
        r6(F.array_min(emb).cast("double"), "min_v"),
        r6(
            F.aggregate(F.slice(emb, 1, 8), F.lit(0.0), lambda acc, x: acc + dbl(x)),
            "head8_sum",
        ),
        (F.element_at(emb, 1) > 0).alias("first_pos"),
    )


_JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS BIGINT) AS n_k_gt50,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
"""


@query("json_funcs_events", oracle=_JSON_ORACLE, tags=("functions", "json"))
def json_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``events.props`` string column
    (``get_json_object`` / DuckDB ``json_extract_string``) + aggregation."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.count_if(F.col("k") > 50).alias("n_k_gt50"),
            F.max("k").alias("k_max"),
        )
    )


_MAP_ORACLE = """
SELECT event_id,
       CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
       array_to_string(list_sort(json_keys(props)), ',') AS key_csv,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.missing') IS NULL AS missing_absent
FROM events
"""


@query("map_funcs_events", oracle=_MAP_ORACLE, tags=("functions", "map", "json"))
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed JSON handling: parse ``events.props`` into
    ``map<string,string>`` (schema-free — keys unknown ahead of time, the
    realistic props shape), then ``map_keys``/``element_at`` (SURVEY.md
    §2.B "Map/JSON fns")."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        big(F.size(F.map_keys(m)), "n_keys"),
        # Scalar string, not array<string>: the driver's canonicalizer sorts
        # on every output column and cannot hash array cells (r2 fail).
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("key_csv"),
        F.element_at(m, "k").cast("bigint").alias("k_val"),
        F.element_at(m, "missing").isNull().alias("missing_absent"),
    )


# --- VARIANT semi-structured lane (Spark 4 type surface) ----------------------

_VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*) AS c,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(*) FILTER (json_extract(props, '$.missing') IS NOT NULL) AS BIGINT) AS n_present_key
FROM events GROUP BY event_type
"""


@query("variant_props_rollup", oracle=_VARIANT_ORACLE, tags=("functions", "variant", "json"))
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured rollup through Spark 4's **VARIANT** type:
    ``parse_json`` ingests the raw ``props`` JSON once into the binary
    variant encoding, ``try_variant_get`` path-extracts typed values, and
    absent paths degrade to NULL instead of erroring — the modern lane for
    schema-on-read event payloads (``json_funcs_events`` covers the
    classic get_json_object/from_json string lane).

    Scale: variant parse + path extraction are row-local (one scan
    projection); the rollup is a bounded-key groupBy with native partial
    aggregation.  Integer payloads keep the oracle exact.
    """
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    # key-presence count: extract as VARIANT (no cast) and exclude JSON
    # null via is_variant_null — probed identical to DuckDB's
    # `json_extract(...) IS NOT NULL` on all four cases (absent / JSON
    # null / integer / non-integer); a bigint-cast count would miss
    # non-integer values the oracle counts
    present = F.try_variant_get(v, "$.missing", "variant")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count_if(present.isNotNull() & ~F.is_variant_null(present)).alias(
            "n_present_key"
        ),
    )
