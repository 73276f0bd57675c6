"""Training-data curation pipeline operators over ``documents`` (north-star
block; absent in the reference — these are the composite ops an LLM-corpus
pipeline runs after the per-signal passes in textanalysis.py/dedup.py).

The stages every large pretraining corpus goes through:

- ``doc_curation_flags``   : one keep/drop verdict per document combining
  exact-dup detection, length bounds, and an alphabetic-ratio filter —
  the join-plus-row-local shape of a production quality gate.
- ``shard_pack_by_tokens`` : assign documents to fixed-token-budget output
  shards by global running token count — the "sequence packing" layout
  step before tokenizer/trainer ingestion.
- ``sample_stratified_hash``: deterministic per-language downsampling via
  integer hashing — the mixture-reweighting step, reproducible across
  engines and runs (no RNG state).
- ``events_iqr_outliers``   : Tukey-fence outlier detection on a numeric
  stream — the measurement-quality twin of the text gate.

Scale shapes: curation's only shuffle is the dup-grouping on ``text``
(at 100 TB key it on ``xxhash64(text)`` to shrink shuffle width); shard
packing uses the same two-level parallel prefix scan as the watermark twin
(streaming/batch_equiv.py) — no unpartitioned full-table window; sampling
is a pure row-local filter that pushes to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

MIN_CHARS = 50
MIN_ALPHA_RATIO = 0.45  # zh docs are mostly CJK glyphs; keep them (ratio ~0)
TOKENS_PER_SHARD = 2000
SHARD_BLOCK = 256  # docs per prefix-scan block

#: per-language keep-rate (percent) for the stratified sample.
LANG_RATES = {"en": 50, "zh": 80, "es": 70, "de": 70, "fr": 70}
DEFAULT_RATE = 60
_KNUTH = 2654435761  # Fibonacci-hash multiplier; doc_id·K mod p is well-mixed
_P31 = 2147483647


# --- keep/drop quality gate --------------------------------------------------

_CURATION_ORACLE = f"""
WITH flagged AS (
  SELECT doc_id, lang,
         doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS is_dup,
         length(text) < {MIN_CHARS} AS too_short,
         round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1), 6) AS alpha_ratio
  FROM documents
)
SELECT doc_id, lang, is_dup, too_short,
       (alpha_ratio < {MIN_ALPHA_RATIO} AND lang <> 'zh') AS low_alpha,
       NOT (is_dup OR too_short OR (alpha_ratio < {MIN_ALPHA_RATIO} AND lang <> 'zh')) AS keep
FROM flagged
"""


@query("doc_curation_flags", oracle=_CURATION_ORACLE, tags=("text", "pipeline", "dedup"))
def doc_curation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop verdict per document: exact-duplicate (not the lowest
    doc_id for its text), too-short, or low-alphabetic-ratio (latin
    languages only — zh is legitimately non-alphabetic) ⇒ drop, with each
    reason surfaced as its own flag so downstream can audit drop causes.

    The dup flag is a min-over-text window — one shuffle keyed on the
    content (at 100 TB: on ``xxhash64(text)``); every other signal is
    row-local and stays in the scan's codegen stage.
    """
    d = load_table(spark, sf_dir, "documents")
    alpha_ratio = F.round(
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double")
        / F.greatest(F.length("text"), F.lit(1)),
        6,
    )
    flagged = d.select(
        "doc_id",
        "lang",
        (F.col("doc_id") != F.min("doc_id").over(W.partitionBy("text"))).alias("is_dup"),
        (F.length("text") < MIN_CHARS).alias("too_short"),
        alpha_ratio.alias("alpha_ratio"),
    )
    low_alpha = (F.col("alpha_ratio") < MIN_ALPHA_RATIO) & (F.col("lang") != "zh")
    return flagged.select(
        "doc_id",
        "lang",
        "is_dup",
        "too_short",
        low_alpha.alias("low_alpha"),
        (~(F.col("is_dup") | F.col("too_short") | low_alpha)).alias("keep"),
    )


# --- token-budget shard packing ----------------------------------------------

_SHARD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, length(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents
),
run AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS offset_tokens
  FROM toks
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(offset_tokens AS BIGINT) AS offset_tokens,
       CAST(offset_tokens // {TOKENS_PER_SHARD} AS BIGINT) AS shard
FROM run
"""


@query("shard_pack_by_tokens", oracle=_SHARD_ORACLE, tags=("text", "pipeline", "shard"))
def shard_pack_by_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a fixed-token-budget output shard: shard =
    (global running token count before this doc) div budget, in doc_id
    order — the deterministic layout step that turns a curated corpus into
    trainer-sized shards.

    The running sum is a two-level parallel prefix scan (identical pattern
    to the watermark twin): per-block running sums under a window
    *partitioned* by doc-block, plus a tiny per-block-totals prefix that
    broadcasts back.  All-integer arithmetic; no unpartitioned full-table
    window at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).cast("bigint").alias("n_tokens"),
        F.expr(f"doc_id div {SHARD_BLOCK}").alias("blk"),
    )
    block_tot = toks.groupBy("blk").agg(F.sum("n_tokens").alias("btot"))
    prev_w = W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)
    block_prefix = block_tot.select(
        "blk", F.coalesce(F.sum("btot").over(prev_w), F.lit(0)).alias("prev_tot")
    )
    in_blk = W.partitionBy("blk").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    offset = (F.col("prev_tot") + F.sum("n_tokens").over(in_blk) - F.col("n_tokens")).cast(
        "bigint"
    )
    return (
        toks.join(F.broadcast(block_prefix), "blk")
        .select(
            "doc_id",
            "n_tokens",
            offset.alias("offset_tokens"),
            (offset / TOKENS_PER_SHARD).cast("bigint").alias("shard"),
        )
    )


# --- deterministic stratified sampling ---------------------------------------

def _rate_case_sql() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in LANG_RATES.items())
    return f"CASE lang {whens} ELSE {DEFAULT_RATE} END"


_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, (doc_id * {_KNUTH}) % {_P31} % 100 AS h
FROM documents
WHERE (doc_id * {_KNUTH}) % {_P31} % 100 < {_rate_case_sql()}
"""


@query("sample_stratified_hash", oracle=_SAMPLE_ORACLE, tags=("text", "pipeline", "sampling"))
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mixture downsampling with a deterministic integer hash:
    keep a doc iff ``(doc_id·K mod p) mod 100`` falls under its language's
    keep-rate — reproducible across engines, runs, and partitionings (no
    RNG state, unlike ``df.sample``), which is what makes a training
    mixture auditable.  Pure row-local filter; pushes into the scan.
    """
    d = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * _KNUTH) % _P31 % 100
    rate = F.coalesce(
        F.create_map(*[F.lit(x) for kv in LANG_RATES.items() for x in kv])[F.col("lang")],
        F.lit(DEFAULT_RATE),
    )
    return d.select("doc_id", "lang", h.alias("h")).where(F.col("h") < rate)


# --- IQR outlier detection ---------------------------------------------------

IQR_K = 1.5

_IQR_ORACLE = f"""
WITH b AS (
  SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
  FROM events
)
SELECT e.event_id, e.user_id, e.value,
       e.value < b.q1 - {IQR_K} * (b.q3 - b.q1) AS is_low,
       e.value > b.q3 + {IQR_K} * (b.q3 - b.q1) AS is_high
FROM events e, b
WHERE e.value < b.q1 - {IQR_K} * (b.q3 - b.q1)
   OR e.value > b.q3 + {IQR_K} * (b.q3 - b.q1)
"""


@query("events_iqr_outliers", oracle=_IQR_ORACLE, tags=("pipeline", "quality", "percentile"))
def events_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection on the event value stream: rows
    outside [q1 − 1.5·IQR, q3 + 1.5·IQR] — the numeric-column twin of the
    text quality gate (``doc_curation_flags``), used to drop corrupt
    measurements before a feature pipeline.

    The quartiles are one scalar aggregate (Spark ``percentile`` ==
    DuckDB ``quantile_cont`` exactly) broadcast-cross-joined to the scan —
    no collect round-trip, same plan at any scale; at 100 TB swap in
    ``approx_percentile`` bounds (``agg_approx_percentiles`` is that
    path).
    """
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - IQR_K * iqr
    hi = F.col("q3") + IQR_K * iqr
    return (
        e.crossJoin(F.broadcast(bounds))
        .where((F.col("value") < lo) | (F.col("value") > hi))
        .select(
            "event_id",
            "user_id",
            "value",
            (F.col("value") < lo).alias("is_low"),
            (F.col("value") > hi).alias("is_high"),
        )
    )
