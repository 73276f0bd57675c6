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
- ``decontaminate_ngram_overlap``: word-8-gram overlap of every corpus doc
  against a held-out benchmark slice — the eval-set contamination check.
- ``corpus_health_report``  : per-(source, lang) dup/short rates + mean
  token/alpha stats — the source-admission dashboard rollup.

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
        .select("doc_id", "n_tokens", offset.alias("offset_tokens"))
        # Integer ``div`` (repo convention: never float "/" on a boundary
        # computation) — float division only coincides with the oracle's
        # "//" while offsets stay below 2^53, which a 100 TB corpus breaks.
        .withColumn("shard", F.expr(f"offset_tokens div {TOKENS_PER_SHARD}"))
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


# --- corpus health report ------------------------------------------------------

_HEALTH_ORACLE = f"""
WITH per_doc AS (
  SELECT source, lang,
         doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS is_dup,
         length(text) < {MIN_CHARS} AS too_short,
         length(regexp_extract_all(text, '\\S+')) AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000000
           // greatest(length(text), 1) AS alpha_micro
  FROM documents
)
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN too_short THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       round(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
       round(CAST(SUM(alpha_micro) AS DOUBLE) / (COUNT(*) * 1000000), 6) AS avg_alpha
FROM per_doc
GROUP BY source, lang
"""


@query("corpus_health_report", oracle=_HEALTH_ORACLE, tags=("text", "pipeline", "report"))
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus health dashboard: doc counts, exact-dup and
    too-short rates, mean token count, mean alphabetic ratio — the rollup a
    pipeline team reviews before admitting a crawl source into the mixture.

    One content-keyed window for the dup flag (shared shape with
    ``doc_curation_flags``), then a single partial+final aggregation on the
    bounded (source, lang) key.  Ratios ride integer micro-unit sums with
    one final division, so the hash is order-insensitive at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        "lang",
        (F.col("doc_id") != F.min("doc_id").over(W.partitionBy("text"))).alias("is_dup"),
        (F.length("text") < MIN_CHARS).alias("too_short"),
        F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).cast("bigint").alias("n_tokens"),
        F.expr(
            # integer `div`, never float `/`: floor semantics must match the
            # oracle's `//` exactly at ratio boundaries
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS BIGINT) * 1000000"
            " div greatest(length(text), 1)"
        ).alias("alpha_micro"),
    )
    return per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("bigint").alias("n_dup"),
        F.sum(F.when(F.col("too_short"), 1).otherwise(0)).cast("bigint").alias("n_short"),
        F.round(F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6).alias("avg_tokens"),
        F.round(
            F.sum("alpha_micro").cast("double") / (F.count(F.lit(1)) * 1000000), 6
        ).alias("avg_alpha"),
    )


# --- benchmark decontamination -----------------------------------------------

CONTAM_NGRAM = 8  # word n-gram width (the published decontam range is 8–13)
CONTAM_BENCH_MOD = 20  # doc_id % 20 == 0 -> the held-out "benchmark" slice
CONTAM_HIT_DEN = 5  # contaminated iff n_hits / n_ngrams >= 1/5

_CONTAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, p, p + {CONTAM_NGRAM - 1}), ' ') AS g
  FROM (SELECT doc_id, toks, unnest(range(1, length(toks) - {CONTAM_NGRAM} + 2)) AS p
        FROM tok WHERE length(toks) >= {CONTAM_NGRAM})
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {CONTAM_BENCH_MOD} = 0),
corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % {CONTAM_BENCH_MOD} <> 0),
tot AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM corpus GROUP BY doc_id),
hit AS (SELECT c.doc_id, COUNT(*) AS n_hits
        FROM corpus c JOIN bench b ON c.g = b.g GROUP BY c.doc_id)
SELECT t.doc_id,
       CAST(t.n_ngrams AS BIGINT) AS n_ngrams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_ngrams, 6) AS contamination_rate,
       COALESCE(h.n_hits, 0) * {CONTAM_HIT_DEN} >= t.n_ngrams AS is_contaminated
FROM tot t LEFT JOIN hit h ON h.doc_id = t.doc_id
"""


@query("decontaminate_ngram_overlap", oracle=_CONTAM_ORACLE, tags=("text", "pipeline", "dedup"))
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for every corpus document, the fraction
    of its distinct word-8-grams that also appear in a held-out benchmark
    slice (here ``doc_id % 20 == 0`` stands in for the eval set) — the
    n-gram-overlap check run on every serious pretraining corpus before
    training.  Docs shorter than 8 tokens have no 8-grams and are exempt.

    Scale shape: n-gramming is a row-local explode; the benchmark n-gram
    set is tiny relative to the corpus (real eval suites are MBs vs 100 TB)
    so the membership probe is an explicitly-broadcast semi-join — the
    corpus side never shuffles.  The contaminated flag is integer
    arithmetic (``n_hits·5 ≥ n_ngrams``) so no float boundary can disagree
    across engines; at 100 TB hash each n-gram with ``xxhash64`` before the
    join to shrink the broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.expr(r"regexp_extract_all(text, '\\S+', 0)").alias("toks")
    ).where(F.size("toks") >= CONTAM_NGRAM)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {CONTAM_NGRAM - 1}),"
                f" p -> concat_ws(' ', slice(toks, p, {CONTAM_NGRAM})))"
            )
        ).alias("g"),
    ).distinct()
    bench = grams.where(F.col("doc_id") % CONTAM_BENCH_MOD == 0).select("g").distinct()
    corpus = grams.where(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
    tot = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        corpus.join(F.broadcast(bench), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return tot.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_ngrams",
        n_hits.cast("bigint").alias("n_hits"),
        F.round(n_hits.cast("double") / F.col("n_ngrams"), 6).alias("contamination_rate"),
        (n_hits * CONTAM_HIT_DEN >= F.col("n_ngrams")).alias("is_contaminated"),
    )


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


# --- mixture rebalancing -------------------------------------------------------

_MIX_ORACLE = f"""
WITH n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_in FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n_in) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_src FROM n),
r AS (
  SELECT source, n_in,
         least(1000000, (t.total * 1000000) // (t.n_src * n_in)) AS rate_micro
  FROM n, t
),
k AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM documents d JOIN r USING (source)
  WHERE (d.doc_id * {_KNUTH}) % {_P31} % 1000000 < r.rate_micro
  GROUP BY d.source
)
SELECT r.source, r.n_in, CAST(r.rate_micro AS BIGINT) AS rate_micro,
       COALESCE(k.n_kept, 0) AS n_kept
FROM r LEFT JOIN k USING (source)
"""


@query("mixture_resample_sources", oracle=_MIX_ORACLE, tags=("text", "pipeline", "sampling"))
def mixture_resample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward a uniform per-source mixture by
    deterministic hash downsampling: each source's keep-rate is
    ``min(1, total / (n_sources x n_source_docs))`` in integer micro-units,
    so overrepresented crawls shrink to their fair share and small sources
    pass through untouched — the mixture-weighting step between curation
    and shard packing, auditable because the admit decision is the same
    ``doc_id x K mod p`` hash as ``sample_stratified_hash`` (no RNG state,
    stable under repartitioning).

    Scale shape: the rate table is one tiny aggregate (O(sources) rows)
    that broadcast-joins back to the fact scan; the admit filter is
    row-local; the only full-width shuffle is the final per-source count,
    which partial-aggregates map-side.  All arithmetic is integer-exact.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
    t = n.agg(
        F.sum("n_in").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    r = n.crossJoin(F.broadcast(t)).select(
        "source",
        "n_in",
        F.least(
            F.lit(1000000).cast("bigint"),
            F.expr("(total * 1000000) div (n_src * n_in)"),
        ).alias("rate_micro"),
    )
    kept = (
        d.join(F.broadcast(r.select("source", "rate_micro")), "source")
        .where((F.col("doc_id") * _KNUTH) % _P31 % 1000000 < F.col("rate_micro"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return r.join(kept, "source", "left").select(
        "source",
        "n_in",
        F.col("rate_micro").cast("bigint").alias("rate_micro"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
    )


def curation_with_observed_qc(spark: SparkSession, sf_dir: str):
    """``doc_curation_flags`` with an attached ``Observation`` collecting
    the run's QC counters (total / kept / per-reason drop counts) as
    JOB-SIDE metrics — the production pattern for pipeline health
    telemetry: the counters ride the SAME job as the output (accumulator
    semantics, zero extra scans or jobs), where a separate ``count()``
    per metric would re-execute the pipeline once per counter.

    Returns ``(df, observation)``; ``observation.get`` blocks until an
    action on ``df`` has run.  Asserted against independently recomputed
    aggregates in ``tests/test_micro_fixtures.py``.
    """
    from pyspark.sql import Observation

    obs = Observation("curation_qc")
    df = doc_curation_flags(spark, sf_dir).observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("keep")).alias("n_keep"),
        F.count_if(F.col("is_dup")).alias("n_dup"),
        F.count_if(F.col("too_short")).alias("n_short"),
        F.count_if(F.col("low_alpha")).alias("n_low_alpha"),
    )
    return df, obs


# --- table profiling (the ANALYZE/stats-collection shape) --------------------

_PROFILE_COLS = (
    ("o_orderkey", "CAST({c} AS STRING)"),
    ("o_custkey", "CAST({c} AS STRING)"),
    ("o_orderstatus", "{c}"),
    # doubles stringify via DECIMAL(18,2): both engines render the same
    # text (raw double->string scientific-notation thresholds differ)
    ("o_totalprice", "CAST(CAST({c} AS DECIMAL(18,2)) AS STRING)"),
    ("o_orderdate", "CAST({c} AS STRING)"),
    ("o_orderpriority", "{c}"),
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN({fmt.format(c=c)}) AS min_s, MAX({fmt.format(c=c)}) AS max_s
FROM orders"""
    for c, fmt in _PROFILE_COLS
)


@query("profile_orders_columns", oracle=_PROFILE_ORACLE, tags=("profiling", "stats"))
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile (the ANALYZE / stats-collection shape every
    catalog and data-quality pipeline runs): row count, null count, exact
    distinct count, and min/max per column, melted to one row per column.

    Scale shape: ONE scan — all 6×4 aggregates ride a single global
    aggregation (the oracle's 6-scan UNION is the naive twin).  Multiple
    exact COUNT(DISTINCT col) in one agg makes Spark EXPAND the input
    6× before the exchange (the documented multi-distinct cost): fine for
    a profile job; at 100 TB swap exact distincts for
    ``approx_count_distinct`` (single-pass HLL sketches, no Expand) and
    keep exact counts only where contractual.  String renderings of
    doubles go through DECIMAL(18,2) so both engines print identical text.
    """
    from ..catalog import table_view

    o = table_view(spark, sf_dir, "orders")
    agg_exprs = []
    for c, fmt in _PROFILE_COLS:
        s = fmt.format(c=c)
        agg_exprs += [
            f"COUNT({c}) AS cnt_{c}",
            f"COUNT(DISTINCT {c}) AS nd_{c}",
            f"MIN({s}) AS mn_{c}",
            f"MAX({s}) AS mx_{c}",
        ]
    stack_args = ", ".join(
        f"'{c}', n_total - cnt_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in _PROFILE_COLS
    )
    return spark.sql(f"""
        SELECT col, n_total AS n_rows, n_null, n_distinct, min_s, max_s
        FROM (
            SELECT COUNT(*) AS n_total, {", ".join(agg_exprs)} FROM {o}
        )
        LATERAL VIEW stack({len(_PROFILE_COLS)}, {stack_args})
            AS col, n_null, n_distinct, min_s, max_s
    """)


# --- weighted sampling (Efraimidis–Spirakis exponential keys) -----------------

_WSAMPLE_K = 20
#: deterministic uniform in (0,1]: LCG permutation of doc_id over 2^31.
#: doc_id reduced mod 2^31 BEFORE the multiply so the int64 product
#: cannot overflow (DuckDB errors where Spark wraps, ~doc_id>=8.4e9 —
#: the event_disorder_profile bound); collisions past 2^31 ids only
#: coarsen the randomness, and the doc_id tiebreak keeps order stable.
_WS_U = "(((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 + 1) / 2147483648.0"

_WSAMPLE_ORACLE = f"""
SELECT doc_id, CAST(w AS BIGINT) AS w, round(es_key, 6) AS es_key
FROM (
  SELECT doc_id, length(text) AS w,
         -ln({_WS_U}) / length(text) AS es_key
  FROM documents WHERE length(text) > 0
)
ORDER BY round(es_key, 6) ASC, doc_id ASC
LIMIT {_WSAMPLE_K}
"""


@query("sample_weighted_es", oracle=_WSAMPLE_ORACLE, tags=("pipeline", "sampling", "weighted"))
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis–Spirakis 2006):
    each document draws an exponential key ``-ln(u)/w`` from a
    deterministic uniform ``u`` (LCG permutation of doc_id — seedable in
    production) and the k SMALLEST keys are the weighted sample — here
    length-weighted, the "sample long documents proportionally more"
    shape mixture pipelines use (`sample_stratified_hash` is the
    equal-rate per-stratum twin; this is the per-item-weight one).

    Scale: entirely row-local key computation + a TakeOrdered top-k
    (per-partition heaps, no global sort, no shuffle of the corpus) —
    the textbook distributed one-pass weighted sampler; k·P driver merge.
    Determinism: integer LCG is exact in both engines; ``ln`` on the
    same double is IEEE-identical in practice, and ranking uses the
    6-dp-rounded key with a doc_id tie-break (the bm25 pattern), so the
    selected set is stable cross-engine.
    """
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    u = F.expr(_WS_U)
    key = -F.log(u) / F.length("text")
    return (
        d.select(
            "doc_id",
            F.length("text").cast("bigint").alias("w"),
            F.round(key, 6).alias("es_key"),
        )
        .orderBy(F.asc("es_key"), F.asc("doc_id"))
        .limit(_WSAMPLE_K)
    )


# --- referential-integrity audit ----------------------------------------------

#: (relationship label, child table, child key, parent table, parent key).
#: The full FK graph of the star schema — the ingest-validation sweep a
#: pipeline runs before admitting a new data drop.
RI_RELATIONSHIPS = (
    ("lineitem->orders",   "lineitem", "l_orderkey",  "orders",   "o_orderkey"),
    ("lineitem->part",     "lineitem", "l_partkey",   "part",     "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey",   "supplier", "s_suppkey"),
    ("orders->customer",   "orders",   "o_custkey",   "customer", "c_custkey"),
    ("customer->nation",   "customer", "c_nationkey", "nation",   "n_nationkey"),
    ("supplier->nation",   "supplier", "s_nationkey", "nation",   "n_nationkey"),
    ("nation->region",     "nation",   "n_regionkey", "region",   "r_regionkey"),
)

#: COALESCE + the empty-child CASE keep the degenerate drop LOUD-but-sane:
#: an empty child table must report (0, 0, 0) — a NULL n_orphan would slip
#: past any `n_orphan == 0` admission predicate, which is the exact class
#: of silent pass an ingest gate exists to prevent.
_RI_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{rel}' AS rel, CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(COALESCE(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_orphan,
       CAST(CASE WHEN COUNT(*) = 0 THEN 0
            ELSE COALESCE(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END), 0)
                 * 1000000 // COUNT(*) END AS BIGINT) AS orphan_ppm
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
  ON c.{ck} = p.{pk}"""
    for rel, child, ck, parent, pk in RI_RELATIONSHIPS
)


@query("referential_integrity_audit", oracle=_RI_ORACLE, tags=("quality", "audit", "join"))
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-key audit over every foreign-key edge of the star schema —
    the ingest gate that runs before a data drop is admitted: for each
    child→parent relationship, the child row count, the number of child
    rows whose key has NO parent (orphans), and the orphan rate in ppm.
    One output row per relationship, so the result is a constant-size
    health report however large the tables.

    Orphan detection is a LEFT join against the DISTINCT parent keys with
    a NULL-probe count — the same multiset the driver would get from
    NOT EXISTS, including the NULL-key edge (a NULL child key never
    matches, so it counts as an orphan — the conservative reading an
    admission gate wants).  Scale shape: each relationship is ONE keyed
    join; every parent key set here is dimension-sized (AQE broadcasts
    them), and the one fact-fact edge (lineitem→orders) hash-joins on the
    natural key with map-side-partial count aggregation above it.  The
    seven audits are independent branches union'd into one plan — on a
    cluster they schedule concurrently; nothing is collected per-edge.
    """
    parts = []
    for rel, child, ck, parent, pk in RI_RELATIONSHIPS:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        orphans = F.coalesce(
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)), F.lit(0)
        )
        parts.append(
            c.join(p, "k", "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child"),
                orphans.cast("bigint").alias("n_orphan"),
            )
            .select(
                F.lit(rel).alias("rel"),
                "n_child",
                "n_orphan",
                F.when(F.col("n_child") == 0, F.lit(0))
                .otherwise(F.expr("n_orphan * 1000000 div n_child"))
                .cast("bigint")
                .alias("orphan_ppm"),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


# --- fixed-length sequence packing (concat-and-chunk) ------------------------

#: tokens per packed training sequence (the trainer's context length).
SEQ_PACK_LEN = 512

_SEQ_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, length(regexp_extract_all(text, '\\S+')) AS n_tokens
  FROM documents
),
run AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_tokens AS off
  FROM toks WHERE n_tokens > 0
),
spans AS (
  SELECT doc_id, off, off + n_tokens AS e,
         unnest(range(CAST(off // {SEQ_PACK_LEN} AS BIGINT),
                      CAST((off + n_tokens - 1) // {SEQ_PACK_LEN} + 1 AS BIGINT))) AS seq_id
  FROM run
)
SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(greatest(off, seq_id * {SEQ_PACK_LEN})
            - seq_id * {SEQ_PACK_LEN} AS BIGINT) AS seq_off,
       CAST(least(e, (seq_id + 1) * {SEQ_PACK_LEN})
            - greatest(off, seq_id * {SEQ_PACK_LEN}) AS BIGINT) AS n_tok
FROM spans
"""


@query(
    "pack_token_sequences",
    oracle=_SEQ_PACK_ORACLE,
    tags=("text", "pipeline", "pack"),
)
def pack_token_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the pretraining layout where
    every document's tokens join ONE global stream (doc_id order) that
    is cut into fixed {SEQ_LEN}-token training sequences, documents
    SPLITTING across cuts (unlike ``shard_pack_by_tokens``, which keeps
    documents whole).  Output is the sequence composition map the
    trainer's sampler needs: one row per (sequence, document) span with
    the span's offset inside the sequence and its token count — Σ n_tok
    per seq_id is exactly {SEQ_LEN} except the final partial sequence,
    and attention-mask resets fall out of the seq_off boundaries.

    Scale shape: token offsets ride the same two-level block prefix
    scan as the shard packer (per-block window + broadcast block-totals
    prefix — no unpartitioned full-table window); the span explode emits
    n_docs + n_seqs rows total, and every boundary is integer ``div``
    arithmetic (exact past 2^53 where a 100 TB corpus lives).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
        .cast("bigint")
        .alias("n_tokens"),
        F.expr(f"doc_id div {SHARD_BLOCK}").alias("blk"),
    ).where(F.col("n_tokens") > 0)
    block_tot = toks.groupBy("blk").agg(F.sum("n_tokens").alias("btot"))
    prev_w = W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)
    block_prefix = block_tot.select(
        "blk", F.coalesce(F.sum("btot").over(prev_w), F.lit(0)).alias("prev_tot")
    )
    in_blk = (
        W.partitionBy("blk")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off = (
        F.col("prev_tot") + F.sum("n_tokens").over(in_blk) - F.col("n_tokens")
    ).cast("bigint")
    L = SEQ_PACK_LEN
    spans = (
        toks.join(F.broadcast(block_prefix), "blk")
        .select("doc_id", "n_tokens", off.alias("off"))
        .withColumn("e", F.col("off") + F.col("n_tokens"))
        .select(
            "doc_id",
            "off",
            "e",
            F.explode(
                F.sequence(
                    F.expr(f"off div {L}"), F.expr(f"(e - 1) div {L}")
                )
            ).alias("seq_id"),
        )
    )
    seq_start = F.col("seq_id") * L
    lo = F.greatest(F.col("off"), seq_start)
    hi = F.least(F.col("e"), seq_start + L)
    return spans.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        (lo - seq_start).cast("bigint").alias("seq_off"),
        (hi - lo).cast("bigint").alias("n_tok"),
    )
