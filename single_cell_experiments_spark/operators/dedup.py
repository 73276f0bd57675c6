"""Deduplication operators over ``documents`` (north-star block; absent in
the reference — SURVEY.md §2.B "Dedup").

Each tier is a ``queries()`` entry with a full DuckDB oracle:

- exact           : hash-groupBy on the raw text
- normalized exact: casefold + punctuation-collapse, then hash-groupBy
- MinHash + LSH   : char-5-gram shingles → H permuted min-hashes → banded
                    bucket join → exact-Jaccard verification of candidates
- containment     : asymmetric |A∩B|/|A| scoring over the LSH candidates
                    (quote/subset/boilerplate-wrapper duplication)
- SimHash         : sign-aggregated shingle-hash bits → blocked hamming join
- n-gram Jaccard  : word-trigram Jaccard within a (lang) block
- edit distance   : blocked levenshtein join on fixed-length prefixes
                    (typo/OCR-level duplication the set tiers miss)
- embedding-cosine: sign-LSH candidate pairs → keeper/removal list
- connected components / PageRank over the near-dup pair graph: cluster
  canonicalization and connectivity ranking (iterative, integer-exact)
- cluster keeper  : longest-doc-per-component keep/drop verdict (CC labels
  joined back onto the corpus)
- triangle counts : per-doc triangle participation over the pair graph
  (cluster-density metric for per-cluster dedup policy)

Cross-engine determinism: every hash is a *polynomial codepoint hash*
computed with plain integer SQL arithmetic (Spark ``ascii``/DuckDB
``unicode`` both return the full codepoint — verified), so Spark and DuckDB
agree bit-for-bit.  At 100 TB you'd swap the shingle hash for the built-in
``xxhash64`` (JVM-side, faster, no oracle twin) — a one-line change noted
per query.

Scale shape (MinHash): shingling is a row-local explode; signatures are one
groupBy(doc) with H min-aggregates (partial agg collapses map-side);
banding re-keys O(docs×bands) tiny rows; the bucket self-join only explodes
within a bucket (that *is* LSH); verification joins only candidate pairs.
No step is quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ..session import materialize

# --- shared constants (both dialects generated from these) -------------------

SHINGLE_K = 5
MERSENNE31 = 2147483647
#: (a, b) pairs for the H=12 minhash permutations h_i(x) = (a*x + b) mod p.
MINHASH_COEF = [
    (131, 911), (211, 337), (307, 751), (401, 173),
    (503, 619), (607, 283), (701, 547), (809, 431),
    (907, 97), (127, 683), (223, 859), (317, 241),
]
BANDS, ROWS_PER_BAND = 3, 4
MINHASH_JACCARD_MIN = 0.15
SIMHASH_BITS = 16
SIMHASH_MAX_HAMMING = 3
TRIGRAM_JACCARD_MIN = 0.15

_POW31 = [31 ** (SHINGLE_K - 1 - i) for i in range(SHINGLE_K)]


def _shingle_hash_sql(char_fn: str, text: str = "text", p: str = "p") -> str:
    """Polynomial hash of the 5 chars at position p (1-based), as SQL.

    Codepoints are cast to BIGINT before the multiply: CJK codepoints
    (~2e4) times 31^4 overflow INT32, which Spark's ANSI mode rejects.
    """
    terms = [
        f"CAST({char_fn}(substr({text}, {p}+{i}, 1)) AS BIGINT)*{w}"
        if w > 1
        else f"CAST({char_fn}(substr({text}, {p}+{i}, 1)) AS BIGINT)"
        for i, w in enumerate(_POW31)
    ]
    return "(" + " + ".join(terms) + ")"


_SPARK_SHINGLES = f"""
SELECT doc_id, {_shingle_hash_sql('ascii')} AS h
FROM __docs LATERAL VIEW explode(sequence(1, length(text) - {SHINGLE_K - 1})) AS p
WHERE length(text) >= {SHINGLE_K}
"""

_DD_SHINGLES = f"""
SELECT doc_id, {_shingle_hash_sql('unicode')} AS h
FROM (SELECT doc_id, text, unnest(range(1, length(text) - {SHINGLE_K - 2})) AS p
      FROM documents WHERE length(text) >= {SHINGLE_K})
"""

_MH_AGGS = ",\n       ".join(
    f"MIN(({a}*h + {b}) % {MERSENNE31}) AS mh{i}" for i, (a, b) in enumerate(MINHASH_COEF)
)
def _band_sig_exprs(bands: int, rows_per_band: int) -> list[str]:
    """Band-signature SQL expressions over the H=12 minhash columns:
    band b = the concat of its ``rows_per_band`` consecutive minhashes.
    ``bands × rows_per_band`` must not exceed H.  The banding pair is the
    recall/cost dial of LSH: collision probability for a pair at Jaccard
    J is ``1 − (1 − J^rows)^bands`` — fewer rows per band catch low-J
    pairs that longer bands structurally miss (measured: the 3×4 default
    collides only 28% of true pairs in the J≈0.15–0.3 regime, SCALE §13),
    at the cost of looser buckets (larger Σ(bucket²) candidate volume)."""
    if bands * rows_per_band > len(MINHASH_COEF):
        raise ValueError(
            f"banding {bands}x{rows_per_band} needs more than the "
            f"H={len(MINHASH_COEF)} minhashes"
        )
    return [
        "concat_ws(',', "
        + ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + ")"
        for b in range(bands)
    ]


_BAND_SIGS = _band_sig_exprs(BANDS, ROWS_PER_BAND)

#: High-recall banding over the SAME 12 minhashes: 6 bands × 2 rows.
#: At J=0.2 the pair-collision probability is 1−(1−0.2²)⁶ ≈ 0.22 versus
#: 1−(1−0.2⁴)³ ≈ 0.005 for the 3×4 default — the dial that answers the
#: measured low-J recall gap without recomputing signatures.
BANDS_HIRECALL, ROWS_PER_BAND_HIRECALL = 6, 2
_BAND_SIGS_HIRECALL = _band_sig_exprs(BANDS_HIRECALL, ROWS_PER_BAND_HIRECALL)


#: LSH bucket-size cap: a (band, sig) bucket larger than this is dropped
#: from candidate generation.  Oversized buckets are collision sinks, not
#: signal — the r11 20× stress measured ONE degenerate bucket of 26,650
#: docs (355M candidate pairs from a single bucket; total bound 770M =
#: 2,400× the 1× bound of 321k, because copy-invariant punctuation
#: shingles captured the minhashes across synthesized copies) — and the
#: standard banded-LSH mitigation is a size cap: each true near-dup pair
#: has ``bands`` independent chances to collide, so it is lost only if
#: EVERY one of its buckets is over-cap, while Σ(bucket²) becomes
#: cap-bounded.  2000 is 5× the largest bucket ever observed at the
#: verified scales (398 at sf0.1), so registered results are unchanged;
#: at the 20× stress point the cap admits 12.3M of the 770M bound
#: (drops 48 degenerate buckets).  Shared SQL — both engines apply it.
#:
#: MEASURED recall (r12, SCALE.md §13): in the 20× degenerate-copy corpus
#: the drop-only cap keeps just 5.5% of true pairs — the over-cap buckets
#: ARE the signal when duplicates are what filled them.  Hence the cap is
#: a parameter on every builder (``cap=``), the per-band census is a
#: registered query (``dedup_lsh_bucket_audit``), and the production
#: answer for over-cap buckets is the STAR-SALVAGE tier
#: (``dedup_minhash_lsh_star``: O(n) verified exemplar→member pairs per
#: over-cap bucket, 87.2% measured recall at the same stress point) —
#: not a bigger cap.
LSH_BUCKET_CAP = 2000

#: max shareable-doc count for which the staged verify tier applies its
#: broadcast semi-join docsets restriction (``lsh_pairs_staged``): 20M
#: BIGINT ids ≈ 160 MB framed — inside the guide's "a few hundred MB is
#: usually fine" broadcast envelope (§3.1) and far under the 8 GB /
#: 512M-row hard cap.  Past this the builder keeps the unrestricted
#: shape: an un-broadcast semi-join re-shuffles the whole shingle set
#: (measured net loss at the 30× stress — see the builder docstring).
LSH_VERIFY_IDS_BROADCAST_MAX = 20_000_000


def _lsh_core_sql(
    shingles_cte: str,
    cap: int | None = None,
    band_sigs: list[str] | None = None,
    star: bool = False,
    ln: str = "len",
) -> str:
    """Dialect-shared LSH candidate pipeline (shingles → signatures →
    banded buckets → size-capped candidate pairs → intersection counts +
    set sizes).  Consumers append their scoring SELECT (Jaccard,
    containment, ...).  ``cap`` overrides ``LSH_BUCKET_CAP`` per query
    (r11 advice: the cap is a recall/cost trade and must be tunable);
    the dropped-bucket count it implies is observable via the registered
    ``dedup_lsh_bucket_audit`` query and measured (including true-pair
    recall loss at 20×) in SCALE.md §13.  ``band_sigs`` swaps the banding
    (see ``_band_sig_exprs`` — the recall/cost dial).  ``star`` adds the
    over-cap STAR-SALVAGE tier (see ``_lsh_star_sql``) to the candidate
    set and carries its ``via_star`` flag through ``inter`` — one source
    of truth for the shared pipeline, so a fix to the capped core cannot
    silently miss the star variant.

    VERIFY STAGE (r13 verdict #1 — the rewrite that unlocked the 100×
    in-container stress): exact-Jaccard verification used to explode each
    candidate pair against BOTH full shingle sets (pairs × ~300 shingle
    rows through a join THEN a re-shuffling groupBy — the single dominant
    shuffle term of the composed pipeline; 2.2 GB at the 40× stress
    point, out-of-disk at 100× on one node).  Now each doc's distinct
    shingle hashes are carried ONCE as a sorted BIGINT array (``docsets``
    — one groupBy over shingles, same exchange the old ``sizes`` census
    already paid), and the intersection count is a row-local
    ``array_intersect`` on the joined pair row: shuffle is pairs × O(1)
    array payloads, the post-join aggregation disappears entirely, and
    set sizes fall out of the same arrays for free.  ``array_agg`` /
    ``array_sort`` / ``array_intersect`` are dialect-shared; only the
    array-length function differs (``ln``: 'len' DuckDB, 'size' Spark).
    Counts are bit-identical to the explode-join by construction
    (distinct elements both sides, order-insensitive intersection)."""
    cap = LSH_BUCKET_CAP if cap is None else int(cap)
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {sig} AS sig FROM sigs"
        for b, sig in enumerate(band_sigs if band_sigs is not None else _BAND_SIGS)
    )
    star_ctes = (
        f""",
bover AS (SELECT band, sig, MIN(doc_id) AS ex FROM bands GROUP BY band, sig
          HAVING COUNT(*) > {cap}),
star AS (
  SELECT DISTINCT o.ex AS doc1, b.doc_id AS doc2
  FROM bands b JOIN bover o ON o.band = b.band AND o.sig = b.sig
  WHERE b.doc_id <> o.ex
),
cand_all AS (
  SELECT doc1, doc2, MIN(via_star) AS via_star
  FROM (SELECT doc1, doc2, 0 AS via_star FROM cand
        UNION ALL SELECT doc1, doc2, 1 AS via_star FROM star) u
  GROUP BY doc1, doc2
)"""
        if star
        else ""
    )
    inter_src = "cand_all" if star else "cand"
    via_sel = ", c.via_star" if star else ""
    return f"""
WITH shingles_raw AS ({shingles_cte}),
shingles AS (SELECT DISTINCT doc_id, h FROM shingles_raw),
sigs AS (SELECT doc_id, {_MH_AGGS} FROM shingles GROUP BY doc_id),
bands AS ({band_rows}),
bcap AS (SELECT band, sig FROM bands GROUP BY band, sig
         HAVING COUNT(*) <= {cap}),
bandsok AS (
  SELECT b.doc_id, b.band, b.sig
  FROM bands b JOIN bcap c ON c.band = b.band AND c.sig = b.sig
),
cand AS (
  SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2
  FROM bandsok b1 JOIN bandsok b2
    ON b1.band = b2.band AND b1.sig = b2.sig AND b1.doc_id < b2.doc_id
){star_ctes},
docsets AS (SELECT doc_id, array_sort(array_agg(h)) AS hs FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc1, c.doc2{via_sel},
         CAST({ln}(array_intersect(a1.hs, a2.hs)) AS BIGINT) AS i,
         CAST({ln}(a1.hs) AS BIGINT) AS n1,
         CAST({ln}(a2.hs) AS BIGINT) AS n2
  FROM {inter_src} c
  JOIN docsets a1 ON a1.doc_id = c.doc1
  JOIN docsets a2 ON a2.doc_id = c.doc2
)"""


#: per-invocation temp-view namespace for the staged Spark LSH cascade
#: (the spectral-layout discipline: overlapping invocations must not
#: cross-read; views are dropped once the returned plan is resolved).
_LSH_STAGE_NONCE = __import__("itertools").count()


def lsh_pairs_staged(
    spark: SparkSession,
    docs: DataFrame,
    cap: int | None = None,
    band_sigs: list[str] | None = None,
    star: bool = False,
    score: str = "jaccard",
) -> DataFrame:
    """Spark execution twin of ``_lsh_core_sql`` + the Jaccard tail with
    the shared cascade MATERIALIZED once (r14 verdict #5 — make the 100×
    run cheaper).  Semantics are identical to the single-statement
    ``_minhash_sql``/``_lsh_star_sql`` (same fragment texts, same
    DISTINCT/cap/star rules — the DuckDB oracles are unchanged); what
    changes is the Spark PLAN:

    - DuckDB honors ``AS MATERIALIZED``, but Spark inlines deterministic
      CTEs at every reference — so the one-statement form re-executes the
      shingles→sigs→bands cascade inside EVERY broadcast-subquery build
      (measured at the 30× stress: three full cascade re-runs of
      800-1,340 s each before this function existed).  Here ``shingles``,
      ``bands``, and ``docsets`` are ``materialize()``d once behind
      nonce temp views and every downstream CTE reads the views.
    - The docs input is REPARTITIONED before the 300×-amplifying shingle
      explode: the synthesized stress corpus is one ~84 MB parquet file
      → one input split → the whole cascade single-task without this
      (the repartition is one O(docs) exchange, standard
      repartition-before-explode).
    - The verify tier only ever reads ``docsets`` rows for docs that
      appear in a candidate pair (the ``inter`` joins are inner on
      doc1/doc2), and every candidate doc — plain (bandsok self-join,
      bucket ≥ 2 members) or star (bover, bucket > cap ≥ 2) — sits in
      some bucket shared with another doc.  So ``docsets`` — the
      shingle→sorted-array aggregation, the widest payload in the
      cascade — is built behind a BROADCAST LEFT SEMI join on "docs in
      a ≥2-member bucket" (r16, guide §2.3/§3.2: drop non-matching rows
      from the heavy side before it shuffles).  Lossless by the
      superset argument above.  The restriction is ADAPTIVE: one scalar
      probe job over the already-checkpointed bands view counts the
      shareable docs, and the semi-join is applied only when that count
      fits ``LSH_VERIFY_IDS_BROADCAST_MAX`` — a broadcast filter is then
      pure map-side row-dropping (no extra exchange), so any shrink is
      a win.  Past the cap the builder keeps the unrestricted r15 shape:
      an un-broadcast semi-join re-shuffles the full shingle set, which
      MEASURED as a net loss on the dup-dense 30× stress (shuffle write
      345→501 MB, wall 235→253 s, SMJ LeftSemi in the plan) — exactly
      the regime where ~every doc is shareable and the restriction buys
      nothing.  On a dup-poor corpus (the realistic 100 TB regime) the
      shareable set is the near-dup fraction, comfortably under the cap,
      and the verify aggregation shrinks proportionally.  (Beyond the
      cap on a dup-poor corpus the production extension is a Bloom
      filter over the shareable ids, guide §3.2 — not expressible in
      public PySpark without a Scala helper; the fallback stays
      lossless.)

    ``score`` selects the verification tail over the same staged
    cascade: ``"jaccard"`` (the default, ``_minhash_sql``'s tail) or
    ``"containment"`` (``_containment_sql``'s asymmetric tail — r16,
    the last one-statement Spark LSH consumer brought onto the staged
    cascade; fragment texts unchanged, DuckDB oracle untouched).

    Returns (doc1, doc2, jaccard[, via_star]) exactly as the one-statement
    builders do — or (doc1, doc2, c_fwd, c_rev, contained_doc) for the
    containment tail."""
    cap = LSH_BUCKET_CAP if cap is None else int(cap)
    sigs_list = band_sigs if band_sigs is not None else _BAND_SIGS
    p = f"__lsh{next(_LSH_STAGE_NONCE)}_"
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    created = []

    def mv(df: DataFrame, name: str) -> DataFrame:
        m = materialize(df)
        m.createOrReplaceTempView(name)
        created.append(name)
        return m

    docs.select("doc_id", "text").repartition(n_part, "doc_id").createOrReplaceTempView(
        f"{p}docs"
    )
    created.append(f"{p}docs")
    shingles_raw = _SPARK_SHINGLES.replace("__docs", f"{p}docs")
    mv(
        spark.sql(f"SELECT DISTINCT doc_id, h FROM ({shingles_raw})"),
        f"{p}sh",
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {sig} AS sig FROM {p}sigs"
        for b, sig in enumerate(sigs_list)
    )
    mv(
        spark.sql(
            f"WITH {p}sigs AS (SELECT doc_id, {_MH_AGGS} FROM {p}sh GROUP BY doc_id)\n"
            f"SELECT * FROM ({band_rows})"
        ),
        f"{p}bands",
    )
    # Adaptive verify restriction (see docstring): one scalar probe over
    # the checkpointed bands decides whether the shareable-doc id list is
    # small enough to broadcast; only then is the semi-join worth it.
    n_shared = spark.sql(
        f"""
SELECT COUNT(DISTINCT b.doc_id) AS c
FROM {p}bands b
JOIN (SELECT band, sig FROM {p}bands
      GROUP BY band, sig HAVING COUNT(*) >= 2) g
  ON g.band = b.band AND g.sig = b.sig
"""
    ).collect()[0][0]
    if n_shared <= LSH_VERIFY_IDS_BROADCAST_MAX:
        docsets_sql = f"""
SELECT /*+ BROADCAST(c) */ s.doc_id, array_sort(array_agg(s.h)) AS hs
FROM {p}sh s
LEFT SEMI JOIN (
  SELECT b.doc_id
  FROM {p}bands b
  JOIN (SELECT band, sig FROM {p}bands
        GROUP BY band, sig HAVING COUNT(*) >= 2) g
    ON g.band = b.band AND g.sig = b.sig
) c ON s.doc_id = c.doc_id
GROUP BY s.doc_id
"""
    else:
        docsets_sql = (
            f"SELECT doc_id, array_sort(array_agg(h)) AS hs FROM {p}sh GROUP BY doc_id"
        )
    mv(spark.sql(docsets_sql), f"{p}docsets")
    star_ctes = (
        f""",
bover AS (SELECT band, sig, MIN(doc_id) AS ex FROM {p}bands GROUP BY band, sig
          HAVING COUNT(*) > {cap}),
star AS (
  SELECT DISTINCT o.ex AS doc1, b.doc_id AS doc2
  FROM {p}bands b JOIN bover o ON o.band = b.band AND o.sig = b.sig
  WHERE b.doc_id <> o.ex
),
cand_all AS (
  SELECT doc1, doc2, MIN(via_star) AS via_star
  FROM (SELECT doc1, doc2, 0 AS via_star FROM cand
        UNION ALL SELECT doc1, doc2, 1 AS via_star FROM star) u
  GROUP BY doc1, doc2
)"""
        if star
        else ""
    )
    inter_src = "cand_all" if star else "cand"
    via_sel = ", c.via_star" if star else ""
    via_out = ",\n       CAST(i.via_star AS BIGINT) AS via_star" if star else ""
    if score == "containment":
        score_sql = f"""
SELECT i.doc1, i.doc2,
       round(CAST(i.i AS DOUBLE) / i.n1, 6) AS c_fwd,
       round(CAST(i.i AS DOUBLE) / i.n2, 6) AS c_rev,
       CAST(CASE WHEN i.n1 <= i.n2 THEN i.doc1 ELSE i.doc2 END AS BIGINT) AS contained_doc
FROM inter i
WHERE CAST(i.i AS DOUBLE) / LEAST(i.n1, i.n2) >= {CONTAINMENT_MIN}"""
    else:
        score_sql = f"""
SELECT i.doc1, i.doc2,
       round(CAST(i.i AS DOUBLE) / (i.n1 + i.n2 - i.i), 6) AS jaccard{via_out}
FROM inter i
WHERE CAST(i.i AS DOUBLE) / (i.n1 + i.n2 - i.i) >= {MINHASH_JACCARD_MIN}"""
    tail = spark.sql(
        f"""
WITH bcap AS (SELECT band, sig FROM {p}bands GROUP BY band, sig
         HAVING COUNT(*) <= {cap}),
bandsok AS (
  SELECT b.doc_id, b.band, b.sig
  FROM {p}bands b JOIN bcap c ON c.band = b.band AND c.sig = b.sig
),
cand AS (
  SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2
  FROM bandsok b1 JOIN bandsok b2
    ON b1.band = b2.band AND b1.sig = b2.sig AND b1.doc_id < b2.doc_id
){star_ctes},
inter AS (
  SELECT c.doc1, c.doc2{via_sel},
         CAST(size(array_intersect(a1.hs, a2.hs)) AS BIGINT) AS i,
         CAST(size(a1.hs) AS BIGINT) AS n1,
         CAST(size(a2.hs) AS BIGINT) AS n2
  FROM {inter_src} c
  JOIN {p}docsets a1 ON a1.doc_id = c.doc1
  JOIN {p}docsets a2 ON a2.doc_id = c.doc2
)
{score_sql}
"""
    )
    for name in created:
        spark.catalog.dropTempView(name)
    return tail


def _minhash_sql(
    shingles_cte: str,
    cap: int | None = None,
    band_sigs: list[str] | None = None,
    ln: str = "len",
) -> str:
    """Dialect-shared core of the MinHash-LSH query (post-shingling).
    ``ln`` is the array-length token ('len' DuckDB, 'size' Spark)."""
    return f"""{_lsh_core_sql(shingles_cte, cap=cap, band_sigs=band_sigs, ln=ln)}
SELECT i.doc1, i.doc2,
       round(CAST(i.i AS DOUBLE) / (i.n1 + i.n2 - i.i), 6) AS jaccard
FROM inter i
WHERE CAST(i.i AS DOUBLE) / (i.n1 + i.n2 - i.i) >= {MINHASH_JACCARD_MIN}
"""


def _lsh_star_sql(
    shingles_cte: str,
    cap: int | None = None,
    band_sigs: list[str] | None = None,
    ln: str = "len",
) -> str:
    """MinHash-LSH candidate generation with STAR SALVAGE of over-cap
    buckets (r12, from the measured 20× recall loss — SCALE.md §13): a
    bucket larger than ``cap`` is a template cluster, not noise, and
    simply dropping it loses every true pair inside (measured 94% of
    true colliding pairs at the 20× degenerate-copy stress point).  But
    enumerating its C(n,2) pairs is exactly the blow-up the cap exists to
    prevent — so each over-cap bucket instead emits O(n) EXEMPLAR→MEMBER
    pairs (exemplar = min doc_id member), each still exact-Jaccard
    verified.  Downstream connected-components (the dedup keeper path —
    ``dedup_cluster_keeper``, ``dedup_composed_pipeline``) then recovers
    the full cluster through the star's center: member—exemplar—member
    connects everything the dropped pairs would have, at linear cost.
    ``via_star = 1`` marks pairs reachable ONLY through salvage, so the
    pair list stays honest about which edges are star-compressed.

    Scale: Σ(bucket) replaces Σ(bucket²) for over-cap buckets — at the
    20× stress point that is ~141k star edges instead of 758M enumerated
    pairs, and the candidate bound stays cap-bounded for every normal
    bucket.  The candidate pipeline itself is ``_lsh_core_sql(star=True)``
    — one shared source of truth; only the scoring tail lives here.
    """
    return f"""{_lsh_core_sql(shingles_cte, cap=cap, band_sigs=band_sigs, star=True, ln=ln)}
SELECT i.doc1, i.doc2,
       round(CAST(i.i AS DOUBLE) / (i.n1 + i.n2 - i.i), 6) AS jaccard,
       CAST(i.via_star AS BIGINT) AS via_star
FROM inter i
WHERE CAST(i.i AS DOUBLE) / (i.n1 + i.n2 - i.i) >= {MINHASH_JACCARD_MIN}
"""


@query(
    "dedup_minhash_lsh_star",
    oracle=_lsh_star_sql(_DD_SHINGLES),
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered twin of ``_lsh_star_sql`` at the default cap — see that
    builder's docstring for the over-cap star-salvage semantics.  At the
    verified scales no bucket is over-cap, so the output equals
    ``dedup_minhash_lsh`` with ``via_star = 0`` throughout — the salvage
    tier's non-interference when buckets are healthy is exactly what the
    hash check pins; its recovery behavior under a forced tiny cap is
    pinned by ``tests/test_lsh_star.py``, and its measured recall at the
    20× degenerate stress point is in SCALE.md §12.

    Executes via ``lsh_pairs_staged(star=True)`` (r15) — same staged
    cascade as ``dedup_minhash_lsh``; the star tier adds only the bover/
    star/cand_all CTEs over the already-materialized bands view.
    """
    docs = load_table(spark, sf_dir, "documents")
    return lsh_pairs_staged(spark, docs, star=True)


def _lsh_bucket_audit_sql(
    shingles_cte: str,
    intdiv: str,
    cap: int | None = None,
    band_sigs: list[str] | None = None,
) -> str:
    """Per-band LSH bucket census under the size cap — the observability
    surface for the capped candidate generator (r11 advice): how many
    buckets exist, how many the cap DROPS (with their member count), the
    largest bucket, and the Σ C(n,2) candidate-pair bound admitted vs
    total.  Pure integer arithmetic, dialect-shared (``intdiv``: 'div'
    Spark, '//' DuckDB), so the census itself is oracle-checked; at an
    unusual corpus scale a user runs this FIRST and tunes ``cap`` with
    numbers instead of discovering silent recall loss later."""
    cap = LSH_BUCKET_CAP if cap is None else int(cap)
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {sig} AS sig FROM sigs"
        for b, sig in enumerate(band_sigs if band_sigs is not None else _BAND_SIGS)
    )
    return f"""
WITH shingles_raw AS ({shingles_cte}),
shingles AS (SELECT DISTINCT doc_id, h FROM shingles_raw),
sigs AS (SELECT doc_id, {_MH_AGGS} FROM shingles GROUP BY doc_id),
bands AS ({band_rows}),
buckets AS (SELECT band, sig, COUNT(*) AS n FROM bands GROUP BY band, sig)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(CASE WHEN n > {cap} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_buckets,
       CAST(SUM(CASE WHEN n > {cap} THEN n ELSE 0 END) AS BIGINT) AS n_dropped_members,
       CAST(MAX(n) AS BIGINT) AS max_bucket,
       CAST(SUM(CASE WHEN n <= {cap} THEN (n * (n - 1)) {intdiv} 2 ELSE 0 END) AS BIGINT)
         AS admitted_pair_bound,
       CAST(SUM((n * (n - 1)) {intdiv} 2) AS BIGINT) AS total_pair_bound
FROM buckets
GROUP BY band
"""


@query(
    "dedup_lsh_bucket_audit",
    oracle=_lsh_bucket_audit_sql(_DD_SHINGLES, "//"),
    tags=("dedup", "lsh", "eval"),
)
def dedup_lsh_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered twin of ``_lsh_bucket_audit_sql`` over the documents
    table at the default ``LSH_BUCKET_CAP`` — see that builder's docstring.
    At the verified scales every band reports 0 dropped buckets (the cap
    is 5× the largest observed bucket), which is itself the pinned fact:
    the cap changes nothing where correctness is hash-checked, and the
    audit is how a user proves the same before trusting a new corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs")
    return spark.sql(_lsh_bucket_audit_sql(_SPARK_SHINGLES, "div"))


#: minimum max-directional containment to emit a pair.
CONTAINMENT_MIN = 0.5


def _containment_sql(shingles_cte: str, ln: str = "len") -> str:
    """Containment scoring over the LSH candidate set: |A∩B|/|A| and
    |A∩B|/|B| — the asymmetric near-dup measure (quotes, subsets,
    boilerplate wrappers) that symmetric Jaccard under-reports."""
    return f"""{_lsh_core_sql(shingles_cte, ln=ln)}
SELECT i.doc1, i.doc2,
       round(CAST(i.i AS DOUBLE) / i.n1, 6) AS c_fwd,
       round(CAST(i.i AS DOUBLE) / i.n2, 6) AS c_rev,
       CAST(CASE WHEN i.n1 <= i.n2 THEN i.doc1 ELSE i.doc2 END AS BIGINT) AS contained_doc
FROM inter i
WHERE CAST(i.i AS DOUBLE) / LEAST(i.n1, i.n2) >= {CONTAINMENT_MIN}
"""


# --- exact dedup ---------------------------------------------------------------

_EXACT_ORACLE = """
SELECT min(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies,
       COUNT(*) > 1 AS is_duplicated,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
GROUP BY text
"""


@query("dedup_exact", oracle=_EXACT_ORACLE, tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep lowest doc_id.

    Scale: at 100 TB group on ``xxhash64(text)`` instead of the raw text to
    shrink shuffle width (collision-check within group if paranoid).
    """
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        (F.count(F.lit(1)) > 1).alias("is_duplicated"),
        F.length("text").cast("bigint").alias("text_len"),
    ).drop("text")


# --- normalized exact dedup --------------------------------------------------

#: unicode-aware normalization both regex engines (Java util.regex, RE2)
#: evaluate identically: lowercase, collapse every non-letter/digit run.
_NORM_PAT = r"[^\p{L}\p{N}]+"

_NORM_EXACT_ORACLE = f"""
SELECT min(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT text) AS n_variants,
       COUNT(*) > 1 AS is_duplicated
FROM (SELECT doc_id, text,
             trim(regexp_replace(lower(text), '{_NORM_PAT}', ' ', 'g')) AS norm
      FROM documents)
GROUP BY norm
"""


@query("dedup_normalized_exact", oracle=_NORM_EXACT_ORACLE, tags=("dedup",))
def dedup_normalized_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after casefold + punctuation/whitespace normalization —
    the cheap tier between raw-exact and MinHash that catches trivially
    reformatted copies (case, spacing, punctuation) with zero candidate
    generation.  ``n_variants`` counts how many raw texts each normalized
    group collapsed, i.e. the incremental value over ``dedup_exact``.

    The normalizer is ``\\p{{L}}/\\p{{N}}``-based so CJK documents keep
    their glyphs (an ASCII class would collapse every zh doc into one
    group).  Same single content-keyed shuffle as ``dedup_exact``; at
    100 TB group on ``xxhash64(norm)``.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), _NORM_PAT, " "))
    return (
        d.select("doc_id", "text", norm.alias("norm"))
        .groupBy("norm")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("text").alias("n_variants"),
            (F.count(F.lit(1)) > 1).alias("is_duplicated"),
        )
        .drop("norm")
    )


# --- MinHash + LSH ---------------------------------------------------------------


@query("dedup_minhash_lsh", oracle=_minhash_sql(_DD_SHINGLES), tags=("dedup", "lsh", "headline"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: char-5-gram shingles → 12 minhashes → 3×4 banded
    LSH buckets → candidate pairs → exact Jaccard ≥ 0.15.

    See module docstring for the scale argument; the banded self-join is
    the only pair-producing step and it is bucket-local.

    Execution goes through ``lsh_pairs_staged`` (r15): Spark inlines
    deterministic CTEs at every reference, so the one-statement form
    re-ran the shingles→sigs→bands cascade once per downstream consumer
    (measured 2.5–3.2 s vs 0.75–0.95 s staged at sf0.01, identical rows).
    The DuckDB oracle stays the one-statement ``_minhash_sql`` text.
    """
    docs = load_table(spark, sf_dir, "documents")
    return lsh_pairs_staged(spark, docs)


@query(
    "dedup_minhash_lsh_hirecall",
    oracle=_minhash_sql(_DD_SHINGLES, band_sigs=_BAND_SIGS_HIRECALL),
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh_hirecall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_minhash_lsh`` with the HIGH-RECALL 6×2 banding over the
    same 12 minhashes (``_BAND_SIGS_HIRECALL``) — the r12 answer to the
    measured low-J recall gap (SCALE §13: the 3×4 default collides only
    28% of true pairs at J≈0.15–0.3; 6×2 lifts the collision curve ~45×
    at J=0.2).  Candidates are still exact-Jaccard verified at the same
    threshold, so this output is a SUPERSET of the default query's (a
    4-row band agreeing implies both of its 2-row halves agree —
    superset pinned in ``tests/test_lsh_star.py``); the price is looser
    buckets (larger Σ(bucket²)), which is why it is a registered VARIANT
    and not the default: pick by corpus J-regime using
    ``dedup_lsh_bucket_audit`` numbers, not by faith.

    Executes via ``lsh_pairs_staged`` (r15) — the 6×2 banding doubles the
    band UNION ALL fan-out over the sigs cascade, so materializing the
    cascade once pays off even more than in the 3×4 default (A/B at
    sf0.01: staged consistently faster, second-run 9.6 s vs 36 s,
    identical 57,757 rows).
    """
    docs = load_table(spark, sf_dir, "documents")
    return lsh_pairs_staged(spark, docs, band_sigs=_BAND_SIGS_HIRECALL)


# --- SimHash ----------------------------------------------------------------------

def _simhash_sql(shingles_cte: str, xor_expr: str, intdiv: str) -> str:
    """``intdiv``: 'div' (Spark) or '//' (DuckDB)."""
    bit_sums = ",\n       ".join(
        f"CAST(SUM((h {intdiv} {1 << j}) % 2) AS BIGINT) AS c{j}" for j in range(SIMHASH_BITS)
    )
    value = " + ".join(
        f"(CASE WHEN 2*c{j} > n THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
WITH shingles_raw AS ({shingles_cte}),
shingles AS (SELECT DISTINCT doc_id, h FROM shingles_raw),
bitsums AS (
  SELECT doc_id, COUNT(*) AS n, {bit_sums}
  FROM shingles GROUP BY doc_id
),
sh AS (SELECT doc_id, CAST({value} AS BIGINT) AS simhash FROM bitsums)
SELECT a.doc_id AS doc1, b.doc_id AS doc2, a.simhash AS simhash1, b.simhash AS simhash2,
       CAST(bit_count({xor_expr}) AS BIGINT) AS hamming
FROM sh a JOIN sh b
  ON (a.simhash {intdiv} 256) = (b.simhash {intdiv} 256) AND a.doc_id < b.doc_id
WHERE bit_count({xor_expr}) <= {SIMHASH_MAX_HAMMING}
"""


@query(
    "dedup_simhash",
    oracle=_simhash_sql(_DD_SHINGLES, "xor(a.simhash, b.simhash)", "//"),
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit sign-aggregated shingle-hash fingerprint,
    pairs blocked on the high byte with hamming distance ≤ 3.

    The high-byte block bound makes the pair join linear-ish in practice
    (same trick as LSH banding); at 100 TB widen to 64-bit xxhash simhash
    and 4-segment blocking.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs")
    return spark.sql(_simhash_sql(_SPARK_SHINGLES, "a.simhash ^ b.simhash", "div"))


# --- word-trigram Jaccard -----------------------------------------------------------

_TRIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
),
tris AS (
  SELECT DISTINCT doc_id, lang, unnest(
    list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tri
  FROM toks WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tris GROUP BY doc_id),
inter AS (
  SELECT t1.doc_id AS doc1, t2.doc_id AS doc2, COUNT(*) AS i
  FROM tris t1 JOIN tris t2
    ON t1.tri = t2.tri AND t1.lang = t2.lang AND t1.doc_id < t2.doc_id
  GROUP BY t1.doc_id, t2.doc_id
)
SELECT i.doc1, i.doc2, round(CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i), 6) AS jaccard
FROM inter i JOIN sizes z1 ON z1.doc_id = i.doc1 JOIN sizes z2 ON z2.doc_id = i.doc2
WHERE CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i) >= {TRIGRAM_JACCARD_MIN}
"""


@query("dedup_ngram_jaccard", oracle=_TRIGRAM_ORACLE, tags=("dedup", "ngram"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup, blocked by language.

    The trigram equi-join is the blocking step (only docs sharing a trigram
    meet); Jaccard is verified exactly from distinct-trigram sets.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("w"),
    ).where(F.size("w") >= 3)
    tris = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2),"
                " i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), element_at(w, i+2)))"
            )
        ).alias("tri"),
    ).distinct()
    sizes = tris.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    t1 = tris.alias("t1")
    t2 = tris.alias("t2")
    inter = (
        t1.join(
            t2,
            (F.col("t1.tri") == F.col("t2.tri"))
            & (F.col("t1.lang") == F.col("t2.lang"))
            & (F.col("t1.doc_id") < F.col("t2.doc_id")),
        )
        .groupBy(F.col("t1.doc_id").alias("doc1"), F.col("t2.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    z1 = sizes.alias("z1")
    z2 = sizes.alias("z2")
    jac = F.col("i").cast("double") / (F.col("z1.n") + F.col("z2.n") - F.col("i"))
    return (
        inter.join(z1, F.col("doc1") == F.col("z1.doc_id"))
        .join(z2, F.col("doc2") == F.col("z2.doc_id"))
        .where(jac >= TRIGRAM_JACCARD_MIN)
        .select("doc1", "doc2", F.round(jac, 6).alias("jaccard"))
    )


# --- embedding-cosine near-dup ----------------------------------------------------

def _embedding_dedup_oracle() -> str:
    from .similarity import _ANN_ORACLE

    return f"""
WITH pairs AS ({_ANN_ORACLE})
SELECT DISTINCT vec2 AS removed_vec_id
FROM pairs
"""


@query("dedup_embedding_cosine", oracle=_embedding_dedup_oracle(), tags=("dedup", "embedding"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal list: sign-bit-LSH candidate pairs
    at cosine ≥ 0.35 (operators/similarity.py), lower vec_id kept, the
    distinct set of higher ids emitted for deletion.

    Pair-at-a-time keeper choice (not full connected components — that
    needs iterative label propagation; see mllib ops for the library path).
    Scale shape inherits from the LSH pair join: bucket-local only.
    """
    from .similarity import ann_cosine_pairs_signlsh

    pairs = ann_cosine_pairs_signlsh(spark, sf_dir)
    return pairs.select(F.col("vec2").alias("removed_vec_id")).distinct()


# --- duplicate-cluster canonicalization (connected components) --------------------

#: Round cap shared by the Spark fixpoint loop and the unrolled oracle.
CC_MAX_ROUNDS = 32


def _cc_labels_sql(rounds: int = CC_MAX_ROUNDS) -> str:
    """CTE chain ``l0 .. l{rounds}`` of unrolled min-label propagation over
    an ``edges(u, v)`` CTE (symmetric): ``l_k(u) = min(l_{k-1}(u),
    min over edges(u,v) of l_{k-1}(v))``.

    Replaces the recursive-CTE transitive closure the r5 oracles used: the
    closure materializes O(Σ component_size²) reach rows — it exhausted
    DuckDB temp disk on the sf0.1 dense pair graph (302k edges) — while
    each propagation round here is exactly one n-node table.  Every CTE is
    MATERIALIZED because ``l{k}`` is referenced twice by ``l{k+1}``;
    inlining would re-expand the whole chain exponentially.

    Exactness: identical per-round update to the Spark loop in
    ``dedup_connected_components``; past the fixpoint further rounds are
    no-ops.  The oracle is SELF-VERIFYING (r6 advice, medium): it runs one
    round past the cap and raises (DuckDB ``error()``) if ``l{rounds+1}``
    still differs from ``l{rounds}`` — without this, a consumer whose own
    convergence proof is independent of the round cap (``dedup_cc_star``
    converges in ≤20 star rounds for diameters up to ~2^20, far past 32)
    could produce CORRECT labels on a diameter>{rounds} graph while the
    unconverged oracle hash-mismatches, misattributing the failure to the
    engine.  ``dedup_connected_components`` additionally raises Spark-side
    at the same cap; for ``dedup_cc_star`` the oracle guard is the only —
    and now sufficient — protection.  Final labels are exposed as
    ``lchecked``.
    """
    parts = ["l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS lbl FROM edges)"]
    for i in range(1, rounds + 2):
        parts.append(f"""
l{i} AS MATERIALIZED (
  SELECT l.id, LEAST(l.lbl, COALESCE(m.m, l.lbl)) AS lbl
  FROM l{i - 1} l LEFT JOIN (
    SELECT e.u AS id, MIN(n.lbl) AS m
    FROM edges e JOIN l{i - 1} n ON e.v = n.id
    GROUP BY e.u
  ) m ON m.id = l.id
)""")
    parts.append(f"""
lchecked AS MATERIALIZED (
  SELECT a.id,
         CASE WHEN (SELECT count(*) FROM l{rounds + 1} x
                    JOIN l{rounds} y ON x.id = y.id AND x.lbl <> y.lbl) = 0
              THEN a.lbl
              ELSE error('cc oracle: min-label propagation not converged within {rounds} rounds; raise CC_MAX_ROUNDS')
         END AS lbl
  FROM l{rounds} a
)""")
    return ",\n".join(parts)


_CC_ORACLE = f"""
WITH pairs AS MATERIALIZED ({_minhash_sql(_DD_SHINGLES)}),
edges AS MATERIALIZED (
  SELECT doc1 AS u, doc2 AS v FROM pairs
  UNION
  SELECT doc2, doc1 FROM pairs
),
{_cc_labels_sql()}
SELECT id AS doc_id, lbl AS component_id FROM lchecked
"""


@query("dedup_connected_components", oracle=_CC_ORACLE, tags=("dedup", "components", "iterative"))
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components over the
    MinHash-LSH near-dup pair graph via iterative min-label propagation —
    each doc gets the smallest doc_id reachable through near-dup edges
    (the "canonical representative" every real dedup pipeline needs; pair
    lists alone can't pick one keeper per duplicate *cluster*).

    Spark side: a driver-coordinated fixpoint loop of join+agg rounds
    (labels converge in ≤ diameter rounds; ``session.materialize`` truncates
    lineage each round so plans don't grow — reliable ``checkpoint()`` on
    clusters via ``spark.sce.reliableCheckpoint``).  At 100 TB scale this
    exact loop is the standard large-graph CC (or hand to
    GraphFrames/Pregel); each round is one shuffle keyed on the node id.
    Raises if the fixpoint is not reached within the round cap — silent
    non-convergence would return wrong labels.

    Oracle: the SAME min-label propagation unrolled as ``CC_MAX_ROUNDS``
    materialized DuckDB CTE rounds (``_cc_labels_sql``) — one of the
    genuinely iterative algorithms the driver contract still lets us
    hash-check end to end.  (The r5 recursive-CTE transitive closure
    blew DuckDB temp disk on the sf0.1 dense graph; propagation keeps
    every intermediate at n rows.)
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    edges = pairs.union(
        pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
    ).distinct()
    edges = materialize(edges)

    labels = edges.select(F.col("doc1").alias("doc_id")).distinct().withColumn(
        "component_id", F.col("doc_id")
    )

    # Σ component_id (exact decimal) is the fixpoint probe.  Min-label
    # propagation is MONOTONE: every node's label is non-increasing, so
    # two consecutive rounds have equal sums iff no label changed — an
    # EXACT test (r15 opt round, guide §2.4).  r16: the per-round sum now
    # rides the round's OWN checkpoint job as an ``observe`` metric
    # (CollectMetrics computes it while the blocks are written), so the
    # separate probe job — one full scan + agg per round — is gone
    # (guide §5, driver round-trips).
    _probe = F.sum(F.col("component_id").cast("decimal(28,0)")).alias("s")
    prev_sum = labels.agg(_probe).collect()[0][0]
    max_rounds = CC_MAX_ROUNDS  # ≥ graph diameter; breaks early at fixpoint
    converged = False
    for r in range(max_rounds):
        # min over (own label ∪ neighbor labels) in ONE join + ONE
        # aggregation: the union row replaces the old second (left) join +
        # least/coalesce recombination — one exchange fewer per round
        # (r15 opt round, guide §2.4).
        neighbor_lbl = edges.join(labels, edges.doc2 == labels.doc_id).select(
            F.col("doc1").alias("doc_id"), "component_id"
        )
        obs = Observation(f"cc_probe_{r}")
        updated = materialize(
            neighbor_lbl.unionAll(labels)
            .groupBy("doc_id")
            .agg(F.min("component_id").alias("component_id"))
            .observe(obs, _probe)
        )
        cur_sum = obs.get["s"]
        labels = updated
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"dedup_connected_components: min-label propagation did not reach a "
            f"fixpoint within {max_rounds} rounds (graph diameter exceeds cap); "
            f"raising instead of returning unconverged component ids"
        )
    return labels


# --- connected components, O(log n) rounds: large-star / small-star ------------


def cc_star_labels(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond" —
    public algorithm), returning ``(doc_id, component_id)`` with
    ``component_id`` = min node id of the component.

    This is the 100 TB-scale CC: it converges in **O(log n) rounds**
    regardless of graph diameter, where plain min-label propagation
    (``dedup_connected_components``) needs O(diameter) rounds — on a
    100 TB web-scale dup graph a long chain means hundreds of propagation
    rounds but still only ~20 star rounds.  Per round: two node-keyed
    groupBy/join pairs (large-star over the symmetric adjacency, small-star
    over the high→low orientation); edge count is non-increasing after the
    first round, so the shuffles shrink as the graph collapses to stars.

    ``edges``: any (doc1, doc2) pair list (direction/duplication ignored).
    Raises if the edge set has not stabilized within ``max_rounds``
    (2^20 ≈ 10⁶ chain-length equivalent; convergence is checked by an
    order-insensitive edge-set checksum, not just the count).
    """
    e = (
        edges.select(F.col("doc1").alias("u"), F.col("doc2").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e = materialize(e)

    # Edge-set checksum (count + Σ xxhash64, decimal sum: exact and
    # overflow-free where a long sum would wrap).  r16: computed as an
    # ``observe`` metric DURING each round's checkpoint job instead of a
    # separate scan+agg job per round (guide §5).
    _probe = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(28,0)")).alias("h"),
    ]

    def _large_star(d: DataFrame) -> DataFrame:
        sym = d.union(d.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", "u").alias("m"))
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(d: DataFrame) -> DataFrame:
        # orient every edge high→low, group the small neighbors per node
        lo = d.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = lo.groupBy("u").agg(F.min("v").alias("m"))
        moved = (
            lo.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        return moved

    prev = None
    converged = False
    for r in range(max_rounds):
        obs = Observation(f"ccstar_probe_{r}")
        e = materialize(_small_star(_large_star(e)).observe(obs, *_probe))
        got = obs.get
        cur = (got["n"], got["h"])
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"cc_star_labels: star operations did not stabilize within "
            f"{max_rounds} rounds; raising instead of returning a non-star forest"
        )
    # e is now a star forest rooted at each component's min id: every
    # non-root appears exactly once as u with v = root; roots only as v.
    roots = e.select("v").distinct().join(
        e.select(F.col("u").alias("v")).distinct(), "v", "left_anti"
    )
    return e.select(F.col("u").alias("doc_id"), F.col("v").alias("component_id")).union(
        roots.select(F.col("v").alias("doc_id"), F.col("v").alias("component_id"))
    )


@query("dedup_cc_star", oracle=_CC_ORACLE, tags=("dedup", "components", "iterative"))
def dedup_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster canonicalization via large-star/small-star CC —
    identical output contract to ``dedup_connected_components`` (every doc
    in the near-dup graph → min reachable doc_id) through the O(log n)-
    round algorithm that holds at 100 TB graph scale (see
    ``cc_star_labels`` for the round-complexity argument).  Shares the
    unrolled min-label-propagation DuckDB oracle; both algorithms compute
    the true component min-labels, but their convergence regimes differ —
    star rounds reach fixpoint in ≤20 rounds for diameters up to ~2^20,
    while the propagation oracle needs diameter ≤ ``CC_MAX_ROUNDS`` — so
    the oracle SELF-CHECKS convergence (``_cc_labels_sql``: raises rather
    than hash-mismatch on a deeper graph).  Given convergence, the shared
    SQL text makes this a Spark-vs-Spark algebraic cross-check the driver
    hash-verifies.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    return cc_star_labels(pairs)


# --- per-cluster canonical keeper selection -----------------------------------

_KEEPER_ORACLE = f"""
WITH pairs AS MATERIALIZED ({_minhash_sql(_DD_SHINGLES)}),
edges AS MATERIALIZED (
  SELECT doc1 AS u, doc2 AS v FROM pairs
  UNION
  SELECT doc2, doc1 FROM pairs
),
{_cc_labels_sql()},
labels AS (SELECT id AS doc_id, lbl AS component_id FROM lchecked),
membered AS (
  SELECT d.doc_id,
         COALESCE(l.component_id, d.doc_id) AS component_id,
         CAST(length(d.text) AS BIGINT) AS text_len
  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
)
SELECT doc_id, component_id, text_len,
       row_number() OVER (PARTITION BY component_id
                          ORDER BY text_len DESC, doc_id) = 1 AS keep
FROM membered
"""


@query(
    "dedup_cluster_keeper",
    oracle=_KEEPER_ORACLE,
    tags=("dedup", "components", "pipeline"),
)
def dedup_cluster_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keep/drop verdict per document from the near-dup *cluster*
    structure: every doc gets its connected-component id (singletons are
    their own component), and the longest doc per component (doc_id
    tiebreak) is the keeper — the selection policy real pipelines apply
    after clustering, where pair lists alone can't decide which copy
    survives a 3-way duplicate.

    Spark: CC labels (iterative min-label propagation, see
    ``dedup_connected_components``) left-joined onto the corpus, then one
    ``row_number`` window keyed on component_id.  The window shuffle is
    component-keyed — cluster sizes are bounded by the dedup semantics, so
    no skewed single reducer even at 100 TB.
    """
    labels = dedup_connected_components(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("bigint").alias("text_len")
    )
    membered = d.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", "doc_id").alias("component_id"),
        "text_len",
    )
    w = W.partitionBy("component_id").orderBy(F.col("text_len").desc(), F.col("doc_id"))
    return membered.select(
        "doc_id",
        "component_id",
        "text_len",
        (F.row_number().over(w) == 1).alias("keep"),
    )


_KEEPER_STAR_ORACLE = f"""
WITH pairs AS MATERIALIZED ({_lsh_star_sql(_DD_SHINGLES)}),
edges AS MATERIALIZED (
  SELECT doc1 AS u, doc2 AS v FROM pairs
  UNION
  SELECT doc2, doc1 FROM pairs
),
{_cc_labels_sql()},
labels AS (SELECT id AS doc_id, lbl AS component_id FROM lchecked),
membered AS (
  SELECT d.doc_id,
         COALESCE(l.component_id, d.doc_id) AS component_id,
         CAST(length(d.text) AS BIGINT) AS text_len
  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
)
SELECT doc_id, component_id, text_len,
       row_number() OVER (PARTITION BY component_id
                          ORDER BY text_len DESC, doc_id) = 1 AS keep
FROM membered
"""


@query(
    "dedup_cluster_keeper_star",
    oracle=_KEEPER_STAR_ORACLE,
    tags=("dedup", "components", "pipeline", "lsh"),
)
def dedup_cluster_keeper_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_cluster_keeper`` fed by the STAR-SALVAGE candidate tier
    (``_lsh_star_sql``) with O(log n) star-CC labels — the end-to-end
    keeper path that stays correct when a corpus has degenerate over-cap
    LSH buckets: the drop-only tier loses those clusters entirely
    (measured — SCALE.md §13), while the exemplar stars hand CC exactly
    the spokes it needs to reassemble them at O(n) per bucket.  At the
    verified scales no bucket is over-cap, so output is hash-identical to
    ``dedup_cluster_keeper`` — the non-interference half of the contract;
    the recovery half is pinned under a forced tiny cap in
    ``tests/test_lsh_star.py``.
    """
    docs = load_table(spark, sf_dir, "documents")
    # r16 opt round: route through the staged cascade like every other
    # Spark LSH consumer (r15 rerouted the standalone trio and the
    # composed pipelines; this was the one consumer still on the
    # one-statement form, where Spark's CTE inlining re-executes the
    # shingles→sigs→bands cascade per reference — guide §2.4).  The
    # DuckDB oracle text is unchanged; ``cc_star_labels`` materializes
    # its own edge input, so no extra checkpoint here.
    pairs = lsh_pairs_staged(spark, docs, star=True).select("doc1", "doc2")
    labels = cc_star_labels(pairs)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("bigint").alias("text_len")
    )
    membered = d.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", "doc_id").alias("component_id"),
        "text_len",
    )
    w = W.partitionBy("component_id").orderBy(F.col("text_len").desc(), F.col("doc_id"))
    return membered.select(
        "doc_id",
        "component_id",
        "text_len",
        (F.row_number().over(w) == 1).alias("keep"),
    )


# --- PageRank over the near-dup graph ----------------------------------------

PR_SCALE = 10**12
PR_ITERS = 5
_PR_D_NUM, _PR_D_DEN = 85, 100  # damping 0.85 as exact integer ratio


def _pagerank_oracle() -> str:
    """Unrolled {PR_ITERS}-iteration integer PageRank as DuckDB CTEs."""
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        rounds.append(f"""
r{i} AS MATERIALIZED (
  SELECT n.id,
         ({_PR_D_DEN - _PR_D_NUM} * ({PR_SCALE} // p.n)) // {_PR_D_DEN}
           + ({_PR_D_NUM} * COALESCE(s.s, 0)) // {_PR_D_DEN} AS r
  FROM nodes n CROSS JOIN params p
  LEFT JOIN (
    SELECT e.dst AS id, SUM(r.r // d.d) AS s
    FROM edges e JOIN {prev} r ON e.src = r.id JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.id = n.id
)""")
        prev = f"r{i}"
    return f"""
WITH pairs AS MATERIALIZED ({_minhash_sql(_DD_SHINGLES)}),
edges AS MATERIALIZED (
  SELECT doc1 AS src, doc2 AS dst FROM pairs
  UNION
  SELECT doc2, doc1 FROM pairs
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
params AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS MATERIALIZED (SELECT id, {PR_SCALE} // p.n AS r FROM nodes, params p),
{",".join(rounds)}
SELECT id AS doc_id, CAST(r AS BIGINT) AS rank_e12 FROM {prev}
"""


@query("pagerank_dedup_graph", oracle=_pagerank_oracle(), tags=("dedup", "graph", "iterative"))
def pagerank_dedup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 fixed iterations, damping 0.85) over the symmetric
    MinHash near-dup graph — ranks the most-connected documents inside
    duplicate clusters (the doc a curation pipeline keeps as canonical,
    weighted by connectivity rather than min-id).

    Exactness: ranks are integer units of 10^-12 and every step is integer
    arithmetic (``div``, BIGINT sums) — bit-identical across engines and
    partitionings, so even an iterative fixpoint-style algorithm stays
    hash-checkable.  The oracle unrolls the same 5 rounds as CTEs.

    Scale shape: per round, one shuffle keyed on the edge source (rank
    join) and one keyed on dst (contribution aggregation); node/degree
    tables re-used across rounds via ``materialize``.  The symmetric graph
    has no dangling nodes (every node has out-degree ≥ 1), so no global
    dangling-mass term is needed.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    edges = materialize(
        pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
        .union(pairs.select(F.col("doc2").alias("src"), F.col("doc1").alias("dst")))
        .distinct()
    )
    ranks = pagerank_edges(edges, iters=PR_ITERS)
    return ranks.select(F.col("id").alias("doc_id"), F.col("r").alias("rank_e12"))


def pagerank_edges(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer PageRank over a directed ``(src, dst)`` edge DataFrame.

    Returns ``(id, r)`` with ranks in units of 10^-12 (see
    ``pagerank_dedup_graph`` for the exactness and scale arguments).
    Assumes every node has out-degree ≥ 1 (true for symmetric graphs).
    """
    nodes = edges.select(F.col("src").alias("id")).distinct()
    # Degree and the per-node teleport/base constants are loop-invariant;
    # without the materialize each round's job re-ran the degree aggregation,
    # the node count, and the params broadcast build from scratch (the
    # docstring's claimed reuse — made real in the r15 opt round, guide §2.4:
    # one exchange + one broadcast-subquery job fewer per round).
    deg = materialize(edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")))
    params = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = F.expr(f"{PR_SCALE} div n")
    teleport = F.expr(f"({_PR_D_DEN - _PR_D_NUM} * ({PR_SCALE} div n)) div {_PR_D_DEN}")
    nt = materialize(
        nodes.crossJoin(F.broadcast(params)).select(
            "id", base.alias("r0"), teleport.alias("t")
        )
    )
    ranks = nt.select("id", F.col("r0").alias("r"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select(F.col("dst").alias("id"), F.expr("r div d").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = materialize(
            nt.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.col("t")
                    + F.expr(f"({_PR_D_NUM} * coalesce(s, 0)) div {_PR_D_DEN}")
                ).alias("r"),
            )
        )
    return ranks


# --- communities on the near-dup graph (label propagation) -------------------

DEDUP_LPA_ROUNDS = 6


def _lpa_chain_sql(n_rounds: int) -> tuple[str, str]:
    """Unrolled synchronous-LPA rounds as DuckDB CTEs over an ``edges``
    (src, dst) CTE and an ``l0`` (id, lbl) CTE — shared by every
    LPA-backed oracle (the PageRank-oracle pattern: every round
    MATERIALIZED).  Returns (chain_sql, final_cte_name)."""
    rounds = []
    prev = "l0"
    for i in range(1, n_rounds + 1):
        rounds.append(f"""
l{i} AS MATERIALIZED (
  SELECT id, lbl FROM (
    SELECT c.id, c.lbl,
           row_number() OVER (PARTITION BY c.id ORDER BY c.c DESC, c.lbl ASC) AS rn
    FROM (SELECT e.src AS id, l.lbl, COUNT(*) AS c
          FROM edges e JOIN {prev} l ON l.id = e.dst
          GROUP BY e.src, l.lbl) c
  ) WHERE rn = 1
)""")
        prev = f"l{i}"
    return ",".join(rounds), prev


def _dedup_lpa_oracle() -> str:
    chain, prev = _lpa_chain_sql(DEDUP_LPA_ROUNDS)
    return f"""
WITH pairs AS MATERIALIZED ({_minhash_sql(_DD_SHINGLES)}),
edges AS MATERIALIZED (
  SELECT doc1 AS src, doc2 AS dst FROM pairs
  UNION SELECT doc2, doc1 FROM pairs
  UNION SELECT doc1, doc1 FROM pairs
  UNION SELECT doc2, doc2 FROM pairs
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lbl FROM edges),
{chain}
SELECT id AS doc_id, CAST(lbl AS BIGINT) AS community FROM {prev}
"""


@query(
    "dedup_graph_communities",
    oracle=_dedup_lpa_oracle(),
    tags=("dedup", "graph", "clustering", "iterative"),
)
def dedup_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-structure communities over the MinHash near-dup graph —
    the finer-than-components tier a curation pipeline uses to SPLIT
    over-merged duplicate clusters: connected components
    (``dedup_connected_components``) glue any two docs linked by a
    single spurious LSH pair, while label propagation keeps densely
    interlinked groups together and lets weakly-bridged ones keep their
    own labels.  Same deterministic synchronous-LPA kernel as
    ``sc_communities`` (smallest-label ties, self-vote damping, fixed
    ``DEDUP_LPA_ROUNDS`` budget with sound early fixpoint exit), reused
    over a different graph — see ``lpa_labels`` for the per-round scale
    shape (node-keyed join + bounded per-node window, O(nodes) state).
    """
    from .singlecell import lpa_labels

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    edges = materialize(
        pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
        .union(pairs.select(F.col("doc2").alias("src"), F.col("doc1").alias("dst")))
        .union(pairs.select(F.col("doc1").alias("src"), F.col("doc1").alias("dst")))
        .union(pairs.select(F.col("doc2").alias("src"), F.col("doc2").alias("dst")))
        .distinct()
    )
    labels = lpa_labels(edges, DEDUP_LPA_ROUNDS)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("lbl").cast("bigint").alias("community")
    )


# --- MinHash estimator quality audit -----------------------------------------

def _minhash_quality_sql(shingles_cte: str, intdiv: str, ln: str = "len") -> str:
    """Estimate-vs-exact Jaccard audit over the LSH candidate pairs.
    ``intdiv``: 'div' (Spark) or '//' (DuckDB); ``ln``: array-length
    token ('len' DuckDB, 'size' Spark).  The exact-intersection stage is
    the same per-doc sorted-array ``array_intersect`` as
    ``_lsh_core_sql`` (r13 verdict #1) — no pair × shingle explode."""
    h = len(MINHASH_COEF)
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {sig} AS sig FROM sigs"
        for b, sig in enumerate(_BAND_SIGS)
    )
    n_match = " + ".join(
        f"(CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END)" for i in range(h)
    )
    est = f"(e.n_match * 1000000 {intdiv} {h})"
    exact = f"(i.i * 1000000 {intdiv} (i.n1 + i.n2 - i.i))"
    return f"""
WITH shingles_raw AS ({shingles_cte}),
shingles AS (SELECT DISTINCT doc_id, h FROM shingles_raw),
sigs AS (SELECT doc_id, {_MH_AGGS} FROM shingles GROUP BY doc_id),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.sig = b2.sig AND b1.doc_id < b2.doc_id
),
docsets AS (SELECT doc_id, array_sort(array_agg(h)) AS hs FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc1, c.doc2,
         CAST({ln}(array_intersect(a1.hs, a2.hs)) AS BIGINT) AS i,
         CAST({ln}(a1.hs) AS BIGINT) AS n1,
         CAST({ln}(a2.hs) AS BIGINT) AS n2
  FROM cand c
  JOIN docsets a1 ON a1.doc_id = c.doc1
  JOIN docsets a2 ON a2.doc_id = c.doc2
),
est AS (
  SELECT c.doc1, c.doc2, ({n_match}) AS n_match
  FROM cand c
  JOIN sigs s1 ON s1.doc_id = c.doc1
  JOIN sigs s2 ON s2.doc_id = c.doc2
)
SELECT e.doc1, e.doc2,
       CAST(e.n_match AS BIGINT) AS n_match,
       CAST({est} AS BIGINT) AS est_micro,
       CAST({exact} AS BIGINT) AS exact_micro,
       CAST(abs({est} - {exact}) AS BIGINT) AS err_micro
FROM est e
JOIN inter i ON i.doc1 = e.doc1 AND i.doc2 = e.doc2
"""


@query(
    "dedup_minhash_quality",
    oracle=_minhash_quality_sql(_DD_SHINGLES, "//"),
    tags=("dedup", "lsh", "eval"),
)
def dedup_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator audit for the MinHash pipeline (the dedup twin of
    ``ann_recall_eval``): for every LSH candidate pair, the 12-hash
    signature agreement (the Jaccard estimate a production pipeline
    thresholds on) next to the exact shingle Jaccard, with the absolute
    error — the measurement that justifies H and the band/row split
    before trusting the sketch at corpus scale.

    Scale shape: identical to ``dedup_minhash_lsh`` — the banded self-join
    bounds the pair set; the signature-agreement join touches only O(docs)
    12-int rows; exact Jaccard is computed for candidates only.  All
    ratios ride integer micro-units (floor division in both engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs")
    return spark.sql(_minhash_quality_sql(_SPARK_SHINGLES, "div", ln="size"))


# --- triangle participation counts over the near-dup graph -------------------

_TRIANGLE_ORACLE = f"""
WITH pairs AS MATERIALIZED ({_minhash_sql(_DD_SHINGLES)}),
e AS MATERIALIZED (SELECT doc1 AS u, doc2 AS v FROM pairs),
tri AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
members AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, COUNT(*) AS n_triangles FROM members GROUP BY doc_id
"""


@query("dedup_triangle_count", oracle=_TRIANGLE_ORACLE, tags=("dedup", "graph"))
def dedup_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation over the MinHash near-dup graph —
    the cluster-density metric that separates tight duplicate cliques
    (template spam, boilerplate farms: triangle-rich) from chance pairwise
    collisions (triangle-free), used to pick aggressive-vs-lenient dedup
    policy per cluster.

    Shape: DEGREE-ORIENTED enumeration (r7 verdict #3) — each undirected
    edge points from its lower-(degree, id) endpoint to the higher, so a
    node's out-degree is bounded by O(√m) regardless of its real degree;
    wedges are generated from out-edge pairs and closed against the
    oriented edge list.  This is what keeps 100 TB hub nodes (a viral
    boilerplate doc with 10⁶ near-dup edges) from concentrating one
    reducer: the hub's edges orient INTO it, so it anchors no wedges.
    All shuffles are keyed (degree agg, two degree joins, wedge self-join
    on the anchor, closure join on the wedge pair).

    Oracle: per-doc triangle counts are orientation-INVARIANT, so the
    DuckDB twin keeps the independent id-ordered a<b<c enumeration — a
    different algorithm reaching the same set, which is a stronger check
    than mirroring the orientation on both sides.
    """
    e = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc1").alias("u"), F.col("doc2").alias("v")
    )
    e = materialize(e)
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dy"),
    )
    oriented = materialize(oriented)
    o1 = oriented.select("x", F.col("y").alias("b"), F.col("dy").alias("db"))
    o2 = oriented.select("x", F.col("y").alias("c"), F.col("dy").alias("dc"))
    wedges = o1.join(o2, "x").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closure = oriented.select(F.col("x").alias("b"), F.col("y").alias("c"))
    tri = wedges.join(closure, ["b", "c"]).select("x", "b", "c")
    members = (
        tri.select(F.col("x").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    return members.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_triangles"))


# --- k-core decomposition over the near-dup graph ----------------------------

KCORE_K = 3
#: Fixed peel budget shared by impl and oracle.  Peeling converges in 3
#: rounds at sf0.01 and 4 at sf0.1 (measured); 8 is a 2x margin.  The
#: fixpoint is idempotent (peeling a stable graph removes nothing), so
#: Spark's early exit at round r < KCORE_ROUNDS matches the oracle's
#: full unroll — the same soundness argument as the LPA budget.
KCORE_ROUNDS = 8


def _kcore_chain_sql(k: int, rounds: int) -> str:
    """Unrolled peel: each round keeps nodes with degree >= k and restricts
    the edge list to kept endpoints.

    Every round CTE is MATERIALIZED: e{r-1} is referenced twice per level
    (by k{r} and e{r}) and k{r} twice by e{r}, so letting the planner
    INLINE them re-evaluates each earlier round ~4× per level — a 4^rounds
    geometric blow-up that ground the sf0.1 oracle to a 70+ GB multi-
    minute crawl (measured; the DuckDB twin of the Spark checkpoint-stats
    compounding this repo's ``sever()`` exists for).  Materialization
    bounds each round to one evaluation, exactly like the Spark side's
    per-round ``materialize``.
    """
    ctes = ["e0 AS MATERIALIZED (SELECT doc1 AS u, doc2 AS v FROM pairs UNION ALL SELECT doc2, doc1 FROM pairs)"]
    for r in range(1, rounds + 1):
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT u FROM e{r - 1} GROUP BY u HAVING COUNT(*) >= {k}),\n"
            f"e{r} AS MATERIALIZED (SELECT c.u, c.v FROM e{r - 1} c "
            f"JOIN k{r} a ON c.u = a.u JOIN k{r} b ON c.v = b.u)"
        )
    chain = ",\n".join(ctes)
    return f"""
WITH pairs AS MATERIALIZED ({_minhash_sql(_DD_SHINGLES)}),
{chain}
SELECT u AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM e{rounds} GROUP BY u
"""


@query(
    "dedup_kcore",
    oracle=_kcore_chain_sql(KCORE_K, KCORE_ROUNDS),
    tags=("dedup", "graph", "iterative"),
)
def dedup_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition (K=3) of the MinHash near-dup graph: iteratively
    peel nodes of degree < K until every survivor has K+ neighbors among
    survivors.  The 3-core isolates the DENSE duplication backbone —
    template farms and mass-produced boilerplate where every page links
    to many near-copies — from incidental pairwise matches, a sharper
    policy signal than triangles alone (``dedup_triangle_count`` scores
    local density; the core is a global mutually-reinforcing subgraph,
    the standard graph-degeneracy measure).

    Unlike LPA/Louvain there are NO tie-break concerns: the K-core is a
    unique fixpoint of the peel operator regardless of removal order, so
    determinism is free.

    Scale: each round is one degree aggregation plus two left-semi joins,
    all keyed on the node id — partial aggs collapse map-side, no
    all-pairs step, no skew concentration (a hub's edges are just rows
    under its key).  Rounds are bounded by ``KCORE_ROUNDS``; the driver
    holds a single edge-count probe per round (O(1), the Pregel
    coordination pattern shared with CC/LPA/PageRank).  Edge-count
    stability implies node-set stability (peeling only removes), so the
    probe doubles as the sound early exit.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    e = materialize(
        pairs.select(F.col("doc1").alias("u"), F.col("doc2").alias("v")).unionAll(
            pairs.select(F.col("doc2").alias("u"), F.col("doc1").alias("v"))
        )
    )
    prev = -1
    for _ in range(KCORE_ROUNDS):
        keep = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= KCORE_K)
            .select("u")
        )
        e = materialize(
            e.join(keep, "u", "left_semi").join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
        )
        n = e.count()
        if n == prev:
            break
        prev = n
    return (
        e.select(F.col("u").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


# --- containment (asymmetric) near-dup ---------------------------------------

@query(
    "dedup_containment",
    oracle=_containment_sql(_DD_SHINGLES),
    tags=("dedup", "containment"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection via shingle CONTAINMENT — |A∩B|/|A|
    and |A∩B|/|B| over the LSH candidate pairs, keeping pairs where the
    smaller side is ≥50% contained in the other and naming the contained
    document.  Containment is what catches quote/subset/boilerplate-wrapper
    duplication that symmetric Jaccard under-reports (a 200-char doc fully
    embedded in a 2000-char doc has Jaccard ≈ 0.1 but containment 1.0).

    Honest recall note: candidates come from the Jaccard-tuned MinHash
    bands, whose collision probability FALLS with size asymmetry — extreme
    subset pairs can be missed at the candidate stage.  Production-grade
    asymmetric recall uses size-stratified banding or seeded shingle
    sampling on the small side; the scoring and thresholds here are exact
    over whatever candidate generator feeds them (same Σ(bucket²) scale
    bound as ``dedup_minhash_lsh``).

    Executes via ``lsh_pairs_staged(score="containment")`` (r16): this
    was the last Spark LSH consumer on the one-statement form, whose
    CTE-inlined cascade re-executes per reference (the 800–1,340 s
    re-runs SCALE §20 measured at the 30× stress).  Same fragment
    texts; the DuckDB oracle stays the one-statement ``_containment_sql``.
    """
    docs = load_table(spark, sf_dir, "documents")
    return lsh_pairs_staged(spark, docs, score="containment")


# --- edit-distance near-dup tier (blocked levenshtein join) -------------------

#: maximum members per blocking key before the block is considered
#: degenerate — 5× the largest block observed at the registered scales
#: (19 at sf0.1), same cap discipline as ``LSH_BUCKET_CAP``.
FUZZY_BLOCK_CAP = 100


def _fuzzy_sql(table: str, cap: int | None = None, star: bool = False) -> str:
    """Dialect-shared blocked-levenshtein pair SQL with a BLOCK-SIZE CAP
    and optional STAR SALVAGE — the r12-verdict close of the one remaining
    uncapped Σ(block²) tier, mirroring ``_lsh_core_sql``'s cap+star
    pattern exactly: a block larger than ``cap`` (a corpus where thousands
    of documents share a 10-char prefix — boilerplate headers, template
    spam) would make the block-local self-join quadratic, so the capped
    core DROPS it; with ``star=True`` each over-cap block instead emits
    O(n) exemplar→member pairs (exemplar = min doc_id), each still
    levenshtein-verified, and ``via_star = 1`` marks pairs reachable ONLY
    through salvage.  Downstream CC recovers the full cluster through the
    star center at linear cost.  Runs unchanged in Spark SQL and DuckDB
    (``substr``/``right``/``levenshtein``/``HAVING`` are dialect-shared).
    """
    cap = FUZZY_BLOCK_CAP if cap is None else int(cap)
    core = f"""
WITH p AS (
  SELECT doc_id, substr(text, 1, 40) AS pfx, substr(text, 1, 10) AS blk1,
         right(substr(text, 1, 40), 10) AS blk2
  FROM {table} WHERE lang = 'en'
),
blks AS (
  SELECT 1 AS pno, blk1 AS blk, doc_id FROM p
  UNION ALL
  SELECT 2, blk2, doc_id FROM p
),
bcap AS (SELECT pno, blk FROM blks GROUP BY pno, blk HAVING COUNT(*) <= {cap}),
ok AS (
  SELECT b.pno, b.blk, b.doc_id
  FROM blks b JOIN bcap c ON c.pno = b.pno AND c.blk = b.blk
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM ok a JOIN ok b
    ON a.pno = b.pno AND a.blk = b.blk AND a.doc_id < b.doc_id
)"""
    if not star:
        return f"""{core}
SELECT c.doc1, c.doc2, CAST(levenshtein(p1.pfx, p2.pfx) AS BIGINT) AS lev
FROM cand c
JOIN p p1 ON p1.doc_id = c.doc1
JOIN p p2 ON p2.doc_id = c.doc2
WHERE levenshtein(p1.pfx, p2.pfx) <= 2
"""
    return f"""{core},
over AS (
  SELECT pno, blk, MIN(doc_id) AS ex
  FROM blks GROUP BY pno, blk HAVING COUNT(*) > {cap}
),
star AS (
  SELECT DISTINCT o.ex AS doc1, b.doc_id AS doc2
  FROM over o JOIN blks b
    ON b.pno = o.pno AND b.blk = o.blk AND b.doc_id <> o.ex
),
allc AS (
  SELECT doc1, doc2, 0 AS via_star FROM cand
  UNION ALL
  SELECT s.doc1, s.doc2, 1
  FROM star s LEFT JOIN cand c ON c.doc1 = s.doc1 AND c.doc2 = s.doc2
  WHERE c.doc1 IS NULL
)
SELECT a.doc1, a.doc2, CAST(levenshtein(p1.pfx, p2.pfx) AS BIGINT) AS lev,
       CAST(a.via_star AS BIGINT) AS via_star
FROM allc a
JOIN p p1 ON p1.doc_id = a.doc1
JOIN p p2 ON p2.doc_id = a.doc2
WHERE levenshtein(p1.pfx, p2.pfx) <= 2
"""


@query(
    "dedup_fuzzy_prefix_pairs",
    oracle=_fuzzy_sql("documents"),
    tags=("dedup", "fuzzy", "levenshtein"),
)
def dedup_fuzzy_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE near-dup tier (blocked levenshtein join): document
    pairs whose 40-char prefixes are within edit distance 2, candidates
    from TWO-PASS blocking (r8 verdict #7) — pairs sharing the first 10
    chars OR the last 10 chars of the prefix — the fuzzy-matching shape
    (typo-level duplicates, OCR noise, near-identical headers) that the
    set-similarity tiers (MinHash/SimHash/n-gram Jaccard) structurally
    miss, because a single in-word edit changes every shingle that
    crosses it while edit distance counts it once.

    Recall: with disjoint head/tail blocks (prefix ≥ 20 chars) a single
    edit can break at most one blocking key, so every 1-edit pair is
    recalled; 2-edit pairs are recalled unless the edits split across
    both blocks.  One honest residue remains: a length-CHANGING edit
    (insert/delete) inside the head slides the fixed 40-char window, so
    both keys move — head substitutions (the dominant typo/OCR case) are
    what the tail pass recovers.  The production fix for the residue is a
    length-banded block key, same union shape.

    Scale: each pass is a block-equi self-join — pair work is Σ(block²)
    per pass, now BOUNDED by ``FUZZY_BLOCK_CAP`` (r12 verdict: the one
    previously uncapped quadratic tier) — blocks over the cap are dropped
    here and star-salvaged in ``dedup_fuzzy_prefix_pairs_star``; at the
    registered scales no block is within 5× of the cap, so the capped
    output is hash-identical to the uncapped history.  Levenshtein runs
    only inside blocks on fixed-length prefixes, so per-pair cost is
    O(40²) constant.  Restricted to one language (en): blocking across
    scripts is meaningless and byte-vs-codepoint edit-distance semantics
    stay engine-identical on ASCII.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs")
    return spark.sql(_fuzzy_sql("__docs"))


@query(
    "dedup_fuzzy_prefix_pairs_star",
    oracle=_fuzzy_sql("documents", star=True),
    tags=("dedup", "fuzzy", "levenshtein"),
)
def dedup_fuzzy_prefix_pairs_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered twin of ``_fuzzy_sql(star=True)`` at the default cap —
    see that builder's docstring for the over-cap star-salvage semantics.
    At the verified scales no block is over-cap, so the output equals
    ``dedup_fuzzy_prefix_pairs`` with ``via_star = 0`` throughout — the
    hash check pins the salvage tier's non-interference on healthy
    corpora; its recovery under a forced tiny cap is pinned by
    ``tests/test_fuzzy_star.py`` (same split as the LSH cap+star pair).
    """
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs")
    return spark.sql(_fuzzy_sql("__docs", star=True))


def _fuzzy_audit_sql(table: str, dv: str, cap: int | None = None) -> str:
    """Per-pass census of the fuzzy tier's blocking keys — the
    observability counterpart the capped ``_fuzzy_sql`` core lacks (r13
    advice: the plain query silently drops over-cap blocks; this makes
    the truncation a queryable number instead of tribal knowledge).
    One row per blocking pass: block count, over-cap block/doc counts,
    the largest block, and admitted vs dropped pair work (Σ n·(n−1)/2
    split at the cap) — the exact quadratic budget the cap bounds.
    ``dv`` is the integer-division token ('//' DuckDB, 'div' Spark);
    n·(n−1) is always even so the division is exact in both."""
    cap = FUZZY_BLOCK_CAP if cap is None else int(cap)
    return f"""
WITH p AS (
  SELECT doc_id, substr(text, 1, 10) AS blk1,
         right(substr(text, 1, 40), 10) AS blk2
  FROM {table} WHERE lang = 'en'
),
blks AS (
  SELECT 1 AS pno, blk1 AS blk, doc_id FROM p
  UNION ALL
  SELECT 2, blk2, doc_id FROM p
),
sz AS (SELECT pno, blk, COUNT(*) AS n FROM blks GROUP BY pno, blk)
SELECT CAST(pno AS BIGINT) AS pno,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN n > {cap} THEN 1 ELSE 0 END) AS BIGINT) AS overcap_blocks,
       CAST(SUM(CASE WHEN n > {cap} THEN n ELSE 0 END) AS BIGINT) AS overcap_docs,
       CAST(MAX(n) AS BIGINT) AS max_block,
       CAST(SUM(CASE WHEN n <= {cap} THEN (n * (n - 1)) {dv} 2 ELSE 0 END) AS BIGINT) AS admitted_pairs,
       CAST(SUM(CASE WHEN n > {cap} THEN (n * (n - 1)) {dv} 2 ELSE 0 END) AS BIGINT) AS dropped_pairs
FROM sz GROUP BY pno ORDER BY pno
"""


@query(
    "dedup_fuzzy_block_audit",
    oracle=_fuzzy_audit_sql("documents", "//"),
    tags=("dedup", "fuzzy", "audit"),
)
def dedup_fuzzy_block_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-key census for the edit-distance tier (see
    ``_fuzzy_audit_sql``): run beside ``dedup_fuzzy_prefix_pairs`` in
    production so a corpus that trips ``FUZZY_BLOCK_CAP`` reports HOW MANY
    blocks/docs/pairs the capped core dropped (and hence whether the
    ``_star`` salvage twin is required), mirroring the role
    ``dedup_lsh_bucket_audit`` plays for the MinHash tier.  Scale: one
    groupBy over the block keys then a 2-row rollup — strictly cheaper
    than the pair join it audits."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs")
    return spark.sql(_fuzzy_audit_sql("__docs", "div"))


# --- the composed curation pipeline: raw → normalized → LSH → CC → keeper ------

_DD_SHINGLES_SURV = f"""
SELECT doc_id, {_shingle_hash_sql('unicode')} AS h
FROM (SELECT doc_id, text, unnest(range(1, length(text) - {SHINGLE_K - 2})) AS p
      FROM documents WHERE length(text) >= {SHINGLE_K}
        AND doc_id IN (SELECT rep FROM reps2))
"""

_PIPELINE_VERDICT_ORACLE = f"""
WITH reps1 AS MATERIALIZED (
  SELECT CAST(min(doc_id) AS BIGINT) AS rep, text
  FROM documents GROUP BY text
),
n1 AS MATERIALIZED (
  SELECT rep, trim(regexp_replace(lower(text), '{_NORM_PAT}', ' ', 'g')) AS norm_key
  FROM reps1
),
ng AS MATERIALIZED (
  SELECT norm_key, CAST(min(rep) AS BIGINT) AS norm_rep FROM n1 GROUP BY norm_key
),
n2map AS MATERIALIZED (
  SELECT n1.rep, ng.norm_rep FROM n1 JOIN ng ON ng.norm_key = n1.norm_key
),
reps2 AS MATERIALIZED (SELECT DISTINCT norm_rep AS rep FROM ng),
pairs AS MATERIALIZED (__MINHASH__),
edges AS MATERIALIZED (
  SELECT doc1 AS u, doc2 AS v FROM pairs
  UNION
  SELECT doc2, doc1 FROM pairs
),
__CC_CHAIN__,
labels AS (SELECT id AS doc_id, lbl AS component_id FROM lchecked),
comp AS MATERIALIZED (
  SELECT r.rep AS doc_id, CAST(COALESCE(l.component_id, r.rep) AS BIGINT) AS component_id
  FROM reps2 r LEFT JOIN labels l ON l.doc_id = r.rep
),
keeper AS MATERIALIZED (
  SELECT c.component_id, c.doc_id AS keeper_doc
  FROM (
    SELECT c.component_id, c.doc_id,
           row_number() OVER (PARTITION BY c.component_id
                              ORDER BY length(d.text) DESC, c.doc_id) AS rn
    FROM comp c JOIN documents d ON d.doc_id = c.doc_id
  ) c WHERE c.rn = 1
)
SELECT d.doc_id,
       r1.rep AS exact_rep,
       nm.norm_rep,
       c.component_id,
       (d.doc_id = k.keeper_doc) AS keep,
       CASE WHEN d.doc_id <> r1.rep THEN 'exact_dup'
            WHEN d.doc_id <> nm.norm_rep THEN 'normalized_dup'
            WHEN d.doc_id <> k.keeper_doc THEN 'near_dup'
            ELSE 'keeper' END AS verdict
FROM documents d
JOIN reps1 r1 ON r1.text = d.text
JOIN n2map nm ON nm.rep = r1.rep
JOIN comp c ON c.doc_id = nm.norm_rep
JOIN keeper k ON k.component_id = c.component_id
""".replace("__MINHASH__", _minhash_sql(_DD_SHINGLES_SURV)).replace(
    "__CC_CHAIN__", _cc_labels_sql()
)


@query(
    "dedup_pipeline_verdict",
    oracle=_PIPELINE_VERDICT_ORACLE,
    tags=("dedup", "pipeline", "composition", "headline"),
)
def dedup_pipeline_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL curation dedup pipeline as ONE query — the flagship
    LLM-data demo (r9 verdict #7): every document flows raw-exact →
    normalized-exact → MinHash-LSH near-dup → connected components →
    per-cluster keeper, and comes out with its representative chain and
    a single keep/drop verdict naming the stage that dropped it
    (``exact_dup`` / ``normalized_dup`` / ``near_dup`` / ``keeper``).
    The individual operators are registered separately
    (``dedup_exact``, ``dedup_normalized_exact``, ``dedup_minhash_lsh``,
    ``dedup_cc_star``, ``dedup_cluster_keeper``); this row proves the
    HANDOFFS: each tier only processes the previous tier's survivors, so
    the expensive shingle/LSH stage sees the corpus net of exact and
    normalized duplicates — exactly how a production pipeline cuts LSH
    cost, and the composition the separate rows can't verify.

    Scale shape: two content-keyed aggregates (raw text, then normalized
    text over exact reps only — the second shuffle is already shrunk by
    tier 1), the bucket-local LSH self-join over SURVIVORS only, the
    O(log n)-round star CC (the 100 TB CC), one component-keyed keeper
    window (cluster-size bounded), and verdict assembly as broadcast-
    friendly joins back to the corpus.  No stage rescans anything the
    previous stage already reduced; the exact-rep aggregate's exchange is
    REUSED by both its consumers (mapping join + normalize tier —
    plan-tested).
    """
    d = load_table(spark, sf_dir, "documents")
    reps1 = d.groupBy("text").agg(F.min("doc_id").alias("exact_rep"))
    n1 = reps1.select(
        F.col("exact_rep").alias("rep"),
        F.trim(F.regexp_replace(F.lower(F.col("text")), _NORM_PAT, " ")).alias(
            "norm_key"
        ),
    )
    ng = n1.groupBy("norm_key").agg(F.min("rep").alias("norm_rep"))
    n2map = n1.join(ng, "norm_key").select("rep", "norm_rep")
    surviving = ng.select(F.col("norm_rep").alias("doc_id")).distinct()

    pairs = lsh_pairs_staged(spark, d.join(surviving, "doc_id")).select(
        "doc1", "doc2"
    )
    labels = cc_star_labels(pairs)

    comp = surviving.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", "doc_id").cast("bigint").alias("component_id"),
    )
    lens = d.select("doc_id", F.length("text").cast("bigint").alias("text_len"))
    w = W.partitionBy("component_id").orderBy(F.col("text_len").desc(), F.col("doc_id"))
    keeper = (
        comp.join(lens, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("component_id", F.col("doc_id").alias("keeper_doc"))
    )

    return (
        d.select("doc_id", "text")
        .join(reps1, "text")
        .join(n2map, F.col("exact_rep") == F.col("rep"))
        .join(comp.withColumnRenamed("doc_id", "norm_rep"), "norm_rep")
        .join(keeper, "component_id")
        .select(
            "doc_id",
            F.col("exact_rep").cast("bigint").alias("exact_rep"),
            F.col("norm_rep").cast("bigint").alias("norm_rep"),
            "component_id",
            (F.col("doc_id") == F.col("keeper_doc")).alias("keep"),
            F.when(F.col("doc_id") != F.col("exact_rep"), "exact_dup")
            .when(F.col("doc_id") != F.col("norm_rep"), "normalized_dup")
            .when(F.col("doc_id") != F.col("keeper_doc"), "near_dup")
            .otherwise("keeper")
            .alias("verdict"),
        )
    )


_PIPELINE_VERDICT_STAR_ORACLE = _PIPELINE_VERDICT_ORACLE.replace(
    f"pairs AS MATERIALIZED ({_minhash_sql(_DD_SHINGLES_SURV)})",
    f"pairs AS MATERIALIZED ({_lsh_star_sql(_DD_SHINGLES_SURV)})",
)
assert _PIPELINE_VERDICT_STAR_ORACLE != _PIPELINE_VERDICT_ORACLE


@query(
    "dedup_pipeline_verdict_star",
    oracle=_PIPELINE_VERDICT_STAR_ORACLE,
    tags=("dedup", "pipeline", "composition", "lsh"),
)
def dedup_pipeline_verdict_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_pipeline_verdict`` with the near-dup tier swapped to the
    STAR-SALVAGE candidate generator (``_lsh_star_sql``) — the composed
    flagship pipeline in its degenerate-bucket-safe configuration: raw →
    normalized → capped LSH ∪ exemplar stars → star-CC → keeper, one
    verdict per document.  Identical to the plain pipeline when no bucket
    is over-cap (the verified-scale case the driver hash-checks); at the
    20× degenerate stress point the plain tier orphans ~40k docs as
    spurious keepers while the star tier reassembles their clusters
    (SCALE §13c — measured on the keeper stage these verdicts feed).
    Same handoff structure and scale shape as the plain pipeline
    (survivor-restricted shingles, O(log n) star CC, component-keyed
    keeper window).
    """
    d = load_table(spark, sf_dir, "documents")
    reps1 = d.groupBy("text").agg(F.min("doc_id").alias("exact_rep"))
    n1 = reps1.select(
        F.col("exact_rep").alias("rep"),
        F.trim(F.regexp_replace(F.lower(F.col("text")), _NORM_PAT, " ")).alias(
            "norm_key"
        ),
    )
    ng = n1.groupBy("norm_key").agg(F.min("rep").alias("norm_rep"))
    n2map = n1.join(ng, "norm_key").select("rep", "norm_rep")
    surviving = ng.select(F.col("norm_rep").alias("doc_id")).distinct()

    pairs = lsh_pairs_staged(spark, d.join(surviving, "doc_id"), star=True).select(
        "doc1", "doc2"
    )
    labels = cc_star_labels(pairs)

    comp = surviving.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", "doc_id").cast("bigint").alias("component_id"),
    )
    lens = d.select("doc_id", F.length("text").cast("bigint").alias("text_len"))
    w = W.partitionBy("component_id").orderBy(F.col("text_len").desc(), F.col("doc_id"))
    keeper = (
        comp.join(lens, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("component_id", F.col("doc_id").alias("keeper_doc"))
    )

    return (
        d.select("doc_id", "text")
        .join(reps1, "text")
        .join(n2map, F.col("exact_rep") == F.col("rep"))
        .join(comp.withColumnRenamed("doc_id", "norm_rep"), "norm_rep")
        .join(keeper, "component_id")
        .select(
            "doc_id",
            F.col("exact_rep").cast("bigint").alias("exact_rep"),
            F.col("norm_rep").cast("bigint").alias("norm_rep"),
            "component_id",
            (F.col("doc_id") == F.col("keeper_doc")).alias("keep"),
            F.when(F.col("doc_id") != F.col("exact_rep"), "exact_dup")
            .when(F.col("doc_id") != F.col("norm_rep"), "normalized_dup")
            .when(F.col("doc_id") != F.col("keeper_doc"), "near_dup")
            .otherwise("keeper")
            .alias("verdict"),
        )
    )


# --- SemDeDup: semantic dedup via embedding-cluster pruning ------------------
#
# The cluster-then-prune design from "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication" (Abbas et al., 2023, public
# arXiv 2303.09540): k-means the embedding space, compare points ONLY
# within their cluster (pairwise cost n²/k instead of n²), and inside each
# cluster drop every point whose cosine to an earlier-ranked member exceeds
# τ — rank = distance-to-centroid (centroid-closest kept first), the
# paper's "keep the prototypical example" rule.

#: cosine threshold above which two same-cluster points are semantic dups.
#: Chosen at the ~p99 of the measured within-cluster pair distribution on
#: the synthetic embeddings (max 0.47, p99 0.295) so the verdict is
#: selective but non-empty; production corpora use 0.95-0.999.
SEMDEDUP_TAU = 0.30


_SEMDEDUP_ORACLE = f"""
WITH coo AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
centroids AS (
  SELECT label, pos,
         round(CAST(SUM(CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)))
               AS DOUBLE) / COUNT(*), 6) AS c6
  FROM coo GROUP BY label, pos
),
cnorm AS (
  SELECT label, CAST(SUM(CAST(round(CAST(c6 * c6 AS DOUBLE), 6)
              AS DECIMAL(18,6))) AS DOUBLE) AS cn2
  FROM centroids GROUP BY label
),
vnorm AS (
  SELECT vec_id, CAST(SUM(CAST(round(CAST(v * v AS DOUBLE), 6)
              AS DECIMAL(18,6))) AS DOUBLE) AS vn2
  FROM coo GROUP BY vec_id
),
assign AS (
  SELECT vec_id, label AS cell, round(dot / sqrt(vn2 * cn2), 6) AS c2c,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY round(dot / sqrt(vn2 * cn2), 6) DESC, label
         ) AS rn
  FROM (
    SELECT c.vec_id, ct.label,
           CAST(SUM(CAST(round(CAST(c.v * ct.c6 AS DOUBLE), 6)
                 AS DECIMAL(18,6))) AS DOUBLE) AS dot
    FROM coo c JOIN centroids ct USING (pos)
    GROUP BY c.vec_id, ct.label
  ) d JOIN vnorm USING (vec_id) JOIN cnorm USING (label)
),
qe AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS q
  FROM embeddings
),
qn AS (
  SELECT vec_id, list_aggregate(list_transform(q, x -> x * x), 'sum') AS n2
  FROM qe
),
m AS (
  SELECT a.vec_id, a.cell, a.c2c,
         row_number() OVER (
           PARTITION BY a.cell ORDER BY a.c2c DESC, a.vec_id
         ) AS crank,
         qe.q, qn.n2
  FROM assign a JOIN qe USING (vec_id) JOIN qn USING (vec_id)
  WHERE a.rn = 1
),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM m a JOIN m b ON a.cell = b.cell AND a.crank < b.crank
  WHERE round(list_aggregate(list_transform(range(1, len(a.q) + 1),
            k -> a.q[k] * b.q[k]), 'sum') / sqrt(a.n2 * b.n2), 6)
        >= {SEMDEDUP_TAU}
)
SELECT m.vec_id, CAST(m.cell AS BIGINT) AS cell,
       CAST(m.crank AS BIGINT) AS crank,
       CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
FROM m LEFT JOIN dups d ON m.vec_id = d.vec_id
"""


@query(
    "dedup_semdedup",
    oracle=_SEMDEDUP_ORACLE,
    tags=("dedup", "embedding", "semdedup"),
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup pruning in
    embedding space — cluster, then compare ONLY within clusters.

    Index: the deterministic per-label mean centroids (the same coarse
    quantizer as ``ann_ivf_probe``, so the DuckDB oracle mirrors the
    build), every vector assigned to its nearest centroid by 6-decimal
    cosine.  Within each cluster, members rank by closeness to the
    centroid (the paper keeps the prototypical example); a member is a
    semantic dup iff some EARLIER-ranked cluster-mate's cosine exceeds
    ``SEMDEDUP_TAU``.  Pair cosines ride milli-quantized integer dot
    products (exact BIGINT arithmetic → the float division/sqrt is
    bit-identical cross-engine).

    Scale: the whole point of the design — pairwise work is
    Σ_cluster(size²) ≈ n²/k instead of n², every join is equi on ``cell``
    or ``pos`` against a broadcast-size centroid table, and clusters that
    still blow the pair budget at 100 TB take the same cap+star salvage
    the LSH tiers use (``dedup_minhash_lsh_star``).  k grows with n (the
    paper uses 50k clusters for LAION-440M), keeping cluster sizes
    bounded."""
    from .similarity import _stat6d

    e = load_table(spark, sf_dir, "embeddings")
    coo = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "v32")
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("v32").cast("double").alias("v"),
    )
    coo = materialize(coo)
    centroids = coo.groupBy("label", "pos").agg(
        F.round(
            F.sum(_stat6d(F.col("v"))).cast("double") / F.count(F.lit(1)), 6
        ).alias("c6")
    )
    cnorm = centroids.groupBy("label").agg(
        F.sum(_stat6d(F.col("c6") * F.col("c6"))).cast("double").alias("cn2")
    )
    vnorm = coo.groupBy("vec_id").agg(
        F.sum(_stat6d(F.col("v") * F.col("v"))).cast("double").alias("vn2")
    )
    dots = (
        coo.join(F.broadcast(centroids.withColumnRenamed("label", "clabel")), "pos")
        .groupBy("vec_id", "clabel")
        .agg(F.sum(_stat6d(F.col("v") * F.col("c6"))).cast("double").alias("dot"))
    )
    c2c6 = F.round(F.col("dot") / F.sqrt(F.col("vn2") * F.col("cn2")), 6)
    assign = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm.withColumnRenamed("label", "clabel")), "clabel")
        .select(
            "vec_id",
            F.col("clabel").alias("cell"),
            c2c6.alias("c2c"),
            F.row_number()
            .over(W.partitionBy("vec_id").orderBy(c2c6.desc(), F.col("clabel").asc()))
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
    )
    qe = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1e3).cast("bigint")
        ).alias("q"),
    ).withColumn(
        "n2",
        F.aggregate(
            F.transform("q", lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )
    members = materialize(
        assign.join(qe, "vec_id").select(
            "vec_id",
            "cell",
            F.row_number()
            .over(W.partitionBy("cell").orderBy(F.col("c2c").desc(), F.col("vec_id")))
            .alias("crank"),
            "q",
            "n2",
        )
    )
    a = members.select(
        F.col("cell").alias("cell"),
        F.col("crank").alias("crank_a"),
        F.col("q").alias("qa"),
        F.col("n2").alias("n2a"),
    )
    b = members.select(
        "vec_id",
        F.col("cell").alias("cell"),
        F.col("crank").alias("crank_b"),
        F.col("q").alias("qb"),
        F.col("n2").alias("n2b"),
    )
    pair_cos = F.round(
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        / F.sqrt(F.col("n2a").cast("double") * F.col("n2b").cast("double")),
        6,
    )
    dups = (
        a.join(b, "cell")
        .where(F.col("crank_a") < F.col("crank_b"))
        .where(pair_cos >= F.lit(SEMDEDUP_TAU))
        .select("vec_id")
        .distinct()
        .withColumn("is_dup_f", F.lit(1))
    )
    return (
        members.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.col("crank").cast("bigint").alias("crank"),
            F.coalesce("is_dup_f", F.lit(0)).cast("int").alias("is_dup"),
        )
    )
