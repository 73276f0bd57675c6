"""MLlib-backed operators (SURVEY.md §2.A A10 + §2.B Dedup/Similarity LSH
rows).

The reference's PCA experiments (SURVEY.md §2.A A10 [M, low]: MLlib or
chunked SVD on the RDD matrix) map to ``pyspark.ml.feature.PCA`` over the
``embeddings`` array column; the LSH families are the MLlib twins of the
hand-rolled SQL LSH in operators/dedup.py and operators/similarity.py.

None of these have an exact SQL oracle (eigenvectors are sign/rotation
ambiguous; MLlib's hash families use library-internal seeds), so they are
registered **without** oracle SQL — the driver records a rows-only check
(contract permits this) and tests/test_ml.py self-checks PCA against
``numpy.linalg.svd`` and LSH recall against the exact pair sets.

Scale notes: MLlib PCA computes the Gramian via a single treeAggregate —
O(d²) driver memory, fine for d ≲ 10⁴ (the AnnData regime; for wider
matrices switch to ``RowMatrix.computeSVD``).  ``approxSimilarityJoin`` is
a bucket-join under the hood — the same LSH shape as the SQL variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.compat import big
from ..registry import query

PCA_K = 16
EMBED_DIM = 64  # driver embeddings table dimension (TESTDATA.md)


def _vectorized(df: DataFrame) -> DataFrame:
    """embeddings table -> (vec_id, label, features: VectorUDT)."""
    from pyspark.ml.functions import array_to_vector

    return df.select(
        "vec_id",
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )


def pca_scores(spark: SparkSession, sf_dir: str, k: int = PCA_K) -> DataFrame:
    """PCA(k) scores per cell (Scanpy ``pp.pca`` semantics: center, project
    onto top right-singular vectors; ref experiments [M, low]) in long form
    (vec_id, component, score).

    MLlib's PCA derives axes from the (internally centered) covariance but
    projects the RAW vectors — an explicit mean-centering step
    (StandardScaler withMean) precedes it so scores are the Scanpy ones.
    tests/test_ml.py aligns signs and asserts k=16 scores match
    ``numpy.linalg.svd`` of the centered matrix.
    """
    from pyspark.ml.feature import PCA, StandardScaler
    from pyspark.ml.functions import vector_to_array

    raw = _vectorized(load_table(spark, sf_dir, "embeddings"))
    centerer = StandardScaler(
        withMean=True, withStd=False, inputCol="features", outputCol="centered"
    ).fit(raw)
    e = centerer.transform(raw).drop("features").withColumnRenamed("centered", "features")
    model = PCA(k=k, inputCol="features", outputCol="pcs").fit(e)
    return (
        model.transform(e)
        .select("vec_id", F.posexplode(vector_to_array("pcs")).alias("component", "score"))
        .select("vec_id", big("component", "component"), F.col("score"))
    )


#: Full-rank PC-space norms are rotation/sign-invariant: with k = d the
#: orthonormal eigenbasis is a pure rotation of the centered data, so each
#: cell's squared score-norm equals its squared distance from the mean —
#: which IS SQL-expressible.  Per-row float error between the two engines is
#: O(1e-12) against a 1e-4 rounding grid, so the hash is stable.
_PCA_ORACLE = f"""
WITH cells AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
means AS (SELECT i, AVG(x) AS mu FROM cells GROUP BY i)
SELECT c.vec_id, round(SUM((c.x - m.mu) * (c.x - m.mu)), 4) AS norm2_pc
FROM cells c JOIN means m USING (i)
GROUP BY c.vec_id
"""


@query("sc_pca", oracle=_PCA_ORACLE, tags=("singlecell", "ml", "pca"))
def sc_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — PCA over embeddings, checked through a rotation-invariant
    oracle: the registered query runs the FULL-RANK (k = d = 64) MLlib PCA
    pipeline and emits each cell's squared PC-space norm, which must equal
    the cell's squared distance from the column means (computable in plain
    SQL) because an orthonormal full basis is a rotation.  Component-level
    k=16 scores (sign-ambiguous, not SQL-expressible) are verified against
    ``numpy.linalg.svd`` in tests/test_ml.py via ``pca_scores``.

    Rounding to 4 decimals absorbs the O(1e-12) cross-engine float drift
    from mean estimation, projection roundoff, and 64-term sum order.
    """
    scores = pca_scores(spark, sf_dir, k=EMBED_DIM)
    return scores.groupBy("vec_id").agg(
        F.round(F.sum(F.col("score") * F.col("score")), 4).alias("norm2_pc")
    )


def minhash_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH near-dup join over documents (the library twin of
    ``dedup_minhash_lsh``): word tokens → binary HashingTF vectors →
    ``approxSimilarityJoin`` at Jaccard distance ≤ 0.7, aggregated to
    per-document neighbor stats (count + closest distance).

    Scale reality check (measured): on THIS corpus the library join
    degenerates — a ~40-word vocabulary makes nearly all docs share MinHash
    buckets, so the bucket self-join approaches all-pairs (8 tables ×
    5000² at sf0.1 exceeds 9 min wall on local[32]; 500 docs at sf0.01
    complete in seconds, which is the driver's correctness point).  The
    SCALE path for MinHash dedup is the banded SQL implementation
    (``dedup_minhash_lsh``, operators/dedup.py) whose shingled features
    keep buckets selective; this MLlib twin exists for library parity and
    stays per-doc-aggregated so the pair list is never collected.

    ``n_near_dups`` depends on LSH recall (library-internal hash
    coefficients), so this detailed form stays unregistered (checked in
    tests/test_ml.py); the registered ``mllib_minhash_dedup`` hash-checks
    the family's recall GUARANTEE instead.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, RegexTokenizer

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = RegexTokenizer(
        inputCol="text", outputCol="words", pattern=r"[^a-z0-9]+", minTokenLength=1
    ).transform(d.withColumn("text", F.lower("text")))
    tf = HashingTF(
        inputCol="words", outputCol="features", numFeatures=1 << 16, binary=True
    ).transform(toks)
    tf = tf.where(F.size("words") > 0).cache()
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42).fit(tf)
    pairs = model.approxSimilarityJoin(tf, tf, 0.7, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") != F.col("datasetB.doc_id"))
        .groupBy(F.col("datasetA.doc_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_near_dups"),
            F.round(F.min("jaccard_dist"), 4).alias("closest_dist"),
        )
    )


#: LSH gives no general recall guarantee, but it gives an ABSOLUTE one for
#: identical inputs.  The binary HashingTF vector is a function of the
#: doc's DISTINCT-token set, so two docs with equal token sets get
#: identical vectors, identical MinHash signatures, land in the same
#: bucket of every hash table, and their candidate pair's true Jaccard
#: distance is 0 ≤ threshold — every such doc MUST surface with
#: closest_dist = 0.  The oracle enumerates token-set-duplicate docs in
#: SQL (87 docs at sf0.001, 75 at sf0.01 — non-vacuous) and asserts the
#: flags the live join computes.
_MINHASH_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_sort(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             t -> length(t) >= 1))) AS tset
  FROM documents
)
SELECT doc_id, TRUE AS has_set_dup, TRUE AS closest_is_zero
FROM toks
WHERE len(tset) > 0
  AND tset IN (SELECT tset FROM toks GROUP BY tset HAVING COUNT(*) > 1)
"""


@query("mllib_minhash_dedup", oracle=_MINHASH_ORACLE, tags=("dedup", "ml", "lsh"))
def mllib_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH dedup, hash-oracled through the identical-input
    recall guarantee (see oracle note): every document whose distinct-token
    set duplicates another's must be reported by the live LSH join with a
    distance-0 nearest neighbor.  The full per-doc near-dup profile is
    ``minhash_dedup_profile`` (tests/test_ml.py)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", F.lower("text").alias("lt"))
    toks = d.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(
                F.filter(F.split("lt", "[^a-z0-9]+"), lambda t: F.length(t) >= 1)
            )
        ).alias("tset"),
    ).where(F.size("tset") > 0)
    dup_sets = toks.groupBy("tset").agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    dup_docs = toks.join(F.broadcast(dup_sets.select("tset")), "tset").select("doc_id")
    prof = minhash_dedup_profile(spark, sf_dir)
    return (
        dup_docs.join(prof, "doc_id", "left")
        .select(
            "doc_id",
            F.lit(True).alias("has_set_dup"),
            (F.col("closest_dist") == 0.0).alias("closest_is_zero"),
        )
    )


def brp_lsh_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane-bucketed euclidean neighbor pairs over embeddings
    (BucketedRandomProjectionLSH ``approxSimilarityJoin``, distance ≤ 1.2)
    — the MLlib twin of ``ann_cosine_pairs_signlsh``.

    The pair SET depends on library-internal projection seeds, so this
    detailed form stays unregistered (spot-checked vs numpy in
    tests/test_ml.py); the registered ``mllib_brp_lsh_neighbors``
    hash-checks the join's soundness properties instead.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    e = _vectorized(load_table(spark, sf_dir, "embeddings")).cache()
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=4, seed=42
    ).fit(e)
    pairs = model.approxSimilarityJoin(e, e, 1.2, distCol="euclid_dist")
    return (
        pairs.where(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec1"),
            F.col("datasetB.vec_id").alias("vec2"),
            F.round("euclid_dist", 4).alias("euclid_dist"),
        )
    )


#: LSH recall is seed-dependent, but SOUNDNESS is not: every reported pair
#: must (a) exist, (b) carry the TRUE euclidean distance (recomputed here
#: from the raw embeddings in plain SQL arithmetic, tolerance = the 4-dp
#: output rounding), (c) respect the 1.2 threshold, and (d) be in canonical
#: vec1 < vec2 order.  All four are computed Spark-side from the live join
#: and hash-checked against the oracle's literals.  An empty pair set turns
#: ``found_pairs`` false (and the exactness flags NULL), so the check
#: cannot pass vacuously.
_BRP_ORACLE = """
SELECT TRUE AS found_pairs, TRUE AS dists_exact,
       TRUE AS within_threshold, TRUE AS canonical_order
FROM embeddings LIMIT 1
"""


@query("mllib_brp_lsh_neighbors", oracle=_BRP_ORACLE, tags=("similarity", "ml", "lsh"))
def mllib_brp_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH neighbor join, hash-oracled through its
    soundness invariants (see oracle note); the raw pair list is
    ``brp_lsh_neighbor_pairs`` (tests/test_ml.py)."""
    pairs = brp_lsh_neighbor_pairs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    exact = (
        pairs.join(emb.withColumnRenamed("vec_id", "vec1").withColumnRenamed("v", "v1"), "vec1")
        .join(emb.withColumnRenamed("vec_id", "vec2").withColumnRenamed("v", "v2"), "vec2")
        .select(
            "vec1",
            "vec2",
            "euclid_dist",
            F.sqrt(
                F.aggregate(
                    F.zip_with("v1", "v2", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("exact_dist"),
        )
    )
    return exact.agg(
        (F.count(F.lit(1)) > 0).alias("found_pairs"),
        (F.max(F.abs(F.col("euclid_dist") - F.col("exact_dist"))) <= 5.1e-5).alias("dists_exact"),
        (F.max("euclid_dist") <= 1.2 + 1e-9).alias("within_threshold"),
        (F.min(F.col("vec1") < F.col("vec2"))).alias("canonical_order"),
    )


def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster KMeans(k=10, fixed seed) readout: size, majority
    ``label`` and its purity — the clustering quality view for the
    AnnData-style annotation comparison.  Seed-deterministic in Spark but
    not SQL-reproducible (centroid init is library-internal), so this
    detailed form stays unregistered; tests/test_ml.py checks it and the
    registered ``kmeans_embedding_clusters`` hash-checks the invariants.
    """
    from pyspark.ml.clustering import KMeans

    e = _vectorized(load_table(spark, sf_dir, "embeddings")).cache()
    model = KMeans(k=10, seed=42, featuresCol="features", predictionCol="cluster").fit(e)
    assigned = model.transform(e)
    per_label = assigned.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    w = W.partitionBy("cluster").orderBy(F.desc("n"), F.asc("label"))
    return (
        per_label.withColumn("rk", F.row_number().over(w))
        .groupBy("cluster")
        .agg(
            F.sum("n").alias("size"),
            F.max(F.when(F.col("rk") == 1, F.col("label"))).alias("majority_label"),
            F.round(
                F.max(F.when(F.col("rk") == 1, F.col("n"))).cast("double") / F.sum("n"), 4
            ).alias("purity"),
        )
        .select(big("cluster", "cluster"), "size", "majority_label", "purity")
    )


#: Cluster compositions depend on library-internal centroid init, but three
#: invariants do not: the non-empty clusters partition all N rows into
#: between 1 and k groups (Lloyd may leave clusters empty, so exactly-k is
#: NOT guaranteed and is not pinned), and converged Lloyd inertia is
#: bounded by the total sum of squares about the global mean (each cluster
#: mean minimizes its cluster's SS, so per-cluster SS ≤ that cluster's SS
#: about ANY point, in particular the global mean; summing gives inertia ≤
#: total SS).  All three are computed Spark-side from the live model and
#: hash-checked against the oracle's literals.
_KMEANS_ORACLE = """
SELECT TRUE AS clusters_within_k,
       COUNT(*) AS n_points,
       TRUE AS inertia_le_total_ss
FROM embeddings
"""


@query("kmeans_embedding_clusters", oracle=_KMEANS_ORACLE, tags=("ml", "clustering"))
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans(k=10, fixed seed) over embeddings, hash-oracled through its
    partition + inertia invariants (see oracle note); the per-cluster
    profile lives in ``kmeans_cluster_profile`` (tests/test_ml.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import vector_to_array

    e = _vectorized(load_table(spark, sf_dir, "embeddings")).cache()
    model = KMeans(k=10, seed=42, featuresCol="features", predictionCol="cluster").fit(e)
    inertia = model.summary.trainingCost
    arr = e.select(vector_to_array("features").alias("v"))
    total_ss = (
        arr.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"), F.sum(F.col("x") * F.col("x")).alias("ss"), F.count("*").alias("n"))
        .select(F.sum(F.col("ss") - F.col("s") * F.col("s") / F.col("n")).alias("tss"))
    )
    assigned = model.transform(e)
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("n").alias("n_points"),
    ).crossJoin(total_ss).select(
        ((F.col("n_clusters") >= 1) & (F.col("n_clusters") <= 10)).alias("clusters_within_k"),
        "n_points",
        (F.lit(float(inertia)) <= F.col("tss") * (1 + 1e-9)).alias("inertia_le_total_ss"),
    )


#: MLlib IDF is log((N+1)/(df+1)) over raw CountVectorizer term counts, so
#: with an EXACT vocabulary (CountVectorizer, not HashingTF — hashing
#: collisions would make the feature space SQL-irreproducible) every per-doc
#: quantity is plain relational algebra: unnest tokens, count distinct terms
#: per doc, df per term, N docs.  Rounding to 4 decimals absorbs float
#: sum-order drift between the two engines.
_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, t AS term
  FROM documents, UNNEST(regexp_split_to_array(lower(text), '[^a-z]+')) AS u(t)
  WHERE length(t) >= 3
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id,
       COUNT(*) AS n_active_terms,
       round(sqrt(SUM(pow(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 2))), 4) AS l2_norm
FROM tf JOIN df USING (term) CROSS JOIN n
GROUP BY tf.doc_id
"""


@query("mllib_tfidf_features", oracle=_TFIDF_ORACLE, tags=("text", "ml", "tfidf"))
def mllib_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib TF-IDF pipeline (RegexTokenizer → CountVectorizer → IDF) — the
    library twin of the SQL ``tfidf_top_terms``; emits per-doc active-term
    count and TF-IDF L2 norm.

    Hash-oracled: CountVectorizer gives an exact vocabulary (one feature per
    real term — unlike HashingTF, whose murmur3 bucket collisions have no
    SQL twin), so MLlib's weights (tf · ln((N+1)/(df+1))) are reproducible
    in DuckDB from first principles.  Docs with zero qualifying tokens have
    no active terms and are dropped to match the oracle's inner join shape.

    Scale note: the vocabulary is a driver-side fit (CountVectorizer
    collects distinct terms); cap with vocabSize/minDF at corpus scale, or
    fall back to HashingTF when the exact vocabulary no longer fits — the
    pipeline shape is unchanged.
    """
    from pyspark.ml.feature import IDF, CountVectorizer, RegexTokenizer
    from pyspark.ml.functions import vector_to_array

    d = load_table(spark, sf_dir, "documents").select("doc_id", F.lower("text").alias("text"))
    toks = RegexTokenizer(
        inputCol="text", outputCol="words", pattern="[^a-z]+", minTokenLength=3
    ).transform(d)
    cv = CountVectorizer(inputCol="words", outputCol="tf", vocabSize=1 << 20, minDF=1.0).fit(toks)
    tf = cv.transform(toks)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    arr = idf.transform(tf).select("doc_id", "words", vector_to_array("tfidf").alias("w"))
    # n_active_terms counts DISTINCT TERMS (tf >= 1), matching the oracle's
    # per-(doc, term) rows — NOT positive weights: a term present in every
    # document has idf = ln((N+1)/(N+1)) = 0, which the oracle still counts
    # but a weight>0 filter would drop (its 0 weight contributes nothing to
    # the l2 norm in either engine, so the norms agree regardless).
    return arr.select(
        "doc_id",
        big(F.size(F.array_distinct("words")), "n_active_terms"),
        F.round(
            F.sqrt(F.aggregate(F.col("w"), F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("l2_norm"),
    ).where(F.col("n_active_terms") > 0)
