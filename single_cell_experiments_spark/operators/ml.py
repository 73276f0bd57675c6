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


@query("mllib_minhash_dedup", tags=("dedup", "ml", "lsh"))
def mllib_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH near-dup join over documents (the library twin of
    ``dedup_minhash_lsh``): word tokens → binary HashingTF vectors →
    ``approxSimilarityJoin`` at Jaccard distance ≤ 0.7, aggregated to
    per-document neighbor stats (count + closest distance).

    The aggregation is the scale contract: the raw pair list is
    near-quadratic on a small-vocabulary corpus (word-level Jaccard ≥ 0.3
    qualifies most pairs), which is fine as a distributed intermediate but
    must never be collected — at sf0.1 the pair list alone OOMs a 1 GB
    driver.  Per-doc stats bound the result at O(docs) regardless of how
    permissive the threshold is.

    Rows-only check (MLlib's hash coefficients are internal); recall vs the
    exact-Jaccard pair set is asserted in tests/test_ml.py.
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


@query("mllib_brp_lsh_neighbors", tags=("similarity", "ml", "lsh"))
def mllib_brp_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane-bucketed euclidean neighbor pairs over embeddings
    (BucketedRandomProjectionLSH ``approxSimilarityJoin``, distance ≤ 1.2)
    — the MLlib twin of ``ann_cosine_pairs_signlsh``.  Rows-only check.
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


@query("kmeans_embedding_clusters", tags=("ml", "clustering"))
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans(k=10, fixed seed) over embeddings; emits per-cluster size and
    the majority ``label`` with its purity — the clustering quality readout
    for the AnnData-style annotation comparison.  Rows-only check
    (centroid init is library-internal); inertia sanity in tests/test_ml.py.
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


@query("mllib_tfidf_features", tags=("text", "ml", "tfidf"))
def mllib_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib TF-IDF pipeline (RegexTokenizer → HashingTF → IDF) — the
    library twin of the SQL ``tfidf_top_terms``; emits per-doc feature-norm
    summaries.  Rows-only check (feature hashing has no SQL oracle); the
    exact-TF-IDF semantics are hash-verified on the SQL twin.
    """
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer
    from pyspark.ml.functions import vector_to_array

    d = load_table(spark, sf_dir, "documents").select("doc_id", F.lower("text").alias("text"))
    toks = RegexTokenizer(
        inputCol="text", outputCol="words", pattern="[^a-z]+", minTokenLength=3
    ).transform(d)
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=1 << 14).transform(toks)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    arr = idf.transform(tf).select("doc_id", vector_to_array("tfidf").alias("w"))
    return arr.select(
        "doc_id",
        big(F.size(F.filter("w", lambda x: x > 0)), "n_active_terms"),
        F.round(
            F.sqrt(F.aggregate(F.col("w"), F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("l2_norm"),
    )
