"""Self-tests for the MLlib-backed rows-only operators (SURVEY.md §5.2.2:
ops with no SQL oracle get local numeric oracles — PCA against
numpy.linalg.svd, mirroring the reference's test-against-Scanpy pattern)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from single_cell_experiments_spark.registry import queries
from tests.conftest import SF_DIR

QS = queries()


@pytest.fixture(scope="module")
def emb_matrix():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_numpy()
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(vec_ids)
    return vec_ids[order], X[order]


def test_pca_matches_numpy_svd(spark, emb_matrix):
    vec_ids, X = emb_matrix
    Xc = X - X.mean(axis=0)
    # right singular vectors = principal axes; scores = Xc @ V
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    expected = Xc @ vt.T[:, :16]

    # The registered sc_pca now emits rotation-invariant norms for the SQL
    # oracle; the component-level k=16 check runs on pca_scores directly.
    from single_cell_experiments_spark.operators.ml import pca_scores

    out = pca_scores(spark, SF_DIR, k=16).toPandas()
    got = (
        out.pivot(index="vec_id", columns="component", values="score")
        .sort_index()
        .to_numpy()
    )
    assert got.shape == expected.shape
    # per-component sign ambiguity: align by the sign of the max-|.| entry
    for j in range(expected.shape[1]):
        e = expected[:, j]
        g = got[:, j]
        if np.sign(e[np.argmax(np.abs(e))]) != np.sign(g[np.argmax(np.abs(g))]):
            g = -g
        np.testing.assert_allclose(g, e, atol=5e-4)


def test_pca_svd_norms_match_direct_oracle(spark, emb_matrix):
    vec_ids, X = emb_matrix
    Xc = X - X.mean(axis=0)
    expected = np.sort((Xc * Xc).sum(axis=1).round(4))
    out = QS["sc_pca_svd"](spark, SF_DIR).toPandas()
    np.testing.assert_allclose(np.sort(out["norm2_pc"].to_numpy()), expected, atol=2e-4)


def test_svd_wide_path_avoids_gramian(spark):
    """d = 20001 > 15000 with k ≪ d/2 puts RowMatrix.computeSVD in its
    distributed-ARPACK mode (matrix-free Gramian products; driver work
    vectors O(d·ncv)) — the O(d²) Gramian of the PCA path would be 3.2 GB
    here.  Singular values must still match numpy."""
    from single_cell_experiments_spark.operators.ml import svd_project

    rng = np.random.default_rng(11)
    n, d, k = 256, 20001, 3
    # low-rank structure + noise → well-separated top singular values
    base = rng.standard_normal((n, k)) @ rng.standard_normal((k, d))
    X = base + 0.01 * rng.standard_normal((n, d))
    assert d > 15000 and k <= d / 2  # the documented dist-eigs condition

    pdf = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(pdf, "vec_id: long, embedding: array<double>")
    scores, s = svd_project(df, k)

    Xc = X - X.mean(axis=0)
    expected_s = np.linalg.svd(Xc, compute_uv=False)[:k]
    np.testing.assert_allclose(s, expected_s, rtol=1e-6)
    got = scores.limit(5).toPandas()
    assert all(len(r) == k for r in got["scores"])


def test_gram_project_matches_numpy_and_svd(spark):
    """gram_project (relational Gram + driver eigh, zero per-row Python
    crossings) must agree with numpy ground truth: eigenvalues equal the
    squared singular values of the centered matrix, and per-row score
    norms are rotation-invariantly equal to centered row norms."""
    from single_cell_experiments_spark.operators.ml import gram_project

    rng = np.random.default_rng(17)
    n, d, k = 300, 24, 24
    X = rng.standard_normal((n, d))
    pdf = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(pdf, "vec_id: long, embedding: array<double>")
    scores, evals = gram_project(df, k)

    Xc = X - X.mean(axis=0)
    s = np.linalg.svd(Xc, compute_uv=False)
    np.testing.assert_allclose(np.sort(evals)[::-1], (s**2)[:k], rtol=1e-8)
    got = scores.toPandas().set_index("vec_id")["scores"]
    want = (Xc * Xc).sum(axis=1)
    for i in range(n):
        norm2 = float(np.dot(got[i], got[i]))
        assert abs(norm2 - want[i]) < 1e-8 * (1 + want[i])


def test_gram_project_refuses_wide_matrices(spark):
    """The O(d²) driver collect is a MECHANICAL regime bound (r8 verdict
    #6): widths above max_d raise before any Gram work, naming
    svd_project as the route."""
    from single_cell_experiments_spark.operators.ml import gram_project

    df = spark.createDataFrame(
        [(0, [float(i) for i in range(12)]), (1, [float(i) for i in range(12)])],
        "vec_id: long, embedding: array<double>",
    )
    with pytest.raises(ValueError, match="svd_project"):
        gram_project(df, 2, max_d=8)
    # at or under the bound it proceeds
    scores, evals = gram_project(df, 2, max_d=12)
    assert scores.count() == 2 and len(evals) == 2


def test_minhash_dedup_pairs_valid(spark):
    from single_cell_experiments_spark.operators.ml import minhash_dedup_profile

    out = minhash_dedup_profile(spark, SF_DIR).toPandas()
    assert (out["closest_dist"] <= 0.7 + 1e-9).all()
    assert (out["n_near_dups"] >= 1).all()
    # exact-duplicate docs must surface as distance-0 neighbors
    exact = QS["dedup_exact"](spark, SF_DIR).toPandas()
    n_dup_docs = int((exact[exact["is_duplicated"]]["n_copies"]).sum())
    assert (out["closest_dist"] == 0).sum() >= n_dup_docs
    # the registered invariant form must flag every shingle-set-dup doc at
    # dist 0, non-vacuously: ≥ 2·N_CLONES rows come from the deterministic
    # clone injection (plus natural shingle-set duplicates at any SF)
    from single_cell_experiments_spark.operators.ml import MINHASH_N_CLONES

    reg = QS["mllib_minhash_dedup"](spark, SF_DIR).toPandas()
    assert len(reg) >= 2 * MINHASH_N_CLONES
    assert reg["has_set_dup"].all() and reg["closest_is_zero"].all()


def test_brp_lsh_neighbors_valid(spark, emb_matrix):
    from single_cell_experiments_spark.operators.ml import brp_lsh_neighbor_pairs

    vec_ids, X = emb_matrix
    out = brp_lsh_neighbor_pairs(spark, SF_DIR).toPandas()
    assert (out["euclid_dist"] <= 1.2 + 1e-9).all()
    assert (out["vec1"] < out["vec2"]).all()
    # spot-check reported distances against numpy
    idx = {v: i for i, v in enumerate(vec_ids)}
    for _, r in out.head(20).iterrows():
        d = np.linalg.norm(X[idx[r["vec1"]]] - X[idx[r["vec2"]]])
        assert abs(d - r["euclid_dist"]) < 1e-3
    # the registered soundness summary must be all-true (non-vacuous)
    reg = QS["mllib_brp_lsh_neighbors"](spark, SF_DIR).toPandas()
    assert len(reg) == 1 and reg.iloc[0].all()


def test_kmeans_clusters_cover_all_rows(spark, emb_matrix):
    from single_cell_experiments_spark.operators.ml import kmeans_cluster_profile

    vec_ids, _ = emb_matrix
    out = kmeans_cluster_profile(spark, SF_DIR).toPandas()
    assert out["size"].sum() == len(vec_ids)
    assert out["cluster"].nunique() == len(out)
    assert ((out["purity"] > 0) & (out["purity"] <= 1)).all()


def test_kmeans_invariants_hold(spark, emb_matrix):
    vec_ids, _ = emb_matrix
    out = QS["kmeans_embedding_clusters"](spark, SF_DIR).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert bool(r["clusters_within_k"])
    assert r["n_points"] == len(vec_ids)
    assert bool(r["inertia_le_total_ss"])


def test_regress_out_matches_numpy_ols(spark, emb_matrix):
    """sc_regress_out's closed-form per-gene fit must equal numpy's dense
    OLS residuals (y regressed on the per-cell total) — the oracle proves
    Spark==DuckDB; this proves the algebra is actually regress_out."""
    vec_ids, X = emb_matrix  # cells x genes, rows sorted by vec_id
    x = X.sum(axis=1)  # per-cell covariate
    A = np.stack([np.ones_like(x), x], axis=1)
    coef, *_ = np.linalg.lstsq(A, X, rcond=None)  # 2 x genes
    expected = X - A @ coef

    out = QS["sc_regress_out"](spark, SF_DIR).toPandas()
    rowpos = {int(v): i for i, v in enumerate(vec_ids)}
    got = np.zeros_like(expected)
    got[
        out["vec_id"].map(rowpos).to_numpy(), out["pos"].to_numpy() - 1
    ] = out["resid"].to_numpy()
    assert np.abs(got - expected).max() < 2e-3, np.abs(got - expected).max()


def test_rank_genes_groups_matches_numpy_welch(spark):
    """sc_rank_genes_groups' per-(label, gene) statistic must equal the
    directly-computed Welch t (ddof=1 sample variances) from the dense
    matrix — and the per-label ranking must follow the rounded t."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = t.column("label").to_numpy()

    out = QS["sc_rank_genes_groups"](spark, SF_DIR).toPandas()
    for lab in np.unique(labels):
        grp, rest = X[labels == lab], X[labels != lab]
        m1, m2 = grp.mean(axis=0), rest.mean(axis=0)
        v1 = grp.var(axis=0, ddof=1)
        v2 = rest.var(axis=0, ddof=1)
        t_exp = (m1 - m2) / np.sqrt(v1 / len(grp) + v2 / len(rest))
        sub = out[out["label"] == lab].sort_values("pos")
        assert np.abs(sub["t6"].to_numpy() - t_exp).max() < 1e-4
        # ranking: rnk order == t6 descending (pos tiebreak)
        by_rank = sub.sort_values("rnk")["t6"].to_numpy()
        assert (np.diff(by_rank) <= 1e-12).all()
