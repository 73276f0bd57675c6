"""Spectral layout (tl.umap slot): the fixed-point iteration must match a
direct numpy int64 mirror bit for bit (the third engine, breaking the
Spark↔DuckDB circularity), and the axes must behave like deflated
eigenvector iterates (unit norm, ⟂ φ, ⟂ each other)."""

from __future__ import annotations

import numpy as np

from single_cell_experiments_spark.operators.singlecell import (
    SC_SPECTRAL_T,
    _SL_SCALE,
    sc_neighbor_edges,
    sc_spectral_layout,
)
from tests.conftest import SF_DIR


def _isqrt(n: np.ndarray | int):
    """Exact floor-sqrt mirroring the SQL's double-seed + ±1 correction."""
    n = np.asarray(n, dtype=np.int64)
    s = np.floor(np.sqrt(n.astype(np.float64))).astype(np.int64)
    s = s - (s * s > n)
    s = s + ((s + 1) * (s + 1) <= n)
    return s


def _idiv(x: np.ndarray, y) -> np.ndarray:
    """Truncate-toward-zero division (SQL div on nonneg via sign split)."""
    x = np.asarray(x, dtype=np.int64)
    return np.where(x >= 0, x // y, -((-x) // y)).astype(np.int64)


def _reference_layout(edges: list[tuple[int, int]]):
    nodes = sorted({u for u, _ in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, dtype=np.int64)
    for u, _v in edges:
        deg[idx[u]] += 1
    m2 = int(deg.sum())
    # adjacency as index arrays
    eu = np.array([idx[u] for u, v in edges])
    ev = np.array([idx[v] for u, v in edges])
    w = _isqrt(_SL_SCALE * _SL_SCALE // (deg[eu] * deg[ev]))
    phi = _isqrt(deg * _SL_SCALE * _SL_SCALE // m2)

    def dn(x: np.ndarray, defls: list[np.ndarray]) -> np.ndarray:
        v = x.copy()
        for d in defls:
            pr = _idiv(np.int64((d * x).sum()), _SL_SCALE)
            v = v - _idiv(pr * d, _SL_SCALE)
        nr = int(_isqrt(int((v * v).sum())))
        return _idiv(v * _SL_SCALE, nr)

    def axis(a: int, c: int, defls: list[np.ndarray]) -> np.ndarray:
        u_ids = np.array(nodes, dtype=np.int64)
        r = (((u_ids % 2048) * a + c) % 2048) * _SL_SCALE // 2048
        cur = dn(r.astype(np.int64), defls)
        for _ in range(SC_SPECTRAL_T):
            z = np.zeros(n, dtype=np.int64)
            np.add.at(z, eu, w * cur[ev])
            cur = dn(_idiv(z, _SL_SCALE), defls)
        return cur

    sx = axis(1103515245, 12345, [phi])
    sy = axis(69069, 1, [phi, sx])
    return nodes, phi, sx, sy


def test_layout_matches_numpy_mirror_exactly(spark):
    knn = sc_neighbor_edges(spark, SF_DIR).select("vec_id", "nbr")
    pairs = {(int(r.vec_id), int(r.nbr)) for r in knn.collect()}
    edges = sorted(p for p in pairs if (p[1], p[0]) in pairs)
    nodes, phi, sx, sy = _reference_layout(edges)

    got = {
        int(r.vec_id): (int(r.sx_micro), int(r.sy_micro))
        for r in sc_spectral_layout(spark, SF_DIR).collect()
    }
    assert set(got) == set(nodes)
    for i, u in enumerate(nodes):
        assert got[u] == (int(sx[i]), int(sy[i])), u


def test_layout_axes_are_unit_orthogonal_and_deflated(spark):
    rows = sc_spectral_layout(spark, SF_DIR).collect()
    knn = sc_neighbor_edges(spark, SF_DIR).select("vec_id", "nbr")
    pairs = {(int(r.vec_id), int(r.nbr)) for r in knn.collect()}
    edges = sorted(p for p in pairs if (p[1], p[0]) in pairs)
    nodes, phi, _sx, _sy = _reference_layout(edges)
    order = {u: i for i, u in enumerate(nodes)}

    x = np.zeros(len(nodes))
    y = np.zeros(len(nodes))
    for r in rows:
        x[order[int(r.vec_id)]] = r.sx_micro / _SL_SCALE
        y[order[int(r.vec_id)]] = r.sy_micro / _SL_SCALE
    p = phi.astype(np.float64) / _SL_SCALE

    assert abs(np.linalg.norm(x) - 1) < 1e-3
    assert abs(np.linalg.norm(y) - 1) < 1e-3
    # deflation: ⟂ the analytic top eigenvector and ⟂ each other
    assert abs(np.dot(x, p)) < 1e-3
    assert abs(np.dot(y, p)) < 1e-3
    assert abs(np.dot(x, y)) < 1e-3
    # a layout, not a constant: both axes spread
    assert np.std(x) > 0 and np.std(y) > 0


def test_overlapping_layout_invocations_do_not_cross_read(spark):
    """r13 advice (medium): a second spectral_layout_edges call before the
    first result is collected must not clobber the first's temp views —
    the per-invocation namespace keeps both lazily-evaluable."""
    from single_cell_experiments_spark.operators.singlecell import (
        spectral_layout_edges,
    )

    knn = sc_neighbor_edges(spark, SF_DIR).select("vec_id", "nbr")
    pairs = {(int(r.vec_id), int(r.nbr)) for r in knn.collect()}
    mutual = sorted(p for p in pairs if (p[1], p[0]) in pairs)
    df_full = spark.createDataFrame(mutual, "u BIGINT, v BIGINT")
    # second graph: a strict sub-graph (drop the highest-id node's edges)
    top = max(u for u, _ in mutual)
    sub = [p for p in mutual if top not in p]
    df_sub = spark.createDataFrame(sub, "u BIGINT, v BIGINT")

    first = spectral_layout_edges(spark, df_full)   # NOT collected yet
    second = spectral_layout_edges(spark, df_sub)   # would clobber pre-fix
    got_first = {int(r.u): (int(r.sx_micro), int(r.sy_micro)) for r in first.collect()}
    got_second = {int(r.u): (int(r.sx_micro), int(r.sy_micro)) for r in second.collect()}

    nodes, _phi, sx, sy = _reference_layout(mutual)
    assert set(got_first) == set(nodes)
    for i, u in enumerate(nodes):
        assert got_first[u] == (int(sx[i]), int(sy[i])), u
    assert top in got_first and top not in got_second


def test_layout_drops_its_temp_views(spark):
    """r14 advice (low): spectral_layout_edges must not leak its ~80
    nonce-namespaced temp views into the session catalog — they are
    dropped before the result returns (the returned DataFrame's plan is
    already resolved), so repeated layout calls in a long-lived session
    leave the catalog unchanged."""
    from single_cell_experiments_spark.operators.singlecell import (
        spectral_layout_edges,
    )

    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    out = spectral_layout_edges(spark, df)
    leaked = [t.name for t in spark.catalog.listTables() if t.name.startswith("__sl")]
    assert leaked == [], leaked
    # and the result still evaluates after the drop (plan was resolved)
    assert out.count() == 3


def test_notebook_exact_knn_gate_raises_past_max_cells(spark, monkeypatch):
    """r14 verdict nit: the exact-kNN capstone is O(n²) and must refuse —
    naming the ANN twin — past SC_NOTEBOOK_EXACT_MAX_CELLS rather than
    silently going quadratic on user data."""
    import pytest

    from single_cell_experiments_spark.operators import singlecell as sc

    monkeypatch.setattr(sc, "SC_NOTEBOOK_EXACT_MAX_CELLS", 1)
    with pytest.raises(ValueError, match="sc_notebook_e2e_ann"):
        sc.sc_notebook_e2e(spark, SF_DIR)
