"""10x CSC ingestion tests: slice planner properties, slice-local decode
correctness against a numpy reference, the npz-backed end-to-end path, and
the clean h5py gate."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from single_cell_experiments_spark.sources.tenx import (
    H5CscStore,
    NpzCscStore,
    ingest_csc,
    plan_csc_slices,
)


@given(
    nnz_per_col=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=60),
    target=st.integers(min_value=1, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_slice_planner_covers_all_columns_within_target(nnz_per_col, target):
    indptr = np.concatenate([[0], np.cumsum(nnz_per_col)]).astype(np.int64)
    slices = plan_csc_slices(indptr, target)
    if not nnz_per_col:
        assert slices == []
        return
    # exact disjoint cover in order
    assert slices[0][0] == 0 and slices[-1][1] == len(nnz_per_col)
    for (a0, a1), (b0, b1) in zip(slices, slices[1:]):
        assert a1 == b0 and a0 < a1
    # a slice only exceeds target when a single column does
    for j0, j1 in slices:
        nnz = indptr[j1] - indptr[j0]
        assert nnz <= target or j1 - j0 == 1


def _random_csc(rng, n_rows=7, n_cols=23):
    dense = rng.random((n_rows, n_cols)) * (rng.random((n_rows, n_cols)) < 0.4)
    indptr = [0]
    indices, data = [], []
    for j in range(n_cols):
        (nz,) = np.nonzero(dense[:, j])
        indices.append(nz.astype(np.int64))
        data.append(dense[nz, j])
        indptr.append(indptr[-1] + len(nz))
    return dense, np.array(indptr, np.int64), np.concatenate(indices), np.concatenate(data)


def test_npz_ingest_matches_dense_reference(spark, tmp_path):
    rng = np.random.default_rng(7)
    dense, indptr, indices, data = _random_csc(rng)
    path = str(tmp_path / "m.npz")
    np.savez(path, indptr=indptr, indices=indices, data=data,
             shape=np.array(dense.shape, np.int64))
    out = (
        ingest_csc(spark, NpzCscStore(path), target_nnz_per_slice=5)
        .toPandas()
        .sort_values(["col", "row"])
        .reset_index(drop=True)
    )
    rows, cols = np.nonzero(dense.T)  # transposed → (col, row) sorted order
    assert out["col"].tolist() == rows.tolist()
    assert out["row"].tolist() == cols.tolist()
    np.testing.assert_allclose(out["value"].to_numpy(), dense.T[rows, cols])


def test_empty_store_yields_empty_frame(spark, tmp_path):
    path = str(tmp_path / "e.npz")
    np.savez(path, indptr=np.array([0], np.int64), indices=np.array([], np.int64),
             data=np.array([], np.float64), shape=np.array([0, 0], np.int64))
    assert ingest_csc(spark, NpzCscStore(path)).count() == 0


def test_h5_gate_names_h5py(spark, tmp_path):
    try:
        import h5py  # noqa: F401

        pytest.skip("h5py present; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="h5py"):
        ingest_csc(spark, H5CscStore(str(tmp_path / "missing.h5")))


def test_h5_store_ingest_matches_dense_reference(spark, tmp_path):
    """The real-container twin of the npz test (r6 verdict #8): builds a
    tiny genuine CellRanger-v3-layout ``matrix.h5`` and runs
    ``read_10x_h5`` end-to-end.  Skipped while h5py is absent — the moment
    the dependency appears in an environment, the H5CscStore layer gets
    exercised with zero code changes (same gating pattern as the
    protobuf/state-v2 tests)."""
    h5py = pytest.importorskip("h5py")
    from single_cell_experiments_spark.sources.tenx import read_10x_h5

    rng = np.random.default_rng(13)
    dense, indptr, indices, data = _random_csc(rng)
    path = str(tmp_path / "matrix.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("matrix")
        g.create_dataset("data", data=data)
        g.create_dataset("indices", data=indices.astype(np.int64))
        g.create_dataset("indptr", data=indptr.astype(np.int64))
        g.create_dataset("shape", data=np.array(dense.shape, np.int64))
    out = (
        read_10x_h5(spark, path, target_nnz_per_slice=5)
        .toPandas()
        .sort_values(["col", "row"])
        .reset_index(drop=True)
    )
    rows, cols = np.nonzero(dense.T)
    assert out["col"].tolist() == rows.tolist()
    assert out["row"].tolist() == cols.tolist()
    np.testing.assert_allclose(out["value"].to_numpy(), dense.T[rows, cols])
