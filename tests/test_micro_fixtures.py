"""Reference-style micro-fixture tests (FIXTURES.md §2; SURVEY.md §5.1):
tiny hand-computable matrices written as an ``embeddings.parquet`` in a
scratch sf-dir, run through the SAME registered query functions the driver
uses, asserted against numpy computations of the documented semantics —
the reference's test-against-local-Scanpy pattern with numpy as Scanpy.
"""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from single_cell_experiments_spark.registry import queries

QS = queries()

MAT3X4 = np.array([[0, 1, 2, 3], [4, 0, 0, 5], [6, 7, 0, 0]], dtype=np.float32)
MAT_ZERO_ROW = np.vstack([MAT3X4, np.zeros((1, 4), dtype=np.float32)])
MAT_CONST_COL = np.array([[1, 5], [2, 5], [3, 5]], dtype=np.float32)


def _write_fixture(matrix: np.ndarray, tag: str) -> str:
    sf_dir = os.path.join(tempfile.gettempdir(), f"sce_micro_{tag}")
    os.makedirs(sf_dir, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(range(len(matrix)), type=pa.int64()),
            "embedding": pa.array([row.tolist() for row in matrix], type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(matrix), type=pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def _coo_map(rows):
    return {(r["vec_id"], r["pos"]): r for r in rows}


def test_log1p_micro(spark):
    sf = _write_fixture(MAT3X4, "mat3x4")
    got = _coo_map(QS["sc_log1p"](spark, sf).collect())
    for i in range(3):
        for j in range(4):
            assert got[(i, j + 1)]["lv"] == pytest.approx(
                round(math.log1p(float(MAT3X4[i, j])), 6), abs=2e-6
            )


def test_normalize_per_cell_micro(spark):
    sf = _write_fixture(MAT3X4, "mat3x4")
    got = _coo_map(QS["sc_normalize_per_cell"](spark, sf).collect())
    sums = np.abs(MAT3X4).sum(axis=1)  # 6, 9, 13
    assert list(sums) == [6, 9, 13]
    for i in range(3):
        for j in range(4):
            expect = round(abs(float(MAT3X4[i, j])) * 1e4 / float(sums[i]), 6)
            assert got[(i, j + 1)]["nv"] == pytest.approx(expect, abs=2e-6)


def test_normalize_zero_row_micro(spark):
    sf = _write_fixture(MAT_ZERO_ROW, "zero_row")
    rows = QS["sc_normalize_per_cell"](spark, sf).collect()
    zero_row = [r for r in rows if r["vec_id"] == 3]
    assert len(zero_row) == 4
    # 0/0 division: documented semantics — no finite value may come out
    for r in zero_row:
        assert r["nv"] is None or math.isnan(r["nv"])


def test_scale_micro(spark):
    sf = _write_fixture(MAT3X4, "mat3x4")
    got = _coo_map(QS["sc_scale"](spark, sf).collect())
    m = MAT3X4.astype(np.float64)
    mu = m.mean(axis=0)
    sigma = m.std(axis=0)  # population std, matching the kernel
    for i in range(3):
        for j in range(4):
            expect = round(np.clip((m[i, j] - mu[j]) / sigma[j], -10, 10), 6)
            assert got[(i, j + 1)]["z"] == pytest.approx(expect, abs=2e-6)


def test_scale_const_col_micro(spark):
    sf = _write_fixture(MAT_CONST_COL, "const_col")
    rows = QS["sc_scale"](spark, sf).collect()
    const_col = [r for r in rows if r["pos"] == 2]
    assert len(const_col) == 3
    # std=0: documented semantics — NULL/NaN, never a fabricated zero
    for r in const_col:
        assert r["z"] is None or math.isnan(r["z"])
    var_col = {r["vec_id"]: r["z"] for r in rows if r["pos"] == 1}
    expect = {0: round(-1 / math.sqrt(2 / 3), 6), 1: 0.0, 2: round(1 / math.sqrt(2 / 3), 6)}
    for k, v in expect.items():
        assert var_col[k] == pytest.approx(v, abs=2e-6)


def test_chunkstore_roundtrip_micro(spark):
    from single_cell_experiments_spark.sources.chunkstore import (
        read_chunk_store,
        write_chunk_store,
    )
    from single_cell_experiments_spark.catalog import load_table

    sf = _write_fixture(MAT3X4, "chunk_micro")
    store = os.path.join(tempfile.gettempdir(), "sce_micro_store")
    n_chunks = write_chunk_store(load_table(spark, sf, "embeddings"), store, rows_per_chunk=2)
    assert n_chunks == 2  # 3 rows, 2 per chunk -> chunk-aligned split
    back = {r["vec_id"]: r["embedding"] for r in read_chunk_store(spark, store).collect()}
    for i in range(3):
        assert back[i] == pytest.approx(list(map(float, MAT3X4[i])), abs=1e-7)
