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


def _write_docs_fixture(rows, tag: str) -> str:
    """rows: list of (doc_id, text, lang).  Writes a documents.parquet."""
    sf_dir = os.path.join(tempfile.gettempdir(), f"sce_micro_{tag}")
    os.makedirs(sf_dir, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
            "source": pa.array(["src0"] * len(rows), type=pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_pagerank_micro(spark):
    # Hand-built symmetric path graph 0-1-2: exact integer replica in numpy.
    from single_cell_experiments_spark.operators.dedup import (
        PR_SCALE,
        pagerank_edges,
    )

    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 1, 2], "dst": [1, 0, 2, 1]})
    )
    got = {r["id"]: r["r"] for r in pagerank_edges(edges, iters=5).collect()}

    n = 3
    deg = {0: 1, 1: 2, 2: 1}
    nbrs_in = {0: [1], 1: [0, 2], 2: [1]}
    r = {v: PR_SCALE // n for v in range(n)}
    for _ in range(5):
        r = {
            v: (15 * (PR_SCALE // n)) // 100
            + (85 * sum(r[u] // deg[u] for u in nbrs_in[v])) // 100
            for v in range(n)
        }
    assert got == r
    # middle node of a path must out-rank the endpoints
    assert got[1] > got[0] == got[2]


def test_shard_pack_micro(spark):
    # Known token counts 3,1,2,4 with budget 2000 -> offsets 0,3,4,6.
    rows = [
        (0, "a bb ccc", "en"),
        (1, "hello", "en"),
        (2, "x y", "en"),
        (3, "p q r s", "en"),
    ]
    sf = _write_docs_fixture(rows, "shard")
    got = {r["doc_id"]: r for r in QS["shard_pack_by_tokens"](spark, sf).collect()}
    assert [got[i]["n_tokens"] for i in range(4)] == [3, 1, 2, 4]
    assert [got[i]["offset_tokens"] for i in range(4)] == [0, 3, 4, 6]
    assert all(got[i]["shard"] == 0 for i in range(4))


def test_curation_flags_micro(spark):
    long_pad = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, long_pad, "en"),          # keeper of the dup pair
        (1, long_pad, "en"),          # exact dup -> drop
        (2, "short", "en"),           # too short -> drop
        (3, "1234567890 " * 10, "en"),  # digits only -> low alpha -> drop
        (4, "好" * 60, "zh"),          # zh exempt from alpha rule -> keep
    ]
    sf = _write_docs_fixture(rows, "curation")
    got = {r["doc_id"]: r for r in QS["doc_curation_flags"](spark, sf).collect()}
    assert got[0]["keep"] and not got[0]["is_dup"]
    assert got[1]["is_dup"] and not got[1]["keep"]
    assert got[2]["too_short"] and not got[2]["keep"]
    assert got[3]["low_alpha"] and not got[3]["keep"]
    assert got[4]["keep"], "zh doc must not be dropped by the alpha-ratio rule"


def test_quantize_int8_micro(spark):
    sf = _write_fixture(MAT3X4, "mat3x4")
    got = _coo_map(QS["embed_quantize_int8"](spark, sf).collect())
    m = MAT3X4.astype(np.float64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    for i in range(3):
        for j in range(4):
            expected = 0 if mx[j] == mn[j] else int(
                np.floor((m[i, j] - mn[j]) * 255.0 / (mx[j] - mn[j]) + 0.5)
            )
            assert got[(i, j + 1)]["q"] == expected
    # codes must span the full range on each dimension
    for j in range(4):
        qs = [got[(i, j + 1)]["q"] for i in range(3)]
        assert min(qs) == 0 and max(qs) == 255


def test_decontaminate_micro(spark):
    # doc 0 is the "benchmark" slice (doc_id % 20 == 0); its 8 tokens form
    # exactly one 8-gram.  Full copy -> rate 1; disjoint -> 0; 16-token doc
    # sharing only the benchmark prefix -> 1 hit of 9 grams; <8 tokens -> exempt.
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text, "en"),
        (1, bench_text, "en"),
        (2, "one two three four five six seven eight nine", "en"),
        (3, "too short text", "en"),
        (4, bench_text + " i1 i2 i3 i4 i5 i6 i7 i8", "en"),
    ]
    sf = _write_docs_fixture(rows, "decontam")
    got = {r["doc_id"]: r for r in QS["decontaminate_ngram_overlap"](spark, sf).collect()}
    assert set(got) == {1, 2, 4}, "benchmark docs and <8-token docs are excluded"
    assert (got[1]["n_ngrams"], got[1]["n_hits"], got[1]["is_contaminated"]) == (1, 1, True)
    assert got[1]["contamination_rate"] == 1.0
    assert (got[2]["n_hits"], got[2]["is_contaminated"]) == (0, False)
    assert (got[4]["n_ngrams"], got[4]["n_hits"], got[4]["is_contaminated"]) == (9, 1, False)


def test_normalized_dedup_micro(spark):
    rows = [
        (0, "Hello, World!", "en"),
        (1, "hello world", "en"),
        (2, "HELLO  world.", "en"),
        (3, "a different document", "en"),
    ]
    sf = _write_docs_fixture(rows, "normdedup")
    got = {r["keeper_doc_id"]: r for r in QS["dedup_normalized_exact"](spark, sf).collect()}
    assert set(got) == {0, 3}
    assert (got[0]["n_copies"], got[0]["n_variants"], got[0]["is_duplicated"]) == (3, 3, True)
    assert (got[3]["n_copies"], got[3]["n_variants"], got[3]["is_duplicated"]) == (1, 1, False)


def test_cluster_keeper_micro(spark):
    # docs 0/1 are near-dups (1 is strictly longer -> the keeper despite the
    # higher doc_id); doc 2 is a singleton component and keeps itself.
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (0, base, "en"),
        (1, base + "tail", "en"),
        (2, "completely unrelated content about astronomy and telescopes", "en"),
    ]
    sf = _write_docs_fixture(rows, "keeper")
    got = {r["doc_id"]: r for r in QS["dedup_cluster_keeper"](spark, sf).collect()}
    assert len(got) == 3
    assert got[0]["component_id"] == 0 and got[1]["component_id"] == 0
    assert got[1]["keep"] and not got[0]["keep"], "longest doc wins the cluster"
    assert got[2]["component_id"] == 2 and got[2]["keep"]


def test_observed_qc_counters_match_result(spark):
    """Observation metrics (job-side accumulators, zero extra jobs) must
    equal aggregates recomputed from the returned rows."""
    from tests.conftest import SF_DIR

    from single_cell_experiments_spark.operators.pipeline import (
        curation_with_observed_qc,
    )

    df, obs = curation_with_observed_qc(spark, SF_DIR)
    rows = df.collect()  # the action the observation rides
    m = obs.get
    assert m["n_docs"] == len(rows)
    assert m["n_keep"] == sum(1 for r in rows if r["keep"])
    assert m["n_dup"] == sum(1 for r in rows if r["is_dup"])
    assert m["n_short"] == sum(1 for r in rows if r["too_short"])
    assert m["n_low_alpha"] == sum(1 for r in rows if r["low_alpha"])


def test_fuzzy_two_pass_blocking_micro(spark):
    """The r9 two-pass blocker: a HEAD substitution breaks the first-10
    block but keeps the last-10-of-prefix block (recalled by pass 2); a
    mid-prefix substitution keeps both (recalled once, dedup checked); a
    2-edit pair split across both blocks is the documented residue."""
    base = "0123456789abcdefghijklmnopqrstuvwxyzABCD"  # 40 chars
    assert len(base) == 40
    head_sub = "Z" + base[1:]                      # edit at char 1 (head)
    mid_sub = base[:25] + "Q" + base[26:]          # edit at char 26 (neither block)
    split = "Y" + base[1:34] + "X" + base[35:]     # edits in head AND tail
    rows = [
        (0, base + " padding beyond the prefix", "en"),
        (1, head_sub + " padding beyond the prefix", "en"),
        (2, mid_sub + " padding beyond the prefix", "en"),
        (3, split + " padding beyond the prefix", "en"),
        (4, "completely different text with no shared block at all", "en"),
    ]
    sf = _write_docs_fixture(rows, "fuzzy2pass")
    got = {
        (r["doc1"], r["doc2"]): r["lev"]
        for r in QS["dedup_fuzzy_prefix_pairs"](spark, sf).collect()
    }
    assert got == {(0, 1): 1, (0, 2): 1, (1, 2): 2}


def test_ewma_micro_hand_computed(spark):
    """Dyadic-exact EWMA on a 3-row stream: weights 2^-j over trailing
    rows with ragged-head renormalization — 1.0, 320/192, 672/224."""
    from single_cell_experiments_spark.operators.advanced import _ewma_sql

    spark.createDataFrame(
        [(1, 1, 10, 1.0), (1, 2, 20, 2.0), (1, 3, 30, 4.0)],
        "user_id int, event_id int, ts_s long, value double",
    ).createOrReplaceTempView("ewma_micro")
    got = {
        r["event_id"]: r["ewma"]
        for r in spark.sql(
            _ewma_sql("ts_s", "ewma_micro", "FLOOR(value * 1000000.0D + 0.5D)")
        ).collect()
    }
    assert got == {1: 1.0, 2: round(320 / 192, 6), 3: 3.0}
