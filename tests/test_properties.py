"""Property-based tests (hypothesis) for the algebraic invariants the
engine's scale patterns rely on.

The reference tests each operator against a trusted local implementation on
fixed fixtures (SURVEY.md §5.1); it has no property tests (§5.1).  These go
one step further: the *rewrites* the engine applies for scale — salted
two-phase aggregation and join, the union-and-carry as-of join, the
two-level blocked prefix scan — are checked
equivalent to their naive definitions on randomized inputs, because those
are exactly the transformations a reviewer can't eyeball-verify from one
example.

Kept small (few examples, tiny rows) — each example costs Spark jobs.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (key, cents) rows: keys skewed onto few values — the salting target.
_ROWS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-10_000, 10_000)),
    min_size=1,
    max_size=60,
)


@given(rows=_ROWS)
@_SETTINGS
def test_salted_agg_equals_plain_agg(spark, rows):
    """Two-phase (key, salt) → key aggregation is exactly the plain
    aggregation for associative exact sums — any input, any salt spread."""
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "cents"])).repartition(4)
    plain = {
        (r["k"]): (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salt = F.pmod(F.hash("cents"), F.lit(5))
    salted = {
        (r["k"]): (r["s"], r["n"])
        for r in df.groupBy("k", salt.alias("salt"))
        .agg(F.sum("cents").alias("ps"), F.count(F.lit(1)).alias("pn"))
        .groupBy("k")
        .agg(F.sum("ps").alias("s"), F.sum("pn").alias("n"))
        .collect()
    }
    assert salted == plain


# (fact_key,) fact rows + (dim_key, seg) dim rows for the salted-join check.
_FACTS = st.lists(st.tuples(st.integers(0, 3), st.integers(-100, 100)), min_size=1, max_size=40)
_DIMS = st.lists(st.integers(0, 5), min_size=1, max_size=6, unique=True)


@given(facts=_FACTS, dim_keys=_DIMS)
@_SETTINGS
def test_salted_join_equals_plain_join(spark, facts, dim_keys):
    """Salting the fact side and replicating the dim side S× is exactly the
    plain inner equi-join — any input, any salt assignment, including fact
    keys with no dim match and dims with no facts."""
    n_salts = 4
    fact = spark.createDataFrame(
        pd.DataFrame(facts, columns=["k", "v"]).reset_index().rename(columns={"index": "rid"})
    )
    dim = spark.createDataFrame(pd.DataFrame({"dk": dim_keys, "seg": [f"s{k % 2}" for k in dim_keys]}))

    plain = sorted(
        (r["rid"], r["seg"]) for r in fact.join(dim, fact["k"] == dim["dk"]).collect()
    )
    sf = fact.withColumn("salt", F.pmod(F.hash("rid"), F.lit(n_salts)))
    sd = dim.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    salted = sorted(
        (r["rid"], r["seg"])
        for r in sf.join(
            sd.hint("shuffle_hash"), (sf["k"] == sd["dk"]) & (sf["salt"] == sd["salt"])
        ).collect()
    )
    assert salted == plain


# As-of inputs: (user, time) left probes and (user, time) right events.
_TIMES = st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=25)


@given(left=_TIMES, right=_TIMES)
@_SETTINGS
def test_asof_union_carry_equals_bruteforce(spark, left, right):
    """The union-and-carry as-of join (one shuffle) returns, per probe row,
    the max right-side time <= probe time for the same key — identical to
    the quadratic brute-force definition, including ties and no-match."""
    lpdf = pd.DataFrame(left, columns=["k", "t"]).drop_duplicates()
    rpdf = pd.DataFrame(right, columns=["k", "rt"]).drop_duplicates()

    def brute(row):
        c = rpdf[(rpdf["k"] == row["k"]) & (rpdf["rt"] <= row["t"])]
        return None if c.empty else int(c["rt"].max())

    expected = {
        (int(r["k"]), int(r["t"])): brute(r) for _, r in lpdf.iterrows()
    }

    ldf = spark.createDataFrame(lpdf.astype("int64")) if len(lpdf) else None
    if ldf is None:
        return
    probes = ldf.select("k", F.col("t").alias("ts"), F.lit(0).alias("is_r"))
    if len(rpdf):
        events = spark.createDataFrame(rpdf.astype("int64")).select(
            "k", F.col("rt").alias("ts"), F.lit(1).alias("is_r")
        )
        unioned = probes.unionByName(events)
    else:
        unioned = probes
    w = (
        W.partitionBy("k")
        .orderBy(F.asc("ts"), F.desc("is_r"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn(
        "asof_t", F.last(F.when(F.col("is_r") == 1, F.col("ts")), ignorenulls=True).over(w)
    )
    got = {
        (int(r["k"]), int(r["ts"])): (None if r["asof_t"] is None else int(r["asof_t"]))
        for r in carried.where(F.col("is_r") == 0).collect()
    }
    assert got == expected


# Two-level prefix scan inputs: (id, value) rows with small ids so several
# rows share a block (block size 4 in the test).
_SCAN_ROWS = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 1000)), min_size=1, max_size=40
)


@given(rows=_SCAN_ROWS)
@_SETTINGS
def test_blocked_prefix_scan_equals_global_window(spark, rows):
    """The two-level parallel prefix scan (per-block running agg + block
    prefix broadcast — used by watermark_late_drop and
    shard_pack_by_tokens) equals the naive global running aggregate for any
    input and block size, for both SUM and MAX."""
    pdf = pd.DataFrame(rows, columns=["id", "v"]).drop_duplicates("id")
    df = spark.createDataFrame(pdf).repartition(4)
    blk_size = 4

    naive_w = W.orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = {
        r["id"]: (r["s"], r["m"])
        for r in df.select(
            "id", F.sum("v").over(naive_w).alias("s"), F.max("v").over(naive_w).alias("m")
        ).collect()
    }

    blk = (F.col("id") / blk_size).cast("bigint")
    d = df.withColumn("blk", blk)
    btot = d.groupBy("blk").agg(F.sum("v").alias("bs"), F.max("v").alias("bm"))
    prev_w = W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)
    bpre = btot.select(
        "blk",
        F.coalesce(F.sum("bs").over(prev_w), F.lit(0)).alias("ps"),
        F.max("bm").over(prev_w).alias("pm"),
    )
    in_blk = W.partitionBy("blk").orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
    scanned = {
        r["id"]: (r["s"], r["m"])
        for r in d.join(F.broadcast(bpre), "blk")
        .select(
            "id",
            (F.col("ps") + F.sum("v").over(in_blk)).alias("s"),
            F.greatest(
                F.max("v").over(in_blk), F.coalesce(F.col("pm"), F.lit(-1))
            ).alias("m"),
        )
        .collect()
    }
    assert scanned == naive


# 2-decimal money values as integer cents (the domain rev_sum assumes:
# non-negative prices, discounts in [0, 1) at 2 decimals).
_PRICES = st.lists(
    st.tuples(st.integers(0, 11_000_000), st.integers(0, 99)),
    min_size=1,
    max_size=60,
)


@given(rows=_PRICES)
@_SETTINGS
def test_rev_sum_is_exact_integer_arithmetic(spark, rows):
    """compat.rev_sum's floor(x*100+0.5) integer-cents path must equal the
    exact Decimal Σ price·(1−disc) on arbitrary 2-decimal inputs — the
    invariant that makes q1/q3 revenue order-insensitive and hash-stable
    against DuckDB regardless of partitioning."""
    from decimal import Decimal

    from single_cell_experiments_spark.functions.compat import rev_sum

    pdf = pd.DataFrame(
        {
            "price": [pc / 100.0 for pc, _ in rows],
            "disc": [dc / 100.0 for _, dc in rows],
        }
    )
    expected = sum(
        (Decimal(pc) * (Decimal(100) - Decimal(dc))) for pc, dc in rows
    ) / Decimal(10_000)
    got = (
        spark.createDataFrame(pdf)
        .agg(rev_sum("price", "disc", "rev"))
        .collect()[0]["rev"]
    )
    assert abs(Decimal(str(got)) - expected) <= Decimal("0.0001"), (got, expected)


_EDGES = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=80,
)


@given(edges=_EDGES)
@_SETTINGS
def test_unrolled_cc_oracle_equals_union_find(edges):
    """The DuckDB side of the CC oracle — ``_cc_labels_sql``'s unrolled
    min-label propagation — must assign every node the min id of its
    connected component on arbitrary graphs (25 nodes keeps the worst-case
    path diameter under the shared CC_MAX_ROUNDS cap, mirroring the regime
    where the Spark loop returns instead of raising)."""
    import duckdb

    from single_cell_experiments_spark.operators.dedup import _cc_labels_sql

    # Union-find reference.
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    expected = sorted((n, find(n)) for n in parent)

    values = " UNION ALL ".join(f"SELECT {u} AS u, {v} AS v" for u, v in edges)
    sql = f"""
WITH raw AS ({values}),
edges AS MATERIALIZED (
  SELECT u, v FROM raw UNION SELECT v, u FROM raw
),
{_cc_labels_sql()}
SELECT id, lbl FROM lchecked ORDER BY id
"""
    got = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == expected, (got, expected)


@given(edges=_EDGES)
@_SETTINGS
def test_cc_star_labels_equals_union_find(spark, edges):
    """large-star/small-star CC (the O(log n)-round 100 TB path) must
    produce exactly the union-find component min-labels on arbitrary
    graphs — including chains, whose diameter is what the star algorithm
    exists to beat."""
    from single_cell_experiments_spark.operators.dedup import cc_star_labels

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    expected = sorted((n, find(n)) for n in parent)

    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc1", "doc2"])
    )
    got = sorted(
        (r["doc_id"], r["component_id"])
        for r in cc_star_labels(df).collect()
    )
    assert got == expected, (got, expected)


@given(
    docs=st.lists(
        st.integers(min_value=1, max_value=140),  # token counts incl. >CHUNK tails
        min_size=1,
        max_size=6,
    )
)
@_SETTINGS
def test_chunk_windows_cover_every_token(spark, docs):
    """doc_chunk_windows coverage invariant (r6 advice, high): the union of
    [p, p+n_tokens) over a document's chunks must equal [1, len] exactly —
    no token dropped from the tail, no window past the end."""
    from single_cell_experiments_spark.operators.textanalysis import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunk_windows,
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        pdf = pd.DataFrame(
            {
                "doc_id": [f"d{i}" for i in range(len(docs))],
                "text": [" ".join(f"t{j}" for j in range(n)) for n in docs],
            }
        )
        pdf.to_parquet(os.path.join(tmp, "documents.parquet"))
        out = doc_chunk_windows(spark, tmp).collect()

    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(docs):
        rows = by_doc[f"d{i}"]
        covered = set()
        for r in rows:
            p = (r["chunk_id"] * CHUNK_STRIDE) + 1
            assert 1 <= p <= n, (p, n)
            assert r["n_tokens"] == min(CHUNK_TOKENS, n - p + 1)
            assert len(r["chunk_text"].split(" ")) == r["n_tokens"]
            covered.update(range(p, p + r["n_tokens"]))
        assert covered == set(range(1, n + 1)), (sorted(covered), n)


@given(
    data=st.binary(min_size=0, max_size=4096),
    typesize=st.sampled_from([1, 2, 4, 8, 16]),
    cname=st.sampled_from(["zlib", "lz4", "memcpy"]),
    shuffle=st.booleans(),
    blocksize=st.sampled_from([0, 256, 1024]),
)
@settings(max_examples=150, deadline=None)  # pure-Python: no Spark jobs, go wide
def test_blosc_codec_roundtrips_arbitrary_buffers(data, typesize, cname, shuffle, blocksize):
    """blosc_py encode→decode identity over random buffers × codec ×
    shuffle × block sizing (r7: the pure-Python Blosc v1 container).
    Buffers are trimmed to a typesize multiple (the container contract —
    numpy blocks always satisfy it)."""
    from single_cell_experiments_spark.sources import blosc_py

    data = data[: len(data) // typesize * typesize]
    enc = blosc_py.compress(
        data, typesize, cname=cname, shuffle=shuffle, blocksize=blocksize
    )
    assert blosc_py.decompress(enc) == data


@given(data=st.binary(min_size=0, max_size=4096))
@settings(max_examples=300, deadline=None)
def test_lz4_compress_decompress_roundtrip(data):
    """The pure-Python LZ4 block encoder must be inverted by the decoder
    for arbitrary bytes (r8: real match sequences replaced stored-raw
    splits, so the match/overlap branches need adversarial coverage)."""
    from single_cell_experiments_spark.sources.blosc_py import (
        lz4_block_compress,
        lz4_block_decompress,
    )

    assert lz4_block_decompress(lz4_block_compress(data), len(data)) == data


@given(
    data=st.binary(min_size=8, max_size=2048).map(lambda b: b[: len(b) // 8 * 8]),
    cname=st.sampled_from(["lz4", "zlib", "memcpy"]),
    shuffle=st.booleans(),
    blocksize=st.sampled_from([0, 64, 256]),
)
@settings(max_examples=150, deadline=None)
def test_blosc_chunk_roundtrip_property(data, cname, shuffle, blocksize):
    from single_cell_experiments_spark.sources import blosc_py

    enc = blosc_py.compress(data, 8, cname=cname, shuffle=shuffle, blocksize=blocksize)
    assert blosc_py.decompress(enc) == data


@given(
    n=st.integers(min_value=0, max_value=500),
    dtype=st.sampled_from(["<i8", "<f8", "<i4", "<u1", "<f4"]),
    chunk_len=st.sampled_from([0, 7, 64]),
    gzip=st.sampled_from([0, 3]),
    shuf=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_minih5_roundtrip_property(tmp_path_factory, n, dtype, chunk_len, gzip, shuf):
    """write_h5 ∘ MiniH5File.dataset is identity across dtypes, sizes,
    and storage layouts (contiguous / chunked+deflate+shuffle), including
    partial reads of random slices."""
    import numpy as np

    from single_cell_experiments_spark.sources.minih5 import MiniH5File, write_h5

    rng = np.random.default_rng(n + chunk_len + gzip)
    if dtype.startswith("<f"):
        arr = rng.standard_normal(n).astype(dtype)
    else:
        arr = rng.integers(0, 100, n).astype(dtype)
    path = str(tmp_path_factory.mktemp("h5") / "p.h5")
    write_h5(path, {"g": {"d": arr}}, chunk_len=chunk_len, gzip=gzip, shuffle=shuf)
    with MiniH5File(path) as f:
        got = f.dataset("g/d")
        assert got.dtype == arr.dtype
        np.testing.assert_array_equal(got, arr)
        if n:
            lo = int(rng.integers(0, n))
            hi = int(rng.integers(lo, n + 1))
            np.testing.assert_array_equal(f.read_slice("g/d", lo, hi), arr[lo:hi])


def test_pack_token_sequences_conserves_and_fills(spark):
    """Sequence-packing invariants on the real fixture: every sequence
    except the last fills to exactly SEQ_PACK_LEN tokens, spans within a
    sequence tile it contiguously from offset 0, each document's spans
    reassemble its full token count, and the global stream order is
    doc_id order (a doc's continuation starts at seq_off 0 of the next
    sequence)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table
    from single_cell_experiments_spark.operators.pipeline import (
        SEQ_PACK_LEN,
        pack_token_sequences,
    )
    from tests.conftest import SF_DIR

    rows = pack_token_sequences(spark, SF_DIR).collect()
    assert rows
    per_seq = defaultdict(list)
    per_doc = defaultdict(int)
    for r in rows:
        per_seq[int(r.seq_id)].append((int(r.seq_off), int(r.n_tok)))
        per_doc[int(r.doc_id)] += int(r.n_tok)
    last = max(per_seq)
    for sid, spans in per_seq.items():
        spans.sort()
        assert spans[0][0] == 0, sid
        for (o1, n1), (o2, _n2) in zip(spans, spans[1:]):
            assert o1 + n1 == o2, sid  # contiguous tiling, no gaps/overlaps
        total = sum(n for _o, n in spans)
        if sid < last:
            assert total == SEQ_PACK_LEN, (sid, total)
        else:
            assert 0 < total <= SEQ_PACK_LEN

    d = load_table(spark, SF_DIR, "documents")
    truth = {
        int(r.doc_id): int(r.n)
        for r in d.select(
            "doc_id",
            F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("n"),
        ).collect()
        if int(r.n) > 0
    }
    assert per_doc == truth
