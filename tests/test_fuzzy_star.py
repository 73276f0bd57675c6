"""Block-size cap + star salvage for the edit-distance dedup tier (r13,
from the r12 verdict: the one remaining uncapped Σ(block²) tier).  Same
split as tests/test_lsh_star.py: the registered default-cap queries pin
non-interference on healthy corpora; these tests pin the cap/salvage
behavior under a FORCED tiny cap."""

import pandas as pd
import pytest

from single_cell_experiments_spark.operators.dedup import _fuzzy_sql


def _docs():
    # 5 docs sharing one 40-char prefix (one over-cap head block at cap=2,
    # lev=0 pairwise), one small-block near-dup pair (1 edit inside the
    # prefix tail so the HEAD block still matches), and two unrelated docs.
    template = "shared boilerplate header line padded out to forty chars then unique tail "
    pair_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    pair_b = "alpha beta gamma delta epsilon zeta eta thXta iota kappa"
    other1 = "completely different content about catalyst optimizer internals"
    other2 = "yet another unrelated string mentioning parquet row groups"
    rows = [(i, template + str(i), "en") for i in range(5)]
    rows += [(10, pair_a, "en"), (11, pair_b, "en"), (20, other1, "en"), (21, other2, "en")]
    # a non-en doc sharing the template prefix must never block-pair
    rows += [(30, template + "x", "zh")]
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


@pytest.fixture(scope="module")
def fuzzy_results(spark):
    pdf = _docs()
    spark.createDataFrame(pdf).createOrReplaceTempView("__docs")
    star = spark.sql(_fuzzy_sql("__docs", cap=2, star=True)).collect()
    plain = spark.sql(_fuzzy_sql("__docs", cap=2)).collect()
    return pdf, star, plain


def test_star_recovers_dropped_template_block(fuzzy_results):
    _, star, plain = fuzzy_results
    plain_pairs = {(r.doc1, r.doc2) for r in plain}
    star_pairs = {(r.doc1, r.doc2): r.via_star for r in star}

    # the capped core alone loses the whole 5-doc template block
    assert not any(d1 < 5 and d2 < 5 for d1, d2 in plain_pairs)
    # star salvage emits exactly the exemplar star, flagged via_star=1
    expected_star = {(0, d) for d in range(1, 5)}
    got_star = {p for p, v in star_pairs.items() if v == 1}
    assert got_star == expected_star
    # star pairs are still levenshtein-verified (shared 40-char prefix → 0)
    assert all(r.lev == 0 for r in star if r.via_star == 1)


def test_star_cluster_is_connected(fuzzy_results):
    _, star, _ = fuzzy_results
    parent = {i: i for i in range(5)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in star:
        if r.doc1 < 5 and r.doc2 < 5:
            parent[find(r.doc2)] = find(r.doc1)
    assert len({find(i) for i in range(5)}) == 1


def test_star_keeps_normal_blocks_untouched(fuzzy_results):
    _, star, plain = fuzzy_results
    star_pairs = {(r.doc1, r.doc2): r.via_star for r in star}
    # the small-block near-dup pair flows through the capped core, via_star=0
    assert star_pairs.get((10, 11)) == 0
    assert (10, 11) in {(r.doc1, r.doc2) for r in plain}
    # unrelated and non-en docs never pair
    assert not any(d2 in (20, 21, 30) or d1 in (20, 21, 30) for d1, d2 in star_pairs)


def test_fuzzy_sql_dialects_agree(fuzzy_results):
    """Cross-engine: the DuckDB run of the same builder produces the
    identical pair set at the same forced cap (both variants)."""
    import duckdb

    pdf, star, plain = fuzzy_results
    con = duckdb.connect()
    con.register("documents", pdf)
    ddb_star = con.sql(_fuzzy_sql("documents", cap=2, star=True)).fetchall()
    assert {(r.doc1, r.doc2, r.lev, r.via_star) for r in star} == set(
        map(tuple, ddb_star)
    )
    ddb_plain = con.sql(_fuzzy_sql("documents", cap=2)).fetchall()
    assert {(r.doc1, r.doc2, r.lev) for r in plain} == set(map(tuple, ddb_plain))


def test_default_cap_star_equals_plain(spark):
    """At the default cap on the sf0.001 documents, no block is over-cap:
    star output == plain output with via_star = 0 everywhere."""
    from single_cell_experiments_spark.registry import fresh_fn

    sf = "/root/testdata/sf0.001"
    star = fresh_fn("dedup_fuzzy_prefix_pairs_star")(spark, sf).collect()
    plain = fresh_fn("dedup_fuzzy_prefix_pairs")(spark, sf).collect()
    assert all(r.via_star == 0 for r in star)
    assert {(r.doc1, r.doc2, r.lev) for r in star} == {
        (r.doc1, r.doc2, r.lev) for r in plain
    }
