"""dedup_pipeline_verdict: composition invariants the per-stage oracle
rows can't check — tier monotonicity, one keeper per cluster, verdict/
stage consistency with the standalone operators."""

from __future__ import annotations

from single_cell_experiments_spark.operators.dedup import (
    dedup_cluster_keeper,
    dedup_exact,
    dedup_normalized_exact,
    dedup_pipeline_verdict,
)
from tests.conftest import SF_DIR


def test_pipeline_verdict_invariants(spark):
    rows = dedup_pipeline_verdict(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs  # every doc gets exactly one verdict

    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    # exactly one keeper per final cluster, and it is its own chain head
    for comp, members in by_comp.items():
        keeps = [r for r in members if r.keep]
        assert len(keeps) == 1, (comp, members)
        k = keeps[0]
        assert k.verdict == "keeper"
        assert k.doc_id == k.exact_rep == k.norm_rep

    for r in rows:
        # the chain is monotone: rep ids never exceed the doc id
        assert r.exact_rep <= r.doc_id
        assert r.norm_rep <= r.exact_rep
        # verdict names the first stage that dropped the doc
        if r.verdict == "exact_dup":
            assert r.doc_id != r.exact_rep
        elif r.verdict == "normalized_dup":
            assert r.doc_id == r.exact_rep and r.doc_id != r.norm_rep
        elif r.verdict == "near_dup":
            assert r.doc_id == r.norm_rep and not r.keep
        else:
            assert r.verdict == "keeper" and r.keep


def test_pipeline_tiers_match_standalone_operators(spark):
    """Tier handoffs agree with the standalone rows: exact groups match
    dedup_exact, the normalized tier collapses at least as much, and the
    number of keepers never exceeds dedup_cluster_keeper's (the pipeline
    dedups MORE: the standalone keeper runs LSH on the raw corpus, the
    pipeline on normalized survivors)."""
    rows = dedup_pipeline_verdict(spark, SF_DIR).collect()
    n_exact_groups = dedup_exact(spark, SF_DIR).count()
    assert len({r.exact_rep for r in rows}) == n_exact_groups
    n_norm_groups = dedup_normalized_exact(spark, SF_DIR).count()
    assert len({r.norm_rep for r in rows}) == n_norm_groups
    n_keep = sum(1 for r in rows if r.keep)
    n_standalone_keep = sum(
        1 for r in dedup_cluster_keeper(spark, SF_DIR).collect() if r.keep
    )
    assert n_keep <= n_standalone_keep


def test_lsh_bucket_cap_drops_degenerate_buckets(spark, tmp_path, monkeypatch):
    """r11: a (band, sig) bucket larger than LSH_BUCKET_CAP must be
    dropped from candidate generation (the 20× stress found one 26,650-doc
    collision bucket contributing 355M candidate pairs), while under-cap
    buckets keep producing pairs — and the default cap (5× the largest
    bucket ever observed at verified scales) never binds on real data."""
    from single_cell_experiments_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows = [(i, base, "en", "w", len(base)) for i in range(5)]  # one 5-doc bucket
    rows += [(10 + i, f"totally unrelated text number {i} " * 12, "en", "w", 1) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")

    pairs = dedup.dedup_minhash_lsh(spark, sf).collect()
    dup_pairs = {(r.doc1, r.doc2) for r in pairs if r.doc1 < 5 and r.doc2 < 5}
    assert len(dup_pairs) == 10, "identical docs must pair under the default cap"

    monkeypatch.setattr(dedup, "LSH_BUCKET_CAP", 4)  # the 5-doc bucket now over-cap
    from single_cell_experiments_spark import catalog
    catalog._df_cache.pop(spark, None)
    pairs2 = dedup.dedup_minhash_lsh(spark, sf).collect()
    dup_pairs2 = {(r.doc1, r.doc2) for r in pairs2 if r.doc1 < 5 and r.doc2 < 5}
    assert dup_pairs2 == set(), "over-cap bucket must generate no candidates"
