"""sc_communities / lpa_labels: determinism, convergence, and equality
with an independent pure-Python synchronous-LPA reference (r8 verdict #4
asked for a property-tested community step over sc_neighbor_edges)."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pytest

from single_cell_experiments_spark.operators.singlecell import (
    SC_LPA_ROUNDS,
    lpa_labels,
    sc_communities,
)

SF_DIR = "/root/testdata/sf0.001"


def ref_lpa(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Independent dict-based sync LPA: same semantics (majority over
    dst-side labels of out-edges, min-label tie-break), written against
    the ALGORITHM, not the Spark code."""
    adj = defaultdict(list)
    nodes = set()
    for u, v in edges:
        adj[u].append(v)
        nodes.update((u, v))
    lbl = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for u in nodes:
            cnt = Counter(lbl[v] for v in adj[u])
            new[u] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        if new == lbl:
            break
        lbl = new
    return lbl


def _with_self_loops(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Symmetrize + self-loops — the edge prep sc_communities applies."""
    out = set()
    for u, v in pairs:
        out.update({(u, v), (v, u), (u, u), (v, v)})
    return sorted(out)


def _spark_lpa(
    spark, edges: list[tuple[int, int]], stats: dict | None = None
) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    res = lpa_labels(df, SC_LPA_ROUNDS, stats=stats)
    return {r.id: r.lbl for r in res.collect()}


def test_lpa_matches_reference_on_structured_graphs(spark):
    """Two cliques + a path + an isolated pair: communities must match
    the independent reference exactly and converge within the budget."""
    k1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    k2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    path = [(20, 21), (21, 22), (22, 23)]
    pair = [(30, 31)]
    edges = _with_self_loops(k1 + k2 + path + pair)
    stats: dict = {}
    got = _spark_lpa(spark, edges, stats)
    assert got == ref_lpa(edges, SC_LPA_ROUNDS)
    assert stats["converged"]
    # the two cliques collapse to their min ids; the isolated pair merges
    assert {got[a] for a in range(4)} == {0}
    assert {got[a] for a in range(10, 15)} == {10}
    assert got[30] == got[31] == 30


def test_lpa_self_vote_damps_two_cycle_oscillation(spark):
    """A bare 2-cycle oscillates forever under synchronous updates; the
    self-loop vote breaks the swap symmetry — both nodes settle on the
    min label and the loop exits at a true fixpoint."""
    edges = _with_self_loops([(7, 8)])
    stats: dict = {}
    got = _spark_lpa(spark, edges, stats)
    assert got == {7: 7, 8: 7}
    assert stats["converged"] and stats["rounds"] <= 3


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_lpa_matches_reference_on_random_graphs(spark, seed):
    """Random sparse graphs (the property sweep): Spark == reference
    after the same fixed round budget, converged or not — the fixed-round
    definition is what the oracle checks too."""
    rng = np.random.default_rng(seed)
    n = 24
    pairs = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.integers(0, n, (40, 2))
        if a != b
    }
    edges = _with_self_loops(sorted(pairs))
    assert _spark_lpa(spark, edges) == ref_lpa(edges, SC_LPA_ROUNDS)


def test_lpa_shrinking_label_table_defers_convergence(spark):
    """Focused r16 probe test: the exact fixpoint check is
    ``moved == 0 AND n == prev_n``.  On a directed graph where a node
    drops out (its only out-edge points at a non-src, so it never has a
    surviving candidate), the first round has moved == 0 but a SHRUNK
    row count — convergence must NOT be declared until the count is also
    stable, or a weaker probe would stop one round early on a table that
    still changed.  (Production callers symmetrize + self-loop, where no
    node ever drops; this pins the guard itself.)"""
    edges = [(1, 1), (9, 7)]  # 7 has no out-edges => 9 drops in round 1
    df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    res = lpa_labels(df, SC_LPA_ROUNDS, stats=stats)
    assert {r.id: r.lbl for r in res.collect()} == {1: 1}
    assert stats["converged"]
    # round 1: moved == 0 but n: 2 -> 1 (NOT converged); round 2: stable.
    assert stats["rounds"] == 2


def test_sc_communities_on_real_graph_converges(spark):
    """End-to-end over the sf0.001 embeddings: every cell labeled, the
    fixpoint is reached inside the round budget, and communities are
    non-trivial (neither all-singleton nor one blob)."""
    stats: dict = {}
    res = sc_communities(spark, SF_DIR, stats=stats)
    rows = res.collect()
    n = len(rows)
    assert n == spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert stats["converged"], "LPA did not reach a fixpoint on the kNN graph"
    ncomm = len({r.community for r in rows})
    assert 1 <= ncomm < n


def test_dedup_communities_refine_components(spark):
    """Labels only propagate along edges, so every LPA community must lie
    inside ONE connected component (communities refine, never merge,
    components) — and LPA can only produce at least as many groups."""
    from collections import defaultdict

    from single_cell_experiments_spark.operators.dedup import (
        dedup_connected_components,
        dedup_graph_communities,
    )

    comm = {r.doc_id: r.community for r in dedup_graph_communities(spark, SF_DIR).collect()}
    comp = {r.doc_id: r.component_id for r in dedup_connected_components(spark, SF_DIR).collect()}
    assert set(comm) == set(comp)
    spread = defaultdict(set)
    for d, lbl in comm.items():
        spread[lbl].add(comp[d])
    assert all(len(v) == 1 for v in spread.values())
    assert len(set(comm.values())) >= len(set(comp.values()))


def test_pseudobulk_profiles_cover_all_cells_and_means_are_exact(spark):
    """Pseudobulk invariants: every community×gene cell appears exactly
    once, member counts per community are constant across genes and sum
    to the cell total, and the integer mean is the half-away-from-zero
    rounding of sum/n (|2·sum − 2·n·mean| ≤ n)."""
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table
    from single_cell_experiments_spark.operators.singlecell import sc_pseudobulk
    from tests.conftest import SF_DIR

    rows = sc_pseudobulk(spark, SF_DIR).collect()
    assert rows
    e = load_table(spark, SF_DIR, "embeddings")
    n_cells = e.count()
    dim = int(e.agg(F.max(F.size("embedding"))).collect()[0][0])

    seen = set()
    comm_counts = {}
    for r in rows:
        key = (int(r.community), int(r.pos))
        assert key not in seen
        seen.add(key)
        c = comm_counts.setdefault(int(r.community), int(r.n_cells))
        assert c == int(r.n_cells), "count varies across genes"
        s, n, m = int(r.sum_e6), int(r.n_cells), int(r.mean_e6)
        assert abs(2 * s - 2 * n * m) <= n, (s, n, m)
        assert (m >= 0) == (s >= 0) or m == 0
    assert sum(comm_counts.values()) == n_cells
    assert len(rows) == len(comm_counts) * dim


def test_doublet_score_contract(spark):
    """Doublet-score invariants: one row per cell, 0 <= n_dbl <= k_eff
    <= k, k_eff = k wherever the label block offers >= k+1 candidates,
    and the simulations are actually competitive (some cell sees a
    simulated doublet among its neighbors)."""
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table
    from single_cell_experiments_spark.operators.singlecell import (
        SC_DOUBLET_K,
        sc_doublet_score,
    )

    rows = sc_doublet_score(spark, SF_DIR).collect()
    e = load_table(spark, SF_DIR, "embeddings")
    n = e.count()
    assert len(rows) == n
    assert len({int(r.vec_id) for r in rows}) == n
    blocks = {
        int(r.label): int(r.c)
        for r in e.groupBy("label").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    lbl = {int(r.vec_id): int(r.label) for r in e.select("vec_id", "label").collect()}
    for r in rows:
        nd, ke = int(r.n_dbl), int(r.k_eff)
        assert 0 <= nd <= ke <= SC_DOUBLET_K
        cnt = blocks[lbl[int(r.vec_id)]]
        cands = (2 * cnt if cnt >= 2 else cnt) - 1
        if cands >= SC_DOUBLET_K:
            assert ke == SC_DOUBLET_K
    assert any(int(r.n_dbl) > 0 for r in rows), "no simulation ever ranked"


def test_batch_correct_aligns_batch_moments(spark):
    """After center-scale correction every (batch, gene)'s sample mean
    must sit at the global gene mean and its sd at the global gene sd,
    within the 6-decimal moment quantization — the operator's defining
    property, checked independently with numpy."""
    import numpy as np
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table
    from single_cell_experiments_spark.operators.singlecell import sc_batch_correct

    out = sc_batch_correct(spark, SF_DIR).collect()
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "label").collect()
    batch = {int(r.vec_id): int(r.label) for r in e}
    by_bg, by_g = {}, {}
    for r in out:
        y = int(r.y_e4) / 1e4
        by_bg.setdefault((batch[int(r.vec_id)], int(r.pos)), []).append(y)
        by_g.setdefault(int(r.pos), []).append(y)
    gstats = {p: (np.mean(v), np.std(v)) for p, v in by_g.items()}
    for (b, p), v in by_bg.items():
        if len(v) < 10:
            continue
        gm, gs = gstats[p]
        assert abs(np.mean(v) - gm) < 0.02 + 0.05 * gs, (b, p)
        if gs > 0.05:
            assert abs(np.std(v) - gs) < 0.15 * gs + 0.02, (b, p)


def test_batch_mixing_accounting(spark):
    """Mixing-score invariants: edge counts sum to k·n (every cell emits
    exactly k exact-kNN edges), same_edges <= n_edges, exp_ppm matches
    the (n_b-1)/(n-1) formula, and excess = obs - exp."""
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table
    from single_cell_experiments_spark.operators.singlecell import (
        SC_NEIGHBORS_K,
        sc_batch_mixing,
    )

    rows = sc_batch_mixing(spark, SF_DIR).collect()
    lab = load_table(spark, SF_DIR, "embeddings").select("vec_id", "label")
    n = lab.count()
    sizes = {
        int(r.label): int(r.c)
        for r in lab.groupBy("label").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {int(r.batch) for r in rows} == set(sizes)
    assert sum(int(r.n_edges) for r in rows) == SC_NEIGHBORS_K * n
    for r in rows:
        nb = sizes[int(r.batch)]
        assert int(r.n_cells) == nb
        assert 0 <= int(r.same_edges) <= int(r.n_edges) == SC_NEIGHBORS_K * nb
        assert int(r.exp_ppm) == 1000000 * (nb - 1) // (n - 1)
        assert int(r.excess_ppm) == int(r.obs_ppm) - int(r.exp_ppm)
