"""Invariant tests for the round-10 time-series / graph additions.

The mimic sweep checks these against their DuckDB oracles; these tests pin
the *semantic* invariants a matching pair of engines could still both get
wrong (shared-bug risk), on the tiny SF so they stay cheap.
"""

from __future__ import annotations

import pandas as pd

from single_cell_experiments_spark.operators.advanced import gap_fill_user_hourly
from single_cell_experiments_spark.operators.dedup import (
    KCORE_K,
    dedup_kcore,
    dedup_minhash_lsh,
)

from .conftest import SF_DIR


def test_kcore_is_a_fixpoint_subgraph(spark):
    """Every member of the converged K-core has >= K neighbors *within* the
    core (the defining property), and the core is a subset of the LSH
    graph's nodes."""
    core = dedup_kcore(spark, SF_DIR).toPandas()
    assert len(core) > 0
    assert int(core["core_degree"].min()) >= KCORE_K

    pairs = dedup_minhash_lsh(spark, SF_DIR).select("doc1", "doc2").toPandas()
    members = set(core["doc_id"])
    assert members <= (set(pairs["doc1"]) | set(pairs["doc2"]))

    # Independent recount: restrict the pair list to core members and
    # recompute degrees locally — must equal the reported core_degree.
    sub = pairs[pairs["doc1"].isin(members) & pairs["doc2"].isin(members)]
    deg = (
        pd.concat([sub["doc1"], sub["doc2"]]).value_counts().astype("int64")
    )
    got = core.set_index("doc_id")["core_degree"].sort_index()
    assert deg.sort_index().equals(got)


def test_gap_fill_grid_is_dense_and_locf(spark):
    """Per user: the hour grid is gapless from first to last activity,
    filled rows carry zero events and the previous row's reading, and the
    first row is always an observed one."""
    g = (
        gap_fill_user_hourly(spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "hour_start_s"])
    )
    assert len(g) > 0
    for _uid, grp in g.groupby("user_id"):
        hours = grp["hour_start_s"].to_numpy()
        assert (hours[1:] - hours[:-1] == 3600).all()
        assert grp.iloc[0]["filled"] == 0
        filled = grp["filled"].to_numpy().astype(bool)
        assert (grp.loc[filled, "n_events"] == 0).all()
        readings = grp["reading_micro"].to_numpy()
        # LOCF: a filled row's reading equals the previous row's reading.
        assert (readings[1:][filled[1:]] == readings[:-1][filled[1:]]).all()
        # Observed rows actually observed something.
        assert (grp.loc[~filled, "n_events"] >= 1).all()
