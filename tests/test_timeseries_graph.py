"""Invariant tests for the round-10 time-series / graph additions.

The mimic sweep checks these against their DuckDB oracles; these tests pin
the *semantic* invariants a matching pair of engines could still both get
wrong (shared-bug risk), on the tiny SF so they stay cheap.
"""

from __future__ import annotations

import pandas as pd

from single_cell_experiments_spark.operators.advanced import (
    gap_fill_user_hourly,
    gap_fill_user_linear,
)
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


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark ``div`` / DuckDB ``//``)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_gap_fill_linear_matches_local_recompute(spark):
    """Full independent recompute of the interpolation in plain Python:
    for every gap row, the reading must equal
    pv + trunc((nv - pv) * (h - ph) / (nh - ph)) over the surrounding
    observed hours — including negative-slope gaps."""
    g = (
        gap_fill_user_linear(spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "hour_start_s"])
    )
    assert len(g) > 0
    saw_negative_slope = False
    for _uid, grp in g.groupby("user_id"):
        obs = grp[grp["filled"] == 0][["hour_start_s", "reading_micro"]].to_numpy()
        assert grp.iloc[0]["filled"] == 0 and grp.iloc[-1]["filled"] == 0
        import bisect

        hours_obs = [int(h) for h, _ in obs]
        for _, row in grp[grp["filled"] == 1].iterrows():
            h = int(row["hour_start_s"])
            i = bisect.bisect_left(hours_obs, h)
            ph, pv = map(int, obs[i - 1])
            nh, nv = map(int, obs[i])
            want = pv + _trunc_div((nv - pv) * (h - ph), nh - ph)
            assert int(row["reading_micro"]) == want
            saw_negative_slope = saw_negative_slope or nv < pv
    # The dataset must actually exercise the negative-numerator branch.
    assert saw_negative_slope
