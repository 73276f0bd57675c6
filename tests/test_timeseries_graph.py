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


def test_trend_slope_matches_numpy_polyfit(spark):
    """The exact rational (num, den) must equal numpy's closed-form OLS
    slope on the same centered integer data, and slope_e3 must be its
    half-away-from-zero e3 rounding."""
    import numpy as np
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table
    from single_cell_experiments_spark.operators.advanced import trend_user_value
    from tests.conftest import SF_DIR

    got = {int(r.user_id): r for r in trend_user_value(spark, SF_DIR).collect()}
    assert got
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts_s", F.round(F.col("value") * 100).cast("bigint").alias("yc"))
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(int(r.user_id), []).append((int(r.ts_s), int(r.yc)))
    checked = 0
    for uid, pts in by_user.items():
        x0 = min(x for x, _ in pts)
        x = np.array([p[0] - x0 for p in pts], dtype=object)
        y = np.array([p[1] for p in pts], dtype=object)
        n = len(pts)
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        den = n * int((x * x).sum()) - int(x.sum()) ** 2
        if den == 0:
            assert uid not in got
            continue
        r = got[uid]
        assert (int(r.num), int(r.den), int(r.n_events)) == (num, den, n)
        sign = -1 if num < 0 else 1
        assert int(r.slope_e3) == sign * ((2000 * abs(num) + den) // (2 * den))
        # cross-check against float OLS within e3 quantization
        slope = np.polyfit([float(v) for v in x], [float(v) for v in y], 1)[0]
        assert abs(slope - int(r.slope_e3) / 1000.0) <= 0.002 + 1e-6 * abs(slope)
        checked += 1
    assert checked > 0
