"""Semantic tests for the r12 quality/timeseries/collocation additions —
independent pure-Python recomputations at sf0.001 (the DuckDB twins live
in test_oracle_parity.py; these pin the math itself).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from tests.conftest import SF_DIR

TOK = re.compile(r"[a-z]+")


# --- referential integrity ------------------------------------------------------


def test_ri_audit_matches_python_sets(spark):
    from single_cell_experiments_spark.operators.pipeline import (
        RI_RELATIONSHIPS,
        referential_integrity_audit,
    )

    got = {r.rel: r for r in referential_integrity_audit(spark, SF_DIR).collect()}
    assert set(got) == {rel for rel, *_ in RI_RELATIONSHIPS}

    for rel, child, ck, parent, pk in RI_RELATIONSHIPS:
        ckeys = [r[ck] for r in spark.read.parquet(f"{SF_DIR}/{child}.parquet").collect()]
        pkeys = {r[pk] for r in spark.read.parquet(f"{SF_DIR}/{parent}.parquet").collect()}
        orphans = sum(1 for k in ckeys if k is None or k not in pkeys)
        row = got[rel]
        assert row.n_child == len(ckeys), rel
        assert row.n_orphan == orphans, rel
        assert row.orphan_ppm == orphans * 1_000_000 // len(ckeys), rel


def test_ri_audit_counts_injected_orphan(spark, tmp_path):
    """Drop a parent row from a scratch copy of the schema: the audit must
    see exactly the children of the removed key as orphans."""
    import shutil

    from single_cell_experiments_spark.operators.pipeline import (
        referential_integrity_audit,
    )

    scratch = str(tmp_path / "ri")
    import os

    os.makedirs(scratch)
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{scratch}/{t}.parquet")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    victim = orders.select("o_orderkey").head()[0]
    n_victim_items = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(f"l_orderkey = {victim}")
        .count()
    )
    assert n_victim_items > 0
    orders.where(f"o_orderkey <> {victim}").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{scratch}/orders.parquet")

    got = {r.rel: r for r in referential_integrity_audit(spark, scratch).collect()}
    assert got["lineitem->orders"].n_orphan == n_victim_items
    assert got["orders->customer"].n_orphan == 0


# --- TWAP ----------------------------------------------------------------------


def test_twap_matches_python_integral(spark):
    from single_cell_experiments_spark.operators.advanced import twap_user_daily

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        ts_s = r.ts.value // 10**9 if hasattr(r.ts, "value") else int(r.ts.timestamp())
        v_c = math.floor(r.value * 100.0 + 0.5)
        per[(r.user_id, ts_s // 86400)].append((ts_s, r.event_id, v_c))

    expect = {}
    for (uid, day), rows in per.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        gaps = [(rows[i + 1][0] - rows[i][0], rows[i][2]) for i in range(len(rows) - 1)]
        dwell = sum(g for g, _ in gaps)
        twap = sum(g * v for g, v in gaps) // dwell if dwell > 0 else None
        expect[(uid, day * 86400)] = (len(rows), dwell, twap)

    got = {
        (r.user_id, r.day_s): (r.n_events, r.dwell_s, r.twap_c)
        for r in twap_user_daily(spark, SF_DIR).collect()
    }
    assert got == expect
    # at least one single-event day must exercise the NULL branch
    assert any(v[2] is None for v in expect.values())
    assert any(v[2] is not None for v in expect.values())


# --- collocations ----------------------------------------------------------------


def test_collocations_match_python_pmi(spark):
    from single_cell_experiments_spark.operators.textanalysis import (
        COLLOC_MIN_COUNT,
        COLLOC_TOPK,
        collocations_lift,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    toks_by_doc = [TOK.findall(r.text.lower()) for r in docs]
    c1 = Counter(w for ws in toks_by_doc for w in ws)
    n = sum(c1.values())
    c2 = Counter((a, b) for ws in toks_by_doc for a, b in zip(ws, ws[1:]))

    scored = [
        (w1, w2, cnt, cnt * 1_000_000 * n // (c1[w1] * c1[w2]))
        for (w1, w2), cnt in c2.items()
        if cnt >= COLLOC_MIN_COUNT
    ]
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    expect = scored[:COLLOC_TOPK]

    got = [
        (r.w1, r.w2, r.c2, r.lift_ppm) for r in collocations_lift(spark, SF_DIR).collect()
    ]
    assert got == expect
    # ranking by lift IS ranking by PMI: spot-check the sign relationship
    for w1, w2, cnt, lift in expect[:5]:
        pmi = math.log(cnt * n / (c1[w1] * c1[w2]))
        assert (lift > 1_000_000) == (pmi > 0)
