"""Semantic tests for the r12 sketch/retrieval/interval additions, checked
against independent pure-Python recomputations (the reference-style oracle
layer — the DuckDB parity tests in test_oracle_parity.py cover the SQL twin;
these pin the MATH so a twin-side bug can't hide a twin-identical mistake).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from tests.conftest import SF_DIR

TOK = re.compile(r"[a-z]+")


def _doc_tokens(spark):
    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    return {r.doc_id: TOK.findall(r.text.lower()) for r in rows}


# --- count-min sketch ---------------------------------------------------------


def test_cms_estimate_dominates_truth_and_matches_reference(spark):
    """CMS point estimates must (a) never undercount, and (b) equal an
    independent Python CMS built with the same hash family."""
    from single_cell_experiments_spark.operators.textanalysis import (
        CMS_HASHES,
        CMS_P,
        CMS_W,
        cms_word_freq,
    )

    toks = [w for ws in _doc_tokens(spark).values() for w in ws]

    def key(w: str) -> int:
        k = 0
        for ch in w:
            k = (k * 131 + ord(ch)) % CMS_P
        return k

    sketch = [Counter() for _ in CMS_HASHES]
    for w in toks:
        k = key(w)
        for r, (a, b) in enumerate(CMS_HASHES):
            sketch[r][((a * k + b) % CMS_P) % CMS_W] += 1

    exact = Counter(toks)

    out = {r.word: r for r in cms_word_freq(spark, SF_DIR).collect()}
    assert len(out) == 20
    for word, row in out.items():
        k = key(word)
        est = min(
            sketch[r][((a * k + b) % CMS_P) % CMS_W]
            for r, (a, b) in enumerate(CMS_HASHES)
        )
        assert row.freq_exact == exact[word], word
        assert row.freq_cms == est, word
        assert row.freq_cms >= row.freq_exact  # CMS never undercounts
        assert row.overcount == row.freq_cms - row.freq_exact


# --- reciprocal rank fusion ---------------------------------------------------


def test_rrf_score_is_exact_rank_arithmetic(spark):
    """Every fused row's rrf_ppm must equal the integer formula applied to
    its own rank columns, ranks must be within the candidate-list bounds,
    and the output must be sorted by (rrf desc, doc_id)."""
    from single_cell_experiments_spark.operators.textanalysis import (
        RRF_K,
        RRF_LIST,
        RRF_TOPN,
        hybrid_rank_rrf,
    )

    rows = hybrid_rank_rrf(spark, SF_DIR).collect()
    assert 0 < len(rows) <= RRF_TOPN
    for r in rows:
        expect = 0
        if r.r_bm25 > 0:
            expect += 1_000_000 // (RRF_K + r.r_bm25)
        if r.r_ttr > 0:
            expect += 1_000_000 // (RRF_K + r.r_ttr)
        assert r.rrf_ppm == expect, r
        assert 0 <= r.r_bm25 <= RRF_LIST and 0 <= r.r_ttr <= RRF_LIST
        assert r.r_bm25 > 0 or r.r_ttr > 0  # only ranked docs can fuse in
    keys = [(-r.rrf_ppm, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_rrf_doc_in_both_lists_outranks_single_list_peer(spark):
    """A doc ranked by both lists must score strictly above any doc holding
    only ONE list's worst rank — the fusion property RRF exists for."""
    from single_cell_experiments_spark.operators.textanalysis import (
        RRF_K,
        RRF_LIST,
        hybrid_rank_rrf,
    )

    rows = hybrid_rank_rrf(spark, SF_DIR).collect()
    both = [r for r in rows if r.r_bm25 > 0 and r.r_ttr > 0]
    floor_single = 1_000_000 // (RRF_K + RRF_LIST)
    for r in both:
        assert r.rrf_ppm > floor_single


# --- bigram LM scoring --------------------------------------------------------


def test_bigram_lm_matches_python_reference(spark):
    from single_cell_experiments_spark.operators.textanalysis import (
        BGLM_SCALE,
        doc_bigram_lm_score,
    )

    docs = _doc_tokens(spark)
    c2: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    for ws in docs.values():
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)

    expect = {}
    for doc_id, ws in docs.items():
        ppms = [
            ((c2[(a, b)] + 1) * BGLM_SCALE) // (c1[a] + v)
            for a, b in zip(ws, ws[1:])
        ]
        expect[doc_id] = (len(ppms), sum(ppms) // len(ppms) if ppms else 0)

    out = {r.doc_id: (r.n_bigrams, r.lm_score_ppm) for r in doc_bigram_lm_score(spark, SF_DIR).collect()}
    assert out == expect


# --- interval coalescing ------------------------------------------------------


def _python_islands(intervals):
    """Reference coalesce: sort by (start, event_id), sweep with running
    max end; returns list of (start, end, n_events) islands."""
    islands = []
    cur_s = cur_e = None
    n = 0
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                islands.append((cur_s, cur_e, n))
            cur_s, cur_e, n = s, e, 1
        else:
            cur_e = max(cur_e, e)
            n += 1
    if cur_e is not None:
        islands.append((cur_s, cur_e, n))
    return islands


def test_interval_coalesce_matches_python_sweep(spark):
    from single_cell_experiments_spark.operators.advanced import (
        IC_BASE_S,
        IC_MOD,
        events_interval_coalesce,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    per_user = defaultdict(list)
    for r in ev:
        s = r.ts.value // 10**9 if hasattr(r.ts, "value") else int(r.ts.timestamp())
        per_user[r.user_id].append((s, s + IC_BASE_S + r.event_id % IC_MOD, r.event_id))

    expect = {}
    for uid, iv in per_user.items():
        iv.sort(key=lambda t: (t[0], t[2]))
        for seq, (s, e, n) in enumerate(
            _python_islands([(s, e) for s, e, _ in iv]), start=1
        ):
            expect[(uid, seq)] = (s, e, n, e - s)

    got = {
        (r.user_id, r.island_seq): (r.start_s, r.end_s, r.n_events, r.span_s)
        for r in events_interval_coalesce(spark, SF_DIR).collect()
    }
    assert got == expect


def test_interval_coalesce_long_interval_swallows_short(spark, tmp_path):
    """The case that forces running-max (not lag-gap) semantics, driven
    through the REAL operator on a synthetic events store: one 600-second
    interval (event_id % 541 == 540) shadows two 60-second ones, and a
    fourth event starts after every short end but inside the long one's
    span — one island.  A lag-gap regression (sessionize semantics) would
    split it, and this test — not just the sf0.001 parity sweep, whose
    data need not contain the shadow case — catches it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from single_cell_experiments_spark.operators.advanced import (
        IC_BASE_S,
        IC_MOD,
        events_interval_coalesce,
    )

    # (event_id, ts_s): interval length = IC_BASE_S + event_id % IC_MOD
    rows = [
        (540, 0),      # [0, 600) — the long shadow
        (1082, 100),   # % 541 == 0 -> [100, 160)
        (1623, 200),   # [200, 260)
        (2164, 500),   # starts > both short ends (160, 260), < 600
        (2705, 2000),  # genuinely new island
    ]
    assert all(
        IC_BASE_S + eid % IC_MOD == (600 if eid == 540 else 60) for eid, _ in rows
    )

    scratch = str(tmp_path / "iv")
    os.makedirs(scratch)
    table = pa.table(
        {
            "event_id": pa.array([eid for eid, _ in rows], pa.int64()),
            "ts": pa.array([s * 10**9 for _, s in rows], pa.timestamp("ns")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(table, f"{scratch}/events.parquet")

    got = sorted(
        (r.island_seq, r.n_events, r.start_s, r.end_s)
        for r in events_interval_coalesce(spark, scratch).collect()
    )
    assert got == [(1, 4, 0, 600), (2, 1, 2000, 2060)]

    # lag-gap semantics (the sessionize shape) would produce FOUR islands
    # on the same input — the wrong answer the running max avoids:
    lag_gap_islands = 0
    prev_e = None
    for eid, s in sorted(rows, key=lambda t: t[1]):
        if prev_e is None or s > prev_e:
            lag_gap_islands += 1
        prev_e = s + IC_BASE_S + eid % IC_MOD
    assert lag_gap_islands == 4
