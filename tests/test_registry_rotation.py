"""The driver-window rotation must be DERIVED from the CORRECTNESS files on
disk (r6 verdict #4) — stalest external evidence first, never-checked
queries always inside the window — so the ordering can never drift from the
actual evidence the way hand-maintained lists could."""

from __future__ import annotations

import glob
import json
import os
import re

from single_cell_experiments_spark.registry import _evidence_rounds, queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The driver checks this many leading registry entries per round.
DRIVER_WINDOW = 50


def _expected_rounds() -> dict[str, int]:
    """Independent re-derivation of query -> latest green round."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            green = row.get("hash_match")
            if green is None:
                green = row.get("rows_match")
            if green:
                out[name] = max(out.get(name, 0), rnd)
    return out


def test_evidence_rounds_match_files_on_disk():
    expected = _expected_rounds()
    got = _evidence_rounds()
    # the registry may know fewer names than the files (renamed/retired
    # queries keep their historical rows) but must agree wherever both do.
    for name, rnd in expected.items():
        assert got.get(name) == rnd, (name, got.get(name), rnd)


def test_ordering_is_stalest_first():
    ev = _evidence_rounds()
    names = list(queries())
    rounds = [ev.get(n, 0) for n in names]
    assert rounds == sorted(rounds), "registry order must be evidence-age ascending"


def test_never_checked_queries_lead_the_window():
    ev = _evidence_rounds()
    names = list(queries())
    never = [n for n in names if ev.get(n, 0) == 0]
    assert names[: len(never)] == sorted(never)
    assert len(never) <= DRIVER_WINDOW, "never-checked backlog exceeds the window"
