"""Mechanical enforcement of the full-registry mimic gate.

The external driver hash-checks only the first 50 registry entries per
round; everything past the window relies on the LOCAL full sweep
(``tools/driver_mimic.py`` with no name filter) as its regression gate —
registry.py documents it as a MUST before each round snapshot.  This test
makes the MUST mechanical: it fails whenever engine source has changed
since the last green full sweep (content digest, so a fresh checkout
doesn't false-negative the way mtimes would).
"""

from __future__ import annotations

import json
import os

STAMP = os.path.join(os.path.dirname(__file__), "..", "tools", ".mimic_stamp.json")


def test_full_registry_mimic_ran_against_current_sources():
    from tools.driver_mimic import source_digest

    assert os.path.exists(STAMP), (
        "no full-registry mimic stamp: run `python tools/driver_mimic.py "
        "/root/testdata/sf0.01` (full sweep, no name filter) and keep it green"
    )
    with open(STAMP) as f:
        stamp = json.load(f)
    assert stamp["n_fail"] == 0
    # the sweep must have covered the whole registry, not a window
    assert stamp["n_pass"] + stamp["n_rows_only"] == stamp["n_registered"]
    assert stamp["source_digest"] == source_digest(), (
        "engine sources changed since the last green full-registry mimic "
        "sweep — re-run `python tools/driver_mimic.py /root/testdata/sf0.01` "
        f"(last green: {stamp['utc']} @ {stamp['sf_dir']})"
    )
