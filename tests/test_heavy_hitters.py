"""Misra-Gries summary property tests (pure pandas — no Spark needed).

The adversarial case here is the one a bare prune-filter variant fails:
``HH_CAPACITY`` front-loaded hot words fill the counter table in early
batches while a true heavy hitter arrives thinly spread across every batch.
Real MG (decrement-by-cut) keeps it; filter-only MG re-evicts it each batch
and silently loses unbounded mass.
"""

import pandas as pd

from single_cell_experiments_spark.operators.textanalysis import (
    HH_CAPACITY,
    misra_gries_summary,
)


def _run(batches):
    (out,) = list(misra_gries_summary(iter(batches)))
    return set(out["w"])


def test_exact_when_under_capacity():
    batches = [pd.DataFrame({"w": ["a"] * 5 + ["b"] * 3}), pd.DataFrame({"w": ["c", "a"]})]
    assert _run(batches) == {"a", "b", "c"}


def test_thinly_spread_heavy_hitter_survives_front_loaded_noise():
    # Batch 0: CAPACITY distinct hot words, 40 occurrences each -> table full.
    hot = [f"hot{i}" for i in range(HH_CAPACITY)]
    batches = [pd.DataFrame({"w": [w for w in hot for _ in range(40)]})]
    # Then 200 batches: the true heavy hitter drips 3 occurrences per batch
    # among 30 one-off words.  Total: target=600, n ~= 2560 + 200*33 = 9160,
    # so target is ~6.5% of the stream -- far above n/(k+1) ~= 1.5%.
    for i in range(200):
        noise = [f"noise_{i}_{j}" for j in range(30)]
        batches.append(pd.DataFrame({"w": ["target"] * 3 + noise}))
    survivors = _run(batches)
    assert "target" in survivors
    assert len(survivors) <= HH_CAPACITY + 1


def test_undercount_bound_guarantee():
    # Any word with true count > n/(HH_CAPACITY+1) must survive, whatever
    # the interleaving.  Construct several spread words above the bound.
    spread = {f"s{i}": 120 for i in range(8)}
    rows = []
    for i in range(60):
        for w, c in spread.items():
            rows.extend([w] * (c // 60))
        rows.extend(f"junk_{i}_{j}" for j in range(80))
    n = len(rows)
    batches = [pd.DataFrame({"w": rows[i : i + 97]}) for i in range(0, n, 97)]
    survivors = _run(batches)
    for w, c in spread.items():
        assert c > n / (HH_CAPACITY + 1)
        assert w in survivors, (w, c, n)
