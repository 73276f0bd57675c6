"""Multimodal plumbing unit tests (the decode-path oracle checks run in
test_oracle_parity; here: the gated real decoder and batch-shape sanity)."""

from __future__ import annotations

import pytest

from single_cell_experiments_spark.operators.multimodal import (
    _stub_meta_from_nbytes,
    decode_image_real,
)


def test_real_decoder_is_gated():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n")


def test_stub_meta_ranges():
    meta = _stub_meta_from_nbytes(12345)
    assert 1 <= meta["width"] <= 1920
    assert 1 <= meta["height"] <= 1080
    assert 1 <= meta["n_frames"] <= 30
    assert 1 <= meta["channels"] <= 3


def test_resize_dims_fit_and_preserve_aspect(spark):
    import os

    from single_cell_experiments_spark.operators.multimodal import RESIZE_FIT
    from single_cell_experiments_spark.registry import queries

    sf = os.environ.get("SCE_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = queries()["multimodal_resize_plan"](spark, sf).collect()
    assert rows
    for r in rows:
        assert max(r["out_w"], r["out_h"]) == RESIZE_FIT, "long side pinned to the target"
        assert 1 <= min(r["out_w"], r["out_h"]) <= RESIZE_FIT
        # aspect preserved under floor division
        if r["width"] >= r["height"]:
            assert r["out_h"] == max(1, r["height"] * RESIZE_FIT // r["width"])
        else:
            assert r["out_w"] == max(1, r["width"] * RESIZE_FIT // r["height"])


def test_frame_features_pool_counts_match_fanout(spark):
    import os

    from single_cell_experiments_spark.registry import queries

    sf = os.environ.get("SCE_TEST_SF_DIR", "/root/testdata/sf0.001")
    qs = queries()
    fanout = qs["multimodal_frame_sample"](spark, sf).groupBy("doc_id").count()
    pooled = qs["multimodal_frame_features"](spark, sf)
    joined = fanout.join(pooled, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["n_sampled"] == r["count"], "one feature row per sampled frame"
        assert 0 <= r["energy_max"] < 2**31
