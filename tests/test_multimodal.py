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
