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
        decode_image_real(b"\xff\xd8\xff\xe0 jpeg bytes")  # JPEG needs PIL
    # a PNG variant outside the stdlib decoder's subset (16-bit) must hit
    # the same gate, not decode garbage
    import struct
    import zlib

    from single_cell_experiments_spark.operators.multimodal import _PNG_SIG

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError):
        decode_image_real(_PNG_SIG + chunk)


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


def test_bmp_encode_decode_identity():
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        decode_image_real,
        encode_bmp,
    )

    rng = np.random.default_rng(23)
    for h, w in ((1, 1), (3, 5), (16, 7), (10, 10)):  # odd widths force padding
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        meta = decode_image_real(encode_bmp(px))
        assert (meta["width"], meta["height"], meta["channels"]) == (w, h, 3)
        np.testing.assert_array_equal(meta["pixels"], px)


def test_ppm_decode_known_bytes():
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import decode_image_real

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = b"P6\n# comment\n3 2\n255\n" + px.tobytes()
    meta = decode_image_real(blob)
    assert (meta["width"], meta["height"]) == (3, 2)
    np.testing.assert_array_equal(meta["pixels"], px)


def test_real_decode_runs_distributed_over_bmp_blobs(spark):
    """The REAL decode path through the full Spark plumbing: generated BMP
    blobs → mapInPandas decode → dimensions + exact pixel sums match
    numpy.  This is the swap-in the stub documents, executed for real."""
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        encode_bmp,
        real_decode_meta,
    )

    rng = np.random.default_rng(29)
    imgs = {i: rng.integers(0, 256, (4 + i, 7 + i, 3), dtype=np.uint8) for i in range(8)}
    rows = [(i, bytearray(encode_bmp(px))) for i, px in imgs.items()]
    blobs = spark.createDataFrame(rows, "doc_id long, blob binary").repartition(4)
    got = {int(r["doc_id"]): r for r in real_decode_meta(blobs).collect()}
    assert got.keys() == imgs.keys()
    for i, px in imgs.items():
        r = got[i]
        assert (int(r["width"]), int(r["height"]), int(r["channels"])) == (
            px.shape[1],
            px.shape[0],
            3,
        )
        assert int(r["sum_px"]) == int(px.sum(dtype="int64"))


def test_real_decode_pil_parity():
    """Gated: where PIL exists, its BMP decode must agree with the pure
    numpy one (authoritative cross-check of the format implementation)."""
    import numpy as np
    import pytest

    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from single_cell_experiments_spark.operators.multimodal import (
        decode_image_real,
        encode_bmp,
    )

    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    ours = decode_image_real(blob)["pixels"]
    theirs = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    np.testing.assert_array_equal(ours, theirs)
    np.testing.assert_array_equal(ours, px)


def test_wav_encode_decode_identity():
    """PCM16 WAV roundtrip through the stdlib encoder/decoder, including
    stereo and negative samples."""
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        decode_audio_real,
        encode_wav,
    )

    rng = np.random.default_rng(31)
    mono = rng.integers(-32768, 32768, (240, 1), dtype=np.int16)
    stereo = rng.integers(-32768, 32768, (100, 2), dtype=np.int16)
    for samples, ch, fr in ((mono, 1, 16000), (stereo, 2, 44100)):
        blob = encode_wav(samples, framerate=fr, channels=ch)
        m = decode_audio_real(blob)
        assert (m["channels"], m["framerate"], m["n_frames"]) == (
            ch,
            fr,
            samples.shape[0],
        )
        assert (m["samples"] == samples).all()


def test_audio_decoder_is_gated():
    from single_cell_experiments_spark.operators.multimodal import decode_audio_real

    with pytest.raises(NotImplementedError):
        decode_audio_real(b"ID3\x04rest-of-an-mp3")
    # float-WAV (sampwidth 4) also gates rather than garbage-decoding
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 8)
    with pytest.raises(NotImplementedError):
        decode_audio_real(buf.getvalue())


def test_real_audio_runs_distributed_over_wav_blobs(spark):
    """The REAL audio path through the full Spark plumbing: generated WAV
    blobs → mapInPandas decode → format meta + exact loudness stats match
    numpy — the audio twin of the BMP test above."""
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        encode_wav,
        real_audio_meta,
    )

    rng = np.random.default_rng(37)
    clips = {
        i: rng.integers(-32768, 32768, (50 + 10 * i, 1 + i % 2), dtype=np.int16)
        for i in range(8)
    }
    rows = [
        (i, bytearray(encode_wav(s, framerate=8000 * (1 + i % 3), channels=s.shape[1])))
        for i, s in clips.items()
    ]
    blobs = spark.createDataFrame(rows, "doc_id long, blob binary").repartition(4)
    got = {int(r["doc_id"]): r for r in real_audio_meta(blobs).collect()}
    assert got.keys() == clips.keys()
    for i, s in clips.items():
        r = got[i]
        assert int(r["channels"]) == s.shape[1]
        assert int(r["framerate"]) == 8000 * (1 + i % 3)
        assert int(r["n_frames"]) == s.shape[0]
        assert int(r["sum_abs"]) == int(abs(s.astype("int64")).sum())
        assert int(r["peak"]) == int(abs(s.astype("int64")).max())


def test_png_encode_decode_identity_all_filters():
    """PNG roundtrip through the stdlib codec: every spec filter type
    (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) applied at encode must
    unfilter back to the exact pixels, across gray/gray+alpha/RGB/RGBA
    and shapes that stress the left-neighbor edge (w=1) and row
    recurrences."""
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        decode_image_real,
        encode_png,
    )

    rng = np.random.default_rng(37)
    for c in (1, 2, 3, 4):
        for h, w in ((1, 1), (5, 1), (4, 7), (11, 13)):
            px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            for ft in range(5):
                meta = decode_image_real(encode_png(px, filter_type=ft))
                assert (meta["width"], meta["height"], meta["channels"]) == (w, h, c)
                np.testing.assert_array_equal(
                    meta["pixels"], px, err_msg=f"c={c} h={h} w={w} filter={ft}"
                )


def test_png_decode_2d_gray_input():
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        decode_image_real,
        encode_png,
    )

    px = np.arange(12, dtype=np.uint8).reshape(3, 4)  # 2-D gray
    meta = decode_image_real(encode_png(px, filter_type=4))
    assert (meta["width"], meta["height"], meta["channels"]) == (4, 3, 1)
    np.testing.assert_array_equal(meta["pixels"][:, :, 0], px)


def test_png_pil_parity():
    """Gated: where PIL exists, its PNG decode must agree with the stdlib
    one, and it must open our encoder's output (authoritative format
    check)."""
    import numpy as np

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from single_cell_experiments_spark.operators.multimodal import (
        decode_image_real,
        encode_png,
    )

    rng = np.random.default_rng(41)
    px = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    blob = encode_png(px, filter_type=4)
    theirs = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    np.testing.assert_array_equal(decode_image_real(blob)["pixels"], theirs)
    # and our decoder on PIL-written bytes
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    np.testing.assert_array_equal(decode_image_real(buf.getvalue())["pixels"], px)


def test_real_decode_runs_distributed_over_png_blobs(spark):
    """The PNG real-decode path through the full Spark plumbing, mirroring
    the BMP twin: generated PNG blobs (mixed filter types) → mapInPandas
    decode → dimensions + exact pixel sums match numpy."""
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        encode_png,
        real_decode_meta,
    )

    rng = np.random.default_rng(43)
    imgs = {i: rng.integers(0, 256, (4 + i, 7 + i, 3), dtype=np.uint8) for i in range(8)}
    rows = [(i, bytearray(encode_png(px, filter_type=i % 5))) for i, px in imgs.items()]
    blobs = spark.createDataFrame(rows, "doc_id long, blob binary").repartition(4)
    got = {int(r["doc_id"]): r for r in real_decode_meta(blobs).collect()}
    assert got.keys() == imgs.keys()
    for i, px in imgs.items():
        r = got[i]
        assert (int(r["width"]), int(r["height"]), int(r["channels"])) == (
            px.shape[1],
            px.shape[0],
            3,
        )
        assert int(r["sum_px"]) == int(px.sum(dtype="int64"))


def test_dhash_is_computed_from_decoded_pixels(spark):
    """The dHash must be a function of the DECODED image, not the doc id:
    perturbing one pixel before encode flips the corresponding comparison
    bit, and the registered query's buckets partition doc_ids by
    doc_id % 16 with a min keeper."""
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        _DHASH_GROUPS,
        _H_MOD,
        _H_MULT,
        _decode_bmp,
        encode_bmp,
        multimodal_image_dhash_dedup,
    )
    from tests.conftest import SF_DIR

    i_idx, j_idx = np.meshgrid(np.arange(8), np.arange(9), indexing="ij")

    def bits_of(img):
        gray = _decode_bmp(encode_bmp(img))["pixels"][:, :, 0].astype(np.int64)
        return tuple((gray[:, :8] < gray[:, 1:]).astype(int).reshape(-1))

    v = ((((3 * 31 + i_idx * 7 + j_idx * 13) * _H_MULT) % _H_MOD) // 8192) % 256
    img = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
    b0 = bits_of(img)
    img2 = img.copy()
    img2[0, 0, :] = 255 - img2[0, 0, :]  # flip one pixel hard
    assert bits_of(img2) != b0, "hash ignored the decoded pixels"

    rows = multimodal_image_dhash_dedup(spark, SF_DIR).collect()
    assert rows
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault((int(r.dhash_hi), int(r.dhash_lo)), []).append(r)
    assert len(by_bucket) <= _DHASH_GROUPS
    for members in by_bucket.values():
        ids = sorted(int(m.doc_id) for m in members)
        assert {int(m.keeper) for m in members} == {ids[0]}
        assert all(int(m.n_bucket) == len(members) for m in members)
        # buckets are unions of whole doc_id%16 groups (perceptual
        # collisions may merge two formula groups — that IS the point)
        groups = {i % _DHASH_GROUPS for i in ids}
        assert all((int(m.doc_id) % _DHASH_GROUPS) in groups for m in members)
    assert len(by_bucket) >= 2, "hash degenerated to one bucket"


def test_audio_fp_from_decoded_samples_and_buckets(spark):
    """The audio fingerprint must be a function of the DECODED samples
    (amplifying one frame flips its energy-contour bits), and the
    registered query forms >= 2 buckets with consistent keeper/size."""
    import numpy as np

    from single_cell_experiments_spark.operators.multimodal import (
        _H_MOD,
        _H_MULT,
        decode_audio_real,
        encode_wav,
        multimodal_audio_fp_dedup,
    )
    from tests.conftest import SF_DIR

    t = np.arange(64, dtype=np.int64)
    noise = ((((t * 11 + 7) * _H_MULT) % _H_MOD) // 8192) % 256 - 128

    def fp_of(s):
        sam = decode_audio_real(encode_wav(s.astype("<i2")))["samples"][:, 0].astype(
            np.int64
        )
        e = (sam.reshape(8, 8) ** 2).sum(axis=1)
        return tuple((e[:-1] < e[1:]).astype(int))

    amp = 1 + ((((2 * 53 + (t // 8) * 29) * _H_MULT) % _H_MOD) // 8192) % 8
    s0 = noise * amp
    s1 = s0.copy()
    s1[16:24] = 0  # silence frame 2: the e1<e2 comparison must flip
    assert fp_of(s1) != fp_of(s0), "fingerprint ignored the decoded samples"

    rows = multimodal_audio_fp_dedup(spark, SF_DIR).collect()
    assert rows
    buckets = {}
    for r in rows:
        buckets.setdefault(int(r.afp), []).append(r)
    assert len(buckets) >= 2
    for members in buckets.values():
        ids = sorted(int(m.doc_id) for m in members)
        assert {int(m.keeper) for m in members} == {ids[0]}
        assert all(int(m.n_bucket) == len(members) for m in members)
