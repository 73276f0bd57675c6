"""Zarr v3 read path against HAND-BUILT spec fixtures (the minih5/blosc
pattern: byte-level fixtures written from the public zarr-specs v3.0
document, independent of our own writer, anchored by published test
vectors), plus writer↔reader roundtrips and unsupported-construct guards.
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import numpy as np
import pytest

from single_cell_experiments_spark.sources.zarrv3 import (
    crc32c,
    read_zarr_v3_matrix,
    read_zarr_v3_meta,
    read_zarr_v3_vector,
    write_zarr_v3_group,
)


# --- crc32c: published vectors -------------------------------------------------


def test_crc32c_published_vectors():
    """RFC 3720 §B.4 / Castagnoli reference vectors — anchors the
    table-driven implementation independently of any fixture below."""
    assert crc32c(b"123456789") == 0xE3069283  # the universal CRC check value
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # iSCSI "all zeros" vector
    assert crc32c(b"\xff" * 32) == 0x62A8AB43  # iSCSI "all ones" vector


# --- hand-built fixtures ---------------------------------------------------------


def _meta(shape, chunks, data_type, codecs, keyenc, fill=0):
    return {
        "zarr_format": 3,
        "node_type": "array",
        "shape": shape,
        "data_type": data_type,
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": chunks}},
        "chunk_key_encoding": keyenc,
        "fill_value": fill,
        "codecs": codecs,
    }


def _write(root, name, payload: bytes):
    full = os.path.join(root, name)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(payload)


def test_1d_bigendian_gzip_v2keys_handbuilt(spark, tmp_path):
    """1-D int64 array, shape [5] chunks [2] (edge chunk padded), BIG
    endian bytes codec, gzip tail, v2-style dot chunk keys — every byte
    below is written from the spec, not by our writer."""
    root = str(tmp_path / "arr1d")
    os.makedirs(root)
    keyenc = {"name": "v2", "configuration": {"separator": "."}}
    codecs = [
        {"name": "bytes", "configuration": {"endian": "big"}},
        {"name": "gzip", "configuration": {"level": 5}},
    ]
    with open(os.path.join(root, "zarr.json"), "w") as f:
        json.dump(_meta([5], [2], "int64", codecs, keyenc), f)
    # chunk 0: [10, 11]; chunk 1: [12, 13]; chunk 2: [14, <pad 0>]
    for i, pair in enumerate([(10, 11), (12, 13), (14, 0)]):
        _write(root, str(i), gzip.compress(struct.pack(">2q", *pair), 5))
    got = {
        r.row: r.value for r in read_zarr_v3_vector(spark, root).collect()
    }
    assert got == {0: 10, 1: 11, 2: 12, 3: 13, 4: 14}  # pad trimmed


def test_2d_float32_crc32c_default_keys_handbuilt(spark, tmp_path):
    """2-D float32 shape [3, 2] chunks [2, 2], little endian, crc32c
    tail, default nested ``c/r/c`` keys — checksum computed by hand from
    the RFC algorithm the vectors above anchor."""
    root = str(tmp_path / "arr2d")
    os.makedirs(root)
    keyenc = {"name": "default", "configuration": {"separator": "/"}}
    codecs = [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "crc32c"},
    ]
    with open(os.path.join(root, "zarr.json"), "w") as f:
        json.dump(_meta([3, 2], [2, 2], "float32", codecs, keyenc, fill=0.0), f)
    c00 = struct.pack("<4f", 1.5, 2.5, 3.5, 4.5)  # rows 0-1
    c10 = struct.pack("<4f", 5.5, 6.5, 0.0, 0.0)  # row 2 + padding row
    _write(root, "c/0/0", c00 + crc32c(c00).to_bytes(4, "little"))
    _write(root, "c/1/0", c10 + crc32c(c10).to_bytes(4, "little"))
    rows = {
        r.row: list(r.values)
        for r in read_zarr_v3_matrix(spark, root).collect()
    }
    assert rows == {0: [1.5, 2.5], 1: [3.5, 4.5], 2: [5.5, 6.5]}


def test_corrupted_crc32c_rejected(spark, tmp_path):
    root = str(tmp_path / "bad")
    os.makedirs(root)
    codecs = [{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "crc32c"}]
    with open(os.path.join(root, "zarr.json"), "w") as f:
        json.dump(
            _meta([2], [2], "int32", codecs, {"name": "default", "configuration": {"separator": "/"}}),
            f,
        )
    payload = struct.pack("<2i", 7, 8)
    bad = (crc32c(payload) ^ 1).to_bytes(4, "little")
    _write(root, "c/0", payload + bad)
    with pytest.raises(Exception, match="crc32c mismatch"):
        read_zarr_v3_vector(spark, root).collect()


def test_unsupported_constructs_named(tmp_path):
    """The module contract: raise NAMING the construct, never
    garbage-decode."""
    root = str(tmp_path / "guards")
    os.makedirs(root)

    def put(meta):
        with open(os.path.join(root, "zarr.json"), "w") as f:
            json.dump(meta, f)

    keyenc = {"name": "default", "configuration": {"separator": "/"}}
    bytes_c = [{"name": "bytes", "configuration": {"endian": "little"}}]
    put(_meta([2], [2], "complex64", bytes_c, keyenc))
    with pytest.raises(NotImplementedError, match="complex64"):
        read_zarr_v3_meta(root)
    put(_meta([2], [2], "int32", bytes_c + [{"name": "sharding_indexed"}], keyenc))
    with pytest.raises(NotImplementedError, match="sharding_indexed"):
        read_zarr_v3_meta(root)
    put(
        _meta(
            [2, 2],
            [2, 2],
            "int32",
            [{"name": "transpose", "configuration": {"order": [1, 0]}}] + bytes_c,
            keyenc,
        )
    )
    with pytest.raises(NotImplementedError, match="transpose"):
        read_zarr_v3_meta(root)
    put(_meta([2], [2], "int32", bytes_c, {"name": "morton"}))
    with pytest.raises(NotImplementedError, match="morton"):
        read_zarr_v3_meta(root)
    # exactly one bytes codec is a hard spec requirement
    put(_meta([2], [2], "int32", [], keyenc))
    with pytest.raises(ValueError, match="exactly one 'bytes'"):
        read_zarr_v3_meta(root)


def test_identity_transpose_and_nan_fill_accepted(tmp_path, spark):
    """zarr-python writes an identity transpose for C-order arrays and
    string fill values for float NaN — both must parse."""
    root = str(tmp_path / "ok")
    os.makedirs(root)
    keyenc = {"name": "default", "configuration": {"separator": "/"}}
    codecs = [
        {"name": "transpose", "configuration": {"order": [0]}},
        {"name": "bytes", "configuration": {"endian": "little"}},
    ]
    with open(os.path.join(root, "zarr.json"), "w") as f:
        json.dump(_meta([2], [2], "float64", codecs, keyenc, fill="NaN"), f)
    _write(root, "c/0", struct.pack("<2d", 0.25, -0.75))
    meta = read_zarr_v3_meta(root)
    assert np.isnan(meta["fill_value"])
    got = {r.row: r.value for r in read_zarr_v3_vector(spark, root).collect()}
    assert got == {0: 0.25, 1: -0.75}


# --- writer ↔ reader -------------------------------------------------------------


def test_v3_write_read_roundtrip_blosc(spark, tmp_path):
    """Writer output read back bit-exactly through the blosc+crc32c
    default chain, including the 2-D edge chunk on both axes."""
    import pandas as pd

    n, dim = 10, 5
    rng = np.random.default_rng(7)
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(map(list, emb))})
    )
    root = str(tmp_path / "store")
    info = write_zarr_v3_group(df, root, rows_per_chunk=4, cols_per_chunk=3)
    assert info["shape"] == [n, dim]
    assert info["n_chunks"] == 3 * 2  # ceil(10/4) x ceil(5/3)
    x = read_zarr_v3_matrix(spark, os.path.join(root, "X"))
    ids = read_zarr_v3_vector(spark, os.path.join(root, "vec_id"))
    assert {r.row: r.value for r in ids.collect()} == {i: i for i in range(n)}
    from collections import defaultdict

    slices = defaultdict(dict)
    for r in x.collect():
        slices[r.row][r.col0] = list(r.values)
    got = np.array(
        [sum((slices[i][c] for c in sorted(slices[i])), []) for i in range(n)],
        dtype=np.float32,
    )
    assert np.array_equal(got, emb)
