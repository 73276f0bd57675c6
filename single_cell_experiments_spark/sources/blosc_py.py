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

Codec support: **lz4** (pure-Python block decoder below — the zarr-python
default cname), **zlib** (stdlib), **memcpy**.  zstd / snappy / blosclz
raise a clear error naming the codec (no stdlib decoder exists; install
the native codec or re-write the store).  Bit-shuffle raises likewise.

Performance: this is a COMPATIBILITY fallback, not a fast path — the
pure-Python LZ4 loop is ~1000× slower than native blosc.  Production
clusters ship the native library; this module's job is that a reference
user's default store opens at all, decoded correctly, in a bare
container.  The encoder emits spec-valid chunks (used by the Zarr write
path and the roundtrip tests): zlib-codec splits, or lz4-codec chunks
with stored-raw splits (valid output any real blosc build decodes — raw
storage is what c-blosc itself falls back to, so ratio-1 is legal).
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
    if codec not in (_CODEC_LZ4, _CODEC_ZLIB):
        raise NotImplementedError(
            f"blosc codec {_CODEC_NAMES.get(codec, codec)!r} needs the native library "
            "(lz4/zlib decode in pure Python here)"
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
    stores every split RAW under the lz4 codec id (legal — c-blosc stores
    incompressible splits raw — so real blosc builds decode it; there is
    no pure-Python lz4 encoder here).  ``blocksize=0`` → one block.
    """
    nbytes = len(data)
    if typesize <= 0 or (nbytes and nbytes % typesize):
        raise ValueError(f"nbytes {nbytes} not a multiple of typesize {typesize}")
    codec = {"zlib": _CODEC_ZLIB, "lz4": _CODEC_LZ4, "memcpy": None}.get(cname, -1)
    if codec == -1:
        raise NotImplementedError(f"blosc_py cannot encode cname {cname!r}")
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
                if len(comp) >= esize:
                    comp = bytes(split)  # stored
            else:  # lz4: stored splits only (see docstring)
                comp = bytes(split)
            payload += struct.pack("<i", len(comp)) + comp
    cbytes = payload_start + len(payload)
    header = struct.pack("<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, cbytes)
    return header + struct.pack(f"<{nblocks}i", *bstarts) + payload
