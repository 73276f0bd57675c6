"""Minimal pure-Python HDF5 reader/writer — enough for 10x ``matrix.h5``.

Implemented from the public HDF5 File Format Specification (v1.10,
https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html) so the A3 ingestion
path (SURVEY.md §2.A A3) has a REAL container backend in environments
without h5py (r7 verdict #7).  This is a compatibility shim, not an HDF5
library:

Reader (``MiniH5File``) supports the subset CellRanger-v3 files use:
- superblock v0/v1 (libhdf5 default) and v2/v3 (latest-format; exercised
  by the hand-built spec fixtures in ``tests/test_minih5_v2.py``)
- object headers v1 (with continuation blocks) and v2 (``OHDR``;
  trailing checksum not verified)
- old-style groups (symbol-table message → v1 B-tree → SNODs → local
  heap) and compact new-style groups (inline Link messages)
- datatypes: fixed-point and IEEE float, any size, LE/BE
- dataspaces v1/v2 (simple, incl. rank-0 scalar)
- data layout v3: contiguous (any rank) and chunked 1-D (v1 B-tree chunk
  index) with the deflate and shuffle filters
- partial 1-D reads (``read_slice``): contiguous reads seek exactly the
  requested byte range; chunked reads touch only overlapping chunks —
  the property the executor-side CSC slice decode relies on

Anything outside the subset (dense/fractal-heap groups, layout v4,
datatype classes beyond int/float, szip...) raises ``NotImplementedError``
naming the construct, never a garbage decode.

Writer (``write_h5``) emits the smallest standard-conformant layout:
superblock v0, v1 object headers, old-style groups, contiguous 1-D
datasets — bytes any HDF5 build reads (the gated h5py interop test in
``tests/test_tenx.py`` proves it whenever h5py is present).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


# =============================== reader =====================================


class MiniH5File:
    """Read-only HDF5 file over the subset in the module docstring."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._root = self._parse_superblock()

    def close(self) -> None:
        self._f.close()

    def __enter__(self) -> "MiniH5File":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ---- low-level helpers ---------------------------------------------------

    def _read_at(self, addr: int, n: int) -> bytes:
        self._f.seek(addr)
        b = self._f.read(n)
        if len(b) != n:
            raise ValueError(f"truncated HDF5 file at offset {addr}")
        return b

    def _parse_superblock(self) -> int:
        head = self._read_at(0, 8)
        if head != _SIG:
            raise ValueError(f"{self.path}: not an HDF5 file")
        (ver,) = struct.unpack_from("<B", self._read_at(8, 1))
        if ver in (0, 1):
            b = self._read_at(8, 24)
            sz_off, sz_len = b[5], b[6]
            if (sz_off, sz_len) != (8, 8):
                raise NotImplementedError(
                    f"HDF5 offset/length sizes {sz_off}/{sz_len} unsupported (need 8/8)"
                )
            # v0: 24 fixed bytes (v1: +4) then 4 addresses then root STE
            ste_off = 8 + 16 + (4 if ver == 1 else 0) + 32
            ste = self._read_at(ste_off, 40)
            (_, ohdr_addr) = struct.unpack_from("<QQ", ste, 0)
            return ohdr_addr
        if ver in (2, 3):
            # b is offset-8-based: b[0] is the version byte itself; the
            # size-of-offsets/lengths bytes live at file offsets 9/10.
            b = self._read_at(8, 40)
            sz_off, sz_len = b[1], b[2]
            if (sz_off, sz_len) != (8, 8):
                raise NotImplementedError(
                    f"HDF5 offset/length sizes {sz_off}/{sz_len} unsupported (need 8/8)"
                )
            _base, _ext, _eof, root = struct.unpack_from("<QQQQ", b, 4)
            return root
        raise NotImplementedError(f"HDF5 superblock version {ver} unsupported")

    # ---- object headers ------------------------------------------------------

    def _messages(self, addr: int) -> list[tuple[int, bytes]]:
        """All (type, body) messages of the object header at ``addr``,
        continuation blocks followed."""
        probe = self._read_at(addr, 4)
        if probe == b"OHDR":
            return self._messages_v2(addr)
        return self._messages_v1(addr)

    def _messages_v1(self, addr: int) -> list[tuple[int, bytes]]:
        ver, _res, nmsg, _refc, hsize = struct.unpack("<BBHII", self._read_at(addr, 12))
        if ver != 1:
            raise NotImplementedError(f"object header version {ver} unsupported")
        out: list[tuple[int, bytes]] = []
        # v1 prefix is 12 bytes; messages are 8-byte aligned → 4 pad bytes.
        # nmsg counts EVERY header message — NILs and continuations
        # included — so the consumed-message counter must too, or a file
        # with continuation/NIL messages would over- or under-read.
        blocks = [(addr + 16, hsize)]
        seen = 0
        while blocks and seen < nmsg:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and seen < nmsg:
                mtype, msize, _mflags = struct.unpack("<HHB", self._read_at(pos, 5))
                body = self._read_at(pos + 8, msize)
                pos += 8 + msize
                remaining -= 8 + msize
                seen += 1
                if mtype == 0x0010:  # continuation
                    caddr, clen = struct.unpack("<QQ", body[:16])
                    blocks.append((caddr, clen))
                elif mtype != 0x0000:  # skip NIL
                    out.append((mtype, body))
        return out

    def _messages_v2(self, addr: int) -> list[tuple[int, bytes]]:
        b = self._read_at(addr, 16)
        ver, flags = b[4], b[5]
        if ver != 2:
            raise NotImplementedError(f"OHDR version {ver} unsupported")
        pos = addr + 6
        if flags & 0x20:  # timestamps present
            pos += 16
        if flags & 0x10:  # max compact/min dense
            pos += 4
        csize_width = 1 << (flags & 0x3)
        raw = self._read_at(pos, csize_width)
        chunk0 = int.from_bytes(raw, "little")
        pos += csize_width
        out: list[tuple[int, bytes]] = []
        blocks = [(pos, chunk0, False)]
        while blocks:
            bpos, blen, is_cont = blocks.pop(0)
            if is_cont:
                # OCHK blocks: signature + messages + checksum, all inside
                # the recorded length — strip both
                if self._read_at(bpos, 4) != b"OCHK":
                    raise ValueError("bad OCHK continuation signature")
                bpos += 4
                end = bpos + blen - 8  # 4 sig (stripped) + 4 checksum
            else:
                # "size of chunk 0" counts MESSAGE DATA only; the trailing
                # lookup3 checksum sits outside it (subtracting it here
                # would drop the final message)
                end = bpos + blen
            while bpos + 4 <= end:
                mtype, msize, _mflags = struct.unpack("<BHB", self._read_at(bpos, 4))
                bpos += 4
                if flags & 0x04:  # creation-order tracked
                    bpos += 2
                body = self._read_at(bpos, msize)
                bpos += msize
                if mtype == 0x10:
                    caddr, clen = struct.unpack("<QQ", body[:16])
                    blocks.append((caddr, clen, True))
                elif mtype != 0x00:  # skip NIL
                    out.append((mtype, body))
        return out

    # ---- groups --------------------------------------------------------------

    def _group_links(self, ohdr_addr: int) -> dict[str, int]:
        """name → object header address for one group."""
        links: dict[str, int] = {}
        for mtype, body in self._messages(ohdr_addr):
            if mtype == 0x0011:  # symbol table (old-style group)
                btree, heap = struct.unpack("<QQ", body[:16])
                links.update(self._walk_group_btree(btree, heap))
            elif mtype == 0x0006:  # link message (compact new-style group)
                name, target = self._parse_link(body)
                links[name] = target
            elif mtype == 0x0002:  # link info → dense group storage
                # name heap/btree addresses defined ⇒ fractal heap storage
                ver_flags = body[1]
                off = 2 + (8 if ver_flags & 0x1 else 0)
                fheap = struct.unpack("<Q", body[off : off + 8])[0]
                if fheap != _UNDEF:
                    raise NotImplementedError(
                        "dense (fractal-heap) group storage unsupported"
                    )
        return links

    def _parse_link(self, body: bytes) -> tuple[str, int]:
        ver, flags = body[0], body[1]
        if ver != 1:
            raise NotImplementedError(f"link message version {ver} unsupported")
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[pos]
            pos += 1
        if flags & 0x04:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # charset
        nlen_width = 1 << (flags & 0x3)
        nlen = int.from_bytes(body[pos : pos + nlen_width], "little")
        pos += nlen_width
        name = body[pos : pos + nlen].decode()
        pos += nlen
        if ltype != 0:
            raise NotImplementedError(f"non-hard link {name!r} unsupported")
        (addr,) = struct.unpack_from("<Q", body, pos)
        return name, addr

    def _walk_group_btree(self, btree_addr: int, heap_addr: int) -> dict[str, int]:
        heap_data_addr, heap_size = self._parse_local_heap(heap_addr)
        heap = self._read_at(heap_data_addr, heap_size)
        links: dict[str, int] = {}
        stack = [btree_addr]
        while stack:
            naddr = stack.pop()
            hdr = self._read_at(naddr, 24)
            if hdr[:4] != b"TREE":
                raise ValueError("bad group B-tree signature")
            ntype, level, nentries = hdr[4], hdr[5], struct.unpack_from("<H", hdr, 6)[0]
            if ntype != 0:
                raise ValueError("expected group B-tree (type 0)")
            # keys/children: key0, child0, key1, ... (keys 8B heap offsets)
            body = self._read_at(naddr + 24, (2 * nentries + 1) * 8)
            children = [
                struct.unpack_from("<Q", body, 8 + 16 * i)[0] for i in range(nentries)
            ]
            if level > 0:
                stack.extend(children)
                continue
            for snod_addr in children:
                sh = self._read_at(snod_addr, 8)
                if sh[:4] != b"SNOD":
                    raise ValueError("bad SNOD signature")
                nsym = struct.unpack_from("<H", sh, 6)[0]
                entries = self._read_at(snod_addr + 8, nsym * 40)
                for i in range(nsym):
                    name_off, ohdr = struct.unpack_from("<QQ", entries, 40 * i)
                    end = heap.index(b"\x00", name_off)
                    links[heap[name_off:end].decode()] = ohdr
        return links

    def _parse_local_heap(self, addr: int) -> tuple[int, int]:
        b = self._read_at(addr, 32)
        if b[:4] != b"HEAP":
            raise ValueError("bad local heap signature")
        size, _free, data_addr = struct.unpack_from("<QQQ", b, 8)
        return data_addr, size

    def _resolve(self, path: str) -> int:
        addr = self._root
        for part in path.strip("/").split("/"):
            links = self._group_links(addr)
            if part not in links:
                raise KeyError(f"{path!r}: {part!r} not found (has {sorted(links)})")
            addr = links[part]
        return addr

    # ---- datasets ------------------------------------------------------------

    def _dataset_meta(self, path: str) -> dict:
        msgs = self._messages(self._resolve(path))
        meta: dict = {"filters": []}
        for mtype, body in msgs:
            if mtype == 0x0001:
                meta["dims"] = self._parse_dataspace(body)
            elif mtype == 0x0003:
                meta["dtype"] = self._parse_datatype(body)
            elif mtype == 0x0008:
                meta.update(self._parse_layout(body))
            elif mtype == 0x000B:
                meta["filters"] = self._parse_filters(body)
        if "dims" not in meta or "dtype" not in meta or "layout" not in meta:
            raise ValueError(f"{path!r} is not a simple dataset")
        return meta

    @staticmethod
    def _parse_dataspace(body: bytes) -> tuple[int, ...]:
        ver, rank, flags = body[0], body[1], body[2]
        if ver == 1:
            off = 8
        elif ver == 2:
            off = 4
        else:
            raise NotImplementedError(f"dataspace version {ver} unsupported")
        dims = struct.unpack_from(f"<{rank}Q", body, off)
        if flags & 0x1:
            pass  # max dims present after dims — not needed
        return dims

    @staticmethod
    def _parse_datatype(body: bytes) -> np.dtype:
        cls_ver = body[0]
        cls, ver = cls_ver & 0xF, cls_ver >> 4
        if ver not in (1, 2, 3):
            raise NotImplementedError(f"datatype version {ver} unsupported")
        bits0 = body[1]
        (size,) = struct.unpack_from("<I", body, 4)
        bo = ">" if bits0 & 0x1 else "<"
        if cls == 0:  # fixed-point
            kind = "i" if bits0 & 0x08 else "u"
            return np.dtype(f"{bo}{kind}{size}")
        if cls == 1:  # IEEE float
            return np.dtype(f"{bo}f{size}")
        raise NotImplementedError(f"datatype class {cls} unsupported (int/float only)")

    @staticmethod
    def _parse_layout(body: bytes) -> dict:
        ver = body[0]
        if ver != 3:
            raise NotImplementedError(f"data layout version {ver} unsupported")
        lclass = body[1]
        if lclass == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", body, 2)
            return {"layout": "contiguous", "addr": addr, "size": size}
        if lclass == 2:  # chunked: dimensionality(1), btree addr(8), dims 4B each
            ndims = body[2]
            (btree,) = struct.unpack_from("<Q", body, 3)
            cdims = struct.unpack_from(f"<{ndims}I", body, 11)
            # last entry is the element size; the rest are chunk dims
            return {"layout": "chunked", "btree": btree, "chunk_dims": cdims[:-1]}
        raise NotImplementedError(f"data layout class {lclass} unsupported")

    @staticmethod
    def _parse_filters(body: bytes) -> list[tuple[int, tuple[int, ...]]]:
        ver, nf = body[0], body[1]
        pos = 8 if ver == 1 else 2
        out = []
        for _ in range(nf):
            (fid,) = struct.unpack_from("<H", body, pos)
            pos += 2
            if ver == 1 or fid >= 256:
                (nlen,) = struct.unpack_from("<H", body, pos)
                pos += 2
            else:
                nlen = 0
            _flags, ncv = struct.unpack_from("<HH", body, pos)
            pos += 4
            pos += nlen  # name (v1: already padded to 8)
            cvals = struct.unpack_from(f"<{ncv}I", body, pos)
            pos += 4 * ncv
            if ver == 1 and ncv % 2:
                pos += 4
            out.append((fid, cvals))
        return out

    def _decode_chunk(self, raw: bytes, filters, filter_mask: int, itemsize: int) -> bytes:
        # filters apply in reverse order on read; skip masked-out entries
        for idx in reversed(range(len(filters))):
            if filter_mask & (1 << idx):
                continue
            fid, _cvals = filters[idx]
            if fid == 1:  # deflate
                raw = zlib.decompress(raw)
            elif fid == 2:  # shuffle
                n = len(raw) // itemsize * itemsize
                arr = np.frombuffer(raw[:n], np.uint8).reshape(itemsize, n // itemsize)
                raw = arr.T.tobytes() + raw[n:]
            elif fid == 3:  # fletcher32 checksum: trailing 4 bytes
                raw = raw[:-4]
            else:
                raise NotImplementedError(f"HDF5 filter id {fid} unsupported")
        return raw

    def _chunk_index(self, btree_addr: int, rank: int) -> list[tuple[int, int, int, int]]:
        """1-D chunk index: [(start_elem, nbytes, filter_mask, addr)]."""
        out = []
        stack = [btree_addr]
        key_size = 8 + 8 * (rank + 1)
        while stack:
            naddr = stack.pop()
            hdr = self._read_at(naddr, 24)
            if hdr[:4] != b"TREE":
                raise ValueError("bad chunk B-tree signature")
            ntype, level, nentries = hdr[4], hdr[5], struct.unpack_from("<H", hdr, 6)[0]
            if ntype != 1:
                raise ValueError("expected chunk B-tree (type 1)")
            body = self._read_at(naddr + 24, nentries * (key_size + 8) + key_size)
            pos = 0
            for _ in range(nentries):
                nbytes, fmask = struct.unpack_from("<II", body, pos)
                offs = struct.unpack_from(f"<{rank}Q", body, pos + 8)
                (child,) = struct.unpack_from("<Q", body, pos + key_size)
                if level > 0:
                    stack.append(child)
                else:
                    out.append((offs[0], nbytes, fmask, child))
                pos += key_size + 8
        return out

    def dataset(self, path: str) -> np.ndarray:
        meta = self._dataset_meta(path)
        dt, dims = meta["dtype"], meta["dims"]
        # np.prod(()) == 1.0, so a rank-0 (scalar) dataspace correctly
        # reads one element and reshape(()) yields a 0-d array.
        n = int(np.prod(dims))
        if meta["layout"] == "contiguous":
            if meta["addr"] == _UNDEF:
                return np.zeros(dims, dtype=dt)
            raw = self._read_at(meta["addr"], n * dt.itemsize)
            return np.frombuffer(raw, dtype=dt).reshape(dims).copy()
        if len(dims) != 1:
            raise NotImplementedError("chunked reads implemented for 1-D datasets")
        out = np.zeros(n, dtype=dt)
        chunk_len = meta["chunk_dims"][0]
        for start, nbytes, fmask, addr in self._chunk_index(meta["btree"], 1):
            raw = self._decode_chunk(
                self._read_at(addr, nbytes), meta["filters"], fmask, dt.itemsize
            )
            vals = np.frombuffer(raw, dtype=dt)[: min(chunk_len, n - start)]
            out[start : start + len(vals)] = vals
        return out

    def read_slice(self, path: str, start: int, stop: int) -> np.ndarray:
        """1-D partial read touching only the [start, stop) byte/chunk range."""
        meta = self._dataset_meta(path)
        dt, dims = meta["dtype"], meta["dims"]
        if len(dims) != 1:
            raise NotImplementedError("read_slice is 1-D only")
        start, stop = max(0, start), min(stop, int(dims[0]))
        if stop <= start:
            return np.empty(0, dtype=dt)
        if meta["layout"] == "contiguous":
            if meta["addr"] == _UNDEF:  # never-allocated (fill-value-only)
                return np.zeros(stop - start, dtype=dt)
            raw = self._read_at(meta["addr"] + start * dt.itemsize, (stop - start) * dt.itemsize)
            return np.frombuffer(raw, dtype=dt).copy()
        out = np.zeros(stop - start, dtype=dt)
        chunk_len = meta["chunk_dims"][0]
        for cstart, nbytes, fmask, addr in self._chunk_index(meta["btree"], 1):
            if cstart + chunk_len <= start or cstart >= stop:
                continue
            raw = self._decode_chunk(
                self._read_at(addr, nbytes), meta["filters"], fmask, dt.itemsize
            )
            vals = np.frombuffer(raw, dtype=dt)
            lo = max(start, cstart)
            hi = min(stop, cstart + len(vals))
            out[lo - start : hi - start] = vals[lo - cstart : hi - cstart]
        return out


# =============================== writer =====================================


def _dtype_message(dt: np.dtype) -> bytes:
    """Datatype message body for LE int/uint/float dtypes."""
    size = dt.itemsize
    if dt.kind in ("i", "u"):
        bits0 = 0x08 if dt.kind == "i" else 0x00
        return struct.pack("<BBBBIHH", 0x10, bits0, 0, 0, size, 0, 8 * size)
    if dt.kind == "f":
        if size == 8:
            exp_loc, exp_sz, man_sz, bias, sign = 52, 11, 52, 1023, 63
        elif size == 4:
            exp_loc, exp_sz, man_sz, bias, sign = 23, 8, 23, 127, 31
        else:
            raise NotImplementedError(f"float{8 * size} write unsupported")
        return struct.pack(
            "<BBBBIHHBBBBI", 0x11, 0x20, sign, 0, size, 0, 8 * size,
            exp_loc, exp_sz, 0, man_sz, bias,
        )
    raise NotImplementedError(f"dtype {dt} write unsupported")


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _v1_header(messages: list[tuple[int, bytes]]) -> bytes:
    body = b"".join(
        struct.pack("<HHBBBB", t, len(_pad8(m)), 0, 0, 0, 0) + _pad8(m)
        for t, m in messages
    )
    return struct.pack("<BBHII", 1, 0, len(messages), 1, len(body)) + b"\x00" * 4 + body


class _Alloc:
    def __init__(self):
        self.buf = bytearray()

    def put(self, data: bytes) -> int:
        while len(self.buf) % 8:
            self.buf.append(0)
        addr = len(self.buf)
        self.buf += data
        return addr

    def reserve(self, n: int) -> int:
        return self.put(b"\x00" * n)

    def patch(self, addr: int, data: bytes) -> None:
        self.buf[addr : addr + len(data)] = data


def write_h5(
    path: str,
    groups: dict[str, dict[str, np.ndarray]],
    chunk_len: int = 0,
    gzip: int = 0,
    shuffle: bool = False,
) -> None:
    """Write ``{group_name: {dataset_name: 1-D array}}`` as a standard
    HDF5 file (superblock v0).  LE int/uint/float dtypes only — the
    CellRanger CSC triplet shape.  Default storage is contiguous;
    ``chunk_len > 0`` writes chunked 1-D datasets (v1 B-tree chunk
    index), optionally gzip-compressed and/or byte-shuffled — the layout
    real CellRanger files use, so the reader's chunked path has a
    genuine fixture generator."""
    a = _Alloc()
    base = 96  # superblock + root STE; all object addresses shift by this
    group_headers: list[tuple[str, int]] = []
    for gname, datasets in groups.items():
        ds_headers: list[tuple[str, int]] = []
        for dname, arr in datasets.items():
            # not ascontiguousarray: that promotes rank-0 (scalar) to 1-d
            arr = np.asarray(arr, order="C")
            if arr.dtype.byteorder == ">":
                arr = arr.astype(arr.dtype.newbyteorder("<"))
            msgs: list[tuple[int, bytes]] = []
            if chunk_len > 0 and arr.ndim == 1:
                msgs.append(
                    (0x0008, _write_chunked(a, arr, base, chunk_len, gzip, shuffle))
                )
                filters = b""
                nf = 0
                # odd client-value counts carry 4 pad bytes (v1 spec)
                if shuffle:
                    filters += struct.pack("<HHHHII", 2, 0, 0, 1, arr.itemsize, 0)
                    nf += 1
                if gzip:
                    filters += struct.pack("<HHHHII", 1, 0, 0, 1, gzip, 0)
                    nf += 1
                if nf:
                    msgs.append(
                        (0x000B, struct.pack("<BB", 1, nf) + b"\x00" * 6 + filters)
                    )
            else:
                data_addr = a.put(arr.tobytes())
                msgs.append(
                    (0x0008, struct.pack("<BBQQ", 3, 1, base + data_addr, arr.nbytes))
                )
            space = struct.pack("<BBBBI", 1, arr.ndim, 0, 0, 0) + b"".join(
                struct.pack("<Q", d) for d in arr.shape
            )
            fill = struct.pack("<BBBB", 2, 1, 0, 0)  # v2, undefined fill
            hdr = _v1_header(
                [(0x0001, space), (0x0003, _dtype_message(arr.dtype)), (0x0005, fill)]
                + msgs
            )
            ds_headers.append((dname, base + a.put(hdr)))
        # group addresses inside _write_group are allocator-relative: patch
        # afterwards is messy, so write groups with pre-shifted entries
        gaddr = _write_group_shifted(a, ds_headers, base)
        group_headers.append((gname, gaddr))
    root_addr = _write_group_shifted(a, group_headers, base)
    eof = base + len(a.buf)
    sb = bytearray()
    sb += _SIG
    sb += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    sb += struct.pack("<QQII", 0, root_addr, 0, 0) + b"\x00" * 16  # root STE
    assert len(sb) == 96
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(sb) + bytes(a.buf))
    os.replace(tmp, path)


def _write_chunked(
    a: _Alloc, arr: np.ndarray, base: int, chunk_len: int, gzip: int, shuffle: bool
) -> bytes:
    """Write 1-D chunks + v1 chunk B-tree leaf; return the layout message
    body (v3 class 2).  Pipeline order on write: shuffle, then deflate —
    the reader applies the inverse."""
    itemsize = arr.itemsize
    entries = []  # (start_elem, nbytes, addr)
    for start in range(0, max(len(arr), 1), chunk_len):
        chunk = arr[start : start + chunk_len]
        raw = chunk.tobytes()
        if len(chunk) and len(chunk) < chunk_len:
            # HDF5 stores full-size edge chunks (padded) when filtered
            raw += b"\x00" * ((chunk_len - len(chunk)) * itemsize)
        if shuffle:
            n = len(raw) // itemsize * itemsize
            m = np.frombuffer(raw[:n], np.uint8).reshape(n // itemsize, itemsize)
            raw = m.T.tobytes() + raw[n:]
        if gzip:
            raw = zlib.compress(raw, gzip)
        entries.append((start, len(raw), base + a.put(raw)))
    key_size = 8 + 8 * 2  # nbytes+mask, offsets (rank+1 = 2)
    bt = bytearray(b"TREE\x01\x00" + struct.pack("<H", len(entries)))
    bt += struct.pack("<QQ", _UNDEF, _UNDEF)
    for start, nbytes, addr in entries:
        bt += struct.pack("<IIQQ", nbytes, 0, start, 0) + struct.pack("<Q", addr)
    # final key: one past the last chunk
    last = entries[-1][0] + chunk_len if entries else 0
    bt += struct.pack("<IIQQ", 0, 0, last, 0)
    btree_addr = base + a.put(bytes(bt))
    return struct.pack("<BBB", 3, 2, 2) + struct.pack(
        "<QII", btree_addr, chunk_len, itemsize
    )


def _write_group_shifted(a: _Alloc, entries: list[tuple[str, int]], base: int) -> int:
    """_write_group but entry addresses are already file-absolute and the
    internal heap/snod/btree addresses must be too (shift by ``base``)."""
    entries = sorted(entries)
    if len(entries) > 8:  # one SNOD = 2·K(leaf)=8 slots; enough for CSC
        raise NotImplementedError("write_h5 supports ≤8 links per group")
    heap_data = bytearray(b"\x00" * 8)
    name_offs = []
    for name, _ in entries:
        name_offs.append(len(heap_data))
        heap_data += _pad8(name.encode() + b"\x00")
    heap_data_addr = base + a.put(bytes(heap_data))
    heap_addr = base + a.put(
        b"HEAP\x00\x00\x00\x00"
        + struct.pack("<QQQ", len(heap_data), _UNDEF, heap_data_addr)
    )
    snod = bytearray(b"SNOD\x01\x00" + struct.pack("<H", len(entries)))
    for (name, ohdr), noff in zip(entries, name_offs):
        snod += struct.pack("<QQII", noff, ohdr, 0, 0) + b"\x00" * 16
    snod += b"\x00" * (8 + 8 * 40 - len(snod))
    snod_addr = base + a.put(bytes(snod))
    btree = bytearray(b"TREE\x00\x00" + struct.pack("<H", 1))
    btree += struct.pack("<QQ", _UNDEF, _UNDEF)
    btree += struct.pack("<QQQ", 0, snod_addr, name_offs[-1] if name_offs else 0)
    btree += b"\x00" * (24 + (2 * 4 + 1) * 8 + 2 * 4 * 8 - len(btree))
    btree_addr = base + a.put(bytes(btree))
    stab = struct.pack("<QQ", btree_addr, heap_addr)
    return base + a.put(_v1_header([(0x0011, stab)]))
