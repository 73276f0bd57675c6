"""Multimodal (binary) column handling (north-star block; absent in the
reference — the closest analogue is its 10x HDF5 byte-level ingest,
SURVEY.md §2.A A3 [M]).

Media bytes are modeled as opaque ``binary`` columns with typed metadata —
here stood in by ``encode(documents.text, 'utf-8')`` since the driver
tables carry no real media.  What is REAL and verified:

- the Spark-side plumbing: binary schema, Arrow ``mapInPandas`` decode with
  a bounded batch size, metadata projection, frame explode, resize-dim
  planning, and per-frame featurize→per-doc pool;
- the determinism contract: the stub decoder derives metadata from integer
  hash arithmetic that the DuckDB oracle reproduces exactly — so even the
  Python-UDF path is value-hash-checked, not just smoke-checked.

What is REAL in-container beyond the plumbing: uncompressed 24-bpp BMP and
binary PPM image decode (pure numpy, ``decode_image_real``) and PCM16 WAV
audio decode (stdlib ``wave`` + numpy, ``decode_audio_real``) — both
exercised end-to-end on generated fixtures.  What is STUBBED: every
compressed format (PNG/JPEG via PIL, MP3/OGG/FLAC via soundfile — the
container ships no media libs; each raises a clear gate error).  Swapping
in a library decoder changes only the per-batch pandas function body;
schema, partitioning and batch shape stay as tested here.

Scale: decode is embarrassingly parallel (``mapInPandas``, no shuffle);
metadata aggregation shuffles only O(docs) small rows.  For 100 TB media,
bytes live in object storage and the binary column holds (uri, offset,
length) — the decode UDF shape is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..catalog import load_table
from ..registry import query

#: Knuth multiplicative hash constant; all stub metadata derives from it.
_H_MULT = 2654435761
_H_MOD = 2147483648  # 2^31


def _stub_meta_from_nbytes(n_bytes):
    """width/height/n_frames/channels from the byte length — pure integer
    arithmetic, reproduced verbatim in the SQL oracles below."""
    h = (n_bytes * _H_MULT) % _H_MOD
    return {
        "width": h % 1920 + 1,
        "height": (h // 1920) % 1080 + 1,
        "n_frames": h % 30 + 1,
        "channels": n_bytes % 3 + 1,
    }


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("channels", LongType()),
    ]
)


def _decode_stub_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched stub decoder: bytes -> fake media metadata.

    A real decoder replaces the arithmetic with PIL/ffmpeg calls on
    ``blob``; everything else (batch iteration, output schema) is the
    production shape.
    """
    for pdf in batches:
        n_bytes = pdf["blob"].map(len).astype("int64")
        meta = _stub_meta_from_nbytes(n_bytes)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "width": meta["width"],
                "height": meta["height"],
                "n_frames": meta["n_frames"],
                "channels": meta["channels"],
            }
        )


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode("text", "utf-8").alias("blob"))


# --- binary metadata (no UDF) ------------------------------------------------

_BLOB_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS md5_hex,
       sha256(text) AS sha256_hex,
       lower(substr(hex(encode(text)), 1, 16)) AS head8_hex
FROM documents
"""


@query("multimodal_blob_meta", oracle=_BLOB_META_ORACLE, tags=("multimodal", "binary"))
def multimodal_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column — byte length, content
    hashes (the media-dedup keys), leading magic bytes — all JVM built-ins,
    no Python.  This is the "catalog scan" of a multimodal lake: cheap,
    pushdown-friendly, hash-addressable."""
    b = _blobs(spark, sf_dir)
    return b.select(
        "doc_id",
        F.octet_length("blob").cast("bigint").alias("n_bytes"),
        F.md5("blob").alias("md5_hex"),
        F.sha2("blob", 256).alias("sha256_hex"),
        F.lower(F.substring(F.hex("blob"), 1, 16)).alias("head8_hex"),
    )


# --- stub decode via mapInPandas (hash-checked Python path) ------------------

_DECODE_ORACLE = f"""
SELECT doc_id,
       n_bytes,
       h % 1920 + 1 AS width,
       (h // 1920) % 1080 + 1 AS height,
       h % 30 + 1 AS n_frames,
       n_bytes % 3 + 1 AS channels
FROM (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(octet_length(encode(text)) AS BIGINT) * {_H_MULT} % {_H_MOD} AS h
  FROM documents
)
"""


@query("multimodal_decode_stub", oracle=_DECODE_ORACLE, tags=("multimodal", "udf"))
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode as an Arrow-batched ``mapInPandas`` over the binary
    column — the real decode execution shape (schema, batching,
    partition-parallel, no shuffle) with a deterministic stub body, so the
    Python path itself is oracle-verified rather than smoke-checked."""
    return _blobs(spark, sf_dir).mapInPandas(_decode_stub_batches, schema=_DECODE_SCHEMA)


# --- frame sampling on top of decoded metadata -------------------------------

_FRAME_ORACLE = f"""
WITH meta AS (
  SELECT doc_id, h % 30 + 1 AS n_frames
  FROM (SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) * {_H_MULT} % {_H_MOD} AS h
        FROM documents)
)
SELECT doc_id, CAST(unnest(range(0, n_frames, 5)) AS BIGINT) AS frame_idx,
       CAST(n_frames AS BIGINT) AS n_frames
FROM meta
"""


@query("multimodal_frame_sample", oracle=_FRAME_ORACLE, tags=("multimodal", "frames"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-5th-frame sampling: decoded frame counts explode into
    (doc_id, frame_idx) work units — the fan-out that feeds per-frame
    feature extraction.  Row-local ``sequence``+``explode``, no shuffle;
    at scale this is where you'd repartition by bytes to balance decode
    cost."""
    b = _blobs(spark, sf_dir)
    h = (F.octet_length("blob").cast("bigint") * _H_MULT) % _H_MOD
    frames = b.select("doc_id", (h % 30 + 1).cast("bigint").alias("n_frames"))
    return frames.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1, F.lit(5).cast("bigint"))).alias(
            "frame_idx"
        ),
        "n_frames",
    )


# --- resize planning via mapInPandas (hash-checked Python path) --------------

RESIZE_FIT = 224  # standard vision-model preprocess target (max side)

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
    ]
)


def _resize_stub_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched resize planner: stub-decoded (width, height) ->
    aspect-preserving dims fitting RESIZE_FIT on the long side, floor
    division so both engines agree bit-for-bit.  A real implementation
    replaces the dim arithmetic with ``img.resize((out_w, out_h))`` on the
    decoded pixels; batch iteration and schema are the production shape.
    """
    for pdf in batches:
        n_bytes = pdf["blob"].map(len).astype("int64")
        meta = _stub_meta_from_nbytes(n_bytes)
        w, h = meta["width"], meta["height"]
        wide = w >= h
        out_w = wide * RESIZE_FIT + (~wide) * (w * RESIZE_FIT // h).clip(lower=1)
        out_h = (~wide) * RESIZE_FIT + wide * (h * RESIZE_FIT // w).clip(lower=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": w,
                "height": h,
                "out_w": out_w.astype("int64"),
                "out_h": out_h.astype("int64"),
            }
        )


_RESIZE_ORACLE = f"""
WITH meta AS (
  SELECT doc_id, h % 1920 + 1 AS width, (h // 1920) % 1080 + 1 AS height
  FROM (SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) * {_H_MULT} % {_H_MOD} AS h
        FROM documents)
)
SELECT doc_id, width, height,
       CASE WHEN width >= height THEN {RESIZE_FIT}
            ELSE greatest(width * {RESIZE_FIT} // height, 1) END AS out_w,
       CASE WHEN width >= height THEN greatest(height * {RESIZE_FIT} // width, 1)
            ELSE {RESIZE_FIT} END AS out_h
FROM meta
"""


@query("multimodal_resize_plan", oracle=_RESIZE_ORACLE, tags=("multimodal", "udf"))
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize to fit 224 on the long side, as an
    Arrow-batched ``mapInPandas`` over the binary column — the standard
    vision-preprocess step with the decode stubbed but the Python batch
    path itself oracle-verified (integer floor arithmetic both engines
    reproduce).  Embarrassingly parallel, no shuffle; real pixels change
    only the pandas function body."""
    return _blobs(spark, sf_dir).mapInPandas(_resize_stub_batches, schema=_RESIZE_SCHEMA)


# --- per-frame feature extraction + per-doc aggregation ----------------------

_FEAT_K1, _FEAT_K2 = 2654435761, 40503  # independent Knuth-style mixers

_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("energy", LongType()),
    ]
)


def _frame_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched per-frame "feature extractor": a deterministic integer
    energy per (doc, frame) standing in for a conv/fft feature — a real
    extractor decodes the frame bytes instead; the fan-out input, batch
    shape, and per-frame output schema are the production contract."""
    for pdf in batches:
        energy = (
            pdf["doc_id"].astype("int64") * _FEAT_K1 + pdf["frame_idx"].astype("int64") * _FEAT_K2
        ) % _H_MOD
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "frame_idx": pdf["frame_idx"].astype("int64"),
                "energy": energy,
            }
        )


_FEAT_ORACLE = f"""
WITH meta AS (
  SELECT doc_id, h % 30 + 1 AS n_frames
  FROM (SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) * {_H_MULT} % {_H_MOD} AS h
        FROM documents)
),
frames AS (
  SELECT doc_id, unnest(range(0, n_frames, 5)) AS frame_idx FROM meta
)
SELECT doc_id,
       COUNT(*) AS n_sampled,
       CAST(SUM((doc_id * {_FEAT_K1} + frame_idx * {_FEAT_K2}) % {_H_MOD}) AS BIGINT)
         AS energy_sum,
       CAST(MAX((doc_id * {_FEAT_K1} + frame_idx * {_FEAT_K2}) % {_H_MOD}) AS BIGINT)
         AS energy_max
FROM frames
GROUP BY doc_id
"""


@query("multimodal_frame_features", oracle=_FEAT_ORACLE, tags=("multimodal", "udf", "frames"))
def multimodal_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame feature extraction over the frame-sample fan-out
    (``mapInPandas``, one feature row per sampled frame) followed by a
    JVM-side per-document aggregation — the decode→featurize→pool shape of
    every video/audio ingestion pipeline, with the extractor stubbed
    deterministic so the whole two-stage path hash-checks.  The UDF is
    shuffle-free; the only exchange is the final O(docs) aggregation."""
    frames = multimodal_frame_sample(spark, sf_dir).select("doc_id", "frame_idx")
    feats = frames.mapInPandas(_frame_feature_batches, schema=_FEAT_SCHEMA)
    return feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("energy").cast("bigint").alias("energy_sum"),
        F.max("energy").cast("bigint").alias("energy_max"),
    )


# --- real decoder (pure-numpy BMP/PPM; PIL for everything else) --------------

def encode_bmp(pixels) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bpp BMP bytes (BITMAPINFOHEADER,
    bottom-up rows padded to 4 bytes) — the fixture generator for the real
    decode path; any image viewer/PIL opens the output."""
    import struct

    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body += px[r, :, ::-1].tobytes()  # BGR order
        body += b"\x00" * pad
    pixel_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + dib + bytes(body)


def _decode_bmp(blob: bytes) -> dict:
    import struct

    import numpy as np

    pixel_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP decode supports uncompressed 24-bpp (got bpp={bpp}, "
            f"compression={compression}) — use PIL for other variants"
        )
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for r in range(h):
        src = pixel_off + r * stride
        line = np.frombuffer(blob, np.uint8, row, src).reshape(w, 3)[:, ::-1]  # BGR→RGB
        out[h - 1 - r if bottom_up else r] = line
    return {"width": w, "height": h, "channels": 3, "pixels": out}


def _decode_ppm(blob: bytes) -> dict:
    """Binary PPM (P6), maxval ≤ 255."""
    import numpy as np

    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":  # comment line
            i = blob.index(b"\n", i) + 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        fields.append(blob[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise NotImplementedError("PPM decode supports maxval <= 255")
    px = np.frombuffer(blob, np.uint8, w * h * 3, i).reshape(h, w, 3)
    return {"width": w, "height": h, "channels": 3, "pixels": px.copy()}


# --- PNG (stdlib zlib + spec filters — the most common real format that
# needs no third-party dep; r12 verdict #5) -------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channel count for the 8-bit non-palette types we decode.
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """uint8 pixel array ((h, w) gray, (h, w, 1/2/3/4)) → 8-bit
    non-interlaced PNG bytes (IHDR/IDAT/IEND, zlib level 6) — the fixture
    generator for the real decode path; any viewer/PIL opens the output.
    ``filter_type`` applies one spec filter (0–4) to EVERY row so tests
    can roundtrip each unfilter branch against known pixels (real encoders
    pick per-row; the decode side never assumes uniformity)."""
    import struct
    import zlib

    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if filter_type not in range(5):
        raise ValueError(f"PNG filter type {filter_type} not in 0..4")

    lines = px.reshape(h, w * c).astype(np.int32)
    prev = np.zeros(w * c, dtype=np.int32)
    raw = bytearray()
    for r in range(h):
        cur = lines[r]
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]]) if w * c > c else np.zeros_like(cur)
        upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]]) if w * c > c else np.zeros_like(cur)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        raw.append(filter_type)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _decode_png(blob: bytes) -> dict:
    """8-bit non-interlaced gray / gray+alpha / RGB / RGBA PNG in pure
    stdlib zlib + numpy: chunk walk → concatenated-IDAT inflate → per-row
    unfilter (all five spec filters; Up/None are vectorized, Sub/Average/
    Paeth run the spec recurrence per row — each byte depends on the
    already-reconstructed left neighbor, so the loop is inherent, and at
    pipeline scale rows decode in parallel across documents anyway).
    Palette, 16-bit, and interlaced variants raise the PIL gate error."""
    import struct
    import zlib

    import numpy as np

    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0 or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"PNG decode supports 8-bit non-interlaced gray/RGB/alpha (got "
            f"depth={depth}, color_type={color_type}, interlace={interlace})"
            " — use PIL for palette/16-bit/interlaced variants"
        )
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload has wrong length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, r * (stride + 1) + 1).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub
            cur = line
            for i in range(c, stride):
                cur[i] = (cur[i] + cur[i - c]) & 0xFF
        elif ft == 3:  # Average
            cur = line
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG row filter {ft} not in spec range 0..4")
        out[r] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, c)
    return {"width": w, "height": h, "channels": c, "pixels": px}


_REAL_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("sum_px", LongType()),
    ]
)


def real_decode_meta(blobs: DataFrame) -> DataFrame:
    """REAL image decode over a ``(doc_id, blob)`` DataFrame via
    ``mapInPandas`` — identical plumbing (schema, Arrow batching,
    zero-shuffle) to the oracle-checked ``multimodal_decode_stub``, but
    the batch body runs ``decode_image_real`` on genuine image bytes
    (BMP/PPM in-env, PIL formats where installed) and emits dimensions
    plus the exact integer pixel sum (the deterministic stand-in for a
    feature vector).  Tested end-to-end on generated BMP fixtures in
    ``tests/test_multimodal.py`` — the decode step is no longer
    stub-only in this container."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_real(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                    "sum_px": [int(m["pixels"].sum(dtype="int64")) for m in metas],
                }
            )

    return blobs.mapInPandas(_batches, schema=_REAL_DECODE_SCHEMA)


def decode_image_real(blob: bytes) -> dict:
    """Real image decode.  Uncompressed 24-bpp BMP, binary PPM (P6), and
    8-bit non-interlaced PNG (gray/RGB/±alpha — stdlib zlib inflate +
    spec unfiltering incl. Paeth) decode with zero third-party
    dependencies, so the swap-in point is exercised end-to-end in this
    container (see ``tests/test_multimodal.py``); every other format
    (JPEG/palette-PNG/...) needs PIL and raises a clear gate error
    without it.  Returns ``{width, height, channels, pixels}``
    (pixels = (h, w, c) uint8)."""
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:2] == b"P6":
        return _decode_ppm(blob)
    if blob[: len(_PNG_SIG)] == _PNG_SIG:
        try:
            return _decode_png(blob)
        except NotImplementedError:
            pass  # palette/16-bit/interlaced → fall through to the PIL gate
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "decoding non-BMP/PPM images requires Pillow (BMP and binary "
            "PPM decode here in pure numpy)"
        ) from exc
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(blob))
    return {
        "width": img.width,
        "height": img.height,
        "channels": len(img.getbands()),
        "pixels": np.asarray(img),
    }


# --- real audio decode (WAV PCM, stdlib-only) ---------------------------------

def encode_wav(samples, framerate: int = 16000, channels: int = 1) -> bytes:
    """int16 sample array → PCM16 WAV bytes via the stdlib ``wave``
    module — the audio fixture generator (any player/soundfile opens the
    output), mirroring ``encode_bmp`` for images."""
    import io
    import wave

    import numpy as np

    s = np.ascontiguousarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_audio_real(blob: bytes) -> dict:
    """Real audio decode.  PCM16 WAV decodes with the stdlib ``wave``
    module + numpy (zero external dependencies — the audio analogue of
    the BMP/PPM image path, so the swap-in point is exercised end-to-end
    in this container); compressed formats (MP3/OGG/FLAC/float WAV)
    need soundfile/librosa and raise a clear gate error without them.
    Returns ``{channels, framerate, n_frames, samples}`` with samples a
    (frames, channels) int16 array."""
    import io
    import wave

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise NotImplementedError(
            "decoding non-WAV audio requires soundfile/librosa "
            "(PCM16 WAV decodes here via the stdlib wave module)"
        )
    with wave.open(io.BytesIO(blob), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"WAV decode supports PCM16 (got sampwidth={w.getsampwidth()})"
            )
        ch, fr, n = w.getnchannels(), w.getframerate(), w.getnframes()
        raw = w.readframes(n)
    samples = np.frombuffer(raw, dtype="<i2").reshape(n, ch)
    return {"channels": ch, "framerate": fr, "n_frames": n, "samples": samples}


_REAL_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("channels", LongType()),
        StructField("framerate", LongType()),
        StructField("n_frames", LongType()),
        StructField("sum_abs", LongType()),
        StructField("peak", LongType()),
    ]
)


def real_audio_meta(blobs: DataFrame) -> DataFrame:
    """REAL audio decode over a ``(doc_id, blob)`` DataFrame via
    ``mapInPandas`` — identical plumbing to ``real_decode_meta`` (Arrow
    batches, zero shuffle), with the batch body running
    ``decode_audio_real`` on genuine WAV bytes and emitting format
    metadata plus exact integer loudness stats (sum of |sample| and the
    peak amplitude) — the deterministic stand-ins for a real feature
    extractor.  Tested end-to-end on generated PCM16 fixtures in
    ``tests/test_multimodal.py``; the audio modality is no longer
    stub-only in this container."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_audio_real(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "channels": [m["channels"] for m in metas],
                    "framerate": [m["framerate"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "sum_abs": [
                        int(abs(m["samples"].astype("int64")).sum()) for m in metas
                    ],
                    "peak": [
                        int(abs(m["samples"].astype("int64")).max()) if m["n_frames"] else 0
                        for m in metas
                    ],
                }
            )

    return blobs.mapInPandas(_batches, schema=_REAL_AUDIO_SCHEMA)


# --- perceptual image dedup (dHash over the REAL BMP decode path) ------------

#: distinct synthetic images (doc_id mod this shares one image) — gives the
#: dedup stage real buckets to collapse.
_DHASH_GROUPS = 16

_DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dhash_hi", LongType()),
        StructField("dhash_lo", LongType()),
    ]
)


def _dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per doc: synthesize its 9×8 image from the closed-form pixel
    formula, round-trip it through the REAL BMP encoder/decoder, and
    compute the 64-bit difference hash from the DECODED pixels (row-wise
    left<right comparisons), returned as two 32-bit halves so the value
    never touches the BIGINT sign bit."""
    import numpy as np

    i_idx, j_idx = np.meshgrid(np.arange(8), np.arange(9), indexing="ij")

    def one_hash(g: int) -> tuple[int, int]:
        v = ((((g * 31 + i_idx * 7 + j_idx * 13) * _H_MULT) % _H_MOD) // 8192) % 256
        img = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
        dec = _decode_bmp(encode_bmp(img))
        gray = dec["pixels"][:, :, 0].astype(np.int64)
        bits = (gray[:, :8] < gray[:, 1:]).astype(np.int64)
        flat = bits.reshape(-1)  # bit index = i*8 + j
        lo = int((flat[:32] << np.arange(32, dtype=np.int64)).sum())
        hi = int((flat[32:] << np.arange(32, dtype=np.int64)).sum())
        return hi, lo

    table = dict(enumerate(one_hash(g) for g in range(_DHASH_GROUPS)))
    for pdf in batches:
        g = (pdf["doc_id"] % _DHASH_GROUPS).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "dhash_hi": g.map(lambda x: table[int(x)][0]),
                "dhash_lo": g.map(lambda x: table[int(x)][1]),
            }
        )


_DHASH_ORACLE = f"""
WITH grid AS (
  SELECT g.range AS g, i.range AS i, j.range AS j,
         ((g.range * 31 + i.range * 7 + j.range * 13) * {_H_MULT})
           % {_H_MOD} // 8192 % 256 AS v
  FROM range({_DHASH_GROUPS}) g, range(8) i, range(9) j
),
bits AS (
  SELECT a.g, a.i, a.j, CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
  FROM grid a JOIN grid b ON b.g = a.g AND b.i = a.i AND b.j = a.j + 1
  WHERE a.j < 8
),
hashes AS (
  SELECT g,
         CAST(SUM(CASE WHEN i * 8 + j >= 32
                       THEN bit * (CAST(1 AS BIGINT) << (i * 8 + j - 32))
                       ELSE 0 END) AS BIGINT) AS dhash_hi,
         CAST(SUM(CASE WHEN i * 8 + j < 32
                       THEN bit * (CAST(1 AS BIGINT) << (i * 8 + j))
                       ELSE 0 END) AS BIGINT) AS dhash_lo
  FROM bits GROUP BY g
),
docs AS (
  SELECT doc_id, doc_id % {_DHASH_GROUPS} AS g FROM documents
)
SELECT d.doc_id, h.dhash_hi, h.dhash_lo,
       CAST(MIN(d.doc_id) OVER (PARTITION BY h.dhash_hi, h.dhash_lo)
            AS BIGINT) AS keeper,
       CAST(COUNT(*) OVER (PARTITION BY h.dhash_hi, h.dhash_lo)
            AS BIGINT) AS n_bucket
FROM docs d JOIN hashes h ON h.g = d.g
"""


@query(
    "multimodal_image_dhash_dedup",
    oracle=_DHASH_ORACLE,
    tags=("multimodal", "dedup", "udf"),
)
def multimodal_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: difference hash (dHash — the classic
    public perceptual fingerprint: 9×8 grayscale, bit per left<right
    neighbor comparison, 64 bits) computed INSIDE an Arrow
    ``mapInPandas`` stage whose pixels really round-trip the BMP
    encoder/decoder — the decode path is the production shape, not
    arithmetic on metadata — then exact-hash bucket grouping with a
    min-doc keeper, the image twin of ``dedup_exact``.

    Determinism contract (house style): each doc's image derives from a
    closed-form integer pixel formula on ``doc_id mod {_DHASH_GROUPS}``,
    so the DuckDB oracle reproduces the HASHES from the formula alone
    while the Spark path proves the byte-level decode produces the same
    pixels.  Hash emitted as two 32-bit halves — bit 63 would overflow
    a signed BIGINT sum.

    Scale shape: hash = embarrassingly parallel decode scan (no
    shuffle); grouping = one (hi, lo)-keyed window — identical cost
    profile to exact text dedup.  On real corpora the formula is
    replaced by the stored blob and near-dup matching adds a banded
    Hamming join (the SimHash machinery, unchanged)."""
    blobs = _blobs(spark, sf_dir)
    hashed = blobs.mapInPandas(_dhash_batches, schema=_DHASH_SCHEMA)
    from pyspark.sql import Window as W

    w = W.partitionBy("dhash_hi", "dhash_lo")
    return hashed.select(
        "doc_id",
        "dhash_hi",
        "dhash_lo",
        F.min("doc_id").over(w).cast("bigint").alias("keeper"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_bucket"),
    )


# --- audio fingerprint dedup (energy contour over the REAL WAV decode) -------

#: distinct synthetic clips (doc_id mod this shares one clip).
_AFP_GROUPS = 12

_AFP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("afp", LongType()),
    ]
)


def _afp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per doc: synthesize its 64-sample PCM16 clip from the closed-form
    sample formula, round-trip it through the REAL stdlib-wave
    encoder/decoder, then fingerprint the DECODED samples: 8 frames of 8,
    one bit per rising energy step (frame f vs f+1) — a 7-bit energy
    contour, the Shazam-style landmark hash in miniature."""
    import numpy as np

    t = np.arange(64, dtype=np.int64)

    noise = ((((t * 11 + 7) * _H_MULT) % _H_MOD) // 8192) % 256 - 128

    def one_fp(g: int) -> int:
        amp = 1 + ((((g * 53 + (t // 8) * 29) * _H_MULT) % _H_MOD) // 8192) % 8
        s = noise * amp
        dec = decode_audio_real(encode_wav(s.astype("<i2")))
        sam = dec["samples"][:, 0].astype(np.int64)
        e = (sam.reshape(8, 8) ** 2).sum(axis=1)
        bits = (e[:-1] < e[1:]).astype(np.int64)
        return int((bits << np.arange(7, dtype=np.int64)).sum())

    table = {g: one_fp(g) for g in range(_AFP_GROUPS)}
    for pdf in batches:
        g = (pdf["doc_id"] % _AFP_GROUPS).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "afp": g.map(lambda x: table[int(x)]),
            }
        )


_AFP_ORACLE = f"""
WITH samp AS (
  SELECT g.range AS g, t.range AS t,
         (((t.range * 11 + 7) * {_H_MULT}) % {_H_MOD} // 8192 % 256 - 128)
         * (1 + ((g.range * 53 + t.range // 8 * 29) * {_H_MULT})
                  % {_H_MOD} // 8192 % 8) AS s
  FROM range({_AFP_GROUPS}) g, range(64) t
),
energy AS (
  SELECT g, t // 8 AS f, SUM(s * s) AS e
  FROM samp GROUP BY g, t // 8
),
bits AS (
  SELECT a.g, a.f, CASE WHEN a.e < b.e THEN 1 ELSE 0 END AS bit
  FROM energy a JOIN energy b ON b.g = a.g AND b.f = a.f + 1
  WHERE a.f < 7
),
fps AS (
  SELECT g, CAST(SUM(bit * (CAST(1 AS BIGINT) << f)) AS BIGINT) AS afp
  FROM bits GROUP BY g
),
docs AS (SELECT doc_id, doc_id % {_AFP_GROUPS} AS g FROM documents)
SELECT d.doc_id, f.afp,
       CAST(MIN(d.doc_id) OVER (PARTITION BY f.afp) AS BIGINT) AS keeper,
       CAST(COUNT(*) OVER (PARTITION BY f.afp) AS BIGINT) AS n_bucket
FROM docs d JOIN fps f ON f.g = d.g
"""


@query(
    "multimodal_audio_fp_dedup",
    oracle=_AFP_ORACLE,
    tags=("multimodal", "dedup", "udf", "audio"),
)
def multimodal_audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup detection: a 7-bit energy-contour fingerprint
    (rising/falling frame energy — the miniature of Shazam-style
    landmark hashing) computed on samples that REALLY round-trip the
    PCM16 WAV encoder/decoder inside an Arrow ``mapInPandas`` stage,
    then exact-fingerprint bucket grouping with a min-doc keeper —
    completing the modality dedup triple (text shingles, image dHash,
    audio contour).

    Determinism contract as the image twin: clips derive from a
    closed-form sample formula on ``doc_id mod {_AFP_GROUPS}`` (high
    multiplicative-hash bits), so the oracle reproduces the
    fingerprints from arithmetic while Spark proves the byte-level WAV
    decode.  Scale shape: fingerprint = parallel decode scan (no
    shuffle), grouping = one small-key window; coarse 7-bit buckets are
    the BAND stage — real pipelines verify within-bucket with sample
    cross-correlation, exactly like LSH verify tiers here."""
    blobs = _blobs(spark, sf_dir)
    fp = blobs.mapInPandas(_afp_batches, schema=_AFP_SCHEMA)
    from pyspark.sql import Window as W

    w = W.partitionBy("afp")
    return fp.select(
        "doc_id",
        "afp",
        F.min("doc_id").over(w).cast("bigint").alias("keeper"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_bucket"),
    )
