"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The decode step is REAL and dependency-free: payloads are well-formed
PNG / WAV containers (synthesized from the documents table — the image
libraries this container lacks are only needed for pixel data, not for
container headers), and the kernels parse the actual bytes:

- PNG: validate the 8-byte signature, read width/height from the IHDR
  chunk (big-endian, first chunk per the PNG spec).  CRC is present but
  not validated (as in most streaming decoders).
- WAV: validate RIFF/WAVE, walk chunks to the ``fmt `` chunk, unpack
  little-endian channels / sample rate, size the ``data`` chunk.

``_decode_fake`` remains only as the documented fallback for payloads in
formats the parser doesn't know (it is exercised in tests, never in the
registered queries).  A pixel-level decoder (PIL/opencv) would slot into
``decode_features`` without touching any of the Spark plumbing.

Scale notes: mapInPandas streams Arrow batches per partition — no
collect, no per-row Python calls into Spark; payload bytes never shuffle
(both operators are map-only), so adding decode to a 100 TB scan costs
only the Python-worker lanes, not an exchange.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from ..catalog import read_parquet_stable as _rps

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

PNG_SIGNATURE = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
PNG_HEADER_BYTES = 33  # signature(8) + IHDR chunk: len(4)+type(4)+data(13)+crc(4)


def _be32(col) -> F.Column:
    """Big-endian 4-byte binary encoding of an int column (JVM-side)."""
    return F.unhex(F.lpad(F.hex(col.cast("bigint")), 8, "0"))


# r19 opt note — the documents scan is deliberately NOT widened here:
# a spread_source widening of the single-split scan was tried (more
# Python-worker lanes for the mapInPandas chains) and measured WORSE on
# every lane (fresh-JVM min-of-2: frames 2.83->3.68s, wav_samples
# 0.96->2.27s) — at this corpus size the per-partition task/worker/Arrow
# overhead of 32 lanes exceeds the serial Python compute, and on a real
# many-split corpus the widening is the identity anyway (the scan
# already has the lanes).  Kernels stay partitioning-independent, so
# revisiting this needs only the measurement, not a correctness pass.


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table with REAL PNG payloads built JVM-side: signature +
    IHDR (width/height derived deterministically from the text length,
    so the oracle can replay them arithmetically) + the document text
    bytes standing in for the compressed image stream.  The IHDR CRC is
    a placeholder — the parser, like most streaming decoders, skips it."""
    nb = F.octet_length("text")
    width = (nb % 640 + 1).cast("int")
    height = ((nb * 7) % 480 + 1).cast("int")
    payload = F.concat(
        F.lit(PNG_SIGNATURE),
        _be32(F.lit(13)), F.lit(b"IHDR"),
        _be32(width), _be32(height),
        F.lit(bytes([8, 6, 0, 0, 0])),  # bit depth 8, RGBA, std flags
        _be32(F.lit(0)),                # CRC placeholder (unvalidated)
        F.encode("text", "utf-8"),
    )
    return (_rps(spark, f"{sf_dir}/documents.parquet")
            .select("doc_id",
                    payload.alias("payload"),
                    F.lit("image/png").alias("media_type"),
                    F.struct(F.col("n_chars").alias("declared_size"),
                             F.col("source").alias("origin")).alias("meta")))


def parse_png_header(payload: bytes) -> tuple[int, int] | None:
    """Real, dependency-free PNG container decode: signature check + IHDR
    width/height (PNG spec: IHDR is always the first chunk; fields are
    big-endian).  Returns None for non-PNG bytes."""
    if len(payload) < 24 or payload[:8] != PNG_SIGNATURE:
        return None
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length < 8:
        return None
    return struct.unpack(">II", payload[16:24])


def _decode_fake(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode — fallback for unknown formats only:
    features derived from payload length so results stay reproducible."""
    n = len(payload)
    return n % 640 + 1, (n * 7) % 480 + 1, n % 16 + 1


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload -> (width, height, n_frames).
    PNG headers are parsed from the real bytes; anything else falls back
    to the labeled fake."""
    for pdf in batches:
        ids, sizes, feats = [], [], []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            if p is None:
                # a NULL binary column is a doc with no stored media —
                # the decode lane skips it (bytes(None) used to crash
                # the whole Arrow batch; the r18 null-injected sweep)
                continue
            p = bytes(p)
            wh = parse_png_header(p)
            ids.append(doc_id)
            sizes.append(len(p))
            feats.append((*wh, 1) if wh else _decode_fake(p))
        yield pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_bytes": pd.Series(sizes, dtype="int64"),
            "width": pd.Series([f[0] for f in feats], dtype="int32"),
            "height": pd.Series([f[1] for f in feats], dtype="int32"),
            "n_frames": pd.Series([f[2] for f in feats], dtype="int32"),
        })


def multimodal_features_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline via Arrow-batched mapInPandas: real
    PNG payloads in, real header parse out."""
    return media_table(spark, sf_dir).mapInPandas(decode_features, FEATURE_SCHEMA)


# Oracle replays the header arithmetic: the builder embedded
# width = strlen % 640 + 1 and height = strlen*7 % 480 + 1 into the IHDR,
# the parser read them back; payload = 33 header bytes + the text bytes.
MULTIMODAL_FEATURES_SQL = f"""
SELECT doc_id,
       strlen(text)::BIGINT + {PNG_HEADER_BYTES} AS n_bytes,
       CAST(strlen(text) % 640 + 1 AS INT) AS width,
       CAST((strlen(text) * 7) % 480 + 1 AS INT) AS height,
       1 AS n_frames
FROM documents
WHERE text IS NOT NULL
"""
# WHERE text IS NOT NULL: a null-text doc synthesizes a NULL payload —
# no stored media, no decode row (matching the kernel's skip; r18)


# --- WAV (audio) lane -------------------------------------------------------

WAV_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
])

WAV_HEADER_BYTES = 44  # RIFF(12) + fmt chunk(24) + data chunk header(8)


def wav_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize well-formed 16-bit PCM WAV payloads (struct.pack in an
    Arrow kernel — RIFF fields are little-endian, which JVM expressions
    can't emit cheaply).  Rate/channels derive from doc_id; the text
    bytes stand in for PCM samples."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    # null-text doc: no PCM bytes to wrap — no payload
                    # row (the encode used to crash the Arrow batch on
                    # None.encode; the r18 null-injected sweep)
                    continue
                ids.append(doc_id)
                data = text.encode("utf-8")
                rate = 8000 + int(doc_id) % 8 * 1000
                ch = int(doc_id) % 2 + 1
                block = ch * 2  # 16-bit PCM
                hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                       + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                               rate * block, block, 16)
                       + b"data" + struct.pack("<I", len(data)))
                payloads.append(hdr + data)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "payload": payloads})

    return (_rps(spark, f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").mapInPandas(encode, schema))


def parse_wav_header(payload: bytes) -> tuple[int, int, int] | None:
    """Real RIFF/WAVE parse: chunk walk to ``fmt `` (little-endian
    channels + sample rate) and ``data`` (byte size).  Returns
    (sample_rate, n_channels, data_bytes) or None for non-WAV bytes."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, ch, data_len = 12, None, None, None
    while pos + 8 <= len(payload):
        ctype, clen = struct.unpack("<4sI", payload[pos:pos + 8])
        if ctype == b"fmt " and clen >= 16:
            # length fields are untrusted input (the PNG walk's rule):
            # a chunk truncated mid-fmt would hand struct.unpack a
            # short buffer and crash the whole Arrow batch with
            # struct.error instead of the documented None skip
            if pos + 16 > len(payload):
                return None
            _fmt, ch, rate = struct.unpack("<HHI", payload[pos + 8:pos + 16])
        elif ctype == b"data":
            # clamp a declared length that runs past the payload — the
            # sample count must never exceed the bytes that exist
            data_len = min(clen, max(0, len(payload) - pos - 8))
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data_len is None:
        return None
    return rate, ch, data_len


def decode_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "n_bytes", "sample_rate",
                               "n_channels", "n_samples")}
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            p = bytes(p)
            parsed = parse_wav_header(p)
            if parsed is None:
                continue
            rate, ch, data_len = parsed
            out["doc_id"].append(doc_id)
            out["n_bytes"].append(len(p))
            out["sample_rate"].append(rate)
            out["n_channels"].append(ch)
            out["n_samples"].append(data_len // (ch * 2))
        yield pd.DataFrame({
            "doc_id": pd.Series(out["doc_id"], dtype="int64"),
            "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
            "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
            "n_channels": pd.Series(out["n_channels"], dtype="int32"),
            "n_samples": pd.Series(out["n_samples"], dtype="int64"),
        })


def multimodal_wav_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio lane: WAV payloads decoded by the real RIFF chunk walker."""
    return wav_table(spark, sf_dir).mapInPandas(decode_wav, WAV_SCHEMA)


MULTIMODAL_WAV_SQL = f"""
SELECT doc_id,
       strlen(text)::BIGINT + {WAV_HEADER_BYTES} AS n_bytes,
       CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
       CAST(doc_id % 2 + 1 AS INT) AS n_channels,
       (strlen(text) // ((doc_id % 2 + 1) * 2))::BIGINT AS n_samples
FROM documents
WHERE text IS NOT NULL
"""
# WHERE text IS NOT NULL: matches the encode kernel's null-text skip
# (no PCM bytes -> no payload row; r18 null-injected sweep)


def nearest_resize(px: bytes, w: int, h: int, rw: int, rh: int) -> bytes:
    """Nearest-neighbor resample of an RGB pixel buffer: target pixel
    (x, y) gathers source pixel (x*w // rw, y*h // rh) — pure integer
    arithmetic so an oracle can replay the sampling exactly."""
    out = bytearray(rw * rh * 3)
    for y in range(rh):
        sy = y * h // rh
        for x in range(rw):
            sk = (sy * w + x * w // rw) * 3
            tk = (y * rw + x) * 3
            out[tk:tk + 3] = px[sk:sk + 3]
    return bytes(out)


def encode_png_rgb(w: int, h: int, px: bytes) -> bytes:
    """Minimal valid 8-bit RGB PNG encoder (filter type 0 scanlines, real
    CRC32 on every chunk) — the write half of decode_png_pixels."""
    import zlib as _zlib

    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += px[y * w * 3:(y + 1) * w * 3]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", _zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize over a media table: decode the PNG payload to pixels,
    nearest-neighbor resample, re-encode a valid PNG payload.  Map-only
    Arrow pass (payload bytes never shuffle); non-PNG payloads pass
    through unchanged with resized dims nulled."""
    schema = T.StructType(df.schema.fields + [
        T.StructField("resized_width", T.IntegerType()),
        T.StructField("resized_height", T.IntegerType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            payloads, rws, rhs = [], [], []
            for p in pdf["payload"]:
                p = bytes(p)
                try:
                    w, h, px = decode_png_pixels(p)
                except Exception:  # noqa: BLE001 — any malformed payload
                    payloads.append(p)
                    rws.append(None)
                    rhs.append(None)
                    continue
                payloads.append(
                    encode_png_rgb(width, height,
                                   nearest_resize(px, w, h, width, height)))
                rws.append(width)
                rhs.append(height)
            pdf["payload"] = payloads
            pdf["resized_width"] = pd.array(rws, dtype="Int32")
            pdf["resized_height"] = pd.array(rhs, dtype="Int32")
            yield pdf

    return df.mapInPandas(kernel, schema)


# --- real video-container frame sampling -------------------------------------
#
# Dependency-free "video": a length-prefixed container of complete PNG
# frames (signature + frame count + [u32 length | PNG bytes]*).  The
# encoder writes real PNGs per frame with closed-form pixels; the sampler
# walks the container, length-skips to every Nth frame, pixel-decodes
# ONLY the sampled frames (the point of frame sampling at scale: decode
# cost proportional to frames kept, not frames stored), and reduces each
# to stats the oracle replays arithmetically.

VIDEO_MAGIC = b"VID0"
FRAME_W, FRAME_H = 4, 3
FRAME_EVERY_N = 3


def _video_n_frames(doc_id: int) -> int:
    return doc_id % 12 + 2


def _frame_pixel(doc_id: int, frame: int, k: int) -> int:
    return (doc_id * 31 + frame * 17 + k) % 256


def encode_video(doc_id: int) -> bytes:
    n = _video_n_frames(doc_id)
    out = bytearray(VIDEO_MAGIC + struct.pack(">I", n))
    for f in range(n):
        px = bytes(_frame_pixel(doc_id, f, k)
                   for k in range(FRAME_W * FRAME_H * 3))
        frame = encode_png_rgb(FRAME_W, FRAME_H, px)
        out += struct.pack(">I", len(frame)) + frame
    return bytes(out)


def sample_video_frames(payload: bytes, every_n: int
                        ) -> list[tuple[int, int, int, float, int]]:
    """Walk the container; decode only every Nth frame.  Returns
    (frame_idx, width, height, mean_px, p00) per sampled frame."""
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a video container")
    (n,) = struct.unpack(">I", payload[4:8])
    pos, out = 8, []
    for f in range(n):
        if pos + 4 > len(payload):
            raise ValueError("truncated frame header")
        (flen,) = struct.unpack(">I", payload[pos:pos + 4])
        if pos + 4 + flen > len(payload):
            raise ValueError("truncated frame payload")
        if f % every_n == 0:
            w, h, px = decode_png_pixels(payload[pos + 4:pos + 4 + flen])
            out.append((f, w, h, round(sum(px) / len(px), 6), px[0]))
        pos += 4 + flen
    return out


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("p00", T.IntegerType()),
])


def _video_encode_kernel(batches: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "payload": [encode_video(int(d)) for d in pdf["doc_id"]],
        })


def _frame_sample_kernel(batches: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "frame_idx", "mean_px", "p00")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for f, _w, _h, mean_px, p00 in sample_video_frames(
                    bytes(payload), FRAME_EVERY_N):
                rows["doc_id"].append(int(doc_id))
                rows["frame_idx"].append(f)
                rows["mean_px"].append(mean_px)
                rows["p00"].append(p00)
        out = pd.DataFrame(rows)
        for c in ("frame_idx", "p00"):
            out[c] = out[c].astype("int32")
        yield out


def multimodal_frames_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video lane: encode multi-frame containers of real PNGs, sample
    every Nth frame (length-skipping the rest), decode the sampled frames,
    reduce to per-frame stats with a closed-form oracle.  One output row
    per sampled frame; both kernels are map-only mapInPandas."""
    docs = _rps(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    media = docs.mapInPandas(_video_encode_kernel, _PAYLOAD_SCHEMA)
    return media.mapInPandas(_frame_sample_kernel, FRAME_SCHEMA)


_FRAME_PX = FRAME_W * FRAME_H * 3

MULTIMODAL_FRAMES_SQL = f"""
WITH dims AS (
  SELECT doc_id, doc_id % 12 + 2 AS n FROM documents),
frames AS (
  SELECT doc_id, n, g.i AS f
  FROM dims CROSS JOIN generate_series(0, 13) g(i)
  WHERE g.i < n AND g.i % {FRAME_EVERY_N} = 0),
px AS (
  SELECT doc_id, f, (doc_id * 31 + f * 17 + k.j) % 256 AS v, k.j
  FROM frames CROSS JOIN generate_series(0, {_FRAME_PX - 1}) k(j))
SELECT doc_id,
       CAST(f AS INT) AS frame_idx,
       round(avg(v), 6) AS mean_px,
       CAST(min(CASE WHEN j = 0 THEN v END) AS INT) AS p00
FROM px
GROUP BY doc_id, f
"""


# --- real pixel-level PNG round trip ----------------------------------------
#
# The header parse above proves container decode; this lane proves PIXEL
# decode.  An encode kernel synthesizes COMPLETE valid PNGs (8-bit RGB,
# zlib-compressed IDAT, real CRC32 on every chunk, scanlines written with
# a MIX of filter types 0/1/2) whose pixel values are a closed-form
# function of doc_id; a decode kernel then walks the chunks, validates
# CRCs, inflates, reverses the filters (all five types implemented), and
# reduces to channel statistics.  The DuckDB oracle computes the SAME
# statistics arithmetically from the closed form — so a wrong filter
# reconstruction, CRC slip, or off-by-one in the scanline walk is a hash
# mismatch, not a silent pass.  Both kernels are map-only mapInPandas:
# payloads never shuffle, exactly like the header lane.

PIXEL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("p00_r", T.IntegerType()),
    T.StructField("p00_g", T.IntegerType()),
    T.StructField("p00_b", T.IntegerType()),
])

_PAYLOAD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def _chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib as _zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _zlib.crc32(ctype + data)))


def _png_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 13 + 4, doc_id % 7 + 3


def _png_pixel(doc_id: int, k: int) -> int:
    return (doc_id * 31 + k) % 256


def encode_png(doc_id: int) -> bytes:
    """A complete, spec-valid PNG: pixels are the closed form
    ``(doc_id*31 + k) % 256`` (k = (y*w + x)*3 + channel); each scanline
    is written with filter type ``(doc_id + y) % 3`` (None/Sub/Up), so
    decoding genuinely exercises filter reconstruction."""
    import zlib as _zlib

    w, h = _png_dims(doc_id)
    bpp = 3
    raw = bytearray()
    prior = bytes(w * bpp)
    for y in range(h):
        line = bytes(_png_pixel(doc_id, (y * w + x) * bpp + c)
                     for x in range(w) for c in range(bpp))
        ftype = (doc_id + y) % 3
        raw.append(ftype)
        if ftype == 0:
            raw += line
        elif ftype == 1:    # Sub
            raw += bytes((line[i] - (line[i - bpp] if i >= bpp else 0)) % 256
                         for i in range(len(line)))
        else:               # Up
            raw += bytes((line[i] - prior[i]) % 256 for i in range(len(line)))
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", _zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def decode_png_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Full PNG pixel decode for 8-bit RGB non-interlaced images: chunk
    walk with CRC32 validation, zlib inflate, and reconstruction of all
    five filter types (None/Sub/Up/Average/Paeth).  Returns
    (width, height, raw RGB bytes)."""
    import zlib as _zlib

    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    pos, width, height = 8, None, None
    idat = bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        # length fields are untrusted input: bounds-check before slicing so a
        # corrupt length raises ValueError, not struct.error mid-walk
        if pos + 12 + length > len(payload):
            raise ValueError(f"chunk {ctype!r} length {length} exceeds payload")
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if crc != _zlib.crc32(ctype + data):
            raise ValueError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, ctype_code = struct.unpack(">IIBB", data[:10])
            if (depth, ctype_code) != (8, 2):
                raise ValueError("only 8-bit RGB supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = _zlib.decompress(bytes(idat))
    bpp, stride = 3, 3 * width
    out = bytearray()
    prior = bytes(stride)
    pos = 0
    for _y in range(height):
        ftype, line = raw[pos], bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0      # left (reconstructed)
            b = prior[i]                              # up
            c = prior[i - bpp] if i >= bpp else 0     # up-left
            if ftype == 1:
                line[i] = (line[i] + a) % 256
            elif ftype == 2:
                line[i] = (line[i] + b) % 256
            elif ftype == 3:
                line[i] = (line[i] + (a + b) // 2) % 256
            elif ftype == 4:                          # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) % 256
        prior = bytes(line)
        out += prior
    return width, height, bytes(out)


def _encode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["doc_id"]
        yield pd.DataFrame({
            "doc_id": ids,
            "payload": [encode_png(int(d)) for d in ids],
        })


def _pixel_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    rows = {k: [] for k in ("doc_id", "width", "height", "mean_r", "mean_g",
                            "mean_b", "p00_r", "p00_g", "p00_b")}
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, px = decode_png_pixels(bytes(payload))
            chans = [px[c::3] for c in range(3)]
            rows["doc_id"].append(int(doc_id))
            rows["width"].append(w)
            rows["height"].append(h)
            for name, ch in zip(("r", "g", "b"), chans):
                rows[f"mean_{name}"].append(round(sum(ch) / len(ch), 6))
            rows["p00_r"].append(px[0])
            rows["p00_g"].append(px[1])
            rows["p00_b"].append(px[2])
        out = pd.DataFrame(rows)
        for c in ("width", "height", "p00_r", "p00_g", "p00_b"):
            out[c] = out[c].astype("int32")
        yield out
        rows = {k: [] for k in rows}


def multimodal_pixels_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode -> decode round trip over real PNG bytes, reduced to
    channel statistics the oracle derives in closed form."""
    docs = _rps(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    media = docs.mapInPandas(_encode_kernel, _PAYLOAD_SCHEMA)
    return media.mapInPandas(_pixel_kernel, PIXEL_SCHEMA)


MULTIMODAL_PIXELS_SQL = """
WITH dims AS (
  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 7 + 3 AS h FROM documents),
px AS (
  -- constant series (w*h <= 16*9 = 144) filtered per row: this DuckDB
  -- build rejects lateral column parameters to generate_series
  SELECT doc_id, w, h, g.i
  FROM dims CROSS JOIN generate_series(0, 143) g(i)
  WHERE g.i < w * h)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       round(avg((doc_id * 31 + 3 * i) % 256), 6)     AS mean_r,
       round(avg((doc_id * 31 + 3 * i + 1) % 256), 6) AS mean_g,
       round(avg((doc_id * 31 + 3 * i + 2) % 256), 6) AS mean_b,
       CAST(min((doc_id * 31) % 256) AS INT)     AS p00_r,
       CAST(min((doc_id * 31 + 1) % 256) AS INT) AS p00_g,
       CAST(min((doc_id * 31 + 2) % 256) AS INT) AS p00_b
FROM px
GROUP BY doc_id, w, h
"""


# --- real PCM sample decode -------------------------------------------------
#
# The WAV lane above proves container decode; this lane proves SAMPLE
# decode, mirroring multimodal_pixels: the encoder writes real int16
# little-endian PCM whose samples are a closed-form function of doc_id;
# the decoder walks to the data chunk, unpacks the samples, and reduces
# to amplitude statistics that the oracle computes arithmetically.

WAV_SAMPLES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("mean_amp", T.DoubleType()),
    T.StructField("peak", T.IntegerType()),
    T.StructField("s0", T.IntegerType()),
])


def _wav_n_samples(doc_id: int) -> int:
    return doc_id % 50 + 20


def _wav_sample(doc_id: int, i: int) -> int:
    return (doc_id * 37 + i * 11) % 4096 - 2048


def encode_wav_pcm(doc_id: int) -> bytes:
    n = _wav_n_samples(doc_id)
    data = struct.pack(f"<{n}h", *(_wav_sample(doc_id, i) for i in range(n)))
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav_samples(payload: bytes) -> tuple[int, float, int, int]:
    """Real PCM decode: locate the data chunk via the RIFF walk, unpack
    int16 LE samples, reduce to (n, mean, peak, first)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    samples = None
    while pos + 8 <= len(payload):
        ctype, clen = struct.unpack("<4sI", payload[pos:pos + 8])
        if ctype == b"data":
            # untrusted length field (the PNG walk's rule): a declared
            # size past the payload end would give struct.unpack a
            # short slice and raise struct.error instead of the
            # documented ValueError
            if pos + 8 + clen > len(payload):
                raise ValueError(
                    f"data chunk length {clen} exceeds payload")
            samples = struct.unpack(
                f"<{clen // 2}h", payload[pos + 8:pos + 8 + clen])
        pos += 8 + clen + (clen & 1)
    if samples is None:
        raise ValueError("no data chunk")
    n = len(samples)
    return (n, round(sum(samples) / n, 6),
            max(abs(s) for s in samples), samples[0])


def _wav_pcm_encode_kernel(batches: Iterator[pd.DataFrame]
                           ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "payload": [encode_wav_pcm(int(d)) for d in pdf["doc_id"]],
        })


def _wav_pcm_decode_kernel(batches: Iterator[pd.DataFrame]
                           ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [decode_wav_samples(bytes(p)) for p in pdf["payload"]]
        out = pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_samples": [r[0] for r in rows],
            "mean_amp": [r[1] for r in rows],
            "peak": [r[2] for r in rows],
            "s0": [r[3] for r in rows],
        })
        for c in ("n_samples", "peak", "s0"):
            out[c] = out[c].astype("int32")
        yield out


def multimodal_wav_samples_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _rps(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    media = docs.mapInPandas(_wav_pcm_encode_kernel, _PAYLOAD_SCHEMA)
    return media.mapInPandas(_wav_pcm_decode_kernel, WAV_SAMPLES_SCHEMA)


# --- real nearest-neighbor resize lane ---------------------------------------
#
# Proves the RESIZE kernel end to end: closed-form PNGs are encoded,
# pixel-decoded, nearest-neighbor resampled to a fixed target, re-encoded
# as valid PNGs, decoded AGAIN from the resized bytes, and reduced to
# statistics.  The oracle replays the integer sampling arithmetic
# (sx = x*w // RW, sy = y*h // RH) on the closed-form pixel function —
# a wrong gather index, encode slip, or filter bug is a hash mismatch.

RESIZE_W = 6
RESIZE_H = 4

RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("src_w", T.IntegerType()),
    T.StructField("src_h", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("p00_r", T.IntegerType()),
    T.StructField("plast_b", T.IntegerType()),
])


def _resize_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    rw, rh = RESIZE_W, RESIZE_H
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "src_w", "src_h", "mean_r",
                                "mean_g", "mean_b", "p00_r", "plast_b")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, px = decode_png_pixels(bytes(payload))
            # full bytes-level round trip: resample, re-encode, re-decode
            resized = encode_png_rgb(rw, rh, nearest_resize(px, w, h, rw, rh))
            w2, h2, px2 = decode_png_pixels(resized)
            assert (w2, h2) == (rw, rh)
            chans = [px2[c::3] for c in range(3)]
            rows["doc_id"].append(int(doc_id))
            rows["src_w"].append(w)
            rows["src_h"].append(h)
            for name, ch in zip(("r", "g", "b"), chans):
                rows[f"mean_{name}"].append(round(sum(ch) / len(ch), 6))
            rows["p00_r"].append(px2[0])
            rows["plast_b"].append(px2[-1])
        out = pd.DataFrame(rows)
        for c in ("src_w", "src_h", "p00_r", "plast_b"):
            out[c] = out[c].astype("int32")
        yield out


def multimodal_resize_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode -> decode -> nearest-resize -> re-encode -> re-decode round
    trip, reduced to statistics with a closed-form oracle.  Map-only
    mapInPandas chain: payload bytes never shuffle."""
    docs = _rps(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    media = docs.mapInPandas(_encode_kernel, _PAYLOAD_SCHEMA)
    return media.mapInPandas(_resize_kernel, RESIZE_SCHEMA)


MULTIMODAL_RESIZE_SQL = f"""
WITH dims AS (
  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 7 + 3 AS h FROM documents),
tgt AS (
  SELECT doc_id, w, h, g.i,
         g.i % {RESIZE_W} AS x, g.i // {RESIZE_W} AS y
  FROM dims CROSS JOIN generate_series(0, {RESIZE_W * RESIZE_H - 1}) g(i)),
sel AS (
  SELECT doc_id, w, h, i,
         ((y * h // {RESIZE_H}) * w + (x * w // {RESIZE_W})) * 3 AS k
  FROM tgt)
SELECT doc_id,
       CAST(w AS INT) AS src_w,
       CAST(h AS INT) AS src_h,
       round(avg((doc_id * 31 + k) % 256), 6)     AS mean_r,
       round(avg((doc_id * 31 + k + 1) % 256), 6) AS mean_g,
       round(avg((doc_id * 31 + k + 2) % 256), 6) AS mean_b,
       CAST(min(CASE WHEN i = 0 THEN (doc_id * 31 + k) % 256 END) AS INT)
         AS p00_r,
       CAST(min(CASE WHEN i = {RESIZE_W * RESIZE_H - 1}
                THEN (doc_id * 31 + k + 2) % 256 END) AS INT) AS plast_b
FROM sel
GROUP BY doc_id, w, h
"""


MULTIMODAL_WAV_SAMPLES_SQL = """
WITH dims AS (
  SELECT doc_id, doc_id % 50 + 20 AS n FROM documents),
sm AS (
  -- constant series (n <= 69) filtered per row (no lateral params here)
  SELECT doc_id, n, (doc_id * 37 + g.i * 11) % 4096 - 2048 AS s, g.i
  FROM dims CROSS JOIN generate_series(0, 68) g(i)
  WHERE g.i < n)
SELECT doc_id,
       CAST(n AS INT) AS n_samples,
       round(avg(s), 6) AS mean_amp,
       CAST(max(abs(s)) AS INT) AS peak,
       CAST(min(CASE WHEN i = 0 THEN s END) AS INT) AS s0
FROM sm
GROUP BY doc_id, n
"""


# --- perceptual average-hash (image near-dup fingerprint) --------------------
#
# The image twin of text dedup fingerprints: decode -> downsample to a
# fixed grid -> threshold each cell against the grid mean -> bit string.
# Near-duplicate images (rescaled/re-encoded copies) agree on most bits;
# Hamming distance over the hash is the dedup candidate signal.  The
# grid is 4x3 because the synthetic corpus's smallest image is 4x3 —
# the real pipeline shape (decode, gather, threshold) is unchanged at
# 8x8.  Thresholding is INTEGER-exact: bit_k = [grid_cells * s_k >
# sum(s)] with s = r+g+b per sampled pixel, so no float tie can ever
# diverge between the Arrow kernel and the SQL oracle.

PHASH_GW, PHASH_GH = 4, 3

PHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("ahash", T.LongType()),
    T.StructField("n_bits_set", T.IntegerType()),
])


def average_hash(px: bytes, w: int, h: int,
                 gw: int = PHASH_GW, gh: int = PHASH_GH) -> int:
    """gw*gh-bit average hash of an RGB pixel buffer (nearest-neighbor
    grid sample, integer-exact mean threshold)."""
    cells = gw * gh
    s = []
    for k in range(cells):
        x, y = k % gw, k // gw
        i = (y * h // gh) * w + (x * w // gw)
        s.append(px[3 * i] + px[3 * i + 1] + px[3 * i + 2])
    total = sum(s)
    return sum(1 << k for k in range(cells) if cells * s[k] > total)


def _phash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    rows = {k: [] for k in ("doc_id", "width", "height", "ahash",
                            "n_bits_set")}
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, px = decode_png_pixels(bytes(payload))
            a = average_hash(px, w, h)
            rows["doc_id"].append(int(doc_id))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["ahash"].append(a)
            rows["n_bits_set"].append(bin(a).count("1"))
        out = pd.DataFrame(rows)
        for c in ("width", "height", "n_bits_set"):
            out[c] = out[c].astype("int32")
        yield out
        rows = {k: [] for k in rows}


def multimodal_phash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real decode -> grid-sample -> threshold average hash per image;
    two map-only Arrow stages, payloads never shuffle."""
    docs = _rps(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    media = docs.mapInPandas(_encode_kernel, _PAYLOAD_SCHEMA)
    return media.mapInPandas(_phash_kernel, PHASH_SCHEMA)


def _sql_phash_cell(k: int) -> str:
    """s_k = r+g+b at grid cell k, replayed from the synthetic pixel
    formula px[c at index i] = (doc_id*31 + 3i + c) % 256."""
    x, y = k % PHASH_GW, k // PHASH_GW
    i = f"((h * {y} // {PHASH_GH}) * w + (w * {x} // {PHASH_GW}))"
    return (f"((doc_id * 31 + 3 * {i}) % 256"
            f" + (doc_id * 31 + 3 * {i} + 1) % 256"
            f" + (doc_id * 31 + 3 * {i} + 2) % 256)")


_PHASH_CELLS = PHASH_GW * PHASH_GH

MULTIMODAL_PHASH_SQL = f"""
WITH dims AS (
  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 7 + 3 AS h FROM documents),
cells AS (
  SELECT doc_id, w, h,
         [{", ".join(_sql_phash_cell(k) for k in range(_PHASH_CELLS))}] AS s
  FROM dims)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(list_sum([CASE WHEN {_PHASH_CELLS} * s[k + 1] > list_sum(s)
                           THEN (1::BIGINT << k) ELSE 0::BIGINT END
                      for k in generate_series(0, {_PHASH_CELLS - 1})])
            AS BIGINT) AS ahash,
       CAST(list_sum([CASE WHEN {_PHASH_CELLS} * s[k + 1] > list_sum(s)
                           THEN 1 ELSE 0 END
                      for k in generate_series(0, {_PHASH_CELLS - 1})])
            AS INT) AS n_bits_set
FROM cells
"""


def multimodal_phash_dups_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup groups: images sharing an identical average-hash,
    reduced exactly like dedup_exact (representative = min doc_id).  At
    scale this is the image twin of exact text dedup — one shuffle on an
    8-byte key; Hamming-near (not just equal) hashes would band the hash
    bits like minhash-LSH bands signatures."""
    ph = multimodal_phash_df(spark, sf_dir)
    return (ph.groupBy("ahash")
            .agg(F.min("doc_id").alias("rep_doc_id"),
                 F.count(F.lit(1)).alias("dup_count"))
            .where(F.col("dup_count") > 1))


MULTIMODAL_PHASH_DUPS_SQL = f"""
WITH ph AS ({MULTIMODAL_PHASH_SQL})
SELECT ahash, min(doc_id) AS rep_doc_id, count(*) AS dup_count
FROM ph
GROUP BY ahash
HAVING count(*) > 1
"""
