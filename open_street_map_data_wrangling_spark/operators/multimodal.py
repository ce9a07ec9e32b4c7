"""Multimodal columns — SURVEY.md §2.11 X5 (driver-mandated
extension).

Media (image/audio/video) is carried as an opaque `binary` column +
typed metadata, the standard lakehouse layout for training data. The
fixture universe has no real media, so the *payload* here is the
utf-8 encoding of `documents.text` — but the Spark-side plumbing is
the real thing: binary columns, Arrow-batched `mapInPandas`, explicit
result schema, per-batch (not per-row) Python work.

Header-level decode is REAL and dependency-free: `decode_image`
parses PNG IHDR / JPEG SOFn / GIF screen-descriptor dimensions with
pure stdlib byte arithmetic (driven through mapInPandas by
q_image_decode).  PIXEL-level decode is real for PNG since r09:
`encode_png_rgb` / `decode_png_pixels` implement the 8-bit-truecolor
profile end to end with stdlib zlib — all five filter types, genuine
CRCs — hash-certified by q_image_pixels' encode→decode roundtrip
against a direct oracle recomputation.  JPEG/GIF pixel decode still
needs entropy codecs this container lacks, so `fake_decode_meta`
remains the clearly-marked stand-in for those formats only.

Scale notes: mapInPandas streams Arrow record batches through one
Python worker per core — the payload bytes never land on the driver;
partition sizing (`spark.sql.files.maxPartitionBytes`, or an explicit
repartition on the id) controls batch memory, which is what matters
when each row carries megabytes of media.
"""

from __future__ import annotations

import functools
import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table

# Result schema of the feature-extraction stage — explicit, so the
# plan's schema never depends on Python introspection.
MM_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes int, head_byte int, content_md5 string, "
    "fake_width int, fake_height int"
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# JPEG markers that are NOT frame headers despite sitting in the
# 0xC0..0xCF SOF range: Huffman tables, arithmetic conditioning.
_JPEG_NON_SOF = (0xC4, 0xC8, 0xCC)


def decode_image(payload: bytes) -> tuple[str, int, int]:
    """Real (pure-stdlib) image decode of the container header →
    (format, width, height), no codec libraries required:

    - PNG: dimensions are the first two big-endian u32s of the IHDR
      chunk, which the spec pins as the first chunk after the 8-byte
      signature.
    - JPEG: walk the marker segments from SOI for the first SOFn
      frame header (C0..CF minus DHT C4 / JPG C8 / DAC CC); height
      then width as big-endian u16 after the precision byte.
    - GIF: little-endian u16 pair in the logical screen descriptor.

    PIXEL decode still needs a codec (absent in this container) —
    that seam stays at fake_decode_meta for synthetic fixtures; this
    function is the real metadata path a lakehouse media scan runs
    (and what q_image_decode drives through mapInPandas).
    Raises ValueError on unrecognized or truncated containers."""
    if payload.startswith(_PNG_SIG):
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated PNG: no IHDR chunk")
        return (
            "png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:3] == b"GIF" and payload[3:6] in (b"87a", b"89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF: no screen descriptor")
        return (
            "gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if payload.startswith(b"\xff\xd8"):
        i, n = 2, len(payload)
        while i + 4 <= n and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
                continue
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                if i + 9 > n:
                    raise ValueError("truncated JPEG SOF segment")
                return (
                    "jpeg",
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        raise ValueError("JPEG stream has no SOF frame header")
    raise ValueError("unrecognized image container (PNG/JPEG/GIF supported)")


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derives a fake (width,
    height) from the payload bytes. Replaces decode_image in tests
    and oracle-checked queries ONLY."""
    head = payload[0] if payload else 0
    return (1 + head % 64, 1 + len(payload) % 64)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per Arrow batch, vectorized metadata +
    (fake-)decode features from the binary payload column."""
    for pdf in batches:
        payloads = pdf["payload"]
        # a NULL payload (missing media) yields NULL features — the
        # same rows the SQL twin produces from length(NULL)/md5(NULL),
        # so downstream can count decode failures instead of crashing
        # (tests/test_null_values.py); nullable Int32 carries NULLs
        # through Arrow
        dims = payloads.map(
            lambda b: fake_decode_meta(b) if b is not None else (None, None)
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(
                    lambda b: len(b) if b is not None else None
                ).astype("Int32"),
                "head_byte": payloads.map(
                    lambda b: (b[0] if len(b) else 0) if b is not None else None
                ).astype("Int32"),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(b).hexdigest()
                    if b is not None
                    else None
                ),
                "fake_width": dims.map(lambda t: t[0]).astype("Int32"),
                "fake_height": dims.map(lambda t: t[1]).astype("Int32"),
            }
        )


def extract_media_features(binary_df: DataFrame) -> DataFrame:
    """The multimodal feature-extraction operator: binary column in,
    typed metadata out, Arrow-batched. Input needs (doc_id, payload
    binary)."""
    return binary_df.mapInPandas(_extract_batches, schema=MM_FEATURES_SCHEMA)


@query(
    "q_mm_extract",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS head_byte,
               md5(text) AS content_md5,
               CAST(1 + (ascii(substr(text, 1, 1)) % 64) AS INTEGER) AS fake_width,
               CAST(1 + (length(text) % 64) AS INTEGER) AS fake_height
        FROM documents
    """,
    tags=("multimodal", "extension", "pandas-udf"),
)
def q_mm_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction (X5): text → binary payload →
    mapInPandas metadata/decode — the full Arrow round-trip the real
    media pipeline uses, oracle-checked because the fake decode is
    deterministic. (Documents are ASCII, so octet length == char
    length lets the SQL twin exist at all.)"""
    docs = load_table(spark, sf_dir, "documents")
    binary_df = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return extract_media_features(binary_df)


MM_DIMS_SCHEMA = "doc_id bigint, format string, width int, height int"


def _image_dim_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker over (doc_id, payload): real header decode
    per payload via decode_image.  NULL payloads (legal per the
    registry's null-payload contract) yield NULL metadata instead of
    crashing the Python worker — mirroring _extract_batches."""
    for pdf in batches:
        decoded = pdf["payload"].map(
            lambda b: decode_image(b) if b is not None else (None, None, None)
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "format": decoded.map(lambda t: t[0]),
                "width": decoded.map(lambda t: t[1]).astype("Int32"),
                "height": decoded.map(lambda t: t[2]).astype("Int32"),
            }
        )


def extract_image_dims(binary_df: DataFrame) -> DataFrame:
    """Image-dimension scan: (doc_id, payload binary) → (doc_id,
    format, width, height) using the real stdlib header parser —
    the metadata pass a media-lakehouse ingest runs before any pixel
    work, Arrow-batched like extract_media_features."""
    return binary_df.mapInPandas(_image_dim_batches, schema=MM_DIMS_SCHEMA)


def _be32(col: Column) -> Column:
    """Big-endian u32 as 4 binary bytes (PNG chunk arithmetic)."""
    return F.unhex(F.lpad(F.hex(col), 8, "0"))


@query(
    "q_image_decode",
    oracle="""
        SELECT doc_id, 'png' AS format,
               CAST(doc_id % 64 + 1 AS INTEGER) AS width,
               CAST(n_chars % 64 + 1 AS INTEGER) AS height
        FROM documents
    """,
    tags=("multimodal", "extension", "pandas-udf"),
)
def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image-header decode (X5): each document is wrapped in a
    spec-faithful PNG container (signature + IHDR chunk) whose
    dimensions are derived from (doc_id, n_chars), built row-locally
    with JVM byte expressions — then decoded back through the REAL
    stdlib parser (decode_image) in an Arrow-batched mapInPandas
    pass.  The oracle recomputes the expected dimensions directly,
    so a hash match proves the encode→decode roundtrip is faithful:
    this is the plumbing a real media scan inherits unchanged, with
    only the payload source swapped.  (CRC bytes are zeroed — header
    parsing doesn't checksum; tests/test_operators.py covers fully
    valid zlib-CRC PNG plus JPEG/GIF bytes.)"""
    docs = load_table(spark, sf_dir, "documents")
    w = (F.col("doc_id") % 64 + 1).cast("bigint")
    h = (F.col("n_chars") % 64 + 1).cast("bigint")
    payload = F.concat(
        F.lit(_PNG_SIG),
        F.lit(bytes.fromhex("0000000d")),  # IHDR data length = 13
        F.lit(b"IHDR"),
        _be32(w),
        _be32(h),
        F.lit(bytes([8, 2, 0, 0, 0])),  # bit depth 8, truecolor
        F.lit(bytes(4)),  # CRC (unchecked by header parse)
    )
    return extract_image_dims(
        docs.select("doc_id", payload.alias("payload"))
    )


@query(
    "q_multimodal",
    oracle="""
        SELECT d.doc_id, d.lang, d.n_chars, e.label,
               round(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 3)
                 AS emb_norm
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.lang = 'en'
    """,
    tags=("multimodal", "extension"),
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly (X5): text metadata ⋈ vector column in
    one relation, filtered and feature-projected — the "one training
    sample, several modalities" join. At matched row counts this is a
    co-partitionable equi-join (bucket both tables by id at write
    time and it is shuffle-free)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.expr(
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "0D, (acc, v) -> acc + v))"
    )
    return (
        docs.filter(F.col("lang") == "en")
        .join(emb, docs.doc_id == emb.vec_id)
        .select("doc_id", "lang", "n_chars", "label", F.round(norm, 3).alias("emb_norm"))
    )


# ---- resize + frame-sample -------------------------------------------
#
# The two mandated media transform verbs are implemented for REAL by
# the X113/X114 transcode stages below (q_image_thumbnail /
# q_video_sample: decode -> resample/select -> re-encode through the
# certified GIF codecs).  The byte-level fake stand-ins from the X5
# plumbing era (fake_resize, the 32-byte fake frame container) were
# retired in r14 (VERDICT r13 #6) — no fake transform remains in the
# operator namespace.


# ---------------------------------------------------------------------------
# Real PNG PIXEL codec (r09 stretch — closes the last documented
# decode seam for PNG): pure stdlib (zlib + byte arithmetic), no
# codec library.  Truecolor 8-bit RGB, all five PNG filter types on
# both the encode and decode side, CRC-verified chunks.


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _predictor(ftype: int, raw: bytearray, prior: bytes, i: int, bpp: int) -> int:
    """Predicted value for byte i of the current scanline under
    filter `ftype`, given the RECONSTRUCTED current line so far
    (`raw`) and the reconstructed prior line — the shared core that
    makes _filter_line and _unfilter_line exact inverses."""
    left = raw[i - bpp] if i >= bpp else 0
    up = prior[i]
    upleft = prior[i - bpp] if i >= bpp else 0
    if ftype == 0:
        return 0
    if ftype == 1:
        return left
    if ftype == 2:
        return up
    if ftype == 3:
        return (left + up) // 2
    if ftype == 4:
        return _paeth(left, up, upleft)
    raise ValueError(f"unknown PNG filter type {ftype}")


def encode_png_rgb(width: int, height: int, rgb_rows: list[bytes]) -> bytes:
    """A REAL spec-conformant PNG writer: 8-bit truecolor scanlines
    → filtered (cycling through all five filter types, y % 5, so a
    decoder must implement every one) → one zlib stream → signature
    + IHDR/IDAT/IEND chunks with genuine CRC32s.  Pure stdlib."""
    import struct
    import zlib

    bpp = 3

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stream = bytearray()
    prior = bytes(width * bpp)
    for y in range(height):
        line = rgb_rows[y]
        ftype = y % 5
        stream.append(ftype)
        # filtering predicts from the RECONSTRUCTED (= raw) data
        raw = bytearray(line)
        for i in range(len(line)):
            stream.append((line[i] - _predictor(ftype, raw, prior, i, bpp)) & 0xFF)
        prior = line
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL pixel-level PNG decode, pure stdlib: chunk walk with CRC
    verification, concatenated-IDAT zlib inflate, scanline
    reconstruction for all five filter types (the exact inverse of
    encode_png_rgb's filtering), then integer channel sums —
    (width, height, sum_r, sum_g, sum_b).  Supports the 8-bit
    truecolor non-interlaced profile (the one encode_png_rgb and the
    synthetic fixtures emit); anything else raises ValueError, as a
    real ingest pass should on unsupported profiles rather than
    guessing."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, n = len(_PNG_SIG), len(payload)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG has no IHDR")
    width, height, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "unsupported PNG profile (8-bit truecolor non-interlaced only)"
        )
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, 3 * width
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    sums = [0, 0, 0]
    prior = bytes(stride)
    off = 0
    for _y in range(height):
        ftype = raw[off]
        off += 1
        line = bytearray(stride)
        for i in range(stride):
            line[i] = (
                raw[off + i] + _predictor(ftype, line, prior, i, bpp)
            ) & 0xFF
            sums[i % 3] += line[i]
        off += stride
        prior = bytes(line)
    return width, height, sums[0], sums[1], sums[2]


MM_PIXELS_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def _pixel_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker over (doc_id, n_chars): build the
    deterministic RGB image, encode it through the REAL PNG writer,
    decode it back through the REAL pixel decoder, emit the decoded
    channel sums.  The sums exist ONLY on the far side of a full
    zlib+filter roundtrip, so a hash match against the oracle's
    direct recomputation proves the codec end to end.  NULL inputs
    yield NULL features (the registry's null-payload contract)."""
    for pdf in batches:
        out = {
            "doc_id": [],
            "width": [],
            "height": [],
            "sum_r": [],
            "sum_g": [],
            "sum_b": [],
        }
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            if pd.isna(doc_id) or pd.isna(n_chars):
                out["doc_id"].append(None if pd.isna(doc_id) else int(doc_id))
                for k in ("width", "height", "sum_r", "sum_g", "sum_b"):
                    out[k].append(None)
                continue
            d, w, h = int(doc_id), int(doc_id) % 8 + 1, int(n_chars) % 8 + 1
            rows = [
                bytes(
                    v
                    for x in range(w)
                    for v in (
                        (d + 3 * x + 7 * y) % 256,
                        (2 * d + 5 * x + y) % 256,
                        (x * y + d) % 256,
                    )
                )
                for y in range(h)
            ]
            dw, dh, sr, sg, sb = decode_png_pixels(
                encode_png_rgb(w, h, rows)
            )
            out["doc_id"].append(d)
            out["width"].append(dw)
            out["height"].append(dh)
            out["sum_r"].append(sr)
            out["sum_g"].append(sg)
            out["sum_b"].append(sb)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="Int64"),
                "width": pd.Series(out["width"], dtype="Int32"),
                "height": pd.Series(out["height"], dtype="Int32"),
                "sum_r": pd.Series(out["sum_r"], dtype="Int64"),
                "sum_g": pd.Series(out["sum_g"], dtype="Int64"),
                "sum_b": pd.Series(out["sum_b"], dtype="Int64"),
            }
        )


@query(
    "q_image_pixels",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   doc_id % 8 + 1 AS w,
                   n_chars % 8 + 1 AS h,
                   (doc_id IS NOT NULL AND n_chars IS NOT NULL) AS ok
            FROM documents),
        px AS (
            SELECT doc_id, w, h,
                   (doc_id + 3 * x.i + 7 * y.i) % 256 AS r,
                   (2 * doc_id + 5 * x.i + y.i) % 256 AS g,
                   (x.i * y.i + doc_id) % 256 AS b
            FROM dims,
                 generate_series(0, 7) x(i),
                 generate_series(0, 7) y(i)
            WHERE ok AND x.i < w AND y.i < h),
        agg AS (
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width,
                   CAST(h AS INTEGER) AS height,
                   CAST(sum(r) AS BIGINT) AS sum_r,
                   CAST(sum(g) AS BIGINT) AS sum_g,
                   CAST(sum(b) AS BIGINT) AS sum_b
            FROM px
            GROUP BY doc_id, w, h)
        -- dims-level LEFT JOIN: a doc with a NULL doc_id/n_chars
        -- still emits a row with NULL features, matching the
        -- worker's null-payload contract (r09 ADVICE item)
        SELECT d.doc_id, a.width, a.height, a.sum_r, a.sum_g, a.sum_b
        FROM dims d
        LEFT JOIN agg a ON d.ok AND d.doc_id = a.doc_id
    """,
    tags=("multimodal", "extension", "pandas-udf", "pixels"),
)
def q_image_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-level PNG roundtrip (X5, r09 — the last documented
    decode seam closed for PNG): every document becomes a
    deterministic RGB image (dimensions and pixel values integer
    functions of doc_id / n_chars), encoded through a spec-faithful
    pure-stdlib PNG writer (zlib IDAT, genuine CRCs, ALL FIVE filter
    types cycling per scanline) and decoded back through the real
    pixel decoder (CRC-checked chunk walk, inflate, per-filter
    scanline reconstruction) inside one Arrow-batched mapInPandas
    pass.  The output channel sums exist only on the far side of the
    roundtrip, while the oracle recomputes them directly from the
    pixel formula — a hash match certifies the whole codec, not just
    the header path q_image_decode covers.

    Scale shape: one documents scan projecting two ints per row, one
    Python stage (the codec is inherently Python-side work — exactly
    what the mapInPandas seam is for), preceded by one two-int-per-row
    fan-out exchange so the codec stage runs at full parallelism
    (r16, guide §2.5/§4: the fixture parquet is 1-2 files and an
    Arrow stage inherits scan parallelism — the image_fingerprints
    lesson applied to the roundtrip queries; the payload is GENERATED
    inside the worker, so the exchange moves two ints per row at any
    scale)."""
    docs = load_table(spark, sf_dir, "documents")
    spark_ctx = docs.sparkSession.sparkContext
    return (
        docs.select("doc_id", "n_chars")
        .repartition(spark_ctx.defaultParallelism)
        .mapInPandas(_pixel_roundtrip_batches, schema=MM_PIXELS_SCHEMA)
    )


# ---------------------------------------------------------------------------
# X68 — REAL WAV/PCM audio codec roundtrip (r10)

_PCM_RATE = 16_000  # fixed sample rate for the synthetic fixtures


def encode_wav_pcm16(samples: list[int], rate: int = _PCM_RATE) -> bytes:
    """Spec-faithful mono 16-bit PCM WAV writer, pure stdlib: RIFF
    header, fmt chunk (PCM, 1 channel, 16-bit), data chunk of
    little-endian int16 frames — the audio twin of encode_png_rgb."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        # one bulk pack (r16, guide §4.2) — same bytes, same
        # struct.error on out-of-range values as the per-sample form
        w.writeframes(struct.pack(f"<{len(samples)}h", *map(int, samples)))
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, int, int]:
    """REAL WAV decode, pure stdlib: RIFF/fmt validation via the wave
    module, PCM frame unpack, integer sample statistics —
    (n_samples, sample_rate, sum_abs, sum_sq).  Only the mono 16-bit
    PCM profile the encoder emits is accepted; anything else raises
    ValueError, as a real ingest should on unsupported profiles."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("unsupported WAV profile (mono 16-bit only)")
        if w.getcomptype() != "NONE":
            raise ValueError("unsupported WAV compression")
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if len(raw) != 2 * n:
        raise ValueError("WAV frame data length mismatch")
    import numpy as np

    s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    return (n, rate, int(np.abs(s).sum()), int((s * s).sum()))


def decode_wav_samples(payload: bytes) -> tuple[int, int, tuple]:
    """REAL WAV decode returning the PCM samples themselves —
    (n_samples, sample_rate, samples) — for consumers that
    fingerprint the WAVEFORM rather than summarize it
    (audio_fingerprints below).  Same strict mono 16-bit PCM profile
    validation as decode_wav_pcm16."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("unsupported WAV profile (mono 16-bit only)")
        if w.getcomptype() != "NONE":
            raise ValueError("unsupported WAV compression")
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if len(raw) != 2 * n:
        raise ValueError("WAV frame data length mismatch")
    return n, rate, struct.unpack(f"<{n}h", raw)


MM_PCM_SCHEMA = (
    "doc_id bigint, n_samples int, sample_rate int, "
    "sum_abs bigint, sum_sq bigint"
)


def _pcm_roundtrip_batches(
    batches: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """mapInPandas worker over (doc_id, n_chars): build the
    deterministic int16 sample vector, encode through the REAL WAV
    writer, decode back through the real PCM reader, emit the decoded
    sample statistics.  The stats exist only on the far side of a
    full RIFF roundtrip (the q_image_pixels proof pattern).  NULL
    inputs yield NULL features (the registry's null-payload
    contract)."""
    for pdf in batches:
        out = {
            "doc_id": [],
            "n_samples": [],
            "sample_rate": [],
            "sum_abs": [],
            "sum_sq": [],
        }
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            if pd.isna(doc_id) or pd.isna(n_chars):
                out["doc_id"].append(
                    None if pd.isna(doc_id) else int(doc_id)
                )
                for k in ("n_samples", "sample_rate", "sum_abs", "sum_sq"):
                    out[k].append(None)
                continue
            d, n = int(doc_id), int(n_chars) % 32 + 8
            samples = [
                ((d * 7 + i * 13) % 65536) - 32768 for i in range(n)
            ]
            dn, dr, sa, sq = decode_wav_pcm16(encode_wav_pcm16(samples))
            out["doc_id"].append(d)
            out["n_samples"].append(dn)
            out["sample_rate"].append(dr)
            out["sum_abs"].append(sa)
            out["sum_sq"].append(sq)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="Int64"),
                "n_samples": pd.Series(out["n_samples"], dtype="Int32"),
                "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                "sum_abs": pd.Series(out["sum_abs"], dtype="Int64"),
                "sum_sq": pd.Series(out["sum_sq"], dtype="Int64"),
            }
        )


@query(
    "q_audio_pcm",
    oracle=f"""
        WITH dims AS (
            -- pmod on both sides: Python's % is already non-negative
            -- for a positive divisor, DuckDB's follows the dividend's
            -- sign — the double-mod keeps the engines identical even
            -- for negative n_chars / doc_id (r10 ADVICE)
            SELECT doc_id,
                   ((n_chars % 32) + 32) % 32 + 8 AS n,
                   (doc_id IS NOT NULL AND n_chars IS NOT NULL) AS ok
            FROM documents),
        px AS (
            SELECT doc_id, n,
                   ((((doc_id * 7 + g.i * 13) % 65536) + 65536) % 65536)
                       - 32768 AS s
            FROM dims, generate_series(0, 39) g(i)
            WHERE ok AND g.i < n),
        agg AS (
            SELECT doc_id,
                   CAST(n AS INTEGER) AS n_samples,
                   CAST({_PCM_RATE} AS INTEGER) AS sample_rate,
                   CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
                   CAST(sum(s * s) AS BIGINT) AS sum_sq
            FROM px
            GROUP BY doc_id, n)
        SELECT d.doc_id, a.n_samples, a.sample_rate, a.sum_abs, a.sum_sq
        FROM dims d
        LEFT JOIN agg a ON d.ok AND d.doc_id = a.doc_id
    """,
    tags=("multimodal", "extension", "pandas-udf", "audio"),
)
def q_audio_pcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV/PCM audio roundtrip (X68 — the audio seam closed the
    way r09 closed PNG): every document becomes a deterministic mono
    int16 sample vector (pure integer function of doc_id / n_chars),
    encoded through a spec-faithful stdlib WAV writer (RIFF + fmt +
    little-endian PCM frames) and decoded back through the real
    reader (profile validation, frame unpack) inside one
    Arrow-batched mapInPandas pass.  The emitted sample statistics
    (count, rate, Σ|s|, Σs²) exist only on the far side of the
    container roundtrip, while the oracle recomputes them directly
    from the sample formula — a hash match certifies the codec, not
    a fake.  NULL doc_id / n_chars rows emit NULL features (the
    q_image_pixels dims-level LEFT JOIN contract).

    Scale shape: one documents scan projecting two ints per row, one
    two-int fan-out exchange (r16, guide §2.5/§4 — the
    image_fingerprints scan-parallelism lesson; the payload is
    generated inside the worker), one Python stage."""
    docs = load_table(spark, sf_dir, "documents")
    spark_ctx = docs.sparkSession.sparkContext
    return (
        docs.select("doc_id", "n_chars")
        .repartition(spark_ctx.defaultParallelism)
        .mapInPandas(_pcm_roundtrip_batches, schema=MM_PCM_SCHEMA)
    )


# ---------------------------------------------------------------------------
# X78 — REAL baseline-JFIF (JPEG) grayscale codec roundtrip (r11)
#
# The last multimodal seam with only header-level coverage
# (q_image_decode reads SOF dimensions; VERDICT r10 item 7).  This is
# a spec-faithful ITU T.81 baseline sequential DCT codec for the
# 8-bit single-component (grayscale, 1x1 sampling) profile, pure
# stdlib + numpy: real marker structure (SOI/APP0/DQT/SOF0/DHT/SOS/
# EOI), the standard Annex K luminance Huffman tables, canonical
# code construction, byte stuffing, DC prediction, zigzag, and a
# separable float64 DCT/IDCT pair.
#
# Exactness argument (what lets a LOSSY codec be hash-certified):
# the fixture images are CONSTANT PER 8x8 BLOCK and the quantization
# table is all ones, so the FDCT of every block is a single DC
# coefficient 8*(v-128) (the AC terms are ~1e-13 float residue that
# the coefficient round snaps to exactly 0) and the IDCT recovers v
# to within ~1e-13 before the pixel round — the roundtrip is
# bit-exact BY CONSTRUCTION for this image class while every
# container/entropy/prediction stage runs for real.  Arbitrary AC
# coefficients are covered at the entropy layer by a direct
# coefficient roundtrip test (tests/test_operators.py) — ZRL runs,
# EOB, high categories — where no DCT is involved.

_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)
# ITU T.81 Annex K.3: luminance DC (categories 0..11)
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
# Annex K.5: luminance AC (162 run/size symbols)
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = tuple(
    int(h, 16)
    for h in (
        "01 02 03 00 04 11 05 12 21 31 41 06 13 51 61 07 22 71 14 32 "
        "81 91 a1 08 23 42 b1 c1 15 52 d1 f0 24 33 62 72 82 09 0a 16 "
        "17 18 19 1a 25 26 27 28 29 2a 34 35 36 37 38 39 3a 43 44 45 "
        "46 47 48 49 4a 53 54 55 56 57 58 59 5a 63 64 65 66 67 68 69 "
        "6a 73 74 75 76 77 78 79 7a 83 84 85 86 87 88 89 8a 92 93 94 "
        "95 96 97 98 99 9a a2 a3 a4 a5 a6 a7 a8 a9 aa b2 b3 b4 b5 b6 "
        "b7 b8 b9 ba c2 c3 c4 c5 c6 c7 c8 c9 ca d2 d3 d4 d5 d6 d7 d8 "
        "d9 da e1 e2 e3 e4 e5 e6 e7 e8 e9 ea f1 f2 f3 f4 f5 f6 f7 f8 "
        "f9 fa"
    ).split()
)


@functools.lru_cache(maxsize=64)
def _jpeg_canonical_codes(bits, vals):
    """symbol -> (code, length) via the T.81 canonical construction
    (Figures C.1-C.3): counts per length, codes assigned in value
    order, doubled between lengths.  lru_cache'd (r16, guide §4.5):
    the tables are pure functions of (bits, vals) tuples and were
    being rebuilt per image inside the codec stage.  INVARIANT: the
    returned dict is shared by every later call with the same key —
    callers must treat it as read-only (mutating it would corrupt
    the cache for every subsequent image)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return codes


_JPEG_DCT_A = None


def _jpeg_dct_matrix():
    """A[u, x] = c(u)/2 * cos((2x+1)*u*pi/16) — FDCT is A @ P @ A.T
    over level-shifted pixels, IDCT is A.T @ S @ A (orthonormal).
    Built once per process (r16, guide §4.5): the matrix is a
    constant and was being rebuilt per image inside the codec
    stage."""
    global _JPEG_DCT_A
    if _JPEG_DCT_A is None:
        import math

        import numpy as np

        a = np.zeros((8, 8))
        for u in range(8):
            cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
            for x in range(8):
                a[u, x] = cu / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16)
        a.setflags(write=False)
        _JPEG_DCT_A = a
    return _JPEG_DCT_A


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, extend-bits) per T.81 F.1.2.1: category is the bit
    length of |v|; negative values store v + 2^cat - 1."""
    cat = abs(v).bit_length()
    return cat, (v if v >= 0 else v + (1 << cat) - 1)


def _jpeg_entropy_encode(coef_blocks: list[list[int]]) -> bytes:
    """Entropy-code quantized coefficient blocks (each 64 ints in
    NATURAL order) with the Annex K luminance tables: DC prediction +
    category bits, AC run/size with ZRL and EOB.  Exposed separately
    so the AC Huffman layer is testable with arbitrary coefficients
    (no DCT in the loop)."""
    dc = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    pred = 0
    for blk in coef_blocks:
        diff = blk[0] - pred
        pred = blk[0]
        cat, bits = _jpeg_magnitude(diff)
        c, ln = dc[cat]
        w.put(c, ln)
        if cat:
            w.put(bits, cat)
        zz = [blk[_JPEG_ZIGZAG[k]] for k in range(64)]
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac[0xF0]  # ZRL: 16 zeros
                w.put(c, ln)
                run -= 16
            cat, bits = _jpeg_magnitude(zz[k])
            c, ln = ac[(run << 4) | cat]
            w.put(c, ln)
            w.put(bits, cat)
            run = 0
        if last_nz < 63:
            c, ln = ac[0x00]  # EOB
            w.put(c, ln)
    return w.flush()


def encode_jpeg_gray(width: int, height: int, rows: list[bytes]) -> bytes:
    """Spec-faithful baseline-JFIF encoder for 8-bit grayscale:
    replicate-pad to 8x8 MCUs, separable float64 FDCT, unit
    quantization table, Annex K Huffman entropy coding, full marker
    structure.  ``rows`` is ``height`` rows of ``width`` bytes."""
    import struct

    import numpy as np

    img = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(
        height, width
    )
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    padded[:height, :width] = img
    if width < bw * 8:  # replicate-pad right edge
        padded[:height, width:] = padded[:height, width - 1 : width]
    if height < bh * 8:  # replicate-pad bottom edge
        padded[height:, :] = padded[height - 1 : height, :]
    a = _jpeg_dct_matrix()
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            p = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            s = a @ p @ a.T
            blocks.append([int(v) for v in np.round(s).astype(np.int64).ravel()])
    scan = _jpeg_entropy_encode(blocks)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00" + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += seg(0xFFDB, b"\x00" + bytes([1] * 64))  # DQT 0: unit table
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0)),
    )  # SOF0: 8-bit, 1 component, 1x1 sampling, qtable 0
    out += seg(
        0xFFC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS),
    )  # DHT class 0 id 0
    out += seg(
        0xFFC4,
        b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )  # DHT class 1 id 0
    out += seg(0xFFDA, bytes((1, 1, 0x00, 0, 63, 0)))  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


@functools.lru_cache(maxsize=64)
def _jpeg_decode_tables(bits, vals):
    """16-bit-peek Huffman LUT from the canonical construction:
    lut[peek16] = (symbol << 5) | code_length for every 16-bit window
    whose prefix is that code, 0 where no code of length <= 16
    matches.  One array index replaces the former per-bit dict-probe
    loop (r17, VERDICT item 5 — the entropy decoder was the last
    bit-at-a-time Python in the JPEG path; differential-tested
    byte-identical, ~4x on the entropy stage).  lru_cache'd (r16,
    guide §4.5) — pure function of the parsed (bits, vals) tuples —
    and the returned array is marked read-only, so accidental caller
    mutation of the shared cache entry raises instead of corrupting
    every subsequent image (r16 ADVICE)."""
    import numpy as np

    lut = np.zeros(1 << 16, dtype=np.int32)
    for sym, (code, ln) in _jpeg_canonical_codes(bits, vals).items():
        base = code << (16 - ln)
        lut[base : base + (1 << (16 - ln))] = (sym << 5) | ln
    lut.setflags(write=False)
    return lut


def _jpeg_extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _jpeg_entropy_decode(
    data: bytes, off: int, n_blocks: int, dc_table, ac_table
) -> list[list[int]]:
    """Inverse of _jpeg_entropy_encode: n_blocks coefficient blocks
    in natural order (DC prediction undone, zigzag unwound).

    r17 bulk reader: the entropy segment is delimited (first 0xFF not
    followed by a stuffing 0x00) and unstuffed ONCE with bytes.replace,
    then decoding keeps an integer bit accumulator refilled a byte at
    a time — each Huffman symbol is one 16-bit peek + one LUT index
    (dc_table/ac_table from _jpeg_decode_tables), each value field one
    masked shift, instead of the former per-BIT loop over a dict of
    (length, code) probes.  Identical decode by construction
    (differential-tested on randomized blocks incl. ZRL/EOB/category
    extremes and stuffed-0xFF streams); truncated or marker-corrupted
    segments still raise ValueError."""
    n = len(data)
    p = off
    while True:
        q = data.find(b"\xff", p)
        if q == -1:
            end = n
            break
        if q + 1 < n and data[q + 1] == 0x00:
            p = q + 2
            continue
        end = q
        break
    seg = bytes(data[off:end]).replace(b"\xff\x00", b"\xff")
    m = len(seg)
    acc = 0
    nbits = 0
    pos = 0
    zigzag = _JPEG_ZIGZAG
    pred = 0
    blocks = []

    def read_sym(lut) -> int:
        nonlocal acc, nbits, pos
        while nbits < 16 and pos < m:
            acc = (acc << 8) | seg[pos]
            pos += 1
            nbits += 8
        peek = (
            (acc << (16 - nbits)) if nbits < 16 else (acc >> (nbits - 16))
        ) & 0xFFFF
        v = int(lut[peek])
        if v == 0:
            raise ValueError("jpeg: invalid Huffman code")
        ln = v & 31
        if ln > nbits:
            raise ValueError("jpeg: truncated entropy segment")
        nbits -= ln
        acc &= (1 << nbits) - 1
        return v >> 5

    def read_bits(k: int) -> int:
        nonlocal acc, nbits, pos
        if k == 0:
            return 0
        while nbits < k:
            if pos >= m:
                raise ValueError("jpeg: truncated entropy segment")
            acc = (acc << 8) | seg[pos]
            pos += 1
            nbits += 8
        nbits -= k
        out = (acc >> nbits) & ((1 << k) - 1)
        acc &= (1 << nbits) - 1
        return out

    for _ in range(n_blocks):
        zz = [0] * 64
        cat = read_sym(dc_table)
        pred += _jpeg_extend(read_bits(cat), cat)
        zz[0] = pred
        k = 1
        while k < 64:
            rs = read_sym(ac_table)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                raise ValueError("jpeg: AC run past block end")
            zz[k] = _jpeg_extend(read_bits(rs & 15), rs & 15)
            k += 1
        blk = [0] * 64
        for k in range(64):
            blk[zigzag[k]] = zz[k]
        blocks.append(blk)
    return blocks


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, int, int]:
    """Real baseline-JFIF decoder for the 8-bit grayscale 1x1
    profile: marker walk, DQT/DHT/SOF0 parse with profile
    validation, Huffman entropy decode with unstuffing, dequantize,
    IDCT, level shift + clamp, crop to the SOF dimensions.  Returns
    (width, height, sum_pix, sum_sq) over the cropped image.
    Rejects progressive (SOF2), multi-component, subsampled, or
    non-8-bit streams."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qtables: dict[int, list[int]] = {}
    dc_table = ac_table = None
    width = height = None
    off = 2
    while off < len(payload):
        if payload[off] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[off + 1]
        off += 2
        if marker == 0xD9:  # EOI without a scan
            raise ValueError("jpeg: no scan data")
        ln = struct.unpack(">H", payload[off : off + 2])[0]
        body = payload[off + 2 : off + ln]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                if body[p] >> 4 != 0:
                    raise ValueError("jpeg: 16-bit DQT unsupported")
                qtables[body[p] & 15] = list(body[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 15
                bits = tuple(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = tuple(body[p + 17 : p + 17 + nv])
                tab = _jpeg_decode_tables(bits, vals)
                if cls == 0 and tid == 0:
                    dc_table = tab
                elif cls == 1 and tid == 0:
                    ac_table = tab
                p += 17 + nv
        elif marker == 0xC0:
            prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("jpeg: only 8-bit grayscale supported")
            if body[7] != 0x11:
                raise ValueError("jpeg: subsampling unsupported")
            qid = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: non-baseline SOF unsupported")
        elif marker == 0xDA:
            # qid is defined by the SOF parse, so the quant-table check
            # belongs with the other SOS preconditions — a stream with
            # SOS before any DQT must fail the ValueError contract, not
            # KeyError at qtables[qid] (ADVICE r11).
            if (
                width is None
                or dc_table is None
                or ac_table is None
                or qid not in qtables
            ):
                raise ValueError("jpeg: SOS before SOF/DHT/DQT")
            scan_off = off + ln
            bw, bh = (width + 7) // 8, (height + 7) // 8
            blocks = _jpeg_entropy_decode(
                payload, scan_off, bw * bh, dc_table, ac_table
            )
            q = np.array(qtables[qid], dtype=np.float64)
            # DQT stores the table in zigzag order; unwind to natural
            qn = np.zeros(64)
            for k in range(64):
                qn[_JPEG_ZIGZAG[k]] = q[k]
            a = _jpeg_dct_matrix()
            # batched IDCT (r17): one stacked matmul pair over all
            # blocks replaces the per-block Python loop — np.matmul
            # broadcasts (8,8) @ (n,8,8), the same per-slice product
            # as the loop (differential-tested identical stats);
            # raster assembly is a transpose+reshape
            s = np.array(blocks, dtype=np.float64).reshape(-1, 64) * qn
            p = np.round(a.T @ s.reshape(-1, 8, 8) @ a) + 128.0
            tiles = np.clip(p, 0, 255).astype(np.int64)
            img = (
                tiles.reshape(bh, bw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw * 8)
            )
            crop = img[:height, :width]
            return (
                int(width),
                int(height),
                int(crop.sum()),
                int((crop * crop).sum()),
            )
        off += ln
    raise ValueError("jpeg: no SOS marker")


MM_JPEG_SCHEMA = (
    "doc_id bigint, width int, height int, sum_pix bigint, sum_sq bigint"
)


def _jpeg_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker over (doc_id, n_chars): build the
    deterministic block-constant grayscale image, encode through the
    REAL baseline-JFIF writer, decode back through the real decoder
    (markers, Huffman, dequant, IDCT, crop), emit the decoded pixel
    statistics — which exist only on the far side of the full
    roundtrip (the q_image_pixels proof pattern).  NULL inputs yield
    NULL features."""
    for pdf in batches:
        out = {
            "doc_id": [], "width": [], "height": [],
            "sum_pix": [], "sum_sq": [],
        }
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            if pd.isna(doc_id) or pd.isna(n_chars):
                out["doc_id"].append(
                    None if pd.isna(doc_id) else int(doc_id)
                )
                for k in ("width", "height", "sum_pix", "sum_sq"):
                    out[k].append(None)
                continue
            d = int(doc_id)
            w = ((int(doc_id) % 12) + 12) % 12 + 5
            h = ((int(n_chars) % 12) + 12) % 12 + 5
            rows = [
                bytes(
                    (((d * 11 + (x // 8) * 5 + (y // 8) * 3) % 256) + 256)
                    % 256
                    for x in range(w)
                )
                for y in range(h)
            ]
            dw, dh, sp, sq = decode_jpeg_gray(encode_jpeg_gray(w, h, rows))
            out["doc_id"].append(d)
            out["width"].append(dw)
            out["height"].append(dh)
            out["sum_pix"].append(sp)
            out["sum_sq"].append(sq)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="Int64"),
                "width": pd.Series(out["width"], dtype="Int32"),
                "height": pd.Series(out["height"], dtype="Int32"),
                "sum_pix": pd.Series(out["sum_pix"], dtype="Int64"),
                "sum_sq": pd.Series(out["sum_sq"], dtype="Int64"),
            }
        )


@query(
    "q_image_jpeg",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   ((doc_id % 12) + 12) % 12 + 5 AS w,
                   ((n_chars % 12) + 12) % 12 + 5 AS h,
                   (doc_id IS NOT NULL AND n_chars IS NOT NULL) AS ok
            FROM documents),
        blk AS (
            SELECT doc_id, w, h,
                   (((doc_id * 11 + bx.i * 5 + by.i * 3) % 256) + 256)
                       % 256 AS v,
                   least(8, w - bx.i * 8) * least(8, h - by.i * 8)
                       AS n_px
            FROM dims,
                 generate_series(0, 2) bx(i),
                 generate_series(0, 2) by(i)
            WHERE ok AND bx.i * 8 < w AND by.i * 8 < h),
        agg AS (
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width,
                   CAST(h AS INTEGER) AS height,
                   CAST(sum(n_px * v) AS BIGINT) AS sum_pix,
                   CAST(sum(n_px * v * v) AS BIGINT) AS sum_sq
            FROM blk
            GROUP BY doc_id, w, h)
        SELECT d.doc_id, a.width, a.height, a.sum_pix, a.sum_sq
        FROM dims d
        LEFT JOIN agg a ON d.ok AND d.doc_id = a.doc_id
    """,
    tags=("multimodal", "extension", "pandas-udf", "jpeg", "pixels"),
)
def q_image_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JFIF (JPEG) roundtrip (X78) — closes the last
    multimodal seam that had only header coverage: every document
    becomes a deterministic block-constant grayscale image (5..16 px
    per side, so non-multiple-of-8 dimensions exercise the
    replicate-pad + crop path), encoded through a spec-faithful
    T.81 baseline encoder (real Annex K Huffman tables, canonical
    code construction, byte stuffing, DC prediction, zigzag,
    separable float64 FDCT, full JFIF marker structure) and decoded
    back through the real decoder inside one Arrow-batched
    mapInPandas pass.  Block-constant pixels + a unit quantization
    table make the lossy pipeline bit-exact BY CONSTRUCTION (each
    block is a single DC coefficient; see the module comment), so
    the oracle can recompute the decoded statistics directly from
    the block-value formula — a hash match certifies the whole
    codec.  The AC Huffman layer (runs, ZRL, EOB, high categories)
    is covered by a direct coefficient roundtrip pytest.  NULL
    doc_id / n_chars rows emit NULL features (dims-level LEFT JOIN
    contract).

    Scale shape: one documents scan projecting two ints per row, one
    two-int fan-out exchange (r16, guide §2.5/§4 — the
    image_fingerprints scan-parallelism lesson; the payload is
    generated inside the worker), one Python stage."""
    docs = load_table(spark, sf_dir, "documents")
    spark_ctx = docs.sparkSession.sparkContext
    return (
        docs.select("doc_id", "n_chars")
        .repartition(spark_ctx.defaultParallelism)
        .mapInPandas(_jpeg_roundtrip_batches, schema=MM_JPEG_SCHEMA)
    )


# ---------------------------------------------------------------------------
# X80 — REAL GIF87a (LZW) codec roundtrip (r11)
#
# The last codec seam: a spec-faithful GIF87a 8-bit grayscale codec,
# pure stdlib — logical screen descriptor, 256-entry global color
# table, image descriptor, REAL variable-width LZW with clear/EOI
# codes, dictionary growth to 4096 with mid-stream resets, LSB-first
# bit packing, 255-byte sub-block framing.  LZW is LOSSLESS, so the
# roundtrip is bit-exact for ARBITRARY pixel patterns — no
# block-constant restriction like the (inherently lossy) JPEG seam.

_GIF_MCS = 8  # LZW minimum code size for a 256-color image
# the 256-entry grayscale identity palette, built once (r16 §4.2)
_GIF_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def _gif_lzw_compress(data: bytes) -> bytes:
    """The LZW code stream (pre-sub-block-framing) for one image's
    index data: dictionary build, growing code width, 4096-entry
    reset, and the decoder-mirror width bump on EOI.  Extracted from
    encode_gif_gray in r13 so the animation encoder shares the
    certified body byte-for-byte — the single-image output is
    unchanged."""
    clear, eoi = 1 << _GIF_MCS, (1 << _GIF_MCS) + 1
    codes = bytearray()
    acc = nbits = 0

    def put(code: int, width_: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first packing
        nbits += width_
        while nbits >= 8:
            codes.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    cw = _GIF_MCS + 1
    # int-key dictionary (r16, guide §4.2): each table string is
    # identified by its code, so the string (prefix + byte) is the
    # key (prefix_code << 8) | byte — no per-input-byte ``bytes``
    # allocation or O(len) concatenation.  Single-byte strings are
    # their own codes (identity), so only multi-byte sequences live
    # in the dict; the emitted code stream is byte-identical to the
    # former bytes-keyed form.
    table: dict[int, int] = {}
    next_code = eoi + 1
    put(clear, cw)
    if not data:  # mirror the bytes-keyed form's empty-input error
        raise KeyError(b"")
    cur = data[0]
    for b in data[1:]:
        key = (cur << 8) | b
        nxt = table.get(key)
        if nxt is not None:
            cur = nxt
            continue
        put(cur, cw)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << cw) + 1 and cw < 12:
            cw += 1
        if next_code == 4097:  # table full: reset (real GIF behavior)
            put(clear, cw)
            table = {}
            next_code = eoi + 1
            cw = _GIF_MCS + 1
        cur = b
    put(cur, cw)
    # The decoder's table lags the encoder's by one: while processing
    # this final data code it appends one more entry (index
    # next_code-1) and applies its width-bump rule BEFORE reading the
    # next code, so EOI must be written at the width the decoder will
    # read it with.  Without this mirror-bump, a stream whose final
    # append lands exactly on index (1<<cw)-1 has the decoder read EOI
    # one bit wider than written (ADVICE r11: truncation at an exact
    # bump boundary, e.g. a 255-px all-distinct-bigram ramp).  The
    # power-of-two condition implies next_code > 258, i.e. the decoder
    # really did append (its first post-clear code appends nothing).
    if next_code == (1 << cw) and cw < 12:
        cw += 1
    put(eoi, cw)
    if nbits:
        codes.append(acc & 0xFF)
    return bytes(codes)


def _gif_subblocks(codes: bytes) -> bytes:
    """255-byte sub-block framing + block terminator for one image's
    LZW code stream."""
    out = bytearray()
    for off in range(0, len(codes), 255):
        chunk = codes[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_gray(width: int, height: int, rows: list[bytes]) -> bytes:
    """GIF87a encoder for 8-bit grayscale: identity palette, one
    image, real LZW compression (dictionary, growing code width,
    4096-entry reset)."""
    import struct

    out = bytearray(b"GIF87a")
    # logical screen descriptor: global table, 8 bits/channel, 256
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += _GIF_GRAY_PALETTE  # grayscale identity palette
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(_GIF_MCS)
    out += _gif_subblocks(_gif_lzw_compress(b"".join(rows)))
    out += b"\x3b"  # trailer
    return bytes(out)


_GIF_BASE_TABLES: dict[int, list] = {}


def _gif_base_table(mcs: int) -> list:
    """The initial LZW string table for ``mcs`` (single-byte entries
    plus clear/EOI placeholders), built once per code size and
    list.copy()'d per clear — the per-reset reconstruction cost was
    256 ``bytes`` allocations per image (r16, guide §4.2)."""
    t = _GIF_BASE_TABLES.get(mcs)
    if t is None:
        t = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
        _GIF_BASE_TABLES[mcs] = t
    return t


def _gif_lzw_decompress(data: bytes, mcs: int) -> bytearray:
    """Variable-width LSB-first LZW decode (clear/EOI, the KwKwK
    case, decoder-side width bump) for one image's reassembled code
    bytes -> index stream.  Extracted from decode_gif_gray_pixels in
    r13 so the animation decoder shares the certified body."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    cw = mcs + 1
    base = _gif_base_table(mcs)
    table: list[bytes] = base.copy()
    acc = nbits = pos = 0
    prev = None
    pixels = bytearray()
    n_data = len(data)
    mask = (1 << cw) - 1

    # the read loop is inlined with local-variable state (r16, guide
    # §4.2): the per-code function-call overhead dominated decode time
    # at ~one call per emitted code; semantics are unchanged
    while True:
        while nbits < cw:
            if pos >= n_data:
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & mask
        acc >>= cw
        nbits -= cw
        if code == clear:
            table = base.copy()
            cw = mcs + 1
            mask = (1 << cw) - 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        if prev is not None and len(table) - 1 == (1 << cw) - 1 \
                and cw < 12:
            cw += 1
            mask = (1 << cw) - 1
        pixels += entry
        prev = entry
    return pixels


def decode_gif_gray_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Real GIF87a/89a decoder for the 8-bit grayscale single-image
    profile: screen/image descriptor parse, sub-block reassembly,
    variable-width LSB-first LZW with clear/EOI and the KwKwK case,
    palette application.  Returns (width, height, row-major grayscale
    pixel bytes) — the full decoded raster, consumed by the aggregate
    wrapper decode_gif_gray (q_image_gif) and by the perceptual
    fingerprint stage (q_image_dedup, which hashes DECODED pixels so
    the codec sits inside the certified path).  Rejects interlaced
    images, local color tables, and non-grayscale palettes."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh, packed, _, _ = struct.unpack("<HHBBB", payload[6:13])
    off = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        palette = payload[off : off + 3 * n]
        off += 3 * n
    while off < len(payload):
        b = payload[off]
        if b == 0x21:  # extension: skip sub-blocks
            off += 2
            while payload[off]:
                off += 1 + payload[off]
            off += 1
        elif b == 0x2C:
            left, top, width, height, ipacked = struct.unpack(
                "<HHHHB", payload[off + 1 : off + 10]
            )
            off += 10
            if ipacked & 0x40:
                raise ValueError("gif: interlaced unsupported")
            if ipacked & 0x80:
                raise ValueError("gif: local color table unsupported")
            if palette is None:
                raise ValueError("gif: no color table")
            # slice-compare the three channel planes at C speed (r16,
            # guide §4.2) — same grayscale validation, no per-entry
            # Python loop
            gray = palette[0::3]
            if palette[1::3] != gray or palette[2::3] != gray:
                raise ValueError("gif: non-grayscale palette")
            mcs = payload[off]
            off += 1
            data = bytearray()
            while payload[off]:
                ln = payload[off]
                data += payload[off + 1 : off + 1 + ln]
                off += 1 + ln
            off += 1
            pixels = _gif_lzw_decompress(bytes(data), mcs)
            if len(pixels) != width * height:
                raise ValueError("gif: pixel count mismatch")
            # palette application via bytes.translate (r16, guide
            # §4.2) when the table is full-width; short palettes keep
            # the indexing form (preserving the out-of-range error)
            if len(gray) == 256:
                mapped = bytes(pixels).translate(gray)
            else:
                mapped = bytes(gray[idx] for idx in pixels)
            return (int(width), int(height), mapped)
        elif b == 0x3B:
            raise ValueError("gif: no image block")
        else:
            raise ValueError("gif: unknown block")
    raise ValueError("gif: truncated")


def decode_gif_gray(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, sum_pix, sum_sq) over the decoded grayscale
    pixels — the aggregate view q_image_gif certifies; a thin
    reduction over decode_gif_gray_pixels so exactly ONE spec-walk
    body exists for both the roundtrip query and the perceptual
    fingerprint stage."""
    import numpy as np

    width, height, px = decode_gif_gray_pixels(payload)
    a = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
    return (width, height, int(a.sum()), int((a * a).sum()))


MM_GIF_SCHEMA = (
    "doc_id bigint, width int, height int, sum_pix bigint, sum_sq bigint"
)


def _gif_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker over (doc_id, n_chars): deterministic
    ARBITRARY-pattern grayscale image -> real GIF87a/LZW encode ->
    real decode -> decoded pixel statistics (q_image_pixels proof
    pattern; LZW is lossless so no pixel restriction).  NULL inputs
    yield NULL features."""
    for pdf in batches:
        out = {
            "doc_id": [], "width": [], "height": [],
            "sum_pix": [], "sum_sq": [],
        }
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            if pd.isna(doc_id) or pd.isna(n_chars):
                out["doc_id"].append(
                    None if pd.isna(doc_id) else int(doc_id)
                )
                for k in ("width", "height", "sum_pix", "sum_sq"):
                    out[k].append(None)
                continue
            d = int(doc_id)
            w = ((int(doc_id) % 14) + 14) % 14 + 3
            h = ((int(n_chars) % 14) + 14) % 14 + 3
            rows = [
                bytes(
                    (((d * 13 + 7 * x + 11 * y) % 256) + 256) % 256
                    for x in range(w)
                )
                for y in range(h)
            ]
            dw, dh, sp, sq = decode_gif_gray(encode_gif_gray(w, h, rows))
            out["doc_id"].append(d)
            out["width"].append(dw)
            out["height"].append(dh)
            out["sum_pix"].append(sp)
            out["sum_sq"].append(sq)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="Int64"),
                "width": pd.Series(out["width"], dtype="Int32"),
                "height": pd.Series(out["height"], dtype="Int32"),
                "sum_pix": pd.Series(out["sum_pix"], dtype="Int64"),
                "sum_sq": pd.Series(out["sum_sq"], dtype="Int64"),
            }
        )


@query(
    "q_image_gif",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   ((doc_id % 14) + 14) % 14 + 3 AS w,
                   ((n_chars % 14) + 14) % 14 + 3 AS h,
                   (doc_id IS NOT NULL AND n_chars IS NOT NULL) AS ok
            FROM documents),
        px AS (
            SELECT doc_id, w, h,
                   (((doc_id * 13 + 7 * x.i + 11 * y.i) % 256) + 256)
                       % 256 AS v
            FROM dims,
                 generate_series(0, 16) x(i),
                 generate_series(0, 16) y(i)
            WHERE ok AND x.i < w AND y.i < h),
        agg AS (
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width,
                   CAST(h AS INTEGER) AS height,
                   CAST(sum(v) AS BIGINT) AS sum_pix,
                   CAST(sum(v * v) AS BIGINT) AS sum_sq
            FROM px
            GROUP BY doc_id, w, h)
        SELECT d.doc_id, a.width, a.height, a.sum_pix, a.sum_sq
        FROM dims d
        LEFT JOIN agg a ON d.ok AND d.doc_id = a.doc_id
    """,
    tags=("multimodal", "extension", "pandas-udf", "gif", "pixels"),
)
def q_image_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF87a/LZW roundtrip (X80) — closes the LAST codec seam
    (PNG r09, WAV r10, JPEG r11 earlier this round): every document
    becomes a deterministic arbitrary-pattern grayscale image (3..16
    px per side), encoded through a spec-faithful GIF87a writer
    (identity palette, real variable-width LZW with dictionary
    growth, clear/EOI codes and 4096-entry resets, LSB-first bit
    packing, sub-block framing) and decoded back through the real
    reader (incl. the KwKwK case) inside one Arrow-batched
    mapInPandas pass.  LZW is lossless, so unlike the JPEG seam no
    pixel restriction is needed — the oracle recomputes the decoded
    stats directly from the pixel formula, and a hash match
    certifies the full compression stack.  NULL doc_id / n_chars
    rows emit NULL features.

    Scale shape: one documents scan projecting two ints per row, one
    two-int fan-out exchange (r16, guide §2.5/§4 — the
    image_fingerprints scan-parallelism lesson; the payload is
    generated inside the worker), one Python stage."""
    docs = load_table(spark, sf_dir, "documents")
    spark_ctx = docs.sparkSession.sparkContext
    return (
        docs.select("doc_id", "n_chars")
        .repartition(spark_ctx.defaultParallelism)
        .mapInPandas(_gif_roundtrip_batches, schema=MM_GIF_SCHEMA)
    )


# ---------------------------------------------------------------------------
# X89 — image near-duplicate detection (perceptual dHash, r12)
#
# The multimodal dedup seam: re-encoded / retouched copies of the
# same image carry different bytes (so exact hashing misses them) but
# nearly identical PERCEPTUAL structure.  dHash is the classical
# gradient fingerprint: downsample to a 9x8 grid of 4x4-block means,
# emit one bit per horizontally adjacent grid pair (left > right),
# 8 comparisons x 8 rows = 64 bits total.  Near-duplicates differ in a few
# bits; candidate generation is Hamming banding (the q_simhash_near
# pigeonhole: a pair within Hamming k must agree exactly on one of
# k+1 disjoint bands), so the quadratic all-pairs problem is
# equi-joins + an exact bit_count verify on candidates only — never
# all-pairs, the dedup.py posture applied to pixels.
#
# Fixture images are deterministic 36x32 grayscale rasters (pure
# integer functions of doc_id, SQL-replicable), with a PLANTED
# near-duplicate per 4-doc group: doc 4g+1 renders doc 4g's image
# with one 4x4 block brightened by +6 — a retouch/watermark patch.
# Exactly one grid cell shifts, so the twin's Hamming distance is
# <= 2 BY CONSTRUCTION (only the two comparisons touching that cell
# can flip) — safely inside the k=3 pigeonhole recall guarantee —
# while docs 4g+2 / 4g+3 draw from a disjoint seed range (>= 10^6 vs
# the twins' 2g+1; measured at sf0.1: zero non-twin pairs within
# Hamming 3).  The Spark side derives every fingerprint from pixels
# that made a FULL trip through the real GIF/LZW codec
# (encode_gif_gray -> decode_gif_gray_pixels), while the oracle
# recomputes the dHash directly from the pixel formula — a hash
# match therefore certifies codec + fingerprint + banding + verify
# end to end (the q_image_pixels pattern, lossless so exact).

_IMG_W, _IMG_H = 36, 32  # raster dims: 9x8 grid of 4x4 blocks
_IMG_GW, _IMG_GH = 9, 8
_IMG_HAMMING_K = 3  # pigeonhole: 4 disjoint 16-bit bands cover k<=3


def _image_seed(d: int) -> int:
    """Python twin of the oracle's seed CASE: docs 4g / 4g+1 share
    seed 2g+1 (the planted pair); 4g+2 / 4g+3 get unique seeds from
    a disjoint range (20d+17 is injective, +10^6 clears the twin
    family's ceiling)."""
    return d // 4 * 2 + 1 if d % 4 <= 1 else 1000000 + 20 * d + 17


def _image_gray_rows(d: int) -> list[bytes]:
    """The deterministic 36x32 grayscale raster for doc d: quadratic
    mixing of four seed-derived coefficients (prime moduli keep
    distinct seeds producing distinct gradients), plus the +6 retouch
    patch on block (2, 3) for the 4g+1 twin variant.  Vectorized
    (r16, guide §4.2): one int64 grid expression replaces the
    per-pixel Python loop — exact integer arithmetic, same bytes."""
    import numpy as np

    s = _image_seed(d)
    a, b, c, e = s % 251 + 1, s % 241 + 2, s % 239 + 3, s % 233 + 5
    x = np.arange(_IMG_W, dtype=np.int64)[None, :]
    y = np.arange(_IMG_H, dtype=np.int64)[:, None]
    px = (x * x * a + y * y * b + x * y * c
          + (x // 4 + y // 4) * e + s) % 256
    if d % 4 == 1:  # twin: +6 retouch on block (2, 3), clamped
        patch = (x // 4 == 2) & (y // 4 == 3)
        px = np.minimum(px + np.where(patch, 6, 0), 255)
    rows = px.astype(np.uint8)
    return [rows[j].tobytes() for j in range(_IMG_H)]


def _dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: raster -> REAL GIF/LZW roundtrip ->
    dHash over the DECODED pixels.  The 64-bit hash ships as two
    32-bit halves in BIGINTs so neither engine ever touches the
    signed top bit (shift/popcount semantics stay identical)."""
    for pdf in batches:
        ids: list[int] = []
        his: list[int] = []
        los: list[int] = []
        import numpy as np

        for doc_id in pdf["doc_id"]:
            if pd.isna(doc_id):
                continue  # no id -> no image; oracle filters likewise
            d = int(doc_id)
            w, h, px = decode_gif_gray_pixels(
                encode_gif_gray(_IMG_W, _IMG_H, _image_gray_rows(d))
            )
            # vectorized block means + comparison bits (r16, guide
            # §4.2): reshape to (GH, 4, GW, 4) blocks, integer mean,
            # one comparison per adjacent grid pair — exact twin of
            # the former per-pixel Python loops
            arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
            grid = (
                arr.reshape(_IMG_GH, 4, _IMG_GW, 4).sum(axis=(1, 3))
                // 16
            )
            gt = grid[:, :-1] > grid[:, 1:]
            bitpos = (
                np.arange(_IMG_GH)[:, None] * 8
                + np.arange(_IMG_GW - 1)[None, :]
            )
            bits = int((gt.astype(np.uint64) << bitpos.astype(np.uint64)).sum())
            ids.append(d)
            his.append(bits >> 32)
            los.append(bits & 0xFFFFFFFF)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="Int64"),
                "dhash_hi": pd.Series(his, dtype="Int64"),
                "dhash_lo": pd.Series(los, dtype="Int64"),
            }
        )


_IMG_PIXEL_SQL = (
    "(x.i*x.i*(s % 251 + 1) + y.i*y.i*(s % 241 + 2)"
    " + x.i*y.i*(s % 239 + 3)"
    " + (x.i // 4 + y.i // 4)*(s % 233 + 5) + s) % 256"
)

_IMG_BANDS_SQL = "\n            UNION ALL ".join(
    f"SELECT doc_id, dhash_hi, dhash_lo, {bi} AS bi, {bv} AS bv FROM fp"
    for bi, bv in enumerate(
        (
            "dhash_lo & 65535",
            "(dhash_lo >> 16) & 65535",
            "dhash_hi & 65535",
            "(dhash_hi >> 16) & 65535",
        )
    )
)


# The full fingerprint CTE chain (image formula -> grid -> dHash ->
# bands), shared by the pair oracle and the X95 clustering oracle so
# the two can never drift.
_IMG_FP_CTES = f"""img AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 <= 1 THEN doc_id // 4 * 2 + 1
                        ELSE 1000000 + 20 * doc_id + 17 END AS s
            FROM documents WHERE doc_id IS NOT NULL),
        px0 AS (
            SELECT doc_id, x.i AS x, y.i AS y, {_IMG_PIXEL_SQL} AS p0
            FROM img,
                 generate_series(0, {_IMG_W - 1}) x(i),
                 generate_series(0, {_IMG_H - 1}) y(i)),
        px AS (
            SELECT doc_id, x, y,
                   CASE WHEN doc_id % 4 = 1 AND x // 4 = 2 AND y // 4 = 3
                        THEN least(p0 + 6, 255) ELSE p0 END AS p
            FROM px0),
        grid AS (
            SELECT doc_id, x // 4 AS gi, y // 4 AS gj,
                   CAST(sum(p) AS BIGINT) // 16 AS gv
            FROM px GROUP BY 1, 2, 3),
        bits AS (
            SELECT l.doc_id, l.gj * 8 + l.gi AS bit
            FROM grid l JOIN grid r
              ON r.doc_id = l.doc_id AND r.gj = l.gj AND r.gi = l.gi + 1
            WHERE l.gv > r.gv),
        fp AS MATERIALIZED (
            SELECT i.doc_id,
                   CAST(coalesce(sum(CASE WHEN bit >= 32
                            THEN CAST(1 AS BIGINT) << (bit - 32) END), 0)
                        AS BIGINT) AS dhash_hi,
                   CAST(coalesce(sum(CASE WHEN bit < 32
                            THEN CAST(1 AS BIGINT) << bit END), 0)
                        AS BIGINT) AS dhash_lo
            FROM img i LEFT JOIN bits b ON i.doc_id = b.doc_id
            GROUP BY 1),
        bands AS MATERIALIZED (
            {_IMG_BANDS_SQL})"""

_IMG_PAIRS_SQL = f"""
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.dhash_hi, b.dhash_hi))
                  + bit_count(xor(a.dhash_lo, b.dhash_lo))
                  AS INTEGER) AS hamming
        FROM bands a JOIN bands b
          ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
            + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= {_IMG_HAMMING_K}"""


@query(
    "q_image_dedup",
    oracle=f"""
        WITH {_IMG_FP_CTES}
        {_IMG_PAIRS_SQL}
    """,
    tags=("multimodal", "dedup", "image", "perceptual", "extension"),
)
def q_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs at Hamming <= {_IMG_HAMMING_K}
    (X89): perceptual dHash over REAL-codec-decoded pixels, banded
    candidates, exact popcount verify — the simhash near-dup posture
    applied to the image modality now that the decode seams are real.

    Scale shape: ONE documents scan projecting doc_id, one
    Arrow-batched Python stage (codec + 64-bit fingerprint — 12
    bytes of state per image leaves the stage), localCheckpoint so
    the band explode and both verify sides never re-enter the codec,
    then the pigeonhole band equi-join with the hot-bucket
    small/big split (dedup._all_bucket_pairs: capped buckets pair
    row-locally, over-cap buckets stream through a spillable
    self-join — never all-pairs at any corpus size).  At 100 TB the
    fingerprint stage is embarrassingly parallel over image bytes
    and everything after it moves 3 longs per image."""
    from .dedup import _LSH_BUCKET_CAP, _all_bucket_pairs

    docs = load_table(spark, sf_dir, "documents")
    # repartition BEFORE the codec stage: the fixture parquet is 1-2
    # files, and an Arrow stage inherits scan parallelism — without
    # the fan-out the whole corpus's encode/decode ran on 2 of 32
    # cores (measured 16 s -> ~2 s at sf0.1).  The exchange moves one
    # bigint per image; the codec work it unlocks is ~3 ms per image.
    fp = (
        image_fingerprints(docs)
        .localCheckpoint(eager=False)
    )
    rows = _image_band_rows(fp)
    hamming = _image_hamming_col()
    return (
        _all_bucket_pairs(rows, _LSH_BUCKET_CAP)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= _IMG_HAMMING_K)
        .distinct()
    )


def image_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, dhash_hi, dhash_lo) for every document's image —
    the codec + dHash stage, shared by the inline query, the
    streaming fingerprint store, and the served dedup gate so all
    three hash the same pixels the same way.  Repartitions BEFORE
    the codec stage: the fixture parquet is 1-2 files and an Arrow
    stage inherits scan parallelism — without the fan-out the whole
    corpus's encode/decode ran on 2 of 32 cores (measured 16 s ->
    ~2 s at sf0.1); the exchange moves one bigint per image."""
    spark = docs.sparkSession
    return (
        docs.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _dhash_batches,
            schema="doc_id bigint, dhash_hi bigint, dhash_lo bigint",
        )
    )


def _image_band_rows(fp: DataFrame) -> DataFrame:
    """(bi, bv, m) band rows over a fingerprint relation — the
    pigeonhole decomposition (4 disjoint 16-bit bands cover Hamming
    <= {_IMG_HAMMING_K}), m = the full fingerprint struct for the
    exact verify."""
    band_structs = F.array(
        *[
            F.struct(F.lit(bi).alias("bi"), F.expr(bv).alias("bv"))
            for bi, bv in enumerate(
                (
                    "dhash_lo & 65535",
                    "shiftright(dhash_lo, 16) & 65535",
                    "dhash_hi & 65535",
                    "shiftright(dhash_hi, 16) & 65535",
                )
            )
        ]
    )
    return fp.select(
        F.explode(band_structs).alias("b"),
        F.struct("doc_id", "dhash_hi", "dhash_lo").alias("m"),
    ).select(F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"), "m")


def _image_hamming_col():
    """Exact 64-bit Hamming distance between the a/b fingerprint
    structs of a candidate pair (two 32-bit halves — no signed
    top-bit trap in either engine)."""
    return (
        F.bit_count(F.col("a.dhash_hi").bitwiseXOR(F.col("b.dhash_hi")))
        + F.bit_count(F.col("a.dhash_lo").bitwiseXOR(F.col("b.dhash_lo")))
    ).cast("int")


# ---------------------------------------------------------------------------
# X95 — image dedup clusters + representative policy (r12)


@query(
    "q_image_dedup_clusters",
    oracle=f"""
        WITH RECURSIVE {_IMG_FP_CTES},
        ipairs AS MATERIALIZED ({_IMG_PAIRS_SQL}),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM ipairs
            UNION SELECT doc_b, doc_a FROM ipairs),
        reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ),
        lab AS MATERIALIZED (
            SELECT e.a AS n, least(e.a, min(r.dst)) AS cluster_id
            FROM (SELECT DISTINCT a FROM edges) e
            JOIN reach r ON r.src = e.a
            GROUP BY e.a)
        SELECT cluster_id,
               CAST(count(*) AS BIGINT) AS n_images,
               CAST(count(*) - 1 AS BIGINT) AS n_removed,
               CAST(max(n) AS BIGINT) AS max_doc
        FROM lab
        GROUP BY cluster_id
    """,
    tags=("multimodal", "dedup", "image", "iterative", "extension"),
)
def q_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup CLUSTERS (X95) — the keep-one-copy decision on
    top of X89's near-dup pairs: connected components over the
    Hamming-<= {_IMG_HAMMING_K} pair graph, representative = min
    image id (which IS the kept copy, so n_removed is the dedup
    yield per family).  Only edge-touched images enter the
    iteration — the singleton majority never pays a components
    round (the q_dedup_savings discipline).  The oracle replays
    components via the recursive transitive-closure CTE over the
    SHARED fingerprint chain, so fingerprints, banding, verify, and
    the iterative clustering are all one hash check.

    Scale shape: X89's plan (one codec stage, capped band join)
    plus pointer-doubling label propagation over |pairs| edges —
    at the fixture all families are planted twins (n_images = 2),
    and a cluster never exceeds the transitive closure of
    band-collision candidates by construction."""
    from .dedup import connected_components

    pairs = (
        q_image_dedup(spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint()
    )
    nodes = (
        pairs.select(F.col("a").alias("n"))
        .unionByName(pairs.select(F.col("b").alias("n")))
        .distinct()
    )
    lab = connected_components(pairs, nodes)
    return lab.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("n_images"),
        (F.count("*") - 1).cast("bigint").alias("n_removed"),
        F.max("n").cast("bigint").alias("max_doc"),
    )


# ---------------------------------------------------------------------------
# X96 — standing image-dedup gate, driver-visible (r13)


@query(
    "q_image_gate",
    oracle=f"""
        WITH {_IMG_FP_CTES}
        SELECT DISTINCT n.doc_id AS new_doc, c.doc_id AS corpus_doc,
               CAST(bit_count(xor(n.dhash_hi, c.dhash_hi))
                  + bit_count(xor(n.dhash_lo, c.dhash_lo))
                  AS INTEGER) AS hamming
        FROM bands n JOIN bands c
          ON n.bi = c.bi AND n.bv = c.bv
        WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
          AND bit_count(xor(n.dhash_hi, c.dhash_hi))
            + bit_count(xor(n.dhash_lo, c.dhash_lo))
            <= {_IMG_HAMMING_K}
    """,
    tags=("multimodal", "dedup", "image", "perceptual", "serve",
          "extension"),
)
def q_image_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-dedup admission gate, SERVED (X96, driver-visible per
    VERDICT r12 #3): ingest the even-id half of the corpus into the
    perceptual fingerprint store
    (streaming/jobs.image_prints_merge_fn — 12 bytes per image),
    then screen the odd-id half as the "upload" batch
    (jobs.image_dedup_check): every (new_doc, corpus_doc, hamming)
    pair within Hamming <= {_IMG_HAMMING_K} of ingest history,
    answered with ZERO decodes of stored images.  Every planted twin
    (doc 4g+1 retouching doc 4g) straddles the even/odd split BY
    CONSTRUCTION, so the gate must catch all of them — and the
    oracle recomputes fingerprints from the pixel formula and keeps
    exactly the cross-half band-collision pairs, so a hash-green row
    certifies codec, fingerprint, banding, popcount verify, AND the
    store/serve composition end to end (the one other serving store
    the DuckDB oracle never touched before this round).

    Scale shape: the store build is the amortized offline step (one
    codec pass over history, distinct-union — idempotent); the check
    pays one codec pass over the BATCH only, then a pigeonhole band
    equi-join of batch bands against store bands and the exact
    verify on candidates — at 100 TB the gate's cost tracks upload
    volume, never corpus size."""
    import sys

    from ..streaming import jobs as _jobs
    from .index_cache import cached

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter("doc_id % 2 = 0").select("doc_id")
    uploads = docs.filter("doc_id % 2 = 1").select("doc_id")
    # content-tagged build cache (VERDICT r12 #6): the history half's
    # codec pass is the dominant cost and a pure function of (ids,
    # codec source) — repeated bench/driver runs skip it, and a
    # builder edit lands in a fresh token-named dir
    store = cached(
        "image_prints",
        sf_dir,
        ("documents",),
        (sys.modules[__name__], _jobs),
        lambda p: _jobs.image_prints_merge_fn(spark, p)(history, 0),
    )
    return _jobs.image_dedup_check(spark, store, uploads)


# ---------------------------------------------------------------------------
# X99 — perceptual AUDIO near-duplicate detection (r13)
#
# The missing modality in the dedup matrix (VERDICT r12 #4): the X89
# dHash idea in 1-D over PCM decoded through the certified WAV codec.
# Fingerprint: 65 contiguous 16-sample windows -> per-window energy
# Σ|s| -> one bit per adjacent window pair (E[j] > E[j+1]), 64 bits
# shipped as two 32-bit halves.  Candidates are the same 4×16-bit
# pigeonhole bands (exact for Hamming <= 3), verify is the exact
# popcount on candidates only — never all-pairs.
#
# Fixture audio is a deterministic 1040-sample int16 signal (pure
# integer function of doc_id, SQL-replicable), with a PLANTED
# re-encoded twin per 4-doc group COMPLEMENTARY to the image family:
# doc 4g+3 renders doc 4g+2's signal with one 16-sample window
# boosted by +5 (a re-mastered/re-leveled clip), so the audio edges
# (4g+2, 4g+3) are DISJOINT from the image edges (4g, 4g+1) and the
# X98 capstone gains genuinely new cross-modal families.  Exactly one
# window energy shifts, so the twin's Hamming distance is <= 2 BY
# CONSTRUCTION (only the two comparisons touching that window can
# flip); docs 4g / 4g+1 draw audio seeds from a disjoint range
# (>= 2*10^6 vs the twins' 2g+1 — separate RANGES, the r12 modular
# seed-collision lesson).  The Spark side derives every fingerprint
# from samples that made a FULL trip through the real RIFF/PCM codec
# (encode_wav_pcm16 -> decode_wav_samples), while the oracle
# recomputes the energies directly from the sample formula — a hash
# match certifies codec + fingerprint + banding + verify end to end.

_AUD_WIN = 16  # samples per energy window
_AUD_NWIN = 65  # windows -> 64 adjacent-pair bits
_AUD_TWIN_W = 13  # the boosted window of the 4g+3 twin


def _audio_seed(d: int) -> int:
    """Audio seed CASE: docs 4g+2 / 4g+3 share seed 2g+1 (the planted
    pair — the OPPOSITE half of the group from the image twins);
    4g / 4g+1 get unique seeds from a disjoint range."""
    return d // 4 * 2 + 1 if d % 4 >= 2 else 2000000 + 20 * d + 17


def _audio_samples(d: int) -> list[int]:
    """The deterministic 1040-sample int16 signal for doc d:
    quadratic mixing of three seed-derived coefficients mod 2048,
    centered to [-1024, 1023], plus the +5 re-level boost on window
    {_AUD_TWIN_W} for the 4g+3 twin variant.  Coefficients are ODD
    (units mod 2048) and wide-range (2*(s%509)+3 etc.): small even
    coefficients collapse i²·a mod 2048 into short-period classes,
    which made unrelated docs share PERIODIC energy patterns
    (measured: 4 Hamming-0 collisions at sf0.1 with s%127-style
    coefficients; 0 with these — full-corpus sweep in
    tests/test_operators.py)."""
    import numpy as np

    s = _audio_seed(d)
    a = 2 * (s % 509) + 3
    b = 2 * (s % 503) + 7
    c = 2 * (s % 499) + 11
    i = np.arange(_AUD_WIN * _AUD_NWIN, dtype=np.int64)
    w = i // _AUD_WIN
    r = (i * i * a + i * b + w * c + s) % 2048
    if d % 4 == 3:  # twin: +5 re-level on the planted window, clamped
        r = np.where(w == _AUD_TWIN_W, np.minimum(r + 5, 2047), r)
    return (r - 1024).tolist()


def _audio_fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: signal -> REAL WAV/PCM roundtrip ->
    energy-band fingerprint over the DECODED samples.  Two 32-bit
    halves in BIGINTs, the engine-neutral 64-bit convention."""
    for pdf in batches:
        ids: list[int] = []
        his: list[int] = []
        los: list[int] = []
        for doc_id in pdf["doc_id"]:
            if pd.isna(doc_id):
                continue  # no id -> no clip; oracle filters likewise
            d = int(doc_id)
            _, _, sm = decode_wav_samples(
                encode_wav_pcm16(_audio_samples(d))
            )
            # vectorized window energies + comparison bits (r16,
            # guide §4.2): exact integer twin of the former loops
            import numpy as np

            eng = (
                np.abs(np.asarray(sm, dtype=np.int64))
                .reshape(_AUD_NWIN, _AUD_WIN)
                .sum(axis=1)
            )
            gt = eng[:-1] > eng[1:]
            bits = int(
                (
                    gt.astype(np.uint64)
                    << np.arange(_AUD_NWIN - 1, dtype=np.uint64)
                ).sum()
            )
            ids.append(d)
            his.append(bits >> 32)
            los.append(bits & 0xFFFFFFFF)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="Int64"),
                "dhash_hi": pd.Series(his, dtype="Int64"),
                "dhash_lo": pd.Series(los, dtype="Int64"),
            }
        )


def audio_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, dhash_hi, dhash_lo) for every document's audio clip —
    the codec + energy-signature stage, column-compatible with the
    image fingerprint relation so the banding/verify machinery
    (_image_band_rows / _image_hamming_col) is shared verbatim.
    Repartitions before the codec stage (the mapInPandas
    scan-parallelism lesson, multimodal.image_fingerprints)."""
    spark = docs.sparkSession
    return (
        docs.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _audio_fp_batches,
            schema="doc_id bigint, dhash_hi bigint, dhash_lo bigint",
        )
    )


# The full audio fingerprint CTE chain (signal formula -> window
# energies -> bits -> bands), namespaced a* so it composes with the
# image chain inside one statement (the X98 capstone).
_AUD_FP_CTES = f"""aud AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 >= 2 THEN doc_id // 4 * 2 + 1
                        ELSE 2000000 + 20 * doc_id + 17 END AS s
            FROM documents WHERE doc_id IS NOT NULL),
        asm AS (
            SELECT doc_id, g.i AS i,
                   CASE WHEN doc_id % 4 = 3
                             AND g.i // {_AUD_WIN} = {_AUD_TWIN_W}
                        THEN least(
                            (g.i*g.i*(2*(s % 509) + 3)
                             + g.i*(2*(s % 503) + 7)
                             + (g.i // {_AUD_WIN})*(2*(s % 499) + 11)
                             + s) % 2048 + 5, 2047)
                        ELSE (g.i*g.i*(2*(s % 509) + 3)
                              + g.i*(2*(s % 503) + 7)
                              + (g.i // {_AUD_WIN})*(2*(s % 499) + 11)
                              + s) % 2048 END AS r
            FROM aud,
                 generate_series(0, {_AUD_WIN * _AUD_NWIN - 1}) g(i)),
        awin AS (
            SELECT doc_id, i // {_AUD_WIN} AS w,
                   CAST(sum(abs(r - 1024)) AS BIGINT) AS e
            FROM asm GROUP BY 1, 2),
        abits AS (
            SELECT l.doc_id, l.w AS bit
            FROM awin l JOIN awin r
              ON r.doc_id = l.doc_id AND r.w = l.w + 1
            WHERE l.e > r.e),
        afp AS MATERIALIZED (
            SELECT a.doc_id,
                   CAST(coalesce(sum(CASE WHEN bit >= 32
                            THEN CAST(1 AS BIGINT) << (bit - 32) END), 0)
                        AS BIGINT) AS dhash_hi,
                   CAST(coalesce(sum(CASE WHEN bit < 32
                            THEN CAST(1 AS BIGINT) << bit END), 0)
                        AS BIGINT) AS dhash_lo
            FROM aud a LEFT JOIN abits b ON a.doc_id = b.doc_id
            GROUP BY 1),
        abands AS MATERIALIZED (
            {_IMG_BANDS_SQL.replace("FROM fp", "FROM afp")})"""

_AUD_PAIRS_SQL = _IMG_PAIRS_SQL.replace("bands", "abands")


@query(
    "q_audio_dedup",
    oracle=f"""
        WITH {_AUD_FP_CTES}
        {_AUD_PAIRS_SQL}
    """,
    tags=("multimodal", "dedup", "audio", "perceptual", "extension"),
)
def q_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs at Hamming <= {_IMG_HAMMING_K}
    (X99): perceptual energy-band signature over REAL-codec-decoded
    PCM, pigeonhole banded candidates, exact popcount verify — the
    X89 posture applied to the audio modality, completing the dedup
    matrix (text / image / audio).

    Scale shape: identical to q_image_dedup — ONE documents scan
    projecting doc_id, one Arrow-batched Python stage (RIFF codec +
    64-bit signature, 12 bytes of state per clip leaves the stage),
    localCheckpoint so banding and both verify sides never re-enter
    the codec, then the capped band equi-join.  At 100 TB the
    fingerprint stage parallelizes over audio bytes and everything
    downstream moves 3 longs per clip."""
    from .dedup import _LSH_BUCKET_CAP, _all_bucket_pairs

    docs = load_table(spark, sf_dir, "documents")
    fp = audio_fingerprints(docs).localCheckpoint(eager=False)
    rows = _image_band_rows(fp)
    hamming = _image_hamming_col()
    return (
        _all_bucket_pairs(rows, _LSH_BUCKET_CAP)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= _IMG_HAMMING_K)
        .distinct()
    )


# ---------------------------------------------------------------------------
# X103 — REAL animated video codec: GIF89a multi-frame + GCE (r13)
#
# The video seam closes the way r09 closed PNG, r10 WAV, r11 JPEG and
# GIF87a: the one genuinely stdlib-expressible VIDEO container is the
# GIF89a animation (multi-frame, per-frame Graphic Control Extension
# carrying the presentation delay), and its compression core is the
# SAME LZW this module already certifies — so the animation codec
# reuses _gif_lzw_compress/_gif_lzw_decompress verbatim and adds only
# the 89a framing: NETSCAPE looping application extension, one GCE +
# image descriptor + code stream per frame.


def encode_gif_anim(
    width: int,
    height: int,
    frames: list[list[bytes]],
    delays_cs: list[int],
) -> bytes:
    """GIF89a animation encoder for 8-bit grayscale: identity global
    palette, NETSCAPE2.0 loop extension, then per frame a Graphic
    Control Extension (disposal=1, delay in centiseconds, no
    transparency) + full-frame image descriptor + real LZW stream."""
    import struct

    if not frames or len(frames) != len(delays_cs):
        raise ValueError("gif-anim: frames/delays mismatch")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += _GIF_GRAY_PALETTE  # grayscale identity palette
    # NETSCAPE2.0 application extension: loop forever — a generic
    # extension the decoder must SKIP, exercising the 0x21 sub-block
    # walk on a block that is not a GCE.
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for rows, delay in zip(frames, delays_cs):
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(_GIF_MCS)
        out += _gif_subblocks(_gif_lzw_compress(b"".join(rows)))
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif_anim(payload: bytes) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Real GIF89a animation decoder for the 8-bit grayscale
    full-frame profile: screen descriptor + global palette parse,
    Graphic Control Extension delay capture (spec: a GCE governs
    exactly the next image; delay resets to 0 after it is consumed),
    generic extension skipping (NETSCAPE et al.), per-frame sub-block
    reassembly + shared LZW decode, grayscale palette application.
    Returns (width, height, [(delay_cs, row-major pixels), ...]).
    Rejects interlace, local color tables, partial-frame rectangles,
    and non-grayscale palettes — same strictness as the single-image
    decoder."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif-anim: bad signature")
    sw, sh, packed, _, _ = struct.unpack("<HHBBB", payload[6:13])
    off = 13
    if not packed & 0x80:
        raise ValueError("gif-anim: no global color table")
    n = 2 << (packed & 7)
    palette = payload[off : off + 3 * n]
    off += 3 * n
    gray = palette[0::3]
    if palette[1::3] != gray or palette[2::3] != gray:
        raise ValueError("gif-anim: non-grayscale palette")
    frames: list[tuple[int, bytes]] = []
    delay = 0  # no GCE before an image -> delay 0 per spec
    while off < len(payload):
        blk = payload[off]
        if blk == 0x21:  # extension block
            if payload[off + 1] == 0xF9:  # Graphic Control Extension
                if payload[off + 2] != 4:
                    raise ValueError("gif-anim: bad GCE block size")
                delay = payload[off + 4] | (payload[off + 5] << 8)
            off += 2
            while payload[off]:  # generic sub-block skip
                off += 1 + payload[off]
            off += 1
        elif blk == 0x2C:  # image descriptor
            left, top, width, height, ipacked = struct.unpack(
                "<HHHHB", payload[off + 1 : off + 10]
            )
            off += 10
            if ipacked & 0x40:
                raise ValueError("gif-anim: interlaced unsupported")
            if ipacked & 0x80:
                raise ValueError("gif-anim: local color table unsupported")
            if (left, top, width, height) != (0, 0, sw, sh):
                raise ValueError("gif-anim: partial-frame unsupported")
            mcs = payload[off]
            off += 1
            data = bytearray()
            while payload[off]:
                ln = payload[off]
                data += payload[off + 1 : off + 1 + ln]
                off += 1 + ln
            off += 1
            idx = _gif_lzw_decompress(bytes(data), mcs)
            if len(idx) != width * height:
                raise ValueError("gif-anim: pixel count mismatch")
            if len(gray) == 256:
                frames.append((delay, bytes(idx).translate(gray)))
            else:
                frames.append((delay, bytes(gray[i] for i in idx)))
            delay = 0  # a GCE governs exactly one image
        elif blk == 0x3B:
            break
        else:
            raise ValueError("gif-anim: unknown block")
    if not frames:
        raise ValueError("gif-anim: no frames")
    return int(sw), int(sh), frames


MM_VIDEO_SCHEMA = (
    "doc_id bigint, frame_idx int, delay_cs int, width int, height int, "
    "sum_pix bigint, sum_sq bigint"
)


def _video_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker over (doc_id, n_chars): deterministic
    multi-frame grayscale video (2..6 frames, per-frame delay 4+f
    centiseconds) -> real GIF89a animation encode -> real decode ->
    per-frame pixel statistics, one OUTPUT ROW PER FRAME — the
    row-exploding Arrow shape a real frame-extraction stage has.
    NULL inputs yield a single all-NULL-feature row (the dims-level
    LEFT JOIN contract shared with q_image_gif / q_audio_pcm)."""
    cols = (
        "frame_idx", "delay_cs", "width", "height", "sum_pix", "sum_sq",
    )
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in ("doc_id",) + cols}
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            if pd.isna(doc_id) or pd.isna(n_chars):
                out["doc_id"].append(
                    None if pd.isna(doc_id) else int(doc_id)
                )
                for k in cols:
                    out[k].append(None)
                continue
            d = int(doc_id)
            w = ((d % 10) + 10) % 10 + 4
            h = ((int(n_chars) % 7) + 7) % 7 + 3
            nf = ((d % 5) + 5) % 5 + 2
            frames = [
                [
                    bytes(
                        (((d * 13 + 7 * x + 11 * y + 5 * f) % 256) + 256)
                        % 256
                        for x in range(w)
                    )
                    for y in range(h)
                ]
                for f in range(nf)
            ]
            payload = encode_gif_anim(
                w, h, frames, [4 + f for f in range(nf)]
            )
            dw, dh, dec = decode_gif_anim(payload)
            for fi, (delay, px) in enumerate(dec):
                out["doc_id"].append(d)
                out["frame_idx"].append(fi)
                out["delay_cs"].append(delay)
                out["width"].append(dw)
                out["height"].append(dh)
                out["sum_pix"].append(sum(px))
                out["sum_sq"].append(sum(v * v for v in px))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="Int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="Int32"),
                "delay_cs": pd.Series(out["delay_cs"], dtype="Int32"),
                "width": pd.Series(out["width"], dtype="Int32"),
                "height": pd.Series(out["height"], dtype="Int32"),
                "sum_pix": pd.Series(out["sum_pix"], dtype="Int64"),
                "sum_sq": pd.Series(out["sum_sq"], dtype="Int64"),
            }
        )


@query(
    "q_video_frames",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   ((doc_id % 10) + 10) % 10 + 4 AS w,
                   ((n_chars % 7) + 7) % 7 + 3 AS h,
                   ((doc_id % 5) + 5) % 5 + 2 AS nf,
                   (doc_id IS NOT NULL AND n_chars IS NOT NULL) AS ok
            FROM documents),
        px AS (
            SELECT doc_id, w, h, f.i AS f,
                   (((doc_id * 13 + 7 * x.i + 11 * y.i + 5 * f.i) % 256)
                       + 256) % 256 AS v
            FROM dims,
                 generate_series(0, 12) x(i),
                 generate_series(0, 9) y(i),
                 generate_series(0, 5) f(i)
            WHERE ok AND x.i < w AND y.i < h AND f.i < nf),
        agg AS (
            SELECT doc_id, f,
                   CAST(w AS INTEGER) AS width,
                   CAST(h AS INTEGER) AS height,
                   CAST(sum(v) AS BIGINT) AS sum_pix,
                   CAST(sum(v * v) AS BIGINT) AS sum_sq
            FROM px
            GROUP BY doc_id, f, w, h)
        SELECT d.doc_id,
               CAST(a.f AS INTEGER) AS frame_idx,
               CAST(4 + a.f AS INTEGER) AS delay_cs,
               a.width, a.height, a.sum_pix, a.sum_sq
        FROM dims d
        LEFT JOIN agg a ON d.ok AND d.doc_id = a.doc_id
    """,
    tags=("multimodal", "extension", "pandas-udf", "video", "frames"),
)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-video roundtrip (X103): every document becomes a
    deterministic 2..6-frame grayscale clip, encoded through the real
    GIF89a animation writer (per-frame Graphic Control Extension
    carrying the delay, NETSCAPE loop block, the certified LZW core)
    and decoded back through the real reader, emitting ONE ROW PER
    DECODED FRAME with the GCE delay and pixel statistics — the
    frame-extraction stage a video training pipeline runs first,
    with the cardinality explosion (row-exploding mapInPandas) that
    distinguishes video from the scalar media queries.

    The oracle recomputes every frame's statistics and the 4+f delay
    schedule directly from the formula, so a hash-green row certifies
    the GCE delay survived the container roundtrip AND the per-frame
    LZW streams decode to exactly the encoded rasters.

    Scale shape: ONE documents scan projecting (doc_id, n_chars),
    one Arrow-batched stage; output rows are frame-granular but carry
    only statistics — at 100 TB the codec work parallelizes over
    clips and the result stays metadata-sized."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "n_chars")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_video_roundtrip_batches, schema=MM_VIDEO_SCHEMA)
    )


# ---------------------------------------------------------------------------
# X104 — perceptual video near-dup over decoded animation frames (r13)

_VID_W, _VID_H = 12, 9  # frame raster; 4x3 blocks -> 3x3 grid
_VID_NF = 8  # frames -> 8 bits/frame -> 64-bit temporal signature
_VID_TWIN_F = 5  # the retouched frame of the 4g+2 twin


def _video_seed(d: int) -> int:
    """Video seed CASE: docs 4g+1 / 4g+2 share seed 2g+1 (the planted
    pair) — STRADDLING the image-twin half (4g, 4g+1) and the
    audio-twin half (4g+2, 4g+3) of each group, so with all four
    channels live the whole 4-doc group becomes ONE family on media
    evidence alone; 4g / 4g+3 get unique seeds from a disjoint
    range."""
    return d // 4 * 2 + 1 if d % 4 in (1, 2) else 3000000 + 20 * d + 17


def _video_frame_rows(d: int) -> list[list[bytes]]:
    """The deterministic 8-frame 12x9 clip for doc d: quadratic
    mixing with FRAME-VARYING spatial coefficients (a+2f, b+3f) — a
    constant per-frame term would shift whole frames uniformly,
    collapse every frame's within-frame comparisons to the same 8
    bits, and leave only 256 distinct signatures corpus-wide
    (measured: immediate false-pair storm); varying the x²/y²
    coefficients per frame makes all 64 bits independent (measured:
    0 false pairs / 1250 planted recalled / max band bucket 10 at
    the 5000-doc sf0.1 scale).  The 4g+2 twin gets a +4 retouch on
    frame {_VID_TWIN_F}'s block (1, 2)."""
    import numpy as np

    s = _video_seed(d)
    c, e = s % 239 + 3, s % 233 + 5
    twin = d % 4 == 2
    x = np.arange(_VID_W, dtype=np.int64)[None, :]
    y = np.arange(_VID_H, dtype=np.int64)[:, None]
    base = x * y * c + (x // 4 + y // 3) * e + s
    patch = (x // 4 == 1) & (y // 3 == 2)
    frames = []
    for f in range(_VID_NF):
        px = (x * x * (s % 251 + 1 + 2 * f)
              + y * y * (s % 241 + 2 + 3 * f)
              + base + 7 * f) % 256
        if twin and f == _VID_TWIN_F:
            px = np.minimum(px + np.where(patch, 4, 0), 255)
        rows = px.astype(np.uint8)
        frames.append([rows[j].tobytes() for j in range(_VID_H)])
    return frames


def _video_fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: clip -> REAL GIF89a animation roundtrip ->
    temporal signature over the DECODED frames: per frame a 3x3 grid
    of block means and 8 adjacent-comparison bits (frame f owns bits
    8f..8f+7) — dHash in space, frame-major in time.  Two 32-bit
    halves in BIGINTs, the engine-neutral 64-bit convention."""
    for pdf in batches:
        ids: list[int] = []
        his: list[int] = []
        los: list[int] = []
        for doc_id in pdf["doc_id"]:
            if pd.isna(doc_id):
                continue  # no id -> no clip; oracle filters likewise
            d = int(doc_id)
            _, _, dec = decode_gif_anim(
                encode_gif_anim(
                    _VID_W,
                    _VID_H,
                    _video_frame_rows(d),
                    [4 + f for f in range(_VID_NF)],
                )
            )
            import numpy as np

            # vectorized per-frame 3x3 block means + comparison bits
            # (r16, guide §4.2): exact integer twin of the former
            # per-pixel Python loops
            bits = 0
            for f, (_, px) in enumerate(dec):
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                g = (
                    arr.reshape(3, 3, 3, 4).sum(axis=(1, 3)).ravel()
                    // 12
                )
                gt = g[:-1] > g[1:]
                bits |= int(
                    (
                        gt.astype(np.uint64)
                        << np.arange(8, dtype=np.uint64)
                    ).sum()
                ) << (f * 8)
            ids.append(d)
            his.append(bits >> 32)
            los.append(bits & 0xFFFFFFFF)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="Int64"),
                "dhash_hi": pd.Series(his, dtype="Int64"),
                "dhash_lo": pd.Series(los, dtype="Int64"),
            }
        )


def video_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, dhash_hi, dhash_lo) for every document's clip —
    column-compatible with the image/audio fingerprint relations so
    the banding/verify machinery (_image_band_rows /
    _image_hamming_col) is shared verbatim.  Repartitions before the
    codec stage (the mapInPandas scan-parallelism lesson,
    image_fingerprints)."""
    spark = docs.sparkSession
    return (
        docs.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _video_fp_batches,
            schema="doc_id bigint, dhash_hi bigint, dhash_lo bigint",
        )
    )


# The full video fingerprint CTE chain (clip formula -> per-frame
# grid -> temporal bits -> bands), namespaced v* so it composes with
# the image/audio chains inside one statement (the X98 capstone).
_VID_PIXEL_SQL = (
    "(x.i*x.i*(s % 251 + 1 + 2*f.i) + y.i*y.i*(s % 241 + 2 + 3*f.i)"
    " + x.i*y.i*(s % 239 + 3)"
    " + (x.i // 4 + y.i // 3)*(s % 233 + 5) + 7*f.i + s) % 256"
)

_VID_FP_CTES = f"""vid AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 1 OR doc_id % 4 = 2
                        THEN doc_id // 4 * 2 + 1
                        ELSE 3000000 + 20 * doc_id + 17 END AS s
            FROM documents WHERE doc_id IS NOT NULL),
        vpx0 AS (
            SELECT doc_id, f.i AS f, x.i AS x, y.i AS y,
                   {_VID_PIXEL_SQL} AS p0
            FROM vid,
                 generate_series(0, {_VID_W - 1}) x(i),
                 generate_series(0, {_VID_H - 1}) y(i),
                 generate_series(0, {_VID_NF - 1}) f(i)),
        vpx AS (
            SELECT doc_id, f, x, y,
                   CASE WHEN doc_id % 4 = 2 AND f = {_VID_TWIN_F}
                             AND x // 4 = 1 AND y // 3 = 2
                        THEN least(p0 + 4, 255) ELSE p0 END AS p
            FROM vpx0),
        vgrid AS (
            SELECT doc_id, f, (y // 3) * 3 + (x // 4) AS k,
                   CAST(sum(p) AS BIGINT) // 12 AS gv
            FROM vpx GROUP BY 1, 2, 3),
        vbits AS (
            SELECT l.doc_id, l.f * 8 + l.k AS bit
            FROM vgrid l JOIN vgrid r
              ON r.doc_id = l.doc_id AND r.f = l.f AND r.k = l.k + 1
            WHERE l.gv > r.gv),
        vfp AS MATERIALIZED (
            SELECT v.doc_id,
                   CAST(coalesce(sum(CASE WHEN bit >= 32
                            THEN CAST(1 AS BIGINT) << (bit - 32) END), 0)
                        AS BIGINT) AS dhash_hi,
                   CAST(coalesce(sum(CASE WHEN bit < 32
                            THEN CAST(1 AS BIGINT) << bit END), 0)
                        AS BIGINT) AS dhash_lo
            FROM vid v LEFT JOIN vbits b ON v.doc_id = b.doc_id
            GROUP BY 1),
        vbands AS MATERIALIZED (
            {_IMG_BANDS_SQL.replace("FROM fp", "FROM vfp")})"""

_VID_PAIRS_SQL = _IMG_PAIRS_SQL.replace("bands", "vbands")


@query(
    "q_video_dedup",
    oracle=f"""
        WITH {_VID_FP_CTES}
        {_VID_PAIRS_SQL}
    """,
    tags=("multimodal", "dedup", "video", "perceptual", "extension"),
)
def q_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs at Hamming <= {_IMG_HAMMING_K}
    (X104): temporal perceptual signature over REAL-animation-codec
    decoded frames (8 frames x 8 spatial-comparison bits), pigeonhole
    banded candidates (each 16-bit band = 2 frames, so a retouched
    frame disturbs at most one band), exact popcount verify — the
    X89/X99 posture applied to the video modality, completing the
    dedup matrix across ALL FOUR channels (text/image/audio/video).

    Scale shape: identical to q_image_dedup — ONE documents scan
    projecting doc_id, one Arrow-batched Python stage (animation
    codec + 64-bit signature, 12 bytes of state per clip leaves the
    stage), localCheckpoint so banding and both verify sides never
    re-enter the codec, then the capped band equi-join.  At 100 TB
    the fingerprint stage parallelizes over video bytes (frames never
    leave the worker) and everything downstream moves 3 longs per
    clip."""
    from .dedup import _LSH_BUCKET_CAP, _all_bucket_pairs

    docs = load_table(spark, sf_dir, "documents")
    fp = video_fingerprints(docs).localCheckpoint(eager=False)
    rows = _image_band_rows(fp)
    hamming = _image_hamming_col()
    return (
        _all_bucket_pairs(rows, _LSH_BUCKET_CAP)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= _IMG_HAMMING_K)
        .distinct()
    )


# ---------------------------------------------------------------------------
# X98 — multimodal dedup (text ∪ image evidence, one decision) (r12)

# the image chain re-labeled so its CTE names cannot collide with the
# text pipeline's (_PAIRS_CTE also defines a `bands`)
_IMG_FP_CTES_I = _IMG_FP_CTES.replace(
    "bands AS MATERIALIZED (", "ibands AS MATERIALIZED ("
)
_IMG_PAIRS_SQL_I = _IMG_PAIRS_SQL.replace("bands", "ibands")


def _multimodal_dedup_oracle() -> str:
    from .dedup import _PAIRS_CTE

    return f"""
        WITH RECURSIVE {_PAIRS_CTE},
        {_IMG_FP_CTES_I},
        ipairs AS MATERIALIZED ({_IMG_PAIRS_SQL_I}),
        {_AUD_FP_CTES},
        apairs AS MATERIALIZED ({_AUD_PAIRS_SQL}),
        {_VID_FP_CTES},
        vpairs AS MATERIALIZED ({_VID_PAIRS_SQL}),
        edges AS MATERIALIZED (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
            UNION SELECT doc_a, doc_b FROM ipairs
            UNION SELECT doc_b, doc_a FROM ipairs
            UNION SELECT doc_a, doc_b FROM apairs
            UNION SELECT doc_b, doc_a FROM apairs
            UNION SELECT doc_a, doc_b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs),
        reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ),
        lab AS MATERIALIZED (
            SELECT e.a AS n, least(e.a, min(r.dst)) AS cluster_id
            FROM (SELECT DISTINCT a FROM edges) e
            JOIN reach r ON r.src = e.a
            GROUP BY e.a),
        tc AS (
            SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_text_pairs
            FROM pairs p JOIN lab l ON l.n = p.pa GROUP BY 1),
        ic AS (
            SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_image_pairs
            FROM ipairs p JOIN lab l ON l.n = p.doc_a GROUP BY 1),
        ac AS (
            SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_audio_pairs
            FROM apairs p JOIN lab l ON l.n = p.doc_a GROUP BY 1),
        vc AS (
            SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_video_pairs
            FROM vpairs p JOIN lab l ON l.n = p.doc_a GROUP BY 1)
        SELECT l.cluster_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(coalesce(min(tc.n_text_pairs), 0) AS BIGINT)
                 AS n_text_pairs,
               CAST(coalesce(min(ic.n_image_pairs), 0) AS BIGINT)
                 AS n_image_pairs,
               CAST(coalesce(min(ac.n_audio_pairs), 0) AS BIGINT)
                 AS n_audio_pairs,
               CAST(coalesce(min(vc.n_video_pairs), 0) AS BIGINT)
                 AS n_video_pairs,
               concat_ws('+',
                   CASE WHEN coalesce(min(tc.n_text_pairs), 0) > 0
                        THEN 'text' END,
                   CASE WHEN coalesce(min(ic.n_image_pairs), 0) > 0
                        THEN 'image' END,
                   CASE WHEN coalesce(min(ac.n_audio_pairs), 0) > 0
                        THEN 'audio' END,
                   CASE WHEN coalesce(min(vc.n_video_pairs), 0) > 0
                        THEN 'video' END) AS modality
        FROM lab l
        LEFT JOIN tc ON tc.cluster_id = l.cluster_id
        LEFT JOIN ic ON ic.cluster_id = l.cluster_id
        LEFT JOIN ac ON ac.cluster_id = l.cluster_id
        LEFT JOIN vc ON vc.cluster_id = l.cluster_id
        GROUP BY l.cluster_id
    """


def _channel_pairs(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The four evidence-channel pair relations as (a, b) DataFrames
    read from the content-tagged PAIR CACHE — the VERDICT r12 #6
    index-build amortization applied to dedup evidence: the text
    LSH, image dHash, audio energy, and video temporal pipelines are
    pure functions of (corpus, code), three registry-family queries
    (X98 capstone, X102 registry, X105 purge) consume the identical
    relations, and re-running a codec pass per consumer was the
    dominant capstone cost (measured 9.8 s -> ~3 s at sf0.1).  A
    code or data change lands in a fresh token-named cache dir, so a
    stale pair set can never alias onto the current oracle."""
    import sys

    from . import dedup as _dedup
    from .index_cache import cached

    def _builder(name):
        def build(p: str) -> None:
            src = {
                "text": lambda: _dedup.near_pairs_cached(spark, sf_dir),
                "image": lambda: q_image_dedup(spark, sf_dir),
                "audio": lambda: q_audio_dedup(spark, sf_dir),
                "video": lambda: q_video_dedup(spark, sf_dir),
            }[name]()
            src.select(
                F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
            ).write.mode("overwrite").parquet(p)

        return build

    out = {}
    for name in ("text", "image", "audio", "video"):
        path = cached(
            f"pairs_{name}",
            sf_dir,
            ("documents",),
            (sys.modules[__name__], _dedup),
            _builder(name),
        )
        out[name] = spark.read.schema("a BIGINT, b BIGINT").parquet(path)
    return out


@query(
    "q_multimodal_dedup",
    oracle=_multimodal_dedup_oracle(),
    tags=("multimodal", "dedup", "image", "text", "iterative",
          "extension"),
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIMODAL dedup (X98, FOUR channels since r13) — the
    capstone the X89/X99/X104 family was built toward: one
    duplicate-family decision over the union of ALL evidence
    channels.  A scraped page re-hosted with paraphrased text keeps
    its images; a re-encoded gallery keeps its captions; a
    re-mastered clip keeps its transcript — each channel alone
    misses copies, so the edges of the cluster graph are the text
    MinHash-LSH pairs (q_dedup_near) UNION the perceptual image
    pairs (q_image_dedup) UNION the audio energy-signature pairs
    (q_audio_dedup) UNION the temporal video pairs (q_video_dedup),
    and connected components make the keep-one decision across
    modalities: a text-pair (a,b), an image-pair (b,c), and an
    audio-pair (c,d) land a..d in ONE family.  Per cluster: size,
    per-channel edge counts, and the modality attribution
    ('text+image+audio+video' etc. via NULL-skipping concat_ws) a
    curation review reads first.  The fixture plants image twins at
    (4g, 4g+1), video twins at (4g+1, 4g+2), and audio twins at
    (4g+2, 4g+3) — the video edge STRADDLES the halves, so each
    4-doc group collapses into one family on media evidence alone
    and the per-channel edge sets stay pairwise disjoint.

    Scale shape: all four pair pipelines are the audited
    capped/banded shapes (never all-pairs); the union is
    |pairs|-sized; components run pointer-doubling over edge-touched
    nodes only.  Since r13 the four pair relations come from the
    content-tagged PAIR CACHE (_channel_pairs — the VERDICT r12 #6
    amortization applied to evidence edges: pairs are as much a
    maintained artifact as an index, and three registry-family
    queries consume the identical relations), so a repeated run pays
    only the |pairs|-sized reads + the components iteration; the
    codec/LSH stages run once per (corpus, code) content tag.  The
    oracle replays the ENTIRE composition — shingle minhash bands,
    image fingerprint chain, audio energy chain, video temporal
    chain, and the transitive closure — relationally."""
    from .dedup import connected_components

    pairs = _channel_pairs(spark, sf_dir)
    tpairs, ipairs, apairs, vpairs = (
        pairs["text"], pairs["image"], pairs["audio"], pairs["video"]
    )
    edges = (
        tpairs.unionByName(ipairs)
        .unionByName(apairs)
        .unionByName(vpairs)
        .distinct()
    )
    nodes = (
        edges.select(F.col("a").alias("n"))
        .unionByName(edges.select(F.col("b").alias("n")))
        .distinct()
    )
    lab = connected_components(edges, nodes)
    # one tagged union + ONE lab join + ONE conditional aggregate
    # replaces the former four per-channel join+agg diamonds (r16,
    # guide §2.4 — operations keyed the same way share one exchange):
    # each channel's pair rows carry a channel id, the a-endpoint is
    # labelled once, and the per-cluster channel counts come out of a
    # single groupBy as conditional sums — 4 joins + 4 aggregates
    # collapse to 1 + 1 with identical counts.
    tagged = (
        tpairs.select("a", F.lit(0).alias("ch"))
        .unionByName(ipairs.select("a", F.lit(1).alias("ch")))
        .unionByName(apairs.select("a", F.lit(2).alias("ch")))
        .unionByName(vpairs.select("a", F.lit(3).alias("ch")))
    )
    chan = (
        tagged.join(lab, tagged["a"] == lab["n"])
        .groupBy("cluster_id")
        .agg(
            *[
                F.sum(F.when(F.col("ch") == i, 1).otherwise(0))
                .cast("bigint")
                .alias(name)
                for i, name in enumerate(
                    (
                        "n_text_pairs",
                        "n_image_pairs",
                        "n_audio_pairs",
                        "n_video_pairs",
                    )
                )
            ]
        )
    )
    per = (
        lab.groupBy("cluster_id")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(chan, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_docs",
            F.coalesce("n_text_pairs", F.lit(0)).cast("bigint").alias(
                "n_text_pairs"
            ),
            F.coalesce("n_image_pairs", F.lit(0)).cast("bigint").alias(
                "n_image_pairs"
            ),
            F.coalesce("n_audio_pairs", F.lit(0)).cast("bigint").alias(
                "n_audio_pairs"
            ),
            F.coalesce("n_video_pairs", F.lit(0)).cast("bigint").alias(
                "n_video_pairs"
            ),
        )
    )
    # concat_ws skips NULLs in BOTH engines, so the modality string
    # composes channel flags without 2^4 CASE arms
    return per.withColumn(
        "modality",
        F.concat_ws(
            "+",
            F.when(F.col("n_text_pairs") > 0, "text"),
            F.when(F.col("n_image_pairs") > 0, "image"),
            F.when(F.col("n_audio_pairs") > 0, "audio"),
            F.when(F.col("n_video_pairs") > 0, "video"),
        ),
    )


# ---------------------------------------------------------------------------
# X102 — incremental multimodal family registry, driver-visible (r13)


def _family_registry_oracle() -> str:
    from .dedup import _PAIRS_CTE

    return f"""
        WITH RECURSIVE {_PAIRS_CTE},
        {_IMG_FP_CTES_I},
        ipairs AS MATERIALIZED ({_IMG_PAIRS_SQL_I}),
        {_AUD_FP_CTES},
        apairs AS MATERIALIZED ({_AUD_PAIRS_SQL}),
        {_VID_FP_CTES},
        vpairs AS MATERIALIZED ({_VID_PAIRS_SQL}),
        edges AS MATERIALIZED (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
            UNION SELECT doc_a, doc_b FROM ipairs
            UNION SELECT doc_b, doc_a FROM ipairs
            UNION SELECT doc_a, doc_b FROM apairs
            UNION SELECT doc_b, doc_a FROM apairs
            UNION SELECT doc_a, doc_b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs),
        reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ),
        lab AS MATERIALIZED (
            SELECT e.a AS n, least(e.a, min(r.dst)) AS cluster_id
            FROM (SELECT DISTINCT a FROM edges) e
            JOIN reach r ON r.src = e.a
            GROUP BY e.a)
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
        FROM lab GROUP BY cluster_id
    """


@query(
    "q_family_registry",
    oracle=_family_registry_oracle(),
    tags=("multimodal", "dedup", "iterative", "streaming", "serve",
          "extension"),
)
def q_family_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental duplicate-family REGISTRY (X102, VERDICT r12 #7):
    the four channels' edges (text LSH ∪ image dHash ∪ audio energy
    ∪ video temporal pairs) folded into a MAINTAINED labeling in two
    interleaved batches — split by (a + b) parity, so families
    regularly need a chunk-2 edge to bridge two chunk-1 fragments —
    via streaming/jobs.family_registry_merge_fn: endpoints mapped to
    current cluster ids, the batch CONTRACTED to inter-cluster
    edges, pointer-doubling components over the touched clusters
    only, one relabel join.  Served per-family report
    (cluster_id, n_docs) from the store alone.

    The oracle recomputes batch connected components over ALL edges
    in one recursive chain — so a hash-green row proves the
    incremental merge sequence lands on EXACTLY the from-scratch
    clustering (same partition, same min-id representatives), the
    property that lets a 100 TB registry absorb daily edge deltas at
    |touched components| cost instead of re-clustering the corpus."""
    from ..streaming import jobs as _jobs

    return _jobs.family_registry_serve(
        spark, _registry_store(spark, sf_dir)
    )


def _build_4ch_registry(spark: SparkSession, sf_dir: str, store: str) -> None:
    """Fold all four channels' evidence edges into a fresh family
    registry at ``store`` (labels there, channel-tagged edges at
    ``{store}_edges``) — two parity-split merge batches, so the
    incremental contracted-components path is exercised, not just a
    one-shot build.  Shared by _registry_store and the compacted
    twin."""
    from ..streaming import jobs as _jobs

    pairs = _channel_pairs(spark, sf_dir)
    edges = (
        pairs["text"].withColumn("channel", F.lit("text"))
        .unionByName(
            pairs["image"].withColumn("channel", F.lit("image"))
        )
        .unionByName(
            pairs["audio"].withColumn("channel", F.lit("audio"))
        )
        .unionByName(
            pairs["video"].withColumn("channel", F.lit("video"))
        )
        .distinct()
        .localCheckpoint()
    )
    merge = _jobs.family_registry_merge_fn(spark, store)
    merge(edges.where((F.col("a") + F.col("b")) % 2 == 0), 0)
    merge(edges.where((F.col("a") + F.col("b")) % 2 == 1), 1)


def _registry_store(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) the 4-channel family-registry store for
    ``sf_dir`` — labels at the returned path, the undirected edge
    side-store at ``{path}_edges`` — via the content-tagged cache,
    shared by q_family_registry (read-only serve) and
    q_registry_purge (which COPIES both stores before mutating)."""
    import sys

    from ..streaming import jobs as _jobs
    from .index_cache import cached

    return cached(
        "family_registry",
        sf_dir,
        ("documents",),
        (sys.modules[__name__], _jobs),
        lambda store: _build_4ch_registry(spark, sf_dir, store),
        extra="2chunk-parity",
    )


# ---------------------------------------------------------------------------
# X105 — family-registry purge: deletes that can SPLIT families (r13)


def _registry_purge_oracle() -> str:
    from .dedup import _PAIRS_CTE

    return f"""
        WITH RECURSIVE {_PAIRS_CTE},
        {_IMG_FP_CTES_I},
        ipairs AS MATERIALIZED ({_IMG_PAIRS_SQL_I}),
        {_AUD_FP_CTES},
        apairs AS MATERIALIZED ({_AUD_PAIRS_SQL}),
        {_VID_FP_CTES},
        vpairs AS MATERIALIZED ({_VID_PAIRS_SQL}),
        edges AS MATERIALIZED (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
            UNION SELECT doc_a, doc_b FROM ipairs
            UNION SELECT doc_b, doc_a FROM ipairs
            UNION SELECT doc_a, doc_b FROM apairs
            UNION SELECT doc_b, doc_a FROM apairs
            UNION SELECT doc_a, doc_b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs),
        sedges AS MATERIALIZED (
            SELECT a, b FROM edges
            WHERE a % 10 <> 3 AND b % 10 <> 3),
        reach(src, dst) AS (
            SELECT a, b FROM sedges
            UNION
            SELECT r.src, e.b FROM reach r JOIN sedges e ON r.dst = e.a
        ),
        lab AS MATERIALIZED (
            SELECT e.a AS n, least(e.a, min(r.dst)) AS cluster_id
            FROM (SELECT DISTINCT a FROM sedges) e
            JOIN reach r ON r.src = e.a
            GROUP BY e.a)
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
        FROM lab GROUP BY cluster_id
    """


@query(
    "q_registry_purge",
    oracle=_registry_purge_oracle(),
    tags=("multimodal", "dedup", "iterative", "streaming", "serve",
          "delete", "extension"),
)
def q_registry_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family-registry DELETE (X105) — the lifecycle closure the
    other serving stores got in r12's X88, with the semantics labels
    alone cannot express: tombstoning a doc can SPLIT its family,
    because the family was only ever the transitive closure of the
    evidence edges and the doc may be the bridge.  The registry's
    merge therefore maintains an undirected edge side-store
    (|pairs|-sized), and family_registry_purge recomputes components
    over the SURVIVING edges of the touched clusters only — request-
    sized broadcasts, pointer-doubling over |touched subgraph|,
    untouched families rewritten verbatim, survivors that lose their
    last edge dropping out entirely.

    This query tombstones every doc_id ≡ 3 (mod 10) out of the
    4-channel registry and serves the post-purge per-family report;
    the oracle recomputes connected components FROM SCRATCH over the
    edge set with those docs' edges removed — so a hash-green row
    proves delete-then-serve lands on exactly the from-scratch
    clustering of the surviving corpus (splits, shrinks, dropouts
    and all), the invariant that lets a 100 TB registry honor
    right-to-be-forgotten requests at |touched families| cost
    instead of re-clustering the corpus.  The copy-then-purge
    composition lives behind the cache in _purged_registry_store
    (shared with q_purged_report)."""
    from ..streaming import jobs as _jobs

    return _jobs.family_registry_serve(
        spark, _purged_registry_store(spark, sf_dir)
    )


def _purged_registry_store(spark: SparkSession, sf_dir: str) -> str:
    """The post-purge registry store path (the q_registry_purge
    composition behind its cache) — shared with q_purged_report so
    the delete and the report-after-delete read the same stores."""
    import sys

    from ..streaming import jobs as _jobs
    from .index_cache import cached

    docs = load_table(spark, sf_dir, "documents")

    def _copy_and_purge(store: str) -> None:
        src = _registry_store(spark, sf_dir)
        spark.read.parquet(src).write.mode("overwrite").parquet(store)
        spark.read.parquet(f"{src}_edges").write.mode(
            "overwrite"
        ).parquet(f"{store}_edges")
        _jobs.family_registry_purge(
            spark, store, docs.where(F.col("doc_id") % 10 == 3)
        )

    return cached(
        "family_registry_purged",
        sf_dir,
        ("documents",),
        (sys.modules[__name__], _jobs),
        _copy_and_purge,
        extra="mod10eq3",
    )


# ---------------------------------------------------------------------------
# X107 — audio + video standing gates: the X96 admission service for
# every modality (r13).  media_prints_merge_fn / media_dedup_check
# (streaming/jobs.py) are fingerprint-generic — all three modalities
# ship 64-bit signatures as two 32-bit halves BY CONVENTION — so one
# gate body serves image, audio, and video; what differs per modality
# is only the codec+fingerprint stage and the planted-twin split.


@query(
    "q_audio_gate",
    oracle=f"""
        WITH {_AUD_FP_CTES}
        SELECT DISTINCT n.doc_id AS new_doc, c.doc_id AS corpus_doc,
               CAST(bit_count(xor(n.dhash_hi, c.dhash_hi))
                  + bit_count(xor(n.dhash_lo, c.dhash_lo))
                  AS INTEGER) AS hamming
        FROM abands n JOIN abands c
          ON n.bi = c.bi AND n.bv = c.bv
        WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
          AND bit_count(xor(n.dhash_hi, c.dhash_hi))
            + bit_count(xor(n.dhash_lo, c.dhash_lo))
            <= {_IMG_HAMMING_K}
    """,
    tags=("multimodal", "dedup", "audio", "perceptual", "serve",
          "extension"),
)
def q_audio_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-dedup admission gate, SERVED (X107): ingest the even-id
    half of the corpus into the perceptual fingerprint store (the
    generic media_prints_merge_fn with audio_fingerprints — one
    RIFF/PCM codec pass, 12 bytes per clip), then screen the odd-id
    half as the "upload" batch (media_dedup_check): every
    (new_doc, corpus_doc, hamming) pair within Hamming <=
    {_IMG_HAMMING_K} of ingest history, ZERO decodes of stored
    clips.  Every planted audio twin (doc 4g+3 re-leveling doc 4g+2)
    straddles the even/odd split BY CONSTRUCTION, so the gate must
    catch all of them; the oracle recomputes energies from the
    signal formula and keeps exactly the cross-half band-collision
    pairs — a hash-green row certifies codec, energy signature,
    banding, popcount verify, AND the store/serve composition.

    Scale shape: store build amortized (content-tagged cache), check
    cost tracks upload volume, never corpus size."""
    import sys

    from ..streaming import jobs as _jobs
    from .index_cache import cached

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter("doc_id % 2 = 0").select("doc_id")
    uploads = docs.filter("doc_id % 2 = 1").select("doc_id")
    store = cached(
        "audio_prints",
        sf_dir,
        ("documents",),
        (sys.modules[__name__], _jobs),
        lambda p: _jobs.media_prints_merge_fn(
            spark, p, audio_fingerprints
        )(history, 0),
    )
    return _jobs.media_dedup_check(spark, store, uploads,
                                   audio_fingerprints)


@query(
    "q_video_gate",
    oracle=f"""
        WITH {_VID_FP_CTES}
        SELECT DISTINCT n.doc_id AS new_doc, c.doc_id AS corpus_doc,
               CAST(bit_count(xor(n.dhash_hi, c.dhash_hi))
                  + bit_count(xor(n.dhash_lo, c.dhash_lo))
                  AS INTEGER) AS hamming
        FROM vbands n JOIN vbands c
          ON n.bi = c.bi AND n.bv = c.bv
        WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
          AND bit_count(xor(n.dhash_hi, c.dhash_hi))
            + bit_count(xor(n.dhash_lo, c.dhash_lo))
            <= {_IMG_HAMMING_K}
    """,
    tags=("multimodal", "dedup", "video", "perceptual", "serve",
          "extension"),
)
def q_video_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-dedup admission gate, SERVED (X107): ingest the even-id
    half into the fingerprint store (media_prints_merge_fn with
    video_fingerprints — one animation-codec pass, 12 bytes per
    clip), screen the odd-id half (media_dedup_check).  Every
    planted video twin (4g+1 odd, 4g+2 even) straddles the even/odd
    split BY CONSTRUCTION; the oracle recomputes the temporal
    signature from the clip formula and keeps exactly the cross-half
    band-collision pairs.  With X96 (image) and the audio gate this
    closes the admission-gate matrix: every media modality has a
    standing store + served screen, all three sharing ONE generic
    gate body — at 100 TB that is one service, three fingerprint
    stages."""
    import sys

    from ..streaming import jobs as _jobs
    from .index_cache import cached

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter("doc_id % 2 = 0").select("doc_id")
    uploads = docs.filter("doc_id % 2 = 1").select("doc_id")
    store = cached(
        "video_prints",
        sf_dir,
        ("documents",),
        (sys.modules[__name__], _jobs),
        lambda p: _jobs.media_prints_merge_fn(
            spark, p, video_fingerprints
        )(history, 0),
    )
    return _jobs.media_dedup_check(spark, store, uploads,
                                   video_fingerprints)


# ---------------------------------------------------------------------------
# X110 — ingest-time dedup: gates feed the registry, end to end (r13)


def _ingest_registry_oracle() -> str:
    return f"""
        WITH RECURSIVE
        {_IMG_FP_CTES_I},
        ipairs AS MATERIALIZED ({_IMG_PAIRS_SQL_I}),
        {_AUD_FP_CTES},
        apairs AS MATERIALIZED ({_AUD_PAIRS_SQL}),
        {_VID_FP_CTES},
        vpairs AS MATERIALIZED ({_VID_PAIRS_SQL}),
        edges AS MATERIALIZED (
            SELECT doc_a AS a, doc_b AS b FROM ipairs
            UNION SELECT doc_b, doc_a FROM ipairs
            UNION SELECT doc_a, doc_b FROM apairs
            UNION SELECT doc_b, doc_a FROM apairs
            UNION SELECT doc_a, doc_b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs),
        reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ),
        lab AS MATERIALIZED (
            SELECT e.a AS n, least(e.a, min(r.dst)) AS cluster_id
            FROM (SELECT DISTINCT a FROM edges) e
            JOIN reach r ON r.src = e.a
            GROUP BY e.a)
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
        FROM lab GROUP BY cluster_id
    """


@query(
    "q_ingest_registry",
    oracle=_ingest_registry_oracle(),
    tags=("multimodal", "dedup", "streaming", "serve", "iterative",
          "extension"),
)
def q_ingest_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST-TIME multimodal dedup, end to end (X110) — the
    composition every standing piece was built for: the corpus
    arrives in THREE WAVES (doc_id mod 3), and each wave flows
    upload-style through the full admission machinery — per media
    channel, the wave's fingerprints SET-UNION into the prints store
    (media_prints_merge_fn), then the wave is screened against the
    updated store (media_dedup_check: the post-ingest check sees
    both corpus history AND the wave itself, so within-wave twins
    surface too) — and the resulting evidence edges fold into the
    maintained family registry (family_registry_merge_fn) the moment
    they are discovered.  After the last wave, the served per-family
    report must equal a FROM-SCRATCH clustering of all three media
    channels over the whole corpus — the oracle recomputes exactly
    that (image + audio + video chains, recursive closure), so a
    hash-green row certifies the entire ingest pipeline: codecs,
    fingerprint stores, gate checks, contracted-components merges,
    and the serve, composed across waves, lose NO pair and invent
    none.  (A pair's two docs always land in a common wave-check:
    whichever wave arrives second sees the first in the store.)

    Scale shape: every stage is the audited incremental one — wave
    codec passes are wave-sized, gate joins are band equi-joins vs
    12-byte prints, registry merges are |touched clusters|-sized;
    nothing ever recomputes over the corpus.  At 100 TB this is the
    ingest path: a day's uploads cost a day's codec work plus
    band-join lookups, and \"which family is this upload in\" is
    served from the registry at any moment."""
    import sys

    from ..streaming import jobs as _jobs
    from . import dedup as _dedup
    from .index_cache import cached

    docs = load_table(spark, sf_dir, "documents")

    def _ingest(store: str) -> None:
        reg = f"{store}/registry"
        channels = (
            ("image", image_fingerprints),
            ("audio", audio_fingerprints),
            ("video", video_fingerprints),
        )
        merge = _jobs.family_registry_merge_fn(spark, reg)
        for wave in range(3):
            batch = docs.filter(
                F.col("doc_id").isNotNull()
                & (F.col("doc_id") % 3 == wave)
            ).select("doc_id")
            for ci, (name, fp_fn) in enumerate(channels):
                prints = f"{store}/prints_{name}"
                _jobs.media_prints_merge_fn(spark, prints, fp_fn)(
                    batch, wave
                )
                edges = _jobs.media_dedup_check(
                    spark, prints, batch, fp_fn
                ).select(
                    F.col("new_doc").alias("a"),
                    F.col("corpus_doc").alias("b"),
                )
                merge(edges, wave * 10 + ci)

    store = cached(
        "ingest_registry",
        sf_dir,
        ("documents",),
        (sys.modules[__name__], _jobs, _dedup),
        _ingest,
        extra="3waves-media",
    )
    return _jobs.family_registry_serve(spark, f"{store}/registry")


# ---------------------------------------------------------------------------
# X117 — FOUR-channel ingest-time dedup (r14, VERDICT r13 #3): the
# text channel joins the per-wave fold.


def _ingest_registry_full_oracle() -> str:
    """Oracle for the four-channel ingest composition.  The media
    chains are wave-order-INVARIANT (no caps), so they recompute
    from scratch; the text chain caps buckets on a CUMULATIVE corpus
    statistic, so the oracle replays the exact admission-time
    semantics: an edge exists iff, at the LATER endpoint's wave, the
    bucket's cumulative distinct-(doc, band) size is within the cap
    (the three-wave unroll below — s0/s1/s2 are the store sizes the
    gate actually consulted).  When no bucket crosses the cap
    between waves this equals inline q_dedup_near's edge set (true
    of the fixture — pinned in tests/test_streaming.py — and of any
    corpus whose hot buckets are hot from the start)."""
    from ..functions.textfeat import SHINGLES_SQL_CTE
    from .dedup import _BAND_SQL, _LSH_BUCKET_CAP, _MINHASH_COLS_SQL

    cap = _LSH_BUCKET_CAP
    return f"""
        WITH RECURSIVE
        {SHINGLES_SQL_CTE},
        mh AS MATERIALIZED (
            SELECT doc_id,
               {_MINHASH_COLS_SQL}
            FROM ex GROUP BY doc_id),
        tb AS MATERIALIZED ({_BAND_SQL}),
        tsz AS MATERIALIZED (
            SELECT bi, bv,
                   count(*) FILTER (doc_id % 3 <= 0) AS s0,
                   count(*) FILTER (doc_id % 3 <= 1) AS s1,
                   count(*) AS s2
            FROM tb GROUP BY bi, bv),
        tpairs AS MATERIALIZED (
            SELECT DISTINCT least(n.doc_id, c.doc_id) AS doc_a,
                            greatest(n.doc_id, c.doc_id) AS doc_b
            FROM tb n
            JOIN tb c ON n.bi = c.bi AND n.bv = c.bv
                     AND n.doc_id <> c.doc_id
            JOIN tsz z ON z.bi = n.bi AND z.bv = n.bv
            WHERE (n.doc_id % 3 = 0 AND c.doc_id % 3 = 0
                   AND z.s0 <= {cap})
               OR (n.doc_id % 3 = 1 AND c.doc_id % 3 <= 1
                   AND z.s1 <= {cap})
               OR (n.doc_id % 3 = 2 AND z.s2 <= {cap})),
        {_IMG_FP_CTES_I},
        ipairs AS MATERIALIZED ({_IMG_PAIRS_SQL_I}),
        {_AUD_FP_CTES},
        apairs AS MATERIALIZED ({_AUD_PAIRS_SQL}),
        {_VID_FP_CTES},
        vpairs AS MATERIALIZED ({_VID_PAIRS_SQL}),
        edges AS MATERIALIZED (
            SELECT doc_a AS a, doc_b AS b FROM tpairs
            UNION SELECT doc_b, doc_a FROM tpairs
            UNION SELECT doc_a, doc_b FROM ipairs
            UNION SELECT doc_b, doc_a FROM ipairs
            UNION SELECT doc_a, doc_b FROM apairs
            UNION SELECT doc_b, doc_a FROM apairs
            UNION SELECT doc_a, doc_b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs),
        reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ),
        lab AS MATERIALIZED (
            SELECT e.a AS n, least(e.a, min(r.dst)) AS cluster_id
            FROM (SELECT DISTINCT a FROM edges) e
            JOIN reach r ON r.src = e.a
            GROUP BY e.a)
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
        FROM lab GROUP BY cluster_id
    """


@query(
    "q_ingest_registry_full",
    oracle=_ingest_registry_full_oracle(),
    tags=("multimodal", "dedup", "streaming", "serve", "iterative",
          "text", "extension"),
)
def q_ingest_registry_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOUR-channel ingest-time dedup (X117) — closes the one
    asymmetry q_ingest_registry documented: the TEXT channel now
    folds into the family registry per wave too.  Each wave merges
    its MinHash band rows into the maintained band store
    (contamination_bands_merge_fn — the store the standing text gate
    already keeps), then screens itself against the UPDATED store
    (text_dedup_check: bucket caps computed over store ∪ batch =
    the cumulative corpus so far, so the gate consults exactly the
    statistic a from-scratch run over the ingested prefix would),
    and the admitted (new_doc, corpus_doc) pairs fold into the
    registry alongside the three media channels' edges — all four
    evidence channels land the moment they are discovered.

    Cap semantics under incremental ingest are ADMISSION-TIME: an
    edge folds iff its bucket is within cap when its later endpoint
    arrives, and a bucket that later turns hot does not retract
    already-folded edges (production gates cannot un-admit).  The
    oracle replays exactly that (three-wave unroll over cumulative
    bucket sizes), so the hash check is semantics-exact, not
    fixture-lucky; when no bucket crosses the cap mid-ingest —
    true of the fixture, pinned in tests — the edge set equals
    inline q_dedup_near's.

    Scale shape: identical to q_ingest_registry (wave-sized codec +
    band passes, store-sized equi-joins, |touched clusters| merges)
    plus the text store's ~4 band rows × ~34 bytes per doc."""
    import sys

    from ..streaming import jobs as _jobs
    from . import dedup as _dedup
    from .index_cache import cached

    docs = load_table(spark, sf_dir, "documents")

    def _ingest(store: str) -> None:
        reg = f"{store}/registry"
        channels = (
            ("image", image_fingerprints),
            ("audio", audio_fingerprints),
            ("video", video_fingerprints),
        )
        merge = _jobs.family_registry_merge_fn(spark, reg)
        tstore = f"{store}/prints_text"
        for wave in range(3):
            batch = docs.filter(
                F.col("doc_id").isNotNull()
                & (F.col("doc_id") % 3 == wave)
            )
            ids = batch.select("doc_id")
            # text channel: merge the wave's bands FIRST (the store
            # then IS the cumulative corpus), gate against it, fold
            _jobs.contamination_bands_merge_fn(spark, tstore)(
                batch.select("doc_id", "text"), wave
            )
            tedges = _jobs.text_dedup_check(
                spark, tstore, batch.select("doc_id", "text")
            ).select(
                F.col("new_doc").alias("a"),
                F.col("corpus_doc").alias("b"),
                F.lit("text").alias("channel"),
            )
            merge(tedges, wave * 10 + 9)
            for ci, (name, fp_fn) in enumerate(channels):
                prints = f"{store}/prints_{name}"
                _jobs.media_prints_merge_fn(spark, prints, fp_fn)(
                    ids, wave
                )
                edges = _jobs.media_dedup_check(
                    spark, prints, ids, fp_fn
                ).select(
                    F.col("new_doc").alias("a"),
                    F.col("corpus_doc").alias("b"),
                    F.lit(name).alias("channel"),
                )
                merge(edges, wave * 10 + ci)

    store = cached(
        "ingest_registry_full",
        sf_dir,
        ("documents",),
        (sys.modules[__name__], _jobs, _dedup),
        _ingest,
        extra="3waves-allchannels",
    )
    return _jobs.family_registry_serve(spark, f"{store}/registry")


# ---------------------------------------------------------------------------
# X111 — capstone report served from the maintained registry (r13)


@query(
    "q_registry_report",
    oracle=_multimodal_dedup_oracle(),
    tags=("multimodal", "dedup", "streaming", "serve", "extension"),
)
def q_registry_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL multimodal-dedup report SERVED from the maintained
    registry (X111): q_multimodal_dedup's exact output — per-family
    size, per-channel evidence counts, modality attribution — but
    computed from the label store plus the channel-tagged edge
    side-store alone (jobs.family_registry_report): one |labels|
    scan, one |edges| scan, zero pair pipelines, zero codec work,
    zero documents scans.  The oracle IS the capstone oracle
    (recomputing all four chains + transitive closure from scratch),
    so a hash-green row proves the maintained store is SUFFICIENT
    for the report a curation review actually reads — at 100 TB the
    difference between \"rerun the dedup suite for the weekly
    report\" and \"aggregate two metadata-sized stores\"."""
    from ..streaming import jobs as _jobs

    return _jobs.family_registry_report(
        spark, _registry_store(spark, sf_dir)
    )


@query(
    "q_registry_report_compacted",
    oracle=_multimodal_dedup_oracle(),
    tags=("multimodal", "dedup", "streaming", "serve", "maintenance",
          "extension"),
)
def q_registry_report_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone report served AFTER store compaction (X120) —
    the driver-visible half of family_registry_compact (r14): build
    the 4-channel registry incrementally, COMPACT both stores
    (labels + channel-tagged edges folded to single leaves via the
    stage-rename commit), then serve q_registry_report's exact
    output from the compacted stores.  The oracle is the capstone
    oracle (all four chains + transitive closure from scratch), so a
    hash-green row proves compaction is row-exact through the
    report a curation review reads — the OPTIMIZE step of the
    registry lifecycle certified end to end, not just pytest-pinned.

    Scale shape: the build is the amortized offline step; compaction
    is two bounded rewrites (|labels| + |edges| rows); the serve is
    the same two metadata-sized scans as q_registry_report, now with
    one file-open per store instead of dozens."""
    import sys

    from ..streaming import jobs as _jobs
    from .index_cache import cached

    def _build(store: str) -> None:
        _build_4ch_registry(spark, sf_dir, store)
        _jobs.family_registry_compact(spark, store)

    store = cached(
        "family_registry",
        sf_dir,
        ("documents",),
        (sys.modules[__name__], _jobs),
        _build,
        extra="2chunk-parity-compacted",
    )
    return _jobs.family_registry_report(spark, store)


# ---------------------------------------------------------------------------
# X113/X114 — REAL resize + REAL frame-sample transcode (r13).  The
# X5 plumbing kept clearly-marked fakes (fake_resize, the 32-byte
# fake frame container) from the rounds before the codecs were real;
# with certified GIF87a/GIF89a codecs both media transforms are now
# implemented for real: decode -> resample/select -> RE-ENCODE (a
# transcode, not a passthrough) -> certified re-decode.


def resize_gif_gray(payload: bytes, factor: int = 2) -> bytes:
    """REAL thumbnail: decode a grayscale GIF, nearest-neighbor
    downsample by ``factor`` (pixel (i, j) of the thumbnail is pixel
    (factor*i, factor*j) of the source — deterministic and
    SQL-replicable, unlike an averaging kernel's rounding), and
    re-encode through the same certified LZW writer.  ceil-division
    dimensions keep 1-pixel edges."""
    w, h, px = decode_gif_gray_pixels(payload)
    ow = (w + factor - 1) // factor
    oh = (h + factor - 1) // factor
    rows = [
        bytes(px[(y * factor) * w + x * factor] for x in range(ow))
        for y in range(oh)
    ]
    return encode_gif_gray(ow, oh, rows)


def sample_gif_frames(
    payload: bytes, every_n: int
) -> list[tuple[int, int, bytes]]:
    """REAL frame sampler: decode a GIF89a animation and re-encode
    every ``every_n``-th frame as a standalone single-image GIF87a —
    the transcode a video pipeline runs to hand frames to an image
    model.  Returns (original frame index, delay_cs, payload)."""
    w, h, frames = decode_gif_anim(payload)
    out = []
    for fi in range(0, len(frames), every_n):
        delay, px = frames[fi]
        rows = [px[y * w : (y + 1) * w] for y in range(h)]
        out.append((fi, delay, encode_gif_gray(w, h, rows)))
    return out


MM_THUMB_SCHEMA = (
    "doc_id bigint, orig_width int, orig_height int, width int, "
    "height int, sum_pix bigint, sum_sq bigint"
)


def _thumbnail_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: deterministic raster -> REAL GIF encode ->
    REAL resize transcode (decode, 2x nearest-neighbor, re-encode)
    -> certified re-decode -> thumbnail statistics.  NULL inputs
    yield NULL features (the dims LEFT JOIN contract)."""
    cols = ("orig_width", "orig_height", "width", "height",
            "sum_pix", "sum_sq")
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in ("doc_id",) + cols}
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            if pd.isna(doc_id) or pd.isna(n_chars):
                out["doc_id"].append(
                    None if pd.isna(doc_id) else int(doc_id)
                )
                for k in cols:
                    out[k].append(None)
                continue
            d = int(doc_id)
            w = ((d % 14) + 14) % 14 + 3
            h = ((int(n_chars) % 14) + 14) % 14 + 3
            rows = [
                bytes(
                    (((d * 13 + 7 * x + 11 * y) % 256) + 256) % 256
                    for x in range(w)
                )
                for y in range(h)
            ]
            thumb = resize_gif_gray(encode_gif_gray(w, h, rows))
            tw, th, px = decode_gif_gray_pixels(thumb)
            out["doc_id"].append(d)
            out["orig_width"].append(w)
            out["orig_height"].append(h)
            out["width"].append(tw)
            out["height"].append(th)
            out["sum_pix"].append(sum(px))
            out["sum_sq"].append(sum(v * v for v in px))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="Int64"),
                "orig_width": pd.Series(out["orig_width"], dtype="Int32"),
                "orig_height": pd.Series(out["orig_height"], dtype="Int32"),
                "width": pd.Series(out["width"], dtype="Int32"),
                "height": pd.Series(out["height"], dtype="Int32"),
                "sum_pix": pd.Series(out["sum_pix"], dtype="Int64"),
                "sum_sq": pd.Series(out["sum_sq"], dtype="Int64"),
            }
        )


@query(
    "q_image_thumbnail",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   ((doc_id % 14) + 14) % 14 + 3 AS w,
                   ((n_chars % 14) + 14) % 14 + 3 AS h,
                   (doc_id IS NOT NULL AND n_chars IS NOT NULL) AS ok
            FROM documents),
        px AS (
            SELECT doc_id, w, h,
                   (((doc_id * 13 + 7 * (2 * x.i) + 11 * (2 * y.i))
                       % 256) + 256) % 256 AS v
            FROM dims,
                 generate_series(0, 8) x(i),
                 generate_series(0, 8) y(i)
            WHERE ok AND 2 * x.i < w AND 2 * y.i < h),
        agg AS (
            SELECT doc_id,
                   CAST(w AS INTEGER) AS orig_width,
                   CAST(h AS INTEGER) AS orig_height,
                   CAST((w + 1) // 2 AS INTEGER) AS width,
                   CAST((h + 1) // 2 AS INTEGER) AS height,
                   CAST(sum(v) AS BIGINT) AS sum_pix,
                   CAST(sum(v * v) AS BIGINT) AS sum_sq
            FROM px
            GROUP BY doc_id, w, h)
        SELECT d.doc_id, a.orig_width, a.orig_height, a.width,
               a.height, a.sum_pix, a.sum_sq
        FROM dims d
        LEFT JOIN agg a ON d.ok AND d.doc_id = a.doc_id
    """,
    tags=("multimodal", "extension", "pandas-udf", "resize", "gif"),
)
def q_image_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL thumbnailing (X113) — retires the last fake in the X5
    transform plumbing: every document's image is GIF-encoded,
    DECODED, nearest-neighbor downsampled 2x (thumbnail pixel (i, j)
    = source pixel (2i, 2j) — deterministic, so the oracle can
    recompute it from the pixel formula alone), RE-ENCODED through
    the same certified LZW writer, and re-decoded for the checked
    statistics — a full decode->resample->re-encode transcode, the
    shape an image-model preprocessing stage runs.  A hash-green row
    certifies both codec trips AND the resample arithmetic.

    Scale shape: one documents scan, one Arrow-batched stage, output
    row per image with 6 ints — the thumbnail bytes exist only
    inside the worker (a real pipeline would write them to a sink;
    the stats are the verifiable part)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "n_chars")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_thumbnail_batches, schema=MM_THUMB_SCHEMA)
    )


MM_VSAMPLE_SCHEMA = (
    "doc_id bigint, frame_idx int, delay_cs int, width int, height int, "
    "sum_pix bigint, sum_sq bigint"
)


def _video_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: 8-frame clip -> REAL GIF89a encode ->
    REAL frame-sample transcode (decode animation, keep every 2nd
    frame, re-encode each as standalone GIF87a) -> each sampled
    frame re-decoded through the SINGLE-IMAGE decoder (cross-codec
    closure) -> per-frame statistics.  Row-exploding: one input doc
    yields 4 output rows."""
    for pdf in batches:
        out: dict[str, list] = {
            k: []
            for k in ("doc_id", "frame_idx", "delay_cs", "width",
                      "height", "sum_pix", "sum_sq")
        }
        for doc_id in pdf["doc_id"]:
            if pd.isna(doc_id):
                continue  # no id -> no clip; oracle filters likewise
            d = int(doc_id)
            clip = encode_gif_anim(
                _VID_W,
                _VID_H,
                _video_frame_rows(d),
                [4 + f for f in range(_VID_NF)],
            )
            for fi, delay, frame_payload in sample_gif_frames(clip, 2):
                fw, fh, px = decode_gif_gray_pixels(frame_payload)
                out["doc_id"].append(d)
                out["frame_idx"].append(fi)
                out["delay_cs"].append(delay)
                out["width"].append(fw)
                out["height"].append(fh)
                out["sum_pix"].append(sum(px))
                out["sum_sq"].append(sum(v * v for v in px))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="Int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="Int32"),
                "delay_cs": pd.Series(out["delay_cs"], dtype="Int32"),
                "width": pd.Series(out["width"], dtype="Int32"),
                "height": pd.Series(out["height"], dtype="Int32"),
                "sum_pix": pd.Series(out["sum_pix"], dtype="Int64"),
                "sum_sq": pd.Series(out["sum_sq"], dtype="Int64"),
            }
        )


@query(
    "q_video_sample",
    oracle=f"""
        WITH vid AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 1 OR doc_id % 4 = 2
                        THEN doc_id // 4 * 2 + 1
                        ELSE 3000000 + 20 * doc_id + 17 END AS s
            FROM documents WHERE doc_id IS NOT NULL),
        vpx0 AS (
            SELECT doc_id, f.i AS f, x.i AS x, y.i AS y,
                   {_VID_PIXEL_SQL} AS p0
            FROM vid,
                 generate_series(0, {_VID_W - 1}) x(i),
                 generate_series(0, {_VID_H - 1}) y(i),
                 generate_series(0, {_VID_NF - 1}) f(i)
            WHERE f.i % 2 = 0),
        vpx AS (
            SELECT doc_id, f, x, y,
                   CASE WHEN doc_id % 4 = 2 AND f = {_VID_TWIN_F}
                             AND x // 4 = 1 AND y // 3 = 2
                        THEN least(p0 + 4, 255) ELSE p0 END AS p
            FROM vpx0)
        SELECT doc_id,
               CAST(f AS INTEGER) AS frame_idx,
               CAST(4 + f AS INTEGER) AS delay_cs,
               CAST({_VID_W} AS INTEGER) AS width,
               CAST({_VID_H} AS INTEGER) AS height,
               CAST(sum(p) AS BIGINT) AS sum_pix,
               CAST(sum(p * p) AS BIGINT) AS sum_sq
        FROM vpx
        GROUP BY doc_id, f
    """,
    tags=("multimodal", "extension", "pandas-udf", "video", "frames",
          "transcode"),
)
def q_video_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame-sample transcode (X114) — retires the 32-byte fake
    frame container: every document's 8-frame clip is GIF89a-encoded,
    DECODED, every 2nd frame re-encoded as a standalone single-image
    GIF87a (the transcode that hands video frames to an image
    model), and each sampled frame re-decoded through the
    SINGLE-IMAGE decoder — so a hash-green row certifies the
    animation codec, the frame selection, the standalone re-encode,
    AND that both decoders agree on the same pixels (cross-codec
    closure).  Row-exploding Arrow shape: one doc -> 4 frame rows,
    GCE delays carried through the transcode.

    Scale shape: one documents scan projecting doc_id, one
    Arrow-batched stage; frames exist only inside the worker and the
    output is statistics — at 100 TB the codec work parallelizes
    over clips and the result stays metadata-sized."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_video_sample_batches, schema=MM_VSAMPLE_SCHEMA)
    )


# ---------------------------------------------------------------------------
# X115 — the report after the deletes: X105 ∘ X111 composed (r13)


def _purged_report_oracle() -> str:
    from .dedup import _PAIRS_CTE

    surv = "a % 10 <> 3 AND b % 10 <> 3"
    return f"""
        WITH RECURSIVE {_PAIRS_CTE},
        {_IMG_FP_CTES_I},
        ipairs AS MATERIALIZED ({_IMG_PAIRS_SQL_I}),
        {_AUD_FP_CTES},
        apairs AS MATERIALIZED ({_AUD_PAIRS_SQL}),
        {_VID_FP_CTES},
        vpairs AS MATERIALIZED ({_VID_PAIRS_SQL}),
        st AS MATERIALIZED (
            SELECT pa AS a, pb AS b FROM pairs
            WHERE pa % 10 <> 3 AND pb % 10 <> 3),
        si AS MATERIALIZED (
            SELECT doc_a AS a, doc_b AS b FROM ipairs
            WHERE doc_a % 10 <> 3 AND doc_b % 10 <> 3),
        sa AS MATERIALIZED (
            SELECT doc_a AS a, doc_b AS b FROM apairs
            WHERE doc_a % 10 <> 3 AND doc_b % 10 <> 3),
        sv AS MATERIALIZED (
            SELECT doc_a AS a, doc_b AS b FROM vpairs
            WHERE doc_a % 10 <> 3 AND doc_b % 10 <> 3),
        edges AS MATERIALIZED (
            SELECT a, b FROM st UNION SELECT b, a FROM st
            UNION SELECT a, b FROM si UNION SELECT b, a FROM si
            UNION SELECT a, b FROM sa UNION SELECT b, a FROM sa
            UNION SELECT a, b FROM sv UNION SELECT b, a FROM sv),
        reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ),
        lab AS MATERIALIZED (
            SELECT e.a AS n, least(e.a, min(r.dst)) AS cluster_id
            FROM (SELECT DISTINCT a FROM edges) e
            JOIN reach r ON r.src = e.a
            GROUP BY e.a),
        tc AS (
            SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_text_pairs
            FROM st p JOIN lab l ON l.n = p.a GROUP BY 1),
        ic AS (
            SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_image_pairs
            FROM si p JOIN lab l ON l.n = p.a GROUP BY 1),
        ac AS (
            SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_audio_pairs
            FROM sa p JOIN lab l ON l.n = p.a GROUP BY 1),
        vc AS (
            SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_video_pairs
            FROM sv p JOIN lab l ON l.n = p.a GROUP BY 1)
        SELECT l.cluster_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(coalesce(min(tc.n_text_pairs), 0) AS BIGINT)
                 AS n_text_pairs,
               CAST(coalesce(min(ic.n_image_pairs), 0) AS BIGINT)
                 AS n_image_pairs,
               CAST(coalesce(min(ac.n_audio_pairs), 0) AS BIGINT)
                 AS n_audio_pairs,
               CAST(coalesce(min(vc.n_video_pairs), 0) AS BIGINT)
                 AS n_video_pairs,
               concat_ws('+',
                   CASE WHEN coalesce(min(tc.n_text_pairs), 0) > 0
                        THEN 'text' END,
                   CASE WHEN coalesce(min(ic.n_image_pairs), 0) > 0
                        THEN 'image' END,
                   CASE WHEN coalesce(min(ac.n_audio_pairs), 0) > 0
                        THEN 'audio' END,
                   CASE WHEN coalesce(min(vc.n_video_pairs), 0) > 0
                        THEN 'video' END) AS modality
        FROM lab l
        LEFT JOIN tc ON tc.cluster_id = l.cluster_id
        LEFT JOIN ic ON ic.cluster_id = l.cluster_id
        LEFT JOIN ac ON ac.cluster_id = l.cluster_id
        LEFT JOIN vc ON vc.cluster_id = l.cluster_id
        GROUP BY l.cluster_id
    """


@query(
    "q_purged_report",
    oracle=_purged_report_oracle(),
    tags=("multimodal", "dedup", "streaming", "serve", "delete",
          "extension"),
)
def q_purged_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone report AFTER right-to-be-forgotten (X115 = X105
    ∘ X111): tombstone doc_id ≡ 3 (mod 10) out of the 4-channel
    registry, then serve the FULL per-family report — size,
    per-channel counts, modality — from the purged stores alone.
    The oracle recomputes every channel's pair pipeline, drops pairs
    touching a tombstoned doc, re-clusters from scratch, and
    re-derives the per-channel attribution — so one hash-green row
    certifies that the purge's touched-cluster relabeling AND the
    channel-preserving edge rewrite compose: after a delete, the
    weekly report is still two metadata-sized store scans and still
    exactly right (splits re-attributed, dropped channels'
    modalities updated, dropout docs gone)."""
    from ..streaming import jobs as _jobs

    return _jobs.family_registry_report(
        spark, _purged_registry_store(spark, sf_dir)
    )


# ---------------------------------------------------------------------------
# X116 — multimodal blast radius, served from the registry (r13)


def _radius_served_oracle() -> str:
    from .dedup import _PAIRS_CTE, _RADIUS_HOPS

    return f"""
        WITH RECURSIVE {_PAIRS_CTE},
        {_IMG_FP_CTES_I},
        ipairs AS MATERIALIZED ({_IMG_PAIRS_SQL_I}),
        {_AUD_FP_CTES},
        apairs AS MATERIALIZED ({_AUD_PAIRS_SQL}),
        {_VID_FP_CTES},
        vpairs AS MATERIALIZED ({_VID_PAIRS_SQL}),
        edges AS MATERIALIZED (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
            UNION SELECT doc_a, doc_b FROM ipairs
            UNION SELECT doc_b, doc_a FROM ipairs
            UNION SELECT doc_a, doc_b FROM apairs
            UNION SELECT doc_b, doc_a FROM apairs
            UNION SELECT doc_a, doc_b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs),
        seeds AS (
            SELECT doc_id AS n FROM documents
            WHERE doc_id IS NOT NULL AND doc_id % 97 = 0),
        reach(n, hop) AS (
            SELECT n, 0 FROM seeds
            UNION
            SELECT e.b, r.hop + 1
            FROM reach r JOIN edges e ON e.a = r.n
            WHERE r.hop < {_RADIUS_HOPS}
        )
        SELECT n AS doc_id, CAST(min(hop) AS INTEGER) AS hops
        FROM reach GROUP BY n
    """


@query(
    "q_radius_served",
    oracle=_radius_served_oracle(),
    tags=("multimodal", "dedup", "graph", "iterative", "serve",
          "extension"),
)
def q_radius_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIMODAL blast radius, SERVED (X116 = X109 over X102's
    store): every document within 3 hops of a flagged set in the
    FOUR-CHANNEL duplicate graph — text LSH ∪ image dHash ∪ audio
    energy ∪ video temporal edges — answered from the maintained
    registry edge side-store alone: one |edges| scan, frontier BFS
    (the X109 shape), ZERO pair pipelines and zero codec work at
    query time.  Cross-modal chains matter here: a flagged doc's
    video twin's audio twin is 2 hops away even though no single
    channel connects them — the quarantine a text-only radius would
    miss.  The oracle recomputes all four channels' pipelines and a
    hop-bounded closure from scratch, so a hash-green row certifies
    the maintained edges are COMPLETE (no pair lost across merges)
    and the served BFS is exact min-distance."""
    from ..streaming import jobs as _jobs
    from .dedup import _RADIUS_HOPS

    docs = load_table(spark, sf_dir, "documents")
    store = _registry_store(spark, sf_dir)
    half = spark.read.schema(_jobs._FAMILY_EDGE_DDL).parquet(
        f"{store}_edges"
    ).select("a", "b")
    edges = (
        half.unionByName(
            half.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint()
    )
    seeds = (
        docs.filter(
            F.col("doc_id").isNotNull() & (F.col("doc_id") % 97 == 0)
        )
        .select(F.col("doc_id").alias("n"))
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    dist = seeds
    frontier = seeds.select("n")
    for h in range(1, _RADIUS_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["n"] == edges["a"])
            .select(F.col("b").alias("n"))
            .distinct()
        )
        newf = (
            nxt.join(dist.select("n"), "n", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        dist = dist.unionByName(newf).localCheckpoint()
        frontier = newf.select("n")
    return dist.select(
        F.col("n").alias("doc_id"), F.col("hops").cast("int").alias("hops")
    )
