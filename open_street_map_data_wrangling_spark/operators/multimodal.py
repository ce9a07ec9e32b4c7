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
q_image_decode).  Pixel-level decode still needs a codec (this
container has no image/audio libs), so `fake_decode_meta` remains the
clearly-marked deterministic stand-in for pixel features in tests
and the other oracle-checked queries.

Scale notes: mapInPandas streams Arrow record batches through one
Python worker per core — the payload bytes never land on the driver;
partition sizing (`spark.sql.files.maxPartitionBytes`, or an explicit
repartition on the id) controls batch memory, which is what matters
when each row carries megabytes of media.
"""

from __future__ import annotations

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


# ---- resize + frame-sample plumbing ---------------------------------
#
# The remaining two mandated media verbs. Real pixel work needs a
# codec (absent here — see decode_image); the TRANSFORMS are
# deterministic byte-level stand-ins, clearly marked, while the
# Spark-side plumbing — schemas, Arrow batch shapes (including the
# row-EXPLODING frame sampler), partition preservation — is real and
# is what a codec drop-in would inherit unchanged.

MM_RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, "
    "orig_width int, orig_height int"
)

MM_FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_payload binary"

_FAKE_FRAME_BYTES = 32  # fake video = concatenated 32-byte frames


def fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a pixel resize: truncate/tile the
    payload to w*h bytes (a real implementation decodes, resamples,
    re-encodes — same signature, same schema)."""
    if not payload:
        return bytes(w * h)
    reps = (w * h + len(payload) - 1) // len(payload)
    return (payload * reps)[: w * h]


def resize_media(binary_df: DataFrame, w: int, h: int) -> DataFrame:
    """Resize operator: (doc_id, payload) -> resized payload + old
    and new dimensions, Arrow-batched, one output row per input row
    (batch shape preserved — the cheap case)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads.map(lambda b: fake_resize(b, w, h)),
                    "width": w,
                    "height": h,
                    "orig_width": dims.map(lambda t: t[0]).astype("int32"),
                    "orig_height": dims.map(lambda t: t[1]).astype("int32"),
                }
            )

    return binary_df.mapInPandas(run, schema=MM_RESIZED_SCHEMA)


def sample_frames(binary_df: DataFrame, every_n: int) -> DataFrame:
    """Frame sampler: treats the payload as a frame container
    (_FAKE_FRAME_BYTES per fake frame) and emits every ``every_n``-th
    frame as its own row — the row-EXPLODING mapInPandas shape (one
    input batch yields a larger output batch; Arrow handles the
    fan-out, the schema fixes the contract).  This is the batch-shape
    case a video pipeline actually exercises: output cardinality is
    data-dependent, so nothing downstream may assume 1:1 with the
    input — and nothing here does."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // _FAKE_FRAME_BYTES)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(
                        payload[fi * _FAKE_FRAME_BYTES : (fi + 1) * _FAKE_FRAME_BYTES]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": frames,
                }
            )

    return binary_df.mapInPandas(run, schema=MM_FRAMES_SCHEMA)
