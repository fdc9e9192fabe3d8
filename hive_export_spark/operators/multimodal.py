"""Multimodal column handling (SURVEY.md section 2.2): image/audio/video
as opaque BinaryType payloads with typed metadata, processed by
Arrow-batched Pandas functions over mapInPandas.

The metadata decode is REAL: ``parse_media_header`` reads container
headers from the raw bytes — PNG magic + IHDR (CRC-verified), JPEG/MJPEG
SOF frame headers + SOI frame count, RIFF/WAVE fmt + data chunks, GIF
logical screen — all pure Python inside the Arrow batch iterator, no
media libraries needed. Payloads that are not a recognized container fall
back to deterministic pseudo-features (``_fake_decode``), the pre-round-3
stub, so the operator is total. Pixel/sample DECODING (not just headers)
still needs PIL/ffmpeg and is out of scope in this environment.

``documents_as_real_media`` builds structurally valid PNG / WAV / MJPEG
payloads from the documents fixture (dimensions and frame counts derived
from the text length), so the parse path is exercised against real byte
layouts and an SQL oracle can verify the construct→parse round trip
arithmetically.

Scale notes: media payloads dominate row size, so (a) keep metadata in
separate columns to let Catalyst prune payload reads when only metadata is
queried (parquet column pruning skips the binary column entirely), and
(b) size spark.sql.files.maxPartitionBytes so one task's Arrow batches fit
in executor memory at real payload sizes.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_source", T.StringType()),
        T.StructField("meta_lang", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# container builders (fixture-side: synthesize real byte layouts)
# ---------------------------------------------------------------------------


def png_bytes(width: int, height: int, body: bytes = b"") -> bytes:
    """Minimal structurally-valid PNG prefix: magic + IHDR chunk (with a
    real CRC32), followed by opaque body bytes. Total = len(body) + 33."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        _PNG_MAGIC
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        + body
    )


def wav_bytes(n_samples: int, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE: fmt chunk (PCM mono 16-bit) + zeroed data chunk
    of ``n_samples`` samples. Total = 44 + 2 * n_samples."""
    data = b"\x00\x00" * n_samples
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def mjpeg_bytes(width: int, height: int, n_frames: int) -> bytes:
    """MJPEG-style stream: first frame = SOI + SOF0 (real dimensions) +
    EOI; each further frame = SOI + EOI. Total = 23 + 4 * (n_frames - 1)."""
    sof0 = b"\xff\xc0" + struct.pack(
        ">HBHHB", 17, 8, height, width, 3
    ) + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    first = b"\xff\xd8" + sof0 + b"\xff\xd9"
    return first + b"\xff\xd8\xff\xd9" * (n_frames - 1)


# ---------------------------------------------------------------------------
# header parsers (real pure-Python decode of the bytes)
# ---------------------------------------------------------------------------


def _parse_png(payload: bytes):
    if len(payload) < 33 or not payload.startswith(_PNG_MAGIC):
        return None
    (length,) = struct.unpack(">I", payload[8:12])
    if length != 13 or payload[12:16] != b"IHDR":
        return None
    (crc,) = struct.unpack(">I", payload[29:33])
    if crc != (zlib.crc32(payload[12:29]) & 0xFFFFFFFF):
        return None  # corrupt header
    width, height = struct.unpack(">II", payload[16:24])
    return "png", width, height, 1


def _parse_jpeg(payload: bytes):
    if len(payload) < 4 or not payload.startswith(b"\xff\xd8"):
        return None
    # scan marker segments of the first frame for SOF0-SOF3 dimensions
    width = height = None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            break
        marker = payload[i + 1]
        if marker in (0xD8, 0xD9):  # SOI/EOI carry no length
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if 0xC0 <= marker <= 0xC3:
            if i + 9 > len(payload):  # truncated SOF segment
                return None
            height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
            break
        i += 2 + seglen
    if width is None:
        return None
    n_frames = payload.count(b"\xff\xd8")
    return "mjpeg" if n_frames > 1 else "jpeg", width, height, n_frames


def _parse_wav(payload: bytes):
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    block_align = None
    i = 12
    while i + 8 <= len(payload):
        chunk_id = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if chunk_id == b"fmt " and size >= 16:
            if i + 22 > len(payload):  # truncated fmt chunk
                return None
            block_align = struct.unpack("<H", payload[i + 20 : i + 22])[0]
        elif chunk_id == b"data" and block_align:
            return "wav", 0, 0, size // block_align
        i += 8 + size + (size & 1)
    return None


def _parse_gif(payload: bytes):
    if len(payload) < 10 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", payload[6:10])
    return "gif", width, height, 1


def parse_media_header(payload: bytes):
    """Real container-header decode from magic bytes: returns
    (format, width, height, n_frames) or None if unrecognized."""
    for parser in (_parse_png, _parse_jpeg, _parse_wav, _parse_gif):
        try:
            out = parser(payload)
        except struct.error:
            # a malformed payload that passed the magic check must fall
            # through to the deterministic fallback, not kill the task
            out = None
        if out is not None:
            return out
    return None


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic pseudo-decode fallback for unrecognized payloads:
    features derived from payload length. Kept so the operator is total
    over arbitrary binary columns (and as the pre-round-3 stub shape)."""
    n = len(payload)
    if media_type == "image":
        return 64 + n % 512, 64 + (n * 7) % 512, 1
    if media_type == "audio":
        return 0, 0, n % 1000
    return 320, 240, n % 100


def documents_as_media(df: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: text bytes become the
    opaque payload (UTF-8), metadata stays typed. Stand-in for real
    image/audio ingestion, exercising the exact schema shape.

    NULL-text rows (failed scrapes) are skipped at this boundary — no
    payload, no media row (pinned by the NULL-wave hostile sweep; a
    no-op on NULL-free fixtures)."""
    return df.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("meta_source"),
        F.col("lang").alias("meta_lang"),
    )


def documents_as_real_media(df: DataFrame) -> DataFrame:
    """Like :func:`documents_as_media`, but the payload is a structurally
    valid container — PNG for images (text bytes as body), WAV for audio,
    MJPEG for video — with dimensions/frame counts derived from the UTF-8
    text length n: image (64 + n%512) x (64 + 7n%512), audio n%1000
    samples, video greatest(n%100, 1) frames at 320x240. Runs as an
    Arrow-batched pandas UDF (container assembly is per-row Python by
    nature; at scale this is the ingestion boundary, not a query path).
    NULL-text rows are skipped at the boundary, same as
    :func:`documents_as_media`."""

    @F.pandas_udf(T.BinaryType())
    def build_payload(text: pd.Series, media_type: pd.Series) -> pd.Series:
        out = []
        for t, mt in zip(text, media_type):
            body = t.encode("utf-8")
            n = len(body)
            if mt == "image":
                out.append(png_bytes(64 + n % 512, 64 + (n * 7) % 512, body))
            elif mt == "audio":
                out.append(wav_bytes(n % 1000))
            else:
                out.append(mjpeg_bytes(320, 240, max(n % 100, 1)))
        return pd.Series(out)

    typed = df.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        "text",
        F.col("source").alias("meta_source"),
        F.col("lang").alias("meta_lang"),
    )
    return typed.select(
        "media_id",
        "media_type",
        build_payload("text", "media_type").alias("payload"),
        "meta_source",
        "meta_lang",
    )


def extract_media_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Batches arrive as pandas DataFrames with the payload as bytes objects;
    one output row per input row. The default path parses real container
    headers (:func:`parse_media_header`); unrecognized payloads — or all
    payloads when ``fake=True`` — get deterministic pseudo-features with
    ``format='raw'``.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, t in zip(pdf["payload"], pdf["media_type"]):
                parsed = None if fake else parse_media_header(bytes(p))
                if parsed is None:
                    w, h, nf = _fake_decode(p, t)
                    parsed = ("raw", w, h, nf)
                rows.append(parsed)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "format": [r[0] for r in rows],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                    "n_frames": [r[3] for r in rows],
                }
            )

    # Project to the three columns the function reads BEFORE the Python
    # boundary (round-14, guide §4.1): mapInPandas is opaque to column
    # pruning, so without this select every caller-side column (the
    # media table carries meta_source/meta_lang) is serialized into the
    # Python workers and dropped there.
    return df.select("media_id", "media_type", "payload").mapInPandas(
        batches, FEATURE_SCHEMA
    )
