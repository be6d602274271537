"""Multimodal column plumbing (driver extension tier): image/audio/video
as opaque ``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas`` stages.

The DEFAULT feature kernel (``header_decoder``) is real and
dependency-free: it derives a deterministic 8-dim feature from the
byte-level container probes below (PNG/GIF/JPEG dims, RIFF/WAVE audio
meta, ISO-BMFF video meta) plus md5 content components. Sample-level
decode (pixels/PCM/frames) requires codec libraries this container does
not ship and stays a documented pluggable stub (``pixel_decoder`` — swap
in a real kernel via ``set_decoder``). Everything Spark-side is real and
tested: schemas, batch iteration, column pass-through, and
partition-parallel execution.

Scale posture: media blobs ride in the same rows as their metadata, so a
decode/feature stage is a pure ``mapInPandas`` map — no shuffle, scales
with input partitions; keep ``spark.sql.files.maxPartitionBytes`` sized so
a batch of blobs fits executor memory, and push blob-free predicates
(``media_type``, size bounds) *before* the decode stage so pruning happens
at the parquet scan.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media-asset schema: blob + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

Decoder = Callable[[bytes, str], list[float]]


def pixel_decoder(content: bytes, media_type: str) -> list[float]:
    """Placeholder for a sample-level decode kernel (pixel/PCM/frame
    features). Requires image/audio codec libraries this container does
    not ship — install one and register a real kernel via
    :func:`set_decoder`. NOT the default path; the default
    :func:`header_decoder` below needs no external libraries."""
    raise NotImplementedError(
        "sample-level media decode requires codec libraries not present "
        "in this environment; register a decoder via set_decoder()"
    )


def fake_decoder(content: bytes, media_type: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in: md5-derived pseudo-features, so the whole
    pipeline (batching, schema, partitioning) is testable end-to-end."""
    if content is None:
        return None
    digest = hashlib.md5(content).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def header_decoder(content: bytes, media_type: str) -> list[float]:
    """Default decoder — dependency-free and fully deterministic: an
    8-dim feature built from the REAL container-header probes below
    (format id, probed dimensions / sample rate / duration, byte length)
    plus two md5-derived content components. Not a perceptual embedding
    — it is the honest feature a codec-less environment can compute, and
    it exercises the identical mapInPandas plumbing a real kernel plugs
    into via :func:`set_decoder`."""
    if content is None:
        return None
    fmt_img, width, height = parse_image_dims(content)
    fmt_wav = channels = rate = bits = wav_ms = None
    fmt_mp4 = mp4_ms = None
    if fmt_img is None:
        fmt_wav, channels, rate, bits, wav_ms = parse_wav_meta(content)
        if fmt_wav is None:
            fmt_mp4, _, mp4_ms, _ = parse_mp4_meta(content)
    fmt_code = {"png": 1, "gif": 2, "jpeg": 3}.get(fmt_img) or (
        4 if fmt_wav else 5 if fmt_mp4 else 0
    )
    duration_ms = wav_ms if wav_ms is not None else mp4_ms
    digest = hashlib.md5(content).digest()
    return [
        float(fmt_code),
        float(width or 0),
        float(height or 0),
        float(rate or 0) / 1000.0,
        float(duration_ms or 0) / 1000.0,
        float(len(content)) / 1024.0,
        digest[0] / 255.0,
        digest[1] / 255.0,
    ]


_DECODER: Decoder = header_decoder


def set_decoder(decoder: Decoder) -> None:
    global _DECODER
    _DECODER = decoder


def extract_media_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature stage over binary content.

    ``mapInPandas`` keeps each partition's rows streaming through pandas
    batches — the blob never round-trips through a per-row Python UDF.
    """
    decoder = _DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "content_sha": [
                        hashlib.sha256(c).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "n_bytes": [
                        len(c) if c is not None else None for c in pdf["content"]
                    ],
                    "feature": [
                        decoder(c, t) if c is not None else None
                        for c, t in zip(pdf["content"], pdf["media_type"])
                    ],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled timestamp, derived
    from metadata only (native ``sequence`` + ``explode``) — the actual
    frame decode is the stubbed kernel above. Demonstrates how a 100 TB
    video table fans out to frame granularity without touching blobs."""
    return (
        assets.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("asset_id", "frame_ts_ms", "width", "height")
    )


# ---------------------------------------------------------------------------
# real (dependency-free) header probing: container formats carry their
# dimensions in the first bytes, so width/height extraction needs no
# imaging library — this stage is NOT stubbed
# ---------------------------------------------------------------------------

DIMS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),  # png|jpeg|gif|None
        T.StructField("probe_width", T.IntegerType(), True),
        T.StructField("probe_height", T.IntegerType(), True),
    ]
)

_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}  # DHT / JPG / DAC share the SOF range


def parse_image_dims(b: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from container headers; (None,)*3 if the
    bytes are not a recognized image."""
    if not b:
        return None, None, None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"\xff\xd8":  # JPEG: walk the marker stream to a SOF
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # bare markers carry no length
                continue
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return "jpeg", None, None
    return None, None, None


def probe_image_dimensions(assets: DataFrame) -> DataFrame:
    """Arrow-batched header probe: real width/height extraction from PNG /
    GIF / JPEG bytes, no imaging library. The validation tier of a media
    ingest pipeline — compare probed dims against declared metadata
    before paying for a full decode; same mapInPandas shape (and scale
    posture) as the stubbed feature kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_dims(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": [p[0] for p in parsed],
                    "probe_width": pd.array(
                        [p[1] for p in parsed], dtype="Int32"
                    ),
                    "probe_height": pd.array(
                        [p[2] for p in parsed], dtype="Int32"
                    ),
                }
            )

    return assets.mapInPandas(run, DIMS_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("audio_format", T.StringType(), True),  # wav|None
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("probe_duration_ms", T.IntegerType(), True),
    ]
)


def parse_wav_meta(
    b: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None]:
    """(format, channels, sample_rate, bits_per_sample, duration_ms) from a
    RIFF/WAVE header — real chunk-walking byte parsing, no audio library.
    Returns (None,)*5 for non-WAV bytes; a WAV whose fmt/data chunks are
    truncated yields 'wav' with None fields."""
    if not b or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None, None, None, None, None
    channels = rate = bits = byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        # require the chunk to DECLARE the 16 PCM-format bytes, not just
        # the buffer to be long enough: a malformed fmt chunk with
        # size < 16 must yield None fields, not bytes read from whatever
        # chunk follows it
        if cid == b"fmt " and size >= 16 and i + 24 <= len(b):
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = size
        # chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size + (size % 2)
    duration_ms = (
        int(data_size * 1000 // byte_rate)
        if data_size is not None and byte_rate
        else None
    )
    return "wav", channels, rate, bits, duration_ms


def probe_audio_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio header probe: channels / sample rate / bit depth
    / duration parsed from raw RIFF/WAVE bytes — like the image probe,
    this validation tier is REAL (dependency-free), only sample-level
    decode is stubbed. Same mapInPandas shape and scale posture."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_wav_meta(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "audio_format": [p[0] for p in parsed],
                    "channels": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "bits_per_sample": pd.array(
                        [p[3] for p in parsed], dtype="Int32"
                    ),
                    "probe_duration_ms": pd.array(
                        [p[4] for p in parsed], dtype="Int32"
                    ),
                }
            )

    return assets.mapInPandas(run, AUDIO_SCHEMA)


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("video_format", T.StringType(), True),  # mp4|None
        T.StructField("major_brand", T.StringType(), True),
        T.StructField("probe_duration_ms", T.IntegerType(), True),
        T.StructField("n_boxes", T.IntegerType(), True),
    ]
)


def parse_mp4_meta(
    b: bytes | None,
) -> tuple[str | None, str | None, int | None, int | None]:
    """(format, major_brand, duration_ms, n_top_level_boxes) from an
    ISO-BMFF (MP4/MOV) container — a real top-level box walk plus the
    mvhd timescale/duration read, no video library. Non-MP4 bytes (no
    leading ftyp box) return (None,)*4; a well-formed container with a
    truncated/absent moov yields 'mp4' with duration None."""
    if not b or len(b) < 12 or b[4:8] != b"ftyp":
        return None, None, None, None
    major = b[8:12].decode("ascii", "replace")
    duration_ms = None
    n_boxes = 0
    i = 0
    while i + 8 <= len(b):
        size = int.from_bytes(b[i : i + 4], "big")
        box = b[i + 4 : i + 8]
        if size == 1:  # 64-bit largesize
            if i + 16 > len(b):
                break
            size = int.from_bytes(b[i + 8 : i + 16], "big")
        if size < 8:
            break
        n_boxes += 1
        if box == b"moov":
            # mvhd is moov's first child in practice; scan moov's payload
            j = i + 8
            end = min(i + size, len(b))
            while j + 8 <= end:
                csize = int.from_bytes(b[j : j + 4], "big")
                if b[j + 4 : j + 8] == b"mvhd" and j + 28 <= end:
                    version = b[j + 8]
                    if version == 0 and j + 24 <= end:
                        timescale = int.from_bytes(b[j + 20 : j + 24], "big")
                        duration = int.from_bytes(b[j + 24 : j + 28], "big")
                    elif version == 1 and j + 40 <= end:
                        timescale = int.from_bytes(b[j + 28 : j + 32], "big")
                        duration = int.from_bytes(b[j + 32 : j + 40], "big")
                    else:
                        break
                    if timescale:
                        duration_ms = int(duration * 1000 // timescale)
                    break
                if csize < 8:
                    break
                j += csize
        i += size
    return "mp4", major, duration_ms, n_boxes


MEDIA_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("detected_format", T.StringType(), True),
        T.StructField("probe_width", T.IntegerType(), True),
        T.StructField("probe_height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("major_brand", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def probe_media(
    b: bytes | None,
) -> tuple:
    """Single-pass dispatch over all three modality probes: (format, width,
    height, channels, sample_rate, bits, duration_ms, major_brand). Tries
    image containers first (cheapest magic check), then RIFF/WAVE, then
    ISO-BMFF; all fields None for unrecognized or null bytes."""
    none = (None,) * 8
    if not b:
        return none
    fmt, w, h = parse_image_dims(b)
    if fmt is not None:
        return fmt, w, h, None, None, None, None, None
    fmt, ch, rate, bits, ms = parse_wav_meta(b)
    if fmt is not None:
        return fmt, None, None, ch, rate, bits, ms, None
    fmt, brand, ms, _ = parse_mp4_meta(b)
    if fmt is not None:
        return fmt, None, None, None, None, None, ms, brand
    return none


def probe_media_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched combined probe: ONE mapInPandas pass classifies each
    blob (PNG/GIF/JPEG/WAV/MP4) and extracts its container metadata —
    the single-scan ingest-validation stage, vs. three modality-specific
    passes + joins. Pure map, no shuffle; scales with input partitions
    like the per-modality probes above."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [probe_media(c) for c in pdf["content"]]

            def icol(idx: int):
                return pd.array([p[idx] for p in parsed], dtype="Int32")

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "detected_format": [p[0] for p in parsed],
                    "probe_width": icol(1),
                    "probe_height": icol(2),
                    "channels": icol(3),
                    "sample_rate": icol(4),
                    "bits_per_sample": icol(5),
                    "duration_ms": icol(6),
                    "major_brand": [p[7] for p in parsed],
                    "n_bytes": pd.array(
                        [len(c) if c is not None else None
                         for c in pdf["content"]],
                        dtype="Int32",
                    ),
                }
            )

    return assets.mapInPandas(run, MEDIA_PROBE_SCHEMA)


def probe_video_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched video container probe (brand, duration, box count)
    parsed from raw ISO-BMFF bytes — completes the real-probe tier for
    all three modalities (images, audio, video); only sample/frame decode
    is stubbed. Same mapInPandas shape and scale posture as the others."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_mp4_meta(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "video_format": [p[0] for p in parsed],
                    "major_brand": [p[1] for p in parsed],
                    "probe_duration_ms": pd.array(
                        [p[2] for p in parsed], dtype="Int32"
                    ),
                    "n_boxes": pd.array([p[3] for p in parsed], dtype="Int32"),
                }
            )

    return assets.mapInPandas(run, VIDEO_SCHEMA)


# The mapInPandas closures above reference this module's probe functions.
# Cloudpickle serializes importable-module functions BY REFERENCE, so a
# Python worker whose sys.path lacks the repo root (e.g. a driver harness
# running from another cwd — sys.path edits don't propagate to workers)
# would fail the import. Registering the module for by-value serialization
# ships the functions inside the closure instead — no worker-side install
# or PYTHONPATH needed, which is also the right posture on a real cluster
# where executors may not have the package deployed.
try:  # pragma: no cover - depends on the vendored cloudpickle version
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; cwd-run sessions still work
    pass
