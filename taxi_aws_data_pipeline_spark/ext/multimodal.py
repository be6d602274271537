"""Multimodal column plumbing (driver extension tier): image/audio/video
as opaque ``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas`` stages.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — see ``set_decoder``); everything Spark-side is
real and tested: schemas, batch iteration, column pass-through,
partition-parallel execution, and the deterministic fake decoder used by
tests/test_ext_multimodal.py.

Scale posture: media blobs ride in the same rows as their metadata, so a
decode/feature stage is a pure ``mapInPandas`` map — no shuffle, scales
with input partitions; keep ``spark.sql.files.maxPartitionBytes`` sized so
a batch of blobs fits executor memory, and push blob-free predicates
(``media_type``, size bounds) *before* the decode stage so pruning happens
at the parquet scan.
"""

from __future__ import annotations

import hashlib
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


def _real_decoder(content: bytes, media_type: str) -> list[float]:
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; install a decoder and register it via set_decoder()"
    )


def fake_decoder(content: bytes, media_type: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in: md5-derived pseudo-features, so the whole
    pipeline (batching, schema, partitioning) is testable end-to-end."""
    if content is None:
        return None
    digest = hashlib.md5(content).digest()
    return [digest[i] / 255.0 for i in range(dim)]


_DECODER: Decoder = _real_decoder


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
