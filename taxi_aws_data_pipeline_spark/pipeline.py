"""Composed batch lifecycle (SURVEY.md §3: discover → load → union/schema
→ clean → transform → metrics → sinks), the Spark re-expression of the
reference's ``process_files_with_existing_logic`` (data_processing.py:
382-433) / Prefect flow (prefect_flows.py:909-1018).

The reference's 18 eager pandas materializations collapse into ~3 Spark
action groups (SURVEY §3.4): the cleaning-stats collects, the fact write,
and the five metric writes — with one ``.cache()`` of the cleaned frame
standing in for the reference's in-memory reuse.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from . import features, metrics, quality, sinks, sources
from .schema import TRIP_SCHEMA, enforce_schema


@dataclass
class PipelineResult:
    processing_id: str
    fact_path: str
    metric_paths: dict[str, str]
    cleaned: DataFrame
    metric_frames: dict[str, DataFrame] = field(default_factory=dict)

    def unpersist(self) -> None:
        """Release the cached cleaned frame once the caller is done with it.
        The frame stays usable afterwards (it just recomputes)."""
        self.cleaned.unpersist()


def transform_trips(
    raw: DataFrame,
    validate_filenames: bool = True,
    intermediates: list[DataFrame] | None = None,
) -> DataFrame:
    """Schema enforcement → (optional) filename consistency → cleaning →
    feature block. Pure plan construction except the cleaning-stats jobs."""
    df = enforce_schema(raw, TRIP_SCHEMA)
    if validate_filenames:
        df = features.filename_consistency_filter(df)
    df = quality.clean_trips(df, intermediates=intermediates)
    return features.add_trip_features(df)


def run_batch(
    spark: SparkSession,
    input_path: str | list[str],
    output_path: str,
    processing_id: str | None = None,
    validate_filenames: bool = True,
) -> PipelineResult:
    """End-to-end batch run over a directory/glob of trip files."""
    raw = sources.read_trip_files(spark, input_path)
    return run_batch_df(
        raw,
        output_path,
        processing_id=processing_id,
        validate_filenames=validate_filenames,
    )


def run_batch_df(
    raw: DataFrame,
    output_path: str,
    processing_id: str | None = None,
    validate_filenames: bool = True,
) -> PipelineResult:
    """run_batch's core over an already-loaded raw frame — the entry
    point for callers that select their own files (the manifest-gated
    incremental scheduler, examples/daily_incremental.py) so the
    write/unpersist choreography lives in exactly one place."""
    processing_id = processing_id or datetime.now(timezone.utc).strftime(
        "%Y%m%d_%H%M%S"
    )
    intermediates: list[DataFrame] = []
    cleaned = transform_trips(
        raw, validate_filenames=validate_filenames, intermediates=intermediates
    )
    cleaned.cache()  # five metric jobs + the fact write consume it

    fact_path = sinks.write_fact_table(cleaned, output_path, processing_id)
    metric_frames = metrics.create_taxi_metrics(cleaned)
    metric_paths = sinks.write_metrics(metric_frames, output_path, processing_id)
    sinks.publish_latest(cleaned, output_path, "taxi")

    # the dedup intermediate's cache only exists to feed the stats jobs and
    # the first materialization of `cleaned` (itself cached above) — release
    # it now so repeated run_batch calls don't accumulate cached partitions;
    # `cleaned` stays cached for the caller, released by result.unpersist()
    for frame in intermediates:
        frame.unpersist()

    return PipelineResult(
        processing_id=processing_id,
        fact_path=fact_path,
        metric_paths=metric_paths,
        cleaned=cleaned,
        metric_frames=metric_frames,
    )
