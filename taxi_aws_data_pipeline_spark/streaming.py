"""Incremental exactly-once ingestion (SURVEY.md §2.9; reference watermark
+ processed-files ledger, data_processing.py:226-380).

The reference hand-rolls three streaming concepts; Spark Structured
Streaming's file source subsumes all of them:

| reference mechanism                          | here |
|---------------------------------------------|------|
| `last_processed_watermark.txt` (dp:226-249)  | checkpoint offsets log |
| `processed_files.json`, capped at 1000 keys  | checkpoint file-source log |
|   (dp:251-280 — arbitrary set-order eviction)|   (compacted, no eviction) |
| cron-triggered batch drain (pf:1024-1051)    | ``Trigger.AvailableNow`` |

``Trigger.AvailableNow`` processes everything landed since the last
checkpoint then stops — exactly the reference's "drain new files on a
schedule" contract, but with crash-safe exactly-once per file (the
kill/restart test in tests/test_streaming.py replays the reference's
dp:309-380 guarantee).

The batch fallback (`incremental_batch`) keeps an explicit manifest table
and anti-joins it — for environments without a checkpoint dir; it also
reproduces the reference's watermark-advance-on-empty edge case
(dp:347-351) by simply having nothing to process.

For per-batch cleaning statistics (SURVEY §7.3.3: C1-C5 stats must be
batch-scoped), the transform runs inside ``foreachBatch`` — each micro
batch recomputes its own medians/modes/percentiles like the reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import TRIP_READ_SCHEMA
from .sources import anti_join_processed, list_files


def incremental_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    glob_filter: str = "yellow_tripdata_*.parquet",
    max_files_per_trigger: int | None = None,
):
    """Drain all unprocessed files through ``batch_fn`` exactly once.

    Returns the started query; call ``awaitTermination()``. Re-running
    after a crash resumes from the checkpoint without reprocessing
    (file-source log ≡ the reference's ledger, but transactional).
    ``max_files_per_trigger`` maps the reference's PROCESSING_BATCH_SIZE
    (pf:65-66).

    Files are scanned with the permissive TRIP_READ_SCHEMA (numerics as
    double) exactly like the reference loads files as-written before
    casting; run ``enforce_schema`` inside ``batch_fn`` (the pipeline's
    transform does) to land on the declared narrow types.
    """
    reader = (
        spark.readStream.schema(TRIP_READ_SCHEMA)
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_hourly_demand(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    queryName: str = "hourly_demand_stream",
    watermark: str = "2 hours",
    glob_filter: str = "yellow_tripdata_*.parquet",
):
    """A2 hourly_demand as a true event-time streaming aggregation
    (SURVEY §2.9 'event-time windows' row: absent in the reference, free
    in Spark): tumbling 1-hour windows on pickup time with a late-data
    watermark bounding the aggregation state.

    ``complete`` output to a memory sink keeps the example self-contained;
    production would use ``update`` to an idempotent-upsert sink. State
    size = live windows × groups, bounded by the watermark horizon — this
    is the piece the reference cannot express (its metrics recompute whole
    batches).
    """
    stream = (
        spark.readStream.schema(TRIP_READ_SCHEMA)
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("tpep_pickup_datetime", watermark)
        .groupBy(F.window("tpep_pickup_datetime", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("trip_count"),
            F.sum("total_amount").alias("total_revenue"),
        )
        .select(F.col("w.start").alias("window_start"), "trip_count", "total_revenue")
    )
    return (
        agg.writeStream.queryName(queryName)
        .format("memory")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_vendor_running_totals(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    glob_filter: str = "yellow_tripdata_*.parquet",
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-vendor running trip count and revenue, carried across micro
    batches in managed state.

    This is the arbitrary-stateful tier Spark offers beyond windowed
    aggregation — the state (one row per vendor) lives in the state
    store, is checkpointed with the source offsets (crash → exact
    resume), and each micro batch updates it with one Arrow-batched
    pandas call per key group. The reference cannot express this at all:
    its metrics recompute whole batches from scratch.

    ``batch_fn`` receives each micro batch's updated (vendor, totals)
    rows — the idempotent-upsert sink (memory sink can't recover from a
    checkpoint, so restartability requires foreachBatch or a
    transactional sink).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["total_amount"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"VendorID": [key[0]], "trip_count": [n], "total_revenue": [total]}
        )

    stream = (
        spark.readStream.schema(TRIP_READ_SCHEMA)
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    running = (
        stream.select("VendorID", "total_amount")
        # null keys don't round-trip through the Arrow state batch; real
        # pipelines impute VendorID first (C1) anyway
        .filter(F.col("VendorID").isNotNull())
        .groupBy("VendorID")
        .applyInPandasWithState(
            update,
            outputStructType="VendorID double, trip_count long, total_revenue double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        running.writeStream.foreachBatch(batch_fn)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# explicit-manifest batch fallback (S3/S4 without a checkpoint dir)
# ---------------------------------------------------------------------------


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Processed-files manifest as a parquet table (path, processed_at).
    Unlike the reference's 1000-key JSON ledger with arbitrary set-order
    eviction (dp:269-271), the manifest is unbounded parquet — eviction,
    if ever needed, is by mtime, not hash order.

    Existence is checked through the Hadoop FileSystem API, not
    ``os.path.exists``: a URI-schemed manifest path (``file://``,
    ``s3a://``, ``hdfs://``) is never a local OS path, and the old check
    silently returned an EMPTY manifest for those — every incremental
    run would reprocess all landed files while claiming idempotency
    (round-7 review finding)."""
    from .ingest import _fs_for

    fs, P, _ = _fs_for(spark, manifest_path)
    if fs.exists(P(manifest_path)):
        return spark.read.parquet(manifest_path)
    return spark.createDataFrame([], "path string, processed_at timestamp")


def append_manifest(spark: SparkSession, manifest_path: str, listing: DataFrame) -> None:
    listing.select(
        "path", F.current_timestamp().alias("processed_at")
    ).write.mode("append").parquet(manifest_path)


def incremental_batch(
    spark: SparkSession,
    input_dir: str,
    manifest_path: str,
    process_fn: Callable[[DataFrame, list[str]], None],
    suffix: str = ".parquet",
) -> list[str]:
    """One manifest-gated batch run: list → anti-join manifest →
    process → append manifest. Returns the processed paths (empty list ≡
    the reference's watermark-advance-on-empty no-op, dp:347-351).

    Relative listing paths stay relative as MANIFEST KEYS (the
    list_files path-form contract) but are absolutized for the actual
    read: ``spark.read`` resolves schemeless relative paths against the
    JVM's launch-time working directory, which does not follow a Python
    ``chdir`` — without the absolutization, a chdir between session
    start and this call would list one directory and read another
    (ADVICE r7; the list_files docstring documents the hazard)."""
    import os
    import re

    listing = list_files(spark, input_dir, suffix=suffix)
    todo = anti_join_processed(listing, read_manifest(spark, manifest_path))
    paths = [r.path for r in todo.select("path").collect()]
    if not paths:
        return []
    # URI detection must accept Hadoop's single-slash rendering
    # (Path.toString() gives file:/tmp/..., not file:///tmp/...)
    has_scheme = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:").match
    read_paths = [
        p if has_scheme(p) or os.path.isabs(p) else os.path.abspath(p)
        for p in paths
    ]
    df = spark.read.schema(TRIP_READ_SCHEMA).parquet(*read_paths)
    process_fn(df, paths)
    append_manifest(spark, manifest_path, todo)
    return paths


def streaming_dedup_within_watermark(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    batch_fn: Callable[[DataFrame, int], None],
    event_time_col: str = "tpep_pickup_datetime",
    watermark: str = "2 hours",
    glob_filter: str = "yellow_tripdata_*.parquet",
):
    """Streaming ingestion dedup: emit each key once, dropping re-arrivals
    within the watermark horizon (``dropDuplicatesWithinWatermark``).

    The streaming twin of the batch dedup tier (D1/x5): the reference
    dedups whole batches in memory (data_processing.py:117-121), which
    cannot span batch boundaries; here duplicate rows that arrive in
    LATER files (retransmits, overlapping uploads) are dropped too, as
    long as they arrive within the watermark of the original. State is
    bounded: keys older than the watermark are evicted, so at 100 TB/day
    the dedup map holds only the horizon's keys — the standard trade of
    exactness-within-horizon for bounded state (exact global dedup stays
    a batch job over the landed table).

    Deduped rows flow to ``batch_fn`` (foreachBatch — unlike a memory
    sink, it supports checkpoint recovery, so re-running after a crash
    resumes the dedup state instead of failing).
    """
    stream = (
        spark.readStream.schema(TRIP_READ_SCHEMA)
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    deduped = stream.withWatermark(
        event_time_col, watermark
    ).dropDuplicatesWithinWatermark(key_cols)
    return (
        deduped.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


DOCUMENT_READ_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def streaming_document_curation(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    min_quality: float = 0.0,
    lang: str | None = None,
    watermark: str = "10 minutes",
    glob_filter: str = "*.parquet",
):
    """Streaming training-data curation: the x-tier quality gates composed
    onto the incremental file source, so documents are curated AS THEY
    LAND instead of in a nightly batch sweep.

    Per micro-batch: language-ID (x1) and quality scoring (x2) run as
    projections fused into the scan; the gate filters BEFORE the stateful
    stage so only surviving fingerprints enter the dedup map; exact dedup
    uses ``dropDuplicatesWithinWatermark`` on the content fingerprint
    (x4) — state bounded to the watermark horizon, the same
    exactness-within-horizon trade as streaming_dedup_within_watermark
    (global dedup stays a batch job, x5/x33, over the landed table).

    Curated rows flow to ``batch_fn`` via foreachBatch (checkpoint-
    recoverable); ``Trigger.AvailableNow`` drains everything landed since
    the last checkpoint, so a cron-style "curate the new files" run is
    one call.
    """
    from .ext import text as TX

    stream = (
        spark.readStream.schema(DOCUMENT_READ_SCHEMA)
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
        .filter(F.col("text").isNotNull())
    )
    d = TX.add_fingerprint(TX.add_quality_signals(TX.add_language_id(stream)))
    if lang is not None:
        d = d.filter(F.col("lang_pred") == lang)
    d = d.filter(F.col("quality_score") >= min_quality)
    d = (
        d.withColumn("ingest_time", F.current_timestamp())
        .withWatermark("ingest_time", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .drop("ingest_time")
    )
    return (
        d.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


EVENTS_READ_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def streaming_enrichment_join(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    dim: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    glob_filter: str = "*.parquet",
):
    """STREAM-STATIC enrichment join: events stream in, a (small) static
    dimension broadcasts onto every micro-batch — the at-ingest enrich
    step (user segment, device class, geo) every event pipeline runs.
    The static side is planned per micro-batch, so a dimension REFRESH
    is just re-creating the DataFrame between runs; no state is kept
    because stream-static inner joins need none (each batch row either
    matches the current dim or doesn't).

    Scale: the stream side never shuffles — the dim broadcasts; at
    dimension sizes above the broadcast threshold Spark falls back to a
    per-batch shuffled join, at which point pre-bucketing the landed
    table (sinks.write_bucketed_table) is the better shape.
    """
    stream = (
        spark.readStream.schema(EVENTS_READ_SCHEMA)
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    enriched = stream.join(F.broadcast(dim), "user_id")
    return (
        enriched.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_attribution_join(
    spark: SparkSession,
    views_dir: str,
    purchases_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
):
    """STREAM-STREAM time-interval join (the last Structured Streaming
    join shape): purchases attribute to a prior view by the same user
    within ``horizon`` — purchase.ts in [view.ts, view.ts + horizon].
    BOTH sides carry watermarks and the join condition bounds event
    time in both directions, which is exactly what lets Spark evict
    buffered state: a view older than watermark + horizon can never
    match a future purchase and is dropped, so state is
    horizon-bounded instead of unbounded (the naive stream-stream join
    trap). Inner join: late unmatched rows simply never emit.

    Scale: both streams shuffle once on user_id (the equi-key); the
    time predicate prunes within matched key groups.
    """
    views = (
        spark.readStream.schema(EVENTS_READ_SCHEMA)
        .parquet(views_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        spark.readStream.schema(EVENTS_READ_SCHEMA)
        .parquet(purchases_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = views.join(
        purchases,
        (views["user_id"] == purchases["user_id"])
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    ).select(
        views["user_id"].alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "value",
    )
    return (
        joined.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_sliding_demand(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    queryName: str = "sliding_demand_stream",
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str = "15 minutes",
    glob_filter: str = "yellow_tripdata_*.parquet",
):
    """SLIDING event-time windows: each trip contributes to every
    overlapping window (window/slide of them — 4 at the defaults), so
    downstream readers get a smooth demand curve instead of the
    tumbling staircase of ``streaming_hourly_demand``.

    Spark expands each row into its window memberships BEFORE the
    shuffle (a windows-per-row projection, not a self-join), and the
    watermark bounds state exactly as in the tumbling case — the live
    window count grows by the window/slide factor, which is the real
    cost of smoothness at scale. Mass conservation is the invariant a
    correctness check reads: sum(trip_count) over all windows equals
    (window/slide) x total trips.
    """
    stream = (
        spark.readStream.schema(TRIP_READ_SCHEMA)
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("tpep_pickup_datetime", watermark)
        .groupBy(
            F.window("tpep_pickup_datetime", window, slide).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("trip_count"),
            F.sum("total_amount").alias("total_revenue"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "trip_count",
            "total_revenue",
        )
    )
    return (
        agg.writeStream.queryName(queryName)
        .format("memory")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
