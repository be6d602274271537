"""Incremental-semantics tests (SURVEY.md §5.3): files landed in waves are
processed exactly once across restarts, for both the Structured Streaming
checkpoint path and the explicit-manifest batch fallback."""

from __future__ import annotations

import os

import numpy as np
import pytest

from taxi_aws_data_pipeline_spark import streaming

from .taxi_fixture import make_trips


def _land(dirpath, year, month, n=300, seed=1):
    rng = np.random.default_rng(seed)
    df = make_trips(n, year, month, rng)
    p = f"{dirpath}/yellow_tripdata_{year}-{month:02d}.parquet"
    df.to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    return p


def test_streaming_exactly_once_across_restarts(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out: list[tuple[int, int]] = []

    def batch_fn(df, epoch_id):
        out.append((epoch_id, df.count()))

    # wave 1: two files
    _land(src, 2024, 1, seed=1)
    _land(src, 2024, 2, seed=2)
    q = streaming.incremental_stream(spark, str(src), ckpt, batch_fn)
    q.awaitTermination()
    rows_wave1 = sum(n for _, n in out)
    assert rows_wave1 > 0

    # restart with nothing new → zero new rows
    out.clear()
    q = streaming.incremental_stream(spark, str(src), ckpt, batch_fn)
    q.awaitTermination()
    assert sum(n for _, n in out) == 0

    # wave 2: one new file → only its rows
    out.clear()
    p3 = _land(src, 2024, 3, seed=3)
    q = streaming.incremental_stream(spark, str(src), ckpt, batch_fn)
    q.awaitTermination()
    expected = spark.read.parquet(p3).count()
    assert sum(n for _, n in out) == expected


def test_streaming_batch_size_bound(spark, tmp_path):
    """maxFilesPerTrigger=1 ≡ the reference's PROCESSING_BATCH_SIZE: each
    micro-batch sees one file."""
    src = tmp_path / "raw"
    src.mkdir()
    for m in (1, 2, 3):
        _land(src, 2024, m, n=100, seed=m)
    counts = []
    q = streaming.incremental_stream(
        spark, str(src), str(tmp_path / "ckpt"), lambda df, _: counts.append(df.count()),
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert len(counts) == 3


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    """The streaming tumbling-window aggregation equals the equivalent
    batch groupBy over the same files."""
    import pyspark.sql.functions as F

    src = tmp_path / "raw"
    src.mkdir()
    _land(src, 2024, 1, n=500, seed=11)
    _land(src, 2024, 2, n=500, seed=12)
    q = streaming.streaming_hourly_demand(
        spark, str(src), str(tmp_path / "ckpt"), queryName="hd_test"
    )
    q.awaitTermination()
    got = {
        r.window_start: (r.trip_count, r.total_revenue)
        for r in spark.sql("SELECT * FROM hd_test").collect()
    }
    batch = (
        spark.read.parquet(str(src))
        .groupBy(F.window("tpep_pickup_datetime", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("trip_count"),
            F.sum("total_amount").alias("total_revenue"),
        )
        .select(F.col("w.start").alias("window_start"), "trip_count", "total_revenue")
    )
    want = {
        r.window_start: (r.trip_count, r.total_revenue)
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for k, (n, rev) in want.items():
        assert got[k][0] == n
        # double sums may accumulate in different orders across the two runs
        assert got[k][1] == pytest.approx(rev, rel=1e-9)


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-vendor totals across micro
    batches AND across query restarts (state checkpointed with offsets)."""
    import pyspark.sql.functions as F

    src = tmp_path / "raw"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    latest: dict[float, tuple[int, float]] = {}

    def upsert(df, _epoch):
        for r in df.collect():
            latest[r.VendorID] = (r.trip_count, round(r.total_revenue, 4))

    _land(src, 2024, 1, n=300, seed=21)
    q = streaming.streaming_vendor_running_totals(spark, str(src), ckpt, upsert)
    q.awaitTermination()

    # restart with one more file: totals must ACCUMULATE (state restored)
    _land(src, 2024, 2, n=300, seed=22)
    q = streaming.streaming_vendor_running_totals(spark, str(src), ckpt, upsert)
    q.awaitTermination()
    got = latest
    batch = (
        spark.read.parquet(str(src))
        .filter(F.col("VendorID").isNotNull())
        .groupBy("VendorID")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("total_amount"), F.lit(0.0))).alias("rev"),
        )
        .collect()
    )
    want = {r.VendorID: (r.n, round(r.rev, 4)) for r in batch}
    assert set(got) == set(want)
    for k, (n, rev) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(rev, rel=1e-9)


def test_manifest_batch_fallback_idempotent(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    manifest = str(tmp_path / "manifest")
    seen: list[str] = []

    def process(df, paths):
        seen.extend(paths)

    _land(src, 2024, 1, seed=1)
    _land(src, 2024, 2, seed=2)
    first = streaming.incremental_batch(spark, str(src), manifest, process)
    assert len(first) == 2
    # rerun: nothing new (watermark-advance-on-empty no-op)
    assert streaming.incremental_batch(spark, str(src), manifest, process) == []
    # land one more → only it is processed
    _land(src, 2024, 3, seed=3)
    third = streaming.incremental_batch(spark, str(src), manifest, process)
    assert len(third) == 1 and "2024-03" in third[0]
    assert len(seen) == 3


def test_manifest_batch_fallback_with_uri_paths(spark, tmp_path):
    """URI-schemed input dir AND manifest path must keep the idempotency
    gate working: round-7 review found read_manifest used
    ``os.path.exists`` on the manifest path, which is always False for
    ``file://`` / ``s3a://`` URIs — every run silently reprocessed all
    landed files. The existence check now dispatches through the Hadoop
    FileSystem API, the same code path ingest.py uses."""
    src = tmp_path / "raw"
    src.mkdir()
    input_uri = f"file://{src}"
    manifest_uri = f"file://{tmp_path}/manifest"
    seen: list[str] = []

    def process(df, paths):
        seen.extend(paths)

    _land(src, 2024, 1, seed=1)
    first = streaming.incremental_batch(spark, input_uri, manifest_uri, process)
    # Hadoop Path.toString() canonicalizes file://host-less to file:/
    assert len(first) == 1 and first[0].startswith("file:/")
    # re-run: the URI manifest must be READ BACK, not treated as absent
    assert streaming.incremental_batch(
        spark, input_uri, manifest_uri, process
    ) == []
    _land(src, 2024, 2, seed=2)
    third = streaming.incremental_batch(spark, input_uri, manifest_uri, process)
    assert len(third) == 1 and "2024-02" in third[0]
    assert len(seen) == 2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Re-sent rows (same key, same event time) landing in a later file are
    emitted once; the memory sink matches a batch dropDuplicates over the
    union of both files."""
    src = tmp_path / "raw"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.default_rng(7)
    df = make_trips(200, 2024, 1, rng)
    df.to_parquet(
        src / "yellow_tripdata_2024-01.parquet",
        index=False, coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    # retransmit: the first 60 rows arrive again in a second file
    df.head(60).to_parquet(
        src / "yellow_tripdata_2024-01b.parquet",
        index=False, coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    keys = [
        "tpep_pickup_datetime", "VendorID", "PULocationID",
        "DOLocationID", "fare_amount", "total_amount",
    ]
    counts: list[int] = []

    def batch_fn(df, epoch_id):
        counts.append(df.count())

    q = streaming.streaming_dedup_within_watermark(
        spark, str(src), ckpt, keys, batch_fn
    )
    q.awaitTermination()
    expected = spark.read.parquet(str(src)).dropDuplicates(keys).count()
    assert sum(counts) == expected

    # restart with nothing new → checkpoint recovery works, no new rows
    counts.clear()
    q = streaming.streaming_dedup_within_watermark(
        spark, str(src), ckpt, keys, batch_fn
    )
    q.awaitTermination()
    assert sum(counts) == 0


def test_streaming_document_curation_gates_and_dedups(spark, tmp_path):
    """Documents landing across two files are language-gated, quality-
    gated BEFORE the stateful stage, and fingerprint-deduped across
    files; a checkpointed restart with no new files emits nothing."""
    import pandas as pd

    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    good = (
        "the data pipeline reads the files and the tables are written "
        "to the lake while the jobs run and the metrics land in the store "
        "so the team can see the results of the work every day in the "
        "dashboard that the pipeline keeps fresh for all of the users"
    )
    spanish = "el la de que y los una por " * 8
    f1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [good, "tiny", spanish.strip()],
            "lang": ["en", "en", "es"],
            "source": ["a", "a", "b"],
            "n_chars": [len(good), 4, len(spanish)],
        }
    )
    # file 2: a re-spaced duplicate of doc 1 (same fingerprint) + a fresh doc
    good2 = good.replace(" the ", "  the ")
    fresh = good.replace("pipeline", "crawler")
    f2 = pd.DataFrame(
        {
            "doc_id": [4, 5],
            "text": [good2, fresh],
            "lang": ["en", "en"],
            "source": ["b", "b"],
            "n_chars": [len(good2), len(fresh)],
        }
    )
    f1.to_parquet(src / "batch1.parquet", index=False)
    f2.to_parquet(src / "batch2.parquet", index=False)

    seen: list = []

    def batch_fn(df, epoch_id):
        seen.extend(df.select("doc_id").toPandas().doc_id.tolist())

    q = streaming.streaming_document_curation(
        spark, str(src), ckpt, batch_fn, min_quality=0.5, lang="en"
    )
    q.awaitTermination()
    # doc 2 fails quality, doc 3 fails language; docs 1 and 4 share a
    # fingerprint so exactly ONE of them survives (both files can drain
    # in a single AvailableNow micro-batch, so which copy wins is not
    # specified); doc 5 is fresh
    assert len(seen) == 2 and 5 in seen
    assert len(set(seen) & {1, 4}) == 1
    assert not set(seen) & {2, 3}

    seen.clear()
    q = streaming.streaming_document_curation(
        spark, str(src), ckpt, batch_fn, min_quality=0.5, lang="en"
    )
    q.awaitTermination()
    assert seen == []


def test_training_prep_ops_run_in_streaming(spark, tmp_path):
    """The training-prep tier (normalize → chunk) is stateless, so the
    SAME functions must run unchanged inside a Structured Streaming
    micro-batch and produce exactly the batch results."""
    import pandas as pd
    from pyspark.sql import functions as F

    from taxi_aws_data_pipeline_spark.ext import packing as PK
    from taxi_aws_data_pipeline_spark.ext import text as TX

    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "Alpha, Beta!  gamma DELTA epsilon zeta eta theta",
                "one two three",
            ],
        }
    ).to_parquet(src / "b1.parquet", index=False)

    def prep(df):
        normed = TX.add_normalized_text(df).select(
            "doc_id", F.col("text_norm").alias("text")
        )
        return PK.chunk_documents(normed, k=3)

    batch_df = spark.read.parquet(str(src))
    expected = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_words)
        for r in prep(batch_df).collect()
    }
    assert expected  # sanity: chunks exist

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q = (
        prep(stream)
        .writeStream.format("memory")
        .queryName("prep_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_words)
        for r in spark.sql("SELECT * FROM prep_stream").collect()
    }
    assert got == expected


def _land_events(spark, dirpath, rows):
    spark.createDataFrame(
        rows, streaming.EVENTS_READ_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(dirpath))


def test_streaming_enrichment_join_broadcasts_dim(spark, tmp_path):
    """Stream-static join: every streamed event picks up its user's
    segment from the static dimension; users absent from the dim drop
    (inner join) — results equal the batch join over the same files."""
    import datetime as dt

    src = tmp_path / "ev"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 10, "view", 1.0, None),
        (2, t0, 11, "click", 2.0, None),
        (3, t0, 99, "view", 3.0, None),  # user 99 not in dim
    ]
    _land_events(spark, src, rows)
    dim = spark.createDataFrame(
        [(10, "gold"), (11, "basic")], "user_id long, segment string"
    )
    got = []
    q = streaming.streaming_enrichment_join(
        spark,
        str(src),
        str(tmp_path / "ck"),
        dim,
        lambda df, _id: got.extend(
            (r.event_id, r.segment) for r in df.collect()
        ),
    )
    q.awaitTermination(120)
    assert sorted(got) == [(1, "gold"), (2, "basic")]


def test_streaming_attribution_join_matches_batch_and_bounds(spark, tmp_path):
    """Stream-stream interval join: purchases attribute only to views of
    the same user within the horizon (inclusive bounds); outside-horizon
    and cross-user purchases never emit. Equal to the batch formulation
    over the same files."""
    import datetime as dt

    views_dir = tmp_path / "views"
    buys_dir = tmp_path / "buys"
    views_dir.mkdir()
    buys_dir.mkdir()
    t = lambda m: dt.datetime(2024, 1, 1, 12, m, 0)  # noqa: E731
    _land_events(
        spark,
        views_dir,
        [
            (1, t(0), 10, "view", 0.0, None),
            (2, t(5), 11, "view", 0.0, None),
            (3, t(0), 12, "view", 0.0, None),
        ],
    )
    _land_events(
        spark,
        buys_dir,
        [
            (101, t(10), 10, "purchase", 9.99, None),  # in horizon
            (102, t(40), 11, "purchase", 5.00, None),  # outside (35 min)
            (103, t(30), 10, "purchase", 1.00, None),  # exactly at bound
            (104, t(10), 77, "purchase", 2.00, None),  # user with no view
        ],
    )
    got = []
    sink = lambda df, _id: got.extend(  # noqa: E731
        (r.view_id, r.purchase_id) for r in df.collect()
    )
    q = streaming.streaming_attribution_join(
        spark,
        str(views_dir),
        str(buys_dir),
        str(tmp_path / "ck2"),
        sink,
    )
    q.awaitTermination(120)
    assert sorted(got) == [(1, 101), (1, 103)]
    # second wave + restart: a NEW purchase file lands, the query
    # restarts from the checkpoint — buffered view state must survive
    # (105 joins to view 2 landed in wave 1) and already-emitted matches
    # must NOT replay (exactly-once over the join output)
    _land_events(
        spark, buys_dir, [(105, t(20), 11, "purchase", 7.0, None)]
    )
    got2 = []
    q2 = streaming.streaming_attribution_join(
        spark,
        str(views_dir),
        str(buys_dir),
        str(tmp_path / "ck2"),
        lambda df, _id: got2.extend(
            (r.view_id, r.purchase_id) for r in df.collect()
        ),
    )
    q2.awaitTermination(120)
    assert sorted(got2) == [(2, 105)]


def test_streaming_sliding_windows_match_batch_and_conserve_mass(spark, tmp_path):
    """Sliding 1h/15min windows from the stream equal the batch sliding
    aggregation, and total window mass is exactly 4x the trip count
    (every trip belongs to window/slide = 4 overlapping windows)."""
    import pyspark.sql.functions as F

    src = tmp_path / "raw"
    src.mkdir()
    _land(src, 2024, 1, n=400, seed=21)
    _land(src, 2024, 2, n=400, seed=22)
    q = streaming.streaming_sliding_demand(
        spark, str(src), str(tmp_path / "ckpt"), queryName="sd_test"
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.window_end): (r.trip_count, r.total_revenue)
        for r in spark.sql("SELECT * FROM sd_test").collect()
    }
    raw = spark.read.parquet(str(src))
    batch = (
        raw.groupBy(
            F.window("tpep_pickup_datetime", "1 hour", "15 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("trip_count"),
            F.sum("total_amount").alias("total_revenue"),
        )
        .select(
            F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
            "trip_count", "total_revenue",
        )
    )
    want = {(r.ws, r.we): (r.trip_count, r.total_revenue) for r in batch.collect()}
    assert set(got) == set(want)
    for k, (n, rev) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(rev, rel=1e-9)
    n_trips = raw.count()
    assert sum(n for n, _ in got.values()) == 4 * n_trips


def test_manifest_batch_relative_input_survives_chdir(spark, tmp_path, monkeypatch):
    """ADVICE r7: a RELATIVE input dir listed after a post-launch chdir
    must still be READ correctly — the Python-side listing follows the
    process cwd, but spark.read resolves relative paths against the
    JVM's launch-time cwd, so incremental_batch absolutizes the read
    paths while keeping the relative strings as manifest keys."""
    src = tmp_path / "raw"
    src.mkdir()
    _land(src, 2024, 1, seed=1)
    manifest = str(tmp_path / "manifest")
    monkeypatch.chdir(tmp_path)  # after session start

    rows_seen: list[int] = []

    def process(df, paths):
        rows_seen.append(df.count())

    first = streaming.incremental_batch(spark, "raw", manifest, process)
    assert len(first) == 1
    # manifest key keeps the relative form the caller listed with
    assert first[0] == os.path.join("raw", os.path.basename(first[0]))
    assert rows_seen and rows_seen[0] > 0
    # idempotent rerun from the same cwd
    assert streaming.incremental_batch(spark, "raw", manifest, process) == []
