"""Unit tests for the file-listing operator family S2-S6 (SURVEY.md §2.1):
discovery, watermark bounding, keep-newest dedup, top-K, anti-join."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from taxi_aws_data_pipeline_spark import sources


def _touch(path: str, mtime: datetime) -> None:
    with open(path, "wb") as f:
        f.write(b"x")
    ts = mtime.timestamp()
    os.utime(path, (ts, ts))


def test_listing_filter_and_schema(spark, tmp_path):
    base = datetime(2024, 1, 1, 12, 0, 0)
    _touch(str(tmp_path / "a.parquet"), base)
    _touch(str(tmp_path / "b.parquet"), base + timedelta(hours=1))
    _touch(str(tmp_path / "ignore.csv"), base)
    listing = sources.list_files(spark, str(tmp_path))
    rows = listing.collect()
    assert sorted(r.basename for r in rows) == ["a.parquet", "b.parquet"]
    assert all(r.size > 0 for r in rows)


def test_listing_path_form_and_missing_dir_contract(spark, tmp_path, monkeypatch):
    """The r7 listing contract (ADVICE r6): schemeless inputs keep the
    plain normpath'd dir/name form (relative stays relative — manifests
    key on these strings), URI inputs keep a URI, and a missing
    directory raises FileNotFoundError rather than a raw py4j error."""
    import pytest

    base = datetime(2024, 1, 1, 12, 0, 0)
    d = tmp_path / "landing"
    d.mkdir()
    _touch(str(d / "a.parquet"), base)

    # absolute schemeless: absolute dir/name, normpath-stable
    abs_rows = sources.list_files(spark, f"{d}//.").collect()
    assert abs_rows[0].path == str(d / "a.parquet")

    # relative schemeless: stays relative (resolved against cwd)
    monkeypatch.chdir(tmp_path)
    rel_rows = sources.list_files(spark, "landing").collect()
    assert rel_rows[0].path == os.path.join("landing", "a.parquet")

    # URI-schemed: stays a URI so downstream reads hit the right store
    uri_rows = sources.list_files(spark, f"file://{d}").collect()
    assert uri_rows[0].path.startswith("file:/")
    assert uri_rows[0].path.endswith("/a.parquet")

    with pytest.raises(FileNotFoundError):
        sources.list_files(spark, str(tmp_path / "nope"))

    # mtimes are millisecond-granular (Hadoop getModificationTime) —
    # the documented contract callers must truncate watermarks to
    assert all(r.mtime.microsecond % 1000 == 0 for r in abs_rows)


def test_watermark_bounding(spark, tmp_path):
    base = datetime(2024, 1, 1, 12, 0, 0)
    for i in range(4):
        _touch(str(tmp_path / f"f{i}.parquet"), base + timedelta(hours=i))
    listing = sources.list_files(spark, str(tmp_path))
    since = sources.filter_since_watermark(listing, base + timedelta(hours=1))
    names = [r.basename for r in since.collect()]
    assert names == ["f2.parquet", "f3.parquet"]  # strict >, mtime ascending


def test_dedup_keep_newest_per_basename(spark, tmp_path):
    base = datetime(2024, 1, 1, 12, 0, 0)
    (tmp_path / "u1").mkdir()
    (tmp_path / "u2").mkdir()
    _touch(str(tmp_path / "u1" / "same.parquet"), base)
    _touch(str(tmp_path / "u2" / "same.parquet"), base + timedelta(hours=2))
    a = sources.list_files(spark, str(tmp_path / "u1"))
    b = sources.list_files(spark, str(tmp_path / "u2"))
    deduped = sources.dedup_keep_newest(a.unionByName(b)).collect()
    assert len(deduped) == 1
    assert "u2" in deduped[0].path  # newest wins


def test_topk_newest(spark, tmp_path):
    base = datetime(2024, 1, 1, 12, 0, 0)
    for i in range(5):
        _touch(str(tmp_path / f"f{i}.parquet"), base + timedelta(minutes=i))
    top = sources.top_k_newest(sources.list_files(spark, str(tmp_path)), k=2).collect()
    assert [r.basename for r in top] == ["f4.parquet", "f3.parquet"]


def test_anti_join_processed(spark, tmp_path):
    base = datetime(2024, 1, 1, 12, 0, 0)
    for i in range(3):
        _touch(str(tmp_path / f"f{i}.parquet"), base)
    listing = sources.list_files(spark, str(tmp_path))
    processed = listing.filter(listing.basename == "f1.parquet").select("path")
    todo = sources.anti_join_processed(listing, processed).collect()
    assert sorted(r.basename for r in todo) == ["f0.parquet", "f2.parquet"]


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the same (key, n_buckets) join without any
    Exchange: the write-time shuffle is reused by every downstream join —
    the co-located-join contract write_bucketed_table promises at 100 TB."""
    from pyspark.sql import functions as F

    from taxi_aws_data_pipeline_spark import sinks
    from taxi_aws_data_pipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    sinks.write_bucketed_table(li, "li_bucketed", "l_orderkey", 8, "l_orderkey")
    sinks.write_bucketed_table(od, "od_bucketed", "o_orderkey", 8, "o_orderkey")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("od_bucketed").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sanity: result matches the unbucketed join
        expected = li.join(od, li.l_orderkey == od.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")


def test_training_shard_sink_layout_and_roundtrip(spark, tmp_path):
    """Shards partition by source, respect the row bound, never
    interleave bins within a shard file, and round-trip all content."""
    from pyspark.sql import functions as F

    from taxi_aws_data_pipeline_spark import sinks

    rows = [
        (i, "A" if i % 3 else "B", f"text number {i} with several words here")
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    path = sinks.write_training_shards(
        df, str(tmp_path), budget=16, shard_max_rows=20
    )
    back = spark.read.parquet(path)
    # content round-trips exactly (plus the bin assignment)
    assert back.count() == 90
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == list(range(90))
    assert set(back.columns) == {"doc_id", "source", "text", "bin_id"}
    # row bound respected per physical file, and files never mix sources
    # or interleave bin ranges
    facts = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("source").alias("n_sources"),
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
        )
        .collect()
    )
    assert all(r.n <= 20 for r in facts)
    assert all(r.n_sources == 1 for r in facts)
    by_file = sorted(
        ((r.f, r.lo, r.hi) for r in facts), key=lambda t: (t[0].rsplit("/", 1)[0], t[1])
    )
    # within a source directory, consecutive shards' bin ranges may touch
    # at the boundary bin (a bin can straddle a file cut) but never invert
    from itertools import groupby

    for _, grp in groupby(by_file, key=lambda t: t[0].rsplit("/", 1)[0]):
        shards = list(grp)
        for (fa, loa, hia), (fb, lob, hib) in zip(shards, shards[1:]):
            assert hia <= lob or (hia == lob)


def test_csv_embedded_newline_paths(spark, tmp_path):
    """The x89 roundtrip's documented precondition, pinned both ways:
    the default splittable reader (multiLine=false) SPLITS a quoted
    field at an embedded newline (records corrupt — the failure mode
    the precondition excludes), while the non-splittable
    multiLine=true reader recovers the rows exactly. Data with
    embedded newlines must pick one: pre-escape, or pay multiLine."""
    rows = [(1, "plain text"), (2, "line one\nline two"), (3, "tail")]
    df = spark.createDataFrame(rows, "id long, text string")
    path = str(tmp_path / "csv_nl")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .csv(path)
    )
    schema = "id long, text string"
    fast = spark.read.schema(schema).option("header", True).csv(path)
    # splittable reader cut the quoted field: row count drifts
    assert fast.count() != len(rows)
    slow = (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .csv(path)
    )
    assert sorted((r.id, r.text) for r in slow.collect()) == sorted(rows)


def test_dynamic_partition_overwrite_touches_only_written_partitions(
    spark, tmp_path
):
    """Reprocessing one month replaces only that month's partition; a
    static-mode overwrite of the same frame would truncate the table to
    the new frame's partitions (counter-asserted)."""
    import pyspark.sql.functions as F

    from taxi_aws_data_pipeline_spark import sinks

    base = str(tmp_path)
    full = spark.range(100).select(
        F.col("id"),
        F.lit(2024).alias("pickup_year"),
        (F.col("id") % 2 + 1).cast("int").alias("pickup_month"),
        F.lit(1.0).alias("amount"),
    )
    path = sinks.overwrite_changed_partitions(full, base, "trips")
    # correction batch: month 2 only, amounts doubled, half the rows
    fix = spark.range(25).select(
        (F.col("id") + 1000).alias("id"),
        F.lit(2024).alias("pickup_year"),
        F.lit(2).cast("int").alias("pickup_month"),
        F.lit(2.0).alias("amount"),
    )
    sinks.overwrite_changed_partitions(fix, base, "trips")
    back = spark.read.parquet(path)
    m1 = back.filter(F.col("pickup_month") == 1)
    m2 = back.filter(F.col("pickup_month") == 2)
    assert m1.count() == 50  # untouched
    assert m2.count() == 25  # replaced, not appended
    assert m2.agg(F.min("amount"), F.max("amount")).collect()[0] == (2.0, 2.0)
    # counterproof: a STATIC overwrite of the same correction truncates
    static_path = f"{base}/static_facts"
    full.write.mode("overwrite").partitionBy(
        "pickup_year", "pickup_month"
    ).parquet(static_path)
    fix.write.mode("overwrite").partitionBy(
        "pickup_year", "pickup_month"
    ).parquet(static_path)
    left = spark.read.parquet(static_path)
    assert left.filter(F.col("pickup_month") == 1).count() == 0


def test_training_shard_sink_forced_multisource_tasks(spark, tmp_path):
    """The inserted-sort trap with its precondition pinned: with
    shuffle.partitions=2 and six sources, every write task holds ≥3
    sources — the state where the V1 partitioned writer demands
    partition-column-led ordering and (before the round-8 fix) silently
    re-sorted on source alone. The hash-collision precondition is forced
    every run (the 90-row sibling test needs collision luck); the FAILURE
    under the old code still manifested probabilistically (~1/5 measured)
    because it also needs an unlucky shuffle-fetch arrival order, which
    no conf pins — with the fix the layout holds for EVERY arrival
    order, by construction. Conf is restored after."""
    from itertools import groupby

    from pyspark.sql import functions as F

    from taxi_aws_data_pipeline_spark import sinks

    rows = [
        (i, f"src{i % 6}", f"text number {i} with several words here")
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        path = sinks.write_training_shards(
            df, str(tmp_path), budget=16, shard_max_rows=10
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    back = spark.read.parquet(path)
    assert back.count() == 240
    facts = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("source").alias("n_sources"),
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
        )
        .collect()
    )
    assert all(r.n <= 10 for r in facts)
    assert all(r.n_sources == 1 for r in facts)
    by_file = sorted(
        ((r.f, r.lo, r.hi) for r in facts),
        key=lambda t: (t[0].rsplit("/", 1)[0], t[0]),
    )
    # name order within a source dir == bin order: consecutive shards'
    # ranges may only touch at a straddling bin, never invert
    for _, grp in groupby(by_file, key=lambda t: t[0].rsplit("/", 1)[0]):
        shards = list(grp)
        for (fa, loa, hia), (fb, lob, hib) in zip(shards, shards[1:]):
            assert hia <= lob, (
                f"bin ranges invert between consecutive shards "
                f"{fa}({loa}-{hia}) and {fb}({lob}-{hib})"
            )


def test_training_shard_sink_skewed_source(spark, tmp_path):
    """100 TB posture under source skew: one source holding ~90% of rows
    must still respect the per-file row bound (maxRecordsPerFile cuts
    independently of source size) and keep its bin order across the MANY
    files the hot source splits into — the case where an ordering bug
    multiplies, since a skewed source is exactly the one a sequential
    loader streams longest."""
    from itertools import groupby

    from pyspark.sql import functions as F

    from taxi_aws_data_pipeline_spark import sinks

    rows = [
        (i, "hot" if i % 10 else "cold", f"text number {i} some words here")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    path = sinks.write_training_shards(
        df, str(tmp_path), budget=12, shard_max_rows=25
    )
    back = spark.read.parquet(path)
    assert back.count() == 300
    facts = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("source").alias("n_sources"),
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
        )
        .collect()
    )
    assert all(r.n <= 25 for r in facts), "row bound broken under skew"
    assert all(r.n_sources == 1 for r in facts)
    hot_files = [r for r in facts if "source=hot" in r.f]
    assert len(hot_files) >= 270 // 25, "hot source must split into many files"
    by_file = sorted(
        ((r.f, r.lo, r.hi) for r in facts),
        key=lambda t: (t[0].rsplit("/", 1)[0], t[0]),
    )
    for _, grp in groupby(by_file, key=lambda t: t[0].rsplit("/", 1)[0]):
        shards = list(grp)
        for (fa, loa, hia), (fb, lob, hib) in zip(shards, shards[1:]):
            assert hia <= lob, (
                f"bin ranges invert between {fa}({loa}-{hia}) "
                f"and {fb}({lob}-{hib})"
            )


def test_training_shard_sink_subshards(spark, tmp_path):
    """The n_subshards scale lever: a source too large for one task
    splits deterministically by pmod(xxhash64(id), n) into subshard
    directories, bins pack per (source, subshard), and the name-order
    layout contract holds within each subshard directory. Also pins
    determinism: the subshard assignment derives from the id alone, so
    two writes of the same data produce identical directory contents."""
    from itertools import groupby

    from pyspark.sql import functions as F

    from taxi_aws_data_pipeline_spark import sinks

    rows = [
        (i, "hot" if i % 10 else "cold", f"text number {i} some words here")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    path = sinks.write_training_shards(
        df, str(tmp_path), budget=12, shard_max_rows=20, n_subshards=4
    )
    back = spark.read.parquet(path)
    assert back.count() == 300
    assert set(back.columns) == {"doc_id", "source", "text", "bin_id", "subshard"}
    # subshard derives from the id alone and is stable
    sub = {r.doc_id: r.subshard for r in back.select("doc_id", "subshard").collect()}
    expect = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id",
            F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int").alias("s"),
        ).collect()
    }
    assert sub == expect
    assert set(sub.values()) == {0, 1, 2, 3}
    # bins pack per (source, subshard): nondecreasing in id order, start at 0
    groups = {}
    for r in back.select("source", "subshard", "doc_id", "bin_id").collect():
        groups.setdefault((r.source, r.subshard), []).append((r.doc_id, r.bin_id))
    for key, docs in groups.items():
        docs.sort()
        bins = [b for _, b in docs]
        assert bins[0] == 0, key
        assert all(a <= b for a, b in zip(bins, bins[1:])), key
    # per-file: row bound, single (source, subshard), name-order bin layout
    facts = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("source", "subshard").alias("n_keys"),
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
        )
        .collect()
    )
    assert all(r.n <= 20 for r in facts)
    assert all(r.n_keys == 1 for r in facts)
    by_file = sorted(
        ((r.f, r.lo, r.hi) for r in facts),
        key=lambda t: (t[0].rsplit("/", 1)[0], t[0]),
    )
    for d, grp in groupby(by_file, key=lambda t: t[0].rsplit("/", 1)[0]):
        assert "/subshard=" in d
        shards = list(grp)
        for (fa, loa, hia), (fb, lob, hib) in zip(shards, shards[1:]):
            assert hia <= lob, (fa, hia, fb, lob)
