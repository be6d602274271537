"""Batch sources & file-listing operators S1-S6 (SURVEY.md §2.1;
reference data_processing.py:282-307,552-629 + s3_uploader listing).

The reference hand-rolls S3 listing, newest-file dedup, top-K selection
and watermark filtering in driver Python over ``list_objects_v2`` pages.
Here the listing itself becomes a (tiny) DataFrame — file metadata is
driver-scale even at 100 TB of data (millions of files ≪ memory) — and
the *data* reads are single declarative scans where Catalyst handles
predicate pushdown and partition pruning. The streaming module
(streaming.py) supersedes the watermark/ledger logic for production
incremental runs; these batch helpers are the explicit-manifest fallback
(SURVEY §7.1 step 6).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("basename", T.StringType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("mtime", T.TimestampType(), False),
    ]
)


def list_files(
    spark: SparkSession, directory: str, suffix: str = ".parquet"
) -> DataFrame:
    """S2 file-discovery scan (dp:282-307) as a listing DataFrame.

    Store-agnostic since r6: the listing comes from the Hadoop
    FileSystem API dispatched on the directory's scheme (the ingest.py
    path), so file:// (tested), s3a:// and hdfs:// all produce the same
    frame. Schemeless local paths — absolute or relative — keep their
    plain ``dir/name`` form, normpath-normalized (the pre-r6 os.listdir
    contract that manifests/oracles pin; ADVICE r6 flagged that the
    FileSystem path round-trip absolutized relative inputs, and
    normalization keeps ``/data//landing`` and ``/data/./landing``
    manifest-stable); URI-schemed inputs keep their full URI so
    downstream reads resolve the right store. Manifest keys are these
    path STRINGS — callers feeding a processed-files manifest should
    pass the same (ideally absolute or URI) directory form every run.
    WARNING — relative inputs and chdir (ADVICE r7): a relative path is
    resolved against the PYTHON process cwd for the listing itself, but
    the relative path strings returned here are later resolved by
    ``spark.read`` against the JVM's LAUNCH-TIME working directory,
    which never moves. A ``chdir`` after the session starts (e.g.
    ``monkeypatch.chdir`` in tests) therefore makes an incremental run
    list one directory and read another. Pass absolute or URI-schemed
    directories from any code that may change cwd mid-session; the
    relative form is only safe when the Python cwd never moves. mtime
    is epoch-MILLIS → naive-UTC (Hadoop's getModificationTime
    granularity; the old os.stat path carried microseconds — callers
    comparing against sub-millisecond watermarks must truncate theirs
    the same way). A missing directory raises FileNotFoundError, as
    before.
    """
    import os

    from .ingest import _fs_for

    has_scheme = "://" in directory
    # resolve schemeless RELATIVE inputs against the Python cwd (the
    # pre-r6 os.listdir contract) — the Hadoop FileSystem would resolve
    # them against the driver JVM's working directory instead
    lookup = (
        directory
        if has_scheme or os.path.isabs(directory)
        else os.path.abspath(directory)
    )
    fs, P, _ = _fs_for(spark, lookup)
    if not fs.exists(P(lookup)):
        raise FileNotFoundError(directory)
    rows = []
    for st in fs.listStatus(P(lookup)):
        p = st.getPath()
        entry = p.getName()
        if st.isFile() and entry.endswith(suffix):
            rows.append(
                (
                    p.toString()
                    if has_scheme
                    else os.path.normpath(os.path.join(directory, entry)),
                    entry,
                    st.getLen(),
                    datetime.fromtimestamp(
                        st.getModificationTime() / 1000.0, tz=timezone.utc
                    ).replace(tzinfo=None),
                )
            )
    rows.sort(key=lambda r: r[1])
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def filter_since_watermark(listing: DataFrame, watermark: datetime) -> DataFrame:
    """S3 watermark-bounded incremental scan (dp:282-307: keep only
    LastModified > watermark, ascending)."""
    return listing.filter(F.col("mtime") > F.lit(watermark)).orderBy("mtime")


def dedup_keep_newest(listing: DataFrame) -> DataFrame:
    """S5 keep-newest-per-basename (dp:212-224) via a row_number window;
    path as tie-break for full determinism."""
    w = Window.partitionBy("basename").orderBy(F.desc("mtime"), F.desc("path"))
    return (
        listing.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def top_k_newest(listing: DataFrame, k: int = 2) -> DataFrame:
    """S6 top-K newest selector (dp:552-590, default max_files=2)."""
    return listing.orderBy(F.desc("mtime"), F.desc("path")).limit(k)


def anti_join_processed(listing: DataFrame, processed: DataFrame) -> DataFrame:
    """S4/D6 idempotency anti-filter (dp:341-345): listing minus the
    processed manifest. Manifest side is broadcast — file metadata never
    warrants a shuffle of anything."""
    return listing.join(
        F.broadcast(processed.select("path")), on="path", how="left_anti"
    )


def read_trip_files(
    spark: SparkSession,
    paths: list[str] | str,
    schema: T.StructType | None = None,
    glob_filter: str | None = "yellow_tripdata_*.parquet",
) -> DataFrame:
    """S1 parquet scan (dp:592-629) — one declarative read for any number
    of files; schema drift across files is reconciled by Spark's
    unionByName-equivalent schema merge only when we *don't* declare a
    schema, so production reads always declare one (P1) and per-file
    missing columns surface as nulls.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    reader = reader.option("recursiveFileLookup", "true")
    if isinstance(paths, str):
        return reader.parquet(paths)
    return reader.parquet(*paths)
