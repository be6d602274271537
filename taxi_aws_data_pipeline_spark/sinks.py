"""Sinks S7-S9 (SURVEY.md §2.1; reference upload functions
data_processing.py:465-538 + latest-alias publish dp:482-495).

The reference writes one pandas frame to one S3 key per run
(``processed/taxi/{processing_id}/...`` + a ``latest/`` copy_object
alias). The Spark-native layout upgrade (SURVEY §1.4): Hive-style
``partitionBy(pickup_year, pickup_month)`` parquet instead of manual
``date=%Y-%m`` key templating — readers then get partition pruning for
free. Paths are plain Hadoop-FS URIs: ``file:///`` locally, ``s3a://``
on a cluster, no engine change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_fact_table(
    df: DataFrame,
    base_path: str,
    processing_id: str,
    partition_cols: tuple[str, ...] = ("pickup_year", "pickup_month"),
) -> str:
    """S7 (dp:465-503): snappy parquet, versioned path, partitioned layout."""
    path = os.path.join(base_path, "processed", "taxi", processing_id)
    writer = df.write.mode("overwrite").option("compression", "snappy")
    if partition_cols and set(partition_cols) <= set(df.columns):
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    return path


def write_metrics(
    metrics: dict[str, DataFrame], base_path: str, processing_id: str
) -> dict[str, str]:
    """S8 (dp:505-538): CSV per metric table under a date-partitioned key.

    Metric tables are tiny aggregates (≤ thousands of rows at any SF), so
    ``coalesce(1)`` matches the reference's single-CSV contract without a
    meaningful bottleneck — the upstream aggregation stays parallel.
    """
    out = {}
    for name, df in metrics.items():
        path = os.path.join(base_path, "processed", "metrics", processing_id, name)
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
        out[name] = path
    return out


def publish_latest(df: DataFrame, base_path: str, table: str) -> str:
    """S9 (dp:482-495, s3_uploader.py:185-203): stable ``latest/`` alias.

    The reference copy_objects each key; in Spark the alias is simply an
    ``overwrite`` of a stable path — atomic per the committer protocol.
    """
    path = os.path.join(base_path, "processed", table, "latest")
    df.write.mode("overwrite").parquet(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Bucketed, sorted managed table: pre-shuffles ONCE at write time so
    every later equi-join or aggregation on ``bucket_col`` is
    exchange-free (Spark reads each bucket as a pre-partitioned,
    pre-sorted split).

    This is the 100 TB co-located-join strategy the reference cannot
    express: when a fact table is joined on the same key by many
    downstream queries, bucketing amortizes the shuffle across all of
    them. Bucket count should put one bucket ≈ one task's worth of data
    (128-512 MB) at the target scale; both join sides must agree on
    (col, n_buckets) for the exchange to be elided.

    Ordering contract is declared via the bucketed writer's own
    ``sortBy``, which the writer plans itself — no inserted-sort risk
    (see BASELINE.md's inserted-sort trap for the partitionBy sibling).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def write_training_shards(
    df: DataFrame,
    base_path: str,
    budget: int = 256,
    shard_max_rows: int = 10_000,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_subshards: int = 1,
) -> str:
    """Training-shard writer: the output edge of the curation pipeline.
    Documents get their contiguous-packing bin assignment, are co-located
    by source (one task per source partition → shards never interleave
    sources) and laid down ORDERED by (bin_id, id) in size-bounded
    parquet shards — exactly the layout a sequential data loader wants:
    read shards in name order, rows arrive in packing order, each shard
    a bounded unit of work.

    At 100 TB: partition column pruning picks sources, ``shard_max_rows``
    (``maxRecordsPerFile``) bounds shard size independently of source
    skew, and the single repartition on the layout key is the only
    shuffle — the sort is within-partition. For sources too large for
    one task, set ``n_subshards > 1``: rows split deterministically by
    ``pmod(xxhash64(id), n)`` into a ``subshard`` layout column, bins
    are packed per (source, subshard), and the output gains one
    directory level (``source=X/subshard=K/``) — the name-order
    contract then holds WITHIN each subshard directory, and a loader
    streams subshards as independent sequential units (training
    shuffles across them anyway). One source's write parallelism
    becomes n_subshards tasks instead of one.

    Inserted-sort trap (VERDICT r7): the partitioned V1 parquet writer
    REQUIRES each task's rows ordered by the ``partitionBy`` columns; if
    the explicit sort doesn't lead with them, the planner inserts its
    own sort on ``source`` ALONE, discarding the (bin_id, id) order.
    That broke the layout nondeterministically whenever one task held
    two sources (hash collision / AQE coalescing at low parallelism) —
    5/8 fresh-JVM failures at local[8], invisible at local[32]. Hence
    the explicit sort below leads with ``source_col``: it satisfies the
    writer's required ordering, so no planner sort is inserted and the
    per-source (bin_id, id) order survives verbatim.
    """
    from pyspark.sql import functions as F

    from .ext.packing import contiguous_pack_bins

    if n_subshards > 1:
        df = df.withColumn(
            "subshard",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_subshards)).cast("int"),
        )
        layout_cols = (source_col, "subshard")
    else:
        layout_cols = (source_col,)
    bins = contiguous_pack_bins(
        df, budget=budget, text_col=text_col, id_col=id_col,
        partition_col=layout_cols,
    ).select(id_col, "bin_id")
    path = os.path.join(base_path, "training_shards")
    (
        df.join(bins, id_col)
        .repartition(*layout_cols)
        .sortWithinPartitions(*layout_cols, "bin_id", id_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", shard_max_rows)
        .partitionBy(*layout_cols)
        .parquet(path)
    )
    return path


def overwrite_changed_partitions(
    df: DataFrame,
    base_path: str,
    table: str,
    partition_cols: tuple[str, ...] = ("pickup_year", "pickup_month"),
) -> str:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leaving every other partition of the target untouched —
    the idempotent reprocess-one-month write the reference performs by
    deleting and re-uploading one S3 prefix (s3_uploader.py key
    templating), expressed as a single declarative write.

    The critical conf is ``partitionOverwriteMode=dynamic`` (set on the
    writer, so no session mutation leaks): STATIC mode — the default —
    would truncate the WHOLE table before writing, which at 100 TB
    turns a one-partition correction into a full rewrite plus a window
    of data loss for concurrent readers. Dynamic mode commits each
    touched partition atomically via the staging-directory protocol.
    """
    path = os.path.join(base_path, "facts", table)
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return path
