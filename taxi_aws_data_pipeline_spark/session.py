"""Tuned SparkSession builder.

The reference engine is single-process pandas (SURVEY.md §3.1: "all data
processing is single-process, single-thread"); our engine targets a real
cluster. Everything here is a plain public Spark conf. The settings fall in
three buckets:

1. **Semantics pinned for oracle parity** (DuckDB comparisons and the
   reference's pandas behavior):
   - ``spark.sql.ansi.enabled=false``  — CAST failures / x÷0 coerce to NULL,
     matching pandas ``errors='coerce'`` (reference
     data_processing.py:727-753) and the non-ANSI mapping in SURVEY §1.2.
   - ``spark.sql.session.timeZone=UTC`` — testdata timestamps are NTZ;
     keep every date-part function timezone-stable.
   - ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver testdata's
     ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark has no native
     type for; read as long and convert via integer division (tables.py).

2. **Scale posture** (100 TB / 1000-executor design, harmless locally):
   - AQE on with coalescing + skew-join handling: runtime re-planning is
     how a fixed shuffle-partition count survives a 1000× data change.
   - ``autoBroadcastJoinThreshold`` raised to 64 MB: every dim table in
     this workload (region/nation/supplier/part at any SF, plus collected
     cleaning scalars) is far below it, so fact-dim joins never shuffle
     the fact side.
   - parquet filter pushdown / column pruning are Spark defaults; we keep
     them explicit so a config regression is visible in one place.

3. **Local-test ergonomics**: ``local[$SPARK_GRAFT_CPUS]`` master,
   shuffle partitions sized to the local core count (on a cluster you'd
   leave AQE to coalesce from a few thousand).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "taxi-aws-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned session.

    ``master=None`` → ``local[$SPARK_GRAFT_CPUS]`` for tests/bench; on a
    real cluster pass ``master`` (or submit with ``--master``) and the same
    confs apply unchanged.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # -- semantics (bucket 1) --
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # -- scale posture (bucket 2) --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Arrow for the few pandas-UDF extension operators (ext/)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- local ergonomics (bucket 3) --
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # per-process warehouse isolation for the sharded suite runner
    # (tools/parallel_suite.sh): saveAsTable entries (x121, z3) would
    # otherwise race on ./spark-warehouse across concurrent pytest JVMs
    wh = os.environ.get("SPARK_GRAFT_WAREHOUSE_DIR")
    if wh:
        builder = builder.config("spark.sql.warehouse.dir", wh)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
