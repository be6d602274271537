"""Testdata table loaders.

The driver provides deterministic TPC-H-ish parquet at
``/root/testdata/sf{0.001,0.01,0.1}/{name}.parquet`` (TESTDATA.md). One
quirk needs engine-side handling: ``events.ts`` is written as parquet
TIMESTAMP(NANOS, isAdjustedToUTC=false), a physical type Spark has no
native logical type for. With ``spark.sql.legacy.parquet.nanosAsLong=true``
(session.py) the column arrives as ``bigint`` nanoseconds; we convert to
``timestamp_ntz`` at microsecond precision with **integer** division —
float division of ~1.7e18 ns epochs through a double mantissa silently
corrupts the low microseconds, which the DuckDB oracle would catch.

This is the Spark-idiomatic analog of the reference's schema-drift
tolerance at the read edge (SURVEY.md §1.2; reference
data_processing.py:607-611 reads whatever schema each file carries and
reconciles afterward).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns that are TIMESTAMP(NANOS) on disk, per table
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# Runtime-settable SQL confs every catalog plan depends on. session.py sets
# the same values at build time, but the driver harness hands us a *vanilla*
# Spark 4 session (ANSI on, no nanos conf, host timezone), so the read edge
# must pin them itself or every events.parquet scan dies with
# PARQUET_TYPE_ILLEGAL and casts/date-parts drift:
#   - nanosAsLong: TIMESTAMP(NANOS) has no native Spark type; read as bigint.
#   - ansi.enabled=false: CAST/x÷0 coerce to NULL like the reference's pandas
#     errors='coerce' (data_processing.py:727-753; SURVEY §1.2).
#   - session.timeZone=UTC: timestamp_micros() yields TIMESTAMP_LTZ and the
#     cast to timestamp_ntz goes through the session zone — a non-UTC driver
#     session would shift every events timestamp.
_REQUIRED_RUNTIME_CONFS: tuple[tuple[str, str], ...] = (
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ("spark.sql.ansi.enabled", "false"),
    ("spark.sql.session.timeZone", "UTC"),
)


def pin_session_confs(spark: SparkSession) -> None:
    """Pin the semantics confs on *any* session (all are runtime-settable)."""
    for key, value in _REQUIRED_RUNTIME_CONFS:
        if spark.conf.get(key, None) != value:
            spark.conf.set(key, value)


def _ns_long_to_timestamp(df: DataFrame, column: str) -> DataFrame:
    """bigint nanoseconds → timestamp_ntz (µs precision, floor division)."""
    return df.withColumn(
        column,
        F.timestamp_micros(F.expr(f"`{column}` DIV 1000")).cast("timestamp_ntz"),
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nanosecond timestamps.

    Works on any session, including a vanilla ANSI-on Spark 4 default:
    the confs the plans rely on are pinned here, at the single choke point
    every catalog query funnels through.
    """
    pin_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for column in _NANOS_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(column) == "bigint":
            df = _ns_long_to_timestamp(df, column)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
