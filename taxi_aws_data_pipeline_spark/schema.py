"""Canonical taxi-trip schema + cast enforcement (SURVEY.md §1.2-1.3, P1).

Reproduces the reference's declared type map and coercing cast:

- type map: ``apply_optimized_schema`` — reference
  data_processing.py:685-705 (prefect_flows.py:498-518 twin);
- safe casting: ``robust_pandas_cast`` — data_processing.py:727-753,
  where failed values become null (``errors='coerce'``). Spark's non-ANSI
  CAST has exactly those semantics (session.py pins ansi=false).

The reference downcasts to save single-node RAM (its O1 optimization,
data_processing.py:631-646); for us the narrow types also shrink shuffle
and parquet footprint at 100 TB, so we keep them rather than defaulting to
long/double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Declared trip schema — one entry per reference dp:685-705 line, with the
# pandas dtype → Spark type mapping of SURVEY §1.3.
TRIP_SCHEMA = T.StructType(
    [
        T.StructField("VendorID", T.ByteType()),
        T.StructField("tpep_pickup_datetime", T.TimestampType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampType()),
        T.StructField("passenger_count", T.ByteType()),
        T.StructField("trip_distance", T.FloatType()),
        T.StructField("RatecodeID", T.ByteType()),
        T.StructField("store_and_fwd_flag", T.StringType()),
        T.StructField("PULocationID", T.ShortType()),
        T.StructField("DOLocationID", T.ShortType()),
        T.StructField("payment_type", T.ByteType()),
        T.StructField("fare_amount", T.FloatType()),
        T.StructField("extra", T.FloatType()),
        T.StructField("mta_tax", T.FloatType()),
        T.StructField("tip_amount", T.FloatType()),
        T.StructField("tolls_amount", T.FloatType()),
        T.StructField("improvement_surcharge", T.FloatType()),
        T.StructField("total_amount", T.FloatType()),
        T.StructField("congestion_surcharge", T.FloatType()),
        T.StructField("airport_fee", T.FloatType()),
    ]
)

# Permissive ingestion twin of TRIP_SCHEMA: every numeric read as double,
# so files whose writers upcast (e.g. pandas turns nullable ints into
# float64 → parquet DOUBLE) still scan. The reference has exactly this
# split: files are read with whatever types they carry (pd.read_parquet,
# data_processing.py:607-611) and only *then* cast down
# (apply_optimized_schema, dp:682-725). enforce_schema() is that second
# step. The parquet reader also widens true INT columns to double.
TRIP_READ_SCHEMA = T.StructType(
    [
        T.StructField(
            f.name,
            f.dataType
            if isinstance(f.dataType, (T.TimestampType, T.StringType))
            else T.DoubleType(),
        )
        for f in TRIP_SCHEMA.fields
    ]
)

#: money component columns summed by the C7 consistency repair
#: (data_processing.py:160-174)
TOTAL_COMPONENTS = (
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "congestion_surcharge",
    "airport_fee",
)


def enforce_schema(df: DataFrame, schema: T.StructType = TRIP_SCHEMA) -> DataFrame:
    """P1 typed cast projection with coerce-to-null.

    Missing columns (schema drift, e.g. pre-2021 files without
    ``airport_fee`` — SURVEY §1.2) are added as typed nulls; extra columns
    are dropped; everything else is cast. Column-pruning + cast is a pure
    projection, so Catalyst pushes the pruning into the scan.
    """
    existing = set(df.columns)
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in existing
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(cols)
