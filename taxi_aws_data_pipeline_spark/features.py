"""Derived-column block: the 12 feature columns + validity flag
(SURVEY.md §1.3 derived table, §2.6 expressions; reference
``transform_taxi_data`` data_processing.py:755-818, prefect twin
pf:571-639).

Every expression is a native Spark SQL function — no UDFs — so the whole
block is one narrow projection inside a single whole-stage-codegen span;
at 100 TB it adds zero shuffles.

The semantic traps called out in SURVEY §7.3.2 are encoded deliberately:

- E2: pandas ``dist/(dur/60)`` with dur=0 gives inf which ``.clip(0,100)``
  turns into 100; Spark x/0 is NULL, so the dur==0 branch is explicit.
- E6: ``pd.cut(..., include_lowest=True)`` bins are right-closed — hour 6
  is still 'Night'.
- E7: ``pd.cut`` without include_lowest leaves total<=0 (and null)
  uncategorized → null segment.
- E8: tip/fare*100 with fare=0 → ±inf → 0, and NaN → 0; Spark's NULL-on-
  divide-by-zero plus ``coalesce(_, 0)`` reproduces both.
- E5: pandas weekday Mon=0 ⇒ weekend is dayofweek>=5; Spark Sun=1/Sat=7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_trip_features(df: DataFrame) -> DataFrame:
    """Append the full derived-column block (reference dp:755-818)."""
    pickup = F.col("tpep_pickup_datetime")
    dropoff = F.col("tpep_dropoff_datetime")

    # E1 (dp:765-767) — seconds-precision diff; cast to double keeps
    # fractional seconds like pandas .dt.total_seconds()
    duration_min = (
        dropoff.cast("double") - pickup.cast("double")
    ) / F.lit(60.0)

    df = df.withColumn("trip_duration_minutes", duration_min)
    dur = F.col("trip_duration_minutes")

    # E2 (dp:770-771) — speed clipped to [0,100]. pandas edge cases of
    # dist/(dur/60) then .clip(0,100), encoded branch by branch: any null
    # input → NaN stays NaN through clip; dur==0 → +inf→100 only for
    # dist>0, -inf→0 for dist<0, and 0/0 → NaN; least/greatest SKIP
    # nulls, so null propagation must precede the dur==0 shortcut.
    dist = F.col("trip_distance")
    speed = dist / (dur / 60.0)
    null_d = F.lit(None).cast("double")
    df = df.withColumn(
        "average_speed_mph",
        F.when(dist.isNull() | dur.isNull(), null_d)
        .when(
            dur == 0,
            F.when(dist > 0, F.lit(100.0))
            .when(dist < 0, F.lit(0.0))
            .otherwise(null_d),
        )
        .otherwise(F.least(F.greatest(speed, F.lit(0.0)), F.lit(100.0))),
    )

    # E3/E4 (dp:774-777)
    df = (
        df.withColumn("pickup_hour", F.hour(pickup))
        .withColumn("pickup_day_of_week", F.date_format(pickup, "EEEE"))
        .withColumn("pickup_month", F.month(pickup))
        .withColumn("pickup_year", F.year(pickup))
    )

    # E6 (dp:780-785) — right-closed bins, hour 6 ⇒ Night
    h = F.col("pickup_hour")
    df = df.withColumn(
        "time_of_day",
        F.when(h <= 6, "Night")
        .when(h <= 12, "Morning")
        .when(h <= 18, "Afternoon")
        .otherwise("Evening"),
    )

    # E9 flags (dp:788-789) + E5 weekend (dp:790)
    df = (
        df.withColumn("is_airport_trip", F.col("RatecodeID").isin(2, 3))
        .withColumn("is_credit_card_payment", F.col("payment_type") == 1)
        .withColumn("is_weekend", F.dayofweek(pickup).isin(1, 7))
    )

    # E7 (dp:793-797) — zero/negative/null total ⇒ null segment
    t = F.col("total_amount")
    df = df.withColumn(
        "revenue_segment",
        F.when(t.isNull() | (t <= 0), F.lit(None).cast("string"))
        .when(t <= 10, "Low")
        .when(t <= 20, "Medium")
        .when(t <= 50, "High")
        .otherwise("Very High"),
    )

    # E8 (dp:800-802) — ±inf→0 via NULL-on-div-zero + coalesce; fillna(0)
    df = df.withColumn(
        "tip_percentage",
        F.coalesce(F.col("tip_amount") / F.col("fare_amount") * 100.0, F.lit(0.0)),
    )

    # P4 (dp:805-812) — validity flag, a column not a filter
    df = df.withColumn(
        "is_valid_trip",
        (dur > 0)
        & (dur < 180)
        & (F.col("trip_distance") > 0)
        & (F.col("trip_distance") < 100)
        & (F.col("fare_amount") >= 0)
        & (F.col("total_amount") >= 0),
    )
    return df


def filename_consistency_filter(df: DataFrame, pattern: str = r"yellow_tripdata_(\d{4})-(\d{2})\.parquet") -> DataFrame:
    """P2/E10 (dp:15-25, 27-71): drop rows whose pickup (year, month)
    disagrees with the ``yellow_tripdata_YYYY-MM.parquet`` filename they
    came from.

    Spark-first formulation: instead of the reference's per-file loop, one
    distributed filter keyed on ``input_file_name()`` — works identically
    for a single file or a 100k-file glob, and Catalyst still prunes
    columns/partitions around it. Rows from files that don't match the
    pattern at all are kept (the reference validates only matching files).
    """
    fname = F.input_file_name()
    fy = F.regexp_extract(fname, pattern, 1).cast("int")
    fm = F.regexp_extract(fname, pattern, 2).cast("int")
    pickup = F.col("tpep_pickup_datetime")
    return df.filter(
        fy.isNull()
        | ((F.year(pickup) == fy) & (F.month(pickup) == fm))
    )
