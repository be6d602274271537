"""The five business-metric aggregate families A1-A5 (SURVEY.md §2.4;
reference ``create_taxi_metrics`` data_processing.py:820-912, prefect twin
pf:641-737).

Reference semantics pinned here (and checked by the golden test):

- metrics are computed over VALID trips only (P5: dp:833 filters
  ``is_valid_trip``);
- counts are non-null counts of the aggregated column, NOT count(*)
  (SURVEY §2.4 notes);
- medians are exact interpolated (pandas default ≡ Spark ``median``);
- every aggregate output is ``round(_, 2)`` (dp:849,862,873,885,898).

All five are single hash aggregations (partial+final map-side combine for
free); the shared valid-trips input should be cached by the caller
(pipeline.py) since five independent jobs consume it — mirroring the
reference computing all five from one in-memory frame (dp:826).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _r(c, alias):  # round(2) convention, dp:849 etc.
    return F.bround(c, 2).alias(alias)


def _group(df: DataFrame, *keys: str):
    """pandas groupby(dropna=True) semantics: null group keys are dropped
    (the reference never imputes VendorID, so its vendor_performance
    silently excludes null-vendor trips — observable behavior we match)."""
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond).groupBy(*keys)


def valid_trips(df: DataFrame) -> DataFrame:
    """P5 (dp:833): metrics see only rows flagged valid by P4."""
    return df.filter(F.col("is_valid_trip"))


def vendor_performance(df: DataFrame) -> DataFrame:
    """A1 (dp:843-855): count/mean/median trios by vendor."""
    return _group(df, "VendorID").agg(
        F.count("trip_duration_minutes").alias("trip_count"),
        _r(F.avg("trip_duration_minutes"), "avg_duration"),
        _r(F.median("trip_duration_minutes"), "median_duration"),
        _r(F.sum("total_amount"), "total_revenue"),
        _r(F.avg("total_amount"), "avg_revenue"),
        _r(F.median("total_amount"), "median_revenue"),
        _r(F.sum("tip_amount"), "total_tips"),
        _r(F.avg("tip_amount"), "avg_tips"),
        _r(F.avg("trip_distance"), "avg_distance"),
        _r(F.median("trip_distance"), "median_distance"),
    )


def hourly_demand(df: DataFrame) -> DataFrame:
    """A2 (dp:857-866)."""
    return _group(df, "pickup_hour").agg(
        F.count("VendorID").alias("trip_count"),
        _r(F.sum("total_amount"), "total_revenue"),
        _r(F.avg("trip_duration_minutes"), "avg_duration"),
    )


def pickup_location_analysis(df: DataFrame) -> DataFrame:
    """A3 (dp:868-877)."""
    return _group(df, "PULocationID").agg(
        F.count("VendorID").alias("trip_count"),
        _r(F.sum("total_amount"), "total_revenue"),
        _r(F.avg("trip_duration_minutes"), "avg_duration"),
    )


def payment_analysis(df: DataFrame) -> DataFrame:
    """A4 (dp:879-889)."""
    return _group(df, "payment_type").agg(
        F.count("VendorID").alias("trip_count"),
        _r(F.sum("total_amount"), "total_revenue"),
        _r(F.sum("tip_amount"), "total_tips"),
        _r(F.avg("tip_percentage"), "avg_tip_percentage"),
    )


def monthly_summary(df: DataFrame) -> DataFrame:
    """A5 (dp:892-908): multi-key (year, month)."""
    return _group(df, "pickup_year", "pickup_month").agg(
        F.count("VendorID").alias("trip_count"),
        _r(F.sum("total_amount"), "total_revenue"),
        _r(F.avg("trip_duration_minutes"), "avg_duration"),
        _r(F.avg("trip_distance"), "avg_distance"),
    )


def create_taxi_metrics(df: DataFrame) -> dict[str, DataFrame]:
    """All five families from one valid-trips input (dp:820-912)."""
    v = valid_trips(df)
    return {
        "vendor_performance": vendor_performance(v),
        "hourly_demand": hourly_demand(v),
        "pickup_location_analysis": pickup_location_analysis(v),
        "payment_analysis": payment_analysis(v),
        "monthly_summary": monthly_summary(v),
    }
