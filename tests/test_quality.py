"""Cleaning-suite invariants (SURVEY.md §5.1/§5.4) + the exact↔approx
statistics switch (quality.py's 100 TB path)."""

from __future__ import annotations

import numpy as np
import pytest

from taxi_aws_data_pipeline_spark import quality
from taxi_aws_data_pipeline_spark.schema import TRIP_SCHEMA, enforce_schema

from .taxi_fixture import make_trips


@pytest.fixture(scope="module")
def raw_trips(spark, tmp_path_factory):
    rng = np.random.default_rng(99)
    pdf = make_trips(3000, 2024, 5, rng)
    p = str(tmp_path_factory.mktemp("q") / "yellow_tripdata_2024-05.parquet")
    pdf.to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    return enforce_schema(spark.read.parquet(p), TRIP_SCHEMA)


def test_clean_output_invariants(spark, raw_trips):
    cleaned = quality.clean_trips(raw_trips)
    agg = cleaned.selectExpr(
        "count(*) AS n",
        "sum(CASE WHEN fare_amount <= 0 THEN 1 ELSE 0 END) AS bad_fare",
        "sum(CASE WHEN trip_distance <= 0 THEN 1 ELSE 0 END) AS bad_dist",
        "sum(CASE WHEN passenger_count < 1 OR passenger_count > 6 THEN 1 ELSE 0 END) AS bad_pass",
        "sum(CASE WHEN tpep_dropoff_datetime < tpep_pickup_datetime THEN 1 ELSE 0 END) AS time_travel",
        "sum(CASE WHEN total_amount IS NULL THEN 1 ELSE 0 END) AS null_total",
    ).collect()[0]
    assert agg.n > 0
    assert agg.bad_fare == 0 and agg.bad_dist == 0
    assert agg.bad_pass == 0 and agg.time_travel == 0
    assert agg.null_total == 0


def test_approx_stats_path_equivalent_shape(spark, raw_trips):
    """approx_stats=True (t-digest percentiles — the cluster-scale path)
    must keep the same plan shape and row count: caps change values near
    the p99 boundary only, never which rows survive the C10 filter."""
    exact = quality.clean_trips(raw_trips, approx_stats=False)
    approx = quality.clean_trips(raw_trips, approx_stats=True)
    assert exact.count() == approx.count()
    assert exact.columns == approx.columns
    # capped columns stay within their repair bounds in both modes
    for df in (exact, approx):
        row = df.selectExpr(
            "max(passenger_count) AS mx", "min(passenger_count) AS mn"
        ).collect()[0]
        assert 1 <= row.mn and row.mx <= 6


def test_all_null_mode_column_stays_null(spark, raw_trips):
    """dp:100-103: the reference's 'Unknown' fallback is unreachable — the
    ``notna().any()`` guard skips an all-null categorical entirely, so the
    column must come out of imputation still all-null (and NOT 'Unknown').
    Pins the documented equivalence in quality.impute_missing."""
    from pyspark.sql import functions as F

    all_null = raw_trips.withColumn(
        "store_and_fwd_flag", F.lit(None).cast("string")
    )
    imputed = quality.impute_missing(all_null)
    agg = imputed.selectExpr(
        "count(*) AS n",
        "sum(CASE WHEN store_and_fwd_flag IS NULL THEN 1 ELSE 0 END) AS nulls",
    ).collect()[0]
    assert agg.n > 0 and agg.nulls == agg.n


def test_clean_filter_clamp_idempotent(spark, raw_trips):
    """Second application of the value-repair + filter stages is a no-op
    (SURVEY §5.4): re-cleaning already-clean data changes nothing except
    possibly imputation stats (none fire — no nulls remain)."""
    once = quality.clean_trips(raw_trips)
    twice = quality.clean_trips(once)
    assert once.count() == twice.count()
    a = once.selectExpr("sum(cast(fare_amount AS double)) AS s").collect()[0].s
    b = twice.selectExpr("sum(cast(fare_amount AS double)) AS s").collect()[0].s
    assert a == pytest.approx(b, rel=1e-12)


def test_speed_division_edge_cases_match_pandas(spark):
    """E2 edge cases of dist/(dur/60) then clip(0,100) — dp:770-771: any
    null input stays null; zero duration gives 100 only for positive
    distance (+inf), 0 for negative (-inf), and null for 0/0 (NaN)."""
    import datetime as dt

    from taxi_aws_data_pipeline_spark import features

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def row(dist, minutes):
        drop = t0 + dt.timedelta(minutes=minutes) if minutes is not None else None
        return (t0, drop, dist, 1, 1, 10.0, 1.0, 8.0)

    df = spark.createDataFrame(
        [
            row(6.0, 30),     # normal: 12 mph
            row(5.0, 0),      # +inf -> 100
            row(-2.0, 0),     # -inf -> 0
            row(0.0, 0),      # 0/0 = NaN -> null
            row(None, 0),     # NaN/0 -> null
            row(None, 30),    # NaN -> null
            row(3.0, None),   # null duration -> null
        ],
        "tpep_pickup_datetime timestamp, tpep_dropoff_datetime timestamp, "
        "trip_distance double, RatecodeID int, payment_type int, "
        "total_amount double, tip_amount double, fare_amount double",
    )
    got = [
        r.average_speed_mph
        for r in features.add_trip_features(df)
        .select("average_speed_mph")
        .collect()
    ]
    assert got[0] == pytest.approx(12.0)
    assert got[1] == 100.0 and got[2] == 0.0
    assert got[3] is None and got[4] is None and got[5] is None and got[6] is None
