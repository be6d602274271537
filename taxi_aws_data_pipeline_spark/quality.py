"""Cleaning suite C1-C10 (SURVEY.md §2.7; reference ``clean_taxi_data``
data_processing.py:73-210, prefect twin pf:242-381).

Reference order is observable and preserved (SURVEY §2.7 note):

    C1-C3 impute (stats on the RAW batch) → C9 dedup →
    C4-C5 p99 caps (stats on the IMPUTED+DEDUPED batch) →
    C6 clamp → C7 total repair → C8 time repair → C10 invalid filter

Batch-scoped statistics (SURVEY §7.3.3): medians/modes/percentiles are
computed over the *current* batch, exactly like the reference — collected
to the driver as a handful of scalars (one job per stats stage, each a
single partial-aggregated pass) and injected as literals, so the repair
projection itself is shuffle-free.

100 TB posture — the exactness switch (SURVEY §4): exact ``median`` /
``percentile`` need a global sort-ish aggregation; above
``approx_threshold`` rows we switch to ``percentile_approx`` (t-digest
sketch, single pass, mergeable across 1000 executors). Exact at oracle
scale, approximate at cluster scale, behavior documented here and tested
in tests/test_quality.py.

Pandas-parity details encoded below:

- pandas ``mode().iloc[0]`` returns the SMALLEST among tied modes
  (mode() sorts); we use deterministic ``mode(col, true)``.
- pandas ``fillna`` with a fractional median promotes integer columns to
  float; we mirror the promotion only when the median is fractional.
- pandas masked assignment leaves NaN rows untouched (mask is False for
  NaN); Spark ``least``/``greatest`` *skip* nulls instead of propagating,
  so every clamp/cap guards nulls explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import TOTAL_COMPONENTS

#: C1 median-imputed numerics (dp:86-88)
MEDIAN_IMPUTE_COLUMNS = (
    "passenger_count",
    "trip_distance",
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "total_amount",
    "congestion_surcharge",
    "airport_fee",
)

#: C2 mode-imputed categoricals (dp:98)
MODE_IMPUTE_COLUMNS = ("store_and_fwd_flag", "RatecodeID", "payment_type")

#: C3 zero-imputed location ids (dp:108)
ZERO_IMPUTE_COLUMNS = ("PULocationID", "DOLocationID")

_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


@dataclass(frozen=True)
class CleaningStats:
    """The collected batch-scoped scalars, exposed for tests/logging."""

    medians: dict[str, float | None]
    modes: dict[str, object]
    trip_distance_p99: float | None
    fare_amount_p99: float | None


def _percentile(col: str, q: float, approx: bool):
    if approx:
        return F.percentile_approx(col, q, 10_000)
    return F.percentile(col, F.lit(q))


def impute_missing(df: DataFrame) -> DataFrame:
    """C1-C3 (dp:82-114): median / deterministic-mode / constant fills.

    One aggregation job collects every needed scalar, then one projection
    applies all fills.
    """
    dtypes = dict(df.dtypes)
    med_cols = [c for c in MEDIAN_IMPUTE_COLUMNS if c in dtypes]
    mode_cols = [c for c in MODE_IMPUTE_COLUMNS if c in dtypes]

    aggs = [F.median(c).alias(f"med_{c}") for c in med_cols]
    # mode(col, true): deterministic lowest-value tie-break, matching
    # pandas mode().iloc[0] (dp:103)
    aggs += [F.expr(f"mode(`{c}`, true)").alias(f"mode_{c}") for c in mode_cols]
    stats = df.agg(*aggs).collect()[0].asDict() if aggs else {}

    out = df
    for c in med_cols:
        med = stats.get(f"med_{c}")
        if med is None:
            continue
        if dtypes[c] in _INTEGRAL_TYPES and float(med) != int(med):
            # pandas fillna(1.5) on an integer column promotes to float
            out = out.withColumn(
                c, F.coalesce(F.col(c).cast("double"), F.lit(float(med)))
            )
        else:
            out = out.fillna({c: med})
    for c in mode_cols:
        mode_val = stats.get(f"mode_{c}")
        if mode_val is not None:
            out = out.fillna({c: mode_val})
        # all-null column: reference fallback 'Unknown' never fires because
        # the notna().any() guard (dp:100) skips the column entirely
    zero_cols = [c for c in ZERO_IMPUTE_COLUMNS if c in dtypes]
    if zero_cols:
        out = out.fillna(dict.fromkeys(zero_cols, 0))
    return out


def cap_outliers(df: DataFrame, approx: bool = False) -> DataFrame:
    """C4-C6 (dp:123-154): p99 caps + [1,6] clamp.

    C4's p99 is over ALL trip_distance values including the outliers
    (dp:132); C5's is over non-negative fares only (dp:142). Both are
    batch-scoped, computed here on the already-imputed+deduped frame.
    """
    dtypes = dict(df.dtypes)
    out = df
    if "trip_distance" in dtypes:
        p99 = df.agg(_percentile("trip_distance", 0.99, approx)).collect()[0][0]
        if p99 is not None:
            d = F.col("trip_distance")
            out = out.withColumn(
                "trip_distance",
                F.when((d <= 0) | (d > 100), F.lit(p99).cast(dtypes["trip_distance"]))
                .otherwise(d),
            )
    if "fare_amount" in dtypes:
        p99 = (
            df.filter(F.col("fare_amount") >= 0)
            .agg(_percentile("fare_amount", 0.99, approx))
            .collect()[0][0]
        )
        if p99 is not None:
            f_ = F.col("fare_amount")
            out = out.withColumn(
                "fare_amount",
                F.when((f_ < 0) | (f_ > 500), F.lit(p99).cast(dtypes["fare_amount"]))
                .otherwise(f_),
            )
    if "passenger_count" in dtypes:
        p = F.col("passenger_count")
        # explicit null guard: Spark least/greatest would swallow the null
        out = out.withColumn(
            "passenger_count",
            F.when(p.isNull(), p).otherwise(
                F.least(F.greatest(p, F.lit(1)), F.lit(6))
            ),
        )
    return out


def repair_consistency(df: DataFrame) -> DataFrame:
    """C7+C8 (dp:156-185): component-sum repair + time-travel repair."""
    out = df
    cols = set(df.columns)
    if set(TOTAL_COMPONENTS) | {"total_amount"} <= cols:
        component_sum = sum(F.col(c) for c in TOTAL_COMPONENTS)
        out = out.withColumn(
            "total_amount",
            F.when(
                F.abs(F.col("total_amount") - component_sum) > 0.1,
                component_sum.cast(dict(df.dtypes)["total_amount"]),
            ).otherwise(F.col("total_amount")),
        )
    if {"tpep_pickup_datetime", "tpep_dropoff_datetime"} <= cols:
        pickup, dropoff = F.col("tpep_pickup_datetime"), F.col("tpep_dropoff_datetime")
        out = out.withColumn(
            "tpep_dropoff_datetime",
            F.when(dropoff < pickup, pickup + F.expr("INTERVAL 5 MINUTES"))
            .otherwise(dropoff),
        )
    return out


def drop_invalid(df: DataFrame) -> DataFrame:
    """C10/P3 (dp:187-200): remove fundamentally invalid records."""
    return df.filter(
        (F.col("fare_amount") > 0)
        & (F.col("trip_distance") > 0)
        & F.col("tpep_pickup_datetime").isNotNull()
        & F.col("tpep_dropoff_datetime").isNotNull()
    )


def clean_trips(
    df: DataFrame,
    approx_stats: bool = False,
    intermediates: list[DataFrame] | None = None,
) -> DataFrame:
    """The full ordered suite (dp:73-210). ``approx_stats=True`` is the
    100 TB path: sketch-based percentiles, same plan shape otherwise.

    The imputed+deduped intermediate is cached because two independent
    stats jobs (C4, C5) and the final pass all consume it — the Spark
    analog of the reference's in-memory reuse (SURVEY §3.4). Pass an
    ``intermediates`` list to receive the cached frame and ``unpersist()``
    it once the returned plan has been materialized (pipeline.run_batch
    does); in a long-lived session un-released caches pile up until memory
    pressure evicts them.
    """
    imputed = impute_missing(df)
    deduped = imputed.dropDuplicates()  # C9 (dp:116-121)
    deduped.cache()
    if intermediates is not None:
        intermediates.append(deduped)
    capped = cap_outliers(deduped, approx=approx_stats)
    repaired = repair_consistency(capped)
    return drop_invalid(repaired)
