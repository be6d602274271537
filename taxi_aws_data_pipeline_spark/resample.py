"""Time-series resampling: re-index sparse per-key observations onto a
complete fixed-interval grid and fill the gaps (forward fill or linear
interpolation) — the operator every chart/model needs between event
streams and dense series. Catalog entries w8/w9 are the verified
instantiations over the events table.

Scale posture: the grid bounds ride a broadcast one-row aggregate, grid
rows are (key, bucket) pairs (never event-sized), and the fills are
O(1)-state IGNORE NULLS window passes over one (key, bucket) sort —
a single shuffle beyond the bucket aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_grid_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_agg,
    mode: str = "ffill",
) -> DataFrame:
    """Aggregate ``value_agg`` per (key, hour), re-index onto the complete
    hour grid spanning the observed min..max hour for ALL keys, and fill
    gaps.

    ``mode='ffill'``: forward fill (leading gaps stay NULL) — output
    (key, hour, observed, filled).
    ``mode='interpolate'``: linear interpolation on epoch-second
    fractions for interior gaps, NULL leading, hold-last trailing —
    output (key, hour, observed, interpolated).
    """
    if mode not in ("ffill", "interpolate"):
        raise ValueError(f"unknown mode: {mode!r}")
    hourly = (
        df.select(
            F.col(key_col).alias("__grid_k"),
            F.date_trunc("hour", ts_col).alias("__grid_h"),
            "*",
        )
        .groupBy("__grid_k", "__grid_h")
        .agg(value_agg.alias("observed"))
    )
    bounds = df.select(F.date_trunc("hour", ts_col).alias("__grid_h")).agg(
        F.min("__grid_h").alias("lo"), F.max("__grid_h").alias("hi")
    )
    grid = (
        df.select(F.col(key_col).alias("__grid_k"))
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "__grid_k",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("__grid_h"),
        )
    )
    j = grid.join(hourly, ["__grid_k", "__grid_h"], "left")
    back = (
        Window.partitionBy("__grid_k")
        .orderBy("__grid_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if mode == "ffill":
        return j.select(
            F.col("__grid_k").alias(key_col),
            F.col("__grid_h").alias("hour"),
            "observed",
            F.last("observed", ignorenulls=True).over(back).alias("filled"),
        )
    fwd = (
        Window.partitionBy("__grid_k")
        .orderBy("__grid_h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("observed").isNotNull(), F.col("__grid_h"))
    b = j.select(
        "__grid_k",
        "__grid_h",
        "observed",
        F.last("observed", ignorenulls=True).over(back).alias("v_prev"),
        F.first("observed", ignorenulls=True).over(fwd).alias("v_next"),
        F.last(obs_h, ignorenulls=True).over(back).alias("h_prev"),
        F.first(obs_h, ignorenulls=True).over(fwd).alias("h_next"),
    )
    frac = (
        (F.unix_timestamp("__grid_h") - F.unix_timestamp("h_prev")).cast("double")
        / (F.unix_timestamp("h_next") - F.unix_timestamp("h_prev"))
    )
    return b.select(
        F.col("__grid_k").alias(key_col),
        F.col("__grid_h").alias("hour"),
        "observed",
        F.when(F.col("observed").isNotNull(), F.col("observed"))
        .when(F.col("v_prev").isNull(), F.lit(None))
        .when(F.col("v_next").isNull(), F.col("v_prev"))
        .otherwise(
            F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * frac
        )
        .alias("interpolated"),
    )
