"""Slowly-changing-dimension maintenance (warehouse tier).

The reference pipeline rewrites its outputs wholesale per run; a
dimension table that must retain HISTORY instead takes the classic
SCD Type-2 merge: an incoming snapshot closes the current version of
every changed key (valid_to = effective date) and opens a new current
version, while unchanged keys and already-closed history pass through
untouched. This is the canonical warehouse MERGE expressed as pure
DataFrame algebra — join + union of typed branches — so it runs on any
Spark sink (no table-format MERGE INTO required; on Delta/Iceberg the
same frame feeds MERGE directly).

Scale posture: one equi-join of the update batch against the CURRENT
slice on the dimension key (broadcast when the batch is small — the
common case: daily changes << dimension size), and the three output
branches reuse that join — no second shuffle. Change detection is
null-safe column comparison, so NULL -> value and value -> NULL both
count as changes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: tuple[str, ...],
    effective_date: str,
) -> DataFrame:
    """Apply an update snapshot to an SCD-2 dimension.

    ``current`` carries (key, attrs..., valid_from, valid_to,
    is_current); ``updates`` carries (key, attrs...). Updates whose
    attributes null-safe-equal the current version are no-ops (no new
    version row); updates whose key is ABSENT from the dimension are
    inserts (a brand-new current version opens at ``effective_date`` —
    the MERGE ... WHEN NOT MATCHED THEN INSERT branch). Returns the
    merged dimension with the same schema as ``current``;
    ``valid_from``/``valid_to`` are ISO date strings (the
    engine-portable rendering; cast at a typed sink if desired).
    """
    cur = current.filter(F.col("is_current"))
    hist = current.filter(~F.col("is_current"))
    differs = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"u.{c}").eqNullSafe(F.col(f"c.{c}"))
            for c in attr_cols
        ],
    )
    changed = (
        updates.alias("u")
        .join(cur.alias("c"), F.col(f"u.{key_col}") == F.col(f"c.{key_col}"))
        .filter(differs)
        .select("u.*")
    )
    changed_keys = changed.select(key_col)
    closed = (
        cur.join(changed_keys, key_col, "left_semi")
        .withColumn("valid_to", F.lit(effective_date))
        .withColumn("is_current", F.lit(False))
    )
    untouched = cur.join(changed_keys, key_col, "left_anti")
    def _open(df: DataFrame) -> DataFrame:
        return df.select(
            key_col,
            *attr_cols,
            F.lit(effective_date).alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    opened = _open(changed)
    # WHEN NOT MATCHED THEN INSERT: keys the dimension has never seen
    # open a first current version (same anti-join side as `untouched`,
    # so the branch reuses the broadcast of the update batch)
    inserted = _open(updates.join(cur.select(key_col), key_col, "left_anti"))
    cols = [key_col, *attr_cols, "valid_from", "valid_to", "is_current"]
    return (
        hist.select(cols)
        .unionByName(untouched.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(opened.select(cols))
        .unionByName(inserted.select(cols))
    )


def scd2_initial(
    dim: DataFrame, key_col: str, attr_cols: tuple[str, ...], load_date: str
) -> DataFrame:
    """Bootstrap an SCD-2 dimension from a plain snapshot: every row is
    the current version effective from ``load_date``."""
    return dim.select(
        key_col,
        *attr_cols,
        F.lit(load_date).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
