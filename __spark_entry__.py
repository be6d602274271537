"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``taxi_aws_data_pipeline_spark`` (see SURVEY.md
§7.0 layout); this module only adapts the plans/catalog registry to the
driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from taxi_aws_data_pipeline_spark.plans import CATALOG  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "a1_returnflag_performance"

# The harness records verdicts for the FIRST 50 registered entries each
# round. Rounds 1-3 drove 127 catalog entries green; round 4 grew the
# catalog to 300+, so every window slot now goes to evidence
# conversion: the 24 entries VERDICT r3 item 1 staged (the round-3
# additions a8, g5/g6 [renamed from the colliding g3_pivot/g4_unpivot
# ids], j10-j12, k3/k4, w8/w9, x80-x90, z1, plus x35/x38 — moved this
# round from rows-only to full SQL-replay oracles on the x83
# fixed-rounds pattern), followed by the first 26 round-4 additions in
# catalog registration order. VERDICT r3 item 6 asked for re-pin slots
# once the backlog was converted; with ~170 entries still awaiting
# their first driver row, re-pins are deferred — regression freshness
# for already-verified entries is carried by tests/test_oracle_parity.py
# + test_vanilla_session.py, which run the IDENTICAL DuckDB compare
# over the FULL catalog every session.
#
# WINDOW SCHEDULE: subsequent rounds continue draining the
# never-windowed backlog 50 per round in catalog registration order
# (session 3 extended the catalog through a28-a30, e19, j25, k7,
# s9-s11, w25-w29, x198-x235, z8 — all local-parity-green, all
# joining the backlog); once the backlog is empty, windows rotate
# re-pins through the tiers round-robin (a/c/d/e + x1-x27, then
# j/w/g/k + x28-x60, then s/p + x61-x90, repeat).
_NEVER_WINDOWED = (
    "a8_measure_correlations",
    "g5_pivot_daily_event_values",
    "g6_unpivot_lineitem_measures",
    "j10_small_quantity_revenue",
    "j11_large_volume_orders",
    "j12_interval_overlap_join",
    "k3_salted_skew_join",
    "k4_grouped_approx_percentiles",
    "w8_time_grid_forward_fill",
    "w9_time_grid_interpolate",
    "x80_incremental_dedup_precomputed",
    "x81_media_header_probe",
    "x82_training_shard_layout",
    "x83_kmeans_fixed_rounds",
    "x84_supplier_pagerank",
    "x85_prefix_filtered_jaccard",
    "x86_scd2_dimension_merge",
    "x87_global_row_number",
    "x88_json_source_roundtrip",
    "x89_csv_source_roundtrip",
    "x90_bigram_lm_fluency",
    "z1_zorder_locality_report",
    "x35_kmeans_cells",
    "x38_pq_ann_topk",
)
# First 26 round-4 additions in catalog registration order (see the
# window-schedule note above).
_ROUND4_BATCH = (
    "j13_bi_national_volume",
    "w10_percent_rank_cume_dist",
    "a9_mergeable_rollup_maintenance",
    "g7_grouped_mode",
    "j14_disjunctive_pred_join",
    "j15_null_tolerant_anti_join",
    "w11_range_frame_rolling_count",
    "e15_json_props_parse",
    "j16_recursive_cte_ancestry",
    "d7_intersect_except_all",
    "g8_two_phase_dynamic_pivot",
    "e16_map_column_ops",
    "j17_top_supplier_by_revenue",
    "w12_ratio_to_report",
    "a10_retractable_rollup",
    "w13_dynamic_gap_sessions",
    "a11_weighted_median",
    "j18_lateral_topn",
    "e17_calendar_dimension",
    "a12_ols_trend_per_group",
    "j19_interval_concurrency",
    "j20_asof_tolerance_bidi",
    "k5_join_cardinality_estimate",
    "j21_part_supplier_variety",
    "w14_active_day_streaks",
    "a13_trimmed_mean",
)
_PRIORITY = _NEVER_WINDOWED + _ROUND4_BATCH


def _ordered() -> dict[str, object]:
    assert len(set(_PRIORITY)) == len(_PRIORITY)
    missing = [n for n in _PRIORITY if n not in CATALOG]
    assert not missing, f"priority entries absent from CATALOG: {missing}"
    rest = [n for n in CATALOG if n not in set(_PRIORITY)]
    return {n: CATALOG[n] for n in (*_PRIORITY, *rest)}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG[_FLAGSHIP].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }
