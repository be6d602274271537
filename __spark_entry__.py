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
# round. Rounds 1-3 drove 127 of the 151 catalog entries green; this
# round's window leads with the 24 entries that have never been inside
# a driver verification window — the round-3 additions (a8, g5/g6
# [renamed from the colliding g3_pivot/g4_unpivot ids], j10-j12, k3/k4,
# w8/w9, x80-x90, z1) plus x35/x38, which this round moved from
# rows-only to full SQL-replay oracles (fixed-rounds Lloyd / PQ-ADC on
# the x83 pattern). The remaining 26 slots re-pin representative
# entries from every r1/r2-verified tier so driver evidence stays fresh
# against regressions rather than resting on the local replica alone.
#
# WINDOW SCHEDULE (documented per VERDICT r3 item 6): once round 4
# lands, every pre-r4 oracle-backed entry has a driver correctness row.
# Subsequent rounds keep the first ~24 slots on whatever is newest /
# changed and rotate the re-pin block through the tiers round-robin:
# r5 = the round-4 additions (a9-a20, d7, e15-e17, g7-g9, j13-j22,
# k5/k6, s8, w10-w21, x91-x164, z2-z5 — all local-green and green in
# this round's full-catalog fresh-process driver simulations; they
# overflow one 50-slot window, so r5 takes the first 50 by id and r6
# leads with the remainder) + as slots allow, a/c/d/e families
# + x1-x27 odds, r6 = j/w/g/k families + x28-x60 evens, r7 = s/p
# families + x61-x90, then repeat. Entries outside the window stay
# pinned every session by tests/test_oracle_parity.py +
# test_vanilla_session.py (the full-catalog local replica).
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
_REPINS = (
    "a1_returnflag_performance",
    "a2_hourly_demand",
    "a5_monthly_summary",
    "a6_scalar_statistics",
    "c1_median_impute_batch",
    "c4_p99_outlier_cap",
    "d1_exact_row_dedup",
    "d6_manifest_anti_join",
    "e2_rate_clip_div_zero",
    "e6_time_of_day_binning",
    "s1_parquet_scan_pruned",
    "p1_typed_cast_enforce",
    "j1_region_revenue_star_join",
    "j2_asof_join_prior_click",
    "j3_range_join_value_tiers",
    "j5_exists_semi_join",
    "w1_tumbling_hourly_value",
    "w2_user_sessionization",
    "w4_session_window_native",
    "g1_rollup_year_priority",
    "k1_salted_skew_agg",
    "x5_exact_dedup_groups",
    "x6_jaccard_near_dup_pairs",
    "x8_minhash_lsh_candidate_pairs",
    "x14_ivf_ann_topk",
    "x27_training_data_pipeline",
)
_PRIORITY = _NEVER_WINDOWED + _REPINS


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
