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
# round. Evidence ledger: rounds 1-4 drove 177 of the 387 catalog
# entries driver-green (CORRECTNESS_r01-r04); 210 entries remain
# never-windowed. VERDICT r4 item 1 freezes catalog growth and spends
# every window slot on draining that backlog; regression freshness for
# already-verified entries is carried by tests/test_oracle_parity.py +
# test_vanilla_session.py, which run the IDENTICAL DuckDB compare over
# the FULL catalog every session.
#
# WINDOW SCHEDULE (actual rounds, per VERDICT r4 item 4):
#   round 5 (this file): s9_streaming_hourly_replay pulled forward
#     (VERDICT r4 item 7 — the only driver-verifiable streaming row,
#     anchors SURVEY §2.9) + the next 49 never-windowed entries in
#     catalog registration order (a14, x91-x138).
#   rounds 6-8: continue draining 50/round in registration order
#     (round 6 ≈ w15-w17, j22, x139-x183-ish; round 7/8 the session-3
#     tail a15-a30, e18/e19, j23-j25, k6/k7, s10/s11, w18-w29,
#     x184-x235, z2-z8). Backlog 210 → empty mid-round 9.
#   round 9+: windows rotate RE-PINS through the verified tiers,
#     least-recently-green first, so driver evidence for the parity
#     core stays fresh.
#   Staging is mechanical: `python tools/next_window.py` computes the
#   next window from the committed CORRECTNESS records (red rows retry
#   first, then never-windowed in registration order, then re-pins);
#   tests/test_audit.py pins both the tool's contract and this file's
#   window discipline.
_ROUND5_WINDOW = (
    "s9_streaming_hourly_replay",
    "a14_spearman_rank_correlation",
    "x91_label_propagation_communities",
    "x92_power_iteration_top_pc",
    "x93_simhash_hamming_pairs",
    "x94_equidepth_histogram",
    "x95_interarrival_profile",
    "x96_stratified_holdout_split",
    "x97_topic_lexicon_tagging",
    "x98_containment_pairs",
    "x99_token_span_merge",
    "x100_orc_source_roundtrip",
    "x101_corrupt_record_quarantine",
    "x102_top_event_paths",
    "x103_quantile_drift_monitor",
    "x104_mann_kendall_trend",
    "x105_bitmap_distinct_rollup",
    "x106_hll_sketch_merge",
    "x107_time_to_convert",
    "x108_corpus_snapshot_diff",
    "x109_hourly_anomaly_zscores",
    "x110_contingency_residuals",
    "x111_bootstrap_se_deterministic",
    "x112_partition_pruned_read",
    "x113_url_parsing",
    "x114_boilerplate_line_report",
    "x115_robust_scaling",
    "x116_distribution_matched_sample",
    "x117_time_decayed_user_value",
    "x118_mergeschema_evolution_read",
    "x119_incremental_refresh_pipeline",
    "x120_event_cooccurrence_lift",
    "x121_bucketed_colocated_join",
    "x122_cdc_apply_changes",
    "x123_triangle_count",
    "x124_hour_of_week_seasonality",
    "x125_chi2_term_selection",
    "x126_length_gini_by_source",
    "x127_clamped_running_balance",
    "x128_last_touch_attribution",
    "x129_cluster_canonical_fingerprint",
    "x130_negative_sampling",
    "x131_simpson_diversity",
    "x132_quantile_transform",
    "x133_inverted_index",
    "x134_vocab_growth",
    "x135_k_anonymity_audit",
    "x136_int8_scalar_quantization",
    "x137_count_min_sketch",
    "x138_bfs_hops_fixed_rounds",
)
_PRIORITY = _ROUND5_WINDOW


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
