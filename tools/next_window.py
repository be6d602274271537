"""Compute the next round's 50-entry driver window.

The driver records verdicts for the FIRST 50 registered entries each
round (`__spark_entry__._PRIORITY`). Since round 6, `__spark_entry__`
calls :func:`next_window` AT IMPORT TIME, so the window can never go
stale between rounds (VERDICT r5 item 1 — the r5→r6 gap left a stale
hand-pasted window and a red audit test). This module stays importable
without Spark: it reads only the committed CORRECTNESS records and the
catalog registry.

Ordering contract (pinned by tests/test_audit.py):

* An entry's LATEST committed verdict is authoritative (ADVICE r5,
  medium): if the most recent CORRECTNESS row for an entry is red, the
  entry re-enters the drain backlog and retries FIRST — a green row in
  some earlier round does not mark a regressed entry verified forever.
* While unverified entries remain, the window drains them: regressed
  reds first, then PULL_FORWARD entries (never-windowed entries a
  verdict ordered ahead of schedule), then never-windowed entries in
  catalog registration order.
* Once the backlog is empty, the window re-pins the 50 least-recently
  verified entries (earliest latest-green round first, registration
  order as the tie-break) so driver evidence for the parity core stays
  fresh.

Usage: python tools/next_window.py  (prints the computed window; purely
informational now that __spark_entry__ derives _PRIORITY itself).
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from taxi_aws_data_pipeline_spark.plans import CATALOG  # noqa: E402

# Never-windowed entries pulled ahead of registration order, newest
# verdict first. VERDICT r5 item 2: s10/s11 are the remaining
# driver-verifiable streaming rows anchoring SURVEY §2.9 — same
# argument that pulled s9 forward in round 5. Entries drop out of this
# list's effect automatically once they hold a driver row.
PULL_FORWARD: tuple[str, ...] = (
    "s10_streaming_stream_join_replay",
    "s11_streaming_dedup_replay",
)

# Fix-touched entries whose latest driver GREEN predates a plan/sink
# change (VERDICT r8 item 2): their evidence is stale even though the
# latest row is green, so the re-pin fill takes them FIRST (registration
# order among themselves). Each maps to the first round whose green row
# makes the evidence current again; an entry drops out automatically
# once it holds a green at or after that round. The r8-fix cohort
# (x82/x178/x180/x234 -> 9) re-pinned green in round 9 and has expired
# out of effect.
# (History: the r8 cohort — x82/x178/x180/x234 — re-pinned green in r9;
# the r10 cohort — a15/a17/a19/a26/a30/k2/x65/x103/x104/x206/x246 —
# re-pinned green in r10. Both have expired out of effect and are
# dropped from the dict; an expired entry is a no-op by construction.)
#
# Round-11 cohort: the NULL-payload parity wave (VERDICT r10 item 1).
# Every entry below had its PLAN and/or ORACLE text changed closing the
# 35 NULL-convention divergences (engine-wide vector-NULL exclusion in
# ext/similarity.py, NULL-preserving shingles/signals in ext/dedup.py +
# ext/text.py, explicit IS-NOT-NULL oracle twins, k4's min-support
# accuracy gate, k2's empty-gated vacuity). Non-degenerate values are
# identical by construction (zero NULL payloads at graded SFs; full
# sf0.01 parity re-verified), but the evidence each green attested to
# changed, so all 55 re-pin. The set was computed MECHANICALLY: both
# trees' per-entry analyzed-plan + oracle md5s were dumped and diffed
# (s9/s10/s11 excluded as replay-temp-path plan-hash noise — their
# sources are untouched this round). 50 fit the r11 window; the last 5
# by registration order carry to r12 automatically.
_R11_NULL_WAVE: tuple[str, ...] = (
        "k2_approx_sketches",
        "k4_grouped_approx_percentiles",
        "x1_lang_id_stopword_vote",
        "x2_text_quality_signals",
        "x3_token_counts",
        "x6_jaccard_near_dup_pairs",
        "x7_minhash_signatures",
        "x8_minhash_lsh_candidate_pairs",
        "x10_cosine_topk_bruteforce",
        "x11_lsh_ann_topk",
        "x12_embedding_near_dup_pairs",
        "x13_rolling_hash_fingerprint",
        "x14_ivf_ann_topk",
        "x15_minhash_jaccard_estimate",
        "x18_near_dup_clusters",
        "x19_repetition_signals",
        "x25_ngram_decontamination_fuzzy",
        "x27_training_data_pipeline",
        "x31_corpus_language_stats",
        "x32_semantic_dedup",
        "x33_cross_corpus_dedup",
        "x47_hybrid_near_dup_pairs",
        "x48_quality_weighted_sample",
        "x50_benchmark_leak_report",
        "x52_leakage_safe_split",
        "x53_dedup_with_weights",
        "x54_ngram_novelty",
        "x60_knn_graph",
        "x61_exact_quantiles_by_rank",
        "x64_language_label_audit",
        "x65_lsh_recall_report",
        "x66_filter_cascade_report",
        "x70_mixture_token_budget_plan",
        "x73_cross_source_syndication_matrix",
        "x75_quality_dup_calibration",
        "x77_keep_best_dedup_policy",
        "x80_incremental_dedup_precomputed",
        "x85_prefix_filtered_jaccard",
        "x98_containment_pairs",
        "x119_incremental_refresh_pipeline",
        "x136_int8_scalar_quantization",
        "x142_reciprocal_rank_fusion",
        "x160_lsh_recall_curve",
        "x162_ndcg_eval",
        "x163_mrr_recall_at_k",
        "x164_map_at_10",
        "x172_kendall_tau_rankings",
        "x179_greedy_coverage_picks",
        "x181_weighted_jaccard_pairs",
        "x183_colbert_maxsim_topk",
        "x185_matryoshka_funnel_topk",
        "x188_knn_label_eval",
        "x220_hard_negative_mining",
        "x246_ivf_nprobe_recall_sweep",
        "x248_ivf_cell_balance",
)

# Round-11 second cohort: the NaN/non-finite payload wave (VERDICT
# r10 staged package, pulled into r11). Computed MECHANICALLY with
# tools/catalog_state_dump.py (lambda-counter normalization added —
# the naive diff read 161 entries, ~half session-global `lambda
# x_NNN` counter shifts): 87 entries whose plan and/or oracle hash
# changed (the compat.exact_sum/money central screens fan out to
# every money-family consumer), plus s9 (its oracle text changed;
# its plan hash is replay-temp-path noise and stays excluded from
# the mechanical diff). sf0.01 values identical by construction
# (zero non-finite payloads at graded SFs; full suite green), but
# the evidence each green attested to changed, so all re-pin at 11
# and drain across the r11-r13 windows.
_R11_NAN_WAVE: tuple[str, ...] = (
        "a10_retractable_rollup",
        "a12_ols_trend_per_group",
        "a1_returnflag_performance",
        "a20_cohens_d_effect_size",
        "a21_mann_whitney_u",
        "a22_welch_t_test",
        "a23_experiment_health_report",
        "a24_covariate_balance_smd",
        "a25_mix_rate_decomposition",
        "a26_quantile_treatment_effects",
        "a27_minimum_detectable_effect",
        "a28_winsorized_mean",
        "a29_kruskal_wallis_terms",
        "a2_hourly_demand",
        "a30_delta_method_ratio_se",
        "a31_skewness_kurtosis",
        "a3_supplier_analysis",
        "a4_priority_analysis",
        "a5_monthly_summary",
        "a9_mergeable_rollup_maintenance",
        "g1_rollup_year_priority",
        "g2_cube_flag_status",
        "g3_grouping_sets_explicit",
        "g5_pivot_daily_event_values",
        "j10_small_quantity_revenue",
        "j11_large_volume_orders",
        "j12_interval_overlap_join",
        "j13_bi_national_volume",
        "j14_disjunctive_pred_join",
        "j17_top_supplier_by_revenue",
        "j19_interval_concurrency",
        "j1_region_revenue_star_join",
        "j22_pareto_frontier",
        "j6_small_quantity_revenue",
        "j9_churned_rich_customers",
        "k1_salted_skew_agg",
        "k3_salted_skew_join",
        "w12_ratio_to_report",
        "w15_ewma_daily_value",
        "w17_max_drawdown",
        "w19_holt_double_exponential",
        "w1_tumbling_hourly_value",
        "w20_forecast_backtest",
        "w21_rolling_median",
        "w22_rolling_band_outliers",
        "w23_time_weighted_average",
        "w24_cusum_alarm_walk",
        "w25_seasonal_naive_mase",
        "w26_daily_ohlc",
        "w27_haar_pyramid",
        "w28_stl_lite_decomposition",
        "w29_theil_sen_slope",
        "w5_moving_avg_lag_delta",
        "w6_sliding_window_halfhour",
        "w8_time_grid_forward_fill",
        "w9_time_grid_interpolate",
        "x104_mann_kendall_trend",
        "x117_time_decayed_user_value",
        "x127_clamped_running_balance",
        "x128_last_touch_attribution",
        "x135_k_anonymity_audit",
        "x136_int8_scalar_quantization",
        "x140_benford_first_digit_audit",
        "x143_coordinated_key_sample",
        "x146_k_anonymity_generalization",
        "x159_cuped_adjustment",
        "x161_difference_in_differences",
        "x165_cusum_changepoint",
        "x167_l_diversity_audit",
        "x168_mad_outlier_flags",
        "x169_sax_rank_symbolization",
        "x174_temporal_split_audit",
        "x182_pseudonym_collision_audit",
        "x191_churn_label_builder",
        "x195_cohort_ltv_curve",
        "x217_uplift_deciles",
        "x219_int8_quantization_error",
        "x21_embedding_label_centroids",
        "x227_margin_uncertainty_sampling",
        "x235_embedding_separation",
        "x236_conformal_interval",
        "x35_kmeans_cells",
        "x38_pq_ann_topk",
        "x46_random_projection",
        "x83_kmeans_fixed_rounds",
        "x92_power_iteration_top_pc",
        "x94_equidepth_histogram",
        "s9_streaming_hourly_replay",
)

REPIN_FIRST: dict[str, int] = {
    name: 11 for name in _R11_NULL_WAVE + _R11_NAN_WAVE
}


def _is_green(v: dict) -> bool:
    return bool(
        v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match")
        and not v.get("err")
    )


_RECORD_STEM = re.compile(r"^CORRECTNESS_r(\d+)$")


def _load_records(root: pathlib.Path = ROOT) -> dict[int, dict]:
    """Read every on-disk CORRECTNESS record the window derives from.

    This runs at import time of ``__spark_entry__`` (the driver entry),
    so it must never raise on a stray or damaged file (ADVICE r6,
    medium): a name that isn't exactly ``CORRECTNESS_r<digits>.json``
    (e.g. a ``_backup`` copy) is ignored, and a truncated/non-dict JSON
    body is skipped with a stderr warning — losing one round's rows
    only re-drains those entries, which is safe; an ImportError would
    fail the whole round.

    Working-tree semantics are intentional: the driver writes the
    round's record to disk before committing it, and reading the
    on-disk file is what lets the window advance for the NEXT round the
    moment the record lands. Within one builder session the set of
    record files never changes, so the window is stable per round.
    """
    records: dict[int, dict] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _RECORD_STEM.match(f.stem)
        if not m:
            continue
        try:
            body = json.loads(f.read_text())
        except (OSError, ValueError) as exc:
            print(
                f"next_window: skipping unreadable record {f.name}: {exc}",
                file=sys.stderr,
            )
            continue
        if not isinstance(body, dict):
            print(
                f"next_window: skipping non-dict record {f.name}",
                file=sys.stderr,
            )
            continue
        records[int(m.group(1))] = body
    return records


def next_window(
    n: int = 50,
    records: dict[int, dict] | None = None,
    pull_forward: tuple[str, ...] = PULL_FORWARD,
    repin_first: dict[str, int] | None = None,
) -> tuple[list[str], str]:
    """Return (window, mode) where mode is 'drain' or 'repin'.

    ``records`` (round -> CORRECTNESS dict) defaults to the committed
    CORRECTNESS_r*.json files; injectable for tests (an explicitly
    passed empty dict means "no records", not "load from disk").
    ``repin_first`` (entry -> first evidence-current round) defaults to
    REPIN_FIRST; pass {} to disable stale-evidence promotion."""
    records = records if records is not None else _load_records()
    latest: dict[str, tuple[int, bool]] = {}  # entry -> (round, green?)
    last_green: dict[str, int] = {}  # entry -> latest round with a GREEN row
    for rnd, rec in sorted(records.items()):
        for name, verdict in rec.items():
            if name not in CATALOG:
                continue
            green = _is_green(verdict)
            latest[name] = (rnd, green)
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    order = {name: i for i, name in enumerate(CATALOG)}
    # latest verdict authoritative: most-recent-row-red entries are
    # regressions and retry ahead of everything (r1->r2 precedent)
    red = sorted(
        (nm for nm, (_, green) in latest.items() if not green),
        key=order.__getitem__,
    )
    never = [nm for nm in CATALOG if nm not in latest]
    pulled = [nm for nm in pull_forward if nm in never]
    rest = [nm for nm in never if nm not in set(pulled)]
    backlog = red + pulled + rest
    # re-pin pool: entries whose LATEST row is green, least recent first;
    # stale-evidence entries (green predates a plan/sink fix) jump the
    # queue so fix-touched plans regain driver currency in one round
    repin_first = REPIN_FIRST if repin_first is None else repin_first
    verified = [nm for nm, (_, green) in latest.items() if green]
    repins = sorted(verified, key=lambda x: (last_green[x], order[x]))
    verified_set = set(verified)  # latest-row-green only: a regressed
    # entry already retries via the red backlog, never via re-pin
    stale = sorted(
        (
            nm
            for nm in repin_first
            if nm in verified_set and last_green[nm] < repin_first[nm]
        ),
        key=order.__getitem__,
    )
    repins = stale + [nm for nm in repins if nm not in set(stale)]
    if backlog:
        window = backlog[:n]
        if len(window) < n:  # backlog tail + oldest re-pins fill the rest
            window += repins[: n - len(window)]
        return window, "drain"
    return repins[:n], "repin"


if __name__ == "__main__":
    window, mode = next_window()
    print(f"# mode: {mode} ({len(window)} entries)")
    for name in window:
        print(f'    "{name}",')
