"""Catalog-wide physical-plan invariants, enforced inside the oracle
parity sweep (tests/test_oracle_parity.py) where every entry's plan is
built anyway.

The core rule at 100 TB: a nested-loop join is only survivable when one
side is provably BOUNDED (a 1-row scalar aggregate, a fixed probe set, a
generated time spine, a capped dimension). Spark compiles all of those
to ``BroadcastNestedLoopJoin`` — indistinguishable, in the plan string,
from a catastrophic data x data nested loop. Every catalog entry whose
plan contains a BNLJ must therefore appear below with its boundedness
class; a NEW entry that trips the guard either gets an equi-join fix or
earns its row here. ``CartesianProduct`` (both sides unbroadcastable)
is never sanctioned — if a cross join is intended, the bounded side
must be small enough to broadcast, or the formulation is wrong at
scale. This makes the round-6 verdict's manual crossJoin audit a
permanent, self-enforcing invariant.
"""

from __future__ import annotations

# entry -> boundedness class of the broadcast side
_SCALAR = "1-row scalar aggregate anchored via explicit crossJoin"
_PROBE = "fixed probe/query set (filtered id list or limit), broadcast"
_SPINE = "generated bounded spine (time grid / rank grid / tier dim)"

BNLJ_SANCTIONED: dict[str, str] = {
    # -- scalar anchors: global aggregate (count/sum/quantile) joined
    #    onto every row for shares, normalization, thresholds --
    **dict.fromkeys(
        (
            "j9_churned_rich_customers",
            "w12_ratio_to_report",
            "k5_join_cardinality_estimate",
            "x23_tfidf_top_terms",
            "x49_source_mix_rebalance",
            "x67_key_skew_report",
            "x70_mixture_token_budget_plan",
            "x76_source_token_divergence",
            "x79_temperature_mixture_sample",
            "x94_equidepth_histogram",
            "x107_time_to_convert",
            "x116_distribution_matched_sample",
            "x123_triangle_count",
            "x124_hour_of_week_seasonality",
            "x125_chi2_term_selection",
            "x130_negative_sampling",
            "x140_benford_first_digit_audit",
            "a15_ks_two_sample",
            "x149_quantile_mapping",
            "a16_theil_sen_slope",
            "a18_autocorrelation_lags",
            "x155_lorenz_curve_deciles",
            "x158_heavy_hitter_discovery",
            "x159_cuped_adjustment",
            "x160_lsh_recall_curve",
            "x161_difference_in_differences",
            "x170_aspect_bucket_resize_plan",
            "z7_join_order_cost_rank",
            "x175_rendezvous_sharding",
            "x180_modularity_score",
            "x182_pseudonym_collision_audit",
            "x187_discrete_hazard_table",
            "a25_mix_rate_decomposition",
            # a26 left this list in round 10: its arm pivot became one
            # global conditional aggregate, so the entry no longer
            # contains any crossJoin/BNLJ to sanction
            "x189_eb_smoothed_ranking",
            "x190_total_variation_drift",
            "x201_chi2_token_class",
            "x202_pmi_collocations",
            "x203_bm25_topk",
            "x204_token_budget_epochs",
            "x205_zipf_rank_frequency",
            "x206_heaps_vocab_growth",
            "x209_hll_distinct_sketch",
            "a28_winsorized_mean",
            "a29_kruskal_wallis_terms",
            "x214_prf_expansion_terms",
            "x215_bpe_second_merge",
            "x217_uplift_deciles",
            "k7_shuffle_skew_report",
            "x234_greedy_mixture_allocation",
            "z8_retention_expiry_plan",
            "x237_capture_recapture",
            "x238_good_turing_unseen",
            "x244_cluster_weighted_sample",
            "x248_ivf_cell_balance",
            "x249_dedup_savings_profile",
            # BNLJ appearance is SF-dependent (broadcast thresholds see
            # different stats per scale): a17's scalar attach surfaces
            # at sizes the sf0.001 sweep didn't, per test_plans' older
            # per-entry list — keep the union
            "a17_rfm_segmentation",
        ),
        _SCALAR,
    ),
    # -- fixed probe / query / truth sets: ANN and eval entries score a
    #    bounded probe list against the corpus (the x10/x183 shape) --
    **dict.fromkeys(
        (
            "x10_cosine_topk_bruteforce",
            "x38_pq_ann_topk",
            "x43_vocab_coverage",
            "x142_reciprocal_rank_fusion",
            "x162_ndcg_eval",
            "x163_mrr_recall_at_k",
            "x164_map_at_10",
            "x172_kendall_tau_rankings",
            "x183_colbert_maxsim_topk",
            "x185_matryoshka_funnel_topk",
            "x186_binary_hamming_topk",
            "x188_knn_label_eval",
            "x235_embedding_separation",
            "x246_ivf_nprobe_recall_sweep",
        ),
        _PROBE,
    ),
    # -- bounded generated spines / range dims joined by inequality --
    **dict.fromkeys(
        (
            "j3_range_join_value_tiers",
            "w8_time_grid_forward_fill",
            "w9_time_grid_interpolate",
        ),
        _SPINE,
    ),
}


def check_plan_invariants(name: str, plan: str) -> None:
    """Raise if `plan` (executedPlan string) violates a catalog-wide
    physical invariant. Called per entry from the parity sweep.

    Known blind spot (ADVICE r7): an entry that ``localCheckpoint``s
    eagerly at plan-construction time truncates lineage, so this check
    sees only the post-checkpoint plan — a cross join UPSTREAM of the
    checkpoint would be invisible. x180 now runs this check on its
    pre-checkpoint edge plan inline (ext_catalog.py, guarded so a
    deployed zip without tests/ skips it). The remaining checkpoint
    sites hold audited shapes: agg/explode edge builds (x84/x91 via
    ext/graph.py, x123/x131-family self-join anchors), 1-row scalar
    picks (x179-family), per-round iterative state (ext/dedup.py CC,
    ext/packing.py), and ANN codebooks (ext/similarity.py) — none joins
    two unbounded sides upstream. Any NEW localCheckpoint in a catalog
    entry must either run check_plan_invariants on the PRE-checkpoint
    plan inline (the x180 pattern) or extend this list with its audited
    upstream shape."""
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in the physical plan — neither side "
        f"broadcastable; a data x data cross join cannot survive scale"
    )
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_SANCTIONED:
        raise AssertionError(
            f"{name}: BroadcastNestedLoopJoin without a boundedness "
            f"argument — if the broadcast side is provably bounded "
            f"(scalar anchor / fixed probes / generated spine), add the "
            f"entry to tests/plan_invariants.py with its class; "
            f"otherwise reformulate as an equi-join"
        )
