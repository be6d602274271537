"""Physical-plan shape guards: the scale posture (predicate pushdown,
column pruning, broadcast joins, partial aggregation) is asserted, not
assumed, so a conf or query regression fails CI rather than silently
costing a shuffle at 100 TB."""

from __future__ import annotations

import pytest

from taxi_aws_data_pipeline_spark.plans import CATALOG


def _plan(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = CATALOG[name].spark(spark, sf_dir)
    return spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_s1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "s1_parquet_scan_pruned")
    assert "GreaterThanOrEqual(l_quantity,45.0)" in plan  # filter reached the scan
    # projection pruned to exactly the three selected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_j1_star_join_all_broadcast(spark, sf_dir):
    # "simple" mode prints each node once ("formatted" repeats them in
    # the detail section, which breaks counting)
    plan = _plan(spark, sf_dir, "j1_region_revenue_star_join", "simple")
    assert plan.count("BroadcastHashJoin") == 3  # every dim broadcast
    assert "SortMergeJoin" not in plan  # fact side never shuffles for a join
    assert "HashAggregate" in plan  # partial+final agg


def test_d6_anti_join_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "d6_manifest_anti_join")
    assert "BroadcastHashJoin LeftAnti" in plan


def test_a1_single_shuffle_partial_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "a1_returnflag_performance", "simple")
    # exact medians force ObjectHashAggregate; still partial → one
    # exchange → final, nothing more
    assert plan.count("Exchange") == 1


@pytest.mark.parametrize(
    "name",
    ["x5_exact_dedup_groups", "x7_minhash_signatures", "x9_simhash_signatures"],
)
def test_text_ops_are_projection_plus_single_agg(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name, "simple")
    # signature/fingerprint computation must stay a projection: at most
    # the one dedup-group shuffle, never a join or extra exchange
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan


def test_x6_cap_is_anti_join_scores_from_arrays(spark, sf_dir):
    # the doc-frequency cap must be an ANTI join against the (few) frequent
    # shingles — never an inner join against the (huge) rare set — and the
    # Jaccard must come from array_intersect over the full shingle arrays,
    # so the cap can only prune candidates, never change scores
    plan = _plan(spark, sf_dir, "x6_jaccard_near_dup_pairs", "simple")
    assert "LeftAnti" in plan
    assert "array_intersect" in plan


def test_j2_asof_join_single_shuffle_no_join(spark, sf_dir):
    # the union-sort as-of formulation must stay join-free: one exchange
    # on user_id feeds both window fills, nothing rejoins the fact side
    plan = _plan(spark, sf_dir, "j2_asof_join_prior_click", "simple")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_j3_range_join_broadcast_no_fact_shuffle(spark, sf_dir):
    # the interval dim must broadcast (nested-loop, range predicate
    # stream-side); the only exchanges are for the distinct aggregate,
    # never a sort-merge of the fact side
    plan = _plan(spark, sf_dir, "j3_range_join_value_tiers", "simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_g2_cube_single_shuffle(spark, sf_dir):
    # grouping-set expansion happens map-side before one partial→final agg
    plan = _plan(spark, sf_dir, "g2_cube_flag_status", "simple")
    assert plan.count("Exchange") == 1
    assert "Expand" in plan


def test_k2_sketch_accuracy_vs_exact(spark, sf_dir):
    # the approx tier must stay within its advertised error of the exact
    # statistics it replaces at scale (rsd=2% HLL; 1/10k-accuracy t-digest)
    from taxi_aws_data_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    # k2 now emits the exact statistics plus in-bounds booleans (so the
    # driver has exact values to hash); the booleans ARE the accuracy
    # contract — recompute the exact side independently to pin both.
    row = CATALOG["k2_approx_sketches"].spark(spark, sf_dir).first()
    assert row["hll_within_5pct"] is True
    assert row["p50_within_1pct"] is True
    assert row["p99_within_1pct"] is True
    exact = li.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.99))").alias("pcts"),
    ).first()
    assert row["exact_parts"] == exact["parts"]
    assert row["exact_price_p50"] == exact["pcts"][0]
    assert row["exact_price_p99"] == exact["pcts"][1]


def test_x17_decontamination_broadcast_anti(spark, sf_dir):
    # the corpus side must never shuffle: benchmark fingerprints broadcast,
    # anti-join probes them partition-locally
    plan = _plan(spark, sf_dir, "x17_decontaminate_anti_join", "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_j4_partial_agg_below_outer_join(spark, sf_dir):
    # orders must aggregate to (custkey, count) BEFORE the outer join so
    # only one row per customer crosses the wire
    plan = _plan(spark, sf_dir, "j4_customer_order_distribution", "simple")
    assert "LeftOuter" in plan, plan
    # an aggregate sits BELOW the join (textually after it in tree order):
    # the orders side was reduced to (custkey, count) pre-join — compact
    # enough that Spark then broadcasts it
    assert plan.rindex("HashAggregate") > plan.index("LeftOuter"), plan


def test_j5_semi_join_no_duplication(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j5_exists_semi_join", "simple")
    assert "LeftSemi" in plan


def test_a7_broadcast_dim_distinct_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "a7_distinct_suppliers_per_part", "simple")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # two-phase distinct: partial dedup before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_x19_repetition_is_pure_projection(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x19_repetition_signals", "simple")
    assert "Exchange" not in plan and "Join" not in plan


def test_quality_gate_projections_no_shuffle(spark, sf_dir):
    # the Gopher gate, lexical diversity, and top-n-gram repetition are
    # all single-scan projections: no Exchange, no Join anywhere
    for name in (
        "x28_gopher_quality_rules",
        "x29_lexical_diversity",
        "x30_top_ngram_repetition",
    ):
        plan = _plan(spark, sf_dir, name, "simple")
        assert "Exchange" not in plan and "Join" not in plan, name


def test_x25_benchmark_grams_broadcast(spark, sf_dir):
    # the benchmark gram set must broadcast; the corpus side probes it
    # partition-locally — only gram hits reach the per-doc count shuffle
    plan = _plan(spark, sf_dir, "x25_ngram_decontamination_fuzzy", "simple")
    assert "BroadcastHashJoin" in plan


def test_x31_prunes_doc_id_and_partial_aggregates(spark, sf_dir):
    # the language-stats report needs only (text, source): doc_id must be
    # pruned at the scan, and the agg must be two-phase (partial before
    # the language-key exchange)
    plan = _plan(spark, sf_dir, "x31_corpus_language_stats", "formatted")
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" in read and "source" in read and "doc_id" not in read
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_x34_top_pairs_single_agg_shuffle(spark, sf_dir):
    # corpus-wide pair counting: one partial-aggregated shuffle on the
    # pair key, a TakeOrdered cut, no join anywhere
    plan = _plan(spark, sf_dir, "x34_bpe_pair_counts", "formatted")
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" in read and "doc_id" not in read
    assert "TakeOrdered" in plan
    assert "Join" not in plan


def test_x37_indoc_dup_ngram_is_pure_projection(spark, sf_dir):
    # within-doc repetition never needs cross-row context: no Exchange,
    # no Join — one codegen'd scan at any corpus size
    plan = _plan(spark, sf_dir, "x37_indoc_dup_ngram_fraction", "simple")
    assert "Exchange" not in plan and "Join" not in plan


def test_x36_dup_coverage_shuffles_hashes_not_text(spark, sf_dir):
    # the corpus-wide duplicate decision must move md5 keys, not grams:
    # the occurrence count is partial-aggregated (HashAggregate above and
    # below its exchange) and no shuffle carries the text column
    plan = _plan(spark, sf_dir, "x36_dup_ngram_coverage", "formatted")
    assert plan.count("HashAggregate") >= 2
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_x40_chunking_is_pure_projection(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x40_chunk_documents", "simple")
    # chunking must never shuffle: filter -> project/generate only
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_x39_normalization_is_pure_projection(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x39_text_normalization", "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_x41_packing_one_window_one_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x41_pack_bin_stats", "simple")
    # one shuffle for the per-source window; the groupBy re-uses the
    # same (source) partitioning only if keys align — bin_id widens the
    # key, so allow the agg exchange but nothing beyond
    assert plan.count("Window") == 1
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_x42_length_band_single_window_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x42_length_band_filter", "simple")
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1
    # n_chars/lang/doc_id only — text column must be pruned at the scan
    full = _plan(spark, sf_dir, "x42_length_band_filter")
    read_schema = [l for l in full.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema


def test_x44_minmax_single_window_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x44_length_minmax_scaled", "simple")
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1
    full = _plan(spark, sf_dir, "x44_length_minmax_scaled")
    read_schema = [l for l in full.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema  # stats only — text pruned at scan


def test_x45_histogram_partial_aggregates(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x45_token_count_histogram", "simple")
    # partial + final HashAggregate around one tiny-key exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_x46_projection_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x46_random_projection", "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_x49_rate_table_broadcast_no_corpus_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x49_source_mix_rebalance", "simple")
    # corpus side joins the tiny rate table by broadcast; the only
    # exchanges aggregate per-source counts (tiny key space)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_x48_sample_is_pure_projection(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x48_quality_weighted_sample", "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_x60_knn_graph_equi_join_on_bucket(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x60_knn_graph", "simple")
    # the self-join must be an EQUI-join on the bucket key (hash or
    # sort-merge as the planner sizes it — broadcast is correct at test
    # scale, SMJ at corpus scale), never a cartesian/nested-loop
    # fallback, which would mean the bucket equality fell out of the
    # join condition
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_k3_salted_join_shuffles_on_widened_key(spark, sf_dir):
    # the salted pattern must actually exercise a shuffled join (the
    # hint defeats Catalyst's broadcast of the small test dimension) and
    # join on the (key, salt) pair so a hot key spreads across reducers
    plan = _plan(spark, sf_dir, "k3_salted_skew_join", "simple")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "salt" in plan


def test_x85_prefix_filter_plan_shape(spark, sf_dir):
    # candidate generation must run over the window-ranked prefix frame
    # (df-rank sort per doc), not the raw exploded shingles: the Window
    # node and the row_number filter are what bound the self-join
    plan = _plan(spark, sf_dir, "x85_prefix_filtered_jaccard", "simple")
    assert "Window" in plan
    assert "row_number" in plan


def test_x87_numbering_has_no_single_partition_exchange(spark, sf_dir):
    # the whole point of the two-phase numbering: the naive global
    # row_number funnels everything through Exchange SinglePartition;
    # the distributed form must never contain one (checkpoint=False
    # exposes the raw plan — the catalog entry checkpoints the result)
    from taxi_aws_data_pipeline_spark.ext import packing as PK
    from taxi_aws_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    df = PK.global_row_number(docs, ("n_chars", "doc_id"), checkpoint=False)
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "SinglePartition" not in plan
    # r12 shape: the numbering is a range exchange + in-partition sort
    # + monotonically_increasing_id — no Window at all (the old
    # per-partition row_number window forced a SECOND full shuffle,
    # hash on _pid)
    assert "rangepartitioning" in plan.lower()
    assert "monotonically_increasing_id" in plan
    assert "Window" not in plan
    # and the naive formulation DOES have one — the trap is real
    naive = docs.selectExpr(
        "doc_id", "row_number() OVER (ORDER BY n_chars, doc_id) AS rn"
    )
    naive_plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        naive._jdf.queryExecution(), "simple"
    )
    assert "SinglePartition" in naive_plan


def test_z1_zorder_bounds_both_dimensions(spark, sf_dir):
    # the point of the Morton key: every bucket's range is narrow in
    # BOTH interleaved columns, so min/max file stats prune on either
    # predicate — a single-column sort can only bound its leading key
    import pandas as pd

    got = CATALOG["z1_zorder_locality_report"].spark(spark, sf_dir).toPandas()
    # a 2^10-wide z-key range covers a 32x32 cell of the interleaved
    # plane, so (for keys below the 2^16 mask) every bucket's span is
    # AT MOST 31 in each dimension — sharp, not statistical
    assert (got["part_hi"] - got["part_lo"]).max() <= 31
    assert (got["supp_hi"] - got["supp_lo"]).max() <= 31
    assert len(got) > 1


def test_x93_simhash_pairing_equi_join_on_band(spark, sf_dir):
    # the nibble-band blocking must surface as an EQUI-join (hash/SMJ),
    # never a cartesian/nested-loop fallback — that would mean the band
    # equality fell out of the condition and the join went all-pairs
    plan = _plan(spark, sf_dir, "x93_simhash_hamming_pairs", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_x94_equidepth_has_no_single_partition_exchange(spark, sf_dir):
    # the equi-depth histogram rides global_row_number: the x87
    # no-SinglePartition contract must hold INSIDE a consuming operator
    # too (localCheckpoint severs the numbering subplan, so assert on
    # the un-checkpointed building blocks)
    from taxi_aws_data_pipeline_spark.ext import packing as PK
    from taxi_aws_data_pipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    df = PK.global_row_number(
        li, ("l_extendedprice", "l_orderkey", "l_linenumber"), checkpoint=False
    )
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "SinglePartition" not in plan


def test_x91_label_propagation_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x91_label_propagation_communities", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_j13_dimension_filters_push_before_fact_join(spark, sf_dir):
    # the two-nation filter must prune the DIMENSION scans (supplier /
    # customer sides resolve against a 2-row nation slice), and the
    # dims must broadcast — the fact table itself never broadcast
    plan = _plan(spark, sf_dir, "j13_bi_national_volume")
    assert "BroadcastHashJoin" in plan
    # nation name filter reached a scan as a pushed/partial filter
    assert "NATION_1" in plan


def test_x112_scan_has_partition_filters(spark, sf_dir):
    # the partitioned read must prune at the DIRECTORY level: the scan
    # carries a PartitionFilters entry on event_type and reads only the
    # matching partition; a data-filter-only plan would list every file
    plan = _plan(spark, sf_dir, "x112_partition_pruned_read")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf, "no PartitionFilters in scan"
    assert any("event_type" in l and "purchase" in l for l in pf), pf


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """AQE's runtime skew-join mitigation — the safety net under every
    shuffled join in this catalog: a fact with one pathological hot key
    joined to a large-enough dim (broadcast disabled) must show
    skew-split sort-merge join partitions in the FINAL adaptive plan.
    This is the behavior k1/k3's explicit salting complements: salting
    is the plannable form, AQE the runtime backstop — both are part of
    the engine's documented skew posture."""
    import pyspark.sql.functions as F

    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = fact.join(dim, "k")
        # execute the join's OWN QueryExecution (count() builds a new
        # one over an aggregate, leaving this plan un-finalized — AQE
        # only marks skew splits in the plan it actually ran)
        rows = joined.collect()
        # hot key 7 matches once; ids ≡ 0 (mod 10) keep their own key
        # and only those < 50_000 find a dim row
        assert len(rows) == 180_000 + 5_000
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_x121_bucketed_join_is_shuffle_free(spark, sf_dir):
    # the whole point of bucketing: both scans already satisfy the
    # join's hashpartitioning requirement from the storage layout, so
    # the SMJ has NO join-side Exchange — the only shuffle in the whole
    # query is the final tiny groupBy on o_orderpriority
    plan = _plan(spark, sf_dir, "x121_bucketed_colocated_join", "simple")
    assert "SortMergeJoin" in plan
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert len(exchanges) == 1, exchanges
    assert "o_orderpriority" in exchanges[0]
    # and the unbucketed form of the SAME query pays three
    from taxi_aws_data_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    naive = (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    naive_plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        naive._jdf.queryExecution(), "simple"
    )
    assert naive_plan.count("Exchange") == 3


def test_x123_triangle_joins_are_equi(spark, sf_dir):
    # wedge closing must stay equi-join (hash/SMJ); a cartesian or
    # nested-loop fallback would mean the canonical-order equalities
    # fell out of the condition and the count went all-pairs
    plan = _plan(spark, sf_dir, "x123_triangle_count", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan.replace(
        "BroadcastNestedLoopJoin BuildRight, Cross", ""
    )  # the three one-row scalar frames combine via explicit crossJoin


def test_x124_total_is_broadcast(spark, sf_dir):
    # the one-row total joins the 168-cell frame via broadcast — no
    # shuffle of the cells against the scalar
    plan = _plan(spark, sf_dir, "x124_hour_of_week_seasonality", "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_j21_exclusion_and_dim_broadcast(spark, sf_dir):
    # the bad-supplier exclusion and the filtered part dimension must
    # both broadcast (tiny sides); the only data-sized shuffles are the
    # supply-pair distinct and the final distinct-agg
    plan = _plan(spark, sf_dir, "j21_part_supplier_variety", "simple")
    assert plan.count("BroadcastHashJoin") >= 2  # anti + dim join
    assert "CartesianProduct" not in plan


def test_x130_verification_is_equi_anti_join(spark, sf_dir):
    # the false-negative filter must be an EQUI anti join on
    # (custkey, partkey) — a nested-loop fallback would mean the
    # collision check went all-pairs; the two intended
    # BroadcastNestedLoopJoins are the 3-row draws / 1-row bounds
    # crossJoins, which build tiny sides
    plan = _plan(spark, sf_dir, "x130_negative_sampling", "simple")
    anti = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti and all(
        "BroadcastHashJoin" in l or "SortMergeJoin" in l or "ShuffledHashJoin" in l
        for l in anti
    ), anti


def test_j22_stage1_frontier_is_salt_partitioned(spark, sf_dir):
    # the two-stage skyline's whole point: the stage-1 sweep windows
    # run partitioned by salt (so the full point set never funnels
    # through one task); only the pruned survivors hit the global stage
    plan = _plan(spark, sf_dir, "j22_pareto_frontier", "simple")
    assert plan.count("Window") >= 4  # two frames per stage
    assert "salt" in plan  # stage-1 partition spec survived planning
    assert "CartesianProduct" not in plan


def test_x141_bloom_probe_joins_broadcast(spark, sf_dir):
    # the 128-byte filter and the member-fingerprint flag must both
    # broadcast onto the probe stream — a sort-merge join would shuffle
    # the probes against state that fits in a closure
    plan = _plan(spark, sf_dir, "x141_bloom_filter_membership", "simple")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_x137_sketch_probe_is_broadcast(spark, sf_dir):
    # the 256-cell sketch broadcasts onto the 40-row probe set, and the
    # cell build partial-aggregates (map-side combine is what makes the
    # sketch additive at any token volume)
    plan = _plan(spark, sf_dir, "x137_count_min_sketch", "simple")
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan


def test_w16_day_restriction_is_broadcast_semi(spark, sf_dir):
    # the observed-days restriction is a broadcast semi join (the day
    # spine is tiny); a shuffled semi would re-exchange 7x user-days
    plan = _plan(spark, sf_dir, "w16_rolling_7d_distinct_users", "simple")
    semi = [l for l in plan.splitlines() if "LeftSemi" in l]
    assert semi and all("Broadcast" in l for l in semi)


def test_x138_bfs_joins_are_equi(spark, sf_dir):
    # frontier expansion must be hash joins on the src key; a
    # nested-loop or cartesian would mean the equality fell out and the
    # walk went all-pairs (the edge build itself is behind the
    # localCheckpoint, guarded by x123's equivalent)
    plan = _plan(spark, sf_dir, "x138_bfs_hops_fixed_rounds", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x142_lexical_arm_is_inverted_index_join(spark, sf_dir):
    # the shingle-postings join must be an equi hash join on the gram —
    # never an all-pairs text comparison; the single intentional
    # nested-loop is the 8-probe broadcast in the cosine arm
    plan = _plan(spark, sf_dir, "x142_reciprocal_rank_fusion", "simple")
    assert "CartesianProduct" not in plan
    bnlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert len(bnlj) <= 1
    assert "BroadcastHashJoin" in plan


def test_z3_join_plans_dynamic_partition_pruning(spark, sf_dir):
    # the runtime month-list subquery must reach the partitioned fact
    # scan — static pruning can't know the dim filter's survivors
    plan = _plan(spark, sf_dir, "z3_dynamic_partition_pruning", "simple")
    assert "dynamicpruning" in plan.lower()


def test_g9_argmax_is_aggregate_not_window(spark, sf_dir):
    # the whole point vs w3: top-1-per-group as an associative
    # aggregate (map-side candidates, no per-group sort)
    plan = _plan(spark, sf_dir, "g9_argmax_aggregate", "simple")
    assert "Window" not in plan
    assert "Aggregate" in plan


def test_z4_range_pushes_year_func_does_not(spark, sf_dir):
    # both facts: the half-open range reaches the scan as min/max-
    # prunable comparisons, and the year() formulation pushes nothing
    from pyspark.sql import functions as F

    from taxi_aws_data_pipeline_spark.tables import load_table

    plan = _plan(spark, sf_dir, "z4_sargable_predicate_rewrite")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_shipdate" in pushed

    trap = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == 1995)
        .select("l_quantity")
    )
    trap_plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        trap._jdf.queryExecution(), "formatted"
    )
    trap_pushed = [
        l for l in trap_plan.splitlines() if "PushedFilters" in l
    ][0]
    assert "GreaterThanOrEqual" not in trap_pushed
    assert "LessThan" not in trap_pushed


def test_x154_chunking_is_shuffle_free(spark, sf_dir):
    # the entry's claim verbatim: pure projection + explode — no
    # Exchange anywhere in the plan at any corpus size
    plan = _plan(spark, sf_dir, "x154_stride_overlap_chunking", "simple")
    assert "Exchange" not in plan


def test_x136_quantization_is_shuffle_free(spark, sf_dir):
    # SQ8 is a per-row projection; a shuffle would mean something
    # regressed into an aggregation
    plan = _plan(spark, sf_dir, "x136_int8_scalar_quantization", "simple")
    assert "Exchange" not in plan


def test_x147_vocab_join_is_broadcast(spark, sf_dir):
    # the vocab must broadcast onto the token stream — a sort-merge
    # join would shuffle every token against a 1000-row table
    plan = _plan(spark, sf_dir, "x147_vocab_encode", "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_x159_cuped_has_no_window(spark, sf_dir):
    # CUPED is two grouped aggregates — a Window would mean the
    # moment computation regressed to a per-row pass
    plan = _plan(spark, sf_dir, "x159_cuped_adjustment", "simple")
    assert "Window" not in plan


def test_x173_interleave_has_no_single_partition_exchange(spark, sf_dir):
    # the closed-form interleave position must avoid the global-window
    # trap: per-source windows + a broadcast source dim only. The only
    # tolerated SinglePartition is the tiny distinct-source dim's own
    # numbering (bounded by source cardinality, not corpus size), so
    # assert the FULL corpus path: the doc-bearing window is partitioned.
    from taxi_aws_data_pipeline_spark.plans import CATALOG

    df = CATALOG["x173_curriculum_interleave"].spark(spark, sf_dir)
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # corpus-side window is keyed by source (parallel), and the source
    # dim reaches the join as a broadcast, not a shuffle
    assert "partitionBy=[source" in plan.replace(" ", "").replace(
        "'", ""
    ) or "[source#" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_x177_diversified_topk_uses_take_ordered(spark, sf_dir):
    # the global top-20 over capped survivors must be the heap-merge
    # TakeOrderedAndProject, never a full global Sort + Limit
    from taxi_aws_data_pipeline_spark.plans import CATALOG

    df = CATALOG["x177_diversified_topk"].spark(spark, sf_dir)
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "TakeOrdered" in plan


def test_x207_bottomk_take_ordered_no_global_sort(spark, sf_dir):
    # bottom-k-by-hash must be the O(k)-memory heap merge: a
    # TakeOrderedAndProject with no global Sort and no single-partition
    # exchange feeding one
    plan = _plan(spark, sf_dir, "x207_bottomk_uniform_sample", "simple")
    assert "TakeOrdered" in plan
    assert "Exchange SinglePartition" not in plan


def test_x203_bm25_broadcasts_df_and_totals(spark, sf_dir):
    # the 4-row document-frequency table and the 1-row corpus totals ride
    # broadcasts; the only shuffles key on doc/term aggregates — never a
    # sort-merge join against the corpus
    plan = _plan(spark, sf_dir, "x203_bm25_topk", "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrdered" in plan


def test_x198_auc_window_runs_over_score_levels(spark, sf_dir):
    # the cumulative rank window must consume the score-level AGGREGATE
    # (distinct-score cardinality), so the single-partition stage is
    # bounded by score levels — HashAggregate feeds the Window, and the
    # final result is one row
    plan = _plan(spark, sf_dir, "x198_roc_auc_langid", "simple")
    assert "Window" in plan and "HashAggregate" in plan


def test_x213_triangles_no_cartesian(spark, sf_dir):
    # oriented wedge enumeration must stay equi-join shaped: no
    # cartesian product, no broadcast nested loop over the edge set
    plan = _plan(spark, sf_dir, "x213_triangle_clustering", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x224_density_self_join_is_bucket_keyed(spark, sf_dir):
    # the neighborhood predicate must ride the bucket equi-join —
    # never an all-pairs nested loop
    plan = _plan(spark, sf_dir, "x224_density_core_points", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x225_item_cf_joins_on_basket_key(spark, sf_dir):
    # the pair build must join baskets on the order key (bounded ~7-row
    # fanout), not cross items
    plan = _plan(spark, sf_dir, "x225_item_item_cosine", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x231_message_passing_partial_aggregates(spark, sf_dir):
    # the destination aggregation must partial-aggregate (HashAggregate
    # above and below its exchange) — message passing's map-side combine
    plan = _plan(spark, sf_dir, "x231_message_passing_round", "simple")
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


# Catalog-wide join-strategy safety net (round 5). A CartesianProduct
# node is never acceptable — at 100 TB it is quadratic shuffle-free
# death, and every intentional pairing in this repo is either bucketed
# or broadcast. BroadcastNestedLoopJoin appears ONLY in two sanctioned
# shapes, pinned by name below; a new entry growing a BNLJ (or one of
# these losing it) must consciously edit the list.
#
# Shape 1 — one-row/bounded scalar attach: explicit
# ``.crossJoin(F.broadcast(scalar))`` where the broadcast side is a
# global aggregate (one row) or a fixed spine (deciles, lag grid, day
# spine). Plan shows ``BroadcastNestedLoopJoin Build*, Cross``.
_BNLJ_SCALAR_ATTACH = {
    "a15_ks_two_sample",
    "a17_rfm_segmentation",
    "a18_autocorrelation_lags",
    "a25_mix_rate_decomposition",
    # a26 left in round 10: the arm pivot became one global conditional
    # aggregate — no crossJoin remains in its plan
    "a28_winsorized_mean",
    "j9_churned_rich_customers",
    "k5_join_cardinality_estimate",
    "k7_shuffle_skew_report",
    "w12_ratio_to_report",
    "w8_time_grid_forward_fill",
    "w9_time_grid_interpolate",
    "x107_time_to_convert",
    "x116_distribution_matched_sample",
    "x123_triangle_count",
    "x124_hour_of_week_seasonality",
    "x125_chi2_term_selection",
    "x130_negative_sampling",
    "x140_benford_first_digit_audit",
    "x149_quantile_mapping",
    "x155_lorenz_curve_deciles",
    "x158_heavy_hitter_discovery",
    "x159_cuped_adjustment",
    "x160_lsh_recall_curve",
    "x161_difference_in_differences",
    "x170_aspect_bucket_resize_plan",
    "x175_rendezvous_sharding",
    "x180_modularity_score",
    "x182_pseudonym_collision_audit",
    "x187_discrete_hazard_table",
    "x189_eb_smoothed_ranking",
    "x190_total_variation_drift",
    "x201_chi2_token_class",
    "x202_pmi_collocations",
    "x203_bm25_topk",
    "x204_token_budget_epochs",
    "x205_zipf_rank_frequency",
    "x209_hll_distinct_sketch",
    "x214_prf_expansion_terms",
    "x215_bpe_second_merge",
    "x234_greedy_mixture_allocation",
    "x237_capture_recapture",
    "x238_good_turing_unseen",
    "x23_tfidf_top_terms",
    "x244_cluster_weighted_sample",
    "x248_ivf_cell_balance",
    "x249_dedup_savings_profile",
    "x43_vocab_coverage",
    "x49_source_mix_rebalance",
    "x67_key_skew_report",
    "x70_mixture_token_budget_plan",
    "x76_source_token_divergence",
    "x79_temperature_mixture_sample",
    "x94_equidepth_histogram",
    "z7_join_order_cost_rank",
    "z8_retention_expiry_plan",
}
# Shape 2 — conditioned non-equi join against a PROVABLY SMALL
# broadcast side: the ANN/eval family (bounded query set x corpus —
# the documented brute-force baseline or ADC codebook probe), the
# range-tier lookup (j3), and pairwise-over-bounded-grid statistics
# (a16 Theil-Sen days, a29 rank ties, x206 sample sizes, x217
# decile edges). Plan shows a conditioned Inner/LeftOuter BNLJ; the
# broadcast side's cardinality is fixed by construction, so the node
# is O(n * k) with small constant k, never O(n^2).
_BNLJ_SMALL_BROADCAST = {
    "a16_theil_sen_slope",
    "a29_kruskal_wallis_terms",
    "j3_range_join_value_tiers",
    "x10_cosine_topk_bruteforce",
    "x142_reciprocal_rank_fusion",
    "x162_ndcg_eval",
    "x163_mrr_recall_at_k",
    "x164_map_at_10",
    "x172_kendall_tau_rankings",
    "x183_colbert_maxsim_topk",
    "x185_matryoshka_funnel_topk",
    "x186_binary_hamming_topk",
    "x188_knn_label_eval",
    "x206_heaps_vocab_growth",
    "x217_uplift_deciles",
    "x235_embedding_separation",
    "x246_ivf_nprobe_recall_sweep",
    "x38_pq_ann_topk",
}


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_no_unsanctioned_nested_loop_joins(spark, sf_dir, name):
    plan = (
        CATALOG[name]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # membership lives in ONE place (tests/plan_invariants.py, shared
    # with the parity-sweep hook); the kind-specific assertions below
    # keep this module's finer scalar-attach vs small-broadcast split
    from .plan_invariants import check_plan_invariants

    check_plan_invariants(name, plan)
    has_bnlj = "BroadcastNestedLoopJoin" in plan
    if name in _BNLJ_SCALAR_ATTACH and has_bnlj:
        import re

        kinds = {
            m.group(1)
            for m in re.finditer(
                r"BroadcastNestedLoopJoin Build(?:Left|Right), (\w+)", plan
            )
        }
        assert kinds <= {"Cross"}, (
            f"{name} is pinned as a scalar crossJoin attach but plans "
            f"a conditioned BNLJ {kinds} — move it to "
            "_BNLJ_SMALL_BROADCAST with a smallness argument"
        )
