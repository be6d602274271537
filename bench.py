#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced through the "noop" sink so the full plan executes
(a bare .count() would let Catalyst prune every projected expression).

Set SPARK_GRAFT_VANILLA=1 to run on a vanilla Spark session (no builder
confs beyond master/shuffle partitions) — proves the engine's performance
doesn't secretly depend on session.py: the semantics confs are pinned by
load_table itself, and the tuning confs (AQE etc.) are Spark 4 defaults
or purely protective.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from taxi_aws_data_pipeline_spark.plans import CATALOG
from taxi_aws_data_pipeline_spark.session import default_parallelism, get_spark
from taxi_aws_data_pipeline_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VANILLA = os.environ.get("SPARK_GRAFT_VANILLA") == "1"


def cpu_probe() -> float:
    """Single-core machine-speed probe: seconds for a fixed 20M-iteration
    integer loop. Recorded in every bench JSON so cross-round per-query
    comparisons can be read against the box's speed THAT run — round 8
    measured the same probe oscillating 0.8 s ↔ 2.3 s minute-to-minute
    on this host (suite totals 218 s and 145 s back-to-back with zero
    plan changes), which makes an uncalibrated record comparison
    meaningless on a bad day. Nominal fast-state value on the round-8
    box: ~0.8 s."""
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


_EFFECTIVE_CORES_SCRIPT = """\
import sys, time
from concurrent.futures import ProcessPoolExecutor

def burn(_=None):
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    return time.perf_counter() - t0

n = int(sys.argv[1])
solo = burn()
with ProcessPoolExecutor(n) as ex:
    t0 = time.perf_counter()
    list(ex.map(burn, range(n)))
    wall = time.perf_counter() - t0
print(round(n * solo / wall, 1))
"""


def effective_cores(n: int = 32) -> float | None:
    """Host-delivery probe: run ``n`` concurrent single-core loops and
    report how many cores' worth of throughput the host actually
    delivered (n * solo_time / wall_time). A local[32] suite's wall
    time scales with THIS number, not nproc: the round-8 box delivered
    ~20 of its 32 advertised cores under full fan-out while the
    single-core probe read normal — parallel stages ran ~1.6× slower
    with zero plan changes, which only this probe makes visible.

    Runs in a freshly spawned interpreter (ADVICE r8): by the time this
    is sampled the bench process carries live JVM/py4j threads, and a
    fork-based pool forked from a multithreaded process is deprecated
    (3.12+) and can intermittently deadlock. The clean child is a
    single-threaded plain-Python process, so its fork pool is safe and
    the reading isn't skewed by the parent's JVM.

    Returns None (recorded as JSON null) if the probe child fails or
    stalls (ADVICE r9): this samples AFTER a sweep that can run ~2h, and
    a raised CalledProcessError/TimeoutExpired here would discard the
    entire sweep's results before the JSON line prints — most likely on
    exactly the degraded box the probe exists to characterize.
    bench_compare already defaults a missing/null value to 32.0."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c", _EFFECTIVE_CORES_SCRIPT, str(n)],
            capture_output=True,
            text=True,
            check=True,
            timeout=600,
        )
        return float(out.stdout.strip())
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            ValueError) as exc:
        print(f"# effective_cores probe failed: {exc!r}", file=sys.stderr)
        return None


def vanilla_spark():
    from pyspark.sql import SparkSession

    cpus = default_parallelism()
    spark = (
        SparkSession.builder.appName("taxi-engine-bench-vanilla")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark

# Headline spread: heavy aggregations, the fact-fact join, the star join,
# drift union, window, and the extension tier (near-dup, LSH, ANN).
BENCH_QUERIES = (
    "a1_returnflag_performance",
    "a3_supplier_analysis",
    "a5_monthly_summary",
    "e1_ship_delay_minutes",
    "j1_region_revenue_star_join",
    "w1_tumbling_hourly_value",
    "w2_user_sessionization",
    "j2_asof_join_prior_click",
    "g1_rollup_year_priority",
    "d2_union_schema_drift",
    "s5_keep_newest_per_key",
    "p1_typed_cast_enforce",
    "x5_exact_dedup_groups",
    "x6_jaccard_near_dup_pairs",
    "x8_minhash_lsh_candidate_pairs",
    "x9_simhash_signatures",
    "x10_cosine_topk_bruteforce",
    "j4_customer_order_distribution",
    "a7_distinct_suppliers_per_part",
    "x18_near_dup_clusters",
    "x21_embedding_label_centroids",
    "x23_tfidf_top_terms",
    "x25_ngram_decontamination_fuzzy",
    "x26_paragraph_dedup",
    "x27_training_data_pipeline",
    "x33_cross_corpus_dedup",
    "x36_dup_ngram_coverage",
    "x40_chunk_documents",
    "x43_vocab_coverage",
    "x57_session_funnel",
    "x58_cohort_retention",
    "j7_sole_late_supplier_blame",
    "x66_filter_cascade_report",
    "x69_event_lateness_profile",
    "x74_daily_active_users",
    # round-3 additions: Arrow probe path, verified iterative tiers,
    # prefix-filtered similarity join, distributed numbering, resampling,
    # the Q17/Q18 join shapes, and the salted shuffle join
    "x81_media_header_probe",
    "x83_kmeans_fixed_rounds",
    "x84_supplier_pagerank",
    "x85_prefix_filtered_jaccard",
    "x87_global_row_number",
    "w8_time_grid_forward_fill",
    "j10_small_quantity_revenue",
    "j11_large_volume_orders",
    "k3_salted_skew_join",
    "x86_scd2_dimension_merge",
    "x89_csv_source_roundtrip",
    "x90_bigram_lm_fluency",
    "w9_time_grid_interpolate",
    # round-4 additions: the similarity-search story gets recorded perf
    # numbers (VERDICT r3 item 7) — LSH probe ANN, IVF ANN, semantic
    # dedup, the bucketed kNN self-join graph, and the newly
    # oracle-backed PQ-ADC search
    "x11_lsh_ann_topk",
    "x14_ivf_ann_topk",
    "x32_semantic_dedup",
    "x60_knn_graph",
    "x38_pq_ann_topk",
    # round-4 operator additions: community detection, PCA direction,
    # equi-depth histogram, the Q7/Q19 join shapes, range-frame window
    "x91_label_propagation_communities",
    "x92_power_iteration_top_pc",
    "x94_equidepth_histogram",
    "j13_bi_national_volume",
    "j14_disjunctive_pred_join",
    "w11_range_frame_rolling_count",
    # late round-4 additions: mergeable distinct rollups, weighted
    # median, deterministic bootstrap, boilerplate report, Mann-Kendall
    "x105_bitmap_distinct_rollup",
    "a11_weighted_median",
    "x111_bootstrap_se_deterministic",
    "x114_boilerplate_line_report",
    "x104_mann_kendall_trend",
    # round-4 continuation: the bucketed-storage shuffle-free join (write
    # cost included — the honest price of the layout), the sweep-line
    # concurrency walk, and the CDC snapshot reconstruction
    "x121_bucketed_colocated_join",
    "j19_interval_concurrency",
    "x122_cdc_apply_changes",
    # final round-4 additions: the token-stream sketches/vectorizers,
    # the rolling-distinct explode, the bloom probe, and hybrid RRF
    # (the remaining new entries are sub-second report shapes at sf0.1)
    "x137_count_min_sketch",
    "x139_feature_hashing",
    "w16_rolling_7d_distinct_users",
    "x141_bloom_filter_membership",
    "x142_reciprocal_rank_fusion",
    # continuation: the line-level cent allocator (order-key windows
    # over the full fact), the vocab encoder (token stream + per-doc
    # reassembly), and RFM (three rankings over the customer rollup)
    "x144_largest_remainder_allocation",
    "x147_vocab_encode",
    "a17_rfm_segmentation",
    # session-2 continuation: the multimodal resize front-end (Arrow
    # probe + bucketing), the graph core/coverage/blocking tiers, the
    # multi-vector + quantized retrieval ladder, token-pair extraction,
    # and the per-user TWAP window pass
    "x170_aspect_bucket_resize_plan",
    "x178_kcore_peeling",
    "x179_greedy_coverage_picks",
    "x181_weighted_jaccard_pairs",
    "x183_colbert_maxsim_topk",
    "x184_skipgram_pair_counts",
    "x185_matryoshka_funnel_topk",
    "x186_binary_hamming_topk",
    "w23_time_weighted_average",
    # session-3 continuation: the classifier-eval / corpus-law tier's
    # token-scan-heavy members — chi2 runs a distinct presence explode,
    # PMI a bigram transform-explode + two unigram joins, BM25 the
    # query-filtered tf scan with broadcast df
    "x201_chi2_token_class",
    "x202_pmi_collocations",
    "x203_bm25_topk",
    # session-3 continuation: graph triangles (oriented wedge joins),
    # density triage + item-CF (bucketed/basket self-joins), TextRank
    # (iterative integer PageRank on the word graph), and the verified
    # streaming window replay (readStream + watermark + AvailableNow)
    "x213_triangle_clustering",
    "x224_density_core_points",
    "x225_item_item_cosine",
    "x208_textrank_keywords",
    "s9_streaming_hourly_replay",
    # round-7 window tier's heavy members: graph link prediction
    # (oriented neighbor self-join), personalized PageRank (seeded
    # integer power iteration), modularity (LP + broadcast label join,
    # single-pass linear rollup), and the SCD2 temporal as-of fact join
    "x166_common_neighbor_link_prediction",
    "x194_personalized_pagerank",
    "x180_modularity_score",
    "x197_fact_scd2_asof_join",
    # round-8 window tier's heavy members: the one-pass IVF nprobe
    # sweep (brute truth + shared cell assignment) and community
    # purity (the 2-round LP machinery + contingency rollup); the
    # rest of the x226-x249 tier is sub-second report shapes at sf0.1
    "x246_ivf_nprobe_recall_sweep",
    "x233_community_purity",
    # round-9 addition: the r8 replay fix checkpointed x234's greedy
    # state (VERDICT r8 item 3 wants a post-fix record); it was the one
    # fix-touched heavy entry with no bench coverage at all
    "x234_greedy_mixture_allocation",
)


def main() -> None:
    # validate args BEFORE the session spins up so a typo fails in
    # milliseconds instead of silently running (or paying for) a sweep
    flags = [a for a in sys.argv[1:] if a.startswith("-")]
    if flags:  # no flags exist; a typo must not silently run a full sweep
        raise SystemExit(f"unrecognized arguments: {flags}")
    subset = list(sys.argv[1:])
    unknown = [a for a in subset if a not in CATALOG]
    if unknown:
        raise SystemExit(f"unknown bench queries: {unknown}")
    order = os.environ.get("SPARK_GRAFT_BENCH_ORDER", "")
    if order not in ("", "forward", "reverse"):
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_ORDER must be forward|reverse, got {order!r}"
        )

    spark = vanilla_spark() if VANILLA else get_spark(app_name="taxi-engine-bench")
    # warm the JVM/session + page cache/parquet footers so query 1 doesn't
    # pay one-time startup costs
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        # through load_table, the engine's read edge — it pins the session
        # confs a vanilla session lacks (events.ts is TIMESTAMP(NANOS))
        load_table(spark, SF_DIR, t).count()

    # Per-query repetitions with a median report: cross-round comparisons
    # were dominated by machine state (r2 read a uniform ~1.45x drift on
    # plan-unchanged queries); the median of REPS runs per query absorbs
    # one-off JIT/page-cache/scheduling outliers. Queries that persist
    # intermediates are re-invoked fresh each rep (new cache entries; LRU
    # reclaims the old ones), so reps measure steady-state plan cost.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # optional subset for A/B work: `python bench.py x179_... x38_...`
    # times just those entries (record files are NOT touched on subset
    # runs, so BENCH_SWEEP/BENCH_LOCAL always describe full sweeps)
    run_queries = tuple(subset) or BENCH_QUERIES
    # SPARK_GRAFT_BENCH_ORDER=reverse runs the same queries back-to-front:
    # the position-vs-query discriminator for in-suite drift flags
    # (VERDICT r8 item 4 — x137/x122/x139/j19/x121 read 1.6-2.7x
    # calibrated IN-SUITE yet 0.6-1.1x standalone on the same box; if a
    # forward+reverse pair moves the spikes with POSITION, the cause is
    # accumulated JVM/page-cache pressure, not those plans). Reversed
    # runs never overwrite the committed record.
    if order == "reverse":
        run_queries = tuple(reversed(run_queries))
    probe_before = cpu_probe()
    timings: dict[str, float] = {}
    # Per-rep raw samples (VERDICT r9 item 2): the median alone cannot
    # distinguish one straggler rep (host stall — weather) from a
    # uniformly slow plan (regression) without re-running; with the rep
    # vector recorded, ONE sweep answers it, and bench_compare
    # calibrates on the per-query MIN (the host's best delivery for
    # that plan, least contaminated by transient stalls).
    reps_sec: dict[str, list[float]] = {}
    # Mid-suite host-state timestamps (VERDICT r9 item 7): on a box whose
    # speed swings minute-to-minute, one before/after probe pair cannot
    # say what state the host was in when a FLAGGED query ran. A ~1 s
    # re-probe every PROBE_EVERY queries (~5 probes on the 99-query
    # suite) timestamps the host along the sweep; bench_compare
    # annotates each drift flag with the nearest reading.
    probe_every = max(
        1, int(os.environ.get("SPARK_GRAFT_PROBE_EVERY", "20"))
    )
    mid_probes: list[list[float]] = []  # [query_index, probe_sec]
    for i, name in enumerate(run_queries):
        if i and i % probe_every == 0:
            mid_probes.append([i, cpu_probe()])
        spec = CATALOG[name]
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            spec.spark(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        reps_sec[name] = [round(s, 3) for s in samples]

    sf_match = re.search(r"sf([\d.]+)", SF_DIR)
    # subset A/B runs get a distinct metric label + explicit subset list
    # so a captured tail can never be mistaken for a full-suite record
    result = {
        "metric": (
            "subset wall time (A/B, not a suite record)"
            if subset
            else "headline suite wall time"
        ),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "reps_sec": reps_sec,
        "reps": reps,
        "sf": float(sf_match.group(1)) if sf_match else None,
        # machine-speed calibration: fixed single-core loop, seconds,
        # sampled before and after the suite (~0.8 s fast-state nominal;
        # see cpu_probe docstring) — read per-query drift against these
        "cpu_probe": [probe_before, cpu_probe()],
        # in-flight host-state samples: [run-order query index, probe s]
        "mid_probes": mid_probes,
        # cores the host actually delivered under 32-way fan-out (of
        # default_parallelism() advertised) — suite wall scales with this
        "effective_cores": effective_cores(default_parallelism()),
    }
    if subset:
        result["subset"] = sorted(subset)
    if order == "reverse":
        result["order"] = "reverse"
        result["metric"] += " (REVERSED order, not a suite record)"
    # The driver captures the TAIL of this process's output; BENCH_r04
    # lost its head because the single JSON line (92 queries) exceeded
    # the capture window, leaving an unparseable fragment (VERDICT r4
    # item 2). Self-sufficient record, newest-last:
    #   1. full result → BENCH_SWEEP.json beside this script,
    #   2. per-query timings one-per-line (survive any tail cut),
    #   3. LAST line = ONE short JSON line; the full per-query dict is
    #      kept only while it fits a conservative tail budget, else it
    #      is trimmed to the slowest queries and points at
    #      BENCH_SWEEP.json for the rest.
    # Artifact discipline (VERDICT r5 item 4): every full sweep writes
    # BENCH_SWEEP.json (gitignored — the always-fresh latest run, which
    # is what the per-round driver bench produces), and the COMMITTED
    # record BENCH_LOCAL.json updates only on an explicit
    # SPARK_GRAFT_BENCH_RECORD=1 run that is committed immediately — so
    # a driver bench run leaves `git status` clean and BASELINE.md's
    # narrative always points at a committed artifact.
    here = os.path.dirname(os.path.abspath(__file__))
    # subset runs and reversed-order runs are throwaway A/Bs, not suite
    # records — they must never overwrite BENCH_SWEEP/BENCH_LOCAL
    if not subset and order != "reverse":
        with open(os.path.join(here, "BENCH_SWEEP.json"), "w") as f:
            json.dump(result, f, indent=2)
        if os.environ.get("SPARK_GRAFT_BENCH_RECORD") == "1":
            with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
                json.dump(result, f, indent=2)
    for name, sec in timings.items():
        print(f"# query {name} sec={sec}")
    line = json.dumps(result, separators=(",", ":"))
    tail_budget = 1800
    if len(line) > tail_budget:
        slowest = sorted(timings.items(), key=lambda kv: -kv[1])
        trimmed = dict(
            result, queries={}, reps_sec={}, n_queries=len(timings)
        )
        if not subset:
            # subset runs never write BENCH_SWEEP.json, so the pointer
            # would name a stale file (ADVICE r6) — full sweeps only
            trimmed["queries_full_in"] = "BENCH_SWEEP.json"
        for name, sec in slowest:
            # the rep vector rides along with its query so the driver's
            # trimmed capture stays self-consistent (median + raw reps
            # for the same slowest-N set)
            candidate = dict(
                trimmed,
                queries={**trimmed["queries"], name: sec},
                reps_sec={**trimmed["reps_sec"], name: reps_sec[name]},
            )
            cline = json.dumps(candidate, separators=(",", ":"))
            if len(cline) > tail_budget:
                break
            trimmed, line = candidate, cline
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
