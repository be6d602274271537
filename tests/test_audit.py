"""Behavioral tests for the pipeline-audit tier (x65-x68): cross-entry
consistency invariants that the per-entry oracle parity sweep can't see —
the cascade report must reconcile exactly with the pipeline it audits,
the skew report with the raw counts, the FK audit with hand-planted
orphans."""

from __future__ import annotations

import pyspark.sql.functions as F

from taxi_aws_data_pipeline_spark.plans import CATALOG


def test_cascade_report_reconciles_with_pipeline(spark, sf_dir):
    """x66's funnel must sum to the corpus and its survivors must equal
    x27's output count — same thresholds, same keeper/benchmark rules."""
    report = CATALOG["x66_filter_cascade_report"].spark(spark, sf_dir)
    rows = report.collect()
    reason_cols = [
        "n_null_text",
        "n_non_english",
        "n_low_quality",
        "n_duplicate",
        "n_contaminated",
        "n_sampled_out",
        "n_kept",
    ]
    for r in rows:
        assert sum(r[c] for c in reason_cols) == r.n_total, r
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_total for r in rows) == total_docs
    kept = sum(r.n_kept for r in rows)
    pipeline_out = CATALOG["x27_training_data_pipeline"].spark(spark, sf_dir)
    assert kept == pipeline_out.count()


def test_lsh_recall_report_matches_set_arithmetic(spark, sf_dir):
    row = CATALOG["x65_lsh_recall_report"].spark(spark, sf_dir).collect()[0]
    assert row.n_recalled <= row.n_true_pairs
    assert row.n_recalled <= row.n_candidates
    if row.n_true_pairs:
        assert abs(row.recall - row.n_recalled / row.n_true_pairs) < 1e-12
        # the fixture plants real near-dups; bands must catch a majority
        assert row.recall >= 0.5
    if row.n_candidates:
        assert abs(row.precision - row.n_recalled / row.n_candidates) < 1e-12


def test_skew_report_matches_raw_counts(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    top = (
        ev.groupBy("user_id")
        .count()
        .orderBy(F.desc("count"), "user_id")
        .limit(10)
        .collect()
    )
    report = (
        CATALOG["x67_key_skew_report"].spark(spark, sf_dir).orderBy("rank").collect()
    )
    assert [(r.user_id, r.n_events) for r in report] == [
        (r.user_id, r["count"]) for r in top
    ]
    # shares are monotone-cumulative and bounded
    assert all(0.0 < r.share <= 1.0 for r in report)
    cums = [r.cum_share for r in report]
    assert cums == sorted(cums)
    assert cums[-1] <= 1.0 + 1e-12


def test_lateness_profile_on_planted_late_events(spark, tmp_path):
    """Hand-built arrival log: user 7 gets one event 60 s behind its
    high-watermark; user 8 arrives in order. p95 must land on the late
    bucket (ceil(.95*5)=5 ⇒ the cumulative histogram's last value)."""
    import duckdb

    from taxi_aws_data_pipeline_spark.tables import TABLE_NAMES

    d = tmp_path / "sf_late"
    d.mkdir()
    src = "/root/testdata/sf0.001"
    for t in TABLE_NAMES:
        if t != "events":
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    duckdb.sql(
        f"""
        COPY (SELECT * FROM (VALUES
            (1, TIMESTAMP '2026-01-01 00:10:00', 7, 'view', 1.0, 'p'),
            (2, TIMESTAMP '2026-01-01 00:09:00', 7, 'view', 1.0, 'p'),
            (3, TIMESTAMP '2026-01-01 00:10:00', 7, 'view', 1.0, 'p'),
            (4, TIMESTAMP '2026-01-01 00:00:00', 8, 'view', 1.0, 'p'),
            (5, TIMESTAMP '2026-01-01 00:05:00', 8, 'view', 1.0, 'p')
        ) t(event_id, ts, user_id, event_type, value, props))
        TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    row = (
        CATALOG["x69_event_lateness_profile"].spark(spark, str(d)).collect()[0]
    )
    assert row.n_events == 5
    assert row.n_late == 1
    assert row.n_late_over_10m == 0
    assert row.max_lateness_s == 60
    assert row.p95_lateness_s == 60


def test_mixture_plan_fills_budget_exactly(spark, sf_dir):
    rows = CATALOG["x70_mixture_token_budget_plan"].spark(spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    assert abs(sum(r.share_now for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r.target_share - 1.0 / len(rows)) < 1e-12
        # epochs * tokens = this source's equal slice of the 2x budget
        assert abs(r.repeat_epochs * r.n_tokens - 2.0 * total / len(rows)) < 1e-6


def test_vocab_growth_is_monotone_and_totals_vocab(spark, sf_dir):
    import pyspark.sql.functions as SF

    from taxi_aws_data_pipeline_spark.ext import text as TX

    curve = (
        CATALOG["x71_vocab_growth_curve"]
        .spark(spark, sf_dir)
        .orderBy("doc_bucket")
        .collect()
    )
    sizes = [r.vocab_size for r in curve]
    assert sizes == sorted(sizes)
    assert sum(r.new_types for r in curve) == sizes[-1]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        SF.col("text").isNotNull()
    )
    vocab = (
        docs.select(SF.explode(TX.words("text")).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert sizes[-1] == vocab


def test_merge_anti_decontamination_matches_broadcast_path(spark, sf_dir):
    """x72 is x17 with the broadcast swapped for a shuffle sort-merge
    anti join — same rows, SortMergeJoin plan, no broadcast."""
    merge = CATALOG["x72_decontaminate_merge_anti"].spark(spark, sf_dir)
    bcast = CATALOG["x17_decontaminate_anti_join"].spark(spark, sf_dir)
    assert sorted(map(tuple, merge.collect())) == sorted(
        map(tuple, bcast.collect())
    )
    plan = merge._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "LeftAnti" in plan
    assert "BroadcastHashJoin" not in plan


def test_j7_decorrelated_rewrite_matches_spark_exists_form(spark, sf_dir):
    """The DataFrame plan replaces Q21's double correlated EXISTS with one
    per-order aggregate; prove equivalence against Spark's OWN correlated-
    subquery planner (independent of the DuckDB oracle)."""
    from taxi_aws_data_pipeline_spark.tables import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("t_lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("t_orders")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("t_supplier")
    sql = spark.sql(
        """
        WITH ll AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS) AS late
            FROM t_lineitem l JOIN t_orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name, count(*) AS numwait
        FROM ll l1 JOIN t_supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM ll l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM ll l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name LIMIT 20
        """
    ).collect()
    df = (
        CATALOG["j7_sole_late_supplier_blame"]
        .spark(spark, sf_dir)
        .orderBy(F.desc("numwait"), "s_name")
        .collect()
    )
    assert [(r.s_name, r.numwait) for r in df] == [
        (r.s_name, r.numwait) for r in sql
    ]


def test_j9_matches_spark_not_exists_form(spark, sf_dir):
    from taxi_aws_data_pipeline_spark.tables import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("t_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("t_orders")
    sql = spark.sql(
        """
        WITH pos AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DECIMAL(28,6))
                       AS total_pos, COUNT(*) AS n_pos
            FROM t_customer WHERE c_acctbal > 0.0
        ),
        mx AS (SELECT max(o_orderdate) AS max_date FROM t_orders),
        recent AS (
            SELECT DISTINCT o.o_custkey FROM t_orders o, mx
            WHERE o.o_orderdate >= mx.max_date - INTERVAL 90 DAYS
        )
        SELECT c.c_mktsegment, count(*) AS numcust
        FROM t_customer c, pos
        WHERE CAST(c.c_acctbal AS DECIMAL(28,6)) * pos.n_pos > pos.total_pos
          AND NOT EXISTS (SELECT 1 FROM recent r
                          WHERE r.o_custkey = c.c_custkey)
        GROUP BY c.c_mktsegment
        """
    ).collect()
    df = CATALOG["j9_churned_rich_customers"].spark(spark, sf_dir).collect()
    assert {(r.c_mktsegment, r.numcust) for r in df} == {
        (r.c_mktsegment, r.numcust) for r in sql
    }


def test_syndication_matrix_conserves_pair_count(spark, sf_dir):
    from taxi_aws_data_pipeline_spark.ext import dedup as X
    from taxi_aws_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_pairs = X.lsh_candidate_pairs(docs).count()
    matrix = CATALOG["x73_cross_source_syndication_matrix"].spark(spark, sf_dir)
    rows = matrix.collect()
    assert sum(r.n_pairs for r in rows) == n_pairs
    assert all(r.src_lo <= r.src_hi for r in rows)


def test_dau_first_touch_trick_matches_distinct_counts(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    curve = (
        CATALOG["x74_daily_active_users"].spark(spark, sf_dir).orderBy("day").collect()
    )
    assert all(r.new_users <= r.dau for r in curve)
    total_users = ev.filter(F.col("ts").isNotNull()).select("user_id").distinct().count()
    assert curve[-1].cum_users == total_users
    assert sum(r.new_users for r in curve) == total_users
    # day 1: everyone active is new
    assert curve[0].new_users == curve[0].dau == curve[0].cum_users


def test_quality_dup_calibration_accounts_every_doc(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    rows = CATALOG["x75_quality_dup_calibration"].spark(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert all(0 <= r.quality_bin <= 9 for r in rows)
    assert all(0.0 <= r.dup_rate <= 1.0 for r in rows)
    n_fp = (
        docs.select(
            F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))).alias("fp")
        )
        .distinct()
        .count()
    )
    assert sum(r.n_dups for r in rows) == docs.count() - n_fp


def test_source_divergence_on_hand_computable_corpus(spark, tmp_path):
    """Two planted sources: A='a a b' (p=[2/3,1/3]), B='b' (p=[0,1]);
    global p=[1/2,1/2]. TVD(A)=1/6, TVD(B)=1/2 — exact rationals the
    integer formulation must hit to the double's precision."""
    import duckdb

    from taxi_aws_data_pipeline_spark.tables import TABLE_NAMES

    d = tmp_path / "sf_tvd"
    d.mkdir()
    src = "/root/testdata/sf0.001"
    for t in TABLE_NAMES:
        if t != "documents":
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    duckdb.sql(
        f"""
        COPY (SELECT * FROM (VALUES
            (CAST(0 AS BIGINT), 'a a b', 'en', 'A', 5),
            (CAST(1 AS BIGINT), 'b', 'en', 'B', 1)
        ) t(doc_id, text, lang, source, n_chars))
        TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    rows = {
        r.source: r
        for r in CATALOG["x76_source_token_divergence"].spark(spark, str(d)).collect()
    }
    assert rows["A"].n_tokens == 3 and rows["A"].n_distinct_tokens == 2
    assert rows["B"].n_tokens == 1 and rows["B"].n_distinct_tokens == 1
    assert abs(rows["A"].tvd_from_corpus - 1 / 6) < 1e-15
    assert abs(rows["B"].tvd_from_corpus - 1 / 2) < 1e-15


def test_keep_best_rep_has_max_quality_in_cluster(spark, sf_dir):
    from taxi_aws_data_pipeline_spark.ext import dedup as X
    from taxi_aws_data_pipeline_spark.ext import text as TX
    from taxi_aws_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    reps = CATALOG["x77_keep_best_dedup_policy"].spark(spark, sf_dir).collect()
    n_docs = docs.count()
    assert sum(r.n_members for r in reps) == n_docs
    # rebuild (cluster, quality) membership independently
    clusters = {
        r.doc_id: r.cluster_id
        for r in X.near_dup_clusters(docs).collect()
    }
    quality = {
        r.doc_id: r.quality_score
        for r in TX.add_quality_signals(docs).select("doc_id", "quality_score").collect()
    }
    best = {}
    for doc_id, q in quality.items():
        cid = clusters.get(doc_id, doc_id)
        cur = best.get(cid)
        cand = (-q, doc_id)
        if cur is None or cand < cur:
            best[cid] = cand
    assert len(reps) == len(best)
    for r in reps:
        bq, bid = best[r.cluster_id]
        assert r.rep_doc_id == bid
        assert r.rep_quality == -bq


def test_fk_audit_counts_planted_orphans(spark, tmp_path):
    """Copy sf0.001 but drop half the orders rows: every lineitem pointing
    at a dropped order must surface as an orphan on exactly that edge."""
    import duckdb

    from taxi_aws_data_pipeline_spark.tables import TABLE_NAMES

    d = tmp_path / "sf_broken"
    d.mkdir()
    src = "/root/testdata/sf0.001"
    for t in TABLE_NAMES:
        if t == "orders":
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}/orders.parquet' "
                f"WHERE o_orderkey % 2 = 0) TO '{d}/orders.parquet' (FORMAT PARQUET)"
            )
        else:
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    expected_orphans = duckdb.sql(
        f"SELECT count(*) FROM '{src}/lineitem.parquet' "
        f"WHERE l_orderkey % 2 = 1"
    ).fetchone()[0]
    report = {
        r.fk_edge: r
        for r in CATALOG["x68_referential_integrity_audit"]
        .spark(spark, str(d))
        .collect()
    }
    edge = report["lineitem.l_orderkey->orders.o_orderkey"]
    assert edge.n_orphans == expected_orphans
    assert edge.n_null_keys == 0
    # untouched edges stay clean
    assert report["nation.n_regionkey->region.r_regionkey"].n_orphans == 0
    assert report["orders.o_custkey->customer.c_custkey"].n_orphans == 0


def test_no_conditionless_broadcast_joins_in_tree():
    """Every cartesian-on-purpose must say so: a condition-less
    ``.join(F.broadcast(x))`` is an implicit cross join that breaks on
    deployments pinning ``spark.sql.crossJoin.enabled=false``; one-row
    scalar attachment must use ``.crossJoin`` explicitly (the x79/x49
    fix, VERDICT r3 item 4)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / (
        "taxi_aws_data_pipeline_spark"
    )
    offenders = []
    pat = re.compile(r"\.join\(F\.broadcast\([A-Za-z_][\w.]*\)\)\s*($|[.)])")
    for path in pkg.rglob("*.py"):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if pat.search(line):
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_no_data_scaled_collect_in_catalog():
    """No catalog entry body may ``.collect()`` anything that scales
    with a data table (VERDICT r4 item 3 — x176 used to collect every
    fixture doc_id per invocation). The only sanctioned driver-side
    reads are ONE-ROW scalar aggregates (the SURVEY §2.7 batch-stats
    shape) and bounded-cardinality pivot headers, allowlisted here with
    their rationale; anything new must justify itself on this list."""
    import inspect

    allowed = {
        # 1-row median scalar feeding the impute literal (SURVEY §2.7)
        "c1_median_impute_batch": 1,
        # 1-row p99 scalar feeding the cap literal (SURVEY §2.7)
        "c4_p99_outlier_cap": 1,
        # distinct event_type pivot headers — bounded enum cardinality
        "g8_two_phase_dynamic_pivot": 1,
        # r12 greedy-tier rework: each round's pick is a LIMIT-1
        # argmax collected as driver literals (one collect per round,
        # always exactly one row) — replacing the eager 1-row
        # checkpoint + broadcast re-attach that cost 2 extra jobs per
        # sequential round; the per-round row count is bounded by
        # construction, never data-scaled
        "x179_greedy_coverage_picks": 1,
        "x234_greedy_mixture_allocation": 1,
    }
    offenders = {}
    for name, spec in CATALOG.items():
        src = inspect.getsource(spec.spark)
        n = src.count(".collect()")
        if n != allowed.get(name, 0):
            offenders[name] = n
    assert not offenders, offenders


def test_binaryfile_fixture_dir_is_cached(spark, sf_dir):
    """x176's fixture generation is setup, not operator cost: the
    second call for the same sf must return the identical directory
    without rewriting files (same mtimes)."""
    import os

    from taxi_aws_data_pipeline_spark.plans.ext_catalog import (
        _binaryfile_fixture_dir,
    )

    d1 = _binaryfile_fixture_dir(spark, sf_dir)
    stamp = {f: os.stat(os.path.join(d1, f)).st_mtime_ns
             for f in os.listdir(d1)}
    d2 = _binaryfile_fixture_dir(spark, sf_dir)
    assert d2 == d1
    assert {f: os.stat(os.path.join(d2, f)).st_mtime_ns
            for f in os.listdir(d2)} == stamp


def test_driver_window_discipline():
    """The 50-entry driver window must spend every slot on evidence
    conversion (VERDICT r4 item 1): exactly 50 entries, all registered,
    and none that already holds a driver-green row in a committed
    CORRECTNESS_r*.json — re-pins only start once the never-windowed
    backlog is empty (schedule in __spark_entry__.py). When that
    rotation begins, this test's re-pin clause below documents itself
    out of the way."""
    import importlib.util
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", root / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    window = list(mod._PRIORITY)
    assert len(window) == 50, f"window must fill all 50 slots, got {len(window)}"
    assert len(set(window)) == 50, "duplicate window entries waste slots"
    missing = [n for n in window if n not in CATALOG]
    assert not missing, f"window entries absent from CATALOG: {missing}"

    verified = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        verified |= set(json.loads(f.read_text()))
    backlog = [n for n in CATALOG if n not in verified]
    if backlog:
        # every still-unverified entry must outrank any re-pin: the
        # window's FIRST len(backlog) slots are exactly the backlog
        # (in priority order), and only the remaining fill may re-pin
        # already-verified entries (the transition round's shape once
        # the backlog shrinks below a full window)
        head = window[: len(backlog)] if len(backlog) <= 50 else window
        early_repins = [n for n in head if n in verified]
        assert not early_repins, (
            f"{len(backlog)} entries still lack driver evidence but the "
            f"window re-pins already-verified ones ahead of them: "
            f"{early_repins}"
        )
        if len(backlog) <= 50:
            assert set(head) == set(backlog), (
                "window head must drain the entire remaining backlog"
            )


def test_unpartitioned_windows_have_bounded_inputs():
    """An unpartitioned window (``Window.orderBy`` with no partition
    key, ``Window.partitionBy()``, bare ``Window.rowsBetween``)
    funnels its whole input through ONE task, so every use must run
    over a provably bounded frame. The allowlist pins each sanctioned
    entry to its boundedness argument; round 5 converted the four
    data-scaled offenders (a17 RFM, x148 Wilson, x149 quantile map,
    x205 Zipf, x206 Heaps) to orderBy+limit or two-phase numbering —
    a new unpartitioned window must argue its bound here."""
    import inspect
    import re

    # value: why the window input is bounded
    allowed = {
        "x67_key_skew_report": "post-limit(10) rows",
        "x69_event_lateness_profile": "distinct lateness-seconds histogram",
        "x71_vocab_growth_curve": "doc-bucket spine",
        "x74_daily_active_users": "day spine",
        "x102_top_event_paths": "post-limit(20) rows",
        "x110_contingency_residuals": "event_type x segment cells",
        "x134_vocab_growth": "bucket spine",
        "w18_rolling_correlation": "day spine",
        "x147_vocab_encode": "post-limit(1000) vocab rows",
        "a15_ks_two_sample": "distinct n_chars histogram",
        "a16_theil_sen_slope": "bounded day-pair slope grid",
        "a19_runs_test": "day spine",
        "w21_rolling_median": "day spine",
        "a21_mann_whitney_u": "distinct cents histogram",
        "z7_join_order_cost_rank": "3 candidate plans",
        "x173_curriculum_interleave": "distinct source spine",
        "x177_diversified_topk": "post-limit(20) rows",
        "x187_discrete_hazard_table": "bounded age grid",
        "x198_roc_auc_langid": "distinct score-level histogram",
        "x203_bm25_topk": "post-limit(10) rows",
        "x205_zipf_rank_frequency": "post-limit(50) rows",
        "a28_winsorized_mean": "distinct cents histogram",
        "x227_margin_uncertainty_sampling": "post-limit(20) rows",
        "x244_cluster_weighted_sample": "per-source allocation rows",
    }
    pat = re.compile(
        r"Window\s*\.\s*orderBy|Window\s*\.\s*partitionBy\(\)"
        r"|Window\s*\.\s*rowsBetween"
    )
    offenders = {}
    for name, spec in CATALOG.items():
        n = len(pat.findall(inspect.getsource(spec.spark)))
        if n and name not in allowed:
            offenders[name] = n
    assert not offenders, (
        f"unpartitioned windows without a boundedness argument: {offenders}"
    )


def test_next_window_tool_spends_slots_on_backlog():
    """tools/next_window.py is how the next round's _PRIORITY gets
    staged; its drain mode must emit exactly 50 registered entries,
    none already driver-verified, in catalog registration order —
    the same discipline test_driver_window_discipline pins on the
    staged window itself. Once the backlog empties it must flip to
    re-pin mode and emit the least-recently verified entries."""
    import importlib.util
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "next_window", root / "tools" / "next_window.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    window, mode = mod.next_window()
    assert len(window) == 50 and len(set(window)) == 50
    assert all(n in CATALOG for n in window)

    # replay the tool's "verified" definition: the LATEST row decides
    latest = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, v in json.loads(f.read_text()).items():
            latest[name] = bool(
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
                and not v.get("err")
            )
    verified = {n for n, green in latest.items() if green}
    red = [n for n in CATALOG if n in latest and not latest[n]]
    never = [n for n in CATALOG if n not in latest]
    pulled = [n for n in mod.PULL_FORWARD if n in never]
    backlog = red + pulled + [n for n in never if n not in set(pulled)]
    if len(backlog) >= 50:
        assert mode == "drain"
        assert window == backlog[:50], (
            "drain order is reds, pull-forwards, then registration order"
        )
    elif backlog:
        assert mode == "drain"
        assert window[: len(backlog)] == backlog
    else:
        assert mode == "repin"
        assert all(n in verified for n in window)

    # the staged module derives _PRIORITY from this very function at
    # import time (VERDICT r5 item 1), so staleness is impossible —
    # pin the wiring
    espec = importlib.util.spec_from_file_location(
        "__spark_entry__", root / "__spark_entry__.py"
    )
    emod = importlib.util.module_from_spec(espec)
    espec.loader.exec_module(emod)
    assert list(emod._PRIORITY) == window

    # red rows retry AHEAD of never-windowed entries (the r1->r2
    # precedent), and only GREEN rows count as verified; fabricated
    # cases disable pull-forward to isolate the ordering rules
    names = list(CATALOG)
    g = {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": None}
    r = {"rows_match": True, "schema_match": False, "hash_match": False,
         "err": None}
    fabricated = {1: {names[0]: g, names[1]: r, names[2]: g}}
    w2, m2 = mod.next_window(n=3, records=fabricated, pull_forward=())
    assert m2 == "drain"
    assert w2[0] == names[1], "red-only entry must retry first"
    assert names[0] not in w2 and names[2] not in w2

    # green-then-red REGRESSION re-enters the drain backlog and retries
    # first (ADVICE r5 medium: the latest verdict is authoritative — an
    # old green row must not shield a now-failing entry)
    regressed = {1: {names[0]: g, names[1]: g}, 2: {names[1]: r}}
    w2b, m2b = mod.next_window(n=3, records=regressed, pull_forward=())
    assert m2b == "drain"
    assert w2b[0] == names[1], "regressed entry must re-enter and retry first"
    assert names[0] not in w2b, "still-green entry must not be re-pinned"

    # pull-forward entries jump never-windowed registration order but
    # never outrank regression retries, and drop out once verified
    pf = (names[5], names[2])
    w2c, _ = mod.next_window(n=4, records=regressed, pull_forward=pf)
    assert w2c[:3] == [names[1], names[5], names[2]]
    w2d, _ = mod.next_window(
        n=4, records={1: {names[5]: g}}, pull_forward=pf
    )
    assert w2d[0] == names[2] and names[5] not in w2d

    # an explicitly empty records dict means NO records (ADVICE r5:
    # `records or _load_records()` used to silently read disk)
    w2e, m2e = mod.next_window(n=2, records={}, pull_forward=())
    assert m2e == "drain" and w2e == names[:2]

    # backlog empty -> re-pin least-recently-green first
    all_green = {1: {n_: g for n_ in names}}
    all_green[2] = {names[0]: g}
    w3, m3 = mod.next_window(n=2, records=all_green, pull_forward=())
    assert m3 == "repin"
    assert names[0] not in w3, "freshest re-pin must sort last"

    # stale-evidence promotion (VERDICT r8 item 2): a fix-touched entry
    # whose latest green predates its REPIN_FIRST round jumps the
    # re-pin queue ...
    rf = {names[3]: 3}
    recs = {1: {n_: g for n_ in names}, 2: {names[0]: g}}
    w4, m4 = mod.next_window(
        n=2, records=recs, pull_forward=(), repin_first=rf
    )
    assert m4 == "repin" and w4[0] == names[3]
    # ... drops out once a green at/after the fix round lands ...
    recs[3] = {names[3]: g}
    w5, _ = mod.next_window(
        n=2, records=recs, pull_forward=(), repin_first=rf
    )
    assert names[3] not in w5, (
        "a green at the fix round must expire the promotion"
    )
    # ... and a REGRESSED entry retries via the red backlog, never via
    # the stale list (no double-scheduling)
    recs_reg = {1: {n_: g for n_ in names}, 2: {names[3]: r}}
    w6, m6 = mod.next_window(
        n=3, records=recs_reg, pull_forward=(), repin_first=rf
    )
    assert m6 == "drain" and w6[0] == names[3]
    assert w6.count(names[3]) == 1


def test_post_backlog_repin_rotation_is_staged(tmp_path):
    """VERDICT r6 item 5: make the round-9 transition mechanical by
    simulating rounds 7-8 going green on their staged windows and
    pinning what the tool must emit next — the backlog remainder first,
    then the 40 least-recently-green entries (earliest latest-green
    round, registration order as tie-break); one more green round flips
    it to pure re-pin mode. Expected sets are recomputed here from the
    records independently of next_window's own internals."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "next_window", root / "tools" / "next_window.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    g = {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": None}
    records = mod._load_records()
    rnd = max(records)

    def never_windowed() -> list[str]:
        windowed = {n for rec in records.values() for n in rec}
        return [n for n in CATALOG if n not in windowed]

    # drain full windows until less than one window of backlog remains —
    # round count ADAPTS as real CORRECTNESS records land on disk, so
    # this test stays truthful in every future round (round-7 review:
    # a hard-coded two-drain simulation would start failing once the
    # real r7/r8 records shrink the backlog)
    while len(never_windowed()) >= 50:
        win, mode = mod.next_window(records=records)
        assert mode == "drain"
        rnd += 1
        records[rnd] = {n: g for n in win}

    never = never_windowed()
    win_next, mode_next = mod.next_window(records=records)
    # independent reconstruction of the expected fill: each verified
    # entry's latest GREEN round, least recent first
    order = {n: i for i, n in enumerate(CATALOG)}
    latest_green = {}
    for r_ in sorted(records):
        for n, v in records[r_].items():
            if n in CATALOG and v.get("hash_match") and not v.get("err"):
                latest_green[n] = r_
    repin_order = sorted(latest_green, key=lambda n: (latest_green[n], order[n]))
    # stale-evidence promotion (VERDICT r8 item 2): fix-touched entries
    # whose latest green predates the fix round jump the re-pin queue
    stale = sorted(
        (n for n in mod.REPIN_FIRST
         if n in latest_green and latest_green[n] < mod.REPIN_FIRST[n]),
        key=order.__getitem__,
    )
    repin_order = stale + [n for n in repin_order if n not in set(stale)]

    if never:  # transition window: backlog remainder + oldest re-pins
        assert mode_next == "drain"
        assert win_next[: len(never)] == never
        assert win_next[len(never):] == repin_order[: 50 - len(never)]
    else:  # backlog already empty on disk: straight to rotation
        assert mode_next == "repin"
        assert win_next == repin_order[:50]

    # one more green round -> pure re-pin mode, and the freshly
    # verified entries rotate to the BACK of the queue
    records[rnd + 1] = {n: g for n in win_next}
    win_rot, mode_rot = mod.next_window(records=records)
    assert mode_rot == "repin"
    assert not set(win_rot) & set(win_next), (
        "just-verified entries must not be re-pinned immediately"
    )


def test_record_loader_survives_stray_and_damaged_files(tmp_path, capsys):
    """ADVICE r6 (medium): _load_records runs at import time of the
    driver entry, so a stray CORRECTNESS_r06_backup.json (int() on the
    stem used to raise) or a truncated capture must be SKIPPED with a
    warning, never raise — an ImportError there fails the whole round.
    Only exact CORRECTNESS_r<digits>.json stems count."""
    import importlib.util
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "next_window", root / "tools" / "next_window.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    good = {"a1": {"rows_match": True, "schema_match": True,
                   "hash_match": True, "err": None}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(good))
    # stray stem variants: must be ignored entirely (no int() crash)
    (tmp_path / "CORRECTNESS_r06_backup.json").write_text(json.dumps(good))
    (tmp_path / "CORRECTNESS_rXX.json").write_text(json.dumps(good))
    # truncated capture: skipped with a stderr warning
    (tmp_path / "CORRECTNESS_r02.json").write_text('{"a1": {"rows_ma')
    # parseable but not a dict: skipped too
    (tmp_path / "CORRECTNESS_r03.json").write_text("[1, 2]")

    records = mod._load_records(tmp_path)
    assert records == {1: good}
    err = capsys.readouterr().err
    assert "CORRECTNESS_r02.json" in err
    assert "CORRECTNESS_r03.json" in err


def test_pull_forward_entries_are_registered():
    """A typo in tools/next_window.PULL_FORWARD would silently pull
    nothing forward (unknown names are filtered by `in never`); pin
    that every pull-forward name is a registered catalog entry."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "next_window", root / "tools" / "next_window.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    missing = [n for n in mod.PULL_FORWARD if n not in CATALOG]
    assert not missing, f"PULL_FORWARD names not in CATALOG: {missing}"
    bad = [n for n in mod.REPIN_FIRST if n not in CATALOG]
    assert not bad, f"REPIN_FIRST names not in CATALOG: {bad}"


def test_zero_python_udf_rule():
    """SURVEY §2.10: the engine ships ZERO row-at-a-time Python UDFs —
    every parity-surface expression is a native pyspark.sql.function
    (JVM-side, codegen-able). Python crosses the boundary only as
    Arrow-batched mapInPandas / applyInPandas(WithState), which this
    guard deliberately permits. Bans F.udf / @udf / @pandas_udf /
    spark.udf.register so the rule survives future contributors."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / (
        "taxi_aws_data_pipeline_spark"
    )
    pat = re.compile(
        r"\bF\.udf\s*\(|@\s*udf\b|\bpandas_udf\b|\budf\.register\s*\("
    )
    offenders = []
    for path in pkg.rglob("*.py"):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if pat.search(line):
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_bnlj_allowlist_names_are_registered():
    """Every sanctioned nested-loop entry in tests/plan_invariants.py
    must be a live catalog name — a typo or a renamed entry would leave
    a stale sanction (harmless) while the real entry trips the guard
    with a confusing message."""
    from .plan_invariants import BNLJ_SANCTIONED

    missing = [n for n in BNLJ_SANCTIONED if n not in CATALOG]
    assert not missing, f"sanctioned BNLJ names not in CATALOG: {missing}"

    # plan_invariants is the SINGLE membership source; test_plans' finer
    # kind lists (scalar-attach vs small-broadcast) must stay subsets
    from . import test_plans as TP

    fine = TP._BNLJ_SCALAR_ATTACH | TP._BNLJ_SMALL_BROADCAST
    drift = sorted(fine - set(BNLJ_SANCTIONED))
    assert not drift, (
        f"test_plans kind lists name entries missing from "
        f"plan_invariants.BNLJ_SANCTIONED: {drift}"
    )


def test_shard_selection_partitions_the_suite():
    """tools/parallel_suite.sh relies on SPARK_GRAFT_SHARD=i/n
    (conftest) selecting DISJOINT slices whose union is the full
    suite — a drifting hash or an off-by-one would silently drop
    tests from every 'full' parallel run. Verify on collection only
    (no Spark): 2 shards of one test module must partition the
    unsharded collection exactly."""
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]

    def collect(shard: str | None) -> set[str]:
        env = dict(os.environ)
        env.pop("SPARK_GRAFT_SHARD", None)
        if shard:
            env["SPARK_GRAFT_SHARD"] = shard
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_ingest.py",
             "--collect-only", "-q", "-p", "no:cacheprovider"],
            capture_output=True, text=True, timeout=120, env=env, cwd=root,
        )
        return {
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("tests/") and "::" in ln
        }

    full = collect(None)
    s0, s1 = collect("0/2"), collect("1/2")
    assert full, "collection produced no test ids"
    assert s0 | s1 == full
    assert not (s0 & s1)
    assert s0 and s1, "degenerate shard split (all tests in one shard)"


def test_bench_rejects_bad_args_before_spark_starts():
    """ADVICE r5: a dash-typo ('--reps 3') or an unknown query name
    must fail fast — BEFORE a JVM spins up or any record file is
    touched — instead of silently running (and overwriting) a full
    sweep. Runs bench.py in a subprocess with a poisoned JAVA_HOME so
    any attempt to start Spark would itself fail loudly."""
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ, JAVA_HOME="/nonexistent-java")
    for argv, needle in (
        (["--reps", "3"], b"unrecognized arguments"),
        (["no_such_query"], b"unknown bench queries"),
    ):
        proc = subprocess.run(
            [sys.executable, str(root / "bench.py"), *argv],
            capture_output=True,
            timeout=60,
            env=env,
        )
        assert proc.returncode != 0
        assert needle in proc.stderr, proc.stderr[-500:]
    # a typo'd order lever (the r9 position-vs-query discriminator)
    # fails fast too, instead of silently running a forward sweep
    proc = subprocess.run(
        [sys.executable, str(root / "bench.py")],
        capture_output=True,
        timeout=60,
        env=dict(env, SPARK_GRAFT_BENCH_ORDER="bogus"),
    )
    assert proc.returncode != 0
    assert b"SPARK_GRAFT_BENCH_ORDER" in proc.stderr, proc.stderr[-500:]


def test_bench_compare_flags_and_stall_cluster_note(tmp_path):
    """tools/bench_compare.py is the lens every future round reads its
    bench numbers through; pin its three behaviors on fabricated
    records: (a) calibrated flagging divides out the host ratio, (b)
    >=3 flags at consecutive suite positions print the
    transient-host-stall note (the r8 signature: five flags at
    positions 64-68, all clean standalone — BASELINE_HISTORY.md round 9), (c)
    scattered flags do NOT claim positional clustering."""
    import json
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    tool = str(root / "tools" / "bench_compare.py")

    def run(sweep, record):
        s, r = tmp_path / "s.json", tmp_path / "r.json"
        s.write_text(json.dumps(sweep))
        r.write_text(json.dumps(record))
        return subprocess.run(
            [sys.executable, tool, str(s), str(r)],
            capture_output=True, text=True, timeout=60,
        )

    record = {
        "queries": {f"q{i}": 1.0 for i in range(98)}, "value": 98.0,
        "cpu_probe": [0.8, 0.8], "effective_cores": 32,
    }

    # (a) a uniformly 2x-slower box with matching probes: zero flags
    uniform = {
        "queries": {f"q{i}": 2.0 for i in range(98)}, "value": 196.0,
        "cpu_probe": [1.6, 1.6], "effective_cores": 32,
    }
    out = run(uniform, record)
    assert out.returncode == 0, out.stdout
    assert "0 queries over" in out.stdout
    assert "DRIFT" not in out.stdout

    # (b) five consecutive 3x spikes: flagged AND stall-cluster note
    stall = {
        "queries": {f"q{i}": (3.0 if 60 <= i <= 64 else 1.0)
                    for i in range(98)},
        "value": 108.0, "cpu_probe": [0.8, 0.8], "effective_cores": 32,
    }
    out = run(stall, record)
    assert out.returncode == 1
    assert out.stdout.count("DRIFT") == 5
    assert "positionally clustered" in out.stdout
    assert "re-measure flagged queries standalone" in out.stdout

    # (c) five scattered 3x spikes: flagged, but no clustering claim
    scattered = {
        "queries": {f"q{i}": (3.0 if i in (3, 25, 50, 75, 95) else 1.0)
                    for i in range(98)},
        "value": 108.0, "cpu_probe": [0.8, 0.8], "effective_cores": 32,
    }
    out = run(scattered, record)
    assert out.returncode == 1
    assert out.stdout.count("DRIFT") == 5
    assert "positionally clustered" not in out.stdout
    assert "re-measure flagged queries standalone" in out.stdout

    # (c2) TWO stall windows in one sweep (the r10 shape: flags at
    # positions 19-25 and 67-70, all clean standalone) must surface
    # the signature PER window — the old single-span test read the
    # mixed spread as unclustered
    two_stalls = {
        "queries": {f"q{i}": (3.0 if i in (20, 21, 22, 67, 68, 70) else 1.0)
                    for i in range(98)},
        "value": 110.0, "cpu_probe": [0.8, 0.8], "effective_cores": 32,
    }
    out = run(two_stalls, record)
    assert out.returncode == 1
    assert out.stdout.count("positionally clustered") == 2
    assert "positions 20-22" in out.stdout
    assert "positions 67-70" in out.stdout

    # (d) ADVICE r9: a driver wrapper with "parsed": null (the
    # BENCH_r04 failed-parse case) must fall back to the wrapper and
    # hit the vacuous-comparison path — exit 2 (machine-distinguishable
    # from both clean=0 and drift=1), not an AttributeError traceback
    out = run({"n": 99, "rc": 0, "tail": "...", "parsed": None}, record)
    assert out.returncode == 2, (out.stdout, out.stderr)
    assert "vacuous" in out.stdout
    assert "Traceback" not in out.stderr

    # (e) VERDICT r9 item 2: when rep vectors are present ON BOTH
    # SIDES, calibration uses the per-query MIN — one straggler rep
    # (median 3.0, min 1.0) is weather, not a flag; a uniformly slow
    # plan (all reps 3.0) still flags
    rec_with_reps = dict(
        record,
        reps_sec={"q10": [1.0, 1.0, 1.1], "q20": [1.0, 1.1, 1.0]},
    )
    straggler = {
        "queries": {**{f"q{i}": 1.0 for i in range(98)}, "q10": 3.0,
                    "q20": 3.0},
        "reps_sec": {"q10": [3.0, 1.0, 3.2], "q20": [3.0, 2.9, 3.1]},
        "value": 102.0, "cpu_probe": [0.8, 0.8], "effective_cores": 32,
    }
    out = run(straggler, rec_with_reps)
    assert out.returncode == 1, out.stdout
    assert out.stdout.count("DRIFT") == 1
    assert "DRIFT q20" in out.stdout and "q10" not in out.stdout

    # (e2) ADVICE r10: min-of-reps applies only when BOTH sides carry
    # rep vectors — sweep-min vs a pre-r10 record's median would
    # deflate calibrated ratios by the rep spread and mask genuine
    # drift, so a record WITHOUT reps_sec compares median-vs-median
    # and the straggler's 3.0 median now flags
    out = run(straggler, record)
    assert out.returncode == 1, out.stdout
    assert "DRIFT q10" in out.stdout and "DRIFT q20" in out.stdout

    # (f) VERDICT r9 item 7: a flag is annotated with the mid-suite
    # probe reading nearest its run position, timestamping the host
    # state the flag landed on
    probed = {
        "queries": {f"q{i}": (3.0 if i == 41 else 1.0) for i in range(98)},
        "mid_probes": [[20, 0.81], [40, 2.1], [60, 0.83]],
        "value": 100.0, "cpu_probe": [0.8, 0.8], "effective_cores": 32,
    }
    out = run(probed, record)
    assert out.returncode == 1
    assert "nearest probe 2.10s @pos 40 (query @pos 41)" in out.stdout

    # (f2) ADVICE r10: the position-0 timeline anchor is the BEFORE
    # probe of the cpu_probe pair, not the before/after mean — on a
    # sweep whose host state diverged (0.8 -> 2.4), an early flag must
    # be annotated with the actual start-of-sweep reading (0.80s), not
    # a blended 1.60s that never existed
    diverged = {
        # the divergent pair also raises host_ratio (mean probe 1.6 vs
        # 0.8 = 2.0x), so the spike must exceed 2 x threshold to flag
        "queries": {f"q{i}": (4.0 if i == 1 else 1.0) for i in range(98)},
        "value": 101.0, "cpu_probe": [0.8, 2.4], "effective_cores": 32,
    }
    out = run(diverged, record)
    assert out.returncode == 1
    assert "nearest probe 0.80s @pos 0 (query @pos 1)" in out.stdout, (
        out.stdout
    )

    # (g) ADVICE r10: a tail-trimmed driver capture stores queries
    # sorted by descending TIME (not run order) while still carrying
    # mid_probes — positional probe annotations and cluster notes on
    # such a capture are actively misleading and must be suppressed
    trimmed = {
        "queries": {f"q{i}": 3.0 for i in (70, 71, 72, 73)},
        "n_queries": 98, "queries_full_in": "BENCH_SWEEP.json",
        "mid_probes": [[40, 2.1]],
        "value": 110.0, "cpu_probe": [0.8, 0.8], "effective_cores": 32,
    }
    out = run(trimmed, record)
    assert out.returncode == 1
    assert out.stdout.count("DRIFT") == 4
    assert "nearest probe" not in out.stdout
    assert "positionally clustered" not in out.stdout
    assert "tail-trimmed capture" in out.stdout

    # (h) ADVICE r10: a missing/null effective_cores silently becomes
    # the 32.0-core default inside the calibration — the comparison
    # must say so, since on a degraded box the default understates
    # host_ratio and inflates every calibrated ratio
    no_cores = dict(uniform)
    no_cores.pop("effective_cores")
    out = run(no_cores, record)
    assert "no effective_cores probe" in out.stdout
    out = run(uniform, record)
    assert "no effective_cores probe" not in out.stdout
