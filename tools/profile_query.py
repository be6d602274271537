#!/usr/bin/env python3
"""Per-query profile: split a catalog entry's cost into DataFrame-build
time (driver-side collects/counts/persists inside the builder run eagerly
here) vs noop-execution time, and count Spark jobs/stages for each phase.

Usage: python tools/profile_query.py [--reps N] q1 [q2 ...]

Guide §1: measure first. The bench times build+exec together; this tool
says WHERE the seconds go so optimization targets the right phase:
 - t_build  — CATALOG[name].spark(spark, sf): plan construction plus any
   eager actions the builder runs (seed collects, counts, checkpoints)
 - t_exec   — df.write.format("noop"): the declared plan's execution
 - jobs_*   — Spark job count per phase (statusTracker), the stage-launch
   overhead proxy that dominates iterative entries at bench scale
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taxi_aws_data_pipeline_spark.plans import CATALOG  # noqa: E402
from taxi_aws_data_pipeline_spark.session import get_spark  # noqa: E402
from taxi_aws_data_pipeline_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    names = args
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="profile-query")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm like bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, SF_DIR, t).count()

    print(
        f"{'query':44s} {'rep':>3s} {'t_build':>8s} {'t_exec':>8s} "
        f"{'jobs_b':>6s} {'jobs_e':>6s} {'stg_b':>6s} {'stg_e':>6s}"
    )
    for name in names:
        spec = CATALOG[name]
        for rep in range(reps):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"{name} build")
            jobs_before = set(tracker.getJobIdsForGroup(None) or [])
            stages_before = _n_stages(sc)
            t0 = time.perf_counter()
            df = spec.spark(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            jobs_mid = set(tracker.getJobIdsForGroup(None) or [])
            stages_mid = _n_stages(sc)
            sc.setJobDescription(f"{name} exec")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t0
            jobs_after = set(tracker.getJobIdsForGroup(None) or [])
            stages_after = _n_stages(sc)
            sc.setJobDescription(None)
            print(
                f"{name:44s} {rep:3d} {t_build:8.3f} {t_exec:8.3f} "
                f"{len(jobs_mid - jobs_before):6d} "
                f"{len(jobs_after - jobs_mid):6d} "
                f"{stages_mid - stages_before:6d} "
                f"{stages_after - stages_mid:6d}"
            )
    spark.stop()


def _n_stages(sc) -> int:
    # total stages submitted so far (completed+active+failed), via the
    # JVM status store; falls back to -1 if the API shape changes
    try:
        return sc._jsc.sc().statusStore().stageList(None).size()
    except Exception:
        return -1


if __name__ == "__main__":
    main()
