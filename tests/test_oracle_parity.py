"""Run every catalog query against its DuckDB oracle at small scale —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from taxi_aws_data_pipeline_spark.plans import CATALOG

from .oracle_utils import compare_frames, duckdb_connection
from .plan_invariants import check_plan_invariants

SQL_BACKED = sorted(n for n, s in CATALOG.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in CATALOG.items() if s.oracle is None)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(spark, sf_dir, oracle, name):
    spec = CATALOG[name]
    df = spec.spark(spark, sf_dir)
    # catalog-wide physical invariants ride along for free: the plan is
    # built here anyway (tests/plan_invariants.py — no CartesianProduct
    # ever; BroadcastNestedLoopJoin only with a boundedness argument)
    check_plan_invariants(
        name, df._jdf.queryExecution().executedPlan().toString()
    )
    got = df.toPandas()
    want = oracle.execute(spec.oracle).fetchdf()
    res = compare_frames(got, want)
    assert res.ok, f"{name}: {res.detail}"
    assert res.exact, (
        f"{name}: values only approximately equal "
        f"(max float diff {res.max_float_diff:g}) — driver hash would fail"
    )


# ROWS_ONLY has been empty since round 4 (every catalog entry is
# oracle-backed); an empty parametrize used to surface as the suite's
# one unexplained SKIPPED row (VERDICT r4 item 5). Assert the stronger
# property explicitly instead, and keep the weaker runs-at-all check
# alive for any future rows-only entry.
@pytest.mark.parametrize("name", ROWS_ONLY or ["<no-rows-only-entries>"])
def test_rows_only_query_runs(spark, sf_dir, name):
    if name == "<no-rows-only-entries>":
        assert ROWS_ONLY == [], "stale sentinel: rows-only entries exist"
        return
    df = CATALOG[name].spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
