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
def parity_results(spark, sf_dir, request):
    """One threaded sweep over the SQL-backed catalog (r12 — see
    oracle_utils.threaded_sweep); each parametrized test below reads
    its entry's recorded outcome."""
    import threading

    from .oracle_utils import threaded_sweep

    tl = threading.local()

    def check(name):
        spec = CATALOG[name]
        try:
            df = spec.spark(spark, sf_dir)
            # catalog-wide physical invariants ride along for free: the
            # plan is built here anyway (tests/plan_invariants.py — no
            # CartesianProduct ever; BroadcastNestedLoopJoin only with
            # a boundedness argument)
            check_plan_invariants(
                name, df._jdf.queryExecution().executedPlan().toString()
            )
            got = df.toPandas()
            con = getattr(tl, "con", None)
            if con is None:
                con = tl.con = duckdb_connection(sf_dir)
            want = con.execute(spec.oracle).fetchdf()
            res = compare_frames(got, want)
            if not res.ok:
                return f"{name}: {res.detail}"
            if not res.exact:
                return (
                    f"{name}: values only approximately equal "
                    f"(max float diff {res.max_float_diff:g}) — driver "
                    "hash would fail"
                )
            return None
        except AssertionError as exc:  # plan invariant violations
            return str(exc)
        except Exception as exc:
            return f"{name} raised: {exc!r}"

    return threaded_sweep(SQL_BACKED, check, request=request)


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(parity_results, name):
    assert parity_results[name] is None, parity_results[name]


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
