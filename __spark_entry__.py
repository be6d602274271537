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
# round. Evidence ledger: rounds 1-5 drove 227 of the 387 catalog
# entries driver-green (CORRECTNESS_r01-r05); 160 remain never-windowed.
# VERDICT r4 item 1 freezes catalog growth and spends every window slot
# on draining that backlog; regression freshness for already-verified
# entries is carried by tests/test_oracle_parity.py +
# test_vanilla_session.py, which run the IDENTICAL DuckDB compare over
# the FULL catalog every session.
#
# Since round 6 the window is DERIVED AT IMPORT TIME from the committed
# CORRECTNESS_r*.json records (VERDICT r5 item 1) — staleness between
# rounds is structurally impossible because there is nothing to paste.
# Ordering contract (tools/next_window.py, pinned by tests/test_audit):
# regressed-red entries retry first, then pull-forwards (s10/s11 —
# VERDICT r5 item 2, the remaining driver-verifiable streaming rows),
# then never-windowed entries in registration order; once the backlog
# empties (~mid-round 9 at 50/round) the window rotates re-pins,
# least-recently-green first.
from tools.next_window import next_window  # noqa: E402

_PRIORITY, _WINDOW_MODE = next_window()
_PRIORITY = tuple(_PRIORITY)


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
