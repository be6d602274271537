from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CI-only inline plan guards in library code (x180's pre-checkpoint edge
# check) are gated on this flag so a deployed job never imports a foreign
# package that happens to be named `tests` (ADVICE r8). Set here, every
# pytest run — including the full-catalog parity sweep — exercises them.
os.environ.setdefault("SPARK_GRAFT_PLAN_GUARD", "1")

from taxi_aws_data_pipeline_spark.session import get_spark  # noqa: E402

TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Deterministic test sharding for tools/parallel_suite.sh.

    ``SPARK_GRAFT_SHARD=i/n`` keeps only items whose stable nodeid hash
    lands in shard ``i`` (0-based) of ``n``; unset → no-op. Each shard
    runs in its own process (own Spark JVM, own warehouse dir), so the
    union of the n shards is exactly one full suite — pytest-xdist
    without the plugin (VERDICT r6 item 4; xdist is not installed and
    installs are off-limits)."""
    import hashlib

    spec = os.environ.get("SPARK_GRAFT_SHARD")
    if not spec:
        return
    idx_s, sep, total_s = spec.partition("/")
    if not (sep and idx_s.isdigit() and total_s.isdigit()):
        raise pytest.UsageError(
            f"SPARK_GRAFT_SHARD must be 'i/n' (e.g. 0/4), got {spec!r}"
        )
    idx, total = int(idx_s), int(total_s)
    if not 0 <= idx < total:
        raise pytest.UsageError(
            f"SPARK_GRAFT_SHARD index out of range: {spec!r}"
        )
    keep, drop = [], []
    for item in items:
        h = int(hashlib.md5(item.nodeid.encode()).hexdigest(), 16)
        (keep if h % total == idx else drop).append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="taxi-engine-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA_SF
