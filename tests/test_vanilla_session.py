"""Driver-session robustness: every catalog entry must run on a session
with vanilla Spark 4 defaults (ANSI on, no nanos conf, non-UTC timezone).

The round-1 harness handed ``queries()`` a vanilla session and 20 of 50
entries died on conf-dependent reads/casts (CORRECTNESS_r01.json). The fix
is the runtime conf pin in ``tables.pin_session_confs`` — these tests keep
that contract from regressing, using the shared test JVM (one local Spark
JVM at a time) by resetting the SQL confs to vanilla defaults before each
entry and letting ``load_table`` re-pin them.
"""

from __future__ import annotations

import pytest

from taxi_aws_data_pipeline_spark.plans import CATALOG

# Vanilla Spark 4 defaults the driver harness runs with (plus a deliberately
# hostile non-UTC timezone — worse than the driver's, to prove the pin).
_VANILLA = {
    "spark.sql.ansi.enabled": "true",
    "spark.sql.session.timeZone": "America/New_York",
}
_UNSET = ("spark.sql.legacy.parquet.nanosAsLong",)


def _go_vanilla(spark):
    for key, value in _VANILLA.items():
        spark.conf.set(key, value)
    for key in _UNSET:
        spark.conf.unset(key)


def _restore(spark):
    # the builder-session values (session.py bucket 1)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


@pytest.fixture(autouse=True)
def _always_restore(spark):
    yield
    _restore(spark)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_entry_survives_vanilla_confs(spark, sf_dir, name):
    _go_vanilla(spark)
    df = CATALOG[name].spark(spark, sf_dir)
    assert df.count() >= 0  # materialize: ANSI CAST/read errors fire here


def test_timezone_pin_keeps_event_hours_stable(spark, sf_dir):
    """Date-part results must not depend on the session timezone the caller
    started with: load_table pins UTC before the plan is built."""
    _restore(spark)
    utc_rows = sorted(
        CATALOG["a2_hourly_demand"].spark(spark, sf_dir).collect(),
        key=lambda r: r[0],
    )
    _go_vanilla(spark)
    ny_rows = sorted(
        CATALOG["a2_hourly_demand"].spark(spark, sf_dir).collect(),
        key=lambda r: r[0],
    )
    assert utc_rows == ny_rows
