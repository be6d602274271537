"""Runtime skew-equivalence stress: the salted formulations (k1 agg,
k3 join — SURVEY §2's 100 TB skew levers) must produce results
IDENTICAL to the plain unsalted forms on a corpus where one key holds
~90% of all rows. The DuckDB parity sweep proves them correct on the
driver testdata; this planted-skew fixture proves the salting math
(partial per (key, salt) → exact merge per key) is skew-invariant, not
just benign-distribution-invariant."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from taxi_aws_data_pipeline_spark.plans import CATALOG
from taxi_aws_data_pipeline_spark.tables import TABLE_NAMES, load_table

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    """sf0.001 with events/orders rebuilt so one key dominates:
    - events: every event_id % 10 != 0 is rewritten to event_type
      'view' (one group takes ~90% of rows, exercising k1's hot-group
      salting);
    - orders: every o_orderkey % 10 != 0 is rewritten to the smallest
      custkey (one customer owns ~90% of orders, exercising k3's hot
      join key)."""
    d = tmp_path_factory.mktemp("sf_skewed")
    for t in TABLE_NAMES:
        if t == "events":
            duckdb.sql(
                f"""
                COPY (SELECT event_id, ts, user_id,
                             CASE WHEN event_id % 10 = 0 THEN event_type
                                  ELSE 'view' END AS event_type,
                             value, props
                      FROM '{SRC}/events.parquet')
                TO '{d}/events.parquet' (FORMAT PARQUET)
                """
            )
        elif t == "orders":
            duckdb.sql(
                f"""
                COPY (SELECT * REPLACE (
                          CASE WHEN o_orderkey % 10 = 0 THEN o_custkey
                               ELSE (SELECT min(c_custkey)
                                     FROM '{SRC}/customer.parquet')
                          END AS o_custkey)
                      FROM '{SRC}/orders.parquet')
                TO '{d}/orders.parquet' (FORMAT PARQUET)
                """
            )
        else:
            duckdb.sql(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(d)


def test_salted_agg_equals_plain_groupby_under_skew(spark, skewed_dir):
    salted = {
        (r.event_type): (r.event_count, r.total_value)
        for r in CATALOG["k1_salted_skew_agg"].spark(spark, skewed_dir).collect()
    }
    ev = load_table(spark, skewed_dir, "events")
    plain = {
        r.event_type: (r.event_count, r.total_value)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("event_id").alias("event_count"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,6)")), 2
            ).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert salted == plain
    # the fixture really is skewed: the hot group holds >=85% of rows
    total = sum(c for c, _ in plain.values())
    assert max(c for c, _ in plain.values()) >= 0.85 * total


def test_salted_join_equals_plain_join_under_skew(spark, skewed_dir):
    salted = {
        r.c_mktsegment: (r.order_count, r.total_revenue)
        for r in CATALOG["k3_salted_skew_join"].spark(spark, skewed_dir).collect()
    }
    od = load_table(spark, skewed_dir, "orders")
    cust = load_table(spark, skewed_dir, "customer")
    plain = {
        r.c_mktsegment: (r.order_count, r.total_revenue)
        for r in od.join(cust, od.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")), 2
            ).cast("double").alias("total_revenue"),
        )
        .collect()
    }
    assert salted == plain
    # the hot customer's segment dominates the joined row count
    total = sum(c for c, _ in plain.values())
    assert max(c for c, _ in plain.values()) >= 0.85 * total
