"""Adversarial mass-duplication stress for the dedup tier: one document
copied 500x (plus distinct tail docs). Exact dedup must collapse it to
ONE group with a min-id keeper; the LSH -> connected-components path
must place every copy in ONE cluster in O(log n) rounds — the quasi-
clique shape (C(500,2) ~ 125k candidate pairs from one band bucket) that
makes naive label propagation and all-pairs verification melt at scale."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from taxi_aws_data_pipeline_spark.ext import dedup as X
from taxi_aws_data_pipeline_spark.plans import CATALOG
from taxi_aws_data_pipeline_spark.tables import TABLE_NAMES, load_table

SRC = "/root/testdata/sf0.001"
N_COPIES = 500
N_DISTINCT = 100


@pytest.fixture(scope="module")
def megadup_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_megadup")
    for t in TABLE_NAMES:
        if t == "documents":
            duckdb.sql(
                f"""
                COPY (
                    SELECT CAST(i AS BIGINT) AS doc_id,
                           CASE WHEN i < {N_COPIES}
                                THEN 'the same viral boilerplate passage '
                                     || 'repeated across mirrors and scrapes '
                                     || 'of the exact identical page text'
                                ELSE 'unique document number ' || i
                                     || ' with its own words about topic '
                                     || (i * 37 % 91)
                           END AS text,
                           'en' AS lang,
                           CASE WHEN i % 3 = 0 THEN 'web'
                                WHEN i % 3 = 1 THEN 'mirror'
                                ELSE 'scrape' END AS source,
                           60 + (i % 40) AS n_chars
                    FROM range({N_COPIES + N_DISTINCT}) t(i)
                ) TO '{d}/documents.parquet' (FORMAT PARQUET)
                """
            )
        else:
            duckdb.sql(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(d)


def test_exact_dedup_collapses_mass_duplicate(spark, megadup_dir):
    groups = CATALOG["x5_exact_dedup_groups"].spark(spark, megadup_dir)
    rows = groups.collect()
    assert len(rows) == 1 + N_DISTINCT
    hot = [r for r in rows if r.copies > 1]
    assert len(hot) == 1
    assert hot[0].copies == N_COPIES
    assert hot[0].keeper_id == 0  # deterministic min-id keeper


def test_lsh_cc_clusters_mass_duplicate_into_one(spark, megadup_dir):
    docs = load_table(spark, megadup_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    labels = {
        r.doc_id: r.cluster_id for r in X.near_dup_clusters(docs).collect()
    }
    # every copy reachable -> one cluster labeled by the min doc id
    assert {labels.get(i, i) for i in range(N_COPIES)} == {0}
    # distinct tail docs must NOT be absorbed into the mega-cluster
    absorbed = [
        i for i in range(N_COPIES, N_COPIES + N_DISTINCT)
        if labels.get(i, i) == 0
    ]
    assert not absorbed, f"distinct docs absorbed by the clique: {absorbed}"


def test_eager_checkpoint_observe_delivers_exact_metrics(spark):
    # The r11 CC loops ride their per-round convergence signature on the
    # eager localCheckpoint's materialization via observe(): this pins
    # the platform contract they rely on — an EAGER checkpoint fires the
    # metrics listener with the computed (exactly-once) values, and the
    # observed count/xxhash signature equals a direct aggregation of the
    # same frame. (A non-eager checkpoint returns zeros — the pitfall the
    # dedup.py comments document; if Spark ever changes either behavior,
    # this test localizes the break before the CC parity entries do.)
    from pyspark.sql import Observation

    df = spark.range(1000).select(
        F.col("id").alias("u"), (F.col("id") % 7).alias("v")
    )
    obs = Observation()
    ck = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v")).alias("h"),
    ).localCheckpoint(eager=True)
    direct = ck.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.xxhash64("u", "v")).alias("h")
    ).collect()[0]
    got = obs.get
    assert got["n"] == direct.n == 1000
    assert got["h"] == direct.h
    # empty-input shape: count stays 0 (never NULL), hash sum is NULL —
    # the (0, None) signature both CC loops treat as the empty fixpoint
    obs_empty = Observation()
    (
        df.filter(F.col("u") < 0)
        .observe(
            obs_empty,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v")).alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    got_empty = obs_empty.get
    assert got_empty["n"] == 0 and got_empty["h"] is None
