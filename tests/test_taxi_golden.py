"""Golden end-to-end test (SURVEY.md §5.2): synthetic taxi fixture with
every FIXTURES.md §1 pathology → full Spark pipeline → five metric tables
compared against an independent pandas oracle implementing the reference
semantics (data_processing.py:73-912)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from taxi_aws_data_pipeline_spark import pipeline

from .taxi_fixture import (
    oracle_clean,
    oracle_load,
    oracle_metrics,
    oracle_transform,
    write_fixture_files,
)

# pandas .round(2) (HALF_EVEN on binary doubles) vs Spark bround can land
# a cent apart exactly at representable .xx5 boundaries; anything larger
# is a real semantic divergence.
ATOL = 0.011


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("taxi_fixture")
    return write_fixture_files(str(d))


@pytest.fixture(scope="module")
def golden(fixture_paths):
    df = oracle_transform(oracle_clean(oracle_load(fixture_paths)))
    return oracle_metrics(df)


@pytest.fixture(scope="module")
def result(spark, fixture_paths, tmp_path_factory):
    out = tmp_path_factory.mktemp("taxi_out")
    return pipeline.run_batch(
        spark, [str(p) for p in fixture_paths], str(out), processing_id="golden"
    )


def _compare(spark_df, golden_pdf, keys):
    got = spark_df.toPandas().sort_values(keys).reset_index(drop=True)
    want = golden_pdf.sort_values(keys).reset_index(drop=True)
    assert list(got.columns) == list(want.columns), (
        f"columns: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"rows: {len(got)} vs {len(want)}"
    for c in want.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(w) or pd.api.types.is_float_dtype(g):
            np.testing.assert_allclose(
                g.astype(float), w.astype(float), atol=ATOL, rtol=0,
                err_msg=f"column {c}",
            )
        else:
            gs = g.astype("object").where(pd.notna(g), None)
            ws = w.astype("object").where(pd.notna(w), None)
            mism = [
                (i, a, b) for i, (a, b) in enumerate(zip(gs, ws)) if a != b
            ]
            assert not mism, f"column {c}: first mismatches {mism[:5]}"


@pytest.mark.parametrize(
    "name,keys",
    [
        ("vendor_performance", ["VendorID"]),
        ("hourly_demand", ["pickup_hour"]),
        ("pickup_location_analysis", ["PULocationID"]),
        ("payment_analysis", ["payment_type"]),
        ("monthly_summary", ["pickup_year", "pickup_month"]),
    ],
)
def test_metric_matches_pandas_oracle(result, golden, name, keys):
    _compare(result.metric_frames[name], golden[name], keys)


def test_cleaned_row_count_matches_oracle(result, golden, fixture_paths):
    oracle_rows = len(oracle_clean(oracle_load(fixture_paths)))
    assert result.cleaned.count() == oracle_rows


def test_metrics_csv_roundtrip_values(result, spark):
    """S8 (dp:505-538): header, quoting, and float precision must survive
    the CSV sink — values read back under the original schema equal the
    in-memory metric frame, not merely its row count."""
    for name, path in result.metric_paths.items():
        frame = result.metric_frames[name]
        back = spark.read.option("header", True).schema(frame.schema).csv(path)
        keys = [frame.columns[0]]
        got = back.toPandas().sort_values(keys).reset_index(drop=True)
        want = frame.toPandas().sort_values(keys).reset_index(drop=True)
        assert list(got.columns) == list(want.columns), name
        for c in want.columns:
            g, w = got[c], want[c]
            if pd.api.types.is_float_dtype(w):
                np.testing.assert_allclose(
                    g.astype(float), w.astype(float), atol=1e-9, rtol=0,
                    err_msg=f"{name}.{c}",
                )
            else:
                assert g.tolist() == w.tolist(), f"{name}.{c}"


def test_outputs_written(result, spark):
    fact = spark.read.parquet(result.fact_path)
    assert fact.count() == result.cleaned.count()
    # partitioned layout → partition columns survive a read roundtrip
    assert {"pickup_year", "pickup_month"} <= set(fact.columns)
    for name, path in result.metric_paths.items():
        csv = spark.read.option("header", True).csv(path)
        assert csv.count() == result.metric_frames[name].count(), name
