"""S10/S11 landing-zone ingestion (reference s3_uploader.py:8-299):
versioned sessions, cross-session filename idempotency, latest/
aliases, bootstrap, verification — exercised over file:// through the
same Hadoop FileSystem code path that serves s3a:// on a cluster."""

from __future__ import annotations

import shutil

import pytest

from taxi_aws_data_pipeline_spark.ingest import (
    ensure_landing_root,
    ingest_raw_files,
    verify_landing,
)

SRC = "/root/testdata/sf0.001"


@pytest.fixture()
def raw_dir(tmp_path):
    """A mutable copy of the sf0.001 parquet files (the reference's
    data/raw/)."""
    d = tmp_path / "raw"
    d.mkdir()
    for t in ("region", "nation", "customer"):
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    return d


def test_first_ingest_lands_everything(spark, raw_dir, tmp_path):
    landing = str(tmp_path / "landing")
    out = ingest_raw_files(
        spark, f"{raw_dir}/*.parquet", landing, session_id="s1"
    )
    assert out["ok"] and out["session"] == "s1"
    assert out["uploaded"] == ["customer.parquet", "nation.parquet",
                              "region.parquet"]
    assert out["skipped"] == [] and out["invalid"] == []
    v = verify_landing(spark, landing)
    assert v["sessions"] == ["s1"]
    assert sorted(v["latest"]) == out["uploaded"]
    assert v["total_bytes"] == sum(
        (raw_dir / n).stat().st_size for n in out["uploaded"]
    )
    # S10 feeds S1: the latest/ view is directly scannable
    got = spark.read.parquet(f"{landing}/latest/region.parquet").count()
    want = spark.read.parquet(f"{SRC}/region.parquet").count()
    assert got == want > 0


def test_rerun_is_idempotent_and_leaves_no_empty_session(
    spark, raw_dir, tmp_path
):
    landing = str(tmp_path / "landing")
    ingest_raw_files(spark, f"{raw_dir}/*.parquet", landing, session_id="s1")
    out = ingest_raw_files(
        spark, f"{raw_dir}/*.parquet", landing, session_id="s2"
    )
    assert out["uploaded"] == []
    assert out["skipped"] == ["customer.parquet", "nation.parquet",
                              "region.parquet"]
    # an all-skipped run must not leave an empty upload_s2/ marker
    assert verify_landing(spark, landing)["sessions"] == ["s1"]


def test_new_and_same_named_files(spark, raw_dir, tmp_path):
    """Only genuinely NEW basenames land in a later session; a CHANGED
    file under an existing name is skipped — the reference's
    filename-level idempotency (s3_uploader.py:56-69), pinned here so
    the semantic is deliberate, not accidental."""
    landing = str(tmp_path / "landing")
    ingest_raw_files(spark, f"{raw_dir}/*.parquet", landing, session_id="s1")
    size_before = verify_landing(spark, landing)["latest"]["region.parquet"]

    shutil.copy(f"{SRC}/supplier.parquet", raw_dir / "supplier.parquet")
    shutil.copy(f"{SRC}/orders.parquet", raw_dir / "region.parquet")
    out = ingest_raw_files(
        spark, f"{raw_dir}/*.parquet", landing, session_id="s2"
    )
    assert out["uploaded"] == ["supplier.parquet"]
    assert "region.parquet" in out["skipped"]
    v = verify_landing(spark, landing)
    assert v["sessions"] == ["s1", "s2"]
    assert v["latest"]["region.parquet"] == size_before  # alias untouched
    assert "supplier.parquet" in v["latest"]


def test_invalid_files_reported_not_uploaded(spark, raw_dir, tmp_path):
    (raw_dir / "empty.parquet").touch()
    landing = str(tmp_path / "landing")
    out = ingest_raw_files(
        spark, f"{raw_dir}/*.parquet", landing, session_id="s1"
    )
    assert not out["ok"]
    assert out["invalid"] == ["empty.parquet"]
    assert "empty.parquet" not in verify_landing(spark, landing)["latest"]


def test_duplicate_basenames_across_dirs_land_once(spark, raw_dir, tmp_path):
    """ADVICE r6: a glob spanning directories can match two files with
    the same basename; the first (path order) must land, the second be
    reported invalid — never a mid-run copy collision that aborts with
    files half-landed."""
    b1, b2 = raw_dir / "batch1", raw_dir / "batch2"
    b1.mkdir(), b2.mkdir()
    shutil.copy(f"{SRC}/region.parquet", b1 / "region.parquet")
    shutil.copy(f"{SRC}/orders.parquet", b2 / "region.parquet")
    shutil.copy(f"{SRC}/supplier.parquet", b2 / "supplier.parquet")
    landing = str(tmp_path / "landing")
    out = ingest_raw_files(
        spark, f"{raw_dir}/batch*/*.parquet", landing, session_id="s1"
    )
    # batch1/region.parquet sorts first in path order and wins
    assert out["uploaded"] == ["region.parquet", "supplier.parquet"]
    assert out["invalid"] == ["region.parquet (duplicate basename in glob)"]
    assert not out["ok"]
    v = verify_landing(spark, landing)
    assert v["sessions"] == ["s1"]
    # the landed region.parquet is the batch1 copy (region-sized)
    assert v["latest"]["region.parquet"] == (b1 / "region.parquet").stat().st_size


def test_bootstrap_and_bad_root(spark, tmp_path):
    root = str(tmp_path / "fresh" / "nested")
    assert ensure_landing_root(spark, root) is True
    assert ensure_landing_root(spark, root) is False
    f = tmp_path / "afile"
    f.write_text("x")
    with pytest.raises(ValueError, match="landing root is a file"):
        ensure_landing_root(spark, str(f))
    # verifying an absent root is a clean empty result, not an error
    v = verify_landing(spark, str(tmp_path / "absent"))
    assert v == {"sessions": [], "latest": {}, "total_bytes": 0}
