"""The scheduler example (examples/daily_incremental.py — the
spark-submit/cron twin of the reference's Prefect daily deployment,
prefect_flows.py:1024-1051) must stay runnable: one subprocess run over
the taxi fixture lands the fact table, five metric CSVs and the latest/
alias; the re-run is a manifest no-op."""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

from .taxi_fixture import write_fixture_files

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(landing, out, manifest):
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_DRIVER_MEM="4g",
    )
    return subprocess.run(
        [
            sys.executable,
            str(ROOT / "examples" / "daily_incremental.py"),
            "--input-dir", str(landing),
            "--output-dir", str(out),
            "--manifest", str(manifest),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=ROOT,
    )


def test_continuous_ingest_example_end_to_end(tmp_path):
    """The checkpoint-backed hourly twin: first run drains the landing
    dir through the pipeline exactly once; the re-run is a checkpoint
    no-op (no manifest anywhere)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    write_fixture_files(str(landing))
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", SPARK_GRAFT_DRIVER_MEM="4g")

    def run():
        return subprocess.run(
            [
                sys.executable,
                str(ROOT / "examples" / "continuous_ingest.py"),
                "--input-dir", str(landing),
                "--output-dir", str(out),
                "--checkpoint", str(ckpt),
            ],
            capture_output=True, text=True, timeout=300, env=env, cwd=ROOT,
        )

    first = run()
    assert first.returncode == 0, first.stderr[-2000:]
    assert "batch 0 ->" in first.stdout
    fact_parts = list(
        out.glob("processed/taxi/*/pickup_year=*/pickup_month=*/*.parquet")
    )
    assert fact_parts, "partitioned fact table missing"

    second = run()
    assert second.returncode == 0, second.stderr[-2000:]
    assert "no new files" in second.stdout


def test_cron_submit_script_parses_and_is_executable():
    script = ROOT / "examples" / "cron_submit.sh"
    assert os.access(script, os.X_OK), "cron_submit.sh must be executable"
    proc = subprocess.run(
        ["bash", "-n", str(script)], capture_output=True, text=True, timeout=30
    )
    assert proc.returncode == 0, proc.stderr


def test_cron_submit_lock_and_exit_code_semantics(tmp_path):
    """ADVICE r8: the old `flock -E 200 spark-submit ...` shared the
    conflict code with spark-submit's own exit-code space, so a job that
    exited 200 was misread as lock contention and cron never alerted.
    The FD-held lock separates the two: run the script against a shimmed
    spark-submit and pin (a) a job exit code — including 200 — reaches
    cron untouched, (b) a held lock is a silent exit-0 skip, (c) a
    normal run succeeds and actually invoked the shim."""
    shim = tmp_path / "bin"
    shim.mkdir()
    calls = tmp_path / "calls.log"
    fake = shim / "spark-submit"
    fake.write_text(
        "#!/usr/bin/env bash\n"
        f"echo \"$@\" >> {calls}\n"
        'exit "${FAKE_SPARK_EXIT:-0}"\n'
    )
    fake.chmod(0o755)
    lockfile = tmp_path / "cron.lock"
    env = dict(
        os.environ,
        PATH=f"{shim}:{os.environ['PATH']}",
        TAXI_LOCKFILE=str(lockfile),
        TAXI_LANDING=str(tmp_path / "landing"),
        TAXI_OUTPUT=str(tmp_path / "out"),
        TAXI_MANIFEST=str(tmp_path / "manifest"),
    )
    script = str(ROOT / "examples" / "cron_submit.sh")

    def run(**extra):
        return subprocess.run(
            ["bash", script], capture_output=True, text=True,
            timeout=120, env={**env, **extra},
        )

    # (c) normal run: exit 0, shim invoked with the configured args
    ok = run()
    assert ok.returncode == 0, ok.stderr
    assert str(tmp_path / "landing") in calls.read_text()

    # (a) job failure codes propagate untouched — 200 especially, the
    # code the old pattern swallowed as "lock contention, exit 0"
    for code in (1, 200):
        failed = run(FAKE_SPARK_EXIT=str(code))
        assert failed.returncode == code, (
            f"spark-submit exit {code} must reach cron, got "
            f"{failed.returncode}: {failed.stdout} {failed.stderr}"
        )
        assert "skipping" not in failed.stdout

    # (b) contended lock: silent skip, exit 0, spark-submit NOT run
    holder = subprocess.Popen(["flock", str(lockfile), "sleep", "30"])
    try:
        # wait until the holder actually owns the lock
        import time

        for _ in range(100):
            probe = subprocess.run(
                ["flock", "-n", str(lockfile), "true"], timeout=10
            )
            if probe.returncode != 0:
                break
            time.sleep(0.05)
        else:
            raise AssertionError("background flock never acquired the lock")
        n_calls = len(calls.read_text().splitlines())
        skipped = run()
        assert skipped.returncode == 0, skipped.stderr
        assert "previous run still active" in skipped.stdout
        assert len(calls.read_text().splitlines()) == n_calls, (
            "a lock-contended fire must not reach spark-submit"
        )
    finally:
        holder.kill()
        holder.wait()


def test_daily_incremental_example_end_to_end(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    write_fixture_files(str(landing))
    out = tmp_path / "out"
    # URI-schemed input + manifest, as a cluster deployment would pass
    # (s3a://, hdfs://) — pins the round-7 read_manifest URI fix through
    # the example itself; output stays a bare path so the glob asserts
    # below read the local tree directly
    landing_uri = f"file://{landing}"
    manifest = f"file://{tmp_path}/manifest"

    first = _run(landing_uri, out, manifest)
    assert first.returncode == 0, first.stderr[-2000:]
    assert "processed 2 file(s)" in first.stdout

    fact_parts = list(
        out.glob("processed/taxi/*/pickup_year=*/pickup_month=*/*.parquet")
    )
    assert fact_parts, "partitioned fact table missing"
    metrics = {p.parent.name for p in out.glob("processed/metrics/*/*/*.csv")}
    assert metrics == {
        "vendor_performance", "hourly_demand", "pickup_location_analysis",
        "payment_analysis", "monthly_summary",
    }
    assert list(out.glob("processed/taxi/latest/*.parquet"))

    # idempotent re-run: manifest gates everything, outputs untouched
    before = sorted(str(p) for p in out.rglob("*.parquet"))
    second = _run(landing_uri, out, manifest)
    assert second.returncode == 0, second.stderr[-2000:]
    assert "no new files" in second.stdout
    assert sorted(str(p) for p in out.rglob("*.parquet")) == before


def test_daily_incremental_retry_is_idempotent(tmp_path):
    """ADVICE r7: if run_batch_df succeeds but append_manifest fails (or
    the process dies between them), the retry must land on the SAME
    content-keyed fact directory — not a second one under a fresh
    timestamp. Simulated by deleting the manifest after a successful
    run: the retry reprocesses the identical new-file set and must
    leave exactly one fact directory."""
    landing = tmp_path / "landing"
    landing.mkdir()
    write_fixture_files(str(landing))
    out = tmp_path / "out"
    manifest = tmp_path / "manifest"

    first = _run(str(landing), out, str(manifest))
    assert first.returncode == 0, first.stderr[-2000:]
    dirs_first = sorted(
        p.name for p in (out / "processed" / "taxi").iterdir()
        if p.is_dir() and p.name != "latest"
    )
    assert len(dirs_first) == 1 and dirs_first[0].startswith("batch_")

    import shutil

    shutil.rmtree(manifest)  # crash between run_batch_df and append_manifest
    retry = _run(str(landing), out, str(manifest))
    assert retry.returncode == 0, retry.stderr[-2000:]
    dirs_retry = sorted(
        p.name for p in (out / "processed" / "taxi").iterdir()
        if p.is_dir() and p.name != "latest"
    )
    assert dirs_retry == dirs_first, (
        "retry wrote a duplicate fact directory instead of overwriting "
        f"the content-keyed one: {dirs_retry}"
    )


def test_continuous_ingest_replay_id_is_checkpoint_stable(tmp_path):
    """ADVICE r7 (medium): processing_id derives from batch_id alone, so
    a foreachBatch replay after a crash overwrites the same directory.
    Pinned at the observable surface: the first batch's output directory
    is batch_000000000 (no per-process timestamp component)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    write_fixture_files(str(landing))
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", SPARK_GRAFT_DRIVER_MEM="4g")
    proc = subprocess.run(
        [
            sys.executable,
            str(ROOT / "examples" / "continuous_ingest.py"),
            "--input-dir", str(landing),
            "--output-dir", str(out),
            "--checkpoint", str(ckpt),
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    dirs = sorted(
        p.name for p in (out / "processed" / "taxi").iterdir()
        if p.is_dir() and p.name != "latest"
    )
    assert dirs == ["batch_000000000"], dirs
