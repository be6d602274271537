"""Landing-zone ingestion S10-S11 (SURVEY.md §2.1; reference
``s3_uploader.py``): versioned upload sessions, skip-existing-by-
filename idempotency, per-file ``latest/`` aliases, landing bootstrap,
and a verification listing.

The reference is boto3-specific: it validates ``data/raw/*.parquet``
(existence + size>0, s3_uploader.py:138-160), skips files whose
BASENAME already exists under any prior session (``get_existing_s3_
files``, :98-117), uploads the rest to ``raw-data/upload_{YYYYMMDD_
HHMMSS}/`` (:161-184), refreshes a ``raw-data/latest/{name}`` alias
via server-side copy (:185-204), and verifies by listing sessions +
latest files with sizes (:206-252). Bucket bootstrap (head_bucket /
create_bucket, :30-43) is S11.

This module re-expresses all of that over the Hadoop FileSystem API
reached through the active SparkSession's JVM — ONE code path that
works identically for ``file://`` (tested here), ``s3a://``, ``hdfs://``
or any other configured scheme, because every operation (glob, status,
mkdirs, copy) dispatches through ``FileSystem.get(uri, hadoopConf)``.
On S3 the "copy" is the committer-level PUT the s3a connector issues;
the ``latest/`` alias is a same-store copy exactly like the
reference's ``copy_object``. Bucket CREATION is an account-level
control-plane call outside the FileSystem abstraction — on AWS that
one step stays with the platform CLI/IaC (the README object-storage
section); ``ensure_landing_root`` covers the reference's intent (a
writable root that exists before the first upload) for every scheme.

Scale note: ingestion is file-METADATA work — a listing of millions of
objects is driver-scale (the same argument as sources.list_files); the
bytes themselves move store-side (server-side copy / distcp-shaped
parallelism if ever needed). Nothing here touches row data, so there
is nothing to shuffle.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any

from pyspark.sql import SparkSession

LANDING_PREFIX = "upload_"  # mirrors the reference's raw-data/upload_*
LATEST_DIR = "latest"


def _fs_for(spark: SparkSession, path: str):
    """(FileSystem, Path-class, conf) for ``path``'s scheme."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path, conf


def ensure_landing_root(spark: SparkSession, landing_root: str) -> bool:
    """S11 bootstrap analog (s3_uploader.py:30-43): make sure the
    landing root exists and is a directory; create it (and parents) if
    absent. Returns True if it had to be created."""
    fs, P, _ = _fs_for(spark, landing_root)
    root = P(landing_root)
    if fs.exists(root):
        if not fs.getFileStatus(root).isDirectory():
            raise ValueError(f"landing root is a file: {landing_root}")
        return False
    fs.mkdirs(root)
    return True


def _existing_basenames(fs, P, landing_root: str) -> set[str]:
    """Basenames already landed under ANY upload session — the
    reference's cross-session skip set (s3_uploader.py:98-117)."""
    seen: set[str] = set()
    root = P(landing_root)
    if not fs.exists(root):
        return seen
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(LANDING_PREFIX):
            for f in fs.listStatus(st.getPath()):
                if f.isFile():
                    seen.add(f.getPath().getName())
    return seen


def ingest_raw_files(
    spark: SparkSession,
    src_glob: str,
    landing_root: str,
    session_id: str | None = None,
    suffix: str = ".parquet",
) -> dict[str, Any]:
    """S10 versioned upload (s3_uploader.py:8-204), store-agnostic.

    Glob ``src_glob`` (any Hadoop scheme), validate each match the way
    the reference does (regular file, size > 0, name ends with
    ``suffix`` — :138-160), skip files whose basename already exists
    under any prior ``upload_*`` session (:56-69), copy the rest into
    ``{landing_root}/upload_{session_id}/`` and refresh
    ``{landing_root}/latest/{name}`` for each (:185-204). Idempotent by
    construction: a re-run with the same inputs uploads nothing.

    ``session_id`` defaults to the reference's wall-clock
    ``YYYYMMDD_HHMMSS`` stamp; pass an explicit id for replayable runs
    (tests do).

    Returns ``{"session", "uploaded", "skipped", "invalid", "ok"}``
    with basename lists — the reference's printed summary as data.
    """
    src_fs, P, conf = _fs_for(spark, src_glob)
    dst_fs, _, _ = _fs_for(spark, landing_root)
    jvm = spark._jvm
    ensure_landing_root(spark, landing_root)

    matches = src_fs.globStatus(P(src_glob)) or []
    valid, invalid = [], []
    seen_basenames: set[str] = set()
    # sort before validation so duplicate-basename policy is
    # deterministic (first path in name order wins; ADVICE r6: a glob
    # spanning directories can match two files with the same basename,
    # and landing both into one session would collide)
    for st in sorted(matches, key=lambda s: str(s.getPath())):
        name = st.getPath().getName()
        if not (st.isFile() and name.endswith(suffix) and st.getLen() > 0):
            invalid.append(name)
        elif name in seen_basenames:
            invalid.append(f"{name} (duplicate basename in glob)")
        else:
            seen_basenames.add(name)
            valid.append(st)

    existing = _existing_basenames(dst_fs, P, landing_root)
    session = session_id or datetime.now().strftime("%Y%m%d_%H%M%S")
    session_dir = P(f"{landing_root}/{LANDING_PREFIX}{session}")
    latest_dir = P(f"{landing_root}/{LATEST_DIR}")

    uploaded, skipped = [], []
    for st in sorted(valid, key=lambda s: s.getPath().getName()):
        name = st.getPath().getName()
        if name in existing:
            skipped.append(name)
            continue
        if not uploaded:  # create dirs lazily: empty sessions leave no mark
            dst_fs.mkdirs(session_dir)
            dst_fs.mkdirs(latest_dir)
        # store-agnostic copy (FileUtil dispatches on each side's FS) —
        # never deleteSource, overwrite only `latest/`
        landed = P(f"{session_dir}/{name}")
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            src_fs, st.getPath(), dst_fs, landed, False, False, conf,
        )
        # refresh latest/ from the just-landed object so the alias is a
        # genuinely SAME-STORE copy like the reference's copy_object
        # (s3_uploader.py:185-204) — on s3a this stays a server-side
        # COPY; a cross-store ingest moves the bytes over the wire once,
        # not twice (ADVICE r6)
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            dst_fs, landed, dst_fs, P(f"{latest_dir}/{name}"),
            False, True, conf,
        )
        uploaded.append(name)
    return {
        "session": session,
        "uploaded": uploaded,
        "skipped": skipped,
        "invalid": invalid,
        "ok": not invalid,
    }


def verify_landing(spark: SparkSession, landing_root: str) -> dict[str, Any]:
    """S10 verification (s3_uploader.py:206-252): enumerate upload
    sessions and the ``latest/`` view with sizes. Returns
    ``{"sessions": [...], "latest": {name: size}, "total_bytes"}``;
    raises nothing — an empty/absent root verifies as empty."""
    fs, P, _ = _fs_for(spark, landing_root)
    root = P(landing_root)
    sessions: list[str] = []
    latest: dict[str, int] = {}
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not st.isDirectory():
                continue
            if name.startswith(LANDING_PREFIX):
                sessions.append(name[len(LANDING_PREFIX):])
            elif name == LATEST_DIR:
                for f in fs.listStatus(st.getPath()):
                    if f.isFile():
                        latest[f.getPath().getName()] = f.getLen()
    return {
        "sessions": sorted(sessions),
        "latest": latest,
        "total_bytes": sum(latest.values()),
    }
