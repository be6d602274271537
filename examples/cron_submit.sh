#!/usr/bin/env bash
# Cron wiring for the daily incremental run — the scheduler half of the
# reference's Prefect deployment (prefect.yaml:13-15 `cron: "0 6 * * *"`,
# prefect_flows.py:1024-1051). Install with:
#
#   crontab -e
#   7 6 * * *  /path/to/repo/examples/cron_submit.sh >> /var/log/taxi_daily.log 2>&1
#
# (An hourly twin of the reference's `taxi-pipeline-hourly` is the same
# line with `7 * * * *`.) flock makes overlapping fires a SILENT no-op
# instead of a double-run — cron has no built-in concurrency guard,
# Prefect did. The `|| { ...; exit 0; }` on the flock line matters under
# `set -e` (ADVICE r7): a bare contended `flock -n` exits 1, so cron
# would record a failure (and may alert) on every overlap.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LANDING="${TAXI_LANDING:-file:///data/taxi/landing/latest}"
OUTPUT="${TAXI_OUTPUT:-file:///data/taxi/warehouse}"
MANIFEST="${TAXI_MANIFEST:-file:///data/taxi/state/processed_manifest}"

# package the engine as a real zip file — spark-submit copies --py-files
# by path, so it must be a seekable file, not a process-substitution fifo.
# zip into a fresh tempdir: Info-ZIP refuses to write INTO the zero-byte
# file `mktemp <template>.zip` pre-creates ("Zip file structure invalid")
PKGDIR=$(mktemp -d /tmp/taxi_pkg.XXXXXX)
trap 'rm -rf "$PKGDIR"' EXIT
PYZIP="$PKGDIR/taxi_aws_data_pipeline_spark.zip"
(cd "$REPO" && zip -qr "$PYZIP" taxi_aws_data_pipeline_spark -x '*__pycache__*')

# -E 200: distinct conflict exit code, so a lock collision (→ silent
# skip) is distinguishable from spark-submit itself failing with 1
flock -n -E 200 /tmp/taxi_daily.lock \
  spark-submit \
    --master "${SPARK_MASTER:-local[*]}" \
    --deploy-mode client \
    --py-files "$PYZIP" \
    "$REPO/examples/daily_incremental.py" \
    --input-dir "$LANDING" \
    --output-dir "$OUTPUT" \
    --manifest "$MANIFEST" \
  || { rc=$?; if [ "$rc" -eq 200 ]; then echo "previous run still active; skipping"; exit 0; else exit "$rc"; fi; }
