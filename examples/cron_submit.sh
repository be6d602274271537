#!/usr/bin/env bash
# Cron wiring for the daily incremental run — the scheduler half of the
# reference's Prefect deployment (prefect.yaml:13-15 `cron: "0 6 * * *"`,
# prefect_flows.py:1024-1051). Install with:
#
#   crontab -e
#   7 6 * * *  /path/to/repo/examples/cron_submit.sh >> /var/log/taxi_daily.log 2>&1
#
# (An hourly twin of the reference's `taxi-pipeline-hourly` is the same
# line with `7 * * * *` and its own TAXI_LOCKFILE so the two schedules
# don't exclude each other.) flock makes overlapping fires a SILENT no-op
# instead of a double-run — cron has no built-in concurrency guard,
# Prefect did.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LANDING="${TAXI_LANDING:-file:///data/taxi/landing/latest}"
OUTPUT="${TAXI_OUTPUT:-file:///data/taxi/warehouse}"
MANIFEST="${TAXI_MANIFEST:-file:///data/taxi/state/processed_manifest}"
LOCKFILE="${TAXI_LOCKFILE:-/tmp/taxi_daily.lock}"

# Hold the lock on a script-scoped FD instead of wrapping spark-submit in
# `flock -E <code>` (ADVICE r8): the -E conflict code shared spark-submit's
# exit-code space, so a job that itself exited 200 would be misread as lock
# contention and cron would never alert. With the FD pattern the lock test
# and the job are separate statements — spark-submit's exit code reaches
# cron untouched (set -e), and the kernel drops the lock when the script
# (and any children holding FD 9) exits.
exec 9>"$LOCKFILE"
if ! flock -n 9; then
  echo "previous run still active; skipping"
  exit 0
fi

# package the engine as a real zip file — spark-submit copies --py-files
# by path, so it must be a seekable file, not a process-substitution fifo.
# zip into a fresh tempdir: Info-ZIP refuses to write INTO the zero-byte
# file `mktemp <template>.zip` pre-creates ("Zip file structure invalid")
PKGDIR=$(mktemp -d /tmp/taxi_pkg.XXXXXX)
trap 'rm -rf "$PKGDIR"' EXIT
PYZIP="$PKGDIR/taxi_aws_data_pipeline_spark.zip"
(cd "$REPO" && zip -qr "$PYZIP" taxi_aws_data_pipeline_spark -x '*__pycache__*')

spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --deploy-mode client \
  --py-files "$PYZIP" \
  "$REPO/examples/daily_incremental.py" \
  --input-dir "$LANDING" \
  --output-dir "$OUTPUT" \
  --manifest "$MANIFEST"
