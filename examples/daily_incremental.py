#!/usr/bin/env python3
"""Daily incremental run — the spark-submit twin of the reference's
Prefect daily deployment (prefect_flows.py:1024-1051, prefect.yaml:13-15:
``taxi-pipeline-daily`` on ``cron: "0 6 * * *"``).

One invocation = one manifest-gated batch: list the landing directory,
anti-join the processed-files manifest (S4 idempotency, the reference's
``processed_files.json``), run the full clean→features→metrics pipeline
over only the NEW files, write the fact table + five metric tables + the
``latest/`` alias, and append the manifest. A run with nothing new exits
without touching outputs (the reference's watermark-advance-on-empty
no-op, data_processing.py:347-351). Crash-safe to re-run: the manifest
only advances after a successful process_fn.

Works unchanged against file:// (smoke-tested), s3a:// or hdfs:// paths —
every path below is just a Spark path (README "Object storage" section
for the s3a committer confs). Schedule it with examples/cron_submit.sh.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from taxi_aws_data_pipeline_spark import pipeline, streaming
from taxi_aws_data_pipeline_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input-dir", required=True,
                    help="landing directory of yellow_tripdata_*.parquet")
    ap.add_argument("--output-dir", required=True,
                    help="root for fact/metrics/latest outputs")
    ap.add_argument("--manifest", required=True,
                    help="processed-files manifest table (parquet path)")
    ap.add_argument("--no-validate-filenames", action="store_true",
                    help="skip the P2 filename-vs-pickup consistency filter")
    args = ap.parse_args()

    spark = get_spark(app_name="taxi-daily-incremental")

    def process(df, paths):
        # processing_id keys on the BATCH CONTENT, not the wall clock
        # (ADVICE r7): if run_batch_df succeeds but append_manifest
        # fails (or the process dies between them), the re-run sees the
        # same new-file set, recomputes the same id, and its
        # mode('overwrite') writes land on the SAME directory — the
        # retry is idempotent instead of leaving a duplicate fact
        # directory under a fresh timestamp.
        batch_key = hashlib.sha256(
            "\n".join(sorted(paths)).encode("utf-8")
        ).hexdigest()[:16]
        result = pipeline.run_batch_df(
            df,
            args.output_dir,
            processing_id=f"batch_{batch_key}",
            validate_filenames=not args.no_validate_filenames,
        )
        result.unpersist()
        print(f"processed {len(paths)} file(s) -> {result.fact_path}")

    done = streaming.incremental_batch(
        spark, args.input_dir, args.manifest, process
    )
    if not done:
        print("no new files; manifest unchanged")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
