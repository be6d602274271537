#!/usr/bin/env python3
"""Checkpoint-backed continuous ingestion — the spark-submit twin of the
reference's HOURLY Prefect deployment (prefect_flows.py:1024-1051,
prefect.yaml:33-35: ``taxi-pipeline-hourly`` on ``cron: "0 * * * *"``),
and the manifest-free alternative to examples/daily_incremental.py.

One invocation drains every not-yet-processed landing file through the
full clean→features→metrics pipeline exactly once
(``Trigger.AvailableNow`` + the file-source checkpoint log, which
subsumes the reference's watermark file AND processed-files ledger),
then exits. Crash-safe: a re-run after a mid-batch failure resumes from
the checkpoint without reprocessing. ``--max-files-per-trigger`` maps
the reference's PROCESSING_BATCH_SIZE knob (prefect_flows.py:65-66).

Schedule it with the same cron wiring as the daily example (set
TAXI_MODE=continuous in examples/cron_submit.sh's spark-submit line, or
point cron straight at this script).
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint dir (the idempotency state)")
    ap.add_argument("--max-files-per-trigger", type=int, default=None,
                    help="bound files per micro-batch (PROCESSING_BATCH_SIZE)")
    ap.add_argument("--no-validate-filenames", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="taxi-continuous-ingest")
    n_batches = 0

    def process(df, batch_id: int):
        nonlocal n_batches
        if df.isEmpty():
            return
        # processing_id derives from batch_id ALONE (ADVICE r7, medium):
        # after a mid-batch crash, foreachBatch replays the same batch_id
        # from the checkpoint, and because write_fact_table/write_metrics
        # use mode('overwrite') on the id-keyed path, the replay lands on
        # the SAME processed/taxi/batch_<id>/ directory the crashed run
        # left partial — overwritten atomically, so readers never see
        # duplicates. A per-process timestamp in the id would break this:
        # the replay would write a second directory beside the partial
        # one. batch_id is unique for the lifetime of one checkpoint;
        # pair each --checkpoint with its own --output-dir.
        result = pipeline.run_batch_df(
            df,
            args.output_dir,
            processing_id=f"batch_{batch_id:09d}",
            validate_filenames=not args.no_validate_filenames,
        )
        result.unpersist()
        n_batches += 1
        print(f"batch {batch_id} -> {result.fact_path}")

    query = streaming.incremental_stream(
        spark,
        args.input_dir,
        args.checkpoint,
        process,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    query.awaitTermination()
    if not n_batches:
        print("no new files; checkpoint unchanged")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
