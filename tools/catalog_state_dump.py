#!/usr/bin/env python3
"""Dump per-entry (analyzed-plan hash, oracle-text hash) to JSON.

Run from a repo root: python tools/catalog_state_dump.py OUT.json

This is how the REPIN_FIRST cohort is computed MECHANICALLY instead of
hand-listed (round 11): dump the working tree, dump a `git worktree`
of HEAD (cd into it first), and diff the two JSONs — every entry whose
plan or oracle hash changed goes into tools/next_window.REPIN_FIRST
for the next round. Plan strings are normalized (#<exprId> stripped);
replay-style entries that embed per-run temp paths (s9/s10/s11) hash
nondeterministically — re-dump twice and ignore entries that differ
across two same-tree dumps before reading the cross-tree diff.
"""
import hashlib
import json
import pathlib
import re
import sys

ROOT = pathlib.Path.cwd()
sys.path.insert(0, str(ROOT))

from taxi_aws_data_pipeline_spark.plans import CATALOG  # noqa: E402
from taxi_aws_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
ID_RE = re.compile(r"#\d+")
# Spark lambda variables carry a session-global counter in their NAME
# (`lambda x_705#12`), which the exprId strip does not touch — without
# this, every entry analyzed after a tree adds/removes ONE lambda
# upstream hashes differently (the round-11 false-cohort lesson: a
# 161-entry "diff" of which ~100 were counter shifts).
LAMBDA_RE = re.compile(r"(\blambda\s+\w+?)_\d+")
out = {}
spark = get_spark(app_name="catalog-state-dump")
for name, spec in sorted(CATALOG.items()):
    try:
        df = spec.spark(spark, SF)
        plan = df._jdf.queryExecution().analyzed().toString()
        plan = ID_RE.sub("#", plan)
        plan = LAMBDA_RE.sub(r"\1_", plan)
        ph = hashlib.md5(plan.encode()).hexdigest()
    except Exception as e:  # noqa: BLE001
        ph = f"ERROR: {e!r}"[:200]
    oh = hashlib.md5((spec.oracle or "").encode()).hexdigest()
    out[name] = {"plan": ph, "oracle": oh}
spark.stop()
pathlib.Path(sys.argv[1]).write_text(json.dumps(out, indent=1))
print(f"dumped {len(out)} entries")
