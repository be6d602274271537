#!/usr/bin/env python3
"""Dump .explain("formatted") for catalog queries to plans/r12/.

Usage: python tools/explain_dump.py before|after q1 [q2 ...]
       python tools/explain_dump.py before|after --stdout q1

Writes plans/r12/<query>_<tag>.txt — the optimization-round evidence
files the judge checks plan claims against. Uses the same session and
SF dir as bench.py so the plans match what the bench measures.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taxi_aws_data_pipeline_spark.plans import CATALOG  # noqa: E402
from taxi_aws_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    if tag not in ("before", "after"):
        raise SystemExit("first arg must be before|after")
    args = sys.argv[2:]
    to_stdout = "--stdout" in args
    names = [a for a in args if not a.startswith("--")]
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="explain-dump")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = CATALOG[name].spark(spark, SF_DIR)
        buf = io.StringIO()
        stdout0 = sys.stdout
        try:
            sys.stdout = buf
            df.explain("formatted")
        finally:
            sys.stdout = stdout0
        text = buf.getvalue()
        if to_stdout:
            print(f"===== {name} ({tag}) =====")
            print(text)
        else:
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(text)
            print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
