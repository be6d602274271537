"""Print the next round's 50-entry driver window.

The driver records verdicts for the FIRST 50 registered entries each
round (`__spark_entry__._PRIORITY`). This tool makes staging the next
round mechanical and mistake-proof:

* While never-driver-windowed entries remain (union of committed
  CORRECTNESS_r*.json keys vs CATALOG), emit the next 50 of them in
  catalog registration order — the drain schedule documented in
  `__spark_entry__.py`.
* Once the backlog is empty, emit re-pins: the 50 least-recently
  verified entries (earliest round first, registration order as the
  tie-break), so driver evidence for the parity core stays fresh —
  the round-9+ rotation in the same schedule comment.

Usage: python tools/next_window.py  (run from anywhere; prints a
Python tuple body ready to paste into `_ROUND{N}_WINDOW`).
"""

from __future__ import annotations

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from taxi_aws_data_pipeline_spark.plans import CATALOG  # noqa: E402


def next_window(n: int = 50) -> tuple[list[str], str]:
    """Return (window, mode) where mode is 'drain' or 'repin'."""
    last_round = {}  # entry -> latest round number with a driver row
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        for name in json.loads(f.read_text()):
            if name in CATALOG:
                last_round[name] = max(last_round.get(name, 0), rnd)
    order = {name: i for i, name in enumerate(CATALOG)}
    backlog = [name for name in CATALOG if name not in last_round]
    if backlog:
        window = backlog[:n]
        if len(window) < n:  # backlog tail + oldest re-pins fill the rest
            repins = sorted(
                last_round, key=lambda x: (last_round[x], order[x])
            )
            window += repins[: n - len(window)]
        return window, "drain"
    repins = sorted(last_round, key=lambda x: (last_round[x], order[x]))
    return repins[:n], "repin"


if __name__ == "__main__":
    window, mode = next_window()
    print(f"# mode: {mode} ({len(window)} entries)")
    for name in window:
        print(f'    "{name}",')
