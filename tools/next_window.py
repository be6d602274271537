"""Print the next round's 50-entry driver window.

The driver records verdicts for the FIRST 50 registered entries each
round (`__spark_entry__._PRIORITY`). This tool makes staging the next
round mechanical and mistake-proof:

* While unverified entries remain, emit the next 50 in catalog
  registration order — the drain schedule documented in
  `__spark_entry__.py`. "Verified" means a GREEN row (rows+schema+hash
  all matched, no err) in some committed CORRECTNESS_r*.json; an entry
  whose only rows are red is queued AHEAD of never-windowed ones, the
  way the r1 reds were re-windowed first in r2.
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


def _is_green(v: dict) -> bool:
    return bool(
        v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match")
        and not v.get("err")
    )


def _load_records() -> dict[int, dict]:
    return {
        int(f.stem.split("_r")[1]): json.loads(f.read_text())
        for f in sorted(ROOT.glob("CORRECTNESS_r*.json"))
    }


def next_window(
    n: int = 50, records: dict[int, dict] | None = None
) -> tuple[list[str], str]:
    """Return (window, mode) where mode is 'drain' or 'repin'.

    ``records`` (round -> CORRECTNESS dict) defaults to the committed
    CORRECTNESS_r*.json files; injectable for tests."""
    last_green = {}  # entry -> latest round with a GREEN driver row
    seen = set()  # entries with ANY driver row, green or red
    for rnd, rec in sorted((records or _load_records()).items()):
        for name, verdict in rec.items():
            if name not in CATALOG:
                continue
            seen.add(name)
            if _is_green(verdict):
                last_green[name] = max(last_green.get(name, 0), rnd)
    order = {name: i for i, name in enumerate(CATALOG)}
    red_only = sorted(seen - set(last_green), key=order.__getitem__)
    never = [n_ for n_ in CATALOG if n_ not in seen]
    backlog = red_only + never  # failures retry first, like r1->r2
    if backlog:
        window = backlog[:n]
        if len(window) < n:  # backlog tail + oldest re-pins fill the rest
            repins = sorted(
                last_green, key=lambda x: (last_green[x], order[x])
            )
            window += repins[: n - len(window)]
        return window, "drain"
    repins = sorted(last_green, key=lambda x: (last_green[x], order[x]))
    return repins[:n], "repin"


if __name__ == "__main__":
    window, mode = next_window()
    print(f"# mode: {mode} ({len(window)} entries)")
    for name in window:
        print(f'    "{name}",')
