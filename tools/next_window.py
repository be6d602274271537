"""Compute the next round's 50-entry driver window.

The driver records verdicts for the FIRST 50 registered entries each
round (`__spark_entry__._PRIORITY`). Since round 6, `__spark_entry__`
calls :func:`next_window` AT IMPORT TIME, so the window can never go
stale between rounds (VERDICT r5 item 1 — the r5→r6 gap left a stale
hand-pasted window and a red audit test). This module stays importable
without Spark: it reads only the committed CORRECTNESS records and the
catalog registry.

Ordering contract (pinned by tests/test_audit.py):

* An entry's LATEST committed verdict is authoritative (ADVICE r5,
  medium): if the most recent CORRECTNESS row for an entry is red, the
  entry re-enters the drain backlog and retries FIRST — a green row in
  some earlier round does not mark a regressed entry verified forever.
* While unverified entries remain, the window drains them: regressed
  reds first, then PULL_FORWARD entries (never-windowed entries a
  verdict ordered ahead of schedule), then never-windowed entries in
  catalog registration order.
* Once the backlog is empty, the window re-pins the 50 least-recently
  verified entries (earliest latest-green round first, registration
  order as the tie-break) so driver evidence for the parity core stays
  fresh.

Usage: python tools/next_window.py  (prints the computed window; purely
informational now that __spark_entry__ derives _PRIORITY itself).
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from taxi_aws_data_pipeline_spark.plans import CATALOG  # noqa: E402

# Never-windowed entries pulled ahead of registration order, newest
# verdict first. VERDICT r5 item 2: s10/s11 are the remaining
# driver-verifiable streaming rows anchoring SURVEY §2.9 — same
# argument that pulled s9 forward in round 5. Entries drop out of this
# list's effect automatically once they hold a driver row.
PULL_FORWARD: tuple[str, ...] = (
    "s10_streaming_stream_join_replay",
    "s11_streaming_dedup_replay",
)

# Fix-touched entries whose latest driver GREEN predates a plan/sink
# change (VERDICT r8 item 2): their evidence is stale even though the
# latest row is green, so the re-pin fill takes them FIRST (registration
# order among themselves). Each maps to the first round whose green row
# makes the evidence current again; an entry drops out automatically
# once it holds a green at or after that round. The r8-fix cohort
# (x82/x178/x180/x234 -> 9) re-pinned green in round 9 and has expired
# out of effect.
REPIN_FIRST: dict[str, int] = {
    "x82_training_shard_layout": 9,  # r8 shard-sink sort fix (sinks.py:154)
    "x178_kcore_peeling": 9,  # r8 replay fix: checkpointed self-join base
    "x180_modularity_score": 9,  # r7 rollup rework + r8 inline plan guard
    "x234_greedy_mixture_allocation": 9,  # r8 checkpointed greedy state
    # r9 ADVICE: x246's ORACLE changed (empty-corpus recall_ppm now
    # coalesce(..//nullif(n_truth,0),0) to match the Spark-side literal
    # 0) — sf0.01 values are identical, but the parity contract the r9
    # green attested to is not byte-identical, so re-pin for currency
    "x246_ivf_nprobe_recall_sweep": 10,
    # round-10 empty-input parity fixes (the x246 hole generalized: a
    # catalog-wide scan found 7 more fixable divergences on zero-row
    # input). Non-empty values are identical by construction, but each
    # entry's plan or oracle text changed, so their driver evidence
    # re-pins for currency. tests/test_empty_inputs.py now gates the
    # whole class.
    "a15_ks_two_sample": 10,  # n1/n2 via the always-one-row count frame
    "a19_runs_test": 10,  # count(when) replaces sum(when/otherwise 0)
    "a26_quantile_treatment_effects": 10,  # one global agg, no crossJoin
    "a30_delta_method_ratio_se": 10,  # oracle sqrt(greatest(0, n-1))
    "k2_approx_sketches": 10,  # vacuous-TRUE accuracy flags on NULLs
    "x206_heaps_vocab_growth": 10,  # grid spine preserved via left joins
    "x65_lsh_recall_report": 10,  # count FILTER both sides
    # round-10 perf rework (VERDICT r9 items 1+6): the three RFM
    # rankings consolidated into ONE stacked global_row_number pass —
    # value-exact vs the oracle at sf0.01 and sf0.1, but the plan
    # changed, so driver evidence re-pins
    "a17_rfm_segmentation": 10,
    # round-10 one-row-input parity fixes (the n=1 leg of the
    # degenerate-input gate): both-halves filter / n>=2 filter —
    # non-degenerate values identical, plans changed, evidence re-pins
    "x103_quantile_drift_monitor": 10,
    "x104_mann_kendall_trend": 10,
}


def _is_green(v: dict) -> bool:
    return bool(
        v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match")
        and not v.get("err")
    )


_RECORD_STEM = re.compile(r"^CORRECTNESS_r(\d+)$")


def _load_records(root: pathlib.Path = ROOT) -> dict[int, dict]:
    """Read every on-disk CORRECTNESS record the window derives from.

    This runs at import time of ``__spark_entry__`` (the driver entry),
    so it must never raise on a stray or damaged file (ADVICE r6,
    medium): a name that isn't exactly ``CORRECTNESS_r<digits>.json``
    (e.g. a ``_backup`` copy) is ignored, and a truncated/non-dict JSON
    body is skipped with a stderr warning — losing one round's rows
    only re-drains those entries, which is safe; an ImportError would
    fail the whole round.

    Working-tree semantics are intentional: the driver writes the
    round's record to disk before committing it, and reading the
    on-disk file is what lets the window advance for the NEXT round the
    moment the record lands. Within one builder session the set of
    record files never changes, so the window is stable per round.
    """
    records: dict[int, dict] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _RECORD_STEM.match(f.stem)
        if not m:
            continue
        try:
            body = json.loads(f.read_text())
        except (OSError, ValueError) as exc:
            print(
                f"next_window: skipping unreadable record {f.name}: {exc}",
                file=sys.stderr,
            )
            continue
        if not isinstance(body, dict):
            print(
                f"next_window: skipping non-dict record {f.name}",
                file=sys.stderr,
            )
            continue
        records[int(m.group(1))] = body
    return records


def next_window(
    n: int = 50,
    records: dict[int, dict] | None = None,
    pull_forward: tuple[str, ...] = PULL_FORWARD,
    repin_first: dict[str, int] | None = None,
) -> tuple[list[str], str]:
    """Return (window, mode) where mode is 'drain' or 'repin'.

    ``records`` (round -> CORRECTNESS dict) defaults to the committed
    CORRECTNESS_r*.json files; injectable for tests (an explicitly
    passed empty dict means "no records", not "load from disk").
    ``repin_first`` (entry -> first evidence-current round) defaults to
    REPIN_FIRST; pass {} to disable stale-evidence promotion."""
    records = records if records is not None else _load_records()
    latest: dict[str, tuple[int, bool]] = {}  # entry -> (round, green?)
    last_green: dict[str, int] = {}  # entry -> latest round with a GREEN row
    for rnd, rec in sorted(records.items()):
        for name, verdict in rec.items():
            if name not in CATALOG:
                continue
            green = _is_green(verdict)
            latest[name] = (rnd, green)
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    order = {name: i for i, name in enumerate(CATALOG)}
    # latest verdict authoritative: most-recent-row-red entries are
    # regressions and retry ahead of everything (r1->r2 precedent)
    red = sorted(
        (nm for nm, (_, green) in latest.items() if not green),
        key=order.__getitem__,
    )
    never = [nm for nm in CATALOG if nm not in latest]
    pulled = [nm for nm in pull_forward if nm in never]
    rest = [nm for nm in never if nm not in set(pulled)]
    backlog = red + pulled + rest
    # re-pin pool: entries whose LATEST row is green, least recent first;
    # stale-evidence entries (green predates a plan/sink fix) jump the
    # queue so fix-touched plans regain driver currency in one round
    repin_first = REPIN_FIRST if repin_first is None else repin_first
    verified = [nm for nm, (_, green) in latest.items() if green]
    repins = sorted(verified, key=lambda x: (last_green[x], order[x]))
    verified_set = set(verified)  # latest-row-green only: a regressed
    # entry already retries via the red backlog, never via re-pin
    stale = sorted(
        (
            nm
            for nm in repin_first
            if nm in verified_set and last_green[nm] < repin_first[nm]
        ),
        key=order.__getitem__,
    )
    repins = stale + [nm for nm in repins if nm not in set(stale)]
    if backlog:
        window = backlog[:n]
        if len(window) < n:  # backlog tail + oldest re-pins fill the rest
            window += repins[: n - len(window)]
        return window, "drain"
    return repins[:n], "repin"


if __name__ == "__main__":
    window, mode = next_window()
    print(f"# mode: {mode} ({len(window)} entries)")
    for name in window:
        print(f'    "{name}",')
