#!/usr/bin/env python3
"""Compare a bench sweep against the committed per-query records,
machine-calibrated.

Usage: python tools/bench_compare.py [SWEEP.json] [RECORD.json]
(defaults: BENCH_SWEEP.json vs BENCH_LOCAL.json at the repo root).
Exit codes: 0 clean, 1 drift flags, 2 vacuous (either side carried no
per-query timings — machine-distinguishable from a clean comparison).

Why this exists (round 8): two back-to-back full sweeps with zero plan
changes measured 218 s and 145 s against an 88.7 s record, with
DIFFERENT queries "drifting" in each — the box's single-core speed was
oscillating 0.8↔2.3 s on a fixed probe loop and delivering ~19 of 32
cores under fan-out. Raw ratios against records are meaningless on such
a box. bench.py now embeds `cpu_probe` (single-core seconds, [before,
after]) and `effective_cores` in every sweep; this tool reads both
sides' probes and reports per-query ratios BOTH raw and divided by the
host-speed ratio, flagging only queries whose calibrated ratio exceeds
the threshold (default 1.5, env BENCH_DRIFT_THRESHOLD).

A record file without probes (pre-round-8) is assumed to be fast-state
(probe 0.8 s / full cores) — conservative: it never hides drift, it
only excuses uniform host slowness.

The host ratio is (probe_sweep/probe_record) x (cores_record/
cores_sweep): suite wall ~ work / (cores x speed). Validated on the
round-8 runs — delivered cores 32 -> 19.1 predicts 1.67x, the observed
plan-unchanged suite ratio was 1.64x.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
FAST_STATE_PROBE = 0.8  # round-8 box, fast state, seconds


def probe_of(rec: dict) -> float:
    p = rec.get("cpu_probe")
    if isinstance(p, list) and p:
        return sum(p) / len(p)
    return FAST_STATE_PROBE


def cores_of(rec: dict) -> float:
    return float(rec.get("effective_cores") or 32.0)


def main() -> int:
    sweep_path = sys.argv[1] if len(sys.argv) > 1 else ROOT / "BENCH_SWEEP.json"
    record_path = sys.argv[2] if len(sys.argv) > 2 else ROOT / "BENCH_LOCAL.json"
    sweep = json.loads(pathlib.Path(sweep_path).read_text())
    record = json.loads(pathlib.Path(record_path).read_text())
    # the driver's BENCH_r<N>.json is a wrapper {n, rc, cpus, sf, tail,
    # parsed} around the bench result; comparing the wrapper directly
    # found no queries/probes and reported a vacuous all-clear (round 9).
    # `or` (not a .get default) because a failed-parse wrapper carries
    # "parsed": null (BENCH_r04) — falling back to the wrapper then hits
    # the vacuous-comparison warning instead of an AttributeError
    # (ADVICE r9).
    sweep = sweep.get("parsed") or sweep
    record = record.get("parsed") or record
    vacuous = False
    for side, rec, path in (("sweep", sweep, sweep_path),
                            ("record", record, record_path)):
        if not rec.get("queries"):
            vacuous = True
            print(f"WARNING: {side} {path} has no per-query timings — "
                  "comparison is vacuous (tail-trimmed capture? pass "
                  "BENCH_SWEEP.json or a full record instead)")
    threshold = float(os.environ.get("BENCH_DRIFT_THRESHOLD", "1.5"))

    for side, rec in (("sweep", sweep), ("record", record)):
        # bench.py's effective_cores returns None on probe failure — most
        # likely on exactly the degraded box where calibration matters
        # most. Defaulting silently to 32.0 understates host_ratio and
        # inflates every calibrated ratio, so say the fallback entered
        # the calculation (ADVICE r10).
        if not rec.get("effective_cores"):
            print(
                f"WARNING: {side} carries no effective_cores probe — "
                "calibration uses the 32.0-core DEFAULT (not a measured "
                "value); calibrated ratios may be inflated on a degraded "
                "host"
            )

    host_ratio = (probe_of(sweep) / probe_of(record)) * (
        cores_of(record) / cores_of(sweep)
    )
    print(
        f"host speed: sweep probe {probe_of(sweep):.2f}s / "
        f"{cores_of(sweep):.0f} cores vs record "
        f"{probe_of(record):.2f}s / {cores_of(record):.0f} cores "
        f"-> host ratio {host_ratio:.2f}x"
    )
    def rep_min(rec: dict, name: str) -> float | None:
        samples = rec.get("reps_sec", {}).get(name)
        if isinstance(samples, list) and samples:
            return min(samples)
        return None

    flagged = []
    for name, sec in sweep.get("queries", {}).items():
        rec_sec = record.get("queries", {}).get(name)
        # Compare at the rep MINIMUM only when BOTH sides carry rep
        # vectors for this query (VERDICT r9 item 2: the min is the
        # host's best delivery, least contaminated by one-off stalls).
        # One-sided min — sweep-min vs a pre-r10 record's median, or a
        # trimmed sweep missing a query's vector — systematically
        # deflates calibrated ratios by the rep spread and can mask
        # genuine drift just under the threshold (ADVICE r10), so fall
        # back to median-vs-median unless both vectors exist.
        s_min, r_min = rep_min(sweep, name), rep_min(record, name)
        if s_min is not None and r_min is not None:
            sec, rec_sec = s_min, r_min
        if not rec_sec or rec_sec < 0.15:
            continue  # sub-150ms records are scheduling noise
        raw = sec / rec_sec
        calibrated = raw / host_ratio
        if calibrated > threshold:
            flagged.append((calibrated, raw, name, rec_sec, sec))
    # mid-suite probe timeline (bench.py samples cpu_probe every ~20
    # queries): annotate each flag with the host-state reading nearest
    # its run position, so a flag landing on a 2.x s-probe window reads
    # as host weather in ONE sweep (VERDICT r9 item 7)
    qorder = list(sweep.get("queries", {}))  # insertion = run order
    # ... but a tail-trimmed driver capture (bench.py tail_budget path)
    # stores queries sorted by DESCENDING TIME while still carrying
    # mid_probes — position-based probe annotations on such a capture
    # would be actively misleading, not merely absent (ADVICE r10).
    # Trimmed-capture markers: n_queries / queries_full_in, or a queries
    # dict shorter than the declared run length.
    n_q = sweep.get("n_queries")
    sweep_trimmed = bool(sweep.get("queries_full_in")) or (
        n_q is not None and len(qorder) != n_q
    )
    if sweep_trimmed:
        qorder = []
        print(
            "NOTE: sweep is a tail-trimmed capture (queries sorted by "
            "time, not run order) — positional probe annotations "
            "suppressed; read BENCH_SWEEP.json for the full record"
        )
    # position-0 anchor: the BEFORE probe of the cpu_probe pair, not the
    # before/after mean — when host state diverged across the sweep
    # (exactly the drift case), the mean blends away the start-of-sweep
    # reading (ADVICE r10); mean only when the pair is absent
    p_pair = sweep.get("cpu_probe")
    start_p = (
        float(p_pair[0])
        if isinstance(p_pair, list) and p_pair
        else probe_of(sweep)
    )
    timeline = [[0.0, start_p]]
    timeline += [
        [float(i), float(p)] for i, p in sweep.get("mid_probes") or []
    ]
    if len(qorder) > 1:
        last = sweep.get("cpu_probe")
        if isinstance(last, list) and len(last) == 2:
            timeline.append([float(len(qorder) - 1), float(last[1])])

    def nearest_probe(name: str) -> str:
        if name not in qorder or not timeline:
            return ""
        pos = qorder.index(name)
        at, p = min(timeline, key=lambda ip: abs(ip[0] - pos))
        return f", nearest probe {p:.2f}s @pos {int(at)} (query @pos {pos})"

    for cal, raw, name, rec_sec, sec in sorted(flagged, reverse=True):
        print(
            f"DRIFT {name}: {rec_sec:.2f}s -> {sec:.2f}s "
            f"(raw {raw:.2f}x, calibrated {cal:.2f}x{nearest_probe(name)})"
        )
    if flagged:
        # In-suite vs standalone (BASELINE_HISTORY.md round 9): in-suite flags
        # on this oscillating host have repeatedly measured clean when
        # re-run standalone. The r8 signature: all five flags sat at
        # CONSECUTIVE suite positions (64-68) — a minutes-long host
        # stall hitting one window of the suite, not five independent
        # plan regressions — and every one read 0.6-1.1x calibrated
        # standalone. Surface that signature when it recurs.
        pos = sorted(qorder.index(f[2]) for f in flagged if f[2] in qorder)
        # split into runs at gaps > 2: the r10 sweep carried TWO stall
        # windows (positions 19-25 and 67-70, all nine clean standalone)
        # and the old single-cluster span test saw only an unclustered
        # spread of 52 — a multi-stall sweep must still surface the
        # signature per window
        runs: list[list[int]] = []
        for p in pos:
            if runs and p - runs[-1][-1] <= 2:
                runs[-1].append(p)
            else:
                runs.append([p])
        clusters = [r for r in runs if len(r) >= 3]
        for r in clusters:
            print(
                f"NOTE: {len(r)} flagged queries are positionally "
                f"clustered (suite positions {r[0]}-{r[-1]}) — the "
                "transient-host-stall signature, not a per-query "
                "regression pattern."
            )
        print(
            "NOTE: re-measure flagged queries standalone "
            "(python bench.py <names>) before treating them as "
            "regressions; a forward+reverse pair "
            "(SPARK_GRAFT_BENCH_ORDER=reverse) separates position/"
            "warmup effects from the plans (BASELINE.md calibration rules)."
        )
    total_s = sweep.get("value")
    total_r = record.get("value")
    if total_s and total_r:
        print(
            f"suite: {total_r:.1f}s -> {total_s:.1f}s "
            f"(raw {total_s / total_r:.2f}x, calibrated "
            f"{total_s / total_r / host_ratio:.2f}x)"
        )
    print(f"{len(flagged)} queries over calibrated {threshold}x")
    if vacuous:
        # distinct exit code: an automated caller checking only the
        # return code must not read a no-queries comparison as the
        # all-clear it was built to eliminate (ADVICE r9)
        return 2
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
