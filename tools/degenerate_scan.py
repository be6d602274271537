#!/usr/bin/env python3
"""Catalog-wide degenerate-input parity scanner.

Runs every oracle-backed catalog entry on a synthesized degenerate
fixture and compares Spark vs DuckDB with the driver's semantics
(tests/oracle_utils.compare_frames). This is the audit tool behind the
round-10 findings: the EMPTY and ONE-ROW fixtures each surfaced real
divergences that sf0.01 parity cannot see, and both are now permanent
test legs (tests/test_empty_inputs.py); the NULL-payload fixture's
findings are the staged round-11 package (COVERAGE.md).

Usage: python tools/degenerate_scan.py
           {empty|one_row|null_payload|all_null} [name...]
(optional entry names/prefixes restrict the scan — fast fix-iteration)

Fixtures (built from /root/testdata/sf0.001 into a temp dir):
  empty        — zero-row copies of all ten tables
  one_row      — one deterministic row per table (ORDER BY 1 LIMIT 1)
  null_payload — five rows per table; documents.text / events.value /
                 embeddings.embedding NULLed on even ids, so every
                 isNotNull path sees live NULLs beside real rows
  all_null     — five rows per table with the SAME payload columns
                 NULLed on EVERY row: tables are non-empty but the
                 usable payload set is empty (a failed upstream batch),
                 the corner between empty and mixed that exercises
                 zero-survivor seeding/filter paths on live row counts
  nan_payload  — five rows per table; events.value = NaN and the first
                 embedding component = NaN on even ids (a sizing audit:
                 Spark and DuckDB disagree on NaN ordering, equality,
                 and aggregate semantics — scan before deciding which
                 divergences to close vs document; CLOSED round 11,
                 now the fifth permanent test leg)
  huge_payload — five rows per table; events.value = 1e23 and the
                 first embedding component = 1e30 on even ids: FINITE
                 magnitudes that pass isfinite() but overflow the
                 exact-decimal tier (cents*100 past INT64, value past
                 DECIMAL(28,6)'s 22 integer digits, component*1e6 past
                 the quantizer BIGINT) — ANSI engines raise, Spark's
                 non-ANSI casts clamp/NULL silently. The magnitude
                 sibling of the NaN class (a sizing audit)

Exit code: number of divergent entries (0 = clean), capped at 120.
"""

from __future__ import annotations

import pathlib
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import duckdb  # noqa: E402

from oracle_utils import TABLE_NAMES, compare_frames  # noqa: E402
from taxi_aws_data_pipeline_spark.plans import CATALOG  # noqa: E402
from taxi_aws_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.001"
NULL_MODS = {
    "documents": ("text", "doc_id"),
    "events": ("value", "event_id"),
    "embeddings": ("embedding", "vec_id"),
}


def build_fixture(kind: str, d: str) -> None:
    for t in TABLE_NAMES:
        if kind == "empty":
            sel, tail = "*", "LIMIT 0"
        elif kind == "one_row":
            sel, tail = "*", "ORDER BY 1 LIMIT 1"
        else:  # null_payload / all_null / nan_payload
            tail = "ORDER BY 1 LIMIT 5"
            if t in NULL_MODS:
                col, key = NULL_MODS[t]
                cols = [
                    r[0]
                    for r in duckdb.sql(
                        f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
                    ).fetchall()
                ]
                if kind in ("nan_payload", "huge_payload"):
                    ev_bad, emb_bad = (
                        ("'NaN'::DOUBLE", "'NaN'::FLOAT")
                        if kind == "nan_payload"
                        else ("1e23::DOUBLE", "1e30::FLOAT")
                    )
                    if t == "events":
                        mod = (
                            f"CASE WHEN {key} % 2 = 0 THEN {ev_bad} "
                            f"ELSE {col} END AS {col}"
                        )
                    elif t == "embeddings":
                        mod = (
                            f"CASE WHEN {key} % 2 = 0 THEN "
                            f"list_concat([{emb_bad}], {col}[2:]) "
                            f"ELSE {col} END AS {col}"
                        )
                    else:  # documents keep real text — numeric classes
                        mod = col
                    sel = ", ".join(mod if c == col else c for c in cols)
                else:
                    null_when = (
                        "TRUE" if kind == "all_null" else f"{key} % 2 = 0"
                    )
                    sel = ", ".join(
                        f"CASE WHEN {null_when} THEN NULL ELSE {c} END "
                        f"AS {c}"
                        if c == col
                        else c
                        for c in cols
                    )
            else:
                sel = "*"
        duckdb.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet' {tail}) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> int:
    kind = sys.argv[1] if len(sys.argv) > 1 else "null_payload"
    if kind not in (
        "empty", "one_row", "null_payload", "all_null", "nan_payload",
        "huge_payload",
    ):
        raise SystemExit(f"unknown fixture kind {kind!r}")
    d = tempfile.mkdtemp(prefix=f"degenerate_{kind}_")
    build_fixture(kind, d)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    spark = get_spark(app_name=f"degenerate-scan-{kind}")
    bad = []
    names = sorted(n for n, s in CATALOG.items() if s.oracle is not None)
    if len(sys.argv) > 2:
        wanted = sys.argv[2:]
        names = [n for n in names if any(n.startswith(w) for w in wanted)]
    for i, name in enumerate(names):
        spec = CATALOG[name]
        try:
            got = spec.spark(spark, d).toPandas()
        except Exception as e:  # noqa: BLE001 - audit: record, keep going
            bad.append((name, f"SPARK RAISED: {e!r}"))
            continue
        try:
            want = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ORACLE RAISED: {e!r}"))
            continue
        res = compare_frames(got, want)
        if not (res.ok and res.exact):
            bad.append((name, res.detail or "approximate-only equality"))
        if i % 50 == 0:
            print(f"progress {i}/{len(names)}", flush=True)
    print(f"DONE ({kind}): {len(bad)} divergent of {len(names)}")
    for n, detail in bad:
        print(f"MISMATCH {n}: {detail[:240]}")
    spark.stop()
    return min(len(bad), 120)


if __name__ == "__main__":
    raise SystemExit(main())
