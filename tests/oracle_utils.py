"""Mini replica of the driver's DuckDB-oracle comparison so parity failures
surface in `pytest` long before a round's CORRECTNESS_r{N}.json does.

Mirrors the documented driver semantics: row-count + schema + order-
insensitive value comparison with columns sorted by name. We compare exact
values (the driver hashes), and report the worst float deviation when a
query is only approximately equal so the offending aggregate is obvious.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    # numpy scalars → python
    if hasattr(v, "item"):
        return v.item()
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(repr(x) for x in r))


@dataclass
class CompareResult:
    ok: bool
    exact: bool
    n_spark: int
    n_oracle: int
    max_float_diff: float
    detail: str = ""


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, float_tol: float = 0.0
) -> CompareResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            False, False, len(spark_pdf), len(oracle_pdf), math.inf,
            f"column mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}",
        )
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            False, False, len(spark_pdf), len(oracle_pdf), math.inf,
            f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}",
        )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    max_diff = 0.0
    def _kind(v) -> str:
        # bool before int (bool subclasses int); int-vs-float matters
        # because the DRIVER hashes repr()s — `3` and `3.0` are equal
        # under Python == but hash differently there (the x99 lesson:
        # DuckDB window sums come back HUGEINT -> pandas float64)
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, float):
            return "float"
        if isinstance(v, int):
            return "int"
        return type(v).__name__

    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if va is None and vb is None:
                continue
            if va is not None and vb is not None and _kind(va) != _kind(vb):
                return CompareResult(
                    False, False, len(a), len(b), max_diff,
                    f"row {i}: type kind {_kind(va)} != {_kind(vb)} "
                    f"for {va!r} vs {vb!r} — repr-hash would diverge\n"
                    f"  spark row:  {ra}\n  oracle row: {rb}",
                )
            if isinstance(va, float) and isinstance(vb, float):
                if va == vb:
                    continue
                diff = abs(va - vb)
                max_diff = max(max_diff, diff)
                if diff > float_tol:
                    return CompareResult(
                        False, False, len(a), len(b), max_diff,
                        f"row {i}: float {va!r} != {vb!r} (diff={diff:g})\n"
                        f"  spark row:  {ra}\n  oracle row: {rb}",
                    )
            elif va != vb:
                return CompareResult(
                    False, False, len(a), len(b), max_diff,
                    f"row {i}: {va!r} != {vb!r}\n"
                    f"  spark row:  {ra}\n  oracle row: {rb}",
                )
    return CompareResult(True, max_diff == 0.0, len(a), len(b), max_diff)


def threaded_sweep(names, check, request=None, max_workers=8):
    """Evaluate ``check(name)`` over a catalog sweep on a thread pool
    (r12, guide §2.6 — overlap independent jobs): plain pytest runs
    parametrized catalog sweeps strictly sequentially, ~0.5 s of
    mostly-idle driver latency per tiny query. Spark's scheduler
    overlaps independent actions submitted from driver threads, so one
    pooled pass per sweep cuts the wall time ~4x while every
    parametrized test keeps its id and assertion (it reads the
    recorded outcome). Under SPARK_GRAFT_SHARD the shards are the
    parallelism and each selects a SLICE of the tests — fall back to
    lazy per-entry evaluation so a shard never re-runs a whole sweep.

    ``check`` returns None for pass or a failure message; it must be
    thread-safe (per-thread DuckDB connections; all catalog temp
    view/table/sink names are entry-prefixed or uuid-suffixed, so
    concurrent builders do not collide)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    eager = not os.environ.get("SPARK_GRAFT_SHARD")
    if eager and request is not None:
        # targeted runs (-k / node selection): when fewer than half the
        # module's sweep tests were collected, evaluating the whole
        # catalog eagerly would make a 1-test run pay the full sweep —
        # fall back to lazy per-entry evaluation there too
        try:
            module_file = request.module.__file__
            n_sel = sum(
                1
                for it in request.session.items
                if str(getattr(it, "fspath", "")) == module_file
            )
            if n_sel < len(names) // 2:
                eager = False
        except Exception:
            pass
    if not eager:
        class _Lazy(dict):
            def __missing__(self, name):
                self[name] = check(name)
                return self[name]

        return _Lazy()
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return dict(zip(names, pool.map(check, names)))
