"""Grouped statistical kernels that are genuinely IMPERATIVE — the
``applyInPandas`` tier.

Everything else in this engine compiles to DataFrame algebra because the
efficient algorithm IS relational. The ops here are the opposite case:
the naive formulation is a quadratic self-join, the efficient algorithm
is sequential (merge-sort counting, patience sorting, ...) — exactly
what Spark's grouped-map Arrow path exists for. The contract mirrors
SURVEY §2.10: Arrow-batched pandas per GROUP, never row-at-a-time
Python, and only where built-ins genuinely can't express the O(n log n)
form.

Scale posture: ``applyInPandas`` shuffles once on the group key and
streams each group through one Python worker as Arrow batches; group
size is the memory bound (a group must fit in a worker), which holds for
per-entity series (events per type/user), not for whole-corpus groups —
those need chunked variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_count(vals: list[float]) -> int:
    """Number of strictly-decreasing pairs (i < j, v_i > v_j) —
    inversions — by merge sort, O(n log n), no numpy needed at
    per-group sizes."""
    n = len(vals)
    if n < 2:
        return 0
    buf = list(vals)
    tmp = [0.0] * n
    count = 0
    width = 1
    while width < n:
        for lo in range(0, n, 2 * width):
            mid = min(lo + width, n)
            hi = min(lo + 2 * width, n)
            i, j, k = lo, mid, lo
            while i < mid and j < hi:
                if buf[i] <= buf[j]:
                    tmp[k] = buf[i]
                    i += 1
                else:
                    # buf[i] > buf[j]: every remaining left element
                    # exceeds buf[j] -> mid - i inversions at once
                    count += mid - i
                    tmp[k] = buf[j]
                    j += 1
                k += 1
            tmp[k:hi] = buf[i:mid] if i < mid else buf[j:hi]
            buf[lo:hi] = tmp[lo:hi]
        width *= 2
    return count


def mann_kendall_trend(
    df: DataFrame,
    group_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
) -> DataFrame:
    """Mann-Kendall trend statistic per group: over the series ordered
    by ``order_cols``, S = Σ_{i<j} sign(v_j − v_i), with
    n_concordant (v_i < v_j), n_discordant (v_i > v_j), and
    tau_a = S / (n(n−1)/2).

    This is the canonical applyInPandas case: the efficient algorithm is
    merge-sort pair counting (O(n log n), sequential — not expressible
    as DataFrame algebra), while the RELATIONAL formulation is an
    O(n²) self-join, which is exactly what the DuckDB oracle runs, so
    the hash proves the imperative kernel against brute force.
    Discordant pairs are inversions of the time-ordered value sequence;
    tied pairs (grouped value counts) are neither; concordant =
    total − discordant − tied. All counts are exact integers; tau_a is
    one IEEE division of exact integers — portable.

    One shuffle on the group key; each group streams through a worker
    as Arrow batches (group size = the documented memory bound).
    """
    import pandas as pd

    out_schema = (
        f"{group_col} string, n bigint, n_concordant bigint, "
        "n_discordant bigint, s bigint, tau_a double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        vals = [float(v) for v in pdf[value_col]]
        n = len(vals)
        total = n * (n - 1) // 2
        disc = _merge_count(vals)
        ties = 0
        for m in pd.Series(vals).value_counts():
            ties += int(m) * (int(m) - 1) // 2
        conc = total - disc - ties
        s = conc - disc
        tau = s / total if total else None
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "n_concordant": [conc],
                "n_discordant": [disc],
                "s": [s],
                "tau_a": [tau],
            }
        )

    cols = [group_col, *order_cols, value_col]
    return (
        df.select(*cols)
        .filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .applyInPandas(kernel, out_schema)
    )


# The applyInPandas kernels above reference this module's helpers
# (_merge_count). Cloudpickle serializes importable-module functions BY
# REFERENCE, so a Python worker whose sys.path lacks the repo root (the
# driver harness runs from another cwd; sys.path edits don't propagate
# to workers) would fail the import. Registering the module for
# by-value serialization ships the code inside the closure instead —
# the same posture ext/multimodal.py documents, and the right one on a
# real cluster where executors may not have the package deployed.
import sys as _sys  # noqa: E402

try:  # pragma: no cover - depends on the vendored cloudpickle version
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; cwd-run sessions still work
    pass
