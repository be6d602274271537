"""Oracle-parity numeric helpers.

The driver's correctness gate hashes values produced by our Spark plans
against DuckDB running equivalent ANSI SQL. Floating-point *accumulation*
is the one place two correct engines legitimately diverge: a parallel
32-partition double sum and DuckDB's sequential sum round differently near
decimal boundaries. The fix is to make every money-style aggregate
**order-independent**:

- cast the addend to ``DECIMAL(28, 6)`` *before* summing (double→decimal
  conversion is a deterministic per-value rounding, identical in both
  engines; decimal addition is exact and associative),
- divide / round / cast back to double only after the exact sum.

This mirrors the reference's own post-aggregate ``.round(2)`` convention
(reference data_processing.py:849,862,873,885,898 — every metric table is
rounded to 2 decimals), so the helpers bake in ``round(_, 2)``.

Single-value statistics (median / percentile) are sort-based, not
accumulation-based, so plain doubles are already deterministic; Spark 3.4+
``median``/``percentile`` are exact-interpolating like DuckDB's
``median``/``quantile_cont`` (SURVEY.md §2.4 notes; never use
``percentile_approx`` at oracle scale — see ``approx switch`` in
quality.py for the 100 TB posture).

Cross-engine decimal→double caveat (found via a8): Spark's cast uses
Java ``BigDecimal.doubleValue`` (correctly rounded), but DuckDB's direct
``CAST(DECIMAL AS DOUBLE)`` divides the int128 payload by 10^scale in
floating point and can be off by an ulp for wide decimals — oracle SQL
must route through VARCHAR (``CAST(CAST(x AS VARCHAR) AS DOUBLE)``,
strtod is correctly rounded) whenever the decimal has many digits.
Decimal MULTIPLICATION is exact in both engines only while the result
stays ≤ 38 digits: Spark needs p1+p2+1 ≤ 38 and DuckDB w1+w2 ≤ 38, so
cross products use asymmetric casts like (24,6)×(13,6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact-sum accumulator type. 28 integer+fraction digits holds a sum of
# ~1e12 rows of ~1e6-scale money values without overflow; 6 fractional
# digits is far below any boundary the 2-decimal output rounding can see.
DEC = "decimal(28,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: The exact-decimal tier's value domain. Beyond ~9e13 the DOUBLE
#: multiplication value*100 itself stops being integer-exact (2^53/100),
#: so cents-int64 exactness is unachievable regardless of the cast —
#: 1e13 is where the tier's contract honestly ends, not a tuning knob.
EXACT_DOMAIN_ABS = 1e13


def _finite(c: Column) -> Column:
    """Out-of-domain (NaN/±Inf/|x| ≥ 1e13) → NULL before the decimal
    cast (round-11 NaN + magnitude conventions): Spark's non-ANSI
    casts fold NaN/overflow to NULL/clamped values while ANSI engines
    RAISE — so the exact-decimal tier screens explicitly and every
    aggregate skips screened values like any other NULL, identically
    in both engines. ``abs(c) < B`` alone rejects NaN and ±Inf in both
    engines (NaN compares greater than everything); the isnan arm
    stays for explicitness. Leaf-column guard only (never a
    multiply-referenced expression — BASELINE.md ledger #2)."""
    return F.when(
        ~F.isnan(c) & (F.abs(c) < F.lit(EXACT_DOMAIN_ABS)), c
    )


def exact_sum(col: Column | str) -> Column:
    """Order-independent SUM: decimal-cast before accumulating;
    non-finite addends are screened to NULL (skipped), see _finite."""
    return F.sum(_finite(_c(col)).cast(DEC))


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """round(SUM(x), 2) as double — the reference's metric-sum shape."""
    return F.round(exact_sum(col), scale).cast("double")


def money_avg(col: Column | str) -> Column:
    """SUM(x)/COUNT(x) as double, deliberately UNROUNDED.

    The exact decimal sum is cast to double (deterministic nearest-value
    conversion), then divided by the count in one IEEE-754 operation — two
    identical inputs → bit-identical quotient in any engine. Rounding a raw
    double is the one non-portable step (engines disagree exactly at the
    .xx5 boundary, and ratios of 2-decimal money values land there often),
    so the driver-facing queries skip it; the reference's cosmetic
    ``.round(2)`` lives only in the taxi metrics module whose golden test
    uses a pandas oracle.
    """
    c = _c(col)
    # count the SCREENED column too: the mean is over finite values
    return exact_sum(c).cast("double") / F.count(_finite(c))


def money_median(col: Column | str) -> Column:
    """Exact interpolated median, unrounded (sort-based → order-free)."""
    return F.median(_c(col))


def oracle_finite(expr: str) -> str:
    """DuckDB SQL twin of :func:`_finite`."""
    return (
        f"CASE WHEN isfinite({expr}) AND abs({expr}) < 1e13 "
        f"THEN {expr} END"
    )


def oracle_money_sum(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`money_sum`."""
    return (
        f"CAST(ROUND(SUM(CAST(({oracle_finite(f'({expr})')}) "
        f"AS DECIMAL(28,6))), {scale}) AS DOUBLE)"
    )


def oracle_money_avg(expr: str) -> str:
    """DuckDB SQL twin of :func:`money_avg`."""
    return (
        f"CAST(SUM(CAST(({oracle_finite(f'({expr})')}) AS DECIMAL(28,6))) "
        f"AS DOUBLE) / COUNT({oracle_finite(f'({expr})')})"
    )


def oracle_money_median(expr: str) -> str:
    """DuckDB SQL twin of :func:`money_median`."""
    return f"CAST(MEDIAN({expr}) AS DOUBLE)"
