"""Query catalog: every operator from SURVEY.md §2 phrased over the driver
testdata tables, paired with the DuckDB oracle SQL the driver verifies
against (FIXTURES.md §4 mapping rule).

Each entry documents which SURVEY §2 operator ids it covers and the
reference location (file:line under /root/reference) whose semantics it
reproduces. The Spark side is a lazy DataFrame plan built from native
functions only — zero Python UDFs in this module (SURVEY §2.10 design
goal), so every query stays inside Catalyst/whole-stage-codegen and scales
by partitioning alone.

Determinism rules (so the driver's order-insensitive value hash matches):

- money aggregates go through compat.money_* (decimal-exact, order-free);
- every computed column is aliased identically in both dialects;
- any LIMIT / row_number has a total-order tie-break on a unique key;
- nanosecond timestamps are floored to µs identically in both engines
  (tables.py handles Spark; DuckDB floors on read the same way).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..compat import (
    exact_sum,
    money_avg,
    money_median,
    money_sum,
    oracle_money_avg,
    oracle_money_median,
    oracle_money_sum,
)
from ..tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    doc: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None → driver runs rows-only check
    tags: tuple[str, ...] = field(default=())


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, doc: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(name=name, doc=doc, spark=fn, oracle=oracle, tags=tags)
        return fn

    return wrap


# ---------------------------------------------------------------------------
# Non-finite payload screens (round 11, the NaN/Inf convention — the
# extension of the treat-failed-payloads-as-NULL line the NULL wave
# drew; x251_nonfinite_screen is the ingest-time whole-corpus twin).
# A NaN/±Inf payload reaching a fixed-point cast RAISES in ANSI engines
# (DuckDB: "nan can't be cast ... INT64") and silently folds to 0 under
# Spark's pinned non-ANSI cast — silent corruption either way, so every
# exact-decimal (cents / fixed-point) cast screens non-finite to NULL
# first, on BOTH engines; SQL aggregates then skip screened values like
# any other NULL. The Spark guard tests a LEAF column reference only —
# never a multiply-referenced expression — so it cannot re-trigger the
# conditional-branch subexpression trap (BASELINE.md ledger #2).
# ---------------------------------------------------------------------------

_INF = float("inf")


#: Exact-decimal value domain (see compat.EXACT_DOMAIN_ABS: beyond
#: ~9e13 the value*100 DOUBLE multiply loses integer exactness, so the
#: cents tier's contract honestly ends there).
_DOMAIN = 1e13


def fin(c: str | Column) -> Column:
    """Spark: out-of-domain (NaN/±Inf/|x| ≥ 1e13) scalar → NULL; NULL
    stays NULL. abs(c) < B alone rejects NaN and ±Inf (NaN compares
    greater than everything in both engines)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(~F.isnan(col) & (F.abs(col) < F.lit(_DOMAIN)), col)


def sql_finite(c: str) -> str:
    """DuckDB twin of :func:`fin` (isfinite(NULL) is NULL → NULL out)."""
    return f"CASE WHEN isfinite({c}) AND abs({c}) < 1e13 THEN {c} END"


# Spark-SQL dialect of the same screen, for F.expr() strings (Spark has
# no isfinite(); abs(x) <> Infinity is false for NaN too, but the isnan
# arm keeps the intent explicit and mirrors fin()):
def sparksql_finite(c: str) -> str:
    return (
        f"CASE WHEN NOT isnan({c}) AND abs({c}) < 1e13 THEN {c} END"
    )


def finite_vec(c: str | Column) -> Column:
    """Spark: TRUE iff the vector is present with every component
    finite — a vector carrying any NaN/±Inf component is a FAILED
    embedding and is excluded whole (the NULL-vector convention
    extended; screening single components would leak NULL-component
    centroids into downstream algebra)."""
    col = F.col(c) if isinstance(c, str) else c
    # size > 0 matches the SQL twin, whose max-over-empty-list is NULL.
    # The 1e9 component bound keeps the fixed-point quantizer algebra
    # (floor(x*1e6) sums) inside int64/2^53 exactness; abs >= bound
    # also catches ±Inf, and isnan the NaN arm.
    return (
        col.isNotNull()
        & (F.size(col) > 0)
        & ~F.exists(
            col, lambda x: F.isnan(x) | (F.abs(x) >= F.lit(1e9))
        )
    )


def sql_finite_vec(c: str) -> str:
    """DuckDB twin of :func:`finite_vec`: max(|x_i|) < 1e9 iff all
    components are finite and in the quantizer domain (NaN propagates
    through list max and compares greater than everything; NULL list →
    NULL → excluded by WHERE)."""
    return (
        f"(list_aggregate(list_transform(CAST({c} AS DOUBLE[]), "
        f"x -> abs(x)), 'max') < 1e9)"
    )


# ---------------------------------------------------------------------------
# Scans / sources (SURVEY §2.1)
# ---------------------------------------------------------------------------


@register(
    "s1_parquet_scan_pruned",
    "S1 parquet scan with column pruning + predicate pushdown. Reference "
    "downloads whole files and loads all columns (data_processing.py:592-629); "
    "here the filter and 3-column projection reach the parquet reader "
    "(PushedFilters/ReadSchema in .explain) — the O8 free upgrade of SURVEY §4.",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_quantity >= 45.0
    """,
    tags=("S1", "O8"),
)
def s1_parquet_scan_pruned(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "s5_keep_newest_per_key",
    "S5 file-level dedup keep-newest (data_processing.py:212-224) as a "
    "row_number window: latest event per user_id, event_id as total-order "
    "tie-break.",
    oracle="""
        SELECT user_id, event_id, ts, event_type
        FROM (
            SELECT user_id, event_id, ts, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tags=("S5", "window"),
)
def s5_keep_newest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "s6_topk_newest",
    "S6 top-K newest selector (data_processing.py:552-590, sort desc + take "
    "max_files). Total order via (ts, event_id) so the K-row result is "
    "deterministic.",
    oracle="""
        SELECT event_id, ts, event_type
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 20
    """,
    tags=("S6", "D4"),
)
def s6_topk_newest(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(20)
        .select("event_id", "ts", "event_type")
    )


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2)
# ---------------------------------------------------------------------------


@register(
    "p1_typed_cast_enforce",
    "P1 typed cast projection with coerce-to-null on failure "
    "(apply_optimized_schema + robust_pandas_cast, data_processing.py:682-753). "
    "Spark non-ANSI CAST ≡ pandas errors='coerce' ≡ DuckDB TRY_CAST; the "
    "string→int cast column is all-null by design.",
    oracle="""
        SELECT CAST(l_orderkey AS INTEGER)      AS orderkey_i32,
               TRY_CAST(l_linenumber AS TINYINT) AS linenumber_i8,
               CAST(l_quantity AS REAL)          AS quantity_f32,
               CAST(l_extendedprice AS REAL)     AS price_f32,
               TRY_CAST(l_returnflag AS INTEGER) AS returnflag_bad_cast
        FROM lineitem
    """,
    tags=("P1",),
)
def p1_typed_cast_enforce(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("int").alias("orderkey_i32"),
        F.col("l_linenumber").cast("tinyint").alias("linenumber_i8"),
        F.col("l_quantity").cast("float").alias("quantity_f32"),
        F.col("l_extendedprice").cast("float").alias("price_f32"),
        # plain cast, NOT try_cast: load_table pins ansi=false on any
        # session, under which cast coerces to null via exception-free safe
        # parsing. try_cast catches a per-row JVM exception on every
        # non-numeric value — measured 25× slower (3.1 s vs 0.12 s at
        # sf0.1) on this all-invalid column.
        F.col("l_returnflag").cast("int").alias("returnflag_bad_cast"),
    )


@register(
    "p2_partition_consistency_filter",
    "P2 filename/partition consistency filter (data_processing.py:27-71: "
    "rows whose event-time disagrees with the file's declared year/month are "
    "dropped). Phrased as a year-bounded filter; in the taxi pipeline the "
    "(year, month) literals come from regexp_extract(input_file_name()) — "
    "see features.filename_consistency_filter.",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        WHERE year(o_orderdate) = 1996 AND month(o_orderdate) BETWEEN 1 AND 6
    """,
    tags=("P2", "E3"),
)
def p2_partition_consistency_filter(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    return od.filter(
        (F.year("o_orderdate") == 1996) & (F.month("o_orderdate").between(1, 6))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "p3_invalid_record_filter",
    "P3/C10 invalid-record removal (data_processing.py:190-200): positive "
    "measures AND non-null timestamps.",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 0 AND l_extendedprice > 0 AND l_shipdate IS NOT NULL
    """,
    tags=("P3", "C10"),
)
def p3_invalid_record_filter(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") > 0)
        & F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "p4_valid_flag_projection",
    "P4 validity flag as a column, not a filter (data_processing.py:805-812 "
    "is_valid_trip: bounded duration/distance, non-negative money).",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               (l_quantity > 0 AND l_quantity < 50
                AND l_extendedprice > 0 AND l_extendedprice < 100000
                AND l_discount >= 0 AND l_tax >= 0) AS is_valid_item
        FROM lineitem
    """,
    tags=("P4",),
)
def p4_valid_flag_projection(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    valid = (
        (F.col("l_quantity") > 0)
        & (F.col("l_quantity") < 50)
        & (F.col("l_extendedprice") > 0)
        & (F.col("l_extendedprice") < 100000)
        & (F.col("l_discount") >= 0)
        & (F.col("l_tax") >= 0)
    )
    return li.select("l_orderkey", "l_linenumber", valid.alias("is_valid_item"))


# ---------------------------------------------------------------------------
# Scalar expressions (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "e1_ship_delay_minutes",
    "E1 timestamp difference in minutes (data_processing.py:765-767 "
    "trip_duration_minutes) over an order→lineitem join; the dim side of "
    "nothing here is small, so this is a plain shuffled key join at scale "
    "with AQE sizing.",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(date_diff('minute', o.o_orderdate, l.l_shipdate) AS BIGINT)
                   AS ship_delay_minutes
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("E1", "join"),
)
def e1_ship_delay_minutes(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    od = load_table(spark, sf, "orders")
    return li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("timestampdiff(MINUTE, o_orderdate, l_shipdate)").alias(
            "ship_delay_minutes"
        ),
    )


@register(
    "e2_rate_clip_div_zero",
    "E2 ratio with clip and the pandas inf trap (data_processing.py:770-771: "
    "distance/(duration/60) clipped to [0,100]; duration 0 → inf → clipped "
    "to 100). Spark x/0→NULL (non-ANSI), so the branch is explicit in both "
    "dialects.",
    oracle="""
        SELECT event_id,
               CASE WHEN hour(ts) = 0 THEN 100.0
                    ELSE LEAST(GREATEST(value / hour(ts), 0.0), 100.0)
               END AS value_rate_clipped
        FROM events
    """,
    tags=("E2",),
)
def e2_rate_clip_div_zero(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    h = F.hour("ts")
    rate = F.least(F.greatest(F.col("value") / h, F.lit(0.0)), F.lit(100.0))
    return ev.select(
        "event_id",
        F.when(h == 0, F.lit(100.0)).otherwise(rate).alias("value_rate_clipped"),
    )


@register(
    "e3_e4_e5_datetime_parts",
    "E3 hour/month/year extraction (data_processing.py:774-777), E4 weekday "
    "name (dt.day_name → date_format EEEE), E5 weekend flag (pandas Mon=0 "
    "dayofweek>=5 ≡ Spark dayofweek∈{1,7} ≡ DuckDB dayofweek∈{0,6}).",
    oracle="""
        SELECT event_id,
               CAST(hour(ts) AS INTEGER)  AS event_hour,
               CAST(month(ts) AS INTEGER) AS event_month,
               CAST(year(ts) AS INTEGER)  AS event_year,
               dayname(ts)                AS day_name,
               dayofweek(ts) IN (0, 6)    AS is_weekend
        FROM events
    """,
    tags=("E3", "E4", "E5"),
)
def e3_e4_e5_datetime_parts(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("event_hour"),
        F.month("ts").alias("event_month"),
        F.year("ts").alias("event_year"),
        F.date_format("ts", "EEEE").alias("day_name"),
        F.dayofweek("ts").isin(1, 7).alias("is_weekend"),
    )


@register(
    "e6_time_of_day_binning",
    "E6 right-closed hour binning (data_processing.py:780-785: pd.cut bins "
    "[0,6,12,18,24] include_lowest → hour 6 is still Night).",
    oracle="""
        SELECT event_id,
               CASE WHEN hour(ts) <= 6  THEN 'Night'
                    WHEN hour(ts) <= 12 THEN 'Morning'
                    WHEN hour(ts) <= 18 THEN 'Afternoon'
                    ELSE 'Evening' END AS time_of_day
        FROM events
    """,
    tags=("E6",),
)
def e6_time_of_day_binning(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    h = F.hour("ts")
    return ev.select(
        "event_id",
        F.when(h <= 6, "Night")
        .when(h <= 12, "Morning")
        .when(h <= 18, "Afternoon")
        .otherwise("Evening")
        .alias("time_of_day"),
    )


@register(
    "e7_revenue_segment_binning",
    "E7 revenue binning with the zero→null trap (data_processing.py:793-797: "
    "pd.cut without include_lowest leaves total==0 (and <0, and null) "
    "uncategorized → null segment). Thresholds scaled to o_totalprice.",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN NULL
                    WHEN o_totalprice <= 100000 THEN 'Low'
                    WHEN o_totalprice <= 200000 THEN 'Medium'
                    WHEN o_totalprice <= 350000 THEN 'High'
                    ELSE 'Very High' END AS revenue_segment
        FROM orders
    """,
    tags=("E7",),
)
def e7_revenue_segment_binning(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    t = F.col("o_totalprice")
    return od.select(
        "o_orderkey",
        F.when(t.isNull() | (t <= 0), F.lit(None).cast("string"))
        .when(t <= 100000, "Low")
        .when(t <= 200000, "Medium")
        .when(t <= 350000, "High")
        .otherwise("Very High")
        .alias("revenue_segment"),
    )


@register(
    "e8_safe_ratio_pct",
    "E8 percentage ratio with divide-by-zero→0 (data_processing.py:800-802 "
    "tip_percentage: tip/fare*100, ±inf and NaN → 0). l_discount has real "
    "zeros in the testdata, so the guard branch is exercised.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_discount = 0 THEN 0.0
                    ELSE l_tax / l_discount * 100.0
               END AS tax_discount_pct
        FROM lineitem
    """,
    tags=("E8",),
)
def e8_safe_ratio_pct(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(d == 0, F.lit(0.0))
        .otherwise(F.col("l_tax") / d * 100.0)
        .alias("tax_discount_pct"),
    )


@register(
    "e10_regex_extract_props",
    "E10 regex field extraction (data_processing.py:15-25 parses "
    "yellow_tripdata_YYYY-MM from filenames; here the same regexp_extract "
    "shape over the events.props JSON-ish string).",
    oracle="""
        SELECT event_id,
               TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k_value
        FROM events
    """,
    tags=("E10",),
)
def e10_regex_extract_props(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k_value"),
    )


@register(
    "e11_e12_consistency_expr",
    "E11 abs-tolerance comparison (data_processing.py:169) + E12 interval "
    "arithmetic (data_processing.py:180-184, +5 minutes): per-row expected "
    "charge vs extendedprice, and a repaired timestamp column.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                   - l_extendedprice) > 0.1          AS charge_mismatch,
               l_shipdate + INTERVAL 5 MINUTE        AS shipdate_plus_5m
        FROM lineitem
    """,
    tags=("E11", "E12"),
)
def e11_e12_consistency_expr(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.abs(charge - F.col("l_extendedprice")) > 0.1).alias("charge_mismatch"),
        (F.col("l_shipdate") + F.expr("INTERVAL 5 MINUTES")).alias("shipdate_plus_5m"),
    )


@register(
    "e13_date_format_partition_key",
    "E13 date-part string formatting (data_processing.py:453 strftime "
    "'%Y-%m' partition keys) as a row-level expression.",
    oracle="""
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS order_ym
        FROM orders
    """,
    tags=("E13",),
)
def e13_date_format_partition_key(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    return od.select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM").alias("order_ym")
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "a1_returnflag_performance",
    "A1 vendor_performance analog (create_taxi_metrics, "
    "data_processing.py:843-855): multi-aggregate with count / mean / exact "
    "median / sum, all round(2), grouped by (l_returnflag, l_linestatus). "
    "Decimal-exact sums keep the parallel aggregation hash-identical to the "
    "sequential oracle.",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(l_quantity)                                    AS item_count,
               {oracle_money_avg('l_quantity')}                     AS avg_qty,
               {oracle_money_median('l_quantity')}                  AS median_qty,
               {oracle_money_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
               {oracle_money_avg('l_extendedprice * (1 - l_discount)')} AS avg_revenue,
               {oracle_money_median('l_extendedprice')}             AS median_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "agg", "median"),
)
def a1_returnflag_performance(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("l_quantity").alias("item_count"),
        money_avg("l_quantity").alias("avg_qty"),
        money_median("l_quantity").alias("median_qty"),
        money_sum(revenue).alias("total_revenue"),
        money_avg(revenue).alias("avg_revenue"),
        money_median("l_extendedprice").alias("median_price"),
    )


@register(
    "a2_hourly_demand",
    "A2 hourly_demand (data_processing.py:857-866): count / sum / mean by "
    "hour-of-day.",
    oracle=f"""
        SELECT CAST(hour(ts) AS INTEGER)      AS event_hour,
               COUNT(event_id)                AS event_count,
               {oracle_money_sum('value')}    AS total_value,
               {oracle_money_avg('value')}    AS avg_value
        FROM events
        GROUP BY 1
    """,
    tags=("A2", "agg"),
)
def a2_hourly_demand(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.groupBy(F.hour("ts").alias("event_hour")).agg(
        F.count("event_id").alias("event_count"),
        money_sum("value").alias("total_value"),
        money_avg("value").alias("avg_value"),
    )


@register(
    "a3_supplier_analysis",
    "A3 pickup_location_analysis analog (data_processing.py:868-877): "
    "count / sum / mean by location key (l_suppkey).",
    oracle=f"""
        SELECT l_suppkey,
               COUNT(l_extendedprice)               AS item_count,
               {oracle_money_sum('l_extendedprice')} AS total_revenue,
               {oracle_money_avg('l_quantity')}      AS avg_qty
        FROM lineitem
        GROUP BY 1
    """,
    tags=("A3", "agg"),
)
def a3_supplier_analysis(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.count("l_extendedprice").alias("item_count"),
        money_sum("l_extendedprice").alias("total_revenue"),
        money_avg("l_quantity").alias("avg_qty"),
    )


@register(
    "a4_priority_analysis",
    "A4 payment_analysis analog (data_processing.py:879-889): count / two "
    "sums / mean-of-ratio by categorical key.",
    oracle=f"""
        SELECT o_orderpriority,
               COUNT(o_orderkey)                    AS order_count,
               {oracle_money_sum('o_totalprice')}   AS total_revenue,
               {oracle_money_avg('o_totalprice')}   AS avg_revenue
        FROM orders
        GROUP BY 1
    """,
    tags=("A4", "agg"),
)
def a4_priority_analysis(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.count("o_orderkey").alias("order_count"),
        money_sum("o_totalprice").alias("total_revenue"),
        money_avg("o_totalprice").alias("avg_revenue"),
    )


@register(
    "a5_monthly_summary",
    "A5 monthly_summary (data_processing.py:892-908): multi-key group on "
    "(year, month) derived from the event timestamp.",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INTEGER)  AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               COUNT(o_orderkey)                   AS order_count,
               {oracle_money_sum('o_totalprice')}  AS total_revenue,
               {oracle_money_avg('o_totalprice')}  AS avg_revenue
        FROM orders
        GROUP BY 1, 2
    """,
    tags=("A5", "agg"),
)
def a5_monthly_summary(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    return od.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    ).agg(
        F.count("o_orderkey").alias("order_count"),
        money_sum("o_totalprice").alias("total_revenue"),
        money_avg("o_totalprice").alias("avg_revenue"),
    )


@register(
    "a6_scalar_statistics",
    "A6 scalar statistics used inside cleaning (data_processing.py:94,132,"
    "142,636,368): exact median, exact p99 percentile, distinct count, max. "
    "One-row result; at 100 TB these become sketch/approx variants behind "
    "quality.py's exactness switch.",
    oracle=f"""
        SELECT COUNT(*)                                         AS n_rows,
               {oracle_money_median('l_quantity')}              AS median_qty,
               CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE) AS p99_price,
               COUNT(DISTINCT l_partkey)                        AS distinct_parts,
               MAX(l_shipdate)                                  AS max_shipdate
        FROM lineitem
    """,
    tags=("A6", "agg", "percentile"),
)
def a6_scalar_statistics(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_median("l_quantity").alias("median_qty"),
        F.percentile("l_extendedprice", F.lit(0.99)).cast("double").alias("p99_price"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


# ---------------------------------------------------------------------------
# Imputation / repair operators (SURVEY §2.7 C-family) — phrased over the
# testdata tables with deterministic masking so the driver gate exercises
# the batch-scoped-statistic semantics (the taxi pipeline's quality.py is
# additionally pinned by the golden pandas-oracle test)
# ---------------------------------------------------------------------------


@register(
    "c1_median_impute_batch",
    "C1 median imputation with a batch-scoped statistic (clean_taxi_data, "
    "data_processing.py:86-95): nulls (deterministically masked here) are "
    "filled with the median of the current batch. The scalar is one "
    "partial-aggregated job collected to the driver and injected as a "
    "literal — the repair projection itself is shuffle-free.",
    oracle="""
        WITH m AS (
            SELECT event_id,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END AS mv
            FROM events
        )
        SELECT event_id,
               COALESCE(mv, (SELECT median(mv) FROM m)) AS value_imputed
        FROM m
    """,
    tags=("C1", "impute"),
)
def c1_median_impute_batch(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    masked = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    med = ev.agg(F.median(masked)).collect()[0][0]
    return ev.select(
        "event_id", F.coalesce(masked, F.lit(med)).alias("value_imputed")
    )


@register(
    "c2_mode_impute_batch",
    "C2 mode imputation (data_processing.py:98-105) with the fully "
    "deterministic groupBy-count formulation (highest count, smallest "
    "value tie-break — pandas mode().iloc[0] semantics) — identical "
    "ordering logic runs in the oracle, so ties cannot diverge.",
    oracle="""
        WITH m AS (
            SELECT event_id,
                   CASE WHEN value < 1 THEN NULL ELSE event_type END AS mt
            FROM events
        )
        SELECT event_id,
               COALESCE(mt, (SELECT mt FROM m WHERE mt IS NOT NULL
                             GROUP BY mt ORDER BY count(*) DESC, mt LIMIT 1))
                   AS type_imputed
        FROM m
    """,
    tags=("C2", "impute", "mode"),
)
def c2_mode_impute_batch(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    masked = F.when(F.col("value") < 1, F.lit(None)).otherwise(F.col("event_type"))
    mode_row = (
        ev.select(masked.alias("mt"))
        .filter(F.col("mt").isNotNull())
        .groupBy("mt")
        .count()
        .orderBy(F.desc("count"), F.asc("mt"))
        .first()
    )
    # empty/all-null batch: no mode exists, nulls stay null (matches the
    # oracle's empty scalar subquery and the reference's notna().any()
    # guard, dp:100)
    fill = F.lit(None).cast("string") if mode_row is None else F.lit(mode_row.mt)
    return ev.select(
        "event_id", F.coalesce(masked, fill).alias("type_imputed")
    )


@register(
    "c4_p99_outlier_cap",
    "C4/C5 outlier cap to the batch p99 (data_processing.py:127-144: "
    "values outside the legal range overwritten with the 99th percentile "
    "computed over the whole batch). Exact percentile at oracle scale; "
    "quality.py documents the percentile_approx switch for 100 TB.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_extendedprice >
                         (SELECT quantile_cont(l_extendedprice, 0.99) FROM lineitem)
                    THEN (SELECT quantile_cont(l_extendedprice, 0.99) FROM lineitem)
                    ELSE l_extendedprice END AS price_capped
        FROM lineitem
    """,
    tags=("C4", "C5", "percentile"),
)
def c4_p99_outlier_cap(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p99 = li.agg(F.percentile("l_extendedprice", F.lit(0.99))).collect()[0][0]
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(price > p99, F.lit(p99)).otherwise(price).alias("price_capped"),
    )


# ---------------------------------------------------------------------------
# Dedup / sort / set ops (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "d1_exact_row_dedup",
    "D1/C9 exact full-row dedup (data_processing.py:117-121 drop_duplicates). "
    "Projected to (lang, source) so real duplicates exist; keep-first is "
    "safe because duplicate rows are identical (SURVEY §7.3.5).",
    oracle="SELECT DISTINCT lang, source FROM documents",
    tags=("D1", "C9"),
)
def d1_exact_row_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents").select("lang", "source").dropDuplicates()


@register(
    "d2_union_schema_drift",
    "D2 schema-aligning n-ary union (efficient_union_dataframes, "
    "data_processing.py:648-680: union of column sets, null-pad missing, "
    "concat) ≡ unionByName(allowMissingColumns=True). Two drifted "
    "projections of lineitem stand in for drifted files.",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_extendedprice, CAST(NULL AS DOUBLE) AS l_tax
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, l_linenumber, CAST(NULL AS DOUBLE) AS l_quantity,
               l_extendedprice, l_tax
        FROM lineitem WHERE l_linenumber = 2
    """,
    tags=("D2",),
)
def d2_union_schema_drift(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    b = li.filter(F.col("l_linenumber") == 2).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_tax"
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "d5_distinct_sorted",
    "D5 sorted-unique probe (data_processing.py:54-55,839-840).",
    oracle="SELECT DISTINCT event_type FROM events ORDER BY event_type",
    tags=("D5",),
)
def d5_distinct_sorted(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .select("event_type")
        .distinct()
        .orderBy("event_type")
    )


@register(
    "d6_manifest_anti_join",
    "D6/S4 idempotency anti-filter (data_processing.py:341-345: candidate "
    "set minus processed ledger) as a left-anti join: orders whose customer "
    "is NOT in the negative-balance quarantine set. The quarantine side is "
    "dim-sized → broadcast, no shuffle of the fact side.",
    oracle="""
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c
            WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0
        )
    """,
    tags=("D6", "S4", "anti-join"),
)
def d6_manifest_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    quarantined = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    return od.join(
        F.broadcast(quarantined),
        od.o_custkey == quarantined.c_custkey,
        "left_anti",
    ).select("o_orderkey", "o_custkey")


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3 — reference has none; ours are the Spark-native tier)
# ---------------------------------------------------------------------------


@register(
    "j1_region_revenue_star_join",
    "Star join through three broadcast-sized dims (lineitem→supplier→nation→"
    "region) with decimal-exact revenue rollup. The reference has zero joins "
    "(SURVEY §2.3); this is the engine's broadcast-join tier: all three dims "
    "fit under the autoBroadcast threshold at any SF, so the fact table "
    "never shuffles.",
    oracle=f"""
        SELECT r.r_name AS region_name,
               COUNT(l.l_orderkey)                                   AS item_count,
               {oracle_money_sum('l.l_extendedprice * (1 - l.l_discount)')}
                                                                     AS total_revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY 1
    """,
    tags=("join", "broadcast", "agg"),
)
def j1_region_revenue_star_join(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    su = load_table(spark, sf, "supplier")
    na = load_table(spark, sf, "nation")
    re = load_table(spark, sf, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("l_orderkey").alias("item_count"),
            money_sum(revenue).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Event-time windowing / sessionization / multi-level aggregation — the
# Spark-native tier beyond the reference (SURVEY §2.8-2.9: reference has no
# window functions and hand-rolls its streaming concepts; these are the ops
# a real event table needs at scale)
# ---------------------------------------------------------------------------


@register(
    "w1_tumbling_hourly_value",
    "Tumbling 1-hour event-time window aggregation (the batch shape of the "
    "streaming hourly-demand metric; streaming twin in streaming.py with "
    "watermarks). window() ≡ date_trunc in any engine; one shuffle on the "
    "window key.",
    oracle=f"""
        SELECT date_trunc('hour', ts)        AS window_start,
               COUNT(event_id)               AS event_count,
               {oracle_money_sum('value')}   AS total_value
        FROM events
        GROUP BY 1
    """,
    tags=("window", "streaming", "agg"),
)
def w1_tumbling_hourly_value(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("event_id").alias("event_count"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_count", "total_value"
        )
    )


@register(
    "w2_user_sessionization",
    "Gaps-and-islands sessionization: per-user sessions split at >30-min "
    "inactivity (lag + running sum of new-session flags), then per-session "
    "rollup. THE canonical event-log operator; one shuffle on user_id, "
    "sessions never cross partitions so it scales by user cardinality.",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, event_id, ts,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               COUNT(event_id) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    tags=("window", "sessionization"),
)
def w2_user_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # gap > 1800 s ⟺ ts > prev + 30 min (interval arithmetic — ntz
    # timestamps don't cast to double)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("event_id").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "w4_session_window_native",
    "Native session_window sessionization (merge while consecutive gaps "
    "< 30 min; window end = last event + gap) — the same islands as w2 "
    "but via Spark's built-in session-window aggregation, which also "
    "runs incrementally under Structured Streaming with watermarked "
    "state. Oracle reproduces the merge rule as gaps-and-islands.",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, event_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS seq
            FROM flagged
        )
        SELECT user_id,
               MIN(ts)                       AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE  AS session_end,
               COUNT(event_id)               AS n_events
        FROM sessions
        GROUP BY user_id, seq
    """,
    tags=("window", "sessionization", "streaming"),
)
def w4_session_window_native(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("event_id").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "w3_topk_per_group",
    "Top-3 orders by totalprice per priority class (rank window + filter): "
    "the per-key top-k pattern — partial top-k runs map-side before the "
    "single shuffle on the group key; (price, orderkey) tie-break keeps the "
    "cut deterministic.",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_orderpriority
                                           ORDER BY o_totalprice DESC, o_orderkey)
                        AS INTEGER) AS rnk
            FROM orders
        )
        WHERE rnk <= 3
    """,
    tags=("window", "topk"),
)
def w3_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        od.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "g1_rollup_year_priority",
    "ROLLUP multi-level aggregate (year × priority → year subtotals → grand "
    "total) — subsumes the reference's separate per-dimension metric tables "
    "in ONE shuffle instead of five. Null group keys mark subtotal rows "
    "(keys are non-null in the data, so levels are unambiguous).",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
               o_orderpriority,
               COUNT(o_orderkey)                  AS order_count,
               {oracle_money_sum('o_totalprice')} AS total_revenue
        FROM orders
        GROUP BY ROLLUP(1, 2)
    """,
    tags=("rollup", "agg"),
)
def g1_rollup_year_priority(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    return od.rollup(
        F.year("o_orderdate").alias("order_year"),
        F.col("o_orderpriority"),
    ).agg(
        F.count("o_orderkey").alias("order_count"),
        money_sum("o_totalprice").alias("total_revenue"),
    )


@register(
    "k1_salted_skew_agg",
    "Two-stage salted aggregation: sub-aggregate on (key, salt), then "
    "merge on key. THE skew-resistant pattern when one group key holds a "
    "large share of a 100 TB table — the hot key's rows spread over 16 "
    "reducers in stage 1 and stage 2 merges 16 tiny partials. Result is "
    "provably identical to a plain GROUP BY because the decimal partial "
    "sums are exact and associative; the oracle runs the plain form.",
    oracle=f"""
        SELECT event_type,
               COUNT(event_id)              AS event_count,
               {oracle_money_sum('value')}  AS total_value
        FROM events
        GROUP BY 1
    """,
    tags=("skew", "salt", "agg"),
)
def k1_salted_skew_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    partial = (
        ev.withColumn("_salt", F.pmod("event_id", F.lit(16)))
        .groupBy("event_type", "_salt")
        .agg(
            F.count("event_id").alias("c"),
            exact_sum("value").alias("s"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("c").alias("event_count"),
        F.round(F.sum("s"), 2).cast("double").alias("total_value"),
    )


@register(
    "j2_asof_join_prior_click",
    "As-of join: each 'view' event enriched with the user's most recent "
    "prior-or-equal 'click' (the point-in-time lookup Spark has no native "
    "operator for). Implemented as the scalable union-sort trick: tag both "
    "event streams in ONE scan, single shuffle on user_id, then "
    "last(ignorenulls) over an unbounded-preceding frame forward-fills the "
    "click columns — no range crossjoin, no per-key collect, linear in rows. "
    "Ties at equal ts resolve by event_id, identically in both dialects.",
    oracle="""
        WITH tagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN event_type = 'click' THEN event_id END AS click_id,
                   CASE WHEN event_type = 'click' THEN ts END AS click_ts
            FROM events WHERE event_type IN ('view', 'click')
        ), filled AS (
            SELECT user_id, ts, event_id, event_type,
                   last_value(click_id IGNORE NULLS) OVER w AS asof_click_id,
                   last_value(click_ts IGNORE NULLS) OVER w AS asof_click_ts
            FROM tagged
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id, ts, asof_click_id, asof_click_ts
        FROM filled WHERE event_type = 'view'
    """,
    tags=("join", "asof", "window"),
)
def j2_asof_join_prior_click(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.withColumn(
        "asof_click_id", F.last("click_id", ignorenulls=True).over(w)
    ).withColumn("asof_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    return filled.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "asof_click_id", "asof_click_ts"
    )


@register(
    "w5_moving_avg_lag_delta",
    "Sliding-frame analytics: per-user 3-row moving average of value plus "
    "delta vs the previous event (lag). The frame average accumulates in "
    "DECIMAL so the 3-term sum is exact and order-free in both engines "
    "(compat.py rationale); the lag delta is a single IEEE-754 subtraction. "
    "One shuffle on user_id serves both window specs.",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END AS DECIMAL(28,6))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w                         AS moving_avg_3,
               value - lag(value) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)   AS delta_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "lag"),
)
def w5_moving_avg_lag_delta(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wo.rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(28,6)")).over(wf).cast("double")
            / F.count("value").over(wf)
        ).alias("moving_avg_3"),
        (F.col("value") - F.lag("value").over(wo)).alias("delta_prev"),
    )


@register(
    "g2_cube_flag_status",
    "CUBE multi-dimensional aggregate over (returnflag, linestatus): all "
    "four grouping levels — cell, each one-dimension subtotal, grand total "
    "— in ONE shuffle (Spark expands grouping sets map-side, partial-aggs "
    "before the exchange). Complements g1's ROLLUP; group keys are non-null "
    "in the data so NULL unambiguously marks subtotal rows.",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(l_orderkey)                        AS line_count,
               {oracle_money_sum('l_extendedprice')}    AS sum_price
        FROM lineitem
        GROUP BY CUBE(1, 2)
    """,
    tags=("cube", "agg"),
)
def g2_cube_flag_status(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("l_orderkey").alias("line_count"),
        money_sum("l_extendedprice").alias("sum_price"),
    )


@register(
    "j3_range_join_value_tiers",
    "Range (interval-containment) join: each event matched to the value tier "
    "whose [lo, hi) interval contains it — the non-equi join Spark has no "
    "native operator for. Scale path: the interval dimension is tiny and "
    "explicitly broadcast, so the plan is a BroadcastNestedLoopJoin with the "
    "range predicate evaluated stream-side in codegen — no shuffle of the "
    "fact side at all; the following aggregate is the only exchange. For a "
    "large interval dimension the same shape generalizes to binning the "
    "probe column and equi-joining on bin id (the IVF/LSH trick ext/ uses).",
    oracle="""
        WITH tiers(tier_name, lo, hi) AS (
            VALUES ('T0', 0.0, 10.0), ('T1', 10.0, 100.0),
                   ('T2', 100.0, 1000.0), ('T3', 1000.0, 1e18)
        )
        SELECT t.tier_name,
               COUNT(*)                  AS event_count,
               COUNT(DISTINCT e.user_id) AS distinct_users
        FROM events e JOIN tiers t
          ON e.value >= t.lo AND e.value < t.hi
        GROUP BY t.tier_name
    """,
    tags=("join", "range", "broadcast"),
)
def j3_range_join_value_tiers(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    tiers = spark.createDataFrame(
        [("T0", 0.0, 10.0), ("T1", 10.0, 100.0),
         ("T2", 100.0, 1000.0), ("T3", 1000.0, 1e18)],
        "tier_name string, lo double, hi double",
    )
    joined = ev.join(
        F.broadcast(tiers),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("tier_name").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.countDistinct("user_id").alias("distinct_users"),
    )


@register(
    "w6_sliding_window_halfhour",
    "Sliding event-time window: 1-hour windows advancing every 30 minutes, "
    "so each event contributes to exactly two overlapping windows. Spark's "
    "window(ts, '1 hour', '30 minutes') expands events map-side into their "
    "containing windows before ONE shuffle on the window key — identical "
    "cost shape to a tumbling window times the overlap factor. The oracle "
    "derives the same two windows per event from the epoch-aligned 30-min "
    "slot (Spark windows are epoch-aligned by default).",
    oracle=f"""
        WITH slotted AS (
            SELECT value,
                   TIMESTAMP '1970-01-01 00:00:00'
                       + CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                         * INTERVAL 1 SECOND
                       AS slot
            FROM events WHERE ts IS NOT NULL
        ), expanded AS (
            SELECT value, slot AS window_start FROM slotted
            UNION ALL
            SELECT value, slot - INTERVAL 30 MINUTE AS window_start FROM slotted
        )
        SELECT window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               COUNT(*)                       AS event_count,
               {oracle_money_sum('value')}    AS total_value
        FROM expanded
        GROUP BY window_start
    """,
    tags=("window", "sliding", "streaming", "agg"),
)
def w6_sliding_window_halfhour(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_count",
            "total_value",
        )
    )


@register(
    "k2_approx_sketches",
    "The approximate tier of A6's scalar statistics: HyperLogLog++ distinct "
    "count and approximate percentiles over lineitem — the documented "
    "exact↔approx switch (SURVEY §4) that replaces exact median/p99 above a "
    "row-count threshold. Both sketches are constant-memory, single-pass, "
    "mergeable across partitions, so at 100 TB they cost one map-side pass "
    "plus a tiny final merge where exact percentile would need a full sort. "
    "HLL/t-digest internals are engine-specific, so the raw approximations "
    "cannot hash-match a DuckDB twin; instead the entry emits the EXACT "
    "values (oracle-computable) alongside booleans asserting the sketches "
    "landed inside their documented error bounds (HLL rsd=0.02 → ±5%, "
    "percentile_approx accuracy=10k → ±1% here) — the oracle emits the "
    "same exact values with literal TRUEs, so the driver hash verifies "
    "both the exact surface and the accuracy contract. Tight rel-error is "
    "additionally pinned by tests/test_plans.py.",
    oracle="""
        SELECT COUNT(*)                      AS n_rows,
               COUNT(DISTINCT l_partkey)     AS exact_parts,
               CAST(quantile_cont(l_extendedprice, 0.5)  AS DOUBLE)
                                             AS exact_price_p50,
               CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE)
                                             AS exact_price_p99,
               TRUE AS hll_within_5pct,
               TRUE AS p50_within_1pct,
               TRUE AS p99_within_1pct
        FROM lineitem
    """,
    tags=("sketch", "approx", "agg"),
)
def k2_approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    # Scalar columns, not an array<double>: the driver's order-insensitive
    # value hash cannot canonicalize list-valued cells (r01 k2 TypeError).
    sketched = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99)), 10_000
        ).alias("pcts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99))
        ).alias("exact_pcts"),
    )

    def within(approx: Column, exact: Column, tol: float) -> Column:
        # Vacuously TRUE only on EMPTY input (n_rows == 0, where both
        # sketch and exact are NULL and the oracle emits literal TRUEs).
        # The round-10 coalesce was wider than its own comment: it
        # blessed ANY one-sided NULL, so a regression making a sketch
        # return NULL on live data would read as a passing accuracy
        # flag. Gate on the empty-input condition explicitly so a
        # one-sided NULL on non-empty input yields NULL and FAILS the
        # hash against the oracle's TRUE (ADVICE r10).
        return F.when(F.col("n_rows") == 0, F.lit(True)).otherwise(
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.lit(tol) * F.abs(exact.cast("double"))
        )

    return sketched.select(
        "n_rows",
        "exact_parts",
        F.element_at("exact_pcts", 1).cast("double").alias("exact_price_p50"),
        F.element_at("exact_pcts", 2).cast("double").alias("exact_price_p99"),
        within(F.col("approx_parts"), F.col("exact_parts"), 0.05).alias(
            "hll_within_5pct"
        ),
        within(
            F.element_at("pcts", 1), F.element_at("exact_pcts", 1), 0.01
        ).alias("p50_within_1pct"),
        within(
            F.element_at("pcts", 2), F.element_at("exact_pcts", 2), 0.01
        ).alias("p99_within_1pct"),
    )


# ---------------------------------------------------------------------------
# Relational breadth tier: the join / subquery shapes a SQL user of the
# engine expects beyond the star join (SURVEY §2.3 notes the reference has
# zero joins; these pin the outer / semi / self-aggregate / distinct-agg
# physical strategies for the 100 TB posture)
# ---------------------------------------------------------------------------


@register(
    "j4_customer_order_distribution",
    "Left-outer join + two-level aggregation (TPC-H Q13 shape): orders per "
    "customer including zero-order customers, then the distribution of that "
    "count. Orders are pre-aggregated to (custkey, count) BEFORE the join, "
    "so only one compact row per customer crosses the wire instead of every "
    "order row — the partial-agg-below-join rewrite that matters at 100 TB. "
    "The second groupBy is over ~tens of distinct counts: AQE coalesces it "
    "to a few partitions.",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey, COUNT(o_orderkey) AS c_count
            FROM orders
            GROUP BY o_custkey
        )
        SELECT COALESCE(p.c_count, 0) AS c_count,
               COUNT(c.c_custkey)     AS custdist
        FROM customer c
        LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
        GROUP BY 1
    """,
    tags=("join", "outer", "agg"),
)
def j4_customer_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    cu = load_table(spark, sf, "customer")
    od = load_table(spark, sf, "orders")
    per_cust = od.groupBy("o_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return (
        cu.join(per_cust, cu.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"), "c_custkey")
        .groupBy("c_count")
        .agg(F.count("c_custkey").alias("custdist"))
    )


@register(
    "j5_exists_semi_join",
    "EXISTS-style LEFT SEMI join with a non-equi conjunct (TPC-H Q4 shape): "
    "count orders per priority that have at least one lineitem shipped "
    "after the order date. Semi join never duplicates the left side no "
    "matter how many lineitems match, and Spark dedups the probe input "
    "map-side; both sides hash-partition on orderkey only — the non-equi "
    "ship-date conjunct evaluates post-probe without widening the shuffle "
    "key.",
    oracle="""
        SELECT o.o_orderpriority,
               COUNT(o.o_orderkey) AS late_order_count
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o.o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def j5_exists_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate)
    return (
        od.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("o_orderkey").alias("late_order_count"))
    )


@register(
    "j6_small_quantity_revenue",
    "Self-join against a per-key aggregate threshold (TPC-H Q17 shape): "
    "revenue from lineitems whose quantity is below half the part's average "
    "quantity. The per-part average is the decimal-exact money_avg (order-"
    "independent, so both engines derive the identical double threshold); "
    "the probe side compares l_quantity*2 < avg — one IEEE op, no cross-"
    "engine rounding hazard. Physically both sides shuffle on l_partkey, so "
    "Spark reuses one exchange for the aggregate and the join.",
    oracle=f"""
        WITH thresh AS (
            SELECT l_partkey,
                   {oracle_money_avg('l_quantity')} AS avg_qty
            FROM lineitem
            GROUP BY l_partkey
        )
        SELECT {oracle_money_sum('l.l_extendedprice')} AS small_qty_revenue,
               COUNT(*)                                AS item_count
        FROM lineitem l
        JOIN thresh t ON l.l_partkey = t.l_partkey
        WHERE l.l_quantity * 2 < t.avg_qty
    """,
    tags=("join", "self-aggregate", "agg"),
)
def j6_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    thresh = li.groupBy("l_partkey").agg(money_avg("l_quantity").alias("avg_qty"))
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(thresh, "l_partkey")
        .filter(F.col("l_quantity") * 2 < F.col("avg_qty"))
        .agg(
            money_sum("l_extendedprice").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("item_count"),
        )
    )


@register(
    "j7_sole_late_supplier_blame",
    "TPC-H Q21 shape — the hardest correlated-subquery pattern in the "
    "suite: for finalized orders, count per supplier the late lineitems "
    "(shipped >90 days after order date) on multi-supplier orders where "
    "that supplier was the ONLY late one. The classic form is a double "
    "correlated EXISTS / NOT EXISTS self-join on lineitem (the oracle "
    "keeps that form, and a pytest proves equivalence against Spark's own "
    "EXISTS planner); the Spark plan goes further than the textbook "
    "decorrelated groupBy-join rewrite: both per-order distinct-supplier "
    "counts are WINDOW collect_sets over the same l_orderkey partition, "
    "so the 100 TB fact is scanned ONCE and shuffled ONCE — the agg-join "
    "rewrite would scan it twice and add an Expand for the two distincts. "
    "Per-order state is one small supplier set. Top-20 with a "
    "(numwait DESC, s_name) total order.",
    oracle="""
        WITH ll AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM ll l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM ll l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM ll l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    tags=("join", "correlated", "decorrelation", "agg"),
)
def j7_sole_late_supplier_blame(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    od = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    su = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    ll = li.join(
        od.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .alias("late"),
    )
    # single-pass decorrelation: EXISTS(other supp) / NOT EXISTS(other late
    # supp) become distinct-supplier counts over one l_orderkey window —
    # no fact self-join, no second scan
    w = Window.partitionBy("l_orderkey")
    qual = ll.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    ).filter(
        F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        qual.join(F.broadcast(su), qual.l_suppkey == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "j9_churned_rich_customers",
    "TPC-H Q22 shape, churn-flavored: per market segment, customers with "
    "above-average positive account balance and NO order in the 90 days "
    "before the corpus's latest order date (two scalar aggregate "
    "subqueries + anti join). Both global scalars — the exact-decimal "
    "balance threshold and the max order date — are 1-row broadcasts; "
    "the above-average test multiplies instead of divides (bal * n_pos > "
    "total_pos, decimal-exact — no cross-engine float division at the "
    "boundary), and the recency test is a LEFT ANTI join against the "
    "distinct recent-orderer keys. Money total via decimal money_sum.",
    oracle=f"""
        WITH pos AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DECIMAL(28,6))
                       AS total_pos,
                   CAST(COUNT(*) AS BIGINT) AS n_pos
            FROM customer WHERE c_acctbal > 0.0
        ),
        mx AS (SELECT max(o_orderdate) AS max_date FROM orders),
        recent AS (
            SELECT DISTINCT o.o_custkey
            FROM orders o, mx
            WHERE o.o_orderdate >= mx.max_date - INTERVAL 90 DAY
        )
        SELECT c.c_mktsegment,
               CAST(count(*) AS BIGINT) AS numcust,
               {oracle_money_sum('c.c_acctbal')} AS totacctbal
        FROM customer c, pos
        WHERE CAST(c.c_acctbal AS DECIMAL(28,6)) * pos.n_pos > pos.total_pos
          AND NOT EXISTS (SELECT 1 FROM recent r
                          WHERE r.o_custkey = c.c_custkey)
        GROUP BY c.c_mktsegment
    """,
    tags=("join", "anti-join", "scalar-subquery", "agg"),
)
def j9_churned_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    cu = load_table(spark, sf, "customer")
    od = load_table(spark, sf, "orders")
    pos = cu.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias("total_pos"),
        F.count("*").alias("n_pos"),
    )
    mx = od.agg(F.max("o_orderdate").alias("max_date"))
    recent = (
        od.crossJoin(F.broadcast(mx))
        .filter(
            F.col("o_orderdate")
            >= F.col("max_date") - F.expr("INTERVAL 90 DAYS")
        )
        .select("o_custkey")
        .distinct()
    )
    rich = cu.crossJoin(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast("decimal(28,6)") * F.col("n_pos")
        > F.col("total_pos")
    )
    churned = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return churned.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        money_sum("c_acctbal").alias("totacctbal"),
    )


@register(
    "a7_distinct_suppliers_per_part",
    "COUNT(DISTINCT) aggregation through a broadcast dim join (TPC-H Q16 "
    "shape): distinct suppliers per (brand, size). The dim join broadcasts "
    "(part is small relative to the fact at every SF), and Spark plans the "
    "distinct as a two-phase expand/partial-dedup aggregate, so duplicate "
    "(group, suppkey) pairs die map-side before the shuffle.",
    oracle="""
        SELECT p.p_brand, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, p.p_size
    """,
    tags=("agg", "distinct", "join", "broadcast"),
)
def a7_distinct_suppliers_per_part(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    pa = load_table(spark, sf, "part")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "g3_grouping_sets_explicit",
    "Explicit GROUPING SETS — the general form behind ROLLUP (g1) and CUBE "
    "(g2): exactly the (priority), (status), and grand-total groupings, "
    "skipping the cross cells a CUBE would also pay for, plus grouping_id() "
    "so consumers can tell a subtotal NULL from a data NULL. Same one-"
    "shuffle Expand plan as cube/rollup.",
    oracle=f"""
        SELECT o_orderpriority, o_orderstatus,
               GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                                                      AS grouping_level,
               COUNT(o_orderkey)                      AS order_count,
               {oracle_money_sum('o_totalprice')}     AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    tags=("grouping-sets", "agg"),
)
def g3_grouping_sets_explicit(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    od.createOrReplaceTempView("g3_orders")
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus,
               grouping_id(o_orderpriority, o_orderstatus) AS grouping_level,
               COUNT(o_orderkey)                           AS order_count,
               CAST(ROUND(SUM(CAST(o_totalprice AS decimal(28,6))), 2) AS DOUBLE)
                                                           AS sum_price
        FROM g3_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "w7_ntile_quartiles",
    "NTILE window: orders bucketed into price quartiles within each "
    "priority (the per-group quantile-binning primitive; feature-binning "
    "tier for training pipelines). Total order via (price, key) tie-break "
    "so bucket boundaries are deterministic in both engines.",
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS price_quartile
        FROM orders
    """,
    tags=("window", "ntile", "binning"),
)
def w7_ntile_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    od = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return od.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
    )


@register(
    "k3_salted_skew_join",
    "Salted SHUFFLE JOIN: the fact side's join key is widened to "
    "(key, salt) with salt = hash(row) mod 8 and the dimension side is "
    "replicated once per salt (explode over 0..7), so a hot key's rows "
    "spread across 8 reducers instead of one — the manual skew-join "
    "pattern for when the dimension is too big to broadcast and one key "
    "dominates (AQE's skewJoin is the adaptive alternative; at 100 TB "
    "salt only the detected hot keys and union the unsalted rest to "
    "avoid the x8 dimension replication for uniform keys). A "
    "shuffle-hash hint pins the shuffled join so the pattern is "
    "actually exercised (Catalyst would otherwise broadcast the small "
    "test dimension). Provably identical to the plain join — the salt "
    "is a bijection-preserving refinement of the key — which the "
    "plain-join oracle verifies.",
    oracle=f"""
        SELECT c_mktsegment,
               COUNT(o_orderkey)                  AS order_count,
               {oracle_money_sum('o_totalprice')} AS total_revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    tags=("skew", "salt", "join"),
)
def k3_salted_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    n_salt = 8
    od = load_table(spark, sf, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_salt)).cast("int")
    )
    cust = (
        load_table(spark, sf, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
    )
    joined = od.join(
        cust.hint("shuffle_hash"),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (od["salt"] == cust["salt"]),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("o_orderkey").alias("order_count"),
        money_sum("o_totalprice").alias("total_revenue"),
    )


@register(
    "j10_small_quantity_revenue",
    "TPC-H Q17 shape — correlated scalar subquery decorrelated into an "
    "aggregate-join: revenue of line items below 20% of their part's "
    "average quantity. The per-part threshold is an exact-decimal "
    "average (order-free, so the < comparison cannot flip on summation "
    "order) joined back to the fact; at 100 TB both sides shuffle ONCE "
    "on l_partkey (AQE broadcasts the aggregated side when it fits). "
    "The naive correlated form re-scans lineitem per part.",
    oracle=f"""
        WITH cap AS (
            SELECT l_partkey,
                   0.2 * ({oracle_money_avg('l_quantity')}) AS qty_cap
            FROM lineitem GROUP BY l_partkey
        )
        SELECT {oracle_money_sum('l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem JOIN cap USING (l_partkey)
        WHERE l_quantity < qty_cap
    """,
    tags=("join", "Q17", "decorrelation", "agg"),
)
def j10_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    cap = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * money_avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(cap, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg((money_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "j11_large_volume_orders",
    "TPC-H Q18 shape — HAVING-filtered aggregate driving a semi join: "
    "orders whose line items total more than 300 units, with customer "
    "attribution, top-20 by order value (total order via the unique "
    "orderkey tie-break, so the LIMIT is deterministic). The qualifying "
    "set aggregates FIRST (exact decimal sums) and only then joins — "
    "orders/customer never see unqualified rows; one l_orderkey shuffle "
    "for the aggregate, qualifying keys broadcast into the fact joins.",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey, {oracle_money_sum('l_quantity')} AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING {oracle_money_sum('l_quantity')} > 300
        )
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, b.total_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    tags=("join", "Q18", "having", "topk"),
)
def j11_large_volume_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    od = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(money_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(od, big["l_orderkey"] == od["o_orderkey"])
        .join(cust, od["o_custkey"] == cust["c_custkey"])
        .select("c_custkey", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "w8_time_grid_forward_fill",
    "Time-series resampling with gap fill: hourly per-type value totals "
    "are re-indexed onto the COMPLETE hour grid (cross join of the type "
    "set with a sequence() spanning the observed min..max hour — the "
    "grid bounds ride a broadcast 1-row aggregate) and missing hours "
    "forward-fill from the last observed value (last() IGNORE NULLS "
    "over an unbounded-preceding frame — O(1) window state). Leading "
    "hours before a type's first observation stay NULL. The operator "
    "every downstream chart/model needs between sparse events and a "
    "dense series; one event_type shuffle, grid rows are (type, hour) "
    "pairs — never event-sized.",
    oracle=f"""
        WITH ev AS (
            SELECT event_type, date_trunc('hour', ts) AS h, value
            FROM events
        ),
        hourly AS (
            SELECT event_type, h, {oracle_money_sum('value')} AS observed
            FROM ev GROUP BY 1, 2
        ),
        grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM ev) t
            CROSS JOIN (
                SELECT unnest(generate_series(
                    (SELECT min(h) FROM ev), (SELECT max(h) FROM ev),
                    INTERVAL '1 hour')) AS h
            ) g
        )
        SELECT grid.event_type, grid.h AS hour, hourly.observed,
               last_value(hourly.observed IGNORE NULLS) OVER (
                   PARTITION BY grid.event_type ORDER BY grid.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled
        FROM grid LEFT JOIN hourly USING (event_type, h)
    """,
    tags=("window", "resample", "forward-fill", "time-series"),
)
def w8_time_grid_forward_fill(spark: SparkSession, sf: str) -> DataFrame:
    from ..resample import hourly_grid_fill

    return hourly_grid_fill(
        load_table(spark, sf, "events"),
        key_col="event_type",
        ts_col="ts",
        value_agg=money_sum("value"),
        mode="ffill",
    )


@register(
    "w9_time_grid_interpolate",
    "w8's grid with LINEAR INTERPOLATION for interior gaps: each missing "
    "hour takes v_prev + (v_next - v_prev) * elapsed_fraction, where the "
    "bracketing observations come from four O(1)-state window passes "
    "over ONE (type, hour) sort — last/first IGNORE NULLS over "
    "preceding/following frames for both the values and their hours. "
    "Leading gaps (no prev) stay NULL, trailing gaps (no next) hold the "
    "last value — the resampling semantics a feature pipeline wants. "
    "Fraction arithmetic runs on epoch seconds (bigint) so both engines "
    "compute identical doubles.",
    oracle=f"""
        WITH ev AS (
            SELECT event_type, date_trunc('hour', ts) AS h, value
            FROM events
        ),
        hourly AS (
            SELECT event_type, h, {oracle_money_sum('value')} AS observed
            FROM ev GROUP BY 1, 2
        ),
        grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM ev) t
            CROSS JOIN (
                SELECT unnest(generate_series(
                    (SELECT min(h) FROM ev), (SELECT max(h) FROM ev),
                    INTERVAL '1 hour')) AS h
            ) g
        ),
        j AS (
            SELECT grid.event_type, grid.h, hourly.observed
            FROM grid LEFT JOIN hourly USING (event_type, h)
        ),
        b AS (
            SELECT event_type, h, observed,
                   last_value(observed IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS v_prev,
                   first_value(observed IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS v_next,
                   last_value(CASE WHEN observed IS NOT NULL THEN h END
                              IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS h_prev,
                   first_value(CASE WHEN observed IS NOT NULL THEN h END
                               IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS h_next
            FROM j
        )
        SELECT event_type, h AS hour, observed,
               CASE
                   WHEN observed IS NOT NULL THEN observed
                   WHEN v_prev IS NULL THEN NULL
                   WHEN v_next IS NULL THEN v_prev
                   ELSE v_prev + (v_next - v_prev)
                        * (CAST(epoch(h) - epoch(h_prev) AS DOUBLE)
                           / (epoch(h_next) - epoch(h_prev)))
               END AS interpolated
        FROM b
    """,
    tags=("window", "resample", "interpolation", "time-series"),
)
def w9_time_grid_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    from ..resample import hourly_grid_fill

    return hourly_grid_fill(
        load_table(spark, sf, "events"),
        key_col="event_type",
        ts_col="ts",
        value_agg=money_sum("value"),
        mode="interpolate",
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "g5_pivot_daily_event_values",
    "PIVOT reshape: daily exact value totals spread into one column per "
    "event type. The pivot value set is a LITERAL list — required for a "
    "stable schema (and it keeps the pivot a single partial-aggregated "
    "shuffle: Spark's values-free pivot runs an extra distinct pass "
    "first); at scale you pass the known dimension vocabulary or "
    "two-phase discover it once. Oracle is the portable CASE-per-column "
    "aggregation, proving the reshape is just grouped conditional sums.",
    oracle=f"""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS event_day,
               {", ".join(
                   f"CAST(ROUND(SUM(CASE WHEN event_type = '{t}' THEN "
                   f"CAST(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END AS DECIMAL(28,6)) END), 2) AS DOUBLE) AS {t}"
                   for t in _EVENT_TYPES
               )}
        FROM events
        GROUP BY 1
    """,
    tags=("pivot", "reshape", "agg"),
)
def g5_pivot_daily_event_values(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("event_day")
        )
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(money_sum("value"))
    )


@register(
    "g6_unpivot_lineitem_measures",
    "UNPIVOT (melt) reshape: the four lineitem money measures fold into "
    "long-form (key, metric, value) rows — the wide-to-long step before "
    "per-metric windowing/profiling. Spark's native unpivot is a pure "
    "projection + generator (no shuffle, output = 4x input rows but "
    "each row carries ONE value); the oracle is the portable UNION ALL "
    "formulation.",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    tags=("unpivot", "melt", "reshape"),
)
def g6_unpivot_lineitem_measures(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@register(
    "k4_grouped_approx_percentiles",
    "k2's verified-sketch contract PER GROUP: each return-flag group "
    "carries its exact p50/p99 (oracle-computable) plus booleans "
    "asserting the percentile_approx sketch landed inside its "
    "documented 1% error — so the driver hash verifies both the exact "
    "surface and the per-group accuracy contract. The accuracy "
    "assertion applies only to groups with >= 100 rows (vacuous TRUE "
    "below): percentile_approx returns an actual data point while the "
    "exact percentile interpolates, so on tiny groups the gap between "
    "adjacent points — not sketch error — dominates (round-11 "
    "NULL-payload audit, surfaced by the 5-row fixture). At 100 TB "
    "this is the shape that matters: grouped exact percentiles sort "
    "every group's values, while the approx sketch stays one "
    "constant-memory mergeable pass per group.",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE)
                   AS exact_p50,
               CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE)
                   AS exact_p99,
               TRUE AS p50_within_1pct,
               TRUE AS p99_within_1pct
        FROM lineitem
        GROUP BY 1
    """,
    tags=("sketch", "approx", "agg", "grouped"),
)
def k4_grouped_approx_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99))
        ).alias("exact"),
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99)), 10_000
        ).alias("approx"),
    )

    def within(i: int) -> Column:
        e = F.element_at("exact", i).cast("double")
        a = F.element_at("approx", i).cast("double")
        # min-support gate: below 100 rows the data-point-vs-
        # interpolation gap dominates, not sketch error (see contract
        # note in the description); the k2 lesson applies — gate on the
        # explicit condition, never coalesce a one-sided NULL to TRUE
        return F.when(F.col("n_rows") < 100, F.lit(True)).otherwise(
            F.abs(a - e) <= F.lit(0.01) * F.abs(e)
        )

    return g.select(
        "l_returnflag",
        "n_rows",
        F.element_at("exact", 1).cast("double").alias("exact_p50"),
        F.element_at("exact", 2).cast("double").alias("exact_p99"),
        within(1).alias("p50_within_1pct"),
        within(2).alias("p99_within_1pct"),
    )


def _morton_spark(x: Column, y: Column, bits: int = 16) -> Column:
    """Bit-interleaved Z-order (Morton) key: x's bit i lands at 2i, y's at
    2i+1. Unrolled at plan-build time (shift amounts must be literals),
    so the key is one codegen'd integer expression — no UDF, no loop."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    key = terms[0]
    for t in terms[1:]:
        key = key + t
    return key


def _morton_sql(x: str, y: str, bits: int = 16) -> str:
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(bits)] + [
        f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)
    ]
    return " + ".join(terms)


@register(
    "z1_zorder_locality_report",
    "Z-ORDER layout key + its pruning property, demonstrated in-query: "
    "rows get a bit-interleaved Morton key over (partkey, suppkey) and "
    "are bucketed by 2^10-wide key ranges; the report shows each "
    "bucket's partkey AND suppkey ranges are simultaneously narrow — "
    "the reason Z-ordered parquet files prune on EITHER predicate "
    "column, where a single-column sort only prunes its leading key. "
    "At 100 TB: sortWithinPartitions(z_key) before the write gives "
    "min/max file statistics this report simulates; the key is one "
    "codegen'd integer expression (shift/mask unrolled at plan build), "
    "zero UDFs. The oracle replays the identical bit arithmetic.",
    oracle=f"""
        WITH z AS (
            SELECT l_partkey, l_suppkey,
                   {_morton_sql('(l_partkey & 65535)', '(l_suppkey & 65535)')}
                       AS z_key
            FROM lineitem
        )
        SELECT z_key >> 10 AS z_bucket,
               COUNT(*) AS n_rows,
               MIN(l_partkey) AS part_lo, MAX(l_partkey) AS part_hi,
               MIN(l_suppkey) AS supp_lo, MAX(l_suppkey) AS supp_hi
        FROM z GROUP BY 1
    """,
    tags=("layout", "zorder", "data-skipping"),
)
def z1_zorder_locality_report(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    zkey = _morton_spark(
        F.col("l_partkey").bitwiseAND(F.lit(65535)),
        F.col("l_suppkey").bitwiseAND(F.lit(65535)),
    )
    return (
        li.withColumn("z_key", zkey)
        .groupBy(F.shiftright("z_key", 10).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "a8_measure_correlations",
    "Pearson correlation matrix over the four lineitem measures in ONE "
    "pass — and deterministic, which the builtin corr() is not (its "
    "float accumulation is partition-order-dependent): all Σx, Σx², "
    "Σxy moments accumulate as exact decimals (order-free), and the "
    "closing corr formula runs on the exact sums as doubles. The "
    "textbook one-pass moment method; 14 decimal aggregates, zero "
    "extra shuffles vs a single sum.",
    oracle=f"""
        WITH m AS (
            SELECT
                COUNT(*) AS n,
                {", ".join(f"CAST(CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS s_{c}" for c in _CORR_COLS)},
                {", ".join(f"CAST(CAST(SUM(CAST({c} AS DECIMAL(24,6)) * CAST({c} AS DECIMAL(13,6))) AS VARCHAR) AS DOUBLE) AS q_{c}" for c in _CORR_COLS)},
                {", ".join(f"CAST(CAST(SUM(CAST({a} AS DECIMAL(24,6)) * CAST({b} AS DECIMAL(13,6))) AS VARCHAR) AS DOUBLE) AS p_{a}_{b}" for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:])}
            FROM lineitem
        )
        SELECT {", ".join(
            f"(n * p_{a}_{b} - s_{a} * s_{b}) / "
            f"sqrt((n * q_{a} - s_{a} * s_{a}) * (n * q_{b} - s_{b} * s_{b}))"
            f" AS corr_{a}_{b}"
            for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
        )}
        FROM m
    """,
    tags=("agg", "statistics", "correlation"),
)
def a8_measure_correlations(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    # asymmetric product casts: (24,6) x (13,6) -> decimal(38,12) in
    # BOTH engines with zero truncation (Spark needs p1+p2+1 <= 38,
    # DuckDB needs w1+w2 <= 38 with int128 storage) — measures fit 13
    # digits comfortably, sums get the full 38
    wide = lambda c: F.col(c).cast("decimal(24,6)")  # noqa: E731
    slim = lambda c: F.col(c).cast("decimal(13,6)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [
        F.sum(F.col(c).cast("decimal(28,6)")).cast("double").alias(f"s_{c}")
        for c in _CORR_COLS
    ]
    aggs += [
        F.sum(wide(c) * slim(c)).cast("double").alias(f"q_{c}")
        for c in _CORR_COLS
    ]
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    aggs += [
        F.sum(wide(a) * slim(b)).cast("double").alias(f"p_{a}_{b}")
        for a, b in pairs
    ]
    m = li.agg(*aggs)

    def corr(a: str, b: str) -> Column:
        n = F.col("n")
        cov = n * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        va = n * F.col(f"q_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vb = n * F.col(f"q_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        return (cov / F.sqrt(va * vb)).alias(f"corr_{a}_{b}")

    return m.select(*[corr(a, b) for a, b in pairs])


@register(
    "j12_interval_overlap_join",
    "INTERVAL OVERLAP join (the temporal-join shape j3's point-in-range "
    "doesn't cover): events become [ts, ts + minutes] intervals (odd "
    "event_ids vs even), and each odd interval reports how many even "
    "intervals it overlaps plus the smallest such id. Scale algorithm: "
    "a naive overlap join is an inequality predicate (cartesian at "
    "worst); here both sides EXPLODE into the hourly buckets their "
    "interval spans (bounded: intervals are < 2 h, so <= 3 buckets "
    "each), equi-join on the bucket, dedupe pairs that share several "
    "buckets, then apply the exact overlap predicate — the classic "
    "binned overlap join, one equi-shuffle instead of a range scan. "
    "Minutes derive via floor() in BOTH engines (Spark's double->int "
    "cast truncates, DuckDB's rounds — floor removes the ambiguity) "
    "and pmod forces a non-negative count (plain % takes the dividend's "
    "sign in both engines, and a negative count would put the interval "
    "end before its start — Spark's bucket sequence() then throws at "
    "runtime; fixture values are >= 0 but data drift must degrade to "
    "a zero-length interval, not a crash).",
    oracle="""
        WITH iv AS (
            SELECT event_id, ts AS s,
                   ts + to_minutes(
                       ((CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value
                         END) AS BIGINT) % 120) + 120) % 120
                   ) AS e
            FROM events
        ),
        l AS (SELECT * FROM iv WHERE event_id % 2 = 1),
        r AS (SELECT * FROM iv WHERE event_id % 2 = 0),
        m AS (
            SELECT l.event_id,
                   CAST(count(*) AS BIGINT) AS n_overlaps,
                   min(r.event_id) AS min_overlap_id
            FROM l JOIN r ON l.s <= r.e AND r.s <= l.e
            GROUP BY 1
        )
        SELECT l.event_id,
               COALESCE(m.n_overlaps, 0) AS n_overlaps,
               m.min_overlap_id
        FROM l LEFT JOIN m USING (event_id)
    """,
    tags=("join", "interval", "overlap", "temporal"),
)
def j12_interval_overlap_join(spark: SparkSession, sf: str) -> DataFrame:
    iv = load_table(spark, sf, "events").select(
        "event_id",
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_dt_interval(0, 0, "
            "CAST(pmod(CAST(floor(CASE WHEN NOT isnan(value) AND "
            "abs(value) < 1e13 THEN value END) "
            "AS BIGINT), 120) AS INT), 0)"
        ).alias("e"),
    )
    left = iv.filter(F.col("event_id") % 2 == 1)
    right = iv.filter(F.col("event_id") % 2 == 0)

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("s").alias(f"{prefix}_s"),
            F.col("e").alias(f"{prefix}_e"),
            F.explode(
                F.sequence(
                    F.date_trunc("hour", "s"),
                    F.date_trunc("hour", "e"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("bucket"),
        )

    pairs = (
        bucketed(left, "l")
        .join(bucketed(right, "r"), "bucket")
        .filter(
            (F.col("l_s") <= F.col("r_e")) & (F.col("r_s") <= F.col("l_e"))
        )
        .select("l_id", "r_id")
        .distinct()
    )
    m = pairs.groupBy("l_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.min("r_id").alias("min_overlap_id"),
    )
    return (
        left.select(F.col("event_id"))
        .join(m, left["event_id"] == m["l_id"], "left")
        .select(
            "event_id",
            F.coalesce("n_overlaps", F.lit(0)).alias("n_overlaps"),
            "min_overlap_id",
        )
    )


@register(
    "j13_bi_national_volume",
    "TPC-H Q7 shape (volume shipping): revenue flowing between two "
    "specific nations in either direction, by supplier nation, customer "
    "nation, and ship year. Two INDEPENDENT dimension paths off the "
    "fact — lineitem->supplier->nation on one side, "
    "lineitem->orders->customer->nation on the other — with the "
    "cross-pair predicate ((A,B) or (B,A)) applied after both resolve. "
    "Scale: nation/supplier/customer broadcast; orders is the one "
    "co-shuffled join (orderkey), and the nation filters push into the "
    "dimension scans BEFORE the fact join so the fact rows that ship "
    "through the join are pre-pruned.",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS ship_year,
               COUNT(*) AS n_items,
               {oracle_money_sum('l.l_extendedprice * (1 - l.l_discount)')}
                   AS volume
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    tags=("join", "tpch-q7", "multi-path", "agg"),
)
def j13_bi_national_volume(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supp = load_table(spark, sf, "supplier")
    cust = load_table(spark, sf, "customer")
    nat = load_table(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s_side = supp.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    c_side = cust.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
        cust["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    return (
        li.join(F.broadcast(s_side), li["l_suppkey"] == s_side["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(c_side), orders["o_custkey"] == c_side["c_custkey"])
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
        )
    )


@register(
    "w10_percent_rank_cume_dist",
    "Distribution-position analytics: percent_rank and cume_dist of "
    "each lineitem price within its return-flag group — the window "
    "family (rank-ratio functions) the w1-w9 tier doesn't cover. Both "
    "are VALUE-based (ties share a position), so the result is "
    "deterministic without a unique tie-break, and the closing "
    "divisions are single IEEE ops on exact integer counts — "
    "hash-portable. The window is computed over the FULL group, then "
    "the output samples every 997th orderkey (the window must see all "
    "rows; the sample only bounds the verified surface). One shuffle "
    "on the partition key.",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
               pr, cd
        FROM (
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   l_extendedprice,
                   percent_rank() OVER w AS pr,
                   cume_dist() OVER w AS cd
            FROM lineitem
            WINDOW w AS (PARTITION BY l_returnflag
                         ORDER BY l_extendedprice)
        )
        WHERE l_orderkey % 997 = 0
    """,
    tags=("window", "rank", "distribution"),
)
def w10_percent_rank_cume_dist(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_extendedprice",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .filter(F.col("l_orderkey") % 997 == 0)
    )


@register(
    "a9_mergeable_rollup_maintenance",
    "Algebraic-aggregate MERGEABILITY, verified: monthly event metrics "
    "computed by MERGING daily partial aggregates (sum of counts, sum "
    "of exact decimal sums, min of mins, max of maxes — never touching "
    "raw rows again) hash-equal the oracle's direct monthly aggregation "
    "over raw events. This is the hypertable-rollup / incremental-"
    "materialized-view contract: daily partials are what a streaming "
    "job checkpoints, and month-end reads merge partials instead of "
    "rescanning the month. Works BECAUSE every aggregate here is "
    "algebraic (decimal sums are associative; double sums would drift); "
    "avg derives from merged sum/count at the end. Two partial-"
    "aggregated shuffles (day then month), the second over ~30x fewer "
    "rows.",
    oracle=f"""
        SELECT strftime(date_trunc('month', ts), '%Y-%m') AS event_month,
               event_type,
               COUNT(*) AS n_events,
               {oracle_money_sum('value')} AS total_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("agg", "rollup", "incremental", "mergeable"),
)
def a9_mergeable_rollup_maintenance(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value").alias("dec_sum"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    return (
        daily.groupBy(
            F.substring("event_day", 1, 7).alias("event_month"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("dec_sum"), 2).cast("double").alias("total_value"),
            F.min("lo").alias("min_value"),
            F.max("hi").alias("max_value"),
        )
    )


@register(
    "g7_grouped_mode",
    "Grouped MODE without collecting values: each user's most frequent "
    "event type (count desc, event_type asc tie-break) via count + "
    "per-group top-1 window — the scale-correct mode shape (Spark's "
    "mode() and a collect_list UDF both materialize the group; this "
    "form is two partial-aggregated shuffles over scalar rows). The "
    "c2-family taxi imputation uses the same pattern globally; this is "
    "the per-entity version an activity-segmentation pipeline needs.",
    oracle="""
        SELECT user_id, event_type AS modal_event,
               CAST(c AS BIGINT) AS n_events
        FROM (
            SELECT user_id, event_type, count(*) AS c,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY count(*) DESC,
                                               event_type) AS rn
            FROM events
            GROUP BY user_id, event_type
        )
        WHERE rn = 1
    """,
    tags=("agg", "mode", "grouped", "window"),
)
def g7_grouped_mode(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_event"), F.col("c").alias("n_events"))
    )


@register(
    "j14_disjunctive_pred_join",
    "TPC-H Q19 shape: a join whose filter is an OR of per-branch "
    "conjunctions SPANNING BOTH tables (brand x size-range x quantity-"
    "range). The scale lesson is predicate normalization: Catalyst "
    "CNF-converts the disjunction and pushes the single-table residues "
    "(brand IN set, size <= max, quantity <= max) into BOTH scans "
    "before the join, so the join sees pre-pruned inputs even though "
    "no single disjunct is a pure scan filter; part broadcasts. "
    "Grouped by brand so the verified surface shows each branch "
    "matched.",
    oracle=f"""
        SELECT p.p_brand,
               COUNT(*) AS n_items,
               {oracle_money_sum('l.l_extendedprice * (1 - l.l_discount)')}
                   AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
        GROUP BY 1
    """,
    tags=("join", "tpch-q19", "disjunction", "pushdown"),
)
def j14_disjunctive_pred_join(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    joined = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        joined.filter(branch)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


@register(
    "j15_null_tolerant_anti_join",
    "The NOT IN null trap, made explicit: customers with no 1996 order, "
    "where the subquery side deliberately contains a NULL key (planted "
    "via UNION ALL). Under SQL three-valued logic `c NOT IN (..., NULL)` "
    "is never TRUE — a NOT IN formulation returns ZERO rows and "
    "silently drops the whole result; the correct operator is the "
    "NOT EXISTS / left-anti equi-join, where the NULL probe matches "
    "nothing and is harmless. The engine's left_anti IS that operator "
    "(both engines agree, which is exactly what the hash verifies). "
    "Scale: the key set reduces to distinct keys before the anti join "
    "and broadcasts when small.",
    oracle="""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orderless_1996
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM (
                SELECT o_custkey FROM orders
                WHERE year(o_orderdate) = 1996
                UNION ALL SELECT CAST(NULL AS BIGINT)
            ) o
            WHERE o.o_custkey = c.c_custkey
        )
        GROUP BY 1
    """,
    tags=("join", "anti", "null-semantics"),
)
def j15_null_tolerant_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    keys_1996 = (
        load_table(spark, sf, "orders")
        .filter(F.year("o_orderdate") == 1996)
        .select("o_custkey")
        .unionByName(
            cust.limit(1).select(
                F.lit(None).cast("long").alias("o_custkey")
            )
        )
    )
    return (
        cust.join(
            keys_1996, cust["c_custkey"] == keys_1996["o_custkey"], "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orderless_1996"))
    )


@register(
    "w11_range_frame_rolling_count",
    "TIME-RANGE window frame (the frame type w1-w10 don't cover): per "
    "event, how many of the same user's events fall in the trailing "
    "hour — RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW, a "
    "VALUE-based frame, so timestamp ties share a frame and the result "
    "is deterministic without a unique tie-break (a ROWS frame would "
    "be placement-dependent under ties). Microsecond-exact interval "
    "arithmetic in both engines; count-only output, no float. The "
    "window is computed over every row (one user_id shuffle), the "
    "verified surface samples every 7th event.",
    oracle="""
        SELECT event_id, user_id, ts, n_last_hour
        FROM (
            SELECT event_id, user_id, ts,
                   CAST(count(*) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n_last_hour
            FROM events
        )
        WHERE event_id % 7 = 0
    """,
    tags=("window", "range-frame", "rolling"),
)
def w11_range_frame_rolling_count(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts")
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.expr(
                "count(*) OVER (PARTITION BY user_id ORDER BY ts "
                "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
            ).alias("n_last_hour"),
        )
        .filter(F.col("event_id") % 7 == 0)
    )


@register(
    "e15_json_props_parse",
    "Semi-structured column parsing: events.props is a JSON string; "
    "from_json with an EXPLICIT schema (never schema_of_json inference "
    "— an extra scan, type drift on skew) projects the typed field "
    "k, and per-type aggregates run over it with a parse-failure "
    "count (from_json yields NULL rows for corrupt input rather than "
    "failing the job — the PERMISSIVE contract an ingest edge needs). "
    "Scale: parsing is a codegen'd projection fused into the scan; the "
    "oracle derives the same field via regex so the hash is "
    "parser-implementation-independent.",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (
                   WHERE props IS NULL
                      OR regexp_extract(props, '"k":\\s*(-?\\d+)', 1) = ''
               ) AS BIGINT) AS n_unparsed,
               CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                        AS BIGINT)) AS BIGINT) AS k_sum,
               MIN(CAST(NULLIF(regexp_extract(props, '"k":\\s*(-?\\d+)', 1),
                        '') AS BIGINT)) AS k_min,
               MAX(CAST(NULLIF(regexp_extract(props, '"k":\\s*(-?\\d+)', 1),
                        '') AS BIGINT)) AS k_max
        FROM events
        GROUP BY 1
    """,
    tags=("expression", "json", "semi-structured"),
)
def e15_json_props_parse(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    parsed = ev.withColumn(
        "k", F.from_json("props", "k BIGINT").getField("k")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("n_unparsed"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


@register(
    "j16_recursive_cte_ancestry",
    "WITH RECURSIVE (Spark 4 finally has it): every event user walks "
    "its binary-tree ancestry (parent = id div 2) up to the root, and "
    "the result folds into users-per-depth. The recursion is the "
    "declarative form of the iterate-until-done loops x18/x84 hand-"
    "roll with localCheckpoint; depth here is provably "
    "floor(log2(user_id)), so the oracle checks the recursive engine "
    "against CLOSED-FORM integer arithmetic (binary length, no libm) — "
    "a genuinely algorithm-independent truth. Scale note: each "
    "recursive step is one self-referencing union pass; Spark executes "
    "it as an iterative union plan, depth-bounded by log2(max id).",
    oracle="""
        SELECT CAST(length(bin(user_id)) - 1 AS INT) AS depth,
               CAST(count(*) AS BIGINT) AS n_users
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id >= 1)
        GROUP BY 1
    """,
    tags=("recursive-cte", "hierarchy", "iterative"),
)
def j16_recursive_cte_ancestry(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "events").createOrReplaceTempView("ev_j16")
    return spark.sql(
        """
        WITH RECURSIVE walk(user_id, cur, depth) AS (
            SELECT user_id, user_id, 0
            FROM (SELECT DISTINCT user_id FROM ev_j16 WHERE user_id >= 1)
            UNION ALL
            SELECT user_id, cur div 2, depth + 1 FROM walk WHERE cur > 1
        )
        SELECT CAST(depth AS INT) AS depth,
               count(*) AS n_users
        FROM walk WHERE cur = 1
        GROUP BY depth
        """
    )


@register(
    "d7_intersect_except_all",
    "BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL — the "
    "multiplicity-aware forms DISTINCT-based set ops silently "
    "approximate): comparing the multiset of (returnflag, linestatus, "
    "quantity) rows between early and late ship years. INTERSECT ALL "
    "keeps min(multiplicity), EXCEPT ALL subtracts multiplicities — "
    "semantics Spark implements via a counted anti/semi rewrite, one "
    "shuffle per side on the full row key. The entry folds both "
    "results into labeled counts so one surface verifies both "
    "operators.",
    oracle="""
        WITH early AS (
            SELECT l_returnflag, l_linestatus, l_quantity
            FROM lineitem WHERE year(l_shipdate) <= 2000
        ),
        late AS (
            SELECT l_returnflag, l_linestatus, l_quantity
            FROM lineitem WHERE year(l_shipdate) > 2000
        )
        SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n_rows
        FROM (SELECT * FROM early INTERSECT ALL SELECT * FROM late)
        UNION ALL
        SELECT 'except_all', CAST(count(*) AS BIGINT)
        FROM (SELECT * FROM early EXCEPT ALL SELECT * FROM late)
    """,
    tags=("set-ops", "bag-semantics"),
)
def d7_intersect_except_all(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"
    )
    early = li.filter(F.year("l_shipdate") <= 2000).drop("l_shipdate")
    late = li.filter(F.year("l_shipdate") > 2000).drop("l_shipdate")
    inter = early.intersectAll(late).agg(
        F.count(F.lit(1)).alias("n_rows")
    ).select(F.lit("intersect_all").alias("op"), "n_rows")
    exc = early.exceptAll(late).agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit("except_all").alias("op"), "n_rows"
    )
    return inter.unionByName(exc)


@register(
    "g8_two_phase_dynamic_pivot",
    "The DYNAMIC-pivot scale pattern g5's docstring prescribes, made "
    "real: phase 1 discovers the pivot vocabulary (a distinct over the "
    "dimension column — bounded driver data, collected SORTED so the "
    "column order is deterministic), phase 2 runs the literal-values "
    "pivot with that vocabulary — Spark's values-free pivot would "
    "otherwise run the same distinct pass hidden inside the operator, "
    "with a nondeterministic column order and no chance to cap or "
    "validate the vocabulary (a runaway-cardinality dimension OOMs the "
    "schema). Rows = day-of-week, columns = discovered event types, "
    "cells = exact counts. (Cross-engine trap pinned here: Spark's "
    "dayofweek is 1-based Sunday, DuckDB's 0-based — the oracle "
    "shifts +1.)",
    oracle=f"""
        SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
               {", ".join(
                   f"CAST(count(*) FILTER (WHERE event_type = '{t}') "
                   f"AS BIGINT) AS {t}"
                   for t in _EVENT_TYPES
               )}
        FROM events
        GROUP BY 1
    """,
    tags=("pivot", "dynamic", "two-phase"),
)
def g8_two_phase_dynamic_pivot(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    # phase 1: vocabulary discovery — tiny distinct, deterministic order
    values = sorted(
        r.event_type
        for r in ev.select("event_type").distinct().collect()
        if r.event_type is not None
    )
    # phase 2: literal pivot (single partial-aggregated shuffle)
    out = (
        ev.groupBy(F.dayofweek("ts").cast("int").alias("dow"))
        .pivot("event_type", values)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves absent cells NULL; the count contract is 0
    return out.select(
        "dow", *[F.coalesce(F.col(v), F.lit(0)).alias(v) for v in values]
    )


@register(
    "e16_map_column_ops",
    "MAP-typed column algebra: per user the event-type histogram folds "
    "into a map (map_from_entries over collected (type, count) "
    "structs), map_filter keeps types seen >= 2 times, "
    "transform_values doubles the counts, and explode unpacks the "
    "result back to rows — the collection-type workhorses "
    "(map_from_entries / map_filter / transform_values / explode) on "
    "one surface. Maps stay INTERNAL: the verified output is rows, "
    "because order-insensitive hashing of map cells is "
    "engine-ambiguous (the r01 k2 lesson for arrays). The oracle "
    "computes the same result relationally (HAVING + *2), proving the "
    "map pipeline is just grouped arithmetic.",
    oracle="""
        SELECT user_id, event_type,
               CAST(count(*) * 2 AS BIGINT) AS doubled_count
        FROM events
        GROUP BY 1, 2
        HAVING count(*) >= 2
    """,
    tags=("expression", "map-type", "collection"),
)
def e16_map_column_ops(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "c")))
        ).alias("hist")
    )
    transformed = mapped.select(
        "user_id",
        F.transform_values(
            F.map_filter("hist", lambda _k, v: v >= 2),
            lambda _k, v: v * 2,
        ).alias("boosted"),
    )
    return transformed.select(
        "user_id", F.explode("boosted").alias("event_type", "doubled_count")
    )


@register(
    "j17_top_supplier_by_revenue",
    "TPC-H Q15 shape: a revenue VIEW (per-supplier decimal-exact "
    "revenue over a one-quarter ship window) consumed twice — once to "
    "find the scalar MAX, once to return the supplier(s) achieving it "
    "— the classic aggregate-of-aggregate with a scalar-subquery "
    "threshold. The Spark side computes the view ONCE, broadcasts the "
    "1-row max, and joins on decimal equality (no double rounding in "
    "the comparison — the revenue stays DECIMAL end to end and only "
    "renders to double in the output). Ties all return (ORDER BY-free "
    "semantics), so the result is deterministic.",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(28,6))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= DATE '2000-01-01'
              AND l_shipdate < DATE '2000-04-01'
            GROUP BY 1
        )
        SELECT r.l_suppkey AS s_suppkey, s.s_name,
               CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_rev
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("join", "tpch-q15", "scalar-subquery", "view"),
)
def j17_top_supplier_by_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "2000-01-01")
            & (F.col("l_shipdate") < "2000-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_rev"),
        )
    )


@register(
    "w12_ratio_to_report",
    "Percent-of-total window (ratio_to_report): each event type's "
    "share of its hour's total value and of the grand total — the "
    "denominator is a windowed sum over the ALREADY-AGGREGATED "
    "(hour, type) table, so the second pass costs |hours x types| "
    "rows, never a rescan. Shares divide a decimal-exact numerator by "
    "a decimal-exact denominator cast to double at the last step — "
    "single IEEE division, portable. The grand-total denominator is a "
    "1-row broadcast (no partition-less window over data-sized input).",
    oracle=f"""
        WITH ht AS (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   SUM(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END AS DECIMAL(28,6))) AS v
            FROM events
            GROUP BY 1, 2
        ),
        tot AS (SELECT SUM(v) AS g FROM ht)
        SELECT h AS hour_start, event_type,
               CAST(ROUND(v, 2) AS DOUBLE) AS hour_type_value,
               CAST(v AS DOUBLE) / CAST(SUM(v) OVER (PARTITION BY h)
                                        AS DOUBLE) AS share_of_hour,
               CAST(v AS DOUBLE) / CAST(g AS DOUBLE) AS share_of_total
        FROM ht CROSS JOIN tot
    """,
    tags=("window", "ratio", "share"),
)
def w12_ratio_to_report(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    ht = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(exact_sum("value").alias("v"))
    tot = ht.agg(F.sum("v").alias("g"))
    w = Window.partitionBy("hour_start")
    return ht.crossJoin(F.broadcast(tot)).select(
        "hour_start",
        "event_type",
        F.round("v", 2).cast("double").alias("hour_type_value"),
        (
            F.col("v").cast("double")
            / F.sum("v").over(w).cast("double")
        ).alias("share_of_hour"),
        (F.col("v").cast("double") / F.col("g").cast("double")).alias(
            "share_of_total"
        ),
    )


@register(
    "a10_retractable_rollup",
    "Incremental-view maintenance with RETRACTIONS — the distinction "
    "a9's insert-only merge hides: a late correction batch (every 17th "
    "event, values negated as reversals) applies to monthly metrics "
    "WITHOUT a full rescan. Algebraic aggregates retract by "
    "arithmetic: counts add, decimal sums add the (negative) "
    "correction sums. Non-retractable aggregates (min/max) cannot "
    "subtract — a removed extremum leaves no way back — so they "
    "recompute by rescanning ONLY the affected (day, type) partitions "
    "(the correction batch names them; partition pruning makes that "
    "cheap), then min/max-merge with the untouched days' partials. "
    "The oracle computes the corrected month directly over the full "
    "union, so the hash proves the partial-maintenance path equals "
    "recomputation.",
    oracle=f"""
        WITH all_rows AS (
            SELECT ts, event_type, value FROM events
            WHERE event_id % 17 <> 0
            UNION ALL
            SELECT ts, event_type, -value FROM events
            WHERE event_id % 17 = 0
        )
        SELECT strftime(date_trunc('month', ts), '%Y-%m') AS event_month,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {oracle_money_sum('value')} AS total_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM all_rows
        GROUP BY 1, 2
    """,
    tags=("agg", "rollup", "incremental", "retraction"),
)
def a10_retractable_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    base = ev.filter(F.col("event_id") % 17 != 0).select(
        "ts", "event_type", "value"
    )
    corr = ev.filter(F.col("event_id") % 17 == 0).select(
        "ts", "event_type", (-F.col("value")).alias("value")
    )
    day = F.date_format("ts", "yyyy-MM-dd").alias("event_day")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(day, "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").alias("dec_sum"),
        )

    base_p = partials(base)
    corr_p = partials(corr)
    # algebraic merge: counts and decimal sums ADD (corrections carry
    # negative values); outer union keeps days present on one side only
    merged = (
        base_p.unionByName(corr_p)
        .groupBy("event_day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("dec_sum").alias("dec_sum"),
        )
    )
    # non-retractable min/max: rescan ONLY the (day, type) partitions
    # the correction batch touched, merge with untouched days' extremes
    affected = corr.select(day, "event_type").distinct()
    touched_minmax = (
        base.select(day, "event_type", "value")
        .unionByName(corr.select(day, "event_type", "value"))
        .join(F.broadcast(affected), ["event_day", "event_type"])
        .groupBy("event_day", "event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    untouched_minmax = (
        base.select(day, "event_type", "value")
        .join(F.broadcast(affected), ["event_day", "event_type"], "left_anti")
        .groupBy("event_day", "event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    minmax = touched_minmax.unionByName(untouched_minmax)
    daily = merged.join(minmax, ["event_day", "event_type"])
    return daily.groupBy(
        F.substring("event_day", 1, 7).alias("event_month"), "event_type"
    ).agg(
        F.sum("n").alias("n_events"),
        F.round(F.sum("dec_sum"), 2).cast("double").alias("total_value"),
        F.min("lo").alias("min_value"),
        F.max("hi").alias("max_value"),
    )


@register(
    "w13_dynamic_gap_sessions",
    "session_window with a DYNAMIC per-event gap (the capability w2/w4's "
    "fixed 30 minutes doesn't show): error events extend their session "
    "by a 60-minute timeout, everything else by 15 — the "
    "per-event-class inactivity policy real products ship. Spark's "
    "session_window(ts, gap_expr) merges events whose windows overlap "
    "under their OWN gaps; the oracle replays exactly that semantics "
    "as gaps-and-islands where the cut compares against the running "
    "MAX of prior per-event expiries (ts + own gap) — lag alone would "
    "re-open sessions a long-gap event already covered (the x99 "
    "running-max lesson on the time axis).",
    oracle="""
        WITH g AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN event_type = 'error'
                        THEN INTERVAL 60 MINUTE
                        ELSE INTERVAL 15 MINUTE END AS gap
            FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN max(ts + gap) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) > ts
                        THEN 0 ELSE 1 END AS is_new
            FROM g
        ),
        sessions AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM sessions
        GROUP BY 1, 2
    """,
    tags=("window", "sessionization", "dynamic-gap"),
)
def w13_dynamic_gap_sessions(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    gap = F.when(
        F.col("event_type") == "error", F.lit("60 minutes")
    ).otherwise(F.lit("15 minutes"))
    sess = ev.groupBy(
        "user_id", F.session_window("ts", gap).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
    # session_window yields (start, end]-style bounds, not an ordinal;
    # number sessions per user in start order to match the oracle's
    # gaps-and-islands surface
    w = Window.partitionBy("user_id").orderBy("session_start")
    return sess.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_seq"),
        "n_events",
        "session_start",
        "session_end",
    )


@register(
    "a11_weighted_median",
    "Exact WEIGHTED median (the statistic x53's dedup-with-weights "
    "tier needs downstream): per return flag, the lower weighted "
    "median of price under quantity weights — the smallest value whose "
    "running weight reaches half the group total. Weights accumulate "
    "as exact decimals in (value, tie-break) order, the threshold "
    "compare is decimal-exact (2*cum >= total avoids any division), "
    "and the selected value is an actual data point — hash-portable "
    "by construction. One sort shuffle per group + O(1) window state; "
    "the group totals ride a broadcast join.",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_extendedprice,
                   SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS UNBOUNDED PRECEDING) AS cum_w,
                   SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
                       PARTITION BY l_returnflag) AS tot_w
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(tot_w AS DOUBLE) AS total_weight,
               min(l_extendedprice) FILTER (WHERE 2 * cum_w >= tot_w)
                   AS weighted_median
        FROM ranked
        GROUP BY l_returnflag, tot_w
    """,
    tags=("agg", "weighted", "median"),
)
def a11_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    wo = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).over(wo).alias(
            "cum_w"
        ),
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).over(wt).alias(
            "tot_w"
        ),
    )
    return ranked.groupBy("l_returnflag", "tot_w").agg(
        F.min(
            F.when(2 * F.col("cum_w") >= F.col("tot_w"), F.col("l_extendedprice"))
        ).alias("weighted_median"),
    ).select(
        "l_returnflag",
        F.col("tot_w").cast("double").alias("total_weight"),
        "weighted_median",
    )


@register(
    "j18_lateral_topn",
    "LATERAL correlated subquery (Spark 4): for each region, its top-2 "
    "customers by account balance through the nation dimension — the "
    "declarative per-row-subquery form of w3's window top-k. Catalyst "
    "DECORRELATES the lateral into a ranked join (it cannot execute a "
    "per-row subquery at scale), so the physical plan is the same "
    "window-rank shape w3 builds by hand — which is exactly the "
    "equivalence the oracle pins by computing the window formulation "
    "directly. Deterministic tie-break on custkey.",
    oracle="""
        SELECT region_name, c_custkey, c_acctbal, rnk FROM (
            SELECT r.r_name AS region_name, c.c_custkey, c.c_acctbal,
                   CAST(row_number() OVER (
                       PARTITION BY r.r_name
                       ORDER BY c.c_acctbal DESC, c.c_custkey) AS INT)
                       AS rnk
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        )
        WHERE rnk <= 2
    """,
    tags=("join", "lateral", "correlated", "topn"),
)
def j18_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "customer").createOrReplaceTempView("cust_j18")
    load_table(spark, sf, "nation").createOrReplaceTempView("nat_j18")
    load_table(spark, sf, "region").createOrReplaceTempView("reg_j18")
    return spark.sql(
        """
        SELECT r.r_name AS region_name, l.c_custkey, l.c_acctbal,
               CAST(l.rnk AS INT) AS rnk
        FROM reg_j18 r,
        LATERAL (
            SELECT c.c_custkey, c.c_acctbal,
                   row_number() OVER (ORDER BY c.c_acctbal DESC,
                                      c.c_custkey) AS rnk
            FROM cust_j18 c JOIN nat_j18 n
              ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY c.c_acctbal DESC, c.c_custkey
            LIMIT 2
        ) l
        """
    )


@register(
    "e17_calendar_dimension",
    "Date-dimension GENERATOR (every warehouse's first conformed dim): "
    "a 2024 day spine built by sequence() — no source table at all — "
    "with the calendar attributes joins hang off: ISO week, quarter, "
    "month-end flag, weekday/weekend, day-of-year. Spark and DuckDB "
    "agree on weekofyear (both ISO-8601) but not dayofweek (g8's "
    "1-based/0-based trap, shifted in the oracle again; the date "
    "itself renders as an ISO string — pandas maps Spark DATE to "
    "datetime.date but DuckDB DATE to datetime64, so a raw date "
    "column can never repr-hash equal). Generated "
    "dimensions broadcast by construction; at scale the spine is "
    "regenerated per query rather than stored — cheaper than a scan.",
    oracle="""
        SELECT strftime(d, '%Y-%m-%d') AS cal_date,
               CAST(year(d) AS INT) AS y,
               CAST(quarter(d) AS INT) AS q,
               CAST(month(d) AS INT) AS m,
               CAST(weekofyear(d) AS INT) AS iso_week,
               CAST(dayofweek(d) + 1 AS INT) AS dow,
               dayofweek(d) + 1 IN (1, 7) AS is_weekend,
               d = last_day(d) AS is_month_end,
               CAST(dayofyear(d) AS INT) AS doy
        FROM (
            SELECT unnest(generate_series(DATE '2024-01-01',
                                          DATE '2024-12-31',
                                          INTERVAL 1 DAY))::DATE AS d
        )
    """,
    tags=("expression", "calendar", "dimension", "generator"),
)
def e17_calendar_dimension(spark: SparkSession, sf: str) -> DataFrame:
    spine = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-12-31', "
        "INTERVAL 1 DAY)) AS cal_date"
    )
    return spine.select(
        F.date_format("cal_date", "yyyy-MM-dd").alias("cal_date"),
        F.year("cal_date").cast("int").alias("y"),
        F.quarter("cal_date").cast("int").alias("q"),
        F.month("cal_date").cast("int").alias("m"),
        F.weekofyear("cal_date").cast("int").alias("iso_week"),
        F.dayofweek("cal_date").cast("int").alias("dow"),
        F.dayofweek("cal_date").isin(1, 7).alias("is_weekend"),
        (F.col("cal_date") == F.last_day("cal_date")).alias("is_month_end"),
        F.dayofyear("cal_date").cast("int").alias("doy"),
    )


@register(
    "a12_ols_trend_per_group",
    "Per-group ORDINARY LEAST SQUARES trend (value vs day index): "
    "slope and intercept per event type from exact one-pass moments — "
    "x = integer day-of-month, y quantizes to integer micro-units, so "
    "n, Σx, Σx², Σy, Σxy all accumulate as exact integers/decimals "
    "(the builtin regr_slope aggregates doubles in shuffle order and "
    "cannot hash) and the closing slope/intercept formulas are "
    "identical IEEE expressions — a8's correlation recipe extended to "
    "regression, x104's Mann-Kendall gets its parametric sibling. One "
    "partial-aggregated pass; the per-group moment row is all that "
    "shuffles.",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   count(*) AS n,
                   sum(day(ts)) AS sx,
                   sum(day(ts) * day(ts)) AS sxx,
                   sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 1000000) AS BIGINT)) AS sy,
                   sum(day(ts) * CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 1000000) AS BIGINT))
                       AS sxy
            FROM events WHERE value IS NOT NULL
            GROUP BY 1
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               / 1000000.0 AS slope_per_day,
               (CAST(sy AS DOUBLE)
                - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
                  * sx)
               / n / 1000000.0 AS intercept
        FROM m
    """,
    tags=("agg", "regression", "trend", "statistics"),
)
def a12_ols_trend_per_group(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    x = F.dayofmonth("ts")
    y = F.floor(fin("value") * 1_000_000).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
    )
    slope_scaled = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return m.select(
        "event_type",
        "n",
        (slope_scaled / F.lit(1_000_000.0)).alias("slope_per_day"),
        (
            (F.col("sy").cast("double") - slope_scaled * F.col("sx"))
            / F.col("n")
            / F.lit(1_000_000.0)
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Round-4 continuation: interval analytics + tolerance-bounded as-of
# ---------------------------------------------------------------------------


@register(
    "j19_interval_concurrency",
    "Sweep-line maximum concurrency: each event opens an interval "
    "[ts, ts + floor(value*60) seconds] and the question is the peak "
    "number of simultaneously-open intervals per event_type (peak "
    "concurrent trips / sessions / connections — the capacity-planning "
    "primitive). The classic sweep: every interval emits a (+1 at "
    "start, -1 at end) delta, a per-type running sum over (t, delta, "
    "event_id) order walks the timeline, and max(running) is the "
    "answer. Ends sort before starts at the same instant (delta -1 < "
    "+1), so touching intervals do NOT count as concurrent — pinned "
    "identically in both dialects by the composite sort key. One "
    "shuffle on event_type; the timeline walk is window-local. At "
    "100 TB the partition key would widen to (type, day-bucket) with "
    "per-bucket boundary carry-in — the same plan shape.",
    oracle="""
        WITH iv AS (
            SELECT event_type, event_id, ts AS s,
                   ts + to_seconds(CAST(floor(value * 60) AS BIGINT)) AS e
            FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e13
        ), pts AS (
            SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
            UNION ALL
            SELECT event_type, e AS t, -1 AS delta, event_id FROM iv
        ), walked AS (
            SELECT event_type, delta,
                   sum(delta) OVER (PARTITION BY event_type
                                    ORDER BY t, delta, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS running
            FROM pts
        )
        SELECT event_type,
               CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_intervals,
               CAST(max(running) AS BIGINT) AS max_concurrent
        FROM walked
        GROUP BY event_type
    """,
    tags=("interval", "sweep-line", "window", "capacity"),
)
def j19_interval_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    # non-finite duration -> the interval cannot join the sweep: the
    # row is excluded whole (a screened-NULL end would need a cross-
    # engine NULL sort position inside the timeline walk; exclusion is
    # the same convention as the NULL filter it extends)
    ev = load_table(spark, sf, "events").filter(fin("value").isNotNull())
    iv = ev.select(
        "event_type",
        "event_id",
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_dt_interval(0, 0, 0, CAST(floor(value * 60) AS DOUBLE))"
        ).alias("e"),
    )
    starts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = iv.select(
        "event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"), "event_id"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walked = starts.unionByName(ends).withColumn(
        "running", F.sum("delta").over(w)
    )
    return walked.groupBy("event_type").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_intervals"),
        F.max("running").cast("long").alias("max_concurrent"),
    )


@register(
    "j20_asof_tolerance_bidi",
    "Tolerance-bounded bidirectional as-of enrichment (the feature-store "
    "point-in-time join with a staleness cap): every 'purchase' is "
    "enriched with (a) seconds since the user's most recent prior "
    "'click', kept only if within 30 min — a stale feature is worse "
    "than a missing one — and (b) seconds until the user's NEXT "
    "'error', kept only if within 60 min (the forward as-of used for "
    "outcome labeling). Same union-sort shape as j2 — one scan tags "
    "all three streams, one shuffle on user_id, last/first IGNORE "
    "NULLS over preceding/following frames — the tolerance is a "
    "post-window projection, so bounding staleness costs nothing "
    "extra. Gaps are measured on second-truncated timestamps so both dialects count identical whole seconds (Spark timestampdiff floors the exact diff, DuckDB date_diff counts boundary crossings — truncation makes them agree by construction). No range join, no per-key collect; linear in rows and "
    "100 TB-safe on the user_id shuffle alone.",
    oracle="""
        WITH tagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN event_type = 'click' THEN ts END AS click_ts,
                   CASE WHEN event_type = 'error' THEN ts END AS err_ts
            FROM events WHERE event_type IN ('purchase', 'click', 'error')
        ), filled AS (
            SELECT user_id, ts, event_id, event_type,
                   last_value(click_ts IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prior_click_ts,
                   first_value(err_ts IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS next_err_ts
            FROM tagged
        )
        SELECT event_id, user_id, ts,
               CASE WHEN date_diff('second', date_trunc('second', prior_click_ts),
                              date_trunc('second', ts)) <= 1800
                    THEN CAST(date_diff('second',
                              date_trunc('second', prior_click_ts),
                              date_trunc('second', ts))
                              AS BIGINT) END AS click_secs_back,
               CASE WHEN date_diff('second', date_trunc('second', ts),
                              date_trunc('second', next_err_ts)) <= 3600
                    THEN CAST(date_diff('second',
                              date_trunc('second', ts),
                              date_trunc('second', next_err_ts))
                              AS BIGINT) END AS error_secs_fwd
        FROM filled WHERE event_type = 'purchase'
    """,
    tags=("join", "asof", "tolerance", "feature-store"),
)
def j20_asof_tolerance_bidi(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "click", "error")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        F.when(F.col("event_type") == "error", F.col("ts")).alias("err_ts"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    filled = tagged.withColumn(
        "prior_click_ts", F.last("click_ts", ignorenulls=True).over(wb)
    ).withColumn("next_err_ts", F.first("err_ts", ignorenulls=True).over(wf))
    back = F.expr(
        "timestampdiff(SECOND, date_trunc('second', prior_click_ts), "
        "date_trunc('second', ts))"
    )
    fwd = F.expr(
        "timestampdiff(SECOND, date_trunc('second', ts), "
        "date_trunc('second', next_err_ts))"
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.when(back <= 1800, back.cast("long")).alias("click_secs_back"),
        F.when(fwd <= 3600, fwd.cast("long")).alias("error_secs_fwd"),
    )


@register(
    "k5_join_cardinality_estimate",
    "Join-cardinality estimation from per-key histograms — the "
    "optimizer-statistics primitive: the output size of an equi-join "
    "is sum over keys of n_left(k) * n_right(k), computable from two "
    "tiny aggregated count tables WITHOUT materializing a single "
    "joined row. The entry also computes the actual join count and "
    "returns both, so the hash proves the estimator is EXACT for "
    "equi-joins (it is — the formula is the join's definition), plus "
    "max_key_pairs, the skew headline: the largest single-key output "
    "is what decides salting (k1/k3) vs a plain shuffle. At 100 TB "
    "this is how you price a shuffle before paying for it: two "
    "partial-aggregated key scans instead of the join itself.",
    oracle="""
        WITH a AS (SELECT o_orderkey AS k, count(*) AS n
                   FROM orders GROUP BY 1),
             b AS (SELECT l_orderkey AS k, count(*) AS n
                   FROM lineitem GROUP BY 1),
             prod AS (SELECT a.n * b.n AS p FROM a JOIN b ON a.k = b.k)
        SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_left,
               CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_right,
               CAST(sum(p) AS BIGINT) AS predicted_pairs,
               CAST(max(p) AS BIGINT) AS max_key_pairs,
               CAST((SELECT count(*)
                     FROM orders JOIN lineitem
                     ON o_orderkey = l_orderkey) AS BIGINT) AS actual_pairs
        FROM prod
    """,
    tags=("stats", "cardinality", "skew", "planning"),
)
def k5_join_cardinality_estimate(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    a = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    b = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    prod = a.join(b, "k").select((F.col("na") * F.col("nb")).alias("p"))
    est = prod.agg(
        F.sum("p").cast("long").alias("predicted_pairs"),
        F.max("p").cast("long").alias("max_key_pairs"),
    )
    n_left = o.agg(F.count(F.lit(1)).alias("n_left"))
    n_right = li.agg(F.count(F.lit(1)).alias("n_right"))
    actual = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .agg(F.count(F.lit(1)).alias("actual_pairs"))
    )
    return n_left.crossJoin(n_right).crossJoin(est).crossJoin(actual)


@register(
    "j21_part_supplier_variety",
    "TPC-H Q16 shape: supplier-variety count per (p_brand, p_size) for "
    "parts OUTSIDE a brand/type predicate, excluding a computed "
    "bad-supplier set (negative account balance) via NOT-IN-style "
    "anti semantics — the three-way composition of dimension "
    "filtering, set exclusion, and DISTINCT aggregation. The "
    "exclusion is a left_anti against the (small, aggregated) "
    "bad-supplier keys — broadcastable, and immune to the NOT IN "
    "null trap j15 documents. partsupp doesn't exist in this star "
    "schema, so lineitem's (partkey, suppkey) pairs stand in as the "
    "supply relation, distinct-ed BEFORE the dimension join so the "
    "join input is the small pair set, not the fact table.",
    oracle="""
        WITH supply AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), bad AS (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
        )
        SELECT p.p_brand, p.p_size,
               CAST(count(DISTINCT s.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM supply s
        JOIN part p ON p.p_partkey = s.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type NOT LIKE 'STANDARD%'
          AND s.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
        GROUP BY p.p_brand, p.p_size
    """,
    tags=("join", "q16", "anti", "distinct-agg"),
)
def j21_part_supplier_variety(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    supp = load_table(spark, sf, "supplier")
    supply = li.select("l_partkey", "l_suppkey").distinct()
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    kept = supply.join(
        F.broadcast(bad),
        supply.l_suppkey == bad.s_suppkey,
        "left_anti",
    )
    p = part.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").startswith("STANDARD")
    ).select("p_partkey", "p_brand", "p_size")
    return (
        kept.join(F.broadcast(p), kept.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "w14_active_day_streaks",
    "Gaps-and-islands over calendar days: per user, consecutive-day "
    "activity streaks via the classic date-minus-dense_rank constant "
    "(all days of one streak share day - rank days; any gap shifts "
    "the constant) — the engagement-streak metric under retention "
    "scoring, habit features, and 'n-day streak' product mechanics. "
    "Distinct active days first (one shuffle, collapses events to "
    "<= users x days rows), then two window passes over the tiny "
    "per-user day lists. Output: days active, number of streaks, and "
    "the longest streak, all exact integers (dates appear only as the "
    "internal streak key, so the e17 DATE-repr trap never reaches the "
    "hashed surface).",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), keyed AS (
            SELECT user_id, d,
                   d - CAST(dense_rank() OVER (PARTITION BY user_id
                                               ORDER BY d) AS INT)
                       AS streak_key
            FROM days
        ), streaks AS (
            SELECT user_id, streak_key, count(*) AS len
            FROM keyed GROUP BY user_id, streak_key
        )
        SELECT user_id,
               CAST(sum(len) AS BIGINT) AS active_days,
               CAST(count(*) AS BIGINT) AS n_streaks,
               CAST(max(len) AS BIGINT) AS longest_streak
        FROM streaks GROUP BY user_id
    """,
    tags=("window", "islands", "streaks", "retention"),
)
def w14_active_day_streaks(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    keyed = days.withColumn(
        "streak_key", F.date_sub("d", F.dense_rank().over(w))
    )
    streaks = keyed.groupBy("user_id", "streak_key").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


@register(
    "a13_trimmed_mean",
    "Per-group 5%-trimmed mean of extended price — the robust location "
    "estimate that survives the fat tails c4/c5 cap away: rank rows "
    "inside each return flag (deterministic orderkey/linenumber "
    "tie-break), drop the bottom and top n DIV 20, and average the "
    "interior. The kept-range bounds are pure integer arithmetic "
    "(n DIV 20), the interior sum accumulates as an exact decimal "
    "(order-free), and the mean is one IEEE division of that exact sum "
    "by the kept count — the a8/x120 closing-formula discipline. One "
    "shuffle on the group key; the per-group sort is the price of any "
    "exact rank statistic (the approx path at 100 TB trims on "
    "approx_percentile bounds instead, same shape as the c4/c5 "
    "exact-to-approx switch).",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS r,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem
        ), kept AS (
            SELECT l_returnflag, l_extendedprice, n
            FROM ranked
            WHERE r > n // 20 AND r <= n - n // 20
        )
        SELECT l_returnflag,
               CAST(max(n) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                         AS VARCHAR) AS DOUBLE) AS trimmed_sum,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                         AS VARCHAR) AS DOUBLE) / count(*) AS trimmed_mean
        FROM kept GROUP BY l_returnflag
    """,
    tags=("agg", "statistics", "robust", "trimmed"),
)
def a13_trimmed_mean(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    wr = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = ranked.filter(
        (F.col("r") > F.expr("n DIV 20"))
        & (F.col("r") <= F.col("n") - F.expr("n DIV 20"))
    )
    agg = kept.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("trimmed_sum"),
    )
    return agg.select(
        "l_returnflag",
        "n_total",
        "n_kept",
        "trimmed_sum",
        (F.col("trimmed_sum") / F.col("n_kept")).alias("trimmed_mean"),
    )


@register(
    "a14_spearman_rank_correlation",
    "Per-(returnflag, linestatus) Spearman rank correlation between "
    "quantity and extended price — the monotone-association sibling of "
    "a8's Pearson, in the standard tie-aware form: each measure gets "
    "its AVERAGE rank (tied values share the mean of their positions), "
    "kept exact by doubling — R2 = 2*rank() + peers - 1 is always an "
    "integer — and rho is Pearson over the doubled ranks (doubling "
    "cancels). Average ranks make the statistic deterministic even "
    "with fully duplicated rows (this table's (orderkey, linenumber) "
    "is NOT unique), where any positional tie-break would pair rows "
    "arbitrarily. Moments accumulate as exact decimals (a8's "
    "discipline); the closing formula is a fixed shape of IEEE ops on "
    "correctly-rounded doubles of those exact sums. The peers count "
    "rides the SAME sort as the rank (RANGE peers frame), so each "
    "measure costs one window pass over the one group-keyed shuffle.",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_linestatus,
                   2 * rank() OVER (
                       PARTITION BY l_returnflag, l_linestatus
                       ORDER BY l_quantity)
                   + count(*) OVER (
                       PARTITION BY l_returnflag, l_linestatus
                       ORDER BY l_quantity
                       RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                   - 1 AS rq2,
                   2 * rank() OVER (
                       PARTITION BY l_returnflag, l_linestatus
                       ORDER BY l_extendedprice)
                   + count(*) OVER (
                       PARTITION BY l_returnflag, l_linestatus
                       ORDER BY l_extendedprice
                       RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                   - 1 AS rp2
            FROM lineitem
        ), m AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(CAST(sum(CAST(rq2 AS DECIMAL(38,0))) AS VARCHAR)
                        AS DOUBLE) AS s_q,
                   CAST(CAST(sum(CAST(rp2 AS DECIMAL(38,0))) AS VARCHAR)
                        AS DOUBLE) AS s_p,
                   CAST(CAST(sum(CAST(rq2 AS DECIMAL(19,0))
                                 * CAST(rq2 AS DECIMAL(18,0))) AS VARCHAR)
                        AS DOUBLE) AS q_q,
                   CAST(CAST(sum(CAST(rp2 AS DECIMAL(19,0))
                                 * CAST(rp2 AS DECIMAL(18,0))) AS VARCHAR)
                        AS DOUBLE) AS q_p,
                   CAST(CAST(sum(CAST(rq2 AS DECIMAL(19,0))
                                 * CAST(rp2 AS DECIMAL(18,0))) AS VARCHAR)
                        AS DOUBLE) AS p_qp
            FROM ranked GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus, n,
               (n * p_qp - s_q * s_p)
               / sqrt((n * q_q - s_q * s_q) * (n * q_p - s_p * s_p))
                   AS spearman_rho
        FROM m
    """,
    tags=("agg", "statistics", "correlation", "rank"),
)
def a14_spearman_rank_correlation(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    g = ["l_returnflag", "l_linestatus"]

    def r2(col: str) -> Column:
        wo = Window.partitionBy(*g).orderBy(col)
        peers = wo.rangeBetween(Window.currentRow, Window.currentRow)
        return (
            2 * F.rank().over(wo) + F.count(F.lit(1)).over(peers) - 1
        )

    ranked = li.select(
        *g,
        r2("l_quantity").alias("rq2"),
        r2("l_extendedprice").alias("rp2"),
    )
    wide = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    slim = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    m = ranked.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rq2").cast("decimal(38,0)")).cast("double").alias("s_q"),
        F.sum(F.col("rp2").cast("decimal(38,0)")).cast("double").alias("s_p"),
        F.sum(wide("rq2") * slim("rq2")).cast("double").alias("q_q"),
        F.sum(wide("rp2") * slim("rp2")).cast("double").alias("q_p"),
        F.sum(wide("rq2") * slim("rp2")).cast("double").alias("p_qp"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("p_qp") - F.col("s_q") * F.col("s_p")
    den = F.sqrt(
        (nd * F.col("q_q") - F.col("s_q") * F.col("s_q"))
        * (nd * F.col("q_p") - F.col("s_p") * F.col("s_p"))
    )
    return m.select(*g, "n", (num / den).alias("spearman_rho"))
