"""Multi-join analytical queries (TPC-H Q3/Q5/Q10 shapes).

Reference parity: the reference's SQL pass-through executes arbitrary joined
analytics in Snowflake (``dags/dev_db_test.py:41-70`` is the entry point);
these queries re-express the three canonical star-join shapes — fact×fact
top-N, fact×fact×dims regional rollup, and fact×fact top-N customers — as
declarative DataFrame plans.

Scale notes (100 TB):
- customer⋈orders and orders⋈lineitem are big-big equi-joins: shuffle-hash /
  sort-merge on the key, chosen by Catalyst+AQE. Filters are applied BEFORE
  the joins (selective predicates on o_orderdate / l_shipdate / c_mktsegment
  reach the parquet scan as PushedFilters, shrinking the shuffle).
- nation / region are dimension tables (25 / 5 rows at any SF): explicitly
  ``F.broadcast`` so they never shuffle the fact side.
- Top-N (Q3/Q10) is ``orderBy(...).limit(n)``: Spark plans TakeOrderedAndProject
  — each partition keeps only its local top-N, the driver merges N×partitions
  rows, never a full sort of the fact table.
- Revenue sums accumulate in exact DECIMAL (functions/portable.py) so results
  are identical at any parallelism; top-N ties are broken by key so the SAME
  rows survive the limit in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.functions.portable import exact_sum, sql_exact_sum
from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load

_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "q3_shipping_priority",
    family="analytics",
    oracle=f"""
        SELECT l_orderkey,
               {sql_exact_sum(_REVENUE, 6)} AS revenue,
               o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-06-30 00:00:00'
          AND l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: 3-way join, filtered on all three inputs, top-10 by
    revenue. (No ``o_shippriority`` column in the fixture schema — dropped.)"""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    ords = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-06-30 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey)
        .join(li, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(revenue, 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    family="analytics",
    oracle=f"""
        SELECT n_name,
               {sql_exact_sum(_REVENUE, 6)} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: 6-way join (3 facts + 3 broadcast dims) with the
    "local supplier" same-nation predicate, revenue rolled up per nation."""
    cust = load(spark, sf_dir, "customer")
    ords = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey)
        .join(li, li.l_orderkey == ords.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(revenue, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q10_returned_items",
    family="analytics",
    oracle=f"""
        SELECT c_custkey,
               c_name,
               {sql_exact_sum(_REVENUE, 6)} AS revenue,
               c_acctbal,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: returned-item revenue per customer over one quarter,
    top-20 customers. nation broadcast; the quarter filter prunes orders at
    the scan."""
    cust = load(spark, sf_dir, "customer")
    ords = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey)
        .join(li, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(revenue, 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# -- Z-order (Morton) layout clustering -------------------------------------

#: bit-spread magic masks: interleave a 16-bit value into the even bit
#: positions of a 32-bit word (classic Morton-code construction).
_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread_spark(v):
    v = v.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _spread_sql(expr: str) -> str:
    v = f"({expr} & 65535)"
    for shift, mask in _SPREAD_STEPS:
        v = f"((({v} << {shift}) | {v}) & {mask})"
    return v


@query(
    "layout_zorder_clustering",
    family="layout",
    oracle=f"""
        WITH k AS (
          SELECT o_orderkey,
                 o_custkey & 65535 AS xk,
                 date_diff('day', DATE '1970-01-01', o_orderdate::DATE) & 65535 AS yk
          FROM orders
        )
        SELECT o_orderkey, xk, yk,
               {_spread_sql('xk')} | ({_spread_sql('yk')} << 1) AS morton
        FROM k
        ORDER BY morton, o_orderkey
        LIMIT 1000
    """,
)
def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-code) multi-dimensional layout clustering: interleave
    the low 16 bits of (customer key, order epoch-day) so that sorting by the
    Morton code co-locates rows that are close in BOTH dimensions — the
    data-layout primitive behind lakehouse OPTIMIZE ZORDER BY, which lets
    min/max file statistics prune scans for predicates on either column.

    Scale notes: the code is pure codegen'd bit arithmetic (4 shift/mask
    steps per dimension, no UDF, no shuffle until the layout sort); the
    layout write itself would be ``repartitionByRange(morton)`` + sorted
    file write — exactly the existing sorted-sink path in tests/test_sinks.
    The top-1000 here plans TakeOrderedAndProject, not a full sort."""
    o = load(spark, sf_dir, "orders")
    xk = F.col("o_custkey").bitwiseAND(F.lit(0xFFFF))
    yk = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).bitwiseAND(F.lit(0xFFFF))
    k = o.select(
        "o_orderkey", xk.alias("xk"), yk.cast("bigint").alias("yk")
    )
    morton = _spread_spark(F.col("xk")).bitwiseOR(
        F.shiftleft(_spread_spark(F.col("yk")), 1)
    )
    return (
        k.select("o_orderkey", "xk", "yk", morton.alias("morton"))
        .orderBy("morton", "o_orderkey")
        .limit(1000)
    )


@query(
    "incremental_agg_merge",
    family="etl",
    oracle=f"""
        SELECT o_orderstatus,
               count(*) AS n_orders,
               {sql_exact_sum('o_totalprice', 2)} AS total_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: per-increment PARTIAL
    aggregates (two order-date slices standing in for daily loads) are
    unioned and MERGED into the final aggregate — count by summing counts,
    sum by summing exact-DECIMAL partial sums. Because decimal addition is
    associative, merge(partials) is bitwise-equal to the direct aggregate
    (the oracle), which is the invariant that makes incremental refresh
    safe to run forever at warehouse scale.

    Scale notes: each increment aggregates map-side before its shuffle; the
    merge groupBy touches |groups|×|increments| rows, not the fact table —
    the whole point of maintaining partials."""
    o = load(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    parts = []
    for pred in [F.col("o_orderdate") < cut, F.col("o_orderdate") >= cut]:
        parts.append(
            o.filter(pred)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("p_n"),
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("p_sum"),
            )
        )
    merged = parts[0].unionByName(parts[1])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.sum("p_n").alias("n_orders"),
            F.sum("p_sum").cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "events_hypertable_rollup",
    family="analytics",
    oracle=f"""
        SELECT date_trunc('day', ts) AS bucket_day,
               CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                    THEN date_trunc('hour', ts) END AS bucket_hour,
               count(*) AS n_events,
               {sql_exact_sum('value', 2)} AS total_value
        FROM events
        GROUP BY ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
        HAVING GROUPING(date_trunc('day', ts)) = 0
        ORDER BY bucket_day, bucket_hour NULLS FIRST
    """,
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass over the event
    stream produces BOTH the hourly and the daily materializations
    (``ROLLUP(day, hour)`` — hour nests inside day, so the day rows are the
    merge of their hour rows). The single-scan multi-granularity shape is
    how time-series stores maintain continuous aggregates without re-reading
    the raw hypertable per granularity.

    Scale notes: one scan, one shuffle; partial aggregation runs map-side
    per (day, hour) and Spark's rollup expands grouping sets BEFORE the
    exchange, so the shuffle carries ~|buckets| rows, not events."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("bucket_day"),
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        "value",
    )
    g_day = F.grouping("bucket_day")
    g_hour = F.grouping("bucket_hour")
    return (
        ev.rollup("bucket_day", "bucket_hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value"), 2).alias("total_value"),
            g_day.alias("_gd"),
            g_hour.alias("_gh"),
        )
        .filter(F.col("_gd") == 0)
        .select(
            "bucket_day",
            F.when(F.col("_gh") == 0, F.col("bucket_hour")).alias("bucket_hour"),
            "n_events",
            "total_value",
        )
        .orderBy("bucket_day", F.col("bucket_hour").asc_nulls_first())
    )
