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
from pyspark.sql import Window as W
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


# -- TPC-H Q4/Q7/Q12/Q14/Q18/Q19/Q22 shapes ---------------------------------
# (adapted to the fixture schema: no l_commitdate/l_receiptdate/l_shipmode/
# c_phone columns — each query keeps the canonical plan shape and swaps the
# missing column for a fixture equivalent, noted per query.)


@query(
    "q4_order_priority",
    family="analytics",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: priority distribution of orders with at least one
    late line (here: shipped >60 days after order date — the fixture has no
    commit/receipt dates). The EXISTS is a LEFT SEMI join: the probe side
    never duplicates, no distinct needed, and Catalyst pushes the quarter
    filter to the orders scan so the semi-join's build input is one quarter
    of one table, not the whole fact."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    family="analytics",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {sql_exact_sum(_REVENUE, 6)} AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bilateral trade volume between two nations by year.
    Both nation lookups broadcast; the disjunctive nation-pair predicate is
    applied after the dim joins (it references both) but BEFORE the groupBy,
    and Catalyst infers n_name IN (a,b) pushdown into each broadcast side."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(exact_sum(revenue, 6).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q12_priority_by_linestatus",
    family="analytics",
    oracle="""
        SELECT l_linestatus,
               count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                 AS high_line_count,
               count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                 AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: conditional (CASE-style) aggregation over a fact-fact
    join — urgent vs non-urgent line counts per line status (fixture has no
    l_shipmode; l_linestatus carries the grouping role). The year filter on
    l_shipdate reaches the lineitem scan; the counts are codegen'd
    count(CASE WHEN ...) — one shuffle, no second pass per bucket."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_revenue",
    family="analytics",
    oracle=f"""
        SELECT CAST(100 AS DOUBLE)
                 * {sql_exact_sum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_REVENUE} ELSE 0 END", 6)}
                 / {sql_exact_sum(_REVENUE, 6)} AS promo_pct,
               {sql_exact_sum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_REVENUE} ELSE 0 END", 6)} AS promo_revenue,
               {sql_exact_sum(_REVENUE, 6)} AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: promo-type revenue share for one month. part is the
    broadcast side (dimension); the ratio divides two exact-DECIMAL-derived
    doubles, so it is bitwise identical across engines (one IEEE division of
    two identical operands — see functions/portable.py)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), revenue).otherwise(F.lit(0.0))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            exact_sum(promo, 6).alias("promo_revenue"),
            exact_sum(revenue, 6).alias("total_revenue"),
        )
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
        "promo_revenue",
        "total_revenue",
    )


@query(
    "q18_large_volume_customer",
    family="analytics",
    bench=True,
    oracle=f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               {sql_exact_sum('l_quantity', 2)} AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(30,2))) > 350
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: customers whose single orders exceed a quantity
    threshold. The IN-subquery is a self-aggregation of lineitem → LEFT SEMI
    join against orders; the qty threshold compares the exact DECIMAL sum
    (portable.py) so the surviving key set is engine-independent. Top-100 by
    price plans TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("qty"))
        .filter(F.col("qty") > 350)
        .select("l_orderkey")
    )
    return (
        cust.join(o, cust.c_custkey == o.o_custkey)
        .join(big_orders, o.o_orderkey == big_orders.l_orderkey, "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(exact_sum(F.col("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_disjunctive_predicates",
    family="analytics",
    oracle=f"""
        SELECT {sql_exact_sum(_REVENUE, 6)} AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR-of-ANDs predicate spanning both join sides.
    Catalyst factors the common join key and pushes the per-side residuals
    (brand/size to the part scan via superset-OR, quantity to lineitem), then
    evaluates the full disjunction post-join — the classic test that an
    optimizer doesn't fall back to a cartesian for disjunctive join filters."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & qty.between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 20)
        & qty.between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 25)
        & qty.between(20, 30)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(
        exact_sum(revenue, 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q22_dormant_high_balance",
    family="analytics",
    oracle=f"""
        SELECT c_mktsegment,
               count(*) AS n_custs,
               {sql_exact_sum('c_acctbal', 2)} AS total_bal
        FROM customer c
        WHERE c_acctbal > (
            SELECT {sql_exact_sum('c_acctbal', 2)} / count(*)
            FROM customer WHERE c_acctbal > 0
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: above-average-balance customers with no recent orders
    (fixture customers all have SOME order, so 'dormant' = none since 2000).
    The scalar subquery's mean is the exact-DECIMAL mean (portable.py), so
    the strict > comparison admits the same customer set in both engines; the
    NOT EXISTS is a LEFT ANTI join against date-pruned orders. The scalar is
    broadcast (1 row) — no shuffle for the threshold."""
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (exact_sum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            exact_sum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "events_interval_concurrency",
    family="analytics",
    oracle="""
        WITH e AS (
            SELECT event_type, ts,
                   ts + to_minutes(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                     AS end_ts
            FROM events
        ),
        b AS (
            SELECT event_type, ts AS bts, 1 AS delta FROM e
            UNION ALL
            SELECT event_type, end_ts AS bts, -1 AS delta FROM e
        ),
        g AS (
            SELECT event_type, bts, CAST(sum(delta) AS BIGINT) AS d
            FROM b GROUP BY event_type, bts
        ),
        r AS (
            SELECT event_type,
                   CAST(sum(d) OVER (PARTITION BY event_type ORDER BY bts)
                        AS BIGINT) AS live
            FROM g
        )
        SELECT event_type,
               CAST(max(live) AS BIGINT) AS peak_live,
               count(*) AS n_boundaries
        FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def events_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency (max simultaneously-open sessions) per
    event type — the classic sweep-line: each interval contributes a +1 at
    its start and a -1 at its end, boundaries collapse by timestamp, and a
    per-key running sum's max is the peak. Session length is derived from
    ``value`` as whole minutes via ``floor(value*100 + 0.5)`` — an explicit
    floor, never ``round()``/``CAST`` (the engines disagree on double->int
    rounding; floor of an integral-plus-ulp double is exact in both).

    Scale (100 TB): one hash aggregate collapses boundaries (map-combined),
    then ONE shuffle on event_type + an in-partition sort for the prefix
    sum — the same cost as any windowed aggregate; no interval self-join
    (the naive overlap-count join is O(n^2) per key). Tie semantics are
    order-free: deltas at an identical timestamp are summed BEFORE the
    running sum, so an interval ending exactly when another starts never
    double-counts regardless of sort stability."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "ts",
        F.expr(
            "ts + make_dt_interval(0, 0,"
            " CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0)"
        ).alias("end_ts"),
    )
    b = e.select("event_type", F.col("ts").alias("bts"), F.lit(1).alias("delta")).unionAll(
        e.select("event_type", F.col("end_ts").alias("bts"), F.lit(-1).alias("delta"))
    )
    g = b.groupBy("event_type", "bts").agg(F.sum("delta").alias("d"))
    w = W.partitionBy("event_type").orderBy("bts")
    r = g.select("event_type", F.sum("d").over(w).alias("live"))
    return (
        r.groupBy("event_type")
        .agg(
            F.max("live").cast("bigint").alias("peak_live"),
            F.count(F.lit(1)).alias("n_boundaries"),
        )
        .orderBy("event_type")
    )


@query(
    "events_timeseries_gapfill",
    family="analytics",
    oracle=f"""
        WITH daily AS (
            SELECT user_id,
                   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                        AS INT) AS day_num,
                   {sql_exact_sum('value', 2)} AS day_sum
            FROM events WHERE user_id <= 15
            GROUP BY user_id,
                     CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                          AS INT)
        ),
        b AS (
            SELECT user_id, min(day_num) AS mn, max(day_num) AS mx
            FROM daily GROUP BY user_id
        ),
        spine AS (
            SELECT user_id, CAST(d AS INT) AS day_num
            FROM (SELECT user_id, unnest(range(mn, mx + 1)) AS d FROM b)
        )
        SELECT s.user_id, s.day_num,
               (d.day_sum IS NULL) AS is_gap,
               last_value(d.day_sum IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day_num) AS filled_sum
        FROM spine s
        LEFT JOIN daily d
          ON s.user_id = d.user_id AND s.day_num = d.day_num
        ORDER BY s.user_id, s.day_num
    """,
)
def events_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily time series per user with forward-filled gaps: build a
    per-user day spine (sequence from first to last active day), left-join
    the real daily sums, and carry the last observation forward with
    ``last(..., ignorenulls)`` over an ordered window. Days are integer
    day-numbers (epoch days) end to end — date/timestamp rendering never
    crosses the engine boundary, and the spine is pure integer ``sequence``.

    Scale (100 TB): the spine explodes O(active_span) rows per key from a
    one-row-per-key aggregate — no driver loop, no cross join against a
    global calendar (which would be spine x users shuffle). Daily sums are
    map-combined before their single shuffle; the fill window rides the
    same user_id partitioning. Gap-filling is the standard pre-step for
    window features over sparse activity (cf. events_hypertable_rollup)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 15)
    day_num = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("int")
    daily = ev.groupBy("user_id", day_num.alias("day_num")).agg(
        exact_sum(F.col("value"), 2).alias("day_sum")
    )
    b = daily.groupBy("user_id").agg(
        F.min("day_num").alias("mn"), F.max("day_num").alias("mx")
    )
    spine = b.select(
        "user_id", F.explode(F.sequence("mn", F.col("mx"))).alias("d")
    ).select("user_id", F.col("d").cast("int").alias("day_num"))
    w = W.partitionBy("user_id").orderBy("day_num")
    return (
        spine.join(daily, ["user_id", "day_num"], "left")
        .select(
            "user_id",
            "day_num",
            F.col("day_sum").isNull().alias("is_gap"),
            F.last("day_sum", ignorenulls=True).over(w).alias("filled_sum"),
        )
        .orderBy("user_id", "day_num")
    )


@query(
    "events_activity_similarity",
    family="analytics",
    oracle="""
        WITH daily AS (
          SELECT user_id, date_trunc('day', ts) AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY user_id, date_trunc('day', ts)
        ),
        nrm AS (
          SELECT user_id, CAST(sum(c * c) AS BIGINT) AS sq
          FROM daily GROUP BY user_id
        ),
        dots AS (
          SELECT q.user_id AS query_user, c.user_id AS user_id,
                 CAST(sum(q.c * c.c) AS BIGINT) AS dot
          FROM daily q JOIN daily c ON q.d = c.d
          WHERE q.user_id < 5 AND c.user_id <> q.user_id
          GROUP BY q.user_id, c.user_id
        ),
        scored AS (
          SELECT d.query_user, d.user_id, d.dot,
                 d.dot / (sqrt(nq.sq) * sqrt(nc.sq)) AS cosine
          FROM dots d
          JOIN nrm nq ON nq.user_id = d.query_user
          JOIN nrm nc ON nc.user_id = d.user_id
        )
        SELECT query_user, user_id, dot, cosine, rnk
        FROM (SELECT *, row_number() OVER (PARTITION BY query_user
                                           ORDER BY cosine DESC, user_id)
                        AS rnk
              FROM scored)
        WHERE rnk <= 3
        ORDER BY query_user, rnk
    """,
)
def events_activity_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search over behavioral profiles (the
    EDBT'19 distributed streaming-similarity shape, PAPERS.md): each user's
    daily activity-count vector, cosine top-3 most-similar users for a
    bounded query set. The dot products and squared norms are EXACT BIGINT
    sums of count products (order-independent — no float accumulation);
    only the final ``dot / (sqrt·sqrt)`` is floating point, an identical
    IEEE expression over exact integers in both engines.

    Scale: the candidate pass is an equi-join on the day bucket with the
    QUERY side bounded and broadcast — O(|Q| · active-days) streamed, the
    search-not-cluster discipline of the similarity family (an UNBOUNDED
    q-side day join would be all-pairs in disguise; corpus-wide behavioral
    clustering belongs to the LSH/k-means path over these same vectors).
    Per-pair state after the join is (int, int, bigint) — nothing wider
    than the day counts ever shuffles."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    nrm = daily.groupBy("user_id").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq")
    )
    q = daily.filter(F.col("user_id") < 5).select(
        F.col("user_id").alias("query_user"),
        "d",
        F.col("c").alias("qc"),
    )
    dots = (
        daily.join(F.broadcast(q), "d")
        .filter(F.col("user_id") != F.col("query_user"))
        .groupBy("query_user", "user_id")
        .agg(F.sum(F.col("qc") * F.col("c")).cast("bigint").alias("dot"))
    )
    scored = (
        dots.join(
            F.broadcast(
                nrm.select(
                    F.col("user_id").alias("query_user"),
                    F.col("sq").alias("q_sq"),
                )
            ),
            "query_user",
        )
        .join(nrm, "user_id")
        .select(
            "query_user",
            "user_id",
            "dot",
            (
                F.col("dot") / (F.sqrt(F.col("q_sq")) * F.sqrt(F.col("sq")))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_user").orderBy(
        F.col("cosine").desc(), F.col("user_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .orderBy("query_user", "rnk")
    )
