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
