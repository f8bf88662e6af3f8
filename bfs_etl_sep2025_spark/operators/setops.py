"""Set operations, distinct, global sort and limit.

Reference parity: reachable via the arbitrary-SQL pass-through
(``dags/dev_db_test.py:41-70``).

Scale notes (100 TB): UNION ALL is free (plan concatenation, no shuffle);
UNION/INTERSECT/EXCEPT each cost one hash-aggregate or join shuffle on the
full row — use them only on pre-projected narrow columns, as here. A global
ORDER BY is a range-partitioned sort (sampling pass + shuffle); with a
trailing LIMIT Spark instead takes per-partition top-N then merges on the
driver — O(N) driver memory, safe for small N only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


def _split_segments(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping customer slices used by the set-op queries: big-balance
    customers and AUTOMOBILE-segment customers."""
    c = load(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return rich, auto


_RICH = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"
_AUTO = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"


@query(
    "setop_union_all",
    family="setops",
    oracle=f"SELECT c_custkey FROM ({_RICH} UNION ALL {_AUTO})",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich, auto = _split_segments(spark, sf_dir)
    return rich.unionByName(auto)


@query(
    "setop_union_distinct",
    family="setops",
    oracle=f"{_RICH} UNION {_AUTO}",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich, auto = _split_segments(spark, sf_dir)
    return rich.unionByName(auto).distinct()


@query(
    "setop_intersect",
    family="setops",
    oracle=f"{_RICH} INTERSECT {_AUTO}",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich, auto = _split_segments(spark, sf_dir)
    return rich.intersect(auto)


@query(
    "setop_except",
    family="setops",
    oracle=f"{_RICH} EXCEPT {_AUTO}",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich, auto = _split_segments(spark, sf_dir)
    return rich.subtract(auto)  # EXCEPT (set semantics), not exceptAll


@query(
    "setop_except_all",
    family="setops",
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 3
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) difference — keeps multiplicity, unlike EXCEPT."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 3).select("l_orderkey")
    b = li.filter(F.col("l_linenumber") == 1).select("l_orderkey")
    return a.exceptAll(b)


@query(
    "setop_intersect_all",
    family="setops",
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2
        INTERSECT ALL
        SELECT l_orderkey FROM lineitem WHERE l_quantity >= 10
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection — multiplicity = min of the two sides' counts."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select("l_orderkey")
    b = li.filter(F.col("l_quantity") >= 10).select("l_orderkey")
    return a.intersectAll(b)


@query(
    "distinct_pairs",
    family="setops",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@query(
    "sort_limit_topn",
    family="setops",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100: Spark plans TakeOrderedAndProject (per-partition heap
    + driver merge), never a full sort — exactly what you want at 100 TB."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
