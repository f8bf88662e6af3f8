"""Subquery surface — the reference's native idiom is SQL text through a
pass-through operator (``dags/dev_db_test.py:41-70``), so the engine must
take the full ANSI subquery family: scalar, IN, EXISTS/NOT EXISTS,
correlated, and lateral explode. Expressed through ``spark.sql`` over
registered fixture views (the same path SqlTask uses).

Scale notes: Catalyst rewrites every decorrelatable subquery to a join
(scalar -> broadcast of a 1-row aggregate; IN/EXISTS -> semi join;
correlated -> aggregated self-join), so these cost what the equivalent
joins cost — nothing here executes per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bfs_etl_sep2025_spark.functions.portable import sql_exact_avg
from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], stmt: str) -> DataFrame:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(f"{t}_sq")
    return spark.sql(stmt)


_AVG_PRICE = sql_exact_avg("o_totalprice", 2)


@query(
    "subquery_scalar",
    family="subqueries",
    oracle=f"""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT {_AVG_PRICE} FROM orders)
        ORDER BY o_orderkey
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above twice the (exactly-accumulated) global
    mean. Catalyst plans the inner aggregate once and broadcasts the
    scalar."""
    return _sql(
        spark,
        sf_dir,
        ["orders"],
        f"""
        SELECT o_orderkey, o_totalprice
        FROM orders_sq
        WHERE o_totalprice > 2 * (SELECT {_AVG_PRICE} FROM orders_sq)
        ORDER BY o_orderkey
        """,
    )


@query(
    "subquery_in",
    family="subqueries",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        ORDER BY c_custkey
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ["customer", "nation"],
        """
        SELECT c_custkey, c_name
        FROM customer_sq
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation_sq WHERE n_regionkey = 2)
        ORDER BY c_custkey
        """,
    )


@query(
    "subquery_exists_correlated",
    family="subqueries",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
        ORDER BY s_suppkey
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        ["supplier", "lineitem"],
        """
        SELECT s_suppkey, s_name
        FROM supplier_sq s
        WHERE EXISTS (SELECT 1 FROM lineitem_sq l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
        ORDER BY s_suppkey
        """,
    )


@query(
    "subquery_correlated_scalar",
    family="subqueries",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o.o_orderkey
    """,
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's most expensive order via a correlated max — Catalyst
    decorrelates into an aggregate + join (max is exact, so no float
    jitter at the equality)."""
    return _sql(
        spark,
        sf_dir,
        ["orders"],
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders_sq o
        WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders_sq o2
                                WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o.o_orderkey
        """,
    )


@query(
    "lateral_view_explode",
    family="subqueries",
    oracle="""
        SELECT e.event_id, t.tag
        FROM (SELECT event_id,
                     string_split(event_type, '_') AS tags
              FROM events WHERE event_id < 100) e,
             unnest(e.tags) AS t(tag)
        ORDER BY e.event_id, t.tag
    """,
)
def lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode — the SQL spelling of the row-multiplying
    pattern (DataFrame twin is fn_explode_posexplode)."""
    return _sql(
        spark,
        sf_dir,
        ["events"],
        """
        SELECT e.event_id, t.tag
        FROM (SELECT event_id, split(event_type, '_') AS tags
              FROM events_sq WHERE event_id < 100) e
        LATERAL VIEW explode(e.tags) t AS tag
        ORDER BY e.event_id, t.tag
        """,
    )
