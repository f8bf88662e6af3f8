"""Data-quality expectation suite (Deequ/Great-Expectations shape): declared
rules evaluated engine-side, one verdict row per rule.

Reference parity: the reference pipeline trusts the warehouse to validate
loads implicitly (COPY INTO + downstream SQL, ``dags/s3_data_copy_test.py``,
``dags/dev_db_test.py:41-70``); a warehouse user expresses these same checks
as ad-hoc SQL. Here they are first-class, countable, and plan-audited.

Scale notes (100 TB):
- Every rule reduces to either (a) a conditional aggregate over one scan
  (range / null / consistency checks — map-combined, O(1) state), (b) a
  count-distinct (uniqueness — one shuffle of the key, partial-aggregated),
  or (c) a LEFT ANTI join against a dimension (referential integrity — the
  dimension side broadcasts when small, cf. joins.py scale notes).
- Rules over the SAME table are evaluated in ONE pass where they are plain
  conditional aggregates (the lineitem rules share a scan below); only
  distinct-based and join-based rules need their own shuffle. This is the
  difference between "n_rules scans" and "~2 scans" at 100 TB.
- Verdicts are integers/booleans end to end — nothing float crosses the
  engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


@query(
    "dq_expectations",
    family="quality",
    oracle="""
        WITH li AS (
            SELECT count(*) AS n,
                   CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
                   CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
                   CAST(sum(CASE WHEN l_extendedprice IS NULL
                                   OR l_extendedprice <= 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad_price
            FROM lineitem
        ),
        ord AS (
            SELECT count(*) AS n,
                   CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad_total
            FROM orders
        ),
        cust_uniq AS (
            SELECT count(*) AS n,
                   count(*) - count(DISTINCT c_custkey) AS dup
            FROM customer
        ),
        li_uniq AS (
            SELECT count(*) AS n,
                   count(*) - count(DISTINCT l_orderkey * 8 + l_linenumber)
                     AS dup
            FROM lineitem
        ),
        orphans AS (
            SELECT (SELECT count(*) FROM orders) AS n,
                   count(*) AS bad
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
        ),
        doc_len AS (
            SELECT count(*) AS n,
                   CAST(sum(CASE WHEN n_chars <> length(text)
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad
            FROM documents
        )
        SELECT * FROM (
            SELECT 'lineitem.l_quantity in [1,50]' AS rule,
                   n AS n_checked, bad_qty AS n_violations,
                   bad_qty = 0 AS ok FROM li
            UNION ALL
            SELECT 'lineitem.l_discount in [0,0.1]', n, bad_disc,
                   bad_disc = 0 FROM li
            UNION ALL
            SELECT 'lineitem.l_extendedprice positive', n, bad_price,
                   bad_price = 0 FROM li
            UNION ALL
            SELECT 'orders.o_totalprice positive', n, bad_total,
                   bad_total = 0 FROM ord
            UNION ALL
            SELECT 'customer.c_custkey unique', n, dup, dup = 0 FROM cust_uniq
            UNION ALL
            SELECT 'lineitem.(orderkey,linenumber) unique', n, dup, dup = 0
            FROM li_uniq
            UNION ALL
            SELECT 'orders.o_custkey references customer', n, bad, bad = 0
            FROM orphans
            UNION ALL
            SELECT 'documents.n_chars = length(text)', n, bad, bad = 0
            FROM doc_len
        ) ORDER BY rule
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight declared expectations over four tables, one verdict row each
    (rule, n_checked, n_violations, ok). The three lineitem conditional
    rules share ONE scan/aggregate; uniqueness rules pay their
    count-distinct shuffle; referential integrity is a broadcast LEFT ANTI
    count. The composite lineitem key packs (orderkey, linenumber) into one
    BIGINT (linenumber < 8) so count-distinct shuffles a single integer —
    the same narrow-shuffle discipline as dedup.py's hash keys."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    docs = load(spark, sf_dir, "documents")

    def verdict(rule: str, n: F.Column, bad: F.Column) -> list[F.Column]:
        return [
            F.lit(rule).alias("rule"),
            n.alias("n_checked"),
            bad.alias("n_violations"),
            (bad == 0).alias("ok"),
        ]

    cnt = F.count(F.lit(1))
    li_scan = li.agg(
        cnt.alias("n"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).cast("bigint").alias("bad_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
        ).cast("bigint").alias("bad_disc"),
        F.sum(
            F.when(
                F.col("l_extendedprice").isNull()
                | (F.col("l_extendedprice") <= 0),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("bad_price"),
    )
    rules = [
        li_scan.select(
            *verdict(
                "lineitem.l_quantity in [1,50]", F.col("n"), F.col("bad_qty")
            )
        ),
        li_scan.select(
            *verdict(
                "lineitem.l_discount in [0,0.1]", F.col("n"), F.col("bad_disc")
            )
        ),
        li_scan.select(
            *verdict(
                "lineitem.l_extendedprice positive",
                F.col("n"),
                F.col("bad_price"),
            )
        ),
        o.agg(
            cnt.alias("n"),
            F.sum(
                F.when(
                    F.col("o_totalprice").isNull()
                    | (F.col("o_totalprice") <= 0),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("bad"),
        ).select(
            *verdict("orders.o_totalprice positive", F.col("n"), F.col("bad"))
        ),
        c.agg(
            cnt.alias("n"),
            (cnt - F.count_distinct(F.col("c_custkey"))).alias("dup"),
        ).select(
            *verdict("customer.c_custkey unique", F.col("n"), F.col("dup"))
        ),
        li.agg(
            cnt.alias("n"),
            (
                cnt
                - F.count_distinct(
                    F.col("l_orderkey") * 8 + F.col("l_linenumber")
                )
            ).alias("dup"),
        ).select(
            *verdict(
                "lineitem.(orderkey,linenumber) unique",
                F.col("n"),
                F.col("dup"),
            )
        ),
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(cnt.alias("bad"))
        .join(F.broadcast(o.agg(cnt.alias("n"))))
        .select(
            *verdict(
                "orders.o_custkey references customer",
                F.col("n"),
                F.col("bad"),
            )
        ),
        docs.agg(
            cnt.alias("n"),
            F.sum(
                F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
            ).cast("bigint").alias("bad"),
        ).select(
            *verdict(
                "documents.n_chars = length(text)", F.col("n"), F.col("bad")
            )
        ),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionAll(r)
    return out.orderBy("rule")
