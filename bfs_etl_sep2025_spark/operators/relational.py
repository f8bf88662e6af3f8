"""Scans, projection, filtering — and the flagship pricing-summary query.

Reference parity: the reference reaches these through its arbitrary-SQL
pass-through (``dags/dev_db_test.py:41-70``); here they are declarative
DataFrame plans so Catalyst pushes predicates and prunes columns into the
parquet scan (verify with ``.explain("formatted")``: ``PushedFilters`` and a
narrow ``ReadSchema``).

Scale notes (100 TB): every query below is a scan->filter->project or
scan->partial-agg->final-agg shape. No driver-side collection, no Python in
the row path; group-by cardinality is tiny relative to input so map-side
partial aggregation collapses the shuffle to ~|groups|×|mappers| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.functions.portable import (
    exact_avg,
    exact_sum,
    sql_exact_avg,
    sql_exact_sum,
)
from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


@query(
    "q1_pricing_summary",
    family="relational",
    bench=True,
    oracle=f"""
        SELECT
          l_returnflag,
          l_linestatus,
          {sql_exact_sum('l_quantity', 2)}                                        AS sum_qty,
          {sql_exact_sum('l_extendedprice', 4)}                                   AS sum_base_price,
          {sql_exact_sum('l_extendedprice * (1 - l_discount)', 6)}                AS sum_disc_price,
          {sql_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 8)}  AS sum_charge,
          {sql_exact_avg('l_quantity', 2)}                                        AS avg_qty,
          {sql_exact_avg('l_extendedprice', 4)}                                   AS avg_price,
          {sql_exact_avg('l_discount', 4)}                                        AS avg_disc,
          count(*)                                                                AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan -> filter -> hash agg -> sort.

    The flagship query (SURVEY §7 minimum slice). Aggregates accumulate in
    exact DECIMAL (see functions.portable) so results are identical at any
    parallelism — the property that also makes them hash-match the oracle.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice"), 4).alias("sum_base_price"),
            exact_sum(disc_price, 6).alias("sum_disc_price"),
            exact_sum(disc_price * (1 + F.col("l_tax")), 8).alias("sum_charge"),
            exact_avg(F.col("l_quantity"), 2).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice"), 4).alias("avg_price"),
            exact_avg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "scan_projection_pushdown",
    family="relational",
    oracle="""
        SELECT l_orderkey, l_extendedprice
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow projection + pushed filter. At 100 TB this is the difference
    between reading 2 columns' pages and reading the whole table: the plan
    must show ReadSchema with exactly these columns and the shipdate range
    in PushedFilters."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice")
    )


@query(
    "filter_predicates",
    family="relational",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_orderstatus IN ('F', 'O')
          AND o_totalprice BETWEEN 1000 AND 200000
          AND o_orderpriority LIKE '%URGENT'
          AND o_custkey IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate suite: IN, BETWEEN, LIKE, null checks — compiled to one
    conjunctive filter Catalyst pushes to the scan."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderpriority").like("%URGENT")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "project_computed_columns",
    family="relational",
    oracle="""
        SELECT
          l_orderkey,
          l_linenumber,
          l_extendedprice * (1 - l_discount) AS net_price,
          l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
          CASE WHEN l_discount >= 0.05 THEN 'deep' ELSE 'shallow' END AS discount_band
        FROM lineitem
        WHERE l_linenumber <= 2
    """,
)
def project_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed/renamed columns + CASE WHEN; pure narrow transformation,
    whole-stage-codegen'd, zero shuffle. Raw double arithmetic is emitted
    un-rounded: the same IEEE ops run in both engines, so values are
    bitwise identical (rounding would *introduce* engine divergence)."""
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
        F.when(F.col("l_discount") >= 0.05, F.lit("deep"))
        .otherwise(F.lit("shallow"))
        .alias("discount_band"),
    )


@query(
    "null_safe_equality",
    family="relational",
    oracle="""
        SELECT
          count(*) AS n_rows,
          count(CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'P' THEN 1 END) AS n_pending
        FROM orders
    """,
)
def null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_orderstatus").eqNullSafe("P"), F.lit(1))).alias(
            "n_pending"
        ),
    )


@query(
    "sink_partitioned_roundtrip",
    family="sinks",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               {sql_exact_sum('l_quantity', 2)} AS sum_qty
        FROM lineitem
        WHERE l_returnflag = 'R'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet SINK proven by read-back: write lineitem
    partitioned by ``l_returnflag`` to a scratch dir, re-scan it, and
    aggregate one partition. The oracle computes the same aggregate from the
    ORIGINAL table, so a sink that dropped/duplicated rows, mangled the
    partition column, or broke types fails the hash-compare. The read-back
    filter also exercises partition pruning (only the ``l_returnflag=R``
    directory is scanned).

    Scale notes: partitionBy on a low-cardinality column gives
    partition-prunable layout at any size; the write itself is
    embarrassingly parallel (no shuffle — each task writes its own files
    into per-value directories). The scratch path is deterministic per sf
    so ``mode("overwrite")`` reuses it across driver/bench re-runs instead
    of leaking a fresh lineitem copy per invocation (ADVICE r02); the pid
    suffix keeps two processes (e.g. pytest + a driver sim) from racing
    each other's overwrite of the same directory — Spark's file committer
    is not safe against a concurrent overwrite of the same path."""
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(),
        f"bfs_sink_roundtrip_{os.getpid()}",
        os.path.basename(sf_dir.rstrip("/")),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "cdc_latest_per_key",
    family="etl",
    oracle="""
        SELECT user_id, event_id, ts, event_type, value
        FROM (
          SELECT user_id, event_id, ts, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        )
        WHERE rn = 1
        ORDER BY user_id
    """,
)
def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC / MERGE compaction: collapse a change stream to the latest record
    per key — the batch primitive behind ``MERGE INTO`` upserts (the
    reference's Snowflake loads rely on warehouse-side MERGE; reference
    surface: the ``INSERT``/load path of ``dags/dev_db_test.py:41-70``).

    Scale notes: one shuffle on the key, in-partition sort, row_number —
    identical shape to streaming ``dropDuplicates`` compaction. Ties broken
    by (ts, event_id) so the survivor is total-order deterministic."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select(
            "user_id", "event_id", "ts", "event_type", "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


@query(
    "scd2_intervals",
    family="etl",
    oracle="""
        SELECT user_id,
               event_type,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_current
        FROM events
        WHERE event_type IN ('purchase', 'signup')
        ORDER BY user_id, valid_from, event_type
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: turn a change log into half-open
    ``[valid_from, valid_to)`` validity intervals per key with ``lead()``,
    the standard slowly-changing-dimension pattern warehouse ETL (the
    reference's domain) implements with MERGE + window functions.

    Scale notes: single shuffle on the key, one in-partition sort shared by
    both ``lead`` calls (same window spec), no self-join — the naive
    formulation joins the table to itself on "next change", which is twice
    the shuffle for the same answer."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    ).orderBy("user_id", "valid_from", "event_type")
