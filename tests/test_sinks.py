"""Sink/DDL surface (SURVEY §2.3 'sinks'): managed-table append/overwrite,
partitioned parquet with pruning, bucketed tables for shuffle-free joins,
CTAS / INSERT OVERWRITE via the SqlTask path, temp-view lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.plans import Pipeline, SqlTask
from bfs_etl_sep2025_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def sink_db(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS sink_test")
    yield
    spark.sql("DROP DATABASE IF EXISTS sink_test CASCADE")


def test_save_as_table_append_overwrite(spark):
    n = load(spark, SF, "nation")
    n.write.mode("overwrite").saveAsTable("sink_test.nations")
    assert spark.table("sink_test.nations").count() == 25
    n.write.mode("append").saveAsTable("sink_test.nations")
    assert spark.table("sink_test.nations").count() == 50
    n.limit(5).write.mode("overwrite").saveAsTable("sink_test.nations")
    assert spark.table("sink_test.nations").count() == 5


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    out = str(tmp_path / "orders_part")
    (
        load(spark, SF, "orders")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the status predicate must become a PartitionFilter (pruned directories),
    # not a post-scan data filter
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_orderstatus" in pf_line
    full = spark.read.parquet(out)
    assert df.count() == full.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_avoids_exchange(spark):
    """Bucketed tables co-locate join keys at write time: the join plan
    must contain NO Exchange on the bucketed sides — the 100 TB payoff of
    paying the shuffle once at ingest."""
    load(spark, SF, "orders").write.mode("overwrite").bucketBy(
        8, "o_custkey"
    ).sortBy("o_custkey").saveAsTable("sink_test.orders_bkt")
    load(spark, SF, "customer").write.mode("overwrite").bucketBy(
        8, "c_custkey"
    ).sortBy("c_custkey").saveAsTable("sink_test.customer_bkt")
    o = spark.table("sink_test.orders_bkt")
    c = spark.table("sink_test.customer_bkt")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Exchange" not in plan, "bucketed join must not re-shuffle"
        assert joined.count() == 1500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_ctas_and_insert_overwrite_via_sqltask(spark):
    load(spark, SF, "region").createOrReplaceTempView("region_src")
    p = Pipeline("ddl")
    t = SqlTask(
        "ctas",
        sql=[
            "CREATE TABLE sink_test.region_copy USING parquet "
            "AS SELECT * FROM region_src",
            "INSERT OVERWRITE TABLE sink_test.region_copy "
            "SELECT * FROM region_src WHERE r_regionkey < 2",
        ],
        pipeline=p,
    )
    p.run(spark)
    assert spark.table("sink_test.region_copy").count() == 2
    assert t.executed[-1].startswith("INSERT OVERWRITE")


def test_temp_view_lifecycle(spark):
    load(spark, SF, "part").createOrReplaceTempView("part_tmp")
    assert spark.sql("SELECT count(*) AS n FROM part_tmp").collect()[0].n == 200
    spark.catalog.dropTempView("part_tmp")
    with pytest.raises(Exception):
        spark.sql("SELECT 1 FROM part_tmp").collect()


def test_write_sorted_output(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions: globally range-sorted
    output files (the layout that gives downstream readers min/max-pruning
    on the sort key)."""
    out = str(tmp_path / "li_sorted")
    (
        load(spark, SF, "lineitem")
        .repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == 6000