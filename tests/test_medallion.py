"""Medallion-layer end-to-end: the reference encodes prestg_ -> stg -> core
layering as a naming convention over tables (SURVEY §1.4 —
``prestg_product_order_trans``, ``dev_db`` scratch schema). This test wires
the full flow as ONE pipeline: CSV ingest (prestg, raw append-only) ->
typed/cleaned CTAS (stg) -> aggregated mart (core), with the layer handoffs
expressed as ordinary task dependencies."""

from __future__ import annotations

from datetime import date, datetime

import pytest

from bfs_etl_sep2025_spark.plans import Pipeline, SqlTask
from bfs_etl_sep2025_spark.sources import CsvCopyTask

FROZEN = datetime(2022, 7, 20, 12, 0)


@pytest.fixture(scope="module")
def medallion(spark, tmp_path_factory):
    stage = tmp_path_factory.mktemp("stage")
    for day, rows in [("07132022", 4), ("07142022", 6)]:
        body = ["trans_id,product_id,quantity,unit_price,trans_ts"]
        for i in range(rows):
            body.append(
                f"{int(day[:4]) * 10 + i},{i % 3 + 1},{i + 1},{(10 + i) / 2},"
                f"2022-{day[:2]}-{day[2:4]}T0{i}:00:00"
            )
        (stage / f"product_order_trans_{day}.csv").write_text("\n".join(body) + "\n")

    spark.sql("CREATE DATABASE IF NOT EXISTS med")
    spark.sql("DROP TABLE IF EXISTS med.prestg_product_order_trans")
    spark.sql("DROP TABLE IF EXISTS med.stg_product_order")
    spark.sql("DROP TABLE IF EXISTS med.core_daily_product_sales")
    spark.sql(
        """CREATE TABLE med.prestg_product_order_trans (
             trans_id BIGINT, product_id BIGINT, quantity INT,
             unit_price DOUBLE, trans_ts TIMESTAMP_NTZ,
             load_utc_ts TIMESTAMP_NTZ) USING parquet"""
    )

    with Pipeline(
        "medallion_flow",
        schedule="0 7 * * *",
        start_date=date(2022, 7, 13),
        end_date=datetime(2022, 7, 14, 23, 59),
        catchup=True,
        clock=lambda: FROZEN,
    ) as p:
        ingest = CsvCopyTask(
            "prestg_ingest",
            table="prestg_product_order_trans",
            schema="med",
            stage_path=str(stage),
            files=["product_order_trans_{{ ds[5:7] + ds[8:10] + ds[0:4] }}.csv"],
            file_format={"type": "CSV", "skip_header": 1},
            ledger_path=str(tmp_path_factory.mktemp("ledger") / "l"),
        )
        stg = SqlTask(
            "stg_clean",
            schema="med",
            sql=[
                "DROP TABLE IF EXISTS stg_product_order",
                """CREATE TABLE stg_product_order USING parquet AS
                   SELECT trans_id, product_id, quantity,
                          CAST(quantity * unit_price AS DOUBLE) AS amount,
                          CAST(trans_ts AS DATE) AS trans_date
                   FROM prestg_product_order_trans
                   WHERE quantity > 0""",
            ],
        )
        core = SqlTask(
            "core_aggregate",
            schema="med",
            sql=[
                "DROP TABLE IF EXISTS core_daily_product_sales",
                """CREATE TABLE core_daily_product_sales USING parquet AS
                   SELECT trans_date, product_id,
                          count(*) AS n_orders,
                          CAST(sum(CAST(amount AS DECIMAL(30,4))) AS DOUBLE)
                            AS revenue
                   FROM stg_product_order
                   GROUP BY trans_date, product_id""",
            ],
        )
        ingest >> stg >> core
    p.backfill(spark)
    return p


def test_prestg_raw_rows(spark, medallion):
    assert spark.table("med.prestg_product_order_trans").count() == 10


def test_stg_typed_and_derived(spark, medallion):
    stg = spark.table("med.stg_product_order")
    assert stg.count() == 10
    assert dict(stg.dtypes)["amount"] == "double"
    assert dict(stg.dtypes)["trans_date"] == "date"


def test_core_aggregates_reconcile(spark, medallion):
    from pyspark.sql import functions as F

    core = spark.table("med.core_daily_product_sales")
    total_core = core.agg(F.sum("n_orders")).collect()[0][0]
    assert total_core == 10
    # revenue reconciles with the staging layer exactly
    stg_rev = (
        spark.table("med.stg_product_order")
        .agg(F.sum(F.col("amount").cast("decimal(30,4)")).cast("double"))
        .collect()[0][0]
    )
    core_rev = core.agg(
        F.sum(F.col("revenue").cast("decimal(30,4)")).cast("double")
    ).collect()[0][0]
    assert stg_rev == core_rev


def test_layering_is_dependency_ordered(medallion):
    t = medallion.tasks
    assert t["stg_clean"].upstream == {"prestg_ingest"}
    assert t["core_aggregate"].upstream == {"stg_clean"}
