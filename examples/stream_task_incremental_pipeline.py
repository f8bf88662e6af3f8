"""Incremental-load DAG exercising Snowflake STREAMS + TASKS through the
dialect shim end-to-end — the canonical warehouse pattern a reference
user runs through the arbitrary-SQL chokepoint
(``/root/reference/dags/dev_db_test.py:41-70``):

    bootstrap >> wire >> land_batch1 >> fire >> land_batch2 >> fire2 >> verify

- **bootstrap**: create a ``VersionedTable`` order feed and register it
  (``register_versioned_table``) so change tracking exists.
- **wire**: PLAIN SNOWFLAKE SQL through ``SqlTask``: a change stream on
  the feed, a target table, and a WHEN-gated TASK whose body consumes
  the stream with MERGE-shaped SQL — created suspended, then RESUMEd,
  exactly the statement sequence a migrating Snowflake shop ships.
- **land / fire**: each landing appends a batch to the feed; each fire
  issues ``EXECUTE TASK`` — the gate (``SYSTEM$STREAM_HAS_DATA``) opens
  only when the stream holds unconsumed changes, the body moves exactly
  the delta, and consumption advances the stream offset.
- **verify**: the target equals the full feed (every batch landed exactly
  once), a third EXECUTE was a gated no-op, and the stream is drained.

Stages share state only through the versioned table, the stream/task
registries, and the session catalog — the reference's Airflow discipline
with Snowflake's in-warehouse orchestration objects riding inside it.
"""

import datetime
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

from bfs_etl_sep2025_spark.plans import Pipeline, PythonTask, SqlTask, chain
from bfs_etl_sep2025_spark.plans.snowtasks import execute_task, task_def
from bfs_etl_sep2025_spark.plans.streams import stream_offset
from bfs_etl_sep2025_spark.plans.versioned import (
    VersionedTable,
    register_versioned_table,
)

PIPELINE_ID = "stream_task_incremental_pipeline"

WIRE_SQL = [
    "CREATE OR REPLACE TABLE orders_landed "
    "(id INT, amount DOUBLE) USING PARQUET",
    "CREATE STREAM orders_delta ON TABLE orders_feed",
    "CREATE TASK load_orders "
    "  SCHEDULE = '15 MINUTE' "
    "  WHEN SYSTEM$STREAM_HAS_DATA('orders_delta') "
    "  AS INSERT INTO orders_landed "
    "     SELECT id, amount FROM orders_delta "
    "     WHERE METADATA$ACTION = 'INSERT'",
    "ALTER TASK load_orders RESUME",
]


def bootstrap_fn(spark, table_root=None, **_):
    vt = VersionedTable(spark, table_root)
    vt.create(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "id INT, amount DOUBLE"
        )
    )
    register_versioned_table("orders_feed", table_root)
    return {"version": vt.current_version()}


def land_fn(spark, table_root=None, rows=(), **_):
    vt = VersionedTable(spark, table_root)
    v = vt.append(
        spark.createDataFrame(list(rows), "id INT, amount DOUBLE")
    )
    return {"version": v}


def fire_fn(spark, **_):
    ran = execute_task(spark, "load_orders")
    return {"ran": ran, "offset": stream_offset("orders_delta")}


def verify_fn(spark, table_root=None, **_):
    landed = sorted(
        (r.id, r.amount) for r in spark.table("orders_landed").collect()
    )
    # the stream was created AFTER bootstrap, so only batches 1+2 land
    expect = [(3, 30.0), (4, 40.0), (5, 50.0)]
    if landed != expect:
        raise AssertionError(f"landed mismatch: {landed} != {expect}")
    # drained: a third manual fire is a WHEN-gated no-op
    ran = execute_task(spark, "load_orders")
    if ran:
        raise AssertionError(f"drained stream still fired: {ran}")
    runs = task_def("load_orders").runs
    fired = [r for r in runs if r]
    if len(fired) != 2:
        raise AssertionError(f"want exactly 2 real runs, got {runs}")
    return {"landed_rows": len(landed), "task_runs": runs}


def build(table_root: str):
    with Pipeline(
        pipeline_id=PIPELINE_ID,
        schedule="0 6 * * *",
        start_date=datetime.datetime(2025, 7, 1),
        catchup=False,
        tags=["warehouse", "streams", "tasks"],
    ) as dag:
        bootstrap = PythonTask(
            "bootstrap", bootstrap_fn, table_root=table_root
        )
        wire = SqlTask("wire", sql=WIRE_SQL)
        land1 = PythonTask(
            "land_batch1", land_fn, table_root=table_root, rows=[(3, 30.0)]
        )
        fire1 = PythonTask("fire", fire_fn)
        land2 = PythonTask(
            "land_batch2",
            land_fn,
            table_root=table_root,
            rows=[(4, 40.0), (5, 50.0)],
        )
        fire2 = PythonTask("fire2", fire_fn)
        verify = PythonTask("verify", verify_fn, table_root=table_root)
        chain(bootstrap, wire, land1, fire1, land2, fire2, verify)
    return dag, (bootstrap, wire, land1, fire1, land2, fire2, verify)


dag, tasks = build(
    str(pathlib.Path(tempfile.gettempdir()) / "stream_task_feed_tbl")
)


if __name__ == "__main__":
    from bfs_etl_sep2025_spark.session import build_spark

    dag.run(build_spark())
    print(f"ran {dag.pipeline_id}: verify -> {tasks[-1].last_result}")
