"""Price-audit DAG exercising Snowflake TIME TRAVEL through the dialect
shim end-to-end — the reference-user workflow the r7 AT/BEFORE wiring
exists for (arbitrary-SQL chokepoint,
``/root/reference/dags/dev_db_test.py:41-70``):

    load >> revise >> audit >> freeze >> verify

- **load**: create a ``VersionedTable`` price list (v1) and register it
  for SQL time travel (``register_versioned_table``).
- **revise**: business-as-usual mutations — an upsert (v2: one price
  change + one new SKU) and a delist delete (v3).
- **audit**: PLAIN SNOWFLAKE SQL through ``SqlTask``: diff the current
  state against the pre-revision snapshot with
  ``prices_v AT(OFFSET => 0)`` full-outer-joined to
  ``prices_v BEFORE(STATEMENT => 2)`` — added / removed / changed rows,
  the classic what-did-the-batch-do audit every warehouse shop writes.
- **freeze**: ``CREATE OR REPLACE TABLE ... CLONE prices_v
  AT(VERSION => 1)`` — a time-travel clone materializing the original
  price list as an ordinary catalog table.
- **verify**: assert the audit and the frozen clone agree with the
  manifest history (version_at/ts_us are the resolution machinery).

Stages share state only through the versioned table and the session
catalog, mirroring the reference's Airflow discipline.
"""

import datetime
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

from bfs_etl_sep2025_spark.plans import Pipeline, PythonTask, SqlTask, chain
from bfs_etl_sep2025_spark.plans.versioned import (
    VersionedTable,
    register_versioned_table,
)

PIPELINE_ID = "timetravel_audit_pipeline"

AUDIT_SQL = """
CREATE OR REPLACE TEMPORARY VIEW price_audit AS
SELECT coalesce(cur.id, old.id) AS id,
       old.price AS old_price,
       cur.price AS new_price,
       CASE WHEN old.id IS NULL THEN 'added'
            WHEN cur.id IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type
FROM prices_v AT(OFFSET => 0) AS cur
FULL OUTER JOIN prices_v BEFORE(STATEMENT => 2) AS old ON old.id = cur.id
WHERE old.id IS NULL OR cur.id IS NULL OR old.price <> cur.price
"""

FREEZE_SQL = (
    "CREATE OR REPLACE TABLE prices_frozen_v1 "
    "CLONE prices_v AT(VERSION => 1)"
)


def load_fn(spark, table_root=None, **_):
    vt = VersionedTable(spark, table_root)
    v = vt.create(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id INT, price DOUBLE"
        )
    )
    register_versioned_table("prices_v", table_root)
    return {"version": v}


def revise_fn(spark, table_root=None, **_):
    vt = VersionedTable(spark, table_root)
    v2 = vt.upsert(
        spark.createDataFrame(
            [(2, 25.0), (4, 40.0)], "id INT, price DOUBLE"
        ),
        keys=["id"],
    )
    v3 = vt.delete_where("id = 3")  # delisted SKU
    return {"upsert_version": v2, "delete_version": v3}


def verify_fn(spark, table_root=None, **_):
    audit = {
        r["id"]: (r["old_price"], r["new_price"], r["change_type"])
        for r in spark.table("price_audit").collect()
    }
    expect = {
        2: (20.0, 25.0, "changed"),
        3: (30.0, None, "removed"),
        4: (None, 40.0, "added"),
    }
    if audit != expect:
        raise AssertionError(f"audit mismatch: {audit} != {expect}")
    frozen = spark.table("prices_frozen_v1").count()
    hist = [h["op"] for h in VersionedTable(spark, table_root).history()]
    if frozen != 3:
        raise AssertionError(f"frozen clone has {frozen} rows, want 3")
    return {"audit_rows": len(audit), "frozen_rows": frozen, "ops": hist}


def build(table_root: str):
    with Pipeline(
        pipeline_id=PIPELINE_ID,
        schedule="0 5 * * *",
        start_date=datetime.datetime(2025, 7, 1),
        catchup=False,
        tags=["warehouse", "time-travel"],
    ) as dag:
        load = PythonTask("load", load_fn, table_root=table_root)
        revise = PythonTask("revise", revise_fn, table_root=table_root)
        audit = SqlTask("audit", sql=AUDIT_SQL)
        freeze = SqlTask("freeze", sql=FREEZE_SQL)
        verify = PythonTask("verify", verify_fn, table_root=table_root)
        chain(load, revise, audit, freeze, verify)
    return dag, (load, revise, audit, freeze, verify)


dag, (load, revise, audit, freeze, verify) = build(
    str(pathlib.Path(tempfile.gettempdir()) / "timetravel_audit_tbl")
)


if __name__ == "__main__":
    from bfs_etl_sep2025_spark.session import build_spark

    dag.run(build_spark())
    print(f"ran {dag.pipeline_id}: verify -> {verify.last_result}")
