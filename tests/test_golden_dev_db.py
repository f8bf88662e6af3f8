"""Golden end-to-end clone of the reference's ``dev_db_test`` DAG
(/root/reference/dags/dev_db_test.py): one create + four SnowflakeOperator
call shapes (parameterized, list, multi-statement, templated .sql file),
fan-out 1->4, executed against the Spark catalog with a deterministic clock.
"""

from __future__ import annotations

from datetime import date, datetime

import pytest

from bfs_etl_sep2025_spark.plans import Pipeline, SqlTask

# Reference SQL shapes (dags/dev_db_test.py:21-26), reference's table names.
SQL_CREATE = (
    "CREATE OR REPLACE TRANSIENT TABLE airflow_testing (name VARCHAR(250), id INT)"
)
SQL_INSERT_PARAM = "INSERT INTO airflow_testing VALUES ('name', %(id)s)"
SQL_LIST = [
    f"INSERT INTO airflow_testing VALUES ('name', {i})" for i in range(10)
]
SQL_MULTI = "; ".join(SQL_LIST)

# dags/dev_db_test.sql:1-3, verbatim shape
SQL_FILE_BODY = """\
CREATE OR REPLACE TRANSIENT TABLE dev_test (name VARCHAR(250), id INT, load_utc_ts datetime);

INSERT INTO dev_test VALUES ('name', 5, sysdate());
"""

FROZEN = datetime(2024, 3, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def ran_pipeline(spark, tmp_path_factory):
    sql_dir = tmp_path_factory.mktemp("sql")
    (sql_dir / "dev_db_test.sql").write_text(SQL_FILE_BODY)

    with Pipeline(
        "dev_db_test_clone",
        schedule="30 * * * *",  # reference: dags/dev_db_test.py:34
        start_date=date(2024, 3, 1),
        clock=lambda: FROZEN,
        defaults={"schema": "dev_db"},
    ) as p:
        create = SqlTask("create_table", sql=SQL_CREATE, schema="dev_db")
        t_param = SqlTask(
            "insert_param",
            sql=SQL_INSERT_PARAM,
            parameters={"id": 56},
            schema="dev_db",
        )
        t_list = SqlTask("insert_list", sql=SQL_LIST, schema="dev_db")
        t_multi = SqlTask("insert_multi", sql=SQL_MULTI, schema="dev_db")
        t_file = SqlTask(
            "sql_from_file",
            sql="./dev_db_test.sql",
            sql_dir=sql_dir,
            schema="dev_db",
        )
        create >> [t_param, t_list, t_multi, t_file]  # dags/dev_db_test.py:74-83

    p.run(spark, run_date=datetime(2024, 3, 1, 0, 30))
    return p


def test_row_counts(spark, ran_pipeline):
    """1 param insert + 10 list + 10 multi = 21 rows."""
    assert spark.table("dev_db.airflow_testing").count() == 21


def test_param_binding(spark, ran_pipeline):
    ids = {r.id for r in spark.table("dev_db.airflow_testing").collect()}
    assert 56 in ids
    assert set(range(10)) <= ids


def test_sql_file_with_injected_clock(spark, ran_pipeline):
    rows = spark.table("dev_db.dev_test").collect()
    assert len(rows) == 1
    assert rows[0].name == "name" and rows[0].id == 5
    # sysdate() rendered through the injectable clock -> deterministic audit ts
    assert rows[0].load_utc_ts == FROZEN


def test_create_or_replace_is_idempotent(spark, ran_pipeline):
    """Re-running the create task replaces the table (reference relies on
    CREATE OR REPLACE for idempotence — dags/dev_db_test.py:22)."""
    p = ran_pipeline
    before = spark.table("dev_db.airflow_testing").count()
    assert before == 21
    ctx = p.run.__wrapped__ if hasattr(p.run, "__wrapped__") else None  # noqa: F841
    # run only the create task again
    single = Pipeline("recreate", clock=lambda: FROZEN)
    SqlTask("create_table", sql=SQL_CREATE, schema="dev_db", pipeline=single)
    single.run(spark)
    assert spark.table("dev_db.airflow_testing").count() == 0


def test_transient_ddl_translation(spark):
    """The Snowflake DDL spellings actually executed (dialect shim)."""
    p = Pipeline("shim", clock=lambda: FROZEN)
    t = SqlTask("t", sql=SQL_FILE_BODY, schema="dev_db", pipeline=p)
    p.run(spark)
    assert t.executed[0] == "DROP TABLE IF EXISTS dev_test"
    assert "CREATE TABLE dev_test" in t.executed[1]
    assert "TIMESTAMP_NTZ" in t.executed[1]
    assert "TIMESTAMP '2024-03-01 12:00:00'" in t.executed[2]
