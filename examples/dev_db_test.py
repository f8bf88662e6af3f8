"""Port of /root/reference/dags/dev_db_test.py — the five SnowflakeOperator
call shapes against the session catalog. The SQL strings (including the
Snowflake TRANSIENT spelling and pyformat parameters) are verbatim; the
warehouse/role connection context collapses into the Spark session, and
``schema`` selects the working database."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

import os
from datetime import datetime

from bfs_etl_sep2025_spark.plans import Pipeline, SqlTask

SCHEMA = "dev_db"
SAMPLE_TABLE = "airflow_testing"

# SQL commands — verbatim reference shapes (dags/dev_db_test.py:21-26)
CREATE_TABLE_SQL_STRING = (
    f"CREATE OR REPLACE TRANSIENT TABLE {SAMPLE_TABLE} (name VARCHAR(250), id INT);"
)
SQL_INSERT_STATEMENT = f"INSERT INTO {SAMPLE_TABLE} VALUES ('name', %(id)s)"
SQL_LIST = [SQL_INSERT_STATEMENT % {"id": n} for n in range(0, 10)]
SQL_MULTIPLE_STMTS = "; ".join(SQL_LIST)
DAG_ID = "dev_db_test"

with Pipeline(
    pipeline_id=DAG_ID,
    start_date=datetime(2021, 1, 1),
    schedule="30 * * * *",
    defaults={"schema": SCHEMA},
    tags=["dev"],
    catchup=False,
) as dag:
    op_sql_str = SqlTask(
        task_id="snowflake_op_sql_str",
        sql=CREATE_TABLE_SQL_STRING,
        schema=SCHEMA,
    )

    op_with_params = SqlTask(
        task_id="snowflake_op_with_params",
        sql=SQL_INSERT_STATEMENT,
        parameters={"id": 5},
        schema=SCHEMA,
    )

    op_sql_list = SqlTask(
        task_id="snowflake_op_sql_list", sql=SQL_LIST, schema=SCHEMA
    )

    op_sql_multiple_stmts = SqlTask(
        task_id="snowflake_op_sql_multiple_stmts",
        sql=SQL_MULTIPLE_STMTS,
        schema=SCHEMA,
    )

    op_template_file = SqlTask(
        task_id="snowflake_op_template_file",
        sql="./dev_db_test.sql",
        sql_dir=os.path.dirname(os.path.abspath(__file__)),
        schema=SCHEMA,
    )

    (
        op_sql_str
        >> [
            op_with_params,
            op_sql_list,
            op_template_file,
            op_sql_multiple_stmts,
        ]
    )


if __name__ == "__main__":
    from bfs_etl_sep2025_spark.session import build_spark

    spark = build_spark()
    dag.run(spark, parallelism=4)
    n = spark.table(f"{SCHEMA}.{SAMPLE_TABLE}").count()
    print(f"ran {DAG_ID}: {SCHEMA}.{SAMPLE_TABLE} has {n} rows")
