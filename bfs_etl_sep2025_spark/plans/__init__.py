"""Orchestration layer — the Spark-native rebuild of the reference's Airflow
DAG surface (``dags/*.py``): Pipeline/Task DAGs, cron schedules with catchup
backfill, logical-date templating, SQL tasks and bulk CSV ingestion."""

from bfs_etl_sep2025_spark.plans.pipeline import Pipeline, chain
from bfs_etl_sep2025_spark.plans.tasks import (
    BashTask,
    EmptyTask,
    PythonTask,
    RunContext,
    SqlTask,
    Task,
)

__all__ = [
    "BashTask",
    "EmptyTask",
    "Pipeline",
    "PythonTask",
    "RunContext",
    "SqlTask",
    "Task",
    "chain",
]
