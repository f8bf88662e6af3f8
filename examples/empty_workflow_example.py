"""Port of /root/reference/dags/empty_workflow_example.py — three no-op
tasks in a line, daily schedule. Only the imports change; DAG shape, ids,
schedule and wiring are verbatim."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

import datetime

from bfs_etl_sep2025_spark.plans import EmptyTask, Pipeline

with Pipeline(
    pipeline_id="basic_three_empty_tasks",
    start_date=datetime.datetime(2025, 7, 1),
    schedule="@daily",
    catchup=False,
    tags=["demo", "basic"],
) as dag:
    task_a = EmptyTask(task_id="task_a")
    task_b = EmptyTask(task_id="task_b")
    task_c = EmptyTask(task_id="task_c")

    task_a >> task_b >> task_c


if __name__ == "__main__":
    from bfs_etl_sep2025_spark.session import build_spark

    dag.run(build_spark())
    print(f"ran {dag.pipeline_id}: tasks {list(dag.tasks)}")
