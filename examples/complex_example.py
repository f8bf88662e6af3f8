"""Port of /root/reference/dags/complex_example.py — a manually-triggered
bash diamond (start -> [branch_a, branch_b] -> merge -> end) using chain()."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

import datetime

from bfs_etl_sep2025_spark.plans import BashTask, Pipeline, chain

with Pipeline(
    pipeline_id="example_complex_demo",
    schedule=None,
    start_date=datetime.datetime(2025, 7, 1),
    catchup=False,
    tags=["example"],
) as dag:
    start = BashTask(task_id="start", bash_command="echo start")
    branch_a = BashTask(task_id="branch_a", bash_command="echo branch A")
    branch_b = BashTask(task_id="branch_b", bash_command="echo branch B")
    merge = BashTask(task_id="merge", bash_command="echo merge")
    end = BashTask(task_id="end", bash_command="echo end")

    chain(start, [branch_a, branch_b], merge, end)


if __name__ == "__main__":
    from bfs_etl_sep2025_spark.session import build_spark

    dag.run(build_spark(), parallelism=2)  # branches genuinely overlap
    print(f"ran {dag.pipeline_id}: merge saw '{merge.last_output.strip()}'")
