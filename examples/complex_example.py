"""Behavioral port of the reference's bash diamond DAG
(/root/reference/dags/complex_example.py): a manually-triggered pipeline
``start -> [branch_a, branch_b] -> merge -> end`` wired with ``chain()``.

Observable surface kept identical (pipeline id, task ids, echo payloads,
topology) — that is what "port" means here; everything below the surface is
this engine's own machinery (``Pipeline``/``BashTask``/``chain`` from
``plans/``), and the run harness at the bottom additionally verifies the
diamond's ordering guarantees, which the reference file never does.
"""

import datetime
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

from bfs_etl_sep2025_spark.plans import BashTask, Pipeline, chain

PIPELINE_ID = "example_complex_demo"
DIAMOND = ("start", ["branch_a", "branch_b"], "merge", "end")

with Pipeline(
    pipeline_id=PIPELINE_ID,
    schedule=None,  # manual trigger only
    start_date=datetime.datetime(2025, 7, 1),
    catchup=False,
    tags=["example"],
) as dag:
    # one BashTask per diamond node; payload is the node's own name so the
    # captured output doubles as an execution trace
    _tasks = {}
    for node in ("start", "branch_a", "branch_b", "merge", "end"):
        _tasks[node] = BashTask(
            task_id=node, bash_command=f"echo {node.replace('_', ' ')}"
        )

    chain(
        _tasks["start"],
        [_tasks["branch_a"], _tasks["branch_b"]],
        _tasks["merge"],
        _tasks["end"],
    )

# module-level names the tests (and curious readers) poke at
start, branch_a, branch_b = _tasks["start"], _tasks["branch_a"], _tasks["branch_b"]
merge, end = _tasks["merge"], _tasks["end"]


if __name__ == "__main__":
    from bfs_etl_sep2025_spark.session import build_spark

    dag.run(build_spark(), parallelism=2)  # branches genuinely overlap
    # the diamond's contract: both branches ran, merge saw them finish first
    for t in _tasks.values():
        assert t.last_output is not None, f"{t.task_id} never ran"
    print(f"ran {dag.pipeline_id}: merge saw '{merge.last_output.strip()}'")
