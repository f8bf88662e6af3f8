"""Pipeline DAG topology + execution semantics (reference-DAG shapes)."""

from __future__ import annotations

import threading
import time
from datetime import date, datetime

import pytest

from bfs_etl_sep2025_spark.plans import EmptyTask, Pipeline, Task, chain


class ProbeTask(Task):
    """Records execution order/time for topology assertions."""

    log: list[str] = []
    lock = threading.Lock()

    def __init__(self, task_id, pipeline=None, sleep=0.0, **kw):
        super().__init__(task_id, pipeline=pipeline, **kw)
        self.sleep = sleep

    def execute(self, ctx):
        if self.sleep:
            time.sleep(self.sleep)
        with ProbeTask.lock:
            ProbeTask.log.append(self.task_id)


@pytest.fixture(autouse=True)
def _clear_log():
    ProbeTask.log = []


def test_linear_chain_order(spark):
    """3-task linear DAG — empty_workflow_example.py:16 shape."""
    with Pipeline("empty_workflow_example", schedule="@daily") as p:
        a, b, c = ProbeTask("first"), ProbeTask("second"), ProbeTask("third")
        a >> b >> c
    p.run(spark, run_date=date(2024, 1, 1))
    assert ProbeTask.log == ["first", "second", "third"]


def test_diamond_chain(spark):
    """start -> [a, b] -> merge -> end — complex_example.py:21 shape."""
    with Pipeline("example_complex_demo", schedule=None) as p:
        start, a, b = ProbeTask("start"), ProbeTask("branch_a"), ProbeTask("branch_b")
        merge, end = ProbeTask("merge"), ProbeTask("end")
        chain(start, [a, b], merge, end)
    p.run(spark, parallelism=4)
    order = {t: i for i, t in enumerate(ProbeTask.log)}
    assert order["start"] < order["branch_a"]
    assert order["start"] < order["branch_b"]
    assert order["branch_a"] < order["merge"] > order["branch_b"]
    assert order["merge"] < order["end"]


def test_fanout_shape(spark):
    """1 -> 4 fan-out — dev_db_test.py:74-83 shape."""
    with Pipeline("dev_db_test_shape") as p:
        root = ProbeTask("create")
        leaves = [ProbeTask(f"leaf{i}") for i in range(4)]
        root >> leaves
    p.run(spark, parallelism=4)
    assert ProbeTask.log[0] == "create"
    assert set(ProbeTask.log[1:]) == {f"leaf{i}" for i in range(4)}


def test_parallelism_overlaps(spark):
    """Independent branches actually overlap on the pool."""
    with Pipeline("overlap") as p:
        slow = [ProbeTask(f"s{i}", sleep=0.3) for i in range(4)]
    t0 = time.monotonic()
    p.run(spark, parallelism=4)
    assert time.monotonic() - t0 < 0.3 * 4  # not serialized


def test_cycle_detection(spark):
    with Pipeline("cyclic") as p:
        a, b = ProbeTask("a"), ProbeTask("b")
        a >> b
        b >> a
    with pytest.raises(ValueError, match="cycle"):
        p.run(spark)


def test_duplicate_task_id():
    with Pipeline("dup") as p:
        EmptyTask("x")
        with pytest.raises(ValueError, match="duplicate"):
            EmptyTask("x")


def test_backfill_ticks(spark):
    """catchup over the reference window -> 4 runs, logical dates rendered
    into each run's context."""
    seen: list[str] = []

    class DsTask(Task):
        def execute(self, ctx):
            seen.append(ctx.template_context["ds"])

    with Pipeline(
        "bf",
        schedule="0 7 * * *",
        start_date=date(2022, 7, 13),
        end_date=datetime(2022, 7, 16, 23, 59),
        catchup=True,
    ) as p:
        DsTask("t")
    ran = p.backfill(spark)
    assert [d.date().isoformat() for d in ran] == seen
    assert seen == ["2022-07-13", "2022-07-14", "2022-07-15", "2022-07-16"]


def test_task_failure_stops_run_before_downstream(spark):
    """A failing task aborts the run; its downstream never executes (the
    reference's Airflow semantics for un-retried failures)."""

    class BoomTask(Task):
        def execute(self, ctx):
            raise RuntimeError("boom")

    with Pipeline("failing") as p:
        a = ProbeTask("pre")
        boom = BoomTask("boom")
        after = ProbeTask("after")
        a >> boom >> after
    with pytest.raises(RuntimeError, match="boom"):
        p.run(spark)
    assert ProbeTask.log == ["pre"]  # 'after' never ran


def test_task_failure_in_parallel_pool(spark):
    class BoomTask(Task):
        def execute(self, ctx):
            raise RuntimeError("parallel boom")

    with Pipeline("failing_parallel") as p:
        a = ProbeTask("pre2")
        boom = BoomTask("boom2")
        after = ProbeTask("after2")
        a >> [boom]
        boom >> after
    with pytest.raises(RuntimeError, match="parallel boom"):
        p.run(spark, parallelism=4)
    assert "after2" not in ProbeTask.log


def test_defaults_merge(spark):
    """default_args propagate to tasks, task params win."""
    got = {}

    class PTask(Task):
        def execute(self, ctx):
            got.update(self.merged_params(ctx))

    with Pipeline("defaults", defaults={"conn_id": "spark_local", "retries": 1}) as p:
        PTask("t", retries=5)
    p.run(spark)
    assert got == {"conn_id": "spark_local", "retries": 5}
