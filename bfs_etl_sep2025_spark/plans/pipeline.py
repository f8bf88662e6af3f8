"""Pipeline: a DAG of tasks with a schedule — the reference's ``DAG(...)``
container rebuilt natively.

Reference semantics reproduced (file:line into /root/reference/):
- ``with DAG(...)`` context-manager task registration — all four DAG files
  (``dags/empty_workflow_example.py:5-11``, ``dags/complex_example.py:8-14``,
  ``dags/dev_db_test.py:31-38``, ``dags/s3_data_copy_test.py:22-30``).
- ``>>`` dependency edges and 1->N fan-out (``dags/empty_workflow_example.py:16``,
  ``dags/dev_db_test.py:74-83``).
- ``chain(start, [a, b], merge, end)`` diamond sugar
  (``dags/complex_example.py:4,21``).
- ``default_args`` merged into every task (``dags/dev_db_test.py:35-38``,
  ``dags/s3_data_copy_test.py:27``).
- cron / ``@daily`` / ``None``-manual schedules (A12) and
  ``catchup=True`` backfill over ``[start_date, end_date]``
  (``dags/s3_data_copy_test.py:24-29``).

Execution is caller-driven (``run`` / ``backfill``), not a daemon: the
engine's unit of work is a *logical date*, same as the reference's. Within a
run, tasks execute in topological order; independent tasks can run on a
thread pool (the only concurrency the orchestration layer itself owns —
inside a task, Spark parallelizes the data plane).
"""

from __future__ import annotations

import threading
from collections.abc import Callable, Sequence
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from datetime import date, datetime, timezone
from typing import TYPE_CHECKING, Any

from bfs_etl_sep2025_spark.plans.cron import CronSchedule
from bfs_etl_sep2025_spark.plans.tasks import RunContext, Task

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


def _to_dt(d: date | datetime | None) -> datetime | None:
    if d is None or isinstance(d, datetime):
        return d
    return datetime(d.year, d.month, d.day)


class Pipeline:
    """A named DAG of tasks plus its schedule metadata."""

    _active: list[Pipeline] = []  # context-manager stack (import-time registration)
    _lock = threading.Lock()

    def __init__(
        self,
        pipeline_id: str,
        schedule: str | None = None,
        start_date: date | datetime | None = None,
        end_date: date | datetime | None = None,
        catchup: bool = False,
        tags: Sequence[str] = (),
        defaults: dict[str, Any] | None = None,
        clock: Callable[[], datetime] | None = None,
    ) -> None:
        self.pipeline_id = pipeline_id
        self.schedule = CronSchedule.parse(schedule) if schedule else None
        self.start_date = _to_dt(start_date)
        self.end_date = _to_dt(end_date)
        self.catchup = catchup
        self.tags = tuple(tags)
        self.defaults = dict(defaults or {})
        #: injectable clock (SURVEY §5.4): audit timestamps become
        #: deterministic under test; defaults to real UTC now.
        self.clock = clock or (lambda: datetime.now(timezone.utc).replace(tzinfo=None))
        self.tasks: dict[str, Task] = {}

    # -- registration -----------------------------------------------------
    def __enter__(self) -> Pipeline:
        Pipeline._active.append(self)
        return self

    def __exit__(self, *exc: object) -> None:
        Pipeline._active.pop()

    @classmethod
    def current(cls) -> Pipeline | None:
        return cls._active[-1] if cls._active else None

    def add_task(self, task: Task) -> None:
        if task.task_id in self.tasks:
            raise ValueError(
                f"duplicate task_id {task.task_id!r} in pipeline {self.pipeline_id!r}"
            )
        self.tasks[task.task_id] = task
        task.pipeline = self

    # -- topology ---------------------------------------------------------
    def topological_order(self) -> list[list[Task]]:
        """Kahn's algorithm, returned as *levels* (each level's tasks are
        mutually independent — the parallelizable fan-out sets)."""
        indeg = {t.task_id: len(t.upstream) for t in self.tasks.values()}
        level = [t for t in self.tasks.values() if indeg[t.task_id] == 0]
        seen = 0
        out: list[list[Task]] = []
        while level:
            out.append(sorted(level, key=lambda t: t.task_id))
            seen += len(level)
            nxt: list[Task] = []
            for t in level:
                for d_id in sorted(t.downstream):
                    indeg[d_id] -= 1
                    if indeg[d_id] == 0:
                        nxt.append(self.tasks[d_id])
            level = nxt
        if seen != len(self.tasks):
            cyc = sorted(tid for tid, d in indeg.items() if d > 0)
            raise ValueError(f"cycle in pipeline {self.pipeline_id!r}: {cyc}")
        return out

    # -- execution --------------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        run_date: datetime | date | None = None,
        parallelism: int = 1,
    ) -> RunContext:
        """Execute every task once for one logical date (manual-trigger
        semantics when ``run_date`` is None: 'now')."""
        logical = _to_dt(run_date) or self.clock()
        ctx = RunContext(
            spark=spark,
            pipeline=self,
            logical_date=logical,
            clock=self.clock,
            defaults=self.defaults,
        )
        if parallelism <= 1:
            for lvl in self.topological_order():
                for task in lvl:
                    task.run(ctx)
            return ctx
        # Dependency-driven pool: a task is submitted the moment its last
        # upstream finishes (strictly better than level barriers when
        # branches are unbalanced — e.g. the reference's diamond).
        done: set[str] = set()
        running: dict[Any, Task] = {}
        pending = dict(self.tasks)
        with ThreadPoolExecutor(max_workers=parallelism) as pool:
            def submit_ready() -> None:
                for tid in sorted(pending):
                    t = pending[tid]
                    if t.upstream <= done:
                        running[pool.submit(t.run, ctx)] = pending.pop(tid)

            submit_ready()
            while running:
                finished, _ = wait(running, return_when=FIRST_COMPLETED)
                for fut in finished:
                    task = running.pop(fut)
                    fut.result()  # re-raise task failures
                    done.add(task.task_id)
                submit_ready()
        if pending:
            raise ValueError(f"unrunnable tasks (bad deps): {sorted(pending)}")
        return ctx

    def ticks(self) -> list[datetime]:
        """The scheduled logical dates implied by (schedule, start, end) —
        catchup semantics (``dags/s3_data_copy_test.py:24-29``: 4 daily
        ticks 2022-07-13..16 at 07:00)."""
        if not (self.schedule and self.start_date and self.end_date):
            raise ValueError(
                "ticks() needs schedule + start_date + end_date "
                f"(pipeline {self.pipeline_id!r})"
            )
        return self.schedule.ticks(self.start_date, self.end_date)

    def backfill(
        self,
        spark: SparkSession,
        start: datetime | date | None = None,
        end: datetime | date | None = None,
        parallelism: int = 1,
    ) -> list[datetime]:
        """One run per schedule tick in the closed window (defaults to the
        pipeline's own [start_date, end_date])."""
        lo = _to_dt(start) or self.start_date
        hi = _to_dt(end) or self.end_date
        if self.schedule is None or lo is None or hi is None:
            raise ValueError("backfill needs a schedule and a closed window")
        ran: list[datetime] = []
        for tick in self.schedule.ticks(lo, hi):
            self.run(spark, run_date=tick, parallelism=parallelism)
            ran.append(tick)
        return ran


def chain(*groups: Task | Sequence[Task]) -> None:
    """``chain(a, [b, c], d)`` -> a>>b, a>>c, b>>d, c>>d — the reference's
    fan-out/fan-in sugar (``dags/complex_example.py:4,21``)."""
    norm: list[list[Task]] = [
        list(g) if isinstance(g, (list, tuple)) else [g] for g in groups
    ]
    for ups, downs in zip(norm, norm[1:]):
        for u in ups:
            for d in downs:
                u.set_downstream(d)
