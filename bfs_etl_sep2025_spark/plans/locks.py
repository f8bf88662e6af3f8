"""Per-table write serialization.

Spark's file-based commit protocol stages every job's output under the SAME
``<table>/_temporary/0`` directory, so two concurrent INSERTs into one table
from one session race on rename/cleanup (Snowflake, which the reference's
fan-out DAG targets with 4 parallel inserts, serializes DML internally —
Spark does not). The orchestration layer therefore takes a process-wide lock
per fully-qualified table name around write statements: concurrency across
DIFFERENT tables is preserved; same-table writes queue, which only changes
timing, never results.

On a real cluster the same hazard exists for any non-transactional file
table; transactional formats (Delta/Iceberg) lift it — this lock is the
session-catalog-parquet answer.
"""

from __future__ import annotations

import threading
from collections.abc import Iterator
from contextlib import contextmanager

_meta = threading.Lock()
_locks: dict[str, threading.Lock] = {}


@contextmanager
def table_write_lock(qualified_name: str) -> Iterator[None]:
    key = qualified_name.lower()
    with _meta:
        lock = _locks.setdefault(key, threading.Lock())
    with lock:
        yield
