"""Profile stream_typed_state_profile's cost structure (VERDICT r12 item 3).

Phases timed separately: fixture staging, the streaming drain (with conf
variants, interleaved), the final batch aggregate. Variants that must keep
EMITTED ROWS IDENTICAL (the item's done-condition) assert equality of the
drained update rows; diagnostic variants that change batching are labelled
DIAG and excluded from any conclusion about the query itself.

Usage: python scripts/ab_r12/profile_tws.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.operators.streaming_batch import _stage_events
from bfs_etl_sep2025_spark.session import build_spark, scratch_dir
from bfs_etl_sep2025_spark.streaming.jobs import (
    stream_events,
    stream_user_profile_tws,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

spark = build_spark(app_name="profile-tws")

t0 = time.perf_counter()
src = _stage_events(spark, SF)
print(f"stage_events: {time.perf_counter() - t0:.3f}s", flush=True)


def drain(confs: dict[str, str], src_dir: str):
    """One full drain under temporary confs; returns (seconds, rows)."""
    import itertools

    old: dict[str, str | None] = {}
    for k, v in confs.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        name = f"tws_prof_{next(_ids)}"
        ckpt = scratch_dir("tws_prof_ckpt_")
        t0 = time.perf_counter()
        q = (
            stream_user_profile_tws(stream_events(spark, src_dir))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        rows = sorted(map(str, spark.table(name).collect()))
        return dt, rows
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


import itertools  # noqa: E402

_ids = itertools.count()

VARIANTS = {
    "base(rocksdb,32part)": {
        "spark.sql.streaming.stateStore.providerClass": PROVIDER,
    },
    "changelog": {
        "spark.sql.streaming.stateStore.providerClass": PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    },
    "part8": {
        "spark.sql.streaming.stateStore.providerClass": PROVIDER,
        "spark.sql.shuffle.partitions": "8",
    },
    "part4": {
        "spark.sql.streaming.stateStore.providerClass": PROVIDER,
        "spark.sql.shuffle.partitions": "4",
    },
}

results: dict[str, list[float]] = {k: [] for k in VARIANTS}
rowsets: dict[str, list] = {}
for rep in range(REPS):
    for name, confs in VARIANTS.items():
        dt, rows = drain(confs, src)
        results[name].append(dt)
        rowsets.setdefault(name, rows)
        print(f"rep{rep} {name}: {dt:.3f}s rows={len(rows)}", flush=True)

base_rows = rowsets["base(rocksdb,32part)"]
for name, rows in rowsets.items():
    print(f"{name}: rows_identical_to_base={rows == base_rows}")
for name, ts in results.items():
    print(f"{name}: {['%.2f' % t for t in ts]} min={min(ts):.3f}")

# DIAG: single-file staging (1 micro-batch) — changes emitted rows by
# design; measures the per-micro-batch fixed cost only.
from bfs_etl_sep2025_spark.tables import load  # noqa: E402

one = scratch_dir("tws_prof_one_")
load(spark, SF, "events").coalesce(1).write.mode("overwrite").parquet(one)
for rep in range(REPS):
    dt, rows = drain(
        {"spark.sql.streaming.stateStore.providerClass": PROVIDER}, one
    )
    print(f"DIAG 1-batch rep{rep}: {dt:.3f}s rows={len(rows)}", flush=True)
