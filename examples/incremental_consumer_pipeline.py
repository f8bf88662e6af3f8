"""Incremental consumption of a versioned table's change feed — the
pattern the CDF read (``plans/versioned.py::changes``) exists for:

    producer (appends/upserts)  ──►  orders table (VersionedTable)
    consumer (reads CHANGES)    ──►  per-status totals (VersionedTable)

The consumer never rescans the orders table: each run reads only the
commits since its last high-water mark (stored IN the downstream table's
manifest trail, so the pipeline has no side state), applies the
insert/delete deltas to its running aggregate, and commits — an
incrementally-maintained materialized view. Delta/Iceberg shops know this
as "streaming from the table's change feed"; the reference's closest
shape is the date-partitioned incremental COPY loads
(``/root/reference/dags/s3_data_copy_test.py:24-34``).

Correctness hinges on the CDF replay invariant (asserted in
tests/test_versioned.py): snapshot(v) == snapshot(u) - deletes + inserts
over ``changes(u, v)`` — so the incrementally maintained aggregate equals
a full recompute after every sync, which the test checks literally.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.plans.versioned import VersionedTable

#: the downstream manifest records the upstream version each sync consumed
#: (op string "sync@<v>"), so the high-water mark travels with the data
_SYNC_OP = "sync@{v}"


def last_synced_version(agg: VersionedTable) -> int:
    """High-water mark: the upstream version of the newest sync commit
    (0 = nothing consumed yet). Stored in the downstream history itself —
    no side files, survives restarts, rolls back WITH the aggregate."""
    if not agg.exists():
        return 0
    for h in reversed(agg.history()):
        if h["op"].startswith("sync@"):
            return int(h["op"].split("@", 1)[1])
    return 0


def sync(orders: VersionedTable, agg: VersionedTable) -> int:
    """One consumer run: fold the change feed since the last sync into the
    per-status totals. Returns the upstream version consumed through.

    Scale: reads ONLY the dirs touched since the high-water mark (the CDF
    file-level diff); the delta aggregate is O(changed rows); the merge
    with the previous totals is O(statuses)."""
    hi = orders.current_version()
    lo = last_synced_version(agg)
    if hi == lo:
        return lo  # nothing new
    feed = orders.changes(lo, hi)
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    delta = feed.groupBy("status").agg(
        F.sum(sign).cast("bigint").alias("d_n"),
        F.sum(sign * F.col("qty")).cast("bigint").alias("d_qty"),
    )
    if agg.exists():
        prev = agg.read()
    else:
        prev = delta.select(
            "status", F.lit(0).alias("n"), F.lit(0).alias("total_qty")
        ).limit(0)
    merged = (
        prev.join(delta, "status", "full_outer")
        .select(
            "status",
            (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0)))
            .cast("bigint")
            .alias("n"),
            (
                F.coalesce(F.col("total_qty"), F.lit(0))
                + F.coalesce(F.col("d_qty"), F.lit(0))
            )
            .cast("bigint")
            .alias("total_qty"),
        )
        .filter(F.col("n") > 0)
    )
    op = _SYNC_OP.format(v=hi)
    if agg.exists():
        agg.overwrite(merged, op=op)
    else:
        # first sync: create, then stamp the high-water mark with a
        # no-data-change overwrite so the mark lives in the history
        agg.create(merged)
        agg.overwrite(agg.read(), op=op)
    return hi


if __name__ == "__main__":
    import tempfile

    from bfs_etl_sep2025_spark.session import build_spark

    spark = build_spark()
    base = pathlib.Path(tempfile.mkdtemp())
    orders = VersionedTable(spark, str(base / "orders"))
    agg = VersionedTable(spark, str(base / "totals"))
    orders.create(
        spark.createDataFrame(
            [(1, "open", 5), (2, "done", 3)], "id INT, status STRING, qty INT"
        )
    )
    sync(orders, agg)
    orders.upsert(
        spark.createDataFrame([(1, "done", 5)], "id INT, status STRING, qty INT"),
        keys=["id"],
    )
    sync(orders, agg)
    print(sorted(map(tuple, agg.read().collect())))
