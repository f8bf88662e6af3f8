"""Graph edge-generation regimes: the bitmap path and the bucket-join
dispatch target must produce the identical edge set, and the all-pairs
join must keep its heavy predicates OUT of the join condition."""

from __future__ import annotations

from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.operators.graph import (
    _edges,
    _edges_bucket_join,
)
from bfs_etl_sep2025_spark.tables import load

SF = "/root/testdata/sf0.01"


def _occ(spark):
    return (
        load(spark, SF, "events")
        .select("user_id", "event_type", F.col("ts").cast("date").alias("day"))
        .distinct()
    )


def test_bucket_join_dispatch_target_matches_bitmap_path(spark):
    """The many-buckets regime dispatches to _edges_bucket_join; its edge
    set must be row-identical to the bitmap path's (popcount of AND ==
    join group count, by construction — asserted here on real data)."""
    bitmap = {(r.u, r.v) for r in _edges(spark, SF).collect()}
    join = {(r.u, r.v) for r in _edges_bucket_join(_occ(spark)).collect()}
    assert bitmap == join
    assert len(bitmap) > 0  # non-degenerate fixture


def test_allpairs_join_condition_carries_no_popcount(spark):
    """_barrier_filter must keep the shared-bucket threshold above the
    join: the BroadcastNestedLoopJoin condition line contains only the
    id inequality, never the bit_count chain (the bound-condition path is
    not whole-stage-codegen'd — the pathology measured at sf1)."""
    df = _edges(spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    join_lines = [l for l in plan.splitlines() if "NestedLoopJoin" in l]
    assert join_lines, "expected a broadcast all-pairs join in the plan"
    for line in join_lines:
        assert "bit_count" not in line, "popcount pushed into join condition"
