"""Graph edge-generation regimes: the bitmap path and the bucket-join
dispatch target must produce the identical edge set, the 2-hop queries'
wedge-join fallbacks must match their bitmap paths exactly, and the
all-pairs join must keep its heavy predicates OUT of the join condition
(test-time AND via the debug-mode runtime assertion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.operators import graph
from bfs_etl_sep2025_spark.operators._barrier import (
    PLAN_ASSERT_CONF,
    assert_no_join_pushdown,
    barrier_filter,
)
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


def test_triangle_wedge_fallback_matches_bitmap(spark, monkeypatch):
    """Past the adjacency-bitmap bound, graph_triangle_count dispatches to
    the degree-ordered wedge join; with the guard lowered to 64 nodes the
    sf0.01 graph (~145 nodes) takes the fallback, which must return the
    identical (n_edges, n_triangles) row as the bitmap path."""
    want = graph.graph_triangle_count(spark, SF).collect()[0]
    monkeypatch.setattr(graph, "_MAX_ADJ_WORDS", 1)
    got = graph.graph_triangle_count(spark, SF).collect()[0]
    assert (got.n_edges, got.n_triangles) == (want.n_edges, want.n_triangles)
    assert want.n_triangles > 0  # non-degenerate fixture


def test_linkpred_wedge_fallback_matches_bitmap(spark, monkeypatch):
    """Same equivalence for common-neighbors link prediction: the wedge
    fallback's top-20 (fully tie-broken ordering) must be row-identical to
    the bitmap path's."""
    want = [tuple(r) for r in graph.graph_link_prediction_cn(spark, SF).collect()]
    monkeypatch.setattr(graph, "_MAX_ADJ_WORDS", 1)
    got = [tuple(r) for r in graph.graph_link_prediction_cn(spark, SF).collect()]
    assert got == want
    assert len(want) == 20


def test_jaccard_wedge_fallback_matches_bitmap(spark, monkeypatch):
    """Jaccard link prediction dispatches like CN: the sparse wedge path
    (guard lowered) must produce the bitmap path's exact top-20 — counts,
    degrees, and the IEEE-divided jaccard included."""
    want = [
        tuple(r)
        for r in graph.graph_link_prediction_jaccard(spark, SF).collect()
    ]
    monkeypatch.setattr(graph, "_MAX_ADJ_WORDS", 1)
    got = [
        tuple(r)
        for r in graph.graph_link_prediction_jaccard(spark, SF).collect()
    ]
    assert got == want
    assert len(want) == 20


def test_runtime_plan_assert_catches_pushdown(spark):
    """assert_no_join_pushdown must raise on a plan where the popcount
    threshold WAS pushed into the nested-loop join condition (the exact
    pathology the barrier exists to prevent) — built here by filtering
    without the barrier."""
    a = spark.range(4).select(
        F.col("id").alias("u"),
        F.array((F.col("id") % 3).cast("bigint")).alias("ma"),
    )
    b = spark.range(4).select(
        F.col("id").alias("v"),
        F.array((F.col("id") % 5 + 1).cast("bigint")).alias("mb"),
    )
    bad = (
        a.join(F.broadcast(b), F.col("u") < F.col("v"))
        .select(
            "u",
            "v",
            F.expr(
                "bit_count(element_at(ma, 1) & element_at(mb, 1))"
            ).alias("s"),
        )
        .filter(F.col("s") > 0)
    )
    with pytest.raises(AssertionError, match="pushdown barrier violated"):
        assert_no_join_pushdown(bad)


def test_runtime_plan_assert_flag_passes_barriered_plan(spark):
    """With spark.bfs.debug.planAssert=true, barrier_filter self-checks its
    optimized plan at construction time and passes when the barrier held —
    and the guarded result equals the unbarriered filter's rows."""
    a = spark.range(4).select(
        F.col("id").alias("u"),
        F.array((F.col("id") % 3).cast("bigint")).alias("ma"),
    )
    b = spark.range(4).select(
        F.col("id").alias("v"),
        F.array((F.col("id") % 5 + 1).cast("bigint")).alias("mb"),
    )
    scored = a.join(F.broadcast(b), F.col("u") < F.col("v")).select(
        "u",
        "v",
        F.expr("bit_count(element_at(ma, 1) & element_at(mb, 1))").alias("s"),
    )
    spark.conf.set(PLAN_ASSERT_CONF, "true")
    try:
        good = barrier_filter(scored, F.col("s") > 0)
        rows = {(r.u, r.v) for r in good.collect()}
    finally:
        spark.conf.set(PLAN_ASSERT_CONF, "false")
    assert rows == {
        (u, v)
        for u in range(4)
        for v in range(4)
        if u < v and ((u % 3) & (v % 5 + 1)) != 0
    }


def test_nlj_condition_parser_units():
    """The balanced-paren condition extractor (ADVICE r6): only the bound
    condition is returned — never output lists after it, never a bare join
    type; ExistenceJoin's own parens don't confuse the head."""
    from bfs_etl_sep2025_spark.operators._barrier import _nlj_condition

    line = (
        ":- BroadcastNestedLoopJoin BuildRight, Inner, "
        "((u#1 < v#2) AND bit_count(x#3) > 0) [plan_id=7]"
    )
    assert _nlj_condition(line) == "((u#1 < v#2) AND bit_count(x#3) > 0)"
    # condition-less joins: bare, with type, with trailing output list
    assert _nlj_condition("BroadcastNestedLoopJoin BuildRight") is None
    assert _nlj_condition("BroadcastNestedLoopJoin BuildRight, Cross") is None
    assert _nlj_condition("BroadcastNestedLoopJoin BuildLeft, Inner") is None
    # the r6 false-positive shape: heavy token in a printed column list,
    # not in any condition (no ", (" follows the head)
    assert (
        _nlj_condition(
            "BroadcastNestedLoopJoin BuildRight, Inner "
            "[bit_count(mask#9) AS deg#10]"
        )
        is None
    )
    # ExistenceJoin prints parens in the TYPE; the condition follows
    assert (
        _nlj_condition(
            "BroadcastNestedLoopJoin BuildRight, "
            "ExistenceJoin(exists#407), (a#1 = b#2)"
        )
        == "(a#1 = b#2)"
    )
    # truncated plan line: keep the tail rather than under-matching
    assert _nlj_condition(
        "BroadcastNestedLoopJoin BuildRight, Inner, (bit_count(x#3"
    ) == "(bit_count(x#3"


def test_wide_mask_explode_path_matches_chain(spark, monkeypatch):
    """The WIDE-mask scoring form (explode + codegen'd SUM — the path sf1's
    233-word masks take, where unrolled chains overflow Janino's 64 KB
    method limit) must be row-identical to the narrow chain form for both
    link-prediction queries and the triangle count. The memo is cleared
    around the flip so the chain-built candidate cache cannot mask the
    wide build (and cleared after, so other tests see narrow-path plans)."""
    want_j = [
        tuple(r)
        for r in graph.graph_link_prediction_jaccard(spark, SF).collect()
    ]
    want_c = [
        tuple(r) for r in graph.graph_link_prediction_cn(spark, SF).collect()
    ]
    want_t = graph.graph_triangle_count(spark, SF).collect()[0]
    graph.clear_edge_memo()
    monkeypatch.setattr(graph, "_CHAIN_MAX_WORDS", 0)
    try:
        got_j = [
            tuple(r)
            for r in graph.graph_link_prediction_jaccard(spark, SF).collect()
        ]
        got_c = [
            tuple(r)
            for r in graph.graph_link_prediction_cn(spark, SF).collect()
        ]
        got_t = graph.graph_triangle_count(spark, SF).collect()[0]
    finally:
        graph.clear_edge_memo()
    assert got_j == want_j and len(want_j) == 20
    assert got_c == want_c and len(want_c) == 20
    assert (got_t.n_edges, got_t.n_triangles) == (
        want_t.n_edges,
        want_t.n_triangles,
    )
