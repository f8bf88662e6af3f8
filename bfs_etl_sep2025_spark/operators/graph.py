"""Graph analytics over the behavioral co-occurrence graph — degree
profile, triangle counting, and common-neighbor link prediction.

Reference parity: reachable via the arbitrary-SQL pass-through
(``dags/dev_db_test.py:41-70``) — warehouse users run exactly these
self-join shapes for "users who act together" analyses.

Graph construction: nodes are users; an undirected edge (u < v) exists when
two users co-occur in at least ``_MIN_SHARED`` (event_type, day) activity
buckets. Pair generation picks its shape by the bucket regime (see
``_edges``): with FEW buckets (the fixture's ~150 day-level buckets) each
user's memberships pack into a couple of BIGINT bitmap words and shared
counts are broadcast popcounts — nothing quadratic is shuffled; with MANY
small buckets (refined production granularity) the bucket equi-join is the
right plan — the same candidate-generation discipline as the LSH band
joins (dedup.py hot-path rule), and the shape the oracle uses.

Scale notes (100 TB):
- Bucket-join pair generation is O(sum over buckets of bucket_size^2); the
  bucket granularity is the knob that bounds it (hour / venue / session
  instead of day), exactly like an LSH band count is tuned. The day-level
  fixture granularity sits in the OTHER regime — bucket membership grows
  with the data while bucket count stays ~150 — which is why ``_edges``
  uses the bitmap flip there (measured: the join shape shuffles 2.18e9
  rows at the 10x scale point and DNFs >10 min in both engines; the bitmap
  pass finishes in ~4 s). The explicit ``distinct`` before either shape
  collapses multiplicity first, so a user's event COUNT never inflates
  pair generation (only presence does).
- Triangles / common neighbors are 2-hop equi-joins shuffling on node ids.
  The worst enemy is a hub node (degree d -> d^2 wedge rows): real
  deployments cap or sample hub adjacency; here degrees are bounded by the
  bucket rule. Label-propagation connected components over the same edge
  list are first-class (graph_connected_components, the
  dedup_minhash_clusters fixpoint engine applied to the user graph).
- Everything emitted is integer (counts, degrees, node ids) — zero float
  parity surface.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.operators._barrier import barrier_filter
from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load, widen

_MIN_SHARED = 25

#: Shared oracle CTE: the edge list (u < v, >= _MIN_SHARED shared buckets).
_EDGES_CTE = f"""
        occ AS (
            SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day
            FROM events
        ),
        edges AS (
            SELECT a.user_id AS u, b.user_id AS v
            FROM occ a
            JOIN occ b ON a.event_type = b.event_type AND a.day = b.day
                       AND a.user_id < b.user_id
            GROUP BY a.user_id, b.user_id
            HAVING count(*) >= {_MIN_SHARED}
        )
"""


#: bitmap-path guard: 16 x 64-bit words = 1024 distinct (event_type, day)
#: buckets. Past that, per-user bitmaps stop being "a few longs" and
#: _edges DISPATCHES to the bucket-join formulation (buckets are small in
#: that regime, so the join is no longer quadratic-heavy).
_MAX_MASK_WORDS = 16

#: bitmap-path guard on the OTHER axis: the all-pairs popcount pass is
#: O(U^2) flat work over a broadcast mask table — fine to ~1e10 pairs,
#: not beyond. Few buckets + more users than this cannot be computed by
#: either formulation; the data needs a finer bucket granularity, so fail
#: loudly rather than silently degrade.
_MAX_BITMAP_USERS = 100_000

#: adjacency-bitmap guard (triangle counting / link prediction): 256 x
#: 64-bit words = 16384 nodes. Past that the per-node masks stop
#: broadcasting comfortably and the wedge join (the oracle's shape, with
#: degree-ordered orientation) is the right plan.
_MAX_ADJ_WORDS = 256


def _dense_index(df: DataFrame, cols: list[str], out: str) -> DataFrame:
    """Deterministic dense ids 0..N-1 by ascending ``cols`` — the bit
    position assignment every bitmap below builds on. The window is global
    but runs on the tiny DISTINCT key table, never on facts."""
    from pyspark.sql import Window as W

    return df.withColumn(out, F.row_number().over(W.orderBy(*cols)) - 1)


def _mask_expr(idx_col: str, n_words: int) -> str:
    """One ARRAY<BIGINT> aggregate packing a group's dense ids into
    ``n_words`` bitmap words — a single alias (wide alias fan-outs blow up
    Catalyst constraint propagation; see operators/similarity.py)."""
    return "array(" + ", ".join(
        f"bit_or(CASE WHEN {idx_col} DIV 64 = {w} THEN "
        f"shiftleft(CAST(1 AS BIGINT), CAST({idx_col} % 64 AS INT)) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for w in range(n_words)
    ) + ")"


def _popcount_sum(left: str, right: str, n_words: int) -> str:
    """Codegen'd shared-bit count between two mask arrays: an unrolled
    left-associated chain of ``bit_count(x & y)`` terms. For wide masks in
    FUSED stages use :func:`_popcount_chunks` instead — one ~230-term chain
    plus join machinery overflows Janino's 64 KB method limit and drops the
    whole stage to interpreted mode (measured at sf1, n_words = 233)."""
    return " + ".join(
        f"bit_count(element_at({left}, {w + 1}) & "
        f"element_at({right}, {w + 1}))"
        for w in range(n_words)
    )


#: terms per partial popcount column — keeps every codegen'd method far
#: under Janino's 64 KB limit even when fused with join/filter machinery
_POPCOUNT_CHUNK = 24


def _popcount_chunks(left: str, right: str, n_words: int) -> list[str]:
    """Chunked popcount partials, emitted as SEPARATE projection columns
    and summed as plain attributes one operator above (a filter between —
    the barrier filter, in every call site — stops CollapseProject from
    re-inlining the chains into one giant expression)."""
    return [
        " + ".join(
            f"bit_count(element_at({left}, {w + 1}) & "
            f"element_at({right}, {w + 1}))"
            for w in range(w0, min(n_words, w0 + _POPCOUNT_CHUNK))
        )
        for w0 in range(0, n_words, _POPCOUNT_CHUNK)
    ]


def _attr_sum(prefix: str, n: int):
    """Sum of the n chunk-partial attribute columns ``{prefix}0..{prefix}N``."""
    col = F.col(f"{prefix}0")
    for i in range(1, n):
        col = col + F.col(f"{prefix}{i}")
    return col


#: the pushdown barrier + its optional runtime plan assertion now live in
#: operators/_barrier.py (shared with similarity.py); re-exported here for
#: the existing call sites and tests.
_barrier_filter = barrier_filter


def _edges_bucket_join(occ: DataFrame) -> DataFrame:
    """The oracle-shaped bucket equi-join: right when buckets are MANY and
    individually small (refined production granularity — hour/venue), the
    regime where per-bucket pair enumeration is bounded."""
    a = occ.alias("a")
    b = occ.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _MIN_SHARED)
        .select("u", "v")
    )


#: one cached DataFrame per (SparkContext, sf_dir, tag): the edge list plus
#: the per-query mask tables (symmetric adjacency, higher-neighbor
#: adjacency). Every graph query calls these builders independently —
#: without the memo each call re-cached its masks/edges, accumulating
#: unbounded cache entries over a long driver session (ADVICE r4 for the
#: edge list, ADVICE r6 for the jaccard masks — the same leak class).
#: Entries from PREVIOUS sessions (stale applicationId) are evicted on
#: access, concurrent first callers are races resolved by ``setdefault``
#: (the loser unpersists its build), and :func:`clear_edge_memo` lets a
#: long-lived driver drop everything between fixture-dir generations
#: (ADVICE r5).
_DF_MEMO: dict[tuple[str, str, str], DataFrame] = {}
_EDGE_LOCK = threading.Lock()


def clear_edge_memo() -> None:
    """Unpersist and forget every memoized graph DataFrame (edge lists AND
    mask tables) — call after a fixture dir is regenerated in-process, or
    between sweeps over many sf_dirs."""
    with _EDGE_LOCK:
        entries = list(_DF_MEMO.values())
        _DF_MEMO.clear()
    for df in entries:
        try:
            df.unpersist()
        except Exception:  # session may already be stopped
            pass


def _memoized(spark: SparkSession, sf_dir: str, tag: str, build) -> DataFrame:
    """Session-scoped cache registry: return the memoized DataFrame for
    ``(applicationId, sf_dir, tag)``, building (and caching) it once."""
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, tag)
    with _EDGE_LOCK:
        # entries keyed by a dead session's applicationId reference plans
        # that can never run again — drop them instead of pinning them for
        # the process lifetime
        for stale in [k for k in _DF_MEMO if k[0] != app]:
            del _DF_MEMO[stale]
        memo = _DF_MEMO.get(key)
    if memo is not None:
        return memo
    df = build()
    with _EDGE_LOCK:
        winner = _DF_MEMO.setdefault(key, df)
    if winner is not df:  # lost a concurrent build race: discard ours
        df.unpersist()
    return winner


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _memoized(
        spark, sf_dir, "edges", lambda: _edges_build(spark, sf_dir)
    )


def _edges_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine twin of ``_EDGES_CTE``, dispatching on the bucket regime.

    FEW buckets (the fixture's ~150 day-level buckets, <= 1024): bucket
    membership grows with the data, so the oracle's join-then-group shape
    enumerates O(sum n_b^2) pair rows — measured 2.18e9 at the 10x scale
    point, >10 min in either engine. The dense flip wins there: assign
    each bucket a dense id (tiny broadcast), OR each user's memberships
    into ceil(B/64) BIGINT words (one map-side aggregate), then a
    broadcast all-pairs pass where shared-bucket count is a codegen'd
    ``bit_count(a & b)`` popcount chain — the pair stream shrinks by the
    average-shared-buckets factor (~19x here) and nothing quadratic is
    ever shuffled. Identical edge set by construction (popcount of AND ==
    the join's group count; asserted equal at sf0.1 and sf1).

    MANY buckets (> 16*64): buckets are small, the bucket equi-join is
    the right plan — dispatched to :func:`_edges_bucket_join`. Few buckets
    AND > ``_MAX_BITMAP_USERS`` users: neither formulation computes, the
    granularity itself must refine — raised loudly.

    The small edge list is ``.cache()``d and eagerly materialized (every
    consumer references it two or three times); the mask intermediate is
    unpersisted once the edge list exists — only the edge list needs to
    stay cached (ADVICE r4)."""
    ev = widen(load(spark, sf_dir, "events"))
    occ = ev.select(
        "user_id", "event_type", F.col("ts").cast("date").alias("day")
    ).distinct()
    buckets = _dense_index(
        occ.select("event_type", "day").distinct(),
        ["event_type", "day"],
        "bid",
    )
    n_buckets = buckets.count()
    n_words = max(1, (n_buckets + 63) // 64)
    if n_words > _MAX_MASK_WORDS:
        e = _edges_bucket_join(occ).cache()
        e.count()
        return e
    tagged = occ.join(F.broadcast(buckets), ["event_type", "day"])
    masks = (
        tagged.groupBy("user_id")
        .agg(F.expr(_mask_expr("bid", n_words)).alias("mask"))
        .cache()
    )
    n_users = masks.count()
    if n_users > _MAX_BITMAP_USERS:
        masks.unpersist()
        raise ValueError(
            f"{n_users} users with only {n_buckets} co-occurrence buckets: "
            f"the all-pairs bitmap pass is bounded at {_MAX_BITMAP_USERS} "
            "users and the bucket join would enumerate even more pair "
            "rows — refine the bucket granularity (hour/venue/session "
            "instead of day) so either formulation is tractable"
        )
    a = masks.select(F.col("user_id").alias("u"), F.col("mask").alias("ma"))
    b = masks.select(F.col("user_id").alias("v"), F.col("mask").alias("mb"))
    pairs = a.join(F.broadcast(b), F.col("u") < F.col("v"))
    shared = F.expr(f"({_popcount_sum('ma', 'mb', n_words)})")
    e = (
        _barrier_filter(
            pairs.select("u", "v", shared.alias("shared")),
            F.col("shared") >= _MIN_SHARED,
        )
        .select("u", "v")
        .cache()
    )
    e.count()  # materialize so the mask intermediate can be dropped
    masks.unpersist()
    return e


@query(
    "graph_degree_distribution",
    family="graph",
    oracle=f"""
        WITH {_EDGES_CTE},
        deg AS (
            SELECT node, count(*) AS degree FROM (
                SELECT u AS node FROM edges
                UNION ALL
                SELECT v AS node FROM edges
            ) GROUP BY node
        )
        SELECT node, degree FROM deg ORDER BY degree DESC, node
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node degree of the co-occurrence graph (undirected: each edge
    contributes to both endpoints via a union, then one hash aggregate).
    The degree profile is the hub-detection pre-flight for every 2-hop
    query below — the graph analogue of diag_key_skew."""
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.col("degree").desc(), "node")
    )


@query(
    "graph_triangle_count",
    family="graph",
    oracle=f"""
        WITH {_EDGES_CTE},
        tri AS (
            SELECT count(*) AS n_triangles
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT (SELECT count(*) FROM edges) AS n_edges,
               n_triangles
        FROM tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count, computed with per-node ADJACENCY BITMAPS
    instead of the oracle's wedge join.

    Canonical orientation (edges stored u < v) counts each triangle
    a<b<c exactly once at its base edge (a,b) as |N_hi(a) ∩ N_hi(b)| —
    the intersection of higher-neighbor sets. The oracle realizes that as
    two equi-joins (Suri & Vassilvitskii's shuffle shape), which streams
    one row per WEDGE: ~sum(deg^2) rows — 38e9 on the dense 10x graph, a
    DNF. Same dense-regime flip as ``_edges``: index nodes densely, OR
    each node's higher neighbors into ceil(N/64) BIGINT words, then one
    broadcast pass over the EDGE list computing codegen'd
    ``bit_count(mask_u & mask_v)`` popcounts — cost is edges x words, not
    wedges, and nothing quadratic shuffles. Past ``_MAX_ADJ_WORDS * 64``
    nodes the per-node masks stop broadcasting comfortably and the query
    DISPATCHES to :func:`_tri_wedge_count` — the degree-ordered wedge join,
    the right plan again on the sparser large-node-count graphs that regime
    implies."""
    e = _edges(spark, sf_dir)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
    )
    idx = _dense_index(nodes, ["node"], "nidx")
    n_nodes = idx.count()
    n_words = max(1, (n_nodes + 63) // 64)
    if n_words > _MAX_ADJ_WORDS:
        tri = _tri_wedge_count(e)
    else:
        tri = _tri_bitmap_count(spark, sf_dir, e, idx, n_words)
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return F.broadcast(n_edges).join(tri).select("n_edges", "n_triangles")


def _tri_bitmap_count(
    spark: SparkSession, sf_dir: str, e: DataFrame, idx: DataFrame, n_words: int
) -> DataFrame:
    """Dense-regime triangle core: higher-neighbor adjacency bitmaps +
    per-edge broadcast popcounts (see :func:`graph_triangle_count`)."""
    ei = (
        e.join(
            F.broadcast(
                idx.select(
                    F.col("node").alias("u"), F.col("nidx").alias("uidx")
                )
            ),
            "u",
        )
        .join(
            F.broadcast(
                idx.select(
                    F.col("node").alias("v"), F.col("nidx").alias("vidx")
                )
            ),
            "v",
        )
        .select("uidx", "vidx")
    )
    # cached (referenced from BOTH sides of the per-edge join below) and
    # memoized so repeated calls reuse ONE entry instead of pinning a new
    # cache per call (the _EDGE_MEMO leak class, ADVICE r6)
    adj_hi = _memoized(
        spark,
        sf_dir,
        "tri_adj_hi",
        lambda: ei.groupBy("uidx")
        .agg(F.expr(_mask_expr("vidx", n_words)).alias("mask"))
        .cache(),
    )
    mu = adj_hi.select(F.col("uidx").alias("ku"), F.col("mask").alias("mu"))
    mv = adj_hi.select(F.col("uidx").alias("kv"), F.col("mask").alias("mv"))
    joined = ei.join(F.broadcast(mu), F.col("uidx") == F.col("ku")).join(
        # a node with no higher neighbor has no mask row -> closes nothing
        F.broadcast(mv),
        F.col("vidx") == F.col("kv"),
        "left",
    )
    if n_words <= _CHAIN_MAX_WORDS:
        cnt = _popcount_sum("mu", "mv", n_words)
        per_edge = joined.select(
            F.expr(
                f"CASE WHEN mv IS NULL THEN CAST(0 AS BIGINT) "
                f"ELSE CAST(({cnt}) AS BIGINT) END"
            ).alias("t")
        )
        return per_edge.agg(
            F.coalesce(F.sum("t"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    # wide masks: the unrolled chain (even chunked) overflows Janino's
    # 64 KB method limit inside the fused join stage and drops it to
    # interpreted mode — explode per-word instead and SUM codegen'd
    # popcounts (arrays_zip of a NULL mask is NULL, so maskless edges
    # contribute no rows; coalesce keeps the empty-graph 0)
    z = joined.select(F.explode(F.arrays_zip("mu", "mv")).alias("z"))
    return z.agg(
        F.coalesce(F.sum(F.expr("bit_count(z.mu & z.mv)")), F.lit(0))
        .cast("bigint")
        .alias("n_triangles")
    )


def _tri_wedge_count(e: DataFrame) -> DataFrame:
    """Sparse-regime triangle core: the DEGREE-ORDERED wedge join (Suri &
    Vassilvitskii's MapReduce shape, public literature). Orient every edge
    from its lower-(degree, node) endpoint; each node's out-degree is then
    O(sqrt(m)), so enumerating wedges as an equi-join of the oriented edge
    list with itself on the wedge center streams sum(outdeg^2) =~ m^1.5
    rows instead of the un-oriented sum(deg^2) (hub-quadratic). A triangle
    a-b-c with ranks ra<rb<rc closes exactly one oriented wedge — the one
    centered at its min-rank node — so one closure semi-join on (b, c)
    counts each triangle exactly once. All equi-joins in RANK space (dense
    ints): shuffle-partitionable on node ids at any scale, AQE handles the
    residual skew."""
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    rnk = _dense_index(deg, ["deg", "node"], "rnk").select("node", "rnk")
    er = e.join(
        rnk.select(F.col("node").alias("u"), F.col("rnk").alias("ru")), "u"
    ).join(
        rnk.select(F.col("node").alias("v"), F.col("rnk").alias("rv")), "v"
    )
    low_first = F.col("ru") < F.col("rv")
    oriented = er.select(
        F.when(low_first, F.col("ru")).otherwise(F.col("rv")).alias("src"),
        F.when(low_first, F.col("rv")).otherwise(F.col("ru")).alias("dst"),
    )
    wedges = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).join(
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        "a",
    ).filter(F.col("b") < F.col("c"))
    closed = wedges.join(
        oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    return closed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


@query(
    "graph_link_prediction_cn",
    family="graph",
    oracle=f"""
        WITH {_EDGES_CTE},
        adj AS (
            SELECT u AS s, v AS t FROM edges
            UNION ALL
            SELECT v AS s, u AS t FROM edges
        ),
        wedge AS (
            SELECT a1.s AS u, a2.t AS w, count(*) AS common_neighbors
            FROM adj a1
            JOIN adj a2 ON a2.s = a1.t AND a1.s < a2.t
            GROUP BY a1.s, a2.t
        ),
        cand AS (
            SELECT w.u, w.w, w.common_neighbors
            FROM wedge w
            LEFT JOIN edges e ON e.u = w.u AND e.v = w.w
            WHERE e.u IS NULL
        )
        SELECT u, w AS v, common_neighbors
        FROM cand
        ORDER BY common_neighbors DESC, u, v
        LIMIT 20
    """,
)
def graph_link_prediction_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction: score every NON-adjacent pair by
    how many neighbors they share (the classic baseline; Adamic-Adar is a
    weighted variant of the same scoring) and keep the top 20.

    Dense regime: the SAME true-twin class machinery as
    graph_link_prediction_jaccard (:func:`_twin_cand_table` — closed-
    neighborhood collapse, memoized cached candidate table, chain/explode
    popcount dispatch), ranked by raw common-neighbor count instead of the
    union-normalized ratio; existing edges are excluded by a bit test,
    zero-cn pairs dropped to mirror the wedge form's output domain, and
    the top-k plans as TakeOrderedAndProject, never a full sort. Past
    ``_MAX_ADJ_WORDS * 64`` nodes the query DISPATCHES to
    :func:`_linkpred_wedge` — the symmetric wedge equi-join, the right
    plan again on the sparser refined-bucket graphs that regime implies
    (the dense flat pass stops being 'flat cheap' exactly when the graph
    stops being dense)."""
    e = _edges(spark, sf_dir)
    adj = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    nodes = adj.select(F.col("s").alias("node")).distinct()
    idx = _dense_index(nodes, ["node"], "nidx")
    n_nodes = idx.count()
    n_words = max(1, (n_nodes + 63) // 64)
    if n_words > _MAX_ADJ_WORDS:
        return _linkpred_wedge(e, adj)
    cand, members = _twin_cand_table(spark, sf_dir, adj, idx, n_words)
    return _twin_expand_topk(
        cand, members, "common_neighbors", ["u", "v", "common_neighbors"]
    )


def _linkpred_wedge(e: DataFrame, adj: DataFrame) -> DataFrame:
    """Sparse-regime common-neighbors core: the oracle's own symmetric
    wedge shape as Spark equi-joins — count middle nodes per (u, v) pair
    via ``adj ⋈ adj`` on the wedge center, drop adjacent pairs with one
    anti-join on the edge list, keep top 20. Shuffles on node ids only
    (never materializes per-node neighbor sets); a hub node contributes
    deg^2 wedge rows, which is exactly why the DENSE regime (where hubs
    live) uses the bitmap pass instead and this shape is reserved for the
    sparse large-V regime. AQE's skew-join split handles residual hubs."""
    a1 = adj.select(F.col("s").alias("u"), F.col("t").alias("mid"))
    a2 = adj.select(F.col("t").alias("v"), F.col("s").alias("mid"))
    wedge = (
        a1.join(a2, "mid")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_neighbors"))
    )
    cand = wedge.join(e, ["u", "v"], "left_anti")
    return (
        cand.select("u", "v", "common_neighbors")
        .orderBy(F.col("common_neighbors").desc(), "u", "v")
        .limit(20)
    )


# -- PageRank (power iteration, fixed-point exact) ---------------------------

#: power-iteration rounds for graph_pagerank — enough to differentiate hub
#: structure on the fixture graph while keeping the oracle's unrolled CTE
#: chain readable; a production run iterates to an epsilon instead.
_PR_ITERS = 3
#: fixed-point quantum for neighbor contributions: BIGINT sums are
#: order-independent (float addition is not commutative-associative across
#: partitionings), so Spark's and DuckDB's per-node totals are identical
#: bit for bit. Ranks are O(1) and degrees >= 1, so floor((r/d) * 1e12)
#: sums stay far below 2^53 on any graph the guards admit.
_PR_SCALE = 1_000_000_000_000


#: broadcast guard for per-node iteration state (rank vectors, CC labels):
#: under this many nodes the (node, value) table broadcasts (~16 B/row ->
#: <=80 MB framed at the cap, far inside Spark's 8 GB broadcast limit) and
#: every fixpoint round becomes a BroadcastHashJoin over the big edge list
#: with ZERO edge-side exchange + a map-side partial aggregate — r11
#: measured 150 MB of symmetric-edge shuffle per round (|E|=12M at sf1)
#: collapsing to KBs of aggregate partials. Past the guard the shuffle
#: join is the only correct plan (billions of nodes cannot broadcast).
_MAX_BROADCAST_NODES = 5_000_000

#: ...AND the broadcast regime must also be WORTH it: each round pays a
#: fixed broadcast build + checkpoint (~0.3-0.5 s on this box), which only
#: repays when the per-round edge exchange it removes is large. Interleaved
#: A/B (r11): at |2E| = 238k rows (sf0.1, ~2 MB/round) the shuffle join
#: WINS (pagerank 1.7 vs 3.0 s, CC 2.7 vs 3.4 s); at |2E| = 24M rows
#: (sf1, ~150 MB/round) broadcast wins 2.3-2.6x. Dispatch on the symmetric
#: edge-row count, two orders of magnitude between the measured points.
_MIN_BROADCAST_EDGE_ROWS = 2_000_000


def _pr_iter_sql(prev: str) -> str:
    """One unrolled PageRank round over the symmetric edge list (DuckDB)."""
    return f"""
          SELECT s.dst AS node,
                 0.15::DOUBLE + 0.85::DOUBLE *
                   (CAST(sum(CAST(floor((p.r / deg.d) * {_PR_SCALE}.0)
                                  AS BIGINT)) AS BIGINT)::DOUBLE
                    / {_PR_SCALE}.0) AS r
          FROM sym s
          JOIN {prev} p ON p.node = s.src
          JOIN deg ON deg.node = s.src
          GROUP BY s.dst
    """


@query(
    "graph_pagerank",
    family="graph",
    bench=True,
    oracle=f"""
        WITH {_EDGES_CTE},
        sym AS (
          SELECT u AS src, v AS dst FROM edges
          UNION ALL
          SELECT v AS src, u AS dst FROM edges
        ),
        deg AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY src),
        r0 AS (SELECT node, 1.0::DOUBLE AS r FROM deg),
        it1 AS ({_pr_iter_sql('r0')}),
        it2 AS ({_pr_iter_sql('it1')}),
        it3 AS ({_pr_iter_sql('it2')})
        SELECT node AS user_id, r AS pagerank, rnk
        FROM (SELECT *, row_number() OVER (ORDER BY r DESC, node) AS rnk
              FROM it3)
        WHERE rnk <= 20
        ORDER BY rnk
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {_PR_ITERS} power-iteration rounds) over the
    undirected co-occurrence graph — the influence ranking a pipeline uses
    to weight users/documents by graph centrality. Degree >= 1 for every
    node of an undirected edge list, so there is no dangling-mass term.

    Scale shape: each round is one equi-join of the symmetric edge list
    against the current rank vector plus one sum aggregation keyed on the
    destination — the Pregel message-passing pattern as plain DataFrame
    ops, shuffling only (node, contribution) pairs, never adjacency.
    r11 (guide §3.1/§2.3): the rank-plus-degree table is PER-NODE state
    (|V| rows) while the symmetric edge list is |2E| rows — at sf1 the old
    plan exchanged the 24M-row edge list (~150 MB) EVERY round to meet the
    15k-row rank table. Under ``_MAX_BROADCAST_NODES`` the rank table now
    broadcasts instead (checkpointed per round so each broadcast builds
    from materialized rows, not the prior rounds' lineage), the edge scan
    stays exchange-free, and the contribution sum partial-aggregates
    map-side — per-round shuffle drops from ~150 MB to the KB-sized
    aggregate partials (measured 11.5 s -> 4.4 s median, same-session
    interleaved A/B at sf1). Past the guard (node count itself huge) the
    original shuffle join is the only correct plan and is kept verbatim.
    Cross-engine exactness: contributions are fixed-point BIGINTs
    (``_PR_SCALE``), so the per-node sums are order-independent and the
    closing ``0.15 + 0.85 * (sum / scale)`` is the same IEEE sequence both
    engines — ranks match hash-exactly, not approximately."""
    from pyspark.sql import Window as W

    e = _edges(spark, sf_dir)
    sym = e.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    deg = deg.localCheckpoint(eager=True)  # referenced every round
    # both guard legs: nodes must fit a broadcast AND the per-round edge
    # exchange being removed must be big enough to repay the per-round
    # broadcast+checkpoint fixed cost (see _MIN_BROADCAST_EDGE_ROWS);
    # e is the memoized cached edge list, so the count is a cache scan
    small = (
        deg.count() <= _MAX_BROADCAST_NODES
        and 2 * e.count() >= _MIN_BROADCAST_EDGE_ROWS
    )
    r = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    for _ in range(_PR_ITERS):
        rd = r.join(deg.withColumnRenamed("src", "node"), "node")
        rd = rd.withColumnRenamed("node", "src")
        contrib = sym.join(
            F.broadcast(rd) if small else rd, "src"
        ).select(
            "dst",
            F.expr(
                f"CAST(floor((r / d) * {_PR_SCALE}.0) AS BIGINT)"
            ).alias("q"),
        )
        r = contrib.groupBy("dst").agg(
            (
                F.lit(0.15)
                + F.lit(0.85)
                * (
                    F.sum("q").cast("bigint").cast("double")
                    / F.lit(float(_PR_SCALE))
                )
            ).alias("r")
        ).withColumnRenamed("dst", "node")
        if small:
            # truncate lineage so the next round's broadcast materializes
            # |V| rows instead of re-deriving every earlier round
            r = r.localCheckpoint(eager=True)
    w = W.orderBy(F.col("r").desc(), F.col("node"))
    return (
        r.select(
            F.col("node").alias("user_id"),
            F.col("r").alias("pagerank"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 20)
        .orderBy("rnk")
    )


@query(
    "graph_connected_components",
    family="graph",
    bench=True,
    oracle=f"""
        WITH RECURSIVE {_EDGES_CTE},
        sym AS (
          SELECT u AS s, v AS d FROM edges
          UNION SELECT v, u FROM edges
          UNION SELECT u, u FROM edges
          UNION SELECT v, v FROM edges
        ),
        reach(s, d) AS (
          SELECT s, d FROM sym
          UNION
          SELECT r.s, e.d FROM reach r JOIN sym e ON e.s = r.d
        )
        SELECT s AS user_id, CAST(min(d) AS BIGINT) AS component
        FROM reach GROUP BY s ORDER BY user_id
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-occurrence graph, each node labeled
    by its component's minimum user_id — the grouping primitive behind
    transitive dedup, community rollups, and fraud-ring detection.

    Spark has no recursive CTE, so this is the iterative min-label
    propagation loop (the ``dedup_minhash_clusters`` fixpoint engine,
    ``operators/dedup.py``, applied to the user graph): per round one
    equi-join of the fixed symmetric edge frontier against the current
    labels + a min-aggregate, lineage truncated per round, iterations
    bounded by component diameter. The oracle computes the same fixpoint
    as DuckDB's WITH RECURSIVE transitive closure — two unrelated
    fixpoint engines agreeing on every component. Labels are integers
    throughout: nothing floating anywhere, so agreement is exact.

    r9: the symmetric list needs NO distinct — ``_edges`` emits unique
    (u, v) pairs with u < v, so the (u→v) and (v→u) union branches are
    disjoint by construction and the old ``.distinct()`` was a full
    2|E|-row shuffle for nothing (2.5 s of cc's ~10 s at sf1).
    Convergence is now detected by the label-sum invariant: every round
    takes elementwise ``least``, so sum(label) is monotonically
    non-increasing and strictly decreases iff any label changed — one
    map-side aggregate over the checkpointed labels instead of a
    new-vs-old join per round (DECIMAL(38) accumulator: ids are bounded
    by the 100k-user bitmap guard but sums of arbitrary bigint ids must
    not overflow)."""
    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(e.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .localCheckpoint()
    )
    labels = sym.select("s").distinct().select(
        F.col("s").alias("node"), F.col("s").alias("label")
    ).localCheckpoint(eager=True)
    # r11 (guide §3.1/§2.3, the graph_pagerank rewrite applied to the CC
    # fixpoint): labels are per-node state while sym is |2E| rows — under
    # the node-count guard broadcast the label table each round so the
    # checkpointed edge list is never exchanged and the min-label
    # aggregate partial-aggregates map-side; past the guard keep the
    # shuffle join. Second guard leg as in graph_pagerank: broadcast only
    # when the per-round edge exchange is large enough to repay the
    # per-round broadcast build (measured losing at sf0.1's 238k rows).
    small = (
        labels.count() <= _MAX_BROADCAST_NODES
        and 2 * e.count() >= _MIN_BROADCAST_EDGE_ROWS
    )
    label_sum = None
    for _ in range(20):  # diameter bound; co-occurrence comps are shallow
        lbl = F.broadcast(labels) if small else labels
        nbr = (
            sym.join(lbl, sym.d == lbl.node)
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.s, "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        new_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = new_labels
        if new_sum == label_sum:
            break
        label_sum = new_sum
    else:
        raise RuntimeError(
            "label propagation did not converge in 20 rounds — component "
            "diameter exceeds the bound; raise the round cap"
        )
    return labels.select(
        F.col("node").alias("user_id"),
        F.col("label").cast("bigint").alias("component"),
    ).orderBy("user_id")


@query(
    "graph_link_prediction_jaccard",
    family="graph",
    bench=True,
    oracle=f"""
        WITH {_EDGES_CTE},
        adj AS (
            SELECT u AS s, v AS t FROM edges
            UNION ALL
            SELECT v AS s, u AS t FROM edges
        ),
        deg AS (
            SELECT s AS node, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY s
        ),
        wedge AS (
            SELECT a1.s AS u, a2.t AS w,
                   CAST(count(*) AS BIGINT) AS common_neighbors
            FROM adj a1
            JOIN adj a2 ON a2.s = a1.t AND a1.s < a2.t
            GROUP BY a1.s, a2.t
        ),
        cand AS (
            SELECT w.u, w.w AS v, w.common_neighbors
            FROM wedge w
            LEFT JOIN edges e ON e.u = w.u AND e.v = w.w
            WHERE e.u IS NULL
        )
        SELECT c.u, c.v, c.common_neighbors,
               du.d AS deg_u, dv.d AS deg_v,
               CAST(c.common_neighbors AS DOUBLE)
                 / (du.d + dv.d - c.common_neighbors) AS jaccard
        FROM cand c
        JOIN deg du ON du.node = c.u
        JOIN deg dv ON dv.node = c.v
        ORDER BY jaccard DESC, u, v
        LIMIT 20
    """,
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient link prediction: non-adjacent pairs ranked by
    ``|N(u) ∩ N(v)| / |N(u) ∪ N(v)|`` — common-neighbors normalized by the
    union, so a pair of low-degree nodes sharing most of their small
    neighborhoods outranks a hub pair sharing a few of thousands (the
    standard fix for CN's hub bias). The numerator and both degrees are
    EXACT BIGINT counts; the ratio is one IEEE division of exact integers,
    identical in both engines (the cosine-ranking discipline), with (u, v)
    as the deterministic tie-break.

    Regime dispatch, same as :func:`graph_link_prediction_cn`: dense
    graphs (nodes fit the adjacency-bitmap guard) score every pair with
    codegen'd popcounts — ``cn = bit_count(mu & mv)``, degrees as the
    self-popcount — while past the guard the sparse path runs the
    symmetric wedge equi-join plus two broadcast degree attaches. Both
    regimes emit identical rows (regime-equivalence-tested); top-20 plans
    as TakeOrderedAndProject either way."""
    e = _edges(spark, sf_dir)
    adj = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    nodes = adj.select(F.col("s").alias("node")).distinct()
    idx = _dense_index(nodes, ["node"], "nidx")
    n_nodes = idx.count()
    n_words = max(1, (n_nodes + 63) // 64)
    if n_words > _MAX_ADJ_WORDS:
        return _jaccard_rank(_jaccard_wedge(e, adj))
    return _jaccard_bitmap(spark, sf_dir, adj, idx, n_words)


def _jaccard_rank(scored: DataFrame) -> DataFrame:
    """Shared ranking tail: one IEEE division of exact BIGINTs per pair
    (deterministic cross-engine, cosine discipline), (u, v) tie-break."""
    return (
        scored.select(
            "u",
            "v",
            "common_neighbors",
            "deg_u",
            "deg_v",
            (
                F.col("common_neighbors").cast("double")
                / (
                    F.col("deg_u")
                    + F.col("deg_v")
                    - F.col("common_neighbors")
                )
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "v")
        .limit(20)
    )


def _jaccard_wedge(e: DataFrame, adj: DataFrame) -> DataFrame:
    """Sparse-regime pairs: `_linkpred_wedge`'s shape with the two degree
    attaches — node-id shuffles only, hub cost deg^2 (which is why the
    dense regime dispatches to bitmaps)."""
    deg = adj.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    a1 = adj.select(F.col("s").alias("u"), F.col("t").alias("mid"))
    a2 = adj.select(F.col("t").alias("v"), F.col("s").alias("mid"))
    wedge = (
        a1.join(a2, "mid")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_neighbors"))
    )
    cand = wedge.join(e, ["u", "v"], "left_anti")
    return cand.join(
        F.broadcast(
            deg.select(F.col("s").alias("u"), F.col("d").alias("deg_u"))
        ),
        "u",
    ).join(
        F.broadcast(
            deg.select(F.col("s").alias("v"), F.col("d").alias("deg_v"))
        ),
        "v",
    )


def _jaccard_classes(
    spark: SparkSession,
    sf_dir: str,
    adj: DataFrame,
    idx: DataFrame,
    n_words: int,
) -> tuple[DataFrame, DataFrame]:
    """True-twin class tables, memoized per (session, sf_dir):
    ``groups`` = one row per closed-neighborhood class (exemplar, closed
    mask, class degree); ``members`` = (node, exemplar) mapping.

    The closed mask N[x] = N(x) | {x} is built by UNIONing one self-row
    per node into the (node, neighbor-index) stream BEFORE the one
    ``_mask_expr`` aggregate — no post-hoc mask|own-bit projection exists
    (a 233-element array constructor was measured to overflow Janino's
    64 KB method limit and drop its stage to interpreted mode), and the
    node degree falls out of the same aggregate as ``count(*) - 1`` with
    zero popcount work."""
    from pyspark.sql import Window as W

    def with_cm() -> DataFrame:
        ai = adj.join(
            F.broadcast(
                idx.select(
                    F.col("node").alias("t"), F.col("nidx").alias("tidx")
                )
            ),
            "t",
        ).select("s", "tidx")
        selfrows = idx.select(
            F.col("node").alias("s"), F.col("nidx").alias("tidx")
        )
        return (
            ai.unionByName(selfrows)
            .groupBy("s")
            .agg(
                F.expr(_mask_expr("tidx", n_words)).alias("cm"),
                (F.count(F.lit(1)) - 1).cast("bigint").alias("deg"),
            )
        )

    def build_groups() -> DataFrame:
        members = with_cm().select(
            "s", "cm", "deg", F.min("s").over(W.partitionBy("cm")).alias("ex")
        )
        return (
            members.filter(F.col("s") == F.col("ex"))
            .select("ex", "cm", "deg")
            .cache()
        )

    def build_members() -> DataFrame:
        return (
            with_cm()
            .select("s", F.min("s").over(W.partitionBy("cm")).alias("ex"))
            .cache()
        )

    return (
        _memoized(spark, sf_dir, "jaccard_groups", build_groups),
        _memoized(spark, sf_dir, "jaccard_members", build_members),
    )


#: chain-vs-explode dispatch for per-pair popcounts: up to this many mask
#: words the unrolled bit_count chain compiles comfortably even fused with
#: join machinery (24 words — sf0.1 — measured fine); past it the fused
#: method overflows Janino's 64 KB limit (233 words measured failing) and
#: the popcount becomes an EXPLODE + codegen'd SUM aggregate instead:
#: pairs x words rows through a map-side-combined aggregate, no generated
#: method growing with mask width — the form that survives any graph the
#: broadcast guard admits.
_CHAIN_MAX_WORDS = 96


def _twin_cand_table(
    spark: SparkSession,
    sf_dir: str,
    adj: DataFrame,
    idx: DataFrame,
    n_words: int,
) -> tuple[DataFrame, DataFrame]:
    """Memoized CANDIDATE table over true-twin classes, shared by
    graph_link_prediction_cn and graph_link_prediction_jaccard: one row
    per non-adjacent class pair with common neighbors, columns
    (exu, exv, gdeg_u, gdeg_v, common_neighbors, jaccard). Returns
    ``(cand, members)``.

    Candidate scoring dispatches on mask width (``_CHAIN_MAX_WORDS``):
    narrow masks use the unrolled chunked bit_count chain in the broadcast
    all-pairs projection; wide masks explode ``arrays_zip(cm_u, cm_v)``
    and SUM codegen'd per-word popcounts grouped by the class pair —
    linear work, constant-size generated code. Both paths barrier the
    non-adjacency/cn filter (operators/_barrier.py) and CACHE the result,
    so the top-k probes downstream never rescan the pair stream."""
    groups, members = _jaccard_classes(spark, sf_dir, adj, idx, n_words)

    def build() -> DataFrame:
        a = groups.select(
            F.col("ex").alias("exu"),
            F.col("cm").alias("mu"),
            F.col("deg").alias("gdeg_u"),
        )
        b = (
            groups.select(
                F.col("ex").alias("exv"),
                F.col("cm").alias("mv"),
                F.col("deg").alias("gdeg_v"),
                F.col("ex").alias("_vb"),
            )
            .join(
                F.broadcast(
                    idx.select(
                        F.col("node").alias("_vb"),
                        F.col("nidx").alias("vidx"),
                    )
                ),
                "_vb",
            )
            .drop("_vb")
        )
        is_edge = (
            "((element_at(mu, CAST(vidx DIV 64 AS INT) + 1) "
            ">> CAST(vidx % 64 AS INT)) & CAST(1 AS BIGINT)) = 1"
        )
        pairs = a.join(F.broadcast(b), F.col("exu") < F.col("exv"))
        if n_words <= _CHAIN_MAX_WORDS:
            chunks = _popcount_chunks("mu", "mv", n_words)
            scored = pairs.select(
                "exu",
                "exv",
                "gdeg_u",
                "gdeg_v",
                *[
                    F.expr(f"CAST(({c}) AS BIGINT)").alias(f"_pc{i}")
                    for i, c in enumerate(chunks)
                ],
                F.expr(f"({is_edge})").alias("_is_edge"),
            )
            cn_sum = _attr_sum("_pc", len(chunks))
            cand = _barrier_filter(
                scored, (~F.col("_is_edge")) & (cn_sum > 0)
            )
        else:
            z = pairs.select(
                "exu",
                "exv",
                "gdeg_u",
                "gdeg_v",
                F.expr(f"({is_edge})").alias("_is_edge"),
                F.explode(F.arrays_zip("mu", "mv")).alias("z"),
            )
            agged = z.groupBy(
                "exu", "exv", "gdeg_u", "gdeg_v", "_is_edge"
            ).agg(
                F.sum(F.expr("bit_count(z.mu & z.mv)"))
                .cast("bigint")
                .alias("common_neighbors")
            )
            # barrier: the _is_edge grouping-key predicate would otherwise
            # push below the aggregate and land in the all-pairs join
            # condition (element_at is a heavy token there)
            cand = _barrier_filter(
                agged,
                (~F.col("_is_edge")) & (F.col("common_neighbors") > 0),
            )
            cn_sum = F.col("common_neighbors")
        return cand.select(
            "exu",
            "exv",
            "gdeg_u",
            "gdeg_v",
            cn_sum.alias("common_neighbors"),
            (
                cn_sum.cast("double")
                / (F.col("gdeg_u") + F.col("gdeg_v") - cn_sum)
            ).alias("jaccard"),
        ).cache()

    return _memoized(spark, sf_dir, "twin_cand", build), members


def _twin_expand_topk(
    cand: DataFrame,
    members: DataFrame,
    rank_col: str,
    out_cols: list[str],
) -> DataFrame:
    """Shared class-pair -> node-pair top-20 tail: theta = min rank of the
    top-20 CLASS pairs (every class pair expands to >= 1 node pair, so
    anything below theta is dominated by >= 20 expanded pairs; ties at
    theta are kept), re-expand the survivors through two equi-joins on the
    exemplar id, and rank the expanded pairs exactly as the oracle does.
    ``cand`` is cached, so the theta probe and the keep filter are two
    cheap scans of the materialized table — no barrier needed, there is no
    join underneath to mis-push into."""
    theta = (
        cand.orderBy(F.col(rank_col).desc())
        .limit(20)
        .agg(F.min(rank_col).alias("_theta"))
    )
    kept = (
        cand.crossJoin(F.broadcast(theta))
        .filter(F.col(rank_col) >= F.col("_theta"))
        .drop("_theta")
    )
    mem_u = members.select(F.col("ex").alias("exu"), F.col("s").alias("_x"))
    mem_v = members.select(F.col("ex").alias("exv"), F.col("s").alias("_y"))
    expanded = mem_u.join(F.broadcast(kept), "exu").join(mem_v, "exv")
    out = expanded.select(
        F.least("_x", "_y").alias("u"),
        F.greatest("_x", "_y").alias("v"),
        "common_neighbors",
        F.when(F.col("_x") < F.col("_y"), F.col("gdeg_u"))
        .otherwise(F.col("gdeg_v"))
        .alias("deg_u"),
        F.when(F.col("_x") < F.col("_y"), F.col("gdeg_v"))
        .otherwise(F.col("gdeg_u"))
        .alias("deg_v"),
        "jaccard",
    )
    return (
        out.select(*out_cols)
        .orderBy(F.col(rank_col).desc(), "u", "v")
        .limit(20)
    )


def _jaccard_bitmap(
    spark: SparkSession,
    sf_dir: str,
    adj: DataFrame,
    idx: DataFrame,
    n_words: int,
) -> DataFrame:
    """Dense-regime Jaccard top-20 with TRUE-TWIN COLLAPSE (VERDICT r6
    item 5): nodes are grouped by their CLOSED neighborhood
    ``N[x] = N(x) | {x}`` and only one exemplar per class enters pair
    generation; surviving class pairs re-expand to node pairs at the end.

    Why CLOSED, not the raw mask: the duplicate structure worth collapsing
    is mutually-adjacent twin cliques (the 10x-replication fixture's
    replica groups). Their OPEN neighborhoods differ pairwise by exactly
    two bits (each twin's mask contains the others but not itself —
    measured D = V-1 on raw masks at sf0.1, a useless key), while their
    closed neighborhoods are IDENTICAL. True-twin classes are cliques: two
    distinct nodes with N[x] = N[y] must be adjacent (y in N[y] = N[x] and
    y != x implies y in N(x)), so same-class pairs are never candidates
    and the class-level pass needs no self-pair block.

    Exactness for a candidate pair u in A, v in B (A != B, non-adjacent):
    cn(u, v) = |N(u) ∩ N(v)| = popcount(cm_A & cm_B) - 2*[u adj v]
             = popcount(cm_A & cm_B); deg(u) = popcount(cm_A) - 1; both
    class-level, and adjacency is too (v in cm_A iff u in cm_B, constant
    across members) — so the expansion in :func:`_twin_expand_topk` is
    exact and the result matches the uncollapsed hash. Measured at sf1:
    64 s (r6 uncollapsed V^2/2 pass) -> ~8 s warm (class pairs + cache)."""
    cand, members = _twin_cand_table(spark, sf_dir, adj, idx, n_words)
    return _twin_expand_topk(
        cand,
        members,
        "jaccard",
        ["u", "v", "common_neighbors", "deg_u", "deg_v", "jaccard"],
    )


# -- k-core decomposition (iterative peeling) ---------------------------------

#: k for graph_kcore — a literal shared verbatim with the oracle. Chosen
#: below the fixture's median degree (sf0.01 median 10) so peeling is
#: nontrivial (survivors and casualties both nonempty at sf0.01; the tiny
#: sf0.001 graph peels to empty, which both engines agree on).
_KCORE_K = 5
#: peeling-round bound. The Spark loop raises loudly past it; the oracle
#: unrolls exactly this many rounds, which is EXACT for any graph that
#: converges within the bound because peeling is monotone — once stable,
#: further rounds are identity (extra unrolls are no-ops). Fixture graphs
#: converge in 2; chains/trees need ~diameter rounds, hence the headroom.
_KCORE_ROUNDS = 12


def _kcore_round_sql(prev: str) -> str:
    """One peeling round: keep nodes with >= k alive neighbors."""
    return f"""
        SELECT t.s AS node FROM sym t
        JOIN {prev} a ON a.node = t.s
        JOIN {prev} b ON b.node = t.d
        GROUP BY t.s HAVING count(*) >= {_KCORE_K}
    """


#: each round references the previous one TWICE (both join sides), so an
#: inlined CTE chain doubles the plan per round — 2^12 base scans blew
#: DuckDB's file-handle budget. AS MATERIALIZED pins each round to one
#: evaluation (exactly what the Spark loop's localCheckpoint does).
_KCORE_CHAIN = ",\n".join(
    f"r{i} AS MATERIALIZED ({_kcore_round_sql(f'r{i - 1}')})"
    for i in range(1, _KCORE_ROUNDS + 1)
)


@query(
    "graph_kcore",
    family="graph",
    bench=True,
    oracle=f"""
        WITH {_EDGES_CTE},
        sym AS MATERIALIZED (
          SELECT u AS s, v AS d FROM edges
          UNION ALL
          SELECT v AS s, u AS d FROM edges
        ),
        r0 AS MATERIALIZED (SELECT DISTINCT s AS node FROM sym),
        {_KCORE_CHAIN}
        SELECT t.s AS user_id,
               CAST(count(*) AS BIGINT) AS core_degree
        FROM sym t
        JOIN r{_KCORE_ROUNDS} a ON a.node = t.s
        JOIN r{_KCORE_ROUNDS} b ON b.node = t.d
        GROUP BY t.s
        ORDER BY user_id
    """,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {_KCORE_K}-core of the co-occurrence graph: the maximal subgraph
    where every node keeps >= {_KCORE_K} neighbors INSIDE the subgraph —
    the standard dense-community extractor (peeling, Matula & Beck 1983;
    public algorithm), emitted as (user_id, degree-within-core).

    Third fixpoint engine in the family (PageRank: unrolled power
    iteration; connected components: min-label propagation; here: monotone
    set shrinking). Each round is one equi-join of the symmetric edge list
    against the current alive set plus a count aggregate — shuffles only
    (node, neighbor) ids, lineage truncated per round via localCheckpoint,
    convergence detected by the alive count (the set only shrinks, so
    equal counts == fixpoint). The oracle unrolls {_KCORE_ROUNDS} rounds,
    which is exact for any run the Spark guard admits because peeling is
    idempotent at the fixpoint — two different termination rules, same
    set. Everything is integers; agreement is exact."""
    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionAll(e.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .localCheckpoint()
    )
    alive = sym.select(F.col("s").alias("node")).distinct().localCheckpoint()
    n_alive = alive.count()
    for _ in range(_KCORE_ROUNDS):
        nxt = (
            sym.join(alive.withColumnRenamed("node", "s"), "s")
            .join(
                alive.select(F.col("node").alias("d")),
                "d",
            )
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("s").alias("node"))
            .localCheckpoint()
        )
        n_next = nxt.count()
        if n_next == n_alive:
            break
        alive, n_alive = nxt, n_next
    else:
        raise RuntimeError(
            f"k-core peeling did not converge in {_KCORE_ROUNDS} rounds — "
            "raise _KCORE_ROUNDS (and regenerate the oracle chain) for "
            "this graph's diameter"
        )
    return (
        sym.join(alive.withColumnRenamed("node", "s"), "s")
        .join(alive.select(F.col("node").alias("d")), "d")
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .select(F.col("s").alias("user_id"), "core_degree")
        .orderBy("user_id")
    )


#: multi-source BFS: seed count and hop cap. The cap is part of the QUERY
#: SEMANTICS ("distance within _BFS_MAX hops"), shared verbatim by the
#: oracle's recursion guard, so both engines cut the same frontier.
_BFS_SEEDS = 5
_BFS_MAX = 6


@query(
    "graph_bfs_distances",
    family="graph",
    bench=True,
    oracle=f"""
        WITH RECURSIVE {_EDGES_CTE},
        sym AS MATERIALIZED (
          SELECT u AS s, v AS d FROM edges
          UNION ALL
          SELECT v AS s, u AS d FROM edges
        ),
        deg AS (SELECT s AS node, count(*) AS dg FROM sym GROUP BY s),
        seeds AS (
          SELECT node FROM deg ORDER BY dg DESC, node LIMIT {_BFS_SEEDS}
        ),
        reach(node, dist) AS (
          SELECT node, 0 FROM seeds
          UNION
          SELECT e.d, r.dist + 1
          FROM reach r JOIN sym e ON e.s = r.node
          WHERE r.dist < {_BFS_MAX}
        )
        SELECT node AS user_id, CAST(min(dist) AS BIGINT) AS dist
        FROM reach GROUP BY node ORDER BY user_id
    """,
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the co-occurrence graph: hop distance from
    the NEAREST of the {_BFS_SEEDS} highest-degree hubs (degree desc,
    user_id tie-break), capped at {_BFS_MAX} hops — the "how far is every
    user from the influencer core" primitive behind influence radius,
    notification fan-out tiers, and landmark-based distance sketches.

    Fourth fixpoint engine in the family (PageRank: power iteration;
    components: min-label; k-core: monotone shrink; here: FRONTIER
    EXPANSION). The frontier formulation is the scale-correct BFS: each
    round joins only the NEWLY settled nodes (not the whole distance
    table) against the symmetric edge list, left-anti-joins out already
    settled nodes, and unions one (node, k) layer — every edge is relaxed
    at most once per endpoint settle, so total shuffle across all rounds
    is O(E + V) ids, not O(rounds * E). Lineage truncated per round via
    localCheckpoint; early exit on an empty frontier. The oracle's
    recursive CTE does the same expansion with UNION dedup and the same
    {_BFS_MAX}-hop guard, so nodes farther than the cap (or unreachable)
    are absent from BOTH engines. Integers everywhere; agreement exact."""
    from pyspark.sql import Window as W

    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionAll(e.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .localCheckpoint()
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    seeds = (
        deg.withColumn(
            "rn",
            F.row_number().over(
                W.orderBy(F.col("dg").desc(), F.col("s").asc())
            ),
        )
        .filter(F.col("rn") <= _BFS_SEEDS)
        .select(F.col("s").alias("node"))
    )
    settled = seeds.select(
        "node", F.lit(0).cast("bigint").alias("dist")
    ).localCheckpoint()
    frontier = settled.select("node")
    for k in range(1, _BFS_MAX + 1):
        nxt = (
            sym.join(frontier.withColumnRenamed("node", "s"), "s")
            .select(F.col("d").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        settled = settled.unionByName(
            nxt.select("node", F.lit(k).cast("bigint").alias("dist"))
        ).localCheckpoint()
        frontier = nxt
    return settled.select(
        F.col("node").alias("user_id"), "dist"
    ).orderBy("user_id")
