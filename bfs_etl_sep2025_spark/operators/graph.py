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
  list already exists as dedup_minhash_clusters' engine (dedup.py).
- Everything emitted is integer (counts, degrees, node ids) — zero float
  parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
#: buckets. Past that, per-user bitmaps stop being "a few longs" and the
#: bucket-join formulation (the oracle's shape) becomes the right engine
#: plan again — raise rather than silently degrade.
_MAX_MASK_WORDS = 16


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine twin of ``_EDGES_CTE``, computed with per-user bucket
    BITMAPS instead of the oracle's bucket join.

    Why not mirror the oracle's join-then-group shape: the number of
    distinct (event_type, day) buckets is SMALL (~150 here) while bucket
    membership scales with the data, so enumerating pairs per bucket is
    O(sum n_b^2) rows through a shuffle+aggregate — measured 2.18e9 joined
    rows at the 10x scale point, >10 min in either engine. With few
    buckets the dense flip wins: assign each bucket a dense id (tiny
    broadcast), OR each user's memberships into ceil(B/64) BIGINT words
    (one map-side aggregate), then a broadcast all-pairs pass where
    shared-bucket count is codegen'd ``bit_count(a & b)`` popcounts — the
    pair stream shrinks by the average-shared-buckets factor (~19x here)
    and, more importantly, nothing quadratic is ever shuffled. Identical
    edge set by construction (popcount of AND == the join's group count).

    Scale regimes: this path requires B <= {_MAX_MASK_WORDS}*64 buckets
    (guarded loudly) and a broadcastable user-mask table; at production
    bucket granularities (hour/venue — B large, buckets small) the
    oracle-shaped bucket equi-join is the right plan instead, exactly as
    the module docstring's granularity note describes.

    The result is ``.cache()``d: every consumer below references the edge
    list two or three times (symmetrized adjacency + closing-edge checks),
    and without a materialization point Spark re-executes the whole
    pair-generation subtree once PER reference. The mask table is cached
    too, so the self-join's broadcast side doesn't recompute the occ
    distinct."""
    from pyspark.sql import Window as W

    ev = widen(load(spark, sf_dir, "events"))
    occ = ev.select(
        "user_id", "event_type", F.col("ts").cast("date").alias("day")
    ).distinct()
    buckets = (
        occ.select("event_type", "day")
        .distinct()
        .withColumn(
            "bid",
            F.row_number().over(W.orderBy("event_type", "day")) - 1,
        )
    )
    n_buckets = buckets.count()
    n_words = max(1, (n_buckets + 63) // 64)
    if n_words > _MAX_MASK_WORDS:
        raise ValueError(
            f"{n_buckets} co-occurrence buckets exceed the bitmap path's "
            f"{_MAX_MASK_WORDS * 64}-bucket bound; at that granularity "
            "switch _edges to the bucket-join formulation (the oracle's "
            "shape) — buckets are small there, so the join is no longer "
            "quadratic-heavy"
        )
    tagged = occ.join(F.broadcast(buckets), ["event_type", "day"])
    masks = tagged.groupBy("user_id").agg(
        *[
            F.expr(
                f"bit_or(CASE WHEN bid DIV 64 = {w} THEN "
                f"shiftleft(CAST(1 AS BIGINT), CAST(bid % 64 AS INT)) "
                f"ELSE CAST(0 AS BIGINT) END)"
            ).alias(f"m{w}")
            for w in range(n_words)
        ]
    ).cache()
    a = masks.alias("a")
    b = masks.alias("b")
    shared = " + ".join(
        f"bit_count(a.m{w} & b.m{w})" for w in range(n_words)
    )
    return (
        a.join(F.broadcast(b), F.col("a.user_id") < F.col("b.user_id"))
        .filter(F.expr(f"({shared}) >= {_MIN_SHARED}"))
        .select(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .cache()
    )


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
    """Exact triangle count via the canonical-orientation wedge join: with
    every edge stored u < v, each triangle a<b<c is counted exactly once as
    (a,b)+(b,c) closed by (a,c) — two equi-joins on node ids, no direction
    dedup, no division by 6. Orientation by id is the standard shuffle-join
    triangle algorithm (cf. Suri & Vassilvitskii's MapReduce formulation);
    at scale the join keys are plain ints and AQE handles residual skew."""
    e = _edges(spark, sf_dir)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return F.broadcast(n_edges).join(tri).select("n_edges", "n_triangles")


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
    weighted variant of the same wedge join) and keep the top 20. Wedges
    come from one self-join of the symmetrized adjacency; existing edges
    are removed with a LEFT ANTI join; top-k plans as
    TakeOrderedAndProject, never a full sort."""
    e = _edges(spark, sf_dir)
    adj = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    wedge = (
        a1.join(
            a2,
            (F.col("a2.s") == F.col("a1.t"))
            & (F.col("a1.s") < F.col("a2.t")),
        )
        .groupBy(F.col("a1.s").alias("u"), F.col("a2.t").alias("w"))
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    cand = wedge.alias("w").join(
        e.alias("e"),
        (F.col("e.u") == F.col("w.u")) & (F.col("e.v") == F.col("w.w")),
        "left_anti",
    )
    return (
        cand.select("u", F.col("w").alias("v"), "common_neighbors")
        .orderBy(F.col("common_neighbors").desc(), "u", "v")
        .limit(20)
    )
