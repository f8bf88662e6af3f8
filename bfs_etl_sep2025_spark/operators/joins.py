"""Join operators — every ``how=`` variant plus broadcast, range (theta),
and as-of (nearest-earlier-timestamp) joins.

Reference parity: joins are reachable through the reference's arbitrary-SQL
pass-through (``dags/dev_db_test.py:41-70``); nothing constrains the shape,
so the full relational join surface is implemented.

Scale notes (100 TB):
- Dimension tables (region/nation/customer at warehouse scale, part/supplier)
  are orders of magnitude smaller than the fact tables -> ``F.broadcast`` hints
  turn those into map-side hash joins (no shuffle of the big side). AQE would
  usually discover this; the hint makes it deterministic.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key — correct and
  unavoidable; AQE skew-join splits hot keys at runtime.
- The as-of join deliberately avoids a per-key ``applyInPandas`` (Python in
  the row path): it is a union + sort-within-partition window, which Spark
  executes as one shuffle by key + one sort — the same cost profile as a
  sort-merge join, fully JVM-side, and robust to millions of rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.functions.portable import exact_sum, sql_exact_sum
from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


@query(
    "join_inner",
    family="joins",
    bench=True,
    oracle="""
        SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_left_outer",
    family="joins",
    oracle="""
        SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
        GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join with an extra join-side predicate (kept in the ON clause —
    moving it to WHERE would silently turn the join inner)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000),
            "left",
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    family="joins",
    oracle="""
        SELECT n.n_name, c.c_custkey
        FROM customer c RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = 0
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    return c.join(n, c.c_nationkey == n.n_nationkey, "right").select(
        "n_name", "c_custkey"
    )


@query(
    "join_full_outer",
    family="joins",
    oracle="""
        SELECT
          coalesce(hi.o_custkey, lo.o_custkey) AS custkey,
          hi.n_big AS n_big,
          lo.n_small AS n_small
        FROM
          (SELECT o_custkey, count(*) AS n_big FROM orders
           WHERE o_totalprice > 350000 GROUP BY o_custkey) hi
        FULL JOIN
          (SELECT o_custkey, count(*) AS n_small FROM orders
           WHERE o_totalprice < 5000 GROUP BY o_custkey) lo
          ON hi.o_custkey = lo.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    hi = (
        o.filter(F.col("o_totalprice") > 350000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    lo = (
        o.filter(F.col("o_totalprice") < 5000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_small"))
    )
    return hi.join(lo, "o_custkey", "full").select(
        F.col("o_custkey").alias("custkey"), "n_big", "n_small"
    )


@query(
    "join_left_semi",
    family="joins",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a semi join: no row multiplication, right side only probed."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_anti",
    family="joins",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as an anti join — the scalable formulation of 'find
    customers with no orders' (never a collect + NOT IN)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross",
    family="joins",
    oracle="""
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane between tiny dimensions (5x25 here);
    the optimizer broadcasts one side so it never shuffles."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_broadcast_dim",
    family="joins",
    bench=True,
    oracle=f"""
        SELECT p.p_brand,
               {sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 20
        GROUP BY p.p_brand
        ORDER BY p.p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): the canonical star-schema join. The broadcast
    hint keeps the 100 TB fact table un-shuffled; only the pruned dim ships
    to every executor."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@query(
    "join_range",
    family="joins",
    oracle="""
        WITH bands(band, lo, hi) AS (
          VALUES ('small', 0.0, 50000.0),
                 ('mid', 50000.0, 200000.0),
                 ('large', 200000.0, 1000000.0)
        )
        SELECT b.band, count(*) AS n_orders
        FROM orders o JOIN bands b
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band
        ORDER BY b.band
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range) join against a band table. Spark executes non-equi joins
    as broadcast-nested-loop; with the tiny side broadcast that is
    O(rows x bands) map-side work — the right call at any scale when the band
    table is small. (For two BIG range sides: bucketize both to turn it into
    an equi-join; see similarity.lsh for that pattern.)"""
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("mid", 50000.0, 200000.0), ("large", 200000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("band")
    )


N_SALT = 8


@query(
    "join_salted_skew",
    family="joins",
    oracle=f"""
        SELECT l.l_returnflag, count(*) AS n_lines,
               {sql_exact_sum('o.o_totalprice', 2)} AS order_value
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted join — the pre-AQE skew remedy, kept as a first-class
    operator because AQE's skew splitting only covers sort-merge joins and
    only after a stage materializes. Each fact row gets a deterministic
    salt; the dimension side is exploded across all {N_SALT} salts so every
    (key, salt) pair still matches exactly once. Results provably equal the
    unsalted join (the oracle). At 100 TB this is how a join survives one
    key holding 1% of the data."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    salted_fact = li.withColumn(
        "salt", F.pmod(F.crc32(F.col("l_linenumber").cast("string")), F.lit(N_SALT))
    )
    exploded_dim = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("salt"),
    )
    joined = salted_fact.join(
        exploded_dim,
        (salted_fact.l_orderkey == exploded_dim.o_orderkey)
        & (salted_fact.salt == exploded_dim.salt),
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            exact_sum(F.col("o_totalprice"), 2).alias("order_value"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "join_asof",
    family="joins",
    oracle="""
        WITH clicks AS (
          SELECT user_id, ts, max(event_id) AS click_id
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts
        ),
        purchases AS (
          SELECT event_id AS purchase_id, user_id, ts
          FROM events WHERE event_type = 'purchase'
        )
        SELECT p.purchase_id, p.user_id,
               c.click_id AS last_click_id,
               c.ts AS last_click_ts
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's nearest click at-or-
    before it. Spark lacks a native ASOF; the scalable formulation is a
    union + single window pass:

      union(clicks, purchases) -> window(partitionBy user, orderBy ts)
      -> last(click attrs, ignorenulls=True) carried forward -> keep probes.

    One shuffle on user_id + one in-partition sort — the same cost as a
    sort-merge join, no Python, no per-key pandas. Oracle: DuckDB ASOF JOIN.
    Clicks are first deduped to one per (user, ts) so ties are deterministic
    in both engines.
    """
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            "ts",
            "click_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(0).alias("is_probe"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("is_probe"),
    )
    # Click sorts before a purchase at the identical ts (is_probe 0 < 1), so
    # "at-or-before" includes same-instant clicks, matching ASOF's >=.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # The struct must be NULL (not a struct of NULLs) on probe rows, or
    # last(ignorenulls) would pick up the probe row itself.
    click_mark = F.when(F.col("is_probe") == 0, F.struct("ts", "click_id"))
    carried = clicks.unionByName(purchases).select(
        "*",
        F.last(click_mark, ignorenulls=True).over(w).alias("last_click"),
    )
    return carried.filter(F.col("is_probe") == 1).select(
        "purchase_id",
        "user_id",
        F.col("last_click.click_id").alias("last_click_id"),
        F.col("last_click.ts").alias("last_click_ts"),
    )


@query(
    "join_fuzzy_levenshtein",
    family="joins",
    oracle="""
        WITH n AS (SELECT DISTINCT p_name FROM part),
        b AS (
            SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM n
        )
        SELECT a.p_name AS name_a, c.p_name AS name_b,
               CAST(levenshtein(a.p_name, c.p_name) AS BIGINT) AS edit_dist
        FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
        WHERE levenshtein(a.p_name, c.p_name) <= 8
        ORDER BY name_a, name_b
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string self-join (entity-resolution shape): candidate pairs by
    BLOCKING on the first token — an equi-join — then exact edit distance
    only within blocks. The naive formulation is an O(n^2) cross join with
    a levenshtein predicate; blocking turns it into a shuffle-hash join
    whose per-block work is bounded, the same blocking discipline as the
    LSH band joins in dedup.py (hot-path rule: candidate generation must be
    an equi-join). ``levenshtein`` is an integer metric — no float parity
    risk; ties in output order are broken by the full name pair."""
    names = load(spark, sf_dir, "part").select("p_name").distinct()
    b = names.select(
        "p_name", F.split(F.col("p_name"), " ").getItem(0).alias("blk")
    )
    a, c = b.alias("a"), b.alias("c")
    dist = F.levenshtein(F.col("a.p_name"), F.col("c.p_name"))
    return (
        a.join(c, "blk")
        .filter(F.col("a.p_name") < F.col("c.p_name"))
        .filter(dist <= 8)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("c.p_name").alias("name_b"),
            dist.cast("bigint").alias("edit_dist"),
        )
        .orderBy("name_a", "name_b")
    )


@query(
    "join_asof_tolerance",
    family="joins",
    oracle="""
        WITH clicks AS (
          SELECT user_id, ts, max(event_id) AS click_id
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts
        ),
        purchases AS (
          SELECT event_id AS purchase_id, user_id, ts
          FROM events WHERE event_type = 'purchase'
        ),
        matched AS (
          SELECT p.purchase_id, p.user_id, p.ts AS pts,
                 c.click_id, c.ts AS cts
          FROM purchases p
          ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts >= c.ts
        )
        SELECT purchase_id, user_id,
               CASE WHEN cts >= pts - INTERVAL 1 HOUR THEN click_id END
                 AS attributed_click_id,
               CASE WHEN cts >= pts - INTERVAL 1 HOUR
                    THEN CAST(date_diff('microsecond', cts, pts)
                              // 1000000 AS BIGINT) END
                 AS click_age_s
        FROM matched
        ORDER BY purchase_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND: each purchase is attributed to
    the user's nearest at-or-before click only if that click is at most
    one hour old, else NULL — the standard attribution-window semantics
    (ad-click attribution, sensor-reading validity, quote staleness in
    tick data). ``join_asof`` answers "what was the last click"; this
    answers "was there a RECENT click", which is the business question.

    Same scalable formulation as ``join_asof`` (union + one
    user-partitioned window pass carrying the last click struct forward —
    one shuffle, one sort, no per-key pandas), plus a codegen'd interval
    comparison to null out stale matches. The tolerance is applied AFTER
    nearest-match selection in both engines (DuckDB: ASOF then CASE), so
    a purchase whose nearest click is stale attributes to NOTHING — not
    to an older in-window click, which cannot exist (nearest is newest).
    Age arrives as exact integer seconds (both engines difference the
    same microsecond timestamps); no floats anywhere."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            "ts",
            "click_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(0).alias("is_probe"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("is_probe"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_mark = F.when(F.col("is_probe") == 0, F.struct("ts", "click_id"))
    carried = clicks.unionByName(purchases).select(
        "*",
        F.last(click_mark, ignorenulls=True).over(w).alias("last_click"),
    )
    fresh = F.col("last_click.ts") >= F.expr("ts - INTERVAL '1' HOUR")
    return (
        carried.filter(F.col("is_probe") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.when(fresh, F.col("last_click.click_id")).alias(
                "attributed_click_id"
            ),
            F.when(
                fresh,
                # full-microsecond difference then integer-divide: Spark's
                # timestampdiff(SECOND) truncates elapsed seconds while
                # DuckDB's date_diff('second') counts boundary crossings —
                # µs DIV 1e6 is the same floor on both engines.
                F.expr(
                    "CAST(timestampdiff(MICROSECOND, last_click.ts, ts) "
                    "DIV 1000000 AS BIGINT)"
                ),
            ).alias("click_age_s"),
        )
        .orderBy("purchase_id")
    )
