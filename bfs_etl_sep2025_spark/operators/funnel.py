"""Event-sequence analytics: funnels, retention cohorts, path transitions,
and the batch formulation of a stream-stream interval join.

Reference parity: the reference's event-shaped workloads run as scheduled
SQL over warehouse tables (``dags/dev_db_test.py:41-70``); these are the
canonical product-analytics queries such a warehouse serves, expressed as
declarative plans over the ``events`` fixture.

Scale notes (100 TB of events):
- every query shuffles on ``user_id`` exactly once (or not at all); the
  funnel's three ordered stages reuse ONE exchange — Catalyst plans the
  chained conditional aggregates over a single per-user grouping, not three
  self-joins.
- retention bucketing is calendar arithmetic on the row (codegen'd), so the
  shuffle carries (cohort_week, active_week) pairs after map-side combine.
- the interval join is an equi-join on user_id with a residual time-range
  predicate — never a theta-only join; at stream runtime the same plan runs
  with watermarks bounding both state stores (see tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


@query(
    "funnel_ordered_steps",
    family="events",
    bench=True,
    oracle="""
        WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1
          GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM s1) AS n_view,
               (SELECT count(*) FROM s2) AS n_view_click,
               (SELECT count(*) FROM s3) AS n_view_click_purchase
    """,
)
def funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user counts for
    step N only with an event AFTER their step-N-1 time (strict ordering —
    the part naive ``count distinct per type`` funnels get wrong).

    Plan: each stage is a per-user conditional ``min`` after an equi-join on
    user_id — every shuffle is on the SAME key, so stages stay co-partitioned
    (no raw-event re-shuffle) and the per-type filters prune each scan. The
    three funnel counts merge as single-row aggregates (broadcast-combined,
    no data movement)."""
    ev = load(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "retention_cohorts",
    family="events",
    oracle="""
        WITH cohort AS (
          SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
          FROM events GROUP BY user_id
        ),
        activity AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
          FROM events
        )
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, a.active_week) // 7 AS INT)
                 AS week_offset,
               count(*) AS n_active
        FROM cohort c JOIN activity a ON c.user_id = a.user_id
        GROUP BY c.cohort_week, week_offset
        ORDER BY c.cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort matrix: users grouped by first-seen week,
    counted in each subsequent active week. Both the cohort assignment and
    the activity set shuffle once on user_id; week math is codegen'd
    calendar arithmetic (both engines truncate weeks to Monday)."""
    ev = load(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    offset = F.floor(
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        cohort.join(activity, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "event_path_transitions",
    family="events",
    oracle="""
        WITH ordered AS (
          SELECT user_id, event_type, ts, event_id,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS next_type
          FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n_transitions
        FROM ordered
        WHERE next_type IS NOT NULL
        GROUP BY from_type, to_type
        ORDER BY from_type, to_type
    """,
)
def event_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order path (Markov transition) counts: for each user's
    time-ordered event sequence, count consecutive type pairs. One shuffle
    on user_id + in-partition sort for the ``lead`` window, then a
    map-side-combined count per (from, to) pair. Tie order pinned by
    (ts, event_id) so both engines see identical sequences."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


@query(
    "stream_stream_interval_join",
    family="streaming",
    oracle="""
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.user_id,
               c.ts AS click_ts,
               p.ts AS purchase_ts
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND p.ts >  c.ts
         AND p.ts <= c.ts + INTERVAL 1 HOUR
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        ORDER BY click_id, purchase_id
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch formulation of the stream-stream interval join: every purchase
    within (click_ts, click_ts + 1h] of the same user's click. The join is
    an EQUI-join on user_id with the time range as a residual predicate —
    the shape Structured Streaming requires for two watermarked streams
    (the range bound is what lets the engine expire join state; the real
    two-readStream run with watermarks is tests/test_streaming.py::
    test_stream_stream_interval_join)."""
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        c.join(
            p,
            (c.user_id == p.p_user_id)
            & (p.purchase_ts > c.click_ts)
            & (p.purchase_ts <= c.click_ts + F.expr("INTERVAL 1 HOUR")),
        )
        .select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")
        .orderBy("click_id", "purchase_id")
    )


@query(
    "events_anomaly_burst",
    family="events",
    oracle="""
        WITH hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS hr,
                 CAST(count(*) AS BIGINT) AS n
          FROM events
          GROUP BY user_id, date_trunc('hour', ts)
        ), trail AS (
          SELECT user_id, hr, n,
                 CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS trail_n,
                 CAST(count(n) OVER w AS BIGINT) AS trail_buckets
          FROM hourly
          WINDOW w AS (PARTITION BY user_id ORDER BY hr
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, hr, n, trail_n, trail_buckets,
               CASE WHEN trail_buckets >= 3
                     AND n * trail_buckets > 4 * trail_n
                    THEN 1 ELSE 0 END AS burst
        FROM trail
        ORDER BY user_id, hr
    """,
)
def events_anomaly_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-burst anomaly detection: an hour is a burst when a user's
    event count exceeds 4x their trailing average over the last (up to) 24
    active hours, with a 3-bucket warm-up before flagging. The comparison is
    cross-multiplied in integers (``n * buckets > 4 * sum``) so the operator
    is EXACT — no float average whose summation order could differ between
    engines or between cluster runs.

    Scale notes: two data shuffles — the (user_id, hour) pre-aggregation
    collapses the raw event fan-in map-side first, so the second exchange
    (user_id for the trailing window) moves only hourly rows, not events —
    plus a final presentation sort. Sliding-window state is 25 bigints per
    user, independent of event volume."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy("hr").rowsBetween(-24, -1)
    trail = hourly.select(
        "user_id",
        "hr",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("bigint").alias("trail_n"),
        F.count("n").over(w).cast("bigint").alias("trail_buckets"),
    )
    burst = (
        (F.col("trail_buckets") >= 3)
        & (F.col("n") * F.col("trail_buckets") > 4 * F.col("trail_n"))
    )
    return trail.select(
        "*", F.when(burst, F.lit(1)).otherwise(F.lit(0)).alias("burst")
    ).orderBy("user_id", "hr")
