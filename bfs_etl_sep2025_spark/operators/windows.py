"""Window operators — ranking, analytic (lag/lead/first/last), aggregates
over row and range frames, per-group top-k, and window-based sessionization.

Reference parity: reachable via the arbitrary-SQL pass-through
(``dags/dev_db_test.py:41-70``).

Scale notes (100 TB): a window = one shuffle on partitionBy keys + one sort
within partitions. All windows here partition on high-cardinality keys
(custkey / suppkey / user_id), so partitions are small and skew-free; never
use an empty partitionBy at scale (single-task sort). Running sums
accumulate in DECIMAL inside the frame (order-dependent double jitter would
otherwise differ between engines and even between runs — see
functions.portable). Every ORDER BY carries a unique tie-breaker so rank
and frame contents are total-ordered, i.e. deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load

_DEC = "decimal(30,2)"


@query(
    "window_ranking",
    family="windows",
    oracle="""
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               row_number() OVER w AS rn,
               rank()       OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4)     OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderstatus, rn
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_orderstatus", "rn")


@query(
    "window_analytic",
    family="windows",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
               lag(l_shipdate)  OVER w AS prev_ship,
               lead(l_shipdate) OVER w AS next_ship,
               first_value(l_shipdate) OVER w AS first_ship,
               last_value(l_shipdate)
                 OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS last_ship
        FROM lineitem
        WHERE l_suppkey <= 10
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber)
        ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per supplier ship-timeline. last_value needs the
    full-partition frame (the default frame stops at CURRENT ROW — a classic
    silent-wrong-answer trap in both engines)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.lag("l_shipdate").over(w).alias("prev_ship"),
        F.lead("l_shipdate").over(w).alias("next_ship"),
        F.first("l_shipdate").over(w).alias("first_ship"),
        F.last("l_shipdate").over(w_full).alias("last_ship"),
    ).orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")


@query(
    "window_row_frames",
    family="windows",
    oracle=f"""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS {_DEC})) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend,
               CAST(sum(CAST(o_totalprice AS {_DEC})) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing3_spend
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_row_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running and trailing sums over ROWS frames, accumulated exactly in
    DECIMAL (engines disagree on incremental-double rounding otherwise)."""
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast(_DEC)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.sum(dec)
        .over(w.rowsBetween(-2, W.currentRow))
        .cast("double")
        .alias("trailing3_spend"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_range_frame",
    family="windows",
    oracle=f"""
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               count(*) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
               ) AS n_within_10k
        FROM orders
        ORDER BY o_orderstatus, o_totalprice, o_orderkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering — peers are by value distance, not
    row position (count is used so tied peers cannot produce float jitter)."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
    ).orderBy("o_orderstatus", "o_totalprice", "o_orderkey")


@query(
    "window_distribution",
    family="windows",
    oracle="""
        SELECT c_mktsegment, c_custkey, c_acctbal,
               percent_rank() OVER w AS pct_rank,
               cume_dist()    OVER w AS cume,
               nth_value(c_custkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS second_key
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        ORDER BY c_mktsegment, c_acctbal, c_custkey
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions: percent_rank ((rank-1)/(n-1)) and cume_dist
    are exact rational doubles; nth_value needs the full-partition frame."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_key"),
    ).orderBy("c_mktsegment", "c_acctbal", "c_custkey")


@query(
    "topk_per_group",
    family="windows",
    bench=True,
    oracle="""
        SELECT c_mktsegment, c_custkey, c_acctbal, rn AS rank_in_segment
        FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer
        )
        WHERE rn <= 5
        ORDER BY c_mktsegment, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers per segment. row_number + filter is the scalable
    top-k: Spark pushes a per-partition limit below the shuffle (window
    group limit), so no group ever materializes fully."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .select(
            "c_mktsegment", "c_custkey", "c_acctbal", F.col("rn").alias("rank_in_segment")
        )
        .orderBy("c_mktsegment", "rank_in_segment")
    )


@query(
    "window_sessionize",
    family="windows",
    bench=True,
    oracle="""
        WITH gaps AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                           > INTERVAL 30 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sess AS (
          SELECT user_id, ts,
                 CAST(sum(new_session) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_id
          FROM gaps
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum — the
    batch formulation of session windows. One shuffle on user_id, one sort;
    the streaming twin (F.session_window) lives in streaming_batch."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap measured in microseconds — second-granularity truncation would
    # misclassify gaps in (30min, 30min+1s) vs the oracle's exact intervals.
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.select(
        "user_id", "ts", "event_id", new_session.alias("new_session")
    ).select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "window_gaps_islands",
    family="windows",
    oracle="""
        WITH daily AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), isl AS (
          SELECT user_id, d,
                 d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                          AS INTEGER) AS grp
          FROM daily
        )
        SELECT user_id,
               CAST(min(d) AS VARCHAR) AS streak_start,
               CAST(max(d) AS VARCHAR) AS streak_end,
               CAST(count(*) AS BIGINT) AS streak_days
        FROM isl
        GROUP BY user_id, grp
        ORDER BY user_id, streak_start
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's streaks of CONSECUTIVE active days
    (start, end, length) — the classic retention/engagement pattern, via the
    row_number-difference trick: consecutive dates share ``date - rn``, so
    one window pass plus one group-by finds every island with no self-join.

    All-integer/date arithmetic — nothing float touches the result, so it is
    exact at any parallelism. Dates render to string inside both engines
    (engine-native ISO formatting, identical).

    Scale notes: the DISTINCT day grid collapses raw events map-side before
    its shuffle; window and final aggregate both partition by user_id over
    day-grain rows (at most ~365/user/year regardless of event volume)."""
    e = load(spark, sf_dir, "events")
    daily = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    isl = daily.select(
        "user_id", "d", F.date_sub(F.col("d"), rn).alias("grp")
    )
    return (
        isl.groupBy("user_id", "grp")
        .agg(
            F.min("d").cast("string").alias("streak_start"),
            F.max("d").cast("string").alias("streak_end"),
            F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        )
        .drop("grp")
        .orderBy("user_id", "streak_start")
    )


@query(
    "window_ratio_to_report",
    family="windows",
    oracle=f"""
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               o_totalprice / CAST(sum(CAST(o_totalprice AS {_DEC}))
                 OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS share,
               CAST(sum(CAST(o_totalprice AS {_DEC})) OVER (
                 PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey
               ) AS DOUBLE)
                 / CAST(sum(CAST(o_totalprice AS {_DEC}))
                     OVER (PARTITION BY o_orderstatus) AS DOUBLE)
                 AS cum_share
        FROM orders
        ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake's RATIO_TO_REPORT + the Pareto curve (cumulative share of
    group total, largest first). Both the partition total and the running
    numerator accumulate in exact DECIMAL, so each share is one double
    division of two engine-identical values — no float summation order in
    sight. Scale: one shuffle on the partition key; the unbounded-frame
    total and the running frame share the same sort (Spark plans a single
    Window node per ordering)."""
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast(_DEC)
    w_all = W.partitionBy("o_orderstatus")
    w_run = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    total = F.sum(dec).over(w_all).cast("double")
    running = F.sum(dec).over(w_run).cast("double")
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        (F.col("o_totalprice") / total).alias("share"),
        (running / total).alias("cum_share"),
    ).orderBy("o_orderstatus", F.col("o_totalprice").desc(), "o_orderkey")


_EWMA_EXPR = """
    (value
     + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.5 * l1 END
     + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.25 * l2 END
     + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.125 * l3 END)
    / (1.0
       + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.5 END
       + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.25 END
       + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.125 END)
"""


@query(
    "window_ewma",
    family="windows",
    oracle=f"""
        WITH l AS (
            SELECT user_id, event_id, value,
                   lag(value, 1) OVER w AS l1,
                   lag(value, 2) OVER w AS l2,
                   lag(value, 3) OVER w AS l3
            FROM events
            WHERE user_id <= 30
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id, value,
               {_EWMA_EXPR} AS ewma4
        FROM l
        ORDER BY user_id, event_id
    """,
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) over each user's
    last 4 events, with the weight mass renormalized near partition starts.
    A truncated-depth EWMA is deliberately chosen over the recursive
    definition: the recursion is order-serial (unbounded lineage at 100 TB),
    while fixed-depth lags are ONE window sort with whole-stage-codegen'd
    arithmetic — and the finite tail (1/16 of the weight) is below the
    data's own noise floor. The lag chain and the CASE-renormalized blend
    use the identical expression text on both engines: left-associative
    double adds in the same order are bitwise reproducible (see
    functions.portable); powers of two as weights keep every product
    exact."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    l = ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
        F.lag("value", 3).over(w).alias("l3"),
    )
    return l.select(
        "user_id", "event_id", "value", F.expr(_EWMA_EXPR).alias("ewma4")
    ).orderBy("user_id", "event_id")


@query(
    "window_cumulative_distinct",
    family="windows",
    oracle="""
        WITH firsts AS (
            SELECT event_type, user_id,
                   min(CAST(date_diff('day', DATE '1970-01-01',
                                      CAST(ts AS DATE)) AS INT)) AS day_num
            FROM events
            GROUP BY event_type, user_id
        ),
        per_day AS (
            SELECT event_type, day_num, count(*) AS new_users
            FROM firsts GROUP BY event_type, day_num
        )
        SELECT event_type, day_num, new_users,
               CAST(sum(new_users) OVER (
                 PARTITION BY event_type ORDER BY day_num
               ) AS BIGINT) AS cum_distinct_users
        FROM per_day
        ORDER BY event_type, day_num
    """,
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an expanding window — the aggregate
    Spark (correctly) refuses to window directly, rewritten scalably:
    distinct-ness is resolved ONCE by taking each (key, member)'s first
    day (a hash aggregate), then the expanding distinct count is a plain
    prefix sum of per-day first-appearance counts. Two map-combined
    aggregates + one per-key window sort — versus the naive
    O(days x history) re-scan. Integer end to end (day numbers, counts)."""
    ev = load(spark, sf_dir, "events")
    day_num = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("int")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min(day_num).alias("day_num")
    )
    per_day = firsts.groupBy("event_type", "day_num").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = W.partitionBy("event_type").orderBy("day_num")
    return per_day.select(
        "event_type",
        "day_num",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_distinct_users"),
    ).orderBy("event_type", "day_num")


@query(
    "window_rolling_median",
    family="windows",
    oracle="""
        WITH w AS (
          SELECT user_id, event_id, value,
                 list_sort(list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS frame
          FROM events WHERE value IS NOT NULL
        )
        SELECT user_id, event_id,
               frame[CAST((len(frame) + 1) // 2 AS INT)] AS rolling_median
        FROM w
        ORDER BY user_id, event_id
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of the event value over each user's trailing
    7 rows — the robust-baseline smoother dashboards use where a rolling
    mean would chase outliers. DISCRETE median (lower-of-two on even
    frames): the emitted value is always an element of the frame, picked
    by position from the sorted frame — no interpolation arithmetic, so
    the double crossing engines is a raw stored value, bit-identical.

    Plan shape: one shuffle on user_id + one in-partition sort (ts,
    event_id unique tie-break ⇒ deterministic frames); ``collect_list``
    over a ROWS frame keeps O(7) state per row, and ``sort_array`` +
    ``element_at`` are codegen'd expressions (array HOFs with lambdas are
    the banned interpreted form — positional element_at is not). Frame
    size is a constant: at 100 TB this stays a per-row O(k log k) local
    cost, never a per-partition blowup."""
    # NULL values are excluded on BOTH sides up front: Spark collect_list
    # silently drops NULLs while DuckDB's list() keeps them, so a frame
    # containing a NULL would index a different element in each engine
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, W.currentRow)
    )
    frame = F.sort_array(F.collect_list("value").over(w))
    return (
        e.select("user_id", "event_id", frame.alias("frame"))
        .select(
            "user_id",
            "event_id",
            F.expr(
                "element_at(frame, CAST((size(frame) + 1) div 2 AS INT))"
            ).alias("rolling_median"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_time_weighted_avg",
    family="windows",
    oracle="""
        WITH e AS (
          SELECT user_id, event_id, value, epoch_us(ts) AS tus
          FROM events WHERE value IS NOT NULL
        ),
        d AS (
          SELECT user_id, value,
                 lead(tus) OVER (PARTITION BY user_id
                                 ORDER BY tus, event_id) - tus AS dur
          FROM e
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(dur) AS BIGINT) AS total_us,
               (CAST(CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                               * dur) AS BIGINT) AS DOUBLE)
                / CAST(sum(dur) AS BIGINT)) / 100.0 AS twa
        FROM d
        GROUP BY user_id
        HAVING sum(dur) > 0
        ORDER BY user_id
    """,
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user (TimescaleDB's
    ``time_weight`` / the kdb+ twa idiom, locf weighting): each observation
    counts for the microseconds until the NEXT observation, so irregular
    sampling doesn't bias the mean toward burst periods — the correct
    average for sensor/price-style event streams. The last observation per
    user carries no duration (open interval) and weighs zero; single-event
    users are dropped (no elapsed time to average over).

    Engine-exactness (the pagerank fixed-point discipline): durations are
    exact BIGINT microsecond diffs of the naive-UTC timestamps
    (unix_micros/epoch_us); ``value`` is lifted to exact centi-units with
    ``floor(v * 100 + 0.5)`` (fixture values are 2-dp; the lift is the
    same IEEE sequence both engines — NOT the engine-divergent round()),
    so the weighted numerator is an order-independent BIGINT sum and the
    closing ``(num / total_us) / 100`` is a fixed two-op IEEE sequence.
    A DECIMAL(38,4) accumulator over raw ``value * dur`` doubles is NOT
    enough here: the products need ~17 significant decimal digits and
    Spark's double->decimal cast rounds the SHORTEST string representation
    while DuckDB rounds the exact binary expansion — last-ulp mismatches.
    Ties in ``ts`` order deterministically by event_id — a zero-length
    interval then weighs zero, same in both engines.

    Scale: one per-user window (keyed shuffle, never global) + one hash
    aggregate with map-side combine — the window_sessionize shape."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            "value",
            # unix_micros takes TIMESTAMP only; the NTZ->TS cast is an
            # identity shift under the session's pinned UTC zone, matching
            # DuckDB's epoch_us over the same naive values
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        )
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    d = ev.select(
        "user_id",
        "value",
        (F.lead("tus").over(w) - F.col("tus")).alias("dur"),
    )
    v100 = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("dur").cast("bigint").alias("total_us"),
            (
                (
                    F.sum(v100 * F.col("dur")).cast("bigint").cast("double")
                    / F.sum("dur").cast("bigint")
                )
                / F.lit(100.0)
            ).alias("twa"),
        )
        .filter(F.col("total_us") > 0)
        .orderBy("user_id")
    )


# -- gap fill + LOCF (hypertable continuous-aggregate completion) -----------


@query(
    "window_gap_fill",
    family="windows",
    oracle="""
        WITH obs AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket_hour,
                 count(*) AS n, max(value) AS vmax
          FROM events WHERE user_id % 97 = 0
          GROUP BY 1, 2
        ),
        bounds AS (
          SELECT user_id, min(bucket_hour) AS lo, max(bucket_hour) AS hi
          FROM obs GROUP BY user_id
        ),
        grid AS (
          SELECT user_id, CAST(t.s AS TIMESTAMP) AS bucket_hour
          FROM bounds, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR))
            AS t(s)
        ),
        j AS (
          SELECT grid.user_id, grid.bucket_hour,
                 coalesce(obs.n, 0) AS n, obs.vmax AS observed
          FROM grid LEFT JOIN obs USING (user_id, bucket_hour)
        )
        SELECT user_id, bucket_hour,
               CAST(n AS BIGINT) AS n_events,
               CAST(n = 0 AS INT) AS gap_filled,
               last_value(observed IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY bucket_hour) AS locf_value
        FROM j
        ORDER BY user_id, bucket_hour
    """,
)
def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket GAP FILL with last-observation-carried-forward — the
    hypertable completion operator (TimescaleDB ``time_bucket_gapfill`` +
    ``locf``, public docs): every hour between a user's first and last
    event exists in the output, missing hours appear with ``n_events = 0``
    and ``gap_filled = 1``, and ``locf_value`` carries the most recent
    observed hourly max forward across the gap. Dashboards and
    training-feature windows need the dense grid; the raw event stream is
    sparse.

    The per-hour carried value is ``max(value)`` — order-independent and
    exact on doubles, so cross-engine-safe without the DECIMAL detour
    (portable.py discipline: never order-dependent float sums).

    Scale notes (100 TB): the raw stream reduces per (user, hour) FIRST
    (map-side combine; the shuffle ships bucket rows, never events); the
    dense grid is a codegen'd ``sequence``/``explode`` over per-user
    bounds — output is O(active hours), generated, not shuffled; the
    gap-fill join and the LOCF window both key on user_id, so one
    exchange of the bucket rows serves both (no global window anywhere)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 97 == 0)
    obs = ev.select(
        "user_id", F.date_trunc("hour", "ts").alias("bucket_hour"), "value"
    ).groupBy("user_id", "bucket_hour").agg(
        F.count(F.lit(1)).alias("n"), F.max("value").alias("vmax")
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("bucket_hour").alias("lo"), F.max("bucket_hour").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("bucket_hour"),
        )
    )
    j = grid.join(obs, ["user_id", "bucket_hour"], "left").select(
        "user_id",
        "bucket_hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.col("vmax").alias("observed"),
    )
    w = W.partitionBy("user_id").orderBy("bucket_hour")
    return j.select(
        "user_id",
        "bucket_hour",
        F.col("n").cast("bigint").alias("n_events"),
        (F.col("n") == 0).cast("int").alias("gap_filled"),
        F.last("observed", ignorenulls=True).over(w).alias("locf_value"),
    ).orderBy("user_id", "bucket_hour")


@query(
    "window_period_over_period",
    family="windows",
    oracle="""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
                   AS revenue,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        )
        SELECT day, revenue, n_orders,
               lag(revenue) OVER (ORDER BY day) AS prev_revenue,
               revenue - lag(revenue) OVER (ORDER BY day) AS delta,
               (revenue - lag(revenue) OVER (ORDER BY day))
                 / lag(revenue) OVER (ORDER BY day) AS pct_change
        FROM daily
        ORDER BY day
    """,
)
def window_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: daily revenue with the previous
    period's value, absolute delta, and relative change — the lag-window
    idiom behind every DoD/WoW/MoM dashboard and the alert rule "did
    revenue move more than X% vs yesterday".

    Cross-engine exactness: the daily totals aggregate through exact
    DECIMAL(38,4) (order-independent — double summation would drift with
    partitioning), and the delta/ratio are then ROW-LEVEL double
    arithmetic on those pinned values, bitwise identical on both engines
    (the portable-float rules). First day's lag is NULL in both.

    Scale notes: one shuffle for the daily rollup (map-side combined);
    the lag window orders the ~days-sized rollup, never the fact table —
    a global window over a dimension-sized frame is fine at any corpus
    size."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    w = W.orderBy("day")
    prev = F.lag("revenue").over(w)
    return (
        daily.select(
            "day",
            "revenue",
            "n_orders",
            prev.alias("prev_revenue"),
            (F.col("revenue") - prev).alias("delta"),
            ((F.col("revenue") - prev) / prev).alias("pct_change"),
        )
        .orderBy("day")
    )


@query(
    "window_ohlc_downsample",
    family="windows",
    bench=True,
    oracle="""
        WITH tagged AS (
          SELECT make_timestamp((epoch_ms(ts) // 900000) * 900000000)
                   AS bucket_start,
                 event_type, value,
                 row_number() OVER (
                   PARTITION BY (epoch_ms(ts) // 900000), event_type
                   ORDER BY ts, event_id
                 ) AS rn_a,
                 row_number() OVER (
                   PARTITION BY (epoch_ms(ts) // 900000), event_type
                   ORDER BY ts DESC, event_id DESC
                 ) AS rn_d
          FROM events
        )
        SELECT bucket_start, event_type,
               max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
               max(value) AS high_v,
               min(value) AS low_v,
               max(CASE WHEN rn_d = 1 THEN value END) AS close_v,
               CAST(count(*) AS BIGINT) AS n_events
        FROM tagged
        GROUP BY bucket_start, event_type
        ORDER BY bucket_start, event_type
    """,
)
def window_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) candlestick downsampling — the canonical
    time-series compaction for dashboards and feature stores: per 15-min
    bucket and event type, the first and last values by (ts, event_id)
    (composite tie-break makes open/close deterministic under equal
    timestamps) plus the min/max envelope and the tick count. open/close
    are RAW stored doubles and high/low are order statistics — no
    arithmetic touches any value, so cross-engine agreement is bitwise by
    construction (the portable-float rules).

    Spark plan: both row_number windows and the final aggregate partition
    by the same (bucket, event_type) key, so the window sort's exchange is
    reused by the groupBy — ONE shuffle end-to-end. No min(struct) /
    max(struct) first-last trick: struct ordering aggregates fall out of
    whole-stage codegen into SortAggregate (the min(string) rule,
    CLAUDE.md); conditional MAX over the rn=1 flag stays codegen'd.

    Scale notes (100 TB): the window frame is per (bucket, type) — state
    is one partition's ticks, never global; at petabyte tick volumes the
    same query runs incrementally as a streaming window aggregate with
    the identical F.window bucketing."""
    ev = load(spark, sf_dir, "events")
    bucketed = ev.select(
        F.window("ts", "15 minutes").start.alias("bucket_start"),
        "event_type",
        "value",
        "ts",
        "event_id",
    )
    wa = W.partitionBy("bucket_start", "event_type").orderBy(
        "ts", "event_id"
    )
    wd = W.partitionBy("bucket_start", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    tagged = bucketed.select(
        "bucket_start",
        "event_type",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        tagged.groupBy("bucket_start", "event_type")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias(
                "open_v"
            ),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias(
                "close_v"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("bucket_start", "event_type")
    )
