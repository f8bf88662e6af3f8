"""Statistical aggregates & data diagnostics — correlation/covariance from
exact sums, fixed-width histograms, exact heavy hitters, IQR outlier fences,
and join-key skew profiling.

Reference parity: reachable via the arbitrary-SQL pass-through
(``dags/dev_db_test.py:41-70``) — a warehouse user runs CORR / histogram /
outlier SQL freely; these queries re-express that surface engine-side.

Cross-engine determinism: built-in ``corr``/``covar_samp``/``stddev`` are
streaming/merging aggregates whose float result depends on partition order —
NOT reproducible across engines or even across two Spark runs at 100 TB.
Every moment here is therefore assembled from *exact DECIMAL sums* (order
independent, associative) cast once to DOUBLE, then combined with the exact
same textual double expression on both engines (see ``functions.portable``).

Scale notes (100 TB):
- Every query is a partial-aggregatable hash aggregate (map-side combine)
  or a two-level aggregate over it — one shuffle of tiny partials, never a
  row shuffle. Histogram bins, moment sums, and key-frequency profiles all
  reduce to O(groups) state per task regardless of input rows.
- ``diag_key_skew`` is the planning diagnostic you run BEFORE a big join:
  its output (max/mean key frequency) is exactly the signal that decides
  broadcast vs shuffle vs salted execution (see join_salted_skew).
- Quartiles use exact ``percentile`` here (driver-comparable); the 100 TB
  path swaps in ``approx_percentile`` (t-digest, mergeable, one pass) —
  provided already as ``agg_approx_percentiles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.functions.portable import (
    exact_sum,
    sql_exact_sum,
)
from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


@query(
    "agg_corr_cov",
    family="stats",
    oracle=f"""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) AS nd,
                   {sql_exact_sum('l_quantity', 2)} AS sx,
                   {sql_exact_sum('l_extendedprice', 2)} AS sy,
                   {sql_exact_sum('l_quantity * l_extendedprice', 4)} AS sxy,
                   {sql_exact_sum('l_quantity * l_quantity', 4)} AS sxx,
                   {sql_exact_sum('l_extendedprice * l_extendedprice', 4)} AS syy
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(nd AS BIGINT) AS n,
               (sxy - sx * sy / nd) / (nd - 1.0) AS cov_samp,
               (nd * sxy - sx * sy)
                 / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS corr,
               sqrt((sxx - sx * sx / nd) / (nd - 1.0)) AS stddev_x,
               sqrt((syy - sy * sy / nd) / (nd - 1.0)) AS stddev_y
        FROM s
        ORDER BY l_returnflag
    """,
)
def agg_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance/stddev of quantity vs price
    per returnflag, from exact decimal moment sums (one hash aggregate).

    ``sqrt`` is IEEE-754 correctly rounded, so the final double expressions
    are bitwise identical across engines given identical sums."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        exact_sum(x, 2).alias("sx"),
        exact_sum(y, 2).alias("sy"),
        exact_sum(x * y, 4).alias("sxy"),
        exact_sum(x * x, 4).alias("sxx"),
        exact_sum(y * y, 4).alias("syy"),
    )
    return s.select(
        "l_returnflag",
        F.col("nd").cast("bigint").alias("n"),
        F.expr("(sxy - sx * sy / nd) / (nd - 1.0)").alias("cov_samp"),
        F.expr(
            "(nd * sxy - sx * sy)"
            " / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))"
        ).alias("corr"),
        F.expr("sqrt((sxx - sx * sx / nd) / (nd - 1.0))").alias("stddev_x"),
        F.expr("sqrt((syy - sy * sy / nd) / (nd - 1.0))").alias("stddev_y"),
    ).orderBy("l_returnflag")


_BIN_W = "50000.0"
_N_BINS = 12  # clamp into [0, 600k) + overflow bin 11


@query(
    "agg_histogram",
    family="stats",
    oracle=f"""
        SELECT CAST(least(floor(o_totalprice / {_BIN_W}), 11.0) AS INT) AS bin,
               CAST(least(floor(o_totalprice / {_BIN_W}), 11.0) AS INT)
                 * {_BIN_W} AS bin_lo,
               count(*) AS n,
               {sql_exact_sum('o_totalprice', 2)} AS bin_sum
        FROM orders
        GROUP BY 1, 2
        ORDER BY bin
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value: bin index via floor-divide (a
    codegen'd scalar, same IEEE ops both engines), count + exact sum per bin.
    One hash aggregate with O(12) state per task — the constant-memory way
    to profile a 100 TB column (vs sorting for exact quantiles)."""
    o = load(spark, sf_dir, "orders")
    bin_ = F.expr(f"CAST(least(floor(o_totalprice / {_BIN_W}), 11.0) AS INT)")
    return (
        o.select(
            bin_.alias("bin"),
            (bin_ * F.expr(_BIN_W)).alias("bin_lo"),
            "o_totalprice",
        )
        .groupBy("bin", "bin_lo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(F.col("o_totalprice"), 2).alias("bin_sum"),
        )
        .orderBy("bin")
    )


@query(
    "agg_heavy_hitter_tokens",
    family="stats",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        c AS (
            SELECT token, count(*) AS n FROM tok
            WHERE token <> '' GROUP BY token
        ),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT token, n,
               CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        FROM c, t
        WHERE n * 100 >= total
        ORDER BY n DESC, token
    """,
)
def agg_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: tokens carrying >= 1% of all corpus tokens.
    The threshold compare is pure integer arithmetic (``n * 100 >= total``)
    — no float boundary to disagree on; ``share`` is one double division of
    identical values. The 1-row total attaches via broadcast cross join
    (the sanctioned scalar-attach pattern, cf. text IDF). At 100 TB the
    candidate set for a 1% threshold is <= 100 tokens by pigeonhole, so the
    final join input is trivially small; the token count itself is a
    map-combined hash aggregate over the exploded tokens."""
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.join(F.broadcast(t))
        .filter(F.col("n") * 100 >= F.col("total"))
        .select(
            "token",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.col("n").desc(), "token")
    )


@query(
    "agg_outliers_iqr",
    family="stats",
    oracle="""
        WITH q AS (
            SELECT o_orderstatus,
                   quantile_cont(o_totalprice, 0.25) AS q1,
                   quantile_cont(o_totalprice, 0.75) AS q3
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o.o_orderstatus,
               count(*) AS n_total,
               q.q1 AS q1, q.q3 AS q3,
               q.q1 - 1.5 * (q.q3 - q.q1) AS lo_fence,
               q.q3 + 1.5 * (q.q3 - q.q1) AS hi_fence,
               CAST(sum(CASE WHEN o.o_totalprice
                             < q.q1 - 1.5 * (q.q3 - q.q1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
               CAST(sum(CASE WHEN o.o_totalprice
                             > q.q3 + 1.5 * (q.q3 - q.q1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        FROM orders o JOIN q ON o.o_orderstatus = q.o_orderstatus
        GROUP BY o.o_orderstatus, q.q1, q.q3
        ORDER BY o.o_orderstatus
    """,
)
def agg_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per group: exact quartiles per group
    (tiny: one row per status), broadcast back onto the fact scan, one
    conditional aggregate. Two passes over orders but zero row shuffles —
    the per-group fence table is broadcast, the second aggregate map-side
    combines. The fence compares happen in double on both engines with the
    same expression tree (quartile parity is established by the green
    agg_percentiles row)."""
    o = load(spark, sf_dir, "orders")
    q = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    lo = F.expr("q1 - 1.5 * (q3 - q1)")
    hi = F.expr("q3 + 1.5 * (q3 - q1)")
    return (
        o.join(F.broadcast(q), "o_orderstatus")
        .groupBy("o_orderstatus", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("o_totalprice") < lo, 1).otherwise(0))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(F.col("o_totalprice") > hi, 1).otherwise(0))
            .cast("bigint")
            .alias("n_high"),
        )
        .select(
            "o_orderstatus",
            "n_total",
            "q1",
            "q3",
            lo.alias("lo_fence"),
            hi.alias("hi_fence"),
            "n_low",
            "n_high",
        )
        .orderBy("o_orderstatus")
    )


@query(
    "diag_key_skew",
    family="stats",
    oracle="""
        WITH c AS (
            SELECT l_suppkey, count(*) AS cnt
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(min(cnt) AS BIGINT) AS min_cnt,
               CAST(max(cnt) AS BIGINT) AS max_cnt,
               CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_cnt,
               quantile_cont(CAST(cnt AS DOUBLE), 0.5) AS p50_cnt,
               quantile_cont(CAST(cnt AS DOUBLE), 0.99) AS p99_cnt,
               CAST(max(cnt) AS DOUBLE)
                 / (CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                 AS skew_ratio
        FROM c
    """,
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key frequency profile for lineitem.l_suppkey: the pre-flight
    diagnostic that picks a join strategy at 100 TB (skew_ratio >> 1 means
    salt or rely on AQE skew-split; ~1 means a plain shuffle join is fine).
    Two-level aggregate: per-key counts (map-combined, one shuffle of
    partials), then a single global row over O(n_keys) counts."""
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    cntd = F.col("cnt").cast("double")
    return c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.min("cnt").cast("bigint").alias("min_cnt"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        (F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_cnt"
        ),
        F.percentile(cntd, 0.5).alias("p50_cnt"),
        F.percentile(cntd, 0.99).alias("p99_cnt"),
        (
            F.max("cnt").cast("double")
            / (F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double"))
        ).alias("skew_ratio"),
    )


@query(
    "agg_mode_deterministic",
    family="stats",
    oracle="""
        WITH c AS (
            SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
            FROM orders GROUP BY o_orderpriority, o_orderstatus
        )
        SELECT o_orderpriority, o_orderstatus AS modal_status, cnt
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_orderpriority
                ORDER BY cnt DESC, o_orderstatus
            ) AS rn
            FROM c
        ) WHERE rn = 1
        ORDER BY o_orderpriority
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a TOTAL tie-break order. Built-in ``mode()``
    returns an arbitrary winner on ties in both engines — unusable under a
    hash-compare gate and irreproducible between runs at scale; the
    count + row_number formulation pins ties by value and costs one
    map-combined aggregate + a window over O(groups x distinct values)
    rows (WindowGroupLimit prunes below the shuffle)."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), "o_orderstatus"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("modal_status"),
            "cnt",
        )
        .orderBy("o_orderpriority")
    )
