"""Data-quality expectation suite (Deequ/Great-Expectations shape): declared
rules evaluated engine-side, one verdict row per rule.

Reference parity: the reference pipeline trusts the warehouse to validate
loads implicitly (COPY INTO + downstream SQL, ``dags/s3_data_copy_test.py``,
``dags/dev_db_test.py:41-70``); a warehouse user expresses these same checks
as ad-hoc SQL. Here they are first-class, countable, and plan-audited.

Scale notes (100 TB):
- Every rule reduces to either (a) a conditional aggregate over one scan
  (range / null / consistency checks — map-combined, O(1) state), (b) a
  count-distinct (uniqueness — one shuffle of the key, partial-aggregated),
  or (c) a LEFT ANTI join against a dimension (referential integrity — the
  dimension side broadcasts when small, cf. joins.py scale notes).
- Rules over the SAME table are evaluated in ONE pass where they are plain
  conditional aggregates (the lineitem rules share a scan below); only
  distinct-based and join-based rules need their own shuffle. This is the
  difference between "n_rules scans" and "~2 scans" at 100 TB.
- Verdicts are integers/booleans end to end — nothing float crosses the
  engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


@query(
    "dq_expectations",
    family="quality",
    oracle="""
        WITH li AS (
            SELECT count(*) AS n,
                   CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
                   CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
                   CAST(sum(CASE WHEN l_extendedprice IS NULL
                                   OR l_extendedprice <= 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad_price
            FROM lineitem
        ),
        ord AS (
            SELECT count(*) AS n,
                   CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad_total
            FROM orders
        ),
        cust_uniq AS (
            SELECT count(*) AS n,
                   count(*) - count(DISTINCT c_custkey) AS dup
            FROM customer
        ),
        li_uniq AS (
            SELECT count(*) AS n,
                   count(*) - count(DISTINCT l_orderkey * 8 + l_linenumber)
                     AS dup
            FROM lineitem
        ),
        orphans AS (
            SELECT (SELECT count(*) FROM orders) AS n,
                   count(*) AS bad
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
        ),
        doc_len AS (
            SELECT count(*) AS n,
                   CAST(sum(CASE WHEN n_chars <> length(text)
                            THEN 1 ELSE 0 END) AS BIGINT) AS bad
            FROM documents
        )
        SELECT * FROM (
            SELECT 'lineitem.l_quantity in [1,50]' AS rule,
                   n AS n_checked, bad_qty AS n_violations,
                   bad_qty = 0 AS ok FROM li
            UNION ALL
            SELECT 'lineitem.l_discount in [0,0.1]', n, bad_disc,
                   bad_disc = 0 FROM li
            UNION ALL
            SELECT 'lineitem.l_extendedprice positive', n, bad_price,
                   bad_price = 0 FROM li
            UNION ALL
            SELECT 'orders.o_totalprice positive', n, bad_total,
                   bad_total = 0 FROM ord
            UNION ALL
            SELECT 'customer.c_custkey unique', n, dup, dup = 0 FROM cust_uniq
            UNION ALL
            SELECT 'lineitem.(orderkey,linenumber) unique', n, dup, dup = 0
            FROM li_uniq
            UNION ALL
            SELECT 'orders.o_custkey references customer', n, bad, bad = 0
            FROM orphans
            UNION ALL
            SELECT 'documents.n_chars = length(text)', n, bad, bad = 0
            FROM doc_len
        ) ORDER BY rule
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight declared expectations over four tables, one verdict row each
    (rule, n_checked, n_violations, ok). The three lineitem conditional
    rules share ONE scan/aggregate; uniqueness rules pay their
    count-distinct shuffle; referential integrity is a broadcast LEFT ANTI
    count. The composite lineitem key packs (orderkey, linenumber) into one
    BIGINT (linenumber < 8) so count-distinct shuffles a single integer —
    the same narrow-shuffle discipline as dedup.py's hash keys."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    docs = load(spark, sf_dir, "documents")

    def verdict(rule: str, n: F.Column, bad: F.Column) -> list[F.Column]:
        return [
            F.lit(rule).alias("rule"),
            n.alias("n_checked"),
            bad.alias("n_violations"),
            (bad == 0).alias("ok"),
        ]

    cnt = F.count(F.lit(1))
    li_scan = li.agg(
        cnt.alias("n"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).cast("bigint").alias("bad_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
        ).cast("bigint").alias("bad_disc"),
        F.sum(
            F.when(
                F.col("l_extendedprice").isNull()
                | (F.col("l_extendedprice") <= 0),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("bad_price"),
    )
    rules = [
        li_scan.select(
            *verdict(
                "lineitem.l_quantity in [1,50]", F.col("n"), F.col("bad_qty")
            )
        ),
        li_scan.select(
            *verdict(
                "lineitem.l_discount in [0,0.1]", F.col("n"), F.col("bad_disc")
            )
        ),
        li_scan.select(
            *verdict(
                "lineitem.l_extendedprice positive",
                F.col("n"),
                F.col("bad_price"),
            )
        ),
        o.agg(
            cnt.alias("n"),
            F.sum(
                F.when(
                    F.col("o_totalprice").isNull()
                    | (F.col("o_totalprice") <= 0),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("bad"),
        ).select(
            *verdict("orders.o_totalprice positive", F.col("n"), F.col("bad"))
        ),
        c.agg(
            cnt.alias("n"),
            (cnt - F.count_distinct(F.col("c_custkey"))).alias("dup"),
        ).select(
            *verdict("customer.c_custkey unique", F.col("n"), F.col("dup"))
        ),
        li.agg(
            cnt.alias("n"),
            (
                cnt
                - F.count_distinct(
                    F.col("l_orderkey") * 8 + F.col("l_linenumber")
                )
            ).alias("dup"),
        ).select(
            *verdict(
                "lineitem.(orderkey,linenumber) unique",
                F.col("n"),
                F.col("dup"),
            )
        ),
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(cnt.alias("bad"))
        .join(F.broadcast(o.agg(cnt.alias("n"))))
        .select(
            *verdict(
                "orders.o_custkey references customer",
                F.col("n"),
                F.col("bad"),
            )
        ),
        docs.agg(
            cnt.alias("n"),
            F.sum(
                F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
            ).cast("bigint").alias("bad"),
        ).select(
            *verdict(
                "documents.n_chars = length(text)", F.col("n"), F.col("bad")
            )
        ),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionAll(r)
    return out.orderBy("rule")


# -- profile drift ------------------------------------------------------------

#: fixed baseline/current boundary for the fixture's 30-day event span; a
#: production deployment parameterizes this (yesterday vs trailing window)
_DRIFT_SPLIT = "2024-01-16 00:00:00"

#: flag a type whose share of traffic moved by more than this percent
#: relative to baseline (integer cross-multiply, see docstring)
_DRIFT_REL_PCT = 2


@query(
    "dq_profile_drift",
    family="quality",
    oracle=f"""
        WITH s AS (
          SELECT event_type,
                 count(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                            THEN 1 END) AS base_n,
                 count(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                            THEN 1 END) AS cur_n,
                 count(DISTINCT CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                                     THEN user_id END) AS base_users,
                 count(DISTINCT CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                                     THEN user_id END) AS cur_users,
                 CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                       THEN CAST(value AS DECIMAL(38,2)) END), 0) AS DOUBLE)
                   AS base_value_sum,
                 CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                       THEN CAST(value AS DECIMAL(38,2)) END), 0) AS DOUBLE)
                   AS cur_value_sum,
                 CAST(sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                               AND value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS base_nulls,
                 CAST(sum(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                               AND value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS cur_nulls
          FROM events GROUP BY event_type
        ), t AS (
          SELECT *,
                 CAST(sum(base_n) OVER () AS HUGEINT) AS bt,
                 CAST(sum(cur_n) OVER () AS HUGEINT) AS ct
          FROM s
        )
        SELECT event_type, base_n, cur_n, base_users, cur_users,
               base_value_sum, cur_value_sum, base_nulls, cur_nulls,
               CASE WHEN abs(CAST(cur_n AS HUGEINT) * bt
                             - CAST(base_n AS HUGEINT) * ct) * 100
                         >= {_DRIFT_REL_PCT} * CAST(base_n AS HUGEINT) * ct
                    THEN 1 ELSE 0 END AS share_drift
        FROM t ORDER BY event_type
    """,
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift between a baseline and a current window of the
    event stream (the Deequ/Evidently monitoring shape): per event type,
    counts, distinct users, exact value sums, and null counts for both
    windows, plus a share-drift flag — does this type's fraction of total
    traffic differ from baseline by more than {_DRIFT_REL_PCT}% relative.

    Determinism: the share test is the cross-multiplied integer comparison
    ``|cur_n*base_total - base_n*cur_total| * 100 >= pct * base_n *
    cur_total`` — no float ratio crosses engines. The products are computed
    in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): BIGINT products would
    overflow once both factors pass ~3e9, i.e. exactly at the 100 TB scale
    this is for. Value sums accumulate in DECIMAL(38,2) (order-independent)
    and only the final cast is DOUBLE.

    Scale: ONE scan of events — every per-window stat is a conditional
    aggregate over the same groupBy(event_type), partial-aggregated
    map-side; the two count-distincts are the only expanded state. The
    window totals run over the per-type aggregate (rows = #types), so the
    second exchange is O(types), not O(events)."""
    e = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    base = F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp_ntz")
    cur = ~base
    dec = lambda c: c.cast("decimal(38,2)")  # noqa: E731
    s = e.groupBy("event_type").agg(
        F.count(F.when(base, 1)).alias("base_n"),
        F.count(F.when(cur, 1)).alias("cur_n"),
        F.count_distinct(F.when(base, F.col("user_id"))).alias("base_users"),
        F.count_distinct(F.when(cur, F.col("user_id"))).alias("cur_users"),
        F.coalesce(F.sum(dec(F.when(base, F.col("value")))), F.lit(0))
        .cast("double")
        .alias("base_value_sum"),
        F.coalesce(F.sum(dec(F.when(cur, F.col("value")))), F.lit(0))
        .cast("double")
        .alias("cur_value_sum"),
        F.sum(F.when(base & F.col("value").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("base_nulls"),
        F.sum(F.when(cur & F.col("value").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("cur_nulls"),
    )
    w = Window.partitionBy()
    big = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    t = s.withColumn("bt", F.sum("base_n").over(w).cast("decimal(38,0)"))
    t = t.withColumn("ct", F.sum("cur_n").over(w).cast("decimal(38,0)"))
    drift = (
        F.abs(big("cur_n") * F.col("bt") - big("base_n") * F.col("ct")) * 100
        >= F.lit(_DRIFT_REL_PCT) * big("base_n") * F.col("ct")
    )
    return t.select(
        "event_type",
        "base_n",
        "cur_n",
        "base_users",
        "cur_users",
        "base_value_sum",
        "cur_value_sum",
        "base_nulls",
        "cur_nulls",
        F.when(drift, F.lit(1)).otherwise(F.lit(0)).alias("share_drift"),
    ).orderBy("event_type")


#: KS drift threshold, per-mille: flag when D >= _KS_PCT_MILLE / 1000
_KS_PCT_MILLE = 30


@query(
    "dq_ks_drift",
    family="quality",
    bench=True,
    oracle=f"""
        WITH c AS (
          SELECT event_type, value,
                 count(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                            THEN 1 END) AS b,
                 count(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                            THEN 1 END) AS c
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type, value
        ), t AS (
          SELECT event_type, value,
                 CAST(sum(b) OVER (PARTITION BY event_type) AS HUGEINT) AS n1,
                 CAST(sum(c) OVER (PARTITION BY event_type) AS HUGEINT) AS n2,
                 CAST(sum(b) OVER (PARTITION BY event_type ORDER BY value)
                      AS HUGEINT) AS cb,
                 CAST(sum(c) OVER (PARTITION BY event_type ORDER BY value)
                      AS HUGEINT) AS cc
          FROM c
        ), d AS (
          SELECT event_type, value, n1, n2,
                 abs(cb * n2 - cc * n1) AS diff
          FROM t
        ), mx AS (
          SELECT event_type, max(diff) AS d_dec FROM d GROUP BY event_type
        )
        SELECT d.event_type,
               CAST(max(d.n1) AS BIGINT) AS n_base,
               CAST(max(d.n2) AS BIGINT) AS n_cur,
               CAST(max(mx.d_dec) AS BIGINT) AS d_num,
               min(d.value) AS ks_at,
               CASE WHEN max(mx.d_dec) * 1000
                         >= {_KS_PCT_MILLE} * max(d.n1) * max(d.n2)
                    THEN 1 ELSE 0 END AS drift
        FROM d JOIN mx ON d.event_type = mx.event_type AND d.diff = mx.d_dec
        GROUP BY d.event_type
        ORDER BY d.event_type
    """,
)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov drift test on the value
    distribution, per event type, between the baseline and current windows.
    The D statistic's numerator ``max |cum_base*n_cur - cum_cur*n_base|``
    is pure integer arithmetic over the two ECDFs evaluated at every
    observed value — no float ECDF, no approximation — and the drift flag
    cross-multiplies against ``{_KS_PCT_MILLE}/1000``. ``ks_at`` is the
    smallest value attaining the maximum gap (where the distributions
    diverge most — the actionable part of a drift alert).

    Determinism: products run in HUGEINT (DuckDB) / DECIMAL(38,0) (Spark);
    the emitted ``d_num`` is cast to BIGINT, exact while both window counts
    stay under ~3e9 (beyond that, emit the DECIMAL — the flag itself never
    overflows). ``ks_at`` is a raw parquet double, bit-identical across
    engines.

    Scale: one scan collapses events to per-(type, value) counts map-side;
    the cumulative ECDFs are range-ordered window sums WITHIN each type.
    A single type's distinct values do form one sort partition — at 100 TB
    you bucket values by a coarse deterministic range key first (e.g.
    floor(value)), cumulate within buckets, and add broadcast per-bucket
    prefix offsets; the statistic is unchanged because cum sums compose.
    The fixture's per-type cardinality doesn't need the second level, so
    this plan keeps the simple form and documents the composition."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    from pyspark.sql import Window

    base = F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp_ntz")
    c = e.groupBy("event_type", "value").agg(
        F.count(F.when(base, 1)).alias("b"),
        F.count(F.when(~base, 1)).alias("c"),
    )
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("value")
    dec = "decimal(38,0)"
    t = c.select(
        "event_type",
        "value",
        F.sum("b").over(wt).cast(dec).alias("n1"),
        F.sum("c").over(wt).cast(dec).alias("n2"),
        F.sum("b").over(wo).cast(dec).alias("cb"),
        F.sum("c").over(wo).cast(dec).alias("cc"),
    )
    d = t.select(
        "event_type",
        "value",
        "n1",
        "n2",
        F.abs(F.col("cb") * F.col("n2") - F.col("cc") * F.col("n1")).alias(
            "diff"
        ),
    )
    mx = d.groupBy("event_type").agg(F.max("diff").alias("d_dec"))
    return (
        d.join(mx, "event_type")
        .filter(F.col("diff") == F.col("d_dec"))
        .groupBy("event_type")
        .agg(
            F.max("n1").cast("bigint").alias("n_base"),
            F.max("n2").cast("bigint").alias("n_cur"),
            F.max("d_dec").cast("bigint").alias("d_num"),
            F.min("value").alias("ks_at"),
            F.when(
                F.max("d_dec") * 1000
                >= F.lit(_KS_PCT_MILLE) * F.max("n1") * F.max("n2"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("drift"),
        )
        .orderBy("event_type")
    )


@query(
    "dq_mad_outliers",
    family="quality",
    oracle="""
        WITH vc AS (
          SELECT event_type, value, count(*) AS c
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type, value
        ), t AS (
          SELECT event_type, value, c,
                 sum(c) OVER (PARTITION BY event_type ORDER BY value) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n
          FROM vc
        ), med AS (
          SELECT event_type,
                 CAST(max(n) AS BIGINT) AS n,
                 min(CASE WHEN cum >= (n + 1) // 2 THEN value END) AS med
          FROM t GROUP BY event_type
        ), dev AS (
          SELECT vc.event_type, abs(vc.value - med.med) AS dev, vc.c
          FROM vc JOIN med USING (event_type)
        ), dc AS (
          SELECT event_type, dev, sum(c) AS c
          FROM dev GROUP BY event_type, dev
        ), t2 AS (
          SELECT event_type, dev, c,
                 sum(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n
          FROM dc
        ), mad AS (
          SELECT event_type,
                 min(CASE WHEN cum >= (n + 1) // 2 THEN dev END) AS mad
          FROM t2 GROUP BY event_type
        ), o AS (
          SELECT d.event_type,
                 CAST(sum(d.c) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN d.dev > 3 * mad.mad THEN d.c
                               ELSE 0 END) AS BIGINT) AS n_outliers,
                 max(d.dev) AS max_abs_dev
          FROM dev d JOIN mad USING (event_type)
          GROUP BY d.event_type
        )
        SELECT o.event_type, o.n, med.med AS median_value, mad.mad,
               o.n_outliers, o.max_abs_dev
        FROM o
        JOIN med USING (event_type)
        JOIN mad USING (event_type)
        ORDER BY o.event_type
    """,
)
def dq_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median / MAD (median
    absolute deviation) of ``value`` and the count of rows beyond the
    classic ``3 x MAD`` fence — the quality gate that survives the heavy
    tails that wreck mean/stddev z-scores.

    EXACT and cross-engine deterministic by construction: the median is
    the LOWER-MIDDLE ORDER STATISTIC (smallest value whose cumulative
    count reaches ``(n+1) div 2``) — a selection of an existing double,
    never an interpolation, so there is no ``a + (b-a)*q`` vs ``(a+b)/2``
    rounding divergence between engines; MAD applies the same selection to
    the deviation distribution, and the fence compares raw doubles against
    ``3 * mad`` (one identical IEEE product both sides).

    Scale shape (the ks_drift discipline): NO window ever runs over the
    fact table — facts reduce once to the (event_type, value) distribution
    table with map-side combine, and every window/median trick runs on
    that distribution (cardinality = distinct values, not rows). Two
    broadcast joins attach the 5-row median/MAD tables back. At 100 TB
    this is two fact scans (value pass + deviation pass), both
    shuffle-light."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vc = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wo = W.partitionBy("event_type").orderBy("value")
    wp = W.partitionBy("event_type")
    t = vc.select(
        "event_type",
        "value",
        "c",
        F.sum("c").over(wo).alias("cum"),
        F.sum("c").over(wp).alias("n"),
    )
    med = t.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("value"))
        ).alias("med"),
    )
    dev = vc.join(F.broadcast(med.select("event_type", "med")), "event_type")
    dev = dev.select(
        "event_type",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
        "c",
    )
    dc = dev.groupBy("event_type", "dev").agg(F.sum("c").alias("c"))
    wo2 = W.partitionBy("event_type").orderBy("dev")
    t2 = dc.select(
        "event_type",
        "dev",
        "c",
        F.sum("c").over(wo2).alias("cum"),
        F.sum("c").over(wp).alias("n"),
    )
    mad = t2.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("dev"))
        ).alias("mad")
    )
    o = (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), F.col("c")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.max("dev").alias("max_abs_dev"),
        )
    )
    return (
        o.join(F.broadcast(med.select("event_type", "med")), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "n",
            F.col("med").alias("median_value"),
            "mad",
            "n_outliers",
            "max_abs_dev",
        )
        .orderBy("event_type")
    )


# -- Benford first-digit profile ---------------------------------------------


@query(
    "dq_benford_digits",
    family="quality",
    oracle="""
        WITH v AS (
          SELECT CAST(substr(CAST(CAST(floor(abs(l_extendedprice)) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS INT) AS digit
          FROM lineitem
          WHERE abs(l_extendedprice) >= 1
        ),
        c AS (SELECT digit, count(*) AS n FROM v GROUP BY digit),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT digit,
               CAST(n AS BIGINT) AS n_values,
               CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        FROM c, t
        ORDER BY digit
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of a monetary fact column —
    the Benford's-law profile auditors and DQ monitors run on financial
    facts (fabricated or truncated feeds skew the leading-digit histogram;
    public forensic-accounting literature). Emits the observed digit
    histogram and shares; the expected log10(1+1/d) curve is deliberately
    NOT computed in-engine — libm log10 may differ in the last ulp across
    engines (the cross-engine float discipline, functions/portable.py),
    while n/total division of exact BIGINTs is IEEE-identical everywhere.

    Scale: map-only projection (floor/abs/string-head, all codegen'd) into
    a 9-bucket hash aggregate with map-side combine — the cheapest full
    scan a 100 TB fact table can host; the total is a 9-row broadcast.

    First digit via the decimal STRING head of floor(abs(x)) — not
    repeated division — so both engines take the identical integer
    rendering path."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.abs(F.col("l_extendedprice")) >= 1
    )
    v = li.select(
        F.substring(
            F.floor(F.abs("l_extendedprice")).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    c = v.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n_values"),
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("digit")
    )


#: the warehouse's declared FK graph — child table, FK column, parent
#: table, PK column. One check row per edge.
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events", "user_id", "customer", "c_custkey"),
)


@query(
    "dq_referential_integrity",
    family="quality",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{child}.{fk} -> {parent}.{pk}' AS relationship,
               CAST(count(*) AS BIGINT) AS child_rows,
               CAST(count(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT)
                 AS orphan_rows,
               CAST(count(DISTINCT c.{fk})
                    FILTER (WHERE p.{pk} IS NULL) AS BIGINT) AS orphan_keys
        FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
          ON c.{fk} = p.{pk}
        """
        for child, fk, parent, pk in _FK_EDGES
    )
    + "\nORDER BY relationship",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the warehouse's FK graph: for each
    declared child.fk -> parent.pk edge, the child row count, the rows
    whose key has no parent (orphans), and how many distinct keys are
    broken — the first gate a migration/backfill pipeline checks before
    publishing a layer (the reference's staged prestg->stg flow,
    ``dags/s3_data_copy_test.py``, implies exactly these edges but the
    warehouse enforced nothing).

    Scale notes (100 TB): one LEFT join per edge against the parent's
    DISTINCT key projection — key columns only ever shuffle (the scan
    prunes to the two key columns; parents like nation/customer broadcast
    under AQE, fact-fact edges sort-merge on the key). The five edge
    checks are independent plans unioned after aggregation — each is one
    shuffle, no edge blocks another, and a clean warehouse returns five
    all-zero rows rather than an empty result (absence of evidence made
    explicit)."""
    rows = []
    for child, fk, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(F.col(pk)).distinct()
        joined = c.select(F.col(fk)).join(
            p, c[fk] == p[pk], "left"
        )
        rows.append(
            joined.agg(
                F.lit(f"{child}.{fk} -> {parent}.{pk}").alias(
                    "relationship"
                ),
                F.count(F.lit(1)).cast("bigint").alias("child_rows"),
                F.count(F.when(F.col(pk).isNull(), 1))
                .cast("bigint")
                .alias("orphan_rows"),
                F.count_distinct(
                    F.when(F.col(pk).isNull(), F.col(fk))
                )
                .cast("bigint")
                .alias("orphan_keys"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("relationship")
