"""Spark-4 SQL-surface features with direct Snowflake-dialect parity:
recursive CTEs, SQL-defined scalar and table functions, session variables,
and procedural SQL scripting.

Reference parity: the reference's task surface is arbitrary Snowflake SQL
(``/root/reference/dags/dev_db_test.py:41-70`` passes any statement list to
the warehouse), and Snowflake users lean on exactly these four dialect
features — ``WITH RECURSIVE``, ``CREATE FUNCTION ... RETURNS ... AS``
(SQL UDFs/UDTFs), session variables (``SET var = ...`` / ``$var``), and
Snowflake Scripting (``BEGIN ... WHILE ... END``). Spark 4 grew native
equivalents for all four, so a reference user's SQL migrates shape-for-shape
instead of being rewritten into DataFrame calls.

Scale notes (100 TB):
- A recursive CTE re-executes its step plan per iteration; the input edge
  list is computed ONCE into a cached/materialized view (graph._edges) so
  each level is a single equi-join on the frontier, not a re-derivation of
  the pair-generation subtree. Frontier shuffles on the join key like any
  iterative join (same shape as dedup.py's label propagation, which remains
  the scale path for UNBOUNDED closure — the CTE here is depth-bounded).
- SQL UDFs inline into the calling plan at analysis time — they are
  codegen'd expressions, NOT a per-row function-call boundary; zero cost vs
  writing the expression inline.
- Session variables resolve to literals at analysis time; a variable set
  from a scalar subquery runs that subquery once, then the consuming query
  plans with a constant (enabling partition pruning a correlated rewrite
  would lose).
- Scripting control flow runs on the driver between statements — the loop
  below iterates over scalars, never over data; data still moves only in
  set-oriented statements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.operators.graph import _EDGES_CTE, _edges
from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load

#: The recursive step SELECTs DISTINCT: without it the UNION ALL frontier
#: carries one row per PATH, which explodes combinatorially on dense
#: graphs (tripped Spark's 1M recursion row limit at the 10x scale point);
#: per-level DISTINCT bounds every level by |V| while leaving the closing
#: min(depth) untouched. Identical clause in both engines.
_SYM_AND_REACH = """
reach(node, depth) AS (
  SELECT src, 0 FROM (SELECT DISTINCT src FROM sym WHERE src < 3) AS seeds
  UNION ALL
  SELECT DISTINCT s.dst, r.depth + 1
  FROM reach r JOIN sym s ON s.src = r.node
  WHERE r.depth < 2
)
SELECT node AS user_id, CAST(min(depth) AS INT) AS hops
FROM reach GROUP BY node ORDER BY user_id
"""


@query(
    "sql_recursive_cte",
    family="sql",
    oracle=f"""
        WITH RECURSIVE {_EDGES_CTE},
        sym AS (
          SELECT u AS src, v AS dst FROM edges
          UNION ALL
          SELECT v AS src, u AS dst FROM edges
        ),{_SYM_AND_REACH}
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH RECURSIVE`` (new in Spark 4): breadth-first reachability from
    a seed user set over the behavioral co-occurrence graph — min-hop
    distance for every user within 2 hops. The edge list is the graph
    family's cached bucket-blocked join (graph.py), materialized once into
    a temp view so the per-level step is a single frontier equi-join.

    Spark 4 does not yet support distinct-``UNION`` recursion, so levels
    accumulate with ``UNION ALL``, the recursive step SELECTs DISTINCT
    (bounding each level by |V| — without it, path multiplicity tripped
    the engine's 1,000,000-row recursion guard on the dense 10x graph),
    and the closing ``GROUP BY min(depth)`` collapses cross-level
    multiplicity — correct for any bounded depth; unbounded transitive
    closure at scale stays on the label-propagation loop (dedup.py), which
    dedupes per round."""
    _edges(spark, sf_dir).createOrReplaceTempView("rec_edges_v")
    return spark.sql(
        """
        WITH RECURSIVE sym AS (
          SELECT u AS src, v AS dst FROM rec_edges_v
          UNION ALL
          SELECT v AS src, u AS dst FROM rec_edges_v
        ),"""
        + _SYM_AND_REACH
    )


@query(
    "fn_sql_udf",
    family="sql",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS settled,
               CASE WHEN l_extendedprice >= 50000 THEN 'high'
                    WHEN l_extendedprice >= 20000 THEN 'mid'
                    ELSE 'low' END AS band
        FROM lineitem
        WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 ``CREATE FUNCTION ... RETURNS
    ... RETURN expr`` — the open twin of Snowflake's SQL UDF). Unlike every
    Python UDF in udfs.py, a SQL UDF INLINES into the caller at analysis
    time: the plan below is identical to writing the expressions inline —
    codegen'd, no function-call boundary, no serde. The oracle recomputes
    both bodies inline, proving exactly that equivalence."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION settle_sql(
               p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE
           RETURN p * (1 - d) * (1 + t)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION band_sql(p DOUBLE)
           RETURNS STRING
           RETURN CASE WHEN p >= 50000 THEN 'high'
                       WHEN p >= 20000 THEN 'mid'
                       ELSE 'low' END"""
    )
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sqludf_lineitem_v")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               settle_sql(l_extendedprice, l_discount, l_tax) AS settled,
               band_sql(l_extendedprice) AS band
        FROM sqludf_lineitem_v
        WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber
        """
    )


@query(
    "fn_sql_table_udf",
    family="sql",
    oracle="""
        SELECT o_orderkey, CAST(i AS INT) AS i,
               o_totalprice / 3 AS amount
        FROM orders, (SELECT unnest(range(1, 4)) AS i) AS s
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey, i
    """,
)
def fn_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function applied with LATERAL (Spark 4): each
    order row expands into an n-row instalment schedule — the set-returning
    flavor of Snowflake's SQL UDTF. Like the scalar form it inlines as a
    correlated subplan (here: an explode over a sequence literal), never a
    Python boundary; the oracle's static series join is the identical
    relational shape."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION instalments(
               p DOUBLE, n INT) RETURNS TABLE(i INT, amount DOUBLE)
           RETURN SELECT i, p / n AS amount
                  FROM (SELECT explode(sequence(1, n)) AS i)"""
    )
    load(spark, sf_dir, "orders").createOrReplaceTempView("sqltf_orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, s.i, s.amount
        FROM sqltf_orders_v, LATERAL instalments(o_totalprice, 3) AS s
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey, s.i
        """
    )


@query(
    "fn_session_variables",
    family="sql",
    oracle="""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM orders
        WHERE o_totalprice
              > (SELECT max(o_totalprice) / 2 FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def fn_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables (Spark 4 ``DECLARE VARIABLE`` / ``SET VAR`` — the
    open twin of Snowflake's ``SET var = ...`` / ``$var``): the cutoff is
    computed ONCE by a scalar-subquery assignment, then the consuming query
    plans against a literal — which keeps the filter pushdown-able and
    prune-able where a correlated scalar subquery would not be. max()/2 is
    float-exact (one comparison against an exactly-halved double), so the
    oracle's inline subquery form is bitwise the same predicate."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("sqlvar_orders_v")
    spark.sql("DECLARE OR REPLACE VARIABLE price_cutoff DOUBLE")
    spark.sql(
        "SET VAR price_cutoff = (SELECT max(o_totalprice) / 2 FROM sqlvar_orders_v)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM sqlvar_orders_v
        WHERE o_totalprice > price_cutoff
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "sql_scripting_block",
    family="sql",
    oracle="""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(55 AS INT) AS fib
        FROM orders
        WHERE o_orderkey % 55 = 0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedural SQL scripting (Spark 4 ``BEGIN ... END`` blocks with
    DECLARE / WHILE / SET — the open twin of Snowflake Scripting): driver-
    side control flow computes fib(10)=55 across 9 loop iterations, then
    the final set-oriented statement uses the scalar result. The block
    returns its last result set, which is what the oracle reproduces with
    the loop's closed-form value inlined. Control flow iterates over
    SCALARS on the driver; data always moves in whole set-oriented
    statements — the discipline that keeps scripting scale-safe."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load(spark, sf_dir, "orders").createOrReplaceTempView("sqlscript_orders_v")
    return spark.sql(
        """
        BEGIN
          DECLARE a INT DEFAULT 0;
          DECLARE b INT DEFAULT 1;
          DECLARE i INT DEFAULT 0;
          DECLARE tmp INT;
          WHILE i < 9 DO
            SET tmp = a + b; SET a = b; SET b = tmp; SET i = i + 1;
          END WHILE;
          SELECT o_orderpriority, count(*) AS n, b AS fib
          FROM sqlscript_orders_v
          WHERE o_orderkey % b = 0
          GROUP BY o_orderpriority, b
          ORDER BY o_orderpriority;
        END
        """
    )


@query(
    "sql_group_by_all",
    family="sql",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (Spark 3.4+/Snowflake/DuckDB all speak it): the
    grouping key list is inferred from the non-aggregate select items —
    the dialect idiom analysts reach for constantly, and a pure
    analysis-time rewrite (the optimized plan is identical to the
    explicit GROUP BY, so nothing changes at any scale). The oracle runs
    the SAME text modulo the view name — three engines, one statement.
    Revenue is the exact-DECIMAL portable sum."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("gba_orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                 AS revenue
        FROM gba_orders_v
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


def _masking_stmts(spark: SparkSession, stmts: list[str]) -> None:
    from bfs_etl_sep2025_spark.plans import masking as M

    for s in stmts:
        M.handle_statement(spark, s, "sql_masking_query")


@query(
    "sql_masking_column_policy",
    family="sql",
    oracle="""
        SELECT c_custkey,
               CASE WHEN 'PUBLIC' IN ('ANALYST', 'ADMIN') THEN c_name
                    ELSE '***MASKED***' END AS name_out,
               c_mktsegment
        FROM customer
        WHERE c_custkey <= 200
        ORDER BY c_custkey
    """,
)
def sql_masking_column_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic data masking under the external gate (VERDICT r10 item 8):
    a CURRENT_ROLE()-gated masking policy bound to ``c_name``, read as
    role PUBLIC through the shim's masked view. The oracle recomputes the
    policy CASE relationally with the role folded to the same literal the
    shim folds at read time — hash parity proves the masked projection,
    the pass-through columns, and the row count are all unchanged by the
    governance layer. The masked view is a plain projection over the
    scan, so Catalyst still pushes ``c_custkey <= 200`` down to parquet
    (pinned by tests/test_plans.py::test_masked_read_pushes_filters_down);
    at 100 TB masking costs one codegen'd CASE per row, zero shuffles."""
    from bfs_etl_sep2025_spark.plans import masking as M

    base = "mask_customer_src"
    load(spark, sf_dir, "customer").createOrReplaceTempView(base)
    _masking_stmts(
        spark,
        [
            f"ALTER TABLE {base} MODIFY COLUMN c_name UNSET MASKING POLICY",
            "CREATE OR REPLACE MASKING POLICY name_mask AS (val STRING) "
            "RETURNS STRING -> CASE WHEN CURRENT_ROLE() IN "
            "('ANALYST', 'ADMIN') THEN val ELSE '***MASKED***' END",
            f"ALTER TABLE {base} MODIFY COLUMN c_name "
            "SET MASKING POLICY name_mask",
            "USE ROLE PUBLIC",
        ],
    )
    view = M.resolve_masked_view(spark, base)
    out = (
        spark.table(view)
        .filter(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.col("c_name").alias("name_out"),
            "c_mktsegment",
        )
        .orderBy("c_custkey")
    )
    # teardown so repeated invocations (and the golden masking tests in the
    # same session) start clean; the resolved view's SQL text is already
    # baked, so the lazy `out` plan is unaffected
    _masking_stmts(
        spark,
        [
            f"ALTER TABLE {base} MODIFY COLUMN c_name UNSET MASKING POLICY",
            "DROP MASKING POLICY name_mask",
        ],
    )
    return out


@query(
    "sql_masking_row_policy",
    family="sql",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_visible,
               CASE WHEN 'PUBLIC' IN ('ADMIN') THEN min(c_name)
                    ELSE '***MASKED***' END AS sample_name
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def sql_masking_row_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-access policy + column mask COMPOSED (the Snowflake governance
    stack): as role PUBLIC only the policy's allowed segments survive the
    row filter, and the name column masks — the oracle recomputes both
    relationally with the role folded. The row predicate sits in the
    masked view's WHERE over the RAW columns (evaluated before masks, as
    in Snowflake), so it pushes down to the scan as an ordinary
    predicate. min(string) runs only on the ADMIN branch, which this
    query never takes — the masked aggregate stays a literal both sides."""
    from bfs_etl_sep2025_spark.plans import masking as M

    base = "mask_customer_rows_src"
    load(spark, sf_dir, "customer").createOrReplaceTempView(base)
    _masking_stmts(
        spark,
        [
            f"ALTER TABLE {base} DROP ROW ACCESS POLICY seg_policy",
            f"ALTER TABLE {base} MODIFY COLUMN c_name UNSET MASKING POLICY",
            "CREATE OR REPLACE ROW ACCESS POLICY seg_policy AS "
            "(seg STRING) RETURNS BOOLEAN -> CASE WHEN CURRENT_ROLE() "
            "IN ('ADMIN') THEN TRUE ELSE seg IN ('BUILDING', 'MACHINERY') "
            "END",
            f"ALTER TABLE {base} ADD ROW ACCESS POLICY seg_policy "
            "ON (c_mktsegment)",
            "CREATE OR REPLACE MASKING POLICY name_mask_r AS (val STRING) "
            "RETURNS STRING -> CASE WHEN CURRENT_ROLE() IN ('ADMIN') "
            "THEN val ELSE '***MASKED***' END",
            f"ALTER TABLE {base} MODIFY COLUMN c_name "
            "SET MASKING POLICY name_mask_r",
            "USE ROLE PUBLIC",
        ],
    )
    view = M.resolve_masked_view(spark, base)
    out = (
        spark.table(view)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_visible"),
            F.min("c_name").alias("sample_name"),
        )
        .orderBy("c_mktsegment")
    )
    _masking_stmts(
        spark,
        [
            f"ALTER TABLE {base} MODIFY COLUMN c_name UNSET MASKING POLICY",
            "DROP MASKING POLICY name_mask_r",
            f"ALTER TABLE {base} DROP ROW ACCESS POLICY seg_policy",
            "DROP ROW ACCESS POLICY seg_policy",
        ],
    )
    return out
