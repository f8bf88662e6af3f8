"""Data-quality profiling (ETL observability surface).

Every warehouse ETL needs a cheap answer to "what landed?": row counts,
null fractions, distinct cardinalities, and value ranges per column — the
checks the reference would run as Snowflake queries through its arbitrary-
SQL pass-through (``/root/reference/dags/dev_db_test.py:41-70``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load

#: columns profiled (name, spark/duck-identical VARCHAR rendering is safe
#: for these types: bigint, double with short decimal values, varchar)
_PROFILE_COLS = ("l_orderkey", "l_quantity", "l_discount", "l_returnflag")


def _sql_one(col: str) -> str:
    return f"""
        SELECT '{col}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({col}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(min({col}) AS VARCHAR) AS min_str,
               CAST(max({col}) AS VARCHAR) AS max_str
        FROM lineitem"""


@query(
    "diag_table_stats",
    family="profiling",
    oracle=" UNION ALL ".join(_sql_one(c) for c in _PROFILE_COLS)
    + " ORDER BY col_name",
)
def diag_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of a landed table in ONE scan: row count, null
    count, exact distinct cardinality, min/max (rendered to string so one
    result schema covers every column type; CAST-to-string happens inside
    BOTH engines, so date/double formatting is engine-native and identical).

    Scale notes: the Spark side is a single-pass multi-aggregate — one scan
    feeding every column's aggregates; the k exact DISTINCTs plan through
    one Expand (k-way row multiplication before partial aggregation), which
    is the standard exact formulation. At 100 TB you swap the exact
    distincts for ``approx_count_distinct`` (one pass, no Expand, mergeable
    HLL sketches) — kept exact here because the oracle hash-compares values.
    The per-column UNION in the oracle is DuckDB-side only."""
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stacked = one.selectExpr(
        "stack({n}, {args}) AS (col_name, n_rows, n_null, n_distinct, "
        "min_str, max_str)".format(
            n=len(_PROFILE_COLS),
            args=", ".join(
                f"'{c}', {c}__rows, {c}__null, {c}__distinct, "
                f"{c}__min, {c}__max"
                for c in _PROFILE_COLS
            ),
        )
    )
    return stacked.orderBy("col_name")
