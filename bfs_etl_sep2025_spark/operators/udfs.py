"""UDF surface (SURVEY §2.3 row 'UDF surface'): the Python extension
points — row-at-a-time UDF, vectorized pandas UDF, grouped-map
(``applyInPandas``), grouped-agg pandas UDF (the UDAF analog), the
Arrow-optimized scalar UDF, and the Spark-4 Python UDTF (table function
with LATERAL correlation).

Every UDF here computes something ALSO expressible in SQL, on purpose: the
oracle then cross-checks the Python/Arrow data path itself (serialization,
batching, grouping, null handling) rather than trusting it. Deterministic
arithmetic only — group means etc. are avoided because pandas' pairwise
summation differs from SQL's left-fold; min/max/count/elementwise are
bit-exact in both worlds.

Scale notes (100 TB): row-at-a-time UDFs pay per-row serde — they exist for
parity and are documented as the slow path (the plan shows BatchEvalPython;
everything else in this engine avoids it). Pandas UDFs move Arrow record
batches — 10-100x better; grouped-map additionally shuffles by key, and a
single giant group OOMs the executor hosting it: partition keys must be
chosen with bounded group size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load


@query(
    "udf_python_scalar",
    family="udfs",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 300000 THEN 'platinum'
                    WHEN o_totalprice >= 100000 THEN 'gold'
                    ELSE 'standard' END AS tier
        FROM orders
        WHERE o_orderkey <= 2000
        ORDER BY o_orderkey
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path — per-row pickle serde;
    kept off every hot query, present for API parity)."""

    @F.udf(T.StringType())
    def tier(price: float) -> str:
        if price >= 300000:
            return "platinum"
        if price >= 100000:
            return "gold"
        return "standard"

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select("o_orderkey", tier("o_totalprice").alias("tier")).orderBy(
        "o_orderkey"
    )


@query(
    "udf_pandas_scalar",
    family="udfs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS settled
        FROM lineitem
        WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: Arrow batches in, numpy elementwise out —
    bitwise-identical to the JVM expression because IEEE doubles don't care
    which engine multiplies them."""

    @F.pandas_udf(T.DoubleType())
    def settle(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1 - discount) * (1 + tax)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        settle("l_extendedprice", "l_discount", "l_tax").alias("settled"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "udf_grouped_map",
    family="udfs",
    oracle="""
        SELECT o_orderkey, o_custkey,
               o_totalprice - min(o_totalprice) OVER (PARTITION BY o_custkey)
                 AS above_cheapest,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice, o_orderkey) AS BIGINT)
                 AS price_rank
        FROM orders
        WHERE o_custkey <= 150
        ORDER BY o_orderkey
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (UDTF analog): each customer's orders
    arrive as one pandas DataFrame; emits per-group derived columns. The
    oracle reproduces the same result with window functions — proving the
    shuffle+group+Arrow path end to end.

    Bounded to a customer-key slice: applyInPandas pays a per-GROUP pandas
    construction cost, so thousands of tiny groups measure Python overhead,
    not the data path — 150 multi-row groups prove the same plumbing."""

    def per_customer(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_totalprice", "o_orderkey"]).reset_index(drop=True)
        pdf["above_cheapest"] = pdf["o_totalprice"] - pdf["o_totalprice"].min()
        pdf["price_rank"] = range(1, len(pdf) + 1)
        return pdf[["o_orderkey", "o_custkey", "above_cheapest", "price_rank"]]

    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 150)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    return (
        o.groupBy("o_custkey")
        .applyInPandas(
            per_customer,
            "o_orderkey long, o_custkey long, above_cheapest double, price_rank long",
        )
        .orderBy("o_orderkey")
    )


@query(
    "udf_grouped_agg",
    family="udfs",
    oracle="""
        SELECT event_type,
               max(value) - min(value) AS value_range,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF analog): scalars per group computed in
    pandas (max-min and count — exact in any engine). Spark forbids mixing
    pandas and JVM aggregates in one agg, so both are pandas UDFs."""

    @F.pandas_udf(T.DoubleType())
    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    @F.pandas_udf(T.LongType())
    def n_rows(v: pd.Series) -> int:
        return len(v)

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            value_range("value").alias("value_range"),
            n_rows("value").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "udf_arrow_scalar",
    family="udfs",
    oracle="""
        SELECT o_orderkey,
               CAST(string_split(o_orderpriority, '-')[1] AS INT)
                 AS priority_rank
        FROM orders
        WHERE o_orderkey <= 2000
        ORDER BY o_orderkey
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 3.5+/4 ``useArrow=True``): scalar
    Python semantics with Arrow-batch transfer instead of per-row pickle —
    the drop-in upgrade for row UDFs that can't be vectorized as pandas.
    The oracle recomputes the parse ('1-URGENT' -> 1) in SQL, cross-checking
    the Arrow data path itself."""

    @F.udf(T.IntegerType(), useArrow=True)
    def priority_rank(p: str) -> int:
        return int(p.split("-")[0])

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey", priority_rank("o_orderpriority").alias("priority_rank")
    ).orderBy("o_orderkey")


_CHUNK_WIDTH = 200


@query(
    "udtf_chunk_text",
    family="udfs",
    oracle=f"""
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
               substring(text, i * {_CHUNK_WIDTH} + 1, {_CHUNK_WIDTH}) AS chunk
        FROM documents, (SELECT unnest(range(0, 512)) AS i) AS s
        WHERE i * {_CHUNK_WIDTH} < length(text)
        ORDER BY doc_id, chunk_idx
    """,
)
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 3.5+/4 ``@udtf``) applied
    with LATERAL correlation: one input document row expands to N chunk
    rows — the canonical context-window chunking step of a RAG/training
    corpus pipeline, and the one Python extension point the surface was
    still missing (scalar, pandas, grouped-map/agg, Arrow scalar are
    above). The oracle reproduces the expansion relationally with a static
    series + substring, cross-checking the UDTF row-expansion path itself
    (Python slicing counts code points, exactly like ANSI ``substring``).

    Scale: a UDTF streams per-row through a Python worker like any Python
    UDF — fine here because chunking is run once per corpus ingest, and the
    expansion is map-only (no shuffle; pushdown still reaches the scan).
    The oracle's static series is capped at 512 chunks (102,400 chars —
    ~180x the longest fixture document, which is under 600 chars at every
    SF); rather than silently diverging past the cap, the UDTF raises on a
    document that exceeds it, so a fixture-shape change fails loudly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string")
    class ChunkText:
        def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
            if text is None:
                return
            w = _CHUNK_WIDTH
            if len(text) > 512 * w:
                raise ValueError(
                    f"document of {len(text)} chars exceeds the 512-chunk "
                    "oracle cap (raise the range(0, 512) in the oracle "
                    "alongside this guard)"
                )
            for i in range((len(text) + w - 1) // w):
                yield i, text[i * w : (i + 1) * w]

    spark.udtf.register("chunk_text_udtf", ChunkText)
    load(spark, sf_dir, "documents").createOrReplaceTempView("udtf_chunk_docs_v")
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk
        FROM udtf_chunk_docs_v, LATERAL chunk_text_udtf(text) AS c
        ORDER BY doc_id, chunk_idx
        """
    )
