"""Source-format scans and reshaping (SURVEY §2.3 scans/sources + pivot's
inverse).

JSON-lines and delimited-CSV scans are proven by round-trip: the query
writes a deterministic extract of the fixtures to a scratch location with
Spark, then BOTH engines read those same files back — so the oracle checks
Spark's reader against DuckDB's reader on identical bytes (writer bugs
surface as reader mismatches).

Scale notes: JSON/CSV scans parallelize per file-split like parquet but
push down nothing (full-row parse); the engine treats them as landing
formats only — CsvCopyTask's job is precisely to move them into parquet
tables. Explicit schemas everywhere; inference is O(extra pass) and
non-deterministic under schema drift.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load

_SCRATCH = os.path.join(tempfile.gettempdir(), "bfs_format_scratch")


def _stage_jsonlines(spark: SparkSession, sf_dir: str) -> str:
    out = os.path.join(_SCRATCH, f"events_json_{os.path.basename(sf_dir.rstrip('/'))}")
    (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value", "props")
        .coalesce(4)
        .write.mode("overwrite")
        .json(out)
    )
    return out


@query(
    "scan_jsonlines",
    family="formats",
    # The oracle reads the ORIGINAL parquet: equality proves Spark's
    # JSON write -> JSON read round trip is lossless for these types
    # (bigint/string exact; doubles via shortest-repr, parse-exact).
    oracle="""
        SELECT event_id, user_id, event_type, value, props
        FROM events
        ORDER BY event_id
    """,
)
def scan_jsonlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with explicit schema over a freshly staged Spark
    JSON extract of the events table (writer + reader proven together)."""
    path = _stage_jsonlines(spark, sf_dir)
    schema = (
        "event_id bigint, user_id bigint, event_type string, "
        "value double, props string"
    )
    return spark.read.schema(schema).json(path).orderBy("event_id")


@query(
    "scan_csv_roundtrip",
    family="formats",
    # Oracle reads the original parquet — equality proves the delimited
    # write -> options-driven read round trip (sep, header, timestamps).
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS DATE) AS o_orderdate
        FROM orders
        ORDER BY o_orderkey
    """,
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited-text scan: stage a pipe-delimited extract with Spark's CSV
    writer, read it back with explicit schema + reader options (the same
    option surface CsvCopyTask maps COPY-INTO formats onto)."""
    out = os.path.join(
        _SCRATCH, f"orders_csv_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .coalesce(2)
        .write.mode("overwrite")
        .options(sep="|", header=True)
        .csv(out)
    )
    schema = (
        "o_orderkey bigint, o_orderstatus string, o_totalprice double, "
        "o_orderdate date"
    )
    return (
        spark.read.schema(schema)
        .options(sep="|", header=True)
        .csv(out)
        .orderBy("o_orderkey")
    )


@query(
    "unpivot_stack",
    family="formats",
    oracle="""
        WITH wide AS (
          SELECT o_orderstatus,
                 count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
                 count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
          FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, kind, n
        FROM wide
        UNPIVOT (n FOR kind IN (urgent, low))
        ORDER BY o_orderstatus, kind
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot's inverse: widen then melt back via stack() — long format is
    what aggregation pipelines want; unpivot is pure projection (zero
    shuffle beyond the seed aggregate)."""
    o = load(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("urgent"),
        F.count(F.when(F.col("o_orderpriority") == "5-LOW", 1)).alias("low"),
    )
    return wide.selectExpr(
        "o_orderstatus",
        "stack(2, 'urgent', urgent, 'low', low) AS (kind, n)",
    ).orderBy("o_orderstatus", "kind")


@query(
    "scan_orc_roundtrip",
    family="formats",
    # Oracle reads the original parquet — equality proves the columnar ORC
    # write -> read round trip preserves types (incl. timestamp) and rows.
    oracle="""
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier
        ORDER BY s_suppkey
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar scan: stage an ORC extract with Spark's native writer,
    read it back. ORC is the second first-class columnar format in Spark's
    DataSource V2 (same vectorized reader, predicate pushdown, and column
    pruning as parquet), so the round trip proves the engine is not
    parquet-only.

    Scale notes: the write is shuffle-free (each input partition writes its
    own stripe-aligned file); the read is a vectorized columnar scan with
    the same PushedFilters/ReadSchema behavior the parquet scans are audited
    for."""
    out = os.path.join(
        _SCRATCH, f"supplier_orc_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    (
        load(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .coalesce(2)
        .write.mode("overwrite")
        .orc(out)
    )
    return spark.read.orc(out).orderBy("s_suppkey")


@query(
    "scan_text_roundtrip",
    family="formats",
    # Oracle aggregates the original table — equality proves the
    # line-oriented write -> whole-line read round trip lost no rows, no
    # characters, and no ordering-sensitive content.
    oracle="""
        SELECT count(*) AS n_lines,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               min(length(text)) AS min_len,
               max(length(text)) AS max_len
        FROM documents
    """,
)
def scan_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unstructured text-file scan (``spark.read.text``): stage the corpus
    as raw one-document-per-line text files (the rawest LLM-ingest format:
    no schema, no delimiter contract), read it back line-oriented, and
    aggregate invariants the round trip must preserve. The fixture corpus
    is newline-free by construction, so line = document holds; a corpus
    with embedded newlines takes the jsonlines path instead
    (scan_jsonlines). Scale: text scans split by line ranges exactly like
    CSV — embarrassingly parallel, no shuffle until the aggregate's tiny
    partials."""
    out = os.path.join(
        _SCRATCH, f"documents_text_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    (
        load(spark, sf_dir, "documents")
        .select("text")
        .coalesce(2)
        .write.mode("overwrite")
        .text(out)
    )
    lines = spark.read.text(out)
    ln = F.length("value")
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(ln).cast("bigint").alias("total_chars"),
        F.min(ln).alias("min_len"),
        F.max(ln).alias("max_len"),
    )


@query(
    "scan_xml_roundtrip",
    family="formats",
    # Oracle reads the original parquet — equality proves the XML write ->
    # schema-driven read round trip (rowTag framing, typed re-parse).
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey AS BIGINT) AS n_regionkey
        FROM nation
        ORDER BY n_nationkey
    """,
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scan via Spark 4's built-in XML source (the spark-xml package
    folded into core): stage the nation table as ``<row>`` elements, read
    it back with an explicit schema. XML is the interchange format the
    long tail of enterprise feeds still arrives in; the reference's CSV
    chokepoint (``dags/s3_data_copy_test.py:32-41``) is the same
    stage-then-parse shape with a different lexer.

    Scale: XML files split by row tag like any text source; the explicit
    schema skips the inference pass (which would read the data twice)."""
    out = os.path.join(
        _SCRATCH, f"nation_xml_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    (
        load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .coalesce(1)
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "row")
        .save(out)
    )
    schema = "n_nationkey bigint, n_name string, n_regionkey bigint"
    return (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "row")
        .load(out)
        .orderBy("n_nationkey")
    )


@query(
    "scan_schema_evolution",
    family="formats",
    oracle="""
        SELECT CAST(p_partkey % 2 AS BIGINT) AS key_parity,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE p_partkey % 2 = 1) AS BIGINT)
                 AS n_with_price,
               CAST(sum(CASE WHEN p_partkey % 2 = 1
                             THEN CAST(p_retailprice AS DECIMAL(38,4))
                        END) AS DOUBLE) AS price_sum
        FROM part
        GROUP BY 1
        ORDER BY key_parity
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on a parquet directory — the lakehouse reality
    where old files lack columns newer files carry: generation-1 files
    (even part keys) have (p_partkey, p_name); generation-2 files (odd
    keys) add p_retailprice. A ``mergeSchema`` read reconstructs the
    superset schema with NULLs where a file predates the column, and the
    aggregate proves it: generation-1 rows count but contribute no
    prices, generation-2 prices survive exactly (DECIMAL sum). The oracle
    recomputes from the ORIGINAL table, so dropped rows, misaligned
    columns, or type mangling across generations all fail the hash.

    Scale notes: schema merging is a FOOTER-only operation (Spark reads
    each file's footer schema and unions them; column data is untouched),
    so the read cost is the same columnar scan — this is why additive
    schema evolution is free at 100 TB while column renames are not.
    Mirrors the versioned-table shim's additive evolution
    (plans/versioned.py) at the raw-file layer the reference's COPY INTO
    stage (dags/s3_data_copy_test.py:32-41) would hit after a source
    system adds a field."""
    out = os.path.join(
        tempfile.gettempdir(),
        f"bfs_schema_evo_{os.getpid()}",
        os.path.basename(sf_dir.rstrip("/")),
    )
    p = load(spark, sf_dir, "part")
    gen1 = p.filter(F.col("p_partkey") % 2 == 0).select("p_partkey", "p_name")
    gen2 = p.filter(F.col("p_partkey") % 2 == 1).select(
        "p_partkey", "p_name", "p_retailprice"
    )
    gen1.write.mode("overwrite").parquet(os.path.join(out, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(out, "gen=2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(out)
    )
    return (
        merged.groupBy((F.col("p_partkey") % 2).cast("bigint").alias("key_parity"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("p_retailprice").cast("bigint").alias("n_with_price"),
            F.sum(F.col("p_retailprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("price_sum"),
        )
        .orderBy("key_parity")
    )
