"""Multimodal-column operators (Tier C).

Model: media assets are opaque ``binary`` columns + typed metadata —
the fixture set has no real image/audio files (and this container has no
decode libraries), so the fixture's documents are cast to binary payloads;
what is REAL here is everything a 100 TB multimodal pipeline needs from
Spark: binary column handling, Arrow-batched ``mapInPandas`` UDF plumbing
(schema, batch iteration, partition behavior), frame-structured access, and
deterministic feature extraction that a DuckDB oracle can cross-check.
The codec boundary itself is stubbed behind import-tries that raise
``NotImplementedError`` with a clear marker (see ``decode_image``).

Scale notes: binary payloads ride the columnar format like any column
(parquet stores them contiguously; column pruning means metadata-only
queries never fetch the bytes). Feature extraction is mapInPandas — Arrow
batches in/out, no per-row pickling; batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``; decode cost dominates at
scale, so repartition by size-class before the UDF to balance executors.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.registry import query
from bfs_etl_sep2025_spark.tables import load

if TYPE_CHECKING:
    import pandas as pd

FRAME_BYTES = 32  # simulated video: fixed-size frames concatenated


def media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal staging table: binary payload + typed metadata.
    (Payload = UTF-8 document bytes; schema-wise indistinguishable from
    image/audio bytes, which is the point.)"""
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("media_lang"),
            F.col("source").alias("origin"),
            F.col("n_chars").alias("declared_size"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """REAL image decode — stubbed: the runtime image stack (PIL/OpenCV) is
    not in this environment. The Spark-side plumbing around this call
    (mapInPandas batching, schemas, partitioning) is real and tested with
    the deterministic fake below."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "STUB: image decoding requires PIL/OpenCV (not in this container); "
            "plug a decoder in here — the surrounding Spark plumbing is real"
        ) from exc
    raise NotImplementedError("STUB: wire Image.open(BytesIO(payload)) here")


@query(
    "multimodal_binary_meta",
    family="multimodal",
    oracle="""
        SELECT doc_id AS asset_id,
               length(text) AS n_bytes,
               md5(text) AS content_md5,
               substr(text, 1, 4) AS magic,
               lang AS media_lang,
               n_chars AS declared_size,
               length(text) = n_chars AS size_consistent
        FROM documents
        ORDER BY asset_id
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata pass over binary assets: byte length, content hash,
    magic-prefix sniffing, metadata-vs-payload consistency — the checks an
    ingest pipeline runs without ever decoding (and thanks to column
    pruning, a metadata-only variant never reads the payload bytes)."""
    a = media_assets(spark, sf_dir)
    return a.select(
        "asset_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.decode(F.expr("substring(payload, 1, 4)"), "UTF-8").alias("magic"),
        F.col("meta.media_lang").alias("media_lang"),
        F.col("meta.declared_size").alias("declared_size"),
        (F.length("payload") == F.col("meta.declared_size")).alias(
            "size_consistent"
        ),
    ).orderBy("asset_id")


@query(
    "multimodal_feature_extract",
    family="multimodal",
    oracle=f"""
        WITH w AS (
          SELECT doc_id AS asset_id,
                 list_transform(range(1, {FRAME_BYTES} + 1),
                                i -> ascii(substr(text, i, 1))) AS window_bytes
          FROM documents
          WHERE length(text) >= {FRAME_BYTES}
        )
        SELECT asset_id,
               list_reduce(list_transform(window_bytes, b -> b::DOUBLE),
                           (x, y) -> x + y) / {FRAME_BYTES} AS mean_byte,
               list_max(window_bytes) AS max_byte,
               list_min(window_bytes) AS min_byte
        FROM w
        ORDER BY asset_id
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the REAL Python-UDF path: mapInPandas over
    Arrow batches computes per-asset byte statistics of the leading
    "frame" (stand-in for decode+pool over pixels). The oracle recomputes
    the same features in SQL — cross-checking the Arrow/pandas plumbing
    itself, which is exactly what a stubbed decoder cannot check."""
    a = media_assets(spark, sf_dir).filter(F.length("payload") >= FRAME_BYTES)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            window = pdf["payload"].map(lambda b: list(b[:FRAME_BYTES]))
            out = pdf[["asset_id"]].copy()
            out["mean_byte"] = window.map(lambda xs: float(sum(xs)) / FRAME_BYTES)
            out["max_byte"] = window.map(max)
            out["min_byte"] = window.map(min)
            yield out

    return (
        a.select("asset_id", "payload")
        .mapInPandas(
            extract,
            "asset_id long, mean_byte double, max_byte int, min_byte int",
        )
        .orderBy("asset_id")
    )


@query(
    "multimodal_frame_sample",
    family="multimodal",
    oracle=f"""
        WITH frames AS (
          SELECT doc_id AS asset_id,
                 length(text) // {FRAME_BYTES} AS n_frames,
                 f.f AS frame_no,
                 md5(substr(text, f.f * {FRAME_BYTES} + 1, {FRAME_BYTES}))
                   AS frame_md5
          FROM documents,
               (SELECT unnest(range(0, 1000)) AS f) f
          WHERE f.f < length(text) // {FRAME_BYTES}
            AND f.f % 4 = 0
        )
        SELECT asset_id, n_frames, frame_no, frame_md5
        FROM frames
        ORDER BY asset_id, frame_no
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over simulated video (fixed 32-byte frames): keep
    every 4th frame, hash each sampled frame. Pure JVM expressions — the
    frame arithmetic a video pipeline runs before handing sampled frames to
    a decoder UDF."""
    a = media_assets(spark, sf_dir)
    n_frames = (F.length("payload") / FRAME_BYTES).cast("long")
    frames = a.select(
        "asset_id",
        n_frames.alias("n_frames"),
        F.explode(
            F.filter(
                F.sequence(F.lit(0), n_frames - 1),
                lambda f: f % 4 == 0,
            )
        ).alias("frame_no"),
        F.col("payload"),
    )
    frame_bytes = F.expr(
        f"substring(payload, frame_no * {FRAME_BYTES} + 1, {FRAME_BYTES})"
    )
    return (
        frames.filter(F.col("n_frames") > 0)
        .select(
            "asset_id",
            "n_frames",
            "frame_no",
            F.md5(frame_bytes).alias("frame_md5"),
        )
        .orderBy("asset_id", "frame_no")
    )
