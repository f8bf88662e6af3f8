"""A/B: multimodal_decode_jpeg_progressive — per-asset codec UDFs (old
shape: encode_jpeg_progressive per digest, decode_image + Python stats per
asset) vs the r11 batch twins (one FDCT / one IDCT per Arrow batch,
vectorized stats). Old shape replicated inline; new = registry code.

NOTE: the old shape below still benefits from the per-asset fast paths
added in the same change (lru-cached Huffman tables, zero-band short
circuits) — this A/B isolates the BATCH-TWIN delta; the per-asset delta is
pinned by the pure-Python microbench in OPTIMIZATION_r11.md §10 and the
back-to-back worktree runs."""
import statistics
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark import registry
from bfs_etl_sep2025_spark.operators.multimodal import (
    _JB_H,
    _JB_W,
    _block_constant_raster,
    decode_image,
    encode_jpeg_progressive,
    media_assets,
)
from bfs_etl_sep2025_spark.session import build_spark
from bfs_etl_sep2025_spark.tables import widen

SF = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"


def old_progressive(spark, sf_dir):
    import pandas as pd

    a = media_assets(spark, sf_dir)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["asset_id"]].copy()

            def build(h: str) -> bytes:
                return encode_jpeg_progressive(
                    _block_constant_raster(h), _JB_W, _JB_H
                )

            out["media"] = pdf["digest"].map(build)
            yield out

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, media in zip(pdf["asset_id"], pdf["media"]):
                w, h, pixels = decode_image(bytes(media))
                s = sum(pixels)
                rows.append(
                    (asset_id, w, h, s, s / len(pixels),
                     max(pixels), min(pixels))
                )
            import pandas as _pd

            yield _pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "px_sum",
                         "mean_px", "max_px", "min_px"],
            )

    encoded = widen(
        a.select(
            "asset_id",
            F.coalesce(F.md5("payload"), F.lit("0" * 32)).alias("digest"),
        )
    ).mapInPandas(encode, "asset_id long, media binary")
    return encoded.mapInPandas(
        decode,
        "asset_id long, width int, height int, px_sum long, "
        "mean_px double, max_px int, min_px int",
    ).orderBy("asset_id")


new_progressive = registry.all_specs()["multimodal_decode_jpeg_progressive"].fn


def timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


spark = build_spark(app_name="ab-codec")
a = [tuple(r) for r in old_progressive(spark, SF).collect()]
b = [tuple(r) for r in new_progressive(spark, SF).collect()]
assert a == b, f"MISMATCH: {a[:2]} vs {b[:2]}"
print(f"progressive: outputs identical ({len(a)} rows)", flush=True)

olds, news = [], []
for i in range(6):
    if i % 2 == 0:
        to = timed(old_progressive, spark)
        tn = timed(new_progressive, spark)
    else:
        tn = timed(new_progressive, spark)
        to = timed(old_progressive, spark)
    olds.append(to)
    news.append(tn)
    print(f"progressive run {i}: old={to}s new={tn}s", flush=True)
print(
    f"progressive median old={statistics.median(olds[1:])} "
    f"new={statistics.median(news[1:])}",
    flush=True,
)
