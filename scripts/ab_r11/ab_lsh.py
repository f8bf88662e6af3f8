"""A/B: banded-LSH candidate+rerank engine — old (registry) vs new
(single union-first exchange with explicit partition count, explicit
repartition before candidate dedup, BLAS pinned to one thread in the
bucket GEMM, checkpoint before the global sort in neardup)."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark import registry
from bfs_etl_sep2025_spark.operators.similarity import (
    PLANES,
    _bucket_arr,
    _lsh_exact_rerank,
    _norm_arr,
    _sweep_bucket_case,
)
from bfs_etl_sep2025_spark.tables import load, widen
from bfs_etl_sep2025_spark.session import build_spark

SF = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"


def new_band_candidates(spark, sf_dir, gemm_tau, pin_blas=True):
    e = widen(load(spark, sf_dir, "embeddings"))
    n = e.select(
        "vec_id",
        "embedding",
        _norm_arr("embedding").alias("nrm"),
        _bucket_arr("embedding", PLANES[:4]).alias("band1"),
        _bucket_arr("embedding", PLANES[4:]).alias("band2"),
    )
    n = n.localCheckpoint(eager=True)
    parts = 2 * spark.sparkContext.defaultParallelism
    margin = 1e-9

    def bucket_candidates(pdf: pd.DataFrame) -> pd.DataFrame:
        if pin_blas:
            from bfs_etl_sep2025_spark.functions.blas import single_thread_blas
            single_thread_blas()
        import numpy as _np

        ids = pdf["vec_id"].to_numpy()
        order = _np.argsort(ids)
        ids = ids[order]
        V = _np.stack(pdf["embedding"].to_numpy()[order]).astype(_np.float64)
        nrm = _np.linalg.norm(V, axis=1, keepdims=True)
        if not (nrm > 0.0).all():
            raise ValueError("zero-norm embedding")
        U = V / nrm
        G = U @ U.T
        iu, iv = _np.nonzero(_np.triu(G >= gemm_tau - margin, k=1))
        return pd.DataFrame({"vec_a": ids[iu], "vec_b": ids[iv]})

    tagged = n.select(
        F.lit(0).alias("bno"), F.col("band1").alias("band"), "vec_id", "embedding"
    ).unionByName(
        n.select(
            F.lit(1).alias("bno"), F.col("band2").alias("band"), "vec_id", "embedding"
        )
    )
    cand = (
        tagged.repartition(parts, "bno", "band")
        .groupBy("bno", "band")
        .applyInPandas(bucket_candidates, "vec_a long, vec_b long")
        .repartition(parts, "vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return n, cand


def new_sweep(spark, sf_dir):
    n, cand = new_band_candidates(spark, sf_dir, 0.30)
    scored = _lsh_exact_rerank(n, cand, 0.30)
    return (
        scored.select(_sweep_bucket_case().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("bucket")
    )


def new_neardup(spark, sf_dir):
    n, cand = new_band_candidates(spark, sf_dir, 0.45)
    scored = _lsh_exact_rerank(n, cand, 0.45).localCheckpoint(eager=False)
    return scored.orderBy("vec_a", "vec_b")


old_sweep = registry.all_specs()["similarity_threshold_sweep_lsh"].fn
old_neardup = registry.all_specs()["similarity_lsh_neardup"].fn


def timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


spark = build_spark(app_name="ab-lsh")
for old, new, label in [
    (old_sweep, new_sweep, "sweep"),
    (old_neardup, new_neardup, "neardup"),
]:
    a = [tuple(r) for r in old(spark, SF).collect()]
    b = [tuple(r) for r in new(spark, SF).collect()]
    assert a == b, f"MISMATCH {label}: {a[:3]} vs {b[:3]}"
    print(f"{label}: outputs identical ({len(a)} rows)", flush=True)

for label, old, new in [("sweep", old_sweep, new_sweep), ("neardup", old_neardup, new_neardup)]:
    olds, news = [], []
    for i in range(6):
        if i % 2 == 0:
            to = timed(old, spark); tn = timed(new, spark)
        else:
            tn = timed(new, spark); to = timed(old, spark)
        olds.append(to); news.append(tn)
        print(f"{label} run {i}: old={to}s new={tn}s", flush=True)
    print(
        f"{label} median old={statistics.median(olds[1:])} "
        f"new={statistics.median(news[1:])}", flush=True,
    )
