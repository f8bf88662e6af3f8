"""A/B: corpus_soft_dedup_weights (agg+join-back vs window pair) and
dedup_minhash_clusters (shuffle-join fixpoint vs broadcast-label fixpoint).
Old shapes replicated inline; new = registry code."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark import registry
from bfs_etl_sep2025_spark.operators.corpus import exploded_ngrams
from bfs_etl_sep2025_spark.operators.dedup import dedup_minhash_lsh_pairs
from bfs_etl_sep2025_spark.tables import load, widen
from bfs_etl_sep2025_spark.session import build_spark

SF = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"


def old_soft(spark, sf_dir):
    docs = widen(load(spark, sf_dir, "documents"))
    sh = exploded_ngrams(docs, n=3).select(
        "doc_id", F.unhex(F.md5("s")).alias("k")
    )
    sh_r = sh.repartition(F.col("k"))
    df_tab = sh_r.groupBy("k").agg(F.countDistinct("doc_id").alias("df"))
    joined = sh_r.join(df_tab, "k")
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("df").alias("df_sum"),
    )
    return agg.select(
        "doc_id", "n_shingles", "df_sum",
        (F.col("df_sum").cast("double") / F.col("n_shingles")).alias("commonness"),
        (F.col("n_shingles").cast("double") / F.col("df_sum")).alias("soft_weight"),
    ).orderBy("doc_id")


def old_clusters(spark, sf_dir):
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")

    def _materialize(df: DataFrame) -> DataFrame:
        if spark.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint()

    edges = _materialize(
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .unionByName(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        .distinct()
    )
    labels = edges.select("s").distinct().select(
        F.col("s").alias("node"), F.col("s").alias("label")
    )
    changed = 1
    for _ in range(20):
        neighbor_min = (
            edges.join(labels, edges.d == labels.node)
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = _materialize(
            labels.join(neighbor_min, labels.node == neighbor_min.s, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label")).limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    assert changed == 0
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


new_soft = registry.all_specs()["corpus_soft_dedup_weights"].fn
new_clusters = registry.all_specs()["dedup_minhash_clusters"].fn


def timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


spark = build_spark(app_name="ab-soft-clusters")
for old, new, label in [
    (old_soft, new_soft, "soft_dedup_weights"),
    (old_clusters, new_clusters, "minhash_clusters"),
]:
    a = [tuple(r) for r in old(spark, SF).collect()]
    b = [tuple(r) for r in new(spark, SF).collect()]
    assert a == b, f"MISMATCH {label}: {a[:3]} vs {b[:3]}"
    print(f"{label}: outputs identical ({len(a)} rows)", flush=True)

for label, old, new in [
    ("soft_dedup_weights", old_soft, new_soft),
    ("minhash_clusters", old_clusters, new_clusters),
]:
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
