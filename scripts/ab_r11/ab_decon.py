"""A/B: corpus_decontaminate — 32-char hex md5 gram keys (old) vs 16-byte
unhex(md5) BINARY keys (new) through the broadcast join + count_distinct
(the CLAUDE.md carry-binary-keys rule). Both shapes inline; whichever wins
becomes the registry code."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.operators.corpus import _GRAM_N, exploded_ngrams
from bfs_etl_sep2025_spark.session import build_spark
from bfs_etl_sep2025_spark.tables import load, widen

SF = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"


def decon(spark, sf_dir, key):
    d = widen(load(spark, sf_dir, "documents"))
    is_eval = F.col("doc_id") % 50 == 0
    eval_grams = (
        exploded_ngrams(d.filter(is_eval), n=_GRAM_N, out="g")
        .select(key("g").alias("gh"))
        .distinct()
    )
    train_grams = exploded_ngrams(
        d.filter(~is_eval), n=_GRAM_N, out="g"
    ).select("doc_id", key("g").alias("gh"))
    return (
        train_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count_distinct("gh").alias("n_hits"))
        .filter(F.col("n_hits") >= 3)
        .orderBy("doc_id")
    )


def old_decon(spark, sf_dir):
    return decon(spark, sf_dir, F.md5)


def new_decon(spark, sf_dir):
    return decon(spark, sf_dir, lambda c: F.unhex(F.md5(c)))


def timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


spark = build_spark(app_name="ab-decon")
a = [tuple(r) for r in old_decon(spark, SF).collect()]
b = [tuple(r) for r in new_decon(spark, SF).collect()]
assert a == b, f"MISMATCH: {a[:3]} vs {b[:3]}"
print(f"decontaminate: outputs identical ({len(a)} rows)", flush=True)

olds, news = [], []
for i in range(6):
    if i % 2 == 0:
        to = timed(old_decon, spark)
        tn = timed(new_decon, spark)
    else:
        tn = timed(new_decon, spark)
        to = timed(old_decon, spark)
    olds.append(to)
    news.append(tn)
    print(f"decon run {i}: old={to}s new={tn}s", flush=True)
print(
    f"decon median old={statistics.median(olds[1:])} "
    f"new={statistics.median(news[1:])}",
    flush=True,
)
