"""A/B: stream_typed_state_profile with the old chatty state handler vs
the new minimal-round-trip handler (registry code)."""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from bfs_etl_sep2025_spark import registry
from bfs_etl_sep2025_spark.operators.streaming_batch import _drain, _stage_events
from bfs_etl_sep2025_spark.session import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"

def old_tws(events):
    from bfs_etl_sep2025_spark.vendor import ensure_protobuf_on_workers
    ensure_protobuf_on_workers(events.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class UserProfile(StatefulProcessor):
        def init(self, handle):
            self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")
            self._by_type = handle.getMapState("by_type", "event_type STRING", "cnt BIGINT")
        def handleInputRows(self, key, rows, timerValues):
            n, total = (self._totals.get() if self._totals.exists() else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for et, cnt in pdf.groupby("event_type").size().items():
                    prev = (self._by_type.getValue((et,))[0]
                            if self._by_type.containsKey((et,)) else 0)
                    self._by_type.updateValue((et,), (prev + int(cnt),))
            self._totals.update((n, total))
            counts = {k[0]: v[0] for k, v in self._by_type.iterator()}
            top = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                "total_value": [total], "n_types": [len(counts)], "top_type": [top[0]]})
        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfile(),
        outputStructType=("user_id bigint, n_events bigint, total_value double, "
                          "n_types int, top_type string"),
        outputMode="Update", timeMode="None")

def run_old(spark, sf_dir):
    from bfs_etl_sep2025_spark.streaming.jobs import stream_events
    src = _stage_events(spark, sf_dir)
    pk = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(pk, None)
    spark.conf.set(pk, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        out = _drain(spark, old_tws(stream_events(spark, src)), "update")
    finally:
        spark.conf.set(pk, old) if old else spark.conf.unset(pk)
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (out.select("*", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("user_id", "n_events", "n_types", "top_type").orderBy("user_id"))

new_fn = registry.all_specs()["stream_typed_state_profile"].fn

def timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

spark = build_spark(app_name="ab-tws")
a = sorted(tuple(r) for r in run_old(spark, SF_DIR).collect())
b = sorted(tuple(r) for r in new_fn(spark, SF_DIR).collect())
assert a == b, f"MISMATCH {a[:3]} vs {b[:3]}"
print("outputs identical:", len(a), "rows", flush=True)
olds, news = [], []
for i in range(6):
    if i % 2 == 0:
        to = timed(run_old, spark); tn = timed(new_fn, spark)
    else:
        tn = timed(new_fn, spark); to = timed(run_old, spark)
    olds.append(to); news.append(tn)
    print(f"run {i}: old={to}s new={tn}s", flush=True)
print("median old:", statistics.median(olds[1:]), "new:", statistics.median(news[1:]))
