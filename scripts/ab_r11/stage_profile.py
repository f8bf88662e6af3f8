"""Empirical per-stage breakdown (guide §1.1/§7.1): run one query with the
UI enabled and dump per-stage wall/executor time + shuffle bytes from the
REST API, sorted by executor run time."""

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from bfs_etl_sep2025_spark import registry
from bfs_etl_sep2025_spark.session import build_spark

name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"

spark = build_spark(app_name="stage-profile", extra_conf={"spark.ui.enabled": "true"})
spec = registry.all_specs()[name]

# one warm-up run (cold JVM/codegen), then the measured run
for _ in range(2):
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
print(f"wall (measured run): {wall:.2f}s", file=sys.stderr)

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4040/api/v1/applications/{app_id}"
stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
rows = []
for s in stages:
    rows.append(
        (
            s["stageId"],
            s["submissionTime"],
            s["executorRunTime"] / 1000.0,
            s.get("executorCpuTime", 0) / 1e9,
            s["numCompleteTasks"],
            s.get("shuffleReadBytes", 0) / 1e6,
            s.get("shuffleWriteBytes", 0) / 1e6,
            s["name"].split("\n")[0][:70],
        )
    )
rows.sort(key=lambda r: -r[2])
print(f"{'stage':>6} {'runT_s':>8} {'cpuT_s':>8} {'tasks':>5} {'shRd_MB':>8} {'shWr_MB':>8}  name")
for r in rows[:40]:
    print(f"{r[0]:>6} {r[2]:>8.2f} {r[3]:>8.2f} {r[4]:>5} {r[5]:>8.2f} {r[6]:>8.2f}  {r[7]}")
tot = sum(r[2] for r in rows)
print(f"total executorRunTime across stages: {tot:.1f}s (over all runs incl. warmup)")
