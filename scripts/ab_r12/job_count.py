"""Count Spark jobs (and total tasks) one query submits — the VERDICT r12
item-2 done-condition asks for a job-count drop visible in a stage dump.

Usage: python scripts/ab_r12/job_count.py REPO_DIR QUERY [SF_DIR]

Runs the query once cold, then resets the counter baseline and runs once
warm; reports jobs/stages/tasks of the WARM run from the UI REST API.
"""

import json
import sys
import time
import urllib.request

sys.path.insert(0, sys.argv[1])

from bfs_etl_sep2025_spark import registry  # noqa: E402
from bfs_etl_sep2025_spark.session import build_spark  # noqa: E402

name = sys.argv[2]
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

spark = build_spark(
    app_name="job-count", extra_conf={"spark.ui.enabled": "true"}
)
spec = registry.all_specs()[name]


def once():
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


once()  # cold
app_id = spark.sparkContext.applicationId
base = f"http://localhost:4040/api/v1/applications/{app_id}"
before = json.load(urllib.request.urlopen(f"{base}/jobs?status=succeeded"))
n0 = len(before)
wall = once()  # warm, measured
jobs = json.load(urllib.request.urlopen(f"{base}/jobs?status=succeeded"))
new = [j for j in jobs if j["jobId"] >= max((j["jobId"] for j in before), default=-1) + 1]
tasks = sum(j.get("numCompletedTasks", 0) for j in new)
stages = sum(len(j.get("stageIds", [])) for j in new)
print(
    json.dumps(
        {
            "query": name,
            "repo": sys.argv[1],
            "warm_wall_s": round(wall, 3),
            "jobs": len(new),
            "stages": stages,
            "tasks": tasks,
        }
    )
)
