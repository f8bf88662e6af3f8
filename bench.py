"""Benchmark harness (driver contract + BASELINE.md methodology).

Runs the headline query set (``bench=True`` in the registry) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, one warm shared SparkSession: per query, one
cold run then N=3 warm runs; the reported figure is the median warm time.
Prints exactly ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Timing includes full result materialization — each run writes the result to
Spark's ``noop`` sink, which evaluates every row with the complete output
schema (unlike ``count()``, which lets Catalyst prune computed columns) — so
lazy plans cannot cheat.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bfs_etl_sep2025_spark import registry  # noqa: E402
from bfs_etl_sep2025_spark.session import build_spark  # noqa: E402

WARM_RUNS = 3


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def time_query(spark, spec, sf_dir: str) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # ONE materializing pass that cannot cheat: the noop sink evaluates
        # every row WITH its full output schema (count() would let Catalyst
        # prune computed columns; a second limit().collect() action would
        # double-run the plan — VERDICT r01 item 5).
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # cold: plan compilation, file listing, code-gen
    return statistics.median(once() for _ in range(WARM_RUNS))


def main() -> None:
    # CLI overrides for off-driver scale runs (e.g. the generated sf1
    # fixture, scripts/gen_sf1.py); the driver's bare `python bench.py`
    # behavior is unchanged.
    global WARM_RUNS
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--warm-runs", type=int, default=WARM_RUNS)
    args = ap.parse_args()
    WARM_RUNS = args.warm_runs
    sf_dir = args.sf_dir
    spark = build_spark(app_name="bfs-etl-bench")
    specs = [s for s in registry.all_specs().values() if s.bench]
    timings: dict[str, float] = {}
    for spec in specs:
        timings[spec.name] = round(time_query(spark, spec, sf_dir), 4)
    out = {
        "metric": f"headline-query wall-clock, median of {WARM_RUNS} warm "
        "runs on a shared local session",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
