"""Per-query optimization profiler (r11 optimization round).

For each named query: capture ``.explain("formatted")`` to a file and time
the query standalone with the bench methodology (cold + N warm noop-sink
runs on the shared session, ``setJobDescription``-labelled). This is the
measure-first tool of guide §1 — same timed action as bench.py
(``time_query``) so numbers are directly comparable, but isolated to the
queries under study so a before/after pair costs seconds, not a 25-minute
bench run.

Usage::

    python scripts/opt_profile.py --sf-dir .scratch/sf1 \
        --plans plans/r11 --suffix _before graph_pagerank similarity_lsh_neardup

Pass ``--no-plans`` to skip plan capture (pure timing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bfs_etl_sep2025_spark import registry  # noqa: E402
from bfs_etl_sep2025_spark.session import build_spark  # noqa: E402


def _explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--warm-runs", type=int, default=2)
    ap.add_argument("--plans", default=None, help="directory for plan files")
    ap.add_argument("--suffix", default="", help="e.g. _before / _after")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    spark = build_spark(app_name="opt-profile")
    specs = registry.all_specs()
    out: dict[str, dict] = {}
    for name in args.queries:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs: list[float] = []
        for i in range(1 + args.warm_runs):
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        if args.plans and not args.no_plans:
            os.makedirs(args.plans, exist_ok=True)
            # re-build the frame so the captured plan is the clean pre-run
            # one (checkpoint-backed plans collapse after materialization
            # anyway; this matches what the query function returns)
            df = spec.fn(spark, args.sf_dir)
            path = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(_explain_formatted(df))
        spark.sparkContext.setJobDescription(None)
        import statistics

        med = round(statistics.median(runs[1:]), 3) if runs[1:] else runs[0]
        out[name] = {"cold": runs[0], "warm": runs[1:], "median_warm": med}
        print(f"{name}: cold={runs[0]} warm={runs[1:]}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "results": out}))


if __name__ == "__main__":
    main()
