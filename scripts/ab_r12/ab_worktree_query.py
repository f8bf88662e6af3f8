"""Generic interleaved worktree A/B for registered queries (r12).

Usage::

    python scripts/ab_r12/ab_worktree_query.py OLD_REPO_DIR QUERY [QUERY...] \
        [--sf DIR] [--rounds N]

Arms: OLD = the query run from ``OLD_REPO_DIR`` (a git worktree pinned at
the pre-change commit), NEW = the same query from /root/repo. Each round
launches ONE fresh subprocess per arm, alternating O,N,O,N..., so machine
weather hits both arms equally (the r11 lesson: cross-session absolute
times swing up to 8x; only interleaved same-session pairs are verdicts).
Each subprocess does one cold + two warm noop-sink runs and prints the
median warm time plus an order-insensitive md5 of the collected rows, so
the A/B asserts OUTPUT EQUALITY, not just speed.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

CHILD = r"""
import hashlib, json, statistics, sys, time
sys.path.insert(0, sys.argv[1])
from bfs_etl_sep2025_spark.session import build_spark
from bfs_etl_sep2025_spark import registry

name, sf_dir = sys.argv[2], sys.argv[3]
spark = build_spark(app_name=f"ab-{name}")
spec = registry.all_specs()[name]

def once():
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

once()  # cold
warm = [once() for _ in range(2)]
rows = sorted(str(tuple(r)) for r in spec.fn(spark, sf_dir).collect())
digest = hashlib.md5("\n".join(rows).encode()).hexdigest()
print(json.dumps({"median_warm": statistics.median(warm),
                  "warm": warm, "rows": len(rows), "md5": digest}))
"""


def run_arm(repo: str, query: str, sf: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, repo, query, sf],
        capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_repo")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=2)
    a = ap.parse_args()
    for q in a.queries:
        olds, news = [], []
        md5s = set()
        for r in range(a.rounds):
            for label, repo, acc in (
                ("OLD", a.old_repo, olds),
                ("NEW", "/root/repo", news),
            ):
                res = run_arm(repo, q, a.sf)
                acc.append(res["median_warm"])
                md5s.add((res["rows"], res["md5"]))
                print(
                    f"{q} {label} round{r}: {res['median_warm']:.3f}s "
                    f"(warm {['%.3f' % w for w in res['warm']]}, "
                    f"rows={res['rows']})",
                    flush=True,
                )
        same = len(md5s) == 1
        om, nm = statistics.median(olds), statistics.median(news)
        print(
            f"== {q}: old {om:.3f}s new {nm:.3f}s speedup x{om / nm:.2f} "
            f"outputs_identical={same}"
        )
        if not same:
            raise SystemExit(f"OUTPUT MISMATCH on {q}: {md5s}")


if __name__ == "__main__":
    main()
