"""Time the registry's oracle SQL in DuckDB on the same parquet inputs —
the BASELINE.md comparison column (PySpark <= 2x DuckDB at the same scale).

Mirrors bench.py's methodology: per query one cold run then N warm runs,
median warm reported, full materialization (fetchall). Usage::

    python scripts/bench_duckdb.py [--sf-dir DIR] [--warm-runs N]

Prints one JSON line shaped like bench.py's so the two are diffable.
Queries whose oracle is None (rows-only sketches) are skipped, as are
bench-set members without an oracle.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bfs_etl_sep2025_spark import registry  # noqa: E402
from bfs_etl_sep2025_spark.tables import TABLES  # noqa: E402


def _run_one(oracle: str, sf_dir: str, warm_runs: int, q) -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    def once() -> float:
        t0 = time.perf_counter()
        con.execute(oracle).fetchall()
        return time.perf_counter() - t0

    once()  # cold
    q.put(round(statistics.median(once() for _ in range(warm_runs)), 4))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-runs", type=int, default=3)
    ap.add_argument(
        "--timeout-per-query",
        type=float,
        default=None,
        help="seconds before a query is recorded DNF (cold+warm budget); "
        "needed at sf1 where e.g. the recursive-CTE clustering oracle "
        "runs >12 min without finishing",
    )
    args = ap.parse_args()
    import multiprocessing as mp

    timings: dict[str, float | str] = {}
    for spec in registry.all_specs().values():
        if not spec.bench or spec.oracle is None:
            continue
        if args.timeout_per_query is None:
            q = mp.Queue()
            _run_one(spec.oracle, args.sf_dir, args.warm_runs, q)
            timings[spec.name] = q.get()
        else:
            q = mp.Queue()
            p = mp.Process(
                target=_run_one,
                args=(spec.oracle, args.sf_dir, args.warm_runs, q),
            )
            p.start()
            p.join(args.timeout_per_query)
            if p.is_alive():
                p.terminate()
                p.join()
                timings[spec.name] = f"DNF>{args.timeout_per_query:g}s"
            else:
                timings[spec.name] = q.get()
    finished = [v for v in timings.values() if isinstance(v, float)]
    print(
        json.dumps(
            {
                "metric": "duckdb oracle wall-clock, median of "
                f"{args.warm_runs} warm runs (DNF excluded from total)",
                "value": round(sum(finished), 4),
                "unit": "sec",
                "queries": timings,
                "sf_dir": args.sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
