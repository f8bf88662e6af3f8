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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-runs", type=int, default=3)
    args = ap.parse_args()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    for spec in registry.all_specs().values():
        if not spec.bench or spec.oracle is None:
            continue

        def once() -> float:
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            return time.perf_counter() - t0

        once()  # cold
        timings[spec.name] = round(
            statistics.median(once() for _ in range(args.warm_runs)), 4
        )
    print(
        json.dumps(
            {
                "metric": "duckdb oracle wall-clock, median of "
                f"{args.warm_runs} warm runs",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf_dir": args.sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
