"""A/B at a given SF: pagerank/CC broadcast-fixpoint regime vs the shuffle
regime, toggled via the module guard (set _MAX_BROADCAST_NODES = -1 to
force the old shuffle path)."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from bfs_etl_sep2025_spark import registry
from bfs_etl_sep2025_spark.operators import graph
from bfs_etl_sep2025_spark.session import build_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = ["graph_pagerank", "graph_connected_components"]
spark = build_spark(app_name="ab-graph")


def timed(name, guard):
    old_guard = graph._MAX_BROADCAST_NODES
    graph._MAX_BROADCAST_NODES = guard
    try:
        t0 = time.perf_counter()
        registry.all_specs()[name].fn(spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)
    finally:
        graph._MAX_BROADCAST_NODES = old_guard


for name in QUERIES:
    a = sorted(
        tuple(r)
        for r in (lambda: (
            graph.__dict__.__setitem__("_MAX_BROADCAST_NODES", -1),
            registry.all_specs()[name].fn(spark, SF).collect(),
        )[1])()
    )
    graph._MAX_BROADCAST_NODES = 5_000_000
    b = sorted(tuple(r) for r in registry.all_specs()[name].fn(spark, SF).collect())
    assert a == b, f"MISMATCH {name}"
    print(f"{name}: outputs identical ({len(a)} rows)", flush=True)
    shuf, bc = [], []
    for i in range(6):
        if i % 2 == 0:
            ts = timed(name, -1); tb = timed(name, 5_000_000)
        else:
            tb = timed(name, 5_000_000); ts = timed(name, -1)
        shuf.append(ts); bc.append(tb)
        print(f"{name} run {i}: shuffle={ts}s broadcast={tb}s", flush=True)
    print(
        f"{name} median shuffle={statistics.median(shuf[1:])} "
        f"broadcast={statistics.median(bc[1:])}", flush=True,
    )
