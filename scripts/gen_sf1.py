"""Generate an sf1-equivalent fixture by deterministic 10x replication of
the driver's sf0.1 tables (BENCH methodology, VERDICT r3 item 6).

The driver ships sf in {0.001, 0.01, 0.1} only; the sf0.1 headline numbers
are dominated by Spark's fixed JVM/scheduling floor (~0.3-1 s per query at
600k rows), which undersells the engine's scale design. This script builds
a 10x scale point IN REPO SCRATCH (never touching the read-only
/root/testdata) so `bench.py --sf-dir .scratch/sf1` can show the crossover.

Replication is structure-preserving, not row-duplicating:

- every key family gets a per-replica offset at a clean power-of-ten base
  (orderkey, custkey, partkey, suppkey, event/user ids, doc/vec ids), so
  joins stay consistent and selectivities scale linearly;
- `documents.text` gets a per-replica token suffix (``word`` -> ``word~i``)
  — shingles/minhashes still collide exactly where they did WITHIN a
  replica but never across replicas, so near-dup pair density scales
  linearly like a real 10x corpus (byte-identical clones would add
  45 pairs per doc and make dedup quadratically harder than true sf1);
- `embeddings.embedding` gets seeded float32 noise (sigma 1e-3) per
  replica, so ANN buckets/cells fill realistically instead of with exact
  clones;
- `nation`/`region` are dimensions and copy through unchanged (replica
  rows keep their nationkeys, mirroring TPC-H's fixed-size dims).

Dtypes are pinned to the source parquet schema (the fixture's events.ts
dtype drift across driver generations is preserved as-read, matching
`tables.load`'s normalization contract).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: key columns per table, grouped by shared offset family
KEY_FAMILIES: dict[str, list[tuple[str, str]]] = {
    "orderkey": [("lineitem", "l_orderkey"), ("orders", "o_orderkey")],
    "custkey": [("orders", "o_custkey"), ("customer", "c_custkey")],
    "partkey": [("lineitem", "l_partkey"), ("part", "p_partkey")],
    "suppkey": [("lineitem", "l_suppkey"), ("supplier", "s_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

COPY_THROUGH = ["nation", "region"]
REPLICATED = [
    "lineitem", "orders", "customer", "part", "supplier",
    "events", "documents", "embeddings",
]


def _pow10_base(max_val: int) -> int:
    base = 1
    while base <= max_val:
        base *= 10
    return base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1"))
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    # per-family offset base from the max key across the family's tables
    tables = {t: pq.read_table(f"{args.src}/{t}.parquet") for t in REPLICATED}
    base: dict[str, int] = {}
    for fam, cols in KEY_FAMILIES.items():
        mx = max(
            int(pa.compute.max(tables[t][c]).as_py()) for t, c in cols
        )
        base[fam] = _pow10_base(mx)
    fam_of = {
        (t, c): fam for fam, cols in KEY_FAMILIES.items() for t, c in cols
    }

    for t in COPY_THROUGH:
        pq.write_table(
            pq.read_table(f"{args.src}/{t}.parquet"),
            f"{args.dst}/{t}.parquet",
        )
        print(f"{t}: copied")

    for t in REPLICATED:
        src = tables[t]
        schema = src.schema
        df0 = src.to_pandas()
        parts = []
        for i in range(args.replicas):
            df = df0.copy()
            for col in df.columns:
                fam = fam_of.get((t, col))
                if fam is not None:
                    df[col] = df[col] + i * base[fam]
            if t == "documents" and i > 0:
                df["text"] = df["text"].str.replace(
                    r"(\S+)", rf"\1~{i}", regex=True
                )
                df["n_chars"] = df["text"].str.len().astype("int64")
            if t == "embeddings" and i > 0:
                rng = np.random.default_rng(42 + i)
                emb = np.stack(df["embedding"].to_numpy()).astype("float32")
                emb = emb + rng.normal(0, 1e-3, emb.shape).astype("float32")
                df["embedding"] = list(emb)
            parts.append(pa.Table.from_pandas(df, schema=schema,
                                              preserve_index=False))
        out = pa.concat_tables(parts)
        # write ~replica-sized row groups: a production 100 TB layout is
        # many-split by construction; the driver's single-row-group fixture
        # files are an artifact of their small size, and reproducing that
        # artifact at sf1 would serialize every scan on one task (parquet
        # readers only materialize row groups whose midpoint falls in their
        # split, so byte-splitting a one-group file yields one busy task).
        pq.write_table(
            out,
            f"{args.dst}/{t}.parquet",
            row_group_size=max(1024, len(out) // (2 * args.replicas)),
        )
        print(f"{t}: {len(src)} -> {len(out)} rows")


if __name__ == "__main__":
    main()
