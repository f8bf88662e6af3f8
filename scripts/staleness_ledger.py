"""Staleness ledger: latest external-driver round per registered query.

The external driver hash-checks ~50 queries per round (iteration order of
``__spark_entry__.queries()``, i.e. ``registry._PRIORITY`` first).  Keeping
every query's newest external green fresh therefore requires rotating
``_PRIORITY`` each round — and rounds 6 and 7 both recomputed the stale tail
by hand (VERDICT r7 "what's wrong" #1 is exactly the bug manual rotation
produces).  This script does it mechanically:

    python scripts/staleness_ledger.py            # human-readable ledger
    python scripts/staleness_ledger.py --priority # paste-able stale tail

It diffs ``CORRECTNESS_r*.json`` into latest-round-per-query, reports

  * queries NEVER externally checked (highest signal — check first),
  * the stale tail ordered oldest-first (ties broken by registration order),
  * any query whose latest row was NOT green (should be none, ever),

and with ``--priority`` emits a Python tuple literal for the stale section of
``registry._PRIORITY``.  Plan-changed queries cannot be detected from JSON
alone; list them in ``PLAN_CHANGED`` below when a round restructures a query
after its last green.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: Queries whose physical plan changed materially since their latest external
#: green — they queue right after never-checked ones regardless of round age.
#: Maintained by hand per round (the JSON ledger cannot see plan diffs).
PLAN_CHANGED: tuple[str, ...] = (
    # r11: approx sketches upgraded from rows-only to bounded-error oracles
    # (output schema changed: emits within_bound booleans vs the exact side).
    "agg_approx_count_distinct",
    "agg_approx_percentiles",
    # r11: zero-norm embeddings excluded symmetrically on both sides of the
    # GEMM prefilter (ADVICE r10: NaN cosine ordering diverges cross-engine).
    "similarity_lsh_neardup",
    # (dedup_incremental_minhash / similarity_incremental_ivf: the r11
    # scratch-dir cleanup moved their store PATHS only — plan and values
    # untouched, oracle parity re-verified in-session, both r10-green —
    # so they are NOT plan-changed; the freed window slots go to the
    # r6-stale tail instead.)
    # r11: merge loop batched (top-B non-conflicting merges per round);
    # rows-only by nature but the value path changed.
    "text_bpe_train",
    # r11: JPEG DCTs batched over the block axis (numpy twins proven
    # bit-identical to the scalar reference by test + scoped oracle
    # parity, but the codec value path was restructured — re-verify
    # externally per the r10 precedent). Only the DCT-bearing queries:
    # PPM/PNG/lossless/audio paths are untouched.
    "multimodal_decode_jpeg_baseline",
    "multimodal_decode_jpeg_progressive",
    "multimodal_decode_image",
)


def load_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        try:
            rounds[int(m.group(1))] = json.loads(p.read_text())
        except json.JSONDecodeError:
            print(f"WARN: unparseable {p.name}", file=sys.stderr)
    return rounds


def is_green(row: dict) -> bool:
    """Green = hash-matched, or the driver's weaker rows-only pass.

    Rows-only queries (oracle=None) come back as err="no_oracle" with a
    spark_rows count and all three match flags None — that is the pass shape
    the contract defines for them, not a failure.
    """
    if row.get("hash_match") is True:
        return True
    if row.get("err") == "no_oracle":
        return (row.get("spark_rows") or 0) >= 0 and row.get("spark_rows") is not None
    if row.get("err"):
        return False
    return bool(row.get("rows_match")) and row.get("hash_match") is None


def registered_names() -> list[str]:
    sys.path.insert(0, str(REPO))
    from bfs_etl_sep2025_spark import registry

    return list(registry.all_specs())


def build_ledger() -> tuple[dict[str, int], list[str], list[tuple[str, int]]]:
    """Returns (latest_green_round, never_checked, latest_not_green)."""
    rounds = load_rounds()
    latest: dict[str, int] = {}
    latest_any: dict[str, tuple[int, bool]] = {}
    for rnum in sorted(rounds):
        for name, row in rounds[rnum].items():
            green = is_green(row)
            latest_any[name] = (rnum, green)
            if green:
                latest[name] = rnum
    names = registered_names()
    never = [n for n in names if n not in latest_any]
    not_green = [
        (n, latest_any[n][0])
        for n in names
        if n in latest_any and not latest_any[n][1]
    ]
    return latest, never, not_green


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--priority",
        action="store_true",
        help="emit the stale tail as a paste-able Python tuple body",
    )
    args = ap.parse_args()

    latest, never, not_green = build_ledger()
    names = registered_names()
    reg_pos = {n: i for i, n in enumerate(names)}

    stale = sorted(
        (n for n in names if n in latest and n not in PLAN_CHANGED),
        key=lambda n: (latest[n], reg_pos[n]),
    )

    if args.priority:
        print("    # --- generated by scripts/staleness_ledger.py --priority ---")
        print("    # never externally checked:")
        for n in never:
            print(f"    {n!r},")
        if PLAN_CHANGED:
            print("    # plan changed since latest green (PLAN_CHANGED):")
            for n in PLAN_CHANGED:
                print(f"    {n!r},")
        print("    # stale tail, oldest external green first:")
        for n in stale:
            print(f"    {n!r},  # r{latest[n]}")
        return

    print(f"registered queries: {len(names)}")
    print(f"externally checked (ever): {len(names) - len(never)}")
    if never:
        print(f"\nNEVER checked ({len(never)}):")
        for n in never:
            print(f"  {n}")
    if not_green:
        print(f"\nLATEST ROW NOT GREEN ({len(not_green)}) — investigate:")
        for n, r in not_green:
            print(f"  {n}  (r{r})")
    by_round: dict[int, int] = {}
    for n in names:
        if n in latest:
            by_round[latest[n]] = by_round.get(latest[n], 0) + 1
    print("\nlatest-green distribution:")
    for r in sorted(by_round):
        print(f"  r{r}: {by_round[r]}")
    oldest = [n for n in stale[:60]]
    print("\noldest 60 (rotation candidates):")
    for n in oldest:
        print(f"  r{latest[n]}  {n}")


if __name__ == "__main__":
    main()
