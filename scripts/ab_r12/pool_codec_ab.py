"""Pool(32) A/B of the JPEG entropy decoders, old vs new (r12 LUT reader).

The r11 §10 lesson: single-core codec microbenches can INVERT under the
real 32-process pool (DRAM contention), so any per-worker rewrite must be
validated under multiprocessing.Pool(32). Workers decode disjoint chunks
of the same payload list through the OLD module (loaded from the pinned
baseline worktree) and the NEW module; outputs are asserted identical.

Usage: python scripts/ab_r12/pool_codec_ab.py [OLD_REPO] [N_ASSETS]
"""

from __future__ import annotations

import multiprocessing as mp
import random
import statistics
import sys
import time

OLD_REPO = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r12_base"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
WORKERS = 32

sys.path.insert(0, "/root/repo")


def _load(repo: str):
    import importlib.util

    sys.path.insert(0, repo)
    from bfs_etl_sep2025_spark import registry

    orig = registry.query
    registry.query = lambda *a, **k: (lambda fn: fn)
    try:
        spec = importlib.util.spec_from_file_location(
            f"mm_{abs(hash(repo))}",
            f"{repo}/bfs_etl_sep2025_spark/operators/multimodal.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        registry.query = orig
        sys.path.remove(repo)
    return mod


_MOD = {}


def _work(args):
    repo, kind, payloads = args
    if repo not in _MOD:
        _MOD[repo] = _load(repo)
    m = _MOD[repo]
    fn = (
        m._decode_jpeg_progressive_coefs
        if kind == "prog"
        else m.decode_jpeg_baseline
    )
    t0 = time.perf_counter()
    out = [fn(p) for p in payloads]
    dt = time.perf_counter() - t0
    # fold outputs to a comparable digest (coefs lists are big)
    import hashlib

    h = hashlib.md5()
    for o in out:
        h.update(repr(o).encode())
    return dt, h.hexdigest()


def main() -> None:
    new = _load("/root/repo")
    random.seed(11)
    prog, base = [], []
    for _ in range(N):
        px = bytes(random.randrange(256) for _ in range(32 * 32))
        prog.append(new.encode_jpeg_progressive(px, 32, 32, quant=2))
        base.append(new.encode_jpeg_baseline(px, 32, 32, quant=2))

    chunks = lambda data: [  # noqa: E731
        data[i::WORKERS] for i in range(WORKERS)
    ]
    with mp.Pool(WORKERS) as pool:
        for kind, data in (("prog", prog), ("base", base)):
            res = {}
            for repo in (OLD_REPO, "/root/repo", OLD_REPO, "/root/repo"):
                args = [(repo, kind, c) for c in chunks(data)]
                t0 = time.perf_counter()
                out = pool.map(_work, args)
                wall = time.perf_counter() - t0
                per = statistics.median(dt for dt, _ in out)
                digest = tuple(sorted(d for _, d in out))
                res.setdefault(repo, []).append((wall, per, digest))
                print(
                    f"{kind} {repo}: wall {wall:.3f}s median-worker {per:.3f}s",
                    flush=True,
                )
            same = res[OLD_REPO][0][2] == res["/root/repo"][0][2]
            ow = min(w for w, _, _ in res[OLD_REPO])
            nw = min(w for w, _, _ in res["/root/repo"])
            print(
                f"== {kind}: old {ow:.3f}s new {nw:.3f}s x{ow / nw:.2f} "
                f"outputs_identical={same}"
            )
            if not same:
                raise SystemExit(f"OUTPUT MISMATCH ({kind})")


if __name__ == "__main__":
    main()
