"""Pin the in-process BLAS to a single thread (r11, guide §4.5).

numpy's OpenBLAS keeps its own thread pool; inside a Spark Python worker
every core on the box is already running one task, so a threaded GEMM both
oversubscribes the machine (concurrent workers x BLAS threads) and loses
outright on the small tile/bucket matrices these operators feed it —
measured on this container: 10x ``(1250, 64)`` unit-row GEMMs take 1.02 s
with the default pool vs 0.19 s single-threaded, a 5x penalty before any
cross-worker contention.  Every GEMM-bearing UDF calls
:func:`single_thread_blas` before importing numpy: the first call per
worker process sets the thread-count env vars (picked up by a
not-yet-imported numpy) and, for workers whose numpy is already live,
resolves ``openblas_set_num_threads`` via ctypes from the already-mapped
shared object; subsequent calls are a cached no-op.
"""

from __future__ import annotations

import os

_PINNED = False


def single_thread_blas() -> None:
    """Idempotently force single-threaded BLAS in this process."""
    global _PINNED
    if _PINNED:
        return
    _PINNED = True
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    try:
        import ctypes

        paths = set()
        with open("/proc/self/maps") as fh:
            for line in fh:
                part = line.split(None, 5)[-1].strip()
                if "openblas" in part.lower() and part.startswith("/"):
                    paths.add(part)
        for path in paths:
            lib = ctypes.CDLL(path)
            for sym in (
                "openblas_set_num_threads64_",
                "openblas_set_num_threads",
            ):
                fn = getattr(lib, sym, None)
                if fn is not None:
                    fn(1)
                    return
    except Exception:
        # non-Linux / static BLAS: the env vars above still cover the
        # numpy-not-yet-imported case; a live threaded pool just stays.
        pass
