#!/usr/bin/env python3
"""Per-code counts over an already-sorted code column: one-hot matmul
scan (current wjoin boundary) vs searchsorted over the sorted packed
key. 20M rows, 18002 codes (the wj bench shape)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from rayforce_tpu.engine import groupby as G


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, f, reps=3):
    f()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, (time.perf_counter() - t0) * 1000)
    log(f"{name:28s} {best:9.1f} ms")
    return best


def main():
    NQ, NC = 20_000_000, 18_001
    rng = np.random.default_rng(7)
    src = np.sort(rng.integers(0, NC, NQ)).astype(np.int32)
    srcd = jnp.asarray(src)
    jax.block_until_ready(srcd)

    @jax.jit
    def via_matmul(s):
        return G.matmul_tasks_scan(
            s, [jnp.ones(NQ, jnp.float32)], NC + 1,
            NQ)[0].astype(jnp.int64)[:NC]

    @jax.jit
    def via_searchsorted(s):
        probes = jnp.arange(NC + 1, dtype=jnp.int32)
        starts = jnp.searchsorted(s, probes, side="left")
        return (starts[1:] - starts[:-1]).astype(jnp.int64)

    a = via_matmul(srcd)
    b = via_searchsorted(srcd)
    ok = bool(jnp.all(a == b))
    log("match:", ok)
    timeit("matmul_tasks_scan", lambda: float(via_matmul(srcd)[0]))
    timeit("searchsorted", lambda: float(via_searchsorted(srcd)[0]))


if __name__ == "__main__":
    main()
