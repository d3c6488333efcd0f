#!/usr/bin/env python3
"""Per-phase profile of the single-chip inner/left join at the bench
shape (10M-row 9-column table x 1M-row table on an i64 key). Scalar
fetches are the sync points."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import numpy as np
import jax
import jax.numpy as jnp

from rayforce_tpu.engine import join as ej
from rayforce_tpu.engine import device as dev


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(*arrs):
    s = 0.0
    for a in arrs:
        s += float(jnp.asarray(a).ravel()[0])
    return s


def timeit(name, f, reps=3):
    f()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, (time.perf_counter() - t0) * 1000)
    log(f"{name:30s} {best:9.1f} ms")
    return best


def main():
    NL, NR = 10_000_000, 1_000_000
    rng = np.random.default_rng(7)
    lcode = jnp.asarray(rng.integers(0, 100_000, NL), jnp.int64)
    rcode = jnp.asarray(
        rng.permutation(NR * 2)[:NR].astype(np.int64))
    carry = [jnp.asarray(rng.integers(0, 100, NL), jnp.int64)
             for _ in range(8)] + \
        [jnp.asarray(rng.uniform(0, 100, NL))]
    jax.block_until_ready((lcode, rcode, carry))

    cb = max(int(2 * NR).bit_length(), 1)
    f = ej._match_kernel(NL, NR, "first", False, code_bits=cb)
    holder = {}

    def ph_match():
        holder["rids"] = f(lcode, rcode)
        return sync(holder["rids"])
    timeit("match kernel", ph_match)
    rids = holder["rids"]

    def ph_carry():
        outs = ej._k_inner_carry(rids, *carry)
        holder["outs"] = outs
        return int(np.asarray(outs[0])[0])
    timeit("inner_carry (11-op sort)", ph_carry)

    def ph_take():
        rsel = holder["outs"][1][:5_000_000]
        g = ej._k_take(jnp.asarray(rng.uniform(0, 1, NR)), rsel)
        return sync(g)
    timeit("right take (gather 5M/1M)", ph_take)

    # left-join shape: all_matched + one lazy gather
    def ph_allm():
        return ej.all_matched(rids)
    timeit("all_matched fetch", ph_allm)

    rv = jnp.asarray(rng.uniform(0, 1, NR))

    def ph_gather():
        g = ej._k_gather(rv, rids)
        return sync(g)
    timeit("lj gather 10M/1M", ph_gather)


if __name__ == "__main__":
    main()
