#!/usr/bin/env python3
"""Per-phase profile of the single-chip window join at the bench shape
(10M trades x 20M quotes, 18k syms, +/-1000 window, min+max over f64).
Times each jitted phase with a forced scalar fetch as the sync point
(the axon relay makes block_until_ready unreliable)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rayforce_tpu.engine import wjoin as W


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(*arrs):
    s = 0.0
    for a in arrs:
        s += float(jnp.asarray(a).ravel()[0])
    return s


def timeit(name, f, reps=2):
    f()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, (time.perf_counter() - t0) * 1000)
    log(f"{name:28s} {best:9.1f} ms")
    return best


def main():
    NT, NQ, NS = 10_000_000, 20_000_000, 18_000
    rng = np.random.default_rng(7)
    lcode = jnp.asarray(rng.integers(0, NS, NT), dtype=jnp.int64)
    lt = jnp.asarray(np.sort(rng.integers(0, 2_000_000_000, NT)),
                     dtype=jnp.int64)
    rcode = jnp.asarray(rng.integers(0, NS, NQ), dtype=jnp.int64)
    rt = jnp.asarray(np.sort(rng.integers(0, 2_000_000_000, NQ)),
                     dtype=jnp.int64)
    p = jnp.asarray(rng.uniform(10, 200, NQ))
    lo = lt - 1000
    hi = lt + 1000
    jax.block_until_ready((lcode, lt, rcode, rt, p, lo, hi))

    tbits = max(int(2_000_000_000 + 2000).bit_length(), 1)
    pack = (-1000, tbits)
    f = W._boundaries_fn(NT, NQ, NS, 1, 1, (str(p.dtype),),
                         pack=pack)

    holder = {}

    def ph_boundary():
        res = f(lcode, rcode, rt, lo, hi, p)
        holder["res"] = res
        return sync(res[1])
    timeit("boundary(event sorts)", ph_boundary)
    sr, li, ri, ok = [holder["res"][i] for i in range(4)]
    sv = holder["res"][4]

    def ph_rank():
        holder["rank"] = W._k_rank_nf(sv)
        return sync(holder["rank"])
    timeit("rank_nf (2 stable sorts)", ph_rank)

    def ph_vals():
        holder["vo"] = W._k_sorted_vals_nf(sv)
        return sync(holder["vo"])
    timeit("sorted_vals_nf", ph_vals)

    rank, vo = holder["rank"], holder["vo"]
    for op in ("min", "max"):
        def ph_red(op=op):
            holder["red" + op] = W._k_minmax_from_rank(rank, li, ri,
                                                       op)
            return sync(holder["red" + op])
        timeit(f"minmax_from_rank[{op}]", ph_red)

        def ph_val(op=op):
            out = W._k_value_from_sorted(vo, holder["red" + op], ok,
                                         9, op)
            return sync(out)
        timeit(f"value_from_sorted[{op}]", ph_val)


if __name__ == "__main__" and "--chained" not in sys.argv:
    main()


def chained():
    """All phases dispatched back-to-back, ONE sync at the end (the
    engine's real execution shape)."""
    NT, NQ, NS = 10_000_000, 20_000_000, 18_000
    rng = np.random.default_rng(7)
    lcode = jnp.asarray(rng.integers(0, NS, NT), dtype=jnp.int64)
    lt = jnp.asarray(np.sort(rng.integers(0, 2_000_000_000, NT)),
                     dtype=jnp.int64)
    rcode = jnp.asarray(rng.integers(0, NS, NQ), dtype=jnp.int64)
    rt = jnp.asarray(np.sort(rng.integers(0, 2_000_000_000, NQ)),
                     dtype=jnp.int64)
    p = jnp.asarray(rng.uniform(10, 200, NQ))
    lo = lt - 1000
    hi = lt + 1000
    jax.block_until_ready((lcode, lt, rcode, rt, p, lo, hi))
    tbits = max(int(2_000_000_000 + 2000).bit_length(), 1)
    f = W._boundaries_fn(NT, NQ, NS, 1, 1, (str(p.dtype),),
                         pack=(-1000, tbits))

    def run():
        res = f(lcode, rcode, rt, lo, hi, p)
        sr, li, ri, ok = res[0], res[1], res[2], res[3]
        sv = res[4]
        rank = W._k_rank_nf(sv)
        vo = W._k_sorted_vals_nf(sv)
        outs = []
        for op in ("max", "min"):
            red = W._k_minmax_from_rank(rank, li, ri, op)
            outs.append(W._k_value_from_sorted(vo, red, ok, 9, op))
        jax.block_until_ready(outs)

    run()
    import time as _t
    for i in range(2):
        t0 = _t.perf_counter()
        run()
        log(f"chained total: {(_t.perf_counter()-t0)*1000:.1f} ms")


if __name__ == "__main__" and "--chained" in sys.argv:
    chained()
