#!/usr/bin/env python3
"""Decide carry-vs-gather: cost of carrying payload operands through
an unstable lax.sort vs sorting (key, rid) only and gathering payloads
by the sorted rid afterwards. Measured on the real chip by slope
timing (relay dispatch cancels out)."""
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(f, k1=2, k2=8, reps=3):
    def run(k):
        float(f(k))
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(k))
            best = min(best, (time.perf_counter() - t0) * 1000)
        return best
    t1, t2 = run(k1), run(k2)
    return (t2 - t1) / (k2 - k1)


def chain(body):
    """body(carry arrays) -> arrays (first len(carry) thread back);
    fold k times, fetch a scalar."""
    @jax.jit
    def f(k, *xs):
        def step(i, xs):
            out = list(body(*xs))[:len(xs)]
            out = [o.astype(x.dtype) for o, x in zip(out, xs)]
            return tuple(out) + tuple(xs[len(out):])
        out = jax.lax.fori_loop(0, k, step, xs)
        return sum(o.ravel()[0].astype(jnp.float32) for o in out)
    return f


def main():
    N = 10_000_000
    key = jax.random.PRNGKey(0)
    k32 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
    rid = jax.random.permutation(jax.random.fold_in(key, 1),
                                 N).astype(jnp.int32)
    f64 = jax.random.uniform(jax.random.fold_in(key, 2), (N,),
                             dtype=jnp.float32).astype(jnp.float64)
    i32b = jax.random.randint(jax.random.fold_in(key, 3), (N,), 0,
                              1 << 30, dtype=jnp.int32)
    jax.block_until_ready((k32, rid, f64, i32b))
    out = {}

    def t(name, body, args):
        f = chain(body)
        ms = slope(lambda k: f(k, *args))
        out[name] = round(ms, 2)
        log(f"{name:34s} {ms:8.2f} ms")

    # baseline: sort key+rid only
    t("sort_k32_rid",
      lambda a, b: tuple(jax.lax.sort([a, b], num_keys=1,
                                      is_stable=False)),
      (k32, rid))
    # carry 1 extra i32 operand
    t("sort_k32_rid_i32",
      lambda a, b, c: tuple(jax.lax.sort([a, b, c], num_keys=1,
                                         is_stable=False)),
      (k32, rid, i32b))
    # carry 1 f64 operand
    t("sort_k32_rid_f64",
      lambda a, b, c: tuple(jax.lax.sort([a, b, c], num_keys=1,
                                         is_stable=False)),
      (k32, rid, f64))
    # carry 4 i32 operands
    t("sort_k32_rid_4xi32",
      lambda a, b, c: tuple(jax.lax.sort([a, b, c, c, c, c],
                                         num_keys=1,
                                         is_stable=False)),
      (k32, rid, i32b))
    # full-length random gather: result perturbs the next positions
    # (data dependence without changing the access distribution)
    def g_i32(p, v):
        out = jnp.take(v, p)
        return ((p + (out & 1)) % N, v)

    def g_f64(p, v):
        out = jnp.take(v, p)
        return ((p + (out > 0.5)) % N, v)

    t("gather10M_i32", g_i32, (rid, i32b))
    t("gather10M_f64", g_f64, (rid, f64))
    # near-monotone positions (post-sort gather order)
    srid = jax.lax.sort([k32, rid], num_keys=1, is_stable=False)[1]
    jax.block_until_ready(srid)
    t("gather10M_i32_postsort_order", g_i32, (srid, i32b))
    t("gather10M_f64_postsort_order", g_f64, (srid, f64))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
