#!/usr/bin/env python3
"""Primitive-rate microbench on the real chip: the measurements that
decide the Pallas sort design (VERDICT r03 item 2).

Under the axon relay block_until_ready is not a reliable sync point,
so each primitive is timed by SLOPE: run the op k1 and k2 times
chained through a lax.fori_loop inside one jit (data-dependent, so
nothing folds away), fetch a scalar each run, and report
(t2-t1)/(k2-k1). The relay round trip and dispatch cancel out.

Measures at 10M rows: lax.sort variants, random gather/scatter,
cumsum, segment-sum, one-hot matmul.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(f, k1=2, k2=10, reps=3):
    """f(k) -> scalar, jitted with k traced (ONE compile; fori_loop
    with a dynamic bound). Returns per-iteration ms."""
    def run(k):
        float(f(k))         # warm (compile once, shared across k)
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(k))
            best = min(best, (time.perf_counter() - t0) * 1000)
        return best
    t1, t2 = run(k1), run(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    N = 10_000_000
    key = jax.random.PRNGKey(0)
    k32 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
    v32 = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0,
                             1 << 30, dtype=jnp.int32)
    perm = jax.random.permutation(key, N).astype(jnp.int32)
    jax.block_until_ready((k32, v32, perm))
    out = {}

    def rec(name, ms, bytes_moved=None):
        out[name] = round(ms, 2)
        bw = f" | {bytes_moved/ms*1e3/2**30:.0f} GiB/s eff" \
            if bytes_moved and ms > 0 else ""
        log(f"{name:<30s} {ms:8.2f} ms{bw}")

    def loop(body, init_fn):
        """f(k): run body k times chained; scalar = sum of last."""
        @jax.jit
        def f(k):
            x = init_fn()
            x = jax.lax.fori_loop(0, k, lambda i, x: body(x, i), x)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b[:8].astype(jnp.int32)),
                x, jnp.int32(0))
        return f

    rec("sort_i32", slope(loop(
        lambda x, i: jax.lax.sort(x ^ i), lambda: k32)), 2 * 4 * N)
    rec("sort_i32_pair", slope(loop(
        lambda t, i: jax.lax.sort((t[0] ^ i, t[1]), num_keys=1),
        lambda: (k32, v32))), 2 * 8 * N)
    rec("sort_i32_4carry", slope(loop(
        lambda t, i: jax.lax.sort((t[0] ^ i,) + t[1:], num_keys=1),
        lambda: (k32, v32, v32, v32, v32))), 2 * 20 * N)
    rec("gather_i32_x1", slope(loop(
        lambda t, i: (jnp.take(t[0], t[1] ^ (i & 1)), t[1]),
        lambda: (v32, perm))), 3 * 4 * N)
    rec("gather_i32_x4", slope(loop(
        lambda t, i: tuple(jnp.take(c, t[4] ^ (i & 1))
                           for c in t[:4]) + (t[4],),
        lambda: (v32, v32, v32, v32, perm))), 9 * 4 * N)
    rec("scatter_i32", slope(loop(
        lambda t, i: (t[0].at[t[1] ^ (i & 1)].set(t[0]), t[1]),
        lambda: (v32, perm))), 3 * 4 * N)
    rec("scatter_add_100k", slope(loop(
        lambda t, i: (t[0] + jnp.zeros(100_000, jnp.int32)
                      .at[(t[1] ^ (i & 1)) % 100_000]
                      .add(t[0])[0], t[1]),
        lambda: (v32, perm))), 2 * 4 * N)
    rec("cumsum_i32", slope(loop(
        lambda x, i: jnp.cumsum(x ^ i)[:N], lambda: v32)), 2 * 4 * N)

    sk = jax.lax.sort(k32 % 100_000)
    jax.block_until_ready(sk)

    def seg(t, i):
        keys, vals = t
        b = jnp.concatenate([jnp.array([True]),
                             keys[1:] != keys[:-1]])
        sid = jnp.cumsum(b.astype(jnp.int32)) - 1
        s = jax.ops.segment_sum(vals ^ i, sid, num_segments=100_000)
        return keys, vals + s[0]
    rec("segment_sum_100k", slope(loop(seg, lambda: (sk, v32))),
        3 * 4 * N)

    def onehot(t, i):
        c, v = t
        oh = jax.nn.one_hot((c ^ (i & 1)) % 512, 512,
                            dtype=jnp.bfloat16)
        s = jnp.einsum("nk,n->k", oh, v.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return c, v + s[0].astype(jnp.int32)
    rec("onehot_matmul_512", slope(loop(onehot, lambda: (perm, v32))),
        4 * N)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
