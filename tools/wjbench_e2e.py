#!/usr/bin/env python3
"""End-to-end wj bench phase breakdown replicating bench.py's wj
exactly (device-resident tables), split at interp boundaries:
window-bounds eval, window-join eval, per-column force."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import random as jrandom

from rayforce_tpu.core.obj import Obj, DevPending, table, vec_sym
from rayforce_tpu.core import types as T, symbols
from rayforce_tpu import Runtime
from rayforce_tpu.engine import device as dev


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def dev_table(names, specs, n):
    @jax.jit
    def gen():
        key = jrandom.PRNGKey(7)
        out = []
        for i, (kind, a, b) in enumerate(specs):
            k = jrandom.fold_in(key, i)
            if kind == "int":
                out.append(jrandom.randint(k, (n,), a, b,
                                           dtype=jnp.int64))
            elif kind == "sorted_int":
                v = jrandom.randint(k, (n,), a, b, dtype=jnp.int64)
                out.append(jnp.sort(v))
            else:
                v = jrandom.uniform(k, (n,), dtype=jnp.float64,
                                    minval=a, maxval=b)
                out.append(jnp.round(v * 1e6) / 1e6)
        return out
    arrs = gen()
    jax.block_until_ready(arrs)
    cols = []
    for (kind, _a, _b), arr in zip(specs, arrs):
        t = T.F64 if kind == "f64" else T.I64
        o = Obj(t, DevPending(arr))
        o.meta = {"dev": arr}
        cols.append(o)
    t_ = table(vec_sym(names), cols)
    dev.put_table(t_)
    return t_


def main():
    NT, NQ = 10_000_000, 20_000_000
    rt = Runtime()
    trades = dev_table(["sym", "ts"],
                       [("int", 0, 18_000),
                        ("sorted_int", 0, 2_000_000_000)], NT)
    quotes = dev_table(["sym", "ts", "p"],
                       [("int", 0, 18_000),
                        ("sorted_int", 0, 2_000_000_000),
                        ("f64", 10.0, 200.0)], NQ)
    rt.interp.globals[symbols.intern("trades")] = trades
    rt.interp.globals[symbols.intern("quotes")] = quotes
    log("tables ready")

    for it in range(3):
        t0 = time.perf_counter()
        rt.eval_str("(set 'w (map-left + [-1000 1000] "
                    "(at trades 'ts)))")
        t1 = time.perf_counter()
        res = rt.eval_str("(window-join1 [sym ts] w trades quotes "
                          "{mx: (max p) mn: (min p)})")
        t2 = time.perf_counter()
        _, cols_ = res.v
        ts_f = []
        for c in cols_:
            p = c.pending() if hasattr(c, "pending") else None
            if p is not None:
                ta = time.perf_counter()
                jax.block_until_ready(p.arr)
                ts_f.append((time.perf_counter() - ta) * 1000)
        t3 = time.perf_counter()
        log(f"iter {it}: bounds {1000*(t1-t0):8.1f} ms | "
            f"wj eval {1000*(t2-t1):8.1f} ms | "
            f"forces {[round(x,1) for x in ts_f]} | "
            f"total {1000*(t3-t0):8.1f} ms")


if __name__ == "__main__":
    main()
