import time
import numpy as np, jax
from rayforce_tpu import Runtime
from rayforce_tpu.engine import device as dev
from rayforce_tpu.core.obj import Obj, table, vec_sym
from rayforce_tpu.core import types as T, symbols

rng = np.random.default_rng(7)
NT, NQ = 10_000_000, 20_000_000
trades = table(vec_sym(["sym", "ts"]),
               [Obj(T.I64, rng.integers(0, 18_000, NT).astype(np.int64)),
                Obj(T.I64, np.sort(rng.integers(0, 2_000_000_000, NT)).astype(np.int64))])
quotes = table(vec_sym(["sym", "ts", "p"]),
               [Obj(T.I64, rng.integers(0, 18_000, NQ).astype(np.int64)),
                Obj(T.I64, np.sort(rng.integers(0, 2_000_000_000, NQ)).astype(np.int64)),
                Obj(T.F64, rng.uniform(10, 200, NQ))])
rt = Runtime()
rt.interp.globals[symbols.intern("trades")] = trades
rt.interp.globals[symbols.intern("quotes")] = quotes
dev.put_table(trades); dev.put_table(quotes)
print("staged", flush=True)
q = ("(window-join1 [sym ts] (map-left + [-1000 1000] "
     "(at trades 'ts)) trades quotes {mx: (max p) mn: (min p)})")
for i in range(3):
    t0 = time.perf_counter()
    res = rt.eval_str(q)
    devarrs = [c.pending().arr for c in res.v[1] if c.pending()]
    jax.block_until_ready(devarrs)
    print(f"wj run {i}: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)
