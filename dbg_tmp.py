import numpy as np, time
from rayforce_tpu import Runtime
from rayforce_tpu.engine import device as dev
rt = Runtime()
N = 1_000_000
rng = np.random.default_rng(42)
from rayforce_tpu.core.obj import Obj, table, vec_sym, to_np
from rayforce_tpu.core import types as T, symbols
cols = [Obj(T.I64, rng.integers(0,100,N).astype(np.int64)),
        Obj(T.I64, rng.integers(1,6,N).astype(np.int64)),
        Obj(T.F64, rng.uniform(0,100,N))]
tbl = table(vec_sym(["id1","v1","v3"]), cols)
rt.interp.globals[symbols.intern("t")] = tbl
dev.put_table(tbl)
q = "(select {s: (sum v1) mx: (max v3) from: t by: id1 where: (> v3 50.0)})"
rd = rt.eval_str(q)
dev.set_enabled(False)
rh = rt.eval_str(q)
a = to_np(rd.v[1][2]); b = to_np(rh.v[1][2])
bad = np.nonzero(a != b)[0]
print("mismatches:", len(bad), bad[:5])
for i in bad[:3]:
    print(i, repr(a[i]), repr(b[i]), (a[i]-b[i]))
    k = to_np(rd.v[1][0])[i]
    print("  key:", k)
    id1 = to_np(cols[0]); v3=to_np(cols[2])
    m=(id1==k)&(v3>50.0)
    print("  np max:", repr(v3[m].max()))
