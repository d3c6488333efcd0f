import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["RAYFORCE_DEVICE"] = "1"
os.environ["RAYFORCE_DEBUG"] = "1"
import numpy as np
from rayforce_tpu import Runtime
from rayforce_tpu.engine import device as dev
from rayforce_tpu.core.obj import Obj, table, vec_sym
from rayforce_tpu.core import types as T, symbols
from rayforce_tpu.core.fmt import format_top as fmt

dev.set_threshold(1)
N = 5000
rng = np.random.default_rng(7)
id1 = rng.integers(0, 7, N).astype(np.int64)
id2 = rng.integers(0, 5, N).astype(np.int64)
id3 = rng.integers(0, 1500, N).astype(np.int64)
v1 = rng.integers(-3, 6, N).astype(np.int64)
v1[rng.integers(0, N, 50)] = T.NULL_I64
v2 = rng.integers(0, 100, N).astype(np.int32)
v3 = rng.uniform(-50, 100, N)
v3[rng.integers(0, N, 50)] = np.nan
big = rng.integers(-2**62, 2**62, N).astype(np.int64)
allnull = np.full(N, T.NULL_I64, dtype=np.int64)
allnan = np.full(N, np.nan)
cols = [Obj(T.I64, id1), Obj(T.I64, id2), Obj(T.I64, id3),
        Obj(T.I64, v1), Obj(T.I32, v2), Obj(T.F64, v3), Obj(T.I64, big),
        Obj(T.I64, allnull), Obj(T.F64, allnan)]
tbl = table(vec_sym(["id1", "id2", "id3", "v1", "v2", "v3", "big",
                     "an", "af"]), cols)
rt = Runtime()
rt.interp.globals[symbols.intern("t")] = tbl
dev.put_table(tbl)

queries = [
    "(select {s: (sum v1) from: t by: id1})",
    "(select {s: (sum v1) c: (count v1) from: t by: {id1: id1 id2: id2}})",
    "(select {a: (avg v3) s: (sum v3) from: t by: id1})",
    "(select {mx: (max v1) mn: (min v1) from: t by: id2})",
    "(select {mx: (max v3) mn: (min v3) from: t by: id1})",
    "(select {f: (first v2) l: (last v2) from: t by: id1})",
    "(select {s: (sum v2) from: t by: id1 where: (> v3 0)})",
    "(select {s: (sum big) from: t by: id2})",
    "(select {mn: (min an) mx: (max an) a: (avg an) from: t by: id1})",
    "(select {mn: (min af) mx: (max af) s: (sum af) from: t by: id1})",
    "(select {s: (sum v1) a: (avg v3) from: t by: id3})",
    "(select {mx: (max v1) mn: (min v3) from: t by: id3})",
    "(select {f: (first v2) l: (last v3) from: t by: id3})",
    "(select {s: (sum v3) from: t by: id3 where: (> v2 50)})",
    "(select {s: (sum big) from: t by: id3})",
    "(select {a: (avg v1) from: t by: {id3: id3 id2: id2}})",
    "(select {mn: (min an) s: (sum af) from: t by: id3})",
    "(select {a: (avg v2) s2: (sum v2) from: t by: id2})",
]
fails = 0
for q in queries:
    r_dev = rt.eval_str(q)
    dev.set_enabled(False)
    r_host = rt.eval_str(q)
    dev.set_enabled(True)
    s_dev, s_host = fmt(r_dev), fmt(r_host)
    if s_dev != s_host:
        fails += 1
        print(f"MISMATCH: {q}")
        n = 0
        for a, b in zip(s_dev.splitlines(), s_host.splitlines()):
            if a != b and n < 4:
                print("  dev :", a); print("  host:", b); n += 1
    else:
        print(f"ok: {q}")
print("FAILS:", fails)
