"""Randomized device-vs-host join parity: left/inner/asof over random
tables with duplicate right keys, null keys, enum-ish symbol keys, and
multi-key combinations — the surfaces the golden suite samples only
pointwise."""
import os
import random

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["RAYFORCE_DEVICE"] = "1"

from rayforce_tpu import Runtime                       # noqa: E402
from rayforce_tpu.engine import device as dev          # noqa: E402
from rayforce_tpu.core.obj import Obj, table, vec_sym  # noqa: E402
from rayforce_tpu.core import types as T, symbols      # noqa: E402
from rayforce_tpu.core.fmt import format_top as fmt    # noqa: E402


def _mk_tables(rng, nl, nr, with_nulls):
    k1l = rng.integers(0, 40, nl).astype(np.int64)
    k1r = rng.integers(0, 60, nr).astype(np.int64)   # partial overlap
    k2l = rng.integers(-5, 5, nl).astype(np.int64)
    k2r = rng.integers(-5, 5, nr).astype(np.int64)
    if with_nulls:
        k1l[rng.integers(0, nl, max(nl // 30, 1))] = T.NULL_I64
        k1r[rng.integers(0, nr, max(nr // 30, 1))] = T.NULL_I64
    tl = rng.integers(0, 100_000, nl).astype(np.int64)
    tr_ = np.sort(rng.integers(0, 100_000, nr)).astype(np.int64)
    lt = table(vec_sym(["k1", "k2", "ts", "lv"]),
               [Obj(T.I64, k1l), Obj(T.I64, k2l), Obj(T.I64, tl),
                Obj(T.F64, rng.uniform(0, 10, nl))])
    rt_ = table(vec_sym(["k1", "k2", "ts", "rv", "w"]),
                [Obj(T.I64, k1r), Obj(T.I64, k2r), Obj(T.I64, tr_),
                 Obj(T.F64, rng.uniform(0, 10, nr)),
                 Obj(T.I64, rng.integers(0, 1000, nr)
                     .astype(np.int64))])
    return lt, rt_


QUERIES = [
    "(left-join [k1] l r)",
    "(inner-join [k1] l r)",
    "(left-join [k1 k2] l r)",
    "(inner-join [k1 k2] l r)",
    "(asof-join [k1 ts] l r)",
    "(asof-join [k1 k2 ts] l r)",
]


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("with_nulls", [False, True])
def test_join_fuzz(seed, with_nulls):
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(1000 + seed)
    rnd = random.Random(1000 + seed)
    nl = rnd.choice([800, 2500])
    nr = rnd.choice([300, 1700])
    lt, rt_ = _mk_tables(rng, nl, nr, with_nulls)
    rt = Runtime()
    rt.interp.globals[symbols.intern("l")] = lt
    rt.interp.globals[symbols.intern("r")] = rt_
    for q in QUERIES:
        dev.set_enabled(True)
        s_dev = fmt(rt.eval_str(q))
        dev.set_enabled(False)
        s_host = fmt(rt.eval_str(q))
        dev.set_enabled(True)
        assert s_dev == s_host, (seed, with_nulls, q)


SORT_QUERIES = [
    "(xasc t [k1])",
    "(xasc t [k1 k2])",
    "(xdesc t [k2 v])",
    "(xasc t [v])",
    "(xdesc t [k1 ts v])",
]


@pytest.mark.parametrize("seed", range(3))
def test_sort_fuzz(seed):
    """Device multi-key table sorts vs host: random tables with nulls,
    NaNs, duplicates across every key combination."""
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(2000 + seed)
    n = 3000
    k1 = rng.integers(0, 12, n).astype(np.int64)
    k1[rng.integers(0, n, 40)] = T.NULL_I64
    k2 = rng.integers(-4, 4, n).astype(np.int32)
    v = rng.uniform(-50, 50, n)
    v[rng.integers(0, n, 40)] = np.nan
    ts = rng.integers(0, 10**6, n).astype(np.int64)
    rt = Runtime()
    rt.interp.globals[symbols.intern("t")] = table(
        vec_sym(["k1", "k2", "v", "ts"]),
        [Obj(T.I64, k1), Obj(T.I32, k2), Obj(T.F64, v),
         Obj(T.I64, ts)])
    for q in SORT_QUERIES:
        dev.set_enabled(True)
        s_dev = fmt(rt.eval_str(q))
        dev.set_enabled(False)
        s_host = fmt(rt.eval_str(q))
        dev.set_enabled(True)
        assert s_dev == s_host, (seed, q)


@pytest.mark.parametrize("seed", range(12))
def test_window_join_fuzz(seed):
    """Randomized window-join/window-join1 parity: random windows
    (including empty and inverted ones), nulls in aggregated columns,
    duplicate (key, time) rows, every aggregate kind."""
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(3000 + seed)
    rnd = random.Random(3000 + seed)
    nl = rnd.choice([400, 1500])
    nr = rnd.choice([900, 2600])
    lk = rng.integers(0, 15, nl).astype(np.int64)
    lts = np.sort(rng.integers(0, 50_000, nl)).astype(np.int64)
    rk = rng.integers(0, 15, nr).astype(np.int64)
    rts = np.sort(rng.integers(0, 50_000, nr)).astype(np.int64)
    p = rng.uniform(-100, 100, nr)
    p[rng.integers(0, nr, max(nr // 25, 1))] = np.nan
    q_ = rng.integers(-50, 50, nr).astype(np.int64)
    q_[rng.integers(0, nr, max(nr // 25, 1))] = T.NULL_I64
    rt = Runtime()
    rt.interp.globals[symbols.intern("tr")] = table(
        vec_sym(["s", "ts"]), [Obj(T.I64, lk), Obj(T.I64, lts)])
    rt.interp.globals[symbols.intern("qt")] = table(
        vec_sym(["s", "ts", "p", "q"]),
        [Obj(T.I64, rk), Obj(T.I64, rts), Obj(T.F64, p),
         Obj(T.I64, q_)])
    w = rnd.choice([(-1000, 1000), (-5000, 0), (0, 0), (-1, 1),
                    (-20000, 20000)])
    for fn in ("window-join", "window-join1"):
        for aggs in ["{mx: (max p) mn: (min p)}",
                     "{s: (sum q) a: (avg p) c: (count p)}",
                     "{f: (first p) l: (last q)}",
                     "{d: (dev p) dq: (dev q)}"]:
            q = (f"({fn} [s ts] (map-left + [{w[0]} {w[1]}] "
                 f"(at tr 'ts)) tr qt {aggs})")
            dev.set_enabled(True)
            s_dev = fmt(rt.eval_str(q))
            dev.set_enabled(False)
            s_host = fmt(rt.eval_str(q))
            dev.set_enabled(True)
            assert s_dev == s_host, (seed, w, q)


@pytest.mark.parametrize("seed", range(3))
def test_serde_fuzz(seed):
    """Random nested objects survive ser -> de with identical
    formatting (the wire format used by IPC and blob files)."""
    from rayforce_tpu.storage import serde
    rnd = random.Random(4000 + seed)
    rng = np.random.default_rng(4000 + seed)
    rt = Runtime()

    def rand_obj(depth=0):
        kinds = ["i64v", "f64v", "symv", "str", "atom", "b8v"]
        if depth < 2:
            kinds += ["list", "dict", "table"]
        k = rnd.choice(kinds)
        n = rnd.randint(0, 6)
        if k == "i64v":
            a = rng.integers(-100, 100, n).astype(np.int64)
            if n and rnd.random() < 0.4:
                a[0] = T.NULL_I64
            return Obj(T.I64, a)
        if k == "f64v":
            a = rng.uniform(-10, 10, n)
            if n and rnd.random() < 0.4:
                a[0] = np.nan
            return Obj(T.F64, a)
        if k == "symv":
            return Obj(T.SYMBOL, np.asarray(
                [symbols.intern(f"s{rnd.randint(0, 5)}")
                 for _ in range(n)], dtype=np.int64))
        if k == "b8v":
            return Obj(T.B8, rng.integers(0, 2, n).astype(np.int8))
        if k == "str":
            from rayforce_tpu.core.obj import string
            return string("".join(rnd.choice("abc xyz\"\\n")
                                  for _ in range(n)))
        if k == "atom":
            return Obj(-T.I64, np.int64(rnd.randint(-50, 50)))
        if k == "list":
            from rayforce_tpu.core.obj import list_
            return list_([rand_obj(depth + 1)
                          for _ in range(rnd.randint(0, 4))])
        if k == "dict":
            from rayforce_tpu.core.obj import dict_, list_
            m = rnd.randint(1, 4)
            keys = Obj(T.SYMBOL, np.asarray(
                [symbols.intern(f"k{i}") for i in range(m)],
                dtype=np.int64))
            return dict_(keys, list_([rand_obj(depth + 1)
                                      for _ in range(m)]))
        m = rnd.randint(1, 3)
        nrows = rnd.randint(0, 5)
        return table(vec_sym([f"c{i}" for i in range(m)]),
                     [Obj(T.I64, rng.integers(0, 9, nrows)
                          .astype(np.int64)) for _ in range(m)])

    for _ in range(25):
        o = rand_obj()
        b = serde.ser_payload(o)
        o2 = serde.de_payload(bytes(b), rt.interp.env)
        assert fmt(o) == fmt(o2), (seed, fmt(o))


def test_asof_packed_tie_rule():
    """The packed (code,time,side) asof kernel (engine/join.py
    _match_kernel time_pack) must keep the reference tie rule: a right
    row at EXACTLY the left row's time matches, and among equal-time
    rights the LAST (highest row id) wins (core/index.c:3194-3266).
    Deterministic ties pin what the randomized fuzz only samples."""
    dev.set_threshold(1)
    dev.set_enabled(True)
    rt = Runtime()
    # right rows: key 1 at times [10, 10, 20]; key 2 at [15]
    rt.interp.globals[symbols.intern("r")] = table(
        vec_sym(["k", "ts", "rv"]),
        [Obj(T.I64, np.array([1, 1, 1, 2], dtype=np.int64)),
         Obj(T.I64, np.array([10, 10, 20, 15], dtype=np.int64)),
         Obj(T.I64, np.array([100, 200, 300, 400], dtype=np.int64))])
    # left probes: exact tie (10 -> last tied right, rv 200),
    # between (19 -> rv 200), at (20 -> rv 300), before any (5 -> null
    # LIST degrade), other key exact (15 -> 400)
    rt.interp.globals[symbols.intern("l")] = table(
        vec_sym(["k", "ts"]),
        [Obj(T.I64, np.array([1, 1, 1, 1, 2], dtype=np.int64)),
         Obj(T.I64, np.array([10, 19, 20, 5, 15], dtype=np.int64))])
    dev.set_enabled(True)
    s_dev = fmt(rt.eval_str("(asof-join [k ts] l r)"))
    dev.set_enabled(False)
    s_host = fmt(rt.eval_str("(asof-join [k ts] l r)"))
    dev.set_enabled(True)
    assert s_dev == s_host
    assert "200" in s_dev and "300" in s_dev and "400" in s_dev
