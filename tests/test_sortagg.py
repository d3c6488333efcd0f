"""Mid-cardinality sort-agg engine (engine/sortagg.py): device-vs-host
parity across key cardinalities, aggregate kinds, null patterns, and the
head/straggler machinery (head windows shrunk to force both the
head-ordered fast path and the exact fallback)."""
import os
import random

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["RAYFORCE_DEVICE"] = "1"

from rayforce_tpu import Runtime                       # noqa: E402
from rayforce_tpu.engine import device as dev          # noqa: E402
from rayforce_tpu.engine import sortagg                # noqa: E402
from rayforce_tpu.core.obj import Obj, table, vec_sym  # noqa: E402
from rayforce_tpu.core import types as T, symbols      # noqa: E402
from rayforce_tpu.core.fmt import format_top as fmt    # noqa: E402


def _mk(rng, n, card):
    k = rng.integers(0, card, n).astype(np.int64)
    v1 = rng.integers(-50, 50, n).astype(np.int64)
    v1[rng.integers(0, n, max(n // 40, 1))] = T.NULL_I64
    v2 = rng.integers(0, 30, n).astype(np.int32)
    v3 = rng.uniform(-100, 100, n)
    v3[rng.integers(0, n, max(n // 40, 1))] = np.nan
    sy = Obj(T.SYMBOL, np.asarray(
        [symbols.intern(f"s{i}") for i in rng.integers(0, 5, n)],
        dtype=np.int64))
    return table(vec_sym(["k", "v1", "v2", "v3", "sy"]),
                 [Obj(T.I64, k), Obj(T.I64, v1), Obj(T.I32, v2),
                  Obj(T.F64, v3), sy])


QUERIES = [
    "(select {s: (sum v1) from: t by: k})",
    "(select {a: (avg v3) c: (count v1) from: t by: k})",
    "(select {mx: (max v2) mn: (min v1) from: t by: k})",
    "(select {mx: (max v3) mn: (min v3) from: t by: k})",
    "(select {f: (first v3) l: (last v1) from: t by: k})",
    "(select {m: (med v3) from: t by: k})",
    "(select {m: (med v1) s: (sum v2) from: t by: k})",
    "(select {d: (dev v3) from: t by: k})",
    "(select {d: (dev v1) from: t by: k})",
    "(select {s: (sum v1) from: t by: k where: (> v2 10)})",
    "(select {f: (first sy) l: (last sy) from: t by: k "
    "where: (< v3 50.0)})",
    "(select {s: (sum (+ v1 v2)) from: t by: k})",
]


def _run_both(rt, q):
    dev.set_enabled(True)
    s_dev = fmt(rt.eval_str(q))
    dev.set_enabled(False)
    s_host = fmt(rt.eval_str(q))
    dev.set_enabled(True)
    assert s_dev == s_host, q


@pytest.mark.parametrize("card", [600, 2500, 20000])
def test_sortagg_parity(card):
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(card)
    rt = Runtime()
    rt.interp.globals[symbols.intern("t")] = _mk(rng, 20000, card)
    for q in QUERIES:
        _run_both(rt, q)


def test_sortagg_head_variant_and_fallback():
    """Shrink the head window so the head-ordered variant runs, then
    poison the tail so the straggler flag trips the exact fallback."""
    old_m, old_f = sortagg.HEAD_M, sortagg.HEAD_FACTOR
    try:
        sortagg.HEAD_M, sortagg.HEAD_FACTOR = 4096, 1
        dev.set_threshold(1)
        dev.set_enabled(True)
        rng = np.random.default_rng(7)
        n = 20000
        rt = Runtime()

        # (a) every group appears in the first 4096 rows -> head path
        t1 = _mk(rng, n, 600)
        rt.interp.globals[symbols.intern("t")] = t1
        for q in QUERIES[:6]:
            _run_both(rt, q)

        # (b) one group appears ONLY in the last rows -> straggler
        k = rng.integers(0, 600, n).astype(np.int64)
        k[:n - 10] = k[:n - 10] % 599          # group 599 only at tail
        k[n - 10:] = 599
        t2 = _mk(rng, n, 600)
        t2.v[1][0] = Obj(T.I64, k)
        rt.interp.globals[symbols.intern("u")] = t2
        for q in ["(select {s: (sum v1) f: (first v1) from: u by: k})",
                  "(select {l: (last v3) c: (count v1) from: u by: k})"]:
            dev.set_enabled(True)
            s_dev = fmt(rt.eval_str(q))
            dev.set_enabled(False)
            s_host = fmt(rt.eval_str(q))
            dev.set_enabled(True)
            assert s_dev == s_host, q
    finally:
        sortagg.HEAD_M, sortagg.HEAD_FACTOR = old_m, old_f


def test_sortagg_two_keys_enumish():
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(11)
    n = 9000
    k1 = rng.integers(0, 40, n).astype(np.int64)
    k2 = rng.integers(-20, 20, n).astype(np.int64)
    v = rng.uniform(0, 10, n)
    rt = Runtime()
    rt.interp.globals[symbols.intern("t")] = table(
        vec_sym(["k1", "k2", "v"]),
        [Obj(T.I64, k1), Obj(T.I64, k2), Obj(T.F64, v)])
    for q in ["(select {s: (sum v) from: t by: {k1: k1 k2: k2}})",
              "(select {a: (avg v) c: (count v) from: t "
              "by: {k1: k1 k2: k2} where: (> v 2.0)})"]:
        _run_both(rt, q)


def test_sortagg_plan_used():
    """The mid-card route really goes through the sort-agg engine."""
    from rayforce_tpu.engine import select as sel
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(3)
    rt = Runtime()
    rt.interp.globals[symbols.intern("t")] = _mk(rng, 8000, 1500)
    rt.eval_str("(select {s: (sum v1) from: t by: k})")
    assert sel.last_profile.get("engine") == "sortagg"
    assert sel.last_profile.get("n_codes") >= 1500
