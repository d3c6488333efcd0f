"""High-cardinality (wide) device group-by vs host parity, including
multi-word key packing (key spaces beyond 2^62) and where-filters."""
import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["RAYFORCE_DEVICE"] = "1"

from rayforce_tpu import Runtime                       # noqa: E402
from rayforce_tpu.engine import device as dev          # noqa: E402
from rayforce_tpu.core.obj import Obj, table, vec_sym  # noqa: E402
from rayforce_tpu.core import types as T, symbols      # noqa: E402
from rayforce_tpu.core.fmt import format_top as fmt    # noqa: E402


def _run_both(rt, q):
    dev.set_enabled(True)
    s_dev = fmt(rt.eval_str(q))
    dev.set_enabled(False)
    s_host = fmt(rt.eval_str(q))
    dev.set_enabled(True)
    assert s_dev == s_host, q


@pytest.fixture
def rt():
    dev.set_threshold(1)
    dev.set_enabled(True)
    return Runtime()


def test_wide_two_keys(rt):
    rng = np.random.default_rng(21)
    n = 30000
    k1 = rng.integers(0, 2000, n).astype(np.int64)
    k2 = rng.integers(0, 1000, n).astype(np.int64)
    v1 = rng.integers(-50, 50, n).astype(np.int64)
    v1[rng.integers(0, n, 200)] = T.NULL_I64
    v3 = rng.uniform(-10, 10, n)
    v3[rng.integers(0, n, 200)] = np.nan
    rt.interp.globals[symbols.intern("t")] = table(
        vec_sym(["k1", "k2", "v1", "v3"]),
        [Obj(T.I64, k1), Obj(T.I64, k2), Obj(T.I64, v1),
         Obj(T.F64, v3)])
    for q in [
        "(select {s: (sum v1) c: (count v1) from: t "
        "by: {k1: k1 k2: k2}})",
        "(select {a: (avg v3) mx: (max v1) from: t "
        "by: {k1: k1 k2: k2}})",
        "(select {mn: (min v3) from: t by: {k1: k1 k2: k2} "
        "where: (> v1 0)})",
        "(select {f: (first v3) l: (last v1) from: t "
        "by: {k1: k1 k2: k2}})",
    ]:
        _run_both(rt, q)
    from rayforce_tpu.engine import select as sel
    assert sel.last_profile.get("engine") == "wide"


def test_wide_multiword_keys(rt):
    """Key ranges whose packed width exceeds one 61-bit word."""
    rng = np.random.default_rng(5)
    n = 20000
    k1 = (rng.integers(0, 1 << 20, n).astype(np.int64) << 15)
    k2 = (rng.integers(0, 1 << 20, n).astype(np.int64) << 20)
    k3 = rng.integers(0, 500, n).astype(np.int64)
    v = rng.uniform(0, 100, n)
    rt.interp.globals[symbols.intern("t")] = table(
        vec_sym(["k1", "k2", "k3", "v"]),
        [Obj(T.I64, k1), Obj(T.I64, k2), Obj(T.I64, k3),
         Obj(T.F64, v)])
    _run_both(rt, "(select {s: (sum v) c: (count v) from: t "
                  "by: {k1: k1 k2: k2 k3: k3}})")


def test_wide_all_rows_distinct(rt):
    rng = np.random.default_rng(9)
    n = 20000
    k = rng.permutation(np.arange(3_000_000, dtype=np.int64))[:n]
    v = rng.integers(0, 100, n).astype(np.int64)
    rt.interp.globals[symbols.intern("t")] = table(
        vec_sym(["k", "v"]),
        [Obj(T.I64, k), Obj(T.I64, v)])
    _run_both(rt, "(select {s: (sum v) from: t by: k})")
