"""Device arithmetic fast path (ops/vops.py _dev_arith_fast) vs host:
+-* over device-resident vectors (with scalars and with each other)
must format identically to the host kernels across dtypes, nulls,
wrapping overflow, and temporal types. The fast path only engages for
columns that already live in HBM, so each case force-caches a device
copy first."""
import os
import random

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["RAYFORCE_DEVICE"] = "1"

from rayforce_tpu.engine import device as dev          # noqa: E402
from rayforce_tpu.core.obj import Obj                  # noqa: E402
from rayforce_tpu.core import types as T               # noqa: E402
from rayforce_tpu.core.fmt import format_top as fmt    # noqa: E402
from rayforce_tpu.ops import vops                      # noqa: E402


def _mk_vec(rng, kind, n):
    if kind == "i16":
        v = rng.integers(-3000, 3000, n).astype(np.int16)
        v[rng.integers(0, n, max(n // 8, 1))] = T.NULL_I16
        return Obj(T.I16, v)
    if kind == "i32":
        v = rng.integers(-(2**30), 2**30, n).astype(np.int32)
        v[rng.integers(0, n, max(n // 8, 1))] = T.NULL_I32
        return Obj(T.I32, v)
    if kind == "i64":
        v = rng.integers(-(2**40), 2**40, n).astype(np.int64)
        v[rng.integers(0, n, max(n // 8, 1))] = T.NULL_I64
        return Obj(T.I64, v)
    if kind == "f64":
        v = rng.uniform(-100, 100, n)
        v[rng.integers(0, n, max(n // 8, 1))] = np.nan
        return Obj(T.F64, v)
    if kind == "ts":
        v = rng.integers(0, 2**40, n).astype(np.int64)
        v[rng.integers(0, n, max(n // 8, 1))] = T.NULL_I64
        return Obj(T.TIMESTAMP, v)
    v = rng.integers(0, 20000, n).astype(np.int32)
    v[rng.integers(0, n, max(n // 8, 1))] = T.NULL_I32
    return Obj(T.DATE, v)


SCALARS = [Obj(-T.I64, np.int64(7)), Obj(-T.I64, np.int64(-3)),
           Obj(-T.F64, np.float64(2.5)),
           Obj(-T.I32, np.int32(11)), Obj(-T.I16, np.int16(4))]
OPS = ["add", "sub", "mul"]
KINDS = ["i16", "i32", "i64", "f64", "ts", "date"]


def _legal(op, a, b):
    try:
        vops.promote_arith(op, abs(a.t), abs(b.t))
        return True
    except Exception:
        return False


def _run(op, a, b):
    return fmt(vops.arith(op, a, b))


def _devify(o):
    dev.dev_col(o)   # caches the device copy on the Obj meta
    return o


@pytest.mark.parametrize("seed", range(3))
def test_arith_fast_scalar_vector(seed):
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(500 + seed)
    rnd = random.Random(500 + seed)
    n = 64
    for kind in KINDS:
        for op in OPS:
            for sc in SCALARS:
                host_v = _mk_vec(rng, kind, n)
                flip = rnd.random() < 0.5
                args = (sc, host_v) if flip else (host_v, sc)
                if not _legal(op, *args):
                    continue
                dev.set_enabled(False)
                s_host = _run(op, *args)
                dev.set_enabled(True)
                dv = _devify(Obj(host_v.t, host_v.v.copy()))
                dargs = (sc, dv) if flip else (dv, sc)
                res = vops.arith(op, *dargs)
                assert res.pending() is not None, \
                    (kind, op, "fast path did not engage")
                assert fmt(res) == s_host, (kind, op, flip, fmt(sc))


@pytest.mark.parametrize("seed", range(3))
def test_arith_fast_vector_vector(seed):
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(900 + seed)
    n = 64
    for ka in KINDS:
        for kb in KINDS:
            for op in OPS:
                a = _mk_vec(rng, ka, n)
                b = _mk_vec(rng, kb, n)
                if not _legal(op, a, b):
                    continue
                dev.set_enabled(False)
                s_host = _run(op, a, b)
                dev.set_enabled(True)
                da = _devify(Obj(a.t, a.v.copy()))
                db = _devify(Obj(b.t, b.v.copy()))
                res = vops.arith(op, da, db)
                assert res.pending() is not None, \
                    (ka, kb, op, "fast path did not engage")
                assert fmt(res) == s_host, (ka, kb, op)


def test_arith_fast_not_engaged_without_device_copy():
    """Host-only vectors must keep the host path (no silent upload)."""
    dev.set_threshold(1)
    dev.set_enabled(True)
    a = Obj(T.I64, np.arange(64, dtype=np.int64))
    res = vops.arith("add", a, Obj(-T.I64, np.int64(1)))
    assert res.pending() is None