"""Decimal fixed-point (qscale) column stats + the sort-engine fast
paths they unlock: i32 quantized sort operands, free top-field
boundary extremes, searchsorted boundary compaction, and bcast-lane
integer sums (no one-hot matmul) in the small dense engine.

These target the round-3 perf work: the reference's v3 column is
round(uniform, 6) (db-benchmark G1), so grouped sum/avg/min/max/med of
it can ride sorts as exact i32 instead of (emulated) f64."""
import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["RAYFORCE_DEVICE"] = "1"

from rayforce_tpu import Runtime                       # noqa: E402
from rayforce_tpu.engine import device as dev          # noqa: E402
from rayforce_tpu.engine import select as sel          # noqa: E402
from rayforce_tpu.engine import sortagg                # noqa: E402
from rayforce_tpu.core.obj import Obj, table, vec_sym  # noqa: E402
from rayforce_tpu.core import types as T, symbols      # noqa: E402
from rayforce_tpu.core.fmt import format_top as fmt    # noqa: E402


@pytest.fixture(autouse=True)
def _dev():
    dev.set_enabled(True)
    dev.set_threshold(1)
    yield
    dev.set_enabled(True)


def _col(a):
    return Obj(T.F64 if a.dtype == np.float64 else T.I64, a)


def _put(rt, name, cols):
    t = table(vec_sym(list(cols)), [_col(a) for a in cols.values()])
    rt.interp.globals[symbols.intern(name)] = t
    dev.put_table(t)
    return t


def _parity(rt, q, engine=None):
    sd = fmt(rt.eval_str(q))
    if engine is not None:
        assert sel.last_profile.get("engine") == engine, \
            (q, sel.last_profile)
    dev.set_enabled(False)
    sh = fmt(rt.eval_str(q))
    dev.set_enabled(True)
    assert sd == sh, f"{q}\nDEVICE:\n{sd}\nHOST:\n{sh}"


def test_qscale_stat_detection():
    rng = np.random.default_rng(0)
    rt = Runtime()
    dec6 = np.round(rng.uniform(0, 100, 5000), 6)
    dec2 = np.round(rng.uniform(-50, 50, 5000), 2)
    ints = rng.integers(-1000, 1000, 5000).astype(np.float64)
    cont = rng.uniform(0, 1, 5000)
    big = rng.uniform(0, 1e10, 5000)        # scaled values overflow i32
    withnan = np.round(rng.uniform(0, 10, 5000), 4)
    withnan[::7] = np.nan
    t = _put(rt, "t", {"a": dec6, "b": dec2, "c": ints, "d": cont,
                       "e": big, "f": withnan})
    cols = dict(zip(["a", "b", "c", "d", "e", "f"], t.v[1]))
    assert dev.column_qscale(cols["a"]) == 1e6
    assert dev.column_qscale(cols["b"]) == 1e2
    assert dev.column_qscale(cols["c"]) == 1.0
    assert dev.column_qscale(cols["d"]) is None
    assert dev.column_qscale(cols["e"]) is None
    assert dev.column_qscale(cols["f"]) == 1e4   # NaNs are skipped


def test_quantized_operand_parity_sortagg():
    """Mid-card group-by with a decimal f64 column (incl. NaNs and an
    all-null group): sum/avg/min/max/med ride the i32 quantized
    operand and must format identically to the host."""
    rng = np.random.default_rng(1)
    n = 6000
    k = rng.integers(0, 600, n).astype(np.int64)
    v = np.round(rng.uniform(-80, 80, n), 6)
    v[rng.integers(0, n, 60)] = np.nan
    v[k == 3] = np.nan           # all-null group
    rt = Runtime()
    _put(rt, "t", {"k": k, "v": v})
    _parity(rt, "(select {s: (sum v) a: (avg v) mx: (max v) "
                "mn: (min v) m: (med v) from: t by: k})", "sortagg")


def test_quantized_operand_exact_fallback():
    """The straggler/exact plan re-packs the key with position bits —
    quantized operands and (disabled) free extremes must stay
    consistent there too."""
    rng = np.random.default_rng(2)
    old_m, old_f = sortagg.HEAD_M, sortagg.HEAD_FACTOR
    sortagg.HEAD_M, sortagg.HEAD_FACTOR = 64, 1   # force straggler
    try:
        n = 4000
        k = rng.integers(0, 600, n).astype(np.int64)
        v = np.round(rng.uniform(0, 100, n), 6)
        w = rng.integers(1, 6, n).astype(np.int64)
        rt = Runtime()
        _put(rt, "t", {"k": k, "v": v, "w": w})
        _parity(rt, "(select {s: (sum v) mn: (min v) mx: (max w) "
                    "f: (first v) from: t by: k})", "sortagg")
    finally:
        sortagg.HEAD_M, sortagg.HEAD_FACTOR = old_m, old_f


def test_free_boundary_extremes_multi_field():
    """q6 shape: min/max of two distinct small-int packed columns —
    one field rides the top of the key (free boundary extremes), the
    other segments-scans; both must match the host."""
    rng = np.random.default_rng(3)
    n = 6000
    k = rng.integers(0, 700, n).astype(np.int64)
    v1 = rng.integers(1, 6, n).astype(np.int64)
    v2 = rng.integers(1, 16, n).astype(np.int64)
    rt = Runtime()
    _put(rt, "t", {"k": k, "v1": v1, "v2": v2})
    _parity(rt, "(select {mx: (max v1) mn: (min v2) from: t by: k})",
            "sortagg")
    _parity(rt, "(select {mx: (max v1) mn: (min v1) s: (sum v1) "
                "from: t by: k})", "sortagg")


def test_sort_compaction_beyond_searchsorted_cap():
    """NCAP > SEARCH_NCAP keeps the i32-sort compaction path alive."""
    rng = np.random.default_rng(4)
    n = 40000
    nc = sortagg.SEARCH_NCAP * 2
    k = rng.integers(0, nc, n).astype(np.int64)
    v = rng.integers(-5, 20, n).astype(np.int64)
    rt = Runtime()
    _put(rt, "t", {"k": k, "v": v})
    _parity(rt, "(select {s: (sum v) c: (count v) from: t by: k})",
            "sortagg")


def test_small_path_bcast_int_sums():
    """q1/q4 shapes: every int sum is stats-bounded, so the small
    dense engine runs with NO matmul scan; nulls must still propagate
    (plain-column grouped sum) and avg must skip them."""
    rng = np.random.default_rng(5)
    n = 9000
    k = rng.integers(0, 100, n).astype(np.int64)
    v1 = rng.integers(1, 6, n).astype(np.int64)
    v1[rng.integers(0, n, 40)] = T.NULL_I64
    v2 = rng.integers(1, 16, n).astype(np.int64)
    v3 = np.round(rng.uniform(0, 100, n), 6)
    rt = Runtime()
    _put(rt, "t", {"k": k, "v1": v1, "v2": v2, "v3": v3})
    _parity(rt, "(select {s: (sum v1) from: t by: k})")
    _parity(rt, "(select {a1: (avg v1) a2: (avg v2) a3: (avg v3) "
                "from: t by: k})")
    _parity(rt, "(select {s: (sum v2) c: (count v2) mn: (min v1) "
                "f: (first v3) from: t by: k where: (> v3 50.0)})")


def test_quantized_operand_parity_wide():
    """q7 shape: a high-cardinality multi-key group-by (wide engine)
    summing a decimal f64 column with NaNs — rides the i32 quantized
    operand through the multi-word key sort."""
    rng = np.random.default_rng(7)
    n = 30000
    k1 = rng.integers(0, 2000, n).astype(np.int64)
    k2 = rng.integers(0, 1000, n).astype(np.int64)
    v = np.round(rng.uniform(0, 100, n), 6)
    v[rng.integers(0, n, 100)] = np.nan
    rt = Runtime()
    _put(rt, "t", {"k1": k1, "k2": k2, "v": v})
    sd = fmt(rt.eval_str("(select {s: (sum v) c: (count v) mn: (min v)"
                         " from: t by: {k1: k1 k2: k2}})"))
    assert sel.last_profile.get("engine") == "wide", sel.last_profile
    dev.set_enabled(False)
    sh = fmt(rt.eval_str("(select {s: (sum v) c: (count v) mn: (min v)"
                         " from: t by: {k1: k1 k2: k2}})"))
    dev.set_enabled(True)
    assert sd == sh


def test_small_path_spmd_bcast_sums():
    """The SPMD small path psum-combines the bcast lanes (counts,
    nullcnt, int sums) across the virtual mesh."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    os.environ["RAYFORCE_MESH"] = str(len(jax.devices()))
    dev._mesh_state.clear()
    dev._mesh_state.update({"mesh": None, "checked": False})
    try:
        rng = np.random.default_rng(6)
        n = 8 * 1021 + 5
        k = rng.integers(0, 50, n).astype(np.int64)
        v = rng.integers(-9, 9, n).astype(np.int64)
        v[rng.integers(0, n, 30)] = T.NULL_I64
        rt = Runtime()
        _put(rt, "t", {"k": k, "v": v})
        _parity(rt, "(select {s: (sum v) a: (avg v) c: (count v) "
                    "from: t by: k})")
    finally:
        os.environ.pop("RAYFORCE_MESH", None)
        dev._mesh_state.clear()
        dev._mesh_state.update({"mesh": None, "checked": False})
