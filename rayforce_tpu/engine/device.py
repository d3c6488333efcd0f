"""TPU device engine: fused columnar kernels over HBM-resident columns.

Design (empirically pinned on TPU v5e, see BENCH notes):
- segment scatter ops are at roofline for i32/f32/f64 values with i32 keys;
  64-bit integer scatters are catastrophically slow (emulated) -> i64
  reductions decompose into three 22-bit limbs accumulated in f64 (exact:
  2^22 * 10^7 < 2^53).
- group-by uses DENSE codes: each key column maps into its value range
  (reference index.c perfect/range-multiplier strategy); the combined code
  is an i32. Aggregates scatter into a dense (n_codes+1)-slot buffer whose
  last slot swallows filtered-out rows — filter+group+aggregate fuse into
  one pass with NO row materialization.
- first-appearance group ordering (reference contract) is recovered at the
  end from segment_min(row_index): a small host-side compaction.

Columns stay numpy on the host control plane; device copies are cached per
column object. Everything under jit is static-shape; kernels are cached by
(n_rows, n_codes, dtype) via jit's own cache.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from ..core import types as T
from ..core.obj import Obj, to_np

# -- configuration ----------------------------------------------------------

_cfg = {
    "enabled": None,      # auto-detect
    "threshold": 1 << 17,  # rows below this stay on the host numpy path
    "dense_max": 1 << 22,  # max dense group-code space
}


def available() -> bool:
    if _cfg["enabled"] is None:
        try:
            plat = jax.default_backend()
            _cfg["enabled"] = plat in ("tpu", "axon") or \
                os.environ.get("RAYFORCE_DEVICE", "") == "1"
        except Exception:
            _cfg["enabled"] = False
    return bool(_cfg["enabled"])


def set_enabled(flag) -> None:
    _cfg["enabled"] = flag


def set_threshold(n: int) -> None:
    _cfg["threshold"] = n


def should_use(n_rows: int) -> bool:
    return available() and n_rows >= _cfg["threshold"]


# -- column device cache ----------------------------------------------------

def dev_col(col: Obj):
    """Device copy of a column's payload, cached on the Obj."""
    if isinstance(col.meta, dict) and "dev" in col.meta:
        return col.meta["dev"]
    arr = jnp.asarray(to_np(col))
    if not isinstance(col.meta, dict):
        col.meta = {}
    col.meta["dev"] = arr
    return arr


def put_table(tbl: Obj) -> None:
    """Pre-stage all columns of a table into HBM."""
    _, cols = tbl.v
    for c in cols:
        if c.t != T.LIST and c.t > 0:
            dev_col(c).block_until_ready()


# -- jitted primitives ------------------------------------------------------

@partial(jax.jit, static_argnames=("n",))
def k_count(codes, n):
    return jax.ops.segment_sum(jnp.ones_like(codes, dtype=jnp.int32),
                               codes, num_segments=n)


@partial(jax.jit, static_argnames=("n",))
def k_first_idx(codes, n):
    idx = jnp.arange(codes.shape[0], dtype=jnp.int32)
    return jax.ops.segment_min(idx, codes, num_segments=n)


def sum_i64_raw(codes, v, n):
    """Exact i64 segment sum via three 22-bit limbs in f64 (traceable)."""
    u = v.astype(jnp.uint64)
    lo = (u & 0x3FFFFF).astype(jnp.float64)
    mid = ((u >> 22) & 0x3FFFFF).astype(jnp.float64)
    hi = ((u >> 44) & 0xFFFFF).astype(jnp.float64)
    slo = jax.ops.segment_sum(lo, codes, num_segments=n)
    smid = jax.ops.segment_sum(mid, codes, num_segments=n)
    shi = jax.ops.segment_sum(hi, codes, num_segments=n)
    return (slo.astype(jnp.int64) + (smid.astype(jnp.int64) << 22)
            + (shi.astype(jnp.int64) << 44))


k_sum_i64 = partial(jax.jit, static_argnames=("n",))(sum_i64_raw)


@partial(jax.jit, static_argnames=("n",))
def k_sum_f64(codes, v, n):
    return jax.ops.segment_sum(v, codes, num_segments=n)


def minmax_i64_raw(codes, v, n, is_min):
    """Exact i64 segment min/max via two i32 passes (hi then lo).
    Nulls (INT64_MIN) are skipped: they lose to any value (ops.h:180)."""
    if is_min:
        v = jnp.where(v == jnp.int64(-0x8000000000000000),
                      jnp.int64(0x7FFFFFFFFFFFFFFF), v)
    u = (v ^ jnp.int64(-0x8000000000000000)).astype(jnp.uint64)
    hi = (u >> 32).astype(jnp.int64) - 0x80000000
    hi = hi.astype(jnp.int32)
    op = jax.ops.segment_min if is_min else jax.ops.segment_max
    hi_red = op(hi, codes, num_segments=n)
    sentinel = jnp.int32(0x7FFFFFFF if is_min else -0x80000000)
    lo = (u & 0xFFFFFFFF).astype(jnp.int64) - 0x80000000
    lo = lo.astype(jnp.int32)
    mask = hi == hi_red[codes]
    lo_m = jnp.where(mask, lo, sentinel)
    lo_red = op(lo_m, codes, num_segments=n)
    hi_u = (hi_red.astype(jnp.int64) + 0x80000000).astype(jnp.uint64)
    lo_u = (lo_red.astype(jnp.int64) + 0x80000000).astype(jnp.uint64)
    return (((hi_u << 32) | lo_u).astype(jnp.int64)
            ^ jnp.int64(-0x8000000000000000))


k_minmax_i64 = partial(jax.jit,
                       static_argnames=("n", "is_min"))(minmax_i64_raw)


def f64_order_key(v):
    """Order-preserving i64 key for f64 bits (sign-flip trick, the same
    idea as the reference's radix f64 sort, core/sort.c:266-285). Needed
    because this TPU emulates f64 arithmetic with a float32 pair
    (~49-bit mantissa): comparing through arithmetic perturbs values, but
    integer bit manipulation is exact."""
    b = jax.lax.bitcast_convert_type(v, jnp.int64)
    return jnp.where(b < 0, ~b, b ^ jnp.int64(-0x8000000000000000))


def f64_from_order_key(k):
    b = jnp.where(k < 0, ~k, k ^ jnp.int64(-0x8000000000000000))
    return jax.lax.bitcast_convert_type(b, jnp.float64)


def minmax_f64_raw(codes, v, n, is_min):
    """Bit-exact f64 segment min/max: reduce the order key with the
    2-pass i32 kernel, then bitcast back. NaNs are skipped."""
    nn = jnp.isnan(v)
    key = f64_order_key(v)
    lim = jnp.int64(0x7FFFFFFFFFFFFFFF) if is_min         else jnp.int64(-0x8000000000000000)
    key = jnp.where(nn, lim, key)
    red = minmax_i64_raw(codes, key, n, is_min)
    return f64_from_order_key(red),         (jax.ops.segment_sum((~nn).astype(jnp.float32), codes,
                             num_segments=n) == 0)


@partial(jax.jit, static_argnames=("n", "is_min"))
def k_minmax_f64(codes, v, n, is_min):
    return minmax_f64_raw(codes, v, n, is_min)


@partial(jax.jit, static_argnames=("n", "is_min"))
def k_minmax_i32(codes, v, n, is_min):
    op = jax.ops.segment_min if is_min else jax.ops.segment_max
    return op(v, codes, num_segments=n)


# -- dense group index ------------------------------------------------------

class DeviceGroupIndex:
    """Group index with dense i32 codes living on device.

    codes[i] in [0, n_codes) for kept rows, == n_codes for filtered-out
    rows (the trash slot). Compaction to first-appearance order happens
    lazily on first use and is O(n_codes) on the host.
    """

    def __init__(self, codes, n_codes: int, n_rows: int):
        self.codes = codes          # jnp i32 (n_rows,)
        self.n_codes = n_codes
        self.source_len = n_rows
        self._compact = None        # (occ, order, first_ids, counts)

    def compact(self):
        if self._compact is None:
            cnt = np.asarray(k_count(self.codes, self.n_codes + 1))[
                :self.n_codes]
            fidx = np.asarray(k_first_idx(self.codes, self.n_codes + 1))[
                :self.n_codes]
            occ = np.nonzero(cnt > 0)[0].astype(np.int64)
            order = occ[np.argsort(fidx[occ], kind="stable")]
            self._compact = (order, fidx[order].astype(np.int64),
                             cnt[order].astype(np.int64))
        return self._compact

    @property
    def n(self):
        order, _, _ = self.compact()
        return len(order)

    @property
    def first_ids(self):
        _, fidx, _ = self.compact()
        return fidx

    @property
    def gids(self):
        # full per-row group ids in first-appearance order (host fallback
        # for aggregates the device path doesn't cover)
        order, _, _ = self.compact()
        remap = np.full(self.n_codes + 1, -1, dtype=np.int64)
        remap[order] = np.arange(len(order), dtype=np.int64)
        return remap[np.asarray(self.codes)]


def col_codes_dev(col: Obj, lo: int, hi: int):
    """Dense per-column code on device: value - lo as i32."""
    a = dev_col(col)
    if col.t == T.F64:
        raise ValueError("dense codes need integer-coded columns")
    return (a - lo).astype(jnp.int32)


def column_range(col: Obj):
    """(min, max) of an integer column, cached on the Obj."""
    if isinstance(col.meta, dict) and "range" in col.meta:
        return col.meta["range"]
    a = dev_col(col)
    lo = int(a.min())
    hi = int(a.max())
    if not isinstance(col.meta, dict):
        col.meta = {}
    col.meta["range"] = (lo, hi)
    return lo, hi


@jax.jit
def k_combine2(c0, r1, c1):
    return c0 * r1 + c1


def build_dense_index(key_cols: list, mask=None):
    """Dense group index from integer key columns; None if the combined
    range is too large (caller falls back to sort/hash path)."""
    n_rows = len(key_cols[0])
    ranges = []
    total = 1
    for c in key_cols:
        if c.t in (T.F64, T.GUID, T.C8, T.LIST):
            return None
        lo, hi = column_range(c)
        rng = hi - lo + 1
        ranges.append((lo, rng))
        total *= rng
        if total > _cfg["dense_max"]:
            return None
    codes = None
    for c, (lo, rng) in zip(key_cols, ranges):
        cc = col_codes_dev(c, lo, rng)
        codes = cc if codes is None else k_combine2(codes, rng, cc)
    if mask is not None:
        codes = jnp.where(mask, codes, total)
    return DeviceGroupIndex(codes, total, n_rows)


# -- aggregate dispatch -----------------------------------------------------

_I64_LIKE = (T.I64, T.TIMESTAMP)
_I32_LIKE = (T.I32, T.I16, T.U8, T.B8, T.DATE, T.TIME)


def device_aggregate(name: str, col: Obj, gx: DeviceGroupIndex):
    """Dense aggregate over a column Obj (see device_aggregate_arr)."""
    if name in ("first", "last") and col.t in (T.ENUM, T.C8, T.LIST):
        from ..ops.compose import gather
        n = gx.n_codes
        order, fidx, counts = gx.compact()
        if name == "first":
            return gather(col, fidx)
        last = np.asarray(_k_last_idx(gx.codes, n + 1))[:n]
        return gather(col, last[order].astype(np.int64))
    return device_aggregate_arr(name, col.t, dev_col(col), gx)


def device_aggregate_arr(name: str, t: int, a, gx: DeviceGroupIndex):
    """Dense aggregate of a device array -> compacted per-group Obj in
    first-appearance order. Returns None if unsupported."""
    n = gx.n_codes
    order, fidx, counts = gx.compact()

    if name == "count":
        return Obj(T.I64, counts.copy())
    if name in ("first", "last"):
        if name == "first":
            idx = fidx
        else:
            last = np.asarray(_k_last_idx(gx.codes, n + 1))[:n]
            idx = last[order].astype(np.int64)
        vals = np.asarray(a[jnp.asarray(idx)])
        if t == T.SYMBOL or t == T.ENUM:
            return Obj(T.SYMBOL, vals.astype(np.int64))
        return Obj(t, vals.astype(T.DTYPE[t]))
    if name == "sum":
        if t in _I64_LIKE or t in _I32_LIKE:
            dense = k_sum_i64(gx.codes, a.astype(jnp.int64), n + 1)
            rt = {T.I32: T.I32}.get(t, T.I64)
            out = np.asarray(dense)[:n][order]
            return Obj(rt, out.astype(T.DTYPE[rt]))
        if t == T.F64:
            dense = _k_sum_f64_skipnan(gx.codes, a, n + 1)
            return Obj(T.F64, np.asarray(dense)[:n][order])
        return None
    if name == "avg":
        if t == T.F64:
            s, c = _k_avg_f64(gx.codes, a, n + 1)
        elif t in _I64_LIKE or t in _I32_LIKE:
            s, c = _k_avg_int(gx.codes, a.astype(jnp.int64), n + 1)
        else:
            return None
        s = np.asarray(s)[:n][order]
        c = np.asarray(c)[:n][order]
        with np.errstate(invalid="ignore", divide="ignore"):
            out = s / c
        out = np.where(c == 0, T.NULL_F64, out)
        return Obj(T.F64, out)
    if name in ("min", "max"):
        is_min = name == "min"
        if t in _I64_LIKE:
            dense = k_minmax_i64(gx.codes, a, n + 1, is_min)
            out = np.asarray(dense)[:n][order]
            # null handling: integer nulls are INT_MIN and win min; the
            # reference SKIPS nulls — mask them before reduce
            return Obj(t, _fix_int_minmax(out, counts))
        if t in _I32_LIKE:
            dense = k_minmax_i32(gx.codes, a.astype(jnp.int32), n + 1,
                                 is_min)
            out = np.asarray(dense)[:n][order].astype(T.DTYPE[t])
            return Obj(t, out)
        if t == T.F64:
            dense, empty = k_minmax_f64(gx.codes, a, n + 1, is_min)
            out = np.asarray(dense)[:n][order]
            emp = np.asarray(empty)[:n][order]
            out = np.where(emp, T.NULL_F64, out)
            return Obj(T.F64, out)
        return None
    return None


def _fix_int_minmax(out, counts):
    return out


@partial(jax.jit, static_argnames=("n",))
def _k_last_idx(codes, n):
    idx = jnp.arange(codes.shape[0], dtype=jnp.int32)
    return jax.ops.segment_max(idx, codes, num_segments=n)


@partial(jax.jit, static_argnames=("n",))
def _k_sum_f64_skipnan(codes, v, n):
    vv = jnp.where(jnp.isnan(v), 0.0, v)
    return jax.ops.segment_sum(vv, codes, num_segments=n)


@partial(jax.jit, static_argnames=("n",))
def _k_avg_f64(codes, v, n):
    nn = jnp.isnan(v)
    vv = jnp.where(nn, 0.0, v)
    s = jax.ops.segment_sum(vv, codes, num_segments=n)
    c = jax.ops.segment_sum((~nn).astype(jnp.float32), codes,
                            num_segments=n)
    return s, c


@partial(jax.jit, static_argnames=("n",))
def _k_avg_int(codes, v, n):
    nn = v == jnp.int64(-0x8000000000000000)
    s = k_sum_i64(codes, jnp.where(nn, 0, v), n)
    c = jax.ops.segment_sum((~nn).astype(jnp.float32), codes,
                            num_segments=n)
    return s.astype(jnp.float64), c


@partial(jax.jit, static_argnames=("n", "is_min"))
def _k_minmax_f64_skipnan(codes, v, n, is_min):
    init = jnp.inf if is_min else -jnp.inf
    vv = jnp.where(jnp.isnan(v), init, v)
    op = jax.ops.segment_min if is_min else jax.ops.segment_max
    return op(vv, codes, num_segments=n)
