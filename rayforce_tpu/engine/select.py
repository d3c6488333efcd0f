"""Device fast path for select: fused filter + group + aggregate.

The entire query — where-mask, dense group codes, and every aggregate —
traces into ONE jitted function (one device dispatch per query execution;
essential because each eager dispatch pays the host<->TPU round trip).
Compiled pipelines are cached by a structural fingerprint of the query and
its column layout, so repeated queries hit the XLA-compiled kernel
directly.

Group keys are decoded arithmetically from dense slot ids on the host
(slot = sum(code_i * multiplier_i)), so no device gather is needed for the
key columns.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core import types as T
from ..core import symbols
from ..core.obj import Obj, to_np, table
from . import device as dev
from .exprc import compile_expr, split_aggregate

_plan_cache: dict = {}


def _fingerprint(ast: Obj) -> str:
    """Structural fingerprint of an AST (stable across reparses)."""
    t = ast.t
    if t == T.LIST:
        return "(" + " ".join(_fingerprint(x) for x in ast.v) + ")"
    if t == T.DICT:
        k, v = ast.v
        return "{" + _fingerprint(k) + ":" + _fingerprint(v) + "}"
    if t in (T.UNARY, T.BINARY, T.VARY):
        return "#" + ast.v.name
    if t == -T.SYMBOL:
        q = "'" if ast.attrs & 1 else ""
        return q + symbols.name_of(int(ast.v))
    if t < 0:
        return f"{t}:{ast.v}"
    if t == T.SYMBOL:
        return "[" + " ".join(symbols.name_of(int(s))
                              for s in to_np(ast)) + "]"
    if T.is_vector(t):
        return f"v{t}:{to_np(ast).tobytes().hex()[:64]}"
    return f"t{t}"


@partial(jax.jit, static_argnames=("n",), donate_argnums=())
def _k_compact_meta(codes, n):
    cnt = jax.ops.segment_sum(jnp.ones_like(codes, dtype=jnp.int32),
                              codes, num_segments=n + 1)
    idx = jnp.arange(codes.shape[0], dtype=jnp.int32)
    fidx = jax.ops.segment_min(idx, codes, num_segments=n + 1)
    return cnt, fidx


def _agg_dense(name, rtype, arr, codes, n):
    """Traceable dense aggregate (inside the pipeline jit)."""
    if name == "count":
        return jax.ops.segment_sum(jnp.ones_like(codes, dtype=jnp.int32),
                                   codes, num_segments=n)
    if name == "sum":
        if rtype == T.F64:
            vv = jnp.where(jnp.isnan(arr), 0.0, arr)
            return jax.ops.segment_sum(vv, codes, num_segments=n)
        return dev.sum_i64_raw(codes, arr.astype(jnp.int64), n)
    if name == "avg":
        if rtype == T.F64:
            nn = jnp.isnan(arr)
            vv = jnp.where(nn, 0.0, arr)
        else:
            nn = arr == T.NULL_BY_TYPE.get(rtype, T.NULL_I64)
            vv = jnp.where(nn, 0, arr).astype(jnp.int64)
        s = (jax.ops.segment_sum(vv, codes, num_segments=n)
             if rtype == T.F64
             else dev.sum_i64_raw(codes, vv, n))
        c = jax.ops.segment_sum((~nn).astype(jnp.float32), codes,
                                num_segments=n)
        return s, c
    if name in ("min", "max"):
        is_min = name == "min"
        if rtype == T.F64:
            # bit-exact selection (TPU f64 arithmetic is emulated)
            return dev.minmax_f64_raw(codes, arr, n, is_min)
        if rtype in (T.I64, T.TIMESTAMP, T.SYMBOL):
            return dev.minmax_i64_raw(codes, arr, n, is_min)
        op = jax.ops.segment_min if is_min else jax.ops.segment_max
        return op(arr.astype(jnp.int32), codes, num_segments=n)
    if name in ("first", "last"):
        idx = jnp.arange(codes.shape[0], dtype=jnp.int32)
        if name == "first":
            pos = jax.ops.segment_min(idx, codes, num_segments=n)
        else:
            pos = jax.ops.segment_max(idx, codes, num_segments=n)
        safe = jnp.clip(pos, 0, codes.shape[0] - 1)
        return arr[safe]
    return None


class _Plan:
    __slots__ = ("fn", "col_objs", "key_meta", "aggs", "n_codes",
                 "by_names", "out_sids")


def _build_plan(src, outs, where_ast, by_ast):
    n_rows = len(src)
    cw = None
    if where_ast is not None:
        cw = compile_expr(src, where_ast)
        if cw is None or cw.rtype != T.B8:
            return None

    by_pairs = []
    if by_ast is not None:
        if by_ast.t == -T.SYMBOL and not (by_ast.attrs & 1):
            by_pairs = [(int(by_ast.v), by_ast)]
        elif by_ast.t == T.DICT:
            bkeys, bvals = by_ast.v
            if bkeys.t != T.SYMBOL:
                return None
            bids = to_np(bkeys)
            by_pairs = [(int(bids[i]), bvals.v[i])
                        for i in range(len(bids))]
        else:
            return None

    key_cs = []
    key_meta = []   # (name, lo, rng, rtype)
    n_codes = 1
    for nm, ast in by_pairs:
        ck = compile_expr(src, ast)
        if ck is None or ck.rtype in (T.F64, T.C8):
            return None
        # range: only plain single-column keys get the cached range
        if len(ck.cols) == 1 and ast.t == -T.SYMBOL:
            lo, hi = dev.column_range(ck.cols[0].col)
            if ck.rtype == T.SYMBOL and ck.cols[0].col.t == T.ENUM:
                from ..core.obj import enum_domain
                dom = to_np(enum_domain(ck.cols[0].col))
                if len(dom):
                    lo, hi = int(dom.min()), int(dom.max())
                else:
                    lo, hi = 0, 0
        else:
            arr = jnp.asarray(ck.fn(
                [dev.dev_col(r.col) for r in ck.cols]))
            lo, hi = int(arr.min()), int(arr.max())
        rng = hi - lo + 1
        if rng <= 0:
            return None
        n_codes *= rng
        if n_codes > dev._cfg["dense_max"]:
            return None
        key_cs.append(ck)
        key_meta.append((nm, lo, rng, ck.rtype))

    aggs = []
    for sid, ast in outs:
        sp = split_aggregate(src, ast)
        if sp is None:
            return None
        name, inner = sp
        aggs.append((sid, name, inner))

    # gather all column inputs across sub-expressions
    col_objs = []
    slot_of = {}

    def assign(ck):
        mapping = []
        for ref in ck.cols:
            key = id(ref.col)
            if key not in slot_of:
                slot_of[key] = len(col_objs)
                col_objs.append(ref.col)
            mapping.append(slot_of[key])
        return mapping

    w_map = assign(cw) if cw is not None else None
    key_maps = [assign(ck) for ck in key_cs]
    agg_maps = [assign(inner) for _, _, inner in aggs]

    NC = n_codes

    def pipeline(*cols):
        def sub_env(mapping):
            return [cols[i] for i in mapping]
        mask = None
        if cw is not None:
            mask = jnp.asarray(cw.fn(sub_env(w_map))).astype(bool)
        if key_cs:
            codes = None
            for ck, mp, (_nm, lo, rng, _rt) in zip(key_cs, key_maps,
                                                   key_meta):
                arr = jnp.asarray(ck.fn(sub_env(mp)))
                cc = (arr - lo).astype(jnp.int32)
                codes = cc if codes is None else codes * rng + cc
        else:
            codes = jnp.zeros(cols[0].shape[0] if cols else n_rows,
                              dtype=jnp.int32)
        if mask is not None:
            codes = jnp.where(mask, codes, NC)
        cnt = jax.ops.segment_sum(
            jnp.ones_like(codes, dtype=jnp.int32), codes,
            num_segments=NC + 1)
        idx = jnp.arange(codes.shape[0], dtype=jnp.int32)
        fidx = jax.ops.segment_min(idx, codes, num_segments=NC + 1)
        outs_d = []
        for (sid, name, inner), mp in zip(aggs, agg_maps):
            arr = jnp.asarray(inner.fn(sub_env(mp)))
            r = _agg_dense(name, inner.rtype, arr, codes, NC + 1)
            outs_d.append(r)
        return cnt, fidx, outs_d

    plan = _Plan()
    plan.fn = jax.jit(pipeline)
    plan.col_objs = col_objs
    plan.key_meta = key_meta
    plan.aggs = aggs
    plan.n_codes = n_codes
    plan.by_names = [m[0] for m in key_meta]
    plan.out_sids = [a[0] for a in aggs]
    return plan


def try_select_device(interp, src: Obj, outs, where_ast, by_ast, lim):
    if not dev.available() or not dev.should_use(len(src)):
        return None
    if not outs:
        return None
    key = (id(src), len(src),
           _fingerprint(where_ast) if where_ast is not None else "",
           _fingerprint(by_ast) if by_ast is not None else "",
           tuple((sid, _fingerprint(ast)) for sid, ast in outs))
    plan = _plan_cache.get(key)
    if plan is None:
        plan = _build_plan(src, outs, where_ast, by_ast)
        if plan is None:
            _plan_cache[key] = "unsupported"
            return None
        _plan_cache[key] = plan
    elif plan == "unsupported":
        return None

    cols = [dev.dev_col(c) for c in plan.col_objs]
    res = plan.fn(*cols)
    # ONE host transfer for the whole result pytree: each np.asarray is a
    # separate device->host round trip, and tunnel latency dominates.
    cnt, fidx, outs_d = jax.device_get(res)
    cnt = np.asarray(cnt)[:plan.n_codes]
    fidx = np.asarray(fidx)[:plan.n_codes]
    occ = np.nonzero(cnt > 0)[0]
    order = occ[np.argsort(fidx[occ], kind="stable")]

    out_names: list[int] = []
    out_cols: list[Obj] = []
    # decode key values arithmetically from dense slot ids
    slots = order.copy()
    muls = []
    m = 1
    for _nm, _lo, rng, _rt in reversed(plan.key_meta):
        muls.append((m, rng))
        m *= rng
    muls.reverse()
    for (nm, lo, rng, rt), (mul, _r) in zip(plan.key_meta, muls):
        vals = (slots // mul) % rng + lo
        out_names.append(nm)
        if rt == T.SYMBOL:
            out_cols.append(Obj(T.SYMBOL, vals.astype(np.int64)))
        else:
            out_cols.append(Obj(rt, vals.astype(T.DTYPE[rt])))
    counts_comp = cnt[order].astype(np.int64)
    for (sid, name, inner), dense in zip(plan.aggs, outs_d):
        rt = inner.rtype
        if name == "count":
            out_cols.append(Obj(T.I64, np.asarray(dense)[
                :plan.n_codes][order].astype(np.int64)))
            out_names.append(sid)
            continue
        if name == "avg":
            s, c = dense
            s = np.asarray(s)[:plan.n_codes][order]
            c = np.asarray(c)[:plan.n_codes][order]
            with np.errstate(invalid="ignore", divide="ignore"):
                v = np.asarray(s, dtype=np.float64) / c
            v = np.where(c == 0, T.NULL_F64, v)
            out_cols.append(Obj(T.F64, v))
            out_names.append(sid)
            continue
        if name in ("min", "max") and rt == T.F64:
            vv, empty = dense
            v = np.asarray(vv)[:plan.n_codes][order]
            emp = np.asarray(empty)[:plan.n_codes][order]
            v = np.where(emp, T.NULL_F64, v)
            out_cols.append(Obj(T.F64, v))
            out_names.append(sid)
            continue
        v = np.asarray(dense)[:plan.n_codes][order]
        if name == "sum":
            ot = {T.I32: T.I32, T.F64: T.F64}.get(rt, T.I64)
            out_cols.append(Obj(ot, v.astype(T.DTYPE[ot])))
        elif name in ("min", "max"):
            if rt == T.SYMBOL:
                out_cols.append(Obj(T.SYMBOL, v.astype(np.int64)))
            else:
                out_cols.append(Obj(rt, v.astype(T.DTYPE[rt])))
        else:  # first / last
            if rt == T.SYMBOL:
                out_cols.append(Obj(T.SYMBOL, v.astype(np.int64)))
            else:
                out_cols.append(Obj(rt, v.astype(T.DTYPE[rt])))
        out_names.append(sid)

    return table(Obj(T.SYMBOL, np.asarray(out_names, dtype=np.int64)),
                 out_cols)
