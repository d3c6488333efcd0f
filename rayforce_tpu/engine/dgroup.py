"""Mesh-mode grouped selects: the interpreter route that fans a
mid/high-cardinality group-by out over the device mesh.

When RAYFORCE_MESH is active, a grouped select whose shape the
distributed kernel covers (single packed code word, aggregates from
{count, sum, avg} over one column) runs as the partial-aggregate
all_to_all exchange of parallel/dist.py:dist_wide_groupby — the
reference's radix-partition grouping (core/index.c:2556) across chips —
instead of the single-chip engines. Unsupported shapes fall back to the
single-chip sortagg/wide plans (still correct: columns land unsharded).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import types as T
from ..core.obj import Obj, table, DevPendingSliced
from . import device as dev

SUM_OUT = {T.U8: T.I64, T.I16: T.I64, T.I32: T.I32, T.I64: T.I64}


class _DPlan:
    __slots__ = ("mesh", "run_kernel", "col_objs", "key_meta", "aggs",
                 "w_map", "key_maps", "val_map", "val_cid", "n_rows",
                 "cw", "key_cs", "val_expr", "code_builder")


def build_plan(src, n_rows, cw, key_cs, key_meta, n_codes, aggs, mesh):
    """Distributed grouped-select plan, or None when the shape is not
    covered (caller falls back to the single-chip engines)."""
    if n_codes > (1 << 61) or n_rows == 0:
        return None
    # aggregates: count / sum / avg over at most ONE distinct column
    val_cid = None
    val_expr = None
    for a in aggs:
        if a.name == "count":
            continue
        if a.name not in ("sum", "avg"):
            return None
        if a.inner.rtype not in (T.U8, T.I16, T.I32, T.I64, T.F64):
            return None
        cid = id(a.inner)
        if val_cid is None:
            val_cid, val_expr = cid, a.inner
        elif val_cid != cid:
            return None
        # null handling: sums/avg over nullable columns need a second
        # exchange lane — keep those single-chip for now
        if not a.meta.get("plain_col"):
            return None
        try:
            if dev.column_has_null(a.inner.cols[0].col):
                return None
            if a.inner.rtype != T.F64:
                # sums ride an f64 exchange lane: require exactness
                lo, hi = dev.column_range(a.inner.cols[0].col)
                if max(abs(int(lo)), abs(int(hi))) * n_rows >= \
                        (1 << 53):
                    return None
        except Exception:
            return None

    col_objs: list = []
    slot_of: dict = {}

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
    val_map = assign(val_expr) if val_expr is not None else None

    from ..parallel import dist
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    rows_local = (n_rows + n_dev - 1) // n_dev

    plan = _DPlan()
    plan.mesh = mesh
    plan.col_objs = col_objs
    plan.key_meta = key_meta
    plan.aggs = aggs
    plan.n_rows = n_rows

    def code_builder(*cols):
        """SPMD per-shard codes (i64, -1 = masked/padding) + values."""
        def sub_env(mapping):
            return [cols[i] for i in mapping]

        nl = cols[0].shape[0] if cols else rows_local
        me = jax.lax.axis_index(axis).astype(jnp.int64)
        real = me * rows_local + jnp.arange(
            nl, dtype=jnp.int64) < n_rows
        mask = real
        if cw is not None:
            mask = mask & jnp.asarray(cw.fn(sub_env(w_map))).astype(
                bool)
        codes = None
        for ck, mp, (_nm, lo, rng, _rt, _dom) in zip(
                key_cs, key_maps, key_meta):
            arr = jnp.asarray(ck.fn(sub_env(mp)))
            cc = arr.astype(jnp.int64) - np.int64(lo)
            codes = cc if codes is None else codes * np.int64(rng) + cc
        if codes is None:
            codes = jnp.zeros(nl, jnp.int64)
        codes = jnp.where(mask, codes, jnp.int64(-1))
        if val_map is not None:
            vals = jnp.asarray(val_expr.fn(sub_env(val_map))) \
                .astype(jnp.float64)
        else:
            vals = jnp.zeros(nl, jnp.float64)
        return codes, vals

    cap = [max(2 * rows_local, 64)]
    kernels = {}

    def make(c):
        from jax.sharding import PartitionSpec as P
        base = dist.dist_wide_groupby(mesh, rows_local, c)
        sm = dist.shard_map(
            code_builder, mesh=mesh,
            in_specs=tuple(P(axis) for _ in col_objs),
            out_specs=(P(axis), P(axis)), check_rep=False)

        @jax.jit
        def full(*cs):
            codes, vals = sm(*cs)
            return base(codes, vals)
        return full

    def run_kernel(cols):
        # overflow-safe: retry with doubled merge capacity (rare —
        # needs extreme hash imbalance across group codes)
        while True:
            c = cap[0]
            if c not in kernels:
                kernels[c] = make(c)
            outs = kernels[c](*cols)
            ng_, ovf = (int(np.asarray(outs[0])[0]),
                        int(np.asarray(outs[1])[0]))
            if ovf == 0:
                return ng_, outs[2:]
            cap[0] = c * 2

    plan.run_kernel = run_kernel
    return plan


def run(plan: _DPlan):
    cols = [dev.dev_col_sharded(c, plan.mesh) for c in plan.col_objs]
    ng, (ocode, osum, ocnt, _fidx) = plan.run_kernel(cols)
    if ng <= 0:
        return "empty"

    out_names: list[int] = []
    out_cols: list[Obj] = []
    code64 = ocode.astype(jnp.int64)
    muls = []
    m_ = 1
    for _nm, _lo, rng, _rt, _dom in reversed(plan.key_meta):
        muls.append(m_)
        m_ *= rng
    muls.reverse()
    for (nm, lo, rng, rt, dom), mul in zip(plan.key_meta, muls):
        vals = (code64 // mul) % rng + lo
        out_names.append(nm)
        if dom is not None:
            out_cols.append(Obj(T.ENUM, DevPendingSliced(
                vals.astype(jnp.int64), ng), domain=dom))
        elif rt == T.SYMBOL:
            out_cols.append(Obj(T.SYMBOL, DevPendingSliced(
                vals.astype(jnp.int64), ng)))
        else:
            out_cols.append(Obj(rt, DevPendingSliced(
                vals.astype(T.DTYPE[rt]), ng)))

    for a in plan.aggs:
        out_names.append(a.sid)
        rt = a.inner.rtype if a.name != "count" else T.I64
        if a.name == "count":
            out_cols.append(Obj(T.I64, DevPendingSliced(
                ocnt.astype(jnp.int64), ng)))
        elif a.name == "avg":
            e = ocnt.astype(jnp.float64)
            v = jnp.where(e == 0, jnp.float64(np.nan), osum / e)
            out_cols.append(Obj(T.F64, DevPendingSliced(v, ng)))
        elif rt == T.F64:
            out_cols.append(Obj(T.F64, DevPendingSliced(osum, ng)))
        else:
            ot = SUM_OUT.get(rt, T.I64)
            # exact while |sum| < 2^53 (the f64 exchange lane); columns
            # with larger reach fall back via build_plan's guards
            out_cols.append(Obj(ot, DevPendingSliced(
                osum.astype(T.DTYPE[ot]), ng)))
    return table(Obj(T.SYMBOL, np.asarray(out_names, dtype=np.int64)),
                 out_cols)
