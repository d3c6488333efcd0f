"""AST -> JAX expression compiler for the device select path.

Compiles a Rayfall where-clause / output expression over table columns into
a jnp-traceable function. Supports the elementwise operator core
(arithmetic, comparisons, and/or/not, in/within) with the engine's null
semantics, and recognizes top-level aggregates (sum/avg/min/max/count/
first/last) so select can fuse filter+group+aggregate into device kernels.

Unsupported constructs return None and the caller falls back to the host
interpreter — behavior is always identical, only the execution engine
differs.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import types as T
from ..core import symbols
from ..core.obj import Obj, to_np, col_by_name, enum_domain
from ..core.interp import Builtin

AGG_NAMES = {"sum", "avg", "min", "max", "count", "first", "last",
             "med", "dev"}

ARITH = {"+": "add", "-": "sub", "*": "mul", "/": "idiv", "div": "fdiv",
         "%": "mod", "xbar": "xbar"}
CMPS = {"==": "eq", "!=": "ne", "<": "lt", ">": "gt", "<=": "le",
        ">=": "ge"}
LOGIC = {"and", "or", "not"}


class ColRef:
    __slots__ = ("name", "col", "slot")

    def __init__(self, name, col, slot):
        self.name = name
        self.col = col
        self.slot = slot


class Compiled:
    """A compiled elementwise expression: fn(cols...) -> jnp array, plus
    the column inputs it consumes and the logical result type."""

    def __init__(self, fn, cols: list, rtype: int):
        self.fn = fn
        self.cols = cols
        self.rtype = rtype


def _builtin_name(o: Obj):
    if o.t in (T.UNARY, T.BINARY, T.VARY) and isinstance(o.v, Builtin):
        return o.v.name
    return None


class _Compiler:
    def __init__(self, tbl: Obj):
        self.tbl = tbl
        self.cols: list[ColRef] = []
        self.by_name: dict[int, ColRef] = {}
        self._col_touches = 0   # column READS, incl. repeat references

    def colref(self, sid: int):
        self._col_touches += 1
        if sid in self.by_name:
            return self.by_name[sid]
        col = col_by_name(self.tbl, symbols.name_of(sid))
        if col is None:
            return None
        if col.t in (T.LIST, T.C8, T.GUID) or col.t in T.UNPARTED_OF:
            return None
        ref = ColRef(sid, col, len(self.cols))
        self.cols.append(ref)
        self.by_name[sid] = ref
        return ref

    # returns (builder, logical_type) where builder(args)->jnp expr,
    # or None when uncompilable
    def compile(self, ast: Obj):
        t = ast.t
        if t == -T.SYMBOL:
            if ast.attrs & 1:  # quoted symbol literal
                sid = int(ast.v)
                return (lambda env, s=sid: jnp.int64(s)), T.SYMBOL
            ref = self.colref(int(ast.v))
            if ref is None:
                return None
            slot = ref.slot
            ct = ref.col.t
            if ct == T.ENUM:
                # enum -> symbol ids via its domain (device gather)
                dom = to_np(enum_domain(ref.col))
                dom_d = jnp.asarray(dom)
                return (lambda env, s=slot, d=dom_d:
                        jnp.where(env[s] == T.NULL_I64, jnp.int64(T.NULL_I64),
                                  d[jnp.clip(env[s], 0, len(d) - 1)])), \
                    T.SYMBOL
            return (lambda env, s=slot: env[s]), ct
        if t < 0:
            st = -t
            if st in (T.I16, T.I32, T.I64, T.F64, T.B8, T.U8, T.DATE,
                      T.TIME, T.TIMESTAMP):
                val = ast.v
                return (lambda env, v=val: v), st
            return None
        if t != T.LIST or not ast.v:
            return None
        head = ast.v[0]
        name = _builtin_name(head)
        if name is None:
            return None
        args = ast.v[1:]
        if name in ARITH and len(args) == 2:
            a = self.compile(args[0])
            b = self.compile(args[1])
            if a is None or b is None:
                return None
            return self._arith(ARITH[name], a, b)
        if name in CMPS and len(args) == 2:
            a = self.compile(args[0])
            b = self.compile(args[1])
            if a is None or b is None:
                return None
            return self._cmp(CMPS[name], a, b)
        if name == "not" and len(args) == 1:
            a = self.compile(args[0])
            if a is None or a[1] != T.B8:
                return None
            return (lambda env, f=a[0]: ~(f(env).astype(bool))), T.B8
        if name == "as" and len(args) == 2 and args[0].t == -T.SYMBOL \
                and (args[0].attrs & 1):
            # numeric/temporal VECTOR casts only, mirroring
            # ops/cast._vec_num: raw C conversions (narrowing wraps,
            # no null special-casing; f64 -> int via cvtt32/cvtt64
            # with NaN/out-of-range on INT_MIN). Columns are vectors,
            # so both typename cases take the vector path — but a
            # column-free subexpression is an ATOM on the host (atom
            # table / type error), so require a column read.
            from ..ops.cast import NAME2TYPE, NUMERIC
            tt = NAME2TYPE.get(symbols.name_of(int(args[0].v)))
            tt = abs(tt) if tt is not None else None
            if tt not in NUMERIC:
                return None
            touches0 = self._col_touches
            a = self.compile(args[1])
            if a is None or a[1] not in NUMERIC \
                    or self._col_touches == touches0:
                return None
            fa, ta = a
            if ta == tt:
                return a
            if (tt, ta) in ((T.B8, T.U8), (T.U8, T.B8)):
                return None     # pair absent from the reference table

            def g_as(env, f=fa, ta=ta, tt=tt):
                v = f(env)
                if tt == T.F64:
                    return jnp.asarray(v).astype(jnp.float64)
                if ta == T.F64:
                    v = jnp.asarray(v, jnp.float64)
                    if tt in (T.I64, T.TIMESTAMP):
                        bad = ~((v >= -(2.0 ** 63)) & (v < 2.0 ** 63))
                        w = jnp.trunc(jnp.where(bad, 0.0, v)) \
                            .astype(jnp.int64)
                        w = jnp.where(bad, jnp.int64(-2 ** 63), w)
                    else:
                        bad = ~((v > -(2.0 ** 31) - 1) & (v < 2.0 ** 31))
                        w = jnp.trunc(jnp.where(bad, 0.0, v)) \
                            .astype(jnp.int32)
                        w = jnp.where(bad, jnp.int32(-2 ** 31), w)
                    return w.astype(r_dtype(tt))
                return jnp.asarray(v).astype(r_dtype(tt))
            return g_as, tt
        if name in ("and", "or"):
            parts = [self.compile(x) for x in args]
            if any(p is None or p[1] != T.B8 for p in parts):
                return None
            fns = [p[0] for p in parts]
            if name == "and":
                def g(env, fns=fns):
                    r = fns[0](env).astype(bool)
                    for f in fns[1:]:
                        r = r & f(env).astype(bool)
                    return r
            else:
                def g(env, fns=fns):
                    r = fns[0](env).astype(bool)
                    for f in fns[1:]:
                        r = r | f(env).astype(bool)
                    return r
            return g, T.B8
        if name == "neg" and len(args) == 1:
            a = self.compile(args[0])
            if a is None:
                return None
            return (lambda env, f=a[0]: -f(env)), a[1]
        if name == "in" and len(args) == 2 and args[1].t in \
                (T.SYMBOL, T.I64, T.I32, T.I16):
            a = self.compile(args[0])
            if a is None:
                return None
            vals = to_np(args[1]).astype(np.int64)
            vd = jnp.asarray(vals)
            return (lambda env, f=a[0], v=vd:
                    jnp.isin(f(env).astype(jnp.int64), v)), T.B8
        if name == "within" and len(args) == 2 and args[1].t > 0 \
                and args[1].t != T.LIST and len(args[1]) == 2:
            a = self.compile(args[0])
            if a is None:
                return None
            rng = to_np(args[1])
            lo, hi = rng[0], rng[1]
            if args[1].t == T.F64:
                return (lambda env, f=a[0], lo=lo, hi=hi:
                        (f(env) >= lo) & (f(env) <= hi)), T.B8
            lo_i, hi_i = int(lo), int(hi)
            return (lambda env, f=a[0], lo=lo_i, hi=hi_i:
                    (f(env) >= lo) & (f(env) <= hi)), T.B8
        return None

    def _arith(self, op, a, b):
        fa, ta = a
        fb, tb = b
        from ..ops.vops import promote_arith
        try:
            if op == "fdiv":
                rt, ct = T.F64, T.F64
                promote_arith("mul", ta, tb)
            else:
                rt, ct = promote_arith(op, ta, tb)
        except Exception:
            return None
        nullv = T.NULL_BY_TYPE.get(rt)

        def g(env, fa=fa, fb=fb, op=op, ct=ct, rt=rt, ta=ta, tb=tb,
              nullv=nullv):
            va = fa(env)
            vb = fb(env)
            na = _isnull(va, ta)
            nb = _isnull(vb, tb)
            if ct == T.F64:
                va = va.astype(jnp.float64) if hasattr(va, "astype") \
                    else jnp.float64(va)
                vb = vb.astype(jnp.float64) if hasattr(vb, "astype") \
                    else jnp.float64(vb)
            if op == "add":
                r = va + vb
            elif op == "sub":
                r = va - vb
            elif op == "mul":
                r = va * vb
            elif op == "idiv":
                r = jnp.floor_divide(va, jnp.where(vb == 0, 1, vb))
                nb = nb | (vb == 0)
            elif op == "fdiv":
                r = va / jnp.where(vb == 0, 1.0, vb)
                nb = nb | (vb == 0)
            elif op == "mod":
                r = jnp.mod(va, jnp.where(vb == 0, 1, vb))
                nb = nb | (vb == 0)
            else:  # xbar: b * trunc(a/b), exact in integers
                safe = jnp.where(vb == 0, 1, vb)
                if rt == T.F64:
                    r = safe * jnp.trunc(va / safe)
                else:
                    q = jnp.abs(va) // jnp.abs(safe)
                    q = jnp.where((va < 0) != (safe < 0), -q, q)
                    r = safe * q
                nb = nb | (vb == 0)
            r = jnp.asarray(r, dtype=r_dtype(rt))
            nulls = na | nb
            if nullv is not None:
                r = jnp.where(nulls, r_dtype(rt)(nullv), r)
            return r
        return g, rt

    def _cmp(self, op, a, b):
        fa, ta = a
        fb, tb = b
        num = (T.B8, T.U8, T.I16, T.I32, T.I64, T.F64)
        cls_a = "num" if ta in num else ta
        cls_b = "num" if tb in num else tb
        if cls_a != cls_b:
            return None
        f64involved = ta == T.F64 or tb == T.F64

        def g(env, fa=fa, fb=fb, op=op, f64=f64involved):
            va = fa(env)
            vb = fb(env)
            if f64:
                va = jnp.where(jnp.isnan(jnp.asarray(va, jnp.float64)),
                               -jnp.inf, jnp.asarray(va, jnp.float64))
                vb = jnp.where(jnp.isnan(jnp.asarray(vb, jnp.float64)),
                               -jnp.inf, jnp.asarray(vb, jnp.float64))
            if op == "eq":
                return va == vb
            if op == "ne":
                return va != vb
            if op == "lt":
                return va < vb
            if op == "gt":
                return va > vb
            if op == "le":
                return va <= vb
            return va >= vb
        return g, T.B8


def r_dtype(rt):
    return {T.I16: jnp.int16, T.I32: jnp.int32, T.I64: jnp.int64,
            T.F64: jnp.float64, T.U8: jnp.uint8, T.B8: jnp.int8,
            T.DATE: jnp.int32, T.TIME: jnp.int32,
            T.TIMESTAMP: jnp.int64}.get(rt, jnp.int64)


def _isnull(v, t):
    if t == T.F64:
        return jnp.isnan(v) if hasattr(v, "shape") else jnp.isnan(
            jnp.float64(v))
    nv = T.NULL_BY_TYPE.get(t)
    if nv is None:
        return jnp.bool_(False)
    return v == nv


def compile_expr(tbl: Obj, ast: Obj):
    """Compile an elementwise expression over tbl's columns.
    Returns Compiled or None."""
    c = _Compiler(tbl)
    r = c.compile(ast)
    if r is None:
        return None
    fn, rt = r
    out = Compiled(fn, c.cols, rt)
    out.ast = ast
    out.tbl = tbl
    return out


def expr_range(tbl: Obj, ast: Obj):
    """Conservative (lo, hi) interval of an elementwise int expression
    via interval arithmetic over cached column stats, or None when
    unbounded / unsupported. Null sentinel inputs are EXCLUDED (column
    stats ignore nulls; arithmetic on nulls yields nulls, which the
    consumers detect separately) — the bound covers non-null results
    only. Lets int-typed derived expressions ride f64 exchange lanes
    and prove sum exactness (the scoped-range trick of the reference's
    perfect grouping, core/index.c:341-435, applied to expressions)."""
    from . import device as dev

    def walk(node):
        t = node.t
        if t == -T.SYMBOL and not (node.attrs & 1):
            col = col_by_name(tbl, symbols.name_of(int(node.v)))
            if col is None or col.t not in (T.U8, T.I16, T.I32, T.I64,
                                            T.B8):
                return None
            try:
                lo, hi = dev.column_range(col)
                return int(lo), int(hi)
            except Exception:
                return None
        if t < 0 and -t in (T.U8, T.I16, T.I32, T.I64, T.B8):
            v = int(node.v)
            return v, v
        if t != T.LIST or not node.v:
            return None
        name = _builtin_name(node.v[0])
        args = node.v[1:]
        if name == "neg" and len(args) == 1:
            r = walk(args[0])
            return (-r[1], -r[0]) if r else None
        if name == "not" and len(args) == 1:
            return 0, 1
        if name in CMPS and len(args) == 2:
            return 0, 1
        if name == "as" and len(args) == 2 and args[0].t == -T.SYMBOL \
                and (args[0].attrs & 1):
            # Bounds survive a cast only when the inner expression is a
            # comparison/not (b8 in {0,1}, null-free): raw casts WRAP
            # null sentinels into ordinary values (i64 null -> 0 in i32,
            # i16 null -> -32768 in i64), so bounds computed from
            # null-skipping column stats would not cover them.
            from ..ops.cast import NAME2TYPE
            tt = NAME2TYPE.get(symbols.name_of(int(args[0].v)))
            tt = abs(tt) if tt is not None else None
            if tt not in (T.U8, T.I16, T.I32, T.I64, T.B8):
                return None
            inner = args[1]
            if inner.t != T.LIST or not inner.v:
                return None
            iname = _builtin_name(inner.v[0])
            if iname not in CMPS and iname != "not":
                return None
            return walk(inner)
        if name in ("+", "-", "*") and len(args) == 2:
            a, b = walk(args[0]), walk(args[1])
            if a is None or b is None:
                return None
            if name == "+":
                return a[0] + b[0], a[1] + b[1]
            if name == "-":
                return a[0] - b[1], a[1] - b[0]
            ps = [a[0] * b[0], a[0] * b[1], a[1] * b[0], a[1] * b[1]]
            return min(ps), max(ps)
        return None

    return walk(ast)


def split_aggregate(tbl: Obj, ast: Obj):
    """If ast is (agg inner-elementwise-expr), return (aggname, Compiled)
    for the inner expression; else None."""
    if ast.t != T.LIST or not ast.v:
        return None
    name = _builtin_name(ast.v[0])
    if name not in AGG_NAMES or len(ast.v) != 2:
        return None
    inner = compile_expr(tbl, ast.v[1])
    if inner is None:
        return None
    return name, inner
