"""Boolean logic: and/or (short-circuit special forms), not, like, nil?
(reference core/logic.c, order.c:422, unary.c:147)."""
from __future__ import annotations

import fnmatch

import numpy as np

from ..core import types as T
from ..core.obj import Obj, to_np, str_of, list_
from ..core.errors import err_type


def _as_bool(o: Obj):
    if o.t == -T.B8:
        return bool(o.v)
    return None


def bool_and(a: Obj, b: Obj) -> Obj:
    if a.t == -T.B8 and b.t == -T.B8:
        return Obj(-T.B8, np.int8(1 if (int(a.v) and int(b.v)) else 0))
    va = _bool_vec(a)
    vb = _bool_vec(b)
    if va.ndim == 0 or vb.ndim == 0:
        r = np.logical_and(va, vb)
    else:
        r = np.logical_and(va, vb)
    if np.ndim(r) == 0:
        return Obj(-T.B8, np.int8(1 if r else 0))
    return Obj(T.B8, r.astype(np.int8))


def bool_or(a: Obj, b: Obj) -> Obj:
    va = _bool_vec(a)
    vb = _bool_vec(b)
    r = np.logical_or(va, vb)
    if np.ndim(r) == 0:
        return Obj(-T.B8, np.int8(1 if r else 0))
    return Obj(T.B8, r.astype(np.int8))


def _bool_vec(o: Obj):
    if o.t == -T.B8:
        return np.bool_(bool(o.v))
    if o.t == T.B8:
        return to_np(o).astype(bool)
    raise err_type("logic op needs booleans")


def ray_and(interp, args: list) -> Obj:
    """Short-circuit AND; vector operands combine elementwise."""
    acc = None
    for a in args:
        v = interp.eval_arg(a, False)
        if v.t == -T.B8 and not int(v.v) and acc is None:
            return Obj(-T.B8, np.int8(0))
        acc = v if acc is None else bool_and(acc, v)
        if acc.t == -T.B8 and not int(acc.v):
            return acc
    return acc if acc is not None else Obj(-T.B8, np.int8(1))


def ray_or(interp, args: list) -> Obj:
    acc = None
    for a in args:
        v = interp.eval_arg(a, False)
        acc = v if acc is None else bool_or(acc, v)
        if acc.t == -T.B8 and int(acc.v):
            return acc
    return acc if acc is not None else Obj(-T.B8, np.int8(0))


def ray_not(o: Obj) -> Obj:
    if o.t == -T.B8:
        return Obj(-T.B8, np.int8(0 if int(o.v) else 1))
    if o.t == T.B8:
        return Obj(T.B8, (1 - to_np(o)).astype(np.int8))
    if o.t == T.LIST:
        return list_([ray_not(e) for e in o.v])
    raise err_type("not needs booleans")


def ray_like(s: Obj, pat: Obj) -> Obj:
    """Glob match (logic.c:266)."""
    p = str_of(pat) if pat.t == T.C8 else str_of(pat)
    if s.t == T.C8:
        return Obj(-T.B8, np.int8(1 if fnmatch.fnmatchcase(str_of(s), p)
                                  else 0))
    if s.t == -T.SYMBOL:
        return Obj(-T.B8, np.int8(1 if fnmatch.fnmatchcase(str_of(s), p)
                                  else 0))
    if s.t == T.SYMBOL:
        from ..core import symbols
        out = np.asarray(
            [fnmatch.fnmatchcase(symbols.name_of(int(x)), p)
             for x in to_np(s)], dtype=np.int8)
        return Obj(T.B8, out)
    if s.t == T.ENUM:
        from .items import ray_value
        return ray_like(ray_value(s), pat)
    if s.t == T.LIST:
        return list_([ray_like(e, pat) for e in s.v])
    raise err_type("like needs strings or symbols")


def ray_is_null(o: Obj) -> Obj:
    """nil?: true only for the untyped null (unary.c:147)."""
    return Obj(-T.B8, np.int8(1 if o.t == -T.NULL else 0))
