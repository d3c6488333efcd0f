"""`as` — type casting (reference core/rayforce.c cast_obj:2312).

The target is a typename symbol: lowercase = atom codes, uppercase = vector
codes (env.c init_typenames); casting a vector with either case converts
elementwise.
"""
from __future__ import annotations

import numpy as np

from ..core import types as T
from ..core import symbols
from ..core.obj import (Obj, to_np, list_, string, str_of, vec_sym,
                        atom_null, NULL_OBJ)
from ..core.errors import err_type, err_domain

NAME2TYPE = {}
for _t, _n in T.TYPE_NAMES.items():
    if _t <= T.ENUM and _t > 0:
        NAME2TYPE[_n] = _t              # lowercase names
        NAME2TYPE[_n.upper()] = _t      # vector names
NAME2TYPE["SYMBOL"] = T.SYMBOL
NAME2TYPE["symbol"] = T.SYMBOL
NAME2TYPE["LIST"] = T.LIST


def target_type(name_obj: Obj) -> int:
    if name_obj.t != -T.SYMBOL:
        raise err_type("as: target must be a symbol")
    name = symbols.name_of(int(name_obj.v))
    t = NAME2TYPE.get(name)
    if t is None:
        raise err_domain(f"as: unknown type {name}")
    return t


NUMERIC = (T.B8, T.U8, T.I16, T.I32, T.I64, T.F64, T.DATE, T.TIME,
           T.TIMESTAMP)


def _parse_scalar(s: str, t: int):
    s = s.strip()
    if t == T.F64:
        return np.float64(float(s) if s else T.NULL_F64)
    if t in (T.I16, T.I32, T.I64, T.DATE, T.TIME, T.TIMESTAMP):
        if not s:
            return T.NULL_BY_TYPE[t]
        return T.DTYPE[t](int(float(s)) if ("." in s or "e" in s)
                          else int(s))
    if t == T.B8:
        return np.int8(1 if s in ("1", "true") else 0)
    if t == T.U8:
        return np.uint8(int(s, 0))
    raise err_type("bad string cast")


def cast_obj(t: int, o: Obj) -> Obj:
    from ..core import fmt
    ot = abs(o.t)
    atom = o.t < 0

    if ot == T.NULL:
        if t == T.C8:
            return string("")
        return atom_null(t)

    # identical type
    if ot == t:
        return o

    if t == T.C8:
        # to string = bare format
        if atom or o.t in (T.LIST, T.DICT, T.TABLE):
            return string(fmt.format_obj(o, 0, None, 0))
        return list_([string(fmt.format_obj(
            _elem(o, i), 0, None, 0)) for i in range(len(o))])

    if ot == T.C8 and not atom:
        # string -> scalar parse
        if t == T.SYMBOL:
            return Obj(-T.SYMBOL, np.int64(symbols.intern(str_of(o))))
        return Obj(-t, _parse_scalar(str_of(o), t))

    if ot == T.LIST:
        out = [cast_obj(t, e) for e in o.v]
        from .compose import unify_list
        return unify_list(out)

    if ot == T.SYMBOL and t == T.ENUM:
        raise err_type("use enum to build enums")
    if ot == T.ENUM:
        from .items import ray_value
        return cast_obj(t, ray_value(o))

    if ot in NUMERIC and t in NUMERIC:
        if atom:
            a = np.asarray(o.v)
            if _is_null_scalar(ot, a):
                return atom_null(t)
            return Obj(-t, T.DTYPE[t](_num(a, ot, t)))
        a = to_np(o)
        from .vops import is_null_np
        nulls = is_null_np(ot, a)
        r = _num(a, ot, t)
        r = np.asarray(r, dtype=T.DTYPE[t])
        if nulls.any() and t in T.NULL_BY_TYPE:
            r = np.where(nulls, T.NULL_BY_TYPE[t], r)
        return Obj(t, r)

    if ot == T.C8 and atom:
        if t in (T.U8, T.I16, T.I32, T.I64):
            return Obj(-t, T.DTYPE[t](int(o.v)))
    if ot == T.U8 and t == T.C8:
        return Obj(-T.C8, np.uint8(o.v))
    if ot == T.SYMBOL and t == T.C8:
        return string(str_of(o))

    raise err_type(f"cannot cast {T.TYPE_NAMES.get(ot)} to "
                   f"{T.TYPE_NAMES.get(t)}")


def _is_null_scalar(t, v):
    if t == T.F64:
        return bool(np.isnan(v))
    if t in T.NULL_BY_TYPE:
        return int(v) == int(T.NULL_BY_TYPE[t])
    return False


def _num(a, src, dst):
    if dst == T.F64:
        return np.asarray(a, dtype=np.float64)
    if src == T.F64:
        return np.trunc(np.nan_to_num(np.asarray(a, dtype=np.float64)))
    return a


def _elem(o: Obj, i: int):
    from ..core.obj import at_idx
    return at_idx(o, i)


def ray_cast(name_obj: Obj, o: Obj) -> Obj:
    return cast_obj(target_type(name_obj), o)
