"""Iteration builtins: map/pmap/map-left/map-right/fold*/scan*/apply
(reference core/iter.c). These are special-formed through the interpreter
because they call back into user lambdas.
"""
from __future__ import annotations

import numpy as np

from ..core import types as T
from ..core.obj import Obj, at_idx, list_, NULL_OBJ
from ..core.errors import err_type, err_length, err_arity
from .compose import unify_list


def _call(interp, f: Obj, args: list) -> Obj:
    from ..core.interp import collect_lazy
    if f.t == T.LAMBDA:
        return interp.call_lambda(f.v, args)
    if f.t in (T.UNARY, T.BINARY, T.VARY):
        b = f.v
        if f.t == T.UNARY:
            if len(args) != 1:
                raise err_arity(f"{b.name}: need 1")
            return b.fn(args[0])
        if f.t == T.BINARY:
            if len(args) != 2:
                raise err_arity(f"{b.name}: need 2")
            return b.fn(args[0], args[1])
        if b.attrs & 4:  # special form can't be mapped
            raise err_type(f"cannot map special form {b.name}")
        return b.fn(args)
    raise err_type("not callable")


def _seq_len(o: Obj):
    return None if o.t < 0 else len(o)


def ray_map(interp, f: Obj, seqs: list) -> Obj:
    n = None
    for s in seqs:
        ln = _seq_len(s)
        if ln is not None:
            if n is None:
                n = ln
            elif n != ln:
                raise err_length("map length mismatch")
    if n is None:
        return _call(interp, f, seqs)
    out = []
    for i in range(n):
        args = [s if s.t < 0 else at_idx(s, i) for s in seqs]
        out.append(_call(interp, f, args))
    return unify_list(out)


def ray_map_left(interp, f: Obj, a: Obj, b: Obj) -> Obj:
    """Map over the LEFT argument, right fixed."""
    if a.t < 0:
        return _call(interp, f, [a, b])
    out = [_call(interp, f, [at_idx(a, i), b]) for i in range(len(a))]
    return unify_list(out)


def ray_map_right(interp, f: Obj, a: Obj, b: Obj) -> Obj:
    if b.t < 0:
        return _call(interp, f, [a, b])
    out = [_call(interp, f, [a, at_idx(b, i)]) for i in range(len(b))]
    return unify_list(out)


def ray_apply(interp, f: Obj, args: list) -> Obj:
    return _call(interp, f, args)


def ray_fold(interp, f: Obj, seqs: list) -> Obj:
    """(fold f xs) / (fold f init xs)."""
    if len(seqs) == 1:
        xs = seqs[0]
        if xs.t < 0:
            return xs
        n = len(xs)
        if n == 0:
            return NULL_OBJ
        acc = at_idx(xs, 0)
        for i in range(1, n):
            acc = _call(interp, f, [acc, at_idx(xs, i)])
        return acc
    if len(seqs) == 2:
        acc, xs = seqs
        if xs.t < 0:
            return _call(interp, f, [acc, xs])
        for i in range(len(xs)):
            acc = _call(interp, f, [acc, at_idx(xs, i)])
        return acc
    raise err_arity("fold")


def ray_scan(interp, f: Obj, seqs: list) -> Obj:
    if len(seqs) == 1:
        xs = seqs[0]
        if xs.t < 0:
            return xs
        n = len(xs)
        out = []
        acc = None
        for i in range(n):
            x = at_idx(xs, i)
            acc = x if acc is None else _call(interp, f, [acc, x])
            out.append(acc)
        return unify_list(out)
    if len(seqs) == 2:
        acc, xs = seqs
        out = []
        for i in range(len(xs)):
            acc = _call(interp, f, [acc, at_idx(xs, i)])
            out.append(acc)
        return unify_list(out)
    raise err_arity("scan")


def ray_fold_right(interp, f: Obj, seqs: list) -> Obj:
    if len(seqs) == 1:
        xs = seqs[0]
        n = len(xs)
        if n == 0:
            return NULL_OBJ
        acc = at_idx(xs, n - 1)
        for i in range(n - 2, -1, -1):
            acc = _call(interp, f, [at_idx(xs, i), acc])
        return acc
    acc, xs = seqs
    for i in range(len(xs) - 1, -1, -1):
        acc = _call(interp, f, [at_idx(xs, i), acc])
    return acc


def ray_scan_right(interp, f: Obj, seqs: list) -> Obj:
    if len(seqs) == 1:
        xs = seqs[0]
        out = []
        acc = None
        for i in range(len(xs) - 1, -1, -1):
            x = at_idx(xs, i)
            acc = x if acc is None else _call(interp, f, [x, acc])
            out.append(acc)
        return unify_list(list(reversed(out)))
    acc, xs = seqs
    out = []
    for i in range(len(xs) - 1, -1, -1):
        acc = _call(interp, f, [at_idx(xs, i), acc])
        out.append(acc)
    return unify_list(list(reversed(out)))
