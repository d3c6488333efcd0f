"""Typed CSV reader/writer (reference core/io.c:367-1029).

`(read-csv [types] path [sep])`: first row is the header (column names);
each column parses to its declared type. The reference parallelizes by
line ranges over its pool; here numpy does the columnar conversion after a
single split pass (the device path never touches CSV — loads land in
host columns, then stage to HBM).
"""
from __future__ import annotations

import numpy as np

from ..core import types as T
from ..core import symbols, temporal, fmt
from ..core.obj import Obj, to_np, table, vec_sym, string, str_of
from ..core.errors import RayError, err_type, err_value


def _parse_col(vals: list, t: int) -> Obj:
    n = len(vals)
    if t == T.SYMBOL:
        ids = np.fromiter((symbols.intern(v) for v in vals),
                          dtype=np.int64, count=n)
        return Obj(T.SYMBOL, ids)
    if t == T.C8:
        from ..core.obj import list_
        return list_([string(v) for v in vals])
    if t == T.F64:
        out = np.empty(n, dtype=np.float64)
        for i, v in enumerate(vals):
            out[i] = float(v) if v else T.NULL_F64
        return Obj(T.F64, out)
    if t in (T.I16, T.I32, T.I64, T.U8, T.B8):
        out = np.empty(n, dtype=T.DTYPE[t])
        nullv = T.NULL_BY_TYPE.get(t, 0)
        for i, v in enumerate(vals):
            out[i] = int(v) if v else nullv
        return Obj(t, out)
    if t == T.DATE:
        out = np.empty(n, dtype=np.int32)
        for i, v in enumerate(vals):
            if not v:
                out[i] = T.NULL_I32
            else:
                p = v.replace("-", ".").split(".")
                out[i] = temporal.days_from_civil(int(p[0]), int(p[1]),
                                                  int(p[2]))
        return Obj(T.DATE, out)
    if t == T.TIME:
        out = np.empty(n, dtype=np.int32)
        for i, v in enumerate(vals):
            if not v:
                out[i] = T.NULL_I32
                continue
            hh, mm, rest = v.split(":")
            if "." in rest:
                ss, ms = rest.split(".")
            else:
                ss, ms = rest, "0"
            out[i] = temporal.make_time_ms(1, int(hh), int(mm), int(ss),
                                           int(ms.ljust(3, "0")[:3]))
        return Obj(T.TIME, out)
    if t == T.TIMESTAMP:
        out = np.empty(n, dtype=np.int64)
        for i, v in enumerate(vals):
            out[i] = T.NULL_I64 if not v else int(v)
        return Obj(T.TIMESTAMP, out)
    raise err_type(f"read-csv: unsupported column type {t}")


def _read_csv_native(tcodes, path: str, sep: str):
    """Multithreaded typed parse via the C++ runtime
    (native/rayforce_native.cpp, the analogue of the reference's
    parallel line-range CSV, core/io.c:535-632). Returns None when the
    native library or a column type is unavailable."""
    from .native import NativeCsv, lib
    from ..core.obj import list_
    if lib() is None:
        return None
    if any(t not in (T.I16, T.I32, T.I64, T.U8, T.B8, T.F64, T.SYMBOL,
                     T.DATE, T.TIME, T.TIMESTAMP, T.C8)
           for t in tcodes):
        return None
    with open(path, "rb") as f:
        data = f.read()
    nc = NativeCsv(data, sep)
    if nc.n_rows == 0:
        return None
    hdr_end = data.find(b"\n")
    header = data[:hdr_end if hdr_end >= 0 else len(data)] \
        .rstrip(b"\r").decode().split(sep)
    if len(tcodes) != len(header):
        raise RayError("length", "read-csv type count mismatch")
    nc.slice_rows(1, nc.n_rows)   # drop the header line
    cols = []
    for i, t in enumerate(tcodes):
        if t in (T.I16, T.I32, T.I64, T.U8, T.B8):
            nullv = int(T.NULL_BY_TYPE.get(t, 0))
            a = nc.col_i64(i, nullv)
            cols.append(Obj(t, a.astype(T.DTYPE[t])))
        elif t == T.F64:
            cols.append(Obj(T.F64, nc.col_f64(i)))
        elif t == T.DATE:
            cols.append(Obj(T.DATE,
                            nc.col_date(i, int(T.NULL_I32))))
        elif t == T.TIME:
            cols.append(Obj(T.TIME,
                            nc.col_time(i, int(T.NULL_I32))))
        elif t == T.TIMESTAMP:
            cols.append(Obj(T.TIMESTAMP,
                            nc.col_timestamp(i, int(T.NULL_I64))))
        elif t == T.SYMBOL:
            strs, inv = nc.col_strings(i)
            ids = np.fromiter((symbols.intern(s) for s in strs),
                              dtype=np.int64, count=len(strs))
            cols.append(Obj(T.SYMBOL, ids[inv]))
        else:  # C8
            cols.append(list_([string(b) for b in nc.col_raw(i)]))
    return table(vec_sym(header), cols)


def read_csv(types_o: Obj, path: str, sep: str = ",") -> Obj:
    from ..ops.cast import NAME2TYPE
    if types_o.t != T.SYMBOL:
        raise err_type("read-csv needs a type vector")
    tnames = [symbols.name_of(int(s)) for s in to_np(types_o)]
    tcodes = []
    for nm in tnames:
        t = NAME2TYPE.get(nm)
        t = abs(t) if t is not None else None
        if t is None:
            raise err_value(f"unknown type {nm}")
        tcodes.append(t)
    try:
        fast = _read_csv_native(tcodes, path, sep)
        if fast is not None:
            return fast
    except RayError:
        raise
    except Exception:
        pass  # fall back to the Python parser
    with open(path, "r", newline="") as f:
        header = f.readline().rstrip("\r\n").split(sep)
        raw_cols: list[list] = [[] for _ in header]
        for line in f:
            parts = line.rstrip("\r\n").split(sep)
            for i, p in enumerate(parts[:len(raw_cols)]):
                raw_cols[i].append(p)
    if len(tcodes) != len(header):
        raise RayError("length", "read-csv type count mismatch")
    cols = [_parse_col(raw_cols[i], tcodes[i]) for i in range(len(header))]
    return table(vec_sym(header), cols)


def write_csv(path: str, tbl: Obj, sep: str = ",") -> None:
    if tbl.t != T.TABLE:
        raise err_type("write-csv needs a table")
    names_o, cols = tbl.v
    names = [symbols.name_of(int(s)) for s in to_np(names_o)]
    n = len(tbl)
    with open(path, "w") as f:
        f.write(sep.join(names) + "\n")
        from ..core.obj import at_idx
        for i in range(n):
            row = []
            for c in cols:
                row.append(fmt.format_obj(at_idx(c, i), 0, None, 0))
            f.write(sep.join(row) + "\n")
