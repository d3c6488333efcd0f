"""Parted-DB golden matrix (the reference's tests/parted.c discipline:
per-type x per-aggregate x filter/by combinations over a multi-partition
on-disk DB). Without the oracle binary the pin is self-consistency: a
query over the parted table must format identically to the same query
over its razed in-memory image — the typed kernels themselves are
already oracle-pinned — through BOTH the host streaming path and the
device partition-streaming path."""
import os
import shutil

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from rayforce_tpu import Runtime                       # noqa: E402
from rayforce_tpu.engine import device as dev          # noqa: E402
from rayforce_tpu.core.obj import (Obj, table, vec_sym,  # noqa: E402
                                   ConstPending)
from rayforce_tpu.core import types as T, symbols      # noqa: E402
from rayforce_tpu.storage import parted as P           # noqa: E402
from rayforce_tpu.ops.parted import parted_raze        # noqa: E402
from rayforce_tpu.ops import query as Q                # noqa: E402
from rayforce_tpu.core.fmt import format_top as fmt    # noqa: E402

NP_PER = 40     # rows per partition
DAYS = ["2024.01.01", "2024.01.02", "2024.01.03", "2024.01.04",
        "2024.01.05"]

VCOLS = ["i16", "i32", "i64", "f64", "u8", "b8", "tm", "ts"]
AGGS = ["sum", "avg", "min", "max", "first", "last", "count", "med",
        "dev"]
# type applicability mirrors the host kernels (sum/avg/med/dev need
# numeric; min/max/first/last/count accept the rest too)
NUMERIC = {"i16", "i32", "i64", "f64", "u8"}
ORDERED = NUMERIC | {"b8", "tm", "ts"}


def _part_table(rng, i):
    n = NP_PER
    i16 = rng.integers(-100, 100, n).astype(np.int16)
    i16[rng.integers(0, n, 2)] = T.NULL_I16
    i32 = rng.integers(-1000, 1000, n).astype(np.int32)
    i32[rng.integers(0, n, 2)] = T.NULL_I32
    i64 = rng.integers(-5000, 5000, n).astype(np.int64)
    i64[rng.integers(0, n, 2)] = T.NULL_I64
    f64 = rng.uniform(-50, 50, n)
    f64[rng.integers(0, n, 2)] = np.nan
    u8 = rng.integers(0, 200, n).astype(np.uint8)
    b8 = rng.integers(0, 2, n).astype(np.int8)
    tm = rng.integers(0, 86_400_000, n).astype(np.int32)
    ts = rng.integers(0, 10**15, n).astype(np.int64)
    syms = [symbols.intern(s) for s in ["ibm", "aapl", "msft", "tsla",
                                        "nvda"]]
    s = np.asarray([syms[j] for j in rng.integers(0, 5, n)],
                   dtype=np.int64)
    return table(
        vec_sym(["s"] + VCOLS),
        [Obj(T.SYMBOL, s), Obj(T.I16, i16), Obj(T.I32, i32),
         Obj(T.I64, i64), Obj(T.F64, f64), Obj(T.U8, u8),
         Obj(T.B8, b8), Obj(T.TIME, tm), Obj(T.TIMESTAMP, ts)])


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    db = str(tmp_path_factory.mktemp("parted") / "db")
    rt = Runtime()
    rng = np.random.default_rng(77)
    for i, day in enumerate(DAYS):
        P.set_parted(db, day, "q", _part_table(rng, i),
                     interp=rt.interp)
    pt = P.get_parted(db, "q", interp=rt.interp)
    # razed in-memory image, including the virtual Date column
    names, cols = pt.v
    mem = table(names, [parted_raze(c) for c in cols])
    rt.interp.globals[symbols.intern("pt")] = pt
    rt.interp.globals[symbols.intern("mem")] = mem
    yield rt
    shutil.rmtree(db, ignore_errors=True)


def _pairs(rt, q_pt, q_mem):
    a = fmt(rt.eval_str(q_pt))
    b = fmt(rt.eval_str(q_mem))
    assert a == b, q_pt


@pytest.mark.parametrize("agg", AGGS)
def test_matrix_host(env, agg):
    rt = env
    dev.set_enabled(False)
    cols = (VCOLS if agg in ("first", "last", "count")
            else [c for c in VCOLS if c in
                  (NUMERIC if agg in ("sum", "avg", "med", "dev")
                   else ORDERED)])
    try:
        for c in cols:
            for by in ["", " by: s", " by: Date",
                       " by: {s: s Date: Date}"]:
                for wh in ["", " where: (> i32 0)"]:
                    q = ("(select {o: (%s %s) from: %%s%s%s})"
                         % (agg, c, by, wh))
                    _pairs(rt, q % "pt", q % "mem")
    finally:
        dev.set_enabled(True)


@pytest.mark.parametrize("agg", ["sum", "min", "max", "first", "last",
                                 "count"])
def test_matrix_device_streaming(env, agg):
    """The partition-streaming device path (per-partition device
    partials + host combine) must match the host result for every
    combine-decomposable aggregate."""
    rt = env
    old = Q.STREAM_PARTED
    old_t = dev._cfg["threshold"]
    Q.STREAM_PARTED = True
    dev.set_threshold(1)
    dev.set_enabled(True)
    try:
        cols = (VCOLS if agg in ("first", "last", "count")
                else [c for c in VCOLS if c in
                      (NUMERIC if agg == "sum" else ORDERED)])
        for c in cols[:4]:
            for by in [" by: s", " by: Date"]:
                for wh in ["", " where: (> i32 0)"]:
                    q = ("(select {o: (%s %s) from: pt%s%s})"
                         % (agg, c, by, wh))
                    s_dev = fmt(rt.eval_str(q))
                    dev.set_enabled(False)
                    s_host = fmt(rt.eval_str(q))
                    dev.set_enabled(True)
                    assert s_dev == s_host, q
    finally:
        Q.STREAM_PARTED = old
        dev.set_threshold(old_t)


@pytest.fixture(scope="module")
def env_nf(tmp_path_factory):
    """Null-free parted DB: the gate for the avg/dev streaming
    decomposition (grouped sum of a plain column propagates nulls, so
    exact sum+count partials need stats-known null-free columns)."""
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    db = str(tmp_path_factory.mktemp("parted_nf") / "db")
    rt = Runtime()
    rng = np.random.default_rng(177)
    for pi, day in enumerate(DAYS):
        n = NP_PER
        syms = [symbols.intern(s) for s in ["ibm", "aapl", "msft"]]
        s = np.asarray([syms[j] for j in rng.integers(0, 3, n)],
                       dtype=np.int64)
        t = table(
            vec_sym(["s", "i32", "i64", "f64", "u8", "pno"]),
            [Obj(T.SYMBOL, s),
             Obj(T.I32, rng.integers(-1000, 1000, n)
                 .astype(np.int32)),
             Obj(T.I64, rng.integers(-5000, 5000, n)
                 .astype(np.int64)),
             Obj(T.F64, rng.uniform(-50, 50, n)),
             Obj(T.U8, rng.integers(0, 200, n).astype(np.uint8)),
             Obj(T.I64, np.full(n, pi, dtype=np.int64))])
        P.set_parted(db, day, "q", t, interp=rt.interp)
    pt = P.get_parted(db, "q", interp=rt.interp)
    rt.interp.globals[symbols.intern("pt")] = pt
    yield rt
    shutil.rmtree(db, ignore_errors=True)


@pytest.mark.parametrize("agg", ["avg", "dev"])
def test_matrix_device_streaming_avg_dev(env_nf, agg):
    """avg/dev stream as rewritten sum/count/sumsq partials over
    null-free columns (ops/query.py _stream_device_select; the
    reference's PARTED_MAP decomposition, core/aggr.c:183-260) — and
    the probe asserts the streaming path actually engaged."""
    rt = env_nf
    old = Q.STREAM_PARTED
    old_t = dev._cfg["threshold"]
    Q.STREAM_PARTED = True
    dev.set_threshold(1)
    dev.set_enabled(True)
    calls = []
    orig = Q._stream_device_select

    def probe(*a):
        r = orig(*a)
        calls.append(r is not None)
        return r

    Q._stream_device_select = probe
    try:
        for c in ["i64", "f64", "u8"]:
            for by in [" by: s", " by: Date"]:
                for wh in ["", " where: (> i32 0)"]:
                    q = ("(select {o: (%s %s) m: (max %s) from: "
                         "pt%s%s})" % (agg, c, c, by, wh))
                    s_dev = fmt(rt.eval_str(q))
                    dev.set_enabled(False)
                    s_host = fmt(rt.eval_str(q))
                    dev.set_enabled(True)
                    assert s_dev == s_host, q
        assert calls and all(calls), \
            "streaming path fell back for some query"
    finally:
        Q._stream_device_select = orig
        Q.STREAM_PARTED = old
        dev.set_threshold(old_t)


@pytest.mark.parametrize("agg", ["avg", "dev"])
def test_matrix_device_streaming_avg_dev_nullable(env, agg):
    """NULLABLE columns stream too: avg/dev partials rewrite to
    null-SKIPPING derived sums ((* x 1.0) — sums of derived
    expressions skip nulls) plus an explicit non-null count lane
    ((as 'I64 (!= x 0N<t>)), compiled on device by engine/exprc) —
    no null-free stats gate required."""
    rt = env
    old = Q.STREAM_PARTED
    old_t = dev._cfg["threshold"]
    Q.STREAM_PARTED = True
    dev.set_threshold(1)
    dev.set_enabled(True)
    calls = []
    orig = Q._stream_device_select

    def probe(*a):
        r = orig(*a)
        calls.append(r is not None)
        return r

    Q._stream_device_select = probe
    try:
        for c in ["i16", "i64", "f64"]:
            for by in [" by: s", " by: Date"]:
                for wh in ["", " where: (!= i32 0Ni)"]:
                    q = ("(select {o: (%s %s) m: (max %s) from: "
                         "pt%s%s})" % (agg, c, c, by, wh))
                    s_dev = fmt(rt.eval_str(q))
                    dev.set_enabled(False)
                    s_host = fmt(rt.eval_str(q))
                    dev.set_enabled(True)
                    assert s_dev == s_host, q
        assert calls and all(calls), \
            "nullable avg/dev streaming fell back for some query"
    finally:
        Q._stream_device_select = orig
        Q.STREAM_PARTED = old
        dev.set_threshold(old_t)


def test_virtual_date_is_constant(tmp_path):
    """A freshly loaded parted table's virtual Date column is a
    per-partition CONSTANT (value + rowcount), not a materialized
    per-row vector (the reference's MAPCOMMON, core/vary.c:185-391)."""
    db = str(tmp_path / "db")
    rt = Runtime()
    rng = np.random.default_rng(1)
    for day in DAYS[:2]:
        P.set_parted(db, day, "q", _part_table(rng, 0),
                     interp=rt.interp)
    pt = P.get_parted(db, "q", interp=rt.interp)
    _, cols = pt.v
    for piece in cols[0].v:
        assert isinstance(piece.pending(), ConstPending)
        assert piece.pending().shape == (NP_PER,)


def test_int_partitions_virtual_id(tmp_path):
    db = str(tmp_path / "idb")
    rt = Runtime()
    rng = np.random.default_rng(3)
    for pid in ["0", "1", "2"]:
        P.set_parted(db, pid, "q", _part_table(rng, int(pid)),
                     interp=rt.interp)
    pt = P.get_parted(db, "q", interp=rt.interp)
    from rayforce_tpu.core.obj import to_np
    names = [symbols.name_of(int(s)) for s in to_np(pt.v[0])]
    assert names[0] == "Id"
    rt.interp.globals[symbols.intern("ipt")] = pt
    r = rt.eval_str("(select {c: (count i64) from: ipt by: Id})")
    out = fmt(r)
    assert "40" in out and out.count("40") >= 3


def test_streaming_skips_all_filtered_partitions(env_nf):
    """A partition whose rows are ALL filtered out contributes an
    empty partial instead of forcing the whole query to the host
    (ops/query.py: try_select_device(empty_to_none=False) tells an
    empty partition apart from an unsupported shape — the reference's
    PARTED_MAP skips empty chunks, core/aggr.c:183-260)."""
    rt = env_nf
    old = Q.STREAM_PARTED
    old_t = dev._cfg["threshold"]
    Q.STREAM_PARTED = True
    dev.set_threshold(1)
    dev.set_enabled(True)
    calls = []
    orig = Q._stream_device_select

    def probe(*a):
        r = orig(*a)
        calls.append(r is not None)
        return r

    Q._stream_device_select = probe
    try:
        # pno is a per-partition constant: this keeps partitions
        # 2..4 fully filtered while 0-1 survive
        q = ("(select {s: (sum i64) a: (avg f64) from: pt by: s "
             "where: (< pno 2)})")
        s_dev = fmt(rt.eval_str(q))
        dev.set_enabled(False)
        s_host = fmt(rt.eval_str(q))
        dev.set_enabled(True)
        assert s_dev == s_host
        assert calls == [True], \
            "all-filtered partitions forced a host fallback"
    finally:
        Q._stream_device_select = orig
        Q.STREAM_PARTED = old
        dev.set_threshold(old_t)
