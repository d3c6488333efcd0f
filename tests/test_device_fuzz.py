"""Randomized device-vs-host select fuzzing: generated tables (mixed
dtypes, nulls, NaNs) x generated queries (random keys, aggregates,
where-clauses) must format identically through both engines."""
import os
import random

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["RAYFORCE_DEVICE"] = "1"

from rayforce_tpu import Runtime                       # noqa: E402
from rayforce_tpu.engine import device as dev          # noqa: E402
from rayforce_tpu.core.obj import Obj, table, vec_sym  # noqa: E402
from rayforce_tpu.core import types as T, symbols      # noqa: E402
from rayforce_tpu.core.fmt import format_top as fmt    # noqa: E402

AGGS = ["sum", "avg", "min", "max", "count", "first", "last", "med"]
VCOLS = ["v1", "v2", "v3", "v4"]
KCOLS = ["k1", "k2", "k3"]


def _mk_table(rng, n):
    k1 = rng.integers(0, 6, n).astype(np.int64)
    k2 = rng.integers(-3, 4, n).astype(np.int64)
    k3 = rng.integers(0, 900, n).astype(np.int64)
    v1 = rng.integers(-50, 50, n).astype(np.int64)
    v1[rng.integers(0, n, max(n // 50, 1))] = T.NULL_I64
    v2 = rng.integers(0, 1000, n).astype(np.int32)
    v3 = rng.uniform(-100, 100, n)
    v3[rng.integers(0, n, max(n // 50, 1))] = np.nan
    v4 = rng.integers(0, 2, n).astype(np.int8)
    return table(
        vec_sym(KCOLS + VCOLS),
        [Obj(T.I64, k1), Obj(T.I64, k2), Obj(T.I64, k3),
         Obj(T.I64, v1), Obj(T.I32, v2), Obj(T.F64, v3),
         Obj(T.B8, v4)])


def _mk_query(rnd):
    outs = []
    for i in range(rnd.randint(1, 3)):
        agg = rnd.choice(AGGS)
        col = rnd.choice(VCOLS if agg != "count" else VCOLS)
        if agg in ("sum", "avg", "med") and col == "v4":
            col = "v1"
        if agg in ("sum", "avg", "min", "max") and col != "v4" \
                and rnd.random() < 0.3:
            # DERIVED expressions: grouped sum of a derived expr SKIPS
            # nulls while a plain column PROPAGATES them — a class of
            # bug the plain-column-only fuzzer missed in round 1
            other = rnd.choice(["v1", "v2"])
            op = rnd.choice(["+", "-", "*"])
            outs.append(f"o{i}: ({agg} ({op} {col} {other}))")
            continue
        outs.append(f"o{i}: ({agg} {col})")
    nkeys = rnd.randint(0, 2)
    by = ""
    if nkeys == 1:
        by = f" by: {rnd.choice(KCOLS)}"
    elif nkeys == 2:
        ks = rnd.sample(KCOLS, 2)
        by = " by: {" + " ".join(f"{k}: {k}" for k in ks) + "}"
    where = ""
    if rnd.random() < 0.6:
        preds = []
        for _ in range(rnd.randint(1, 2)):
            c = rnd.choice(VCOLS[:3])
            op = rnd.choice([">", "<", ">=", "<=", "!="])
            preds.append(f"({op} {c} {rnd.randint(-40, 40)})")
        if len(preds) == 1:
            where = f" where: {preds[0]}"
        else:
            j = rnd.choice(["and", "or"])
            where = f" where: ({j} {preds[0]} {preds[1]})"
    return "(select {" + " ".join(outs) + " from: t" + by + where + "})"


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_select(seed):
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(100 + seed)
    rnd = random.Random(100 + seed)
    rt = Runtime()
    rt.interp.globals[symbols.intern("t")] = _mk_table(
        rng, rnd.choice([777, 3001, 9000]))
    for _ in range(8):
        q = _mk_query(rnd)
        dev.set_enabled(True)
        s_dev = fmt(rt.eval_str(q))
        dev.set_enabled(False)
        s_host = fmt(rt.eval_str(q))
        dev.set_enabled(True)
        assert s_dev == s_host, q


def test_fuzz_within_in():
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(5)
    rt = Runtime()
    rt.interp.globals[symbols.intern("t")] = _mk_table(rng, 4000)
    for q in [
        "(select {s: (sum v1) from: t by: k1 "
        "where: (within v2 [100 500])})",
        "(select {c: (count v3) from: t by: k1 "
        "where: (in k2 [-1 0 2])})",
    ]:
        s_dev = fmt(rt.eval_str(q))
        dev.set_enabled(False)
        s_host = fmt(rt.eval_str(q))
        dev.set_enabled(True)
        assert s_dev == s_host, q


# first 4 seeds run in the DEFAULT suite; the full 40-seed sweep stays
# opt-in behind RAYFORCE_FUZZ_EXTENDED
@pytest.mark.parametrize(
    "seed",
    range(200, 240) if os.environ.get("RAYFORCE_FUZZ_EXTENDED")
    else range(200, 204))
def test_fuzz_select_extended(seed):
    """40-seed deep sweep (the run that caught the empty-multi-key
    crash and the derived-min all-null divergence); opt-in so the
    default suite stays fast."""
    dev.set_threshold(1)
    dev.set_enabled(True)
    rng = np.random.default_rng(seed)
    rnd = random.Random(seed)
    rt = Runtime()
    rt.interp.globals[symbols.intern("t")] = _mk_table(
        rng, rnd.choice([777, 3001, 9000, 20000]))
    for _ in range(8):
        q = _mk_query(rnd)
        dev.set_enabled(True)
        s_dev = fmt(rt.eval_str(q))
        dev.set_enabled(False)
        s_host = fmt(rt.eval_str(q))
        dev.set_enabled(True)
        assert s_dev == s_host, q
