#!/usr/bin/env python3
"""Multi-PROCESS (DCN-path) worker: one of N processes forming a
process-spanning mesh via jax.distributed.initialize — the code path a
real multi-host pod takes (engine/device.py:_maybe_init_distributed,
SURVEY §2.8 multi-node). Launched by tests/test_multiproc.py as
2 processes x 4 virtual CPU devices; collectives cross the process
boundary over the distributed runtime (the localhost stand-in for DCN).

Env (set by the launcher): RAYFORCE_COORDINATOR, RAYFORCE_NUM_PROCS,
RAYFORCE_PROC_ID, RAYFORCE_MESH=auto, plus JAX cpu platform config.
Prints MULTIPROC_OK as the last line on success.
"""
import os
import sys

import numpy as np


def fetch(x):
    """Host value of a possibly process-spanning array."""
    import jax
    x = jax.numpy.asarray(x)
    if getattr(x, "is_fully_addressable", True) or \
            getattr(x.sharding, "is_fully_replicated", False):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(x, tiled=True))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices",
                      int(os.environ.get("WORKER_LOCAL_DEVICES", "4")))

    from rayforce_tpu.engine import device as dev

    # the production entry: RAYFORCE_COORDINATOR drives
    # jax.distributed.initialize inside dev.mesh()
    m = dev.mesh()
    assert m is not None, "mesh() returned None under coordinator"
    n_proc = int(os.environ["RAYFORCE_NUM_PROCS"])
    pid = int(os.environ["RAYFORCE_PROC_ID"])
    n_dev = len(jax.devices())
    n_local = len(jax.local_devices())
    assert jax.process_count() == n_proc, \
        f"process_count {jax.process_count()} != {n_proc}"
    assert n_dev == n_proc * n_local, (n_dev, n_proc, n_local)
    axis = m.axis_names[0]
    assert m.shape[axis] == n_dev
    print(f"proc {pid}: {n_local} local / {n_dev} global devices",
          file=sys.stderr)

    from rayforce_tpu.parallel import dist

    # ---- raw distributed kernels across the process boundary ----
    n_codes = 16
    rows_per = 64
    n = rows_per * n_dev
    rng = np.random.default_rng(0)   # same seed -> same global value
    codes = rng.integers(0, n_codes, n).astype(np.int32)
    values = rng.uniform(0, 10, n).astype(np.float64)
    mask = rng.random(n) > 0.3

    codes_d, _ = dist.shard_rows(m, codes)
    values_d, _ = dist.shard_rows(m, values)
    mask_d, _ = dist.shard_rows(m, mask)
    s, cnt = dist.dist_filter_group_sum(m, n_codes)(
        codes_d, values_d, mask_d)
    s = fetch(s)[:n_codes]
    ref = np.zeros(n_codes)
    np.add.at(ref, codes[mask], values[mask])
    assert np.allclose(s, ref), "multi-process group-sum mismatch"

    cnt2, fidx = dist.dist_groupby_count_first(m, n_codes, rows_per)(
        codes_d)
    assert np.array_equal(fetch(cnt2)[:n_codes],
                          np.bincount(codes, minlength=n_codes)), \
        "multi-process count mismatch"

    # all_to_all shuffle crossing processes
    keys = rng.integers(0, 1000, n).astype(np.int64)
    vals = rng.integers(0, 100, n).astype(np.int64)
    keys_d, _ = dist.shard_rows(m, keys)
    vals_d, _ = dist.shard_rows(m, vals)
    rk, rv, valid, ovf = dist.dist_shuffle(m, capacity=rows_per * 2)(
        keys_d, vals_d)
    assert int(fetch(ovf)[0]) == 0, "shuffle overflowed"
    rk = fetch(rk).reshape(n_dev, -1)
    valid = fetch(valid).reshape(n_dev, -1)
    for d in range(n_dev):
        got = rk[d][valid[d]]
        assert (got % n_dev == d).all(), "shuffle routing broken"
    assert int(valid.sum()) == n, "shuffle dropped rows"

    # ---- full interpreter query over the process-spanning mesh ----
    from rayforce_tpu import Runtime
    from rayforce_tpu.core.obj import Obj, table, vec_sym
    from rayforce_tpu.core import types as T, symbols
    from rayforce_tpu.core.fmt import format_top as _fmt
    dev.set_enabled(True)
    dev.set_threshold(1)
    nn = n_dev * 97 + 3
    t = table(vec_sym(["k", "v", "w"]),
              [Obj(T.I64, rng.integers(0, 11, nn).astype(np.int64)),
               Obj(T.I64, rng.integers(-5, 20, nn).astype(np.int64)),
               Obj(T.F64, rng.uniform(0, 10, nn))])
    rt = Runtime()
    rt.interp.globals[symbols.intern("t")] = t
    q = ("(select {s: (sum v) a: (avg w) mx: (max w) c: (count v) "
         "from: t by: k where: (> w 1.0)})")
    s_dev = _fmt(rt.eval_str(q))
    from rayforce_tpu.engine import select as _sel
    assert any(getattr(p, "spmd", False)
               for p, _s in _sel._plan_cache.values()
               if p != "unsupported"), "SPMD plan was not used"
    dev.set_enabled(False)
    s_host = _fmt(rt.eval_str(q))
    dev.set_enabled(True)
    assert s_dev == s_host, "multi-process SPMD select mismatch"

    # distributed wide group-by (partial-aggregate all_to_all) across
    # the process boundary, through the interpreter
    nn2 = n_dev * 257 + 1
    t2 = table(vec_sym(["hk", "v"]),
               [Obj(T.I64, rng.integers(0, 700, nn2).astype(np.int64)),
                Obj(T.F64, rng.uniform(0, 5, nn2))])
    rt.interp.globals[symbols.intern("t2")] = t2
    q2 = ("(select {s: (sum v) c: (count v) mx: (max v) mn: (min v) "
          "from: t2 by: hk})")
    s_dev = _fmt(rt.eval_str(q2))
    assert _sel.last_profile.get("engine") == "dist-group", \
        "distributed wide group-by was not used"
    dev.set_enabled(False)
    s_host = _fmt(rt.eval_str(q2))
    dev.set_enabled(True)
    assert s_dev == s_host, "multi-process wide group-by mismatch"

    print("MULTIPROC_OK")


if __name__ == "__main__":
    main()
