"""Multi-chip distributed kernels over a jax.sharding.Mesh.

The reference scales within one node via a pinned thread pool with
chunk-parallel kernels and merge steps (core/pool.c pool_map,
core/index.c index_group_distribute, core/aggr.c AGGR_COLLECT). Here the
same decompositions map onto a device mesh:

- rows are sharded across the mesh axis ("d") — the analogue of
  pool_chunk_aligned chunks (pool.c:495);
- group-by computes per-chip dense partial aggregates and combines with
  psum — the analogue of per-thread partial vectors + AGGR_COLLECT
  pairwise merge (aggr.c:163-181);
- joins/high-cardinality shuffles route rows by key hash with
  all_to_all — the analogue of the radix partition scatter
  (index.c:2556-2729).

Everything here is pure SPMD jax: it runs identically on a real pod slice
or on a host-platform virtual mesh (tests use 8 virtual CPU devices).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# i64 keys / f64 lanes everywhere; enabling at import (like engine/
# device.py) keeps shard_rows outputs 64-bit regardless of import order
jax.config.update("jax_enable_x64", True)
try:
    from jax import shard_map as _shard_map
    _CHECK_KW = "check_vma"
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _CHECK_KW = "check_rep"


def shard_map(f=None, **kw):
    if "check_rep" in kw:
        kw[_CHECK_KW] = kw.pop("check_rep")
    if f is None:
        return lambda g: _shard_map(g, **kw)
    return _shard_map(f, **kw)


# -- ICI traffic accounting ---------------------------------------------------
#
# Every distributed kernel notes its per-invocation cross-chip traffic
# so the weak-scaling bench (bench.py --mesh N) can report exchanged
# bytes per query. The model is the standard ring-algorithm cost:
#   all_to_all of per-chip buffer B bytes  -> B*(n-1) total on the wire
#   psum/pmin/pmax of replicated result R  -> 2*R*(n-1)
#   all_gather of per-chip shard S         -> n*(n-1)*S
#   ppermute of per-chip shard S           -> n*S per step
# (BASELINE.md's weak-scaling report wants rows/s AND bytes moved; on a
# virtual CPU mesh wall-clock scaling is meaningless, so the byte model
# is the honest scaling signal this environment can produce.)

stats = {"exchanged_bytes": 0, "kernel_calls": 0}


def reset_stats():
    stats["exchanged_bytes"] = 0
    stats["kernel_calls"] = 0


def _counted(fn, est):
    """Wrap a jitted dist kernel; `est(*args) -> bytes` runs on the
    host at call time (static shapes make it exact per plan)."""
    def run(*a):
        stats["exchanged_bytes"] += int(est(*a))
        stats["kernel_calls"] += 1
        return fn(*a)
    run.inner = fn    # for callers composing the kernel inside their
    run.est = est     # own jit: call inner, account with est yourself
    return run


def make_mesh(n_devices=None, axis="d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devs)}; on CPU set "
                "jax.config.update('jax_num_cpu_devices', N) before init")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_rows(mesh: Mesh, arr, axis="d"):
    """Place a host array row-sharded over the mesh."""
    from jax.sharding import NamedSharding
    n = mesh.shape[axis]
    pad = (-len(arr)) % n
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=arr.dtype)])
    return jax.device_put(arr, NamedSharding(mesh, P(axis))), pad


# -- distributed dense group-by ----------------------------------------------
#
# Per-chip partials use the scatter-free one-hot matmul kernels from
# engine/groupby.py (scatter costs ~90 ms/10M rows on TPU; the MXU one-
# hot matmul is ~2-9 ms — see TPU_NOTES.md). The cross-chip combine is
# psum over ICI — the analogue of the reference's AGGR_COLLECT pairwise
# merge of per-thread partial vectors (core/aggr.c:163-181).

def dist_groupby_sum(mesh: Mesh, n_codes: int):
    """Distributed group-by-sum: per-chip dense matmul partials,
    psum-combined over ICI. codes/values row-sharded; result
    replicated."""
    from ..engine import groupby as G
    axis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(), check_rep=False)
    def kernel(codes, values):
        part = G.matmul_tasks_scan(
            codes, [values.astype(jnp.float32)], n_codes + 1,
            codes.shape[0])[0]
        return jax.lax.psum(part, axis)

    n_dev = mesh.shape[axis]
    return _counted(jax.jit(kernel),
                    lambda *a: 2 * (n_dev - 1) * (n_codes + 1) * 4)


def dist_groupby_count_first(mesh: Mesh, n_codes: int, shard_rows_n: int):
    """Distributed counts + global first-row index per dense code."""
    from ..engine import groupby as G
    axis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh, in_specs=(P(axis),),
             out_specs=(P(), P()), check_rep=False)
    def kernel(codes):
        me = jax.lax.axis_index(axis)
        n = codes.shape[0]
        cnt = G.matmul_tasks_scan(
            codes, [jnp.ones(n, jnp.float32)], n_codes + 1, n)[0] \
            .astype(jnp.int32)
        bc = G.bcast_scan(codes, n_codes + 1, n, want_counts=False,
                          want_fidx=True)
        fidx = jnp.where(bc["fidx"] == G.KEY_MAX, jnp.int64(G.KEY_MAX),
                         bc["fidx"] + me.astype(jnp.int64) * shard_rows_n)
        return (jax.lax.psum(cnt, axis), jax.lax.pmin(fidx, axis))

    n_dev = mesh.shape[axis]
    return _counted(
        jax.jit(kernel),
        lambda *a: 2 * (n_dev - 1) * (n_codes + 1) * (4 + 8))


# -- distributed shuffle (all_to_all by key hash) ----------------------------

def dist_shuffle(mesh: Mesh, capacity: int):
    """Route rows to the chip owning hash(key) % n_devices.

    Returns a jitted fn (keys, values) -> (keys', values', valid',
    overflow) where each chip receives up to `capacity` rows per
    source chip (static shape). Rows beyond capacity are NOT sent;
    `overflow` (replicated scalar) counts them so the caller can
    re-run with a larger capacity — nothing drops silently. For
    group-by workloads prefer dist_wide_groupby, whose pre-aggregation
    makes overflow impossible by construction. This is the ICI
    analogue of the reference's radix scatter with per-thread write
    cursors (index.c:2542-2553)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=(P(axis), P(axis), P(axis), P()),
             check_rep=False)
    def kernel(keys, values):
        n = keys.shape[0]
        dest = (keys % n_dev).astype(jnp.int32)
        # stable position of each row within its destination bucket
        order = jnp.argsort(dest, stable=True)
        keys_s = keys[order]
        vals_s = values[order]
        dest_s = dest[order]
        # per-destination slot layout: buckets of `capacity` rows
        within = jnp.arange(n) - jnp.searchsorted(dest_s, dest_s,
                                                  side="left")
        ok = within < capacity
        overflow = jax.lax.psum((~ok).sum().astype(jnp.int64), axis)
        # overflowing rows scatter out of bounds -> dropped from the
        # send buffer, counted in `overflow`
        slot = jnp.where(ok, dest_s * capacity + within,
                         n_dev * capacity)
        send_k = jnp.full((n_dev * capacity,), -1, dtype=keys.dtype)
        send_v = jnp.zeros((n_dev * capacity,), dtype=values.dtype)
        send_k = send_k.at[slot].set(keys_s, mode="drop")
        send_v = send_v.at[slot].set(vals_s, mode="drop")
        send_k = send_k.reshape(n_dev, capacity)
        send_v = send_v.reshape(n_dev, capacity)
        recv_k = jax.lax.all_to_all(send_k, axis, 0, 0, tiled=False)
        recv_v = jax.lax.all_to_all(send_v, axis, 0, 0, tiled=False)
        recv_k = recv_k.reshape(-1)
        recv_v = recv_v.reshape(-1)
        valid = recv_k >= 0
        return recv_k, recv_v, valid, jnp.reshape(overflow, (1,))

    return _counted(
        jax.jit(kernel),
        lambda *a: 2 * n_dev * (n_dev - 1) * capacity * 8)


def dist_shuffle_auto(mesh: Mesh, start_capacity: int):
    """Overflow-safe shuffle: doubles capacity and re-runs until no
    row overflows (the retry the round-1 kernel lacked)."""
    fns: dict = {}

    def run(keys, values):
        c = start_capacity
        while True:
            if c not in fns:
                fns[c] = dist_shuffle(mesh, c)
            rk, rv, valid, ovf = fns[c](keys, values)
            if int(np.asarray(ovf)[0]) == 0:
                return rk, rv, valid
            c *= 2

    return run


# -- distributed fused select (small dense code space) ------------------------

def dist_select_small(mesh: Mesh, n_codes: int, shard_rows_n: int,
                      n_sums: int, n_mins: int, n_maxs: int,
                      n_int_tasks: int):
    """The multi-chip version of engine/select.py's small-n pipeline:
    each chip runs the shard-local broadcast-mask scan + one-hot matmul
    tasks over its rows; combines are psum (counts / sums / integer
    limb tasks), pmin (fidx, mins), pmax (lidx, maxs) over ICI — the
    reference's per-thread partials + AGGR_COLLECT merge
    (core/aggr.c:163-181) lifted onto the mesh.

    Inputs (all row-sharded): codes (i32, trash = n_codes for filtered
    rows), int-task weight f32 arrays, f64 sum arrays (nulls zeroed),
    min/max i64-or-f64 arrays (nulls pre-mapped). Outputs: replicated
    dense lanes.
    """
    from ..engine import groupby as G
    axis = mesh.axis_names[0]
    nin = 1 + n_int_tasks + n_sums + n_mins + n_maxs
    specs = tuple(P(axis) for _ in range(nin))

    @partial(shard_map, mesh=mesh, in_specs=specs,
             out_specs=P(), check_rep=False)
    def kernel(codes, *rest):
        me = jax.lax.axis_index(axis)
        n = codes.shape[0]
        int_ws = rest[:n_int_tasks]
        sums = rest[n_int_tasks:n_int_tasks + n_sums]
        mins = rest[n_int_tasks + n_sums:
                    n_int_tasks + n_sums + n_mins]
        maxs = rest[n_int_tasks + n_sums + n_mins:]
        tasks = [jnp.ones(n, jnp.float32)] + list(int_ws)
        dense = G.matmul_tasks_scan(codes, tasks, n_codes + 1, n)
        out = {"counts": jax.lax.psum(dense[0][:n_codes], axis)}
        for i in range(n_int_tasks):
            out[f"task{i}"] = jax.lax.psum(dense[1 + i][:n_codes],
                                           axis)
        bc = G.bcast_scan(codes, n_codes, n, sums=tuple(sums),
                          mins=tuple(mins), maxs=tuple(maxs),
                          want_counts=False, want_fidx=True)
        off = me.astype(jnp.int64) * shard_rows_n
        fidx = jnp.where(bc["fidx"] == G.KEY_MAX,
                         jnp.int64(G.KEY_MAX), bc["fidx"] + off)
        lidx = jnp.where(bc["lidx"] < 0, jnp.int64(-1),
                         bc["lidx"] + off)
        out["fidx"] = jax.lax.pmin(fidx, axis)
        out["lidx"] = jax.lax.pmax(lidx, axis)
        for i in range(n_sums):
            out[f"sum{i}"] = jax.lax.psum(bc[f"sum{i}"], axis)
        for i in range(n_mins):
            out[f"min{i}"] = jax.lax.pmin(bc[f"min{i}"], axis)
        for i in range(n_maxs):
            out[f"max{i}"] = jax.lax.pmax(bc[f"max{i}"], axis)
        return out

    n_dev = mesh.shape[axis]
    _R = (1 + n_int_tasks) * n_codes * 4 + 2 * n_codes * 8 + \
        (n_sums + n_mins + n_maxs) * n_codes * 8
    return _counted(jax.jit(kernel), lambda *a: 2 * (n_dev - 1) * _R)


# -- end-to-end distributed aggregate query ----------------------------------

def dist_filter_group_sum(mesh: Mesh, n_codes: int):
    """The full fused step: filter mask + dense codes + partial sums +
    psum. This is the multi-chip version of engine/select.py's
    pipeline."""
    axis = mesh.axis_names[0]

    from ..engine import groupby as G

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis)),
             out_specs=(P(), P()), check_rep=False)
    def kernel(codes, values, mask):
        c = jnp.where(mask, codes, n_codes)
        s, cnt = G.matmul_tasks_scan(
            c, [values.astype(jnp.float32),
                jnp.ones_like(values, dtype=jnp.float32)],
            n_codes + 1, c.shape[0])
        return jax.lax.psum(s, axis), jax.lax.psum(cnt, axis)

    n_dev = mesh.shape[axis]
    return _counted(
        jax.jit(kernel),
        lambda *a: 2 * (n_dev - 1) * 2 * (n_codes + 1) * 4)


# -- distributed wide group-by (partial-aggregate exchange) -------------------
#
# The multi-chip version of engine/wide.py, following the reference's
# radix-partition blueprint (core/index.c:2556-2729) lifted onto ICI:
#
#   stage A (per chip): local sort-agg over the shard's rows ->
#     compacted partial groups (code, sum, count, fidx). This is the
#     COMBINER: a heavy-hitter key contributes at most ONE partial per
#     chip, so key skew cannot overload the exchange (the skew-aware
#     repartitioning the reference needs for raw-row scatters is
#     unnecessary once rows pre-aggregate).
#   stage B: all_to_all partials to the chip owning hash(code) % n_dev.
#     Per-(src,dst) capacity = rows_local, which CANNOT overflow (a
#     shard has at most rows_local distinct groups in total) — the
#     exchange is zero-drop by construction, unlike a raw-row shuffle.
#   stage C (per chip): merge received partials (sort by code, fidx;
#     segmented combine), compact to `out_cap` groups. out_cap CAN
#     overflow under extreme hash imbalance, so the kernel returns an
#     overflow count; dist_wide_groupby_auto retries with doubled
#     capacity when it is nonzero.
#   stage D: all_gather merged groups; every chip orders them by global
#     first-row id (first-appearance order, replicated result).

_LANE_FILL = {"sum": np.float64(0.0), "min": np.float64(np.inf),
              "max": np.float64(-np.inf), "first": np.float64(0.0),
              "last": np.float64(0.0)}


def dist_wide_groupby(mesh: Mesh, rows_local: int, out_cap: int,
                      lane_ops=("sum",), n_codes=None):
    """Build the jitted distributed group-by kernel with one f64 value
    lane per entry of `lane_ops` (each "sum" | "min" | "max" | "first"
    | "last" — the decomposable combiners of the reference's
    AGGR_COLLECT merge, core/aggr.c:163-181, plus the positional pair
    resolved by row id).

    fn(codes, *lanes) with row-sharded i64 codes (masked rows = -1) and
    len(lane_ops) f64 lanes; returns replicated (ng, overflow, codes,
    counts, *lane_results) where the first `ng` entries of each output
    are the groups in global first-appearance order.

    "first"/"last" lanes return the lane value at the group's globally
    first/last row: per-chip partials keep the boundary value of the
    (code, pos) sort (first) or the single-marked-row segmented sum
    (last, exact for any f64 value); the merge resolves first via its
    (code, first-row-id) sort and last via a second (code, -last-row-id)
    sort — the code sequence, hence the segment flags, are identical.

    When `n_codes` (the dense code-space size) is known, capacities
    tighten without losing the zero-drop guarantee: a shard emits at
    most min(rows_local, n_codes) partials, and the partials one src
    sends one dst are bounded by the codes that dst OWNS under mod
    ownership — ceil(n_codes/n_dev) — so exchange/merge buffers shrink
    from rows_local to ~n_codes/n_dev each (a 100x cut for card-10k
    group-bys at 1M rows/chip: measured 14.6 s -> sub-second per eval
    on the 8-device virtual mesh).
    """
    from ..engine import groupby as G
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    C = rows_local if n_codes is None else min(rows_local, n_codes)
    D = C if n_codes is None else \
        max(min(C, -(-n_codes // n_dev)), 1)    # per-(src,dst) cap
    BIG = np.int32(1 << 30)
    n_lanes = len(lane_ops)
    scan_of = {"sum": G.seg_doubling_sum, "min": G.seg_doubling_min,
               "max": G.seg_doubling_max}
    has_last = "last" in lane_ops

    def _compact(flags, lanes, cap, n):
        """Boundary compaction: positions of flagged rows, ascending,
        then lane gathers (n is small shard-local size here)."""
        iota = jnp.arange(n, dtype=jnp.int32)
        ck = jnp.where(flags, iota, iota + BIG)
        bpos = jax.lax.sort([ck], num_keys=1,
                            is_stable=False)[0][:cap] & (BIG - 1)
        bposc = jnp.clip(bpos, 0, n - 1)
        return [ln[bposc] for ln in lanes]

    @partial(shard_map, mesh=mesh,
             in_specs=tuple(P(axis) for _ in range(1 + n_lanes)),
             out_specs=tuple(P() for _ in range(5 + n_lanes)),
             check_rep=False)
    def kernel(codes, *lanes):
        me = jax.lax.axis_index(axis).astype(jnp.int64)
        n = codes.shape[0]
        pos_bits = max(int(n - 1).bit_length(), 1)
        posmask = (np.int64(1) << pos_bits) - 1

        # ---- stage A: local sort-agg ---------------------------------
        valid_in = codes >= 0
        key = jnp.where(
            valid_in,
            (codes << pos_bits) | jnp.arange(n, dtype=jnp.int64),
            jnp.int64(G.KEY_MAX))
        srt = jax.lax.sort([key] + list(lanes), num_keys=1,
                           is_stable=False)
        skey, svals = srt[0], srt[1:]
        sc = skey >> pos_bits
        valid = skey != G.KEY_MAX
        flags = valid & jnp.concatenate(
            [jnp.ones(1, bool), sc[1:] != sc[:-1]])
        segid = jnp.cumsum(flags.astype(jnp.int32) +
                           (~valid).astype(jnp.int32))
        rs = segid[::-1]

        def rscan(op, x):
            return scan_of[op](rs, x[::-1])[::-1]

        # last row of each valid segment (trash keys change sc at the
        # valid/trash boundary, so the plain transition test suffices)
        is_last = valid & jnp.concatenate(
            [sc[1:] != sc[:-1], jnp.ones(1, bool)])
        gpos = ((skey & posmask) + me * n).astype(jnp.float64)

        def stage_a(op, sv):
            if op == "first":
                return sv          # boundary row holds the first value
            if op == "last":       # single marked row -> exact seg sum
                return rscan("sum", jnp.where(is_last, sv, 0.0))
            return rscan(op, sv)

        plane_v = [stage_a(op, sv)
                   for op, sv in zip(lane_ops, svals)]
        pcnt = G.seg_doubling_sum(rs, jnp.ones(n, jnp.int64))[::-1]
        pfidx = (skey & posmask) + me * n       # global row id
        extra = [rscan("sum", jnp.where(is_last, gpos, 0.0))] \
            if has_last else []                 # global LAST row id
        compacted = _compact(
            flags,
            [jnp.where(flags, sc, -1), pcnt, pfidx] + plane_v + extra,
            C, n)
        pcode, pcnt_c, pfidx_c = compacted[:3]
        plane_c = compacted[3:3 + n_lanes]
        plidx_c = compacted[3 + n_lanes] if has_last else None

        # ---- stage B: all_to_all by code ownership -------------------
        live = pcode >= 0
        dk = jnp.where(live, (pcode % n_dev).astype(jnp.int32),
                       np.int32(n_dev))
        order = jnp.argsort(dk, stable=True)
        dks = dk[order]
        # per-(src,dst) capacity D cannot overflow: one src's partials
        # to dst are distinct codes dst owns (<= ceil(n_codes/n_dev))
        live_s = dks < n_dev
        within = jnp.arange(C, dtype=jnp.int32) - jnp.searchsorted(
            dks, dks, side="left").astype(jnp.int32)
        # dead rows scatter out of bounds -> dropped
        slot = jnp.where(live_s & (within < D), dks * D + within,
                         np.int32(n_dev) * D)

        def exchange(lane, fill):
            ls = lane[order]
            buf = jnp.full((n_dev * D,), fill, dtype=ls.dtype)
            buf = buf.at[slot].set(ls, mode="drop")
            return jax.lax.all_to_all(
                buf.reshape(n_dev, D), axis, 0, 0,
                tiled=False).reshape(-1)

        rcode = exchange(pcode, np.int64(-1))
        rcnt = exchange(pcnt_c, np.int64(0))
        rfidx = exchange(pfidx_c, np.int64(G.KEY_MAX))
        rlanes = [exchange(pl, _LANE_FILL[op])
                  for op, pl in zip(lane_ops, plane_c)]
        rlidx = exchange(plidx_c, np.float64(-1.0)) if has_last \
            else None

        # ---- stage C: merge received partials ------------------------
        m = n_dev * D
        mkey = jnp.where(rcode >= 0, rcode, jnp.int64(G.KEY_MAX))
        ms = jax.lax.sort([mkey, rfidx, rcnt] + rlanes, num_keys=2,
                          is_stable=False)
        msc, msf, msn = ms[0], ms[1], ms[2]
        mslanes = ms[3:]
        mvalid = msc != G.KEY_MAX
        mflags = mvalid & jnp.concatenate(
            [jnp.ones(1, bool), msc[1:] != msc[:-1]])
        msegid = jnp.cumsum(mflags.astype(jnp.int32) +
                            (~mvalid).astype(jnp.int32))
        mrs = msegid[::-1]
        if has_last:
            # second sort keyed (code, -last-row-id): its boundary rows
            # are the max-lidx partials; code sequence (so mflags) is
            # identical to the first sort's
            last_in = [i for i, op in enumerate(lane_ops)
                       if op == "last"]
            ms2 = jax.lax.sort(
                [mkey, -rlidx] + [rlanes[i] for i in last_in],
                num_keys=2, is_stable=False)
            last_vals = dict(zip(last_in, ms2[2:]))

        def merge(op, i, ml):
            if op == "first":
                return ml          # boundary row = min-fidx partial
            if op == "last":
                return last_vals[i]
            return scan_of[op](mrs, ml[::-1])[::-1]

        tot_lanes = [merge(op, i, ml) for i, (op, ml)
                     in enumerate(zip(lane_ops, mslanes))]
        tot_n = G.seg_doubling_sum(mrs, msn[::-1])[::-1]
        my_ng = mflags.sum().astype(jnp.int32)
        overflow = jnp.maximum(my_ng - out_cap, 0)
        gout = _compact(
            mflags,
            [jnp.where(mflags, msc, -1), tot_n, msf] + tot_lanes,
            out_cap, m)
        gcode, gcnt, gfidx = gout[:3]
        glanes = gout[3:]

        # ---- stage D: all_gather + global first-appearance order -----
        acode = jax.lax.all_gather(gcode, axis).reshape(-1)
        acnt = jax.lax.all_gather(gcnt, axis).reshape(-1)
        afidx = jax.lax.all_gather(gfidx, axis).reshape(-1)
        alanes = [jax.lax.all_gather(gl, axis).reshape(-1)
                  for gl in glanes]
        fkey = jnp.where(acode >= 0, afidx, jnp.int64(G.KEY_MAX))
        out = jax.lax.sort([fkey, acode, acnt] + alanes,
                           num_keys=1, is_stable=False)
        of, ocnt = out[1], out[2]
        ng = (of >= 0).sum().astype(jnp.int64)
        ovf = jax.lax.psum(overflow, axis)
        return tuple([jnp.reshape(ng, (1,)),
                      jnp.reshape(ovf.astype(jnp.int64), (1,)),
                      of, ocnt, out[0]] + list(out[3:]))

    _a2a = (3 + n_lanes + int(has_last)) * n_dev * (n_dev - 1) * D * 8
    _ag = (3 + n_lanes) * n_dev * (n_dev - 1) * out_cap * 8
    return _counted(jax.jit(kernel), lambda *a: _a2a + _ag)


def dist_wide_groupby_auto(mesh: Mesh, rows_local: int,
                           lane_ops=("sum",), n_codes=None):
    """Overflow-safe wrapper: run with balanced capacity + headroom,
    re-run with doubled merge capacity if any chip overflowed (the
    reference's retry analogue for its capacity-bounded radix buckets;
    overflow requires extreme hash imbalance, so the retry is rare).
    With `n_codes` known the initial merge capacity is the exact
    per-chip ownership bound ceil(n_codes/n_dev) — no overflow
    possible, buffers ~n_codes/n_dev instead of rows_local."""
    if n_codes is None:
        cap = max(2 * rows_local, 64)
    else:
        n_dev = mesh.shape[mesh.axis_names[0]]
        cap = max(min(2 * rows_local, -(-n_codes // n_dev)), 64)
    tried = {}

    def run(codes, *lanes):
        c = cap
        while True:
            if c not in tried:
                tried[c] = dist_wide_groupby(mesh, rows_local, c,
                                             lane_ops, n_codes)
            out = tried[c](codes, *lanes)
            if int(np.asarray(out[1])[0]) == 0:
                # (ng, codes, counts, fidx, *lane_results)
                return (out[0],) + out[2:]
            c *= 2

    return run


_MED_KPER = 16    # locally-heavy candidate slots per chip (cheap:
#                   selection cost is K tiny binary-search lanes; only
#                   the per-lane presort scales with rows)


def _f64_sortable(v):
    """Monotone f64 -> i64 map (negative floats reflect below the
    positives); `u` domain = sortable + 2^63 as uint64 so bitwise
    trial enumeration runs high-to-low."""
    b = jax.lax.bitcast_convert_type(v, jnp.int64)
    return jnp.where(b >= 0, b,
                     (~b) + jnp.int64(-0x8000000000000000))


def _f64_unsortable(s):
    b = jnp.where(s >= 0, s, ~(s + jnp.int64(-0x8000000000000000)))
    return jax.lax.bitcast_convert_type(b, jnp.float64)


def dist_med_groupby(mesh: Mesh, rows_local: int, cap: int,
                     out_cap: int, n_lanes: int):
    """Distributed grouped MEDIAN: median is not decomposable, so rows
    shuffle raw to the chip owning hash(code) % n_dev (the reference's
    radix-partition scatter, core/index.c:2556, on ICI) — every group
    lands complete on one chip, where a (code, value) sort + selection
    computes it exactly (core/aggr.c med over sorted per-group rows).

    SKEW HANDLING: any code that is locally heavy on some chip (local
    run > cap/2 — by pigeonhole every globally heavy code is) becomes
    a CANDIDATE whose rows never ride the exchange. Candidate medians
    come from an in-place distributed rank selection instead: a 64-bit
    binary search over the monotone f64 bit space, counting
    rank-below-trial per chip over presorted candidate runs and
    psum-combining — exchange capacity stays O(rows/n_dev) under any
    key skew (the repartitioning BASELINE.md mandates, without moving
    a single heavy row).

    fn(codes, *lanes) with row-sharded i64 codes (-1 = masked) and
    n_lanes f64 value lanes (nulls as NaN; XLA total order sorts NaN
    last, so each group's non-null prefix is contiguous). Returns
    replicated (ng, ovf_exchange, ovf_out, codes, fidx, *medians) in
    global first-appearance order. Either overflow counter nonzero
    means re-run with that capacity doubled (dist_med_groupby_auto).
    """
    from ..engine import groupby as G
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    BIG = np.int32(1 << 30)
    m = n_dev * cap
    K = n_dev * _MED_KPER
    theta = max(cap // 2, 1)

    @partial(shard_map, mesh=mesh,
             in_specs=tuple(P(axis) for _ in range(1 + n_lanes)),
             out_specs=tuple(P() for _ in range(5 + n_lanes)),
             check_rep=False)
    def kernel(codes, *lanes):
        me = jax.lax.axis_index(axis).astype(jnp.int64)
        n = codes.shape[0]
        rid = me * n + jnp.arange(n, dtype=jnp.int64)

        # ---- locally-heavy candidate detection -----------------------
        ckey = jnp.where(codes >= 0, codes, jnp.int64(G.KEY_MAX))
        csort = jax.lax.sort([ckey], num_keys=1, is_stable=False)[0]
        cvalid = csort != G.KEY_MAX
        cflags = cvalid & jnp.concatenate(
            [jnp.ones(1, bool), csort[1:] != csort[:-1]])
        csegid = jnp.cumsum(cflags.astype(jnp.int32) +
                            (~cvalid).astype(jnp.int32))
        runlen = G.seg_doubling_sum(csegid[::-1],
                                    jnp.ones(n, jnp.int64))[::-1]
        heavy_b = cflags & (runlen > theta)
        n_heavy = heavy_b.sum().astype(jnp.int64)
        ovf_cand = jax.lax.psum(
            jnp.maximum(n_heavy - _MED_KPER, 0), axis)
        # top-K_PER local candidates by run length
        hkey = jnp.where(heavy_b, -runlen, jnp.int64(G.KEY_MAX))
        _hk, hc = jax.lax.sort(
            [hkey, jnp.where(heavy_b, csort, -1)], num_keys=1,
            is_stable=False)
        cand_local = hc[:_MED_KPER]
        # gather + dedup (duplicate lanes would emit duplicate groups)
        cand = jax.lax.all_gather(cand_local, axis).reshape(-1)
        cand = jax.lax.sort([jnp.where(cand >= 0, cand,
                                       jnp.int64(G.KEY_MAX))],
                            num_keys=1, is_stable=False)[0]
        dup = jnp.concatenate([jnp.zeros(1, bool),
                               cand[1:] == cand[:-1]])
        cand = jnp.where(dup | (cand == G.KEY_MAX), jnp.int64(-1),
                         cand)
        cand_s = jnp.where(cand >= 0, cand, jnp.int64(G.KEY_MAX))
        # per-row candidate index via one binary search (cand sorted
        # ascending with KEY_MAX holes at the end after this re-sort)
        cand_s = jax.lax.sort([cand_s], num_keys=1,
                              is_stable=False)[0]
        cix = jnp.searchsorted(cand_s, codes).astype(jnp.int32)
        cixc = jnp.clip(cix, 0, K - 1)
        is_heavy = (cand_s[cixc] == codes) & (codes >= 0)
        cand_of_row = jnp.where(is_heavy, cixc, np.int32(K))

        # ---- heavy candidates: distributed rank selection ------------
        heavy_meds = []
        for rl in lanes:
            u = _f64_sortable(rl).astype(jnp.uint64) + \
                jnp.uint64(0x8000000000000000)
            nul = jnp.isnan(rl)
            ci = jnp.where(is_heavy & ~nul, cand_of_row,
                           np.int32(K))
            sci, su = jax.lax.sort([ci, u], num_keys=2,
                                   is_stable=False)
            kk = jnp.arange(K, dtype=jnp.int32)
            starts = jnp.searchsorted(sci, kk, side="left")
            ends = jnp.searchsorted(sci, kk, side="right")
            e = jax.lax.psum((ends - starts).astype(jnp.int64),
                             axis)
            r1 = jnp.maximum((e - 1) // 2, 0)
            r2 = e // 2
            ranks = jnp.stack([r1, r2], axis=1)     # (K, 2)

            def count_below(trial):
                """rank of `trial` inside each candidate's sorted run
                (vectorized binary search, per-(K,2) lane bounds)."""
                lo = jnp.broadcast_to(starts[:, None],
                                      (K, 2)).astype(jnp.int64)
                hi = jnp.broadcast_to(ends[:, None],
                                      (K, 2)).astype(jnp.int64)
                steps = max(int(n).bit_length() + 1, 1)

                def body(_i, lh):
                    lo_, hi_ = lh
                    mid = (lo_ + hi_) // 2
                    midc = jnp.clip(mid, 0, n - 1)
                    below = su[midc] < trial
                    go = lo_ < hi_
                    lo2 = jnp.where(go & below, mid + 1, lo_)
                    hi2 = jnp.where(go & ~below, mid, hi_)
                    return (lo2, hi2)

                lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
                return lo - starts[:, None]

            cur = jnp.zeros((K, 2), jnp.uint64)

            def bit_body(i, cur_):
                bit = jnp.uint64(63) - jnp.uint64(i)
                trial = cur_ | (jnp.uint64(1) << bit)
                cnt = jax.lax.psum(count_below(trial), axis)
                return jnp.where(cnt <= ranks, trial, cur_)

            cur = jax.lax.fori_loop(0, 64, bit_body, cur)
            sel = _f64_unsortable(
                (cur - jnp.uint64(0x8000000000000000))
                .astype(jnp.int64))
            mv = (sel[:, 0] + sel[:, 1]) / 2.0
            heavy_meds.append(
                jnp.where(e == 0, jnp.float64(np.nan), mv))

        # candidate first-row ids + presence (counting null rows too)
        ci_all = jnp.where(is_heavy, cand_of_row, np.int32(K))
        hfid = jax.ops.segment_min(rid, ci_all.astype(jnp.int32),
                                   num_segments=K + 1)[:K]
        hfid = jax.lax.pmin(hfid, axis)
        hcnt = jax.lax.psum(
            jax.ops.segment_sum(jnp.ones(n, jnp.int64),
                                ci_all.astype(jnp.int32),
                                num_segments=K + 1)[:K], axis)
        hvalid = (cand_s != G.KEY_MAX) & (hcnt > 0)
        hcode = jnp.where(hvalid, cand_s, jnp.int64(-1))
        hfid = jnp.where(hvalid, hfid, jnp.int64(G.KEY_MAX))

        # ---- raw-row shuffle by code ownership (light rows) ----------
        live = (codes >= 0) & ~is_heavy
        dest = jnp.where(live, (codes % n_dev).astype(jnp.int32),
                         np.int32(n_dev))
        order = jnp.argsort(dest, stable=True)
        dests = dest[order]
        live_s = dests < n_dev
        within = jnp.arange(n, dtype=jnp.int32) - jnp.searchsorted(
            dests, dests, side="left").astype(jnp.int32)
        ok = live_s & (within < cap)
        ovf_ex = jax.lax.psum(
            (live_s & ~ok).sum().astype(jnp.int64), axis)
        slot = jnp.where(ok, dests * cap + within, np.int32(n_dev) *
                         cap)

        def exchange(lane, fill):
            ls = lane[order]
            buf = jnp.full((n_dev * cap,), fill, dtype=ls.dtype)
            buf = buf.at[slot].set(ls, mode="drop")
            return jax.lax.all_to_all(
                buf.reshape(n_dev, cap), axis, 0, 0,
                tiled=False).reshape(-1)

        rcode = exchange(codes, np.int64(-1))
        rrid = exchange(rid, np.int64(G.KEY_MAX))
        rlanes = [exchange(lv, np.float64(np.nan)) for lv in lanes]

        # ---- local complete-group median per lane --------------------
        mkey = jnp.where(rcode >= 0, rcode, jnp.int64(G.KEY_MAX))
        iota = jnp.arange(m, dtype=jnp.int32)
        meds = []
        bpos = fidx = mflags = None
        for li, rl in enumerate(rlanes):
            sc, sv, sr = jax.lax.sort([mkey, rl, rrid], num_keys=2,
                                      is_stable=False)
            if mflags is None:
                mvalid = sc != G.KEY_MAX
                mflags = mvalid & jnp.concatenate(
                    [jnp.ones(1, bool), sc[1:] != sc[:-1]])
                msegid = jnp.cumsum(mflags.astype(jnp.int32) +
                                    (~mvalid).astype(jnp.int32))
                mrs = msegid[::-1]
                ck = jnp.where(mflags, iota, iota + BIG)
                bpos = (jax.lax.sort([ck], num_keys=1,
                                     is_stable=False)[0][:out_cap]
                        & (BIG - 1))
                bposc = jnp.clip(bpos, 0, m - 1)
                fidx = G.seg_doubling_min(mrs, sr[::-1])[::-1][bposc]
                gcode = jnp.where(mflags, sc, -1)[bposc]
            else:
                # same key -> identical code order and boundaries
                msegid_l = msegid
                mrs = msegid_l[::-1]
            e = G.seg_doubling_sum(
                mrs, (~jnp.isnan(sv)).astype(jnp.int64)[::-1]
            )[::-1][jnp.clip(bpos, 0, m - 1)]
            b64 = jnp.clip(bpos, 0, m - 1).astype(jnp.int64)
            lo_i = jnp.clip(b64 + jnp.maximum(e - 1, 0) // 2, 0,
                            m - 1)
            hi_i = jnp.clip(b64 + e // 2, 0, m - 1)
            mv = (sv[lo_i] + sv[hi_i]) / 2.0
            meds.append(jnp.where(e == 0, jnp.float64(np.nan), mv))

        my_ng = mflags.sum().astype(jnp.int32)
        ovf_out = jax.lax.psum(
            jnp.maximum(my_ng - out_cap, 0).astype(jnp.int64), axis)

        # ---- gather + global first-appearance order ------------------
        # heavy candidate lanes are replicated (psum/pmin-combined), so
        # they append ONCE to the gathered light groups
        acode = jnp.concatenate(
            [jax.lax.all_gather(gcode, axis).reshape(-1), hcode])
        afidx = jnp.concatenate(
            [jax.lax.all_gather(fidx, axis).reshape(-1), hfid])
        ameds = [jnp.concatenate(
            [jax.lax.all_gather(mv_, axis).reshape(-1), hm])
            for mv_, hm in zip(meds, heavy_meds)]
        fkey = jnp.where(acode >= 0, afidx, jnp.int64(G.KEY_MAX))
        out = jax.lax.sort([fkey, acode] + ameds, num_keys=1,
                           is_stable=False)
        ng = (out[1] >= 0).sum().astype(jnp.int64)
        return tuple([jnp.reshape(ng, (1,)),
                      jnp.reshape(ovf_ex + ovf_cand, (1,)),
                      jnp.reshape(ovf_out, (1,)),
                      out[1], out[0]] + list(out[2:]))

    _a2a = (2 + n_lanes) * n_dev * (n_dev - 1) * cap * 8
    _sel = n_lanes * 64 * 2 * (n_dev - 1) * K * 2 * 8   # rank psums
    _ag = (2 + n_lanes) * n_dev * (n_dev - 1) * out_cap * 8
    return _counted(jax.jit(kernel), lambda *a: _a2a + _sel + _ag)


def dist_med_groupby_auto(mesh: Mesh, rows_local: int, n_lanes: int):
    """Overflow-safe distributed median: doubles whichever capacity
    (exchange buckets / output groups) overflowed and re-runs."""
    n_dev = mesh.shape[mesh.axis_names[0]]
    caps = [max(2 * rows_local // n_dev, 64),
            max(2 * rows_local // n_dev, 64)]
    tried = {}

    def run(codes, *lanes):
        while True:
            key = (caps[0], caps[1])
            if key not in tried:
                tried[key] = dist_med_groupby(
                    mesh, rows_local, caps[0], caps[1], n_lanes)
            out = tried[key](codes, *lanes)
            oe = int(np.asarray(out[1])[0])
            oo = int(np.asarray(out[2])[0])
            if oe == 0 and oo == 0:
                # (ng, codes, fidx, *medians)
                return (out[0],) + out[3:]
            if oe:
                caps[0] *= 2
            if oo:
                caps[1] *= 2

    return run


# -- distributed table sort (sample sort) -------------------------------------

def _lex_ge(keys, sps, j, rid, sp_rid):
    """(tuple, rid) >= (splitter_j tuple, splitter_j rid), folding the
    comparison from the last key backward (rid is the final
    tie-breaker, making the total order unique — exchange routing then
    preserves stability exactly)."""
    res = rid >= sp_rid[j]
    for k, sp in zip(reversed(keys), reversed(sps)):
        s = sp[j]
        res = (k > s) | ((k == s) & res)
    return res


def dist_sort(mesh: Mesh, n_rows: int, key_dtypes, cap: int,
              n_samples: int = 64, cap3: int | None = None):
    """Distributed multi-key table sort — a SAMPLE SORT over ICI (the
    mesh analogue of the reference's parallel radix/merge order-by,
    core/sort.c + core/order.c:246 xasc):

      1. per chip: stable local sort of (keys..., global row id);
      2. sample n_samples evenly from each local run, all_gather,
         sort, pick n_dev-1 splitter tuples (replicated);
      3. route each row to the chip owning its splitter range via
         lexicographic (tuple, rid) comparison — monotone in the
         total order, so chip d's rows all precede chip d+1's;
      4. all_to_all exchange (per-(src,dst) capacity = `cap`; rows
         beyond it are counted in `overflow`, never silently dropped
         — dist_sort_auto retries doubled);
      5. per chip: sort received rows; concatenation over chips in
         mesh order IS the global order;
      6. rebalance to even shards: each row's final global position p
         = (exclusive-scan of per-chip valid counts) + local rank;
         route row ids to the chip owning position p (a second
         capacity-bounded all_to_all, `cap3` per (src,dst) — only
         splitter imbalance spills off-chip), then ONE single-lane
         all_gather of the even shards is the replicated permutation.

    Step 6 used to all_gather (position, rid) pairs over the full
    exchange capacity and compaction-sort them — 2 lanes x n_dev*cap
    slots ≈ 4x the rows. The rebalance form moves ~(12 B x spill) over
    the a2a plus the unavoidable 8 B/row/device of replicating the
    answer (VERDICT r03 item 4; the reference's scatter moves
    hashes/ids only, core/index.c:2556-2729).

    fn(*keys) -> (overflow[1], order[n_rows]); keys row-sharded, pad
    rows (global rid >= n_rows) are keyed +inf/KEY_MAX and sliced off.
    """
    from ..engine import groupby as G
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    nk = len(key_dtypes)
    S = n_samples
    m_recv = n_dev * cap
    rows_out = (n_rows + n_dev - 1) // n_dev
    if cap3 is None:
        cap3 = min(max(2 * rows_out // n_dev, 64), rows_out)
    cap3 = min(cap3, rows_out)

    def hi_of(dt):
        return np.float64(np.inf) if np.dtype(dt) == np.float64 \
            else np.int64(G.KEY_MAX)

    fills = [hi_of(dt) for dt in key_dtypes]

    @partial(shard_map, mesh=mesh,
             in_specs=tuple(P(axis) for _ in range(nk)),
             out_specs=(P(), P()), check_rep=False)
    def kernel(*keys):
        me = jax.lax.axis_index(axis).astype(jnp.int64)
        n = keys[0].shape[0]
        rid = me * n + jnp.arange(n, dtype=jnp.int64)
        valid = rid < n_rows
        keys = [jnp.where(valid, k, f) for k, f in zip(keys, fills)]
        ridk = jnp.where(valid, rid, jnp.int64(G.KEY_MAX))

        # ---- 1. local sort (rid as final key: unique total order) ----
        srt = jax.lax.sort(list(keys) + [ridk], num_keys=nk + 1,
                           is_stable=False)
        sk, srid = srt[:nk], srt[nk]

        # ---- 2. splitters from gathered samples ----------------------
        pos = (jnp.arange(S, dtype=jnp.int64) * n) // S + \
            max(n // (2 * S), 0)
        pos = jnp.clip(pos, 0, n - 1)
        gs = [jax.lax.all_gather(k[pos], axis).reshape(-1)
              for k in sk]
        gr = jax.lax.all_gather(srid[pos], axis).reshape(-1)
        gsort = jax.lax.sort(gs + [gr], num_keys=nk + 1,
                             is_stable=False)
        sp_keys = gsort[:nk]
        sp_rid = gsort[nk]
        sp_pos = jnp.arange(1, n_dev, dtype=jnp.int64) * S
        sps = [g[sp_pos] for g in sp_keys]
        sprid = sp_rid[sp_pos]

        # ---- 3. destination chip by splitter range -------------------
        dest = jnp.zeros(n, jnp.int32)
        for j in range(n_dev - 1):
            dest = dest + _lex_ge(sk, sps, j, srid, sprid) \
                .astype(jnp.int32)

        # ---- 4. capacity-bounded all_to_all exchange -----------------
        # local run is dest-sorted already (dest is monotone in the
        # sort order), so within-bucket positions come from one
        # searchsorted over the sorted dest array
        within = jnp.arange(n, dtype=jnp.int32) - jnp.searchsorted(
            dest, dest, side="left").astype(jnp.int32)
        ok = within < cap
        overflow = jax.lax.psum((~ok).sum().astype(jnp.int64), axis)
        slot = jnp.where(ok, dest * cap + within,
                         np.int32(n_dev) * cap)

        def exchange(lane, fill):
            buf = jnp.full((n_dev * cap,), fill, dtype=lane.dtype)
            buf = buf.at[slot].set(lane, mode="drop")
            return jax.lax.all_to_all(
                buf.reshape(n_dev, cap), axis, 0, 0,
                tiled=False).reshape(-1)

        rk = [exchange(k, f) for k, f in zip(sk, fills)]
        rr = exchange(srid, np.int64(G.KEY_MAX))

        # ---- 5. local merge of received rows -------------------------
        ms = jax.lax.sort(rk + [rr], num_keys=nk + 1, is_stable=False)
        mrid = ms[nk]

        # ---- 6. rebalance to even shards + single-lane gather --------
        mvalid = mrid != G.KEY_MAX          # a prefix (fills sort last)
        cnt = mvalid.sum().astype(jnp.int64)
        counts = jax.lax.all_gather(jnp.reshape(cnt, (1,)),
                                    axis).reshape(-1)
        start = jnp.cumsum(counts)[me] - cnt    # exclusive scan
        rank = jnp.cumsum(mvalid.astype(jnp.int64)) - 1
        p = start + rank                        # final global position
        dst = jnp.where(mvalid, (p // rows_out).astype(jnp.int32),
                        np.int32(n_dev))
        off = jnp.where(mvalid, (p - dst.astype(jnp.int64) * rows_out)
                        .astype(jnp.int32), jnp.int32(-1))
        # DIAGONAL BYPASS: with balanced splitters chip d's run covers
        # ~[d*rows_out, (d+1)*rows_out) — most rows already sit on
        # their owner. Only the splitter-imbalance spill rides the
        # all_to_all, so cap3 stays O(rows/n_dev^ish) without overflow.
        me32 = me.astype(jnp.int32)
        is_local = mvalid & (dst == me32)
        routed = mvalid & (dst != me32)
        dstr = jnp.where(routed, dst, np.int32(n_dev))
        # dstr is NOT monotone (diagonal holes): rank via argsort
        m_ = dstr.shape[0]
        order3 = jnp.argsort(dstr, stable=True)
        ds3 = dstr[order3]
        live3 = ds3 < n_dev
        within = jnp.arange(m_, dtype=jnp.int32) - jnp.searchsorted(
            ds3, ds3, side="left").astype(jnp.int32)
        ok3 = live3 & (within < cap3)
        overflow = overflow + jax.lax.psum(
            (live3 & ~ok3).sum().astype(jnp.int64), axis)
        slot3 = jnp.where(ok3, ds3 * cap3 + within,
                          np.int32(n_dev) * cap3)

        def exch3(lane, fill):
            ls = lane[order3]
            buf = jnp.full((n_dev * cap3,), fill, dtype=ls.dtype)
            buf = buf.at[slot3].set(ls, mode="drop")
            return jax.lax.all_to_all(
                buf.reshape(n_dev, cap3), axis, 0, 0,
                tiled=False).reshape(-1)

        x_off = exch3(off, jnp.int32(-1))
        x_rid = exch3(mrid, np.int64(G.KEY_MAX))
        # place arrivals + local rows at their within-shard offsets:
        # offsets form a permutation of a subset of [0, rows_out), so
        # one (off, rid) pair sort with missing slots keyed last IS
        # the shard
        loff = jnp.where(is_local, off, np.int32(2**31 - 1))
        lrid_ = jnp.where(is_local, mrid, np.int64(G.KEY_MAX))
        offk = jnp.concatenate(
            [jnp.where(x_off >= 0, x_off, np.int32(2**31 - 1)), loff])
        ridk = jnp.concatenate([x_rid, lrid_])
        pad = rows_out - offk.shape[0]
        if pad > 0:
            offk = jnp.concatenate(
                [offk, jnp.full(pad, np.int32(2**31 - 1))])
            ridk = jnp.concatenate(
                [ridk, jnp.full(pad, np.int64(G.KEY_MAX))])
        _o, shard = jax.lax.sort([offk, ridk], num_keys=1,
                                 is_stable=False)
        order = jax.lax.all_gather(shard[:rows_out], axis).reshape(-1)
        return (jnp.reshape(overflow, (1,)), order[:n_rows])

    _smp = (nk + 1) * n_dev * (n_dev - 1) * S * 8
    _a2a = (nk + 1) * n_dev * (n_dev - 1) * cap * 8
    _a2a3 = n_dev * (n_dev - 1) * cap3 * (4 + 8)
    _ag = n_dev * (n_dev - 1) * rows_out * 8
    _cnt = n_dev * (n_dev - 1) * 8
    return _counted(jax.jit(kernel),
                    lambda *a: _smp + _a2a + _a2a3 + _ag + _cnt)


def dist_sort_auto(mesh: Mesh, n_rows: int, key_dtypes):
    """Overflow-safe distributed sort: per-(src,dst) capacity starts at
    2x the balanced expectation and doubles on overflow (sampled
    splitters make retries rare)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    rows_local = (n_rows + n_dev - 1) // n_dev
    cap0 = max(2 * rows_local // n_dev, 64)
    tried = {}

    def run(*keys):
        c = c3 = cap0
        while True:
            if (c, c3) not in tried:
                tried[(c, c3)] = dist_sort(
                    mesh, n_rows, tuple(k.dtype for k in keys), c,
                    cap3=c3)
            ovf, order = tried[(c, c3)](*keys)
            if int(np.asarray(ovf)[0]) == 0:
                return order
            # the overflow counter is shared between the key-routing
            # and rebalance exchanges; double both (retries are rare
            # — sampled splitters keep runs near-balanced)
            c *= 2
            c3 = min(c3 * 2, rows_local)

    return run


# -- distributed joins --------------------------------------------------------

def dist_left_probe(mesh: Mesh):
    """Distributed left/inner-join probe, broadcast-build strategy: the
    (smaller) right side's key column is replicated to every chip, each
    chip probes its row-shard of the left side locally. Returns
    row-sharded (right_row_id, has_match); the caller gathers right
    columns by id (the reference's HT build+probe, core/index.c:2886,
    with the build side broadcast instead of partitioned)."""
    axis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P()),
             out_specs=(P(axis), P(axis)), check_rep=False)
    def kernel(lkeys, rkeys):
        nr = rkeys.shape[0]
        # first-match semantics: sort right by (key, pos), probe left
        rpos = jnp.arange(nr, dtype=jnp.int64)
        sk, sp = jax.lax.sort([rkeys, rpos], num_keys=2)
        ix = jnp.searchsorted(sk, lkeys, side="left")
        ixc = jnp.clip(ix, 0, nr - 1)
        has = sk[ixc] == lkeys
        return jnp.where(has, sp[ixc], -1), has

    n_dev = mesh.shape[axis]
    # broadcast of the replicated right key column
    return _counted(jax.jit(kernel),
                    lambda lk, rk: (n_dev - 1) * rk.size * 8)


def dist_eq_probe(mesh: Mesh, n_total_l: int, cap_l: int,
                  cap_r: int, cap_b: int | None = None):
    """Partitioned-build distributed left/inner-join probe: BOTH sides
    hash-partition by key % n_dev over the chips (capacity-bounded
    all_to_all, overflow-counted — never silently dropped), each chip
    sorts its right partition by (key, global row id) and probes its
    left partition with a first-match searchsorted, and results route
    BACK to each left row's owner chip (global row id // shard) so the
    output is row-sharded in original order with no replicating
    all_gather.

    SKEW ROUTING (VERDICT r03 item 5, the dist_med_groupby treatment
    applied to the eq join): each chip nominates its top-K locally
    heavy keys on EITHER side (local run > cap/2 — by pigeonhole every
    key that could overflow a (src,dst) bucket is locally heavy
    somewhere); the candidate set is gathered, each candidate's
    first-match right row id resolves directly via one pmin over the
    UNROUTED local shards, and rows carrying candidate keys skip the
    exchange entirely — a 99:1 hot key costs O(K) extra bytes instead
    of a capacity doubling to O(rows).

    dist_left_probe replicates the right key column to every chip —
    right for a small build side; this path keeps both sides sharded
    so a right table near HBM size still distributes. The reference's
    HT build+probe (core/index.c:2886-2998) with the build side
    partitioned instead of broadcast.

    fn(lkey, rkey) -> (ovf_l[1], ovf_r[1], ovf_b[1] replicated,
    rid[>=n_total_l], has[>=n_total_l] row-sharded); lkey/rkey
    row-sharded i64 (>= 0 for real rows, -1 padding)."""
    from ..engine import groupby as G
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    KPER = 16                        # heavy candidates per chip/side
    KC = 2 * KPER * n_dev

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=(P(), P(), P(), P(axis), P(axis)),
             check_rep=False)
    def kernel(lkey, rkey):
        nl = lkey.shape[0]
        nr = rkey.shape[0]
        me = jax.lax.axis_index(axis).astype(jnp.int64)
        capb = cap_b if cap_b is not None else max(
            2 * nl // n_dev, 64)

        def local_heavy(keys, theta):
            """Top-KPER locally heavy keys (run length > theta)."""
            n = keys.shape[0]
            ck = jnp.where(keys >= 0, keys, jnp.int64(G.KEY_MAX))
            cs = jax.lax.sort([ck], num_keys=1, is_stable=False)[0]
            cvalid = cs != G.KEY_MAX
            flags = cvalid & jnp.concatenate(
                [jnp.ones(1, bool), cs[1:] != cs[:-1]])
            segid = jnp.cumsum(flags.astype(jnp.int32) +
                               (~cvalid).astype(jnp.int32))
            runlen = G.seg_doubling_sum(segid[::-1],
                                        jnp.ones(n, jnp.int64))[::-1]
            heavy = flags & (runlen > theta)
            hk = jnp.where(heavy, -runlen, jnp.int64(G.KEY_MAX))
            _h, hc = jax.lax.sort(
                [hk, jnp.where(heavy, cs, jnp.int64(G.KEY_MAX))],
                num_keys=1, is_stable=False)
            return hc[:KPER]

        cand = jnp.concatenate([local_heavy(lkey, cap_l // 2),
                                local_heavy(rkey, cap_r // 2)])
        cand = jax.lax.all_gather(cand, axis).reshape(-1)
        cand = jax.lax.sort([cand], num_keys=1, is_stable=False)[0]

        # ---- resolve candidates against the UNROUTED right shards ----
        rrow = me * nr + jnp.arange(nr, dtype=jnp.int64)
        rk_m = jnp.where(rkey >= 0, rkey, jnp.int64(G.KEY_MAX))
        lsk, lsr = jax.lax.sort([rk_m, rrow], num_keys=2,
                                is_stable=False)
        cp = jnp.searchsorted(lsk, cand, side="left")
        cpc = jnp.clip(cp, 0, nr - 1)
        chit = (lsk[cpc] == cand) & (cand != G.KEY_MAX)
        cmin = jnp.where(chit, lsr[cpc], jnp.int64(G.KEY_MAX))
        cmin = jax.lax.pmin(cmin, axis)      # global first match

        def member(keys):
            pos = jnp.searchsorted(cand, keys, side="left")
            posc = jnp.clip(pos, 0, KC - 1)
            return (cand[posc] == keys) & (keys >= 0), posc

        ish_l, lpos = member(lkey)
        ish_r, _ = member(rkey)

        def route(keys, lanes, cap, skip):
            n = keys.shape[0]
            live = (keys >= 0) & ~skip
            dest = jnp.where(live, (keys % n_dev).astype(jnp.int32),
                             np.int32(n_dev))
            order = jnp.argsort(dest, stable=True)
            ds = dest[order]
            live_s = ds < n_dev
            within = jnp.arange(n, dtype=jnp.int32) - \
                jnp.searchsorted(ds, ds,
                                 side="left").astype(jnp.int32)
            ok = live_s & (within < cap)
            ovf = jax.lax.psum(
                (live_s & ~ok).sum().astype(jnp.int64), axis)
            slot = jnp.where(ok, ds * cap + within,
                             np.int32(n_dev) * cap)
            outs = []
            for lane, fill in lanes:
                ls = lane[order]
                buf = jnp.full((n_dev * cap,), fill,
                               dtype=ls.dtype)
                buf = buf.at[slot].set(ls, mode="drop")
                outs.append(jax.lax.all_to_all(
                    buf.reshape(n_dev, cap), axis, 0, 0,
                    tiled=False).reshape(-1))
            return ovf, outs

        lrow = me * nl + jnp.arange(nl, dtype=jnp.int64)
        ovf_l, (xlk, xlr) = route(
            lkey, [(lkey, np.int64(-1)),
                   (lrow.astype(jnp.int32), np.int32(-1))], cap_l,
            ish_l)
        ovf_r, (xrk, xrr) = route(
            rkey, [(rkey, np.int64(-1)),
                   (rrow, np.int64(G.KEY_MAX))], cap_r, ish_r)

        # first-match = smallest global right row id with equal key
        rpk = jnp.where(xrk >= 0, xrk, jnp.int64(G.KEY_MAX))
        srk, srr = jax.lax.sort([rpk, xrr], num_keys=2,
                                is_stable=False)
        ix = jnp.searchsorted(srk, jnp.maximum(xlk, 0),
                              side="left")
        ixc = jnp.clip(ix, 0, srk.shape[0] - 1)
        has = (srk[ixc] == xlk) & (xlk >= 0)
        rid = jnp.where(has, srr[ixc], jnp.int64(-1))

        # ---- route results back to each left row's owner chip --------
        lv = xlr >= 0
        me32 = me.astype(jnp.int32)
        dstb_all = jnp.where(lv, xlr // np.int32(nl),
                             np.int32(n_dev))
        offb = jnp.where(lv, xlr % np.int32(nl), np.int32(-1))
        # diagonal bypass: results owned by this chip merge locally
        is_loc = lv & (dstb_all == me32)
        dstb = jnp.where(is_loc, np.int32(n_dev), dstb_all)
        order_b = jnp.argsort(dstb, stable=True)
        dsb = dstb[order_b]
        live_b = dsb < n_dev
        m_ = dsb.shape[0]
        within_b = jnp.arange(m_, dtype=jnp.int32) - \
            jnp.searchsorted(dsb, dsb,
                             side="left").astype(jnp.int32)
        ok_b = live_b & (within_b < capb)
        ovf_b = jax.lax.psum(
            (live_b & ~ok_b).sum().astype(jnp.int64), axis)
        slot_b = jnp.where(ok_b, dsb * capb + within_b,
                           np.int32(n_dev) * capb)

        def exch_b(lane, fill):
            ls = lane[order_b]
            buf = jnp.full((n_dev * capb,), fill, dtype=ls.dtype)
            buf = buf.at[slot_b].set(ls, mode="drop")
            return jax.lax.all_to_all(
                buf.reshape(n_dev, capb), axis, 0, 0,
                tiled=False).reshape(-1)

        aoff = exch_b(offb, np.int32(-1))
        arid = exch_b(rid, np.int64(-1))
        ahas = exch_b(has.astype(jnp.int8), np.int8(0))

        # heavy rows never left this chip, and bypassed diagonal
        # results are already here: merge both with the arrivals by
        # output slot
        hmin = cmin[lpos]
        h_has = ish_l & (hmin != G.KEY_MAX)
        h_off = jnp.where(ish_l, jnp.arange(nl, dtype=jnp.int32),
                          np.int32(-1))
        offk = jnp.concatenate(
            [jnp.where(aoff >= 0, aoff, np.int32(2**31 - 1)),
             jnp.where(is_loc, offb, np.int32(2**31 - 1)),
             jnp.where(h_off >= 0, h_off, np.int32(2**31 - 1))])
        ridk = jnp.concatenate(
            [arid, rid,
             jnp.where(h_has, hmin, jnp.int64(-1))])
        hask = jnp.concatenate(
            [ahas, (has & is_loc).astype(jnp.int8),
             h_has.astype(jnp.int8)])
        pad_b = max(nl - int(offk.shape[0]), 0)
        if pad_b:
            offk = jnp.concatenate(
                [offk, jnp.full(pad_b, np.int32(2**31 - 1))])
            ridk = jnp.concatenate(
                [ridk, jnp.full(pad_b, np.int64(-1))])
            hask = jnp.concatenate([hask, jnp.zeros(pad_b, jnp.int8)])
        _o, prid, phas = jax.lax.sort([offk, ridk, hask],
                                      num_keys=1, is_stable=False)
        return (jnp.reshape(ovf_l, (1,)), jnp.reshape(ovf_r, (1,)),
                jnp.reshape(ovf_b, (1,)),
                prid[:nl], phas[:nl].astype(bool))

    capb_est = cap_b if cap_b is not None else cap_l
    _a2a = n_dev * (n_dev - 1) * \
        ((8 + 4) * cap_l + 16 * cap_r + (4 + 8 + 1) * capb_est)
    _cand = 2 * n_dev * (n_dev - 1) * KC * 8
    return _counted(jax.jit(kernel), lambda *a: _a2a + _cand)


def dist_asof_probe(mesh: Mesh):
    """Distributed asof join as a RING PROBE: left rows never move
    (they stay row-sharded, so results need no return-to-order sort),
    each chip sorts only its LOCAL right shard by packed (key<<31|ts)
    once, and the sorted shards rotate around the ring (ppermute) in
    n_dev steps. Every step binary-searches the local left probes into
    the visiting shard and folds the candidate into a running
    lexicographic max on (packed key, total-order payload bits).

    Skew-immune by construction (the repartitioning BASELINE.md
    mandates, taken to its limit): there is no key-routed exchange at
    all, so a 99:1 hot key costs exactly what a uniform key does —
    memory stays O(shard) and the per-chip work is n_dev binary-search
    sweeps, vs the full-table-sized padded exchange sort the previous
    key-mod-n_dev design paid even without skew
    (/root/reference/core/join.c asof builds one HT per key; the ring
    replaces its probe with ordered binary search over ICI).

    fn(lkey, lts, rkey, rts, rval) all row-sharded; returns
    (value, has) row-sharded in the left side's original order.
    Equal (key, ts) rows resolve to the highest payload (with row-id
    payloads that is the reference's last-by-position tie rule).
    Times must be < 2^31 (packed below the key)."""
    from ..engine import groupby as G
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
    IMIN = jnp.int64(-0x8000000000000000)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
             out_specs=(P(axis), P(axis)), check_rep=False)
    def kernel(lkey, lts, rkey, rts, rval):
        nl = lkey.shape[0]
        nr = rkey.shape[0]

        rpk = jnp.where(rkey >= 0, (rkey << 31) | rts,
                        jnp.int64(G.KEY_MAX))
        # payload in monotone total-order bits: the i64 compare below
        # matches XLA's f64 total order (NaN payloads sort highest)
        srk, svs = jax.lax.sort([rpk, _f64_sortable(rval)],
                                num_keys=2, is_stable=False)
        lpk = (jnp.maximum(lkey, 0) << 31) | lts

        def step(_i, carry):
            srk_, svs_, bpk, bvs = carry
            ix = jnp.searchsorted(srk_, lpk, side="right") - 1
            ixc = jnp.clip(ix, 0, nr - 1)
            ok = (ix >= 0) & ((srk_[ixc] >> 31) == lkey) & \
                (lkey >= 0)
            cpk = jnp.where(ok, srk_[ixc], jnp.int64(-1))
            cvs = jnp.where(ok, svs_[ixc], IMIN)
            better = (cpk > bpk) | ((cpk == bpk) & (cvs > bvs))
            bpk = jnp.where(better, cpk, bpk)
            bvs = jnp.where(better, cvs, bvs)
            srk_ = jax.lax.ppermute(srk_, axis, perm)
            svs_ = jax.lax.ppermute(svs_, axis, perm)
            return srk_, svs_, bpk, bvs

        _, _, bpk, bvs = jax.lax.fori_loop(
            0, n_dev, step,
            (srk, svs, jnp.full(nl, jnp.int64(-1)),
             jnp.full(nl, IMIN)))
        hit = bpk >= 0
        val = jnp.where(hit, _f64_unsortable(bvs),
                        jnp.float64(np.nan))
        return val, hit

    # each right row rides the full ring: n_dev ppermute steps x 16 B
    return _counted(
        jax.jit(kernel),
        lambda lk, lts, rk, rts, rv: n_dev * rk.size * 16)
