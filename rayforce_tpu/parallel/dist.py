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

    return jax.jit(kernel)


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

    return jax.jit(kernel)


# -- distributed shuffle (all_to_all by key hash) ----------------------------

def dist_shuffle(mesh: Mesh, capacity: int):
    """Route rows to the chip owning hash(key) % n_devices.

    Returns a jitted fn (keys, values) -> (keys', values', valid') where
    each chip receives up to `capacity` rows per source chip (static
    shape; overflowing rows would be dropped — pick capacity with
    headroom, e.g. 2x the balanced share). This is the ICI analogue of
    the reference's radix scatter with per-thread write cursors
    (index.c:2542-2553)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=(P(axis), P(axis), P(axis)), check_rep=False)
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
        slot = dest_s * capacity + jnp.where(ok, within, 0)
        send_k = jnp.full((n_dev * capacity,), -1, dtype=keys.dtype)
        send_v = jnp.zeros((n_dev * capacity,), dtype=values.dtype)
        send_k = send_k.at[slot].set(jnp.where(ok, keys_s, -1))
        send_v = send_v.at[slot].set(jnp.where(ok, vals_s, 0))
        send_k = send_k.reshape(n_dev, capacity)
        send_v = send_v.reshape(n_dev, capacity)
        recv_k = jax.lax.all_to_all(send_k, axis, 0, 0, tiled=False)
        recv_v = jax.lax.all_to_all(send_v, axis, 0, 0, tiled=False)
        recv_k = recv_k.reshape(-1)
        recv_v = recv_v.reshape(-1)
        valid = recv_k >= 0
        return recv_k, recv_v, valid

    return jax.jit(kernel)


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

    return jax.jit(kernel)


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

    return jax.jit(kernel)
