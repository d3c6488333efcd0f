"""Device joins: sort-merge left/inner/asof over HBM-resident columns.

The reference builds a hash table on right-table key rows and probes
per left row (core/index.c:2886-2998 left/inner, :3194-3266 asof).
Hash probing is scatter/gather-serial — hostile to this TPU (see
TPU_NOTES.md) — so the device plan is a SORT-MERGE with identical
semantics:

  comb  = concat(right_codes, left_codes)        # rights first
  sort  = stable lax.sort by (code [, time])     # rights precede
                                                 # lefts within ties
  match = log-doubling segmented prefix min/max of right positions
          -> per left row: FIRST right row with equal keys (left/inner
             join, = the reference's find-first probe), or LAST right
             row at-or-before its time (asof)
  unsort by original position (second lax.sort)

Match ids stay ON DEVICE; merged output columns are lazy device
gathers (core.obj.DevPending with deferred thunks), so a 10M-row join
never ships rows through the ~30 MB/s relay — nor even dispatches the
gathers — unless the user actually reads the columns. This is the
analogue of the reference returning zero-copy views over mmap'd
columns.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import types as T
from ..core.obj import Obj, DevPending, enum_domain
from . import device as dev
from . import groupby as G

_MAXC = 1 << 62
_PACKABLE = (T.B8, T.U8, T.I16, T.I32, T.I64, T.DATE, T.TIME,
             T.TIMESTAMP, T.SYMBOL)
_DEV_COL_OK_SORT = _PACKABLE + (T.F64, T.ENUM)
_kernel_cache: dict = {}

# Which join engine ran last ("device-sortmerge" | "dist-eq" |
# "dist-bcast-probe" | "dist-asof") — bench.py records it per query so
# the artifact shows WHAT was measured (the reference's bench harness
# records comparable provenance, bench/main.c:366-415).
last_profile: dict = {}


def _key_ranges(lkeys, rkeys):
    """Joint (lo, rng, nullable) per key pair from cached column
    stats; None when the pair can't be packed into a shared dense i64
    code. Nullable keys get a dedicated extra code slot (rng-1):
    NULL == NULL matches like any value (the reference's find probe)
    and the wrapped (NULL - lo) garbage can never alias a real
    multi-key combination after range multiplication."""
    metas = []
    total = 1
    for lc, rc in zip(lkeys, rkeys):
        try:
            nullable = dev.column_has_null(lc) or \
                dev.column_has_null(rc)
        except Exception:
            nullable = True
        if lc.t == T.ENUM or rc.t == T.ENUM:
            # comparable only when both enums share the domain object
            if lc.t != T.ENUM or rc.t != T.ENUM or \
                    lc.domain is not rc.domain:
                return None
            lo, hi = 0, max(len(enum_domain(lc)) - 1, 0)
        elif lc.t in _PACKABLE and lc.t == rc.t:
            try:
                llo, lhi = dev.column_range(lc)
                rlo, rhi = dev.column_range(rc)
            except Exception:
                return None
            lo, hi = min(llo, rlo), max(lhi, rhi)
        else:
            return None
        rng = hi - lo + 1 + (1 if nullable else 0)
        if rng <= 0:
            return None
        total *= rng
        if total > _MAXC:
            return None
        metas.append((lo, rng, nullable))
    return metas


def _pack_codes(cols, metas):
    code = None
    for c, (lo, rng, nullable) in zip(cols, metas):
        a = dev.dev_col(c).astype(jnp.int64) - lo
        if nullable:
            nv = T.NULL_BY_TYPE.get(
                T.SYMBOL if c.t == T.ENUM else c.t, T.NULL_I64)
            a = jnp.where(dev.dev_col(c) == np.int64(nv)
                          .astype(dev.dev_col(c).dtype),
                          np.int64(rng - 1), a)
        code = a if code is None else code * rng + a
    return code


def _match_kernel(n_l: int, n_r: int, mode: str, timed: bool,
                  code_bits: int | None = None,
                  time_pack: tuple | None = None):
    """code_bits set (untimed joins whose packed code range is known):
    (code, pos) pack into ONE i64 sort key and the unsort packs
    (pos, match) likewise — two single-key unstable sorts instead of
    two stable multi-operand ones (~2x cheaper, TPU_NOTES.md).

    time_pack = (tmin, tbits) for asof joins whose (code, time) fit a
    single i64 with one spare bit: the sort key becomes
    (code << (tbits+1)) | (time - tmin) << 1 | is_left, with pos as a
    carried payload. The side bit keeps the asof tie rule (a right row
    at exactly the left row's time matches — the stable sort got this
    from rights preceding lefts in concat order); within one
    (code, time, side) everything is interchangeable for the prefix
    max, so the unstable sort is safe. Replaces the stable 3-operand
    sort (~2-3x cheaper at 30M rows)."""
    key = (n_l, n_r, mode, timed, code_bits, time_pack)
    if key in _kernel_cache:
        return _kernel_cache[key]

    n = n_r + n_l
    pos_bits = max((n - 1).bit_length(), 1)

    def kernel(lcode, rcode, *times):
        comb = jnp.concatenate([rcode, lcode])
        if code_bits is not None:
            pk = (comb << pos_bits) | jnp.arange(n, dtype=jnp.int64)
            spk = jax.lax.sort([pk], num_keys=1, is_stable=False)[0]
            scode = spk >> pos_bits
            spos = (spk & ((np.int64(1) << pos_bits) - 1)) \
                .astype(jnp.int32)
        elif timed and time_pack is not None:
            tmin, tbits = time_pack
            pos = jnp.arange(n, dtype=jnp.int32)
            tcomb = jnp.concatenate([times[1].astype(jnp.int64),
                                     times[0].astype(jnp.int64)])
            side = (pos >= n_r).astype(jnp.int64)
            pk = (comb << (tbits + 1)) | \
                ((tcomb - jnp.int64(tmin)) << 1) | side
            spk, spos = jax.lax.sort([pk, pos], num_keys=1,
                                     is_stable=False)
            scode = spk >> (tbits + 1)
        else:
            pos = jnp.arange(n, dtype=jnp.int32)
            if timed:
                tcomb = jnp.concatenate([times[1].astype(jnp.int64),
                                         times[0].astype(jnp.int64)])
                scode, _st, spos = jax.lax.sort(
                    [comb, tcomb, pos], num_keys=2, is_stable=True)
            else:
                scode, spos = jax.lax.sort([comb, pos], num_keys=1,
                                           is_stable=True)
        is_right = spos < n_r
        if mode == "first":
            rp = jnp.where(is_right, spos.astype(jnp.int64),
                           jnp.int64(G.KEY_MAX))
            m = G.seg_doubling_min(scode, rp)
            none = m == G.KEY_MAX
        else:
            rp = jnp.where(is_right, spos.astype(jnp.int64),
                           jnp.int64(-1))
            m = G.seg_doubling_max(scode, rp)
            none = m < 0
        # unsort to original (concat) order, keep the left slice.
        # m is a right position in [0, n_r) or a none-sentinel: pack
        # (pos, m+1) into one key when the bits fit (m+1 <= n_r)
        m_bits = max(int(n_r + 1).bit_length(), 1)
        if pos_bits + m_bits <= 62:
            mm = jnp.where(none, jnp.int64(0), m + 1)
            upk = (spos.astype(jnp.int64) << m_bits) | mm
            upks = jax.lax.sort([upk], num_keys=1, is_stable=False)[0]
            mun = (upks & ((np.int64(1) << m_bits) - 1)) - 1
            mun = jnp.where(mun < 0, np.int64(T.NULL_I64), mun)
        else:
            m = jnp.where(none, np.int64(T.NULL_I64), m)
            _, mun = jax.lax.sort([spos, m], num_keys=1,
                                  is_stable=True)
        return mun[n_r:]

    f = jax.jit(kernel)
    _kernel_cache[key] = f
    return f


def match_ids_device(lkeys, rkeys, ltime=None, rtime=None,
                     mode="first"):
    """Per-left-row right match ids (i64 device array, NULL_I64 when
    absent). mode='first' = left/inner join probe; mode='asof' = last
    right row with time <= left time within equal keys."""
    if not lkeys:
        if ltime is None:
            return None
        # pure temporal asof: a single all-rows "group"
        lcode = jnp.zeros(len(ltime), jnp.int64)
        rcode = jnp.zeros(len(rtime), jnp.int64)
    else:
        metas = _key_ranges(lkeys, rkeys)
        if metas is None:
            return None
        lcode = _pack_codes(lkeys, metas)
        rcode = _pack_codes(rkeys, metas)
    n_l, n_r = int(lcode.shape[0]), int(rcode.shape[0])
    m = dev.mesh()
    if m is not None and mode == "first" and ltime is None:
        if n_r > dev._cfg.get("bcast_max", 1 << 22):
            # partitioned-build probe: a right side too big to
            # replicate stays sharded; both sides hash-partition by
            # key and each chip probes its partition
            # (parallel/dist.py:dist_eq_probe; the reference's HT
            # build+probe, index.c:2886-2998, build side partitioned)
            rids = _mesh_eq(m, lcode, rcode, n_l, n_r)
            if rids is not None:
                last_profile.clear()
                last_profile["engine"] = "dist-eq"
                return rids
        # broadcast-build probe fanned over the chips — the
        # row-sharded left side probes a replicated right key column
        # (parallel/dist.py:dist_left_probe; the reference's HT
        # build+probe, index.c:2886, with the build side broadcast)
        from ..parallel import dist
        axis = m.axis_names[0]
        n_dev = m.shape[axis]
        pad = (-n_l) % n_dev
        lp = jnp.concatenate(
            [lcode, jnp.full(pad, jnp.int64(-1))]) if pad else lcode
        from jax.sharding import NamedSharding, PartitionSpec as P
        lp = jax.device_put(lp, NamedSharding(m, P(axis)))
        rid, has = dist.dist_left_probe(m)(lp, rcode)
        rid = jnp.asarray(rid).reshape(-1)[:n_l]
        has = jnp.asarray(has).reshape(-1)[:n_l]
        last_profile.clear()
        last_profile["engine"] = "dist-bcast-probe"
        return jnp.where(has, rid, jnp.int64(T.NULL_I64))
    if m is not None and mode == "asof" and lkeys:
        code_bound = 1
        for _lo, rng, _nb in metas:
            code_bound *= rng
        rids = _mesh_asof(m, lcode, rcode, ltime, rtime, n_l, n_r,
                          code_bound)
        if rids is not None:
            last_profile.clear()
            last_profile["engine"] = "dist-asof"
            return rids
    code_bits = None
    time_pack = None

    def _nullfree(cols):
        try:
            return not any(dev.column_has_null(c) for c in cols)
        except Exception:
            return False

    if ltime is None and lkeys:
        # NULL keys wrap (NULL - lo) to codes far outside [0, range):
        # consistent for equality matching, but they overflow the
        # packed (code << pos) key — pack only null-free keys
        if _nullfree(lkeys) and _nullfree(rkeys):
            total = 1
            for _lo, rng, _nb in metas:
                total *= rng
            cb = max(int(total).bit_length(), 1)
            pb = max((n_l + n_r - 1).bit_length(), 1)
            if cb + pb <= 62:
                code_bits = cb
    elif ltime is not None and _nullfree([ltime, rtime]) and \
            (not lkeys or _nullfree(lkeys + rkeys)):
        # asof (code, time, side) single-key pack — see _match_kernel
        try:
            total = 1
            for _lo, rng, _nb in (metas if lkeys else []):
                total *= rng
            llo, lhi = dev.column_range(ltime)
            rlo, rhi = dev.column_range(rtime)
            tmin = int(min(int(llo), int(rlo)))
            tmax = int(max(int(lhi), int(rhi)))
            cb = max(int(total).bit_length(), 1)
            tb = max(int(tmax - tmin).bit_length(), 1)
            if cb + tb + 1 <= 62:
                time_pack = (tmin, tb)
        except Exception:
            time_pack = None
    f = _match_kernel(n_l, n_r, mode, ltime is not None,
                      code_bits=code_bits, time_pack=time_pack)
    last_profile.clear()
    last_profile["engine"] = "device-sortmerge"
    if ltime is not None:
        return f(lcode, rcode, dev.dev_col(ltime), dev.dev_col(rtime))
    return f(lcode, rcode)


@jax.jit
def _k_gather(colarr, rids):
    safe = jnp.clip(rids, 0, colarr.shape[0] - 1)
    return colarr[safe]


@jax.jit
def _k_overlay(g2, g1, rids):
    return jnp.where(rids != np.int64(T.NULL_I64), g2, g1)


@jax.jit
def _k_take(colarr, ids):
    return colarr[ids]


def _wrap(arr_thunk, n, col: Obj, out_t: int) -> Obj:
    o = Obj(out_t, DevPending(thunk=arr_thunk, shape=(n,)),
            domain=col.domain)
    o.meta = {}
    return o


def lazy_gather_col(col: Obj, rids, fill_left: Obj | None, n_out: int,
                    out_t: int | None = None) -> Obj:
    """Right column gathered at match ids, overlaid on the left column
    (right value on match, left otherwise — join.c:83) — deferred."""
    t = col.t if out_t is None else out_t

    def thunk():
        g2 = _k_gather(dev.dev_col(col), rids)
        if fill_left is not None:
            g2 = _k_overlay(g2, dev.dev_col(fill_left), rids)
        return g2

    return _wrap(thunk, n_out, col, t)


def lazy_take_col(col: Obj, ids, n_out: int) -> Obj:
    """Column at row ids (device) — inner-join row compaction."""
    return _wrap(lambda: _k_take(dev.dev_col(col), ids), n_out, col,
                 col.t)


@jax.jit
def _k_has(rids):
    return rids != np.int64(T.NULL_I64)


def lazy_right_only_col(col: Obj, rids, n_out: int) -> Obj:
    """Right-only column with unmatched rows: LIST-degrading lazily
    (values + match mask stay on device until displayed)."""
    from ..core.obj import DevPendingList

    def thunk():
        return (_k_gather(dev.dev_col(col), rids), _k_has(rids))

    return Obj(T.LIST, DevPendingList(thunk, (n_out,), col.t,
                                      col.domain))


@jax.jit
def _k_all_matched(rids):
    return jnp.reshape((rids != np.int64(T.NULL_I64)).all(), (1,))


@jax.jit
def _k_compact(rids):
    # jnp.nonzero lowers to a scatter (slow here); a stable sort by
    # !has with an iota payload compacts matched row ids instead
    has = rids != np.int64(T.NULL_I64)
    nm = has.sum().astype(jnp.int32)
    iota = jnp.arange(rids.shape[0], dtype=jnp.int32)
    _, lids = jax.lax.sort([(~has).astype(jnp.int32), iota],
                           num_keys=1, is_stable=True)
    return jnp.reshape(nm, (1,)), lids


def all_matched(rids) -> bool:
    return bool(np.asarray(_k_all_matched(rids))[0])


def compact_ids(rids):
    """(lids, rsel, n_match) for inner-join row compaction; one scalar
    fetch to learn the match count."""
    nm_, lids_full = _k_compact(rids)
    n_match = int(np.asarray(nm_)[0])
    lids = lids_full[:n_match]
    rsel = _k_take(rids, lids)
    return lids, rsel, n_match


@jax.jit
def _k_inner_carry(rids, *cols):
    n = rids.shape[0]
    matched = rids != np.int64(T.NULL_I64)
    nm = matched.sum().astype(jnp.int64)
    iota = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(matched, iota, iota + np.int32(1 << 30))
    sorted_ = jax.lax.sort([key, rids] + list(cols), num_keys=1,
                           is_stable=False)
    return (jnp.reshape(nm, (1,)),) + tuple(sorted_[1:])


def inner_carry(rids, carry_cols):
    """Inner-join row compaction WITHOUT per-column gathers: a
    full-width gather costs ~90-175 ms on this TPU (TPU_NOTES.md), so
    compacting k left-side columns by gather costs k*~100 ms. Instead
    ONE unstable sort keyed on (matched ? left-pos : BIG) carries the
    matched right ids and every left-side column to the front in left
    order (~12 ms per carried operand). Returns (n_match, rsel_lane,
    col_lanes) — capacity-n lanes whose first n_match rows are live."""
    if int(rids.shape[0]) >= (1 << 30):
        return None
    arrs = [dev.dev_col(c) for c in carry_cols]
    outs = _k_inner_carry(rids, *arrs)
    n_match = int(np.asarray(outs[0])[0])
    return n_match, outs[1], list(outs[2:])


def sliced_col(lane, n: int, like: Obj) -> Obj:
    """A capacity lane as a typed column of logical length n."""
    from ..core.obj import DevPendingSliced
    o = Obj(like.t, DevPendingSliced(lane, n), domain=like.domain)
    o.meta = {}
    return o


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("n", "nl"))
def _k_finalize_inner(n, nl, rsel_lane, *arrs):
    rsel = jnp.clip(rsel_lane[:n], 0, None)
    outs = [ln[:n] for ln in arrs[:nl]]
    for r in arrs[nl:]:
        outs.append(r[jnp.clip(rsel, 0, r.shape[0] - 1)])
    return tuple(outs)


def finalize_inner(n_match, rsel_lane, lanes, right_cols):
    """Materialize EVERY inner-join output lane in ONE executable —
    the carried-lane slices plus the right-column gathers. Forcing the
    columns one by one paid a ~30 ms relay dispatch per lane (~300 ms
    of pure scheduling on the 10-column bench join); results land in
    HBM with a single dispatch. Returns [col_thunk] aligned to
    lanes + right_cols, all sharing one lazily-run executable."""
    rarrs = [dev.dev_col(c) for c in right_cols]
    cell: dict = {}

    def run():
        if "r" not in cell:
            cell["r"] = _k_finalize_inner(
                n_match, len(lanes), rsel_lane,
                *(list(lanes) + rarrs))
        return cell["r"]

    return [lambda i=i: run()[i]
            for i in range(len(lanes) + len(rarrs))]


_mesh_eq_cache: dict = {}


def _mesh_eq(m, lcode, rcode, n_l, n_r):
    """Partitioned-build mesh join probe glue: shard both code lanes,
    run parallel/dist.py:dist_eq_probe with capacity retry, return
    per-left-row global right ids (NULL_I64 absent)."""
    from ..parallel import dist
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = m.axis_names[0]
    n_dev = m.shape[axis]

    def shardpad(a, fill):
        pad = (-int(a.shape[0])) % n_dev
        if pad:
            a = jnp.concatenate(
                [a, jnp.full(pad, fill, dtype=a.dtype)])
        return jax.device_put(a, NamedSharding(m, P(axis)))

    # row ids ride the exchange as i32 inside dist_eq_probe; fall back
    # (caller handles None) before they could wrap (ADVICE r04)
    rows_l = (n_l + n_dev - 1) // n_dev
    rows_r = (n_r + n_dev - 1) // n_dev
    if n_dev * rows_l >= 2**31 or n_dev * rows_r >= 2**31:
        return None
    lp = shardpad(lcode, np.int64(-1))
    rp = shardpad(rcode, np.int64(-1))
    caps = [max(2 * rows_l // n_dev, 64),
            max(2 * rows_r // n_dev, 64),
            max(2 * rows_l // n_dev, 64)]
    while True:
        key = (id(m), n_l, caps[0], caps[1], caps[2], rows_l, rows_r)
        f = _mesh_eq_cache.get(key)
        if f is None:
            f = dist.dist_eq_probe(m, n_l, caps[0], caps[1],
                                   cap_b=caps[2])
            _mesh_eq_cache[key] = f
        ovf_l, ovf_r, ovf_b, rid, has = f(lp, rp)
        o_l = int(np.asarray(ovf_l)[0])
        o_r = int(np.asarray(ovf_r)[0])
        o_b = int(np.asarray(ovf_b)[0])
        if o_l == 0 and o_r == 0 and o_b == 0:
            return jnp.where(has, rid,
                             jnp.int64(T.NULL_I64))[:n_l]
        if o_l:
            caps[0] *= 2
        if o_r:
            caps[1] *= 2
        if o_b:
            caps[2] = min(caps[2] * 2, rows_l)


def _mesh_asof(m, lcode, rcode, ltime, rtime, n_l, n_r,
               code_bound):
    """Mesh-mode asof probe: a ring probe — left rows stay in place,
    each chip sorts its local right shard once, and the sorted shards
    rotate over ICI with a running best-candidate fold
    (parallel/dist.py:dist_asof_probe — skew-immune, O(shard) memory).
    Matched RIGHT ROW IDS ride as exactly-representable f64 payloads.
    Falls back (None) when (code, biased time) exceed the probe's
    packed-key budget (codes < 2^31, time span < 2^31)."""
    try:
        llo, lhi = dev.column_range(ltime)
        rlo, rhi = dev.column_range(rtime)
    except Exception:
        return None
    tmin = int(min(int(llo), int(rlo)))
    tspan = int(max(int(lhi), int(rhi))) - tmin
    if tspan >= (1 << 31) or tspan < 0 or code_bound >= (1 << 31):
        return None
    from ..parallel import dist
    axis = m.axis_names[0]
    n_dev = m.shape[axis]
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shardpad(a, fill):
        pad = (-int(a.shape[0])) % n_dev
        if pad:
            a = jnp.concatenate(
                [a, jnp.full(pad, fill, dtype=a.dtype)])
        return jax.device_put(a, NamedSharding(m, P(axis)))

    # codes must stay below 2^31 for the probe's key<<31|ts packing
    # (rcode max is data-dependent but bounded by the packed key-range
    # metas; a conservative host check on the left code bound)
    lt = dev.dev_col(ltime).astype(jnp.int64) - tmin
    rt_ = dev.dev_col(rtime).astype(jnp.int64) - tmin
    lk = shardpad(lcode, np.int64(-1))
    lts = shardpad(lt, np.int64(0))
    rk = shardpad(rcode, np.int64(-1))
    rts = shardpad(rt_, np.int64(0))
    rid_global = jnp.arange(n_r, dtype=jnp.int64).astype(jnp.float64)
    rv = shardpad(rid_global, np.float64(np.nan))
    f = dist.dist_asof_probe(m)
    val, hit = f(lk, lts, rk, rts, rv)
    val = jnp.asarray(val).reshape(-1)[:n_l]
    hit = jnp.asarray(hit).reshape(-1)[:n_l]
    return jnp.where(hit, val.astype(jnp.int64),
                     jnp.int64(T.NULL_I64))
