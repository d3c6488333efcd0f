"""Pallas blocked bitonic sort — the TPU-native answer to the
reference's LSD radix sort of indices (core/sort.c:183-358).

Why not radix: a radix pass is a scatter, and TPU has no fast HBM
scatter (measured ~81 ms per 10M-row pass on v5e — tools/sortbench.py),
so the bandwidth-optimal CPU design is the *worst* possible TPU design.
A bitonic network is data-oblivious: every compare-exchange is an
elementwise select between two regularly-strided operands, which is
exactly what the VPU does at full rate. The blocked layout makes it
bandwidth-efficient:

  phase A   sort each 2^k-element block entirely in VMEM (all
            substages with distance < block size touch HBM once);
  phase B   for each global stage s >= k: substages with distance
            >= block size are elementwise compare-exchanges between
            whole blocks (partner element sits at the same offset of
            the partner block — no lane shuffles), then ONE per-block
            VMEM pass runs all remaining substages of that stage.

Within-VMEM substages pair elements via pltpu.roll: linear index
i = row*128 + lane, so distance 2^d is a pure lane roll for d < 7 and
a pure sublane roll for d >= 7 — the xor-partner i^2^d never crosses
the row/lane bit boundary.

Operand model: M parallel i32 arrays move through the network
together; the first `n_keys` are lexicographic sort keys (signed i32
compare), the rest are carried payload. i64/f64 operands ride as two
i32 words (hi word signed, lo word sign-flipped so signed compare
gives unsigned order) — see split64/join64.

The network is unstable, like lax.sort(is_stable=False) at the same
call sites; callers needing stability append an iota key word.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# split64/join64 and the f64 payload path need real 64-bit lanes;
# without this, import order decides correctness (dist.py:32 does the
# same — ADVICE r04 high finding).
jax.config.update("jax_enable_x64", True)

LANES = 128
DEF_BLK_LOG2 = 15        # 2^15 elements per block = (256, 128) i32

_INTERPRET = False       # tests flip this to run on CPU


def _lex_le(a_ops, b_ops, n_keys):
    """Elementwise lexicographic a <= b over the leading key words."""
    le = a_ops[n_keys - 1] <= b_ops[n_keys - 1]
    for i in range(n_keys - 2, -1, -1):
        le = (a_ops[i] < b_ops[i]) | ((a_ops[i] == b_ops[i]) & le)
    return le


def _take_mine(asc, le):
    """Compare-exchange select. With le = lex_le(low element, high
    element) evaluated identically on both sides of a pair:
      ascending  & le   -> both sides keep their own value
      ascending  & !le  -> both sides take the partner (swap)
      descending        -> mirrored
    Equal keys give le=True -> no swap, each side keeps exactly one
    copy (the elementwise formulation stays a permutation)."""
    return asc == le


def _substage(ops, n_keys, li, gbase, s, d, rows):
    """One in-VMEM compare-exchange at distance 2^d of stage s. li =
    (rows,128) local linear index, gbase = block's global offset."""
    t = 1 << d
    if d >= 7:
        ax, sh, size = 0, t >> 7, rows
    else:
        ax, sh, size = 1, t, LANES
    mask_lo = (li & t) == 0
    # shifts must trace as i32: under jax_enable_x64 a bare Python int
    # becomes i64, which tpu.dynamic_rotate rejects
    partner = [jnp.where(mask_lo,
                         pltpu.roll(x, np.int32(size - sh), axis=ax),
                         pltpu.roll(x, np.int32(sh), axis=ax))
               for x in ops]
    # ascending run iff bit (s+1) of the GLOBAL element index is 0
    asc = (((gbase + li) >> (s + 1)) & 1) == 0
    lo_ops = [jnp.where(mask_lo, m, p) for m, p in zip(ops, partner)]
    hi_ops = [jnp.where(mask_lo, p, m) for m, p in zip(ops, partner)]
    keep = _take_mine(asc, _lex_le(lo_ops, hi_ops, n_keys))
    return [jnp.where(keep, m, p) for m, p in zip(ops, partner)]


def _block_kernel(n_ops, n_keys, blk_log2, stages):
    """Kernel running `stages` = [(s, d_hi, d_lo), ...] in VMEM."""
    rows = (1 << blk_log2) >> 7

    def kernel(*refs):
        b = pl.program_id(0)
        ops = [r[:] for r in refs[:n_ops]]
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        li = row * LANES + lane
        gbase = b * (1 << blk_log2)
        for (s, d_hi, d_lo) in stages:
            for d in range(d_hi, d_lo - 1, -1):
                ops = _substage(ops, n_keys, li, gbase, s, d, rows)
        for i in range(n_ops):
            refs[n_ops + i][:] = ops[i]
    return kernel


def _window_pass_kernel(n_ops, n_keys, blk_log2, s, wbits,
                        rest_bits, in_pos, with_clean):
    """ONE HBM pass of bitonic stage s covering the cross-block
    distances whose block-bit indices are `wbits`, plus the in-block
    substages (distance < block) when `with_clean`.

    Blocks live under a BIT-PERMUTED physical layout: logical block-bit
    j sits at physical position in_pos[j]. Each program gathers the
    G = 2^|wbits| member blocks of its group through per-member index
    maps (reads may be strided — DMA handles that at full rate) and
    writes ONE contiguous superblock, which by construction is the
    layout with the window bits in the LOW positions (sorted
    ascending) and the rest bits above in ascending order. The caller
    threads that as the next pass's in_pos; since every stage's last
    window contains bit 0 and partitions [c-1..0] top-down, each STAGE
    ends back in identity layout. Cross-block compare-exchanges between
    members are pure elementwise selects — the whole tail of a stage
    costs one read+write of the data no matter how many distances it
    spans."""
    G = 1 << len(wbits)
    rows = (1 << blk_log2) >> 7
    wsorted = sorted(wbits)

    def logical_id(g, m):
        L = 0
        for i, b in enumerate(rest_bits):
            L = L + (((g >> i) & 1) << b)
        for j, b in enumerate(wsorted):
            if (m >> j) & 1:
                L = L + (1 << b)
        return L

    def kernel(*refs):
        g = pl.program_id(0)
        blocks = [[refs[i * G + m][:] for m in range(G)]
                  for i in range(n_ops)]
        for b in sorted(wbits, reverse=True):    # distance descending
            t = 1 << wsorted.index(b)            # in member space
            new = [[None] * G for _ in range(n_ops)]
            for m in range(G):
                pm = m ^ t
                lo_side = (m & t) == 0
                mine = [blocks[i][m] for i in range(n_ops)]
                part = [blocks[i][pm] for i in range(n_ops)]
                lo_ops = mine if lo_side else part
                hi_ops = part if lo_side else mine
                asc = ((logical_id(g, m)
                        >> (s + 1 - blk_log2)) & 1) == 0
                keep = _take_mine(asc,
                                  _lex_le(lo_ops, hi_ops, n_keys))
                for i in range(n_ops):
                    new[i][m] = jnp.where(keep, mine[i], part[i])
            blocks = new
        if with_clean:
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES),
                                           0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES),
                                            1)
            li = row * LANES + lane
            for m in range(G):
                ops_m = [blocks[i][m] for i in range(n_ops)]
                gbase = logical_id(g, m) * (1 << blk_log2)
                for d in range(blk_log2 - 1, -1, -1):
                    ops_m = _substage(ops_m, n_keys, li, gbase, s, d,
                                      rows)
                for i in range(n_ops):
                    blocks[i][m] = ops_m[i]
        for i in range(n_ops):
            for m in range(G):
                refs[n_ops * G + i][m * rows:(m + 1) * rows] = \
                    blocks[i][m]
    return kernel, G


def _member_spec(rows, in_pos, wsorted, rest_bits, m):
    """Input BlockSpec of window member m: physical block id from the
    traced group id g (rest bits) + the member's static bit pattern."""
    const = 0
    for j, b in enumerate(wsorted):
        if (m >> j) & 1:
            const += 1 << in_pos[b]

    def imap(g, const=const):
        # index maps must return a uniform 32-bit type: under
        # jax_enable_x64 a bare literal traces as i64 next to the i32
        # program id and Mosaic rejects the mixed func.return
        p = jnp.int32(const)
        for i, b in enumerate(rest_bits):
            p = p + (((g >> i) & 1) << np.int32(in_pos[b]))
        return (p, np.int32(0))

    return pl.BlockSpec((rows, LANES), imap,
                        memory_space=pltpu.VMEM)


# fuse window width: 2^W member blocks per program. VMEM per program
# ~= 2 * n_ops * 2^(W + blk_log2) * 4 B (in + out) + clean temps.
_W = 3

# Mosaic's default scoped-VMEM stack is 16 MB, which the window kernel
# exceeds once ~3 operands ride a 2^15 block at _W=3; v5e has 128 MB
# physical VMEM, so raise the ceiling and shrink the window for very
# wide operand sets instead of OOMing.
_VMEM_LIMIT = 96 * 1024 * 1024
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _fit_w(n_ops, blk_log2):
    """Largest window width whose in+out member blocks fit ~2/3 of the
    VMEM ceiling (leaving room for compare-exchange temporaries)."""
    w = _W
    while w > 1 and 2 * n_ops * (4 << (w + blk_log2)) > \
            (_VMEM_LIMIT * 2) // 3:
        w -= 1
    return w


@functools.partial(jax.jit,
                   static_argnames=("n_keys", "blk_log2", "interpret"))
def _sort_padded(ops, n_keys, blk_log2, interpret=False):
    """Sort power-of-two-length 2D-tiled operands (N/128, 128)."""
    n_ops = len(ops)
    rows_total = ops[0].shape[0]
    N = rows_total * LANES
    K = int(N - 1).bit_length()
    k = min(blk_log2, K)
    nb = N >> k
    rows = (1 << k) >> 7
    B = K - k                        # block-index bits
    vspec = pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0)),
                         memory_space=pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32)
              for _ in range(n_ops)]

    # phase A: every stage whose distances all fit in one block
    ops = list(pl.pallas_call(
        _block_kernel(n_ops, n_keys, k, [(s, s, 0) for s in range(k)]),
        grid=(nb,),
        in_specs=[vspec] * n_ops,
        out_specs=[vspec] * n_ops,
        out_shape=shapes,
        interpret=interpret,
        compiler_params=None if interpret else _CPARAMS,
    )(*ops))

    # phase B: stage s has cross-block distance bits [c-1 .. 0]
    # (c = s-k+1), walked top-down in windows of <= _W bits; the last
    # window also runs the in-block clean. Layout starts and ends at
    # identity every stage (see _window_pass_kernel).
    w_eff = _fit_w(n_ops, k)
    for s in range(k, K):
        c = s - k + 1
        in_pos = tuple(range(B))     # identity at stage start
        hi = c - 1
        while hi >= 0:
            lo = max(0, hi - w_eff + 1)
            wbits = list(range(lo, hi + 1))
            rest_bits = [b for b in range(B) if b not in wbits]
            kern, G = _window_pass_kernel(
                n_ops, n_keys, k, s, wbits, rest_bits, in_pos,
                with_clean=(lo == 0))
            wsorted = sorted(wbits)
            in_specs = [_member_spec(rows, in_pos, wsorted,
                                     rest_bits, m)
                        for m in range(G)]
            gspec = pl.BlockSpec((G * rows, LANES),
                                 lambda g: (g, np.int32(0)),
                                 memory_space=pltpu.VMEM)
            ops = list(pl.pallas_call(
                kern,
                grid=(nb // G,),
                in_specs=[sp for _ in range(n_ops)
                          for sp in in_specs],
                out_specs=[gspec] * n_ops,
                out_shape=shapes,
                interpret=interpret,
                compiler_params=None if interpret else _CPARAMS,
            )(*[o for o in ops for _ in range(G)]))
            # out layout: window bits -> low positions (ascending),
            # rest bits above (ascending)
            np_ = {}
            for j, b in enumerate(wsorted):
                np_[b] = j
            for i, b in enumerate(rest_bits):
                np_[b] = len(wsorted) + i
            in_pos = tuple(np_[j] for j in range(B))
            hi = lo - 1
    return ops


def _pad_to(x, n_pad, fill):
    if x.shape[0] == n_pad:
        return x
    return jnp.concatenate(
        [x, jnp.full(n_pad - x.shape[0], fill, dtype=x.dtype)])


def sort_i32(ops, n_keys=1, blk_log2=DEF_BLK_LOG2, guard=True):
    """Sort M parallel i32 device arrays by their first n_keys words
    (signed-i32 lexicographic, ascending, unstable; pads sort last).
    Returns the sorted operands at the input length.

    Pads fill every word with INT32_MAX, but a real row whose key
    words ALL equal the sentinel would tie with pads and the unstable
    network could return a pad payload inside [:n] (ADVICE r04). So
    when padding occurs (and `guard`), an i32 iota rides as one extra
    trailing key word: real rows carry iota < n, pads carry INT32_MAX,
    making real-before-pad a strict order. Callers whose final key
    word is already a pre-pad iota (sort_mixed stable_iota) pass
    guard=False to skip the redundant word."""
    n = int(ops[0].shape[0])
    N = 1 << max(int(n - 1).bit_length(), 10)
    words = [x.astype(jnp.int32) for x in ops]
    guarded = guard and N != n
    if guarded:
        words.insert(n_keys, jnp.arange(n, dtype=jnp.int32))
        n_keys += 1
    padded = [
        _pad_to(x, N, np.int32(2**31 - 1)).reshape(N // LANES, LANES)
        for x in words]
    out = _sort_padded(tuple(padded), n_keys=n_keys,
                       blk_log2=blk_log2, interpret=_INTERPRET)
    out = [o.reshape(-1)[:n] for o in out]
    if guarded:
        out.pop(n_keys - 1)
    return out


def split64(x):
    """i64 -> (hi signed i32, lo bias-flipped i32) preserving order
    under (hi, lo) signed-lex compare."""
    x = x.astype(jnp.int64)
    hi = (x >> 32).astype(jnp.int32)
    lo = jnp.bitwise_xor(x.astype(jnp.int32), jnp.int32(-2**31))
    return hi, lo


def join64(hi, lo):
    lo_u = jnp.bitwise_xor(lo, jnp.int32(-2**31)).astype(jnp.uint32)
    return (hi.astype(jnp.int64) << 32) | lo_u.astype(jnp.int64)


def sort_mixed(key, ops, stable_iota=False):
    """Drop-in for the engine's hot `lax.sort([key] + ops, num_keys=1,
    is_stable=False)` call shape: one i32/i64 key with carried
    i32/i64/f64 payload operands. i64 splits into two i32 words
    (order-preserving — split64); f64 payloads ride as two bitcast
    words. stable_iota appends an i32 iota as the final key word,
    making the result order deterministic (and stable when the caller
    feeds positions). Returns (sorted_key, sorted_ops)."""
    n = int(key.shape[0])
    words = []
    if key.dtype == jnp.int64:
        hi, lo = split64(key)
        words += [hi, lo]
    else:
        words.append(key.astype(jnp.int32))
    n_keys = len(words)
    if stable_iota:
        words.append(jnp.arange(n, dtype=jnp.int32))
        n_keys += 1
    recipes = []          # (kind, word indices) per payload operand
    for x in ops:
        if x.dtype == jnp.float64:
            w = jax.lax.bitcast_convert_type(x, jnp.int32)
            recipes.append(("f64", (len(words), len(words) + 1)))
            words += [w[:, 0], w[:, 1]]
        elif x.dtype == jnp.int64:
            hi, lo = split64(x)
            recipes.append(("i64", (len(words), len(words) + 1)))
            words += [hi, lo]
        else:
            recipes.append((str(x.dtype), (len(words),)))
            words.append(x.astype(jnp.int32))
    out = sort_i32(words, n_keys=n_keys, guard=not stable_iota)
    if key.dtype == jnp.int64:
        skey = join64(out[0], out[1])
    else:
        skey = out[0].astype(key.dtype)
    souts = []
    for (kind, idxs), x in zip(recipes, ops):
        if kind == "f64":
            packed = jnp.stack([out[idxs[0]], out[idxs[1]]], axis=-1)
            souts.append(jax.lax.bitcast_convert_type(
                packed, jnp.float64).reshape(-1))
        elif kind == "i64":
            souts.append(join64(out[idxs[0]], out[idxs[1]]))
        else:
            souts.append(out[idxs[0]].astype(x.dtype))
    return skey, souts
