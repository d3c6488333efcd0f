"""Pallas blocked bitonic sort (engine/psort.py) — host-side
correctness in interpreter mode with small blocks, so the multi-block
phase B (layout windows, cross-block exchanges, in-VMEM clean) is
exercised by the default CPU suite. The reference analogue is the LSD
radix index sort (core/sort.c:183-358); the TPU design is
data-oblivious instead (no scatter on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rayforce_tpu.engine import psort


@pytest.fixture(autouse=True)
def _interpret():
    old = psort._INTERPRET
    psort._INTERPRET = True
    yield
    psort._INTERPRET = old


@pytest.mark.parametrize("n,blk", [(977, 10), (4096, 10),
                                   (20000, 10)])
def test_pair_sort(n, blk):
    rng = np.random.default_rng(n)
    k = rng.integers(-10**6, 10**6, n).astype(np.int32)
    v = np.arange(n, dtype=np.int32)
    sk, sv = psort.sort_i32([jnp.asarray(k), jnp.asarray(v)],
                            n_keys=1, blk_log2=blk)
    sk, sv = np.asarray(sk), np.asarray(sv)
    assert np.array_equal(sk, np.sort(k))
    assert np.array_equal(k[sv], sk)              # a real permutation
    assert np.array_equal(np.sort(sv), np.arange(n))


def test_duplicate_keys_permutation():
    """Equal keys must not duplicate/drop payload (the compare-
    exchange is antisymmetric on ties)."""
    rng = np.random.default_rng(3)
    n = 15000
    k = rng.integers(0, 7, n).astype(np.int32)    # heavy duplicates
    v = np.arange(n, dtype=np.int32)
    sk, sv = psort.sort_i32([jnp.asarray(k), jnp.asarray(v)],
                            n_keys=1, blk_log2=10)
    assert np.array_equal(np.asarray(sk), np.sort(k))
    assert np.array_equal(np.sort(np.asarray(sv)), np.arange(n))


def test_two_key_lex():
    rng = np.random.default_rng(5)
    n = 30000
    k1 = rng.integers(0, 40, n).astype(np.int32)
    k2 = rng.integers(-10**6, 10**6, n).astype(np.int32)
    v = np.arange(n, dtype=np.int32)
    s1, s2, sv = psort.sort_i32(
        [jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(v)],
        n_keys=2, blk_log2=11)
    order = np.lexsort((k2, k1))
    assert np.array_equal(np.asarray(s1), k1[order])
    assert np.array_equal(np.asarray(s2), k2[order])


def test_sort_mixed_i64_key_f64_payload():
    """The lax.sort call-shape wrapper: i64 key (split into two
    order-preserving i32 words) carrying one f64 and one i64 lane."""
    rng = np.random.default_rng(11)
    n = 20000
    k = rng.integers(-2**40, 2**40, n).astype(np.int64)
    f = rng.uniform(-5, 5, n)
    g = rng.integers(-2**50, 2**50, n).astype(np.int64)
    sk, (sf, sg) = psort.sort_mixed(
        jnp.asarray(k), [jnp.asarray(f), jnp.asarray(g)],
        stable_iota=True)
    order = np.argsort(k, kind="stable")
    assert np.array_equal(np.asarray(sk), k[order])
    assert np.array_equal(np.asarray(sf), f[order])
    assert np.array_equal(np.asarray(sg), g[order])
