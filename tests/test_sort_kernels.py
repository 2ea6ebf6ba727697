"""Parity tests for the hierarchical Pallas bitonic sort (interpret mode on
CPU; on-chip validation lives in scripts/tpu_sort_bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reflexiv_tpu.sort_kernels import (
    BLOCK, SENTINEL, padded_size, sort_pairs, sort_pairs_padded)


def _key64(hi, lo):
    return (np.asarray(hi).astype(np.uint64) << 32) | np.asarray(lo)


def test_sort_pairs_single_block_parity():
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 2**30, BLOCK, dtype=np.uint32)
    lo = rng.integers(0, 2**32, BLOCK, dtype=np.uint32)
    sh, sl = sort_pairs(jnp.asarray(hi), jnp.asarray(lo), interpret=True)
    assert np.array_equal(_key64(sh, sl), np.sort(_key64(hi, lo)))


def test_sort_pairs_multi_block_duplicates_parity():
    """Cross-block rounds + the counting workload shape: heavy duplicate
    keys and a sentinel (invalid-row) tail."""
    rng = np.random.default_rng(1)
    N = 2 * BLOCK
    hi = rng.integers(0, 40, N, dtype=np.uint32)
    lo = rng.integers(0, 4, N, dtype=np.uint32)
    hi[-N // 3:] = 0xFFFFFFFF
    lo[-N // 3:] = 0xFFFFFFFF
    sh, sl = sort_pairs(jnp.asarray(hi), jnp.asarray(lo), interpret=True)
    assert np.array_equal(_key64(sh, sl), np.sort(_key64(hi, lo)))


def test_sort_pairs_padded_non_pow2():
    rng = np.random.default_rng(2)
    N = BLOCK + BLOCK // 3
    cap = padded_size(N)
    assert cap == 2 * BLOCK
    hi = rng.integers(0, 2**30, N, dtype=np.uint32)
    lo = rng.integers(0, 2**32, N, dtype=np.uint32)
    sh, sl = sort_pairs_padded(jnp.asarray(hi), jnp.asarray(lo),
                               interpret=True)
    assert sh.shape[0] == cap
    got = _key64(sh, sl)
    assert np.array_equal(got[:N], np.sort(_key64(hi, lo)))
    assert (got[N:] == _key64(SENTINEL, SENTINEL)).all()


def test_sort_pairs_rejects_bad_shape():
    with pytest.raises(ValueError):
        sort_pairs(jnp.zeros(100, jnp.uint32), jnp.zeros(100, jnp.uint32))


def test_sort_count_filter_pallas_matches_xla():
    """The counting integration: pallas_sort=True (interpret on CPU) must
    produce the same unique-kmer table as the lax.sort path."""
    from reflexiv_tpu.count import extract_canonical_kmers, sort_count_filter
    from reflexiv_tpu.io import reads_to_matrix
    import random

    rng = random.Random(3)
    reads = ["".join(rng.choice("ACGT") for _ in range(80))
             for _ in range(300)]
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    limbs, valid = extract_canonical_kmers(
        jnp.asarray(mat), jnp.asarray(lens), k=21)
    ref_l, ref_c, ref_k = sort_count_filter(
        limbs, valid, min_cov=1, max_cov=10**7)
    pal_l, pal_c, pal_k = sort_count_filter(
        limbs, valid, min_cov=1, max_cov=10**7, pallas_sort=True)

    def table(l, c, k):
        l, c, k = np.asarray(l), np.asarray(c), np.asarray(k)
        return {tuple(r): int(n) for r, n in zip(l[k], c[k])}

    assert table(pal_l, pal_c, pal_k) == table(ref_l, ref_c, ref_k)


def test_sort_pairs_static_stages_parity():
    """The static-stride fallback kernels (per-round pallas_call, no
    dynamic rolls) must sort identically."""
    rng = np.random.default_rng(5)
    N = 2 * BLOCK
    hi = rng.integers(0, 2**30, N, dtype=np.uint32)
    lo = rng.integers(0, 2**32, N, dtype=np.uint32)
    sh, sl = sort_pairs(jnp.asarray(hi), jnp.asarray(lo), interpret=True,
                        static_stages=True)
    assert np.array_equal(_key64(sh, sl), np.sort(_key64(hi, lo)))
