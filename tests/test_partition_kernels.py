"""Interpret-mode tests for the partition-exchange probe kernels
(reflexiv_tpu.partition_kernels): logic validation without the TPU tunnel,
mirroring tests/test_sort_kernels.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from reflexiv_tpu.partition_kernels import (  # noqa: E402
    N_DIGITS,
    compact_buckets_np,
    group_blocks_xla,
    padded_exchange,
    tile_gather_probe,
)

SHIFT = 24   # top byte of the hi limb


def _mk(n, seed=0, low_entropy=False):
    rng = np.random.default_rng(seed)
    if low_entropy:
        # duplicate-heavy: few distinct digits, skewed runs
        hi = (rng.integers(0, 8, n).astype(np.uint32) << SHIFT) | \
            rng.integers(0, 1 << 12, n).astype(np.uint32)
    else:
        hi = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    return jnp.asarray(hi), jnp.asarray(lo)


@pytest.mark.parametrize("low_entropy", [False, True])
def test_padded_exchange_reconstructs_sorted_buckets(low_entropy):
    block, nb = 1024, 4
    n = block * nb
    hi, lo = _mk(n, seed=3, low_entropy=low_entropy)
    hi_g, lo_g, starts = group_blocks_xla(hi, lo, block=block, shift=SHIFT)
    st = np.asarray(starts).reshape(nb, N_DIGITS)
    ends = np.concatenate(
        [st[:, 1:], np.full((nb, 1), block, np.int32)], axis=1)
    maxrun = int((ends - st).max())
    maxrun = max(maxrun, 8)
    hi_pad = jnp.concatenate([hi_g, jnp.zeros(maxrun, jnp.uint32)])
    lo_pad = jnp.concatenate([lo_g, jnp.zeros(maxrun, jnp.uint32)])
    out_hi, out_lo = padded_exchange(
        hi_pad, lo_pad, starts, block=block, maxrun=maxrun, interpret=True)
    got_hi, got_lo = compact_buckets_np(
        out_hi, out_lo, starts, nb=nb, block=block, maxrun=maxrun)
    # partition property: bucket d holds exactly the digit-d elements
    # (runs from different blocks are grouped, not merged), so the
    # compacted digit sequence is sorted and the (hi, lo) multiset is
    # preserved — sorting within buckets reproduces the global sort
    assert len(got_hi) == n
    got_digits = (got_hi >> np.uint32(SHIFT)) & np.uint32(0xFF)
    assert (np.diff(got_digits.astype(np.int64)) >= 0).all()
    want_hi, want_lo = jax.lax.sort((hi, lo), num_keys=2)
    order = np.lexsort((got_lo, got_hi))
    np.testing.assert_array_equal(got_hi[order], np.asarray(want_hi))
    np.testing.assert_array_equal(got_lo[order], np.asarray(want_lo))


def test_tile_gather_probe_matches_numpy():
    rng = np.random.default_rng(11)
    n_src = 16 * 1024
    src = jnp.asarray(rng.integers(0, 1 << 32, n_src, dtype=np.uint32))
    starts = jnp.asarray(
        (rng.integers(0, n_src // 1024 - 1, 1024) * 1024).astype(np.int32))
    out = np.asarray(tile_gather_probe(src, starts, interpret=True))
    s = np.asarray(src)
    for t, st in enumerate(np.asarray(starts)):
        np.testing.assert_array_equal(
            out[t * 1024: (t + 1) * 1024], s[st: st + 1024])
