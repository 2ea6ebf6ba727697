"""Shared device primitives for the aux stages (end-extend, patching,
correction): two-limb binary search and ragged hit expansion.

These replace host-side ``np.searchsorted`` on uint64 keys: JAX runs with
x64 disabled, so 62-bit packed k-mers live as (hi, lo) uint32 limb pairs
and range lookups become a vectorized lexicographic binary search (27
gather-compare iterations instead of a union re-sort per query batch).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("side",))
def searchsorted_2limb(
    thi: jnp.ndarray, tlo: jnp.ndarray,   # sorted table limbs (U,)
    qhi: jnp.ndarray, qlo: jnp.ndarray,   # query limbs (N,)
    *, side: str = "left",
) -> jnp.ndarray:
    """``np.searchsorted`` over lexicographic (hi, lo) uint32 pairs."""
    U = thi.shape[0]
    if U == 0:
        return jnp.zeros(qhi.shape, jnp.int32)
    n_iter = max(int(U).bit_length(), 1)
    lo = jnp.zeros(qhi.shape, jnp.int32)
    hi = jnp.full(qhi.shape, U, jnp.int32)

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = jnp.minimum((lo + hi) >> 1, U - 1)
        mh = thi[mid]
        ml = tlo[mid]
        if side == "left":
            go_right = (mh < qhi) | ((mh == qhi) & (ml < qlo))
        else:
            go_right = (mh < qhi) | ((mh == qhi) & (ml <= qlo))
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return lo


def expand_ranges(lo: jnp.ndarray, cnt: jnp.ndarray, cap: int):
    """Flatten per-query hit ranges [lo, lo+cnt) into flat pointer arrays.

    Returns ``(ptr, owner, valid)`` each of static length ``cap``:
    ``ptr[h]`` indexes the table row of hit h, ``owner[h]`` the query it
    belongs to, ``valid[h]`` masks the padding tail. Hits appear grouped by
    query in query order (same layout as the numpy ``np.repeat`` path).
    """
    C = lo.shape[0]
    cnt = cnt.astype(jnp.int32)
    seg_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)[:-1]])
    owner = jnp.repeat(jnp.arange(C, dtype=jnp.int32), cnt,
                       total_repeat_length=cap)
    h = jnp.arange(cap, dtype=jnp.int32)
    within = h - jnp.repeat(seg_start, cnt, total_repeat_length=cap)
    ptr = jnp.repeat(lo.astype(jnp.int32), cnt,
                     total_repeat_length=cap) + within
    valid = h < jnp.sum(cnt)
    return ptr, owner, valid


def device_stage_default(stage: str) -> bool:
    """Per-stage device-vs-numpy default, set from on-chip measurements
    (TPU_SESSION3_evidence.json round 3; TPU_ROUND5_evidence.json round 5,
    warm compile cache, VERDICT scale = 1M reads / 1M pairs):

      end_extend   34.5 s device vs 74 s CPU  -> device wins (2.1x, r3)
      correction  131.3 s device warm (r5: the single-dispatch round
                  collapsed the per-chunk tunnel syncs that made the
                  round-3 chunked form lose at 632 s) vs 316 s numpy —
                  but the native C++ rfx_correct does the same reads in
                  ~24 s (NATIVE evidence, r3), so native stays default
      patching    293 s device vs 181 s CPU   -> native C++ wins (r5
                  re-measure; rfx_map_pairs_hashed is 7.0x numpy)

    REFLEXIV_DEVICE_STAGES overrides globally: "1" forces every stage onto
    the device, "0" forces the numpy oracles.
    """
    import os

    env = os.environ.get("REFLEXIV_DEVICE_STAGES")
    if env is not None:
        return env != "0"
    return stage == "end_extend"
