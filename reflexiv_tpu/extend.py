"""Reflexiv extension rounds: sort -> segment-join -> re-randomize.

The heart of the assembler, re-expressing ``DSExtendReflexivKmer`` /
``DSExtendReflexivKmerToArrayLoop`` (``ReflexivDSMain.java:3011-3325`` and
``:1746-2558``) as a fixed-shape array program:

  * Each round every live record draws an orientation (marker 1 forward /
    2 reflected) from a deterministic hash of its content and the round
    number. This replaces the reference's stateful per-partition
    ``randomReflexivMarker`` toggle (``ReflexivDSMain.java:3019,3153-3223``)
    with an order-independent draw of the same ~Bernoulli(1/2) distribution
    (the reference is itself only deterministic up to scan order, SURVEY.md
    section 5).
  * Records sort by their marker-end (k-1)-base sub-kmer; within an equal-key
    group the first forward and first reflected record merge if the
    blocked/extendable gate passes — the group scan at
    ``ReflexivDSMain.java:3040-3147`` performs exactly one merge per group.
  * Merge gate (``:3070-3086``), with f = forward record, r = reflected
    record, ext(x) = len(x) - (k-1):
      - f.left < 0  and r.right < 0            -> merge, bubble = -1
      - f.left >= 0 and r.right >= 0           -> merge, bubble = -1
      - f.left >= 0 and f.left - ext(r) >= 0   -> merge, bubble = f.left - ext(r)
      - r.right >= 0 and r.right - ext(f) >= 0 -> merge, bubble = r.right - ext(f)
      - otherwise no merge (both records re-randomize for the next round).
  * Merged sequence = r.seq ++ f.seq[k-1:] (the concatenation in
    ``reflexivExtend``, ``ReflexivDSMain.java:3237-3325``); attrs propagate as
    (r.left, f.right) when bubble < 0, else bubble replaces the side whose
    block distance was consumed (``:3265-3318``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .bitpack import mix32, pack_bases
from .records import Records, derive_keys


def draw_markers(recs: Records, round_seed) -> jnp.ndarray:
    """Deterministic orientation draw: hash first/last 16 bases + length.

    ``round_seed`` may be a Python int or a traced uint32 scalar (the jitted
    round passes it as an array so the seed does not bake into the program).
    """
    n16 = min(16, recs.seq_capacity)
    head = pack_bases(recs.seq[:, :n16], n16)[:, 0]
    tail_idx = jnp.maximum(recs.length - n16, 0)[:, None] + jnp.arange(
        n16, dtype=jnp.int32
    )
    tail_idx = jnp.minimum(tail_idx, recs.seq_capacity - 1)
    tail = pack_bases(jnp.take_along_axis(recs.seq, tail_idx, axis=1), n16)[:, 0]
    salt = jnp.asarray(round_seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    h = mix32(
        head
        ^ ((tail << 16) | (tail >> 16))
        ^ recs.length.astype(jnp.uint32)
        ^ salt
    )
    return jnp.where(recs.live, 1 + (h & 1).astype(jnp.int32), 0)


@functools.partial(jax.jit, static_argnames=("k",))
def extension_round_with_markers(
    recs: Records, marker: jnp.ndarray, *, k: int
) -> Records:
    """One sort -> join round with explicit orientation draws (testable core).
    Shapes are preserved; merged partners die."""
    N, L = recs.seq.shape
    sub = k - 1

    keys = derive_keys(recs, marker, k)           # (N, Wp), dead rows = sentinel
    Wp = keys.shape[1]

    order = jnp.lexsort(
        (marker,) + tuple(keys[:, i] for i in range(Wp - 1, -1, -1))
    )
    skey = keys[order]
    smarker = marker[order]
    sseq = recs.seq[order]
    slen = recs.length[order]
    sleft = recs.left[order]
    sright = recs.right[order]
    slive = recs.live[order]

    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1)
    is_start = is_start.at[0].set(True)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1

    from .join_core import first_per_segment, merge_gate

    idx = jnp.arange(N, dtype=jnp.int32)
    fwd_idx = first_per_segment(seg, slive & (smarker == 1), N)
    refl_idx = first_per_segment(seg, slive & (smarker == 2), N)
    has_pair = (fwd_idx < N) & (refl_idx < N)

    f = jnp.minimum(fwd_idx, N - 1)
    r = jnp.minimum(refl_idx, N - 1)
    f_left, f_right, f_len = sleft[f], sright[f], slen[f]
    r_left, r_right, r_len = sleft[r], sright[r], slen[r]

    gate = merge_gate(
        f_left, f_right, r_left, r_right, f_len - sub, r_len - sub
    )
    merge = has_pair & gate.merge
    new_left, new_right = gate.new_left, gate.new_right
    new_len = r_len + f_len - sub

    # merged sequence: r.seq columns < r_len, then f.seq shifted by (r_len - sub)
    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    from_r = col < r_len[:, None]
    f_src = jnp.clip(col - r_len[:, None] + sub, 0, L - 1)
    merged_seq = jnp.where(
        from_r, sseq[r], jnp.take_along_axis(sseq[f], f_src, axis=1)
    )

    # the forward slot receives the merged record; the reflected slot dies
    i_am_fwd = merge & (idx == fwd_idx)
    i_am_refl = merge & (idx == refl_idx)

    out_seq = jnp.where(i_am_fwd[:, None], merged_seq, sseq)
    out_len = jnp.where(i_am_fwd, new_len, slen)
    out_left = jnp.where(i_am_fwd, new_left, sleft)
    out_right = jnp.where(i_am_fwd, new_right, sright)
    out_live = slive & ~i_am_refl

    return Records(out_seq, out_len, out_left, out_right, out_live)


def extension_round(recs: Records, *, k: int, round_seed: int) -> Records:
    """One full round: draw orientations, then sort -> join."""
    marker = draw_markers(recs, round_seed)
    return extension_round_with_markers(recs, marker, k=k)


@functools.partial(jax.jit, static_argnames=("k",))
def extension_round_fused(recs: Records, round_seed: jnp.ndarray, *, k: int):
    """One round + loop statistics in a single compiled program.

    The driver loop needs (live count, worst-case next length) every round;
    computing them eagerly compiled hundreds of tiny per-shape programs —
    18 of 29 s of the example assembly was XLA compilation. Returns
    ``(records, live_count, needed_seq_capacity)``.
    """
    marker = draw_markers(recs, round_seed)
    out = extension_round_with_markers(recs, marker, k=k)
    live_n = jnp.sum(out.live)
    lens = jnp.where(out.live, out.length, 0)
    top2 = jax.lax.top_k(lens, 2)[0]
    need = top2[0] + top2[1] - (k - 1)
    return out, live_n, need


@functools.partial(jax.jit, static_argnames=("k",))
def finished_mask(recs: Records, k: int) -> jnp.ndarray:
    """Records that can never merge again: neither their head (k-1)-mer
    matches any live record's tail, nor their tail any head.

    The TPU analog of the reference's extendability prefiltering
    (``ReflexivDSKmerProcessing64``: ``DSFilterStillExtendableKmerEnds`` /
    ``DSFilterUnExtendableKmer*Ends``, splitting finished k-mers out of the
    per-round sort volume). Conservative: attr gating is ignored, so a
    "finished" verdict is always safe to park.
    """
    N = recs.capacity
    ones = jnp.ones(N, dtype=jnp.int32)
    head = derive_keys(recs, ones, k)          # marker 1: first k-1 bases
    tail = derive_keys(recs, 2 * ones, k)      # marker 2: last k-1 bases
    keys = jnp.concatenate([head, tail], axis=0)
    is_tail = jnp.concatenate(
        [jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)]
    )
    live2 = jnp.concatenate([recs.live, recs.live])
    Wp = keys.shape[1]
    keyed = jnp.where(live2[:, None], keys, jnp.uint32(0xFFFFFFFF))
    order = jnp.lexsort(tuple(keyed[:, i] for i in range(Wp - 1, -1, -1)))
    skey = keyed[order]
    stail = is_tail[order]
    slive = live2[order]
    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1)
    is_start = is_start.at[0].set(True)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    n_heads = jax.ops.segment_sum(
        jnp.where(slive & (stail == 0), 1, 0), seg, num_segments=2 * N
    )[seg]
    n_tails = jax.ops.segment_sum(
        jnp.where(slive & (stail == 1), 1, 0), seg, num_segments=2 * N
    )[seg]
    # scatter back: row i of the concat -> record i % N
    partnered = jnp.zeros(2 * N, dtype=bool).at[order].set(
        jnp.where(stail == 0, n_tails > 0, n_heads > 0)
    )
    can_fwd = partnered[:N]    # head matches someone's tail
    can_refl = partnered[N:]   # tail matches someone's head
    return recs.live & ~can_fwd & ~can_refl


def required_seq_capacity(recs: Records, k: int) -> jnp.ndarray:
    """Worst-case next-round length: the two longest records merging."""
    lens = jnp.where(recs.live, recs.length, 0)
    top2 = jax.lax.top_k(lens, 2)[0]
    return top2[0] + top2[1] - (k - 1)
