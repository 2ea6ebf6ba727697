"""Dynamic multi-k subsystem: the production ``meta``/``reduce`` path.

Re-implements the reference's dynamic-k pipeline (SURVEY.md section 2.7) as
fixed-shape array programs:

  * **per-k sorting** (``ReflexivDSKmerLeftAndRightSorting``): counted k-mers
    -> RC expansion + both-direction fork filters -> full k-mers annotated
    with (marker, left, right);
  * **pairwise (k1,k2) reduction** (``ReflexivDSDynamicKmerRuduction``):
      - pass A, right-end variant adjustment
        (``LeftLongerKmerVariantAdjustment``, active rules at
        ``:1970-1983,2063-2076``): group rows on the k1-1 bases ending one
        before the last base; a k2-mer whose group holds a k1-mer inherits
        right-extendability (right := -1 when the k1-mer's right < 0) and the
        k1-mer's final-base variant;
      - pass B, left-end mirror + neutralization
        (``RightLongerKmerVariantAdjustmentAndNeutralization``): group on
        bases [1, k1); longs inherit left-extendability and the first-base
        variant; k1-mers whose first base matches a group k2-mer are dropped
        (they are now a prefix of that k2-mer);
      - pass C, prefix subsumption (``ShorterKmerNeutralization``, active
        block at ``:2661-2692``): after a full lexicographic sort, a shorter
        k-mer that is a prefix of its successor longer k-mer is dropped.
    Both strands are present throughout, so prefix rules cover suffix
    containment via the reverse complement.
  * **mixed-k extension** (``ReflexivDSDynamicKmerIteration``): records carry
    their own sub-kmer length (k_class - 1); groups form on the k_min-1 bases
    at the marker end; a reflected record merges with a forward record iff
    the reflected sub-kmer is a prefix of the forward one
    (``dynamicSubKmerComparator``, ``:740-768``; merge direction gate at
    ``:551-555``), with the extraLength-adjusted blocked-distance gate of
    ``:556-575`` and attr propagation of the dynamic ``reflexivExtend``.
  * **fixing** (``ReflexivDSDynamicKmerFixing``, simplified): contigs re-enter
    extension keyed on fixed 31-mer ends; only unique end-overlap pairs join.
  * **dedup** (``ReflexivDSDynamicKmerDedup``): containment removal over both
    strands (host-side exact substring containment; the reference seeds with
    shared marker k-mers then verifies).

Deviations from the reference are deliberate, order-independent
strengthenings of its scan-order-dependent sliding-window rules; each is
noted inline.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import count as count_mod
from .bitpack import mix32, pack_bases
from .graph import build_initial_records
from .params import Params
from .records import next_pow2

log = logging.getLogger("reflexiv_tpu")


class DynRecords(NamedTuple):
    """Mixed-k record set: each row knows its own sub-kmer length."""

    seq: jnp.ndarray     # (N, L) uint8
    length: jnp.ndarray  # (N,) int32
    subk: jnp.ndarray    # (N,) int32 — sub-kmer (join overlap) length
    left: jnp.ndarray    # (N,) int32
    right: jnp.ndarray   # (N,) int32
    live: jnp.ndarray    # (N,) bool

    @property
    def capacity(self) -> int:
        return self.seq.shape[0]

    @property
    def seq_capacity(self) -> int:
        return self.seq.shape[1]


def _segments_from_keys(keys: jnp.ndarray, live: jnp.ndarray,
                        tiebreak: jnp.ndarray = None):
    """Sort rows by packed keys; return (order, seg_id, sorted arrays helper).

    ``tiebreak`` (e.g. the orientation marker) orders rows WITHIN a segment
    without affecting segment identity — the extension rounds sort markers
    so the forward partner sits at the segment start (enabling the
    gather-free segmented-fill join on TPU)."""
    Wp = keys.shape[1]
    keyed = jnp.where(live[:, None], keys, jnp.uint32(0xFFFFFFFF))
    tb = () if tiebreak is None else (tiebreak,)
    order = jnp.lexsort(
        tb + tuple(keyed[:, i] for i in range(Wp - 1, -1, -1)))
    skey = keyed[order]
    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1)
    is_start = is_start.at[0].set(True)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    return order, seg


def _gather_window(seq: jnp.ndarray, start: jnp.ndarray, width: int):
    """(N, width) window of each row starting at per-row ``start`` (clipped)."""
    L = seq.shape[1]
    idx = jnp.clip(
        start[:, None] + jnp.arange(width, dtype=jnp.int32)[None, :], 0, L - 1
    )
    return jnp.take_along_axis(seq, idx, axis=1)


# chunked counting kicks in past this many k-mer windows per pass: bounds a
# pass's sort buffers to ~2 GB (N x (W+1) uint32) regardless of input size
STREAM_WINDOW_LIMIT = 1 << 27


def count_kmers_auto(bases, lengths, *, k, min_cov, max_cov,
                     front_clip=0, end_clip=0, partitions=0):
    """Single-pass counting when the window volume fits comfortably; chunked
    streaming (:func:`reflexiv_tpu.count.count_kmers_streaming`) beyond.

    ``partitions`` > 0 (the ``-partition`` flag, the reference's
    ``repartition(n)`` memory-granularity control) forces streaming in that
    many row chunks regardless of volume."""
    R, L = bases.shape
    n_windows = R * max(L - k + 1, 0)
    if partitions <= 1 and n_windows <= STREAM_WINDOW_LIMIT:
        return count_mod.count_kmers(
            bases, lengths, k=k, min_cov=min_cov, max_cov=max_cov,
            front_clip=front_clip, end_clip=end_clip,
        )
    rows = max(1, STREAM_WINDOW_LIMIT // max(L - k + 1, 1))
    if partitions > 1:
        rows = min(rows, -(-R // partitions))

    def chunks():
        for lo in range(0, R, rows):
            yield bases[lo:lo + rows], lengths[lo:lo + rows]

    return count_mod.count_kmers_streaming(
        chunks(), k=k, min_cov=min_cov, max_cov=max_cov,
        front_clip=front_clip, end_clip=end_clip,
    )


# ---------------------------------------------------------------------------
# per-k sorting stage
# ---------------------------------------------------------------------------

def sort_k_records(
    kmer_limbs: np.ndarray, counts: np.ndarray, k: int, params: Params
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Counted k-mers -> (bases (M,k), left (M,), right (M,)) survivors.

    The TPU analog of ``ReflexivDSKmerLeftAndRightSorting.assemblyFromKmer``
    (``:105-243``): fork-filter both directions, keep the annotated full
    k-mer set (both strands).
    """
    recs, _marker = build_initial_records(
        jnp.asarray(kmer_limbs), jnp.asarray(counts), k=k,
        min_error=params.min_error_for_k(k), bubble=params.bubble,
    )
    live = np.asarray(recs.live)
    bases = np.asarray(recs.seq)[live][:, :k]
    return bases, np.asarray(recs.left)[live], np.asarray(recs.right)[live]


def sort_k_records_sharded(
    bases_p: jnp.ndarray, lens_p: jnp.ndarray, k: int, params: Params, mesh,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mesh-sharded counting + fork filtering for one k: the window-scale
    work never reaches the host; only the compacted record set does.
    ``bases_p``/``lens_p`` must already be padded to a mesh-divisible row
    count."""
    from .parallel import (build_initial_records_sharded,
                           compact_records_sharded, count_kmers_sharded)
    from .records import next_pow2

    limbs, counts, keep, ovf = count_kmers_sharded(
        bases_p, lens_p, k=k, min_cov=params.min_kmer_coverage,
        max_cov=params.max_kmer_coverage, mesh=mesh,
    )
    assert int(jnp.sum(ovf)) == 0, "counting bucket overflow"
    seqg, leng, leftg, rightg, liveg, govf, shard_live = (
        build_initial_records_sharded(
            limbs, counts, keep, k=k,
            min_error=params.min_error_for_k(k), mesh=mesh,
            bubble=params.bubble,
        )
    )
    assert int(jnp.sum(govf)) == 0, "fork-filter bucket overflow"
    per_shard = max(next_pow2(int(np.asarray(shard_live).max()) or 1) * 2, 16)
    seqc, lenc, leftc, rightc, livec, lost = compact_records_sharded(
        seqg, leng, leftg, rightg, liveg,
        out_cap=per_shard, seq_cap=seqg.shape[1], mesh=mesh,
    )
    assert int(jnp.sum(lost)) == 0
    live = np.asarray(livec)
    return (np.asarray(seqc)[live][:, :k], np.asarray(leftc)[live],
            np.asarray(rightc)[live])


# ---------------------------------------------------------------------------
# pairwise reduction
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k1", "anchor"))
def _variant_pass_device(
    keys, length, attr, var, live, *, k1: int, anchor: str
):
    """One variant-adjustment pass (A: right end, B: left end + drop plan)
    over host-packed window keys.

    anchor='right': key = bases[len-k1 : len-1], variant base = last base.
    anchor='left' : key = bases[1 : k1],        variant base = first base.
    ``keys`` are the (N, W) uint32 2-bit-packed windows (host-sliced per
    row length, :func:`bitpack.pack_bases_np`); the byte pool itself never
    reaches the device — at campaign scale an (N, k2) uint8 device array
    pays a x128 minor-dim layout pad (measured 20+ GB HBM at 40.5M rows,
    the round-4 10 Mbp campaign's 41v53 OOM).

    Returns, in ORIGINAL row order: (new_attr, edit_mask, edit_val, drop).
    ``edit_mask``/``edit_val`` describe the variant-base write the host
    applies to its byte pool (at position len-1 / 0 for anchor right/left);
    ``drop`` is only populated for anchor='left'.
    """
    N = length.shape[0]
    order, seg = _segments_from_keys(keys, live)

    slen = length[order]
    sattr = attr[order]
    slive = live[order]
    svar = var[order]

    is_short = slive & (slen == k1)
    is_long = slive & (slen > k1)
    idx = jnp.arange(N, dtype=jnp.int32)

    # first short per group supplies the variant base and end-extendability
    first_short = jax.ops.segment_min(
        jnp.where(is_short, idx, N), seg, num_segments=N
    )[seg]
    has_short = first_short < N
    fs = jnp.minimum(first_short, N - 1)
    short_attr = sattr[fs]
    short_var = svar[fs]

    # longs inherit extendability when the short end is extendable
    resolves_fork = is_long & has_short & (short_attr < 0) & (sattr >= 0)
    new_attr = jnp.where(resolves_fork, -1, sattr)
    # longs inherit the short's variant base ONLY when the short resolves a
    # fork the long was blocked on — unconditional replacement (first
    # attempt) corrupted terminal bases with low-k error variants
    new_var = jnp.where(resolves_fork, short_var, svar)

    drop = jnp.zeros(N, dtype=bool)
    if anchor == "left":
        # drop shorts whose variant base matches any long's (adjusted) base
        onehot = (
            jnp.arange(4, dtype=jnp.int32)[None, :]
            == new_var[:, None].astype(jnp.int32)
        ) & is_long[:, None]
        long_bases = jax.ops.segment_max(
            onehot.astype(jnp.int32), seg, num_segments=N
        )[seg]
        # 4-way select instead of take_along_axis (the (N, 1, 1) index
        # layout pathology again)
        own = jnp.zeros(N, jnp.int32)
        for b in range(4):
            own = jnp.where(svar == b, long_bases[:, b], own)
        drop = is_short & (own > 0)

    inv = jnp.argsort(order)
    return new_attr[inv], resolves_fork[inv], new_var[inv], drop[inv]


@functools.partial(jax.jit, static_argnames=("k",))
def _subsume_pass_device(keys, length, live, *, k: int):
    """Pass C: prefix subsumption over full-k packed keys.

    Sort by (packed key, length); a live record is contained iff its sorted
    successor is live, longer, and agrees on the record's first ``len``
    bases (pad code 0 == 'A' sorts a short key immediately before any
    longer key sharing its prefix). The byte-matrix window compare of the
    original formulation becomes a masked limb compare: prefix of p bases
    == top 2p bits of the 2k-bit big-endian packed integer.
    """
    N, W = keys.shape
    T = 2 * k
    keyed = jnp.where(live[:, None], keys, jnp.uint32(0xFFFFFFFF))
    order = jnp.lexsort(
        (length,) + tuple(keyed[:, i] for i in range(W - 1, -1, -1)))
    slen = length[order]
    slive = live[order]
    skey = keyed[order]
    nxt_key = jnp.roll(skey, -1, axis=0)
    nxt_len = jnp.roll(slen, -1)
    nxt_live = jnp.roll(slive, -1)
    # successor starts with me iff keys agree on my top 2*len bits
    cut = T - 2 * slen                     # first kept bit index
    same = jnp.ones(N, dtype=bool)
    for i in range(W):
        lo = 32 * (W - 1 - i)              # limb i covers bits [lo, lo+32)
        c = jnp.clip(cut - lo, 0, 32)
        mask = jnp.where(
            c >= 32, jnp.uint32(0),
            jnp.left_shift(jnp.uint32(0xFFFFFFFF),
                           jnp.minimum(c, 31).astype(jnp.uint32)))
        same = same & (((skey[:, i] ^ nxt_key[:, i]) & mask) == 0)
    contained = slive & nxt_live & (nxt_len > slen) & same
    new_live = slive & ~contained
    inv = jnp.argsort(order)
    return new_live[inv]


def reduce_k_pair(
    shorts: Tuple[np.ndarray, np.ndarray, np.ndarray],
    longs: Tuple[np.ndarray, np.ndarray, np.ndarray],
    k1: int,
    k2: int,
) -> Tuple[Tuple[np.ndarray, ...], Tuple[np.ndarray, ...]]:
    """Reduce (k1_sorted, k2_sorted) -> (k1_reduced, k2_adjusted).

    Each side is (bases, left, right). Mirrors the job flow of
    ``ReflexivDSDynamicKmerRuduction.assemblyFromKmer`` (``:143-287``).

    Host-orchestrated: the byte pool stays in host RAM; each pass uploads
    only packed window keys (W uint32 limbs/row) + per-row scalars, and the
    inter-pass variant-base writes are applied to the numpy pool between
    dispatches. Sorting/segmenting runs on the device.
    """
    from .bitpack import pack_bases_np

    b1, l1, r1 = shorts
    b2, l2, r2 = longs
    n1, n2 = len(b1), len(b2)
    N, L = n1 + n2, k2
    width = k1 - 1
    seq = np.zeros((N, L), dtype=np.uint8)
    seq[:n1, :k1] = b1
    seq[n1:, :k2] = b2
    length = np.concatenate(
        [np.full(n1, k1, np.int32), np.full(n2, k2, np.int32)])
    left = np.concatenate([l1, l2]).astype(np.int32)
    right = np.concatenate([r1, r2]).astype(np.int32)
    live = np.ones(N, dtype=bool)
    len_d = jnp.asarray(length)
    live_d = jnp.asarray(live)

    # pass A: right-end variant adjustment
    # short key: bases [0, k1-1); long key: bases [L-k1, L-1)
    win = np.empty((N, width), np.uint8)
    win[:n1] = seq[:n1, :width]
    win[n1:] = seq[n1:, L - k1: L - 1]
    var = np.concatenate([seq[:n1, k1 - 1], seq[n1:, L - 1]])
    new_right, edit, edit_val, _ = _variant_pass_device(
        jnp.asarray(pack_bases_np(win, width)), len_d, jnp.asarray(right),
        jnp.asarray(var), live_d, k1=k1, anchor="right")
    right = np.asarray(new_right)
    rows = np.nonzero(np.asarray(edit))[0]
    seq[rows, length[rows] - 1] = np.asarray(edit_val)[rows]
    del new_right, edit, edit_val

    # pass B: left-end variant adjustment + matching-short drop
    new_left, edit, edit_val, dropB = _variant_pass_device(
        jnp.asarray(pack_bases_np(seq[:, 1:k1], width)), len_d,
        jnp.asarray(left), jnp.asarray(seq[:, 0]), live_d,
        k1=k1, anchor="left")
    left = np.asarray(new_left)
    rows = np.nonzero(np.asarray(edit))[0]
    seq[rows, 0] = np.asarray(edit_val)[rows]
    live &= ~np.asarray(dropB)
    del new_left, edit, edit_val, dropB, live_d

    # pass C: prefix subsumption on the full k-mer (rows are 0-padded
    # beyond their length by construction; edits only touch in-length
    # positions)
    new_live = _subsume_pass_device(
        jnp.asarray(pack_bases_np(seq, k2)), len_d, jnp.asarray(live), k=k2)
    live = np.asarray(new_live)
    del new_live, len_d

    keep1 = live[:n1]
    shorts_out = (seq[:n1][keep1][:, :k1], left[:n1][keep1],
                  right[:n1][keep1])
    keep2 = live[n1:]
    longs_out = (seq[n1:][keep2][:, :k2], left[n1:][keep2],
                 right[n1:][keep2])
    return shorts_out, longs_out


# ---------------------------------------------------------------------------
# mixed-k extension
# ---------------------------------------------------------------------------

def _draw_markers_dyn(recs: DynRecords, round_seed: int) -> jnp.ndarray:
    n16 = min(16, recs.seq_capacity)
    head = pack_bases(recs.seq[:, :n16], n16)[:, 0]
    tail = pack_bases(
        _gather_window(recs.seq, jnp.maximum(recs.length - n16, 0), n16), n16
    )[:, 0]
    salt = jnp.asarray(round_seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    h = mix32(
        head ^ ((tail << 16) | (tail >> 16))
        ^ recs.length.astype(jnp.uint32)
        ^ salt
    )
    return jnp.where(recs.live, 1 + (h & 1).astype(jnp.int32), 0)


@functools.partial(
    jax.jit, static_argnames=("kmin", "unique_only")
)
def dyn_extension_round_with_markers(
    recs: DynRecords,
    marker: jnp.ndarray,
    *,
    kmin: int,
    kmax: int = 0,  # unused; kept for API stability
    unique_only: bool = False,
) -> DynRecords:
    """One mixed-k sort -> join round.

    ``unique_only=True`` additionally requires the group to contain exactly
    one forward and one reflected record (the fixing stage's safe-join rule).
    """
    N, L = recs.seq.shape
    gw = kmin - 1  # group key width

    key_start = jnp.where(marker == 1, 0, recs.length - recs.subk)
    keys = pack_bases(_gather_window(recs.seq, key_start, gw), gw)
    # marker as tiebreak: fwd rows first within each segment — keeps this
    # byte oracle's row order identical to the packed round's marker-keyed
    # sort (and its TPU segmented-fill join)
    order, seg = _segments_from_keys(keys, recs.live, tiebreak=marker)

    sseq = recs.seq[order]
    slen = recs.length[order]
    ssub = recs.subk[order]
    sleft = recs.left[order]
    sright = recs.right[order]
    slive = recs.live[order]
    smarker = marker[order]

    idx = jnp.arange(N, dtype=jnp.int32)
    fwd_first = jax.ops.segment_min(
        jnp.where(slive & (smarker == 1), idx, N), seg, num_segments=N
    )[seg]
    refl_first = jax.ops.segment_min(
        jnp.where(slive & (smarker == 2), idx, N), seg, num_segments=N
    )[seg]
    has_pair = (fwd_first < N) & (refl_first < N)
    if unique_only:
        n_fwd = jax.ops.segment_sum(
            (slive & (smarker == 1)).astype(jnp.int32), seg, num_segments=N
        )[seg]
        n_refl = jax.ops.segment_sum(
            (slive & (smarker == 2)).astype(jnp.int32), seg, num_segments=N
        )[seg]
        has_pair = has_pair & (n_fwd == 1) & (n_refl == 1)

    f = jnp.minimum(fwd_first, N - 1)
    r = jnp.minimum(refl_first, N - 1)
    f_len, f_sub, f_left, f_right = slen[f], ssub[f], sleft[f], sright[f]
    r_len, r_sub, r_left, r_right = slen[r], ssub[r], sleft[r], sright[r]
    f_ext = f_len - f_sub
    r_ext = r_len - r_sub
    extra = f_sub - r_sub

    # dynamicSubKmerComparator: refl sub-kmer must be a prefix of fwd sub-kmer
    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    f_head = sseq[f]
    r_tail = _gather_window(sseq[r], r_len - r_sub, L)
    prefix_ok = jnp.all(
        jnp.where(col < r_sub[:, None], f_head == r_tail, True), axis=1
    ) & (r_sub <= f_sub)

    from .join_core import merge_gate

    gate = merge_gate(
        f_left, f_right, r_left, r_right, f_ext, r_ext, extra=extra
    )
    merge = has_pair & prefix_ok & gate.merge
    new_left, new_right = gate.new_left, gate.new_right

    new_len = r_len + f_len - r_sub
    from_r = col < r_len[:, None]
    f_src = jnp.clip(col - r_len[:, None] + r_sub[:, None], 0, L - 1)
    merged_seq = jnp.where(
        from_r, sseq[r], jnp.take_along_axis(sseq[f], f_src, axis=1)
    )

    i_am_fwd = merge & (idx == fwd_first)
    i_am_refl = merge & (idx == refl_first)

    out_seq = jnp.where(i_am_fwd[:, None], merged_seq, sseq)
    out_len = jnp.where(i_am_fwd, new_len, slen)
    out_sub = jnp.where(i_am_fwd, f_sub, ssub)
    out_left = jnp.where(i_am_fwd, new_left, sleft)
    out_right = jnp.where(i_am_fwd, new_right, sright)
    out_live = slive & ~i_am_refl
    return DynRecords(out_seq, out_len, out_sub, out_left, out_right, out_live)


def dyn_extension_round(recs, *, kmin, kmax, round_seed, unique_only=False):
    marker = _draw_markers_dyn(recs, round_seed)
    return dyn_extension_round_with_markers(
        recs, marker, kmin=kmin, kmax=kmax, unique_only=unique_only
    )


@functools.partial(jax.jit, static_argnames=("kmin", "unique_only"))
def dyn_extension_round_fused(
    recs: DynRecords, round_seed: jnp.ndarray, *,
    kmin: int, kmax: int, unique_only: bool = False,
):
    """Round + loop statistics in one compiled program (see
    ``extend.extension_round_fused``)."""
    marker = _draw_markers_dyn(recs, round_seed)
    out = dyn_extension_round_with_markers(
        recs, marker, kmin=kmin, kmax=kmax, unique_only=unique_only
    )
    live_n = jnp.sum(out.live)
    lens = jnp.where(out.live, out.length, 0)
    top2 = jax.lax.top_k(lens, 2)[0]
    need = top2[0] + top2[1]
    return out, live_n, need


def _compact_grow(
    recs: DynRecords, live_n: int, need_len: int
) -> DynRecords:
    """Host-side capacity management between rounds (quantized: compact only
    at quarter occupancy, grow in power-of-two jumps)."""
    cap_len = max(next_pow2(need_len), recs.seq_capacity)
    cap_rows = recs.capacity
    if live_n <= cap_rows // 4 and cap_rows > 64:
        cap_rows = max(next_pow2(live_n), 16)
    if cap_rows == recs.capacity and cap_len == recs.seq_capacity:
        return recs
    order = jnp.argsort(~recs.live, stable=True)
    take = order[:cap_rows]
    seq = recs.seq[take]
    if cap_len > seq.shape[1]:
        seq = jnp.pad(seq, ((0, 0), (0, cap_len - seq.shape[1])))
    return DynRecords(
        seq, recs.length[take], recs.subk[take],
        recs.left[take], recs.right[take], recs.live[take],
    )


def run_dyn_extension(
    recs, params: Params, *, kmin: int, kmax: int,
    seed: int = 0, unique_only: bool = False,
    max_rounds: Optional[int] = None, mesh=None,
    return_packed: bool = False, ckpt_dir: Optional[str] = None,
    return_groups: bool = False,
):
    """Iterate mixed-k rounds to fixpoint (cf. FirstFour + Iteration batches,
    ``Pipelines.java:856-952``).

    Runs on the 2-bit packed representation (:mod:`reflexiv_tpu.packed_dyn`)
    — 4x less HBM traffic per round than byte records; converts at the
    boundaries only. ``recs`` may be byte :class:`DynRecords` (device or
    host numpy arrays — host pools are packed blockwise on the host so the
    byte matrix never reaches HBM) or an already-packed
    :class:`~reflexiv_tpu.packed_dyn.PackedDynRecords`; ``return_packed``
    skips the final unpack (at scale the full-width byte matrix is exactly
    the transient that OOMs a chip). With ``mesh`` set, every round is a
    hash-routed ``all_to_all`` exchange + local join under ``shard_map``
    (:func:`reflexiv_tpu.parallel.pdyn_extension_round_sharded`).

    With ``ckpt_dir`` set, the loop state (packed pool + parked blocks +
    counters) is checkpointed every ``REFLEXIV_CKPT_EVERY_S`` seconds
    (default 300) and a later call with the same ``ckpt_dir`` resumes
    mid-loop — so a killed session loses minutes of the extension ladder,
    not the whole stage (the reference loses at most one Spark job the same
    way, ``Pipelines.java:613-830``).
    """
    import time as _time

    from . import checkpoint as ckpt_mod
    from . import packed_dyn as pd
    from .records import next_pow2 as _np2

    max_rounds = max_rounds or params.max_iterations
    ckpt_every = float(os.environ.get("REFLEXIV_CKPT_EVERY_S", "300"))
    last_ckpt = _time.time()

    state0 = ckpt_mod.load_loop_state(ckpt_dir) if ckpt_dir else None
    saved_cap = None
    in_groups = None
    if state0 is not None:
        p_host, parked0, st = state0
        # device pool built lazily: an over-HBM-scale pool must stay on
        # the host for the bucketed big-pool phase below. p_host may be a
        # width-class group list (ragged indexed-loop checkpoints).
        p = None
        max_sub = st["max_sub"]
        it0 = st["it"] + 1
        stable, prev, need = st["stable"], st["prev"], st["need"]
        saved_cap = st.get("cap")
        log.info("extension loop: resuming at round %d (%d live rows)",
                 it0, prev)
    else:
        parked0 = []
        p_host = None
        if isinstance(recs, list):
            # width-class group input (ragged stage handoff): stays host-
            # resident; only the indexed loop or a one-time dense
            # materialization below consumes it
            in_groups = recs
            p = None
            max_sub = max(
                [int(g[2].max()) for g in in_groups if len(g[2])] or [1])
            it0, stable = 1, 0
            prev = sum(len(g[1]) for g in in_groups)
            need = 2 * max(
                [int(g[1].max()) for g in in_groups if len(g[1])] or [16])
        elif isinstance(recs, pd.PackedDynRecords):
            p = recs
        elif isinstance(recs.seq, np.ndarray):
            p = pd.from_dyn_host(recs)
        else:
            p = pd.from_dyn(recs)
        if p is not None:
            max_sub = int(jnp.max(jnp.where(p.live, p.subk, 1)))
            it0, stable = 1, 0
            prev = int(jnp.sum(p.live))
            need = int(jnp.max(jnp.where(p.live, p.length, 0))) * 2

    def _loop_ckpt(pool, parked, it, extra=None):
        nonlocal last_ckpt
        if not ckpt_dir or _time.time() - last_ckpt < ckpt_every:
            return
        if callable(pool):   # lazy: ragged pools materialize groups only
            pool = pool()    # when the throttle actually fires
        state = {"it": it, "stable": stable, "prev": prev, "need": need,
                 "max_sub": max_sub}
        if extra:
            state.update(extra)
        ckpt_mod.save_loop_state(ckpt_dir, pool, parked, state)
        last_ckpt = _time.time()

    def _finish(pool, parked):
        # NOTE: the in-loop checkpoint dir is deliberately NOT cleared here
        # — the caller clears it after persisting the stage result, so a
        # death between loop end and stage save still has a resume point
        # (re-entering a completed loop replays only the post-checkpoint
        # rounds, deterministically).
        if return_groups:
            live = np.asarray(pool.live)
            idx = np.nonzero(live)[0]
            g = _RaggedPool.from_dense((
                np.asarray(pool.seq)[idx], np.asarray(pool.length)[idx],
                np.asarray(pool.subk)[idx], np.asarray(pool.left)[idx],
                np.asarray(pool.right)[idx])).to_groups()
            return g + list(parked)
        if parked:
            pool = pd.merge_parked_pdyn(pool, parked)
        return pool if return_packed else pd.to_dyn(pool)

    if mesh is not None:
        from .parallel import pdyn_extension_round_sharded

        if p is None:
            p = pd.PackedDynRecords(*(jnp.asarray(a) for a in p_host))
        n_dev = mesh.devices.size
        # floor the pool so per-destination buckets survive key skew even
        # when only a handful of records remain (fixing stage)
        cap = saved_cap or max(_np2(prev) * 2, 64 * n_dev)
        cap = ((cap + n_dev - 1) // n_dev) * n_dev
        p = _pad_pdyn(p, cap)
        parked_m: list = list(parked0)
        it = it0
        while it <= max_rounds:
            if need > p.base_capacity:
                from .packed import limbs_for

                pad = _np2(limbs_for(need)) - p.limb_capacity
                if pad > 0:
                    p = p._replace(seq=jnp.pad(p.seq, ((0, 0), (0, pad))))
            p_next, ovf = pdyn_extension_round_sharded(
                p, jnp.uint32(seed + it), kmin=kmin, max_sub=max_sub,
                mesh=mesh, cap_factor=4, unique_only=unique_only,
            )
            if int(jnp.sum(ovf)) != 0:
                # bucket overflow (pathological key skew): the round dropped
                # rows, so discard it and retry at double capacity — the
                # analog of the reference's repartition escape hatch
                cap *= 2
                log.info("dyn round %d overflowed; repadding to %d", it, cap)
                p = _pad_pdyn(p, cap)
                continue
            p = p_next
            n = int(jnp.sum(p.live))
            need = int(jnp.max(jnp.where(p.live, p.length, 0))) * 2
            if n == prev:
                stable += 1
            else:
                stable, prev = 0, n
            # exact stop: no live record has a potential partner left (see
            # assembler._run_extension_loop_packed); the global census runs
            # only on stable rounds so its gather cost is rare
            if stable >= 3 and stable % 3 == 0:
                fin = int(jnp.sum(pd.finished_mask_pdyn_exact(p, max_sub)))
                if fin == n:
                    break
            if it >= params.min_iterations and stable >= 12:
                break
            # park finished records off the per-round exchange volume and
            # recompact the pool to the surviving row count (the sharded
            # analog of the single-chip parking below)
            if it % 8 == 0 and it >= 8:
                fin = np.asarray(pd.finished_mask_pdyn_exact(p, max_sub))
                n_fin = int(fin.sum())
                if n_fin > max(32, p.capacity // 8):
                    p = pd.park_finished_pdyn(p, fin, parked_m)
                    prev = n - n_fin
                    cap = max(_np2(max(prev, 1)) * 2, 64 * n_dev)
                    cap = ((cap + n_dev - 1) // n_dev) * n_dev
                    p = _pad_pdyn(p, cap)
            _loop_ckpt(p, parked_m, it, {"cap": cap})
            it += 1
        return _finish(p, parked_m)

    parked: list = list(parked0)

    # ---- host-routed bucketed big-pool phase ----------------------------
    # A pool past ~16M rows makes the monolithic fused-round program large
    # enough to kill the TPU compile service (observed: SIGKILL'd
    # tpu_compile_helper at 128M-row capacity, round-4 10 Mbp campaign).
    # While the pool is over the threshold, each round is routed through
    # hash buckets of the round's group key: partners always share the
    # (kmin-1)-base window key, so equal-hash bucketing preserves the join
    # exactly, and every bucket runs the SAME fixed-capacity compiled
    # round. The pool lives in host RAM between rounds; the device only
    # ever sees one bucket slab. (The reference leans on Spark's shuffle
    # for the same reason — the full sort never sits on one executor,
    # ``Pipelines.java:877-974``.)
    # threshold for leaving the bucketed phase = the largest monolithic
    # round program the backend's compiler survives. On the remote-TPU
    # tunnel the chipless AOT compile helper SIGKILLs well below HBM
    # capacity (observed at 2^24 rows, round 5), so the TPU default stays
    # at the 2M scale the round programs are proven at; CPU/dryrun keeps
    # the wider threshold.
    on_tpu = jax.devices()[0].platform == "tpu"
    bucket_rows = int(os.environ.get(
        "REFLEXIV_BUCKET_ROUND_ROWS", str((2 << 20) if on_tpu else
                                          (12 << 20))))
    # On TPU, the indexed host loop is the default at EVERY pool size (not
    # just over-threshold): the monolithic device loop recompiles at each
    # limb-width doubling as records grow, and on the remote-AOT tunnel
    # one such compile stalled 25+ minutes (round-5 campaign) — the
    # fixed-width indexed program never recompiles. CPU keeps the device
    # pool loop (compiles are cheap there and tests pin both paths).
    indexed_always = os.environ.get(
        "REFLEXIV_INDEXED_ALWAYS", "1" if on_tpu else "0") != "0"
    it0_dev = it0
    hp = None
    rp = None
    if prev > bucket_rows or indexed_always or in_groups is not None:
        # indexed mode (default): the device sorts fixed-width summaries
        # and returns merge instructions; the pool bytes never leave host
        # RAM (ragged: dense matrix + overflow rows, ~2x total bases).
        # One compiled program serves every round — the legacy mode
        # re-compiles (and re-uploads) at every limb-width doubling, which
        # stalled the round-5 campaign for tens of minutes per growth step
        # on the remote-AOT tunnel.
        indexed = os.environ.get("REFLEXIV_INDEXED_ROUNDS", "1") != "0"
        if p is None and isinstance(p_host, list):
            src_groups, src = p_host, None
        elif p is None and p_host is not None:
            live_h = np.asarray(p_host[5])
            idxh = np.nonzero(live_h)[0]
            src = tuple(np.asarray(a)[idxh] for a in p_host[:5])
            src_groups = None
        elif p is None:
            src_groups, src = in_groups or [], None
        else:
            live_h = np.asarray(p.live)
            idxh = np.nonzero(live_h)[0]
            src = (np.asarray(p.seq)[idxh], np.asarray(p.length)[idxh],
                   np.asarray(p.subk)[idxh], np.asarray(p.left)[idxh],
                   np.asarray(p.right)[idxh])
            src_groups = None
            p = None
        if indexed:
            rp = (_RaggedPool.from_groups(src_groups)
                  if src_groups is not None
                  else _RaggedPool.from_dense(src))
            summ = _summaries_ragged(rp, max_sub)
        else:
            hp = (_groups_to_dense(src_groups)
                  if src_groups is not None else src)
            summ = None
        del src_groups, src
        for it in range(it0_dev, max_rounds + 1):
            if indexed:
                rp, summ, n, need = _pdyn_round_indexed_host(
                    rp, summ, seed + it, kmin=kmin, max_sub=max_sub,
                    unique_only=unique_only, need=need)
            else:
                hp, n, need = _pdyn_round_bucketed_host(
                    hp, seed + it, kmin=kmin, max_sub=max_sub,
                    unique_only=unique_only, need=need)
            if n == prev:
                stable += 1
            else:
                stable, prev = 0, n
            log.info("bucketed round %d: %d live rows", it, n)
            it0_dev = it + 1
            # exact host census: park finished rows off the per-round slab
            # volume every 4 rounds and on any stable round — the over-HBM
            # analog of the device loop's parking (each bucketed round
            # re-uploads every live row, so shrinking the pool here pays at
            # precisely the scale where rounds are most expensive; the
            # reference shrinks its shuffle the same way via per-stage
            # partition decay, ``Pipelines.java:877-974``). n_buckets is
            # recomputed per round, so it decays with the pool.
            if n and (it % 4 == 3 or stable >= 1):
                if indexed:
                    fin = _finished_mask_from_summ(summ, rp.subk, max_sub)
                else:
                    fin = _finished_mask_host_exact(hp, max_sub)
                nf = int(fin.sum())
                if nf == n:
                    # exact early stop: nothing left can ever merge
                    if indexed:
                        parked.extend(
                            rp.select(np.nonzero(fin)[0]).to_groups())
                        rp = _RaggedPool.from_groups([])
                        summ = tuple(a[:0] for a in summ)
                    else:
                        _park_host_rows(hp, fin, parked)
                        hp = tuple(a[:0] for a in hp)
                    prev = n = 0
                    it0_dev = max_rounds + 1
                    log.info("bucketed census: all %d rows finished", nf)
                elif nf > max(32, n // 16):
                    keep = ~fin
                    if indexed:
                        parked.extend(
                            rp.select(np.nonzero(fin)[0]).to_groups())
                        rp = rp.select(np.nonzero(keep)[0])
                        summ = tuple(a[keep] for a in summ)
                    else:
                        _park_host_rows(hp, fin, parked)
                        hp = tuple(a[keep] for a in hp)
                    prev = n = n - nf
                    log.info("bucketed census: parked %d, %d live", nf, n)
            _loop_ckpt(
                (rp.to_groups if indexed else
                 pd.PackedDynRecords(*hp, np.ones(len(hp[1]), bool))),
                parked, it)
            if prev <= bucket_rows and not indexed_always:
                break
            if it >= params.min_iterations and stable >= 12:
                # fixpoint: skip the device loop (under indexed_always it
                # is never wanted; over-threshold its monolithic round
                # would not compile) and finish from the host pool
                it0_dev = max_rounds + 1
                break
        if indexed_always or indexed:
            # the indexed loop ran to its own stop — never hand the pool
            # to the monolithic device loop (each limb-width growth there
            # is a fresh multi-minute remote compile); a non-always run
            # that exited under-threshold continues below only in legacy
            # mode
            if indexed_always:
                it0_dev = max_rounds + 1
        if indexed and rp is not None and it0_dev > max_rounds:
            if return_groups:
                return rp.to_groups() + list(parked)
            hp = _groups_to_dense(rp.to_groups())
            rp = None
        elif indexed and rp is not None:
            # under-threshold handoff to the device loop (CPU / legacy
            # thresholds): materialize once
            hp = _groups_to_dense(rp.to_groups())
            rp = None
    if p is None:
        if hp is not None:
            n_h = len(hp[1])
            cap0 = max(_np2(max(n_h, 1)), 16)
            p = _pad_pdyn(pd.PackedDynRecords(
                *hp, np.ones(n_h, bool)), cap0)
            hp = None
        elif isinstance(p_host, list) or in_groups is not None:
            hp_m = _groups_to_dense(
                p_host if isinstance(p_host, list) else in_groups)
            p = _pad_pdyn(pd.PackedDynRecords(
                *hp_m, np.ones(len(hp_m[1]), bool)),
                max(_np2(max(len(hp_m[1]), 1)), 16))
        else:
            p = pd.PackedDynRecords(*(jnp.asarray(a) for a in p_host))
            p = _pad_pdyn(p, max(_np2(p.capacity), 16))

    for it in range(it0_dev, max_rounds + 1):
        p = pd.compact_grow_pdyn(p, prev, need)
        p, live_n, need_arr = pd.pdyn_extension_round_fused(
            p, jnp.uint32(seed + it), kmin=kmin, max_sub=max_sub,
            unique_only=unique_only,
        )
        n = int(live_n)
        need = int(need_arr)
        if n == prev:
            stable += 1
        else:
            stable, prev = 0, n
        # exact stop (see assembler._run_extension_loop_packed)
        if stable >= 3 and stable % 3 == 0:
            fin_n = int(jnp.sum(pd.finished_mask_pdyn_exact(p, max_sub)))
            if fin_n == n:
                break
        if it >= params.min_iterations and stable >= 12:
            break
        # park finished records off the per-round sort volume (variable-
        # width interval census; the mixed-k analog of the single-k
        # extendability prefilter)
        if it % 8 == 0 and it >= 8:
            fin = np.asarray(pd.finished_mask_pdyn_exact(p, max_sub))
            n_fin = int(fin.sum())
            if n_fin > max(32, p.capacity // 8):
                p = pd.park_finished_pdyn(p, fin, parked)
                prev = n - n_fin
        _loop_ckpt(p, parked, it)
    return _finish(p, parked)


def _pad_pdyn(p, cap_rows: int):
    """Live rows first into a fresh pool of ``cap_rows`` (mesh-divisible)."""
    from . import packed_dyn as pd

    live = np.asarray(p.live)
    idx = np.nonzero(live)[0]
    n = len(idx)
    assert n <= cap_rows, f"{n} live rows exceed capacity {cap_rows}"
    seq = np.zeros((cap_rows, p.limb_capacity), np.uint32)
    seq[:n] = np.asarray(p.seq)[idx]
    length = np.zeros(cap_rows, np.int32)
    length[:n] = np.asarray(p.length)[idx]
    subk = np.ones(cap_rows, np.int32)
    subk[:n] = np.asarray(p.subk)[idx]
    left = np.zeros(cap_rows, np.int32)
    left[:n] = np.asarray(p.left)[idx]
    right = np.zeros(cap_rows, np.int32)
    right[:n] = np.asarray(p.right)[idx]
    new_live = np.zeros(cap_rows, bool)
    new_live[:n] = True
    return pd.PackedDynRecords(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(subk),
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(new_live),
    )


def _pdyn_round_bucketed_host(
    hp, round_seed: int, *, kmin: int, max_sub: int, unique_only: bool,
    need: int,
):
    """One mixed-k extension round over a host-resident pool, routed
    through group-key-hash buckets so the device only ever runs the
    fixed-capacity fused round program.

    ``hp`` is the all-live host pool ``(seq (N, LW) u32, length, subk,
    left, right)``. Every bucket slab reuses ONE compiled program
    (capacity ``REFLEXIV_BUCKET_CAP``, default 2^24 — the scale the
    round-3 on-chip sorts are proven at); a forward record and its
    reflected partner extract the same (kmin-1)-base window as their sort
    key, so equal-hash routing keeps all joinable pairs in one bucket and
    the union of bucket rounds equals the monolithic round up to row
    order (orientation draws hash row CONTENT, not position). Returns
    ``(new_hp, live_n, need)``.
    """
    from . import packed_dyn as pd
    from .packed import limbs_for
    from .records import next_pow2

    seq, length, subk, left, right = hp
    N = len(length)
    # default bucket capacity 2^21: the remote compile helper SIGKILLs on
    # the fused mixed-k round program at 2^24 rows (observed round 5, 10
    # Mbp campaign — the compile-service memory wall scales with program
    # capacity, and 2^24 was only ever proven for bare sorts); 1M-row
    # rounds are measured on-chip (TPU_SESSION2), 2M keeps bucket count
    # reasonable while staying near proven scale
    cap = int(os.environ.get("REFLEXIV_BUCKET_CAP", str(1 << 21)))

    # limb growth for this round's merges (mirrors compact_grow_pdyn)
    need_limbs = next_pow2(limbs_for(max(need, 16)))
    LW = seq.shape[1]
    if need_limbs > LW:
        seq = np.pad(seq, ((0, 0), (0, need_limbs - LW)))
        LW = need_limbs

    # pass 1: 32-bit group-key hash per row, slab-wise
    h = np.empty(N, np.uint32)
    for lo in range(0, N, cap):
        hi = min(lo + cap, N)
        n = hi - lo
        seq_s = np.zeros((cap, LW), np.uint32)
        seq_s[:n] = seq[lo:hi]
        len_s = np.zeros(cap, np.int32)
        len_s[:n] = length[lo:hi]
        sub_s = np.ones(cap, np.int32)
        sub_s[:n] = subk[lo:hi]
        live_s = np.zeros(cap, bool)
        live_s[:n] = True
        h[lo:hi] = np.asarray(pd.bucket_hash_pdyn(
            jnp.asarray(seq_s), jnp.asarray(len_s), jnp.asarray(sub_s),
            jnp.asarray(live_s), jnp.uint32(round_seed), kmin=kmin))[:n]

    # bucket count: smallest power of two with every bucket under 3/4 cap
    # (exact occupancy is known up front, so overflow never needs a retry).
    # Doubling is BOUNDED: once n_buckets reaches next_pow2(N), any bucket
    # still over cap is pure equal-hash skew (e.g. >cap rows sharing one
    # repeat (kmin-1)-base window — equal keys hash identically at every
    # width, so no split can ever separate them); those buckets get a
    # one-off larger compiled program below instead of spinning here.
    n_buckets = max(1, next_pow2(-(-N // (cap * 3 // 4))))
    max_buckets = max(n_buckets, next_pow2(max(N, 1)))
    while True:
        ids = h & np.uint32(n_buckets - 1)
        counts = np.bincount(ids, minlength=n_buckets)
        if int(counts.max()) <= cap or n_buckets >= max_buckets:
            break
        n_buckets *= 2
    order = np.argsort(ids, kind="stable")
    bounds = np.concatenate([[0], np.cumsum(counts)])
    cap_max = int(os.environ.get("REFLEXIV_BUCKET_CAP_MAX", str(1 << 26)))

    def built_slabs():
        """Host-side slab packing per bucket — pure numpy, so it can run in
        the ingest prefetch thread while the device chews the previous
        bucket."""
        for b in range(n_buckets):
            rows = order[bounds[b]:bounds[b + 1]]
            n = len(rows)
            if n == 0:
                continue
            bcap = cap if n <= cap else next_pow2(n)
            if bcap > cap_max:
                raise RuntimeError(
                    f"bucketed extension round: {n} rows share one "
                    f"group-key hash bucket (> REFLEXIV_BUCKET_CAP_MAX="
                    f"{cap_max}) — extreme repeat skew; raise "
                    "REFLEXIV_BUCKET_CAP_MAX if the device can hold a "
                    "larger round program")
            if bcap > cap:
                log.warning(
                    "bucket %d holds %d equal-hash rows (> cap %d); "
                    "running a one-off %d-row round program", b, n, cap,
                    bcap)
            seq_s = np.zeros((bcap, LW), np.uint32)
            seq_s[:n] = seq[rows]
            len_s = np.zeros(bcap, np.int32)
            len_s[:n] = length[rows]
            sub_s = np.ones(bcap, np.int32)
            sub_s[:n] = subk[rows]
            left_s = np.zeros(bcap, np.int32)
            left_s[:n] = left[rows]
            right_s = np.zeros(bcap, np.int32)
            right_s[:n] = right[rows]
            live_s = np.zeros(bcap, bool)
            live_s[:n] = True
            yield (seq_s, len_s, sub_s, left_s, right_s, live_s)

    parts = []
    total_live = 0
    top = np.zeros(2, np.int64)    # two longest live records, pool-wide

    def collect(out):
        nonlocal total_live, top
        olive = np.asarray(out.live)
        keep = np.nonzero(olive)[0]
        part = (np.asarray(out.seq)[keep], np.asarray(out.length)[keep],
                np.asarray(out.subk)[keep], np.asarray(out.left)[keep],
                np.asarray(out.right)[keep])
        parts.append(part)
        total_live += len(keep)
        if len(keep):
            t = np.sort(np.partition(part[1], -min(2, len(keep)))[-2:])
            top = np.sort(np.concatenate([top, t.astype(np.int64)]))[-2:]

    # three-way pipeline over the tunnel: the prefetch thread packs bucket
    # b+1 while the device runs bucket b, and bucket b-1's result is
    # fetched only after bucket b is enqueued (the device executes in
    # order, so the deferred fetch overlaps b's compute with b-1's
    # download instead of serializing upload->compute->download per
    # bucket).
    slab_iter = built_slabs()
    if os.environ.get("REFLEXIV_PREFETCH", "1") != "0":
        slab_iter = count_mod._PrefetchedChunks(slab_iter)
    pending = None
    for arrs in slab_iter:
        slab = pd.PackedDynRecords(*(jnp.asarray(a) for a in arrs))
        out, _live_n, _need = pd.pdyn_extension_round_fused(
            slab, jnp.uint32(round_seed), kmin=kmin, max_sub=max_sub,
            unique_only=unique_only)
        if pending is not None:
            collect(pending)
        del slab
        pending = out
    if pending is not None:
        collect(pending)

    if not parts:
        empty = (np.zeros((0, LW), np.uint32),) + tuple(
            np.zeros(0, np.int32) for _ in range(4))
        return empty, 0, int(need)
    new_hp = tuple(np.concatenate([p_[i] for p_ in parts])
                   for i in range(5))
    need_out = int(top[0] + top[1])
    return new_hp, total_live, need_out


def _groups_to_dense(groups):
    """One-time dense materialization of width-class groups — ONLY for
    small pools (tests, CPU handoff); campaign-scale pools stay grouped."""
    if not groups:
        z = np.zeros(0, np.int32)
        return (np.zeros((0, 1), np.uint32), z, z, z, z)
    total = sum(len(g[1]) for g in groups)
    W = max(g[0].shape[1] for g in groups)
    seq = np.zeros((total, W), np.uint32)
    length = np.empty(total, np.int32)
    subk = np.empty(total, np.int32)
    left = np.empty(total, np.int32)
    right = np.empty(total, np.int32)
    lo = 0
    for g in groups:
        n = len(g[1])
        seq[lo:lo + n, :g[0].shape[1]] = g[0]
        length[lo:lo + n] = g[1]
        subk[lo:lo + n] = g[2]
        left[lo:lo + n] = g[3]
        right[lo:lo + n] = g[4]
        lo += n
    return (seq, length, subk, left, right)


def _host_window(seq: np.ndarray, start: np.ndarray, width: int):
    """numpy mirror of :func:`packed.extract_window`: left-aligned packed
    window of ``width`` bases from per-row ``start`` over (N, LW) uint32
    limb rows (zeros past row data, exactly like the device funnel)."""
    from .packed import BASES_PER_LIMB, limbs_for

    N = seq.shape[0]
    W = limbs_for(width)
    padded = np.concatenate([seq, np.zeros((N, W + 1), np.uint32)], axis=1)
    rows = np.arange(N)
    q = start // BASES_PER_LIMB
    o = (2 * (start % BASES_PER_LIMB)).astype(np.uint32)
    out = np.empty((N, W), np.uint32)
    for j in range(W):
        a = padded[rows, q + j]
        b = padded[rows, q + j + 1]
        bs = b >> ((np.uint32(32) - o) & np.uint32(31))
        out[:, j] = np.where(o > 0, (a << o) | bs, a)
    rem = width - BASES_PER_LIMB * (W - 1)
    if rem < BASES_PER_LIMB:
        out[:, W - 1] &= np.uint32(0xFFFFFFFF) << (32 - 2 * rem)
    return out


def _mix32_np(x: np.ndarray) -> np.ndarray:
    """numpy mirror of :func:`bitpack.mix32` (murmur3 finalizer), exact to
    the bit so host-drawn markers equal device-drawn ones."""
    x = x.astype(np.uint64) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x85EBCA6B) & 0xFFFFFFFF
    x ^= x >> 13
    x = (x * 0xC2B2AE35) & 0xFFFFFFFF
    x ^= x >> 16
    return x.astype(np.uint32)


def _host_summaries(hp, max_sub: int):
    """Fixed-width per-row summaries for the indexed round: head/tail
    sub-kmer windows (``limbs_for(max_sub)`` limbs each) plus the
    first/last-16-base limbs the marker draw hashes (computed exactly like
    :func:`packed_dyn.draw_markers_pdyn` does)."""
    from .packed import BASES_PER_LIMB

    seq, length, subk = hp[0], hp[1], hp[2]
    N = seq.shape[0]
    start0 = np.zeros(N, np.int64)
    head = _host_window(seq, start0, max_sub)
    tailw = _host_window(
        seq, np.maximum(length.astype(np.int64) - subk, 0), max_sub)
    base_cap = seq.shape[1] * BASES_PER_LIMB
    n16 = min(16, base_cap)
    h16 = _host_window(seq, start0, n16)[:, 0]
    t16 = _host_window(
        seq, np.maximum(length.astype(np.int64) - n16, 0), n16)[:, 0]
    if n16 < BASES_PER_LIMB:
        h16 = h16 >> np.uint32(32 - 2 * n16)
        t16 = t16 >> np.uint32(32 - 2 * n16)
    return (head, tailw, h16, t16)


def _host_concat_packed(seq_a, len_a, seq_b, len_b, skip, out_limbs: int):
    """numpy mirror of :func:`packed.concat`: per-row ``a ++ b[skip:]`` on
    packed limb rows (same funnel construction; preserves the
    zero-beyond-length invariant). Returns (out (M, out_limbs), total)."""
    from .packed import BASES_PER_LIMB

    M = len(len_a)
    total = (len_a + len_b - skip).astype(np.int32)
    out = np.zeros((M, out_limbs), np.uint32)
    la = min(seq_a.shape[1], out_limbs)
    out[:, :la] = seq_a[:, :la]
    padded_b = np.concatenate(
        [seq_b, np.zeros((M, 2), np.uint32)], axis=1)
    LB = seq_b.shape[1]
    rows = np.arange(M)
    len_a64 = len_a.astype(np.int64)
    for m in range(out_limbs):
        base0 = m * BASES_PER_LIMB
        bpos = np.maximum(base0 - len_a64, 0) + skip
        q = np.minimum(bpos // BASES_PER_LIMB, LB)
        o = (2 * (bpos % BASES_PER_LIMB)).astype(np.uint32)
        a_ = padded_b[rows, q]
        b_ = padded_b[rows, q + 1]
        bs = b_ >> ((np.uint32(32) - o) & np.uint32(31))
        pb = np.where(o > 0, (a_ << o) | bs, a_)
        shift = (2 * np.clip(len_a64 - base0, 0, BASES_PER_LIMB)
                 ).astype(np.uint32)
        pb = np.where(shift >= 32, 0,
                      pb >> np.minimum(shift, np.uint32(31)))
        valid = np.clip(total.astype(np.int64) - base0, 0, BASES_PER_LIMB)
        mask = np.where(
            valid >= BASES_PER_LIMB, 0xFFFFFFFF,
            np.where(valid > 0,
                     (np.int64(0xFFFFFFFF) << (32 - 2 * valid)) & 0xFFFFFFFF,
                     0)).astype(np.uint32)
        out[:, m] = (out[:, m] | pb) & mask
    return out, total


class _RaggedPool:
    """Host-resident mixed-k pool for the indexed extension loop.

    Rows up to ``W_DENSE`` limbs live in one dense matrix; longer rows
    (the growing contigs — always a tiny fraction of the pool) live as
    individually trimmed overflow arrays. This bounds pool memory at ~2x
    total bases instead of rows x longest-row: the dense form hit 4.3 GB
    at 38k rows x 452 kb top contig in the round-5 campaign, doubling
    with every top-pair merge.
    """

    W_DENSE = 512   # limbs (= 8192 bases); class attr so tests can shrink

    def __init__(self, dense, length, subk, left, right, over):
        self.dense = dense          # (N, <=W_DENSE) uint32
        self.length = length
        self.subk = subk
        self.left = left
        self.right = right
        self.over = over            # {row: trimmed uint32 array}

    @property
    def n(self) -> int:
        return len(self.length)

    @classmethod
    def from_dense(cls, hp):
        from .packed import limbs_for

        seq, length, subk, left, right = hp
        wd = min(cls.W_DENSE, max(seq.shape[1], 1))
        over = {}
        long_rows = np.nonzero(length > wd * 16)[0]
        for i in long_rows:
            over[int(i)] = seq[i, :limbs_for(int(length[i]))].copy()
        return cls(np.ascontiguousarray(seq[:, :wd]),
                   length.astype(np.int32), subk.astype(np.int32),
                   left.astype(np.int32), right.astype(np.int32), over)

    @classmethod
    def from_groups(cls, groups):
        """Build from width-class group tuples
        ``[(seq, length, subk, left, right), ...]`` (the parked format)."""
        if not groups:
            z = np.zeros(0, np.int32)
            return cls(np.zeros((0, 1), np.uint32), z, z, z, z, {})
        total = sum(len(g[1]) for g in groups)
        wd = min(cls.W_DENSE, max(max(g[0].shape[1] for g in groups), 1))
        dense = np.zeros((total, wd), np.uint32)
        length = np.empty(total, np.int32)
        subk = np.empty(total, np.int32)
        left = np.empty(total, np.int32)
        right = np.empty(total, np.int32)
        over = {}
        lo = 0
        for g in groups:
            n = len(g[1])
            w = min(g[0].shape[1], wd)
            dense[lo:lo + n, :w] = g[0][:, :w]
            length[lo:lo + n] = g[1]
            subk[lo:lo + n] = g[2]
            left[lo:lo + n] = g[3]
            right[lo:lo + n] = g[4]
            if g[0].shape[1] > wd:
                from .packed import limbs_for

                for j in np.nonzero(g[1] > wd * 16)[0]:
                    over[lo + int(j)] = g[0][j, :limbs_for(int(g[1][j]))]\
                        .copy()
            lo += n
        return cls(dense, length, subk, left, right, over)

    def row_seq(self, i: int):
        from .packed import limbs_for

        arr = self.over.get(int(i))
        if arr is not None:
            return arr
        return self.dense[i, :limbs_for(int(self.length[i]))]

    def to_groups(self):
        """Width-class group tuples (the parked / checkpoint format):
        dense rows in pow2-width classes, overflow rows likewise."""
        from .packed import limbs_for
        from .records import next_pow2

        groups = []
        over_rows = np.zeros(self.n, bool)
        if self.over:
            over_rows[np.fromiter(self.over, int, len(self.over))] = True
        short_idx = np.nonzero(~over_rows)[0]
        if len(short_idx):
            lens = self.length[short_idx]
            cls_w = np.maximum(
                1, 2 ** np.ceil(np.log2(np.maximum(
                    (lens + 15) // 16, 1))).astype(np.int64))
            for w in np.unique(cls_w):
                sel = short_idx[cls_w == w]
                groups.append((
                    self.dense[sel][:, :min(int(w), self.dense.shape[1])]
                    .copy(),
                    self.length[sel].copy(), self.subk[sel].copy(),
                    self.left[sel].copy(), self.right[sel].copy()))
        if self.over:
            by_cls: dict = {}
            for i, arr in self.over.items():
                by_cls.setdefault(next_pow2(max(len(arr), 1)), []).append(i)
            for w, idxs in sorted(by_cls.items()):
                idxs = np.asarray(sorted(idxs))
                seq = np.zeros((len(idxs), w), np.uint32)
                for r, i in enumerate(idxs):
                    a = self.over[int(i)]
                    seq[r, :len(a)] = a
                groups.append((
                    seq, self.length[idxs].copy(), self.subk[idxs].copy(),
                    self.left[idxs].copy(), self.right[idxs].copy()))
        return groups

    def select(self, idx):
        """New pool holding rows ``idx`` (in that order)."""
        remap = {}
        for new_i, old_i in enumerate(idx):
            if int(old_i) in self.over:
                remap[new_i] = self.over[int(old_i)]
        return _RaggedPool(
            self.dense[idx], self.length[idx], self.subk[idx],
            self.left[idx], self.right[idx], remap)


def _pdyn_round_indexed_host(
    pool: "_RaggedPool", summ, round_seed: int, *, kmin: int, max_sub: int,
    unique_only: bool, need: int,
):
    """One mixed-k extension round with the pool bytes HOST-resident: the
    device only ever sees fixed-width summary slabs
    (:func:`packed_dyn.pdyn_round_indexed`), the host applies the merge
    splices in numpy. One compiled program serves every round regardless
    of record length; per-round transfer is ~(2*limbs_for(max_sub)+7)*4
    bytes/row instead of the full packed sequence. The pool is a
    :class:`_RaggedPool` (dense matrix for short rows + trimmed overflow
    arrays for long ones) so memory stays ~2x total bases even when the
    top contigs reach megabases.

    ``summ`` is ``(head, tailw, h16, t16)`` maintained incrementally
    (merged rows recomputed, others carried). Returns
    ``(pool', summ', live_n, need')``.
    """
    from . import count as count_mod
    from . import packed_dyn as pd
    from .packed import limbs_for
    from .records import next_pow2

    length, subk = pool.length, pool.subk
    left, right = pool.left, pool.right
    head, tailw, h16, t16 = summ
    N = pool.n
    if N == 0:
        return pool, summ, 0, int(need)
    cap = int(os.environ.get("REFLEXIV_BUCKET_CAP", str(1 << 21)))
    cap_max = int(os.environ.get("REFLEXIV_BUCKET_CAP_MAX", str(1 << 26)))
    # small pools use a smaller slab tier so late rounds don't pad a few
    # thousand live rows to the full 2M program; three fixed tiers bound
    # the number of compiled shapes at 3 per (kmin, max_sub) config
    for tier in (1 << 12, 1 << 17):
        if N <= tier and tier <= cap:
            cap = tier
            break
    SW = head.shape[1]

    # marker draw on host — bit-identical to the device formula so bucket
    # routing (by the marker-oriented group key) matches the device's view
    salt = np.uint32((int(round_seed) * 0x9E3779B9) & 0xFFFFFFFF)
    rot = (t16 << np.uint32(16)) | (t16 >> np.uint32(16))
    hmix = _mix32_np(h16 ^ rot ^ length.astype(np.uint32) ^ salt)
    marker = 1 + (hmix & np.uint32(1)).astype(np.int32)

    Wp = limbs_for(kmin - 1)
    keys = np.where((marker == 1)[:, None], head[:, :Wp],
                    tailw[:, :Wp]).astype(np.uint32)
    rem = (kmin - 1) - 16 * (Wp - 1)
    if rem < 16:
        keys[:, Wp - 1] &= np.uint32(
            (0xFFFFFFFF << (32 - 2 * rem)) & 0xFFFFFFFF)
    kh = np.full(N, salt, np.uint32)
    for j in range(Wp):
        kh = _mix32_np(kh ^ keys[:, j])

    # bucket count: bounded doubling (equal-hash skew gets a one-off
    # larger program) — same policy as _pdyn_round_bucketed_host
    n_buckets = max(1, next_pow2(-(-N // (cap * 3 // 4))))
    max_buckets = max(n_buckets, next_pow2(max(N, 1)))
    while True:
        ids = kh & np.uint32(n_buckets - 1)
        counts = np.bincount(ids, minlength=n_buckets)
        if int(counts.max()) <= cap or n_buckets >= max_buckets:
            break
        n_buckets *= 2
    order = np.argsort(ids, kind="stable")
    bounds = np.concatenate([[0], np.cumsum(counts)])

    def built_slabs():
        for b in range(n_buckets):
            rows = order[bounds[b]:bounds[b + 1]]
            n = len(rows)
            if n == 0:
                continue
            bcap = cap if n <= cap else next_pow2(n)
            if bcap > cap_max:
                raise RuntimeError(
                    f"indexed extension round: {n} rows share one "
                    f"group-key hash bucket (> REFLEXIV_BUCKET_CAP_MAX="
                    f"{cap_max}) — extreme repeat skew")
            hd = np.zeros((bcap, SW), np.uint32)
            hd[:n] = head[rows]
            tl = np.zeros((bcap, SW), np.uint32)
            tl[:n] = tailw[rows]
            a16 = np.zeros(bcap, np.uint32)
            a16[:n] = h16[rows]
            b16 = np.zeros(bcap, np.uint32)
            b16[:n] = t16[rows]
            ln = np.zeros(bcap, np.int32)
            ln[:n] = length[rows]
            sk = np.ones(bcap, np.int32)
            sk[:n] = subk[rows]
            lf = np.zeros(bcap, np.int32)
            lf[:n] = left[rows]
            rt = np.zeros(bcap, np.int32)
            rt[:n] = right[rows]
            lv = np.zeros(bcap, bool)
            lv[:n] = True
            oid = np.full(bcap, -1, np.int32)
            oid[:n] = rows
            yield (hd, tl, a16, b16, ln, sk, lf, rt, lv, oid)

    act = np.zeros(N, np.int8)
    part = np.full(N, -1, np.int64)
    nl = np.zeros(N, np.int32)
    nr = np.zeros(N, np.int32)

    def collect(outs):
        soid, action, partner, nlv, nrv = (np.asarray(x) for x in outs)
        m = (soid >= 0) & (action > 0)
        ids_m = soid[m]
        act[ids_m] = action[m].astype(np.int8)
        part[ids_m] = partner[m]
        nl[ids_m] = nlv[m]
        nr[ids_m] = nrv[m]

    slab_iter = built_slabs()
    if os.environ.get("REFLEXIV_PREFETCH", "1") != "0":
        slab_iter = count_mod._PrefetchedChunks(slab_iter)
    pending = None
    for arrs in slab_iter:
        outs = pd.pdyn_round_indexed(
            *(jnp.asarray(a) for a in arrs), jnp.uint32(round_seed),
            kmin=kmin, max_sub=max_sub, unique_only=unique_only)
        if pending is not None:
            collect(pending)
        pending = outs
    if pending is not None:
        collect(pending)

    f_all = np.nonzero(act == 1)[0]
    r_all = part[f_all]
    keep_idx = np.nonzero(act == 0)[0]

    # split merges: short+short with a short result run through the
    # vectorized dense splice; anything touching an overflow row (or
    # overflowing the dense width) goes through the per-row funnel —
    # always few (the growing contigs)
    over_mask = np.zeros(N, bool)
    if pool.over:
        over_mask[np.fromiter(pool.over, int, len(pool.over))] = True
    tot_all = (length[r_all].astype(np.int64) + length[f_all]
               - subk[r_all])
    wd_bases = pool.W_DENSE * 16
    fast = (~over_mask[r_all]) & (~over_mask[f_all]) & (tot_all <= wd_bases)
    rf, ff = r_all[fast], f_all[fast]
    rs, fs = r_all[~fast], f_all[~fast]

    if len(rf):
        out_limbs = limbs_for(int(tot_all[fast].max()))
        mseq, mlen = _host_concat_packed(
            pool.dense[rf], length[rf], pool.dense[ff], length[ff],
            subk[rf], out_limbs)
        mh, mt, mh16, mt16 = _host_summaries(
            (mseq, mlen, subk[ff]), max_sub)
    else:
        out_limbs = 0
        mseq = np.zeros((0, 1), np.uint32)
        mlen = np.zeros(0, np.int32)
        mh = np.zeros((0, SW), np.uint32)
        mt = np.zeros((0, SW), np.uint32)
        mh16 = mt16 = np.zeros(0, np.uint32)

    slow_rows = []
    slow_lens = np.empty(len(rs), np.int32)
    for j, (ri, fi) in enumerate(zip(rs, fs)):
        arr, tot = _host_concat_row(
            pool.row_seq(int(ri)), int(length[ri]),
            pool.row_seq(int(fi)), int(length[fi]), int(subk[ri]))
        slow_rows.append(arr)
        slow_lens[j] = tot
    if len(rs):
        sh, st, sh16, st16 = _summaries_rows(
            slow_rows, slow_lens, subk[fs], max_sub)
    else:
        sh = np.zeros((0, SW), np.uint32)
        st = np.zeros((0, SW), np.uint32)
        sh16 = st16 = np.zeros(0, np.uint32)

    # assemble: [kept rows, fast merged, slow merged]
    n_keep, n_fast, n_slow = len(keep_idx), len(rf), len(rs)
    n_new = n_keep + n_fast + n_slow
    base = pool.select(keep_idx)
    wd_new = min(pool.W_DENSE,
                 max(base.dense.shape[1], out_limbs, 1))
    dense_new = np.zeros((n_new, wd_new), np.uint32)
    dense_new[:n_keep, :base.dense.shape[1]] = base.dense
    if n_fast:
        dense_new[n_keep:n_keep + n_fast, :out_limbs] = mseq
    over_new = dict(base.over)
    for j, arr in enumerate(slow_rows):
        over_new[n_keep + n_fast + j] = arr
    nlen = np.concatenate(
        [length[keep_idx], mlen, slow_lens]).astype(np.int32)
    nsub = np.concatenate(
        [subk[keep_idx], subk[ff], subk[fs]]).astype(np.int32)
    nleft = np.concatenate(
        [left[keep_idx], nl[ff], nl[fs]]).astype(np.int32)
    nright = np.concatenate(
        [right[keep_idx], nr[ff], nr[fs]]).astype(np.int32)
    new_pool = _RaggedPool(dense_new, nlen, nsub, nleft, nright, over_new)
    nsum = (np.concatenate([head[keep_idx], mh, sh]),
            np.concatenate([tailw[keep_idx], mt, st]),
            np.concatenate([h16[keep_idx], mh16, sh16]),
            np.concatenate([t16[keep_idx], mt16, st16]))
    if n_new >= 2:
        top2 = np.partition(nlen, n_new - 2)[-2:]
        need_out = int(top2[0]) + int(top2[1])
    else:
        need_out = int(nlen.max()) if n_new else int(need)
    return new_pool, nsum, n_new, need_out


def _host_concat_row(a: np.ndarray, la: int, b: np.ndarray, lb: int,
                     skip: int):
    """Single-row ``a ++ b[skip:]`` on packed limbs, vectorized across
    LIMBS (``_host_concat_packed`` vectorizes across rows but loops output
    limbs in Python — ruinous for a single megabase row)."""
    from .packed import BASES_PER_LIMB, limbs_for

    total = la + lb - skip
    W = limbs_for(max(total, 1))
    out = np.zeros(W, np.uint32)
    wa = limbs_for(la) if la else 0
    out[:wa] = a[:wa]
    nb = lb - skip
    if nb > 0:
        # left-aligned stream of b[skip:]
        q = skip // BASES_PER_LIMB
        o = np.uint32(2 * (skip % BASES_PER_LIMB))
        wb = limbs_for(nb)
        aa = np.zeros(wb, np.uint32)
        seg = b[q:q + wb]
        aa[:len(seg)] = seg
        if o:
            bb = np.zeros(wb, np.uint32)
            seg2 = b[q + 1:q + 1 + wb]
            bb[:len(seg2)] = seg2
            bs = (aa << o) | (bb >> (np.uint32(32) - o))
        else:
            bs = aa
        remb = nb - BASES_PER_LIMB * (wb - 1)
        if remb < BASES_PER_LIMB:
            bs[-1] &= np.uint32(0xFFFFFFFF) << (32 - 2 * remb)
        # place at output base position la
        p = la // BASES_PER_LIMB
        po = np.uint32(2 * (la % BASES_PER_LIMB))
        if po:
            lob = bs >> po
            hib = bs << (np.uint32(32) - po)
            end0 = min(p + wb, W)
            out[p:end0] |= lob[:end0 - p]
            end1 = min(p + 1 + wb, W)
            out[p + 1:end1] |= hib[:end1 - p - 1]
        else:
            end0 = min(p + wb, W)
            out[p:end0] |= bs[:end0 - p]
    return out, total


def _summaries_rows(rows, lengths, subks, max_sub: int):
    """Per-row summaries for a small batch of trimmed packed rows (the
    slow-path merged rows — a handful of long contigs per round)."""
    from .packed import BASES_PER_LIMB, limbs_for

    SW = limbs_for(max_sub)
    M = len(rows)
    head = np.zeros((M, SW), np.uint32)
    tail = np.zeros((M, SW), np.uint32)
    h16 = np.zeros(M, np.uint32)
    t16 = np.zeros(M, np.uint32)
    for i, arr in enumerate(rows):
        a2 = arr[None, :]
        ln = np.asarray([int(lengths[i])], np.int64)
        sk = int(subks[i])
        head[i] = _host_window(a2, np.zeros(1, np.int64), max_sub)[0]
        tail[i] = _host_window(a2, np.maximum(ln - sk, 0), max_sub)[0]
        h16[i] = _host_window(a2, np.zeros(1, np.int64), 16)[0, 0]
        t16[i] = _host_window(a2, np.maximum(ln - 16, 0), 16)[0, 0]
    return head, tail, h16, t16


def _summaries_ragged(pool: "_RaggedPool", max_sub: int):
    """Summaries for a whole :class:`_RaggedPool`: dense part vectorized,
    overflow rows patched individually."""
    hp_dense = (pool.dense, np.minimum(pool.length,
                                       pool.dense.shape[1] * 16),
                pool.subk)
    head, tailw, h16, t16 = _host_summaries(hp_dense, max_sub)
    if pool.over:
        idxs = sorted(pool.over)
        rows = [pool.over[i] for i in idxs]
        oh, ot, oh16, ot16 = _summaries_rows(
            rows, pool.length[idxs], pool.subk[idxs], max_sub)
        head[idxs], tailw[idxs] = oh, ot
        h16[idxs], t16[idxs] = oh16, ot16
    return head, tailw, h16, t16


def _finished_mask_from_summ(summ, subk, max_sub: int):
    """Exact extendability census straight from maintained summaries —
    the head/tail windows ARE the trie intervals, so the ragged pool's
    bytes are never touched."""
    from .packed import BASES_PER_LIMB, limbs_for

    head, tailw = summ[0], summ[1]
    N = len(subk)
    if N == 0:
        return np.zeros(0, bool)
    W = limbs_for(max_sub)
    m = np.arange(W)[None, :]
    bits = np.clip(
        2 * (subk.astype(np.int64)[:, None] - BASES_PER_LIMB * m), 0, 32)
    mask = np.where(
        bits >= 32, 0xFFFFFFFF,
        np.where(bits > 0,
                 (np.int64(0xFFFFFFFF) << (32 - bits)) & 0xFFFFFFFF, 0),
    ).astype(np.uint32)

    def vbe(x):
        y = np.ascontiguousarray(x.astype(">u4"))
        return y.view(np.dtype((np.void, y.shape[1] * 4))).ravel()

    h_lo, h_hi = vbe(head[:, :W] & mask), vbe(head[:, :W] | ~mask)
    t_lo, t_hi = vbe(tailw[:, :W] & mask), vbe(tailw[:, :W] | ~mask)
    head_hits = (
        np.searchsorted(np.sort(t_lo), h_hi, side="right")
        - np.searchsorted(np.sort(t_hi), h_lo, side="left"))
    tail_hits = (
        np.searchsorted(np.sort(h_lo), t_hi, side="right")
        - np.searchsorted(np.sort(h_hi), t_lo, side="left"))
    return (head_hits == 0) & (tail_hits == 0)


def _finished_mask_host_exact(hp, max_sub: int):
    """Pool-wide exact mixed-k extendability census of a host-resident pool.

    numpy mirror of :func:`packed_dyn.finished_mask_pdyn_exact` — the same
    trie-interval sweep (a record is finished when no live tail interval
    intersects its head interval and vice versa), with the same conservative
    semantics including self-hits — so the host-bucketed extension phase can
    park finished rows without compiling a pool-sized device program.  The
    census is global (intervals interact pool-wide), hence a host sweep and
    not a per-bucket one: ``np.searchsorted`` over big-endian void views is
    the lexicographic multi-limb compare.  All rows of ``hp`` are live by
    construction.
    """
    from .packed import BASES_PER_LIMB, limbs_for

    seq, length, subk = hp[0], hp[1], hp[2]
    N = seq.shape[0]
    if N == 0:
        return np.zeros(0, bool)
    W = limbs_for(max_sub)

    head = _host_window(seq, np.zeros(N, np.int64), max_sub)
    tail = _host_window(
        seq, np.maximum(length.astype(np.int64) - subk, 0), max_sub)

    m = np.arange(W)[None, :]
    bits = np.clip(
        2 * (subk.astype(np.int64)[:, None] - BASES_PER_LIMB * m), 0, 32)
    mask = np.where(
        bits >= 32, 0xFFFFFFFF,
        np.where(bits > 0,
                 (np.int64(0xFFFFFFFF) << (32 - bits)) & 0xFFFFFFFF, 0),
    ).astype(np.uint32)

    def vbe(x):
        y = np.ascontiguousarray(x.astype(">u4"))
        return y.view(np.dtype((np.void, y.shape[1] * 4))).ravel()

    h_lo, h_hi = vbe(head & mask), vbe(head | ~mask)
    t_lo, t_hi = vbe(tail & mask), vbe(tail | ~mask)
    head_hits = (
        np.searchsorted(np.sort(t_lo), h_hi, side="right")
        - np.searchsorted(np.sort(t_hi), h_lo, side="left"))
    tail_hits = (
        np.searchsorted(np.sort(h_lo), t_hi, side="right")
        - np.searchsorted(np.sort(h_hi), t_lo, side="left"))
    return (head_hits == 0) & (tail_hits == 0)


def _park_host_rows(hp, fin, parked: list) -> None:
    """Append rows flagged by ``fin`` to ``parked`` — the host analog of
    :func:`packed_dyn.park_finished_pdyn` (same tuple layout, limbs trimmed
    to the group's longest row)."""
    from .packed import limbs_for

    idx = np.nonzero(fin)[0]
    if not len(idx):
        return
    len_b = hp[1][idx]
    lim = limbs_for(int(len_b.max()))
    parked.append((
        hp[0][idx, :lim].copy(), len_b.copy(), hp[2][idx].copy(),
        hp[3][idx].copy(), hp[4][idx].copy(),
    ))


def _unpack_rows_np(seq: np.ndarray, n_bases: int) -> np.ndarray:
    """(N, W) packed u32 limbs -> (N, n_bases) u8 base codes (vectorized;
    the numpy mirror of packed.unpack_seq_matrix for bounded widths)."""
    N, W = seq.shape
    j = np.arange(n_bases)
    limb = j // 16
    sh = (30 - 2 * (j % 16)).astype(np.uint32)
    lim = np.minimum(limb, W - 1)
    vals = (seq[:, lim] >> sh[None, :]) & np.uint32(3)
    if n_bases > W * 16:
        vals[:, W * 16:] = 0
    return vals.astype(np.uint8)


def _fixing_split_groups(groups, kmax: int, kfix: int = 31):
    """Group-native :func:`_fixing_split_arrays`: the same end-window /
    interior / small partition over width-class PACKED groups, so a pool
    holding megabase contigs is never materialized rows x widest-row.

    Returns ``(end_windows (M, kfix) uint8, parts_groups)`` where
    ``parts_groups`` are packed group tuples for interiors (attrs
    re-blocked exactly like the byte splitter) and pass-through smalls.
    """
    from .packed import limbs_for

    w = kmax - kfix + 1
    win = w + kfix - 1
    ends = []
    parts = []
    for seq, length, subk, left, right in groups:
        n = len(length)
        if not n:
            continue
        big = length >= 2 * kmax
        sidx = np.nonzero(~big)[0]
        if len(sidx):
            parts.append((seq[sidx], length[sidx], subk[sidx],
                          left[sidx], right[sidx]))
        bidx = np.nonzero(big)[0]
        if not len(bidx):
            continue
        bseq, blen = seq[bidx], length[bidx].astype(np.int64)
        # sliding end windows from both ends (win bases each)
        headb = _unpack_rows_np(bseq, min(win, bseq.shape[1] * 16))
        tailw_p = _host_window(bseq, np.maximum(blen - win, 0), win)
        tailb = _unpack_rows_np(tailw_p, win)
        for block in (headb, tailb):
            sw = np.lib.stride_tricks.sliding_window_view(
                block, kfix, axis=1)[:, :w]
            ends.append(sw.reshape(-1, kfix))
        # interior: cut w from both ends, re-left-align (packed shift),
        # zero past the new length
        int_len = (blen - 2 * w).astype(np.int32)
        Wi = limbs_for(int(int_len.max()))
        int_seq = _host_window(bseq, np.full(len(bidx), w, np.int64),
                               Wi * 16)
        m = np.arange(Wi)[None, :]
        bits = np.clip(2 * (int_len.astype(np.int64)[:, None] - 16 * m),
                       0, 32)
        mask = np.where(
            bits >= 32, 0xFFFFFFFF,
            np.where(bits > 0,
                     (np.int64(0xFFFFFFFF) << (32 - bits)) & 0xFFFFFFFF,
                     0)).astype(np.uint32)
        int_seq &= mask
        bl, br = left[bidx], right[bidx]
        parts.append((
            int_seq, int_len, np.full(len(bidx), kfix - 1, np.int32),
            np.where(bl >= 0, 3 + kmax, bl).astype(np.int32),
            np.where(br >= 0, 3 + kmax, br).astype(np.int32)))
    end_windows = (np.concatenate(ends, axis=0)
                   if ends else np.zeros((0, kfix), np.uint8))
    return end_windows, parts


def _decode_groups_to_raw(groups, params: Params):
    """Contig strings + end attrs from width-class groups, applying the
    same repeat-killed / min-contig filter as the dense stage-04 decode."""
    from .bitpack import decode_to_str
    from .records import REPEAT_KILLED

    raw = []
    for seq, length, subk, left, right in groups:
        keep = ~((left <= REPEAT_KILLED) & (right <= REPEAT_KILLED))
        keep &= length >= params.min_contig
        idx = np.nonzero(keep)[0]
        if not len(idx):
            continue
        bases = _unpack_rows_np(seq[idx], int(length[idx].max()))
        for r, i in enumerate(idx):
            raw.append((decode_to_str(bases[r, :length[i]]),
                        int(left[i]), int(right[i])))
    return raw


def _groups_from_contig_rows(rows, kfix: int):
    """Width-class packed groups from ``(codes u8, subk, left, right)``
    rows (the stage-05 re-entry path) — replaces the dense
    ``_dyn_pool_from_rows`` for group-native fixing."""
    from .packed import pack_seq_matrix_np
    from .records import next_pow2

    by_cls: dict = {}
    for codes, sk, l, r in rows:
        by_cls.setdefault(next_pow2(max(len(codes), 16)), []).append(
            (codes, sk, l, r))
    groups = []
    for cls_bases, members in sorted(by_cls.items()):
        n = len(members)
        bases = np.zeros((n, cls_bases), np.uint8)
        length = np.empty(n, np.int32)
        subk = np.empty(n, np.int32)
        left = np.empty(n, np.int32)
        right = np.empty(n, np.int32)
        for i, (codes, sk, l, r) in enumerate(members):
            bases[i, :len(codes)] = codes
            length[i] = len(codes)
            subk[i], left[i], right[i] = sk, l, r
        groups.append((pack_seq_matrix_np(bases), length, subk, left,
                       right))
    return groups


# ---------------------------------------------------------------------------
# fixing + dedup + drivers
# ---------------------------------------------------------------------------

def _fixing_split(recs: DynRecords, kmax: int, kfix: int = 31):
    """The 04Fixing split (``DSExtractFixingKmerFromContigEnds``,
    ``ReflexivDSDynamicKmerFixing.java:1190-1253``).

    Rows of length >= 2*kmax emit ``w = kmax - kfix + 1`` fixed kfix-mers
    sliding in from EACH end, plus the interior cut by ``w`` on both sides;
    an interior end whose original attr was blocked (>0) becomes a blocked
    distance ``3 + kmax`` (the block now sits ``w`` bases beyond the cut),
    extendable ends keep their attrs. Shorter rows pass through unsplit —
    deviation: the reference drops them entirely (all are below the default
    ``minContig`` anyway); keeping them is strictly safer.

    Returns ``(end_windows (M, kfix) uint8, interiors, smalls)`` where
    interiors/smalls are ``(codes, subk, left, right)`` host tuples.
    """
    seq, length, subk, left, right, live = (np.asarray(a) for a in recs)
    w = kmax - kfix + 1
    ends, interiors, smalls = [], [], []
    for i in np.nonzero(live)[0]:
        n = int(length[i])
        s = seq[i, :n]
        if n < 2 * kmax:
            smalls.append((s, int(subk[i]), int(left[i]), int(right[i])))
            continue
        # sliding end windows (vectorized per row)
        ends.append(np.lib.stride_tricks.sliding_window_view(
            s[: w + kfix - 1], kfix))
        ends.append(np.lib.stride_tricks.sliding_window_view(
            s[n - w - kfix + 1:], kfix))
        l = int(left[i])
        r = int(right[i])
        interiors.append((
            s[w: n - w],
            kfix - 1,
            3 + kmax if l >= 0 else l,   # blocked = attr >= 0 (records.py)
            3 + kmax if r >= 0 else r,
        ))
    end_windows = (
        np.concatenate(ends, axis=0).astype(np.uint8)
        if ends else np.zeros((0, kfix), np.uint8)
    )
    return end_windows, interiors, smalls


def _dyn_pool_from_rows(rows, min_subk_width: int = 1) -> DynRecords:
    """Stack host ``(codes, subk, left, right)`` rows into a DynRecords pool."""
    total = max(len(rows), 1)
    maxlen = max([len(c) for c, _, _, _ in rows] + [2])
    cap = max(next_pow2(total), 16)
    L = next_pow2(maxlen)
    seq = np.zeros((cap, L), np.uint8)
    length = np.zeros(cap, np.int32)
    subk = np.full(cap, min_subk_width, np.int32)
    left = np.zeros(cap, np.int32)
    right = np.zeros(cap, np.int32)
    live = np.zeros(cap, bool)
    for j, (codes, sk, l, r) in enumerate(rows):
        seq[j, : len(codes)] = codes
        length[j] = len(codes)
        subk[j] = sk
        left[j] = l
        right[j] = r
        live[j] = True
    return DynRecords(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(subk),
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(live),
    )


def _fixing_split_arrays(recs: DynRecords, kmax: int, kfix: int = 31):
    """Vectorized :func:`_fixing_split`: the same end-window/interior/small
    partition as one batch of gathers (no per-record Python — at production
    scale the pool holds millions of rows).

    Returns ``(end_windows (M, kfix) uint8, interiors, smalls)`` where
    interiors/smalls are ``(seq2d, length, subk, left, right)`` array
    tuples.
    """
    seq, length, subk, left, right, live = (np.asarray(a) for a in recs)
    w = kmax - kfix + 1
    live_idx = np.nonzero(live)[0]
    n_all = length[live_idx]
    big = n_all >= 2 * kmax
    bidx, sidx = live_idx[big], live_idx[~big]
    smalls = (seq[sidx], length[sidx].astype(np.int32),
              subk[sidx].astype(np.int32), left[sidx].astype(np.int32),
              right[sidx].astype(np.int32))
    B = len(bidx)
    if not B:
        empty = (np.zeros((0, seq.shape[1]), np.uint8),
                 np.zeros(0, np.int32), np.zeros(0, np.int32),
                 np.zeros(0, np.int32), np.zeros(0, np.int32))
        return np.zeros((0, kfix), np.uint8), empty, smalls
    n = n_all[big]
    bseq = seq[bidx]
    Lm = seq.shape[1]
    rows3 = np.arange(B)[:, None, None]
    j = np.arange(w, dtype=np.int64)
    t = np.arange(kfix, dtype=np.int64)
    heads = bseq[rows3, (j[:, None] + t[None, :])[None]]
    tail_cols = ((n - w - kfix + 1)[:, None, None]
                 + j[None, :, None] + t[None, None, :])
    tails = bseq[rows3, tail_cols]
    end_windows = np.concatenate(
        [heads, tails], axis=0).reshape(-1, kfix).astype(np.uint8)
    # interior: cut w from both ends, re-left-align, zero past new length
    src = np.minimum(np.arange(Lm, dtype=np.int64)[None, :] + w, Lm - 1)
    int_len = (n - 2 * w).astype(np.int32)
    int_seq = np.where(
        np.arange(Lm)[None, :] < int_len[:, None],
        bseq[np.arange(B)[:, None], src], 0).astype(np.uint8)
    bl, br = left[bidx], right[bidx]
    interiors = (
        int_seq, int_len, np.full(B, kfix - 1, np.int32),
        np.where(bl >= 0, 3 + kmax, bl).astype(np.int32),
        np.where(br >= 0, 3 + kmax, br).astype(np.int32),
    )
    return end_windows, interiors, smalls


def _dyn_pool_from_parts(parts, min_subk_width: int = 1) -> DynRecords:
    """Stack ``(seq2d, length, subk, left, right)`` array tuples into one
    DynRecords pool with block copies (the array form of
    :func:`_dyn_pool_from_rows`)."""
    parts = [p for p in parts if len(p[1])]
    total = max(sum(len(p[1]) for p in parts), 1)
    maxlen = max([int(p[1].max()) for p in parts if len(p[1])] + [2])
    cap = max(next_pow2(total), 16)
    L = next_pow2(maxlen)
    seq = np.zeros((cap, L), np.uint8)
    length = np.zeros(cap, np.int32)
    subk = np.full(cap, min_subk_width, np.int32)
    left = np.zeros(cap, np.int32)
    right = np.zeros(cap, np.int32)
    live = np.zeros(cap, bool)
    at = 0
    for pseq, plen, psub, pl, pr in parts:
        m = len(plen)
        wsrc = min(pseq.shape[1], L)
        seq[at: at + m, :wsrc] = pseq[:, :wsrc]
        length[at: at + m] = plen
        subk[at: at + m] = psub
        left[at: at + m] = pl
        right[at: at + m] = pr
        live[at: at + m] = True
        at += m
    return DynRecords(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(subk),
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(live),
    )


def fixing_rounds_faithful(
    recs: DynRecords, params: Params, *, kmax: int, kfix: int = 31,
    seed: int = 1000, mesh=None, round_schedule: Tuple[int, ...] = (18, 30),
    ckpt_ns: Optional[str] = None,
) -> DynRecords:
    """Faithful 04Fixing + 05FixingAgain
    (``ReflexivDSDynamicKmerFixing.java:125-259``,
    ``ReflexivDSDynamicKmerFixingRoundTwo.java:138-263``).

    Each pass re-expresses every contig's end regions as the full set of
    overlapping fixed kfix-mers (§ ``DSExtractFixingKmerFromContigEnds``),
    deduplicates them (the reference's ``groupBy(kmer).count()`` whose count
    the marker assignment then discards, ``:1211-1244,1857-1877``),
    fork-filters the deduped set both directions (ambiguous continuations
    block, ``:2057,2232``), and runs bounded fixed-k extension rounds over
    end k-mers + interiors. Contigs whose end regions overlap at ANY offset
    >= kfix re-join through the shared k-mer chain — the case the
    unique-exact-overlap fast path (:func:`fixing_rounds`) cannot handle.
    The second pass mirrors FixingRoundTwo's re-split + 30 extra rounds.
    """
    if kmax < kfix + 1:
        # degenerate k ladder: end windows would be empty
        if isinstance(recs, list):
            from . import packed_dyn as pd

            hp_m = _groups_to_dense(recs)
            recs = pd.PackedDynRecords(
                *hp_m, np.ones(len(hp_m[1]), bool))
        return fixing_rounds(
            recs, params, kfix=min(kfix, kmax), seed=seed, mesh=mesh,
            ckpt_ns=ckpt_ns)
    import dataclasses as _dc

    from . import checkpoint as ckpt_mod
    from . import packed_dyn as pd
    from .bitpack import canonical_packed, revcomp_bases
    from .io import has_success_marker

    grouped = isinstance(recs, list)
    for pass_i, n_rounds in enumerate(round_schedule):
        if ckpt_ns:
            # completed-pass snapshot: a death in pass i+1 resumes without
            # re-running pass i's rounds
            done_dir = f"{ckpt_ns}_p{pass_i}_done"
            if has_success_marker(done_dir):
                recs = ckpt_mod.load_records(
                    os.path.dirname(done_dir), os.path.basename(done_dir))
                grouped = isinstance(recs, list)
                continue
        if grouped:
            end_windows, parts = _fixing_split_groups(recs, kmax, kfix)
        else:
            end_windows, interiors, smalls = _fixing_split_arrays(
                recs, kmax, kfix)
        if not len(end_windows):
            return recs
        fwd = pack_bases(jnp.asarray(end_windows), kfix)
        rc = pack_bases(revcomp_bases(jnp.asarray(end_windows)), kfix)
        canon = np.asarray(canonical_packed(fwd, rc))
        uniq = np.unique(canon, axis=0)
        # counts deliberately flattened to 1: the reference's marker
        # assignment overwrites every deduped end k-mer with (1, -1, -1)
        rec31, _ = build_initial_records(
            jnp.asarray(uniq), jnp.ones(len(uniq), jnp.int32), k=kfix,
            min_error=params.min_error_for_k(kfix),
        )
        live31 = np.asarray(rec31.live)
        seq31 = np.asarray(rec31.seq)[live31][:, :kfix]
        ends_part = (
            seq31.astype(np.uint8),
            np.full(len(seq31), kfix, np.int32),
            np.full(len(seq31), kfix - 1, np.int32),
            np.asarray(rec31.left)[live31].astype(np.int32),
            np.asarray(rec31.right)[live31].astype(np.int32),
        )
        fix_params = _dc.replace(params, min_iterations=min(
            params.min_iterations, n_rounds))
        if grouped:
            from .packed import pack_seq_matrix_np

            ends_group = (
                pack_seq_matrix_np(ends_part[0]), ends_part[1],
                ends_part[2], ends_part[3], ends_part[4])
            recs = run_dyn_extension(
                [ends_group] + parts, fix_params, kmin=kfix, kmax=kfix,
                seed=seed + 500 * pass_i, max_rounds=n_rounds, mesh=mesh,
                return_groups=True,
                ckpt_dir=f"{ckpt_ns}_p{pass_i}" if ckpt_ns else None,
            )
        else:
            pool = _dyn_pool_from_parts([ends_part, interiors, smalls])
            recs = run_dyn_extension(
                pool, fix_params, kmin=kfix, kmax=kfix,
                seed=seed + 500 * pass_i, max_rounds=n_rounds, mesh=mesh,
                return_packed=True,
                ckpt_dir=f"{ckpt_ns}_p{pass_i}" if ckpt_ns else None,
            )
            recs = pd.to_dyn_host(recs)
        if ckpt_ns:
            ckpt_mod.save_records(
                os.path.dirname(done_dir), os.path.basename(done_dir), recs)
    return recs


def fixing_rounds(
    recs: DynRecords, params: Params, *, kfix: int = 31, seed: int = 1000,
    mesh=None, ckpt_ns: Optional[str] = None,
) -> DynRecords:
    """Contig-end rejoin on fixed (kfix-1)-base overlaps, unique joins only.

    Fast-path simplification of ``ReflexivDSDynamicKmerFixing`` (``:125-259``)
    — see :func:`fixing_rounds_faithful` for the faithful split-based
    implementation (the default in :func:`assemble_dynamic`): join contig
    ends that share a unique exact (kfix-1)-base overlap; ambiguity (any
    group with more than one candidate) blocks the join, standing in for the
    reference's fork filters on re-counted end k-mers.
    """
    from . import packed_dyn as pd

    if isinstance(recs.seq, np.ndarray):
        # keep a host pool on the host: the packed loop re-packs anyway
        sub = np.minimum(np.int32(kfix - 1), np.asarray(recs.length) - 1)
        eligible = np.asarray(recs.live) & (np.asarray(recs.length) >= kfix)
        recs = recs._replace(
            subk=np.where(eligible, sub, recs.subk).astype(np.int32),
            left=np.where(eligible, -1, recs.left).astype(np.int32),
            right=np.where(eligible, -1, recs.right).astype(np.int32),
        )
    else:
        sub = jnp.minimum(jnp.int32(kfix - 1), recs.length - 1)
        eligible = recs.live & (recs.length >= kfix)
        recs = recs._replace(
            subk=jnp.where(eligible, sub, recs.subk),
            left=jnp.where(eligible, -1, recs.left),
            right=jnp.where(eligible, -1, recs.right),
        )
    out = run_dyn_extension(
        recs, params, kmin=kfix, kmax=kfix, seed=seed,
        unique_only=True, max_rounds=48, mesh=mesh,
        return_packed=True,
        ckpt_dir=f"{ckpt_ns}_fast" if ckpt_ns else None,
    )
    return pd.to_dyn_host(out)


def dedup_contigs(contigs: List[str], seed_k: int = 31) -> List[str]:
    """Drop contigs contained in a longer contig on either strand
    (``ReflexivDSDynamicKmerDedup``, ``:138-340``).

    Like the reference, containment candidates are seeded by shared marker
    k-mers (``DSMarkerKmerSelection``/``geq(2)``) before the exact check —
    the seed index keeps this near-linear instead of all-pairs substring
    scans. Uses the C++ implementation (``rfx_dedup``) when the native
    library is available; this Python version is the fallback and oracle.
    """
    from . import native
    from .contigs import revcomp_str

    native_out = native.dedup_contigs_native(contigs, seed_k=seed_k)
    if native_out is not None:
        return native_out

    out: List[str] = []
    stride = 16
    seed_index: dict = {}  # strided k-mer -> list of kept contig ids
    for s in sorted(set(contigs), key=len, reverse=True):
        rc = revcomp_str(s)
        if len(s) < seed_k + stride - 1:
            # too short for the probe-window guarantee: exact scan (rare)
            if not any(s in t or rc in t for t in out):
                out.append(s)
            continue
        # kept contigs index seeds every `stride` positions; querying one
        # dense window of `stride` consecutive probes guarantees hitting a
        # stored seed for any true containment (offset alignment covered)
        cands = set()
        for q in (s, rc):
            for i in range(stride):
                cands.update(seed_index.get(q[i:i + seed_k], ()))
        contained = any(s in out[c] or rc in out[c] for c in cands)
        if not contained:
            cid = len(out)
            out.append(s)
            for i in range(0, len(s) - seed_k + 1, stride):
                seed_index.setdefault(s[i:i + seed_k], []).append(cid)
    return out


def records_from_sorted(
    sets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray, int]],
) -> DynRecords:
    """Stack per-k (bases, left, right, k) sets into one DynRecords pool.

    Returns a **host (numpy) pool**: at 10 Mbp+ the stacked byte matrix is
    multiple GB, and every consumer either works on host arrays
    (``pool_to_sets``, the fixing split) or packs to 2-bit before upload
    (``run_dyn_extension`` via ``from_dyn_host``) — uploading the byte form
    would waste 4x HBM for nothing."""
    total = sum(len(b) for b, _, _, _ in sets)
    kmax = max(k for _, _, _, k in sets)
    cap = max(next_pow2(total), 16)
    L = next_pow2(2 * kmax)
    seq = np.zeros((cap, L), dtype=np.uint8)
    length = np.zeros(cap, np.int32)
    subk = np.ones(cap, np.int32)
    left = np.zeros(cap, np.int32)
    right = np.zeros(cap, np.int32)
    live = np.zeros(cap, bool)
    at = 0
    for bases, l, r, k in sets:
        n = len(bases)
        seq[at:at + n, :k] = bases
        length[at:at + n] = k
        subk[at:at + n] = k - 1
        left[at:at + n] = l
        right[at:at + n] = r
        live[at:at + n] = True
        at += n
    return DynRecords(seq, length, subk, left, right, live)


def assemble_dynamic(
    bases: np.ndarray,
    lengths: np.ndarray,
    params: Params,
    *,
    seed: int = 0,
    workdir: Optional[str] = None,
    mesh=None,
) -> List[Tuple[str, str]]:
    """Full dynamic multi-k assembly from reads (the ``meta`` algorithm).

    With ``workdir`` set, every pipeline stage checkpoints its state and the
    call resumes from the newest completed stage (the reference's
    ``_SUCCESS``-marker resume, ``Pipelines.java:613-830``). With ``mesh``
    set, the extension and fixing stages run their rounds sharded over the
    device mesh.
    """
    from .bitpack import decode_to_str
    from .records import REPEAT_KILLED
    from . import checkpoint as ckpt

    # guard resume against parameter changes: a pool checkpointed under a
    # different klist would silently lose k-classes in pool_to_sets
    if workdir:
        import json as _json

        sig = {
            "klist": sorted(params.klist),
            "min_cov": params.min_kmer_coverage,
            "min_error": params.min_error_coverage,
        }
        sig_path = os.path.join(workdir, "params.json")
        if os.path.exists(sig_path):
            with open(sig_path) as fh:
                old = _json.load(fh)
            if old != sig:
                log.info("meta params changed; discarding stale checkpoints")
                ckpt.clear_from(workdir, ckpt.META_STAGES[0])
        os.makedirs(workdir, exist_ok=True)
        with open(sig_path, "w") as fh:
            _json.dump(sig, fh)

    resume = ckpt.latest_stage(workdir) if workdir else None
    if resume:
        log.info("resuming meta pipeline from stage %s", resume)

    klist = sorted(params.klist)
    max_read = int(lengths.max()) if len(lengths) else 0
    klist = [k for k in klist if k + 2 < max_read]
    if not klist:
        raise ValueError(
            f"no usable k in klist for read length {max_read}")
    kmin, kmax = klist[0], klist[-1]
    stages = ckpt.META_STAGES
    resume_idx = stages.index(resume) if resume else -1

    def pool_to_sets(pool: DynRecords):
        """Recover per-k (bases, left, right) triples from a pooled stage
        snapshot — a row's k-class is its length at this point."""
        seq, length, subk, left, right, live = (np.asarray(a) for a in pool)
        sets = {}
        for k in klist:
            m = live & (length == k)
            sets[k] = (seq[m][:, :k], left[m], right[m])
        return sets

    pool: Optional[DynRecords] = None
    if resume_idx >= 0 and resume_idx < 4:
        pool = ckpt.load_records(workdir, stages[resume_idx])

    if resume_idx < 0 and params.output_path:
        # a prior `reduce` run in the same output dir supplies the reduced
        # multi-k tables: consume them instead of recounting, exactly like
        # the reference's steps pipe reading the Count_*_reduced glob
        # (Pipelines.java:857)
        from .io import has_success_marker

        rdirs = {
            k: os.path.join(params.output_path, f"Count_{k}_reduced")
            for k in klist
        }
        sig_ok = False
        sig_path = os.path.join(params.output_path, "reduce_params.json")
        if os.path.exists(sig_path):
            import json as _json

            with open(sig_path) as fh:
                sig_ok = _json.load(fh) == _count_signature(params)
            if not sig_ok:
                log.info("meta: Count_*_reduced present but reduce params "
                         "differ; recounting")
        if sig_ok and all(has_success_marker(d) for d in rdirs.values()):
            log.info("meta: consuming Count_*_reduced from a prior reduce "
                     "run; skipping count+sort+reduce")
            pre = {k: read_sorted_set(d, k) for k, d in rdirs.items()}
            pool = records_from_sorted(
                [(b, l, r, k) for k, (b, l, r) in pre.items()]
            )
            if workdir:
                ckpt.save_records(workdir, "01reduced", pool)
            resume_idx = 1

    from . import metrics

    met = metrics.current()
    met.lap_start()

    if resume_idx < 0:
        # count + sort each k; -accurate adds mercy k-mers per k
        # (Pipelines.java:1388-1391)
        sorted_sets = {}
        # per-k partial checkpoints: a death mid-ladder resumes at the
        # first k whose sorted set is not yet on disk
        if workdir:
            for k in klist:
                if ckpt.has_kset(workdir, f"00partial/k{k}"):
                    sorted_sets[k] = ckpt.load_kset(workdir, f"00partial/k{k}")
                    log.info("k=%d: restored sorted set from partial "
                             "checkpoint (%d records)", k,
                             len(sorted_sets[k][0]))
        missing_ks = [k for k in klist if k not in sorted_sets]
        stream_tables = None   # one-pass multi-k streaming tables (budget)
        bases_p = lens_p = None
        if mesh is not None and not params.sensitive and missing_ks:
            n_dev = mesh.devices.size
            R = bases.shape[0]
            R_pad = ((R + n_dev - 1) // n_dev) * n_dev
            bases_p = jnp.zeros(
                (R_pad, bases.shape[1]), jnp.uint8).at[:R].set(
                jnp.asarray(bases))
            lens_p = jnp.zeros((R_pad,), jnp.int32).at[:R].set(
                jnp.asarray(lengths))
        for k in missing_ks:
            if params.sensitive and mesh is not None:
                # -accurate no longer abandons the mesh (VERDICT r2 weak
                # #4): the mercy table computes with the count table
                # hash-sharded and the flank rule exchanged over ICI
                from .parallel import mercy_kmer_table_sharded

                limbs, counts = mercy_kmer_table_sharded(
                    bases, lengths, k=k,
                    min_cov=params.min_kmer_coverage,
                    max_cov=params.max_kmer_coverage, mesh=mesh,
                )
                sorted_sets[k] = sort_k_records(limbs, counts, k, params)
            elif params.sensitive:
                from .mercy import mercy_kmer_table

                limbs, counts = mercy_kmer_table(
                    bases, lengths, k=k,
                    min_cov=params.min_kmer_coverage,
                    max_cov=params.max_kmer_coverage,
                )
                sorted_sets[k] = sort_k_records(limbs, counts, k, params)
            elif mesh is not None:
                sorted_sets[k] = sort_k_records_sharded(
                    bases_p, lens_p, k, params, mesh)
            else:
                from .io import ingest_budget_bytes

                budget = ingest_budget_bytes()
                pattern = params.input_fastq or params.input_fasta
                if budget and pattern:
                    # out-of-core counting ladder: ONE streaming pass over
                    # the input counts every k (chunks uploaded once,
                    # device-resident running tables per k)
                    if stream_tables is None:
                        from .count import count_kmers_from_files_multi

                        # only the ks not already checkpointed: a resumed
                        # ladder streams the input once for the remainder
                        stream_tables = count_kmers_from_files_multi(
                            pattern, missing_ks,
                            min_cov=params.min_kmer_coverage,
                            max_cov=params.max_kmer_coverage,
                            front_clip=params.front_clip,
                            end_clip=params.end_clip,
                            params=params, budget_bytes=budget)
                    limbs, counts = stream_tables[k]
                else:
                    limbs, counts = count_kmers_auto(
                        bases, lengths, k=k,
                        min_cov=params.min_kmer_coverage,
                        max_cov=params.max_kmer_coverage,
                        front_clip=params.front_clip,
                        end_clip=params.end_clip,
                        partitions=params.partitions,
                    )
                sorted_sets[k] = sort_k_records(limbs, counts, k, params)
            log.info("k=%d: %d sorted records", k, len(sorted_sets[k][0]))
            if workdir:
                ckpt.save_kset(workdir, f"00partial/k{k}", sorted_sets[k], k)
        pool = records_from_sorted(
            [(b, l, r, k) for k, (b, l, r) in sorted_sets.items()]
        )
        if workdir:
            ckpt.save_records(workdir, "00sorted", pool)
            ckpt.clear_partial(workdir, "00partial")
        met.lap("meta/00count_sort")

    if resume_idx < 1:
        # pairwise reduction along the k ladder (Pipelines.java:1315-1737)
        sorted_sets = pool_to_sets(pool)
        for i, (k1, k2) in enumerate(zip(klist, klist[1:])):
            p1 = f"01partial/pair{i}_k{k1}"
            p2 = f"01partial/pair{i}_k{k2}"
            if workdir and ckpt.has_kset(workdir, p1) \
                    and ckpt.has_kset(workdir, p2):
                sorted_sets[k1] = ckpt.load_kset(workdir, p1)
                sorted_sets[k2] = ckpt.load_kset(workdir, p2)
                log.info("reduce %d vs %d: restored from partial checkpoint",
                         k1, k2)
                continue
            shorts, longs = reduce_k_pair(
                sorted_sets[k1], sorted_sets[k2], k1, k2)
            sorted_sets[k1] = shorts
            sorted_sets[k2] = longs
            log.info("reduce %d vs %d: %d short k-mers kept", k1, k2,
                     len(shorts[0]))
            if workdir:
                ckpt.save_kset(workdir, p1, shorts, k1)
                ckpt.save_kset(workdir, p2, longs, k2)
        pool = records_from_sorted(
            [(b, l, r, k) for k, (b, l, r) in sorted_sets.items()]
        )
        if workdir:
            ckpt.save_records(workdir, "01reduced", pool)
            ckpt.clear_partial(workdir, "01partial")
        met.lap("meta/01reduce")

    if resume_idx < 2:
        # ragged end to end: the extension returns width-class groups and
        # the checkpoint writer consumes them per class — neither the
        # full-width byte matrix (the round-3 10 Mbp OOM) nor a dense
        # rows x widest-row limb matrix (the round-5 memory cliff once
        # contigs hit megabases) ever exists
        if mesh is None:
            pool = run_dyn_extension(
                pool, params, kmin=kmin, kmax=kmax, seed=seed, mesh=mesh,
                return_groups=True,
                ckpt_dir=os.path.join(workdir, "02partial")
                if workdir else None)
        else:
            from . import packed_dyn as _pd

            pool = run_dyn_extension(
                pool, params, kmin=kmin, kmax=kmax, seed=seed, mesh=mesh,
                return_packed=True,
                ckpt_dir=os.path.join(workdir, "02partial")
                if workdir else None)
            pool = _pd.to_dyn_host(pool)
        if workdir:
            ckpt.save_records(workdir, "02extended", pool)
            ckpt.clear_partial(workdir, "02partial")
        met.lap("meta/02extend")
        met.set("meta/live_after_extension",
                sum(len(g[1]) for g in pool) if isinstance(pool, list)
                else int(np.sum(np.asarray(pool.live))))

    if resume_idx < 3:
        fix_ns = os.path.join(workdir, "03partial") if workdir else None
        if os.environ.get("REFLEXIV_FAST_FIXING") == "1" or kmax < 32:
            # unique-exact-overlap fast path (or degenerate k ladder)
            if isinstance(pool, list):
                from . import packed_dyn as _pd

                hp_m = _groups_to_dense(pool)
                pool = _pd.PackedDynRecords(
                    *hp_m, np.ones(len(hp_m[1]), bool))
            pool = fixing_rounds(
                pool, params, kfix=min(31, kmin), seed=seed + 1000, mesh=mesh,
                ckpt_ns=fix_ns)
        else:
            pool = fixing_rounds_faithful(
                pool, params, kmax=kmax, seed=seed + 1000, mesh=mesh,
                ckpt_ns=fix_ns)
        if workdir:
            ckpt.save_records(workdir, "03fixed", pool)
            ckpt.clear_partial(workdir, "03partial")
        met.lap("meta/03fixing")

    if resume_idx < 4:
        if isinstance(pool, list):
            raw = _decode_groups_to_raw(pool, params)
        else:
            seq, length, subk, left, right, live = (
                np.asarray(a) for a in pool)
            raw = []
            for i in np.nonzero(live)[0]:
                if left[i] <= REPEAT_KILLED and right[i] <= REPEAT_KILLED:
                    continue
                if length[i] < params.min_contig:
                    continue
                raw.append((decode_to_str(seq[i, :length[i]]),
                            int(left[i]), int(right[i])))

        # fixing pass 2 (ReflexivDSDynamicKmerFixing/-RoundTwo): re-count
        # fixed 31-mers from the reads, fork-filter, and extend the contig
        # fragments through the read graph — our reassembly machinery is
        # exactly this semantics
        import dataclasses as _dc
        from .reassemble import parse_contig_attrs, reassemble_arrays

        kfix = min(31, kmin)
        fix_params = _dc.replace(params, k=kfix)
        # read-graph reassembly pads reads + fragments to ONE dense matrix
        # of the longest fragment's width — 1 TiB at a 2 Mbp contig
        # (observed round 5). It exists to bridge FRAGMENT-scale contigs
        # through read evidence (ReAssembleCounter consumes "fragmented
        # contigs", ReflexivDSMain.java reassemble flow), so contigs past
        # the threshold skip it: their ends still get read-consensus
        # extension below and end-overlap rejoins in the stage-05 fixing
        # pass.
        # 64 kb default: wide enough that fragment-scale contigs (the
        # stage's whole purpose) keep their read-graph bridging — an 8 kb
        # cap measurably shortened 50 kb-genome assemblies — while
        # megabase campaign contigs still skip; the byte-budget guard in
        # reassemble_arrays bounds the dense pool either way.
        ra_max = int(os.environ.get(
            "REFLEXIV_REASSEMBLE_MAX_BASES", "65536"))
        small_rs = [(s, l, r) for s, l, r in raw if len(s) <= ra_max]
        big_rs = [(s, l, r) for s, l, r in raw if len(s) > ra_max]
        re_out = [
            (s,) + parse_contig_attrs(h)
            for h, s in reassemble_arrays(
                bases, lengths, [s for s, _, _ in small_rs], fix_params,
                seed=seed + 2000)
        ] if small_rs else []
        raw = re_out + big_rs

        # contig-end read-consensus extension (the 07EndExtend stage;
        # replaces the reference's minimap2 pipe,
        # ReflexivDSDynamicKmerMapping) — evidence read straight from the
        # code matrix, no per-read string materialization
        from .mapping import end_extend_arrays

        exts = end_extend_arrays(
            [s for s, _, _ in raw], bases, lengths)
        raw = [(s2, l, r) for s2, (_s, l, r) in zip(exts, raw)]
        met.lap("meta/04reassemble_end_extend")

        # 08Extend + 09ExtendAgain (ReflexivDSDynamicKmerExtend ``:118-253``,
        # ``...ExtendRoundTwo:133-220``): the fixing machinery re-runs over
        # the end-extended contigs so ends that now overlap through their
        # consensus extensions re-join before dedup
        if raw and os.environ.get("REFLEXIV_SKIP_EXTEND_PASS") != "1":
            from .bitpack import encode_ascii

            kfix = min(31, kmin)
            rows = [
                (encode_ascii(np.frombuffer(s.encode(), np.uint8)),
                 kfix - 1, l, r)
                for s, l, r in raw
            ]
            if mesh is None and kmax >= 32:
                # group-native re-entry: megabase contigs never sit in a
                # rows x widest-row dense pool
                pool2 = _groups_from_contig_rows(
                    [(np.asarray(c), sk, l, r) for c, sk, l, r in rows],
                    kfix)
                pool2 = fixing_rounds_faithful(
                    pool2, params, kmax=kmax, seed=seed + 3000, mesh=mesh)
                if not isinstance(pool2, list):
                    pool2 = [(
                        np.asarray(pool2.seq), np.asarray(pool2.length),
                        np.asarray(pool2.subk), np.asarray(pool2.left),
                        np.asarray(pool2.right))]
                raw = _decode_groups_to_raw(pool2, params)
            else:
                pool2 = _dyn_pool_from_rows(rows)
                if kmax < 32:
                    pool2 = fixing_rounds(
                        pool2, params, kfix=kfix, seed=seed + 3000,
                        mesh=mesh)
                else:
                    pool2 = fixing_rounds_faithful(
                        pool2, params, kmax=kmax, seed=seed + 3000,
                        mesh=mesh)
                seq2, len2, _subk2, l2, r2, live2 = (
                    np.asarray(a) for a in pool2)
                raw = [
                    (decode_to_str(seq2[i, :len2[i]]),
                     int(l2[i]), int(r2[i]))
                    for i in np.nonzero(live2)[0]
                    if len2[i] >= params.min_contig
                    and not (l2[i] <= REPEAT_KILLED
                             and r2[i] <= REPEAT_KILLED)
                ]
            met.lap("meta/05extend_pass")

        attrs = {s: (l, r) for s, l, r in raw}
        deduped = [
            (s,) + attrs.get(s, (0, 0))
            for s in dedup_contigs([s for s, _, _ in raw])
        ]
        if workdir:
            ckpt.save_contigs_attrs(workdir, "04contigs", deduped)
        met.lap("meta/06finalize")
        met.set("meta/contigs", len(deduped))
    else:
        deduped = ckpt.load_contigs_attrs(workdir, "04contigs")

    # ID format parity with TagRowContigID/DSKmerToContig
    # (ReflexivDSMain.java:715-795): >Contig-<len>-(<left>,<right>)-<idx>
    return [
        (f">Contig-{len(s)}-({l},{r})-{i}", s)
        for i, (s, l, r) in enumerate(deduped)
    ]


# ---------------------------------------------------------------------------
# CLI drivers with stage checkpoints
# ---------------------------------------------------------------------------


def _count_signature(params: Params) -> dict:
    """The parameter fields that determine counting/sorting/reduction
    artifacts — reuse of Count_* tables is only valid when these match."""
    return {
        "klist": sorted(params.klist),
        "min_cov": params.min_kmer_coverage,
        "max_cov": params.max_kmer_coverage,
        "min_error": params.min_error_coverage,
        "sensitive": params.sensitive,
        "front_clip": params.front_clip,
        "end_clip": params.end_clip,
        "min_read_length": params.min_read_length,
        "read_limit": params.read_limit,
        "bubble": params.bubble,
    }


def _guard_reduce_signature(out: str, params: Params) -> None:
    """Invalidate reduce artifacts written under different parameters: a
    rerun with changed coverage/klist must not silently resume on stale
    tables (the artifact-level analog of meta's params.json guard)."""
    import json as _json
    import shutil as _sh

    sig = _count_signature(params)
    sig_path = os.path.join(out, "reduce_params.json")
    if os.path.exists(sig_path):
        with open(sig_path) as fh:
            old = _json.load(fh)
        if old != sig:
            log.info("reduce params changed; discarding stale Count_* "
                     "artifacts")
            for name in os.listdir(out):
                if name.startswith("Count_") or name == "Stitch_kmer":
                    _sh.rmtree(os.path.join(out, name), ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    with open(sig_path, "w") as fh:
        _json.dump(sig, fh)


def dynamic_reduction(params: Params, *, seed: int = 0) -> None:
    """``reduce`` command: per-k count + sort + pairwise reduce, with
    per-artifact ``_SUCCESS``-marker resume (cf. ``Pipelines.java:1315-1737``).

    Resume semantics mirror the reference ladder (``Pipelines.java:1368-1571``):
      * ``Count_<k>_sorted/_SUCCESS`` present -> skip counting AND sorting k,
        read the table back;
      * else ``Count_<k>/_SUCCESS`` present -> skip counting, re-sort;
      * ``Count_<k1>_reduced/_SUCCESS`` present -> skip the (k1,k2) pair
        reduction, load both sides back;
      * a completed ``Count_<k>_sorted`` eagerly deletes the superseded
        ``Count_<k>`` directory ("Removing : Count_<k>",
        ``Pipelines.java:1425-1436``).
    With ``-accurate`` the per-k counting adds mercy k-mers
    (``Pipelines.java:1388-1391``).
    """
    import shutil as _sh

    from .io import (has_success_marker, ingest_budget_bytes,
                     load_reads_filtered, scan_max_read_length)
    from .kmer_io import read_count_table, write_count_table

    out = params.output_path
    _guard_reduce_signature(out, params)
    pattern = params.input_fastq or params.input_fasta
    budget = ingest_budget_bytes()
    _loaded = []

    def reads():
        # lazy: with the ingest budget set, only the stages that truly need
        # the matrix (mercy) load it; counting streams from disk
        if not _loaded:
            _loaded.append(load_reads_filtered(pattern, params))
        return _loaded[0]

    if budget:
        read_width = scan_max_read_length(pattern)
    else:
        read_width = reads()[0].shape[1]

    def count_k(k, min_cov, max_cov):
        if budget:
            from .count import count_kmers_from_files

            return count_kmers_from_files(
                pattern, k=k, min_cov=min_cov, max_cov=max_cov,
                front_clip=params.front_clip, end_clip=params.end_clip,
                params=params, budget_bytes=budget)
        m, l = reads()
        return count_kmers_auto(
            m, l, k=k, min_cov=min_cov, max_cov=max_cov,
            front_clip=params.front_clip, end_clip=params.end_clip,
            partitions=params.partitions)

    klist = sorted(k for k in params.klist if k + 2 < read_width)
    sorted_sets = {}
    for k in klist:
        sdir = os.path.join(out, f"Count_{k}_sorted")
        cdir = os.path.join(out, f"Count_{k}")
        if has_success_marker(sdir):
            log.info("k=%d: Count_%d_sorted exists; skipping count+sort",
                     k, k)
            sorted_sets[k] = read_sorted_set(sdir, k)
            continue
        if has_success_marker(cdir):
            log.info("k=%d: Count_%d exists; skipping counting", k, k)
            limbs, counts = read_count_table(cdir, k)
        elif params.sensitive:
            # mercy k-mers enter the ladder per-k (Pipelines.java:1388-1391)
            from .mercy import mercy_kmer_table

            m, l = reads()
            limbs, counts = mercy_kmer_table(
                m, l, k=k, min_cov=params.min_kmer_coverage,
                max_cov=params.max_kmer_coverage,
            )
            write_count_table(cdir, limbs, counts, k)
        else:
            limbs, counts = count_k(
                k, params.min_kmer_coverage, params.max_kmer_coverage)
            write_count_table(cdir, limbs, counts, k)
        sorted_sets[k] = sort_k_records(limbs, counts, k, params)
        _write_sorted_set(sdir, sorted_sets[k], k)
        if os.path.isdir(cdir):
            _sh.rmtree(cdir)
    for k1, k2 in zip(klist, klist[1:]):
        rdir = os.path.join(out, f"Count_{k1}_reduced")
        if has_success_marker(rdir):
            log.info("reduce %d vs %d: Count_%d_reduced exists; skipping",
                     k1, k2, k1)
            sorted_sets[k1] = read_sorted_set(rdir, k1)
            sorted_sets[k2] = read_sorted_set(
                os.path.join(out, f"Count_{k2}_sorted"), k2)
            continue
        shorts, longs = reduce_k_pair(sorted_sets[k1], sorted_sets[k2], k1, k2)
        sorted_sets[k1] = shorts
        sorted_sets[k2] = longs
        # the adjusted longer-k set replaces its _sorted table mid-ladder,
        # exactly like ReflexivDSDynamicKmerRuduction's k2 rewrite
        # (Pipelines.java:257-283 / Ruduction.java:244-283); written FIRST:
        # the skip path assumes the rewrite happened whenever the reduced
        # marker exists, so the marker must come last
        _write_sorted_set(os.path.join(out, f"Count_{k2}_sorted"),
                          longs, k2)
        _write_sorted_set(rdir, shorts, k1)
    last = os.path.join(out, f"Count_{klist[-1]}_reduced")
    if not has_success_marker(last):
        _write_sorted_set(last, sorted_sets[klist[-1]], klist[-1])

    if params.stitch_kmer:
        # stitch k-mer pass (Pipelines.java:1665-1733): count coverage-1
        # k-mers at the stitch size and write the sorted table under
        # Stitch_kmer/ for the stitch command to consume
        ssize = 31
        sdir = os.path.join(out, "Stitch_kmer", f"Count_{ssize}_sorted")
        if not has_success_marker(sdir):
            import dataclasses as _dc

            limbs, counts = count_k(ssize, 1, 1)
            stitch_params = _dc.replace(
                params, min_kmer_coverage=1, max_kmer_coverage=1_000_000)
            _write_sorted_set(
                sdir, sort_k_records(limbs, counts, ssize, stitch_params),
                ssize)
            log.info("stitch k-mers: %d coverage-1 %d-mers sorted",
                     len(counts), ssize)

    log.info("reduction complete: %s", ", ".join(
        f"k{k}={len(v[0])}" for k, v in sorted_sets.items()))


def _write_sorted_set(directory, triple, k):
    """Write ``KMERSTRING,marker|left|right`` rows (the sorted/reduced format,
    ``DSBinaryFullKmerArrayToString``, LeftAndRightSorting ``:246-326``)."""
    from .bitpack import decode_to_str
    from .io import write_success_marker

    bases, left, right = triple
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "part-00000.csv"), "w") as fh:
        for row, l, r in zip(bases, left, right):
            fh.write(f"{decode_to_str(row)},1|{int(l)}|{int(r)}\n")
    write_success_marker(directory)


def read_sorted_set(pattern: str, k: int):
    """Read a ``Count_<k>_sorted``/``_reduced`` table back."""
    import gzip as _gz
    from .bitpack import encode_ascii
    from .io import expand_paths

    rows, lefts, rights = [], [], []
    for path in expand_paths(pattern):
        parts = [path]
        if os.path.isdir(path):
            parts = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.startswith("part-"))
        for part in parts:
            opener = _gz.open if part.endswith(".gz") else open
            with opener(part, "rt") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    km, _, attr = line.partition(",")
                    _m, l, r = attr.split("|")
                    rows.append(km)
                    lefts.append(int(l))
                    rights.append(int(r))
    bases = np.stack([
        encode_ascii(np.frombuffer(s.encode(), np.uint8)) for s in rows
    ]) if rows else np.zeros((0, k), np.uint8)
    return bases, np.asarray(lefts, np.int32), np.asarray(rights, np.int32)


def dynamic_assembly(params: Params, *, seed: int = 0) -> None:
    """``meta`` command driver: assemble + write contigs. Uses a device mesh
    for the extension/fixing rounds when several devices are present."""
    from .io import (
        load_reads_filtered, write_contigs_fasta, write_success_marker)

    devices = jax.devices()
    mesh = None
    if len(devices) > 1:
        from .parallel import make_mesh

        mesh = make_mesh(devices)
    mat, lens = load_reads_filtered(
        params.input_fastq or params.input_fasta, params)
    contigs = assemble_dynamic(
        mat, lens, params, seed=seed,
        workdir=os.path.join(params.output_path, "steps"), mesh=mesh,
    )
    if params.patch or params.scaffold:
        from .patching import apply_patching

        contigs, links = apply_patching(contigs, params)
        if links:
            ldir = os.path.join(params.output_path, "04Patching")
            os.makedirs(ldir, exist_ok=True)
            with open(os.path.join(ldir, "links.tsv"), "w") as fh:
                fh.write("contig_a\tend_a\tcontig_b\tend_b\tn_links\tgap\n")
                for row in links:
                    fh.write("\t".join(str(x) for x in row) + "\n")
    out_dir = os.path.join(params.output_path, "Assembly")
    write_contigs_fasta(
        os.path.join(out_dir, "part-00000"), contigs,
        gzip_output=params.gzip_output,
    )
    write_success_marker(out_dir)
    from .contigs import assembly_stats, write_assembly_report

    write_assembly_report(
        os.path.join(out_dir, "assembly_report.txt"), contigs)
    stats = assembly_stats(contigs)
    log.info(
        "meta assembly: %d contigs -> %s (canonicalized: n=%d total=%dbp "
        "longest=%d N50=%d)", len(contigs), out_dir, stats["n_contigs"],
        stats["total_bp"], stats["longest"], stats["n50"],
    )
