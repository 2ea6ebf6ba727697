"""2-bit packed mixed-k records: the production representation for ``meta``.

The byte-per-base :class:`reflexiv_tpu.dynamic.DynRecords` round moves 4x
more HBM traffic than necessary and compares prefixes base-by-base. This
module stores the mixed-k pool as uint32 limbs (16 bases per limb,
left-aligned, zero past ``2*length`` — the :mod:`reflexiv_tpu.packed`
invariant) and re-expresses the dynamic extension round
(``ReflexivDSDynamicKmerIteration``, ``DSExtendReflexivKmerToArrayLoop``
``:465`` with ``dynamicSubKmerComparator`` ``:740-768``) in limb space:

  * group keys are a fixed-width (kmin-1)-base funnel-shift window at the
    marker end (one gather + shift per limb);
  * the variable-length prefix comparison (reflected sub-kmer must prefix
    the forward sub-kmer) is a masked limb XOR — 2 uint32 ops per 16 bases
    instead of 16 byte compares;
  * the merge concatenation is :func:`reflexiv_tpu.packed.concat`.

Semantics are identical to :func:`reflexiv_tpu.dynamic
.dyn_extension_round_with_markers` (tested row-for-row against it); only
the sequence representation differs.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bitpack import mix32
from .join_core import first_per_segment, merge_gate
from .packed import (
    BASES_PER_LIMB,
    concat,
    extract_window,
    limbs_for,
    pack_seq_matrix,
    unpack_seq_matrix,
)


class PackedDynRecords(NamedTuple):
    seq: jnp.ndarray     # (N, LW) uint32, left-aligned 2-bit bases
    length: jnp.ndarray  # (N,) int32
    subk: jnp.ndarray    # (N,) int32 — sub-kmer (join overlap) length
    left: jnp.ndarray    # (N,) int32
    right: jnp.ndarray   # (N,) int32
    live: jnp.ndarray    # (N,) bool

    @property
    def capacity(self) -> int:
        return self.seq.shape[0]

    @property
    def limb_capacity(self) -> int:
        return self.seq.shape[1]

    @property
    def base_capacity(self) -> int:
        return self.seq.shape[1] * BASES_PER_LIMB


def from_dyn(d) -> PackedDynRecords:
    """Byte DynRecords -> packed (zeroing bases beyond each row's length)."""
    col = jnp.arange(d.seq.shape[1], dtype=jnp.int32)[None, :]
    clean = jnp.where(col < d.length[:, None], d.seq, 0)
    return PackedDynRecords(
        pack_seq_matrix(clean), d.length, d.subk, d.left, d.right, d.live
    )


def to_dyn(p: PackedDynRecords):
    from .dynamic import DynRecords

    return DynRecords(
        unpack_seq_matrix(p.seq, p.base_capacity),
        p.length, p.subk, p.left, p.right, p.live,
    )


_HOST_BLOCK_ROWS = 1 << 20


def to_dyn_host(p: PackedDynRecords):
    """Packed pool -> host (numpy) DynRecords WITHOUT materializing the
    unpacked byte matrix in HBM.

    ``to_dyn`` allocates a device (N, 4*limbs*16) uint8 matrix — at scale
    (tens of millions of rows after a 10 Mbp+ reduction) that transient is
    the measured single-chip OOM (round-3 campaign). Here only packed limb
    blocks cross the device boundary; unpacking happens per-block in numpy.
    """
    import numpy as np

    from .dynamic import DynRecords
    from .packed import unpack_seq_matrix_np

    N = p.capacity
    L = p.base_capacity
    seq = np.empty((N, L), np.uint8)
    for lo in range(0, N, _HOST_BLOCK_ROWS):
        hi = min(lo + _HOST_BLOCK_ROWS, N)
        seq[lo:hi] = unpack_seq_matrix_np(np.asarray(p.seq[lo:hi]), L)
    return DynRecords(
        seq, np.asarray(p.length), np.asarray(p.subk),
        np.asarray(p.left), np.asarray(p.right), np.asarray(p.live),
    )


def from_dyn_host(d) -> PackedDynRecords:
    """Host (numpy) DynRecords -> packed pool on device, packing per-block
    in numpy so only the 4x-smaller limb matrix is ever uploaded."""
    import numpy as np

    from .packed import pack_seq_matrix_np

    seq = np.asarray(d.seq)
    length = np.asarray(d.length)
    N, L = seq.shape
    LW = limbs_for(L)
    packed = np.empty((N, LW), np.uint32)
    col = np.arange(L)
    for lo in range(0, N, _HOST_BLOCK_ROWS):
        hi = min(lo + _HOST_BLOCK_ROWS, N)
        clean = np.where(col[None, :] < length[lo:hi, None], seq[lo:hi], 0)
        packed[lo:hi] = pack_seq_matrix_np(clean)
    return PackedDynRecords(
        jnp.asarray(packed), jnp.asarray(length),
        jnp.asarray(np.asarray(d.subk)), jnp.asarray(np.asarray(d.left)),
        jnp.asarray(np.asarray(d.right)), jnp.asarray(np.asarray(d.live)),
    )


def _limb_mask(nbases: jnp.ndarray, W: int) -> jnp.ndarray:
    """(N, W) uint32 mask covering the first ``nbases`` bases per row."""
    m = jnp.arange(W, dtype=jnp.int32)[None, :]
    bits = jnp.clip(2 * (nbases[:, None] - BASES_PER_LIMB * m), 0, 32)
    sh = jnp.clip(32 - bits, 0, 31).astype(jnp.uint32)
    return jnp.where(
        bits >= 32,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(bits > 0, jnp.uint32(0xFFFFFFFF) << sh, jnp.uint32(0)),
    )


def masked_prefix_eq(
    a: jnp.ndarray, b: jnp.ndarray, nbases: jnp.ndarray
) -> jnp.ndarray:
    """Rows of two left-aligned packed windows equal on their first
    ``nbases`` bases: per-limb masked XOR."""
    mask = _limb_mask(nbases, a.shape[1])
    return jnp.all(((a ^ b) & mask) == 0, axis=1)


def draw_markers_pdyn(p: PackedDynRecords, round_seed) -> jnp.ndarray:
    """Same draw as :func:`reflexiv_tpu.dynamic._draw_markers_dyn` (hash of
    first/last 16 bases + length + salt); bit-identical for pools holding
    >= 16 base columns (always true for the meta klist)."""
    n16 = min(16, p.base_capacity)
    head = extract_window(p.seq, jnp.zeros_like(p.length), n16)[:, 0]
    tail = extract_window(p.seq, jnp.maximum(p.length - n16, 0), n16)[:, 0]
    if n16 < BASES_PER_LIMB:
        head = head >> (32 - 2 * n16)
        tail = tail >> (32 - 2 * n16)
    salt = jnp.asarray(round_seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    h = mix32(
        head ^ ((tail << 16) | (tail >> 16))
        ^ p.length.astype(jnp.uint32) ^ salt
    )
    return jnp.where(p.live, 1 + (h & 1).astype(jnp.int32), 0)


def pdyn_extension_round_with_markers(
    p: PackedDynRecords,
    marker: jnp.ndarray,
    *,
    kmin: int,
    max_sub: int,
    unique_only: bool = False,
) -> PackedDynRecords:
    import os as _os

    on_tpu = "1" if jax.devices()[0].platform == "tpu" else "0"
    variadic = _os.environ.get("REFLEXIV_VARIADIC_EXTSORT", on_tpu) != "0"
    return _pdyn_round_impl(
        p, marker, kmin=kmin, max_sub=max_sub, unique_only=unique_only,
        variadic=variadic,
        partner_fill=variadic
        and _os.environ.get("REFLEXIV_PARTNER_FILL", on_tpu) != "0")


@functools.partial(
    jax.jit,
    static_argnames=("kmin", "max_sub", "unique_only", "variadic",
                     "partner_fill"),
)
def _pdyn_round_impl(
    p: PackedDynRecords,
    marker: jnp.ndarray,
    *,
    kmin: int,
    max_sub: int,
    unique_only: bool = False,
    variadic: bool = True,
    partner_fill: bool = False,
) -> PackedDynRecords:
    """One mixed-k sort -> join round in limb space.

    ``max_sub`` is a static bound on every live row's ``subk`` (the largest
    k in the list minus one); it sizes the prefix-comparison window.
    """
    N, LW = p.seq.shape
    gw = kmin - 1  # group key width

    key_start = jnp.where(marker == 1, 0, p.length - p.subk)
    keys = extract_window(p.seq, jnp.maximum(key_start, 0), gw)
    keys = jnp.where(p.live[:, None], keys, jnp.uint32(0xFFFFFFFF))
    Wp = keys.shape[1]
    SW = limbs_for(max_sub)
    # marker is a sort key (after the group key): forward rows lead their
    # segment, matching the byte oracle's tiebreak and enabling the
    # gather-free segmented-fill join below
    if variadic:
        # variadic stable sort moves every column directly; the
        # lexsort+gather form pays ~7 row-gathers at the TPU's ~0.5 GB/s
        # XLA gather floor (see packed.extension_round_packed)
        if partner_fill:
            # the prefix comparison needs each reflected partner's tail
            # sub-kmer window; extracting it BEFORE the sort and carrying
            # it as SW payload columns replaces a post-fill
            # extract_window over the full LW-wide filled sequence
            # (4*LW selects per row) with SW sort+fill columns —
            # identical values, and the cost no longer grows with record
            # length
            tailw = extract_window(
                p.seq, jnp.maximum(p.length - p.subk, 0), max_sub)
            tail_cols = tuple(tailw[:, i] for i in range(SW))
        else:
            tail_cols = ()
        ops = jax.lax.sort(
            tuple(keys[:, i] for i in range(Wp)) + (marker,)
            + tuple(p.seq[:, i] for i in range(LW))
            + (p.length, p.subk, p.left, p.right, p.live) + tail_cols,
            num_keys=Wp + 1,
        )
        skey = jnp.stack(ops[:Wp], axis=-1)
        smarker = ops[Wp]
        sseq = jnp.stack(ops[Wp + 1: Wp + 1 + LW], axis=-1)
        slen, ssub, sleft, sright, slive = ops[Wp + 1 + LW:
                                               Wp + 6 + LW]
        stail_cols = ops[Wp + 6 + LW:]
    else:
        order = jnp.lexsort(
            (marker,) + tuple(keys[:, i] for i in range(Wp - 1, -1, -1)))
        skey = keys[order]
        sseq = p.seq[order]
        slen = p.length[order]
        ssub = p.subk[order]
        sleft = p.left[order]
        sright = p.right[order]
        slive = p.live[order]
        smarker = marker[order]
        stail_cols = ()   # lexsort path re-extracts the tail post-join
    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1)
    is_start = is_start.at[0].set(True)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    idx = jnp.arange(N, dtype=jnp.int32)

    if partner_fill:
        from .join_core import segmented_fill

        fstart = is_start & (smarker == 1) & slive
        prev_m = jnp.roll(smarker, 1).at[0].set(0)
        rstart = slive & (smarker == 2) & (is_start | (prev_m != 2))
        fvalid, (f_left, f_right, f_len, f_sub, pos_f, *f_seq_cols) = \
            segmented_fill(
                fstart, seg,
                (sleft, sright, slen, ssub, idx) + tuple(
                    sseq[:, i] for i in range(LW)))
        rvalid, (r_left, r_right, r_len, r_sub, pos_r, *r_fill) = \
            segmented_fill(
                rstart, seg,
                (sleft, sright, slen, ssub, idx) + tuple(
                    sseq[:, i] for i in range(LW)) + tuple(stail_cols),
                reverse=True)
        r_seq_cols, r_tail_cols = r_fill[:LW], r_fill[LW:]
        has_pair = fvalid & rvalid
        f_seq = jnp.stack(f_seq_cols, axis=-1)
        r_seq = jnp.stack(r_seq_cols, axis=-1)
        r_tail_fill = (jnp.stack(r_tail_cols, axis=-1)
                       if r_tail_cols else None)
        if unique_only:
            # markers sorted: fwd rows are [seg_start, pos_r) and refl rows
            # [pos_r, next segment start) — counts come from positions, no
            # segment_sum scatter
            nxt = jnp.where(is_start, idx, N)
            next_start = jnp.roll(
                jax.lax.cummin(nxt, reverse=True), -1).at[-1].set(N)
            has_pair = has_pair & (pos_r - pos_f == 1) & \
                (next_start - pos_r == 1)
        i_am_fwd_base = fstart
        i_am_refl_base = rstart
    else:
        r_tail_fill = None
        fwd_first = first_per_segment(seg, slive & (smarker == 1), N)
        refl_first = first_per_segment(seg, slive & (smarker == 2), N)
        has_pair = (fwd_first < N) & (refl_first < N)
        if unique_only:
            n_fwd = jax.ops.segment_sum(
                (slive & (smarker == 1)).astype(jnp.int32), seg,
                num_segments=N)[seg]
            n_refl = jax.ops.segment_sum(
                (slive & (smarker == 2)).astype(jnp.int32), seg,
                num_segments=N)[seg]
            has_pair = has_pair & (n_fwd == 1) & (n_refl == 1)
        f = jnp.minimum(fwd_first, N - 1)
        r = jnp.minimum(refl_first, N - 1)
        f_len, f_sub, f_left, f_right = slen[f], ssub[f], sleft[f], sright[f]
        r_len, r_sub, r_left, r_right = slen[r], ssub[r], sleft[r], sright[r]
        f_seq = sseq[f]
        r_seq = sseq[r]
        i_am_fwd_base = idx == fwd_first
        i_am_refl_base = idx == refl_first

    f_ext = f_len - f_sub
    r_ext = r_len - r_sub
    extra = f_sub - r_sub

    # dynamicSubKmerComparator: refl sub-kmer must prefix the fwd sub-kmer
    f_head = f_seq[:, :SW]
    r_tail = (r_tail_fill if r_tail_fill is not None else
              extract_window(r_seq, jnp.maximum(r_len - r_sub, 0), max_sub))
    prefix_ok = masked_prefix_eq(f_head, r_tail, r_sub) & (r_sub <= f_sub)

    gate = merge_gate(
        f_left, f_right, r_left, r_right, f_ext, r_ext, extra=extra
    )
    merge = has_pair & prefix_ok & gate.merge

    merged_seq, new_len = concat(
        r_seq, r_len, f_seq, f_len, r_sub, LW
    )

    i_am_fwd = merge & i_am_fwd_base
    i_am_refl = merge & i_am_refl_base

    out_seq = jnp.where(i_am_fwd[:, None], merged_seq, sseq)
    out_len = jnp.where(i_am_fwd, new_len, slen)
    out_sub = jnp.where(i_am_fwd, f_sub, ssub)
    out_left = jnp.where(i_am_fwd, gate.new_left, sleft)
    out_right = jnp.where(i_am_fwd, gate.new_right, sright)
    out_live = slive & ~i_am_refl
    return PackedDynRecords(
        out_seq, out_len, out_sub, out_left, out_right, out_live
    )


@functools.partial(
    jax.jit, static_argnames=("kmin", "max_sub", "unique_only")
)
def pdyn_extension_round_fused(
    p: PackedDynRecords, round_seed: jnp.ndarray, *,
    kmin: int, max_sub: int, unique_only: bool = False,
):
    """Round + loop statistics in one compiled program (cf.
    ``dynamic.dyn_extension_round_fused``)."""
    marker = draw_markers_pdyn(p, round_seed)
    out = pdyn_extension_round_with_markers(
        p, marker, kmin=kmin, max_sub=max_sub, unique_only=unique_only
    )
    live_n = jnp.sum(out.live)
    lens = jnp.where(out.live, out.length, 0)
    top2 = jax.lax.top_k(lens, 2)[0]
    need = top2[0] + top2[1]
    return out, live_n, need


@functools.partial(jax.jit, static_argnames=("kmin",))
def bucket_hash_pdyn(seq, length, subk, live, round_seed, *, kmin: int):
    """32-bit hash of each live row's round group key (the (kmin-1)-base
    head/tail window the round sorts on).

    A forward record and its reflected partner extract the same window
    value from opposite ends, so equal-hash bucketing keeps every joinable
    pair in one bucket — the invariant behind the host-routed bucketed
    rounds that process an over-HBM-scale pool through the fixed-capacity
    fused round program (see ``dynamic._pdyn_round_bucketed_host``)."""
    p = PackedDynRecords(
        seq, length, subk, jnp.zeros_like(length), jnp.zeros_like(length),
        live)
    marker = draw_markers_pdyn(p, round_seed)
    gw = kmin - 1
    key_start = jnp.where(marker == 1, 0, length - subk)
    keys = extract_window(seq, jnp.maximum(key_start, 0), gw)
    h = jnp.zeros_like(keys[:, 0])
    for i in range(keys.shape[1]):
        h = mix32(h ^ keys[:, i])
    return h


@functools.partial(jax.jit, static_argnames=("kmin",))
def finished_mask_pdyn(p: PackedDynRecords, kmin: int) -> jnp.ndarray:
    """Mixed-k extendability prefilter (conservative).

    Any mixed-k join requires the forward head and the reflected tail to
    agree on their first (kmin-1) bases (the round's group key), so a record
    whose head key matches no live record's tail key — and vice versa — can
    never merge again and may be parked. Prefix-relation subtleties only
    *narrow* the true merge set, so this census never parks a mergeable
    record.
    """
    N = p.capacity
    gw = kmin - 1
    head = extract_window(p.seq, jnp.zeros_like(p.length), gw)
    tail = extract_window(
        p.seq, jnp.maximum(p.length - p.subk, 0), gw
    )
    keys = jnp.concatenate([head, tail], axis=0)
    is_tail = jnp.concatenate(
        [jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)]
    )
    live2 = jnp.concatenate([p.live, p.live])
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
    partnered = jnp.zeros(2 * N, dtype=bool).at[order].set(
        jnp.where(stail == 0, n_tails > 0, n_heads > 0)
    )
    return p.live & ~partnered[:N] & ~partnered[N:]


def _count_before(a_keys, a_live, b_keys, *, strict: bool) -> jnp.ndarray:
    """Per-b-row count of live a-rows with ``a_key <= b_key`` (``<`` when
    ``strict``), multi-limb big-endian keys. One fused lexsort + cumsum;
    on TPU the permutation rides the sort's payload columns and verdicts
    return via a second sort instead of gathers + an inverse-permutation
    scatter (the 0.5 GB/s floor)."""
    M, W = a_keys.shape
    Nb = b_keys.shape[0]
    keys = jnp.concatenate([a_keys, b_keys], axis=0)
    is_a = jnp.concatenate(
        [jnp.ones(M, bool), jnp.zeros(Nb, bool)])
    # tie order decides <= vs <: equal keys put a first for <=, b first for <
    tag = jnp.where(is_a == (not strict), 0, 1).astype(jnp.int32)
    contrib_pre = (is_a & jnp.concatenate(
        [a_live, jnp.zeros(Nb, bool)])).astype(jnp.int32)
    if jax.devices()[0].platform == "tpu":
        idx = jnp.arange(M + Nb, dtype=jnp.int32)
        ops = jax.lax.sort(
            tuple(keys[:, i] for i in range(W)) + (tag, contrib_pre, idx),
            num_keys=W + 1)
        contrib = ops[W + 1]
        sidx = ops[W + 2]
        c = jnp.cumsum(contrib) - contrib
        back = jax.lax.sort((sidx, c), num_keys=1)
        return back[1][M:]
    order = jnp.lexsort(
        (tag,) + tuple(keys[:, i] for i in range(W - 1, -1, -1)))
    contrib = contrib_pre[order]
    c = jnp.cumsum(contrib) - contrib      # a-rows strictly before this row
    out = jnp.zeros(M + Nb, jnp.int32).at[order].set(c)
    return out[M:]


@functools.partial(jax.jit, static_argnames=("max_sub",))
def finished_mask_pdyn_exact(
    p: PackedDynRecords, max_sub: int
) -> jnp.ndarray:
    """Variable-width mixed-k extendability census.

    A merge (``pdyn_extension_round_with_markers``) needs a reflected
    record's tail sub-kmer (its last ``subk`` bases) to prefix a forward
    record's head (its first ``subk`` bases). Each head/tail is therefore a
    trie interval of completions ``[key0000.., key3333..]`` of width
    ``subk``; a prefix relation between a head and a tail is exactly an
    interval intersection. A record is finished when no live tail interval
    intersects its head interval and no live head intersects its tail —
    counted with four sorted sweeps (#tails with ``t_lo <= h_hi`` minus
    #tails with ``t_hi < h_lo``, and symmetrically).

    Sharper than :func:`finished_mask_pdyn`'s fixed ``(kmin-1)``-window
    census — records colliding on the first kmin-1 bases but diverging
    within their sub-kmers now park. Still conservative: an intersection
    where the *head* strictly prefixes the longer tail is kept alive though
    unmergeable, and merge-gate attrs are ignored.
    """
    W = limbs_for(max_sub)
    zero = jnp.zeros_like(p.length)
    head = extract_window(p.seq, zero, max_sub)
    tail = extract_window(p.seq, jnp.maximum(p.length - p.subk, 0), max_sub)
    mask = _limb_mask(p.subk, W)
    h_lo, h_hi = head & mask, head | ~mask
    t_lo, t_hi = tail & mask, tail | ~mask
    live = p.live
    head_hits = _count_before(t_lo, live, h_hi, strict=False) - \
        _count_before(t_hi, live, h_lo, strict=True)
    tail_hits = _count_before(h_lo, live, t_hi, strict=False) - \
        _count_before(h_hi, live, t_lo, strict=True)
    return live & ~(head_hits > 0) & ~(tail_hits > 0)


def park_finished_pdyn(p: PackedDynRecords, fin, parked: list):
    """Move rows flagged by ``fin`` (host bool mask) into ``parked`` as
    ``(limbs, length, subk, left, right)`` tuples; returns the updated
    pool."""
    import numpy as np

    idx = np.nonzero(fin)[0]
    if len(idx):
        len_b = np.asarray(p.length)[idx]
        lim = limbs_for(int(len_b.max()))
        parked.append((
            np.asarray(p.seq)[idx, :lim].copy(), len_b,
            np.asarray(p.subk)[idx], np.asarray(p.left)[idx],
            np.asarray(p.right)[idx],
        ))
    return p._replace(live=p.live & ~jnp.asarray(fin))


def merge_parked_pdyn(p: PackedDynRecords, parked: list) -> PackedDynRecords:
    """Re-combine parked rows with the active pool (host-built)."""
    import numpy as np

    live = np.asarray(p.live)
    idx = np.nonzero(live)[0]
    n_active = len(idx)
    total = n_active + sum(len(b[1]) for b in parked)
    max_limbs = max(
        [p.limb_capacity] + [b[0].shape[1] for b in parked])
    cap = 16
    while cap < total:
        cap <<= 1
    seq = np.zeros((cap, max_limbs), np.uint32)
    length = np.zeros(cap, np.int32)
    subk = np.ones(cap, np.int32)
    left = np.zeros(cap, np.int32)
    right = np.zeros(cap, np.int32)
    new_live = np.zeros(cap, bool)
    seq[:n_active, : p.limb_capacity] = np.asarray(p.seq)[idx]
    length[:n_active] = np.asarray(p.length)[idx]
    subk[:n_active] = np.asarray(p.subk)[idx]
    left[:n_active] = np.asarray(p.left)[idx]
    right[:n_active] = np.asarray(p.right)[idx]
    new_live[:n_active] = True
    at = n_active
    for s_b, l_b, sk_b, lft_b, rgt_b in parked:   # batched block copies
        nb = len(l_b)
        seq[at: at + nb, : s_b.shape[1]] = s_b
        length[at: at + nb] = l_b
        subk[at: at + nb] = sk_b
        left[at: at + nb] = lft_b
        right[at: at + nb] = rgt_b
        new_live[at: at + nb] = True
        at += nb
    return PackedDynRecords(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(subk),
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(new_live),
    )


def compact_grow_pdyn(
    p: PackedDynRecords, live_n: int, need_bases: int
) -> PackedDynRecords:
    """Host-side capacity management between rounds (quantized like
    ``dynamic._compact_grow``: compact at quarter occupancy, grow limbs in
    power-of-two jumps)."""
    from .records import next_pow2

    need_limbs = limbs_for(need_bases)
    cap_limbs = max(next_pow2(need_limbs), p.limb_capacity)
    cap_rows = p.capacity
    if live_n <= cap_rows // 4 and cap_rows > 64:
        cap_rows = max(next_pow2(live_n), 16)
    if cap_rows == p.capacity and cap_limbs == p.limb_capacity:
        return p
    order = jnp.argsort(~p.live, stable=True)
    take = order[:cap_rows]
    seq = p.seq[take]
    if cap_limbs > seq.shape[1]:
        seq = jnp.pad(seq, ((0, 0), (0, cap_limbs - seq.shape[1])))
    return PackedDynRecords(
        seq, p.length[take], p.subk[take],
        p.left[take], p.right[take], p.live[take],
    )


@functools.partial(
    jax.jit, static_argnames=("kmin", "max_sub", "unique_only"))
def pdyn_round_indexed(
    head, tailw, head16, tail16, length, subk, left, right, live, oid,
    round_seed, *, kmin: int, max_sub: int, unique_only: bool = False,
):
    """One mixed-k join round over fixed-width row SUMMARIES — the device
    half of the host-resident bucketed phase.

    The fused round's program size (and remote compile time, and HBM
    footprint) grows with the pool's limb width because the variadic sort
    carries the full packed sequence as payload; on the remote-TPU tunnel
    the chipless AOT compiler SIGKILLs past ~16M-row shapes and takes tens
    of minutes once records grow past a few hundred bases (round-5 10 Mbp
    campaign). But the JOIN DECISION only ever reads fixed-width state:
    the (kmin-1)-base group window, the <= max_sub-base head/tail sub-kmer
    windows, length, subk and the two end attrs. This kernel sorts exactly
    that summary (2*limbs_for(max_sub)+7 u32 columns per row, independent
    of record length) and returns per-row merge instructions; the host
    owns the bytes and applies the splices (numpy streams at memory
    bandwidth). One program shape serves every round of every campaign.
    The reference's analog is the row-object shuffle feeding
    ``reflexivExtend`` (``ReflexivDSDynamicKmerIteration.java:465``).

    The marker draw is bit-identical to :func:`draw_markers_pdyn` given
    ``head16``/``tail16`` computed the way that function computes them.
    ``oid`` is the host row id (< 0 on padding rows). Returns
    ``(oid_sorted, action, partner, new_left, new_right)`` in sorted
    order: action 1 = this row absorbs ``partner`` (splice partner_seq ++
    this_seq[partner_subk:]), 2 = this row was absorbed, 0 = unchanged.
    """
    from .join_core import segmented_fill

    N, SW = head.shape
    gw = kmin - 1
    Wp = limbs_for(gw)

    salt = jnp.asarray(round_seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    h = mix32(
        head16 ^ ((tail16 << 16) | (tail16 >> 16))
        ^ length.astype(jnp.uint32) ^ salt)
    marker = jnp.where(live, 1 + (h & 1).astype(jnp.int32), 0)

    keys = jnp.where((marker == 1)[:, None], head[:, :Wp], tailw[:, :Wp])
    rem = gw - BASES_PER_LIMB * (Wp - 1)
    if rem < BASES_PER_LIMB:
        keys = keys.at[:, Wp - 1].set(
            keys[:, Wp - 1] & (jnp.uint32(0xFFFFFFFF) << (32 - 2 * rem)))
    keys = jnp.where(live[:, None], keys, jnp.uint32(0xFFFFFFFF))

    idx = jnp.arange(N, dtype=jnp.int32)
    ops = jax.lax.sort(
        tuple(keys[:, i] for i in range(Wp)) + (marker,)
        + tuple(head[:, i] for i in range(SW))
        + tuple(tailw[:, i] for i in range(SW))
        + (length, subk, left, right, live, oid),
        num_keys=Wp + 1)
    skey = jnp.stack(ops[:Wp], axis=-1)
    smarker = ops[Wp]
    off = Wp + 1
    shead = ops[off: off + SW]
    stail = ops[off + SW: off + 2 * SW]
    slen, ssub, sleft, sright, slive, soid = ops[off + 2 * SW:]

    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1).at[0].set(True)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1

    fstart = is_start & (smarker == 1) & slive
    prev_m = jnp.roll(smarker, 1).at[0].set(0)
    rstart = slive & (smarker == 2) & (is_start | (prev_m != 2))
    fvalid, (f_left, f_right, f_len, f_sub, pos_f, f_oid, *f_head_cols) = \
        segmented_fill(
            fstart, seg,
            (sleft, sright, slen, ssub, idx, soid) + tuple(shead))
    rvalid, (r_left, r_right, r_len, r_sub, pos_r, r_oid, *r_tail_cols) = \
        segmented_fill(
            rstart, seg,
            (sleft, sright, slen, ssub, idx, soid) + tuple(stail),
            reverse=True)
    has_pair = fvalid & rvalid
    f_head = jnp.stack(f_head_cols, axis=-1)
    r_tail = jnp.stack(r_tail_cols, axis=-1)
    if unique_only:
        nxt = jnp.where(is_start, idx, N)
        next_start = jnp.roll(
            jax.lax.cummin(nxt, reverse=True), -1).at[-1].set(N)
        has_pair = has_pair & (pos_r - pos_f == 1) & (next_start - pos_r == 1)

    f_ext = f_len - f_sub
    r_ext = r_len - r_sub
    extra = f_sub - r_sub
    prefix_ok = masked_prefix_eq(f_head, r_tail, r_sub) & (r_sub <= f_sub)
    gate = merge_gate(
        f_left, f_right, r_left, r_right, f_ext, r_ext, extra=extra)
    merge = has_pair & prefix_ok & gate.merge

    i_am_fwd = merge & fstart
    i_am_refl = merge & rstart
    action = jnp.where(i_am_fwd, 1, jnp.where(i_am_refl, 2, 0))
    partner = jnp.where(i_am_fwd, r_oid, -1)
    new_left = jnp.where(i_am_fwd, gate.new_left, sleft)
    new_right = jnp.where(i_am_fwd, gate.new_right, sright)
    return soid, action, partner, new_left, new_right
