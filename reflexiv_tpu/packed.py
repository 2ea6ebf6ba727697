"""2-bit packed record sequences: the production representation.

Byte-per-base record matrices (:mod:`reflexiv_tpu.records`) are simple but
4x larger than necessary; at production scale the extension rounds are bound
by HBM traffic over the sequence matrix. This module stores record sequences
as uint32 limbs, 16 bases per limb, left-aligned (base j lives in limb
``j//16`` at bit ``30 - 2*(j%16)``) with the invariant that all bits past
``2*length`` are zero — so variable-offset window extraction and
concatenation reduce to vectorized funnel shifts over one or two gathered
limbs per output limb.

The packed extension round mirrors
:func:`reflexiv_tpu.extend.extension_round_with_markers` exactly (same sort,
segment-join, gating, and attr propagation — see that module for the
reference citations); only the sequence operations differ.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bitpack import mix32
from .records import Records

BASES_PER_LIMB = 16


def limbs_for(n_bases: int) -> int:
    return (n_bases + BASES_PER_LIMB - 1) // BASES_PER_LIMB


class PackedRecords(NamedTuple):
    seq: jnp.ndarray      # (N, LW) uint32, left-aligned 2-bit bases
    length: jnp.ndarray   # (N,) int32
    left: jnp.ndarray     # (N,) int32
    right: jnp.ndarray    # (N,) int32
    live: jnp.ndarray     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.seq.shape[0]

    @property
    def limb_capacity(self) -> int:
        return self.seq.shape[1]

    @property
    def base_capacity(self) -> int:
        return self.seq.shape[1] * BASES_PER_LIMB


def pack_seq_matrix(bases: jnp.ndarray) -> jnp.ndarray:
    """(N, L) uint8 codes -> (N, ceil(L/16)) uint32 left-aligned limbs.
    Caller guarantees codes beyond each row's length are zero."""
    N, L = bases.shape
    LW = limbs_for(L)
    pad = LW * BASES_PER_LIMB - L
    if pad:
        bases = jnp.pad(bases, ((0, 0), (0, pad)))
    grp = bases.reshape(N, LW, BASES_PER_LIMB).astype(jnp.uint32)
    out = jnp.zeros((N, LW), dtype=jnp.uint32)
    for i in range(BASES_PER_LIMB):
        out = out | (grp[:, :, i] << (30 - 2 * i))
    return out


def unpack_seq_matrix(seq: jnp.ndarray, L: int) -> jnp.ndarray:
    """(N, LW) uint32 -> (N, L) uint8 codes."""
    N, LW = seq.shape
    cols = []
    for i in range(BASES_PER_LIMB):
        cols.append(((seq >> (30 - 2 * i)) & 3).astype(jnp.uint8))
    out = jnp.stack(cols, axis=2).reshape(N, LW * BASES_PER_LIMB)
    return out[:, :L]


def pack_seq_matrix_np(bases: np.ndarray) -> np.ndarray:
    """Host (numpy) :func:`pack_seq_matrix` — same limb layout, no device.

    Used by the blockwise checkpoint writer and the host->packed pool
    builders so a large byte matrix never has to exist in HBM just to be
    packed."""
    N, L = bases.shape
    LW = limbs_for(L)
    pad = LW * BASES_PER_LIMB - L
    if pad:
        bases = np.pad(bases, ((0, 0), (0, pad)))
    grp = bases.reshape(N, LW, BASES_PER_LIMB).astype(np.uint32)
    out = np.zeros((N, LW), dtype=np.uint32)
    for i in range(BASES_PER_LIMB):
        out |= grp[:, :, i] << np.uint32(30 - 2 * i)
    return out


def unpack_seq_matrix_np(seq: np.ndarray, L: int) -> np.ndarray:
    """Host (numpy) :func:`unpack_seq_matrix`."""
    N, LW = seq.shape
    out = np.empty((N, LW, BASES_PER_LIMB), np.uint8)
    for i in range(BASES_PER_LIMB):
        out[:, :, i] = ((seq >> np.uint32(30 - 2 * i)) & 3).astype(np.uint8)
    return out.reshape(N, LW * BASES_PER_LIMB)[:, :L]


def from_records(recs: Records) -> PackedRecords:
    """Byte records -> packed records (zeroing bases beyond length)."""
    col = jnp.arange(recs.seq_capacity, dtype=jnp.int32)[None, :]
    clean = jnp.where(col < recs.length[:, None], recs.seq, 0)
    return PackedRecords(
        pack_seq_matrix(clean), recs.length, recs.left, recs.right, recs.live
    )


def to_records(p: PackedRecords) -> Records:
    return Records(
        unpack_seq_matrix(p.seq, p.base_capacity),
        p.length, p.left, p.right, p.live,
    )


_SELECT_GATHER_MAX_LW = 64


def _limb_lookup(seq: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """``take_along_axis(seq, clip(q), 1)`` with out-of-range -> 0, built
    from a column-select chain when the limb count is small.

    XLA lowers take_along_axis to a gather that runs ~1600x below HBM
    bandwidth on TPU (scripts/tpu_gather_probe.py); a chain of LW
    compare+selects is pure VPU work and beats it for the limb counts the
    extension rounds use. Falls back to the gather for very wide rows.
    """
    N, LW = seq.shape
    # TPU-only: on CPU the gather is fast and the unrolled select chain
    # explodes compile time at large limb counts
    if (LW > _SELECT_GATHER_MAX_LW
            or jax.devices()[0].platform != "tpu"):
        a = jnp.take_along_axis(seq, jnp.clip(q, 0, LW - 1), axis=1)
        return jnp.where((q >= 0) & (q < LW), a, 0)
    out = jnp.zeros(q.shape, dtype=seq.dtype)
    for c in range(LW):
        out = jnp.where(q == c, seq[:, c: c + 1], out)
    return out


def extract_window(
    seq: jnp.ndarray, start: jnp.ndarray, width: int
) -> jnp.ndarray:
    """Left-aligned packed window of ``width`` bases from per-row ``start``.

    Returns (N, limbs_for(width)) uint32; bits beyond ``2*width`` zeroed.
    One funnel shift over two looked-up limbs per output limb.
    """
    N, LW = seq.shape
    OW = limbs_for(width)
    q = (start // BASES_PER_LIMB).astype(jnp.int32)
    off2 = (2 * (start % BASES_PER_LIMB)).astype(jnp.uint32)
    m = jnp.arange(OW, dtype=jnp.int32)[None, :]
    qa = q[:, None] + m
    a = _limb_lookup(seq, qa)
    b = _limb_lookup(seq, qa + 1)
    o = off2[:, None]
    limb = jnp.where(o > 0, (a << o) | (b >> (32 - o)), a)
    # mask the final partial limb to `width` bases
    rem = width - BASES_PER_LIMB * (OW - 1)
    if rem < BASES_PER_LIMB:
        mask = jnp.uint32(0xFFFFFFFF) << (32 - 2 * rem)
        limb = limb.at[:, OW - 1].set(limb[:, OW - 1] & mask)
    return limb


def concat(
    seq_a: jnp.ndarray, len_a: jnp.ndarray,
    seq_b: jnp.ndarray, len_b: jnp.ndarray,
    skip: jnp.ndarray,
    out_limbs: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row ``a ++ b[skip:]`` on packed streams.

    Relies on the zero-beyond-length invariant of both inputs; preserves it.
    Returns (packed seq (N, out_limbs), total length).
    """
    N = seq_a.shape[0]
    total = len_a + len_b - skip
    m = jnp.arange(out_limbs, dtype=jnp.int32)[None, :]
    base0 = m * BASES_PER_LIMB                      # first base of out limb
    # part A: window of a at base0 (zeros beyond len_a by invariant)
    pa = _window_rows(seq_a, base0)
    # part B: stream b[skip:] placed at output base len_a
    # within out limb m, B starts at in-limb offset (len_a - base0) if
    # base0 < len_a else 0; B stream position = base0 - len_a (clamped)
    bpos = jnp.maximum(base0 - len_a[:, None], 0) + skip[:, None]
    pb = _window_rows_dyn(seq_b, bpos)
    shift = 2 * jnp.clip(len_a[:, None] - base0, 0, BASES_PER_LIMB)
    shift = shift.astype(jnp.uint32)
    pb = jnp.where(shift >= 32, 0, pb >> shift)
    out = pa | pb
    # zero limbs entirely past the total length + mask the partial limb
    valid_bases = jnp.clip(total[:, None] - base0, 0, BASES_PER_LIMB)
    tail_mask = jnp.where(
        valid_bases >= BASES_PER_LIMB,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(
            valid_bases > 0,
            jnp.uint32(0xFFFFFFFF) << (32 - 2 * valid_bases).astype(jnp.uint32),
            jnp.uint32(0),
        ),
    )
    return out & tail_mask, total


def _window_rows(seq: jnp.ndarray, base0: jnp.ndarray) -> jnp.ndarray:
    """16-base windows at static-per-column starts (base0 multiples of 16):
    a bounds-checked limb lookup. ``base0`` is (1, OW)-shaped and static
    per column, so this is really a pad-and-slice — but XLA sees dynamic
    indices; the select chain keeps it off the gather path."""
    N, LW = seq.shape
    q = base0 // BASES_PER_LIMB
    return _limb_lookup(seq, jnp.broadcast_to(q, (N, q.shape[1])))


def _window_rows_dyn(seq: jnp.ndarray, bpos: jnp.ndarray) -> jnp.ndarray:
    """16-base windows at arbitrary per-row/col starts: funnel over 2 limbs."""
    N, LW = seq.shape
    q = (bpos // BASES_PER_LIMB).astype(jnp.int32)
    o = (2 * (bpos % BASES_PER_LIMB)).astype(jnp.uint32)
    a = _limb_lookup(seq, q)
    b = _limb_lookup(seq, q + 1)
    return jnp.where(o > 0, (a << o) | (b >> (32 - o)), a)


def derive_keys_packed(
    p: PackedRecords, marker: jnp.ndarray, k: int
) -> jnp.ndarray:
    """Sort keys: packed (k-1)-base sub-kmer at the marker end (left-aligned
    limbs, fixed width) — dead rows get the all-ones sentinel."""
    sub = k - 1
    start = jnp.where(marker == 1, 0, p.length - sub).astype(jnp.int32)
    keys = extract_window(p.seq, jnp.maximum(start, 0), sub)
    return jnp.where(p.live[:, None], keys, jnp.uint32(0xFFFFFFFF))


def draw_markers_packed(p: PackedRecords, round_seed) -> jnp.ndarray:
    """Orientation draw matching :func:`reflexiv_tpu.extend.draw_markers`
    (hash of first/last 16 bases + length + salt). Bit-identical to the byte
    path whenever the byte records hold >= 16 sequence columns (always true
    for k >= 17; for smaller k the two paths draw differently but each is
    self-consistent)."""
    n16 = min(16, p.base_capacity)
    head = extract_window(p.seq, jnp.zeros_like(p.length), n16)[:, 0]
    tail = extract_window(
        p.seq, jnp.maximum(p.length - n16, 0), n16
    )[:, 0]
    # extend.draw_markers packs right-aligned (value = window as integer);
    # our windows are left-aligned in the limb: shift to match for n16 < 16
    if n16 < BASES_PER_LIMB:
        head = head >> (32 - 2 * n16)
        tail = tail >> (32 - 2 * n16)
    salt = jnp.asarray(round_seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    h = mix32(
        head ^ ((tail << 16) | (tail >> 16))
        ^ p.length.astype(jnp.uint32) ^ salt
    )
    return jnp.where(p.live, 1 + (h & 1).astype(jnp.int32), 0)


def compact_packed(p: PackedRecords, new_cap: int) -> PackedRecords:
    order = jnp.argsort(~p.live, stable=True)
    take = order[:new_cap]
    return PackedRecords(
        p.seq[take], p.length[take], p.left[take], p.right[take], p.live[take]
    )


def merge_parked_packed(p: PackedRecords, parked: list) -> PackedRecords:
    """Re-combine parked finished-row BATCHES ``(limbs, length, left,
    right)`` with the active set into a fresh host-built pool."""
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
    left = np.zeros(cap, np.int32)
    right = np.zeros(cap, np.int32)
    new_live = np.zeros(cap, bool)
    seq[:n_active, : p.limb_capacity] = np.asarray(p.seq)[idx]
    length[:n_active] = np.asarray(p.length)[idx]
    left[:n_active] = np.asarray(p.left)[idx]
    right[:n_active] = np.asarray(p.right)[idx]
    new_live[:n_active] = True
    at = n_active
    for s_b, l_b, lft_b, rgt_b in parked:   # batched block copies
        nb = len(l_b)
        seq[at: at + nb, : s_b.shape[1]] = s_b
        length[at: at + nb] = l_b
        left[at: at + nb] = lft_b
        right[at: at + nb] = rgt_b
        new_live[at: at + nb] = True
        at += nb
    return PackedRecords(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(left),
        jnp.asarray(right), jnp.asarray(new_live),
    )


def park_finished_rows(p: PackedRecords, fin: np.ndarray, parked: list):
    """Move rows flagged by ``fin`` (host bool mask) out of the active pool
    into the ``parked`` list (one batched entry per call — parking can
    flag millions of rows at production scale, so no per-row Python);
    returns the updated pool."""
    idx = np.nonzero(fin)[0]
    if len(idx):
        len_b = np.asarray(p.length)[idx]
        lim = limbs_for(int(len_b.max()))
        parked.append((
            np.asarray(p.seq)[idx, :lim].copy(), len_b,
            np.asarray(p.left)[idx], np.asarray(p.right)[idx],
        ))
    return p._replace(live=p.live & ~jnp.asarray(fin))


def grow_packed(p: PackedRecords, new_bases: int) -> PackedRecords:
    lw = limbs_for(new_bases)
    pad = lw - p.limb_capacity
    if pad <= 0:
        return p
    return p._replace(seq=jnp.pad(p.seq, ((0, 0), (0, pad))))


def finished_mask_packed(p: PackedRecords, k: int) -> jnp.ndarray:
    """Packed variant of :func:`reflexiv_tpu.extend.finished_mask`."""
    return _finished_mask_packed(
        p, k, scatter_free=jax.devices()[0].platform == "tpu")


@functools.partial(jax.jit, static_argnames=("k", "scatter_free"))
def _finished_mask_packed(
    p: PackedRecords, k: int, *, scatter_free: bool = False
) -> jnp.ndarray:
    """``scatter_free`` (TPU default) replaces the lexsort + gathers +
    segment_sum scatters + inverse-permutation scatter with two variadic
    stable sorts and two segmented boolean fills — the census at 1M records
    cost 0.272 s on-chip, ~8x one extension round after round 3's join
    rewrite, entirely in scatter/gather ops."""
    N = p.capacity
    ones = jnp.ones(N, dtype=jnp.int32)
    head = derive_keys_packed(p, ones, k)
    tail = derive_keys_packed(p, 2 * ones, k)
    keys = jnp.concatenate([head, tail], axis=0)
    is_tail = jnp.concatenate(
        [jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)]
    )
    live2 = jnp.concatenate([p.live, p.live])
    Wp = keys.shape[1]
    keyed = jnp.where(live2[:, None], keys, jnp.uint32(0xFFFFFFFF))
    if scatter_free:
        from .join_core import segmented_fill

        idx2 = jnp.arange(2 * N, dtype=jnp.int32)
        ops = jax.lax.sort(
            tuple(keyed[:, i] for i in range(Wp))
            + (is_tail, live2, idx2), num_keys=Wp + 1)
        skey = jnp.stack(ops[:Wp], axis=-1)
        stail, slive, sidx = ops[Wp], ops[Wp + 1], ops[Wp + 2]
        prev = jnp.roll(skey, 1, axis=0)
        is_start = jnp.any(skey != prev, axis=1).at[0].set(True)
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        # heads sort before tails within a segment (is_tail is a key)
        has_head, _ = segmented_fill(
            is_start & (stail == 0) & slive, seg, ())
        prev_t = jnp.roll(stail, 1).at[0].set(0)
        tstart = slive & (stail == 1) & (is_start | (prev_t != 1))
        has_tail, _ = segmented_fill(tstart, seg, (), reverse=True)
        partnered_sorted = slive & jnp.where(
            stail == 0, has_tail, has_head)
        back = jax.lax.sort((sidx, partnered_sorted), num_keys=1)
        per = back[1]
        return p.live & ~per[:N] & ~per[N:]
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


def extension_round_packed(p: PackedRecords, round_seed: jnp.ndarray, *, k: int):
    import os as _os

    # TPU-only defaults: XLA:CPU compiles/executes the many-operand
    # variadic sort and the associative_scan fills pathologically slowly
    # (minutes at scale), and the row-gathers they replace are only slow
    # on the TPU (~0.5 GB/s gather floor)
    on_tpu = "1" if jax.devices()[0].platform == "tpu" else "0"
    variadic = _os.environ.get("REFLEXIV_VARIADIC_EXTSORT", on_tpu) != "0"
    return _extension_round_packed(
        p, round_seed, k=k, variadic=variadic,
        partner_fill=variadic
        and _os.environ.get("REFLEXIV_PARTNER_FILL", on_tpu) != "0")


@functools.partial(
    jax.jit, static_argnames=("k", "variadic", "partner_fill"))
def _extension_round_packed(p: PackedRecords, round_seed: jnp.ndarray, *,
                            k: int, variadic: bool,
                            partner_fill: bool = False):
    """One packed sort -> join round + loop stats.

    Same algorithm as ``extend.extension_round_fused`` (see there for the
    reference mapping); sequence ops in limb space.
    """
    N, LW = p.seq.shape
    sub = k - 1
    marker = draw_markers_packed(p, round_seed)
    keys = derive_keys_packed(p, marker, k)
    Wp = keys.shape[1]

    if variadic:
        # one variadic stable sort carries every record column through the
        # comparison network directly — the lexsort+gather form below pays
        # ~6 row-gathers that run at ~0.5 GB/s on TPU (the measured XLA
        # random-gather floor, scripts/tpu_gather_probe.py), which
        # dominated the round at 1M records. Both forms are stable on
        # (keys, marker), so their outputs are bit-identical.
        ops = jax.lax.sort(
            tuple(keys[:, i] for i in range(Wp)) + (marker,)
            + tuple(p.seq[:, i] for i in range(LW))
            + (p.length, p.left, p.right, p.live),
            num_keys=Wp + 1,
        )
        skey = jnp.stack(ops[:Wp], axis=-1)
        smarker = ops[Wp]
        sseq = jnp.stack(ops[Wp + 1: Wp + 1 + LW], axis=-1)
        slen, sleft, sright, slive = ops[Wp + 1 + LW:]
    else:
        order = jnp.lexsort(
            (marker,) + tuple(keys[:, i] for i in range(Wp - 1, -1, -1))
        )
        skey = keys[order]
        smarker = marker[order]
        sseq = p.seq[order]
        slen = p.length[order]
        sleft = p.left[order]
        sright = p.right[order]
        slive = p.live[order]

    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1)
    is_start = is_start.at[0].set(True)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1

    from .join_core import first_per_segment, merge_gate, segmented_fill

    if partner_fill:
        # marker is a sort key, so within a live segment the (single) fwd
        # row is the segment start and the first refl row follows it.
        # Broadcast their fields with log-depth segmented fills instead of
        # first_per_segment (scatter-min) + 6 row-gathers — all of which
        # run at the ~0.5 GB/s XLA gather floor on TPU. Outputs are
        # bit-identical to the index form.
        fstart = is_start & (smarker == 1) & slive
        prev_m = jnp.roll(smarker, 1).at[0].set(0)
        rstart = slive & (smarker == 2) & (is_start | (prev_m != 2))
        fvalid, (f_left, f_right, f_len, *f_seq_cols) = segmented_fill(
            fstart, seg,
            (sleft, sright, slen) + tuple(
                sseq[:, i] for i in range(LW)))
        rvalid, (r_left, r_right, r_len, *r_seq_cols) = segmented_fill(
            rstart, seg,
            (sleft, sright, slen) + tuple(
                sseq[:, i] for i in range(LW)),
            reverse=True)
        has_pair = fvalid & rvalid
        f_seq = jnp.stack(f_seq_cols, axis=-1)
        r_seq = jnp.stack(r_seq_cols, axis=-1)
    else:
        idx = jnp.arange(N, dtype=jnp.int32)
        fwd_idx = first_per_segment(seg, slive & (smarker == 1), N)
        refl_idx = first_per_segment(seg, slive & (smarker == 2), N)
        has_pair = (fwd_idx < N) & (refl_idx < N)
        f = jnp.minimum(fwd_idx, N - 1)
        r = jnp.minimum(refl_idx, N - 1)
        f_left, f_right, f_len = sleft[f], sright[f], slen[f]
        r_left, r_right, r_len = sleft[r], sright[r], slen[r]
        f_seq = sseq[f]
        r_seq = sseq[r]

    gate = merge_gate(
        f_left, f_right, r_left, r_right, f_len - sub, r_len - sub
    )
    merge = has_pair & gate.merge
    new_left, new_right = gate.new_left, gate.new_right

    merged_seq, new_len = concat(
        r_seq, r_len, f_seq, f_len,
        jnp.full(N, sub, jnp.int32), LW,
    )

    if partner_fill:
        i_am_fwd = merge & fstart
        i_am_refl = merge & rstart
    else:
        i_am_fwd = merge & (idx == fwd_idx)
        i_am_refl = merge & (idx == refl_idx)

    out_seq = jnp.where(i_am_fwd[:, None], merged_seq, sseq)
    out_len = jnp.where(i_am_fwd, new_len, slen)
    out_left = jnp.where(i_am_fwd, new_left, sleft)
    out_right = jnp.where(i_am_fwd, new_right, sright)
    out_live = slive & ~i_am_refl
    out = PackedRecords(out_seq, out_len, out_left, out_right, out_live)

    live_n = jnp.sum(out_live)
    lens = jnp.where(out_live, out_len, 0)
    top2 = jax.lax.top_k(lens, 2)[0]
    need = top2[0] + top2[1] - sub
    return out, live_n, need
