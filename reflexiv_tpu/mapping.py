"""Contig-end extension by read mapping + consensus (minimap2 replacement).

The reference ships reads through an external ``minimap2`` binary to map them
onto contig ends and extends each end by read consensus
(``ReflexivDSDynamicKmerMapping``: driver-side index build ``:188-231``,
executor pipe ``DSJavaPipeMinimap2:1157-1267``, SAM consensus
``DSProcessSAMandExtendContigs:564-995``). Shelling out is replaced by exact
anchor seeding: the terminal ``ANCHOR`` bases of each contig end are looked
up in the read window index (both strands), and matching read suffixes vote
base-by-base; the end grows while coverage and majority stay above
threshold.

The index is built directly over the 2-bit read code matrix in row chunks —
no per-read Python strings — so the stage streams at production scale.
"""
from __future__ import annotations

import logging
from typing import List

import numpy as np

from .contigs import revcomp_str

log = logging.getLogger("reflexiv_tpu")

ANCHOR = 31           # seed length, = the reference's fixing k-mer size
MIN_SUPPORT = 2       # reads required to accept an extension column
MIN_MAJORITY = 0.7    # column majority fraction
CHUNK_ROWS = 65536    # index-construction row block


class _MatrixWindowIndex:
    """uint64-packed k-mer -> (read row, end position, strand) lookups over
    every window of a read code matrix, both strands, built with vectorized
    numpy shifts in row chunks (k <= 31).

    A hit ``(row, end, strand)`` means: on ``strand`` (0 = forward read,
    1 = reverse complement of the read), the window of the last ``k`` bases
    ending at ``end`` (exclusive) equals the queried k-mer. Tail bases after
    the hit are read straight out of the matrix (complemented/reversed on
    the fly for strand 1).
    """

    def __init__(self, bases: np.ndarray, lengths: np.ndarray, k: int):
        self.k = k
        self.bases = bases
        self.lengths = lengths.astype(np.int32)
        R, L = bases.shape
        W = max(L - k + 1, 0)
        key_parts, row_parts, end_parts, strand_parts = [], [], [], []
        from .bitpack import rolling_window_values

        for lo in range(0, R, CHUNK_ROWS):
            hi = min(lo + CHUNK_ROWS, R)
            chunk = bases[lo:hi]
            lens = self.lengths[lo:hi]
            n = hi - lo
            if W == 0 or n == 0:
                continue
            # forward windows: one rolling O(n*L) pass
            vals = rolling_window_values(chunk, k, want_rc=False)[0]
            ends = np.arange(k, L + 1, dtype=np.int32)[None, :]
            ok = ends <= lens[:, None]
            from .bitpack import revcomp_matrix

            rvals = rolling_window_values(
                revcomp_matrix(chunk, lens), k, want_rc=False)[0]
            rr, cc = np.nonzero(ok)
            row_chunk = (rr + lo).astype(np.int32)
            end_chunk = (cc + k).astype(np.int32)
            for strand, v in ((0, vals), (1, rvals)):
                key_parts.append(v[ok])
                row_parts.append(row_chunk)
                end_parts.append(end_chunk)
                strand_parts.append(np.full(len(rr), strand, np.int8))
        if key_parts:
            keys = np.concatenate(key_parts)
            order = np.argsort(keys)
            self.keys = keys[order]
            self.rows = np.concatenate(row_parts)[order]
            self.ends = np.concatenate(end_parts)[order]
            self.strands = np.concatenate(strand_parts)[order]
        else:
            self.keys = np.zeros(0, np.uint64)
            self.rows = np.zeros(0, np.int32)
            self.ends = np.zeros(0, np.int32)
            self.strands = np.zeros(0, np.int8)

    def lookup_codes(self, codes: np.ndarray):
        """codes: (k,) uint8 -> (rows, ends, strands) hit arrays."""
        val = np.uint64(0)
        for b in codes:
            val = (val << np.uint64(2)) | np.uint64(b)
        lo = np.searchsorted(self.keys, val, side="left")
        hi = np.searchsorted(self.keys, val, side="right")
        return self.rows[lo:hi], self.ends[lo:hi], self.strands[lo:hi]

    def tail_codes(self, row: int, end: int, strand: int, width: int):
        """Up to ``width`` base codes following the hit window."""
        n = int(self.lengths[row])
        if strand == 0:
            stop = min(end + width, n)
            return self.bases[row, end:stop]
        # strand 1: position p of the RC read maps to matrix column n-1-p
        stop = min(end + width, n)
        if stop <= end:
            return np.zeros(0, np.uint8)
        cols = n - 1 - np.arange(end, stop)
        return (self.bases[row, cols] ^ 3).astype(np.uint8)


class _DeviceWindowIndex:
    """Device-resident window index: sorted two-limb window keys over both
    strands with (row, end<<1|strand) payload, built and sorted on the
    accelerator (VERDICT r2 #2 — the numpy index build + argsort was the
    host-bound half of the end-extend stage).

    Same contents as :class:`_MatrixWindowIndex` for k <= 31: forward
    window j of read r contributes (fwd_value, r, end=j+k, strand=0); its
    reverse complement contributes (rc_value, r, end=n-j, strand=1) — the
    rc value of forward window j IS the window of the RC read ending at
    n-j, so one rolling pass yields both strands.
    """

    def __init__(self, bases: np.ndarray, lengths: np.ndarray, k: int):
        import functools

        import jax
        import jax.numpy as jnp

        self.k = k
        R, L = bases.shape
        self.L = L

        @functools.partial(jax.jit, static_argnames=("k",))
        def build(mat, lens, k):
            R, L = mat.shape
            Wn = L - k + 1
            fhi = jnp.zeros((R, Wn), jnp.uint32)
            flo = jnp.zeros((R, Wn), jnp.uint32)
            rhi = jnp.zeros((R, Wn), jnp.uint32)
            rlo = jnp.zeros((R, Wn), jnp.uint32)
            for j in range(k):
                col = mat[:, j: j + Wn].astype(jnp.uint32)
                bitpos = 2 * (k - 1 - j)
                if bitpos >= 32:
                    fhi = fhi | (col << (bitpos - 32))
                else:
                    flo = flo | (col << bitpos)
                rcpos = 2 * j
                if rcpos >= 32:
                    rhi = rhi | ((col ^ 3) << (rcpos - 32))
                else:
                    rlo = rlo | ((col ^ 3) << rcpos)
            ends_f = jnp.arange(k, L + 1, dtype=jnp.int32)[None, :]
            n = lens.astype(jnp.int32)[:, None]
            ok = ends_f <= n
            row = jnp.broadcast_to(
                jnp.arange(R, dtype=jnp.uint32)[:, None], (R, Wn))
            sent = jnp.uint32(0xFFFFFFFF)
            ends_r = n - (ends_f - k)  # rc-read end of forward window j
            keys_hi = jnp.concatenate(
                [jnp.where(ok, fhi, sent).reshape(-1),
                 jnp.where(ok, rhi, sent).reshape(-1)])
            keys_lo = jnp.concatenate(
                [jnp.where(ok, flo, sent).reshape(-1),
                 jnp.where(ok, rlo, sent).reshape(-1)])
            meta_f = (jnp.broadcast_to(ends_f, (R, Wn)).astype(jnp.uint32)
                      << 1)
            meta_r = (jnp.broadcast_to(ends_r, (R, Wn)).astype(jnp.uint32)
                      << 1) | 1
            meta = jnp.concatenate(
                [meta_f.reshape(-1), meta_r.reshape(-1)])
            rows = jnp.concatenate([row.reshape(-1), row.reshape(-1)])
            s = jax.lax.sort((keys_hi, keys_lo, rows, meta), num_keys=2)
            return s

        if L - k + 1 <= 0 or R == 0:
            z = jnp.zeros(0, jnp.uint32)
            self.keys_hi = self.keys_lo = self.rows = self.meta = z
            self.n_valid = 0
        else:
            khi, klo, rows, meta = build(
                jnp.asarray(bases), jnp.asarray(lengths), k)
            self.keys_hi, self.keys_lo = khi, klo
            self.rows, self.meta = rows, meta
            sent = np.uint32(0xFFFFFFFF)
            self.n_valid = int(jnp.sum(khi != sent))
        self.bases = jnp.asarray(bases)
        self.lengths = jnp.asarray(lengths.astype(np.int32))


def _device_round_fns():
    if _DEV_ROUND_FNS:
        return _DEV_ROUND_FNS
    import functools

    import jax
    import jax.numpy as jnp

    from .device_aux import expand_ranges, searchsorted_2limb

    @functools.partial(jax.jit, static_argnames=("k",))
    def anchor_keys(codes, k):
        C = codes.shape[0]
        hi = jnp.zeros(C, jnp.uint32)
        lo = jnp.zeros(C, jnp.uint32)
        for j in range(k):
            col = codes[:, j].astype(jnp.uint32)
            bitpos = 2 * (k - 1 - j)
            if bitpos >= 32:
                hi = hi | (col << (bitpos - 32))
            else:
                lo = lo | (col << bitpos)
        return hi, lo

    @jax.jit
    def hit_ranges(khi, klo, qhi, qlo):
        lo = searchsorted_2limb(khi, klo, qhi, qlo, side="left")
        hi = searchsorted_2limb(khi, klo, qhi, qlo, side="right")
        return lo, hi - lo

    @functools.partial(jax.jit, static_argnames=("cap",))
    def expand(lo, cnt, cap):
        return expand_ranges(lo, cnt, cap)

    @functools.partial(jax.jit, static_argnames=("C", "max_tail"))
    def votes(bases, lengths, rows_t, meta_t, ptr, owner, valid, counts,
              C, max_tail):
        """Accumulate per-(contig, column, base) votes for one hit chunk:
        tails gathered straight from the code matrix, votes contracted on
        the MXU via a (C, hits) one-hot owner matrix (one matmul per
        base)."""
        U = rows_t.shape[0]
        L = bases.shape[1]
        ptr = jnp.minimum(ptr, jnp.maximum(U - 1, 0))
        rows = rows_t[ptr].astype(jnp.int32)
        meta = meta_t[ptr]
        ends = (meta >> 1).astype(jnp.int32)
        strand = (meta & 1).astype(jnp.int32)
        n = lengths[rows]
        pos = jnp.arange(max_tail, dtype=jnp.int32)[None, :]
        colf = ends[:, None] + pos
        tvalid = (colf < n[:, None]) & valid[:, None]
        col = jnp.where(strand[:, None] == 0, colf, n[:, None] - 1 - colf)
        vals = bases[rows[:, None], jnp.clip(col, 0, L - 1)]
        vals = jnp.where(strand[:, None] == 1, vals ^ 3, vals)
        owner_oh = (owner[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None]
                    ).astype(jnp.bfloat16)
        parts = []
        for b in range(4):
            m = (tvalid & (vals == b)).astype(jnp.bfloat16)
            parts.append(jnp.dot(owner_oh, m,
                                 preferred_element_type=jnp.float32))
        return counts + jnp.stack(parts, axis=-1).astype(jnp.int32)

    @jax.jit
    def finalize(counts):
        tot = counts.sum(-1)
        best = counts.argmax(-1)
        bestc = jnp.take_along_axis(counts, best[..., None], -1)[..., 0]
        # integer-exact form of bestc/tot >= MIN_MAJORITY (numpy oracle
        # computes the f64 division; for realistic counts the two agree)
        ok = (tot >= MIN_SUPPORT) & (
            bestc * 10 >= jnp.int32(round(MIN_MAJORITY * 10)) * tot)
        ok = jnp.cumprod(ok.astype(jnp.int32), axis=1).astype(bool)
        ext_len = ok.sum(1)
        return best.astype(jnp.uint8), ext_len.astype(jnp.int32)

    _DEV_ROUND_FNS.update(anchor_keys=anchor_keys, hit_ranges=hit_ranges,
                          expand=expand, votes=votes, finalize=finalize)
    return _DEV_ROUND_FNS


_DEV_ROUND_FNS: dict = {}


def _batch_extensions_device(
    seqs: List[str],
    active: List[int],
    index: "_DeviceWindowIndex",
    anchor: int,
    max_tail: int,
    chunk: int = 1024,
) -> List[np.ndarray]:
    """Device counterpart of :func:`_batch_extensions`: anchor lookup by
    two-limb binary search, hit-tail gather and one-hot-matmul consensus
    all jitted; only the per-chunk hit total round-trips to the host."""
    import jax.numpy as jnp

    from .bitpack import encode_ascii

    fns = _device_round_fns()
    out: List[np.ndarray] = []
    for lo_c in range(0, len(active), chunk):
        ids = active[lo_c: lo_c + chunk]
        C = len(ids)
        # pad the query block to a power of two so compile shapes stay
        # quantized (padding repeats the first anchor; outputs discarded)
        Cp = 64
        while Cp < C:
            Cp <<= 1
        ids_p = ids + [ids[0]] * (Cp - C)
        tails_ascii = np.frombuffer(
            "".join(seqs[i][-anchor:] for i in ids_p).encode(), np.uint8
        ).reshape(Cp, anchor)
        codes = jnp.asarray(encode_ascii(tails_ascii))
        qhi, qlo = fns["anchor_keys"](codes, k=anchor)
        lo, cnt = fns["hit_ranges"](
            index.keys_hi, index.keys_lo, qhi, qlo)
        H = int(jnp.sum(cnt))
        if H == 0:
            out.extend(np.zeros(0, np.uint8) for _ in ids)
            continue
        HC = 1 << 17   # hit-chunk bound: caps the (C, hits) one-hot matmul
        cap_total = 256
        while cap_total < H:
            cap_total <<= 1
        chunk_sz = min(cap_total, HC)
        ptr, owner, valid = fns["expand"](lo, cnt, cap=cap_total)
        counts = jnp.zeros((Cp, max_tail, 4), jnp.int32)
        for off in range(0, cap_total, chunk_sz):
            counts = fns["votes"](
                index.bases, index.lengths, index.rows, index.meta,
                ptr[off: off + chunk_sz], owner[off: off + chunk_sz],
                valid[off: off + chunk_sz], counts, C=Cp, max_tail=max_tail)
        best, ext_len = fns["finalize"](counts)
        best_np = np.asarray(best)
        len_np = np.asarray(ext_len)
        for c in range(C):
            out.append(best_np[c, : len_np[c]])
    return out


def _consensus_codes(tails: List[np.ndarray]) -> np.ndarray:
    """Majority-vote consensus over ragged code tails."""
    if not tails:
        return np.zeros(0, np.uint8)
    maxlen = max(len(t) for t in tails)
    out = []
    for p in range(maxlen):
        col = np.array([t[p] for t in tails if len(t) > p], np.uint8)
        if len(col) < MIN_SUPPORT:
            break
        votes = np.bincount(col, minlength=4)
        best = int(votes.argmax())
        if votes[best] / len(col) < MIN_MAJORITY:
            break
        out.append(best)
    return np.asarray(out, np.uint8)


def _batch_extensions(
    seqs: List[str],
    active: List[int],
    index: _MatrixWindowIndex,
    anchor: int,
    max_tail: int,
    chunk: int = 1024,
) -> List[np.ndarray]:
    """One consensus round for every active contig at once.

    For each contig's terminal ``anchor``-mer, gathers ALL index hits, reads
    the hit tails straight out of the code matrix as one fancy-indexed
    ``(hits, max_tail)`` gather, and histograms votes per
    (contig, column, base) with a single ``bincount`` — the per-column
    Python loop of :func:`_consensus_codes` batched over contigs.
    Complexity per round: O(sum(hits) * max_tail) array work, no Python
    per contig beyond string slicing.
    """
    from .bitpack import encode_ascii

    L = index.bases.shape[1]
    out: List[np.ndarray] = []
    for lo_c in range(0, len(active), chunk):
        ids = active[lo_c: lo_c + chunk]
        C = len(ids)
        tails_ascii = np.frombuffer(
            "".join(seqs[i][-anchor:] for i in ids).encode(), np.uint8
        ).reshape(C, anchor)
        codes = encode_ascii(tails_ascii).astype(np.uint64)
        keys = np.zeros(C, np.uint64)
        for j in range(anchor):
            keys = (keys << np.uint64(2)) | codes[:, j]
        lo = np.searchsorted(index.keys, keys, side="left")
        hi = np.searchsorted(index.keys, keys, side="right")
        cnt = (hi - lo).astype(np.int64)
        H = int(cnt.sum())
        if H == 0:
            out.extend(np.zeros(0, np.uint8) for _ in ids)
            continue
        # flat hit pointers: for contig c, index.keys[lo[c]:hi[c]]
        seg_start = np.zeros(C, np.int64)
        np.cumsum(cnt[:-1], out=seg_start[1:])
        within = np.arange(H, dtype=np.int64) - np.repeat(seg_start, cnt)
        ptr = np.repeat(lo.astype(np.int64), cnt) + within
        hit_contig = np.repeat(np.arange(C, dtype=np.int64), cnt)
        rows = index.rows[ptr].astype(np.int64)
        ends = index.ends[ptr].astype(np.int64)
        strands = index.strands[ptr].astype(np.int64)
        n = index.lengths[rows].astype(np.int64)

        pos = np.arange(max_tail, dtype=np.int64)[None, :]
        colf = ends[:, None] + pos
        valid = colf < n[:, None]
        col = np.where(strands[:, None] == 0, colf, n[:, None] - 1 - colf)
        vals = index.bases[rows[:, None], np.clip(col, 0, L - 1)]
        vals = np.where(strands[:, None] == 1, vals ^ 3, vals).astype(np.int64)
        flat = ((hit_contig[:, None] * max_tail + pos) << 2) | vals
        counts = np.bincount(
            flat[valid], minlength=C * max_tail * 4
        ).reshape(C, max_tail, 4)
        tot = counts.sum(-1)
        best = counts.argmax(-1)
        bestc = np.take_along_axis(counts, best[..., None], -1)[..., 0]
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = bestc / np.maximum(tot, 1)
        ok = (tot >= MIN_SUPPORT) & (frac >= MIN_MAJORITY)
        ok = np.logical_and.accumulate(ok, axis=1)
        ext_len = ok.sum(1)
        for c in range(C):
            out.append(best[c, : ext_len[c]].astype(np.uint8))
    return out


def _extend_right_batch(
    seqs: List[str],
    index: _MatrixWindowIndex,
    anchor: int,
    max_rounds: int,
    max_tail: int,
) -> List[str]:
    from .bitpack import decode_to_str

    seqs = list(seqs)
    active = [i for i, s in enumerate(seqs) if len(s) >= anchor]
    batch_fn = (_batch_extensions_device
                if isinstance(index, _DeviceWindowIndex)
                else _batch_extensions)
    for _ in range(max_rounds):
        if not active:
            break
        exts = batch_fn(seqs, active, index, anchor, max_tail)
        nxt = []
        for i, ext in zip(active, exts):
            if len(ext):
                seqs[i] = seqs[i] + decode_to_str(ext)
                if len(seqs[i]) >= anchor:
                    nxt.append(i)
        active = nxt
    return seqs


def end_extend_arrays(
    contigs: List[str],
    bases: np.ndarray,
    lengths: np.ndarray,
    *,
    anchor: int = ANCHOR,
    max_rounds: int = 8,
    max_tail: int = 256,
) -> List[str]:
    """Extend both ends of every contig by read-consensus votes, reading
    evidence straight from the 2-bit read code matrix.

    Works on the right end of the contig and of its reverse complement
    (= the left end); iterates because each round can expose a new terminal
    anchor. Batched across contigs: each global round does one vectorized
    lookup + tail gather + bincount consensus over every still-growing
    contig (contigs do not interact — the read index is static — so the
    result equals the per-contig loop's).

    Unless ``REFLEXIV_DEVICE_STAGES=0``, the index lives on the accelerator
    (built and sorted there) and each round's lookup + tail gather + vote
    runs as jitted array programs (:func:`_batch_extensions_device`).
    """
    from .device_aux import device_stage_default

    if device_stage_default("end_extend"):
        index = _DeviceWindowIndex(
            np.asarray(bases), np.asarray(lengths), anchor)
    else:
        index = _MatrixWindowIndex(
            np.asarray(bases), np.asarray(lengths), anchor)
    seqs = _extend_right_batch(contigs, index, anchor, max_rounds, max_tail)
    seqs = _extend_right_batch(
        [revcomp_str(s) for s in seqs], index, anchor, max_rounds, max_tail)
    return [revcomp_str(s) for s in seqs]


def end_extend_arrays_scalar(
    contigs: List[str],
    bases: np.ndarray,
    lengths: np.ndarray,
    *,
    anchor: int = ANCHOR,
    max_rounds: int = 8,
    max_tail: int = 256,
) -> List[str]:
    """Per-contig reference implementation (oracle for the batched path)."""
    from .bitpack import decode_to_str, encode_ascii

    index = _MatrixWindowIndex(np.asarray(bases), np.asarray(lengths), anchor)

    def extend_right(seq: str) -> str:
        for _ in range(max_rounds):
            if len(seq) < anchor:
                return seq
            key = encode_ascii(
                np.frombuffer(seq[-anchor:].encode(), np.uint8))
            rows, ends, strands = index.lookup_codes(key)
            tails = [
                t for t in (
                    index.tail_codes(int(r), int(e), int(s), max_tail)
                    for r, e, s in zip(rows, ends, strands)
                ) if len(t)
            ]
            ext = _consensus_codes(tails)
            if not len(ext):
                return seq
            seq = seq + decode_to_str(ext)
        return seq

    out = []
    for s in contigs:
        s = extend_right(s)
        s = revcomp_str(extend_right(revcomp_str(s)))
        out.append(s)
    return out


def end_extend(
    contigs: List[str],
    reads: List[str],
    *,
    anchor: int = ANCHOR,
    max_rounds: int = 8,
) -> List[str]:
    """String-list convenience wrapper around :func:`end_extend_arrays`."""
    from .io import reads_to_matrix

    if not reads:
        return list(contigs)
    bases, lengths = reads_to_matrix([r.encode() for r in reads])
    return end_extend_arrays(
        contigs, bases, lengths, anchor=anchor, max_rounds=max_rounds
    )
