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
        for lo in range(0, R, CHUNK_ROWS):
            hi = min(lo + CHUNK_ROWS, R)
            codes = bases[lo:hi].astype(np.uint64)
            lens = self.lengths[lo:hi]
            n = hi - lo
            if W == 0 or n == 0:
                continue
            # forward windows (in-place shift-OR: one (n, W) buffer)
            vals = np.zeros((n, W), np.uint64)
            for j in range(k):
                vals <<= np.uint64(2)
                vals |= codes[:, j: j + W]
            ends = np.arange(k, L + 1, dtype=np.int32)[None, :]
            ok = ends <= lens[:, None]
            # reverse-complement rows (per-row reversal via index gather)
            col = np.arange(L, dtype=np.int32)[None, :]
            rc_src = np.clip(lens[:, None] - 1 - col, 0, L - 1)
            rc = np.take_along_axis(codes, rc_src.astype(np.int64), axis=1) ^ 3
            rc[col >= lens[:, None]] = 0
            rvals = np.zeros((n, W), np.uint64)
            for j in range(k):
                rvals <<= np.uint64(2)
                rvals |= rc[:, j: j + W]
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
    anchor.
    """
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
