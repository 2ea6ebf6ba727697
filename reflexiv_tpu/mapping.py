"""Contig-end extension by read mapping + consensus (minimap2 replacement).

The reference ships reads through an external ``minimap2`` binary to map them
onto contig ends and extends each end by read consensus
(``ReflexivDSDynamicKmerMapping``: driver-side index build ``:188-231``,
executor pipe ``DSJavaPipeMinimap2:1157-1267``, SAM consensus
``DSProcessSAMandExtendContigs:564-995``). Shelling out is replaced by exact
anchor seeding: the terminal ``ANCHOR`` bases of each contig end are looked
up in the read k-mer stream (both strands), and matching read suffixes vote
base-by-base; the end grows while coverage and majority stay above
threshold.
"""
from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import numpy as np

from .contigs import revcomp_str

log = logging.getLogger("reflexiv_tpu")

ANCHOR = 31           # seed length, = the reference's fixing k-mer size
MIN_SUPPORT = 2       # reads required to accept an extension column
MIN_MAJORITY = 0.7    # column majority fraction


class _WindowIndex:
    """uint64-packed k-mer -> (seq_idx, end_pos) lookups over all read
    windows, built with vectorized numpy instead of a per-window Python loop
    (k <= 31)."""

    def __init__(self, seqs: List[str], k: int):
        from .bitpack import encode_ascii

        self.k = k
        self.seqs = seqs
        keys = []
        sidx = []
        ends = []
        for i, s in enumerate(seqs):
            n = len(s)
            if n < k:
                continue
            codes = encode_ascii(
                np.frombuffer(s.encode(), np.uint8)).astype(np.uint64)
            W = n - k + 1
            vals = np.zeros(W, np.uint64)
            for j in range(k):
                vals = (vals << np.uint64(2)) | codes[j: j + W]
            keys.append(vals)
            sidx.append(np.full(W, i, np.int32))
            ends.append(np.arange(k, n + 1, dtype=np.int32))
        if keys:
            keys = np.concatenate(keys)
            order = np.argsort(keys, kind="stable")
            self.keys = keys[order]
            self.sidx = np.concatenate(sidx)[order]
            self.ends = np.concatenate(ends)[order]
        else:
            self.keys = np.zeros(0, np.uint64)
            self.sidx = np.zeros(0, np.int32)
            self.ends = np.zeros(0, np.int32)

    def lookup(self, kmer: str) -> List[Tuple[int, int]]:
        from .bitpack import encode_ascii

        codes = encode_ascii(np.frombuffer(kmer.encode(), np.uint8))
        val = np.uint64(0)
        for b in codes:
            val = (val << np.uint64(2)) | np.uint64(b)
        lo = np.searchsorted(self.keys, val, side="left")
        hi = np.searchsorted(self.keys, val, side="right")
        return [(int(self.sidx[j]), int(self.ends[j])) for j in range(lo, hi)]


def _consensus_extension(tails: List[str]) -> str:
    """Majority-vote consensus over ragged read tails."""
    if not tails:
        return ""
    out = []
    maxlen = max(len(t) for t in tails)
    for p in range(maxlen):
        col = [t[p] for t in tails if len(t) > p]
        if len(col) < MIN_SUPPORT:
            break
        best, n = max(
            ((b, col.count(b)) for b in "ACGT"), key=lambda x: x[1]
        )
        if n / len(col) < MIN_MAJORITY:
            break
        out.append(best)
    return "".join(out)


def end_extend(
    contigs: List[str],
    reads: List[str],
    *,
    anchor: int = ANCHOR,
    max_rounds: int = 8,
) -> List[str]:
    """Extend both ends of every contig by read-consensus votes.

    Works on the right end of the contig and of its reverse complement
    (= the left end); iterates because each round can expose a new terminal
    anchor.
    """
    # read anchor index over both strands, built once
    both_reads = reads + [revcomp_str(r) for r in reads]
    index = _WindowIndex(both_reads, anchor)

    def extend_right(seq: str) -> str:
        for _ in range(max_rounds):
            if len(seq) < anchor:
                return seq
            key = seq[-anchor:]
            hits = index.lookup(key)
            tails = [
                both_reads[i][end:] for i, end in hits
                if len(both_reads[i]) > end
            ]
            ext = _consensus_extension(tails)
            if not ext:
                return seq
            seq = seq + ext
        return seq

    out = []
    for s in contigs:
        s = extend_right(s)
        s = revcomp_str(extend_right(revcomp_str(s)))
        out.append(s)
    return out
