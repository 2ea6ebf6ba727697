"""Contig emission and canonicalization helpers.

Mirrors ``DSKmerToContig`` + ``TagRowContigID``
(``ReflexivDSMain.java:715-795``): a record's contig is its full sequence
(sub-kmer + extension in either orientation — with our seq+length records the
orientation is already folded in), filtered by ``minContig`` and by the
repeat-kill marker (both attrs <= -10000000, ``ReflexivDSMain.java:749``).
IDs are ``>Contig-<len>-(<left>,<right>)-<idx>``.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .bitpack import decode_to_str
from .records import REPEAT_KILLED, Records, to_host


def emit_contigs(recs: Records, *, min_contig: int) -> List[Tuple[str, str]]:
    """Extract (id, sequence) pairs from final records (host-side)."""
    seq, length, left, right, live = to_host(recs)
    out: List[Tuple[str, str]] = []
    idx = 0
    for i in np.nonzero(live)[0]:
        n = int(length[i])
        if n < min_contig:
            continue
        if left[i] <= REPEAT_KILLED and right[i] <= REPEAT_KILLED:
            continue
        contig = decode_to_str(seq[i, :n])
        out.append((f">Contig-{n}-({int(left[i])},{int(right[i])})-{idx}", contig))
        idx += 1
    return out


def revcomp_str(s: str) -> str:
    comp = str.maketrans("ACGTacgt", "TGCAtgca")
    return s.translate(comp)[::-1]


def canonical_contig(s: str) -> str:
    """RC-canonical form for parity comparison: reference output orientation is
    scan-order dependent (SURVEY.md section 5), so contig-set equality is
    defined over min(seq, revcomp(seq))."""
    rc = revcomp_str(s)
    return s if s <= rc else rc


def canonical_set(contigs: List[Tuple[str, str]]) -> set:
    return {canonical_contig(seq) for _, seq in contigs}


def write_assembly_report(path: str, contigs: List[Tuple[str, str]]) -> dict:
    """QUAST-style plain-text report over the canonicalized contig set:
    summary block (counts, N50/L50, GC, length bands) + per-contig table.
    Returns the summary dict."""
    seqs = sorted(canonical_set(contigs), key=len, reverse=True)
    total = sum(len(s) for s in seqs)
    gc = sum(s.count("G") + s.count("C") for s in seqs)
    acc, n50, l50 = 0, 0, 0
    for i, s in enumerate(seqs):
        acc += len(s)
        if acc * 2 >= total and not n50:
            n50, l50 = len(s), i + 1
    bands = [(0, 1000), (1000, 10_000), (10_000, 100_000),
             (100_000, 1 << 62)]
    summary = {
        "n_contigs": len(seqs),
        "total_bp": total,
        "longest": len(seqs[0]) if seqs else 0,
        "n50": n50,
        "l50": l50,
        "gc_pct": round(100.0 * gc / total, 2) if total else 0.0,
    }
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write("# Assembly report (canonicalized contigs)\n")
        for key, val in summary.items():
            fh.write(f"{key}\t{val}\n")
        for lo, hi in bands:
            n = sum(1 for s in seqs if lo <= len(s) < hi)
            bp = sum(len(s) for s in seqs if lo <= len(s) < hi)
            label = f">={lo}" if hi > 1 << 61 else f"{lo}-{hi}"
            fh.write(f"contigs[{label}]\t{n}\t{bp}\n")
        fh.write("# per-contig: idx\tlength\tgc_pct\n")
        for i, s in enumerate(seqs):
            g = s.count("G") + s.count("C")
            fh.write(f"{i}\t{len(s)}\t{round(100.0 * g / len(s), 2)}\n")
    return summary


def assembly_stats(contigs: List[Tuple[str, str]]) -> dict:
    """Assembly metrics over the RC-canonicalized, deduplicated contig set.

    Note: the emitted FASTA contains one contig per strand (like the
    reference), so external tools see ~2x these numbers; canonicalized
    stats are the ones meaningful for parity comparison (BASELINE.md).
    """
    seqs = sorted(canonical_set(contigs), key=len, reverse=True)
    if not seqs:
        return {"n_contigs": 0, "total_bp": 0, "longest": 0, "n50": 0}
    total = sum(len(s) for s in seqs)
    acc, n50 = 0, 0
    for s in seqs:
        acc += len(s)
        if acc * 2 >= total:
            n50 = len(s)
            break
    return {
        "n_contigs": len(seqs),
        "total_bp": total,
        "longest": len(seqs[0]),
        "n50": n50,
    }
