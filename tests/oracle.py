"""Scalar Python oracles for the Reflexiv algorithm semantics.

Independent, direct-from-the-rules reimplementations (cited to the reference
in each function) used to validate the vectorized JAX kernels on small inputs.
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def revcomp(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s))


def canonical(s: str) -> str:
    """min(fwd, rc) under A<C<G<T ordering == 2-bit integer ordering.
    ReflexivDSMain.java:3998-4004."""
    rc = revcomp(s)
    return s if s <= rc else rc


def count_kmers(reads: Sequence[str], k: int,
                min_cov: int = 1, max_cov: int = 10_000_000,
                front_clip: int = 0, end_clip: int = 0) -> Dict[str, int]:
    """Canonical k-mer counting. ReflexivDSMain.java:3950-4023, 207-216."""
    counts: Counter = Counter()
    for read in reads:
        if len(read) - k - end_clip <= 1 or front_clip > len(read):
            continue
        body = read[front_clip: len(read) - end_clip]
        for i in range(len(body) - k + 1):
            counts[canonical(body[i: i + k])] += 1
    return {km: c for km, c in counts.items() if min_cov <= c <= max_cov}


def fork_filter(rows: List[Tuple[str, int, str]], min_error: int,
                blocked: int) -> Dict[str, Tuple[str, int, str, int]]:
    """One fork-filter pass over (group_key, cover, ext_base) rows.

    Vectorized-rule oracle (winner = lexmax(cover, ext); extendable iff all
    losers error-killable) mirroring DSFilterForkSubKmerWithErrorCorrection,
    ReflexivDSMain.java:3425-3484, with the order-independent strengthening
    described in reflexiv_tpu/graph.py.
    Returns {key: (key, cover, ext, attr)} for winners.
    """
    groups: Dict[str, List[Tuple[str, int, str]]] = {}
    for key, cover, ext in rows:
        groups.setdefault(key, []).append((key, cover, ext))
    out = {}
    for key, members in groups.items():
        winner = max(members, key=lambda m: (m[1], m[2]))
        losers = [m for m in members if m is not winner]
        if not losers:
            attr = -1 - winner[1]
        elif all(m[1] <= min_error and winner[1] >= 2 * m[1] for m in losers):
            attr = -1 - winner[1]
        else:
            attr = blocked
        out[key] = (key, winner[1], winner[2], attr)
    return out


class Rec:
    """A reflexiv record: full sequence + end attrs."""

    def __init__(self, seq: str, left: int, right: int):
        self.seq, self.left, self.right = seq, left, right

    def __repr__(self):
        return f"Rec({self.seq!r}, {self.left}, {self.right})"


def build_records(reads: Sequence[str], k: int, min_cov: int,
                  min_error: int, max_cov: int = 10_000_000) -> List[Rec]:
    """Counting + RC expansion + both fork-filter passes.
    ReflexivDSMain.java:221-251."""
    counted = count_kmers(reads, k, min_cov, max_cov)
    both: Dict[str, int] = {}
    for km, c in counted.items():
        both[km] = c
        both[revcomp(km)] = c

    fwd_rows = [(km[:-1], c, km[-1]) for km, c in both.items()]
    fwd_win = fork_filter(fwd_rows, min_error, blocked=k - 1)
    survivors = {}
    for km, c in both.items():
        w = fwd_win.get(km[:-1])
        if w and w[2] == km[-1] and w[1] == c:
            survivors[km] = (c, w[3])  # right attr

    refl_rows = [(km[1:], c, km[0]) for km, (c, _r) in survivors.items()]
    refl_win = fork_filter(refl_rows, min_error, blocked=k - 1)
    recs = []
    for km, (c, right) in survivors.items():
        w = refl_win.get(km[1:])
        if w and w[2] == km[0] and w[1] == c:
            recs.append(Rec(km, w[3], right))
    return recs


def try_merge(fwd: Rec, refl: Rec, k: int) -> Optional[Rec]:
    """Merge gate + attr propagation, ReflexivDSMain.java:3070-3086,3237-3318.
    ``fwd`` is keyed on its first k-1 bases, ``refl`` on its last k-1; both
    keys must already be equal."""
    sub = k - 1
    assert fwd.seq[:sub] == refl.seq[-sub:]
    f_ext = len(fwd.seq) - sub
    r_ext = len(refl.seq) - sub
    if fwd.left < 0 and refl.right < 0:
        bubble = -1
    elif fwd.left >= 0 and refl.right >= 0:
        bubble = -1
    elif fwd.left >= 0 and fwd.left - r_ext >= 0:
        bubble = fwd.left - r_ext
    elif refl.right >= 0 and refl.right - f_ext >= 0:
        bubble = refl.right - f_ext
    else:
        return None
    seq = refl.seq + fwd.seq[sub:]
    if bubble < 0:
        return Rec(seq, refl.left, fwd.right)
    if fwd.left > 0:
        return Rec(seq, bubble, fwd.right)
    return Rec(seq, refl.left, bubble)


def extension_round(recs: List[Rec], markers: Sequence[int],
                    k: int) -> List[Rec]:
    """One join round given explicit orientation draws (1=forward: key is
    prefix; 2=reflected: key is suffix). First forward + first reflected per
    key group merge if the gate passes; everyone else passes through."""
    sub = k - 1
    groups: Dict[str, List[int]] = {}
    for i, (rec, m) in enumerate(zip(recs, markers)):
        key = rec.seq[:sub] if m == 1 else rec.seq[-sub:]
        groups.setdefault(key, []).append(i)
    dead = set()
    out: List[Rec] = []
    replaced: Dict[int, Rec] = {}
    for key, members in groups.items():
        fwd_i = next((i for i in members if markers[i] == 1), None)
        refl_i = next((i for i in members if markers[i] == 2), None)
        if fwd_i is None or refl_i is None:
            continue
        merged = try_merge(recs[fwd_i], recs[refl_i], k)
        if merged is not None:
            replaced[fwd_i] = merged
            dead.add(refl_i)
    for i, rec in enumerate(recs):
        if i in dead:
            continue
        out.append(replaced.get(i, rec))
    return out


def assemble(reads: Sequence[str], k: int, min_cov: int, min_error: int,
             min_contig: int = 0, max_rounds: int = 150,
             seed: int = 1234) -> List[str]:
    """Tiny end-to-end oracle assembler (deterministic pseudo-random draws)."""
    import random

    rng = random.Random(seed)
    recs = build_records(reads, k, min_cov, min_error)
    stable = 0
    prev = len(recs)
    for _ in range(max_rounds):
        markers = [rng.choice((1, 2)) for _ in recs]
        recs = extension_round(recs, markers, k)
        if len(recs) == prev:
            stable += 1
        else:
            stable, prev = 0, len(recs)
        if stable >= 8:
            break
    return sorted(r.seq for r in recs if len(r.seq) >= min_contig)
