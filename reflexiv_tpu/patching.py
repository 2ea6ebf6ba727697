"""Patching: read-pair-based contig connection (scaffolding joins).

Re-implements the intent of ``ReflexivDSDynamicKmerPatching`` (``:152-370``):
read pairs whose mates land on the end regions of two different contigs vote
for a connection (``ReadAndContigPairs:2146`` -> ``CreatCCPairs:1958`` ->
``CCPairsToConnections:1801``); sufficiently supported, unique connections
are then joined. The reference ships this stage disabled
(``Pipelines.java:1203-1229``); here it is available as an explicit API and
strengthens the link model:

  * **orientation-aware links**: mate mapping tracks the strand of every
    seed hit, so a pair only votes for the junction its fragment actually
    implies (r1 points off its contig end, the mate points into the other
    contig's entry end) — strand-inconsistent pairs are rejected instead of
    miscounted;
  * **insert-size model**: the insert length distribution is estimated from
    pairs landing within a single contig (median + MAD); each cross-contig
    pair then implies a gap estimate ``insert - d1 - d2``, links whose
    median gap is implausible are dropped, and the surviving link table
    reports the estimated gap.

Joins are sequence-level: a supported connection is executed only when the
two end regions share an exact overlap (>= ``min_overlap``); otherwise the
link is reported but not forced. With ``scaffold=True`` an overlap-less
supported link is instead executed as an N-gap scaffold join: the two ends
are concatenated around ``max(gap_estimate, MIN_GAP_N)`` ``N`` characters.
Scaffolded sequences exist only at this string/FASTA level — the 2-bit
device pipeline never sees them (N has no 2-bit code).
"""
from __future__ import annotations

import logging
import statistics
from collections import Counter, defaultdict
from typing import Dict, List, Optional, Tuple

from .contigs import revcomp_str

log = logging.getLogger("reflexiv_tpu")

END_WINDOW = 300     # bases of each contig end indexed for mate mapping
SEED_K = 31
MIN_LINKS = 2        # read pairs required to support a connection
MIN_OVERLAP = 10     # exact end overlap required to execute a join
DEFAULT_INSERT = 2 * END_WINDOW   # prior when no same-contig pairs exist
MIN_GAP_N = 10       # scaffold joins always leave at least this many Ns


def _end_index(
    contigs: List[str], k: int = SEED_K
) -> Dict[str, Tuple[int, int, int, int]]:
    """k-mer -> (contig, end, pos, strand); end 0 = head region, 1 = tail.

    ``pos`` is the k-mer start in contig coordinates; ``strand`` 0 means the
    key equals the contig substring, 1 means it equals its reverse
    complement. Ambiguous k-mers (several placements) are dropped.
    """
    idx: Dict[str, Tuple[int, int, int, int]] = {}
    dup = set()
    for ci, s in enumerate(contigs):
        w = min(END_WINDOW, len(s))
        regions = ((0, s[:w], 0), (len(s) - w, s[-w:], 1))
        for base, region, end in regions:
            for j in range(len(region) - k + 1):
                km = region[j: j + k]
                pos = base + j
                for strand, key in ((0, km), (1, revcomp_str(km))):
                    tag = (ci, end, pos, strand)
                    prev = idx.get(key)
                    if prev is not None and prev[:2] != tag[:2]:
                        dup.add(key)
                    elif prev is None:
                        idx[key] = tag
    for key in dup:
        idx.pop(key, None)
    return idx


def _map_read(read: str, idx, k: int = SEED_K):
    """First seed hit -> (contig, end, read 5' position in contig coords,
    strand of the read on the contig)."""
    for j in range(0, max(1, len(read) - k + 1), 7):  # strided seeds
        hit = idx.get(read[j: j + k])
        if hit is not None:
            ci, end, pos, strand = hit
            pos5 = pos - j if strand == 0 else pos + k - 1 + j
            return ci, end, pos5, strand
    return None


def _try_overlap_join(a: str, b: str, min_overlap: int) -> Optional[str]:
    """Join a's tail to b's head on the longest exact overlap."""
    max_o = min(len(a), len(b))
    for o in range(max_o, min_overlap - 1, -1):
        if a[-o:] == b[:o]:
            return a + b[o:]
    return None


def estimate_insert(samples: List[int]) -> Tuple[int, int]:
    """(median, MAD) of the insert distribution; prior when unobserved."""
    if len(samples) < 4:
        return DEFAULT_INSERT, DEFAULT_INSERT // 4
    med = int(statistics.median(samples))
    mad = int(statistics.median(abs(x - med) for x in samples)) or med // 10
    return med, mad


def read_pairs_from_params(params) -> List[Tuple[str, str]]:
    """Recover mate pairs from the command's read input, using the same
    pairing rules as preprocess (``ReflexivDataFrameDecompresser``):
    ``-inter`` pairs consecutive records; an exactly-two-file input pairs
    file1[i] with file2[i]. Anything else is unpaired -> []."""
    from .io import expand_paths, iter_fastq

    if not params.input_fastq:
        return []
    paths = expand_paths(params.input_fastq)
    if params.interleaved:
        rs = [r.decode() for r in iter_fastq(paths)]
        return list(zip(rs[0::2], rs[1::2]))
    if len(paths) == 2:
        r1 = [r.decode() for r in iter_fastq([paths[0]])]
        r2 = [r.decode() for r in iter_fastq([paths[1]])]
        if len(r1) != len(r2):
            log.warning(
                "patching: two input files with unequal read counts "
                "(%d vs %d) — not treating as mate pair", len(r1), len(r2))
            return []
        return list(zip(r1, r2))
    return []


def apply_patching(contigs, params):
    """Patching stage over emitted ``(header, seq)`` contigs: recover mate
    pairs from the input reads, vote for connections, join/scaffold.

    Returns (contigs, link table). A no-op (with a log line) when the input
    is not paired. The reference wires this stage into its steps pipe but
    ships it disabled (``Pipelines.java:1203-1229``); here it is the opt-in
    ``-patch``/``-scaffold`` stage of ``meta``.
    """
    pairs = read_pairs_from_params(params)
    if not pairs:
        log.info("patching: input is not paired; stage skipped")
        return list(contigs), []
    seqs = [s for _, s in contigs]
    patched, links = patch_contigs(
        seqs, pairs, scaffold=getattr(params, "scaffold", False))
    out = [
        (f">Contig-{len(s)}-(0,0)-{i}", s) for i, s in enumerate(patched)
    ]
    log.info(
        "patching: %d contigs -> %d (%d supported links)",
        len(seqs), len(out), len(links),
    )
    return out, links


def patch_contigs(
    contigs: List[str],
    pairs: List[Tuple[str, str]],
    *,
    min_links: int = MIN_LINKS,
    min_overlap: int = MIN_OVERLAP,
    scaffold: bool = False,
) -> Tuple[List[str], List[Tuple[int, int, int, int, int, int]]]:
    """Connect contigs supported by read-pair links.

    Returns (contigs after executable joins, link table rows
    ``(contig_a, end_a, contig_b, end_b, n_links, gap_estimate)`` for all
    supported connections, including those that could not be joined
    exactly). ``gap_estimate`` < 0 means the ends are expected to overlap.
    With ``scaffold=True``, supported links lacking an exact overlap are
    joined through a run of ``max(gap_estimate, MIN_GAP_N)`` Ns.
    """
    idx = _end_index(contigs)
    votes: Counter = Counter()
    gaps: defaultdict = defaultdict(list)
    inserts: List[int] = []
    for r1, r2 in pairs:
        m1 = _map_read(r1, idx)
        m2 = _map_read(revcomp_str(r2), idx)
        if m1 is None or m2 is None:
            continue
        c1, _e1, p1, s1 = m1
        c2, _e2, p2, s2 = m2
        if c1 == c2:
            # same-contig pair: an insert-size observation when the mates
            # agree on strand (fragment lies within one contig)
            if s1 == s2:
                ins = (p2 + len(r2) - p1) if s1 == 0 else (p1 - p2 + len(r2))
                if 0 < ins <= 4 * DEFAULT_INSERT:
                    inserts.append(ins)
            continue
        # fragment leaves c1 in its read direction and enters c2 heading to
        # the mate: junction ends + covered distances follow from strands
        end1 = 1 if s1 == 0 else 0
        d1 = (len(contigs[c1]) - p1) if s1 == 0 else (p1 + 1)
        end2 = 0 if s2 == 0 else 1
        d2 = (p2 + len(r2)) if s2 == 0 else (len(contigs[c2]) - p2 + len(r2) - 1)
        a, b = (c1, end1), (c2, end2)
        if b < a:
            a, b = b, a
        votes[(a, b)] += 1
        gaps[(a, b)].append((d1, d2))

    ins_med, ins_mad = estimate_insert(inserts)
    supported = []
    for (a, b), n in votes.items():
        if n < min_links:
            continue
        gap_samples = sorted(
            ins_med - d1 - d2 for d1, d2 in gaps[(a, b)]
        )
        gap = gap_samples[len(gap_samples) // 2]
        # implausible geometry: fragment cannot bridge ends further apart
        # than the insert allows, nor overlap deeper than a whole end window
        if gap > ins_med + 3 * ins_mad or gap < -END_WINDOW:
            continue
        supported.append((a, b, n, gap))

    # unique-partner filter: an end may join at most one other end
    end_use: Counter = Counter()
    for a, b, _n, _g in supported:
        end_use[a] += 1
        end_use[b] += 1
    supported = [
        (a, b, n, g) for a, b, n, g in supported
        if end_use[a] == 1 and end_use[b] == 1
    ]

    links = [(a[0], a[1], b[0], b[1], n, g) for a, b, n, g in supported]
    out = list(contigs)
    dead = set()
    for (ca, ea), (cb, eb), _n, g in supported:
        if ca in dead or cb in dead:
            continue
        # orient: join tail(a-oriented) -> head(b-oriented)
        sa = out[ca] if ea == 1 else revcomp_str(out[ca])
        sb = out[cb] if eb == 0 else revcomp_str(out[cb])
        joined = _try_overlap_join(sa, sb, min_overlap)
        if joined is not None:
            out[ca] = joined
            dead.add(cb)
            log.info("patching: joined contig %d and %d (overlap)", ca, cb)
        elif scaffold:
            out[ca] = sa + "N" * max(g, MIN_GAP_N) + sb
            dead.add(cb)
            log.info(
                "patching: scaffolded contig %d and %d (gap %d)", ca, cb, g)
    result = [s for i, s in enumerate(out) if i not in dead]
    return result, links
