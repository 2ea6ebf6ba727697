"""Patching: read-pair-based contig connection (scaffolding joins).

Re-implements the intent of ``ReflexivDSDynamicKmerPatching`` (``:152-370``):
read pairs whose mates land on the end regions of two different contigs vote
for a connection (``ReadAndContigPairs:2146`` -> ``CreatCCPairs:1958`` ->
``CCPairsToConnections:1801``); sufficiently supported, unique connections
are then joined. The reference ships this stage disabled
(``Pipelines.java:1203-1229``); here it is available as an explicit API.

Joins are sequence-level: a supported connection is executed only when the
two end regions share an exact overlap (>= ``min_overlap``); otherwise the
link is reported but not forced (2-bit sequences cannot carry N-gaps).
"""
from __future__ import annotations

import logging
from collections import Counter, defaultdict
from typing import Dict, List, Tuple

from .contigs import revcomp_str

log = logging.getLogger("reflexiv_tpu")

END_WINDOW = 300     # bases of each contig end indexed for mate mapping
SEED_K = 31
MIN_LINKS = 2        # read pairs required to support a connection
MIN_OVERLAP = 10     # exact end overlap required to execute a join


def _end_index(contigs: List[str], k: int = SEED_K) -> Dict[str, Tuple[int, int]]:
    """k-mer -> (contig, end) where end 0 = head region, 1 = tail region.
    Ambiguous k-mers (several ends) are dropped."""
    idx: Dict[str, Tuple[int, int]] = {}
    dup = set()
    for ci, s in enumerate(contigs):
        w = min(END_WINDOW, len(s))
        regions = ((s[:w], 0), (s[-w:], 1))
        for region, end in regions:
            for j in range(len(region) - k + 1):
                km = region[j: j + k]
                for key in (km, revcomp_str(km)):
                    tag = (ci, end)
                    if key in idx and idx[key] != tag:
                        dup.add(key)
                    else:
                        idx[key] = tag
    for key in dup:
        idx.pop(key, None)
    return idx


def _map_read(read: str, idx, k: int = SEED_K):
    for j in range(0, max(1, len(read) - k + 1), 7):  # strided seeds
        hit = idx.get(read[j: j + k])
        if hit is not None:
            return hit
    return None


def _try_overlap_join(a: str, b: str, min_overlap: int) -> str | None:
    """Join a's tail to b's head on the longest exact overlap."""
    max_o = min(len(a), len(b))
    for o in range(max_o, min_overlap - 1, -1):
        if a[-o:] == b[:o]:
            return a + b[o:]
    return None


def patch_contigs(
    contigs: List[str],
    pairs: List[Tuple[str, str]],
    *,
    min_links: int = MIN_LINKS,
    min_overlap: int = MIN_OVERLAP,
) -> Tuple[List[str], List[Tuple[int, int, int, int, int]]]:
    """Connect contigs supported by read-pair links.

    Returns (contigs after executable joins, link table rows
    ``(contig_a, end_a, contig_b, end_b, n_links)`` for all supported
    connections, including those that could not be joined exactly).
    """
    idx = _end_index(contigs)
    votes: Counter = Counter()
    for r1, r2 in pairs:
        h1 = _map_read(r1, idx)
        h2 = _map_read(revcomp_str(r2), idx)
        if h1 is None or h2 is None or h1[0] == h2[0]:
            continue
        key = tuple(sorted([h1, h2]))
        votes[key] += 1

    supported = [
        (a, b, n) for (a, b), n in votes.items() if n >= min_links
    ]
    # unique-partner filter: an end may join at most one other end
    end_use: Counter = Counter()
    for a, b, _n in supported:
        end_use[a] += 1
        end_use[b] += 1
    supported = [
        (a, b, n) for a, b, n in supported
        if end_use[a] == 1 and end_use[b] == 1
    ]

    links = [(a[0], a[1], b[0], b[1], n) for a, b, n in supported]
    out = list(contigs)
    dead = set()
    for (ca, ea), (cb, eb), _n in supported:
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
    result = [s for i, s in enumerate(out) if i not in dead]
    return result, links
