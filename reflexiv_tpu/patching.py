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
import os
import statistics
from collections import Counter, defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

from .bitpack import rolling_window_values as _rolling_keys
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
    acgt = set("ACGT")
    for ci, s in enumerate(contigs):
        w = min(END_WINDOW, len(s))
        regions = ((0, s[:w], 0), (len(s) - w, s[-w:], 1))
        for base, region, end in regions:
            for j in range(len(region) - k + 1):
                km = region[j: j + k]
                if not acgt.issuperset(km):
                    continue  # N (scaffold gap) windows never seed
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
    acgt = set("ACGT")
    for j in range(0, max(1, len(read) - k + 1), 7):  # strided seeds
        if not acgt.issuperset(read[j: j + k]):
            continue  # N-bearing seeds never match (N has no 2-bit code)
        hit = idx.get(read[j: j + k])
        if hit is not None:
            ci, end, pos, strand = hit
            pos5 = pos - j if strand == 0 else pos + k - 1 + j
            return ci, end, pos5, strand
    return None


def _ascii_matrix(strs: List[str]):
    """Raw ASCII byte matrix + lengths (pad 0) for a list of sequences."""
    n = len(strs)
    lens = np.fromiter((len(x) for x in strs), np.int32, count=n)
    L = int(lens.max()) if n else 0
    mat = np.zeros((n, L), np.uint8)
    for i, x in enumerate(strs):
        mat[i, : lens[i]] = np.frombuffer(x.encode(), np.uint8)
    return mat, lens


_ACGT_BYTE = np.zeros(256, bool)
for _c in b"ACGTacgt":
    _ACGT_BYTE[_c] = True


def _window_acgt_ok(ascii_mat: np.ndarray, k: int) -> np.ndarray:
    """(R, W) mask: window j of each row holds only ACGT bytes — N windows
    (scaffold gaps, low-quality reads) never index nor seed, matching the
    string path where an N-bearing key cannot equal an ACGT one."""
    R, L = ascii_mat.shape
    W = L - k + 1
    if W <= 0:
        return np.zeros((R, 0), bool)
    bad = ~_ACGT_BYTE[ascii_mat]
    csum = np.zeros((R, L + 1), np.int32)
    np.cumsum(bad, axis=1, out=csum[:, 1:])
    return (csum[:, k:] - csum[:, :-k]) == 0


class _EndIndexArrays:
    """Numeric end-window seed index: ``keys`` is the sorted uint64 2-bit
    value of every unambiguous end-window k-mer (both strands), with aligned
    payload arrays. Same contents as :func:`_end_index`, built with batched
    window gathers instead of a string-keyed dict (N bases encode as T here,
    so an N-bearing read seed can hit; the pipeline upstream never emits N)."""

    __slots__ = ("keys", "ci", "end", "pos", "strand")

    def __init__(self, keys, ci, end, pos, strand):
        self.keys, self.ci, self.end = keys, ci, end
        self.pos, self.strand = pos, strand


def _end_index_arrays(
    contigs: List[str], k: int = SEED_K, chunk: int = 4096
) -> Optional[_EndIndexArrays]:
    """Array equivalent of :func:`_end_index`, including its exact dedup
    rule: a key whose placements disagree on (contig, end) is dropped; the
    first placement in scan order (contig asc, head-then-tail, position asc,
    forward-then-rc) wins otherwise.

    The build is concat+lexsort+gather bound in numpy, so the threaded C++
    ``rfx_end_index`` is the default backend (identical contents); this
    numpy body is the oracle (forced by ``REFLEXIV_DEVICE_STAGES=0`` or
    ``REFLEXIV_NATIVE_PATCH=0``).
    """
    from .bitpack import encode_ascii

    C = len(contigs)
    if C == 0:
        return None
    if (os.environ.get("REFLEXIV_NATIVE_PATCH", "1") != "0"
            and os.environ.get("REFLEXIV_DEVICE_STAGES") != "0"
            and k <= 31):
        from . import native

        out = native.end_index_native(contigs, k=k, end_window=END_WINDOW)
        if out is not None:
            keys, ci, end, pos, strand = out
            if not len(keys):
                return None
            return _EndIndexArrays(keys, ci, end, pos, strand)
    w_all = [min(END_WINDOW, len(s)) for s in contigs]
    regions = (
        ([contigs[i][: w_all[i]] for i in range(C)],
         np.zeros(C, np.int64)),
        ([contigs[i][len(contigs[i]) - w_all[i]:] for i in range(C)],
         np.asarray([len(s) - w for s, w in zip(contigs, w_all)], np.int64)),
    )
    Wg = END_WINDOW - k + 1          # per-region seqno stride (j slots)
    parts: List[Tuple[np.ndarray, ...]] = []
    for region, (seqs, bases) in enumerate(regions):
        for lo in range(0, C, chunk):
            sl = seqs[lo: lo + chunk]
            amat, lens = _ascii_matrix(sl)
            if amat.shape[1] < k:
                continue
            fwd, rc = _rolling_keys(encode_ascii(amat), k)   # (n, W)
            W = fwd.shape[1]
            j = np.arange(W, dtype=np.int64)
            valid = j[None, :] < (lens[:, None].astype(np.int64) - k + 1)
            valid &= _window_acgt_ok(amat, k)
            ri, jj = np.nonzero(valid)
            ci = (lo + ri).astype(np.int64)
            pos = bases[lo + ri] + jj
            base_seq = (ci * 2 + region) * np.int64(2 * Wg) + jj * 2
            for strand, keys in ((0, fwd), (1, rc)):
                parts.append((
                    keys[ri, jj], ci, pos,
                    np.full(len(ri), region, np.int8),
                    np.full(len(ri), strand, np.int8),
                    base_seq + strand,
                ))
    if not parts:
        return None
    keys = np.concatenate([p[0] for p in parts])
    ci = np.concatenate([p[1] for p in parts])
    pos = np.concatenate([p[2] for p in parts])
    end = np.concatenate([p[3] for p in parts])
    strand = np.concatenate([p[4] for p in parts])
    seqno = np.concatenate([p[5] for p in parts])
    order = np.lexsort((seqno, keys))
    keys, ci, pos, end, strand = (
        keys[order], ci[order], pos[order], end[order], strand[order])
    grp_start = np.empty(len(keys), bool)
    grp_start[0] = True
    np.not_equal(keys[1:], keys[:-1], out=grp_start[1:])
    gid = np.cumsum(grp_start) - 1
    cie = ci * 2 + end
    first_cie = cie[grp_start][gid]
    n_groups = int(gid[-1]) + 1
    disagree = np.zeros(n_groups, bool)
    np.logical_or.at(disagree, gid, cie != first_cie)
    keep = grp_start & ~disagree[gid]
    return _EndIndexArrays(
        keys[keep], ci[keep], end[keep], pos[keep], strand[keep])


from .bitpack import revcomp_matrix as _rc_matrix  # noqa: E305


_DEV_MAP_FNS: dict = {}


def _dev_map_fns():
    """Jitted device kernel for the strided-seed read mapping (lazy build,
    cached)."""
    if _DEV_MAP_FNS:
        return _DEV_MAP_FNS
    import functools

    import jax
    import jax.numpy as jnp

    from .device_aux import searchsorted_2limb

    @functools.partial(jax.jit, static_argnames=("k", "stride"))
    def map_chunk(m, n, acgt, khi, klo, ici, iend, ipos, istrand, k, stride):
        R, L = m.shape
        Wn = L - k + 1
        hi = jnp.zeros((R, Wn), jnp.uint32)
        lo = jnp.zeros((R, Wn), jnp.uint32)
        for j in range(k):
            col = m[:, j: j + Wn].astype(jnp.uint32)
            bitpos = 2 * (k - 1 - j)
            if bitpos >= 32:
                hi = hi | (col << (bitpos - 32))
            else:
                lo = lo | (col << bitpos)
        seeds = jnp.arange(0, Wn, stride, dtype=jnp.int32)
        S = seeds.shape[0]
        qhi, qlo = hi[:, ::stride], lo[:, ::stride]
        n64 = n.astype(jnp.int32)
        valid = (seeds[None, :] < jnp.maximum(1, n64[:, None] - k + 1)) & (
            seeds[None, :] + k <= n64[:, None]) & acgt[:, ::stride]
        nk = khi.shape[0]
        p = searchsorted_2limb(
            khi, klo, qhi.reshape(-1), qlo.reshape(-1)).reshape(R, S)
        p = jnp.minimum(p, nk - 1)
        hit = (khi[p] == qhi) & (klo[p] == qlo) & valid
        got = hit.any(axis=1)
        first = jnp.argmax(hit, axis=1)
        rr = jnp.arange(R, dtype=jnp.int32)
        e = p[rr, first]
        j = seeds[first]
        pos5 = jnp.where(
            istrand[e] == 0, ipos[e] - j, ipos[e] + k - 1 + j)
        zero = jnp.int32(0)
        return (jnp.where(got, ici[e], zero),
                jnp.where(got, iend[e].astype(jnp.int32), zero),
                jnp.where(got, pos5, zero),
                jnp.where(got, istrand[e].astype(jnp.int32), zero),
                got)

    _DEV_MAP_FNS["map_chunk"] = map_chunk
    return _DEV_MAP_FNS


def _map_reads_arrays_device(
    mat: np.ndarray, lens: np.ndarray, idx: _EndIndexArrays,
    k: int = SEED_K, stride: int = 7, chunk: int = 1 << 20,
    acgt_ok: np.ndarray = None,
):
    """Device counterpart of :func:`_map_reads_arrays`: the rolling seed
    keys, two-limb index search and first-hit selection run jitted on the
    accelerator; chunks are padded to quantized row counts so compile
    shapes stay bounded (VERDICT r2 #2). The chunk is sized so a 1M-read
    mapping is ONE dispatch (VERDICT r3 #4 — per-chunk host syncs were the
    measured tunnel loss)."""
    import jax.numpy as jnp

    R, L = mat.shape
    out_ci = np.zeros(R, np.int64)
    out_end = np.zeros(R, np.int8)
    out_pos = np.zeros(R, np.int64)
    out_strand = np.zeros(R, np.int8)
    mapped = np.zeros(R, bool)
    if idx is None or len(idx.keys) == 0 or L < k:
        return out_ci, out_end, out_pos, out_strand, mapped
    fns = _dev_map_fns()
    khi = jnp.asarray((idx.keys >> np.uint64(32)).astype(np.uint32))
    klo = jnp.asarray((idx.keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    ici = jnp.asarray(idx.ci.astype(np.int32))
    iend = jnp.asarray(idx.end.astype(np.int32))
    ipos = jnp.asarray(idx.pos.astype(np.int32))
    istrand = jnp.asarray(idx.strand.astype(np.int32))
    Wn = L - k + 1
    if acgt_ok is None:
        acgt_all = np.ones((R, Wn), bool)
    else:
        acgt_all = acgt_ok
    for lo_r in range(0, R, chunk):
        hi_r = min(lo_r + chunk, R)
        n_rows = hi_r - lo_r
        cap = 4096
        while cap < n_rows:
            cap <<= 1
        cap = min(cap, chunk)
        pad = cap - n_rows
        m = np.zeros((cap, L), mat.dtype)
        m[:n_rows] = mat[lo_r:hi_r]
        n = np.zeros(cap, np.int32)
        n[:n_rows] = lens[lo_r:hi_r]
        ac = np.zeros((cap, Wn), bool)
        ac[:n_rows] = acgt_all[lo_r:hi_r]
        ci, ed, p5, st, got = fns["map_chunk"](
            jnp.asarray(m), jnp.asarray(n), jnp.asarray(ac),
            khi, klo, ici, iend, ipos, istrand, k=k, stride=stride)
        sl = slice(lo_r, hi_r)
        out_ci[sl] = np.asarray(ci)[:n_rows]
        out_end[sl] = np.asarray(ed)[:n_rows].astype(np.int8)
        out_pos[sl] = np.asarray(p5)[:n_rows]
        out_strand[sl] = np.asarray(st)[:n_rows].astype(np.int8)
        mapped[sl] = np.asarray(got)[:n_rows]
    return out_ci, out_end, out_pos, out_strand, mapped


def _map_reads_arrays(
    mat: np.ndarray, lens: np.ndarray, idx: _EndIndexArrays,
    k: int = SEED_K, stride: int = 7, chunk: int = 1 << 16,
    acgt_ok: np.ndarray = None,
):
    """Batched :func:`_map_read`: first strided seed hit per read.

    ``acgt_ok``: optional (R, L-k+1) window mask in this matrix's
    orientation — N-bearing seeds never match (the string path's behavior).
    Returns (ci, end, pos5, strand, mapped) arrays over all reads.

    Backend order mirrors correction (device > native > numpy): the device
    kernel only when the patching stage's evidence-driven default enables
    it, then the threaded C++ ``rfx_map_seeds``, then this numpy oracle.
    """
    from .device_aux import device_stage_default

    if device_stage_default("patching"):
        return _map_reads_arrays_device(
            mat, lens, idx, k=k, stride=stride, chunk=chunk,
            acgt_ok=acgt_ok)
    if (os.environ.get("REFLEXIV_NATIVE_PATCH", "1") != "0"
            and os.environ.get("REFLEXIV_DEVICE_STAGES") != "0"
            and idx is not None and len(idx.keys) and mat.shape[1] >= k):
        from . import native

        out = native.map_seeds_native(
            mat, lens, idx.keys, idx.ci, idx.end, idx.pos, idx.strand,
            k=k, stride=stride, acgt_ok=acgt_ok)
        if out is not None:
            return out
    R, L = mat.shape
    out_ci = np.zeros(R, np.int64)
    out_end = np.zeros(R, np.int8)
    out_pos = np.zeros(R, np.int64)
    out_strand = np.zeros(R, np.int8)
    mapped = np.zeros(R, bool)
    if idx is None or len(idx.keys) == 0 or L < k:
        return out_ci, out_end, out_pos, out_strand, mapped
    seeds = np.arange(0, L - k + 1, stride, dtype=np.int64)
    nk = len(idx.keys)
    for lo in range(0, R, chunk):
        m = mat[lo: lo + chunk]
        n = lens[lo: lo + chunk].astype(np.int64)
        keys = _rolling_keys(m, k, want_rc=False)[0][:, seeds]             # (r, S)
        valid = (seeds[None, :] < np.maximum(1, n[:, None] - k + 1)) & (
            seeds[None, :] + k <= n[:, None])
        if acgt_ok is not None:
            valid &= acgt_ok[lo: lo + chunk][:, seeds]
        p = np.minimum(np.searchsorted(idx.keys, keys), nk - 1)
        hit = (idx.keys[p] == keys) & valid
        got = hit.any(axis=1)
        first = np.argmax(hit, axis=1)
        rr = np.arange(len(m))
        e = p[rr, first]
        j = seeds[first]
        pos5 = np.where(
            idx.strand[e] == 0, idx.pos[e] - j, idx.pos[e] + k - 1 + j)
        sl = slice(lo, lo + len(m))
        out_ci[sl] = np.where(got, idx.ci[e], 0)
        out_end[sl] = np.where(got, idx.end[e], 0)
        out_pos[sl] = np.where(got, pos5, 0)
        out_strand[sl] = np.where(got, idx.strand[e], 0)
        mapped[sl] = got
    return out_ci, out_end, out_pos, out_strand, mapped


def _try_overlap_join(a: str, b: str, min_overlap: int) -> Optional[str]:
    """Join a's tail to b's head on the longest exact overlap (native
    memcmp scan when available — same result, no per-length slice
    allocations; shared by the batched and scalar paths, so parity between
    them is unaffected by the backend)."""
    if os.environ.get("REFLEXIV_NATIVE_PATCH", "1") != "0":
        from . import native

        o = native.best_overlap_native(a.encode(), b.encode(), min_overlap)
        if o is not None:
            return a + b[o:] if o else None
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
    from .bitpack import encode_ascii
    from .device_aux import device_stage_default

    native_ok = (not device_stage_default("patching")
                 and os.environ.get("REFLEXIV_NATIVE_PATCH", "1") != "0"
                 and os.environ.get("REFLEXIV_DEVICE_STAGES") != "0")
    mapped = None
    idx = None
    if native_ok and contigs:
        # hashed whole-front-end: index build (open-addressing hash, no
        # 100M-entry sort) + both-mate mapping in ONE native call;
        # output-identical to the sorted-index path (order-independent
        # dedup rule, see rfx_map_pairs_hashed)
        from . import native

        mapped = native.map_pairs_hashed_native(
            contigs, pairs, k=SEED_K, end_window=END_WINDOW, stride=7)
    if mapped is None:
        idx = _end_index_arrays(contigs)
    if mapped is None and idx is not None and native_ok:
        # sorted-index native mapping (fallback when the hashed entry is
        # unavailable): still skips the padded matrices and host revcomp
        from . import native

        mapped = native.map_pairs_native(
            pairs, idx.keys, idx.ci, idx.end, idx.pos, idx.strand,
            k=SEED_K, stride=7)
    if mapped is not None:
        c1, _e1, p1, s1, ok1, c2, _e2, p2, s2, ok2 = mapped
        len2 = np.fromiter(
            (len(r2) for _, r2 in pairs), np.int64, count=len(pairs))
    else:
        a1, l1 = _ascii_matrix([r1 for r1, _ in pairs])
        a2, l2 = _ascii_matrix([r2 for _, r2 in pairs])
        m1, m2 = encode_ascii(a1), encode_ascii(a2)
        c1, _e1, p1, s1, ok1 = _map_reads_arrays(
            m1, l1, idx, acgt_ok=_window_acgt_ok(a1, SEED_K))
        # r2 maps in reverse complement; ACGT-ness is complement-invariant
        # so the mask is the row-reversed one
        a2r = np.zeros_like(a2)
        if a2.shape[1]:
            col = l2[:, None].astype(np.int64) - 1 - np.arange(a2.shape[1])
            okc = col >= 0
            a2r = np.where(
                okc, a2[np.arange(len(l2))[:, None], np.clip(col, 0, None)],
                0,
            ).astype(np.uint8)
        c2, _e2, p2, s2, ok2 = _map_reads_arrays(
            _rc_matrix(m2, l2), l2, idx, acgt_ok=_window_acgt_ok(a2r, SEED_K))
        len2 = l2.astype(np.int64)
    ok = ok1 & ok2

    # same-contig, strand-consistent pairs observe the insert size
    sm = ok & (c1 == c2) & (s1 == s2)
    ins = np.where(s1 == 0, p2 + len2 - p1, p1 - p2 + len2)[sm]
    inserts = [int(x) for x in ins[(ins > 0) & (ins <= 4 * DEFAULT_INSERT)]]
    ins_med, ins_mad = estimate_insert(inserts)

    # cross-contig pairs vote for the junction their fragment implies
    x = np.nonzero(ok & (c1 != c2))[0]
    supported: List[Tuple[Tuple[int, int], Tuple[int, int], int, int]] = []
    if len(x):
        clen = np.asarray([len(s) for s in contigs], np.int64)
        xc1, xp1, xs1 = c1[x], p1[x], s1[x]
        xc2, xp2, xs2 = c2[x], p2[x], s2[x]
        xl2 = len2[x]
        end1 = np.where(xs1 == 0, 1, 0).astype(np.int64)
        d1 = np.where(xs1 == 0, clen[xc1] - xp1, xp1 + 1)
        end2 = np.where(xs2 == 0, 0, 1).astype(np.int64)
        d2 = np.where(xs2 == 0, xp2 + xl2, clen[xc2] - xp2 + xl2 - 1)
        pa, pb = xc1 * 2 + end1, xc2 * 2 + end2
        swap = pb < pa
        pa2 = np.where(swap, pb, pa)
        pb2 = np.where(swap, pa, pb)
        packed = (pa2 << np.int64(32)) | pb2
        gapv = np.int64(ins_med) - d1 - d2
        uniq, first, inv, cnt = np.unique(
            packed, return_index=True, return_inverse=True,
            return_counts=True)
        order = np.lexsort((gapv, inv))
        starts = np.zeros(len(uniq), np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        med = gapv[order][starts + cnt // 2]
        for u in np.argsort(first, kind="stable"):  # first-seen link order
            n = int(cnt[u])
            if n < min_links:
                continue
            gap = int(med[u])
            # implausible geometry: fragment cannot bridge ends further
            # apart than the insert allows, nor overlap deeper than a
            # whole end window
            if gap > ins_med + 3 * ins_mad or gap < -END_WINDOW:
                continue
            key = int(uniq[u])
            a_p, b_p = key >> 32, key & 0xFFFFFFFF
            supported.append(
                ((a_p // 2, a_p % 2), (b_p // 2, b_p % 2), n, gap))
    return _filter_and_join(contigs, supported, min_overlap, scaffold)


def _filter_and_join(contigs, supported, min_overlap, scaffold):
    """Unique-partner filter + join/scaffold execution over supported links
    (shared by the batched and scalar paths)."""
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


def patch_contigs_scalar(
    contigs: List[str],
    pairs: List[Tuple[str, str]],
    *,
    min_links: int = MIN_LINKS,
    min_overlap: int = MIN_OVERLAP,
    scaffold: bool = False,
) -> Tuple[List[str], List[Tuple[int, int, int, int, int, int]]]:
    """Per-read reference implementation (oracle for the batched path)."""
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
        if gap > ins_med + 3 * ins_mad or gap < -END_WINDOW:
            continue
        supported.append((a, b, n, gap))
    return _filter_and_join(contigs, supported, min_overlap, scaffold)
