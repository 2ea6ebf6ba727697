"""Reassembly: extend pre-assembled fragments with reads.

Follows the coherent fragment-aware design of the legacy
``ReflexivReAssembler.assembly`` (``ReflexivReAssembler.java:99-292``): input
contigs are injected directly as long reflexiv records (both strands, free
ends) and unioned with the fork-filtered read k-mer records
(contig union at ``:205``); the standard extension loop then grows fragments
through read-graph paths. The DS-era ``ReflexivDSReAssembler`` instead counts
fragment k-mers alongside reads (``ReflexivDSReAssembler.java:430``) which
duplicates fragment interiors — we follow the legacy design and remove
interior-duplicate contigs with containment dedup at the end.
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import count as count_mod
from .assembler import initial_records_from_counts, run_extension_loop
from .bitpack import encode_ascii
from .contigs import emit_contigs, revcomp_str
from .dynamic import dedup_contigs
from .params import Params
from .records import Records, next_pow2

log = logging.getLogger("reflexiv_tpu")


def _fragment_kmer_set(fragments: List[str], k: int) -> set:
    """Canonical k-mer strings fully inside any fragment."""
    out = set()
    for f in fragments:
        for i in range(len(f) - k + 1):
            w = f[i: i + k]
            rc = revcomp_str(w)
            out.add(min(w, rc))
    return out


def remove_fragment_kmers(recs: Records, fragments: List[str], k: int) -> Records:
    """Kill k-mer records interior to a fragment: the injected fragment
    record replaces its own k-mer chain, so keeping both would assemble a
    parallel duplicate path that competes with the fragment for its junction
    partners and splits the contig. K-mers spanning a fragment boundary
    contain a base outside the fragment and are unaffected."""
    from .bitpack import decode_to_str

    interior = _fragment_kmer_set(fragments, k)
    if not interior:
        return recs
    seq = np.asarray(recs.seq)
    length = np.asarray(recs.length)
    live = np.asarray(recs.live).copy()
    for i in np.nonzero(live)[0]:
        if length[i] == k:
            s = decode_to_str(seq[i, :k])
            if min(s, revcomp_str(s)) in interior:
                live[i] = False
    return recs._replace(live=jnp.asarray(live))


def inject_fragments(
    recs: Records, fragments: List[str], k: int
) -> Records:
    """Union fragment records (both strands, free ends) into a record pool."""
    frags = [f for f in fragments if len(f) >= k]
    both = []
    for f in frags:
        both.append(f)
        both.append(revcomp_str(f))
    n_extra = len(both)
    if n_extra == 0:
        return recs
    max_len = max(len(f) for f in both)
    cap_rows = next_pow2(int(np.sum(np.asarray(recs.live))) + n_extra)
    cap_len = max(next_pow2(max_len), recs.seq_capacity)

    seq = np.zeros((cap_rows, cap_len), dtype=np.uint8)
    length = np.zeros(cap_rows, np.int32)
    left = np.zeros(cap_rows, np.int32)
    right = np.zeros(cap_rows, np.int32)
    live = np.zeros(cap_rows, bool)

    old_live = np.asarray(recs.live)
    idx = np.nonzero(old_live)[0]
    n_old = len(idx)
    seq[:n_old, : recs.seq_capacity] = np.asarray(recs.seq)[idx]
    length[:n_old] = np.asarray(recs.length)[idx]
    left[:n_old] = np.asarray(recs.left)[idx]
    right[:n_old] = np.asarray(recs.right)[idx]
    live[:n_old] = True

    for j, f in enumerate(both):
        i = n_old + j
        codes = encode_ascii(np.frombuffer(f.encode(), np.uint8))
        seq[i, : len(codes)] = codes
        length[i] = len(codes)
        left[i] = -1
        right[i] = -1
        live[i] = True

    return Records(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(left),
        jnp.asarray(right), jnp.asarray(live),
    )


def reassemble_arrays(
    bases: np.ndarray,
    lengths: np.ndarray,
    fragments: List[str],
    params: Params,
    *,
    seed: int = 0,
) -> List[Tuple[str, str]]:
    """Reads + fragments -> extended contigs."""
    kmers, counts = count_mod.count_kmers(
        bases, lengths, k=params.k,
        min_cov=params.min_kmer_coverage, max_cov=params.max_kmer_coverage,
        front_clip=params.front_clip, end_clip=params.end_clip,
    )
    recs, n_live = initial_records_from_counts(kmers, counts, params)
    log.info("reassembly: %d k-mer records + %d fragments", n_live,
             len(fragments))
    # the unioned pool pads every k-mer record to the longest fragment's
    # width: at campaign scale (20M records, megabase fragments) that is
    # a terabyte-class dense matrix. Guard with a byte budget: drop the
    # longest fragments from the dense union (they pass through untouched;
    # end-consensus extension + the fixing rejoin still act on their ends
    # downstream) until the projected pool fits, so fragment-scale contigs
    # keep their read-graph bridging even when one giant contig would have
    # blown the pool on its own.
    budget = int(os.environ.get("REFLEXIV_REASSEMBLE_BYTES", str(8 << 30)))
    keep = sorted(fragments, key=len)
    passthrough: List[str] = []
    while keep:
        cap_rows = next_pow2(max(n_live + 2 * len(keep), 1))
        cap_len = next_pow2(max(len(keep[-1]), params.k))
        if cap_rows * cap_len <= budget:
            break
        passthrough.append(keep.pop())
    if passthrough:
        log.warning(
            "reassembly pool exceeds REFLEXIV_REASSEMBLE_BYTES=%d; %d/%d"
            " longest fragments (>= %d bp) pass through read-graph"
            " reassembly untouched", budget, len(passthrough),
            len(fragments), min(len(f) for f in passthrough))
    if not keep:
        return [(f">Contig-{len(f)}-(-1,-1)-{i}", f)
                for i, f in enumerate(fragments)]
    fragments = keep
    recs = remove_fragment_kmers(recs, fragments, params.k)
    recs = inject_fragments(recs, fragments, params.k)
    recs = run_extension_loop(recs, params, seed=seed)
    contigs = emit_contigs(recs, min_contig=params.min_contig)
    # containment dedup preserves sequences verbatim, so record attrs survive
    # by lookup; ID format parity with TagRowContigID
    # (ReflexivDSMain.java:715-795): >Contig-<len>-(<left>,<right>)-<idx>
    attrs = {s: parse_contig_attrs(h) for h, s in contigs}
    deduped = dedup_contigs([s for _, s in contigs])
    out = []
    for i, s in enumerate(deduped):
        l, r = attrs.get(s, (0, 0))
        out.append((f">Contig-{len(s)}-({l},{r})-{i}", s))
    base = len(out)
    for j, f in enumerate(passthrough):
        out.append((f">Contig-{len(f)}-(-1,-1)-{base + j}", f))
    return out


def parse_contig_attrs(header: str) -> Tuple[int, int]:
    """Extract the (left, right) attribute pair from a contig header of the
    form ``>Contig-<len>-(<left>,<right>)-<idx>``; (0, 0) when absent."""
    lo = header.find("(")
    hi = header.find(")")
    if lo < 0 or hi < lo:
        return (0, 0)
    l, _, r = header[lo + 1: hi].partition(",")
    try:
        return (int(l), int(r))
    except ValueError:
        return (0, 0)


def reassemble(params: Params, *, seed: int = 0) -> None:
    """CLI driver for the ``reassembler`` command
    (cf. ``Pipelines.reflexivDSReAssemblerPipe``, ``Pipelines.java:182-206``)."""
    from .io import (expand_paths, iter_fasta, load_reads_filtered,
                     write_contigs_fasta, write_success_marker)

    if not params.input_contig:
        raise SystemExit("error: reassembler requires -frag contig input")
    fragments = [
        s.decode() for _, s in iter_fasta(expand_paths(params.input_contig))
    ]
    mat, lens = load_reads_filtered(
        params.input_fastq or params.input_fasta, params)
    contigs = reassemble_arrays(mat, lens, fragments, params, seed=seed)
    out_dir = os.path.join(params.output_path, f"Assemble_{params.k}")
    write_contigs_fasta(os.path.join(out_dir, "part-00000"), contigs,
                        gzip_output=params.gzip_output)
    write_success_marker(out_dir)
    log.info("reassembler: %d contigs -> %s", len(contigs), out_dir)
