"""Stitching: join assembled contigs across zero-coverage gaps.

Mirrors the ``stitch`` command (``Pipelines.java:208-309`` +
``ReflexivDSStitching``): contigs re-enter the extension machinery as
reflexiv records together with "stitch k-mers" — k-mers counted at coverage 1
from the raw reads (the ones the main assembly's coverage filter discarded) —
for a ladder of k sizes (21 -> 31 -> 61). Each k pass can bridge gaps whose
flanks are unique at that k; the result feeds the next k pass
(``Assembly_stitched_<k>`` outputs).
"""
from __future__ import annotations

import logging
import os
from typing import List, Tuple

import numpy as np

from . import count as count_mod
from .assembler import initial_records_from_counts, run_extension_loop
from .contigs import emit_contigs
from .dynamic import dedup_contigs
from .params import Params
from .reassemble import inject_fragments, remove_fragment_kmers

log = logging.getLogger("reflexiv_tpu")

STITCH_KLIST = (21, 31, 61)  # Pipelines.java:208-309 ladder


def stitch_contigs(
    bases: np.ndarray,
    lengths: np.ndarray,
    contigs: List[str],
    params: Params,
    *,
    klist: Tuple[int, ...] = STITCH_KLIST,
    seed: int = 0,
) -> List[str]:
    """One stitching ladder over the given contig set."""
    import dataclasses

    current = contigs
    max_read = int(lengths.max()) if len(lengths) else 0
    for i, k in enumerate(k for k in klist if k + 2 < max_read):
        p = dataclasses.replace(params, k=k, min_kmer_coverage=1)
        recs = _stitch_records_from_table(params, k, p)
        if recs is None:
            # self-counted stitch k-mers. Deviation: the reference admits
            # strictly coverage-1 k-mers (``maxKmerCoverage=1``,
            # ``Pipelines.java:247-248``); here all read k-mers enter (a
            # superset — overlap among single-copy reads makes bridge
            # k-mers cov>=2). The precomputed-table path above is
            # reference-exact.
            kmers, counts = count_mod.count_kmers(
                bases, lengths, k=k, min_cov=1,
                max_cov=params.max_kmer_coverage,
            )
            recs, _n_live = initial_records_from_counts(kmers, counts, p)
        recs = remove_fragment_kmers(recs, current, k)
        recs = inject_fragments(recs, current, k)
        recs = run_extension_loop(recs, p, seed=seed + 7919 * i)
        emitted = emit_contigs(recs, min_contig=params.min_contig)
        current = dedup_contigs([s for _, s in emitted])
        log.info("stitch k=%d: %d contigs", k, len(current))
        if params.output_path:
            from .io import write_contigs_fasta, write_success_marker

            kdir = os.path.join(params.output_path, f"Assembly_stitched_{k}")
            write_contigs_fasta(
                os.path.join(kdir, "part-00000"),
                [(f">Contig-{len(s)}-{j}", s) for j, s in enumerate(current)],
                gzip_output=params.gzip_output,
            )
            write_success_marker(kdir)
    return current


def _stitch_records_from_table(params: Params, k: int, p: Params):
    """Reuse ``Stitch_kmer/Count_<k>_sorted`` from a prior ``reduce`` run
    (the ``_SUCCESS`` skip in ``reflexivDSLowCoverageCountingPipe``,
    ``Pipelines.java:250-308``): the table already carries both strands with
    fork-filter attrs. Returns None when absent."""
    if not params.output_path:
        return None
    from .io import has_success_marker

    sdir = os.path.join(
        params.output_path, "Stitch_kmer", f"Count_{k}_sorted")
    if not has_success_marker(sdir):
        return None
    import jax.numpy as jnp

    from .dynamic import read_sorted_set
    from .records import compact, make_records, next_pow2

    b, left, right = read_sorted_set(sdir, k)
    log.info("stitch k=%d: reusing %s (%d rows)", k, sdir, len(b))
    n = len(b)
    recs = make_records(
        seq=jnp.asarray(b.astype(np.uint8)),
        length=jnp.full(n, k, jnp.int32),
        left=jnp.asarray(left.astype(np.int32)),
        right=jnp.asarray(right.astype(np.int32)),
        live=jnp.ones(n, bool),
    )
    return compact(recs, max(next_pow2(n), 16))


def stitch(params: Params, *, seed: int = 0) -> None:
    """CLI driver for ``stitch``: requires -fastq reads and -frag contigs."""
    from .io import (expand_paths, iter_fasta, load_reads_filtered,
                     write_contigs_fasta, write_success_marker)

    if not params.input_contig:
        raise SystemExit("error: stitch requires -frag contig input")
    contigs = [
        s.decode() for _, s in iter_fasta(expand_paths(params.input_contig))
    ]
    mat, lens = load_reads_filtered(
        params.input_fastq or params.input_fasta, params)
    stitched = stitch_contigs(mat, lens, contigs, params, seed=seed)
    out_dir = os.path.join(
        params.output_path, f"Assembly_stitched_{STITCH_KLIST[-1]}"
    )
    rows = [(f">Contig-{len(s)}-{i}", s) for i, s in enumerate(stitched)]
    write_contigs_fasta(os.path.join(out_dir, "part-00000"), rows,
                        gzip_output=params.gzip_output)
    write_success_marker(out_dir)
    log.info("stitch: %d -> %d contigs", len(contigs), len(stitched))
