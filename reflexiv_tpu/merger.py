"""Contig merger: remove redundant / reverse-complement-redundant contigs.

Mirrors the ``merger`` command (``ReflexivDSMerger.java``): parse contigs,
sort by length, and drop contigs contained in longer ones on either strand
(``DSMergeReverseComplementaryContigs:886``, ``DSMergeRedundantNonRCContigs:452``).
Containment is checked exactly on the host; the reference's
single-partition sorted scan becomes a longest-first sweep.
"""
from __future__ import annotations

import logging
import os
from typing import List, Tuple

from .dynamic import dedup_contigs
from .params import Params

log = logging.getLogger("reflexiv_tpu")


def merge_contigs(contigs: List[str]) -> List[str]:
    return dedup_contigs(contigs)


def merge_contigs_cmd(params: Params) -> None:
    from .io import (expand_paths, iter_fasta, write_contigs_fasta,
                     write_success_marker)

    pattern = params.input_fasta or params.input_contig
    if not pattern:
        raise SystemExit("error: merger requires -fasta contig input")
    contigs = [s.decode() for _, s in iter_fasta(expand_paths(pattern))]
    merged = merge_contigs(contigs)
    out_dir = os.path.join(params.output_path, "Merged")
    rows: List[Tuple[str, str]] = [
        (f">Contig-{len(s)}-{i}", s) for i, s in enumerate(merged)
    ]
    write_contigs_fasta(os.path.join(out_dir, "part-00000"), rows,
                        gzip_output=params.gzip_output)
    write_success_marker(out_dir)
    log.info("merger: %d -> %d contigs", len(contigs), len(merged))
