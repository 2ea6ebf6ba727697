"""Mercy k-mers: rescue sub-threshold k-mers bridging solid flanks.

Re-implements ``ReflexivDSDynamicMercyKmer`` (``:157-321``): a k-mer below
the coverage threshold is re-admitted ("mercy") when it sits inside a read
between two solid k-mers — low-coverage sequencing gaps inside otherwise
well-supported loci. Activated by ``-accurate`` in the dynamic pipeline
(``Pipelines.java:1388-1391``); the rescued set merges into the main table
the way ``Count_<k>_mercy`` is globbed with ``Count_<k>*``
(``Pipelines.java:1410``).

Vectorized form: count all k-mers (min_cov=1), join per-window counts back to
reads via a union-sort lookup, then flag windows that are non-solid but have
solid windows on both sides within the same read (prefix/suffix cummax).
"""
from __future__ import annotations

import functools
import logging
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import count as count_mod

log = logging.getLogger("reflexiv_tpu")


def lookup_counts(
    table_limbs: jnp.ndarray,   # (U, W) sorted or unsorted unique keys
    table_counts: jnp.ndarray,  # (U,)
    query_limbs: jnp.ndarray,   # (N, W)
    query_valid: jnp.ndarray,   # (N,)
) -> jnp.ndarray:
    """Per-query counts (0 when absent) via a union sort + forward fill."""
    U, W = table_limbs.shape
    N = query_limbs.shape[0]
    keys = jnp.concatenate([table_limbs, query_limbs], axis=0)
    is_table = jnp.concatenate(
        [jnp.ones(U, bool), jnp.zeros(N, bool)], axis=0
    )
    cnt = jnp.concatenate(
        [table_counts.astype(jnp.int32), jnp.zeros(N, jnp.int32)], axis=0
    )
    valid = jnp.concatenate([jnp.ones(U, bool), query_valid], axis=0)
    keyed = jnp.where(valid[:, None], keys, jnp.uint32(0xFFFFFFFF))
    # sort by key, table rows first within ties
    order = jnp.lexsort(
        (~is_table,) + tuple(keyed[:, i] for i in range(W - 1, -1, -1))
    )
    skey = keyed[order]
    s_table = is_table[order]
    s_cnt = cnt[order]
    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1)
    is_start = is_start.at[0].set(True)
    # forward-fill the table count within equal-key runs
    idx = jnp.arange(U + N, dtype=jnp.int32)
    run_id = jnp.cumsum(is_start.astype(jnp.int32))
    src = jnp.where(s_table, s_cnt, 0)
    run_cnt = jax.ops.segment_max(
        jnp.where(s_table, s_cnt, -1), run_id, num_segments=U + N + 1
    )
    filled = jnp.maximum(run_cnt[run_id], 0)
    out = jnp.zeros(U + N, jnp.int32).at[order].set(filled)
    return out[U:]


@functools.partial(jax.jit, static_argnames=("k", "min_cov"))
def _mercy_mask(
    bases: jnp.ndarray, lengths: jnp.ndarray,
    table_limbs: jnp.ndarray, table_counts: jnp.ndarray,
    *, k: int, min_cov: int,
):
    limbs, valid = count_mod.extract_canonical_kmers(bases, lengths, k=k)
    counts = lookup_counts(table_limbs, table_counts, limbs, valid)
    R = bases.shape[0]
    Wn = bases.shape[1] - k + 1
    solid = (counts >= min_cov).reshape(R, Wn) & valid.reshape(R, Wn)
    weak = (counts >= 1) & (counts < min_cov)
    weak = weak.reshape(R, Wn) & valid.reshape(R, Wn)
    solid_left = jnp.cumsum(solid.astype(jnp.int32), axis=1) > 0
    solid_right = (
        jnp.cumsum(solid[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1] > 0
    )
    mercy = weak & solid_left & solid_right & ~solid
    return limbs, mercy.reshape(R * Wn)


def mercy_kmer_table(
    bases: np.ndarray, lengths: np.ndarray, *, k: int, min_cov: int,
    max_cov: int = 10_000_000, block_rows: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Solid + mercy k-mer table for assembly under ``-accurate``.

    Scale-safe: the min_cov=1 table builds through the auto-streaming
    counter, and the per-read mercy mask runs in read-row blocks (each
    block's flank logic only needs its own rows + the global table), so no
    single pass exceeds the device window bound.
    """
    from .dynamic import STREAM_WINDOW_LIMIT, count_kmers_auto

    all_limbs, all_counts = count_kmers_auto(
        bases, lengths, k=k, min_cov=1, max_cov=max_cov
    )
    solid_mask = all_counts >= min_cov

    R, L = bases.shape
    Wn = max(L - k + 1, 0)
    # keep (table + block windows) under the single-pass sort bound
    budget = max(STREAM_WINDOW_LIMIT - len(all_counts), 1 << 20)
    rows = block_rows or max(1, min(R, budget // max(Wn, 1)))
    tl = jnp.asarray(all_limbs)
    tc = jnp.asarray(all_counts)
    mercy_parts = []
    for lo in range(0, R, rows):
        q_limbs, mercy = _mercy_mask(
            jnp.asarray(bases[lo: lo + rows]),
            jnp.asarray(lengths[lo: lo + rows]),
            tl, tc, k=k, min_cov=min_cov,
        )
        mercy_np = np.asarray(mercy)
        if mercy_np.any():
            mercy_parts.append(np.asarray(q_limbs)[mercy_np])

    # vectorized membership: view limb rows as void records
    mercy_rows = (
        np.unique(np.ascontiguousarray(np.concatenate(mercy_parts)), axis=0)
        if mercy_parts else np.zeros((0, all_limbs.shape[1]),
                                     all_limbs.dtype)
    )

    def _as_void(a):
        a = np.ascontiguousarray(a)
        return a.view([("", a.dtype)] * a.shape[1]).ravel()

    keep = solid_mask.copy()
    if len(mercy_rows):
        keep |= np.isin(_as_void(all_limbs), _as_void(mercy_rows))
    n_mercy = int(keep.sum() - solid_mask.sum())
    log.info("mercy k=%d: %d solid + %d mercy k-mers",
             k, int(solid_mask.sum()), n_mercy)
    return all_limbs[keep], all_counts[keep]


def mercy_assembly(params, *, seed: int = 0) -> None:
    """CLI driver for the ``mercy`` command (``MainOfMercy`` ->
    ``ReflexivDSMainMercy.assembly``): single-k assembly over the
    solid+mercy table."""
    import os
    from .assembler import assemble_from_counts
    from .io import load_reads_filtered, write_contigs_fasta, write_success_marker

    mat, lens = load_reads_filtered(
        params.input_fastq or params.input_fasta, params)
    limbs, counts = mercy_kmer_table(
        mat, lens, k=params.k, min_cov=params.min_kmer_coverage,
        max_cov=params.max_kmer_coverage,
    )
    contigs = assemble_from_counts(limbs, counts, params, seed=seed)
    out = params.output_path
    write_contigs_fasta(os.path.join(out, "part-00000"), contigs,
                        gzip_output=params.gzip_output)
    write_success_marker(out)
    log.info("mercy: %d contigs -> %s", len(contigs), out)
