"""Single-k assembly driver: the TPU-native ``reflexiv run``.

Orchestrates the full flow of ``ReflexivDSMain.assembly``
(``ReflexivDSMain.java:123-357``):

  reads -> canonical k-mer count -> coverage filter -> RC expansion ->
  fork filters -> extension rounds to fixpoint -> contigs.

The Spark driver's sort/shuffle-per-round becomes a host loop over a jitted
sort+join round (:func:`reflexiv_tpu.extend.extension_round`); partition
``coalesce`` becomes array compaction; the fixpoint check mirrors the
count-every-3-iterations rule at ``ReflexivDSMain.java:297-326``.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import count as count_mod
from . import extend as extend_mod
from .contigs import emit_contigs
from .graph import build_initial_records
from .params import Params
from .records import (
    Records,
    compact,
    grow_seq,
    live_count,
    next_pow2,
)

log = logging.getLogger("reflexiv_tpu")


def initial_records_from_counts(
    kmer_limbs: np.ndarray, counts: np.ndarray, params: Params
) -> Tuple[Records, int]:
    """Counted k-mers -> compacted, fork-filtered record set."""
    recs, _marker = build_initial_records(
        jnp.asarray(kmer_limbs),
        jnp.asarray(counts),
        k=params.k,
        min_error=params.min_error_coverage,
    )
    n_live = live_count(recs)
    cap = max(next_pow2(n_live), 16)
    recs = compact(recs, cap)
    return recs, n_live


def run_extension_loop(
    recs: Records, params: Params, *, seed: int = 0
) -> Records:
    """Iterate sort->join rounds until fixpoint or ``max_iterations``.

    Fixpoint rule: from ``min_iterations`` on, stop once the live-record count
    has not changed for 6 consecutive rounds (a stricter version of the
    reference's every-3-rounds equality check, ``ReflexivDSMain.java:297-326``,
    robust to rounds where the random orientation draw happens to pair
    nothing).
    """
    import jax.numpy as jnp

    k = params.k
    stable_rounds = 0
    prev_count = live_count(recs)
    need = int(extend_mod.required_seq_capacity(recs, k))
    for it in range(1, params.max_iterations + 1):
        # grow sequence capacity ahead of the worst-case merge (power-of-two
        # jumps keep the number of compiled shape variants logarithmic)
        if need > recs.seq_capacity:
            recs = grow_seq(recs, next_pow2(need))
        recs, live_n, need_arr = extend_mod.extension_round_fused(
            recs, jnp.uint32(seed + it), k=k
        )
        n = int(live_n)
        need = int(need_arr)
        log.debug("round %d: %d live records", it, n)
        if n == prev_count:
            stable_rounds += 1
        else:
            stable_rounds = 0
            prev_count = n
        if it >= params.min_iterations and stable_rounds >= 6:
            break
        # compact at quarter occupancy (the reference's coalesce,
        # ReflexivDSMain.java:313-318; quarter threshold bounds recompiles)
        cap = recs.capacity
        if n <= cap // 4 and cap > 64:
            recs = compact(recs, max(next_pow2(n), 16))
    return recs


def assemble_from_counts(
    kmer_limbs: np.ndarray, counts: np.ndarray, params: Params, *, seed: int = 0
) -> List[Tuple[str, str]]:
    recs, n_live = initial_records_from_counts(kmer_limbs, counts, params)
    log.info("fork-filtered records: %d (from %d canonical k-mers)",
             n_live, len(counts))
    recs = run_extension_loop(recs, params, seed=seed)
    contigs = emit_contigs(recs, min_contig=params.min_contig)
    log.info("emitted %d contigs >= %d bp", len(contigs), params.min_contig)
    return contigs


def assemble_reads(
    bases: np.ndarray,
    lengths: np.ndarray,
    params: Params,
    *,
    seed: int = 0,
) -> List[Tuple[str, str]]:
    """Full single-k assembly from a read code matrix."""
    params.validate()
    kmers, counts = count_mod.count_kmers(
        bases,
        lengths,
        k=params.k,
        min_cov=params.min_kmer_coverage,
        max_cov=params.max_kmer_coverage,
        front_clip=params.front_clip,
        end_clip=params.end_clip,
    )
    log.info("counted %d solid canonical %d-mers", len(counts), params.k)
    return assemble_from_counts(kmers, counts, params, seed=seed)
