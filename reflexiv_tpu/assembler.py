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
        bubble=params.bubble,
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

    Uses the 2-bit packed representation (:mod:`reflexiv_tpu.packed`) by
    default — 4x less HBM traffic than byte records; set
    ``REFLEXIV_BYTE_RECORDS=1`` to force the byte path.
    """
    import os as _os

    if _os.environ.get("REFLEXIV_BYTE_RECORDS") != "1":
        return _run_extension_loop_packed(recs, params, seed=seed)
    return _run_extension_loop_bytes(recs, params, seed=seed)


def _run_extension_loop_packed(
    recs: Records, params: Params, *, seed: int = 0
) -> Records:
    import numpy as _np

    from . import packed as pk

    k = params.k
    p = pk.from_records(recs)
    stable_rounds = 0
    prev_count = int(jnp.sum(p.live))
    need = 2 * int(jnp.max(jnp.where(p.live, p.length, 0))) - (k - 1)
    parked: list = []
    for it in range(1, params.max_iterations + 1):
        if need > p.base_capacity:
            p = pk.grow_packed(p, next_pow2(need))
        p, live_n, need_arr = pk.extension_round_packed(
            p, jnp.uint32(seed + it), k=k
        )
        n = int(live_n)
        need = int(need_arr)
        if n == prev_count:
            stable_rounds += 1
        else:
            stable_rounds = 0
            prev_count = n
        # exact-termination census (the head/tail partner census as the stop
        # rule): once the live count has been stable for 3 rounds — the
        # reference's check cadence, ReflexivDSMain.java:297-326 — ask
        # whether ANY live record still has a potential partner; none left
        # means no future round can merge, so stop exactly. The 12-stable
        # fallback covers self-partnered keys (circular/repeat ends) that
        # keep the census non-empty without ever merging.
        if stable_rounds >= 3 and stable_rounds % 3 == 0:
            fin = _np.asarray(pk.finished_mask_packed(p, k))
            if int(fin.sum()) == n:
                break
        if it >= params.min_iterations and stable_rounds >= 12:
            break
        if it % 8 == 0 and it >= 8:
            fin = _np.asarray(pk.finished_mask_packed(p, k))
            n_fin = int(fin.sum())
            if n_fin > max(32, p.capacity // 8):
                p = pk.park_finished_rows(p, fin, parked)
                n -= n_fin
                prev_count = n
        cap = p.capacity
        if n <= cap // 4 and cap > 64:
            p = pk.compact_packed(p, max(next_pow2(n), 16))

    from . import metrics

    metrics.current().set("run/extension_rounds", it)
    if parked:
        p = pk.merge_parked_packed(p, parked)
    return pk.to_records(p)


def _run_extension_loop_bytes(
    recs: Records, params: Params, *, seed: int = 0
) -> Records:
    import jax.numpy as jnp

    k = params.k
    stable_rounds = 0
    prev_count = live_count(recs)
    need = int(extend_mod.required_seq_capacity(recs, k))
    parked: list = []  # finished records moved out of the sort volume
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
        # exact-termination census (see _run_extension_loop_packed)
        if stable_rounds >= 3 and stable_rounds % 3 == 0:
            import numpy as _np

            fin = _np.asarray(extend_mod.finished_mask(recs, k))
            if int(fin.sum()) == n:
                break
        if it >= params.min_iterations and stable_rounds >= 12:
            break
        # park finished records (extendability prefilter,
        # ReflexivDSKmerProcessing64 analog): they leave the per-round sort
        if it % 8 == 0 and it >= 8:
            import numpy as _np

            fin = _np.asarray(extend_mod.finished_mask(recs, k))
            n_fin = int(fin.sum())
            if n_fin > max(32, recs.capacity // 8):
                seq_h = _np.asarray(recs.seq)
                len_h = _np.asarray(recs.length)
                left_h = _np.asarray(recs.left)
                right_h = _np.asarray(recs.right)
                for i in _np.nonzero(fin)[0]:
                    parked.append((
                        seq_h[i, : len_h[i]].copy(), int(left_h[i]),
                        int(right_h[i]),
                    ))
                recs = recs._replace(live=recs.live & ~jnp.asarray(fin))
                n = n - n_fin
                prev_count = n
                log.debug("round %d: parked %d finished records", it, n_fin)
        # compact at quarter occupancy (the reference's coalesce,
        # ReflexivDSMain.java:313-318; quarter threshold bounds recompiles)
        cap = recs.capacity
        if n <= cap // 4 and cap > 64:
            recs = compact(recs, max(next_pow2(n), 16))

    if parked:
        recs = _merge_parked(recs, parked)
    return recs


def _merge_parked(recs: Records, parked: list) -> Records:
    """Re-combine parked finished records with the active set."""
    import numpy as _np

    live = _np.asarray(recs.live)
    idx = _np.nonzero(live)[0]
    n_active = len(idx)
    total = n_active + len(parked)
    max_len = max(
        [recs.seq_capacity] + [len(s) for s, _, _ in parked]
    )
    cap = max(next_pow2(total), 16)
    seq = _np.zeros((cap, max_len), dtype=_np.uint8)
    length = _np.zeros(cap, _np.int32)
    left = _np.zeros(cap, _np.int32)
    right = _np.zeros(cap, _np.int32)
    new_live = _np.zeros(cap, bool)
    seq[:n_active, : recs.seq_capacity] = _np.asarray(recs.seq)[idx]
    length[:n_active] = _np.asarray(recs.length)[idx]
    left[:n_active] = _np.asarray(recs.left)[idx]
    right[:n_active] = _np.asarray(recs.right)[idx]
    new_live[:n_active] = True
    for j, (s, l, r) in enumerate(parked):
        i = n_active + j
        seq[i, : len(s)] = s
        length[i] = len(s)
        left[i], right[i] = l, r
        new_live[i] = True
    return Records(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(left),
        jnp.asarray(right), jnp.asarray(new_live),
    )


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
    from .dynamic import count_kmers_auto

    params.validate()
    kmers, counts = count_kmers_auto(
        bases,
        lengths,
        k=params.k,
        min_cov=params.min_kmer_coverage,
        max_cov=params.max_kmer_coverage,
        front_clip=params.front_clip,
        partitions=params.partitions,
        end_clip=params.end_clip,
    )
    log.info("counted %d solid canonical %d-mers", len(counts), params.k)
    from . import metrics

    met = metrics.current()
    met.lap("run/counting")
    met.set("run/solid_kmers", len(counts))
    out = assemble_from_counts(kmers, counts, params, seed=seed)
    met.lap("run/assembly")
    met.set("run/contigs", len(out))
    return out
