"""Edge-free de Bruijn graph construction: RC expansion + fork filtering.

Implements the reference's both-direction out-degree-1 selection without
storing edges (SURVEY.md section 2.6 step 2):

  1. every counted canonical k-mer is expanded to both strands
     (``DSKmerReverseComplementLong``, ``ReflexivDSMain.java:3840-3870``);
  2. rows are grouped by their (k-1)-base *prefix*; within a group the
     highest-coverage row wins and its right end is marked blocked
     (``param.subKmerSize``) or extendable-with-coverage (``-1-cover``) per
     the error-correction rule (``DSFilterForkSubKmerWithErrorCorrection``,
     ``ReflexivDSMain.java:3425-3484``);
  3. the same selection runs on (k-1)-base *suffix* groups for the other
     strand direction, marking the left end
     (``DSFilterForkReflectedSubKmerWithErrorCorrection``,
     ``ReflexivDSMain.java:3543-3617``).

Winner rule, vectorized: lexicographic max of (coverage, extension base) —
identical to the reference's sequential replace-if-strictly-greater scan for
the 2-row forks that dominate real data. A fork winner stays extendable only
if EVERY losing branch is error-killable (loser.cover <= minErrorCoverage and
winner.cover >= 2 * loser.cover); the reference's scan applies the rule
against the last-compared loser only, which is intra-group-order dependent —
ours is the deterministic, order-independent strengthening.

TPU note: both passes run in sorted space, chaining the second pass off the
first pass's permutation — attrs are never scattered back to input order
(scatters serialize on TPU; record order is irrelevant downstream).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .bitpack import pack_bases, revcomp_bases, unpack_bases
from .records import Records, make_records


def _fork_pass(
    bases: jnp.ndarray,   # (N, k) uint8, any order
    cover: jnp.ndarray,   # (N,) int32
    valid: jnp.ndarray,   # (N,) bool
    *,
    lo: int,
    hi: int,
    ext_col: int,
    min_error: int,
    blocked: int,
    carry: jnp.ndarray = None,
):
    """One fork-filter pass grouping on bases[:, lo:hi] with the variant base
    at ``ext_col``. Returns (bases, cover, winner, attr, carry) in THIS
    PASS's sorted order (``carry`` rides the same permutation)."""
    N = bases.shape[0]
    width = hi - lo
    keys = pack_bases(bases[:, lo:hi], width)
    Wp = keys.shape[1]
    keyed = jnp.where(valid[:, None], keys, jnp.uint32(0xFFFFFFFF))
    ext = bases[:, ext_col].astype(jnp.uint32)
    # key asc, then coverage desc, then ext desc -> group winner first
    order = jnp.lexsort(
        (~ext, ~cover.astype(jnp.uint32))
        + tuple(keyed[:, i] for i in range(Wp - 1, -1, -1))
    )
    sbases = bases[order]
    scover = cover[order]
    svalid = valid[order]
    skey = keyed[order]

    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1)
    is_start = is_start.at[0].set(True)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1

    ones = svalid.astype(jnp.int32)
    group_size = jax.ops.segment_sum(ones, seg, num_segments=N)
    win_cover = jax.ops.segment_max(
        jnp.where(svalid, scover, -1), seg, num_segments=N
    )
    killable = (scover <= min_error) & (win_cover[seg] >= 2 * scover)
    loser_ok = jnp.where(is_start | ~svalid, 1, killable.astype(jnp.int32))
    all_killable = jax.ops.segment_min(loser_ok, seg, num_segments=N) > 0

    winner = is_start & svalid
    extendable = (group_size[seg] == 1) | all_killable[seg]
    # clamp the coverage tag so extreme-coverage k-mers can never push the
    # attr to the REPEAT_KILLED sentinel (records.py) — only the sign and
    # blocked distances are load-bearing downstream
    attr = jnp.where(extendable, -1 - jnp.minimum(scover, 100_000), blocked)
    scarry = carry[order] if carry is not None else None
    return sbases, scover, winner, attr, scarry


@functools.partial(jax.jit, static_argnames=("k", "min_error", "bubble"))
def build_initial_records(
    kmer_limbs: jnp.ndarray,  # (U, W) uint32 canonical k-mers
    counts: jnp.ndarray,      # (U,) int32
    *,
    k: int,
    min_error: int,
    bubble: bool = True,
) -> Tuple[Records, jnp.ndarray]:
    """Counted canonical k-mers -> fork-filtered two-strand RDK record set.

    Returns ``(records, marker)`` where every live record is a full k-mer
    (seq length k) in reflected representation (marker 2), matching the state
    entering ``DSkmerRandomReflection`` in the reference flow
    (``ReflexivDSMain.java:241-259``). Row order is pass-2 sorted order.
    """
    sub = k - 1
    bases_f = unpack_bases(kmer_limbs, k)          # (U, k)
    bases_r = revcomp_bases(bases_f)               # other strand
    bases = jnp.concatenate([bases_f, bases_r], axis=0)   # (2U, k)
    cover = jnp.concatenate([counts, counts], axis=0).astype(jnp.int32)
    valid = jnp.ones(bases.shape[0], dtype=bool)

    if not bubble:
        # ``-bubble`` skips both fork-filter stages; records enter random
        # reflection with free coverage attrs on both ends (the
        # ``param.bubble`` guard, ``ReflexivDSMain.java:231-253``)
        recs = make_records(
            seq=bases,
            length=jnp.full(bases.shape[0], k, dtype=jnp.int32),
            left=cover, right=cover, live=valid,
        )
        return recs, jnp.full(bases.shape[0], 2, dtype=jnp.int32)

    # pass 1: prefix groups -> right-end attr
    # (DSFilterForkSubKmerWithErrorCorrection)
    bases1, cover1, win1, right1, _ = _fork_pass(
        bases, cover, valid, lo=0, hi=sub, ext_col=k - 1,
        min_error=min_error, blocked=sub,
    )

    # pass 2: suffix groups over pass-1 survivors -> left-end attr
    # (DSFilterForkReflectedSubKmerWithErrorCorrection); chained in pass-1
    # sorted space, right attrs riding the same permutation
    bases2, cover2, win2, left2, right2 = _fork_pass(
        bases1, cover1, win1, lo=1, hi=k, ext_col=0,
        min_error=min_error, blocked=sub, carry=right1,
    )

    live = win2
    recs = make_records(
        seq=bases2,
        length=jnp.full(bases2.shape[0], k, dtype=jnp.int32),
        left=left2,
        right=right2,
        live=live,
    )
    marker = jnp.full(bases2.shape[0], 2, dtype=jnp.int32)
    return recs, marker
