"""Shared merge-gate and segmentation primitives for all extension rounds.

One implementation of the reference's blocked/extendable merge gate
(``ReflexivDSMain.java:3070-3086`` fixed-k;
``ReflexivDSDynamicKmerIteration.java:556-575`` with extraLength) used by the
byte (:mod:`extend`), packed (:mod:`packed`) and mixed-k (:mod:`dynamic`)
rounds — a gate fix lands everywhere at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GateResult(NamedTuple):
    merge: jnp.ndarray      # gate passes (before any extra conditions)
    bubble: jnp.ndarray     # bubble distance (-1 = unconstrained merge)
    new_left: jnp.ndarray
    new_right: jnp.ndarray


def merge_gate(
    f_left, f_right, r_left, r_right, f_ext, r_ext, extra=None
) -> GateResult:
    """The four-case merge gate + attribute propagation.

    ``extra`` (fwd sub-kmer minus refl sub-kmer length) activates the dynamic
    variant's extraLength adjustment and its end-attr arithmetic; ``None``
    selects the fixed-k propagation (attrs pass through from the outer
    record ends).
    """
    c1 = (f_left < 0) & (r_right < 0)
    c2 = (f_left >= 0) & (r_right >= 0)
    c3 = (~c1) & (~c2) & (f_left >= 0) & (f_left - r_ext >= 0)
    if extra is None:
        c4 = (~c1) & (~c2) & (~c3) & (r_right >= 0) & (r_right - f_ext >= 0)
    else:
        c4 = (~c1) & (~c2) & (~c3) & (r_right >= 0) & (
            r_right - f_ext - extra >= 0
        )
    merge = c1 | c2 | c3 | c4
    bubble = jnp.where(
        c1 | c2, -1, jnp.where(c3, f_left - r_ext, r_right - f_ext)
    )

    if extra is None:
        new_left = jnp.where(
            bubble < 0, r_left, jnp.where(f_left > 0, bubble, r_left)
        )
        new_right = jnp.where(
            bubble < 0, f_right, jnp.where(f_left > 0, f_right, bubble)
        )
    else:
        # dynamic reflexivExtend propagation; negative magnitudes clamped so
        # repeated merges never drift toward the REPEAT_KILLED sentinel
        left_free = jnp.maximum(
            jnp.where(r_left >= 0, r_left, f_left - r_ext), -1_000_000
        )
        right_free = jnp.maximum(
            jnp.where(f_right >= 0, f_right, r_right - f_ext - extra),
            -1_000_000,
        )
        new_left = jnp.where(
            bubble < 0, left_free, jnp.where(f_left > 0, bubble, left_free)
        )
        new_right = jnp.where(
            bubble < 0, right_free,
            jnp.where(f_left > 0, right_free, bubble - extra),
        )
    return GateResult(merge, bubble, new_left, new_right)


def sort_segments(keys: jnp.ndarray, tiebreak=()):
    """Sort rows by packed uint32 key limbs (plus optional tiebreak columns);
    return (order, seg_id, is_start) with equal-key runs as segments."""
    Wp = keys.shape[1]
    order = jnp.lexsort(
        tuple(tiebreak) + tuple(keys[:, i] for i in range(Wp - 1, -1, -1))
    )
    skey = keys[order]
    prev = jnp.roll(skey, 1, axis=0)
    is_start = jnp.any(skey != prev, axis=1)
    is_start = is_start.at[0].set(True)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    return order, seg, is_start


def first_per_segment(seg, cond, n):
    """Index of the first row satisfying ``cond`` in each row's segment
    (n when absent)."""
    idx = jnp.arange(n, dtype=jnp.int32)
    return jax.ops.segment_min(
        jnp.where(cond, idx, n), seg, num_segments=n
    )[seg]


def segmented_fill(flag, seg, fields, *, reverse=False):
    """Broadcast each flagged row's values over the rest of its segment.

    ``flag`` marks at most one row per segment; every row receives that
    row's field values (forward: rows at or after it; ``reverse=True``:
    rows at or before it). Returns ``(valid, filled_fields)`` where
    ``valid`` is False for rows whose segment holds no flagged row in the
    covered direction.

    Replaces the ``first_per_segment`` + row-gather pattern: a log-depth
    ``associative_scan`` streams at HBM bandwidth where XLA's random
    gather runs ~1600x slower on TPU (scripts/tpu_gather_probe.py).
    """
    ops = (flag, seg.astype(jnp.int32)) + tuple(fields)
    if reverse:
        ops = tuple(jnp.flip(x, axis=0) for x in ops)

    def combine(a, b):
        bf = b[0]
        out = [a[0] | bf]
        for x, y in zip(a[1:], b[1:]):
            cond = bf.reshape(bf.shape + (1,) * (x.ndim - 1))
            out.append(jnp.where(cond, y, x))
        return tuple(out)

    res = jax.lax.associative_scan(combine, ops)
    if reverse:
        res = tuple(jnp.flip(x, axis=0) for x in res)
    seen, fseg = res[0], res[1]
    valid = seen & (fseg == seg)
    return valid, res[2:]
