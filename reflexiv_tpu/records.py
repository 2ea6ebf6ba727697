"""Reflexible Distributed K-mer (RDK) records as fixed-shape device arrays.

The reference's record is a Spark Row ``(sub-kmer, reflection marker 1|2,
extension, leftCover, rightCover)`` (``ReflexivDSMain.java:142-167``) whose
extension grows as a C-marker-length-encoded long / long[]
(``ReflexivDSMain.java:3706-3791``). On TPU we keep the *semantics* but store
each record as its full nucleotide sequence plus an explicit length — the
sub-kmer/extension split is derived, not stored:

  * marker 1 ("forward")  : sort key = first  k-1 bases, extension = suffix
  * marker 2 ("reflected"): sort key = last   k-1 bases, extension = prefix

so flipping a record's representation (the reference's ``randomReflexivMarker``
reflection) costs nothing — only the derived key changes. Arrays are padded to
fixed capacities with a liveness mask (XLA static shapes); capacity grows by
powers of two as contigs lengthen and row count shrinks at compaction.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bitpack import pack_bases

# Attr code: values < 0 mean "end extendable, coverage-tagged" (-1-cover);
# values >= 0 mean "end blocked at distance attr" (fork survivor), see
# DSFilterForkSubKmerWithErrorCorrection, ReflexivDSMain.java:3425-3484.
REPEAT_KILLED = -10_000_000  # both-ends marker for dropped repeat fragments
                             # (ReflexivDSMain.java:749,1711)


class Records(NamedTuple):
    """Struct-of-arrays RDK set. All arrays share leading capacity N."""

    seq: jnp.ndarray      # (N, L) uint8 base codes, left-aligned
    length: jnp.ndarray   # (N,) int32 — bases used in seq
    left: jnp.ndarray     # (N,) int32 — left-end attr
    right: jnp.ndarray    # (N,) int32 — right-end attr
    live: jnp.ndarray     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.seq.shape[0]

    @property
    def seq_capacity(self) -> int:
        return self.seq.shape[1]


def make_records(seq, length, left, right, live) -> Records:
    return Records(
        seq=jnp.asarray(seq, dtype=jnp.uint8),
        length=jnp.asarray(length, dtype=jnp.int32),
        left=jnp.asarray(left, dtype=jnp.int32),
        right=jnp.asarray(right, dtype=jnp.int32),
        live=jnp.asarray(live, dtype=bool),
    )


def derive_keys(recs: Records, marker: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sort keys: the (k-1)-base sub-kmer at the marker-designated end.

    marker==1 -> prefix bases [0, k-1); marker==2 -> suffix bases
    [len-k+1, len). Returns packed ``(N, num_limbs(k-1))`` uint32 limbs; dead
    rows get the all-ones sentinel so they sort to the end.
    """
    sub = k - 1
    start = jnp.where(marker == 1, 0, recs.length - sub).astype(jnp.int32)
    idx = start[:, None] + jnp.arange(sub, dtype=jnp.int32)[None, :]
    bases = jnp.take_along_axis(recs.seq, idx, axis=1)
    keys = pack_bases(bases, sub)
    return jnp.where(recs.live[:, None], keys, jnp.uint32(0xFFFFFFFF))


def grow_seq(recs: Records, new_len: int) -> Records:
    """Pad the sequence axis to ``new_len`` columns."""
    pad = new_len - recs.seq_capacity
    if pad <= 0:
        return recs
    seq = jnp.pad(recs.seq, ((0, 0), (0, pad)))
    return recs._replace(seq=seq)


def compact(recs: Records, new_cap: int) -> Records:
    """Pack live rows to the front and shrink capacity to ``new_cap``.

    The TPU analog of the reference's ``coalesce`` partition-shrink as records
    die off (``ReflexivDSMain.java:313-318``).
    """
    order = jnp.argsort(~recs.live, stable=True)
    take = order[:new_cap]
    return Records(
        seq=recs.seq[take],
        length=recs.length[take],
        left=recs.left[take],
        right=recs.right[take],
        live=recs.live[take],
    )


def live_count(recs: Records) -> int:
    return int(jnp.sum(recs.live))


def max_live_length(recs: Records) -> int:
    return int(jnp.max(jnp.where(recs.live, recs.length, 0)))


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def to_host(recs: Records) -> Tuple[np.ndarray, ...]:
    return tuple(np.asarray(a) for a in recs)
