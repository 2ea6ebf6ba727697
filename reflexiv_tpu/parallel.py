"""Multi-chip sharding: hash-routed all_to_all exchange over a device mesh.

The reference's only parallelism is key-sharded records moved by Spark
sort-shuffles (SURVEY.md section 2.10). Here the shuffle fabric is an ICI
``all_to_all`` under ``shard_map`` over a 1-D ``Mesh(("shards",))``:

  * k-mer counting: every shard extracts k-mers locally, routes each k-mer to
    ``owner = hash(key) % n_shards`` (replacing ``groupBy(key).count()``,
    ``ReflexivDataFrameCounter.java:198-209``), and the owner runs the same
    local sort + segmented count as the single-chip path;
  * extension rounds: records draw orientations, route to the owner of their
    current sub-kmer key, and the owner runs the local sort + segment-join
    (replacing the per-round ``Dataset.sort`` exchange,
    ``ReflexivDSMain.java:272,322``).

Routing uses fixed-capacity per-destination buckets (static shapes); bucket
overflow under pathological skew is *detected* (returned as a count) rather
than silently dropped — the driver can re-run with a larger capacity factor,
the analog of the reference's repartition escape hatch.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from . import count as count_mod
from .bitpack import mix32
from .extend import draw_markers, extension_round_with_markers
from .records import Records, derive_keys


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("shards",))


def _bucketize(owner: jnp.ndarray, valid: jnp.ndarray, n: int, cap: int):
    """Plan a fixed-capacity bucket scatter: returns (order, slot, ok, overflow).

    ``order`` sorts rows by owner; ``slot`` is each sorted row's index within
    its destination bucket; rows with ``slot >= cap`` overflow.
    """
    N = owner.shape[0]
    owner = jnp.where(valid, owner, n)  # dead rows route to a virtual bin
    order = jnp.argsort(owner)
    so = owner[order]
    first = jnp.searchsorted(so, jnp.arange(n + 1, dtype=so.dtype))
    slot = jnp.arange(N, dtype=jnp.int32) - first[jnp.minimum(so, n)].astype(jnp.int32)
    ok = (so < n) & (slot < cap)
    overflow = jnp.sum((so < n) & (slot >= cap))
    return order, slot, ok, overflow


def _scatter_exchange(tree, owner, valid, n: int, cap: int, axis="shards"):
    """Route rows of every array in ``tree`` (leading axis N) to their owner
    shard. Returns (tree with leading axis n*cap, received-valid mask,
    local overflow count). Must be called inside shard_map."""
    order, slot, ok, overflow = _bucketize(owner, valid, n, cap)
    # rejected rows (dead or overflow) are routed out of bounds and dropped by
    # the scatter — never clip them into a live slot (duplicate-index scatter
    # order is undefined and would corrupt valid rows)
    dest = jnp.where(ok, owner[order], n)

    def route(x):
        xs = x[order]
        buf = jnp.zeros((n, cap) + x.shape[1:], dtype=x.dtype)
        buf = buf.at[dest, slot].set(xs, mode="drop")
        out = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0, tiled=True)
        return out.reshape((n * cap,) + x.shape[1:])

    vbuf = jnp.zeros((n, cap), dtype=bool).at[dest, slot].set(ok, mode="drop")
    vout = jax.lax.all_to_all(
        vbuf, axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(n * cap)
    return jax.tree.map(route, tree), vout, overflow


@functools.partial(
    jax.jit, static_argnames=("k", "min_cov", "max_cov", "mesh", "cap_factor")
)
def count_kmers_sharded(
    bases: jnp.ndarray,    # (R, L) uint8, sharded over rows
    lengths: jnp.ndarray,  # (R,) int32
    *,
    k: int,
    min_cov: int,
    max_cov: int = 10_000_000,
    mesh: Mesh,
    cap_factor: int = 2,
):
    """Sharded canonical k-mer counting.

    Returns per-shard ``(limbs, counts, keep, overflow)`` stacked over the
    shards axis; each distinct k-mer appears on exactly one shard (its hash
    owner), so concatenating kept rows over shards is the global count table.
    """
    n = mesh.devices.size

    def local(bases_s, lens_s):
        limbs, valid = count_mod.extract_canonical_kmers(bases_s, lens_s, k=k)
        W = limbs.shape[1]
        h = mix32(limbs[:, 0] ^ jnp.uint32(0x9E3779B9))
        for i in range(1, W):
            h = mix32(h ^ limbs[:, i])
        owner = (h % jnp.uint32(n)).astype(jnp.int32)
        cap = max(1, cap_factor * limbs.shape[0] // n)
        (limbs_r,), valid_r, overflow = _scatter_exchange(
            (limbs,), owner, valid, n, cap
        )
        skey, counts, keep = count_mod.sort_count_filter(
            limbs_r, valid_r, min_cov=min_cov, max_cov=max_cov
        )
        return skey, counts, keep, overflow[None]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shards"), P("shards")),
        out_specs=(P("shards"), P("shards"), P("shards"), P("shards")),
    )(bases, lengths)


@functools.partial(
    jax.jit, static_argnames=("k", "round_seed", "mesh", "cap_factor")
)
def extension_round_sharded(
    recs: Records,   # all arrays sharded over leading axis
    *,
    k: int,
    round_seed: int,
    mesh: Mesh,
    cap_factor: int = 2,
):
    """One sharded sort->join round: route records to their key owner, join
    locally, then compact back to the fixed per-shard capacity.

    Returns ``(records, overflow)``. Rows whose destination bucket overflows
    are dropped from the exchange — overflow > 0 means rerun with a larger
    ``cap_factor`` (the driver treats it as an error).
    """
    n = mesh.devices.size

    def local(seq, length, left, right, live):
        rec = Records(seq, length, left, right, live)
        M = seq.shape[0]
        marker = draw_markers(rec, round_seed)
        keys = derive_keys(rec, marker, k)
        W = keys.shape[1]
        h = mix32(keys[:, 0] ^ jnp.uint32(0x85EBCA6B))
        for i in range(1, W):
            h = mix32(h ^ keys[:, i])
        owner = (h % jnp.uint32(n)).astype(jnp.int32)
        cap = max(1, cap_factor * M // n)
        tree = (seq, length, left, right, marker)
        (seq_r, len_r, left_r, right_r, marker_r), valid_r, overflow = (
            _scatter_exchange(tree, owner, live, n, cap)
        )
        joined = extension_round_with_markers(
            Records(seq_r, len_r, left_r, right_r, valid_r),
            jnp.where(valid_r, marker_r, 0),
            k=k,
        )
        # compact back to per-shard capacity M (live rows first)
        order = jnp.argsort(~joined.live)
        take = order[:M]
        out = Records(
            joined.seq[take], joined.length[take], joined.left[take],
            joined.right[take], joined.live[take],
        )
        lost = jnp.sum(joined.live) - jnp.sum(out.live)
        return (*out, (overflow + lost)[None])

    out_seq, out_len, out_left, out_right, out_live, overflow = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shards"),) * 5,
        out_specs=(P("shards"),) * 6,
    )(*recs)
    return Records(out_seq, out_len, out_left, out_right, out_live), overflow
