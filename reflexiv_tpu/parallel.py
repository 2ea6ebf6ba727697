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


def _hash_owner(keys: jnp.ndarray, n: int, salt: int) -> jnp.ndarray:
    W = keys.shape[1]
    h = mix32(keys[:, 0] ^ jnp.uint32(salt))
    for i in range(1, W):
        h = mix32(h ^ keys[:, i])
    return (h % jnp.uint32(n)).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("k", "min_cov", "mesh", "cap_factor"),
)
def _mercy_flags_sharded(
    bases: jnp.ndarray,      # (R, L) uint8, sharded over rows
    lengths: jnp.ndarray,    # (R,)
    tab_limbs: jnp.ndarray,  # (n, rowsT, W) per-shard min_cov=1 table
    tab_counts: jnp.ndarray,
    tab_keep: jnp.ndarray,
    *,
    k: int,
    min_cov: int,
    mesh: Mesh,
    cap_factor: int = 4,
):
    """Distributed mercy flank rule (``-accurate``): read windows query the
    hash-sharded count table (forward exchange), counts ride the reverse
    ``all_to_all`` back in-slot, the flank rule runs read-locally, and mercy
    keys route to their table owner to flip a per-table-row mercy flag.

    Returns per-shard ``(mercy_flag over table rows, overflow count)``.
    Mirrors :func:`reflexiv_tpu.mercy._mercy_mask` exactly
    (``ExtractMercyKmerFromRead``, ``ReflexivDSDynamicMercyKmer.java:913``);
    the round-2 gate that forced ``-accurate`` onto one device is gone.
    """
    from .mercy import lookup_counts

    n = mesh.devices.size

    def local(bases_s, lens_s, tl, tc, tkeep):
        tl, tc, tkeep = tl[0], tc[0], tkeep[0]
        limbs, valid = count_mod.extract_canonical_kmers(bases_s, lens_s, k=k)
        M, W = limbs.shape
        owner = _hash_owner(limbs, n, 0x9E3779B9)  # same salt as counting:
        # a window's owner is the shard holding its table row
        cap = max(1, cap_factor * M // n)
        order, slot, ok, ovf1 = _bucketize(owner, valid, n, cap)
        dest = jnp.where(ok, owner[order], n)

        def route(x, fill=0):
            xs = x[order]
            buf = jnp.full((n, cap) + x.shape[1:], fill, dtype=x.dtype)
            buf = buf.at[dest, slot].set(xs, mode="drop")
            return jax.lax.all_to_all(
                buf, "shards", split_axis=0, concat_axis=0, tiled=True
            ).reshape((n * cap,) + x.shape[1:])

        q_r = route(limbs)
        vbuf = jnp.zeros((n, cap), dtype=bool).at[dest, slot].set(
            ok, mode="drop")
        v_r = jax.lax.all_to_all(
            vbuf, "shards", split_axis=0, concat_axis=0, tiled=True
        ).reshape(n * cap)

        # owner-side count lookup against the local table shard
        tvalid_rows = tkeep & (tc > 0)
        cnt_r = lookup_counts(
            jnp.where(tvalid_rows[:, None], tl, jnp.uint32(0xFFFFFFFF)),
            jnp.where(tvalid_rows, tc, 0), q_r, v_r)
        cnt_back = jax.lax.all_to_all(
            cnt_r.reshape(n, cap), "shards",
            split_axis=0, concat_axis=0, tiled=True)
        counts = jnp.zeros(M, jnp.int32).at[order].set(
            jnp.where(ok, cnt_back[jnp.minimum(dest, n - 1), slot], 0))

        # read-local flank rule (identical to mercy._mercy_mask)
        R, L = bases_s.shape
        Wn = L - k + 1
        solid = (counts >= min_cov).reshape(R, Wn) & valid.reshape(R, Wn)
        weak = ((counts >= 1) & (counts < min_cov)).reshape(R, Wn) \
            & valid.reshape(R, Wn)
        solid_left = jnp.cumsum(solid.astype(jnp.int32), axis=1) > 0
        solid_right = jnp.cumsum(
            solid[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1] > 0
        mercy = (weak & solid_left & solid_right & ~solid).reshape(M)

        # mercy keys back to their table owner; owner flags matching rows
        order2, slot2, ok2, ovf2 = _bucketize(owner, mercy, n, cap)
        dest2 = jnp.where(ok2, owner[order2], n)
        xs2 = limbs[order2]
        buf2 = jnp.zeros((n, cap, W), jnp.uint32).at[dest2, slot2].set(
            xs2, mode="drop")
        mk_r = jax.lax.all_to_all(
            buf2, "shards", split_axis=0, concat_axis=0, tiled=True
        ).reshape(n * cap, W)
        v2buf = jnp.zeros((n, cap), dtype=bool).at[dest2, slot2].set(
            ok2, mode="drop")
        mv_r = jax.lax.all_to_all(
            v2buf, "shards", split_axis=0, concat_axis=0, tiled=True
        ).reshape(n * cap)
        # table row is mercy iff any received mercy key equals it: treat the
        # mercy keys as a count table (count 1) and look the rows up in it
        flag = lookup_counts(
            jnp.where(mv_r[:, None], mk_r, jnp.uint32(0xFFFFFFFF)),
            mv_r.astype(jnp.int32),
            tl, tvalid_rows) > 0
        return flag, (ovf1 + ovf2)[None]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shards"), P("shards"), P("shards"), P("shards"),
                  P("shards")),
        out_specs=(P("shards"), P("shards")),
    )(bases, lengths, tab_limbs, tab_counts, tab_keep)


def mercy_kmer_table_sharded(
    bases, lengths, *, k: int, min_cov: int, max_cov: int = 10_000_000,
    mesh: Mesh, cap_factor: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-wide ``-accurate`` table: solid + mercy k-mers, computed with
    the table hash-sharded and reads row-sharded (the table is never
    replicated or collected onto one device until the final compaction).
    Set-equal to :func:`reflexiv_tpu.mercy.mercy_kmer_table`.
    """
    n = mesh.devices.size
    R = np.asarray(bases).shape[0]
    R_pad = ((R + n - 1) // n) * n
    b = jnp.zeros((R_pad, bases.shape[1]), jnp.uint8).at[:R].set(
        jnp.asarray(bases))
    ln = jnp.zeros((R_pad,), jnp.int32).at[:R].set(jnp.asarray(lengths))
    tl, tc, tkeep, ovf = count_kmers_sharded(
        b, ln, k=k, min_cov=1, max_cov=max_cov, mesh=mesh,
        cap_factor=cap_factor)
    assert int(jnp.sum(ovf)) == 0, "sharded mercy: counting overflow"
    rowsT = tl.shape[0] // n
    W = tl.shape[1]
    tl3 = tl.reshape(n, rowsT, W)
    tc3 = tc.reshape(n, rowsT)
    tk3 = tkeep.reshape(n, rowsT)
    flag, ovf2 = _mercy_flags_sharded(
        b, ln, tl3, tc3, tk3, k=k, min_cov=min_cov, mesh=mesh,
        cap_factor=cap_factor)
    assert int(jnp.sum(ovf2)) == 0, "sharded mercy: flank-rule overflow"
    keep = np.asarray(tkeep) & (
        (np.asarray(tc) >= min_cov) | np.asarray(flag).reshape(-1))
    limbs_np = np.asarray(tl)[keep]
    counts_np = np.asarray(tc)[keep]
    return limbs_np, counts_np


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "cap_factor")
)
def extension_round_sharded_packed(
    p,  # packed.PackedRecords, arrays sharded over leading axis
    round_seed: jnp.ndarray,
    *,
    k: int,
    mesh: Mesh,
    cap_factor: int = 2,
):
    """Packed-record variant of :func:`extension_round_sharded`: exchanges
    uint32 limb rows (4x less ICI traffic than byte rows) and runs the packed
    local join."""
    from . import packed as pk

    n = mesh.devices.size

    def local(seq, length, left, right, live, seed):
        rec = pk.PackedRecords(seq, length, left, right, live)
        M = seq.shape[0]
        marker = pk.draw_markers_packed(rec, seed[0])
        keys = pk.derive_keys_packed(rec, marker, k)
        W = keys.shape[1]
        h = mix32(keys[:, 0] ^ jnp.uint32(0x85EBCA6B))
        for i in range(1, W):
            h = mix32(h ^ keys[:, i])
        owner = (h % jnp.uint32(n)).astype(jnp.int32)
        cap = max(1, cap_factor * M // n)
        tree = (seq, length, left, right)
        (seq_r, len_r, left_r, right_r), valid_r, overflow = (
            _scatter_exchange(tree, owner, live, n, cap)
        )
        joined, live_n, _need = pk.extension_round_packed(
            pk.PackedRecords(seq_r, len_r, left_r, right_r, valid_r),
            seed[0], k=k,
        )
        order = jnp.argsort(~joined.live)
        take = order[:M]
        out = pk.PackedRecords(
            joined.seq[take], joined.length[take], joined.left[take],
            joined.right[take], joined.live[take],
        )
        lost = jnp.sum(joined.live) - jnp.sum(out.live)
        return (*out, (overflow + lost)[None])

    seed_arr = jnp.broadcast_to(
        jnp.asarray(round_seed, jnp.uint32), (n,)
    )
    out_seq, out_len, out_left, out_right, out_live, overflow = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shards"),) * 5 + (P("shards"),),
        out_specs=(P("shards"),) * 6,
    )(*p, seed_arr)
    from . import packed as pk2

    return (
        pk2.PackedRecords(out_seq, out_len, out_left, out_right, out_live),
        overflow,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kmin", "max_sub", "mesh", "cap_factor", "unique_only"),
)
def pdyn_extension_round_sharded(
    p,  # packed_dyn.PackedDynRecords, arrays sharded over leading axis
    round_seed: jnp.ndarray,
    *,
    kmin: int,
    max_sub: int,
    mesh: Mesh,
    cap_factor: int = 2,
    unique_only: bool = False,
):
    """Sharded mixed-k extension round (the production ``meta`` hot loop).

    Records route to the hash owner of their (kmin-1)-base group key; the
    owner re-derives the orientation draw (content-deterministic, same seed
    => same marker as the routing side) and runs the local packed mixed-k
    join. Returns ``(records, overflow)``.
    """
    from . import packed as pk
    from . import packed_dyn as pd

    n = mesh.devices.size

    def local(seq, length, subk, left, right, live, seed):
        rec = pd.PackedDynRecords(seq, length, subk, left, right, live)
        M = seq.shape[0]
        marker = pd.draw_markers_pdyn(rec, seed[0])
        key_start = jnp.where(marker == 1, 0, length - subk)
        keys = pk.extract_window(seq, jnp.maximum(key_start, 0), kmin - 1)
        W = keys.shape[1]
        h = mix32(keys[:, 0] ^ jnp.uint32(0x27D4EB2F))
        for i in range(1, W):
            h = mix32(h ^ keys[:, i])
        owner = (h % jnp.uint32(n)).astype(jnp.int32)
        cap = max(1, cap_factor * M // n)
        tree = (seq, length, subk, left, right)
        (seq_r, len_r, sub_r, left_r, right_r), valid_r, overflow = (
            _scatter_exchange(tree, owner, live, n, cap)
        )
        joined, live_n, _need = pd.pdyn_extension_round_fused(
            pd.PackedDynRecords(seq_r, len_r, sub_r, left_r, right_r, valid_r),
            seed[0], kmin=kmin, max_sub=max_sub, unique_only=unique_only,
        )
        order = jnp.argsort(~joined.live)
        take = order[:M]
        out = pd.PackedDynRecords(
            joined.seq[take], joined.length[take], joined.subk[take],
            joined.left[take], joined.right[take], joined.live[take],
        )
        lost = jnp.sum(joined.live) - jnp.sum(out.live)
        return (*out, (overflow + lost)[None])

    seed_arr = jnp.broadcast_to(jnp.asarray(round_seed, jnp.uint32), (n,))
    out_seq, out_len, out_sub, out_left, out_right, out_live, overflow = (
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P("shards"),) * 7,
            out_specs=(P("shards"),) * 7,
        )(*p, seed_arr)
    )
    from . import packed_dyn as pd2

    return (
        pd2.PackedDynRecords(
            out_seq, out_len, out_sub, out_left, out_right, out_live),
        overflow,
    )


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


@functools.partial(
    jax.jit,
    static_argnames=("k", "min_error", "mesh", "cap_factor", "bubble"),
)
def build_initial_records_sharded(
    limbs: jnp.ndarray,   # (N, W) uint32, sharded over rows (count output)
    counts: jnp.ndarray,  # (N,) int32
    keep: jnp.ndarray,    # (N,) bool — unique solid k-mers
    *,
    k: int,
    min_error: int,
    mesh: Mesh,
    cap_factor: int = 2,
    bubble: bool = True,
):
    """Sharded RC expansion + both-direction fork filtering
    (:func:`reflexiv_tpu.graph.build_initial_records` over the mesh).

    Each pass routes rows to the hash owner of its group window (prefix,
    then suffix) so equal-key rows meet on one shard, then runs the local
    fork pass. The record set never leaves the devices. Returns
    ``(seq, length, left, right, live, overflow)`` sharded over rows, plus
    per-shard live counts for capacity planning.
    """
    from .bitpack import pack_bases, revcomp_bases, unpack_bases
    from .graph import _fork_pass

    n = mesh.devices.size
    sub = k - 1

    def local(limbs_s, counts_s, keep_s):
        U = limbs_s.shape[0]
        bases_f = unpack_bases(limbs_s, k)
        bases_r = revcomp_bases(bases_f)
        bases = jnp.concatenate([bases_f, bases_r], axis=0)
        cover = jnp.concatenate([counts_s, counts_s], axis=0).astype(
            jnp.int32)
        valid = jnp.concatenate([keep_s, keep_s], axis=0)

        def owner_of(window, salt):
            key = pack_bases(window, sub)
            h = mix32(key[:, 0] ^ jnp.uint32(salt))
            for i in range(1, key.shape[1]):
                h = mix32(h ^ key[:, i])
            return (h % jnp.uint32(n)).astype(jnp.int32)

        if not bubble:
            # ``-bubble``: no fork filtering -> no exchanges; records stay
            # on their shard with free coverage attrs (the ``param.bubble``
            # guard, ``ReflexivDSMain.java:231-253``)
            length = jnp.where(valid, k, 0).astype(jnp.int32)
            zero_ovf = jnp.zeros((1,), jnp.int32)
            n_live = jnp.sum(valid.astype(jnp.int32))[None]
            return (bases, length, cover, cover, valid, zero_ovf, n_live)

        cap = max(1, cap_factor * 2 * U // n)
        # pass 1: prefix groups -> right-end attr
        owner1 = owner_of(bases[:, :sub], 0xB5297A4D)
        (bases_1, cover_1), valid_1, ovf1 = _scatter_exchange(
            (bases, cover), owner1, valid, n, cap)
        b1, c1, win1, right1, _ = _fork_pass(
            bases_1, cover_1, valid_1, lo=0, hi=sub, ext_col=k - 1,
            min_error=min_error, blocked=sub,
        )
        # pass 2: suffix groups over pass-1 winners, right attr rides along
        owner2 = owner_of(b1[:, 1:k], 0x68E31DA4)
        (b1r, c1r, right1r), valid_2, ovf2 = _scatter_exchange(
            (b1, c1, right1), owner2, win1, n, cap)
        b2, c2, win2, left2, right2 = _fork_pass(
            b1r, c1r, valid_2, lo=1, hi=k, ext_col=0,
            min_error=min_error, blocked=sub, carry=right1r,
        )
        live = win2
        length = jnp.where(live, k, 0).astype(jnp.int32)
        n_live = jnp.sum(live.astype(jnp.int32))[None]
        return (b2, length, left2, right2, live, (ovf1 + ovf2)[None],
                n_live)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shards"),) * 3,
        out_specs=(P("shards"),) * 7,
    )(limbs, counts, keep)


@functools.partial(jax.jit, static_argnames=("out_cap", "seq_cap", "mesh"))
def compact_records_sharded(
    seq, length, left, right, live, *, out_cap: int, seq_cap: int, mesh: Mesh
):
    """Per-shard compaction of record rows (live first) to a fixed capacity
    ``out_cap`` per shard with byte sequences padded to ``seq_cap`` —
    shrinks the window-scale fork-filter output to record scale without any
    host round trip."""

    def local(seq_s, len_s, left_s, right_s, live_s):
        order = jnp.argsort(~live_s)
        take = order[:out_cap]
        s = seq_s[take]
        if seq_cap > s.shape[1]:
            s = jnp.pad(s, ((0, 0), (0, seq_cap - s.shape[1])))
        lost = jnp.sum(live_s) - jnp.sum(live_s[take])
        return (s, len_s[take], left_s[take], right_s[take], live_s[take],
                lost[None])

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shards"),) * 5,
        out_specs=(P("shards"),) * 6,
    )(seq, length, left, right, live)


@functools.partial(jax.jit, static_argnames=("k", "mesh", "cap_factor"))
def finished_mask_sharded(
    p,  # packed.PackedRecords, arrays sharded over leading axis
    *,
    k: int,
    mesh: Mesh,
    cap_factor: int = 4,
):
    """Sharded extendability prefilter (cf. ``extend.finished_mask``).

    Each live record emits two key messages (its head and tail (k-1)-mer);
    messages hash-route to owner shards, the owner counts heads/tails per
    distinct key, and verdicts ride a reverse ``all_to_all`` back in the same
    bucket slots. A record is finished when neither endpoint has a potential
    partner anywhere on the mesh. Conservative under bucket overflow: an
    undeliverable message counts as "partnered", so its record is never
    parked.
    """
    from . import packed as pk

    n = mesh.devices.size

    def local(seq, length, left, right, live):
        rec = pk.PackedRecords(seq, length, left, right, live)
        M = seq.shape[0]
        ones = jnp.ones(M, dtype=jnp.int32)
        head = pk.derive_keys_packed(rec, ones, k)
        tail = pk.derive_keys_packed(rec, 2 * ones, k)
        keys = jnp.concatenate([head, tail], axis=0)          # (2M, W)
        side = jnp.concatenate(
            [jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32)]
        )
        live2 = jnp.concatenate([live, live])
        W = keys.shape[1]
        h = mix32(keys[:, 0] ^ jnp.uint32(0xC2B2AE35))
        for i in range(1, W):
            h = mix32(h ^ keys[:, i])
        owner = (h % jnp.uint32(n)).astype(jnp.int32)
        cap = max(1, cap_factor * 2 * M // n)
        order, slot, ok, _overflow = _bucketize(owner, live2, n, cap)
        dest = jnp.where(ok, owner[order], n)

        def route(x):
            xs = x[order]
            buf = jnp.zeros((n, cap) + x.shape[1:], dtype=x.dtype)
            buf = buf.at[dest, slot].set(xs, mode="drop")
            out = jax.lax.all_to_all(
                buf, "shards", split_axis=0, concat_axis=0, tiled=True
            )
            return out.reshape((n * cap,) + x.shape[1:])

        k_r = route(keys)
        s_r = route(side)
        vbuf = jnp.zeros((n, cap), dtype=bool).at[dest, slot].set(
            ok, mode="drop")
        v_r = jax.lax.all_to_all(
            vbuf, "shards", split_axis=0, concat_axis=0, tiled=True
        ).reshape(n * cap)

        # owner side: count head/tail messages per distinct key
        NN = n * cap
        keyed = jnp.where(v_r[:, None], k_r, jnp.uint32(0xFFFFFFFF))
        order2 = jnp.lexsort(
            tuple(keyed[:, i] for i in range(W - 1, -1, -1)))
        skey = keyed[order2]
        sside = s_r[order2]
        sval = v_r[order2]
        prev = jnp.roll(skey, 1, axis=0)
        is_start = jnp.any(skey != prev, axis=1).at[0].set(True)
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        n_heads = jax.ops.segment_sum(
            jnp.where(sval & (sside == 0), 1, 0), seg, num_segments=NN
        )[seg]
        n_tails = jax.ops.segment_sum(
            jnp.where(sval & (sside == 1), 1, 0), seg, num_segments=NN
        )[seg]
        partnered_sorted = jnp.where(sside == 0, n_tails > 0, n_heads > 0)
        partnered = jnp.zeros(NN, dtype=bool).at[order2].set(partnered_sorted)

        # reverse exchange: verdicts return to source shards in-slot
        p_back = jax.lax.all_to_all(
            partnered.reshape(n, cap), "shards",
            split_axis=0, concat_axis=0, tiled=True,
        )
        msg_partnered = jnp.where(
            ok, p_back[jnp.minimum(dest, n - 1), slot], True
        )
        per_msg = jnp.zeros(2 * M, dtype=bool).at[order].set(msg_partnered)
        finished = live & ~per_msg[:M] & ~per_msg[M:]
        return (finished,)

    (finished,) = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shards"),) * 5,
        out_specs=(P("shards"),),
    )(*p)
    return finished


# ---------------------------------------------------------------------------
# end-to-end sharded assembly driver
# ---------------------------------------------------------------------------

def _pad_rows(recs: Records, cap: int, seq_cap: int) -> Records:
    """Place live rows into a fresh (cap, seq_cap) record set."""
    import numpy as np_

    live = np_.asarray(recs.live)
    idx = np_.nonzero(live)[0]
    n = len(idx)
    assert n <= cap, f"{n} live rows exceed capacity {cap}"
    seq = jnp.zeros((cap, seq_cap), jnp.uint8)
    seq = seq.at[:n, : recs.seq_capacity].set(recs.seq[idx])
    return Records(
        seq,
        jnp.zeros(cap, jnp.int32).at[:n].set(recs.length[idx]),
        jnp.zeros(cap, jnp.int32).at[:n].set(recs.left[idx]),
        jnp.zeros(cap, jnp.int32).at[:n].set(recs.right[idx]),
        jnp.zeros(cap, bool).at[:n].set(True),
    )


def assemble_reads_sharded(
    bases,
    lengths,
    params,
    *,
    mesh: Mesh,
    seed: int = 0,
    cap_factor: int = 4,
):
    """Full single-k assembly with mesh-sharded counting, graph
    construction, and extension.

    Every stage runs under ``shard_map`` with hash-routed ``all_to_all``
    exchanges; the k-mer table and record set never leave the devices —
    only per-shard live counts (for capacity planning) and the final
    contigs reach the host.
    """
    import numpy as np_

    from .contigs import emit_contigs
    from .records import Records, next_pow2

    n = mesh.devices.size
    R = bases.shape[0]
    R_pad = ((R + n - 1) // n) * n
    bases_p = jnp.zeros((R_pad, bases.shape[1]), jnp.uint8).at[:R].set(
        jnp.asarray(bases))
    lens_p = jnp.zeros((R_pad,), jnp.int32).at[:R].set(jnp.asarray(lengths))

    limbs, counts, keep, overflow = count_kmers_sharded(
        bases_p, lens_p, k=params.k,
        min_cov=params.min_kmer_coverage,
        max_cov=params.max_kmer_coverage, mesh=mesh,
        cap_factor=cap_factor,
    )
    assert int(jnp.sum(overflow)) == 0, "counting bucket overflow"

    seqg, leng, leftg, rightg, liveg, govf, shard_live = (
        build_initial_records_sharded(
            limbs, counts, keep, k=params.k,
            min_error=params.min_error_coverage, mesh=mesh,
            cap_factor=cap_factor, bubble=params.bubble,
        )
    )
    assert int(jnp.sum(govf)) == 0, "fork-filter bucket overflow"
    shard_live_np = np_.asarray(shard_live)
    n_live = int(shard_live_np.sum())

    # per-shard capacity sized to the most loaded shard; seq capacity grows
    # between jitted rounds
    per_shard = max(next_pow2(int(shard_live_np.max()) or 1) * 2, 16)
    cap = per_shard * n
    seq_cap = max(64, next_pow2(2 * params.k))
    seqc, lenc, leftc, rightc, livec, lost = compact_records_sharded(
        seqg, leng, leftg, rightg, liveg,
        out_cap=per_shard, seq_cap=seq_cap, mesh=mesh,
    )
    assert int(jnp.sum(lost)) == 0, "record compaction lost rows"
    recs = Records(seqc, lenc, leftc, rightc, livec)

    from . import packed as pk

    p = pk.from_records(recs)
    prev = n_live
    stable = 0
    parked: list = []
    for it in range(1, params.max_iterations + 1):
        lens_live = jnp.where(p.live, p.length, 0)
        top2 = jax.lax.top_k(lens_live, 2)[0]
        need = int(top2[0] + top2[1]) - (params.k - 1)
        if need > p.base_capacity:
            p = pk.grow_packed(p, next_pow2(need))
        p, ovf = extension_round_sharded_packed(
            p, jnp.uint32(seed + it), k=params.k, mesh=mesh,
            cap_factor=cap_factor,
        )
        assert int(jnp.sum(ovf)) == 0, "extension bucket overflow"
        live_n = int(jnp.sum(p.live))
        if live_n == prev:
            stable += 1
        else:
            stable, prev = 0, live_n
        # exact-termination census, same rule as the single-chip loop
        # (assembler.py): once stable for 3 rounds, ask the mesh-wide
        # head/tail partner census whether any live record can still merge;
        # none left means no future round can change anything, so stop
        # exactly instead of paying up to 12 dead all_to_all rounds. The
        # 12-stable fallback covers self-partnered keys (circular/repeat
        # ends) that keep the census non-empty without ever merging.
        if stable >= 3 and stable % 3 == 0:
            fin = np_.asarray(finished_mask_sharded(
                p, k=params.k, mesh=mesh, cap_factor=cap_factor))
            if int(fin.sum()) == live_n:
                break
        if it >= params.min_iterations and stable >= 12:
            break
        # park finished records off the per-round exchange volume (the
        # extendability prefilter of ReflexivDSKmerProcessing64, here as a
        # mesh-wide head/tail partner census)
        if it % 8 == 0 and it >= 8:
            fin = np_.asarray(finished_mask_sharded(
                p, k=params.k, mesh=mesh, cap_factor=cap_factor))
            n_fin = int(fin.sum())
            if n_fin > max(32, p.capacity // 8):
                p = pk.park_finished_rows(p, fin, parked)
                prev = live_n - n_fin

    from . import metrics

    metrics.current().set("sharded/extension_rounds", it)
    if parked:
        p = pk.merge_parked_packed(p, parked)
    return emit_contigs(pk.to_records(p), min_contig=params.min_contig)
