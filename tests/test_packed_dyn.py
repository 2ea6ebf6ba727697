"""Packed mixed-k rounds must match the byte-per-base rounds row-for-row."""
import jax.numpy as jnp
import numpy as np
import pytest

from reflexiv_tpu import packed_dyn as pd
from reflexiv_tpu.dynamic import (
    DynRecords,
    _draw_markers_dyn,
    dyn_extension_round_with_markers,
)


def random_pool(rng, n, klist, cap_len):
    """A random mixed-k pool: each row is a k-class record extended by a
    random amount, zero-padded past its length."""
    ks = rng.choice(klist, size=n)
    ext = rng.integers(1, 8, size=n)
    length = (ks + ext).astype(np.int32)
    seq = np.zeros((n, cap_len), np.uint8)
    for i in range(n):
        seq[i, : length[i]] = rng.integers(0, 4, size=length[i])
    subk = (ks - 1).astype(np.int32)
    left = rng.integers(-5, 5, size=n).astype(np.int32)
    right = rng.integers(-5, 5, size=n).astype(np.int32)
    live = rng.random(n) > 0.1
    return DynRecords(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(subk),
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(live),
    )


def canon_rows(d: DynRecords):
    """Canonical (order-independent) multiset of live rows."""
    seq = np.asarray(d.seq)
    length = np.asarray(d.length)
    rows = []
    for i in np.nonzero(np.asarray(d.live))[0]:
        rows.append((
            bytes(seq[i, : length[i]]),
            int(d.subk[i]), int(d.left[i]), int(d.right[i]),
        ))
    return sorted(rows)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("unique_only", [False, True])
def test_round_equivalence(seed, unique_only):
    rng = np.random.default_rng(seed)
    klist = [5, 7, 9]
    byte = random_pool(rng, 96, klist, cap_len=48)
    # duplicate a few rows so groups actually form
    dup = rng.integers(0, 96, size=24)
    seq = np.asarray(byte.seq).copy()
    seq[dup // 2] = seq[dup]
    byte = byte._replace(
        seq=jnp.asarray(seq),
        length=jnp.asarray(np.asarray(byte.length)).at[dup // 2].set(
            byte.length[dup]),
        subk=jnp.asarray(np.asarray(byte.subk)).at[dup // 2].set(
            byte.subk[dup]),
    )
    marker = _draw_markers_dyn(byte, 7)

    out_byte = dyn_extension_round_with_markers(
        byte, marker, kmin=min(klist), unique_only=unique_only
    )
    packed = pd.from_dyn(byte)
    out_packed = pd.pdyn_extension_round_with_markers(
        packed, marker, kmin=min(klist), max_sub=max(klist) - 1,
        unique_only=unique_only,
    )
    assert canon_rows(out_byte) == canon_rows(pd.to_dyn(out_packed))


def test_marker_draw_matches_byte():
    rng = np.random.default_rng(11)
    byte = random_pool(rng, 64, [17, 21], cap_len=64)
    m_byte = np.asarray(_draw_markers_dyn(byte, 3))
    m_packed = np.asarray(pd.draw_markers_pdyn(pd.from_dyn(byte), 3))
    np.testing.assert_array_equal(m_byte, m_packed)


def test_masked_prefix_eq():
    rng = np.random.default_rng(5)
    n, W = 128, 3
    a = rng.integers(0, 2**32, size=(n, W), dtype=np.uint32)
    b = a.copy()
    nb = rng.integers(0, W * 16 + 1, size=n).astype(np.int32)
    # flip one base exactly at position nb (first base NOT compared)
    for i in range(n):
        pos = int(nb[i])
        if pos >= W * 16:
            continue
        limb, off = divmod(pos, 16)
        b[i, limb] ^= np.uint32(1) << (30 - 2 * off)
    eq = np.asarray(pd.masked_prefix_eq(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(nb)))
    assert eq.all()
    # flipping a base inside the compared prefix breaks equality
    for i in range(n):
        if nb[i] == 0:
            continue
        pos = int(nb[i]) - 1
        limb, off = divmod(pos, 16)
        b[i, limb] ^= np.uint32(1) << (30 - 2 * off)
    eq2 = np.asarray(pd.masked_prefix_eq(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(nb)))
    assert (~eq2[nb > 0]).all()
    assert eq2[nb == 0].all()


def test_roundtrip_conversion():
    rng = np.random.default_rng(9)
    byte = random_pool(rng, 32, [9, 13], cap_len=40)
    back = pd.to_dyn(pd.from_dyn(byte))
    assert canon_rows(byte) == canon_rows(back)


def test_finished_mask_pdyn_conservative():
    """A parked record must have no group-key partner; records with live
    partners stay."""
    rng = np.random.default_rng(21)
    kmin = 9
    byte = random_pool(rng, 64, [kmin, 13], cap_len=48)
    p = pd.from_dyn(byte)
    fin = np.asarray(pd.finished_mask_pdyn(p, kmin))
    # oracle: head/tail (kmin-1)-windows as strings
    seq = np.asarray(byte.seq)
    length = np.asarray(byte.length)
    subk = np.asarray(byte.subk)
    live = np.asarray(byte.live)
    gw = kmin - 1
    heads, tails = {}, {}
    for i in np.nonzero(live)[0]:
        heads.setdefault(bytes(seq[i, :gw]), []).append(i)
        t0 = length[i] - subk[i]
        tails.setdefault(bytes(seq[i, t0:t0 + gw]), []).append(i)
    for i in np.nonzero(live)[0]:
        h = bytes(seq[i, :gw])
        t0 = length[i] - subk[i]
        t = bytes(seq[i, t0:t0 + gw])
        want = (h not in tails) and (t not in heads)
        assert bool(fin[i]) == want, i
    assert not fin[~live].any()


@pytest.mark.slow
def test_dyn_parking_preserves_assembly():
    """Organic e2e over the parking-capable loop (at this scale the
    parking threshold is not necessarily crossed; the deterministic
    branch-forcing test is
    test_parallel.test_dyn_parking_branch_fires_and_preserves_fixpoint)."""
    import random as _random

    import sys
    sys.path.insert(0, "tests")
    from reflexiv_tpu.dynamic import assemble_dynamic
    from reflexiv_tpu.params import Params

    rng = _random.Random(77)
    genome = "".join(rng.choice("ACGT") for _ in range(900))
    reads = []
    for _ in range(450):
        s = rng.randrange(900 - 70)
        reads.append(genome[s:s + 70])
    from reflexiv_tpu.io import reads_to_matrix

    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(klist=(21, 31), min_kmer_coverage=2, min_contig=400,
                    min_iterations=15)
    out = assemble_dynamic(mat, lens, params, seed=0)
    best = max((s for _, s in out), key=len)
    assert len(best) >= 850


@pytest.mark.parametrize("seed", [0, 1])
def test_round_equivalence_large_k(seed):
    """Mixed pools spanning the production klist (sub-kmers across many
    uint32 limbs) must agree byte-vs-packed."""
    rng = np.random.default_rng(100 + seed)
    klist = [23, 41, 67, 95]
    byte = random_pool(rng, 128, klist, cap_len=224)
    dup = rng.integers(0, 128, size=40)
    seq = np.asarray(byte.seq).copy()
    seq[dup // 2] = seq[dup]
    byte = byte._replace(
        seq=jnp.asarray(seq),
        length=jnp.asarray(np.asarray(byte.length)).at[dup // 2].set(
            byte.length[dup]),
        subk=jnp.asarray(np.asarray(byte.subk)).at[dup // 2].set(
            byte.subk[dup]),
    )
    marker = _draw_markers_dyn(byte, 13)
    out_byte = dyn_extension_round_with_markers(byte, marker, kmin=23)
    out_packed = pd.pdyn_extension_round_with_markers(
        pd.from_dyn(byte), marker, kmin=23, max_sub=94)
    assert canon_rows(out_byte) == canon_rows(pd.to_dyn(out_packed))


def _merge_oracle_possible(seq, length, subk, live, i, j):
    """True if live record j's tail sub-kmer prefixes live record i's head
    (the gate-free mixed-k merge precondition of
    ``pdyn_extension_round_with_markers``)."""
    if not (live[i] and live[j]):
        return False
    if subk[j] > subk[i]:
        return False
    t0 = length[j] - subk[j]
    return bytes(seq[j, t0:t0 + subk[j]]) == bytes(seq[i, :subk[j]])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_finished_mask_exact_never_parks_mergeable(seed):
    """The interval census must keep every record with a real prefix
    partner, and must park at least everything the narrow census parks."""
    rng = np.random.default_rng(seed)
    kmin = 9
    byte = random_pool(rng, 96, [kmin, 13, 17], cap_len=64)
    # plant some genuine partners: j's tail copied into i's head
    seq = np.asarray(byte.seq).copy()
    length = np.asarray(byte.length)
    subk = np.asarray(byte.subk)
    for i, j in ((0, 1), (2, 3), (4, 5)):
        if subk[j] <= subk[i]:
            t0 = length[j] - subk[j]
            seq[i, :subk[j]] = seq[j, t0:t0 + subk[j]]
    byte = byte._replace(seq=jnp.asarray(seq))
    p = pd.from_dyn(byte)
    max_sub = int(np.asarray(byte.subk).max())
    exact = np.asarray(pd.finished_mask_pdyn_exact(p, max_sub))
    narrow = np.asarray(pd.finished_mask_pdyn(p, kmin))
    live = np.asarray(byte.live)
    n = len(live)
    for i in range(n):
        if not live[i]:
            assert not exact[i]
            continue
        mergeable = any(
            _merge_oracle_possible(seq, length, subk, live, i, j)
            or _merge_oracle_possible(seq, length, subk, live, j, i)
            for j in range(n)
        )
        if mergeable:
            assert not exact[i], i
    # exact parks everything the narrow census parks
    assert not (narrow & ~exact).any()


def test_finished_mask_exact_parks_kmin_collisions():
    """Two records that share a (kmin-1) window but diverge inside their
    sub-kmers: the narrow census keeps both forever, the interval census
    parks them."""
    kmin = 9
    gw = kmin - 1
    n, cap = 8, 48
    seq = np.zeros((n, cap), np.uint8)
    length = np.full(n, 20, np.int32)
    subk = np.full(n, 12, np.int32)   # k=13 records
    # record 0 head and record 1 tail agree on the first 8 bases but differ
    # at base 8 (inside the 12-base sub-kmer) => no merge is possible
    common = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    seq[0, :20] = np.concatenate([common, [1], np.zeros(11, np.uint8)])
    tail = np.concatenate([common, [2], [3, 3, 3]])
    seq[1, :20] = np.concatenate([np.zeros(8, np.uint8), tail])
    live = np.zeros(n, bool)
    live[:2] = True
    byte = DynRecords(
        jnp.asarray(seq), jnp.asarray(length), jnp.asarray(subk),
        jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32), jnp.asarray(live),
    )
    p = pd.from_dyn(byte)
    narrow = np.asarray(pd.finished_mask_pdyn(p, kmin))
    exact = np.asarray(pd.finished_mask_pdyn_exact(p, 12))
    assert not narrow[0] and not narrow[1]   # kmin-1 collision keeps both
    assert exact[0] and exact[1]             # divergence inside subk parks


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("unique_only", [False, True])
def test_round_forms_bit_identical(seed, unique_only):
    """The four (variadic, partner_fill) forms of the mixed-k round must be
    bit-identical on every output column — including the fill-carried tail
    window (carried as sort payload, round 4) vs the post-fill
    extract_window. CPU run of the TPU-default forms."""
    rng = np.random.default_rng(100 + seed)
    klist = [5, 7, 9]
    byte = random_pool(rng, 96, klist, cap_len=48)
    dup = rng.integers(0, 96, size=32)
    seq = np.asarray(byte.seq).copy()
    seq[dup // 2] = seq[dup]
    byte = byte._replace(
        seq=jnp.asarray(seq),
        length=jnp.asarray(np.asarray(byte.length)).at[dup // 2].set(
            byte.length[dup]),
        subk=jnp.asarray(np.asarray(byte.subk)).at[dup // 2].set(
            byte.subk[dup]),
    )
    marker = _draw_markers_dyn(byte, 7)
    packed = pd.from_dyn(byte)
    outs = []
    for variadic, fill in ((False, False), (True, False), (True, True)):
        outs.append(pd._pdyn_round_impl(
            packed, marker, kmin=min(klist), max_sub=max(klist) - 1,
            unique_only=unique_only, variadic=variadic, partner_fill=fill))
    ref = outs[0]
    for got in outs[1:]:
        np.testing.assert_array_equal(np.asarray(ref.seq),
                                      np.asarray(got.seq))
        np.testing.assert_array_equal(np.asarray(ref.length),
                                      np.asarray(got.length))
        np.testing.assert_array_equal(np.asarray(ref.subk),
                                      np.asarray(got.subk))
        np.testing.assert_array_equal(np.asarray(ref.left),
                                      np.asarray(got.left))
        np.testing.assert_array_equal(np.asarray(ref.right),
                                      np.asarray(got.right))
        np.testing.assert_array_equal(np.asarray(ref.live),
                                      np.asarray(got.live))


def test_bucketed_round_matches_monolithic(monkeypatch):
    """The host-routed bucketed round (over-HBM pools) must equal the
    monolithic fused round as a multiset of live records: partners always
    share the (kmin-1)-base group key, so hash bucketing never separates a
    joinable pair, and orientation draws hash row content, not position."""
    from reflexiv_tpu import dynamic

    rng = np.random.default_rng(9)
    klist = [5, 7, 9]
    n = 512
    byte = random_pool(rng, n, klist, cap_len=64)
    seq = np.asarray(byte.seq).copy()
    length = np.asarray(byte.length).copy()
    subk = np.asarray(byte.subk).copy()
    left = np.asarray(byte.left).copy()
    right = np.asarray(byte.right).copy()
    dup = rng.integers(0, n, size=n // 2)
    for arr in (seq, length, subk, left, right):
        arr[dup // 2] = arr[dup]
    byte2 = DynRecords(seq, length, subk, left, right, np.ones(n, bool))
    packed = pd.from_dyn_host(byte2)
    seed_it = 13
    mono, live_n, need_m = pd.pdyn_extension_round_fused(
        packed, jnp.uint32(seed_it), kmin=5, max_sub=8, unique_only=False)

    hp = (np.asarray(packed.seq), np.asarray(packed.length),
          np.asarray(packed.subk), np.asarray(packed.left),
          np.asarray(packed.right))
    monkeypatch.setenv("REFLEXIV_BUCKET_CAP", "128")
    new_hp, total_live, need_b = dynamic._pdyn_round_bucketed_host(
        hp, seed_it, kmin=5, max_sub=8, unique_only=False,
        need=int(np.max(length)) * 2)

    def multiset(sq, ls, sk, lf, rt):
        return sorted(
            (int(ls[i]), int(sk[i]), int(lf[i]), int(rt[i]),
             sq[i].tobytes())
            for i in range(len(ls)))

    got = multiset(*new_hp)
    keep = np.nonzero(np.asarray(mono.live))[0]
    want = multiset(
        np.asarray(mono.seq)[keep], np.asarray(mono.length)[keep],
        np.asarray(mono.subk)[keep], np.asarray(mono.left)[keep],
        np.asarray(mono.right)[keep])
    assert got == want
    assert total_live == int(live_n) and total_live < n  # joins happened
    assert need_b == int(need_m)
