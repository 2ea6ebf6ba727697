import random

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from reflexiv_tpu import dynamic
from reflexiv_tpu.assembler import assemble_reads
from reflexiv_tpu.contigs import canonical_contig
from reflexiv_tpu.io import reads_to_matrix
from reflexiv_tpu.params import Params


def _mk(seqs_attrs, k):
    """(seq, left, right) triple from a list of (kmer, left, right)."""
    from reflexiv_tpu.bitpack import encode_ascii
    bases = np.stack([
        encode_ascii(np.frombuffer(s.encode(), np.uint8))
        for s, _, _ in seqs_attrs]) if seqs_attrs else np.zeros((0, k), np.uint8)
    left = np.asarray([l for _, l, _ in seqs_attrs], np.int32)
    right = np.asarray([r for _, _, r in seqs_attrs], np.int32)
    return bases, left, right


def _to_set(triple, k):
    from reflexiv_tpu.bitpack import decode_to_str
    bases, left, right = triple
    return {(decode_to_str(b), int(l), int(r))
            for b, l, r in zip(bases, left, right)}


def test_reduce_prefix_subsumption():
    k1, k2 = 5, 8
    shorts = [("ACGTA", -3, -3), ("GGGTT", -3, -3)]
    longs = [("ACGTACCA", -3, -3), ("TTTTAAAA", -3, -3)]
    s_out, l_out = dynamic.reduce_k_pair(_mk(shorts, k1), _mk(longs, k2), k1, k2)
    s_set = _to_set(s_out, k1)
    # ACGTA is a prefix of ACGTACCA -> neutralized; GGGTT survives
    assert ("GGGTT", -3, -3) in s_set
    assert all(s != "ACGTA" for s, _, _ in s_set)
    assert len(_to_set(l_out, k2)) == 2


def test_reduce_right_end_attr_inheritance():
    k1, k2 = 5, 8
    # short's first k1-1 bases == long's bases [k2-k1, k2-1): GTACC vs ..GTACC?
    # long = AAAGTACC: window [3,7) = "TACC"[:... k1-1=4 bases ending one
    # before last: long[3:7]="TAC C"? long[8-5:8-1]=long[3:7]="GTAC";
    # short[0:4]="GTAC", short last base 'A', long last base 'C'
    shorts = [("GTACA", -3, -9)]          # right extendable (-9)
    longs = [("AAAGTACC", -3, 4)]         # right blocked (4)
    s_out, l_out = dynamic.reduce_k_pair(_mk(shorts, k1), _mk(longs, k2), k1, k2)
    l_set = _to_set(l_out, k2)
    # long inherits right extendability (-1) and the short's final base 'A'
    assert ("AAAGTACA", -3, -1) in l_set


def test_dyn_round_matches_fixed_k_semantics():
    # all records same k: one dyn round must merge the same pairs as the
    # fixed-k oracle (sequence-level)
    rng = random.Random(5)
    k = 11
    genome = "".join(rng.choice("ACGT") for _ in range(100))
    orecs = oracle.build_records([genome, genome], k, 1, 8)
    pool = dynamic.records_from_sorted([
        (np.stack([
            __import__("reflexiv_tpu.bitpack", fromlist=["encode_ascii"])
            .encode_ascii(np.frombuffer(r.seq.encode(), np.uint8))
            for r in orecs]),
         np.asarray([r.left for r in orecs], np.int32),
         np.asarray([r.right for r in orecs], np.int32),
         k)])
    markers = [rng.choice((1, 2)) for _ in range(pool.capacity)]
    live = np.asarray(pool.live)
    # oracle round over live rows with same draws
    olive = [oracle.Rec(orecs[i].seq, orecs[i].left, orecs[i].right)
             for i in range(len(orecs))]
    want = {r.seq for r in oracle.extension_round(
        olive, [markers[i] for i in range(len(orecs))], k)}
    out = dynamic.dyn_extension_round_with_markers(
        pool, jnp.asarray(markers, jnp.int32), kmin=k, kmax=k)
    from reflexiv_tpu.bitpack import decode_to_str
    seq, length, subk, left, right, live = (np.asarray(a) for a in out)
    got = {decode_to_str(seq[i, :length[i]]) for i in np.nonzero(live)[0]}
    assert got == want


@pytest.mark.slow
def test_dynamic_assembly_uniform_coverage():
    rng = random.Random(23)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    reads = []
    for _ in range(300):
        s = rng.randrange(len(genome) - 60)
        r = genome[s:s + 60]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, klist=(15, 21, 31), min_kmer_coverage=2,
                    min_contig=300)
    contigs = dynamic.assemble_dynamic(mat, lens, params, seed=1)
    canon = {canonical_contig(s) for _, s in contigs}
    assert len(canon) == 1
    (c,) = canon
    assert len(c) >= 420
    assert c in genome or oracle.revcomp(c) in genome


@pytest.mark.slow
def test_dynamic_rescues_low_coverage_region():
    """Sparse region: adjacent reads overlap by only ~17 bases, so 31-mers
    spanning junctions are single-copy (filtered at min_cov=2) but 15-mers in
    the overlaps are double-covered. Single k=31 must fragment; the dynamic
    klist must bridge."""
    rng = random.Random(31)
    genome = "".join(rng.choice("ACGT") for _ in range(900))
    reads = []
    # dense region [0, 450): heavy random coverage
    for _ in range(260):
        s = rng.randrange(0, 450 - 60)
        reads.append(genome[s:s + 60])
    # sparse region [430, 900): tiled reads with 17bp overlaps, duplicated
    step = 43
    for rep in range(2):
        for s in range(430, 900 - 60 + 1, step):
            reads.append(genome[s:s + 60])
    reads.append(genome[900 - 60:900])
    reads.append(genome[900 - 60:900])
    mat, lens = reads_to_matrix([r.encode() for r in reads])

    single = assemble_reads(
        mat, lens, Params(k=31, min_kmer_coverage=2, min_contig=200), seed=3)
    single_canon = {canonical_contig(s) for _, s in single}

    params = Params(klist=(15, 21, 31), min_kmer_coverage=2, min_contig=200)
    dyn = dynamic.assemble_dynamic(mat, lens, params, seed=3)
    dyn_canon = {canonical_contig(s) for _, s in dyn}

    best_single = max((len(s) for s in single_canon), default=0)
    best_dyn = max(len(s) for s in dyn_canon)
    # dynamic must recover a much longer contig than fixed k=31
    assert best_dyn > best_single
    assert best_dyn >= 800
    longest = max(dyn_canon, key=len)
    assert longest in genome or oracle.revcomp(longest) in genome


def _pool_from_strings(seqs, subk=30, left=-1, right=-1):
    from reflexiv_tpu.bitpack import encode_ascii
    from reflexiv_tpu.dynamic import _dyn_pool_from_rows

    rows = []
    for s in seqs:
        for t in (s, oracle.revcomp(s)):
            rows.append((
                encode_ascii(np.frombuffer(t.encode(), np.uint8)),
                subk, left, right,
            ))
    return _dyn_pool_from_rows(rows)


def _live_canon(recs):
    from reflexiv_tpu.bitpack import decode_to_str

    seq, length, _subk, _l, _r, live = (np.asarray(a) for a in recs)
    return {
        canonical_contig(decode_to_str(seq[i, :length[i]]))
        for i in np.nonzero(live)[0]
    }


@pytest.mark.slow
def test_faithful_fixing_joins_offset_overlap():
    """Two fragments overlapping by 45 bases (not exactly k-1=30): the
    unique-exact-overlap fast path cannot join them, the faithful 04Fixing
    split (contig-end k-mer chains, ReflexivDSDynamicKmerFixing.java:1190)
    must."""
    rng = random.Random(7)
    genome = "".join(rng.choice("ACGT") for _ in range(700))
    a = genome[:380]
    b = genome[335:]  # 45 bp overlap with a

    params = Params(klist=(23, 31, 41, 53), min_kmer_coverage=2)

    fast = dynamic.fixing_rounds(
        _pool_from_strings([a, b]), params, kfix=31, seed=5)
    assert max(len(s) for s in _live_canon(fast)) < 700

    fixed = dynamic.fixing_rounds_faithful(
        _pool_from_strings([a, b]), params, kmax=53, seed=5)
    canon = _live_canon(fixed)
    best = max(canon, key=len)
    assert len(best) == 700
    assert best == canonical_contig(genome)


def test_fixing_split_arrays_matches_scalar():
    """The vectorized fixing split must produce the same end windows,
    interiors, and small passthroughs as the per-record scalar loop."""
    import numpy as np

    from reflexiv_tpu.dynamic import _fixing_split, _fixing_split_arrays

    rng = random.Random(5)
    seqs = [
        "".join(rng.choice("ACGT") for _ in range(n))
        for n in (40, 33, 26, 25, 12, 10)  # big (>=2*kmax=26) and small
    ]
    pool = _pool_from_strings(seqs, subk=8, left=-1, right=3)
    kmax, kfix = 13, 9
    ew_s, ints_s, smalls_s = _fixing_split(pool, kmax, kfix)
    ew_a, ints_a, smalls_a = _fixing_split_arrays(pool, kmax, kfix)
    assert sorted(map(bytes, ew_s)) == sorted(map(bytes, ew_a))

    def rows_scalar(tuples):
        return sorted(
            (bytes(c), int(sk), int(l), int(r)) for c, sk, l, r in tuples)

    def rows_arrays(part):
        seq, length, sk, l, r = part
        return sorted(
            (bytes(seq[i, :length[i]]), int(sk[i]), int(l[i]), int(r[i]))
            for i in range(len(length)))

    assert rows_scalar(ints_s) == rows_arrays(ints_a)
    assert rows_scalar(smalls_s) == rows_arrays(smalls_a)
    assert len(ew_a) > 0 and len(rows_arrays(ints_a)) > 0


def test_dynamic_assembly_bucketed_big_pool_phase(monkeypatch):
    """Forcing a tiny bucket threshold routes the early extension rounds
    through the host-bucketed phase (the over-HBM-pool path of the 10 Mbp
    campaign) and hands off to the device loop; the assembly must still
    reconstruct the genome."""
    monkeypatch.setenv("REFLEXIV_BUCKET_ROUND_ROWS", "64")
    monkeypatch.setenv("REFLEXIV_BUCKET_CAP", "256")
    rng = random.Random(23)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    reads = []
    for _ in range(300):
        s = rng.randrange(len(genome) - 60)
        r = genome[s:s + 60]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, klist=(15, 21, 31), min_kmer_coverage=2,
                    min_contig=300)
    contigs = dynamic.assemble_dynamic(mat, lens, params, seed=1)
    canon = {canonical_contig(s) for _, s in contigs}
    assert len(canon) == 1
    (c,) = canon
    assert len(c) >= 420
    assert c in genome or oracle.revcomp(c) in genome


@pytest.mark.parametrize("klist,max_sub", [((5, 7, 9), 8), ((21, 31, 41), 40)])
def test_host_census_matches_device_exact(klist, max_sub):
    """``_finished_mask_host_exact`` (the bucketed phase's parking census)
    must equal ``packed_dyn.finished_mask_pdyn_exact`` row for row on an
    all-live pool — single-limb and multi-limb key widths."""
    from reflexiv_tpu import packed_dyn as pd

    rng = np.random.default_rng(31)
    n = 256
    ks = rng.choice(klist, size=n)
    ext = rng.integers(1, 8, size=n)
    length = (ks + ext).astype(np.int32)
    seqb = np.zeros((n, 64), np.uint8)
    for i in range(n):
        seqb[i, :length[i]] = rng.integers(0, 4, size=length[i])
    # clone some rows so real head/tail intersections exist
    dup = rng.integers(0, n, size=n // 4)
    seqb[dup // 2], length[dup // 2] = seqb[dup], length[dup]
    ks[dup // 2] = ks[dup]
    d = dynamic.DynRecords(
        seqb, length, (ks - 1).astype(np.int32),
        np.zeros(n, np.int32), np.zeros(n, np.int32), np.ones(n, bool))
    p = pd.from_dyn_host(d)
    keep = np.nonzero(np.asarray(p.live))[0]
    want = np.asarray(pd.finished_mask_pdyn_exact(p, max_sub))[keep]
    hp = (np.asarray(p.seq)[keep], np.asarray(p.length)[keep],
          np.asarray(p.subk)[keep], np.asarray(p.left)[keep],
          np.asarray(p.right)[keep])
    got = dynamic._finished_mask_host_exact(hp, max_sub)
    np.testing.assert_array_equal(got, want)


def test_bucketed_round_equal_hash_skew(monkeypatch):
    """>cap rows sharing one group key must not spin the bucket-doubling
    loop forever (ADVICE r4 medium): the skewed bucket gets a one-off
    larger program and the round still matches the monolithic result."""
    from reflexiv_tpu import packed_dyn as pd

    rng = np.random.default_rng(7)
    n, k = 96, 5
    seqb = np.zeros((n, 32), np.uint8)
    seqb[:, :12] = rng.integers(0, 4, size=12)   # every row identical
    length = np.full(n, 12, np.int32)
    d = dynamic.DynRecords(
        seqb, length, np.full(n, k - 1, np.int32),
        np.zeros(n, np.int32), np.zeros(n, np.int32), np.ones(n, bool))
    p = pd.from_dyn_host(d)
    mono, live_n, need_m = pd.pdyn_extension_round_fused(
        p, jnp.uint32(3), kmin=k, max_sub=8, unique_only=False)
    keep = np.nonzero(np.asarray(p.live))[0]
    hp = (np.asarray(p.seq)[keep], np.asarray(p.length)[keep],
          np.asarray(p.subk)[keep], np.asarray(p.left)[keep],
          np.asarray(p.right)[keep])
    monkeypatch.setenv("REFLEXIV_BUCKET_CAP", "16")
    new_hp, total_live, need_b = dynamic._pdyn_round_bucketed_host(
        hp, 3, kmin=k, max_sub=8, unique_only=False, need=24)

    def multiset(sq, ls, sk, lf, rt):
        return sorted(
            (int(ls[i]), int(sk[i]), int(lf[i]), int(rt[i]), sq[i].tobytes())
            for i in range(len(ls)))

    got = multiset(*new_hp)
    mkeep = np.nonzero(np.asarray(mono.live))[0]
    want = multiset(
        np.asarray(mono.seq)[mkeep], np.asarray(mono.length)[mkeep],
        np.asarray(mono.subk)[mkeep], np.asarray(mono.left)[mkeep],
        np.asarray(mono.right)[mkeep])
    assert got == want and total_live == int(live_n)

    # and a clear error (not an infinite loop) past the hard ceiling
    monkeypatch.setenv("REFLEXIV_BUCKET_CAP_MAX", "64")
    with pytest.raises(RuntimeError, match="repeat skew"):
        dynamic._pdyn_round_bucketed_host(
            hp, 3, kmin=k, max_sub=8, unique_only=False, need=24)


def test_host_concat_packed_matches_device():
    """numpy splice mirror == packed.concat on random packed rows."""
    from reflexiv_tpu.packed import concat, limbs_for, pack_seq_matrix

    rng = np.random.default_rng(3)
    M, cap = 64, 96
    la = rng.integers(5, cap - 1, M).astype(np.int32)
    lb = rng.integers(5, cap - 1, M).astype(np.int32)
    skip = np.minimum(rng.integers(0, 30, M), lb - 1).astype(np.int32)

    def mk(lens):
        b = np.zeros((M, cap), np.uint8)
        for i in range(M):
            b[i, :lens[i]] = rng.integers(0, 4, lens[i])
        return np.asarray(pack_seq_matrix(jnp.asarray(b)))

    a_, b_ = mk(la), mk(lb)
    out_limbs = limbs_for(int((la + lb - skip).max()))
    want_seq, want_len = concat(
        jnp.asarray(a_), jnp.asarray(la), jnp.asarray(b_), jnp.asarray(lb),
        jnp.asarray(skip), out_limbs)
    got_seq, got_len = dynamic._host_concat_packed(
        a_, la, b_, lb, skip, out_limbs)
    np.testing.assert_array_equal(got_seq, np.asarray(want_seq))
    np.testing.assert_array_equal(got_len, np.asarray(want_len))


@pytest.mark.parametrize("klist,max_sub,unique_only", [
    ((5, 7, 9), 8, False), ((21, 31, 41), 40, False), ((5, 7, 9), 8, True),
])
def test_indexed_round_matches_monolithic(klist, max_sub, unique_only,
                                          monkeypatch):
    """The summary-indexed host round (device sees fixed-width summaries,
    host splices bytes) must equal the monolithic fused round as a
    multiset of live records — same marker draw, same joins, same attrs —
    across bucket boundaries and limb widths."""
    from reflexiv_tpu import packed_dyn as pd

    rng = np.random.default_rng(11)
    kmin = min(klist)
    n = 384
    ks = rng.choice(klist, size=n)
    ext = rng.integers(1, 8, size=n)
    length = (ks + ext).astype(np.int32)
    seqb = np.zeros((n, 64), np.uint8)
    for i in range(n):
        seqb[i, :length[i]] = rng.integers(0, 4, size=length[i])
    dup = rng.integers(0, n, size=n // 2)
    seqb[dup // 2], length[dup // 2] = seqb[dup], length[dup]
    ks[dup // 2] = ks[dup]
    d = dynamic.DynRecords(
        seqb, length, (ks - 1).astype(np.int32),
        np.full(n, -1, np.int32), np.full(n, -1, np.int32),
        np.ones(n, bool))
    p = pd.from_dyn_host(d)
    seed_it = 29
    mono, live_n, need_m = pd.pdyn_extension_round_fused(
        p, jnp.uint32(seed_it), kmin=kmin, max_sub=max_sub,
        unique_only=unique_only)

    keep = np.nonzero(np.asarray(p.live))[0]
    hp = (np.asarray(p.seq)[keep], np.asarray(p.length)[keep],
          np.asarray(p.subk)[keep], np.asarray(p.left)[keep],
          np.asarray(p.right)[keep])
    # tiny dense width: most rows land in the ragged overflow dict, so the
    # slow (per-row funnel) splice path is exercised alongside the fast one
    monkeypatch.setattr(dynamic._RaggedPool, "W_DENSE", 2)
    rp = dynamic._RaggedPool.from_dense(hp)
    summ = dynamic._summaries_ragged(rp, max_sub)
    for a, b in zip(summ, dynamic._host_summaries(hp, max_sub)):
        np.testing.assert_array_equal(a, b)   # ragged == dense summaries
    monkeypatch.setenv("REFLEXIV_BUCKET_CAP", "64")   # force many buckets
    rp2, nsum, n_live, need_i = dynamic._pdyn_round_indexed_host(
        rp, summ, seed_it, kmin=kmin, max_sub=max_sub,
        unique_only=unique_only, need=int(length.max()) * 2)

    def multiset(sq, ls, sk, lf, rt):
        return sorted(
            (int(ls[i]), int(sk[i]), int(lf[i]), int(rt[i]),
             sq[i].tobytes().rstrip(b"\0"))
            for i in range(len(ls)))

    got = []
    for g in rp2.to_groups():
        got.extend(multiset(*g))
    got.sort()
    mkeep = np.nonzero(np.asarray(mono.live))[0]
    want = multiset(
        np.asarray(mono.seq)[mkeep], np.asarray(mono.length)[mkeep],
        np.asarray(mono.subk)[mkeep], np.asarray(mono.left)[mkeep],
        np.asarray(mono.right)[mkeep])
    assert got == want
    assert n_live == int(live_n)
    assert need_i == int(need_m)
    # maintained summaries must equal fresh ones (incremental correctness)
    fresh = dynamic._summaries_ragged(rp2, max_sub)
    for a, b in zip(nsum, fresh):
        np.testing.assert_array_equal(a, b)
    # census from summaries == census from bytes (same row order)
    Wmax = max((len(rp2.row_seq(i)) for i in range(rp2.n)), default=1)
    seq2 = np.zeros((rp2.n, Wmax), np.uint32)
    for i in range(rp2.n):
        r = rp2.row_seq(i)
        seq2[i, :len(r)] = r
    np.testing.assert_array_equal(
        dynamic._finished_mask_from_summ(nsum, rp2.subk, max_sub),
        dynamic._finished_mask_host_exact(
            (seq2, rp2.length, rp2.subk, rp2.left, rp2.right), max_sub))


def test_dynamic_assembly_indexed_always(monkeypatch):
    """REFLEXIV_INDEXED_ALWAYS=1 (the TPU default) routes the ENTIRE
    extension loop — all pool sizes — through the summary-indexed host
    rounds; the assembly must still reconstruct the genome."""
    monkeypatch.setenv("REFLEXIV_INDEXED_ALWAYS", "1")
    monkeypatch.setenv("REFLEXIV_BUCKET_CAP", "256")
    rng = random.Random(31)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    reads = []
    for _ in range(300):
        s = rng.randrange(len(genome) - 60)
        r = genome[s:s + 60]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, klist=(15, 21, 31), min_kmer_coverage=2,
                    min_contig=300)
    contigs = dynamic.assemble_dynamic(mat, lens, params, seed=1)
    canon = {canonical_contig(s) for _, s in contigs}
    assert len(canon) == 1
    (c,) = canon
    assert len(c) >= 420
    assert c in genome or oracle.revcomp(c) in genome


@pytest.mark.slow
def test_indexed_always_overflow_contig(monkeypatch):
    """A genome longer than the ragged pool's dense width (W_DENSE shrunk
    here) forces real overflow rows and per-row funnel splices through a
    full indexed-always assembly — the campaign's megabase-contig shape
    in miniature."""
    monkeypatch.setenv("REFLEXIV_INDEXED_ALWAYS", "1")
    monkeypatch.setenv("REFLEXIV_BUCKET_CAP", "4096")
    monkeypatch.setattr(dynamic._RaggedPool, "W_DENSE", 16)  # 256 bases
    rng = random.Random(41)
    genome = "".join(rng.choice("ACGT") for _ in range(3000))
    reads = []
    for _ in range(1200):
        s = rng.randrange(len(genome) - 80)
        r = genome[s:s + 80]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, klist=(15, 21, 31), min_kmer_coverage=2,
                    min_contig=1500)
    contigs = dynamic.assemble_dynamic(mat, lens, params, seed=1)
    canon = {canonical_contig(s) for _, s in contigs}
    assert len(canon) == 1
    (c,) = canon
    assert len(c) >= 2500          # way past the shrunken dense width
    assert c in genome or oracle.revcomp(c) in genome
