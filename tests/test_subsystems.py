"""Tests for reassembler, merger, mercy, preprocess, stitch."""
import os
import random

import numpy as np
import pytest

import oracle
from reflexiv_tpu.contigs import canonical_contig
from reflexiv_tpu.io import reads_to_matrix
from reflexiv_tpu.params import Params


def _sim_reads(rng, genome, read_len, coverage, err_rate=0.0, rc=True):
    reads = []
    n = coverage * len(genome) // read_len
    for _ in range(n):
        s = rng.randrange(len(genome) - read_len + 1)
        r = list(genome[s:s + read_len])
        for i in range(len(r)):
            if rng.random() < err_rate:
                r[i] = rng.choice("ACGT")
        r = "".join(r)
        if rc and rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    return reads


@pytest.mark.slow
def test_reassembler_extends_fragment():
    from reflexiv_tpu.reassemble import reassemble_arrays

    rng = random.Random(77)
    genome = "".join(rng.choice("ACGT") for _ in range(700))
    # fragment covers the middle; reads cover everything
    frag = genome[250:450]
    reads = _sim_reads(rng, genome, 60, 30)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, min_kmer_coverage=2, min_contig=400)
    contigs = reassemble_arrays(mat, lens, [frag], params, seed=1)
    canon = {canonical_contig(s) for _, s in contigs}
    assert len(canon) == 1
    (c,) = canon
    assert len(c) >= 600
    assert c in genome or oracle.revcomp(c) in genome
    # the fragment's interior must be inside the reassembled contig
    assert frag in c or oracle.revcomp(frag) in c


@pytest.mark.slow
def test_reassembler_byte_budget_passes_longest_through(monkeypatch):
    """When the dense pool exceeds REFLEXIV_REASSEMBLE_BYTES, only the
    LONGEST fragments pass through untouched — shorter fragments keep
    their read-graph bridging (round-5 graceful degradation; the old
    behavior skipped reassembly for the whole pool)."""
    from reflexiv_tpu.reassemble import reassemble_arrays

    rng = random.Random(77)
    genome = "".join(rng.choice("ACGT") for _ in range(700))
    frag = genome[250:450]
    # a giant unrelated fragment that alone would blow a tiny byte budget
    giant = "".join(rng.choice("ACGT") for _ in range(4096))
    reads = _sim_reads(rng, genome, 60, 30)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, min_kmer_coverage=2, min_contig=400)
    # budget fits the pool at cap_len ~512 (the 200 bp fragment) but not
    # at cap_len 4096 (the giant): rows ~2^12 -> 2^12 * 4096 > budget
    monkeypatch.setenv("REFLEXIV_REASSEMBLE_BYTES", str(4_000_000))
    contigs = reassemble_arrays(mat, lens, [frag, giant], params, seed=1)
    seqs = [s for _, s in contigs]
    # the giant passed through verbatim
    assert giant in seqs
    # the fragment-scale contig still got extended through the reads
    canon = {canonical_contig(s) for s in seqs if s != giant}
    assert any(len(c) >= 600 and (c in genome or oracle.revcomp(c) in genome)
               for c in canon)


def test_merger_removes_redundant():
    from reflexiv_tpu.merger import merge_contigs

    rng = random.Random(3)
    a = "".join(rng.choice("ACGT") for _ in range(300))
    sub = a[50:200]
    rc_sub = oracle.revcomp(a[100:250])
    b = "".join(rng.choice("ACGT") for _ in range(200))
    merged = merge_contigs([a, sub, rc_sub, b, b])
    assert sorted(merged, key=len) == sorted([b, a], key=len)


@pytest.mark.slow
def test_mercy_rescues_single_copy_bridge():
    from reflexiv_tpu.mercy import mercy_kmer_table
    from reflexiv_tpu.assembler import assemble_from_counts, assemble_reads

    rng = random.Random(55)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    k = 21
    # heavy coverage everywhere except a thin middle stretch covered once
    reads = []
    mid = len(genome) // 2
    for _ in range(150):
        s = rng.randrange(0, mid - 60)
        reads.append(genome[s:s + 60])
    for _ in range(150):
        s = rng.randrange(mid + 20, len(genome) - 60)
        reads.append(genome[s:s + 60])
    # single bridge read spanning the gap with solid flanks on both sides
    reads.append(genome[mid - 60: mid + 100])
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=k, min_kmer_coverage=2, min_contig=150)

    plain = assemble_reads(mat, lens, params, seed=9)
    plain_best = max((len(s) for _, s in plain), default=0)

    limbs, counts = mercy_kmer_table(mat, lens, k=k, min_cov=2)
    mercy = assemble_from_counts(limbs, counts, params, seed=9)
    mercy_best = max(len(s) for _, s in mercy)
    # mercy k-mers bridge the single-copy stretch
    assert mercy_best > plain_best
    assert mercy_best >= 360
    best = max((s for _, s in mercy), key=len)
    assert best in genome or oracle.revcomp(best) in genome


def test_merge_pairs_overlap():
    from reflexiv_tpu.preprocess import merge_pairs

    rng = random.Random(8)
    insert = "".join(rng.choice("ACGT") for _ in range(150))
    r1 = insert[:100]
    r2 = oracle.revcomp(insert[50:150])  # overlap 50
    m1, l1 = reads_to_matrix([r1.encode()])
    m2, l2 = reads_to_matrix([r2.encode()])
    merged, mask = merge_pairs(m1, l1, m2, l2)
    assert mask.tolist() == [True]
    from reflexiv_tpu.bitpack import decode_to_str
    assert decode_to_str(merged[0]) == insert

    # non-overlapping pair stays split
    other = "".join(rng.choice("ACGT") for _ in range(100))
    m2b, l2b = reads_to_matrix([oracle.revcomp(other).encode()])
    out, mask2 = merge_pairs(m1, l1, m2b, l2b)
    assert mask2.tolist() == [False]
    assert len(out) == 2


def test_error_correction_fixes_isolated_errors():
    from reflexiv_tpu.preprocess import correct_reads

    rng = random.Random(12)
    genome = "".join(rng.choice("ACGT") for _ in range(300))
    reads = _sim_reads(rng, genome, 80, 25, rc=False)
    # corrupt one base in the middle of the first read
    bad = list(reads[0])
    orig = bad[40]
    bad[40] = next(c for c in "ACGT" if c != orig)
    reads[0] = "".join(bad)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    fixed, n_fixed = correct_reads(mat, lens, k=21, min_cov=3)
    assert n_fixed >= 1
    from reflexiv_tpu.bitpack import decode_to_str
    assert decode_to_str(fixed[0, :lens[0]]) == "".join(
        orig if i == 40 else c for i, c in enumerate(reads[0]))


@pytest.mark.slow
def test_stitch_bridges_zero_coverage_gap():
    from reflexiv_tpu.stitch import stitch_contigs
    from reflexiv_tpu.assembler import assemble_reads

    rng = random.Random(99)
    genome = "".join(rng.choice("ACGT") for _ in range(700))
    # deep coverage on both flanks, single-copy reads over the gap
    reads = []
    for _ in range(180):
        s = rng.randrange(0, 280 - 60)
        reads.append(genome[s:s + 60])
    for _ in range(180):
        s = rng.randrange(380, len(genome) - 60)
        reads.append(genome[s:s + 60])
    for s in range(230, 390, 25):  # sparse single-copy tiling over the gap
        reads.append(genome[s:s + 60])
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, min_kmer_coverage=2, min_contig=150)
    base = assemble_reads(mat, lens, params, seed=4)
    base_contigs = sorted({canonical_contig(s) for _, s in base}, key=len)
    assert len(base_contigs) >= 2  # fragmented at the gap

    stitched = stitch_contigs(
        mat, lens, [s for _, s in base], params, klist=(21,), seed=4)
    best = max(stitched, key=len)
    assert len(best) >= 600
    assert best in genome or oracle.revcomp(best) in genome


def test_preprocess_interleaved(tmp_path):
    """-inter input: consecutive records are mates; pairs overlap-merge."""
    import numpy as np
    from reflexiv_tpu.cli import main as cli_main

    rng = random.Random(21)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    fq = tmp_path / "inter.fq"
    with open(fq, "w") as fh:
        n = 0
        for s in range(0, 440, 10):
            insert = genome[s: s + 160]
            r1 = insert[:100]
            r2 = oracle.revcomp(insert[60:160])  # 40 bp overlap
            for r in (r1, r2):
                fh.write(f"@pair{n}\n{r}\n+\n{'I'*len(r)}\n")
                n += 1
    out = tmp_path / "out"
    rc = cli_main([
        "preprocess", "-inter", str(fq), "-outfile", str(out), "-kmer", "21",
    ])
    assert rc == 0
    mdir = out / "Read_Interleaved_Merged"
    assert (mdir / "_SUCCESS").exists()
    merged = [l.strip() for l in open(mdir / "part-00000.fq")][1::4]
    # every pair overlaps by 40bp -> one 160bp merged read per pair
    assert all(len(m) == 160 for m in merged)
    assert len(merged) == 44
    assert merged[0] == genome[0:160]


@pytest.mark.slow
def test_reduce_emits_sorted_and_reduced_tables(tmp_path):
    from reflexiv_tpu.cli import main as cli_main

    rng = random.Random(33)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    reads = _sim_reads(rng, genome, 200, 60, rc=True)
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I'*len(r)}\n")
    out = tmp_path / "out"
    rc = cli_main([
        "reduce", "-fastq", str(fq), "-outfile", str(out),
        "-klist", "21,31,41", "-cover", "2",
    ])
    assert rc == 0
    for k in (21, 31, 41):
        # a completed Count_<k>_sorted eagerly deletes the superseded
        # Count_<k> dir, like the reference ladder (Pipelines.java:1425-1436)
        assert not (out / f"Count_{k}").exists()
        assert (out / f"Count_{k}_sorted" / "_SUCCESS").exists()
    for k in (21, 31, 41):
        assert (out / f"Count_{k}_reduced" / "_SUCCESS").exists()
    # the tables round-trip through the documented format
    from reflexiv_tpu.dynamic import read_sorted_set
    bases, left, right = read_sorted_set(str(out / "Count_21_reduced"), 21)
    assert bases.shape[1] == 21 and len(bases) == len(left) == len(right)

    # per-artifact resume (Pipelines.java:1368-1571): a re-run over completed
    # artifacts does ZERO counting and ZERO fork-filter/reduction compute
    import reflexiv_tpu.dynamic as dyn

    def boom(*a, **kw):
        raise AssertionError("resume must not recount/resort/rereduce")

    mpatch = pytest.MonkeyPatch()
    try:
        mpatch.setattr(dyn, "count_kmers_auto", boom)
        mpatch.setattr(dyn, "sort_k_records", boom)
        mpatch.setattr(dyn, "reduce_k_pair", boom)
        rc2 = cli_main([
            "reduce", "-fastq", str(fq), "-outfile", str(out),
            "-klist", "21,31,41", "-cover", "2",
        ])
    finally:
        mpatch.undo()
    assert rc2 == 0
    bases2, left2, right2 = read_sorted_set(str(out / "Count_21_reduced"), 21)
    assert len(bases2) == len(bases)


def test_error_correction_batched_matches_scalar():
    """The simultaneous batched passes must land the same corrections as
    the in-order per-read scan on scattered errors (including two errors
    inside one read, which the round loop handles)."""
    import numpy as np

    from reflexiv_tpu.preprocess import correct_reads, correct_reads_scalar

    rng = random.Random(41)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    reads = _sim_reads(rng, genome, 90, 120, rc=True)
    for i in range(0, len(reads), 5):  # plant errors in every 5th read
        bad = list(reads[i])
        for p in (17, 63):
            bad[p] = next(c for c in "ACGT" if c != bad[p])
        reads[i] = "".join(bad)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    got, n_got = correct_reads(mat, lens, k=21, min_cov=3)
    want, n_want = correct_reads_scalar(mat, lens, k=21, min_cov=3)
    assert n_got >= 1
    assert n_got == n_want
    assert np.array_equal(got, want)


def test_error_correction_device_matches_numpy_pass():
    """The device-resident pass (jitted weak scan + substitution tests,
    VERDICT r2 #2) must land byte-identical fixes vs the NumPy pass on a
    larger error field, including ambiguous (multi-candidate) positions."""
    import os

    import numpy as np

    from reflexiv_tpu.preprocess import correct_reads, correct_reads_device

    rng = random.Random(43)
    genome = "".join(rng.choice("ACGT") for _ in range(2000))
    reads = _sim_reads(rng, genome, 80, 500, rc=True)
    for i in range(0, len(reads), 4):
        bad = list(reads[i])
        p = rng.randrange(5, len(bad) - 5)
        bad[p] = next(c for c in "ACGT" if c != bad[p])
        reads[i] = "".join(bad)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    got, n_got = correct_reads_device(mat, lens, k=21, min_cov=3)
    os.environ["REFLEXIV_DEVICE_STAGES"] = "0"
    try:
        want, n_want = correct_reads(mat, lens, k=21, min_cov=3)
    finally:
        os.environ.pop("REFLEXIV_DEVICE_STAGES")
    assert n_got >= 10
    assert n_got == n_want
    assert np.array_equal(got, want)


def test_merge_pairs_python_fallback_matches_native():
    """The vectorized numpy fallback scorer must agree with the C++ one."""
    import numpy as np

    from reflexiv_tpu import native
    from reflexiv_tpu.preprocess import merge_pairs

    if native.merge_pairs_native(
        np.zeros((1, 20), np.uint8), np.asarray([20]),
        np.zeros((1, 20), np.uint8), np.asarray([20]),
        min_overlap=10, max_mismatch=0.25,
    ) is None:
        pytest.skip("native library unavailable")
    rng = random.Random(9)
    r1s, r2s = [], []
    for _ in range(40):
        insert = "".join(rng.choice("ACGT") for _ in range(rng.randrange(90, 220)))
        n1, n2 = rng.randrange(60, 101), rng.randrange(60, 101)
        r1s.append(insert[:n1])
        r2s.append(oracle.revcomp(insert[-n2:]))
    m1, l1 = reads_to_matrix([r.encode() for r in r1s])
    m2, l2 = reads_to_matrix([r.encode() for r in r2s])
    merged_nat, mask_nat = merge_pairs(m1, l1, m2, l2)
    orig = native.merge_pairs_native
    native.merge_pairs_native = lambda *a, **k: None
    try:
        merged_py, mask_py = merge_pairs(m1, l1, m2, l2)
    finally:
        native.merge_pairs_native = orig
    assert mask_nat.tolist() == mask_py.tolist()
    assert all(np.array_equal(a, b) for a, b in zip(merged_nat, merged_py))


def test_stitch_reuses_precomputed_stitch_table(tmp_path):
    """A Stitch_kmer/Count_<k>_sorted table from a prior reduce run is
    consumed instead of recounting (Pipelines.java:250-308 _SUCCESS skip),
    and reproduces the fork-filtered record set exactly."""
    import dataclasses

    import numpy as np

    from reflexiv_tpu import count as count_mod
    from reflexiv_tpu.assembler import initial_records_from_counts
    from reflexiv_tpu.dynamic import _write_sorted_set, sort_k_records
    from reflexiv_tpu.params import Params
    from reflexiv_tpu.stitch import _stitch_records_from_table

    rng = random.Random(3)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    reads = [genome[i:i + 60] for i in range(0, 330, 6)]
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    k = 21
    params = Params(k=k, min_kmer_coverage=1,
                    output_path=str(tmp_path))
    limbs, counts = count_mod.count_kmers(mat, lens, k=k, min_cov=1)
    triple = sort_k_records(limbs, counts, k, params)
    _write_sorted_set(
        str(tmp_path / "Stitch_kmer" / f"Count_{k}_sorted"), triple, k)

    p = dataclasses.replace(params, k=k)
    recs = _stitch_records_from_table(params, k, p)
    assert recs is not None
    want, _ = initial_records_from_counts(limbs, counts, p)

    def live_rows(r):
        seq = np.asarray(r.seq)
        live = np.asarray(r.live)
        return sorted(
            (bytes(seq[i, :k]), int(r.left[i]), int(r.right[i]))
            for i in np.nonzero(live)[0]
        )

    assert live_rows(recs) == live_rows(want)
    # no table -> None (self-count path)
    assert _stitch_records_from_table(
        Params(k=k, output_path=str(tmp_path / "nope")), k, p) is None


def test_mercy_table_blocked_matches_single_pass():
    """Row-blocked mercy mask passes must produce the same table as one
    whole-matrix pass (blocks only restrict the flank scan to their own
    rows, which is already per-read logic)."""
    import numpy as np

    from reflexiv_tpu import mercy as mercy_mod

    rng = random.Random(17)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    reads = _sim_reads(rng, genome, 70, 60, rc=True)
    # single-copy stretch: reads covering 200..300 only once
    reads.append(genome[200:300])
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    one = mercy_mod.mercy_kmer_table(mat, lens, k=21, min_cov=3)

    blocked = mercy_mod.mercy_kmer_table(
        mat, lens, k=21, min_cov=3, block_rows=7)

    def table(t):
        return sorted(map(tuple, np.c_[t[0], t[1]].tolist()))

    assert table(one) == table(blocked)
    assert len(one[1]) > 0


def test_bz2_fastq_input(tmp_path):
    """-infmt bzip parity: .bz2 FASTQ decodes through the Python reader."""
    import bz2

    import numpy as np

    from reflexiv_tpu.io import load_reads

    rng = random.Random(2)
    reads = ["".join(rng.choice("ACGT") for _ in range(60)) for _ in range(40)]
    path = tmp_path / "r.fq.bz2"
    with bz2.open(path, "wt") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    mat, lens = load_reads(str(path))
    assert len(lens) == 40 and (np.asarray(lens) == 60).all()


def test_quality_gate_flips_correction_outcome():
    """-trustqual (lighter's quality signal): a planted error at a
    HIGH-quality position must survive quality-aware correction while the
    same error at LOW quality (and under coverage-only correction) is
    fixed."""
    import numpy as np

    from reflexiv_tpu.preprocess import correct_reads

    rng = random.Random(47)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    reads = _sim_reads(rng, genome, 90, 150, rc=False)
    bad_rows = [0, 10]
    p = 40
    for i in bad_rows:
        bad = list(reads[i])
        bad[p] = next(c for c in "ACGT" if c != bad[p])
        reads[i] = "".join(bad)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    # phred 40 everywhere except the planted error in read 10 (phred 5)
    quals = np.full(mat.shape, 40, np.uint8)
    quals[bad_rows[1], p] = 5

    cov_only, n_cov = correct_reads(mat, lens, k=21, min_cov=3)
    qual_aware, n_q = correct_reads(
        mat, lens, k=21, min_cov=3, quals=quals, trust_qual=30)
    # coverage-only fixes both planted errors
    assert n_cov >= 2
    assert cov_only[bad_rows[0], p] != mat[bad_rows[0], p]
    assert cov_only[bad_rows[1], p] != mat[bad_rows[1], p]
    # quality-aware trusts the phred-40 base (left untouched) but still
    # fixes the phred-5 one — the disagreement flips the outcome
    assert qual_aware[bad_rows[0], p] == mat[bad_rows[0], p]
    assert qual_aware[bad_rows[1], p] != mat[bad_rows[1], p]
    assert n_q < n_cov
    # numpy oracle behaves identically under the gate
    os.environ["REFLEXIV_DEVICE_STAGES"] = "0"
    try:
        oracle_out, n_o = correct_reads(
            mat, lens, k=21, min_cov=3, quals=quals, trust_qual=30)
    finally:
        os.environ.pop("REFLEXIV_DEVICE_STAGES")
    assert np.array_equal(oracle_out, qual_aware)
    assert n_o == n_q


def test_error_correction_single_dispatch_cap_rotation(monkeypatch):
    """A dispatch cap smaller than the weak set must rotate through every
    weak position (the attempted mask) and still land the oracle's fixes —
    the single-dispatch device form cannot starve the tail behind
    unfixable positions."""
    import numpy as np

    from reflexiv_tpu.preprocess import correct_reads, correct_reads_device

    rng = random.Random(47)
    genome = "".join(rng.choice("ACGT") for _ in range(1500))
    reads = _sim_reads(rng, genome, 80, 400, rc=True)
    for i in range(0, len(reads), 3):   # dense, isolated errors
        bad = list(reads[i])
        p = rng.randrange(5, len(bad) - 5)
        bad[p] = next(c for c in "ACGT" if c != bad[p])
        reads[i] = "".join(bad)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    monkeypatch.setenv("REFLEXIV_DISPATCH_CAP", "64")
    got, n_got = correct_reads_device(mat, lens, k=21, min_cov=3)
    monkeypatch.delenv("REFLEXIV_DISPATCH_CAP")
    monkeypatch.setenv("REFLEXIV_DEVICE_STAGES", "0")
    want, n_want = correct_reads(mat, lens, k=21, min_cov=3)
    assert n_got >= 10
    assert n_got == n_want
    assert np.array_equal(got, want)
