import random

import numpy as np
import pytest

import oracle
from reflexiv_tpu.assembler import assemble_reads
from reflexiv_tpu.contigs import canonical_contig
from reflexiv_tpu.io import reads_to_matrix
from reflexiv_tpu.params import Params


def _simulate(rng, genome, read_len, coverage, err_rate=0.0):
    n_reads = coverage * len(genome) // read_len
    reads = []
    for _ in range(n_reads):
        s = rng.randrange(len(genome) - read_len + 1)
        r = list(genome[s:s + read_len])
        for i in range(len(r)):
            if rng.random() < err_rate:
                r[i] = rng.choice("ACGT")
        r = "".join(r)
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    return reads


@pytest.mark.slow
def test_synthetic_genome_assembles_to_single_contig():
    rng = random.Random(42)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    reads = _simulate(rng, genome, read_len=60, coverage=30)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, min_kmer_coverage=2, min_contig=300)
    contigs = assemble_reads(mat, lens, params, seed=1)
    canon = {canonical_contig(seq) for _, seq in contigs}
    assert len(canon) == 1
    (contig,) = canon
    # full-coverage simulation may lose a few bases off the ends only
    assert len(contig) >= len(genome) - 2 * (params.k - 1)
    assert contig in genome or oracle.revcomp(contig) in genome


@pytest.mark.slow
def test_synthetic_genome_with_errors():
    rng = random.Random(7)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    reads = _simulate(rng, genome, read_len=80, coverage=20, err_rate=0.005)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, min_kmer_coverage=3, min_contig=250)
    contigs = assemble_reads(mat, lens, params, seed=3)
    canon = {canonical_contig(seq) for _, seq in contigs}
    # error correction must keep the assembly in few clean pieces
    assert 1 <= len(canon) <= 3
    longest = max(canon, key=len)
    assert len(longest) >= 350
    assert longest in genome or oracle.revcomp(longest) in genome


@pytest.mark.slow
def test_two_chromosomes():
    rng = random.Random(9)
    g1 = "".join(rng.choice("ACGT") for _ in range(400))
    g2 = "".join(rng.choice("ACGT") for _ in range(400))
    reads = _simulate(rng, g1, 60, 30) + _simulate(rng, g2, 60, 30)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=21, min_kmer_coverage=2, min_contig=200)
    contigs = assemble_reads(mat, lens, params, seed=5)
    canon = {canonical_contig(seq) for _, seq in contigs}
    assert len(canon) == 2
    for c in canon:
        assert (c in g1 or oracle.revcomp(c) in g1
                or c in g2 or oracle.revcomp(c) in g2)


@pytest.mark.slow
def test_meta_50kb_paired_with_errors():
    """Scale-up parity (VERDICT round-1 item 4): a 50 kb synthetic genome,
    paired 150 bp reads at ~25x with 1% errors, full default klist (filtered
    by read length). meta must reconstruct essentially the whole genome and
    do at least as well as single-k run; every contig must align to the
    truth exactly (error k-mers die in the coverage/fork filters)."""
    from reflexiv_tpu import dynamic
    from reflexiv_tpu.params import DEFAULT_KLIST

    rng = random.Random(4242)
    genome = "".join(rng.choice("ACGT") for _ in range(50_000))
    reads = []
    n_pairs = 50_000 * 25 // (2 * 150)
    for _ in range(n_pairs):
        s = rng.randrange(len(genome) - 300 + 1)
        insert = genome[s:s + 300]
        r1 = list(insert[:150])
        r2 = list(oracle.revcomp(insert[150:]))
        for r in (r1, r2):
            for i in range(len(r)):
                if rng.random() < 0.01:
                    r[i] = rng.choice("ACGT")
        reads.append("".join(r1))
        reads.append("".join(r2))
    mat, lens = reads_to_matrix([r.encode() for r in reads])

    params = Params(
        klist=DEFAULT_KLIST, min_kmer_coverage=3, min_contig=500)
    meta = dynamic.assemble_dynamic(mat, lens, params, seed=11)
    meta_canon = sorted(
        {canonical_contig(s) for _, s in meta}, key=len, reverse=True)

    single = assemble_reads(
        mat, lens, Params(k=31, min_kmer_coverage=3, min_contig=500),
        seed=11)
    single_best = max((len(s) for _, s in single), default=0)

    best = meta_canon[0]
    assert len(best) >= single_best
    assert len(best) >= 45_000  # essentially the whole genome
    # exact alignment to truth: assembled sequence carries no read errors
    for c in meta_canon:
        assert c in genome or oracle.revcomp(c) in genome


def test_extend_pass_rejoins_after_end_extension():
    """08Extend analog: two contigs separated by a read-covered gap grow
    into overlap via consensus end extension, and the post-extension fixing
    pass joins them into one sequence."""
    import numpy as np

    from reflexiv_tpu.bitpack import decode_to_str, encode_ascii
    from reflexiv_tpu.dynamic import (_dyn_pool_from_rows,
                                      fixing_rounds_faithful)
    from reflexiv_tpu.io import reads_to_matrix
    from reflexiv_tpu.mapping import end_extend_arrays
    from reflexiv_tpu.params import Params

    rng = random.Random(10)
    genome = "".join(rng.choice("ACGT") for _ in range(1500))
    a, b = genome[:700], genome[740:]      # 40 bp gap, no raw overlap
    reads = []
    for _ in range(900):
        s = rng.randrange(len(genome) - 80)
        reads.append(genome[s:s + 80])
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    # bounded extension: each end grows ~40 bp across the 40 bp gap, so
    # the extended contigs overlap ~40 bp and their end regions share a
    # >=31 bp genomic span (the join window)
    exts = end_extend_arrays([a, b], mat, lens, max_rounds=1, max_tail=40)
    assert all(len(e) > len(c) for e, c in zip(exts, (a, b)))
    rows = [
        (encode_ascii(np.frombuffer(s.encode(), np.uint8)), 30, -1, -1)
        for s in exts
    ]
    pool = fixing_rounds_faithful(
        _dyn_pool_from_rows(rows), Params(min_iterations=2), kmax=61,
        seed=77)
    seq, length, _sk, _l, _r, live = (np.asarray(x) for x in pool)
    out = [decode_to_str(seq[i, :length[i]]) for i in np.nonzero(live)[0]]
    best = max(out, key=len)
    assert len(best) >= 1450
    assert best in genome or oracle.revcomp(best) in genome


@pytest.mark.slow
def test_meta_metagenome_mixed_abundance():
    """The production use case (HMP metagenomes): three species at very
    different abundances must each assemble out of one mixed read pool —
    the multi-k ladder's whole point."""
    from reflexiv_tpu.dynamic import assemble_dynamic

    rng = random.Random(22)
    # 15x is the practical coverage floor for min_cov=2 (Poisson dropout
    # P(cov<2) at lambda ~ 0.78*15 is ~1e-3/kmer; below that the graph
    # fragments in any assembler with a hard threshold)
    species = {
        "a": ("".join(rng.choice("ACGT") for _ in range(20_000)), 40),
        "b": ("".join(rng.choice("ACGT") for _ in range(12_000)), 25),
        "c": ("".join(rng.choice("ACGT") for _ in range(8_000)), 15),
    }
    reads = []
    rl = 100
    for genome, cov in species.values():
        n = cov * len(genome) // rl
        for _ in range(n):
            s = rng.randrange(len(genome) - rl)
            r = genome[s:s + rl]
            if rng.random() < 0.5:
                r = oracle.revcomp(r)
            reads.append(r)
    rng.shuffle(reads)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    out = assemble_dynamic(
        mat, lens, Params(klist=(23, 31, 41), min_kmer_coverage=2,
                          min_contig=500), seed=0)
    seqs = [s for _, s in out]
    for name, (genome, _cov) in species.items():
        best = max(
            (len(s) for s in seqs
             if s in genome or oracle.revcomp(s) in genome),
            default=0)
        assert best >= 0.9 * len(genome), (name, best)


@pytest.mark.slow
def test_meta_accurate_rescues_low_coverage_gap():
    """-accurate (mercy k-mers): a 30 bp stretch covered by a single read
    breaks assembly at min_cov=2 unless its coverage-1 k-mers are rescued
    by their solid flanks (Pipelines.java:1388-1391 sensitive mode)."""
    from reflexiv_tpu.dynamic import assemble_dynamic

    rng = random.Random(31)
    genome = "".join(rng.choice("ACGT") for _ in range(6_000))
    gap_lo, gap_hi = 3000, 3030
    reads = []
    for s in range(0, len(genome) - 100, 20):  # ~5x tiling
        if s + 100 > gap_lo and s < gap_hi:
            continue  # no regular coverage over the gap
        reads.append(genome[s:s + 100])
    # solid coverage right up to both gap edges (the skip above starves a
    # full read-length margin otherwise)
    for off in (0, 3, 6, 9):
        reads.append(genome[gap_lo - 100 - off: gap_lo - off])
        reads.append(genome[gap_hi + off: gap_hi + off + 100])
    # one read spans the gap with >= k solid bases on BOTH sides inside
    # the read (mercy's flank rule is within-read)
    reads.append(genome[2965:3065])
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    base = assemble_dynamic(
        mat, lens, Params(klist=(21, 31), min_kmer_coverage=2,
                          min_contig=400), seed=0)
    rescued = assemble_dynamic(
        mat, lens, Params(klist=(21, 31), min_kmer_coverage=2,
                          min_contig=400, sensitive=True), seed=0)
    best_base = max((len(s) for _, s in base), default=0)
    best_resc = max((len(s) for _, s in rescued), default=0)
    assert best_resc >= 5_500
    assert best_resc > best_base
