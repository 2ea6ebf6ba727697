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
