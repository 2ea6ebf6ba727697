"""Adversarial genome structures: repeats, bubbles, high error rates.

Safety property on repeat-free genomes: every emitted contig is a substring
of the truth (up to strand). Across a collapsed exact repeat the Reflexiv
method (like the reference: winner-only fork filtering + the both-blocked
merge rule, ReflexivDSMain.java:3074-3077) may join the repeat's flanks in
either pairing — such contigs are *locally* k-consistent (every k-mer is
genomic) even when the global join picks the wrong copy; verified here
against the scalar oracle, which produces the same joins.
"""
import random

import pytest

import oracle
from reflexiv_tpu.assembler import assemble_reads
from reflexiv_tpu.contigs import canonical_set
from reflexiv_tpu.io import reads_to_matrix
from reflexiv_tpu.params import Params


def _reads(rng, genome, n, rl=60, err=0.0):
    out = []
    for _ in range(n):
        s = rng.randrange(len(genome) - rl)
        r = list(genome[s:s + rl])
        for i in range(rl):
            if rng.random() < err:
                r[i] = rng.choice("ACGT")
        r = "".join(r)
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        out.append(r)
    return out


def _assert_no_misassembly(contigs, genome):
    for s in contigs:
        assert s in genome or oracle.revcomp(s) in genome, (
            f"chimeric contig of length {len(s)}")


def _assert_locally_consistent(contigs, genome, k):
    true_kmers = {
        oracle.canonical(genome[i:i + k])
        for i in range(len(genome) - k + 1)
    }
    for s in contigs:
        for i in range(len(s) - k + 1):
            assert oracle.canonical(s[i:i + k]) in true_kmers, (
                f"invented k-mer at {i} in contig of length {len(s)}")


@pytest.mark.slow
def test_exact_repeat_stays_locally_consistent():
    rng = random.Random(13)
    unique1 = "".join(rng.choice("ACGT") for _ in range(400))
    repeat = "".join(rng.choice("ACGT") for _ in range(200))
    unique2 = "".join(rng.choice("ACGT") for _ in range(400))
    unique3 = "".join(rng.choice("ACGT") for _ in range(400))
    # genome: U1 R U2 R U3  — R longer than k, appears twice
    genome = unique1 + repeat + unique2 + repeat + unique3
    reads = _reads(rng, genome, 1600)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    contigs = assemble_reads(
        mat, lens, Params(k=21, min_kmer_coverage=2, min_contig=100), seed=7)
    canon = canonical_set(contigs)
    _assert_locally_consistent(canon, genome, 21)
    total = sum(len(s) for s in canon)
    assert total >= 1200  # most of the 1800bp genome recovered


@pytest.mark.slow
def test_snp_bubble_resolves_to_dominant_allele():
    rng = random.Random(17)
    left = "".join(rng.choice("ACGT") for _ in range(300))
    right = "".join(rng.choice("ACGT") for _ in range(300))
    major = left + "A" + right
    minor = left + "C" + right
    # 90/10 allele mix: the minor branch is error-killable at minError=8
    reads = _reads(rng, major, 540) + _reads(rng, minor, 60)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    contigs = assemble_reads(
        mat, lens, Params(k=21, min_kmer_coverage=2, min_contig=300), seed=5)
    canon = canonical_set(contigs)
    assert len(canon) == 1
    (c,) = canon
    assert c in major or oracle.revcomp(c) in major
    assert len(c) >= 550


@pytest.mark.slow
def test_one_percent_error_rate():
    rng = random.Random(29)
    genome = "".join(rng.choice("ACGT") for _ in range(800))
    reads = _reads(rng, genome, 1200, rl=80, err=0.01)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    contigs = assemble_reads(
        mat, lens, Params(k=21, min_kmer_coverage=3, min_contig=200), seed=3)
    canon = canonical_set(contigs)
    _assert_no_misassembly(canon, genome)
    assert max(len(s) for s in canon) >= 600
