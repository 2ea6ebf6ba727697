"""k > 31 support.

The reference duplicates its entire pipeline into ``*64`` classes for k>31
(``ReflexivDSMain64.java``, ``ReflexivDataFrameCounter64.java`` — long[]
block keys). Our multi-limb uint32 packing handles any k uniformly; these
tests cover the k range the reference's dynamic pipeline uses
(klist up to 95, ``DefaultParam.java:87``).
"""
import random

import pytest

import oracle
from reflexiv_tpu.assembler import assemble_reads
from reflexiv_tpu.contigs import canonical_contig
from reflexiv_tpu.io import reads_to_matrix
from reflexiv_tpu.params import Params
from reflexiv_tpu import count as count_mod
from reflexiv_tpu import bitpack
import numpy as np
import jax.numpy as jnp


@pytest.mark.parametrize("k", [33, 47, 63, 95])
def test_count_matches_oracle_large_k(k):
    rng = random.Random(k)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    reads = []
    for _ in range(80):
        s = rng.randrange(len(genome) - 120)
        r = genome[s:s + 120]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    limbs, counts = count_mod.count_kmers(mat, lens, k=k, min_cov=2)
    got = {}
    for row, c in zip(limbs, counts):
        got[bitpack.decode_to_str(
            np.asarray(bitpack.unpack_bases(jnp.asarray(row), k)))] = int(c)
    assert got == oracle.count_kmers(reads, k, min_cov=2)


@pytest.mark.slow
def test_assembly_k55():
    rng = random.Random(99)
    genome = "".join(rng.choice("ACGT") for _ in range(800))
    reads = []
    for _ in range(400):
        s = rng.randrange(len(genome) - 120)
        r = genome[s:s + 120]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    params = Params(k=55, min_kmer_coverage=2, min_contig=400)
    contigs = assemble_reads(mat, lens, params, seed=2)
    canon = {canonical_contig(seq) for _, seq in contigs}
    assert len(canon) == 1
    (contig,) = canon
    assert len(contig) >= 650
    assert contig in genome or oracle.revcomp(contig) in genome
