import random

import oracle
from reflexiv_tpu.mapping import end_extend


def test_end_extend_recovers_contig_ends():
    rng = random.Random(41)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    # contig missing 40bp at each end
    contig = genome[40:460]
    reads = []
    for _ in range(200):
        s = rng.randrange(len(genome) - 60)
        r = genome[s:s + 60]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    (extended,) = end_extend([contig], reads)
    assert len(extended) > len(contig) + 60
    assert extended in genome


def test_end_extend_stops_without_support():
    rng = random.Random(42)
    genome = "".join(rng.choice("ACGT") for _ in range(200))
    contig = genome[:150]
    # no reads at all beyond the contig: nothing to vote
    reads = [genome[:60], genome[20:80]]
    (extended,) = end_extend([contig], reads)
    assert extended == contig


def test_end_extend_respects_disagreement():
    rng = random.Random(43)
    core = "".join(rng.choice("ACGT") for _ in range(120))
    contig = core
    # two read populations disagree immediately after the contig end
    tail_a = "A" + "".join(rng.choice("ACGT") for _ in range(20))
    tail_b = "C" + tail_a[1:]
    reads = [core[-50:] + tail_a, core[-50:] + tail_b]
    (extended,) = end_extend([contig], reads)
    # 50/50 split is below the 0.7 majority bar on the first column
    assert extended == contig


def test_batched_equals_scalar_end_extension():
    """The chunked/vectorized driver must reproduce the per-contig loop
    exactly (contigs do not interact: the read index is static)."""
    import numpy as np

    from reflexiv_tpu.io import reads_to_matrix
    from reflexiv_tpu.mapping import (end_extend_arrays,
                                      end_extend_arrays_scalar)

    rng = random.Random(77)
    genome = "".join(rng.choice("ACGT") for _ in range(3000))
    contigs = []
    for _ in range(23):
        s = rng.randrange(len(genome) - 300)
        w = rng.randrange(120, 300)
        c = genome[s:s + w]
        if rng.random() < 0.5:
            c = oracle.revcomp(c)
        contigs.append(c)
    reads = []
    for _ in range(1500):
        s = rng.randrange(len(genome) - 80)
        r = genome[s:s + 80]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    bases, lens = reads_to_matrix([r.encode() for r in reads])
    got = end_extend_arrays(contigs, bases, lens)
    want = end_extend_arrays_scalar(contigs, bases, lens)
    assert got == want
    assert any(len(g) > len(c) for g, c in zip(got, contigs))


def test_device_equals_numpy_end_extension(monkeypatch):
    """The accelerator path (device index + searchsorted_2limb + one-hot
    matmul votes) must reproduce the numpy batched path exactly."""
    import numpy as np

    from reflexiv_tpu.io import reads_to_matrix
    from reflexiv_tpu.mapping import end_extend_arrays

    rng = random.Random(99)
    genome = "".join(rng.choice("ACGT") for _ in range(5000))
    contigs = []
    for _ in range(150):
        s = rng.randrange(len(genome) - 400)
        c = genome[s:s + rng.randrange(100, 400)]
        if rng.random() < 0.5:
            c = oracle.revcomp(c)
        contigs.append(c)
    reads = []
    for _ in range(3000):
        s = rng.randrange(len(genome) - 90)
        r = genome[s:s + 90]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    bases, lens = reads_to_matrix([r.encode() for r in reads])
    got = end_extend_arrays(contigs, bases, lens)   # device (default)
    monkeypatch.setenv("REFLEXIV_DEVICE_STAGES", "0")
    want = end_extend_arrays(contigs, bases, lens)  # numpy batched
    assert got == want
    assert any(len(g) > len(c) for g, c in zip(got, contigs))
