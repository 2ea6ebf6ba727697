import numpy as np
import jax.numpy as jnp

from reflexiv_tpu import bitpack
from reflexiv_tpu.graph import build_initial_records
from reflexiv_tpu.records import to_host
from oracle import build_records as oracle_build, count_kmers as oracle_count


def _records_to_set(recs):
    seq, length, left, right, live = to_host(recs)
    out = set()
    for i in np.nonzero(live)[0]:
        out.add((bitpack.decode_to_str(seq[i, :length[i]]),
                 int(left[i]), int(right[i])))
    return out


def _counts_to_arrays(counted, k):
    kmers = sorted(counted)
    codes = np.stack([
        bitpack.encode_ascii(np.frombuffer(s.encode(), np.uint8))
        for s in kmers])
    limbs = np.asarray(bitpack.pack_bases(jnp.asarray(codes), k))
    counts = np.asarray([counted[s] for s in kmers], dtype=np.int32)
    return limbs, counts


def _check(reads, k, min_cov, min_error):
    counted = oracle_count(reads, k, min_cov=min_cov)
    limbs, counts = _counts_to_arrays(counted, k)
    recs, marker = build_initial_records(
        jnp.asarray(limbs), jnp.asarray(counts), k=k, min_error=min_error)
    got = _records_to_set(recs)
    want = {(r.seq, r.left, r.right)
            for r in oracle_build(reads, k, min_cov, min_error)}
    assert got == want


def test_linear_genome_no_forks():
    # single path: every record extendable on both ends (-1-cover)
    import random
    rng = random.Random(3)
    genome = "".join(rng.choice("ACGT") for _ in range(80))
    _check([genome, genome], k=21, min_cov=1, min_error=8)


def test_fork_blocking_and_error_correction():
    import random
    rng = random.Random(5)
    # two haplotypes sharing a prefix: creates a fork at the branch point
    core = "".join(rng.choice("ACGT") for _ in range(60))
    alt1 = core + "A" + "".join(rng.choice("ACGT") for _ in range(30))
    alt2 = core + "C" + "".join(rng.choice("ACGT") for _ in range(30))
    # equal strong coverage -> blocked fork
    _check([alt1] * 5 + [alt2] * 5, k=21, min_cov=1, min_error=8)
    # weak branch (cover 1 <= minError, strong >= 2x) -> error-corrected away
    _check([alt1] * 10 + [alt2] * 1, k=21, min_cov=1, min_error=8)
    # weak branch above minError -> blocked
    _check([alt1] * 25 + [alt2] * 9, k=21, min_cov=1, min_error=8)


def test_random_reads_with_rc():
    import random
    rng = random.Random(11)
    genome = "".join(rng.choice("ACGT") for _ in range(200))
    reads = []
    for _ in range(80):
        s = rng.randrange(len(genome) - 40)
        r = genome[s:s + 40]
        if rng.random() < 0.5:
            r = r[::-1].translate(str.maketrans("ACGT", "TGCA"))
        reads.append(r)
    _check(reads, k=21, min_cov=1, min_error=8)
    _check(reads, k=17, min_cov=2, min_error=8)


def test_build_initial_records_bubble_off():
    """-bubble (bubble=False) skips both fork-filter passes: every strand
    row stays live with free coverage attrs (ReflexivDSMain.java:231-253
    guard)."""
    import random

    import numpy as np
    import jax.numpy as jnp

    from reflexiv_tpu import count as count_mod
    from reflexiv_tpu.graph import build_initial_records
    from reflexiv_tpu.io import reads_to_matrix

    rng = random.Random(3)
    genome = "".join(rng.choice("ACGT") for _ in range(200))
    reads = [genome[i:i + 60] for i in range(0, 140, 7)]
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    limbs, counts = count_mod.count_kmers(mat, lens, k=21, min_cov=1)
    recs, marker = build_initial_records(
        jnp.asarray(limbs), jnp.asarray(counts), k=21, min_error=8,
        bubble=False)
    assert bool(recs.live.all())
    assert recs.live.shape[0] == 2 * limbs.shape[0]
    cov2 = np.concatenate([counts, counts])
    assert np.array_equal(np.asarray(recs.left), cov2)
    assert np.array_equal(np.asarray(recs.right), cov2)
    # filtered run marks fork losers dead / attrs negative
    recs_f, _ = build_initial_records(
        jnp.asarray(limbs), jnp.asarray(counts), k=21, min_error=8,
        bubble=True)
    assert (np.asarray(recs_f.left) < 0).any()
