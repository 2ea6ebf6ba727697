import random

import numpy as np

from reflexiv_tpu import bitpack, count
from reflexiv_tpu.io import reads_to_matrix
from oracle import count_kmers as oracle_count
import jax.numpy as jnp
import oracle


def test_streaming_matches_single_shot():
    rng = random.Random(19)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    reads = []
    for _ in range(240):
        s = rng.randrange(len(genome) - 50)
        r = genome[s:s + 50]
        if rng.random() < 0.5:
            r = oracle.revcomp(r)
        reads.append(r)
    k, min_cov = 21, 2

    def chunks():
        for i in range(0, len(reads), 37):  # ragged chunk sizes
            yield reads_to_matrix([r.encode() for r in reads[i:i + 37]])

    s_limbs, s_counts = count.count_kmers_streaming(
        chunks(), k=k, min_cov=min_cov)
    got = {}
    for row, c in zip(s_limbs, s_counts):
        got[bitpack.decode_to_str(np.asarray(
            bitpack.unpack_bases(jnp.asarray(row), k)))] = int(c)
    want = oracle_count(reads, k, min_cov=min_cov)
    assert got == want
