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


def test_count_kmers_auto_matches_single_pass(monkeypatch):
    import numpy as np
    from reflexiv_tpu import dynamic as dyn
    from reflexiv_tpu.count import count_kmers

    rng = np.random.default_rng(3)
    R, L, k = 300, 80, 21
    mat = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lens = rng.integers(k + 3, L + 1, size=R).astype(np.int32)
    col = np.arange(L)[None, :]
    mat[col >= lens[:, None]] = 0
    want_l, want_c = count_kmers(mat, lens, k=k, min_cov=2)
    monkeypatch.setattr(dyn, "STREAM_WINDOW_LIMIT", 1024)  # force streaming
    got_l, got_c = dyn.count_kmers_auto(mat, lens, k=k, min_cov=2,
                                        max_cov=10_000_000)
    want = {tuple(r): c for r, c in zip(want_l.tolist(), want_c.tolist())}
    got = {tuple(r): c for r, c in zip(got_l.tolist(), got_c.tolist())}
    assert want == got
