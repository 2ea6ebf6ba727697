import random

import numpy as np
import jax.numpy as jnp
import pytest

from reflexiv_tpu import bitpack
from reflexiv_tpu.io import reads_to_matrix
from reflexiv_tpu.pallas_kernels import extract_canonical_kmers_pallas, supports
from oracle import canonical


@pytest.mark.parametrize("k", [17, 21, 31])
def test_pallas_extraction_matches_oracle(k):
    rng = random.Random(k)
    reads = []
    for _ in range(40):
        n = rng.choice([k - 2, k + 3, 40, 50])  # include too-short reads
        reads.append("".join(rng.choice("ACGT") for _ in range(n)))
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    limbs, valid = extract_canonical_kmers_pallas(
        jnp.asarray(mat), jnp.asarray(lens), k=k, interpret=True)
    got = []
    limbs_np, valid_np = np.asarray(limbs), np.asarray(valid)
    for i in np.nonzero(valid_np)[0]:
        got.append(bitpack.decode_to_str(np.asarray(
            bitpack.unpack_bases(jnp.asarray(limbs_np[i]), k))))
    want = []
    for r in reads:
        if len(r) - k <= 1:
            continue
        for i in range(len(r) - k + 1):
            want.append(canonical(r[i:i + k]))
    assert sorted(got) == sorted(want)


def test_supports_range():
    assert supports(17) and supports(31)
    assert not supports(16) and not supports(32)
