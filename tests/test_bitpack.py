import numpy as np
import jax.numpy as jnp

from reflexiv_tpu import bitpack
from oracle import canonical, revcomp


def _codes(s: str) -> np.ndarray:
    return bitpack.encode_ascii(np.frombuffer(s.encode(), dtype=np.uint8))


def test_encode_decode_roundtrip():
    s = "ACGTTGCAACGT"
    assert bitpack.decode_to_str(_codes(s)) == s


def test_n_maps_to_t():
    # reference nucleotideValue maps any non-ACG to T (ReflexivDSMain.java:4010)
    assert bitpack.decode_to_str(_codes("ANGC")) == "ATGC"


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for k in (5, 16, 17, 31, 32, 45, 63):
        bases = rng.integers(0, 4, size=(20, k), dtype=np.uint8)
        limbs = bitpack.pack_bases(jnp.asarray(bases), k)
        assert limbs.shape == (20, bitpack.num_limbs(k))
        back = np.asarray(bitpack.unpack_bases(limbs, k))
        np.testing.assert_array_equal(back, bases)


def test_pack_matches_integer_value():
    # limb layout must equal the big-endian 2k-bit integer of the reference
    s = "ACGTACGTACGTACGTACGTACGTACGTACG"  # k=31
    k = len(s)
    val = 0
    for c in s:
        val = (val << 2) | "ACGT".index(c)
    limbs = np.asarray(bitpack.pack_bases(jnp.asarray(_codes(s)), k))
    got = 0
    for limb in limbs:
        got = (got << 32) | int(limb)
    assert got == val


def test_revcomp_and_canonical():
    rng = np.random.default_rng(1)
    k = 31
    bases = rng.integers(0, 4, size=(50, k), dtype=np.uint8)
    fwd = bitpack.pack_bases(jnp.asarray(bases), k)
    rc = bitpack.revcomp_packed(fwd, k)
    canon = np.asarray(bitpack.canonical_packed(fwd, rc))
    for i in range(50):
        s = bitpack.decode_to_str(bases[i])
        assert bitpack.decode_to_str(
            np.asarray(bitpack.unpack_bases(rc[i], k))) == revcomp(s)
        assert bitpack.decode_to_str(
            np.asarray(bitpack.unpack_bases(canon[i], k))) == canonical(s)


def test_limbs_compare():
    a = jnp.asarray([[1, 5], [2, 3], [2, 3]], dtype=jnp.uint32)
    b = jnp.asarray([[1, 6], [2, 2], [2, 3]], dtype=jnp.uint32)
    np.testing.assert_array_equal(
        np.asarray(bitpack.limbs_less(a, b)), [True, False, False])
    np.testing.assert_array_equal(
        np.asarray(bitpack.limbs_equal(a, b)), [False, False, True])
