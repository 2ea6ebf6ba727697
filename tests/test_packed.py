import random

import numpy as np
import pytest
import jax.numpy as jnp

import oracle
from reflexiv_tpu import bitpack, packed
from reflexiv_tpu.extend import extension_round_fused
from reflexiv_tpu.records import Records, to_host


def _random_records(rng, n=40, k=11, cap_len=64):
    genome = "".join(rng.choice("ACGT") for _ in range(200))
    orecs = oracle.build_records([genome, genome], k, 1, 8)[:n]
    N = len(orecs)
    seq = np.zeros((N, cap_len), np.uint8)
    length = np.zeros(N, np.int32)
    left = np.zeros(N, np.int32)
    right = np.zeros(N, np.int32)
    for i, r in enumerate(orecs):
        codes = bitpack.encode_ascii(np.frombuffer(r.seq.encode(), np.uint8))
        seq[i, :len(codes)] = codes
        length[i] = len(codes)
        left[i], right[i] = r.left, r.right
    return Records(jnp.asarray(seq), jnp.asarray(length), jnp.asarray(left),
                   jnp.asarray(right), jnp.ones(N, bool)), k


def test_pack_roundtrip():
    rng = random.Random(1)
    recs, _ = _random_records(rng)
    p = packed.from_records(recs)
    back = packed.to_records(p)
    seq, length, *_ = to_host(recs)
    bseq, blength, *_ = to_host(back)
    for i in range(len(length)):
        np.testing.assert_array_equal(
            seq[i, :length[i]], bseq[i, :length[i]])


def test_extract_window():
    rng = random.Random(2)
    recs, _ = _random_records(rng)
    p = packed.from_records(recs)
    seq, length, *_ = to_host(recs)
    for width in (5, 10, 16, 17, 30, 32):
        start = jnp.asarray(
            [max(0, int(l) - width) for l in length], jnp.int32)
        win = packed.extract_window(p.seq, start, width)
        got = np.asarray(packed.unpack_seq_matrix(win, width))
        for i in range(len(length)):
            s = int(start[i])
            np.testing.assert_array_equal(
                got[i], seq[i, s:s + width],
                err_msg=f"width={width} row={i}")


@pytest.mark.slow
def test_concat_matches_strings():
    rng = random.Random(3)
    for _ in range(20):
        a = "".join(rng.choice("ACGT") for _ in range(rng.randrange(5, 70)))
        b = "".join(rng.choice("ACGT") for _ in range(rng.randrange(5, 70)))
        skip = rng.randrange(0, min(len(b), 10))
        want = a + b[skip:]
        ca = bitpack.encode_ascii(np.frombuffer(a.encode(), np.uint8))
        cb = bitpack.encode_ascii(np.frombuffer(b.encode(), np.uint8))
        pa = packed.pack_seq_matrix(jnp.asarray(ca[None, :]))
        pb = packed.pack_seq_matrix(jnp.asarray(cb[None, :]))
        LW = packed.limbs_for(len(want)) + 1
        pa = jnp.pad(pa, ((0, 0), (0, max(0, LW - pa.shape[1]))))
        pb = jnp.pad(pb, ((0, 0), (0, max(0, LW - pb.shape[1]))))
        out, total = packed.concat(
            pa, jnp.asarray([len(a)], jnp.int32),
            pb, jnp.asarray([len(b)], jnp.int32),
            jnp.asarray([skip], jnp.int32), LW)
        assert int(total[0]) == len(want)
        got = bitpack.decode_to_str(
            np.asarray(packed.unpack_seq_matrix(out, len(want)))[0])
        assert got == want, f"a={a} b={b} skip={skip}"


def test_packed_round_matches_byte_round():
    rng = random.Random(4)
    recs, k = _random_records(rng, cap_len=128)
    p = packed.from_records(recs)
    for rnd in range(1, 25):
        seed = jnp.uint32(rnd)
        recs, live_b, need_b = extension_round_fused(recs, seed, k=k)
        p, live_p, need_p = packed.extension_round_packed(p, seed, k=k)
        assert int(live_b) == int(live_p), f"round {rnd}"
        assert int(need_b) == int(need_p), f"round {rnd}"
        # content equality as multisets of (seq, left, right)
        seq, length, left, right, live = to_host(recs)
        bs = sorted(
            (bitpack.decode_to_str(seq[i, :length[i]]), int(left[i]),
             int(right[i]))
            for i in np.nonzero(live)[0])
        pr = packed.to_records(p)
        seq2, length2, left2, right2, live2 = to_host(pr)
        ps = sorted(
            (bitpack.decode_to_str(seq2[i, :length2[i]]), int(left2[i]),
             int(right2[i]))
            for i in np.nonzero(live2)[0])
        assert bs == ps, f"round {rnd}"


def test_finished_mask_scatter_free_matches():
    """The scatter-free census (variadic sorts + segmented fills, the TPU
    default) must equal the segment_sum form on mixed pools."""
    import numpy as np

    from reflexiv_tpu import packed as pk
    from reflexiv_tpu.records import Records

    rng = np.random.default_rng(9)
    N, L, k = 2048, 64, 21
    genome = rng.integers(0, 4, 1500, dtype=np.uint8)
    idx = rng.integers(0, 1400, N)
    seq = np.zeros((N, L), np.uint8)
    lens = rng.integers(k, 60, N).astype(np.int32)
    for c in range(L):
        m = c < lens
        seq[m, c] = genome[(idx + c)[m] % 1500]
    live = rng.random(N) < 0.85
    p = pk.from_records(Records(
        jnp.asarray(seq), jnp.asarray(lens),
        jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.int32),
        jnp.asarray(live)))
    a = pk._finished_mask_packed(p, k, scatter_free=False)
    b = pk._finished_mask_packed(p, k, scatter_free=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert int(jnp.sum(a)) > 0
