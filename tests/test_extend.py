import numpy as np
import jax.numpy as jnp

import oracle
from reflexiv_tpu import bitpack
from reflexiv_tpu.extend import extension_round_with_markers
from reflexiv_tpu.records import Records, to_host


def _recs_from_oracle(orecs, cap_rows=None, cap_len=None):
    n = len(orecs)
    cap_rows = cap_rows or n
    cap_len = cap_len or max(len(r.seq) for r in orecs) * 2
    seq = np.zeros((cap_rows, cap_len), dtype=np.uint8)
    length = np.zeros(cap_rows, dtype=np.int32)
    left = np.zeros(cap_rows, dtype=np.int32)
    right = np.zeros(cap_rows, dtype=np.int32)
    live = np.zeros(cap_rows, dtype=bool)
    for i, r in enumerate(orecs):
        codes = bitpack.encode_ascii(np.frombuffer(r.seq.encode(), np.uint8))
        seq[i, :len(codes)] = codes
        length[i] = len(codes)
        left[i], right[i] = r.left, r.right
        live[i] = True
    return Records(jnp.asarray(seq), jnp.asarray(length), jnp.asarray(left),
                   jnp.asarray(right), jnp.asarray(live))


def _to_set(recs):
    seq, length, left, right, live = to_host(recs)
    return {
        (bitpack.decode_to_str(seq[i, :length[i]]), int(left[i]), int(right[i]))
        for i in np.nonzero(live)[0]
    }


def _run_both(orecs, markers, k):
    recs = _recs_from_oracle(orecs)
    got = _to_set(extension_round_with_markers(
        recs, jnp.asarray(markers, dtype=jnp.int32), k=k))
    want_recs = oracle.extension_round(orecs, markers, k)
    want = {(r.seq, r.left, r.right) for r in want_recs}
    assert got == want, f"\ngot:  {sorted(got)}\nwant: {sorted(want)}"


def test_simple_merge():
    k = 5
    # refl tail 'BCDE' == fwd head: seq overlap of k-1=4
    fwd = oracle.Rec("ACGTA" + "GG", -3, -3)      # head key ACGT
    refl = oracle.Rec("TTACGT"[:2] + "ACGT", -3, -3)  # tail key ACGT
    refl.seq = "TTACGT"  # tail ACGT
    _run_both([fwd, refl], [1, 2], k)


def test_no_merge_same_marker():
    k = 5
    a = oracle.Rec("ACGTAGG", -3, -3)
    b = oracle.Rec("ACGTACC", -3, -3)
    _run_both([a, b], [1, 1], k)  # two forwards: nothing merges


def test_merge_gating_matrix():
    k = 5
    sub = k - 1
    key = "ACGT"
    # enumerate attr sign combinations incl. bubble-distance cases
    cases = [
        (-3, -3, True),    # both free
        (4, 4, True),      # both blocked -> still merge (bubble -1)
        (4, -3, None),     # fwd.left=4 blocked, refl ext len decides
        (-3, 4, None),     # refl.right=4 blocked, fwd ext len decides
        (1, -3, None),
        (-3, 1, None),
    ]
    for f_left, r_right, _always in cases:
        for f_extra in (1, 3, 6):
            for r_extra in (1, 3, 6):
                fwd = oracle.Rec(key + "A" * f_extra, f_left, -2)
                refl = oracle.Rec("G" * r_extra + key, -2, r_right)
                _run_both([fwd, refl], [1, 2], k)


def test_group_of_three():
    k = 5
    key = "ACGT"
    fwd = oracle.Rec(key + "AAA", -3, -3)
    refl1 = oracle.Rec("GG" + key, -3, -3)
    refl2 = oracle.Rec("TTT" + key, -3, -3)
    # two reflected with same tail key: only the first (by sort order) merges.
    # JAX impl picks first-in-sorted-order; oracle picks first-in-list. Use
    # records whose sorted order matches list order to compare determinately.
    _run_both([fwd, refl1], [1, 2], k)
    _run_both([fwd, refl2], [1, 2], k)


def test_multi_round_chain_assembly():
    # a clean linear chain must collapse to one contig per strand given
    # alternating favorable draws
    import random
    rng = random.Random(21)
    k = 11
    genome = "".join(rng.choice("ACGT") for _ in range(120))
    orecs = oracle.build_records([genome, genome], k, 1, 8)
    jrecs = _recs_from_oracle(orecs, cap_rows=len(orecs),
                              cap_len=256)
    for rnd in range(60):
        markers = [rng.choice((1, 2)) for _ in range(jrecs.capacity)]
        want_markers = []
        seq, length, left, right, live = to_host(jrecs)
        # oracle works on live rows in row order; feed same draws
        j_live_rows = [i for i in np.nonzero(live)[0]]
        orecs_now = []
        for i in j_live_rows:
            orecs_now.append(oracle.Rec(
                bitpack.decode_to_str(seq[i, :length[i]]),
                int(left[i]), int(right[i])))
            want_markers.append(markers[i])
        want_next = oracle.extension_round(orecs_now, want_markers, k)
        jrecs = extension_round_with_markers(
            jrecs, jnp.asarray(markers, dtype=jnp.int32), k=k)
        got = {(r[0], r[1], r[2]) for r in _to_set(jrecs)}
        want = {(r.seq, r.left, r.right) for r in want_next}
        assert got == want, f"round {rnd}"
    # final: 2 strands fully assembled
    final = sorted(s for s, _l, _r in _to_set(jrecs))
    assert len(final) == 2
    assert genome in final or oracle.revcomp(genome) in final
