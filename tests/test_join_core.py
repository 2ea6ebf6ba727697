import numpy as np
import jax.numpy as jnp

import oracle
from reflexiv_tpu.join_core import first_per_segment, merge_gate, sort_segments
from reflexiv_tpu.parallel import _bucketize


def test_merge_gate_matches_oracle_try_merge():
    # exhaustively compare the fixed-k gate against oracle.try_merge over
    # attr sign/magnitude combinations and extension lengths
    k = 5
    key = "ACGT"
    attrs = [-3, -1, 0, 1, 2, 4, 7]
    exts = [1, 2, 5]
    cases = []
    for fl in attrs:
        for rr in attrs:
            for fe in exts:
                for re_ in exts:
                    cases.append((fl, rr, fe, re_))
    f_left = jnp.asarray([c[0] for c in cases])
    r_right = jnp.asarray([c[1] for c in cases])
    f_ext = jnp.asarray([c[2] for c in cases])
    r_ext = jnp.asarray([c[3] for c in cases])
    f_right = jnp.full(len(cases), -2)
    r_left = jnp.full(len(cases), -2)
    gate = merge_gate(f_left, f_right, r_left, r_right, f_ext, r_ext)
    for i, (fl, rr, fe, re_) in enumerate(cases):
        fwd = oracle.Rec(key + "A" * fe, fl, -2)
        refl = oracle.Rec("G" * re_ + key, -2, rr)
        merged = oracle.try_merge(fwd, refl, k)
        assert bool(gate.merge[i]) == (merged is not None), (fl, rr, fe, re_)
        if merged is not None:
            assert int(gate.new_left[i]) == merged.left, (fl, rr, fe, re_)
            assert int(gate.new_right[i]) == merged.right, (fl, rr, fe, re_)


def test_sort_segments_and_first_per_segment():
    keys = jnp.asarray(
        [[2, 1], [1, 9], [2, 1], [1, 9], [3, 0]], dtype=jnp.uint32)
    order, seg, is_start = sort_segments(keys)
    skey = np.asarray(keys)[np.asarray(order)]
    assert (np.diff(skey[:, 0]) >= 0).all()
    seg_np = np.asarray(seg)
    # rows with identical keys share a segment id
    assert seg_np[0] == seg_np[1] and seg_np[2] == seg_np[3]
    cond = jnp.asarray([True, False, True, True, False])
    first = first_per_segment(seg, cond[order], 5)
    first_np = np.asarray(first)
    # each row's value points at the first cond row of its segment
    for i in range(5):
        s = seg_np[i]
        members = [j for j in range(5) if seg_np[j] == s]
        want = min(
            (j for j in members if bool(cond[order][j])), default=5)
        assert first_np[i] == want


def test_bucketize_plans_within_capacity():
    owner = jnp.asarray([0, 1, 0, 2, 1, 0, 2, 2], dtype=jnp.int32)
    valid = jnp.asarray([1, 1, 1, 1, 1, 0, 1, 1], dtype=bool)
    order, slot, ok, overflow = _bucketize(owner, valid, n=3, cap=2)
    order, slot, ok = (np.asarray(x) for x in (order, slot, ok))
    assert int(overflow) == 1  # three valid rows for owner 2, cap 2
    # every accepted row has a unique (owner, slot) pair
    seen = set()
    so = np.asarray(owner)[order]
    for i in np.nonzero(ok)[0]:
        pair = (int(so[i]), int(slot[i]))
        assert pair not in seen and slot[i] < 2
        seen.add(pair)
    # the invalid row is never accepted
    inv_pos = list(order).index(5)
    assert not ok[inv_pos]
