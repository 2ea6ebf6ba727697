"""Opportunistic TPU benchmark for the packed extension round.

Measures sorted-join throughput (records/s) at a production-ish shape:
1M packed records of a 1 Mbp synthetic genome's 31-mers mid-assembly.
Run under an external timeout; blocks until the tunnel yields a session.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print("session:", int(jnp.arange(8).sum()), f"{time.time()-t0:.0f}s",
          flush=True)

    from reflexiv_tpu import packed as pk
    from reflexiv_tpu.records import Records

    rng = np.random.default_rng(0)
    G = 1_000_000
    k = 31
    K_CLASSES = (23, 31, 41)  # the mixed-k classes sampled below
    # genome pad derived from the largest k actually used (single-k pass and
    # mixed-k classes) so a future class-list change can't under-allocate
    genome = rng.integers(0, 4, G + max(K_CLASSES + (k,)), dtype=np.uint8)
    N = 1 << 20
    L = 64
    seq = np.zeros((N, L), np.uint8)
    idx = rng.integers(0, G, N)
    for col in range(k):
        seq[:, col] = genome[idx + col]
    recs = Records(
        jnp.asarray(seq), jnp.full(N, k, jnp.int32),
        jnp.full(N, -3, jnp.int32), jnp.full(N, -3, jnp.int32),
        jnp.ones(N, bool),
    )
    p = pk.from_records(recs)

    def run(p, s):
        out, live, need = pk.extension_round_packed(p, jnp.uint32(s), k=k)
        np.asarray(out.length[:8])
        return out

    p1 = run(p, 1)  # compile
    t0 = time.time()
    iters = 5
    for s in range(2, 2 + iters):
        run(p, s)
    dt = (time.time() - t0) / iters
    result = {
        "platform": jax.devices()[0].platform,
        "records": N,
        "records_per_sec": N / dt,
        "seconds_per_round": dt,
        "merged_first_round": int(N - jnp.sum(p1.live)),
    }
    print(json.dumps(result), flush=True)

    # mixed-k (meta) round at the same scale: records of k classes 23/31/41
    from reflexiv_tpu import packed_dyn as pd
    from reflexiv_tpu.dynamic import DynRecords

    ks = rng.choice(list(K_CLASSES), N)
    seqd = np.zeros((N, L), np.uint8)
    for col in range(max(K_CLASSES)):
        seqd[:, col] = genome[idx + col]
    mask = np.arange(L)[None, :] < ks[:, None]
    seqd = np.where(mask, seqd, 0).astype(np.uint8)
    dpool = pd.from_dyn(DynRecords(
        jnp.asarray(seqd), jnp.asarray(ks.astype(np.int32)),
        jnp.asarray((ks - 1).astype(np.int32)),
        jnp.full(N, -3, jnp.int32), jnp.full(N, -3, jnp.int32),
        jnp.ones(N, bool),
    ))

    def run_dyn(s):
        out, live, need = pd.pdyn_extension_round_fused(
            dpool, jnp.uint32(s), kmin=23, max_sub=40)
        np.asarray(out.length[:8])
        return out

    run_dyn(1)
    t0 = time.time()
    for s in range(2, 2 + iters):
        run_dyn(s)
    dtd = (time.time() - t0) / iters
    result["dyn_seconds_per_round"] = dtd
    result["dyn_records_per_sec"] = N / dtd

    # exact interval census cost at this scale
    def run_census():
        out = pd.finished_mask_pdyn_exact(dpool, 40)
        np.asarray(out[:8])

    run_census()
    t0 = time.time()
    for _ in range(3):
        run_census()
    result["census_seconds"] = (time.time() - t0) / 3
    print(json.dumps(result), flush=True)
    json.dump(result, open("/tmp/tpu_extend_result.json", "w"))


if __name__ == "__main__":
    main()
