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

    iters = 5
    result = {"platform": jax.devices()[0].platform, "records": N}
    p1 = None
    for variadic in (False, True):
        def run(p, s):
            return pk._extension_round_packed(
                p, jnp.uint32(s), k=k, variadic=variadic)

        out = run(p, 1)
        np.asarray(out[0].length[:8])  # compile + warm (one host fetch)
        if p1 is None:
            p1 = out[0]
        t0 = time.time()
        last = None
        for s in range(2, 2 + iters):
            last = run(p, s)
        np.asarray(last[0].length[:8])  # one fetch bounds the train
        dt = (time.time() - t0) / iters
        tag = "variadic" if variadic else "lexsort_gather"
        result[f"seconds_per_round_{tag}"] = dt
        result[f"records_per_sec_{tag}"] = N / dt
        print(json.dumps({"form": tag, "seconds_per_round": dt,
                          "records_per_sec": round(N / dt)}), flush=True)
    result["merged_first_round"] = int(N - jnp.sum(p1.live))
    result["records_per_sec"] = result["records_per_sec_variadic"]
    result["seconds_per_round"] = result["seconds_per_round_variadic"]
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

    for variadic in (False, True):
        def run_dyn(s):
            marker = pd.draw_markers_pdyn(dpool, jnp.uint32(s))
            return pd._pdyn_round_impl(
                dpool, marker, kmin=23, max_sub=40, variadic=variadic)

        np.asarray(run_dyn(1).length[:8])
        t0 = time.time()
        last = None
        for s in range(2, 2 + iters):
            last = run_dyn(s)
        np.asarray(last.length[:8])
        dtd = (time.time() - t0) / iters
        tag = "variadic" if variadic else "lexsort_gather"
        result[f"dyn_seconds_per_round_{tag}"] = dtd
        result[f"dyn_records_per_sec_{tag}"] = N / dtd
        print(json.dumps({"form": f"dyn_{tag}", "seconds_per_round": dtd,
                          "records_per_sec": round(N / dtd)}), flush=True)
    result["dyn_seconds_per_round"] = result["dyn_seconds_per_round_variadic"]
    result["dyn_records_per_sec"] = result["dyn_records_per_sec_variadic"]

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
