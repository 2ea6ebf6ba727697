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
    genome = rng.integers(0, 4, G + k, dtype=np.uint8)
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
    json.dump(result, open("/tmp/tpu_extend_result.json", "w"))


if __name__ == "__main__":
    main()
