"""Measure TPU element-gather / scatter-add throughput at radix-sort scale.

The round-3 radix-sort candidate (ROADMAP) applies the permutation of each
8-bit pass as a pure gather (out[j] = in[src[j]]) and needs per-block digit
histograms (a scatter-add if done in XLA). Whether either primitive runs
anywhere near HBM bandwidth on TPU decides the design, so: time
  (a) jnp.take of N uint32 pairs at N random indices (the permutation),
  (b) segment_sum of ones into nblocks*256 bins (XLA scatter-add histogram),
  (c) the N-key two-limb lax.sort (the incumbent, for the same N).
Single-session discipline applies (verify SKILL.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, fetch, reps=5):
    fetch(fn())  # compile + warm
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn()
    fetch(out)  # device executes in order: one fetch bounds the train
    return (time.time() - t0) / reps


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    _ = int(jnp.arange(8).sum())
    dev = jax.devices()[0]
    print(json.dumps({"stage": "session_up", "platform": dev.platform,
                      "wait_s": round(time.time() - t0, 1)}), flush=True)

    N = 1 << 24  # 16.8M, the counting-bench scale
    B = 1024
    nblocks = N // B
    rng = np.random.default_rng(0)
    keys_lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    keys_hi = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    @jax.jit
    def gather_pair(lo, hi, idx):
        return jnp.take(lo, idx), jnp.take(hi, idx)

    dt_g = bench(lambda: gather_pair(keys_lo, keys_hi, perm),
                 lambda o: np.asarray(o[0][:8]))

    digits = jnp.asarray((np.asarray(keys_lo) & 255).astype(np.int32))
    block = jnp.asarray(
        (np.arange(N, dtype=np.int64) // B * 256).astype(np.int32))
    seg = digits + block

    @jax.jit
    def hist(seg):
        return jax.ops.segment_sum(
            jnp.ones_like(seg), seg, num_segments=nblocks * 256)

    dt_h = bench(lambda: hist(seg), lambda o: np.asarray(o[:8]))

    @jax.jit
    def full_sort(lo, hi):
        return jax.lax.sort((hi, lo), num_keys=2)

    dt_s = bench(lambda: full_sort(keys_lo, keys_hi),
                 lambda o: np.asarray(o[0][:8]))

    out = {
        "platform": dev.platform,
        "n": N,
        "gather_s": round(dt_g, 4),
        "gather_gbps": round(N * 12 / dt_g / 1e9, 1),  # 8B read+4B idx
        "hist_segsum_s": round(dt_h, 4),
        "sort2limb_s": round(dt_s, 4),
        "radix8_estimate_s": round(8 * (dt_g + dt_h), 4),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/tpu_gather_probe.json", "w") as fh:
        json.dump(out, fh)


if __name__ == "__main__":
    main()
