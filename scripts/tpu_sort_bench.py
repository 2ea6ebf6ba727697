"""Validate + time the hierarchical Pallas bitonic sort on the real TPU.

One tunnel session (verify SKILL.md discipline: no concurrent TPU procs, a
single host fetch per timed train). Measures:
  1. parity of sort_pairs vs lax.sort at 2^18 and 2^24 keys;
  2. sort_pairs wall vs the incumbent two-limb lax.sort at 2^24;
  3. component split: local sort kernel / one cross stage / one merge pass;
  4. the full counting pass (Pallas extraction + sort + run-length) with
     REFLEXIV_PALLAS_SORT on vs off at bench scale (tile=64, 10.3M windows,
     padded to 2^24 by the Pallas path).
Writes /tmp/tpu_sort_bench.json and prints one JSON line per stage.
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
    fetch(out)  # one fetch bounds the in-order train
    return (time.time() - t0) / reps


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from reflexiv_tpu.cli import _enable_compilation_cache
    _enable_compilation_cache()

    t0 = time.time()
    _ = int(jnp.arange(8).sum())
    dev = jax.devices()[0]
    print(json.dumps({"stage": "session_up", "platform": dev.platform,
                      "wait_s": round(time.time() - t0, 1)}), flush=True)

    from reflexiv_tpu import sort_kernels as sk

    results = {"platform": dev.platform}

    # --- parity ---
    rng = np.random.default_rng(0)
    for logn in (18, 24):
        N = 1 << logn
        hi = rng.integers(0, 2**30, N, dtype=np.uint32)
        lo = rng.integers(0, 2**32, N, dtype=np.uint32)
        if logn == 18:  # duplicate-heavy variant at the small size too
            hi[: N // 2] = rng.integers(0, 50, N // 2, dtype=np.uint32)
        hj, lj = jnp.asarray(hi), jnp.asarray(lo)
        sh, sl = sk.sort_pairs(hj, lj)
        got = (np.asarray(sh).astype(np.uint64) << 32) | np.asarray(sl)
        want = np.sort((hi.astype(np.uint64) << 32) | lo)
        ok = bool(np.array_equal(got, want))
        results[f"parity_2e{logn}"] = ok
        print(json.dumps({"stage": f"parity 2^{logn}", "ok": ok}),
              flush=True)
        if not ok:
            bad = np.nonzero(got != want)[0]
            print(json.dumps({"first_bad": int(bad[0]),
                              "n_bad": int(len(bad))}), flush=True)
            break

    if results.get("parity_2e24"):
        N = 1 << 24
        hi = rng.integers(0, 2**30, N, dtype=np.uint32)
        lo = rng.integers(0, 2**32, N, dtype=np.uint32)
        hj, lj = jnp.asarray(hi), jnp.asarray(lo)

        dt_p = bench(lambda: sk.sort_pairs(hj, lj),
                     lambda o: np.asarray(o[0][:8]))
        results["pallas_sort_s"] = round(dt_p, 4)
        print(json.dumps({"stage": "pallas sort 2^24", "s": round(dt_p, 4)}),
              flush=True)

        @jax.jit
        def xla_sort(h, l):
            return jax.lax.sort((h, l), num_keys=2)

        dt_x = bench(lambda: xla_sort(hj, lj), lambda o: np.asarray(o[0][:8]))
        results["xla_sort_s"] = round(dt_x, 4)
        results["speedup_vs_xla"] = round(dt_x / dt_p, 2)
        print(json.dumps({"stage": "lax.sort 2^24", "s": round(dt_x, 4),
                          "speedup": results["speedup_vs_xla"]}), flush=True)

        # components
        nb = N // sk.BLOCK
        h3 = hj.reshape(nb, sk.ROWS, sk.LANES)
        l3 = lj.reshape(nb, sk.ROWS, sk.LANES)
        local = jax.jit(lambda a, b: sk._local_sort(a, b, nb, False))
        dt_l = bench(lambda: local(h3, l3), lambda o: np.asarray(o[0][0, 0, :8]))
        merge = jax.jit(
            lambda a, b: sk._merge_blocks(a, b, nb, 24, False))
        dt_m = bench(lambda: merge(h3, l3), lambda o: np.asarray(o[0][0, 0, :8]))
        cross = jax.jit(lambda a, b: sk._cross_stage(a, b, nb // 2, 24))
        dt_c = bench(lambda: cross(h3, l3), lambda o: np.asarray(o[0][0, 0, :8]))
        results.update(local_sort_s=round(dt_l, 4),
                       merge_pass_s=round(dt_m, 4),
                       cross_stage_s=round(dt_c, 4))
        print(json.dumps({"stage": "components", "local": round(dt_l, 4),
                          "merge": round(dt_m, 4),
                          "cross": round(dt_c, 4)}), flush=True)

    # --- counting pass end-to-end, both sort paths ---
    from reflexiv_tpu import pallas_kernels
    from reflexiv_tpu.count import sort_count_filter
    from reflexiv_tpu.io import load_reads

    mat, lens = load_reads("/root/reference/example/paired_dat*.fq.gz")
    mat = np.tile(mat, (64, 1))
    lens = np.tile(lens, 64)
    bases, lengths = jnp.asarray(mat), jnp.asarray(lens)
    k = 31
    n_kmers = int(np.sum(np.maximum(lens - k + 1, 0)))

    def pass_with(pallas_sort):
        limbs, valid = pallas_kernels.extract_canonical_kmers_pallas(
            bases, lengths, k=k)
        return sort_count_filter(limbs, valid, min_cov=3, max_cov=10**7,
                                 pallas_sort=pallas_sort)

    tables = {}
    for flag in (False, True):
        out = pass_with(flag)
        keep = np.asarray(out[2])
        tab = np.asarray(out[0])[keep]
        cnt = np.asarray(out[1])[keep]
        o = np.lexsort((tab[:, 1], tab[:, 0]))
        tables[flag] = (tab[o], cnt[o])
        dt = bench(lambda f=flag: pass_with(f), lambda o: np.asarray(o[1][:8]))
        key = "count_pass_pallas_sort_s" if flag else "count_pass_xla_sort_s"
        results[key] = round(dt, 4)
        results[("mkmers_pallas" if flag else "mkmers_xla")] = round(
            n_kmers / dt / 1e6, 1)
        print(json.dumps({"stage": f"count pass pallas_sort={flag}",
                          "s": round(dt, 4),
                          "mkmers_per_s": round(n_kmers / dt / 1e6, 1)}),
              flush=True)
    parity = (np.array_equal(tables[0][0], tables[1][0])
              and np.array_equal(tables[0][1], tables[1][1]))
    results["count_table_parity"] = bool(parity)
    results["n_kmers"] = n_kmers
    print(json.dumps({"stage": "count table parity", "ok": bool(parity)}),
          flush=True)

    with open("/tmp/tpu_sort_bench.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
