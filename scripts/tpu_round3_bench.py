"""Round-3 combined TPU campaign: sort kernel, counting pass, extension
rounds — ONE tunnel session, per-phase failure isolation.

Session acquisition can take ~40 min (observed 2432 s), so everything this
round needs from the chip runs in one process, each phase wrapped so a
Mosaic rejection or OOM records an error and the rest still measures.
Results stream to /tmp/tpu_round3_bench.json after every phase.

Phases:
  A. hierarchical Pallas sort: parity at 2^18 + 2^24, wall vs two-limb
     lax.sort at 2^24, component split (local sort / cross stage / merge).
  B. counting pass at bench scale (Pallas extraction + sort + run-length):
     REFLEXIV_PALLAS_SORT off vs on, exact table parity.
  C. extension rounds at 1M records: lexsort+gather vs variadic forms,
     single-k and mixed-k, + exact census.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {"phases": {}}
OUT = "/tmp/tpu_round3_bench.json"


def save():
    with open(OUT, "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def phase(name):
    def deco(fn):
        def run(*a, **kw):
            t0 = time.time()
            try:
                out = fn(*a, **kw)
                RESULTS["phases"][name] = {"ok": True, **(out or {})}
            except Exception as e:  # noqa: BLE001 — record and continue
                RESULTS["phases"][name] = {
                    "ok": False, "error": f"{type(e).__name__}: {e}",
                    "trace": traceback.format_exc()[-1200:],
                }
            RESULTS["phases"][name]["wall_s"] = round(time.time() - t0, 1)
            print(json.dumps({name: {
                k: v for k, v in RESULTS["phases"][name].items()
                if k != "trace"}}), flush=True)
            save()
        return run
    return deco


def bench(fn, fetch, reps=5):
    fetch(fn())
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn()
    fetch(out)
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
    RESULTS["platform"] = dev.platform
    RESULTS["session_wait_s"] = round(time.time() - t0, 1)
    print(json.dumps({"stage": "session_up", "platform": dev.platform,
                      "wait_s": RESULTS["session_wait_s"]}), flush=True)
    save()

    from reflexiv_tpu import sort_kernels as sk

    rng = np.random.default_rng(0)

    # try the dynamic-roll kernels first; fall back to the static-stride
    # per-round kernels if Mosaic rejects them
    for variant, static in (("dynamic", False), ("static", True)):
        @phase(f"sort_parity_small_{variant}")
        def p_small(static=static):
            N = 1 << 18
            hi = rng.integers(0, 50, N, dtype=np.uint32)
            lo = rng.integers(0, 2**32, N, dtype=np.uint32)
            sh, sl = sk.sort_pairs(jnp.asarray(hi), jnp.asarray(lo),
                                   static_stages=static)
            got = (np.asarray(sh).astype(np.uint64) << 32) | np.asarray(sl)
            want = np.sort((hi.astype(np.uint64) << 32) | lo)
            return {"parity": bool(np.array_equal(got, want))}

        p_small()
        if RESULTS["phases"][f"sort_parity_small_{variant}"].get("parity"):
            RESULTS["sort_variant"] = variant
            RESULTS["sort_static_stages"] = static
            break
    save()

    use_static = RESULTS.get("sort_static_stages")
    N24 = 1 << 24
    hi24 = rng.integers(0, 2**30, N24, dtype=np.uint32)
    lo24 = rng.integers(0, 2**32, N24, dtype=np.uint32)
    hj, lj = jnp.asarray(hi24), jnp.asarray(lo24)

    @phase("sort_parity_24")
    def p_big():
        if use_static is None:
            return {"skipped": "no working sort variant"}
        sh, sl = sk.sort_pairs(hj, lj, static_stages=use_static)
        got = (np.asarray(sh).astype(np.uint64) << 32) | np.asarray(sl)
        want = np.sort((hi24.astype(np.uint64) << 32) | lo24)
        return {"parity": bool(np.array_equal(got, want))}

    p_big()

    @phase("sort_timing_24")
    def p_time():
        out = {}
        if RESULTS["phases"].get("sort_parity_24", {}).get("parity"):
            dt_p = bench(
                lambda: sk.sort_pairs(hj, lj, static_stages=use_static),
                lambda o: np.asarray(o[0][:8]))
            out["pallas_sort_s"] = round(dt_p, 4)
            # time the other variant too if both compile
            try:
                other = not use_static
                dt_o = bench(
                    lambda: sk.sort_pairs(hj, lj, static_stages=other),
                    lambda o: np.asarray(o[0][:8]))
                out["pallas_sort_other_variant_s"] = round(dt_o, 4)
            except Exception as e:  # noqa: BLE001
                out["other_variant_error"] = str(e)[:200]

        @jax.jit
        def xla_sort(h, l):
            return jax.lax.sort((h, l), num_keys=2)

        dt_x = bench(lambda: xla_sort(hj, lj),
                     lambda o: np.asarray(o[0][:8]))
        out["xla_sort_s"] = round(dt_x, 4)
        if "pallas_sort_s" in out:
            out["speedup_vs_xla"] = round(dt_x / out["pallas_sort_s"], 2)
        return out

    p_time()

    @phase("sort_components_24")
    def p_comp():
        if not RESULTS["phases"].get("sort_parity_24", {}).get("parity"):
            return {"skipped": "no parity"}
        nb = N24 // sk.BLOCK
        h3 = hj.reshape(nb, sk.ROWS, sk.LANES)
        l3 = lj.reshape(nb, sk.ROWS, sk.LANES)
        loc_fn = sk._local_sort_static if use_static else sk._local_sort
        mrg_fn = (sk._merge_blocks_static if use_static
                  else sk._merge_blocks)
        local = jax.jit(lambda a, b: loc_fn(a, b, nb, False))
        merge = jax.jit(lambda a, b: mrg_fn(a, b, nb, 24, False))
        cross = jax.jit(lambda a, b: sk._cross_stage(a, b, nb // 2, 24))
        f = lambda o: np.asarray(o[0][0, 0, :8])  # noqa: E731
        return {
            "local_sort_s": round(bench(lambda: local(h3, l3), f), 4),
            "merge_pass_s": round(bench(lambda: merge(h3, l3), f), 4),
            "cross_stage_s": round(bench(lambda: cross(h3, l3), f), 4),
        }

    p_comp()
    if use_static:
        os.environ["REFLEXIV_PALLAS_SORT_STATIC"] = "1"

    # ---- counting pass ----
    from reflexiv_tpu import pallas_kernels
    from reflexiv_tpu.count import sort_count_filter
    from reflexiv_tpu.io import load_reads

    mat, lens = load_reads("/root/reference/example/paired_dat*.fq.gz")
    mat = np.tile(mat, (64, 1))
    lens_t = np.tile(lens, 64)
    bases, lengths = jnp.asarray(mat), jnp.asarray(lens_t)
    k = 31
    n_kmers = int(np.sum(np.maximum(lens_t - k + 1, 0)))

    def pass_with(flag):
        limbs, valid = pallas_kernels.extract_canonical_kmers_pallas(
            bases, lengths, k=k)
        return sort_count_filter(limbs, valid, min_cov=3, max_cov=10**7,
                                 pallas_sort=flag)

    tables = {}

    @phase("count_pass")
    def p_count():
        out = {"n_kmers": n_kmers}
        flags = [False]
        if RESULTS["phases"].get("sort_parity_24", {}).get("parity"):
            flags.append(True)
        for flag in flags:
            res = pass_with(flag)
            keep = np.asarray(res[2])
            tab = np.asarray(res[0])[keep]
            cnt = np.asarray(res[1])[keep]
            o = np.lexsort((tab[:, 1], tab[:, 0]))
            tables[flag] = (tab[o], cnt[o])
            dt = bench(lambda fl=flag: pass_with(fl),
                       lambda o: np.asarray(o[1][:8]))
            tag = "pallas_sort" if flag else "xla_sort"
            out[f"count_pass_{tag}_s"] = round(dt, 4)
            out[f"mkmers_{tag}"] = round(n_kmers / dt / 1e6, 1)
        if len(tables) == 2:
            out["table_parity"] = bool(
                np.array_equal(tables[0][0], tables[1][0])
                and np.array_equal(tables[0][1], tables[1][1]))
        return out

    p_count()

    # ---- extension rounds ----
    from reflexiv_tpu import packed as pk
    from reflexiv_tpu import packed_dyn as pd
    from reflexiv_tpu.records import Records
    from reflexiv_tpu.dynamic import DynRecords

    @phase("extension_rounds")
    def p_ext():
        out = {}
        G = 1_000_000
        ek = 31
        K_CLASSES = (23, 31, 41)
        genome = rng.integers(0, 4, G + max(K_CLASSES), dtype=np.uint8)
        N = 1 << 20
        L = 64
        idx = rng.integers(0, G, N)
        seq = np.zeros((N, L), np.uint8)
        for col in range(ek):
            seq[:, col] = genome[idx + col]
        p = pk.from_records(Records(
            jnp.asarray(seq), jnp.full(N, ek, jnp.int32),
            jnp.full(N, -3, jnp.int32), jnp.full(N, -3, jnp.int32),
            jnp.ones(N, bool)))
        for variadic in (False, True):
            dt = bench(
                lambda v=variadic: pk._extension_round_packed(
                    p, jnp.uint32(1), k=ek, variadic=v),
                lambda o: np.asarray(o[0].length[:8]))
            tag = "variadic" if variadic else "lexsort_gather"
            out[f"single_k_round_{tag}_s"] = round(dt, 4)
            out[f"single_k_recs_per_s_{tag}"] = round(N / dt)
        ks = rng.choice(list(K_CLASSES), N)
        seqd = np.zeros((N, L), np.uint8)
        for col in range(max(K_CLASSES)):
            seqd[:, col] = genome[idx + col]
        seqd = np.where(np.arange(L)[None, :] < ks[:, None], seqd,
                        0).astype(np.uint8)
        dpool = pd.from_dyn(DynRecords(
            jnp.asarray(seqd), jnp.asarray(ks.astype(np.int32)),
            jnp.asarray((ks - 1).astype(np.int32)),
            jnp.full(N, -3, jnp.int32), jnp.full(N, -3, jnp.int32),
            jnp.ones(N, bool)))
        for variadic in (False, True):
            def run_dyn(v=variadic):
                m = pd.draw_markers_pdyn(dpool, jnp.uint32(1))
                return pd._pdyn_round_impl(
                    dpool, m, kmin=23, max_sub=40, variadic=v)

            dt = bench(run_dyn, lambda o: np.asarray(o.length[:8]))
            tag = "variadic" if variadic else "lexsort_gather"
            out[f"mixed_k_round_{tag}_s"] = round(dt, 4)
            out[f"mixed_k_recs_per_s_{tag}"] = round(N / dt)
        dt = bench(lambda: pd.finished_mask_pdyn_exact(dpool, 40),
                   lambda o: np.asarray(o[:8]), reps=3)
        out["exact_census_s"] = round(dt, 4)
        out["records"] = N
        return out

    p_ext()

    save()
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
