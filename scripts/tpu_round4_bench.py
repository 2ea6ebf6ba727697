"""Round-4 TPU session: the VERDICT r3 measurement list that fits one
tunnel session (run AFTER the meta scale campaign frees the tunnel —
NEVER concurrently).

Phases (failure-isolated, streamed to /tmp/tpu_round4.json):
  A. mixed-k extension round at 1M records (VERDICT #3): lexsort+gather vs
     variadic vs variadic+partner_fill, production shapes (klist
     23/31/41/53 mixture, max_sub=52) — the round that was written in
     round 3 but never timed on-chip. Single-k timed alongside as the
     reference point.
  B. partition-exchange probes (VERDICT #5): the padded run-copy DMA
     exchange at 2^24 (the primitive round 3 called expressible but
     unmeasured) + per-element dynamic-offset load rate. Together with
     the measured 32 ms VMEM local sort these settle the radix-vs-bitonic
     question arithmetically.
  C. 10M-read correction end-to-end (VERDICT #6): solid table on the TPU
     (counting path) + threaded C++ rfx_correct on the host.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {"phases": {}}
OUT = "/tmp/tpu_round4.json"
# merge with a prior partial run so phase-selective re-runs (argv) keep
# earlier results
if os.path.exists(OUT):
    try:
        with open(OUT) as _fh:
            RESULTS["phases"].update(json.load(_fh).get("phases", {}))
    except (OSError, ValueError):
        pass


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
            except Exception as e:  # noqa: BLE001
                RESULTS["phases"][name] = {
                    "ok": False, "error": f"{type(e).__name__}: {e}",
                    "trace": traceback.format_exc()[-1200:]}
            RESULTS["phases"][name]["wall_s"] = round(time.time() - t0, 1)
            print(json.dumps({name: {
                k: v for k, v in RESULTS["phases"][name].items()
                if k != "trace"}}), flush=True)
            save()
        return run
    return deco


def bench(fn, fetch, reps=5):
    fetch(fn())   # compile + warm
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn()
    fetch(out)    # one fetch bounds the enqueued train (axon discipline)
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

    rng = np.random.default_rng(0)

    @phase("mixed_k_round")
    def p_mixed():
        from reflexiv_tpu import packed_dyn as pd
        from reflexiv_tpu.packed import limbs_for, pack_seq_matrix_np

        out = {}
        N = 1 << 20
        klist = (23, 31, 41, 53)
        kmin, max_sub = klist[0], klist[-1] - 1
        L = 64
        ks = np.asarray(klist)[rng.integers(0, len(klist), N)]
        bases = rng.integers(0, 4, (N, L), dtype=np.uint8)
        col = np.arange(L)[None, :]
        bases = np.where(col < ks[:, None], bases, 0).astype(np.uint8)
        p = pd.PackedDynRecords(
            jnp.asarray(pack_seq_matrix_np(bases)),
            jnp.asarray(ks.astype(np.int32)),
            jnp.asarray((ks - 1).astype(np.int32)),
            jnp.full(N, -3, jnp.int32), jnp.full(N, -3, jnp.int32),
            jnp.ones(N, bool))
        marker = pd.draw_markers_pdyn(p, jnp.uint32(1))
        forms = (("lexsort_gather", False, False),
                 ("variadic", True, False),
                 ("variadic_fill", True, True))
        ref = None
        for tag, var, fill in forms:
            fn = lambda v=var, fl=fill: pd._pdyn_round_impl(
                p, marker, kmin=kmin, max_sub=max_sub, unique_only=False,
                variadic=v, partner_fill=fl)
            dt = bench(fn, lambda o: np.asarray(o.length[:8]))
            out[f"round_{tag}_s"] = round(dt, 4)
            out[f"recs_per_s_{tag}"] = round(N / dt)
            got = fn()
            key = (np.asarray(got.length), np.asarray(got.live),
                   np.asarray(got.seq[:, :4]))
            if ref is None:
                ref = key
            else:
                out[f"parity_{tag}"] = bool(
                    all((a == b).all() for a, b in zip(ref, key)))
        out["records"] = N
        out["limbs"] = limbs_for(L)
        return out

    @phase("indexed_round")
    def p_indexed():
        """Round-5 production path: the summary-indexed round (device sees
        fixed-width summaries; host splices). Device-kernel wall + full
        host round wall, same pool as mixed_k_round."""
        from reflexiv_tpu import dynamic as dyn
        from reflexiv_tpu import packed_dyn as pd
        from reflexiv_tpu.packed import pack_seq_matrix_np

        out = {}
        N = 1 << 20
        klist = (23, 31, 41, 53)
        kmin, max_sub = klist[0], klist[-1] - 1
        L = 64
        ks = np.asarray(klist)[rng.integers(0, len(klist), N)]
        bases = rng.integers(0, 4, (N, L), dtype=np.uint8)
        col = np.arange(L)[None, :]
        bases = np.where(col < ks[:, None], bases, 0).astype(np.uint8)
        seq = pack_seq_matrix_np(bases)
        hp = (seq, ks.astype(np.int32), (ks - 1).astype(np.int32),
              np.full(N, -3, np.int32), np.full(N, -3, np.int32))
        t0 = time.time()
        summ = dyn._host_summaries(hp, max_sub)
        out["summaries_s"] = round(time.time() - t0, 4)

        # device kernel alone (one slab, fetch-once discipline)
        arrs = (jnp.asarray(summ[0]), jnp.asarray(summ[1]),
                jnp.asarray(summ[2]), jnp.asarray(summ[3]),
                jnp.asarray(hp[1]), jnp.asarray(hp[2]),
                jnp.asarray(hp[3]), jnp.asarray(hp[4]),
                jnp.ones(N, bool), jnp.arange(N, dtype=jnp.int32))
        fn = lambda: pd.pdyn_round_indexed(
            *arrs, jnp.uint32(1), kmin=kmin, max_sub=max_sub,
            unique_only=False)
        dt = bench(fn, lambda o: np.asarray(o[1][:8]))
        out["device_kernel_s"] = round(dt, 4)
        out["device_recs_per_s"] = round(N / dt)

        # full host round (summaries upload + kernel + host splice);
        # the host loop carries a _RaggedPool, not the raw tuple
        pool = dyn._RaggedPool.from_dense(hp)
        t0 = time.time()
        npool, nsum, n_live, need = dyn._pdyn_round_indexed_host(
            pool, summ, 1, kmin=kmin, max_sub=max_sub, unique_only=False,
            need=2 * L)
        out["full_round_s"] = round(time.time() - t0, 4)
        out["full_recs_per_s"] = round(N / (time.time() - t0))
        out["live_after"] = int(n_live)
        out["records"] = N
        return out

    @phase("partition_exchange")
    def p_exchange():
        from reflexiv_tpu.partition_kernels import (
            group_blocks_xla, padded_exchange)

        out = {}
        N = 1 << 24
        # maxrun 1024: Mosaic's minimum 1-D dynamic-slice is one whole
        # 1024-element tile (measured round 5) — runs pad up to it
        block, maxrun, shift = 1 << 16, 1024, 24
        hi = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
        lo = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
        group = jax.jit(
            lambda a, b: group_blocks_xla(a, b, block=block, shift=shift))
        hi_g, lo_g, starts = group(hi, lo)
        st = np.asarray(starts).reshape(-1, 256)
        ends = np.concatenate(
            [st[:, 1:], np.full((st.shape[0], 1), block, np.int32)], axis=1)
        out["max_run"] = int((ends - st).max())      # must be <= maxrun
        out["grouping_xla_s"] = round(bench(
            lambda: group(hi, lo), lambda o: np.asarray(o[2][:8]), reps=3), 4)
        pad = jnp.zeros(maxrun, jnp.uint32)
        hi_p = jnp.concatenate([hi_g, pad])
        lo_p = jnp.concatenate([lo_g, pad])
        dt = bench(
            lambda: padded_exchange(
                hi_p, lo_p, starts, block=block, maxrun=maxrun),
            lambda o: np.asarray(o[0][:8]), reps=5)
        out["exchange_s"] = round(dt, 4)
        nb = N // block
        from reflexiv_tpu.partition_kernels import _TILE, _slot_size

        slot = _slot_size(maxrun)
        moved = 2 * 256 * nb * slot * 4            # bytes written (padded)
        out["exchange_written_gb_s"] = round(moved / dt / 1e9, 2)
        out["exchange_payload_gb_s"] = round(2 * N * 4 / dt / 1e9, 2)
        out["exchange_dmas"] = 2 * 256 * nb
        # spot parity: one bucket's first run equals the grouped source run
        oh, _ol = padded_exchange(
            hi_p, lo_p, starts, block=block, maxrun=maxrun)
        d, b = 7, 3
        s0 = int(st[b, d])
        src = b * block + s0
        ln = min(int(ends[b, d] - st[b, d]), maxrun)
        got = np.asarray(oh[(d * nb + b) * slot + src % _TILE:][:ln])
        want = np.asarray(hi_g[src: src + ln])
        out["spot_parity"] = bool((got == want).all())
        return out

    @phase("element_gather")
    def p_gather():
        """Random aligned-tile loads (Mosaic admits no sub-1024 1-D slice,
        so one 4 KB tile per gathered element is the gather-form radix
        pass's floor)."""
        from reflexiv_tpu.partition_kernels import tile_gather_probe

        out = {}
        M = 1 << 12   # tiles
        src = jnp.asarray(rng.integers(0, 1 << 32, 1 << 24, dtype=np.uint32))
        starts = jnp.asarray(
            (rng.integers(0, (1 << 24) // 1024 - 1, M) * 1024)
            .astype(np.int32))
        dt = bench(
            lambda: tile_gather_probe(src, starts),
            lambda o: np.asarray(o[:8]), reps=3)
        out["tiles"] = M
        out["ns_per_tile"] = round(dt / M * 1e9, 1)
        out["tile_copy_gb_s"] = round(M * 4096 * 2 / dt / 1e9, 2)
        # one tile per gathered ELEMENT in the arithmetic gather form:
        out["per_pass_s_at_2e24_elements"] = round(dt / M * (1 << 24), 2)
        spot = np.asarray(tile_gather_probe(src, starts)[:1024])
        s0 = int(starts[0])
        out["spot_parity"] = bool(
            (spot == np.asarray(src)[s0: s0 + 1024]).all())
        return out

    @phase("correct_10m")
    def p_correct():
        from reflexiv_tpu import native
        from reflexiv_tpu.count import count_kmers

        out = {}
        G = 25_000_000      # 40x coverage at 10M x 100 bp
        R, rl, k = 10_000_000, 100, 23
        genome = rng.integers(0, 4, G, dtype=np.uint8)
        t0 = time.time()
        starts = rng.integers(0, G - rl, R)
        mat = genome[starts[:, None] + np.arange(rl)[None, :]]
        n_err = R // 2
        er = rng.integers(0, R, n_err)
        ec = rng.integers(0, rl, n_err)
        mat[er, ec] = (mat[er, ec] + 1) % 4
        lens = np.full(R, rl, np.int32)
        out["gen_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        # chunked streaming counting: a one-shot sort at 780M windows is a
        # 19 GB HBM program (measured OOM, round-5 session); the streaming
        # table merges 2^25-window chunks and spills to host when needed
        from reflexiv_tpu.count import count_kmers_streaming

        rows_per_chunk = (1 << 25) // (rl - k + 1)

        def read_chunks():
            for lo in range(0, R, rows_per_chunk):
                yield (jnp.asarray(mat[lo: lo + rows_per_chunk]),
                       jnp.asarray(lens[lo: lo + rows_per_chunk]))

        limbs, counts = count_kmers_streaming(
            read_chunks(), k=k, min_cov=3, max_cov=2_000_000_000)
        limbs = np.asarray(limbs)
        solid = (limbs[:, 0].astype(np.uint64) << np.uint64(32)
                 ) | limbs[:, 1].astype(np.uint64)
        out["table_tpu_s"] = round(time.time() - t0, 1)
        out["solid_kmers"] = int(len(solid))
        t0 = time.time()
        res = native.correct_reads_native(
            mat, lens, np.sort(solid), k=k)
        out["correct_s"] = round(time.time() - t0, 1)
        if res is None:
            raise RuntimeError("native correct unavailable")
        _fixed_mat, n_fixed = res
        out["reads"] = R
        out["planted_errors"] = int(n_err)
        out["fixed"] = int(n_fixed)
        out["reads_per_s"] = round(R / (out["correct_s"] + 1e-9))
        out["e2e_s"] = round(
            out["table_tpu_s"] + out["correct_s"], 1)
        return out

    @phase("device_aux_single_dispatch")
    def p_aux():
        """VERDICT r3 #4: the single-dispatch device forms at the round-2
        CPU-baseline scale (correction 1M reads vs 316 s; patching mapping
        1M pairs vs 181 s stage / the mapping share of it). Warm second
        run isolates steady-state from compiles."""
        out = {}
        os.environ["REFLEXIV_DEVICE_STAGES"] = "1"
        try:
            from reflexiv_tpu.preprocess import correct_reads_device

            G, R, rl = 2_500_000, 1_000_000, 100
            genome = rng.integers(0, 4, G, dtype=np.uint8)
            starts = rng.integers(0, G - rl, R)
            mat = genome[starts[:, None] + np.arange(rl)[None, :]]
            er = rng.integers(0, R, R // 2)
            ec = rng.integers(0, rl, R // 2)
            mat[er, ec] = (mat[er, ec] + 1) % 4
            lens = np.full(R, rl, np.int32)
            t0 = time.time()
            _, n_fixed = correct_reads_device(mat, lens, k=23, min_cov=3)
            out["correction_cold_s"] = round(time.time() - t0, 1)
            t0 = time.time()
            _, n_fixed = correct_reads_device(mat, lens, k=23, min_cov=3)
            out["correction_warm_s"] = round(time.time() - t0, 1)
            out["correction_fixed"] = int(n_fixed)
            out["correction_cpu_baseline_s"] = 316.0
            del mat

            # patching device mapping at 1M pairs / 100k contigs
            from reflexiv_tpu.patching import patch_contigs

            CODE = np.frombuffer(b"ACGT", np.uint8)
            G2 = 100_000 * 1000
            gen2 = rng.integers(0, 4, G2, dtype=np.uint8)
            gs = CODE[gen2].tobytes().decode()
            span = 1000
            contigs = [gs[i * span: (i + 1) * span + 20]
                       for i in range(100_000)]
            insert = 300
            ps = rng.integers(0, G2 - insert, 1_000_000)
            comp = str.maketrans("ACGT", "TGCA")
            pairs = [
                (gs[s: s + rl],
                 gs[s + insert - rl: s + insert].translate(comp)[::-1])
                for s in ps
            ]
            t0 = time.time()
            _joined, links = patch_contigs(contigs, pairs)
            out["patching_stage_s"] = round(time.time() - t0, 1)
            out["patching_links"] = len(links)
            out["patching_cpu_baseline_s"] = 181.0
        finally:
            os.environ.pop("REFLEXIV_DEVICE_STAGES", None)
        return out

    all_phases = {
        "mixed_k_round": p_mixed,
        "indexed_round": p_indexed,
        "partition_exchange": p_exchange,
        "element_gather": p_gather,
        "correct_10m": p_correct,
        "device_aux_single_dispatch": p_aux,
    }
    wanted = sys.argv[1:] or list(all_phases)
    for name in wanted:
        all_phases[name]()
    save()
    print(json.dumps({"done": True, "out": OUT}), flush=True)


if __name__ == "__main__":
    main()
