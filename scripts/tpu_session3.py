"""Third round-3 TPU session: WARM reruns of the device aux stages
(the persistent compile cache now holds their programs, isolating
steady-state from remote-compile cost) + extension forms re-check.

Phases (failure-isolated, results streamed to /tmp/tpu_session2.json):
  A. extension round at 1M records: lexsort+gather vs variadic vs
     variadic+partner_fill (the segmented-fill join) — single-k.
  B. device aux stages at VERDICT scale on the chip: error correction
     (1M reads), end-extend (100k contigs / 1M reads), patching read
     mapping (1M pairs) — wall seconds to compare against the committed
     CPU numbers (316 s / 74 s / 181 s, ARCHITECTURE.md) for the >=10x
     criterion.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {"phases": {}}
OUT = "/tmp/tpu_session3.json"


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

    from reflexiv_tpu import packed as pk
    from reflexiv_tpu.records import Records

    rng = np.random.default_rng(0)

    @phase("extension_forms")
    def p_ext():
        out = {}
        G = 1_000_000
        k = 31
        genome = rng.integers(0, 4, G + k, dtype=np.uint8)
        N = 1 << 20
        L = 64
        idx = rng.integers(0, G, N)
        seq = np.zeros((N, L), np.uint8)
        for col in range(k):
            seq[:, col] = genome[idx + col]
        p = pk.from_records(Records(
            jnp.asarray(seq), jnp.full(N, k, jnp.int32),
            jnp.full(N, -3, jnp.int32), jnp.full(N, -3, jnp.int32),
            jnp.ones(N, bool)))
        forms = (("lexsort_gather", False, False),
                 ("variadic", True, False),
                 ("variadic_fill", True, True))
        for tag, var, fill in forms:
            dt = bench(
                lambda v=var, fl=fill: pk._extension_round_packed(
                    p, jnp.uint32(1), k=k, variadic=v, partner_fill=fl),
                lambda o: np.asarray(o[0].length[:8]))
            out[f"round_{tag}_s"] = round(dt, 4)
            out[f"recs_per_s_{tag}"] = round(N / dt)
        out["records"] = N
        return out

    p_ext()

    @phase("extension_ablation")
    def p_abl():
        """Time the round's pieces in isolation: find the real bottleneck
        (the round-2 roofline blamed the permutation gathers; the variadic
        form only bought 9%, so something else dominates)."""
        out = {}
        G = 1_000_000
        k = 31
        genome = rng.integers(0, 4, G + k, dtype=np.uint8)
        N = 1 << 20
        L = 64
        idx = rng.integers(0, G, N)
        seq = np.zeros((N, L), np.uint8)
        for col in range(k):
            seq[:, col] = genome[idx + col]
        p = pk.from_records(Records(
            jnp.asarray(seq), jnp.full(N, k, jnp.int32),
            jnp.full(N, -3, jnp.int32), jnp.full(N, -3, jnp.int32),
            jnp.ones(N, bool)))
        LW = p.seq.shape[1]
        marker = jax.jit(pk.draw_markers_packed)(p, jnp.uint32(1))
        keys = jax.jit(
            lambda p, m: pk.derive_keys_packed(p, m, k))(p, marker)
        Wp = keys.shape[1]

        fetch = lambda o: np.asarray(  # noqa: E731
            (o[0] if isinstance(o, (tuple, list)) else o).ravel()[:8])

        out["draw_markers_s"] = round(bench(
            lambda: jax.jit(pk.draw_markers_packed)(p, jnp.uint32(1)),
            fetch), 4)
        out["derive_keys_s"] = round(bench(
            lambda: jax.jit(
                lambda p, m: pk.derive_keys_packed(p, m, k))(p, marker),
            fetch), 4)

        @jax.jit
        def full_sort(keys, marker, seq, length, left, right, live):
            return jax.lax.sort(
                tuple(keys[:, i] for i in range(Wp)) + (marker,)
                + tuple(seq[:, i] for i in range(LW))
                + (length, left, right, live), num_keys=Wp + 1)

        out["variadic_sort_s"] = round(bench(
            lambda: full_sort(keys, marker, p.seq, p.length, p.left,
                              p.right, p.live), fetch), 4)

        seg = jnp.cumsum(
            jnp.any(keys != jnp.roll(keys, 1, axis=0), axis=1)
            .at[0].set(True).astype(jnp.int32)) - 1

        from reflexiv_tpu.join_core import first_per_segment, segmented_fill

        @jax.jit
        def fps(seg, live, marker):
            return (first_per_segment(seg, live & (marker == 1), N),
                    first_per_segment(seg, live & (marker == 2), N))

        out["first_per_segment_x2_s"] = round(bench(
            lambda: fps(seg, p.live, marker), fetch), 4)

        @jax.jit
        def fills(seg, live, marker, seq, length, left, right):
            fstart = (seg != jnp.roll(seg, 1)) & (marker == 1) & live
            _v, fields = segmented_fill(
                fstart, seg, (left, right, length) + tuple(
                    seq[:, i] for i in range(LW)))
            return fields[0]

        out["segmented_fill_one_dir_s"] = round(bench(
            lambda: fills(seg, p.live, marker, p.seq, p.length, p.left,
                          p.right), fetch), 4)

        f_idx = jnp.minimum(jnp.arange(N, dtype=jnp.int32), N - 1)

        @jax.jit
        def row_gather(seq, f):
            return seq[f]

        out["one_row_gather_seq_s"] = round(bench(
            lambda: row_gather(p.seq, f_idx), fetch), 4)

        @jax.jit
        def do_concat(seq, length):
            return pk.concat(seq, length, seq, length,
                             jnp.full(N, k - 1, jnp.int32), LW)

        out["concat_s"] = round(bench(
            lambda: do_concat(p.seq, p.length), fetch), 4)

        @jax.jit
        def do_topk(length, live):
            return jax.lax.top_k(jnp.where(live, length, 0), 2)[0]

        out["top_k_s"] = round(bench(
            lambda: do_topk(p.length, p.live), fetch), 4)
        return out

    # p_abl()  # measured in session 2

    # ---- device aux stages at VERDICT scale ----
    n_contigs, n_pairs, n_reads = 100_000, 1_000_000, 1_000_000
    genome_bp = n_contigs * 1000
    genome_codes = rng.integers(0, 4, genome_bp, dtype=np.uint8)
    CODE = np.frombuffer(b"ACGT", np.uint8)
    genome = CODE[genome_codes].tobytes().decode()
    rl = 100

    @phase("correction_1m")
    def p_corr():
        from reflexiv_tpu.io import reads_to_matrix
        from reflexiv_tpu.preprocess import correct_reads_device

        g2 = n_reads * rl // 40
        genome2 = genome[:g2] if g2 <= genome_bp else genome
        rstarts = rng.integers(0, len(genome2) - rl, n_reads)
        mat, lens = reads_to_matrix(
            [genome2[s: s + rl].encode() for s in rstarts])
        n_err = n_reads // 2
        er = rng.integers(0, n_reads, n_err)
        ec = rng.integers(0, rl, n_err)
        mat[er, ec] = (mat[er, ec] + 1) % 4
        t0 = time.time()
        fixed, n_fixed = correct_reads_device(mat, lens, k=23, min_cov=3)
        dt = time.time() - t0
        return {"reads": n_reads, "planted": n_err, "fixed": int(n_fixed),
                "wall_s": round(dt, 2),
                "cpu_baseline_s": 316,
                "speedup_vs_cpu": round(316 / dt, 1)}

    p_corr()

    @phase("end_extend_100k")
    def p_ext2():
        from reflexiv_tpu.io import reads_to_matrix
        from reflexiv_tpu.mapping import end_extend_arrays

        span = genome_bp // n_contigs
        contigs = [genome[i * span: (i + 1) * span + 20]
                   for i in range(n_contigs)]
        rstarts = rng.integers(0, genome_bp - rl, n_reads)
        mat, lens = reads_to_matrix(
            [genome[s: s + rl].encode() for s in rstarts])
        os.environ["REFLEXIV_DEVICE_STAGES"] = "1"
        t0 = time.time()
        extended = end_extend_arrays(contigs, mat, lens, max_rounds=2)
        dt = time.time() - t0
        grew = sum(len(e) > len(c) for e, c in zip(extended, contigs))
        return {"contigs": n_contigs, "reads": n_reads, "grew": grew,
                "wall_s": round(dt, 2), "cpu_baseline_s": 74,
                "speedup_vs_cpu": round(74 / dt, 1)}

    p_ext2()

    @phase("patching_1m")
    def p_patch():
        from reflexiv_tpu.patching import patch_contigs

        span = genome_bp // n_contigs
        contigs = [genome[i * span: (i + 1) * span + 20]
                   for i in range(n_contigs)]
        insert = 300
        starts = rng.integers(0, genome_bp - insert, n_pairs)
        comp = str.maketrans("ACGT", "TGCA")
        pairs = [
            (genome[s: s + rl],
             genome[s + insert - rl: s + insert].translate(comp)[::-1])
            for s in starts
        ]
        os.environ["REFLEXIV_DEVICE_STAGES"] = "1"
        t0 = time.time()
        joined, links = patch_contigs(contigs, pairs)
        dt = time.time() - t0
        return {"pairs": n_pairs, "joined": len(contigs) - len(joined),
                "links": len(links), "wall_s": round(dt, 2),
                "cpu_baseline_s": 181,
                "speedup_vs_cpu": round(181 / dt, 1)}

    p_patch()

    save()
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
