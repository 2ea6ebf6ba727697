"""Scale probe for the host-side aux stages (VERDICT round-1 item 6).

Times the batched implementations of the three stages the round-1 review
flagged as per-item Python — end-extension consensus (mapping.py), k-mer
spectrum error correction (preprocess.py), and read-pair patching
(patching.py) — on a synthetic at production-ish scale, and prints one JSON
line per stage with wall seconds and per-item throughput.

All three are linear in their input (gather + bincount / searchsorted
passes), so the printed throughputs extrapolate: e.g. patching 10M pairs =
10x the 1M-pair time. Usage:

    python scripts/host_stage_scale.py [--contigs 100000] [--pairs 1000000]
                                       [--reads 1000000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=100_000)
    ap.add_argument("--pairs", type=int, default=1_000_000)
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--genome", type=int, default=0,
                    help="genome bp (default: 1000 x contigs so end "
                         "windows are distinct)")
    ap.add_argument("--platform", default="cpu", choices=("cpu", "default"),
                    help="cpu = pin the CPU backend (host numbers); "
                         "default = whatever jax picks (the TPU when up)")
    ap.add_argument("--device-stages", default="1",
                    choices=("0", "1", "auto"),
                    help="REFLEXIV_DEVICE_STAGES: 1 = jitted device aux "
                         "stages (default), 0 = numpy oracles, auto = leave "
                         "unset (evidence-driven per-stage defaults + "
                         "native C++ backends)")
    ap.add_argument("--stages", default="",
                    help="comma list to run (patching,end_extend,dedup,"
                         "error_correction); empty = all")
    args = ap.parse_args()
    if not args.genome:
        args.genome = args.contigs * 1000
    if args.device_stages == "auto":
        os.environ.pop("REFLEXIV_DEVICE_STAGES", None)
    else:
        os.environ["REFLEXIV_DEVICE_STAGES"] = args.device_stages
    want_stages = set(s for s in args.stages.split(",") if s)

    def stage_on(name: str) -> bool:
        return not want_stages or name in want_stages

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "device_stages": args.device_stages,
    }))

    rng = np.random.default_rng(7)
    genome_codes = rng.integers(0, 4, args.genome, dtype=np.uint8)
    CODE = np.frombuffer(b"ACGT", np.uint8)
    genome = CODE[genome_codes].tobytes().decode()

    # --- patching: N contigs tiling the genome, M read pairs -------------
    from reflexiv_tpu.patching import patch_contigs

    span = args.genome // args.contigs
    contigs = [
        genome[i * span: (i + 1) * span + 20] for i in range(args.contigs)
    ]
    insert, rl = 300, 100
    if stage_on("patching"):
        starts = rng.integers(0, args.genome - insert, args.pairs)
        comp = str.maketrans("ACGT", "TGCA")
        pairs = [
            (genome[s: s + rl],
             genome[s + insert - rl: s + insert].translate(comp)[::-1])
            for s in starts
        ]
        t0 = time.time()
        joined, links = patch_contigs(contigs, pairs)
        t_patch = time.time() - t0
        print(json.dumps({
            "stage": "patching", "contigs": args.contigs,
            "pairs": args.pairs, "wall_s": round(t_patch, 2),
            "pairs_per_s": round(args.pairs / t_patch),
            "joined": len(contigs) - len(joined), "links": len(links),
        }))

    # --- end extension: contigs + a read matrix ---------------------------
    from reflexiv_tpu.io import reads_to_matrix
    from reflexiv_tpu.mapping import end_extend_arrays

    if stage_on("end_extend"):
        rstarts = rng.integers(0, args.genome - rl, args.reads)
        reads = [genome[s: s + rl].encode() for s in rstarts]
        mat, lens = reads_to_matrix(reads)
        t0 = time.time()
        extended = end_extend_arrays(contigs[: args.contigs], mat, lens,
                                     max_rounds=2)
        t_ext = time.time() - t0
        grew = sum(len(e) > len(c) for e, c in zip(extended, contigs))
        print(json.dumps({
            "stage": "end_extend", "contigs": args.contigs,
            "reads": args.reads, "wall_s": round(t_ext, 2),
            "contigs_per_s": round(args.contigs / t_ext), "grew": grew,
        }))

    # --- containment dedup (C++ rfx_dedup): contigs + their halves ------
    from reflexiv_tpu.dynamic import dedup_contigs

    if stage_on("dedup"):
        pool = contigs[: args.contigs // 2]
        pool += [c[: len(c) // 2] for c in pool[: args.contigs // 4]]
        t0 = time.time()
        kept = dedup_contigs(pool)
        t_dedup = time.time() - t0
        print(json.dumps({
            "stage": "dedup", "contigs_in": len(pool), "kept": len(kept),
            "wall_s": round(t_dedup, 2),
            "contigs_per_s": round(len(pool) / t_dedup),
        }))

    # --- error correction: ~40x coverage reads, 0.5 errors/read planted ---
    # (at production coverage the weak-position set ~= the error set; a
    # low-coverage matrix would make every position weak and time the wrong
    # regime)
    from reflexiv_tpu.preprocess import correct_reads

    if stage_on("error_correction"):
        g2 = args.reads * rl // 40
        genome2 = genome[:g2] if g2 <= args.genome else genome
        rstarts2 = rng.integers(0, len(genome2) - rl, args.reads)
        mat2, lens2 = reads_to_matrix(
            [genome2[s: s + rl].encode() for s in rstarts2])
        n_err = args.reads // 2
        err_rows = rng.integers(0, args.reads, n_err)
        err_cols = rng.integers(0, rl, n_err)
        mat2[err_rows, err_cols] = (mat2[err_rows, err_cols] + 1) % 4
        t0 = time.time()
        fixed, n_fixed = correct_reads(mat2, lens2, k=23, min_cov=3)
        t_corr = time.time() - t0
        print(json.dumps({
            "stage": "error_correction", "reads": args.reads,
            "planted": n_err, "fixed": n_fixed,
            "wall_s": round(t_corr, 2),
            "reads_per_s": round(args.reads / t_corr),
        }))


if __name__ == "__main__":
    main()
