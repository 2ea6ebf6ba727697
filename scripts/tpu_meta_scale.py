"""Scale proof: meta (dynamic-k) on a large synthetic, on the default
backend (the real TPU when the tunnel is up) — VERDICT r2 #6.

Generates a G-bp random genome, ~COV x read coverage with an error rate,
writes FASTQ, runs the meta CLI in a subprocess (so a device OOM cannot
kill the harness), then scores the assembly: N50, total assembled bases,
and k-mer precision (fraction of contig 31-mers present in the truth
genome) / recall (fraction of genome 31-mers covered by contigs).

Usage:
  python scripts/tpu_meta_scale.py --mbp 30 [--cov 30] [--err 0.003]
                                   [--klist 23,31,41,53] [--budget-mb 512]

Writes /tmp/tpu_meta_scale.json and prints one JSON line per stage.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=30.0)
    ap.add_argument("--cov", type=int, default=30)
    ap.add_argument("--err", type=float, default=0.003)
    ap.add_argument("--rl", type=int, default=100)
    ap.add_argument("--klist", default="23,31,41,53")
    ap.add_argument("--budget-mb", type=int, default=512,
                    help="out-of-core ingest budget for the counting ladder")
    ap.add_argument("--outdir", default="/tmp/meta_scale_out")
    ap.add_argument("--timeout", type=int, default=14000)
    ap.add_argument("--keep-fastq", action="store_true")
    args = ap.parse_args()

    import numpy as np

    G = int(args.mbp * 1e6)
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, G, dtype=np.uint8)
    code = np.frombuffer(b"ACGT", np.uint8)
    n_reads = G * args.cov // args.rl
    fq = os.path.join("/tmp", f"meta_scale_{int(args.mbp)}m.fq")
    t0 = time.time()
    with open(fq, "wb") as fh:
        qual = b"I" * args.rl + b"\n"
        chunk = 1 << 15
        for lo in range(0, n_reads, chunk):
            n = min(chunk, n_reads - lo)
            starts = rng.integers(0, G - args.rl, n)
            offs = starts[:, None] + np.arange(args.rl)[None, :]
            block = genome[offs]
            errs = rng.random((n, args.rl)) < args.err
            block = np.where(
                errs, (block + rng.integers(1, 4, (n, args.rl))) % 4, block
            ).astype(np.uint8)
            # half the reads on the reverse strand
            flip = rng.random(n) < 0.5
            rc = (block[:, ::-1] ^ 3).astype(np.uint8)
            block = np.where(flip[:, None], rc, block)
            rows = []
            for i in range(n):
                rows.append(b"@r%d\n" % (lo + i))
                rows.append(code[block[i]].tobytes() + b"\n+\n")
                rows.append(qual)
            fh.write(b"".join(rows))
    gen_s = time.time() - t0
    print(json.dumps({
        "stage": "generated", "genome_bp": G, "reads": n_reads,
        "fastq_mb": os.path.getsize(fq) >> 20, "gen_s": round(gen_s, 1),
    }), flush=True)

    env = dict(os.environ,
               REFLEXIV_INGEST_BUDGET_MB=str(args.budget_mb))
    cmd = [sys.executable, "-m", "reflexiv_tpu.cli", "meta",
           "-fastq", fq, "-outfile", args.outdir,
           "-klist", args.klist, "-cover", "2", "-mincontig", "500"]
    t0 = time.time()
    proc = subprocess.run(
        cmd, env=env, timeout=args.timeout,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True, text=True)
    wall = time.time() - t0
    tail = proc.stderr[-1500:] + proc.stdout[-500:]
    print(json.dumps({"stage": "meta_done", "rc": proc.returncode,
                      "wall_s": round(wall, 1)}), flush=True)
    if proc.returncode != 0:
        print(tail, flush=True)
        result = {"ok": False, "rc": proc.returncode, "wall_s": wall,
                  "tail": tail[-800:]}
        json.dump(result, open("/tmp/tpu_meta_scale.json", "w"))
        return

    # score contigs vs truth
    from reflexiv_tpu.count import count_kmers
    from reflexiv_tpu.io import iter_fasta, reads_to_matrix

    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(args.outdir, "part-*")))
    contigs = []
    for p in parts:
        contigs.extend(s.decode() for _, s in iter_fasta([p]))
    lens = sorted((len(c) for c in contigs), reverse=True)
    total = sum(lens)
    acc, n50 = 0, 0
    for ln in lens:
        acc += ln
        if acc >= total / 2:
            n50 = ln
            break

    k = 31

    def kmer_set(mat, ls):
        limbs, _ = count_kmers(mat, ls, k=k, min_cov=1,
                               max_cov=2_000_000_000)
        return limbs

    import jax

    jax.config.update("jax_platforms", "cpu")  # scoring on host CPU
    gmat = code[genome].tobytes()
    gm, gl = reads_to_matrix([gmat])
    del gmat
    truth = kmer_set(gm, gl)
    cm, cl = reads_to_matrix([c.encode() for c in contigs])
    got = kmer_set(cm, cl)

    def as_void(a):
        a = np.ascontiguousarray(a)
        return a.view([("", a.dtype)] * a.shape[1]).ravel()

    tv, gv = as_void(truth), as_void(got)
    inter = len(np.intersect1d(tv, gv, assume_unique=True))
    precision = inter / max(len(gv), 1)
    recall = inter / max(len(tv), 1)

    metrics_path = os.path.join(args.outdir, "metrics.json")
    stage_metrics = (json.load(open(metrics_path))
                     if os.path.exists(metrics_path) else None)
    result = {
        "ok": True,
        "genome_bp": G, "reads": n_reads, "err_rate": args.err,
        "klist": args.klist, "ingest_budget_mb": args.budget_mb,
        "wall_s": round(wall, 1),
        "contigs": len(contigs), "assembled_bp": total, "n50": n50,
        "kmer_precision": round(precision, 5),
        "kmer_recall": round(recall, 5),
        "stage_metrics": stage_metrics,
    }
    if not args.keep_fastq:
        os.unlink(fq)
    json.dump(result, open("/tmp/tpu_meta_scale.json", "w"), indent=1)
    print(json.dumps({kk: vv for kk, vv in result.items()
                      if kk != "stage_metrics"}), flush=True)


if __name__ == "__main__":
    main()
