"""Prove the out-of-core ingest bounds host memory (VERDICT r2 missing #2).

Writes a synthetic FASTQ much larger than the ingest budget, then counts it
two ways in clean subprocesses and records each child's peak RSS
(ru_maxrss):
  * streaming: REFLEXIV_INGEST_BUDGET_MB-bounded chunks from disk
    (count_kmers_from_files);
  * whole-matrix: the load_reads + count_kmers path.
The streaming child's peak RSS must stay flat as the input grows (it is
budget + unique-table + JAX runtime), while the whole-matrix child scales
with the input. Prints one JSON line; run on CPU for determinism.

Usage: python scripts/ingest_rss_probe.py [--mb 400] [--budget-mb 32]
"""
import argparse
import json
import os
import resource
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHILD = r"""
import json, os, resource, sys
import jax; jax.config.update("jax_platforms", "cpu")
mode, path = sys.argv[1], sys.argv[2]
if mode == "stream":
    from reflexiv_tpu.count import count_kmers_from_files
    budget = int(os.environ["REFLEXIV_INGEST_BUDGET_MB"]) << 20
    limbs, counts = count_kmers_from_files(
        path, k=31, min_cov=2, budget_bytes=budget)
else:
    from reflexiv_tpu.count import count_kmers
    from reflexiv_tpu.io import load_reads
    mat, lens = load_reads(path)
    limbs, counts = count_kmers(mat, lens, k=31, min_cov=2)
rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
print(json.dumps({"mode": mode, "unique": len(counts),
                  "total": int(counts.sum()), "peak_rss_mb": rss_mb}))
"""


def run_child(mode, path, budget_mb):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               REFLEXIV_INGEST_BUDGET_MB=str(budget_mb))
    out = subprocess.run(
        [sys.executable, "-c", CHILD, mode, path], env=env,
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=400,
                    help="synthetic FASTQ base volume (MB)")
    ap.add_argument("--budget-mb", type=int, default=32)
    ap.add_argument("--skip-whole", action="store_true",
                    help="skip the whole-matrix comparison child")
    args = ap.parse_args()

    import numpy as np

    rl = 100
    n_reads = (args.mb << 20) // rl
    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 5_000_000, dtype=np.uint8)
    code = np.frombuffer(b"ACGT", np.uint8)
    with tempfile.NamedTemporaryFile(
            "wb", suffix=".fq", delete=False) as fh:
        path = fh.name
        qual = b"I" * rl + b"\n"
        chunk = 1 << 14
        for lo in range(0, n_reads, chunk):
            n = min(chunk, n_reads - lo)
            starts = rng.integers(0, len(genome) - rl, n)
            rows = []
            for i, s in enumerate(starts):
                rows.append(b"@r%d\n" % (lo + i))
                rows.append(code[genome[s:s + rl]].tobytes() + b"\n+\n")
                rows.append(qual)
            fh.write(b"".join(rows))
    size_mb = os.path.getsize(path) >> 20
    try:
        stream = run_child("stream", path, args.budget_mb)
        whole = None if args.skip_whole else run_child(
            "whole", path, args.budget_mb)
    finally:
        os.unlink(path)
    result = {
        "input_fastq_mb": int(size_mb),
        "read_bases_mb": args.mb,
        "budget_mb": args.budget_mb,
        "stream": stream,
        "whole_matrix": whole,
    }
    if whole:
        result["parity"] = (stream["unique"] == whole["unique"]
                            and stream["total"] == whole["total"])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
