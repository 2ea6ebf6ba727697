"""Measure the counting-ladder host/device breakdown and the ingest-overlap
win on the real chip (VERDICT r4 weak #1 / next #3).

Round 4 measured 2,699 s of counting wall for the 10 Mbp campaign against
~25 s of device compute; the loop was strictly serial. Round 5 added a
depth-2 ingest prefetch thread (`count._PrefetchedChunks`) plus
host-vs-device sub-timers. This runner quantifies both on a mid-scale input
(default 2 Mbp x 30x — big enough that ingest dominates, small enough to fit
one tunnel session twice):

  leg A: REFLEXIV_PREFETCH=0  (the round-4 serial loop)
  leg B: REFLEXIV_PREFETCH=1  (overlapped)

Each leg runs the same one-pass multi-k ladder (klist 23,31,41,53) the meta
campaign uses, in a fresh subprocess (fresh JAX session), and reports wall +
the count.ingest_s / count.input_stall_s / count.device_loop_s split.

Usage: python scripts/tpu_ingest_overlap_bench.py [--mbp 2] [--cov 30]
Writes /tmp/tpu_ingest_overlap.json. Run AFTER the campaign frees the
tunnel — never two TPU processes at once.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEG_CODE = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from reflexiv_tpu.count import count_kmers_from_files_multi
from reflexiv_tpu import metrics
from reflexiv_tpu.cli import _enable_compilation_cache
_enable_compilation_cache()
t0 = time.time()
tables = count_kmers_from_files_multi(
    %(fq)r, (23, 31, 41, 53), min_cov=2, budget_bytes=%(budget)d)
wall = time.time() - t0
met = metrics.current().snapshot()
print("RESULT " + json.dumps({
    "wall_s": round(wall, 2),
    "rows": {str(k): int(len(v[1])) for k, v in tables.items()},
    "sub_timers": {k: v for k, v in met["stages_s"].items()
                   if k.startswith("count.")},
}))
"""


def gen_fastq(mbp: float, cov: int, rl: int = 100, err: float = 0.003):
    import numpy as np

    G = int(mbp * 1e6)
    fq = f"/tmp/overlap_bench_{int(mbp)}m_c{cov}.fq"
    if os.path.exists(fq) and os.path.getsize(fq) > 0:
        return fq
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, G, dtype=np.uint8)
    code = np.frombuffer(b"ACGT", np.uint8)
    n_reads = G * cov // rl
    with open(fq + ".tmp", "wb") as fh:
        qual = b"I" * rl + b"\n"
        chunk = 1 << 15
        for lo in range(0, n_reads, chunk):
            n = min(chunk, n_reads - lo)
            starts = rng.integers(0, G - rl, n)
            block = genome[starts[:, None] + np.arange(rl)[None, :]]
            errs = rng.random((n, rl)) < err
            block = np.where(
                errs, (block + rng.integers(1, 4, (n, rl))) % 4, block
            ).astype(np.uint8)
            rows = []
            for i in range(n):
                rows.append(b"@r%d\n" % (lo + i))
                rows.append(code[block[i]].tobytes() + b"\n+\n")
                rows.append(qual)
            fh.write(b"".join(rows))
    os.rename(fq + ".tmp", fq)
    return fq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=2.0)
    ap.add_argument("--cov", type=int, default=30)
    ap.add_argument("--budget-mb", type=int, default=256)
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args()

    fq = gen_fastq(args.mbp, args.cov)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = LEG_CODE % {
        "repo": repo, "fq": fq, "budget": args.budget_mb << 20}

    out = {"mbp": args.mbp, "cov": args.cov,
           "fastq_mb": os.path.getsize(fq) >> 20, "legs": {}}
    for leg, prefetch in (("serial", "0"), ("overlapped", "1")):
        env = dict(os.environ, REFLEXIV_PREFETCH=prefetch,
                   REFLEXIV_INGEST_BUDGET_MB=str(args.budget_mb))
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], env=env, cwd=repo,
                capture_output=True, text=True, timeout=args.timeout)
            res = None
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    res = json.loads(line[len("RESULT "):])
            out["legs"][leg] = res or {
                "error": (proc.stderr or proc.stdout)[-800:],
                "rc": proc.returncode}
        except subprocess.TimeoutExpired:
            out["legs"][leg] = {"error": "timeout"}
        out["legs"][leg]["leg_wall_s"] = round(time.time() - t0, 1)
        print(json.dumps({leg: out["legs"][leg]}), flush=True)
        json.dump(out, open("/tmp/tpu_ingest_overlap.json", "w"), indent=1)

    a = out["legs"].get("serial", {}).get("wall_s")
    b = out["legs"].get("overlapped", {}).get("wall_s")
    if a and b:
        out["speedup"] = round(a / b, 2)
        # equal tables is the parity gate
        out["tables_equal"] = (
            out["legs"]["serial"].get("rows")
            == out["legs"]["overlapped"].get("rows"))
        json.dump(out, open("/tmp/tpu_ingest_overlap.json", "w"), indent=1)
        print(json.dumps({"speedup": out["speedup"],
                          "tables_equal": out["tables_equal"]}), flush=True)


if __name__ == "__main__":
    main()
