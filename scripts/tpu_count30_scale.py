"""30 Mbp counting-scale proof (VERDICT r3 #2): break the measured 30 Mbp
single-chip table ceiling with the spill-to-host count-table mode.

Round 3 measured: at 0.3% errors the per-k unique table reaches ~100M rows
(error singletons) and the streaming merge's ~2.5x transient OOMs 16 GB
HBM. The spill mode bounds the device running table
(``count._device_table_rows_limit``; REFLEXIV_DEVICE_TABLE_ROWS) and
merges sorted spilled segments in host RAM (``count._host_merge_parts``) —
the single-host analog of the reference shuffling its table across
executors (``ReflexivDataFrameCounter.java:198-209``; the founding memory
claim, ``docs/index.html`` "500GB graph on 10x64GB nodes").

Protocol:
  1. parity leg (default 10 Mbp): count the same input with the spill mode
     forced (tiny device-table limit) and with it off; assert exact table
     equality. Small enough to run fully on-chip either way.
  2. scale leg (30 Mbp, 0.3% errors): count k=31 with the default bounded
     device table; record wall, unique rows, spilled segments, peak host
     RSS, and the device-table bound (peak-HBM proxy: the running table +
     one 2^25 chunk + merge transient, all bounded by construction).

Writes /tmp/tpu_count30.json. Run AFTER the meta campaign frees the
tunnel; one process at a time.
"""
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RESULTS = {}
OUT = "/tmp/tpu_count30.json"


def save():
    json.dump(RESULTS, open(OUT, "w"), indent=1)


def gen_reads(mbp, cov, err, rl, seed=11):
    import numpy as np

    G = int(mbp * 1e6)
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, G, dtype=np.uint8)
    n_reads = G * cov // rl
    mat = np.empty((n_reads, rl), np.uint8)
    chunk = 1 << 17
    for lo in range(0, n_reads, chunk):
        n = min(chunk, n_reads - lo)
        starts = rng.integers(0, G - rl, n)
        block = genome[starts[:, None] + np.arange(rl)[None, :]]
        errs = rng.random((n, rl)) < err
        block = np.where(
            errs, (block + rng.integers(1, 4, (n, rl))) % 4, block)
        flip = rng.random(n) < 0.5
        rc = (block[:, ::-1] ^ 3).astype(np.uint8)
        mat[lo: lo + n] = np.where(flip[:, None], rc, block)
    lens = np.full(n_reads, rl, np.int32)
    return mat, lens


def chunks_of(mat, lens, rows):
    for lo in range(0, mat.shape[0], rows):
        yield mat[lo: lo + rows], lens[lo: lo + rows]


def table_sig(limbs, counts):
    import hashlib

    import numpy as np

    h = hashlib.sha256()
    h.update(np.ascontiguousarray(limbs).tobytes())
    h.update(np.ascontiguousarray(counts).tobytes())
    return h.hexdigest()[:16]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--parity-mbp", type=float, default=10.0)
    ap.add_argument("--scale-mbp", type=float, default=30.0)
    ap.add_argument("--cov", type=int, default=30)
    ap.add_argument("--err", type=float, default=0.003)
    ap.add_argument("--rl", type=int, default=100)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import numpy as np     # noqa: F401
    import jax
    import jax.numpy as jnp

    from reflexiv_tpu.cli import _enable_compilation_cache
    _enable_compilation_cache()
    t0 = time.time()
    _ = int(jnp.arange(8).sum())
    RESULTS["platform"] = jax.devices()[0].platform
    RESULTS["session_wait_s"] = round(time.time() - t0, 1)
    print(json.dumps({"stage": "session_up",
                      **{k: RESULTS[k] for k in RESULTS}}), flush=True)
    save()

    from reflexiv_tpu import count as count_mod

    chunk_rows = (1 << 25) // args.rl

    if not args.skip_parity:
        t0 = time.time()
        mat, lens = gen_reads(args.parity_mbp, args.cov, args.err, args.rl)
        gen_s = time.time() - t0
        legs = {}
        for tag, limit in (("spill_forced", str(1 << 22)), ("no_spill", "")):
            if limit:
                os.environ["REFLEXIV_DEVICE_TABLE_ROWS"] = limit
            else:
                os.environ.pop("REFLEXIV_DEVICE_TABLE_ROWS", None)
            t0 = time.time()
            limbs, counts = count_mod.count_kmers_streaming(
                chunks_of(mat, lens, chunk_rows), k=args.k, min_cov=1,
                max_cov=2_000_000_000)
            legs[tag] = {
                "wall_s": round(time.time() - t0, 1),
                "unique": int(len(counts)),
                "sig": table_sig(limbs, counts),
            }
            print(json.dumps({tag: legs[tag]}), flush=True)
        RESULTS["parity"] = {
            "mbp": args.parity_mbp, "gen_s": round(gen_s, 1),
            "equal": legs["spill_forced"]["sig"] == legs["no_spill"]["sig"],
            **legs,
        }
        save()
        del mat, lens

    # scale leg: default bounded device table (spills as needed)
    os.environ.pop("REFLEXIV_DEVICE_TABLE_ROWS", None)
    t0 = time.time()
    mat, lens = gen_reads(args.scale_mbp, args.cov, args.err, args.rl)
    gen_s = time.time() - t0
    t0 = time.time()
    limbs, counts = count_mod.count_kmers_streaming(
        chunks_of(mat, lens, chunk_rows), k=args.k, min_cov=1,
        max_cov=2_000_000_000)
    wall = time.time() - t0
    n_kmers = int(mat.shape[0]) * (args.rl - args.k + 1)
    RESULTS["scale"] = {
        "mbp": args.scale_mbp, "err": args.err, "cov": args.cov,
        "gen_s": round(gen_s, 1),
        "reads": int(mat.shape[0]),
        "kmers_processed": n_kmers,
        "unique_rows": int(len(counts)),
        "count_wall_s": round(wall, 1),
        "mkmers_per_s": round(n_kmers / wall / 1e6, 1),
        "device_table_rows_limit": count_mod._device_table_rows_limit(2),
        "peak_host_rss_mb": resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss // 1024,
        "singleton_rows": int((counts == 1).sum()),
    }
    save()
    print(json.dumps(RESULTS["scale"]), flush=True)


if __name__ == "__main__":
    main()
