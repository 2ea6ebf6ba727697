"""End-to-end example assembly on the TPU: cold + warm wall-clock.

Runs `assemble_reads` twice in one session (the persistent compile cache is
enabled for TPU), verifies golden parity both times, and appends the warm
number to BENCH_TPU_evidence.json. Single-session discipline applies.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import numpy as np  # noqa: F401

    import jax

    cache = os.environ.get(
        "REFLEXIV_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "reflexiv_tpu"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    t0 = time.time()
    import jax.numpy as jnp

    _ = int(jnp.arange(8).sum())
    dev = jax.devices()[0]
    log(stage="session_up", wait_s=round(time.time() - t0, 1),
        platform=dev.platform)
    if dev.platform != "tpu":
        log(stage="abort", reason="not tpu")
        return

    from reflexiv_tpu import Params
    from reflexiv_tpu.assembler import assemble_reads
    from reflexiv_tpu.contigs import canonical_set
    from reflexiv_tpu.io import load_reads

    mat, lens = load_reads("/root/reference/example/paired_dat*.fq.gz")
    walls = []
    for label in ("cold", "warm"):
        t0 = time.time()
        contigs = assemble_reads(
            mat, lens, Params(k=31, min_kmer_coverage=3), seed=0)
        wall = time.time() - t0
        canon = canonical_set(contigs)
        golden = len(canon) == 1 and sorted(len(c) for c in canon) == [4558]
        walls.append(wall)
        log(stage="assembly", which=label, wall_s=round(wall, 1),
            golden=golden)
        if not golden:
            return

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TPU_evidence.json")
    ev = {}
    if os.path.exists(path):
        with open(path) as fh:
            ev = json.load(fh)
    ev.setdefault("extra", {})["assembly_tpu_cold_s"] = round(walls[0], 1)
    ev["extra"]["assembly_tpu_warm_s"] = round(walls[1], 1)
    ev["extra"]["assembly_golden"] = True
    with open(path, "w") as fh:
        json.dump(ev, fh)
    log(stage="saved", cold=round(walls[0], 1), warm=round(walls[1], 1))


if __name__ == "__main__":
    main()
