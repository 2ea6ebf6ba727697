"""Collective-path scaling characterization on the virtual CPU mesh.

Runs the sharded counting pass at 1/2/4/8 virtual devices over a fixed
input and reports per-pass wall times. CPU-mesh numbers do NOT measure ICI
bandwidth (all "devices" share one host), but they do expose the
collective-path overhead structure (all_to_all + per-shard sort vs one
global sort) and prove the code path at each mesh size. Run separately per
device count (XLA fixes the host device count at process start):

    for n in 1 2 4 8; do python scripts/mesh_scaling_probe.py $n; done
"""
import json
import os
import sys
import time

n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_dev}"
).strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from reflexiv_tpu.io import load_reads
    from reflexiv_tpu.parallel import count_kmers_sharded, make_mesh

    mat, lens = load_reads("/root/reference/example/paired_dat*.fq.gz")
    tile = 16
    bases = np.tile(mat, (tile, 1))
    lengths = np.tile(lens, tile)
    R = bases.shape[0]
    R_pad = ((R + n_dev - 1) // n_dev) * n_dev
    bp = jnp.zeros((R_pad, bases.shape[1]), jnp.uint8).at[:R].set(
        jnp.asarray(bases))
    lp = jnp.zeros((R_pad,), jnp.int32).at[:R].set(jnp.asarray(lengths))
    mesh = make_mesh(jax.devices())
    k = 31

    def run():
        limbs, counts, keep, ovf = count_kmers_sharded(
            bp, lp, k=k, min_cov=3, max_cov=10_000_000, mesh=mesh)
        np.asarray(keep[:8])
        return int(np.asarray(ovf).sum())

    assert run() == 0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    nk = R * (bases.shape[1] - k + 1)
    print(json.dumps({
        "devices": n_dev, "pass_s": round(dt, 3),
        "mkmers_per_s": round(nk / dt / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
