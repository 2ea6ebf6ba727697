"""Multi-host sharded counting launcher.

The mesh code in :mod:`reflexiv_tpu.parallel` is host-count agnostic: once
``jax.distributed.initialize`` has run on every process, ``jax.devices()``
spans all hosts and the same ``Mesh``/``shard_map`` program scales from one
chip to a pod slice (collectives ride ICI within a slice, DCN across).

Per-host usage (run on every host of the slice):

    python scripts/multihost_count.py \
        --coordinator <host0-addr:port> --num-hosts N --host-id I \
        --fastq 'reads*.fq.gz' --k 31 --min-cov 2

Single-host smoke test over an 8-device virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/multihost_count.py --fastq '...'

Scaling efficiency (BASELINE.md's >=80% target) is measured by the reported
Mkmers/s at 1 chip vs 1 host vs N hosts on the same input.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host0 address:port for jax.distributed")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--fastq", required=True)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--min-cov", type=int, default=2)
    args = ap.parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )

    import jax.numpy as jnp
    import numpy as np

    from reflexiv_tpu import parallel
    from reflexiv_tpu.io import load_reads

    mesh = parallel.make_mesh()
    n = mesh.devices.size
    print(f"mesh: {n} devices over {jax.process_count()} host(s)", flush=True)

    mat, lens = load_reads(args.fastq)
    R = mat.shape[0]
    R_pad = ((R + n - 1) // n) * n
    bases = jnp.zeros((R_pad, mat.shape[1]), jnp.uint8).at[:R].set(
        jnp.asarray(mat))
    lengths = jnp.zeros((R_pad,), jnp.int32).at[:R].set(jnp.asarray(lens))
    n_kmers = int(np.sum(np.maximum(lens - args.k + 1, 0)))

    def run():
        out = parallel.count_kmers_sharded(
            bases, lengths, k=args.k, min_cov=args.min_cov, mesh=mesh)
        np.asarray(out[1].ravel()[:8])  # force completion
        return out

    run()  # warmup/compile
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        out = run()
    dt = (time.time() - t0) / iters
    total = int(jnp.sum(out[2]))
    print(
        f"counting: {n_kmers/dt/1e6:.1f} Mkmers/s over {n} devices "
        f"({dt*1e3:.0f} ms/pass, {total} distinct k-mers)", flush=True,
    )


if __name__ == "__main__":
    main()
