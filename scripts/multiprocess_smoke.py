"""Two-process ``jax.distributed`` CPU smoke: the multi-host stand-in.

The reference exercises multi-node behavior with Spark local mode
(SURVEY.md section 4); our analog is two REAL OS processes, each a separate
JAX process with 4 virtual CPU devices, joined through a localhost
coordinator into one 8-device global mesh. The children then run

  (a) sharded canonical k-mer counting (``parallel.count_kmers_sharded``) and
  (b) one sharded mixed-k extension round
      (``parallel.pdyn_extension_round_sharded``)

over GLOBAL arrays assembled from process-local shards
(``jax.make_array_from_process_local_data``) — i.e. every ``all_to_all``
actually crosses a process boundary — and validate both against local
single-device oracles.

Usage:
    python scripts/multiprocess_smoke.py            # parent: spawns 2 children
    python scripts/multiprocess_smoke.py --child I --coordinator HOST:PORT
"""
from __future__ import annotations

import argparse
import os
import random
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROCS = 2
DEVS_PER_PROC = 4
K = 31
MIN_COV = 2


def _revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def _synthetic_reads(n_reads: int = 64, read_len: int = 100, seed: int = 99):
    rng = random.Random(seed)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    reads = []
    for _ in range(n_reads):
        s = rng.randrange(len(genome) - read_len + 1)
        r = genome[s:s + read_len]
        reads.append(_revcomp(r) if rng.random() < 0.5 else r)
    return genome, reads


def _oracle_counts(reads, k: int, min_cov: int):
    """Scalar canonical counting oracle (strings + dict)."""
    table: dict = {}
    for r in reads:
        for i in range(len(r) - k + 1):
            w = r[i:i + k]
            c = min(w, _revcomp(w))
            table[c] = table.get(c, 0) + 1
    kept = {w: c for w, c in table.items() if c >= min_cov}
    return len(kept), sum(kept.values())


def child(process_id: int, coordinator: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — newer jax may default correctly
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=N_PROCS,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from reflexiv_tpu import parallel
    from reflexiv_tpu.io import reads_to_matrix

    assert jax.process_count() == N_PROCS
    n_global = len(jax.devices())
    assert n_global == N_PROCS * DEVS_PER_PROC, jax.devices()
    mesh = parallel.make_mesh()
    shard = NamedSharding(mesh, P("shards"))
    shard2 = NamedSharding(mesh, P("shards", None))

    # ---- (a) sharded counting across the process boundary ----
    _genome, reads = _synthetic_reads()
    mat, lens = reads_to_matrix([r.encode() for r in reads])
    R = mat.shape[0]
    R_pad = ((R + n_global - 1) // n_global) * n_global
    mat_p = np.zeros((R_pad, mat.shape[1]), np.uint8)
    mat_p[:R] = mat
    lens_p = np.zeros(R_pad, np.int32)
    lens_p[:R] = lens
    lo = process_id * R_pad // N_PROCS
    hi = (process_id + 1) * R_pad // N_PROCS
    gbases = jax.make_array_from_process_local_data(shard2, mat_p[lo:hi])
    glens = jax.make_array_from_process_local_data(shard, lens_p[lo:hi])

    limbs, counts, keep, ovf = parallel.count_kmers_sharded(
        gbases, glens, k=K, min_cov=MIN_COV, mesh=mesh)
    assert int(jnp.sum(ovf)) == 0, "bucket overflow"
    distinct = int(jnp.sum(keep))
    total = int(jnp.sum(jnp.where(keep, counts, 0)))
    want_distinct, want_total = _oracle_counts(reads, K, MIN_COV)
    assert distinct == want_distinct, (distinct, want_distinct)
    assert total == want_total, (total, want_total)

    # ---- (b) one sharded mixed-k extension round across processes ----
    from reflexiv_tpu import packed_dyn as pd
    from reflexiv_tpu.bitpack import encode_ascii
    from reflexiv_tpu.dynamic import _dyn_pool_from_rows

    frag = _genome[:200]
    rows = []
    for i in range(0, len(frag) - K + 1, 1):
        w = frag[i:i + K]
        for t in (w, _revcomp(w)):
            rows.append((
                encode_ascii(np.frombuffer(t.encode(), np.uint8)),
                K - 1, -1, -1,
            ))
    pool = _dyn_pool_from_rows(rows)
    p = pd.from_dyn(pool)
    cap = ((p.capacity + n_global - 1) // n_global) * n_global

    def pad_rows(a, rows_):
        out = np.zeros((rows_,) + a.shape[1:], np.asarray(a).dtype)
        out[: a.shape[0]] = np.asarray(a)
        return out

    host = {f: pad_rows(getattr(p, f), cap)
            for f in ("seq", "length", "subk", "left", "right", "live")}

    # single-device oracle for the same round (local compute, no mesh)
    p_local = pd.PackedDynRecords(
        *(jnp.asarray(host[f])
          for f in ("seq", "length", "subk", "left", "right", "live")))
    max_sub = K - 1
    _out, live_want, _need = pd.pdyn_extension_round_fused(
        p_local, jnp.uint32(1), kmin=K, max_sub=max_sub)
    live_want = int(live_want)

    def to_global(a):
        s = shard2 if a.ndim == 2 else shard
        lo_ = process_id * cap // N_PROCS
        hi_ = (process_id + 1) * cap // N_PROCS
        return jax.make_array_from_process_local_data(s, a[lo_:hi_])

    gp = pd.PackedDynRecords(
        *(to_global(host[f])
          for f in ("seq", "length", "subk", "left", "right", "live")))
    gout, govf = parallel.pdyn_extension_round_sharded(
        gp, jnp.uint32(1), kmin=K, max_sub=max_sub, mesh=mesh, cap_factor=4)
    assert int(jnp.sum(govf)) == 0, "extension bucket overflow"
    live_got = int(jnp.sum(gout.live))
    assert live_got == live_want, (live_got, live_want)
    assert live_got < len(rows)  # the round actually merged pairs

    print(f"proc {process_id}: OK — counting distinct={distinct} "
          f"total={total}; round live {len(rows)} -> {live_got} "
          f"over {n_global} devices / {N_PROCS} processes", flush=True)


def parent() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={DEVS_PER_PROC}",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(i), "--coordinator", coordinator],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(N_PROCS)
    ]
    rc = 0
    for i, pr in enumerate(procs):
        try:
            out, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
            rc = 1
        sys.stdout.write(out)
        rc |= pr.returncode if pr.returncode is not None else 1
    print("multiprocess smoke:", "OK" if rc == 0 else "FAILED")
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    args = ap.parse_args()
    if args.child is None:
        return parent()
    child(args.child, args.coordinator)
    return 0


if __name__ == "__main__":
    sys.exit(main())
