"""One-shot TPU probe for the Pallas extraction kernel.

Connects to the (single-session, fragile) remote-TPU tunnel, validates the
Pallas canonical-extraction kernel against the XLA path on a small block,
then times both on a bench-sized block. Writes JSON progress lines so the
caller can watch without touching the session. NEVER run two of these at
once (see .claude/skills/verify/SKILL.md tunnel discipline).
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    _ = int(jnp.arange(8).sum())
    dev = jax.devices()[0]
    log(stage="session_up", wait_s=round(time.time() - t0, 1),
        platform=dev.platform, device=str(dev))
    if dev.platform != "tpu":
        log(stage="abort", reason="not a tpu")
        return

    from reflexiv_tpu import count as count_mod
    from reflexiv_tpu import pallas_kernels

    rng = np.random.default_rng(0)
    R, L, k = 1024, 100, 31
    bases = rng.integers(0, 4, (R, L), dtype=np.uint8)
    lengths = np.full(R, L, np.int32)

    # XLA reference
    t0 = time.time()
    limbs_x, valid_x = jax.jit(
        count_mod.extract_canonical_kmers, static_argnames=("k",)
    )(jnp.asarray(bases), jnp.asarray(lengths), k=k)
    got = np.asarray(limbs_x[:8])  # force completion (block_until_ready no-op)
    log(stage="xla_ok", s=round(time.time() - t0, 1))

    # Pallas kernel
    t0 = time.time()
    try:
        limbs_p, valid_p = pallas_kernels.extract_canonical_kmers_pallas(
            jnp.asarray(bases), jnp.asarray(lengths), k=k)
        got_p = np.asarray(limbs_p[:8])
        log(stage="pallas_compiled", s=round(time.time() - t0, 1))
    except Exception:
        log(stage="pallas_error", s=round(time.time() - t0, 1),
            tb=traceback.format_exc()[-3000:])
        return

    # parity: same multiset of (hi, lo) among valid windows
    lx = np.asarray(limbs_x)[np.asarray(valid_x)]
    lp = np.asarray(limbs_p)[np.asarray(valid_p)]
    sx = lx[np.lexsort(lx.T)]
    sp = lp[np.lexsort(lp.T)]
    same = sx.shape == sp.shape and bool((sx == sp).all())
    log(stage="parity", equal=same, n_xla=len(sx), n_pallas=len(sp))
    if not same:
        return

    # timing on a bench-sized block
    Rb, Lb = 100_000, 100
    bb = jnp.asarray(rng.integers(0, 4, (Rb, Lb), dtype=np.uint8))
    lb = jnp.full((Rb,), Lb, jnp.int32)
    fx = jax.jit(count_mod.extract_canonical_kmers, static_argnames=("k",))
    for name, fn in (
        ("xla", lambda: fx(bb, lb, k=k)),
        ("pallas", lambda: pallas_kernels.extract_canonical_kmers_pallas(
            bb, lb, k=k)),
    ):
        out = fn()
        _ = np.asarray(out[0][:8])      # compile + warm
        t0 = time.time()
        reps = 5
        for _i in range(reps):
            out = fn()
        _ = np.asarray(out[0][:8])
        dt = (time.time() - t0) / reps
        nk = Rb * (Lb - k + 1)
        log(stage="timing", path=name, ms=round(dt * 1e3, 2),
            mkmers_per_s=round(nk / dt / 1e6, 1))


if __name__ == "__main__":
    main()
