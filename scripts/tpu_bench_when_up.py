"""Opportunistic TPU bench: block until the (flaky) remote-TPU tunnel gives
this process a session, then run the standard counting benchmark in the SAME
session and save results.

Run under an external timeout (the first jnp call blocks for as long as the
tunnel is wedged; this process cannot recover a dead tunnel from inside —
that is the caller's job).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = int(jnp.arange(8).sum())  # blocks until the session is live
    print(f"session up after {time.time()-t0:.0f}s, sum={x}", flush=True)

    from bench import bench_counting

    result = bench_counting()
    result["ts"] = time.time()
    print(json.dumps(result), flush=True)
    with open("/tmp/tpu_bench_result.json", "w") as fh:
        json.dump(result, fh)


if __name__ == "__main__":
    main()
