"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the way Spark local mode stood in for a cluster in the
reference, SURVEY.md section 4).

This container's sitecustomize registers a remote-TPU ("axon") JAX backend in
every interpreter and pins ``jax_platforms="axon,cpu"`` — tiny test kernels
would each pay a remote compile. Flip the config back to CPU *before* any
backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
