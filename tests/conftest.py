"""Test config: run all tests on a simulated 8-device CPU mesh.

The driver benches on a real TPU chip; tests validate semantics + sharding on
CPU (the JAX-native substitute for multi-node testing — see SURVEY.md §4).
NOTE: the environment pins JAX_PLATFORMS=axon via sitecustomize, so these must
be hard overrides, not setdefault.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (config override must land before first backend use)
jax.config.update("jax_platforms", "cpu")
