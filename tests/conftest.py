"""Test config: run all tests on a simulated 8-device CPU mesh.

The driver benches on a real TPU chip; tests validate semantics + sharding on
CPU (the JAX-native substitute for multi-node testing — see SURVEY.md §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
