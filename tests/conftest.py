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

import resource  # noqa: E402

# XLA:CPU compiles recurse deeply (LLVM) on the big scanned codec/LM programs;
# with the image's 8 MB default stack, full-suite runs have segfaulted inside
# backend_compile_and_load once hundreds of programs were live (worker-thread
# compiles in the server tests). Raise the soft limit before JAX starts so the
# main thread can grow and pthread stacks inherit the larger size.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and (_soft < 64 << 20):
    try:
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (64 << 20 if _hard == resource.RLIM_INFINITY
             else min(64 << 20, _hard), _hard))
    except (ValueError, OSError):
        pass

import jax  # noqa: E402  (config override must land before first backend use)
jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

# Smoke tier (VERDICT r3 #7): tests listed in slow_tests.txt get
# pytest.mark.slow so `pytest -m "not slow"` is a <10-min iteration loop.
# The manifest is generated from a full --durations=0 run (call time >=10s);
# regenerate with:
#   grep -E "^[0-9.]+s call" <log> | sort -rn | awk '$1+0>=10 {print $3}' \
#     | sed 's|^tests/||' | sort > tests/slow_tests.txt
# The full suite (no -m filter) stays the CI tier.
# A missing manifest (mid-regeneration, fresh checkout) degrades to "nothing
# marked slow" rather than aborting collection for the full CI tier too.
_slow_manifest = pathlib.Path(__file__).with_name("slow_tests.txt")
_SLOW_IDS = frozenset(
    line.strip() for line in (_slow_manifest.read_text().splitlines()
                              if _slow_manifest.exists() else ())
    if line.strip() and not line.startswith("#"))


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("tests/", "", 1)
        if nodeid in _SLOW_IDS or nodeid.split("[")[0] in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The suite compiles hundreds of distinct programs; keeping them all live
    in one process is what pushed the full run into the XLA-compile segfault
    (test modules pass standalone). Cross-module jit reuse is near zero —
    each module builds its own tiny models — and measured smoke-tier runs
    are FASTER with the clearing than without (22:42 vs ~15 min on the same
    manifest: accumulated in-process compiler state slows every later XLA
    compile more than the lost cache hits cost), so it stays on for every
    tier.
    """
    yield
    jax.clear_caches()
