"""Profiling/metrics/sanitizer utilities."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_ttsd_tpu.utils.profiling import Metrics, assert_finite, metrics, sanitize, trace


def test_metrics_counters_and_timers():
    m = Metrics()
    m.add("x", 2)
    m.add("x", 3)
    with m.timer("phase"):
        pass
    snap = m.snapshot()
    assert snap["x"] == 5
    assert snap["phase_calls"] == 1
    assert snap["phase_s"] >= 0
    m.reset()
    assert m.snapshot() == {}


def test_global_metrics_updated_by_pipeline_helpers():
    metrics.reset()
    metrics.add("generated_steps", 7)
    assert metrics.get("generated_steps") == 7


def test_sanitize_removes_nan_inf():
    x = jnp.asarray([1.0, np.nan, np.inf, -np.inf])
    y = np.asarray(sanitize(x))
    assert np.isfinite(y).all()
    assert y[0] == 1.0


def test_assert_finite_raises_under_jit():
    @jax.jit
    def f(x):
        return assert_finite(x, "x") * 2

    np.testing.assert_allclose(np.asarray(f(jnp.ones(4))), 2.0)
    # the runtime wraps the callback's FloatingPointError
    with pytest.raises(Exception, match="non-finite values in x"):
        f(jnp.asarray([1.0, np.nan]))
        jax.effects_barrier()


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    import os
    found = [f for _, _, fs in os.walk(d) for f in fs]
    assert found, "profiler trace produced no files"


def test_initialize_multihost_noop_without_env(monkeypatch):
    from moss_ttsd_tpu.parallel.distributed import initialize_multihost
    for k in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_multihost() is False


def test_serving_memory_estimate():
    from moss_ttsd_tpu.core.config import LMConfig
    from moss_ttsd_tpu.utils.memory import lm_param_count, serving_memory

    cfg = LMConfig()                      # full MOSS-TTSD-v0.5 geometry
    n = lm_param_count(cfg)
    assert 1.5e9 < n < 2.5e9              # ~1.7B-class

    bf16 = serving_memory(cfg, batch=1, max_audio_seconds=600)
    int8 = serving_memory(cfg, batch=1, max_audio_seconds=600, quant="int8")
    # reference README.md:156-161 reports 6.91 GB at 600 s batch-1 bf16;
    # the static-cache engine must be in the same class and int8 well below
    assert bf16.total_gb < 7.0
    assert int8.total_gb < bf16.total_gb - 1.0
    # cache grows linearly with audio length
    short = serving_memory(cfg, batch=1, max_audio_seconds=120)
    assert bf16.kv_cache_gb > short.kv_cache_gb * 4


def test_lm_param_count_matches_init():
    import jax
    import jax.numpy as jnp
    from moss_ttsd_tpu.core.config import LMConfig
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.utils.memory import lm_param_count

    cfg = LMConfig(dtype="float32", param_dtype="float32").tiny()
    params = jax.eval_shape(
        lambda k: AsteroidLM(cfg).init(k, jnp.zeros((1, 4, cfg.channels),
                                                    jnp.int32)),
        jax.random.PRNGKey(0))
    actual = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert lm_param_count(cfg) == actual


def test_metrics_observe_percentiles():
    from moss_ttsd_tpu.utils.profiling import Metrics
    m = Metrics()
    for v in [1.0, 2.0, 3.0, 4.0, 100.0]:
        m.observe("lat", v)
    snap = m.snapshot()
    assert snap["lat_observed"] == 5
    assert snap["lat_p50"] == 3.0
    assert snap["lat_p95"] == 100.0
    m.reset()
    assert "lat_p50" not in m.snapshot()


def test_metrics_observe_window_bound():
    from moss_ttsd_tpu.utils.profiling import Metrics
    m = Metrics()
    for v in range(2000):
        m.observe("x", float(v), window=100)
    snap = m.snapshot()
    assert snap["x_observed"] == 2000
    assert snap["x_p50"] >= 1900          # only the last 100 remain
