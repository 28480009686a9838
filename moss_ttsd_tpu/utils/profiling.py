"""Profiling, metrics, and numerical sanitizing.

The reference has no tracing/profiling story beyond ad-hoc prints (SURVEY §5;
reference generation_utils.py:410-414) and a NaN clamp buried in the codec
transformer (reference modules.py:201-204). This module makes all three
first-class:

  * ``trace(...)`` / ``start_profiler_server(...)`` — jax.profiler capture of
    device timelines (view in TensorBoard or Perfetto);
  * ``Metrics`` — a tiny process-wide registry of counters/timers the
    pipeline phases report into (tokenize/prefill/decode/vocode);
  * ``sanitize`` / ``assert_finite`` — NaN/Inf detection that works under
    jit (debug callback) for chasing numeric issues in bf16 runs.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# jax.profiler integration
# ---------------------------------------------------------------------------

def start_profiler_server(port: int = 9999) -> None:
    """Expose the live profiler endpoint (connect from TensorBoard's profile
    plugin or `jax.profiler.trace` a remote capture)."""
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer: bool = True) -> Iterator[None]:
    """Capture a device+host trace for the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator/context: label a region in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


# ---------------------------------------------------------------------------
# Metrics registry
# ---------------------------------------------------------------------------

class Metrics:
    """Thread-safe counters + cumulative timers.

    One process-wide default instance (``metrics``); pipelines report phase
    walltimes and token counts here so serving code can export them.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = {}
        self._windows: Dict[str, "deque"] = {}

    def add(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def observe(self, name: str, value: float, window: int = 1024) -> None:
        """Record one sample into a bounded sliding window; snapshot()
        exports {name}_p50/_p95 over the window plus a cumulative
        {name}_observed count (request-latency style observability)."""
        from collections import deque
        with self._lock:
            w = self._windows.get(name)
            if w is None:
                w = self._windows[name] = deque(maxlen=window)
            w.append(float(value))
            self._counters[name + "_observed"] = \
                self._counters.get(name + "_observed", 0.0) + 1

    def set(self, name: str, value: float) -> None:
        with self._lock:
            self._counters[name] = value

    def get(self, name: str) -> float:
        with self._lock:
            return self._counters.get(name, 0.0)

    @contextlib.contextmanager
    def timer(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name + "_s", time.perf_counter() - t0)
            self.add(name + "_calls", 1)

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            out = dict(self._counters)
            for name, w in self._windows.items():
                if w:
                    v = sorted(w)
                    out[name + "_p50"] = v[len(v) // 2]
                    out[name + "_p95"] = v[min(len(v) - 1,
                                               int(len(v) * 0.95))]
            return out

    def dump_json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._windows.clear()


metrics = Metrics()


# ---------------------------------------------------------------------------
# NaN/Inf sanitizer
# ---------------------------------------------------------------------------

def sanitize(x: jnp.ndarray, clamp: Optional[float] = None) -> jnp.ndarray:
    """Replace NaN with 0 and clamp magnitude (the reference clamps bf16/fp16
    activations to the dtype max inside its transformer, modules.py:201-204).
    Jit-safe, pure."""
    x = jnp.nan_to_num(x)
    if clamp is None:
        clamp = float(jnp.finfo(x.dtype).max) * 0.9 if jnp.issubdtype(
            x.dtype, jnp.floating) else None
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x


def assert_finite(x: jnp.ndarray, name: str = "tensor") -> jnp.ndarray:
    """Under jit: raise (via debug callback) if x has NaN/Inf. Returns x so
    it composes inline: ``h = assert_finite(h, "hidden")``."""
    ok = jnp.all(jnp.isfinite(x))

    def _check(ok_val, name=name):
        if not bool(ok_val):
            raise FloatingPointError(f"non-finite values in {name}")

    jax.debug.callback(_check, ok)
    return x
