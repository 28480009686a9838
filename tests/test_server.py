"""OpenAI-compatible speech server: end-to-end over real HTTP against the
tiny pipeline, including micro-batching of concurrent requests and the
reference client (serve.api_client) pointed at the local server."""
import base64
import json
import threading
import urllib.request

import numpy as np
import pytest

from moss_ttsd_tpu.serve.api_client import SpeechAPIClient, wav_bytes_to_array
from moss_ttsd_tpu.serve.server import SpeechServer, wav_array_to_bytes


@pytest.fixture(scope="module")
def server():
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    pipe = build_tiny_pipeline()
    srv = SpeechServer(pipe, host="127.0.0.1", port=0, max_batch=4,
                       batch_window_s=0.2)
    srv.start()
    yield srv
    srv.stop()


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=300)


def test_health_and_metrics(server):
    base = f"http://127.0.0.1:{server.port}"
    assert urllib.request.urlopen(f"{base}/health").read() == b"ok"
    m = json.loads(urllib.request.urlopen(f"{base}/v1/metrics").read())
    assert isinstance(m, dict)


def test_speech_endpoint_returns_wav(server):
    base = f"http://127.0.0.1:{server.port}"
    r = _post(f"{base}/v1/audio/speech",
              {"input": "[S1]hi[S2]hello", "max_tokens": 8, "seed": 1})
    assert r.headers["Content-Type"] == "audio/wav"
    wav, sr = wav_bytes_to_array(r.read())
    assert sr == 24000 or sr > 0
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_speech_endpoint_with_reference(server):
    base = f"http://127.0.0.1:{server.port}"
    ref = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32) * 0.4
    ref_b64 = base64.b64encode(wav_array_to_bytes(ref, 16000)).decode()
    r = _post(f"{base}/v1/audio/speech",
              {"input": "[S1]one[S2]two", "max_tokens": 8,
               "references": [{"audio": ref_b64, "text": "[S1]ref"}]})
    wav, _ = wav_bytes_to_array(r.read())
    assert len(wav) > 0


def test_concurrent_requests_are_microbatched(server):
    from moss_ttsd_tpu.utils.profiling import metrics
    base = f"http://127.0.0.1:{server.port}"
    metrics.reset()
    results = [None] * 4

    def work(i):
        r = _post(f"{base}/v1/audio/speech",
                  {"input": f"[S1]item {i}[S2]ok", "max_tokens": 8, "seed": 0})
        results[i] = r.read()

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r and len(r) > 44 for r in results)
    snap = metrics.snapshot()
    # 4 concurrent requests must have shared batches (fewer batches than reqs)
    assert snap.get("server_batched_requests", 0) >= 4
    assert snap.get("server_batches", 0) < 4


def test_reference_client_against_local_server(server):
    base = f"http://127.0.0.1:{server.port}/v1"
    client = SpeechAPIClient(base, model="tiny", max_retries=1)
    wav_bytes = client.generate_speech("[S1]hello[S2]world",
                                       extra={"max_tokens": 8})
    wav, _ = wav_bytes_to_array(wav_bytes)
    assert len(wav) > 0


def test_bad_request_is_4xx(server):
    base = f"http://127.0.0.1:{server.port}"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/v1/audio/speech", {"not_input": 1})
    assert e.value.code == 400


@pytest.fixture(scope="module")
def continuous_server():
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    pipe = build_tiny_pipeline()
    srv = SpeechServer(pipe, host="127.0.0.1", port=0, max_batch=2,
                       scheduler="continuous", pool_base=192,
                       pool_max_steps=32, segment_steps=4)
    srv.start()
    yield srv
    srv.stop()


def test_continuous_scheduler_serves_requests(continuous_server):
    """Continuous pool: concurrent requests with different budgets each get
    a valid wav; a short request is not held hostage by a longer one."""
    from moss_ttsd_tpu.utils.profiling import metrics
    base = f"http://127.0.0.1:{continuous_server.port}"
    metrics.reset()
    results = [None] * 3

    def work(i, max_tokens):
        r = _post(f"{base}/v1/audio/speech",
                  {"input": f"[S1]req {i}[S2]ok", "max_tokens": max_tokens})
        results[i] = r.read()

    threads = [threading.Thread(target=work, args=(i, mt))
               for i, mt in enumerate([10, 24, 16])]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for body in results:
        wav, _ = wav_bytes_to_array(body)
        assert len(wav) > 0 and np.isfinite(wav).all()
    snap = metrics.snapshot()
    assert snap.get("server_continuous_joins", 0) >= 3


def test_continuous_scheduler_routes_oversized_prompt(continuous_server):
    """A prompt over the pool bucket is no longer a client error — it rides
    the static-engine fallback inside the same server (VERDICT r3 #3: the
    pool's slot geometry is a throughput choice, not the product's cap)."""
    from moss_ttsd_tpu.utils.profiling import metrics
    base = f"http://127.0.0.1:{continuous_server.port}"
    before = metrics.snapshot().get("server_routed_overflow", 0)
    r = _post(f"{base}/v1/audio/speech",
              {"input": "[S1]" + "long words here " * 40 + "[S2]ok",
               "max_tokens": 16})
    wav, _ = wav_bytes_to_array(r.read())
    assert len(wav) > 0 and np.isfinite(wav).all()
    assert metrics.snapshot().get("server_routed_overflow", 0) == before + 1


def test_continuous_scheduler_routes_over_budget_request(continuous_server):
    """max_tokens beyond the pool's per-slot step budget (pool_max_steps=32
    here; default 2048 ~ 2.7 min of audio) routes to the fallback worker and
    succeeds — the reference surface accepts 16384 (use_api.py:184)."""
    from moss_ttsd_tpu.utils.profiling import metrics
    base = f"http://127.0.0.1:{continuous_server.port}"
    before = metrics.snapshot().get("server_routed_overflow", 0)
    r = _post(f"{base}/v1/audio/speech",
              {"input": "[S1]long request[S2]ok", "max_tokens": 48})
    wav, _ = wav_bytes_to_array(r.read())
    assert len(wav) > 0 and np.isfinite(wav).all()
    assert metrics.snapshot().get("server_routed_overflow", 0) == before + 1
    # the fallback worker reports on its OWN gauge so it never clobbers the
    # pool's server_queue_depth on the shared registry
    assert "server_overflow_queue_depth" in metrics.snapshot()
    assert continuous_server.worker._overflow.queue_gauge == \
        "server_overflow_queue_depth"


def test_overflow_busy_rejection_not_counted_as_routed(continuous_server):
    """server_routed_overflow counts only requests actually admitted to the
    fallback — a ServerBusy rejection must not inflate the sizing metric."""
    from moss_ttsd_tpu.serve.server import ServerBusy, _Request
    from moss_ttsd_tpu.utils.profiling import metrics
    worker = continuous_server.worker
    saved = worker._overflow

    class _Busy:
        queue_gauge = "server_overflow_queue_depth"

        def submit(self, req):
            raise ServerBusy("queue full (0 waiting)")

        def shutdown(self):
            pass

    worker._overflow = _Busy()
    try:
        before = metrics.snapshot().get("server_routed_overflow", 0)
        req = _Request({"text": "[S1]hi[S2]ok"}, max_new_tokens=999,
                       seed=0, use_normalize=False)
        with pytest.raises(ServerBusy):
            worker._route_overflow(req)
        assert metrics.snapshot().get("server_routed_overflow", 0) == before
    finally:
        worker._overflow = saved


def test_route_overflow_rejects_after_shutdown_flag(continuous_server):
    """shutdown() closes the lazy-creation window under _overflow_lock; a
    route racing with it must shed (ServerBusy) instead of spawning a
    BatchingWorker that would never be joined."""
    from moss_ttsd_tpu.serve.server import ServerBusy, _Request
    worker = continuous_server.worker
    saved_worker, saved_flag = worker._overflow, worker._overflow_closed
    worker._overflow, worker._overflow_closed = None, True
    try:
        req = _Request({"text": "[S1]hi[S2]ok"}, max_new_tokens=999,
                       seed=0, use_normalize=False)
        with pytest.raises(ServerBusy):
            worker._route_overflow(req)
        assert worker._overflow is None     # no orphan worker created
    finally:
        worker._overflow, worker._overflow_closed = saved_worker, saved_flag


def test_submit_after_shutdown_sheds(server):
    """The other half of the overflow shutdown race: a request that reached
    a worker whose shutdown() already ran must shed with ServerBusy, not sit
    in a dead queue until the HTTP request timeout."""
    from moss_ttsd_tpu.serve.server import (BatchingWorker, ServerBusy,
                                            _Request)
    worker = BatchingWorker(pipeline=None, max_batch=2, max_queue=4)
    worker.shutdown()
    req = _Request({"text": "[S1]hi[S2]ok"}, max_new_tokens=4,
                   seed=0, use_normalize=False)
    with pytest.raises(ServerBusy, match="shutting down"):
        worker.submit(req)
    assert not worker._queue


def test_continuous_stream_over_budget_is_400(continuous_server):
    """Streams cannot ride the batched fallback: over-capacity stream
    requests get an actionable 400 instead of silently degrading."""
    import urllib.error
    base = f"http://127.0.0.1:{continuous_server.port}"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/v1/audio/speech",
              {"input": "[S1]hi[S2]ok", "max_tokens": 48, "stream": True})
    assert e.value.code == 400


def test_streaming_endpoint_emits_pcm_chunks(server):
    """stream=true returns raw PCM16 over a close-delimited response; the
    concatenated stream is real audio, delivered across multiple reads."""
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
    conn.request("POST", "/v1/audio/speech",
                 json.dumps({"input": "[S1]streaming hello[S2]indeed",
                             "stream": True, "max_tokens": 24, "seed": 3}),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200
    assert r.headers["Content-Type"].startswith("audio/L16")
    assert "rate=" in r.headers["Content-Type"]
    chunks = []
    while True:
        b = r.read(8192)
        if not b:
            break
        chunks.append(b)
    conn.close()
    pcm = b"".join(chunks)
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    wav = np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0
    assert wav.size > 500 and np.isfinite(wav).all()


def test_streaming_client_helper(server):
    """SpeechAPIClient.stream_speech yields float chunks with the rate."""
    base = f"http://127.0.0.1:{server.port}/v1"
    client = SpeechAPIClient(base, model="tiny", max_retries=1)
    got = list(client.stream_speech("[S1]chunk me[S2]ok",
                                    extra={"max_tokens": 16, "seed": 2}))
    assert got, "no chunks streamed"
    total = np.concatenate([c for c, _ in got])
    assert total.size > 0 and np.isfinite(total).all()
    assert all(sr == got[0][1] and sr > 0 for _, sr in got)


def test_streaming_rejects_wav_format(server):
    base = f"http://127.0.0.1:{server.port}"
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/v1/audio/speech",
              {"input": "[S1]x", "stream": True, "response_format": "wav"})
    assert ei.value.code == 400


@pytest.fixture(scope="module")
def lora_server():
    """Continuous server with one registered LoRA voice."""
    import jax
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from moss_ttsd_tpu.train.lora import init_lora
    pipe = build_tiny_pipeline()
    lora = init_lora(pipe.engine.params, jax.random.PRNGKey(3), rank=2)
    assert lora, "tiny engine params produced no LoRA targets"
    srv = SpeechServer(pipe, host="127.0.0.1", port=0, max_batch=2,
                       scheduler="continuous", pool_base=192,
                       pool_max_steps=32, segment_steps=4,
                       lora_adapters={"narrator": lora})
    srv.start()
    yield srv
    srv.stop()


def test_voice_adapter_request(lora_server):
    base = f"http://127.0.0.1:{lora_server.port}"
    r = _post(f"{base}/v1/audio/speech",
              {"input": "[S1]voice test[S2]ok", "max_tokens": 10,
               "voice": "narrator"})
    wav, _ = wav_bytes_to_array(r.read())
    assert len(wav) > 0 and np.isfinite(wav).all()
    # default voice still serves
    r = _post(f"{base}/v1/audio/speech",
              {"input": "[S1]plain[S2]ok", "max_tokens": 10,
               "voice": "default"})
    wav, _ = wav_bytes_to_array(r.read())
    assert len(wav) > 0


def test_voice_unknown_is_400(lora_server):
    import urllib.error
    base = f"http://127.0.0.1:{lora_server.port}"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/v1/audio/speech",
              {"input": "[S1]x", "voice": "whoami", "max_tokens": 4})
    assert e.value.code == 400


def test_voice_without_registered_adapters_is_400(server):
    import urllib.error
    base = f"http://127.0.0.1:{server.port}"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/v1/audio/speech",
              {"input": "[S1]x", "voice": "any", "max_tokens": 4})
    assert e.value.code == 400


def test_voice_on_window_scheduler_and_streaming(lora_server_window):
    """Voices work on the window scheduler (per-row adapter lists in one
    micro-batched generate) and on the streaming path."""
    import http.client
    base = f"http://127.0.0.1:{lora_server_window.port}"
    r = _post(f"{base}/v1/audio/speech",
              {"input": "[S1]windowed voice[S2]yes", "max_tokens": 10,
               "voice": "narrator"})
    wav, _ = wav_bytes_to_array(r.read())
    assert len(wav) > 0 and np.isfinite(wav).all()

    conn = http.client.HTTPConnection("127.0.0.1", lora_server_window.port,
                                      timeout=300)
    conn.request("POST", "/v1/audio/speech",
                 json.dumps({"input": "[S1]stream with voice[S2]go",
                             "stream": True, "max_tokens": 20,
                             "voice": "narrator"}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    pcm = resp.read()
    conn.close()
    assert len(pcm) > 0 and len(pcm) % 2 == 0


@pytest.fixture(scope="module")
def lora_server_window():
    """Window-scheduler server with a registered LoRA voice."""
    import jax
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from moss_ttsd_tpu.train.lora import init_lora
    pipe = build_tiny_pipeline()
    lora = init_lora(pipe.engine.params, jax.random.PRNGKey(4), rank=2)
    srv = SpeechServer(pipe, host="127.0.0.1", port=0, max_batch=2,
                       batch_window_s=0.1,
                       lora_adapters={"narrator": lora})
    srv.start()
    yield srv
    srv.stop()


def test_models_endpoint_lists_voices(lora_server):
    base = f"http://127.0.0.1:{lora_server.port}"
    m = json.loads(urllib.request.urlopen(f"{base}/v1/models").read())
    assert m["data"][0]["id"] == "moss-ttsd"
    assert "narrator" in m["data"][0]["voices"]


# -- continuous-pool streaming -----------------------------------------------

def _stream_pcm(port, payload):
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/v1/audio/speech", json.dumps(payload),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200, r.read()
    assert r.headers["Content-Type"].startswith("audio/L16")
    pcm = r.read()
    conn.close()
    return pcm


def test_continuous_streaming_pcm(continuous_server):
    """stream=true on the continuous scheduler rides the pool (no global
    stream lock): raw PCM16 arrives as the pool decodes the slot."""
    pcm = _stream_pcm(continuous_server.port,
                      {"input": "[S1]pool stream[S2]ok", "stream": True,
                       "max_tokens": 20, "seed": 2})
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    wav = np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0
    assert wav.size > 100 and np.isfinite(wav).all()


def test_continuous_concurrent_streams(continuous_server):
    """Two streams run CONCURRENTLY in the pool while a non-streaming
    request joins the same pool around them."""
    from moss_ttsd_tpu.utils.profiling import metrics
    metrics.reset()
    port = continuous_server.port
    out = [None] * 3

    def stream(i):
        out[i] = _stream_pcm(port, {"input": f"[S1]stream {i}[S2]go",
                                    "stream": True, "max_tokens": 20,
                                    "seed": i})

    def plain():
        base = f"http://127.0.0.1:{port}"
        r = _post(f"{base}/v1/audio/speech",
                  {"input": "[S1]plain rider[S2]ok", "max_tokens": 12})
        out[2] = r.read()

    threads = [threading.Thread(target=stream, args=(0,)),
               threading.Thread(target=stream, args=(1,)),
               threading.Thread(target=plain)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(o for o in out)
    wav, _ = wav_bytes_to_array(out[2])
    assert len(wav) > 0
    assert metrics.snapshot().get("server_streamed", 0) >= 2


def test_pool_stream_matches_stream_item():
    """Pool streaming is byte-identical to the single-stream stream_item
    path when fed at the same boundaries: the pool reproduces the isolated
    engine's tokens (per-request rng), and both vocode through the shared
    StreamVocoder (same sliding windows, same bucketed dispatches)."""
    import queue
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from moss_ttsd_tpu.serve.server import ContinuousWorker, _Request

    pipe = build_tiny_pipeline()
    worker = ContinuousWorker(pipe, slots=2, base=192, max_steps=32,
                              segment_steps=4)
    try:
        item = {"text": "[S1]pool stream parity[S2]ok"}
        req = _Request(item, 20, 5, False)
        req.stream_q = queue.Queue()
        worker.submit(req)
        chunks = []
        while True:
            c = req.stream_q.get(timeout=300)
            if c is None:
                break
            assert not isinstance(c, str), c
            chunks.append(c)
    finally:
        worker.shutdown()
    ref = [c for c, _ in pipe.stream_item(item, max_new_tokens=20, seed=5,
                                          chunk_steps=4,
                                          first_chunk_steps=4)]
    assert chunks and ref
    np.testing.assert_array_equal(np.concatenate(chunks),
                                  np.concatenate(ref))


def test_pool_stream_cancel_frees_slot():
    """A cancelled stream's slot is reclaimed at the next segment boundary
    and the pool keeps serving."""
    import queue
    import time
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from moss_ttsd_tpu.serve.server import ContinuousWorker, _Request

    pipe = build_tiny_pipeline()
    worker = ContinuousWorker(pipe, slots=2, base=192, max_steps=64,
                              segment_steps=4)
    try:
        req = _Request({"text": "[S1]cancel me please[S2]ok"}, 60, 0, False)
        req.stream_q = queue.Queue()
        worker.submit(req)
        first = req.stream_q.get(timeout=300)
        assert not isinstance(first, str), first
        req.cancelled = True
        deadline = time.time() + 120
        while time.time() < deadline and worker.cb.free_slots < 2:
            time.sleep(0.2)
        assert worker.cb.free_slots == 2
        req2 = _Request({"text": "[S1]after cancel[S2]ok"}, 8, 0, False)
        worker.submit(req2)
        assert req2.event.wait(300)
        assert req2.error is None and req2.wav_bytes
    finally:
        worker.shutdown()


# -- serving hygiene: queue bounds, latency metrics, warmup ------------------

def test_queue_bound_returns_429(server):
    base = f"http://127.0.0.1:{server.port}"
    import urllib.error
    old = server.worker.max_queue
    server.worker.max_queue = 0
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base}/v1/audio/speech",
                  {"input": "[S1]busy[S2]ok", "max_tokens": 8})
        assert e.value.code == 429, e.value.read()
    finally:
        server.worker.max_queue = old
    # and the server still serves once the bound lifts
    r = _post(f"{base}/v1/audio/speech",
              {"input": "[S1]ok now[S2]yes", "max_tokens": 8})
    assert r.status == 200


def test_request_latency_percentiles_exported(server):
    base = f"http://127.0.0.1:{server.port}"
    _post(f"{base}/v1/audio/speech",
          {"input": "[S1]latency sample[S2]ok", "max_tokens": 8}).read()
    m = json.loads(urllib.request.urlopen(f"{base}/v1/metrics").read())
    assert m.get("server_request_latency_s_observed", 0) >= 1
    assert m.get("server_request_latency_s_p50", 0) > 0
    assert m["server_request_latency_s_p95"] >= m["server_request_latency_s_p50"]
    assert "server_queue_depth" in m          # occupancy gauges exported


def test_pool_nonstream_cancel_frees_slot():
    """A timed-out (504) NON-stream request is abandoned by its handler;
    the pool must reclaim its slot at the next segment boundary instead of
    decoding its full budget for a closed connection."""
    import time
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from moss_ttsd_tpu.serve.server import ContinuousWorker, _Request

    pipe = build_tiny_pipeline()
    worker = ContinuousWorker(pipe, slots=2, base=192, max_steps=64,
                              segment_steps=4)
    try:
        req = _Request({"text": "[S1]abandon me[S2]ok"}, 60, 0, False)
        worker.submit(req)
        deadline = time.time() + 120            # wait until it holds a slot
        while time.time() < deadline and worker.cb.free_slots == 2:
            time.sleep(0.2)
        assert worker.cb.free_slots < 2
        req.cancelled = True                    # what the 504 path does
        deadline = time.time() + 120
        while time.time() < deadline and worker.cb.free_slots < 2:
            time.sleep(0.2)
        assert worker.cb.free_slots == 2
        req2 = _Request({"text": "[S1]after abandon[S2]ok"}, 8, 0, False)
        worker.submit(req2)
        assert req2.event.wait(300)
        assert req2.error is None and req2.wav_bytes
    finally:
        worker.shutdown()


def test_window_cancel_skips_queued_request():
    """The window scheduler drops cancelled requests at batch-take time."""
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from moss_ttsd_tpu.serve.server import BatchingWorker, _Request

    pipe = build_tiny_pipeline()
    worker = BatchingWorker(pipe, max_batch=2, batch_window_s=0.5)
    try:
        dead = _Request({"text": "[S1]never run[S2]ok"}, 8, 0, False)
        dead.cancelled = True
        live = _Request({"text": "[S1]do run[S2]ok"}, 8, 0, False)
        worker.submit(dead)
        worker.submit(live)
        assert live.event.wait(300)
        assert live.error is None and live.wav_bytes
        assert not dead.event.is_set()          # skipped, never generated
    finally:
        worker.shutdown()


def test_warmup_roundtrip(server):
    server.warmup(max_tokens=8, timeout_s=300)


def test_warmup_roundtrip_continuous(continuous_server):
    continuous_server.warmup(max_tokens=8, timeout_s=300)
