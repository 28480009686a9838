"""Full benchmark suite: one JSON line per BASELINE.json config on one TPU chip.

`bench.py` stays the driver's single headline number (text-path e2e RTF at
batch 8). This file covers the remaining BASELINE configs the reference
defines but never measures (BASELINE.md: the reference publishes no RTF/TTFA):

  * codec_roundtrip  — BASELINE config 1: XY-codec encode + RVQ + decode
    throughput, batch 8 x 30 s clips, audio-seconds per wall-second.
  * voice_clone_rtf  — BASELINE config 3: the FULL production pipeline
    (TTSPipeline.process_batch on examples.jsonl items with two prompt
    voices): prompt-audio codec encode + prompt assembly + jitted generate +
    batched vocode. RTF counts every phase, unlike bench.py's
    decode+vocode steady state.
  * ttfa — time-to-first-audio (warm, batch 1): stream_item wall time from
    request to the first yielded audio chunk (prefill + 25 decode steps +
    first vocode window). p50 over trials.
  * longform — BASELINE config 4 (podcast single-stream): batch-1 decode of
    minutes of audio with the int8 KV cache (the serving config for long
    buffers — see decode/engine.py docstring), decode steps/s + decode-only
    RTF. Vocode throughput is covered by the codec config above.
  * serving — BASELINE config 5 (serving half): continuous batching vs the
    reference's static whole-batch contract on a long-tail request mix;
    useful tokens/s + p95 request latency for both schedulers.
  * batchsweep — per-chip aggregate decode tokens/s at batch 8/16/32 (weight
    streaming amortizes across rows; the KV stream eventually dominates).
  * finetune — BASELINE config 5 (training half): LoRA r16 training
    tokens/s at full geometry (layerwise adapters + per-layer remat).
  * codectrain — codec training throughput (full XY geometry): round-trip
    reconstruction loss + EMA codebooks + dead-code replacement,
    audio-seconds per wall-second.

All models run at full production geometry with random weights (no public
checkpoint ships here; compute cost is weight-independent). As in bench.py,
the whole vocab counts as "speech" so random channel-0 samples never trigger
the EOS flush and generation runs full length.

Usage:  python bench_full.py [--configs codec,clone,ttfa] [--steps N]
Prints one JSON line per config on stdout; progress on stderr.
``--tiny --platform cpu`` smoke-tests the harness with tiny geometry
(numbers are meaningless there; it validates wiring, not performance).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def setup_jax_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def emit(metric, value, unit, vs_baseline=None, **extra):
    line = {"metric": metric, "value": round(value, 3), "unit": unit}
    if vs_baseline is not None:
        line["vs_baseline"] = round(vs_baseline, 3)
    line.update(extra)
    print(json.dumps(line), flush=True)


def random_lm_params(model, cfg, seed=0):
    """Random full-geometry params directly on device in the param dtypes.

    With cfg.quantized the tree is generated straight in quantized layout
    (random int8 weights + small fp32 scales, ~0.02-scaled effective values)
    so no full-precision master copy ever touches HBM — the engine detects
    the pre-quantized tree and skips conversion.

    The whole tree is built by ONE jitted program: on the axon backend each
    eager per-leaf fill is its own remotely-compiled program (~340 of them
    at full geometry), and that queue of little remote compiles is exactly
    what inflated BENCH_r04's first call (see bench.py cold-path note)."""
    import jax
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(seed)
    abstract = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8, cfg.channels), jnp.int32)), rng)
    flat, treedef = jax.tree_util.tree_flatten_with_path(abstract)

    def fill(path, spec, k):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if spec.dtype == jnp.int8:
            return jax.random.randint(k, spec.shape, -127, 128, jnp.int8)
        if name.endswith("_s"):          # dequant scales: 0.02 / 127
            return jnp.full(spec.shape, 0.02 / 127, spec.dtype)
        return (jax.random.normal(k, spec.shape, jnp.bfloat16) * 0.02
                ).astype(spec.dtype)

    def build(k):
        keys = list(jax.random.split(k, len(flat)))
        return jax.tree_util.tree_unflatten(
            treedef, [fill(p, s, kk) for (p, s), kk in zip(flat, keys)])

    return jax.jit(build)(rng)



def make_bench_lm(tiny, max_new_tokens, approx_topk=None):
    """Shared full/tiny LM setup for the serving-side benches: production
    geometry with the whole vocab counted as "speech" (random channel-0
    samples never hit the EOS flush, so decode runs full length),
    pre-quantized int8 random params, and the standard sampled config.
    Returns (cfg, params, sampling)."""
    import dataclasses
    from moss_ttsd_tpu.core.config import (ChannelSamplingConfig, LMConfig,
                                           SamplingConfig)
    from moss_ttsd_tpu.models.lm import AsteroidLM

    if tiny:
        cfg = LMConfig(dtype="float32", param_dtype="float32").tiny()
    else:
        cfg = LMConfig()
    cfg = type(cfg)(**{**cfg.to_dict(),
                       "speech_token_range": (0, cfg.vocab_size)})
    qcfg = dataclasses.replace(cfg, quantized=True)
    params = random_lm_params(AsteroidLM(qcfg), qcfg)
    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=True, temperature=0.9,
                                        top_k=50, top_p=0.95)
                  for _ in range(cfg.channels)],
        max_new_tokens=max_new_tokens,
        approx_topk=not tiny if approx_topk is None else approx_topk)
    return cfg, params, sampling


def bench_codec_roundtrip(spt, trials=3):
    """BASELINE config 1: encode+decode of batch-8 30 s clips."""
    import numpy as np
    B, secs = 8, 30
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(secs * spt.input_sample_rate)
            .astype(np.float32) * 0.1 for _ in range(B)]

    log("codec_roundtrip: compile encode+decode...")
    enc = spt.encode(wavs, overlap_seconds=10)
    codes = [np.asarray(c, np.int32) for c in enc["codes_list"]]
    spt.decode(codes, overlap_seconds=10, pcm16=True)

    enc_s = dec_s = None
    for _ in range(trials):
        t0 = time.perf_counter()
        enc = spt.encode(wavs, overlap_seconds=10)
        codes = [np.asarray(c, np.int32) for c in enc["codes_list"]]
        t1 = time.perf_counter()
        out = spt.decode(codes, overlap_seconds=10, pcm16=True)
        t2 = time.perf_counter()
        enc_s = t1 - t0 if enc_s is None else min(enc_s, t1 - t0)
        dec_s = t2 - t1 if dec_s is None else min(dec_s, t2 - t1)
    audio_sec = B * secs
    xrt = audio_sec / (enc_s + dec_s)
    log(f"codec_roundtrip: {audio_sec}s audio enc {enc_s:.2f}s + dec {dec_s:.2f}s"
        f" = {xrt:.1f}x realtime")
    emit("codec_roundtrip_xrt_batch8", xrt, "audio_sec_per_wall_sec",
         encode_xrt=round(audio_sec / enc_s, 1),
         decode_xrt=round(audio_sec / dec_s, 1))


def build_pipeline(spt, decode_steps, tiny=False):
    """Production TTSPipeline at full LM geometry, int8 serving config."""
    from moss_ttsd_tpu.pipeline.batch import TTSPipeline
    from moss_ttsd_tpu.utils.mock_tokenizer import MockTokenizer

    log("voice_clone: init LM params (pre-quantized int8)...")
    cfg, params, sampling = make_bench_lm(tiny, decode_steps)
    return TTSPipeline(MockTokenizer(), cfg, params, spt, sampling,
                       bucket=128, quant="int8")


def clone_items(batch):
    import json as _json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples", "examples.jsonl")
    with open(path) as f:
        base_items = [_json.loads(l) for l in f if l.strip()]
    return [dict(base_items[i % len(base_items)]) for i in range(batch)]


def bench_voice_clone(pipe, decode_steps, batch, trials=3):
    """BASELINE config 3: two-speaker zero-shot cloning, full pipeline."""
    items = clone_items(batch)
    log("voice_clone: compile + first run (prompt encode + generate + vocode)...")
    t0 = time.perf_counter()
    pipe.process_batch(items, max_new_tokens=decode_steps, seed=0)
    log(f"voice_clone: first call {time.perf_counter() - t0:.1f}s")

    best = None
    for i in range(trials):
        pipe.timings.__init__()          # reset phase accumulators
        t0 = time.perf_counter()
        _, audio = pipe.process_batch(items, max_new_tokens=decode_steps,
                                      seed=1 + i)
        wall = time.perf_counter() - t0
        audio_sec = sum(a["audio_data"].shape[-1] / a["sample_rate"]
                        for a in audio if a is not None)
        if best is None or wall < best[0]:
            best = (wall, audio_sec, pipe.timings.as_dict())
    wall, audio_sec, phases = best
    rtf = audio_sec / wall
    log(f"voice_clone: {audio_sec:.1f}s audio in {wall:.2f}s (RTF {rtf:.1f}) "
        f"phases={phases}")
    emit("voice_clone_e2e_rtf_batch8", rtf, "audio_sec_per_wall_sec",
         vs_baseline=rtf / 5.0,
         tokenize_s=round(phases["tokenize_s"], 3),
         generate_s=round(phases["prefill_decode_s"], 3),
         vocode_s=round(phases["vocode_s"], 3))


def bench_ttfa(pipe, trials=5, chunk_steps=25, first_chunk_steps=12):
    """Warm time-to-first-audio at batch 1 via the streaming path.

    The first segment is ``first_chunk_steps`` decode steps (~1 s of audio
    at the default 12) and its vocode is read back immediately; later
    segments pipeline vocode readback behind decode (pipeline.stream_item).
    """
    item = clone_items(1)[0]

    def first_chunk_ms(seed):
        t0 = time.perf_counter()
        for _wav, _sr in pipe.stream_item(item, max_new_tokens=chunk_steps * 2,
                                          seed=seed, chunk_steps=chunk_steps,
                                          first_chunk_steps=first_chunk_steps):
            return (time.perf_counter() - t0) * 1e3
        return None

    log("ttfa: compile streaming path (batch 1)...")
    t0 = time.perf_counter()
    cold = first_chunk_ms(0)
    log(f"ttfa: first (cold) call {time.perf_counter() - t0:.1f}s")

    vals = sorted(v for v in (first_chunk_ms(1 + i) for i in range(trials))
                  if v is not None)
    p50 = vals[len(vals) // 2]
    log(f"ttfa: warm trials (ms) = {[round(v) for v in vals]}, cold first "
        f"chunk = {cold / 1e3:.1f}s")
    emit("ttfa_warm_p50", p50, "ms",
         chunk_steps=chunk_steps, first_chunk_steps=first_chunk_steps,
         first_chunk_audio_s=round(first_chunk_steps / 12.5, 2))


def bench_longform(steps=1500, trials=2, tiny=False):
    """BASELINE config 4: single-stream long-form decode (podcast path)."""
    import numpy as np
    from moss_ttsd_tpu.decode.engine import GenerationEngine

    log("longform: init LM params (pre-quantized int8)...")
    cfg, params, sampling = make_bench_lm(tiny, steps)
    engine = GenerationEngine(cfg, params, sampling, bucket=64, quant="int8",
                              kv_quant="int8", step_bucket=steps)
    del params

    nprng = np.random.default_rng(0)
    ids = np.full((1, 64, cfg.channels), cfg.speech_pad_token, np.int64)
    ids[..., 0] = nprng.integers(1, min(10000, cfg.vocab_size - 1), (1, 64))
    mask = np.ones((1, 64), np.int64)

    log("longform: compile + first run...")
    t0 = time.perf_counter()
    engine.generate(ids, mask, max_new_tokens=steps, seed=0)
    log(f"longform: first call {time.perf_counter() - t0:.1f}s")
    best = None
    for i in range(trials):
        t0 = time.perf_counter()
        r = engine.generate(ids, mask, max_new_tokens=steps, seed=1 + i)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    sps = r.steps / best
    rtf = sps / 12.5
    log(f"longform: {r.steps} steps in {best:.2f}s = {sps:.1f} steps/s "
        f"(decode RTF {rtf:.1f} single-stream)")
    emit("longform_decode_steps_per_s_batch1", sps, "steps_per_sec",
         decode_rtf=round(rtf, 1), steps=r.steps, kv_quant="int8")


def bench_serving(n_requests=24, slots=8, trials=1, tiny=False, seed=0):
    """Continuous batching vs static batching on a long-tail request mix.

    Workload: 75% short requests (~64-96 decode steps, interactive dialogue
    turns) + 25% long ones (~224-256 steps, podcast-style), all queued at
    t=0. The ContinuousBatcher refills slots the moment a row finishes; the
    static engine (the reference's whole-batch contract,
    generation_utils.py:341-409) holds every row until the slowest in its
    batch of ``slots`` finishes — the long tail takes each batch hostage.
    Metrics: useful generated tokens per wall second, and p95 request
    completion latency (static latency = when the request's whole batch
    returns, cumulative over earlier batches).
    """
    import numpy as np
    from moss_ttsd_tpu.decode.continuous import ContinuousBatcher
    from moss_ttsd_tpu.decode.engine import GenerationEngine

    log("serving: init LM params (pre-quantized int8)...")
    cfg, params, sampling = make_bench_lm(tiny, 256)

    base, max_steps = 64, 96 if tiny else 256
    rng = np.random.default_rng(seed)
    if tiny:
        budgets = rng.integers(16, max_steps + 1, n_requests).tolist()
    else:
        budgets = [int(rng.integers(224, 257)) if rng.random() < 0.25
                   else int(rng.integers(64, 97)) for _ in range(n_requests)]
    prompt_lens = rng.integers(base // 2, base - cfg.channels + 1,
                               n_requests).tolist()

    def make_prompt(n, length):
        p = np.full((length, cfg.channels), cfg.speech_pad_token, np.int32)
        p[:, 0] = rng.integers(1, min(10000, cfg.vocab_size - 1), length)
        return p

    prompts = [make_prompt(i, pl) for i, pl in enumerate(prompt_lens)]

    # --- continuous batching ---------------------------------------------
    cb = ContinuousBatcher(cfg, params, sampling, slots=slots, base=base,
                           max_steps=max_steps, quant="int8")
    log("serving: compile continuous path (prefill + splice + segment)...")

    def run_continuous(segment=40):
        t_start = time.perf_counter()
        queue = list(zip(prompts, budgets))
        done_tokens = 0
        latencies = []
        outputs = []
        submitted = 0
        while len(latencies) < n_requests:
            if queue and cb.free_slots:
                burst = [queue.pop(0)
                         for _ in range(min(cb.free_slots, len(queue)))]
                cb.submit_many([(p, int(b), submitted + i)
                                for i, (p, b) in enumerate(burst)])
                submitted += len(burst)
            cb.run(steps=segment)
            for j, steps in cb.poll():          # one readback per segment
                steps, tokens_dev = cb.collect_async(j, steps)
                outputs.append(tokens_dev)      # materialized below
                done_tokens += steps
                latencies.append(time.perf_counter() - t_start)
        for t in outputs:                       # pipelined output transfers
            np.asarray(t)
        return done_tokens, latencies

    run_continuous()                                  # compile + warm
    best_cont = None
    for _ in range(trials):
        t0 = time.perf_counter()
        tokens, cont_lat = run_continuous()
        dt = time.perf_counter() - t0
        if best_cont is None or dt < best_cont[0]:
            best_cont = (dt, cont_lat)
    cont_tps = tokens / best_cont[0]
    cont_p95 = sorted(best_cont[1])[int(0.95 * (n_requests - 1))]

    # --- static batching (reference contract) ----------------------------
    engine = GenerationEngine(cfg, params, sampling, bucket=base,
                              quant="int8", step_bucket=max_steps)
    log("serving: compile static path...")

    def run_static():
        t_start = time.perf_counter()
        done_tokens = 0
        latencies = []
        for i in range(0, n_requests, slots):
            grp = list(range(i, min(i + slots, n_requests)))
            L = base
            ids = np.full((len(grp), L, cfg.channels), cfg.speech_pad_token,
                          np.int64)
            ids[..., 0] = 0
            mask = np.zeros((len(grp), L), np.int64)
            for r, gi in enumerate(grp):
                p = prompts[gi]
                ids[r, L - len(p):] = p
                mask[r, L - len(p):] = 1
            step_cap = max(budgets[gi] for gi in grp)
            engine.generate(ids, mask, max_new_tokens=int(step_cap), seed=i)
            done_tokens += sum(budgets[gi] for gi in grp)
            latencies += [time.perf_counter() - t_start] * len(grp)
        return done_tokens, latencies

    run_static()
    best_stat = None
    for _ in range(trials):
        t0 = time.perf_counter()
        tokens_s, stat_lat = run_static()
        dt = time.perf_counter() - t0
        if best_stat is None or dt < best_stat[0]:
            best_stat = (dt, stat_lat)
    stat_tps = tokens_s / best_stat[0]
    stat_p95 = sorted(best_stat[1])[int(0.95 * (n_requests - 1))]

    log(f"serving: continuous {cont_tps:.1f} useful tok/s, p95 latency "
        f"{cont_p95:.2f}s vs static {stat_tps:.1f} tok/s, p95 {stat_p95:.2f}s "
        f"({cont_tps / stat_tps:.2f}x tok/s, {stat_p95 / cont_p95:.2f}x "
        f"latency) over {n_requests} requests (75% short / 25% long)")
    emit("serving_useful_tokens_per_s", cont_tps, "tokens_per_sec",
         static_tokens_per_s=round(stat_tps, 1),
         speedup_vs_static=round(cont_tps / stat_tps, 3),
         p95_latency_s=round(cont_p95, 2),
         static_p95_latency_s=round(stat_p95, 2),
         n_requests=n_requests, slots=slots)

    # --- ONLINE arrivals: the scenario continuous batching exists for ----
    # Poisson arrivals at ~70% of the static scheduler's offline capacity.
    # Static must run whatever has arrived as one whole batch (padded to
    # ``slots`` rows — the compiled program is fixed-batch) and hold it to
    # the group's max budget; continuous admits each request at the next
    # segment boundary. Latency = completion - arrival.
    avg_budget = sum(budgets) / n_requests
    rate = 0.7 * stat_tps / avg_budget
    arrivals = np.cumsum(rng.exponential(1.0 / rate, n_requests))
    log(f"serving online: Poisson rate {rate:.2f} req/s "
        f"(span {arrivals[-1]:.1f}s)")

    def run_online_continuous(segment=25):
        t0 = time.perf_counter()
        owner = {}
        next_i = done = 0
        lat = []
        while done < n_requests:
            now = time.perf_counter() - t0
            burst = []
            while (next_i < n_requests and arrivals[next_i] <= now
                   and len(burst) < cb.free_slots):
                burst.append(next_i)
                next_i += 1
            if burst:                           # one batched prefill
                js = cb.submit_many([(prompts[i], int(budgets[i]), i)
                                     for i in burst])
                owner.update(zip(js, burst))
            if cb.free_slots == slots:          # idle: wait for next arrival
                time.sleep(max(0.0, arrivals[next_i] - now))
                continue
            cb.run(steps=segment)
            for j, steps in cb.poll():
                cb.collect_async(j, steps)
                lat.append(time.perf_counter() - t0 - arrivals[owner.pop(j)])
                done += 1
        return lat

    def run_online_static():
        t0 = time.perf_counter()
        next_done = 0
        lat = []
        while next_done < n_requests:
            now = time.perf_counter() - t0
            if arrivals[next_done] > now:       # nothing waiting yet
                time.sleep(arrivals[next_done] - now)
                continue
            now = time.perf_counter() - t0
            grp = [i for i in range(next_done, n_requests)
                   if arrivals[i] <= now][:slots]
            ids = np.full((slots, base, cfg.channels), cfg.speech_pad_token,
                          np.int64)
            ids[..., 0] = 0
            mask = np.zeros((slots, base), np.int64)
            for r in range(slots):              # pad with repeats of row 0
                p = prompts[grp[r % len(grp)]]
                ids[r, base - len(p):] = p
                mask[r, base - len(p):] = 1
            step_cap = max(budgets[i] for i in grp)
            engine.generate(ids, mask, max_new_tokens=int(step_cap),
                            seed=next_done)
            t_done = time.perf_counter() - t0
            lat += [t_done - arrivals[i] for i in grp]
            next_done += len(grp)
        return lat

    run_online_continuous()                     # warm scheduling path
    lat_c = run_online_continuous()
    lat_s = run_online_static()
    c_p50, c_p95 = (sorted(lat_c)[len(lat_c) // 2],
                    sorted(lat_c)[int(0.95 * (len(lat_c) - 1))])
    s_p50, s_p95 = (sorted(lat_s)[len(lat_s) // 2],
                    sorted(lat_s)[int(0.95 * (len(lat_s) - 1))])
    log(f"serving online: continuous p50/p95 {c_p50:.2f}/{c_p95:.2f}s vs "
        f"static {s_p50:.2f}/{s_p95:.2f}s at {rate:.2f} req/s")
    emit("serving_online_p95_latency_s", c_p95, "seconds",
         p50_latency_s=round(c_p50, 2),
         static_p95_latency_s=round(s_p95, 2),
         static_p50_latency_s=round(s_p50, 2),
         arrival_rate_req_s=round(rate, 2), n_requests=n_requests,
         slots=slots)


def bench_batch_sweep(batches=(8, 16, 32), decode_steps=256, trials=3,
                      tiny=False):
    """Per-chip serving throughput vs batch size. Decode streams the full
    weight set once per step regardless of B, so aggregate tokens/s scales
    until the KV-cache stream catches up — the per-chip knob the reference
    (fixed whole-JSONL batches) never exposes."""
    import numpy as np
    from moss_ttsd_tpu.decode.engine import GenerationEngine

    if tiny:
        batches, decode_steps = (2, 4), 16
    log("batch_sweep: init LM params (pre-quantized int8)...")
    cfg, params, sampling = make_bench_lm(tiny, decode_steps)
    engine = GenerationEngine(cfg, params, sampling, bucket=64, quant="int8",
                              step_bucket=decode_steps)
    del params

    nprng = np.random.default_rng(0)
    results = {}
    for B in batches:
        ids = np.full((B, 64, cfg.channels), cfg.speech_pad_token, np.int64)
        ids[..., 0] = nprng.integers(1, min(10000, cfg.vocab_size - 1),
                                     (B, 64))
        mask = np.ones((B, 64), np.int64)
        log(f"batch_sweep: B={B} compile + first run...")
        engine.generate(ids, mask, max_new_tokens=decode_steps, seed=0)
        best = None
        for i in range(trials):
            t0 = time.perf_counter()
            r = engine.generate(ids, mask, max_new_tokens=decode_steps,
                                seed=1 + i)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        sps = r.steps / best
        results[B] = round(sps * B, 1)
        log(f"batch_sweep: B={B}: {sps:.1f} steps/s = {sps * B:.0f} tok/s "
            f"aggregate (audio x{sps * B / 12.5:.0f} realtime)")
    Bmax = max(results)
    emit("decode_aggregate_tokens_per_s", results[Bmax], "tokens_per_sec",
         batch=Bmax, per_batch={str(k): v for k, v in results.items()},
         audio_x_realtime=round(results[Bmax] / 12.5, 1))


def bench_finetune(batch=4, seqlen=1024, trials=3, tiny=False):
    """BASELINE config 5 (training half): LoRA finetune throughput on one
    chip — full 1.7B geometry, r=16/alpha=32/rslora over attn+MLP kernels
    (the reference peft config, finetune/finetune.py:165-175), remat +
    chunked CE, loss weights [8,2,1,...]. Metric: training tokens/sec
    (batch * seqlen * steps / wall)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moss_ttsd_tpu.core.config import LMConfig
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.train.lora import make_layerwise_lora_step
    from moss_ttsd_tpu.train.step import TrainState, make_optimizer
    import dataclasses

    if tiny:
        cfg = LMConfig(dtype="float32", param_dtype="float32").tiny()
        batch, seqlen = 2, 64
    else:
        cfg = LMConfig(param_dtype="bfloat16")
    # layerwise LoRA (models/lm.py LoRADense): rank-sized backward
    # cotangents; the merge-based step OOMs at this geometry (31.8 GB)
    lcfg = dataclasses.replace(cfg, lora_rank=16, lora_alpha=32.0)
    model = AsteroidLM(lcfg)
    log("finetune: init base params (bf16) + LoRA factors...")
    rng = jax.random.PRNGKey(0)
    abstract = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8, cfg.channels), jnp.int32)), rng)
    leaves, treedef = jax.tree.flatten(abstract)
    keys = list(jax.random.split(rng, len(leaves)))
    full = jax.tree.unflatten(treedef, [
        (jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02).astype(s.dtype)
        for k, s in zip(keys, leaves)])
    from moss_ttsd_tpu.train.lora import split_lora_tree
    frozen, trainable = split_lora_tree(full)
    del full

    optimizer = make_optimizer(total_steps=100)
    state = TrainState(jnp.zeros((), jnp.int32), trainable,
                       optimizer.init(trainable))
    lora_step = jax.jit(make_layerwise_lora_step(
        lcfg, optimizer, remat=True, ce_chunks=2 if tiny else 8))
    step_fn = lambda s, b: lora_step(s, b, frozen)

    nprng = np.random.default_rng(0)
    ids = nprng.integers(0, cfg.speech_vocab_size - 1,
                         (batch, seqlen, cfg.channels)).astype(np.int32)
    ids[..., 0] = nprng.integers(0, cfg.vocab_size, (batch, seqlen))
    b = {"input_ids": jnp.asarray(ids),
         "labels": jnp.asarray(ids),
         "attention_mask": jnp.ones((batch, seqlen), jnp.int32)}

    log("finetune: compile + first step...")
    t0 = time.perf_counter()
    state, m = step_fn(state, b)
    loss0 = float(m["loss"])
    log(f"finetune: first step {time.perf_counter() - t0:.1f}s, loss {loss0:.3f}")
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        state, m = step_fn(state, b)
        float(m["loss"])                       # force readback
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    tps = batch * seqlen / best
    log(f"finetune: {best * 1e3:.0f} ms/step -> {tps:.0f} tokens/s "
        f"(B={batch}, T={seqlen}, LoRA r16)")
    emit("lora_finetune_tokens_per_s", tps, "tokens_per_sec",
         batch=batch, seqlen=seqlen, ms_per_step=round(best * 1e3, 1))


def bench_codec_train(batch=2, secs=10, trials=3, tiny=False):
    """Codec training throughput: full XY-codec geometry, self-supervised
    round-trip loss + EMA codebooks + dead-code replacement (the train-mode
    machinery of reference quantizer.py that ships with no train script).
    Metric: training audio-seconds per wall-second."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moss_ttsd_tpu.core.config import CodecConfig
    from moss_ttsd_tpu.train.codec_step import (init_codec_train_state,
                                                make_codec_train_step)
    from moss_ttsd_tpu.train.step import make_optimizer

    cfg = CodecConfig().tiny() if tiny else CodecConfig()
    if tiny:
        batch, secs = 2, 1
    log("codec_train: init codec params + train state...")
    optimizer = make_optimizer(learning_rate=1e-4, total_steps=100)
    state = init_codec_train_state(cfg, optimizer, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_codec_train_step(cfg, optimizer))

    T = secs * cfg.input_sample_rate
    rng = np.random.default_rng(0)
    b = {"wav": jnp.asarray(rng.standard_normal((batch, T)),
                            jnp.float32) * 0.1,
         "lengths": jnp.full((batch,), T, jnp.int32)}
    log("codec_train: compile + first step...")
    t0 = time.perf_counter()
    state, m = step_fn(state, b, jax.random.PRNGKey(1))
    log(f"codec_train: first step {time.perf_counter() - t0:.1f}s, "
        f"loss {float(m['loss']):.3f}")
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        state, m = step_fn(state, b, jax.random.PRNGKey(2))
        float(m["loss"])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    aps = batch * secs / best
    log(f"codec_train: {best * 1e3:.0f} ms/step -> {aps:.1f} audio-sec/s "
        f"(B={batch} x {secs}s clips)")
    emit("codec_train_audio_sec_per_s", aps, "audio_sec_per_wall_sec",
         batch=batch, clip_secs=secs, ms_per_step=round(best * 1e3, 1))


def bench_pool_breakdown(slots=8, base=512, max_steps=2048, segment=64,
                         trials=3, tiny=False):
    """Stub-isolation breakdown of the continuous-pool decode body (the
    static decode step's README breakdown, applied to the pool — VERDICT r3
    #4: quantify the pooled-vs-static throughput tax at the serving
    geometry).

    Variants strip body components CUMULATIVELY via _build_segment_fn's
    ablate knob (shape-preserving stubs keep upstream ops alive so XLA can't
    DCE them): variant_i − variant_{i+1} = that component's per-step cost.
    The last variant is backbone+attention+bookkeeping only. A static
    GenerationEngine at the SAME (bucket, step_bucket, quant, kv_quant)
    geometry anchors the tax statement.
    """
    import numpy as np
    import jax.numpy as jnp
    from moss_ttsd_tpu.decode.continuous import (ContinuousBatcher,
                                                 _build_segment_fn)
    from moss_ttsd_tpu.decode.engine import GenerationEngine

    if tiny:
        base, max_steps, segment = 64, 96, 16
    quant = "int8"                  # make_bench_lm pre-quantizes the params
    kv_quant = None if tiny else "int8"

    log("pool_breakdown: init LM params...")
    cfg, params, sampling = make_bench_lm(tiny, max_steps)
    cb = ContinuousBatcher(cfg, params, sampling, slots=slots, base=base,
                           max_steps=max_steps, quant=quant,
                           kv_quant=kv_quant)
    rng = np.random.default_rng(0)

    def fill():
        """All slots occupied with fresh long-budget requests."""
        cb.state = cb._init_state(0)
        cb._slot_free = [True] * slots
        reqs = []
        for i in range(slots):
            L = int(rng.integers(base // 2, base - cfg.channels + 1))
            p = np.full((L, cfg.channels), cfg.speech_pad_token, np.int32)
            p[:, 0] = rng.integers(1, min(10000, cfg.vocab_size - 1), L)
            reqs.append((p, max_steps, i))
        cb.submit_many(reqs)
        return cb.state

    variants = [
        ("full", frozenset()),
        ("sampling", frozenset({"sampling"})),
        ("logits", frozenset({"sampling", "logits"})),
        ("tf_flush", frozenset({"sampling", "logits", "tf_flush"})),
        ("tokenwrite", frozenset({"sampling", "logits", "tf_flush",
                                  "tokenwrite"})),
        ("presence", frozenset({"sampling", "logits", "tf_flush",
                                "tokenwrite", "presence"})),
        ("extentcalc", frozenset({"sampling", "logits", "tf_flush",
                                  "tokenwrite", "presence", "extentcalc"})),
    ]
    import jax
    steps_per_s = {}
    for name, abl in variants:
        seg = jax.jit(_build_segment_fn(cb.model, cb.cfg, cb.sampling, base,
                                        max_steps, ablate=abl),
                      donate_argnums=(1,))
        st = fill()
        st = seg(cb.params, st, jnp.int32(segment), cb.lora.stacks)
        int(jax.device_get(st.gstep))               # compile + warm
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            st = seg(cb.params, st, jnp.int32(segment), cb.lora.stacks)
            int(jax.device_get(st.gstep))           # value readback (tunnel)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        del st
        steps_per_s[name] = segment / best
        log(f"pool_breakdown [{name:10s}] {segment / best:7.1f} steps/s "
            f"({1e3 * best / segment:.3f} ms/step)")

    # per-component cost = cumulative-variant deltas
    order = [n for n, _ in variants]
    for prev, cur in zip(order, order[1:]):
        delta_ms = 1e3 * (1.0 / steps_per_s[prev] - 1.0 / steps_per_s[cur])
        log(f"pool_breakdown component {cur}: {delta_ms:+.3f} ms/step")
        emit(f"pool_component_{cur}_ms", delta_ms, "ms/step")

    # static engine at the SAME geometry. The pool numbers above time pure
    # decode segments (admission/prefill happen in fill(), outside the
    # timer), so the static anchor must exclude its B=8 x ~base-row prefill
    # too: time a long and a short generate over the SAME prompt and
    # difference them — prefill and the per-call dispatch/readback cancel,
    # leaving the pure decode-step rate.
    log("pool_breakdown: static engine at matched geometry...")
    eng = GenerationEngine(cfg, params, sampling, bucket=base, quant=quant,
                           step_bucket=max_steps, kv_quant=kv_quant)
    B = slots
    L = base - cfg.channels
    ids = np.full((B, L, cfg.channels), cfg.speech_pad_token, np.int32)
    ids[:, :, 0] = rng.integers(1, min(10000, cfg.vocab_size - 1), (B, L))
    mask = np.ones((B, L), np.int32)
    n_steps = min(4 * segment, max_steps)
    n_short = max(1, segment // 8)

    def timed_generate(n, seed):
        t0 = time.perf_counter()
        res = eng.generate(ids, mask, max_new_tokens=n, seed=seed)
        jax.block_until_ready(res.tokens)
        float(jnp.sum(res.tokens[:, -1]))           # force value readback
        return time.perf_counter() - t0

    timed_generate(n_steps, seed=0)                 # compile + warm
    timed_generate(n_short, seed=0)
    best_long = min(timed_generate(n_steps, seed=1 + i) for i in range(trials))
    best_short = min(timed_generate(n_short, seed=1 + i) for i in range(trials))
    decode_s = max(best_long - best_short, 1e-9)
    static_sps = (n_steps - n_short) / decode_s
    log(f"pool_breakdown static engine: {static_sps:.1f} steps/s decode-only "
        f"(long {best_long:.3f}s @{n_steps} - short {best_short:.3f}s "
        f"@{n_short}; prefill+dispatch cancelled)")

    emit("pool_steps_per_s", steps_per_s["full"], "steps/s",
         static_matched=round(static_sps, 1),
         backbone_only=round(steps_per_s["extentcalc"], 1),
         tax_pct=round(100 * (1 - steps_per_s["full"] / static_sps), 1))
    return steps_per_s, static_sps


def bench_pool_restricted(slots=8, base=512, max_steps=2048, segment=64,
                          trials=3, tiny=False):
    """restricted_text_head at the serving-pool geometry: pooled decode
    steps/s with the window-sliced channel-0 head vs the full-vocab head.
    The pool breakdown attributes ~0.5 ms of the 4.81 ms pool step to the
    logits heads, almost all of it the 152k-row table stream the restricted
    window removes. Same fill + timed-segment methodology as
    bench_pool_breakdown (admission outside the timer)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from moss_ttsd_tpu.decode.continuous import ContinuousBatcher

    if tiny:
        base, max_steps, segment = 64, 96, 16
    kv_quant = None if tiny else "int8"
    log("pool_restricted: init LM params...")
    cfg, params, sampling = make_bench_lm(tiny, max_steps)
    # window covering speech + eos, with everything samplable counting as
    # "speech" so random weights never EOS-flush (make_bench_lm note)
    win = (100, 151) if tiny else (151665, 152695)
    rng = np.random.default_rng(0)

    def rate(restricted):
        cfg_v = (dataclasses.replace(cfg, speech_token_range=win,
                                     restricted_text_head=True)
                 if restricted else cfg)
        cb = ContinuousBatcher(cfg_v, params, sampling, slots=slots,
                               base=base, max_steps=max_steps, quant="int8",
                               kv_quant=kv_quant)
        reqs = []
        for i in range(slots):
            L = int(rng.integers(base // 2, base - cfg.channels + 1))
            p = np.full((L, cfg.channels), cfg.speech_pad_token, np.int32)
            p[:, 0] = rng.integers(1, min(10000, cfg.vocab_size - 1), L)
            reqs.append((p, max_steps, i))
        cb.submit_many(reqs)
        st = cb._segment(cb.params, cb.state, jnp.int32(segment),
                         cb.lora.stacks)
        int(jax.device_get(st.gstep))               # compile + warm
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            st = cb._segment(cb.params, st, jnp.int32(segment),
                             cb.lora.stacks)
            int(jax.device_get(st.gstep))           # value readback (tunnel)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        sps = segment / best
        log(f"pool_restricted [{'window' if restricted else 'full  '}] "
            f"{sps:7.1f} steps/s ({1e3 * best / segment:.3f} ms/step)")
        return sps

    full_sps = rate(False)
    win_sps = rate(True)
    emit("pool_steps_per_s_restricted_head", win_sps, "steps/s",
         full_head=round(full_sps, 1),
         speedup=round(win_sps / full_sps, 3))


def bench_attention_share(decode_steps=256, prompt=64, trials=3, tiny=False):
    """Split the decode-step backbone cost into matmuls vs attention.

    The README stub-isolation breakdown attributes the serving decode step
    to sampling / logits heads / backbone+attention but never splits the
    backbone itself. This config runs the REAL engine (bench.py serving
    config: B=8, w8a16, length-aware attention) twice — full body vs
    cfg.ablate_attention (attn = q: projections + cache writes alive, all
    scores/softmax/AV and cache reads gone) — and differences them with the
    long-minus-short methodology so prefill and per-call dispatch cancel.
    The remainder after subtracting attention and the known heads/sampling
    shares is the matmul+elementwise floor to judge against the HBM roof."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moss_ttsd_tpu.decode.engine import GenerationEngine

    B = 2 if tiny else 8
    steps = 16 if tiny else decode_steps
    cfg, params, sampling = make_bench_lm(tiny, steps)
    rng = np.random.default_rng(0)
    ids = np.full((B, prompt, cfg.channels), cfg.speech_pad_token, np.int32)
    ids[:, :, 0] = rng.integers(1, min(10000, cfg.vocab_size - 1), (B, prompt))
    mask = np.ones((B, prompt), np.int32)
    n_short = max(1, steps // 8)

    def decode_rate(ablate):
        cfg_i = dataclasses.replace(cfg, ablate_attention=ablate)
        eng = GenerationEngine(cfg_i, params, sampling, bucket=prompt,
                               quant="int8")

        def timed(n, seed):
            t0 = time.perf_counter()
            res = eng.generate(ids, mask, max_new_tokens=n, seed=seed)
            jax.block_until_ready(res.tokens)
            float(jnp.sum(res.tokens[:, -1]))       # force value readback
            assert res.steps == n, (res.steps, n)
            return time.perf_counter() - t0

        timed(steps, seed=0)                        # compile + warm
        timed(n_short, seed=0)
        best_long = min(timed(steps, seed=1 + i) for i in range(trials))
        best_short = min(timed(n_short, seed=1 + i) for i in range(trials))
        ms = (best_long - best_short) / (steps - n_short) * 1e3
        log(f"attnshare ablate={ablate}: {1e3 / ms:.1f} steps/s "
            f"({ms:.3f} ms/step; long {best_long:.3f}s short {best_short:.3f}s)")
        return ms

    full_ms = decode_rate(False)
    noattn_ms = decode_rate(True)
    attn_ms = full_ms - noattn_ms
    emit("decode_attention_ms_per_step", attn_ms, "ms/step",
         full_ms=round(full_ms, 3), backbone_noattn_ms=round(noattn_ms, 3),
         attention_share=round(attn_ms / full_ms, 3))


def bench_backbone_split(decode_steps=256, prompt=64, trials=3, tiny=False):
    """Split the decode step's NON-matmul backbone overhead (VERDICT r4 #2).

    The stub-isolation breakdown leaves ~1 ms/step of the serving decode
    unattributed (backbone 3.81 ms - bare int8 matmul sim 2.39 - attention
    0.42). This config measures the real engine (bench.py serving config)
    under shape-preserving ablations — norms (cfg.ablate_norms: every
    RMSNorm -> x*w), rope (cfg.ablate_rope), attention
    (cfg.ablate_attention) and their union — with the long-minus-short
    methodology so dispatch/prefill cancel. Each knob's share = full minus
    ablated; whatever the union leaves is the matmul+residual+scan floor."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moss_ttsd_tpu.decode.engine import GenerationEngine

    B = 2 if tiny else 8
    steps = 16 if tiny else decode_steps
    cfg, params, sampling = make_bench_lm(tiny, steps)
    rng = np.random.default_rng(0)
    ids = np.full((B, prompt, cfg.channels), cfg.speech_pad_token, np.int32)
    ids[:, :, 0] = rng.integers(1, min(10000, cfg.vocab_size - 1), (B, prompt))
    mask = np.ones((B, prompt), np.int32)
    n_short = max(1, steps // 8)

    def decode_ms(**ablate):
        cfg_i = dataclasses.replace(cfg, **ablate)
        eng = GenerationEngine(cfg_i, params, sampling, bucket=prompt,
                               quant="int8")

        def timed(n, seed):
            t0 = time.perf_counter()
            res = eng.generate(ids, mask, max_new_tokens=n, seed=seed)
            float(jnp.sum(jnp.asarray(res.tokens[:, -1])))
            assert res.steps == n, (res.steps, n)
            return time.perf_counter() - t0

        timed(steps, seed=0)                       # compile + warm
        timed(n_short, seed=0)
        best_long = min(timed(steps, seed=1 + i) for i in range(trials))
        best_short = min(timed(n_short, seed=1 + i) for i in range(trials))
        ms = (best_long - best_short) / (steps - n_short) * 1e3
        label = ",".join(k for k, v in ablate.items() if v) or "full"
        log(f"backbonesplit {label}: {1e3 / ms:.1f} steps/s ({ms:.3f} ms/step)")
        return ms

    full = decode_ms()
    no_norms = decode_ms(ablate_norms=True)
    no_rope = decode_ms(ablate_rope=True)
    no_attn = decode_ms(ablate_attention=True)
    floor = decode_ms(ablate_norms=True, ablate_rope=True,
                      ablate_attention=True)
    fused = decode_ms(fuse_qk_norm_rope=True)   # the A/B optimization knob
    emit("decode_backbone_split_ms_per_step", round(full, 3), "ms/step",
         norms_ms=round(full - no_norms, 3),
         rope_ms=round(full - no_rope, 3),
         attention_ms=round(full - no_attn, 3),
         matmul_floor_ms=round(floor, 3),
         unattributed_ms=round(no_norms + no_rope + no_attn - 2 * full
                               - floor, 3),
         fused_qk_norm_rope_ms=round(fused, 3))


def bench_multilora(slots=8, n_adapters=4, rank=16, trials=3, tiny=False):
    """Multi-LoRA pool tax: pooled decode steps/s with every row on its own
    LoRA adapter vs the plain pool. The adapter path adds per-row factor
    gathers + two rank-sized batched einsums per target per layer
    (models/lm.py Qwen3Block); this measures what that costs at the serving
    geometry."""
    import numpy as np
    from moss_ttsd_tpu.decode.continuous import ContinuousBatcher

    log("multilora: init LM params...")
    cfg, params, sampling = make_bench_lm(tiny, 256)
    base, max_steps = 64, 96 if tiny else 256
    rng = np.random.default_rng(0)

    def prompt(n=40):
        p = np.full((n, cfg.channels), cfg.speech_pad_token, np.int32)
        p[:, 0] = rng.integers(1, min(10000, cfg.vocab_size - 1), n)
        return p

    prompts = [prompt() for _ in range(slots)]

    # factor trees straight from the config shapes (the bench params are
    # pre-quantized, so init_lora would find no bf16 kernels to target)
    def lora_factors(seed):
        L, hd = cfg.num_hidden_layers, cfg.hidden_size
        HD = cfg.num_attention_heads * cfg.head_dim
        KD = cfg.num_key_value_heads * cfg.head_dim
        shapes = {"q_proj": (hd, HD), "k_proj": (hd, KD),
                  "v_proj": (hd, KD), "o_proj": (HD, hd),
                  "gate_proj": (hd, cfg.intermediate_size),
                  "up_proj": (hd, cfg.intermediate_size),
                  "down_proj": (cfg.intermediate_size, hd)}
        frng = np.random.default_rng(seed)
        return {f"params/layers/block/{t}/kernel":
                {"a": frng.normal(0, 0.02, (L, fi, rank)).astype(np.float32),
                 "b": frng.normal(0, 0.02, (L, rank, fo)).astype(np.float32)}
                for t, (fi, fo) in shapes.items()}

    adapters = [lora_factors(100 + i) for i in range(n_adapters)]

    def measure(with_adapters):
        cb = ContinuousBatcher(cfg, params, sampling, slots=slots, base=base,
                               max_steps=max_steps, quant="int8")
        names = []
        if with_adapters:
            for i, tree in enumerate(adapters):
                cb.register_adapter(f"v{i}", tree)
                names.append(f"v{i}")
        for j, p in enumerate(prompts):
            cb.submit(p, max_new_tokens=max_steps, seed=j,
                      adapter=names[j % len(names)] if names else None)
        cb.run(steps=8)                            # compile + warm
        float(np.asarray(cb.state.gstep))
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            cb.run(steps=32)
            float(np.asarray(cb.state.gstep))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return 32 / best

    plain = measure(False)
    lora = measure(True)
    log(f"multilora: {lora:.1f} steps/s with {n_adapters} adapters (r{rank}) "
        f"vs {plain:.1f} plain ({100 * (1 - lora / plain):.1f}% tax)")
    emit("multilora_pool_steps_per_s", round(lora, 1), "steps_per_sec",
         plain_steps_per_s=round(plain, 1), n_adapters=n_adapters, rank=rank,
         slots=slots, overhead_pct=round(100 * (1 - lora / plain), 1))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="codec,clone,ttfa,longform",
                    help="comma list of codec,clone,ttfa,longform,serving,"
                         "batchsweep,finetune,codectrain,multilora,"
                         "poolbreakdown,attnshare,backbonesplit")
    ap.add_argument("--steps", type=int, default=256,
                    help="decode steps for the voice-clone config")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--platform", default=None, help="e.g. cpu")
    args = ap.parse_args(argv)
    configs = set(args.configs.split(","))

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    setup_jax_cache()
    from moss_ttsd_tpu.core.config import CodecConfig
    from moss_ttsd_tpu.models.codec.model import XYTokenizer

    spt = None
    if configs & {"codec", "clone", "ttfa"}:
        log("init codec...")
        codec_cfg = CodecConfig().tiny() if args.tiny else CodecConfig()
        spt = XYTokenizer.init_random(codec_cfg, seed=0)

    if "codec" in configs:
        bench_codec_roundtrip(spt)

    if configs & {"clone", "ttfa"}:
        pipe = build_pipeline(spt, args.steps, tiny=args.tiny)
        if "clone" in configs:
            bench_voice_clone(pipe, args.steps, args.batch)
        if "ttfa" in configs:
            bench_ttfa(pipe)
        del pipe

    if "longform" in configs:
        bench_longform(steps=96 if args.tiny else 1500, tiny=args.tiny)

    if "serving" in configs:
        bench_serving(n_requests=6 if args.tiny else 24,
                      slots=2 if args.tiny else 8, tiny=args.tiny)

    if "batchsweep" in configs:
        bench_batch_sweep(tiny=args.tiny)

    if "finetune" in configs:
        bench_finetune(tiny=args.tiny)

    if "codectrain" in configs:
        bench_codec_train(tiny=args.tiny)

    if "multilora" in configs:
        bench_multilora(slots=2 if args.tiny else 8,
                        n_adapters=2 if args.tiny else 4, tiny=args.tiny)

    if "poolbreakdown" in configs:
        bench_pool_breakdown(slots=2 if args.tiny else 8, tiny=args.tiny)

    if "attnshare" in configs:
        bench_attention_share(decode_steps=args.steps, tiny=args.tiny)

    if "backbonesplit" in configs:
        bench_backbone_split(decode_steps=args.steps, tiny=args.tiny)

    if "restrictedpool" in configs:
        bench_pool_restricted(slots=2 if args.tiny else 8, tiny=args.tiny)


if __name__ == "__main__":
    main()
