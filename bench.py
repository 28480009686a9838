"""Benchmark: end-to-end dialogue-synthesis real-time factor on one TPU chip.

Measures the full MOSS-TTSD-geometry pipeline with random weights (no public
checkpoint ships in this environment; compute cost is weight-independent):
  * AsteroidLM 1.7B-geometry jitted AR decode at batch 8 (prefill 64 + 256
    decode steps through the lax.while_loop engine) in the framework's
    serving configuration — weight-only int8 (w8a16: int8 weights, bf16
    activations, fp32 accumulation; per-channel scales, logits cosine vs
    bf16 > 0.999 in tests) with length-aware decode attention (each step
    reads only the written cache prefix, models/lm.py), then
  * full-size bf16 XY-codec vocode of the generated frames (fp32 RVQ +
    spectral islands), window-bucketed to the generated length (quarter-
    window ladder) and batch-split into 4-row device calls so vocode
    compute overlaps the device->host PCM readback.

Headline RTF = generated audio seconds / (decode wall + vocode wall) for one
request batch — the per-request number, comparable across rounds and to the
reference's serial process_batch (generation_utils.py:406-450; both internal
overlaps above are things that loop has no analogue for). A steady-state
serving number (rtf_sustained_3batch: K batches back-to-back, batch i's PCM
readback in a reader thread overlapping batch i+1's decode) is reported
alongside; through the axon tunnel it is LOWER than the headline because the
link itself is the bottleneck — ~8 MB of int16 PCM per batch at the tunnel's
measured 8-60 MB/s cannot hide behind a ~1 s decode, so the readbacks
serialize on bandwidth (instrumented: the overlap does engage — batch 0's
readback runs during decodes 1-2 — there is simply more transfer than decode
to hide it behind). On deployment hardware PCM moves at PCIe rates (~1 ms)
and the pipeline strictly wins; transfer_tax_s calibrates the gap.

Prints ONE JSON line. vs_baseline is RTF relative to the BASELINE.json north
star (5x real time per chip at batch 8); the reference publishes no RTF of its
own (BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax

    # persistent compile cache: the full-size codec takes minutes to compile
    # cold; warm runs (e.g. the driver's bench pass) skip straight to execution.
    # MOSS_BENCH_CACHE_DIR points cold-path experiments at a scratch cache
    # without invalidating the repo's warm .jax_cache.
    cache_dir = os.environ.get("MOSS_BENCH_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from moss_ttsd_tpu.core.config import (ChannelSamplingConfig, CodecConfig,
                                           LMConfig, SamplingConfig)
    from moss_ttsd_tpu.decode.engine import GenerationEngine
    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    from moss_ttsd_tpu.models.lm import AsteroidLM

    B = 8
    PROMPT_LEN = 64
    DECODE_STEPS = 256
    FRAME_RATE = 12.5
    NORTH_STAR_RTF = 5.0

    # full 1.7B geometry; the whole vocab counts as "speech" so random weights
    # never trigger the EOS flush and the decode runs full length
    cfg = LMConfig()
    cfg = type(cfg)(**{**cfg.to_dict(),
                       "speech_token_range": (0, cfg.vocab_size),
                       "param_dtype": "bfloat16"})
    rng = jax.random.PRNGKey(0)

    # COLD-PATH DESIGN (VERDICT r4 #1): everything on the axon backend
    # compiles REMOTELY at first execution (PALLAS_AXON_REMOTE_COMPILE=1) and
    # block_until_ready does NOT force queued work — only value readbacks do.
    # So (a) the random weights are initialized DIRECTLY in the int8 serving
    # layout by ONE jitted init program (per-leaf host-side init + separate
    # quantize used to queue ~500 little programs whose remote compiles
    # dominated the old "first call" — BENCH_r04's 1105.7 s), and (b) every
    # phase below forces a readback so the artifact attributes remote time to
    # the phase that caused it.
    import dataclasses
    t_phase = time.perf_counter()
    qcfg = dataclasses.replace(cfg, quantized=True)
    qmodel = AsteroidLM(qcfg)
    print("init LM params (int8 serving layout, one program)...",
          file=sys.stderr)
    params = jax.jit(lambda k: qmodel.init(
        k, jnp.zeros((1, 8, cfg.channels), jnp.int32)))(rng)
    _ = float(jnp.sum(params["params"]["final_norm"]["weight"]))
    init_s = time.perf_counter() - t_phase
    print(f"param init (dispatch + exec): {init_s:.1f}s", file=sys.stderr)

    nprng = np.random.default_rng(0)
    ids = np.full((B, PROMPT_LEN, cfg.channels), cfg.speech_pad_token, np.int64)
    ids[..., 0] = nprng.integers(1, 10000, (B, PROMPT_LEN))
    mask = np.ones((B, PROMPT_LEN), np.int64)

    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=True, temperature=0.9,
                                        top_k=50, top_p=0.95)
                  for _ in range(cfg.channels)],
        max_new_tokens=DECODE_STEPS,
        approx_topk=True)
    # the tree is already in quantized layout -> the engine skips the cast
    # and per-leaf quantize programs entirely
    t_phase = time.perf_counter()
    engine = GenerationEngine(cfg, params, sampling, bucket=PROMPT_LEN,
                              quant="int8")
    engine_init_s = time.perf_counter() - t_phase
    del params

    print("compile + run generate...", file=sys.stderr)
    # record whether this first call ran against a warm persistent cache —
    # the artifact is ambiguous without it (r3/r4 recorded cold LM compiles
    # next to warm codec ones and nobody could tell)
    pre_cache = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    t0 = time.perf_counter()
    max_steps, buf_steps = engine._step_budget(DECODE_STEPS, ids.shape[1])
    ids_b, mask_b, base = engine._bucket_prompt(ids, mask)
    prefill, run = engine._get_fns(base, buf_steps)
    state = prefill(engine.params, jnp.asarray(ids_b), jnp.asarray(mask_b),
                    jax.random.PRNGKey(0), None, None)
    prefill_client_s = time.perf_counter() - t0
    _ = float(jnp.sum(state.last_pos.astype(jnp.float32)))
    t1 = time.perf_counter()
    prefill_remote_s = t1 - t0 - prefill_client_s
    state = run(engine.params, state, jnp.int32(max_steps), None, None)
    run_client_s = time.perf_counter() - t1
    _ = int(state.step)
    run_remote_s = time.perf_counter() - t1 - run_client_s
    first_call_s = time.perf_counter() - t0
    del state
    post_cache = (set(os.listdir(cache_dir)) if os.path.isdir(cache_dir)
                  else set())
    lm_cache_misses = sum(1 for f in post_cache - pre_cache
                          if "prefill" in f or "run" in f)
    print(f"first call (compile + run): {first_call_s:.1f}s "
          f"[prefill client {prefill_client_s:.1f} + remote "
          f"{prefill_remote_s:.1f}; run client {run_client_s:.1f} + remote "
          f"{run_remote_s:.1f}; param init {init_s:.1f}; engine init "
          f"{engine_init_s:.1f}]", file=sys.stderr)

    # best-of-3: the axon tunnel adds run-to-run wall-clock jitter
    decode_s = None
    for i in range(3):
        t0 = time.perf_counter()
        res = engine.generate(ids, mask, max_new_tokens=DECODE_STEPS, seed=1 + i)
        dt = time.perf_counter() - t0
        decode_s = dt if decode_s is None else min(decode_s, dt)
    steps = res.steps
    print(f"decode: {steps} steps @ batch {B} in {decode_s:.2f}s "
          f"({steps / decode_s:.1f} steps/s)", file=sys.stderr)

    # restricted_text_head variant (opt-in serving policy): channel-0 logits
    # over the ~1030-row speech window instead of the full 152k table. The
    # headline keeps the exact full-vocab path; this field records the
    # opt-in's measured value in the artifact of record. The window
    # [151665, 152695) covers speech + <|end_of_speech|>; counting the whole
    # window as "speech" keeps random weights from EOS-flushing, mirroring
    # the full-vocab trick above.
    cfg_r = type(cfg)(**{**cfg.to_dict(),
                         "speech_token_range": (151665, 152695),
                         "restricted_text_head": True})
    engine_r = GenerationEngine(cfg_r, engine.params, sampling,
                                bucket=PROMPT_LEN, quant="int8")
    engine_r.generate(ids, mask, max_new_tokens=DECODE_STEPS, seed=0)
    decode_r_s = None
    for i in range(3):
        t0 = time.perf_counter()
        res_r = engine_r.generate(ids, mask, max_new_tokens=DECODE_STEPS,
                                  seed=1 + i)
        dt = time.perf_counter() - t0
        decode_r_s = dt if decode_r_s is None else min(decode_r_s, dt)
    # the (0, vocab) speech_token_range override makes every token count as
    # speech, so an early stop indicates a config regression — fail loudly
    # rather than silently mixing step counts between the two methodologies
    steps_r = int(res_r.steps)
    assert steps_r == DECODE_STEPS, (
        f"restricted-head run stopped early ({steps_r}/{DECODE_STEPS} steps)")
    print(f"decode (restricted_text_head): {steps_r} steps in "
          f"{decode_r_s:.2f}s ({steps_r / decode_r_s:.1f} steps/s)",
          file=sys.stderr)
    del engine_r

    print("init codec + vocode...", file=sys.stderr)
    spt = XYTokenizer.init_random(CodecConfig(), seed=0, dtype="bfloat16")
    codes = [nprng.integers(0, 1024, (8, steps)).astype(np.int32)
             for _ in range(B)]
    t0 = time.perf_counter()
    spt.decode(codes, overlap_seconds=10, pcm16=True,
               rows_per_call=4)   # compile
    codec_compile_s = time.perf_counter() - t0
    print(f"codec first call (compile + run): {codec_compile_s:.1f}s",
          file=sys.stderr)
    # best-of-5: vocode wall time is dominated by the device->host audio
    # readback, whose bandwidth through the axon tunnel swings 4-60 MB/s
    # run-to-run (measured 0.89-1.97 s for the same call within one hour)
    vocode_s = None
    for _ in range(5):
        t0 = time.perf_counter()
        out = spt.decode(codes, overlap_seconds=10, pcm16=True,
                         rows_per_call=4)
        dt = time.perf_counter() - t0
        vocode_s = dt if vocode_s is None else min(vocode_s, dt)
    audio_sec = sum(len(w) for w in out["syn_wav_list"]) / spt.output_sample_rate
    print(f"vocode: {audio_sec:.1f}s audio in {vocode_s:.2f}s", file=sys.stderr)

    # calibrate the pure device->host transfer share of the vocode phase:
    # through the axon tunnel the audio readback runs at 3-60 MB/s depending
    # on the moment, swinging the e2e number ~2x for identical compute. The
    # headline stays the honest wall-clock e2e; the extra fields record the
    # transfer tax so runs are comparable across tunnel conditions.
    # fresh RANDOM payload per trial: constant/repeated buffers get
    # compressed or relay-cached by the tunnel and measure ~0 s
    n_samp = int(audio_sec / B * spt.output_sample_rate)
    transfer_s = None
    for i in range(3):
        pcm = jax.random.randint(jax.random.PRNGKey(i), (B, n_samp),
                                 -32768, 32767, jnp.int32).astype(jnp.int16)
        pcm.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(pcm)
        dt = time.perf_counter() - t0
        transfer_s = dt if transfer_s is None else min(transfer_s, dt)
    print(f"transfer calibration: {audio_sec:.0f}s of int16 audio in "
          f"{transfer_s:.2f}s", file=sys.stderr)

    # sustained steady-state serving: K batches back-to-back; batch i's
    # vocode dispatches right after its decode (device stream), a reader
    # thread pulls its PCM back while batch i+1's decode computes. Fresh
    # random codes per batch — repeated payloads get relay-cached by the
    # tunnel and would fake a ~0-cost readback.
    from concurrent.futures import ThreadPoolExecutor
    K = 3
    batches = [[nprng.integers(0, 1024, (8, steps)).astype(np.int32)
                for _ in range(B)] for _ in range(K)]

    def readback(inc, codes):
        return inc.finish(codes)["syn_wav_list"]

    with ThreadPoolExecutor(1) as pool:
        t0 = time.perf_counter()
        futs = []
        for i in range(K):
            engine.generate(ids, mask, max_new_tokens=DECODE_STEPS,
                            seed=10 + i)
            inc = spt.incremental_decoder(overlap_seconds=10, pcm16=True,
                                          rows_per_call=4)
            inc.feed(batches[i])            # async vocode dispatch
            futs.append(pool.submit(readback, inc, batches[i]))
        total_audio = sum(sum(len(w) for w in f.result())
                          for f in futs) / spt.output_sample_rate
        sustained_s = time.perf_counter() - t0
    rtf_sustained = total_audio / sustained_s
    print(f"sustained: {K} batches, {total_audio:.1f}s audio in "
          f"{sustained_s:.2f}s", file=sys.stderr)

    rtf = audio_sec / (decode_s + vocode_s)
    rtf_excl = audio_sec / (decode_s + max(vocode_s - transfer_s, 0.01))
    # tunnel-bandwidth evidence (VERDICT r4 #7): the measured link rate for
    # the calibrated PCM payload, and the sustained pipeline re-projected
    # onto a PCIe-class link (16 GB/s): the tunnel readbacks serialize on
    # link bandwidth (they exceed a decode's wall time), so the projection
    # swaps the K measured batch-readback times for PCIe-rate transfers.
    pcm_bytes = B * n_samp * 2
    tunnel_mbps = pcm_bytes / max(transfer_s, 1e-9) / 1e6
    sustained_pcie_s = max(sustained_s - K * transfer_s
                           + K * pcm_bytes / 16e9, 1e-6)
    rtf_sustained_pcie = total_audio / sustained_pcie_s
    print(json.dumps({
        "metric": "e2e_synthesis_rtf_batch8_per_chip",
        "value": round(rtf, 2),
        "unit": "audio_sec_per_wall_sec",
        "vs_baseline": round(rtf / NORTH_STAR_RTF, 2),
        "decode_steps_per_s": round(steps / decode_s, 1),
        "decode_steps_per_s_restricted_head": round(steps_r / decode_r_s, 1),
        "transfer_tax_s": round(transfer_s, 2),
        "tunnel_MBps": round(tunnel_mbps, 1),
        "rtf_sustained_3batch": round(rtf_sustained, 2),
        "rtf_sustained_projected_pcie": round(rtf_sustained_pcie, 2),
        "rtf_excl_host_transfer": round(rtf_excl, 2),
        "codec_first_call_s": round(codec_compile_s, 1),
        "lm_first_call_s": round(first_call_s, 1),
        "lm_first_call_cold": lm_cache_misses > 0,
        "lm_first_call_breakdown_s": {
            "param_init": round(init_s, 1),
            "engine_init": round(engine_init_s, 1),
            "prefill_client": round(prefill_client_s, 1),
            "prefill_remote": round(prefill_remote_s, 1),
            "run_client": round(run_client_s, 1),
            "run_remote": round(run_remote_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
