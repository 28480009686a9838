"""Decode engine tests: the jitted lax.while_loop generator vs a step-by-step
Python oracle implementing the reference's _sample semantics
(modeling_asteroid.py:52-197), plus sampling-op parity vs HF processors.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_ttsd_tpu.core.config import ChannelSamplingConfig, LMConfig, SamplingConfig
from moss_ttsd_tpu.decode.engine import GenerationEngine
from moss_ttsd_tpu.models.lm import AsteroidLM
from moss_ttsd_tpu.ops.sampling import (ChannelParams, apply_repetition_penalty,
                                        presence_from_history,
                                        sample_from_channel, top_p_mask_sorted)
from moss_ttsd_tpu.pipeline.prompt import (find_max_valid_positions,
                                           left_pad_batch, shift_delay_pattern,
                                           unshift_outputs)


def tiny_cfg():
    return LMConfig(dtype="float32", param_dtype="float32").tiny()


def greedy_sampling(channels=8):
    return SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=False, temperature=None,
                                        top_k=None, top_p=None)
                  for _ in range(channels)],
        max_new_tokens=24)


def python_oracle_generate(model, params, cfg, tf_inputs, attn_mask, max_steps):
    """Reference-semantics greedy decode loop (modeling_asteroid.py:52-197),
    executed step-by-step with the full no-cache forward."""
    C = cfg.channels
    B, L, _ = tf_inputs.shape
    eos = cfg.eos_token_id
    ids = tf_inputs[:, :L - (C - 1)].copy()
    mask = attn_mask[:, :L - (C - 1)].copy()
    base = ids.shape[1]
    needs = -np.ones(B, np.int64)
    unfinished = np.ones(B, np.int64)

    for _ in range(max_steps):
        t_logits, s_logits = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        t_logits = np.asarray(t_logits[:, -1]).copy()
        s_logits = np.asarray(s_logits[:, -1]).copy()

        cur = ids.shape[1]
        for i in range(1, C):
            if cur + 1 > L - (C - 1) + i:
                s_logits[:, i - 1, cfg.speech_pad_token] = -np.inf
        if cur + 1 <= L:
            t_logits[:, eos] = -np.inf

        next_tokens = np.zeros((B, C), np.int64)
        next_tokens[:, 0] = t_logits.argmax(-1)
        next_tokens[:, 1:] = s_logits.argmax(-1)

        lo, hi = cfg.speech_token_range
        not_speech = ~((next_tokens[:, 0] >= lo) & (next_tokens[:, 0] < hi))
        trig = not_speech & (needs < 0)
        needs[trig] = C - 1

        if cur + 1 <= L:
            i = cur + 1 - base
            next_tokens[:, i:] = tf_inputs[:, cur, i:]

        m = (needs > 0) & (needs < C - 1)
        if m.any():
            next_tokens[m, 0] = eos
            for i in range(1, C):
                mi = m & (needs < C - i)
                next_tokens[mi, i] = cfg.speech_pad_token

        for i in range(C):
            pddp = eos if i == 0 else cfg.speech_pad_token
            next_tokens[:, i] = next_tokens[:, i] * unfinished + pddp * (1 - unfinished)

        ids = np.concatenate([ids, next_tokens[:, None, :]], axis=1)
        mask = np.concatenate([mask, np.ones((B, 1), mask.dtype)], axis=1)

        needs = np.where(needs > 0, needs - 1, needs)
        stopping = (next_tokens[:, 0] == eos) | (needs == 0)
        unfinished = unfinished & ~stopping
        unfinished = unfinished | (needs > 0)
        if unfinished.max() == 0:
            break
    return ids


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    dummy = np.zeros((1, 4, cfg.channels), np.int64)
    params = model.init(jax.random.PRNGKey(7), jnp.asarray(dummy))
    return cfg, model, params


def make_prompt(cfg, rng, text_len, audio_len):
    """A shifted prompt: text-channel tokens + speech tokens in delay pattern."""
    ids = np.full((text_len + audio_len, cfg.channels), cfg.speech_pad_token,
                  np.int64)
    ids[:text_len, 0] = rng.integers(1, 90, text_len)
    lo, hi = cfg.speech_token_range
    ids[text_len:, 0] = rng.integers(lo, hi, audio_len)
    for i in range(1, cfg.channels):
        ids[text_len:, i] = rng.integers(0, cfg.speech_pad_token, audio_len)
    return shift_delay_pattern(ids, cfg.pad_token_id, cfg.speech_pad_token)


def test_engine_matches_python_oracle_greedy(setup):
    cfg, model, params = setup
    rng = np.random.default_rng(0)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id, cfg.speech_pad_token)

    max_steps = 20
    oracle = python_oracle_generate(model, params, cfg, batch, mask, max_steps)

    engine = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                              bucket=batch.shape[1], cache_dtype=jnp.float32)
    res = engine.generate(batch, mask, max_new_tokens=max_steps, seed=0)

    # oracle's generated region starts at L-(C-1); engine's at res.base
    C = cfg.channels
    o_gen = oracle[:, batch.shape[1] - (C - 1):]
    e_gen = res.tokens[:, res.base:]
    n = min(o_gen.shape[1], e_gen.shape[1])
    np.testing.assert_array_equal(e_gen[:, :n], o_gen[:, :n])
    assert res.steps == o_gen.shape[1]


def test_engine_bucketing_invariance(setup):
    """Extra left-padding from bucketing must not change greedy outputs."""
    cfg, model, params = setup
    rng = np.random.default_rng(1)
    prompts = [make_prompt(cfg, rng, 5, 3)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id, cfg.speech_pad_token)

    r1 = GenerationEngine(cfg, params, greedy_sampling(), bucket=batch.shape[1],
                          cache_dtype=jnp.float32).generate(batch, mask, 12)
    r2 = GenerationEngine(cfg, params, greedy_sampling(), bucket=64,
                          cache_dtype=jnp.float32).generate(batch, mask, 12)
    np.testing.assert_array_equal(r1.tokens[:, r1.base:], r2.tokens[:, r2.base:])


def test_compile_cache_bounded_mixed_workload(setup):
    """A mixed workload (varying max_new_tokens and prompt lengths) compiles a
    bounded number of programs: max_steps is bucketed into buffer capacity and
    the actual bound is a dynamic scalar, so requests share compiled pairs."""
    cfg, model, params = setup
    rng = np.random.default_rng(5)
    engine = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                              cache_dtype=jnp.float32, step_bucket=64,
                              max_cached_programs=4)
    for text_len, steps in [(5, 10), (6, 25), (7, 40), (5, 63), (6, 12),
                            (8, 30)]:
        prompts = [make_prompt(cfg, rng, text_len, 3)]
        batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                     cfg.speech_pad_token)
        engine.generate(batch, mask, max_new_tokens=steps, seed=0)
    # every prompt buckets to 32 and every step count to 64 -> ONE program pair
    assert len(engine._compiled) == 1

    # exceed the LRU cap -> evictions keep the cache bounded
    for steps in [70, 140, 200, 260, 330]:
        prompts = [make_prompt(cfg, rng, 5, 3)]
        batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                     cfg.speech_pad_token)
        engine.generate(batch, mask, max_new_tokens=steps, seed=0)
    assert len(engine._compiled) <= 4


def test_engine_rejects_bad_budgets_and_config(setup):
    """Constructor and generate() reject configurations that previously
    failed deep inside jit (or silently substituted a default): a
    step_bucket too small for the teacher-forcing tail, a zero compile
    cache, and an explicit max_new_tokens=0 (the old `x or default`
    pattern decoded a full default budget for it)."""
    cfg, model, params = setup
    with pytest.raises(ValueError, match="step_bucket"):
        GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                         bucket=32, step_bucket=cfg.channels - 2)
    with pytest.raises(ValueError, match="max_cached_programs"):
        GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                         bucket=32, max_cached_programs=0)
    eng = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                           bucket=32, cache_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    p = make_prompt(cfg, rng, 6, 4)
    batch, mask = left_pad_batch([p], cfg.pad_token_id, cfg.speech_pad_token)
    with pytest.raises(ValueError, match="must be >= 1"):
        eng.generate(batch, mask, max_new_tokens=0)


def test_max_length_total_cap(setup):
    """SamplingConfig.max_length is a TOTAL length cap with the reference's
    counting: the loop starts from the shifted prompt MINUS its channels-1
    teacher-forcing rows (modeling_asteroid.py:88-89), so steps run =
    max_length - (prompt_len - channels + 1)."""
    cfg, model, params = setup
    rng = np.random.default_rng(6)
    prompts = [make_prompt(cfg, rng, 6, 4)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                 cfg.speech_pad_token)
    L = batch.shape[1]
    counted = L - cfg.channels + 1           # reference's starting cur_len
    sampling = greedy_sampling()
    sampling.max_length = counted + 5
    sampling.max_new_tokens = 100
    engine = GenerationEngine(cfg, params, sampling, bucket=L,
                              cache_dtype=jnp.float32, step_bucket=64)
    res = engine.generate(batch, mask, seed=0)
    assert res.steps <= 5
    # explicit max_new_tokens overrides the config cap
    res2 = engine.generate(batch, mask, max_new_tokens=8, seed=0)
    assert res2.steps <= 8 and res2.steps > 5


def test_shift_unshift_roundtrip():
    cfg = tiny_cfg()
    rng = np.random.default_rng(2)
    T, C = 11, 8
    ids = rng.integers(0, 1024, (T, C)).astype(np.int64)
    shifted = shift_delay_pattern(ids, cfg.pad_token_id)
    assert shifted.shape == (T + C - 1, C)
    # treat the shifted prompt as "generated from row 0": unshift inverts
    from moss_ttsd_tpu.pipeline.prompt import SPEECH_OFFSET
    rec = unshift_outputs(shifted[None], base=0, channels=C)
    rec[..., 0] += SPEECH_OFFSET
    np.testing.assert_array_equal(rec[0], ids)


def test_find_max_valid_positions():
    x = np.full((2, 5, 8), 1024, np.int64)
    x[0, 2, 1] = 7
    li = find_max_valid_positions(x)
    np.testing.assert_array_equal(li, [2, -1])


# ---------------------------------------------------------------------------
# Sampling-op parity vs HF logits processors
# ---------------------------------------------------------------------------

def test_repetition_penalty_matches_hf():
    import torch
    from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor
    rng = np.random.default_rng(3)
    V = 50
    logits = rng.standard_normal((2, V)).astype(np.float32)
    hist = rng.integers(0, V, (2, 12))
    hf = RepetitionPenaltyLogitsProcessor(penalty=1.3)(
        torch.from_numpy(hist), torch.from_numpy(logits.copy())).numpy()
    presence = presence_from_history(jnp.asarray(hist), V)
    ours = apply_repetition_penalty(jnp.asarray(logits), presence, 1.3)
    np.testing.assert_allclose(np.asarray(ours), hf, atol=1e-6)


def test_top_p_mask_matches_hf():
    import torch
    from transformers.generation.logits_process import TopPLogitsWarper
    rng = np.random.default_rng(4)
    V = 40
    logits = rng.standard_normal((3, V)).astype(np.float32) * 2
    hf = TopPLogitsWarper(top_p=0.8)(None, torch.from_numpy(logits.copy())).numpy()
    hf_kept = hf > -1e9

    order = np.argsort(-logits, axis=-1)
    sorted_logits = np.take_along_axis(logits, order, axis=-1)
    keep_sorted = np.asarray(top_p_mask_sorted(jnp.asarray(sorted_logits), 0.8))
    ours_kept = np.zeros_like(hf_kept)
    np.put_along_axis(ours_kept, order, keep_sorted, axis=-1)
    np.testing.assert_array_equal(ours_kept, hf_kept)


def test_exact_top_p_matches_hf_adversarial():
    """exact_top_p (full-vocab nucleus, no top_k) vs HF TopPLogitsWarper on
    distributions whose nucleus exceeds the static prefilter (VERDICT r4 #8):
    the default prefilter path WOULD truncate these; the exact path's keep-set
    must equal HF's token for token."""
    import torch
    from transformers.generation.logits_process import (TemperatureLogitsWarper,
                                                        TopPLogitsWarper)
    from moss_ttsd_tpu.ops.sampling import exact_top_p_mask, processed_logits

    rng = np.random.default_rng(11)
    V = 2000
    cases = []
    # near-uniform over 600 ids: nucleus ~540 >> prefilter 128
    x = np.full((1, V), -20.0, np.float32)
    x[0, rng.choice(V, 600, replace=False)] = rng.standard_normal(600) * 0.01
    cases.append((x, 0.9))
    # heavy geometric decay: tiny nucleus (prefilter path also exact here)
    y = (-np.arange(V, dtype=np.float32) * 0.5)[None, :].copy()
    rng.shuffle(y[0])
    cases.append((y, 0.95))
    # flat-ish everything: nucleus ~ top_p * V
    cases.append((rng.standard_normal((2, V)).astype(np.float32) * 0.05, 0.8))
    # top_p ~ 1: nucleus is nearly the whole vocab
    cases.append((rng.standard_normal((1, V)).astype(np.float32), 0.999))
    for temp in (1.0, 0.7):
        for logits, top_p in cases:
            hf = torch.from_numpy(logits.copy())
            if temp != 1.0:
                hf = TemperatureLogitsWarper(temperature=temp)(None, hf)
            hf = TopPLogitsWarper(top_p=top_p)(None, hf).numpy()
            hf_kept = hf > -1e9
            assert hf_kept.sum() > 0
            mask = np.asarray(exact_top_p_mask(
                jnp.asarray(logits) / temp, top_p))
            np.testing.assert_array_equal(mask, hf_kept,
                                          err_msg=f"top_p={top_p} temp={temp}")
            # the dense processed_logits path agrees (and proves the exact
            # branch engages without top_k)
            p = ChannelParams(do_sample=True, temperature=temp, top_k=0,
                              top_p=top_p, repetition_penalty=1.0,
                              exact_top_p=True)
            presence = jnp.zeros(logits.shape, bool)
            dense = np.asarray(processed_logits(jnp.asarray(logits), presence,
                                                p, prefilter_k=128))
            np.testing.assert_array_equal(dense > -1e9, hf_kept)
            np.testing.assert_allclose(dense[hf_kept],
                                       (logits / temp)[hf_kept], rtol=1e-6)


def test_exact_top_p_sampler_reaches_beyond_prefilter():
    """The exact sampler can draw ids the 128-wide prefilter path can never
    emit, and never draws outside the HF nucleus."""
    from moss_ttsd_tpu.ops.sampling import (exact_top_p_mask,
                                            sample_from_channel_rowkeys)
    rng = np.random.default_rng(12)
    V = 1000
    logits = jnp.asarray(rng.standard_normal((4, V)).astype(np.float32) * 0.01)
    p = ChannelParams(do_sample=True, temperature=1.0, top_k=0, top_p=0.95,
                      repetition_penalty=1.0, exact_top_p=True)
    kept = np.asarray(exact_top_p_mask(logits, 0.95))
    assert kept.sum(-1).min() > 500          # nucleus far beyond prefilter
    prefilter_ids = np.argsort(-np.asarray(logits), axis=-1)[:, :128]
    seen_outside = False
    for seed in range(40):
        toks = np.asarray(sample_from_channel(jax.random.PRNGKey(seed),
                                              logits, p))
        for b in range(4):
            assert kept[b, toks[b]]
            seen_outside |= toks[b] not in prefilter_ids[b]
    assert seen_outside
    # rowkeys variant (continuous pool) bit-matches the batch-1 static draw
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4, dtype=jnp.uint32))
    row = np.asarray(sample_from_channel_rowkeys(keys, logits, p))
    for b in range(4):
        single = np.asarray(sample_from_channel(
            jax.vmap(jax.random.PRNGKey)(jnp.asarray([b], jnp.uint32))[0],
            logits[b:b + 1], p))
        assert row[b] == single[0]


def test_sample_from_channel_respects_topk_topp():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((4, 100)).astype(np.float32) * 3)
    p = ChannelParams(do_sample=True, temperature=0.8, top_k=5, top_p=0.9,
                      repetition_penalty=1.0)
    top5 = np.argsort(-np.asarray(logits), axis=-1)[:, :5]
    for seed in range(20):
        toks = np.asarray(sample_from_channel(jax.random.PRNGKey(seed), logits, p))
        for b in range(4):
            assert toks[b] in top5[b]


def test_greedy_equals_argmax():
    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
    p = ChannelParams(do_sample=False, temperature=1.0, top_k=0, top_p=1.0,
                      repetition_penalty=1.0)
    toks = np.asarray(sample_from_channel(jax.random.PRNGKey(0), logits, p))
    np.testing.assert_array_equal(toks, np.asarray(jnp.argmax(logits, -1)))


def test_decode_len_bucket_token_identical():
    """Length-aware decode attention (decode_len_bucket, lax.switch over
    static cache prefixes) must not change generation: every valid key lives
    below the selected prefix, so the attention result is the same — checked
    token-exactly on the fp32 CPU path against the full-buffer engine."""
    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(5),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))
    rng = np.random.default_rng(21)
    prompts = [make_prompt(cfg, rng, 6 + i, 3) for i in range(2)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                 cfg.speech_pad_token)

    full = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                            cache_dtype=jnp.float32, step_bucket=64)
    bucketed = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                                cache_dtype=jnp.float32, step_bucket=64,
                                decode_len_bucket=32)
    a = full.generate(batch, mask, max_new_tokens=40, seed=0)
    b = bucketed.generate(batch, mask, max_new_tokens=40, seed=0)
    assert a.steps == b.steps
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_get_fns_cache_thread_safe(monkeypatch):
    """The HTTP streaming handler and the batching worker drive one engine
    from different threads; hammer the LRU compile cache (capacity 1, so
    every alternate key evicts) from 4 threads and require every lookup to
    return a usable pair — the unlocked dict raced check/insert/popitem."""
    import threading

    from moss_ttsd_tpu.decode import engine as engine_mod

    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))
    eng = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                           cache_dtype=jnp.float32, max_cached_programs=1)

    def fake_build(model, cfg, sampling, base, buf_steps, cache_dtype):
        return (lambda *a: ("prefill", base, buf_steps),
                lambda *a: ("run", base, buf_steps))

    monkeypatch.setattr(engine_mod, "_build_generate_fn", fake_build)
    errors = []

    def worker(tid):
        try:
            for i in range(200):
                base = 32 * (1 + (i + tid) % 3)
                prefill, run = eng._get_fns(base, 64)
                assert prefill is not None and run is not None
        except Exception as e:                      # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_max_length_already_met_generates_zero(setup):
    """A prompt already at/over sampling.max_length generates 0 new tokens
    (HF MaxLengthCriteria; the engine used to force one step), in both the
    one-shot and streaming paths."""
    cfg, model, params = setup
    rng = np.random.default_rng(7)
    prompts = [make_prompt(cfg, rng, 6, 4)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                 cfg.speech_pad_token)
    L = batch.shape[1]
    sampling = greedy_sampling()
    sampling.max_length = L - cfg.channels + 1   # counted length == cap
    sampling.max_new_tokens = 100
    engine = GenerationEngine(cfg, params, sampling, bucket=L,
                              cache_dtype=jnp.float32, step_bucket=64)
    res = engine.generate(batch, mask, seed=0)
    assert res.steps == 0
    assert res.tokens.shape[1] == res.base       # prompt only, no new rows
    outs = list(engine.generate_stream(batch, mask, seed=0))
    assert len(outs) == 1 and outs[0].steps == 0
    assert not outs[0].unfinished.any()
