"""restricted_text_head: the decode-only channel-0 head that computes logits
over just the speech-token window (core/config.py LMConfig.restricted_text_head,
models/lm.py logits_all).

The contract under test: a restricted run is BITWISE token-identical to a
full-vocab run whose text logits outside cfg.text_head_window() are set to
-inf before the logits processors (the "any non-speech token" EOS trigger of
reference modeling_asteroid.py:140-141 thereby collapses onto the
<|end_of_speech|> id, which sits inside the window).
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_ttsd_tpu.core.config import (ChannelSamplingConfig, LMConfig,
                                       SamplingConfig)
from moss_ttsd_tpu.decode.continuous import ContinuousBatcher
from moss_ttsd_tpu.decode.engine import (GenerationEngine, sample_channels,
                                         sample_channels_rowkeys)
from moss_ttsd_tpu.models.lm import AsteroidLM
from moss_ttsd_tpu.ops.attention import NEG_INF
from moss_ttsd_tpu.ops.sampling import ChannelParams
from moss_ttsd_tpu.pipeline.prompt import left_pad_batch, shift_delay_pattern


def tiny_cfg(**kw):
    return LMConfig(dtype="float32", param_dtype="float32").tiny(**kw)


def sampled_sampling(channels=8, top_k=8):
    return SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=True, temperature=0.9,
                                        top_k=top_k, top_p=0.9,
                                        repetition_penalty=1.3)
                  for _ in range(channels)],
        max_new_tokens=16)


def make_prompt(cfg, rng, text_len, audio_len):
    ids = np.full((text_len + audio_len, cfg.channels), cfg.speech_pad_token,
                  np.int64)
    ids[:text_len, 0] = rng.integers(1, 90, text_len)   # below-window text ids
    lo, hi = cfg.speech_token_range
    ids[text_len:, 0] = rng.integers(lo, hi, audio_len)
    for i in range(1, cfg.channels):
        ids[text_len:, i] = rng.integers(0, cfg.speech_pad_token, audio_len)
    return shift_delay_pattern(ids, cfg.pad_token_id, cfg.speech_pad_token)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    dummy = np.zeros((1, 4, cfg.channels), np.int64)
    params = model.init(jax.random.PRNGKey(7), jnp.asarray(dummy))
    return cfg, model, params


def test_window_covers_speech_and_eos():
    cfg = dataclasses.replace(tiny_cfg(), restricted_text_head=True)
    lo, hi = cfg.text_head_window()
    assert lo == cfg.speech_token_range[0]
    assert hi == cfg.eos_token_id + 1 >= cfg.speech_token_range[1]
    # full vocab when the flag is off
    assert tiny_cfg().text_head_window() == (0, tiny_cfg().vocab_size)
    # eos outside the window is a config error (generation could never stop)
    bad = dataclasses.replace(tiny_cfg(eos_token_id=5),
                              restricted_text_head=True)
    with pytest.raises(ValueError):
        bad.text_head_window()


def _masked_full(t_logits, lo, hi):
    t = t_logits.at[..., :lo].set(NEG_INF)
    return t.at[..., hi:].set(NEG_INF)


@pytest.mark.parametrize("rowkeys", [False, True])
def test_sampler_window_matches_masked_full(rowkeys):
    """sample_channels over the sliced window + offset == sample_channels
    over the full vocab with out-of-window logits at -inf, bit for bit,
    including repetition penalty against a presence that (in the full run)
    marks below-window prompt ids."""
    cfg = dataclasses.replace(tiny_cfg(), restricted_text_head=True)
    lo, hi = cfg.text_head_window()
    V, C = cfg.vocab_size, cfg.channels
    B = 3
    rng = np.random.default_rng(0)
    text_logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32))
    speech_logits = jnp.asarray(
        rng.normal(size=(B, C - 1, cfg.speech_vocab_size)).astype(np.float32))
    # presence: some below-window prompt ids + some in-window ids
    presence_full = np.zeros((B, V), bool)
    presence_full[:, rng.integers(1, 90, 5)] = True
    in_window = rng.integers(lo, hi, 4)
    presence_full[:, in_window] = True
    presence_speech = np.zeros((B, C - 1, cfg.speech_vocab_size), bool)
    presence_speech[:, :, rng.integers(0, 16, 3)] = True

    ch = [ChannelParams(do_sample=True, temperature=0.9, top_k=8, top_p=0.9,
                        repetition_penalty=1.3)] * C
    key = jax.random.PRNGKey(42)
    keys_b = jax.random.split(jax.random.PRNGKey(9), B)
    for srow_val in (0, C - 1, 5):
        srow = (jnp.full((B,), srow_val, jnp.int32) if rowkeys
                else jnp.int32(srow_val))
        if rowkeys:
            full = sample_channels_rowkeys(
                keys_b, _masked_full(text_logits, lo, hi), speech_logits,
                jnp.asarray(presence_full), jnp.asarray(presence_speech),
                srow, ch, 128, False, cfg.eos_token_id, cfg.speech_pad_token)
            rest = sample_channels_rowkeys(
                keys_b, text_logits[:, lo:hi], speech_logits,
                jnp.asarray(presence_full[:, lo:hi]),
                jnp.asarray(presence_speech), srow, ch, 128, False,
                cfg.eos_token_id, cfg.speech_pad_token, lo)
        else:
            full = sample_channels(
                key, _masked_full(text_logits, lo, hi), speech_logits,
                jnp.asarray(presence_full), jnp.asarray(presence_speech),
                srow, ch, 128, False, cfg.eos_token_id, cfg.speech_pad_token)
            rest = sample_channels(
                key, text_logits[:, lo:hi], speech_logits,
                jnp.asarray(presence_full[:, lo:hi]),
                jnp.asarray(presence_speech), srow, ch, 128, False,
                cfg.eos_token_id, cfg.speech_pad_token, lo)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(rest))
        assert (np.asarray(rest)[:, 0] >= lo).all()


@pytest.mark.parametrize("quant", [None, "int8"])
def test_engine_restricted_matches_masked_full(setup, monkeypatch, quant):
    """Full-pipeline contract: the restricted engine's sampled generation ==
    a full-vocab engine whose logits_all output is masked to the window.
    Covers prefill presence over below-window prompt text (penalty must only
    act inside the window), the EOS flush, and both weight layouts."""
    cfg, model, params = setup
    rng = np.random.default_rng(3)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                 cfg.speech_pad_token)
    sampling = sampled_sampling(cfg.channels)
    lo, hi = dataclasses.replace(cfg,
                                 restricted_text_head=True).text_head_window()

    # restricted engine FIRST (its program must trace the unpatched method)
    eng_r = GenerationEngine(cfg, params, sampling, bucket=batch.shape[1],
                             cache_dtype=jnp.float32, quant=quant,
                             restricted_text_head=True)
    res_r = eng_r.generate(batch, mask, max_new_tokens=12, seed=5)

    orig = AsteroidLM.logits_all

    def masked(self, hidden, restricted=False):
        t, s = orig(self, hidden, restricted)
        return _masked_full(t, lo, hi), s

    monkeypatch.setattr(AsteroidLM, "logits_all", masked)
    eng_f = GenerationEngine(cfg, params, sampling, bucket=batch.shape[1],
                             cache_dtype=jnp.float32, quant=quant)
    res_f = eng_f.generate(batch, mask, max_new_tokens=12, seed=5)

    assert res_r.steps == res_f.steps
    np.testing.assert_array_equal(res_r.tokens[:, res_r.base:],
                                  res_f.tokens[:, res_f.base:])
    gen0 = np.asarray(res_r.tokens[:, res_r.base:, 0])
    assert ((gen0 >= lo) & (gen0 < hi)).all()


def test_restricted_noop_when_window_is_vocab(setup):
    """Plumbing check: when the window spans the whole vocab the restricted
    engine is bit-identical to the plain one (offset 0, same presence)."""
    cfg, model, params = setup
    wide = tiny_cfg(speech_token_range=(0, 160))
    # same weights work: only decode policy differs, not the param tree
    rng = np.random.default_rng(4)
    prompts = [make_prompt(cfg, rng, 5, 3)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                 cfg.speech_pad_token)
    sampling = sampled_sampling(cfg.channels)
    plain = GenerationEngine(wide, params, sampling, bucket=batch.shape[1],
                             cache_dtype=jnp.float32)
    rest = GenerationEngine(wide, params, sampling, bucket=batch.shape[1],
                            cache_dtype=jnp.float32,
                            restricted_text_head=True)
    assert dataclasses.replace(
        wide, restricted_text_head=True).text_head_window() == (0, 160)
    a = plain.generate(batch, mask, max_new_tokens=10, seed=2)
    b = rest.generate(batch, mask, max_new_tokens=10, seed=2)
    assert a.steps == b.steps
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_mesh_restricted_matches_single(setup):
    """Tensor-parallel mesh: the sliced head (a static row window of the
    vocab-sharded tied embedding) must still reproduce the unmeshed
    restricted run — GSPMD has to resolve the window across the "model"-axis
    shards."""
    from moss_ttsd_tpu.parallel.mesh import make_mesh
    cfg, model, params = setup
    rng = np.random.default_rng(21)
    prompts = [make_prompt(cfg, rng, 4 + i % 3, 3) for i in range(8)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                 cfg.speech_pad_token)
    sampling = sampled_sampling(cfg.channels)
    ref = GenerationEngine(cfg, params, sampling, bucket=32,
                           cache_dtype=jnp.float32,
                           restricted_text_head=True).generate(
                               batch, mask, max_new_tokens=12, seed=0)
    eng = GenerationEngine(cfg, params, sampling, bucket=32,
                           cache_dtype=jnp.float32, mesh=make_mesh(data=2,
                                                                   model=4),
                           restricted_text_head=True)
    res = eng.generate(batch, mask, max_new_tokens=12, seed=0)
    assert res.steps == ref.steps
    np.testing.assert_array_equal(res.tokens, ref.tokens)


def test_pipeline_wiring_e2e():
    """The TTSPipeline/serving flag reaches the engine cfg and a restricted
    tiny pipeline still produces audio end-to-end (text -> tokens -> wav)."""
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    pipe = build_tiny_pipeline(restricted_text_head=True)
    assert pipe.lm_cfg.restricted_text_head
    assert pipe.engine.cfg.text_head_window() == (0, 291)   # tiny window
    texts, audio = pipe.process_batch([{"text": "[S1]hello there"}],
                                      max_new_tokens=8)
    assert len(audio) == 1 and audio[0] is not None and len(audio[0]) > 0


def test_pool_restricted_matches_restricted_engine(setup):
    """The continuous pool with restricted_text_head reproduces the
    restricted static engine per request (seeded sampled run, mid-flight
    join) — same scaffolding as the pool's rng-parity test, now with the
    window-sliced presence riding the splice."""
    cfg, model, params = setup
    sampling = sampled_sampling(cfg.channels)
    base = 32

    def isolated(prompt, steps, seed):
        batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                     cfg.speech_pad_token)
        eng = GenerationEngine(cfg, params, sampling,
                               bucket=base + cfg.channels - 1,
                               cache_dtype=jnp.float32, step_bucket=32,
                               restricted_text_head=True)
        return eng.generate(batch, mask, max_new_tokens=steps, seed=seed)

    rng = np.random.default_rng(7)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 8, 3)]
    expected = [isolated(prompts[0], 14, 123), isolated(prompts[1], 10, 7)]

    cb = ContinuousBatcher(cfg, params, sampling, slots=2, base=base,
                           max_steps=32, cache_dtype=jnp.float32,
                           restricted_text_head=True)
    s0 = cb.submit(prompts[0], max_new_tokens=14, seed=123)
    cb.run(steps=4)
    s1 = cb.submit(prompts[1], max_new_tokens=10, seed=7)
    for _ in range(10):
        cb.run(steps=4)
        if len(cb.finished()) == 2:
            break
    for slot, exp in ((s0, expected[0]), (s1, expected[1])):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


# ---------------------------------------------------------------------------
# Restricted-head AUDIT (cfg.restricted_audit_every, VERDICT r4 #3): every
# N-th step the FULL text head streams once and counts rows where the best
# out-of-window logit beats the window max — the steps where the reference's
# full head plausibly preferred an ordinary text token.
# ---------------------------------------------------------------------------

def _with_text_bias(params, row_slice, delta, seed=0):
    """Return params with embed_text[row_slice] += delta * randn."""
    import copy
    p = jax.tree.map(np.asarray, params)
    emb = p["params"]["embed_text"].copy()
    rng = np.random.default_rng(seed)
    emb[row_slice] = emb[row_slice] + delta * rng.standard_normal(
        emb[row_slice].shape).astype(emb.dtype)
    p = copy.deepcopy(p)
    p["params"]["embed_text"] = emb
    return p


def test_audit_counters_flag_out_of_window_preference(setup):
    cfg, model, params = setup
    lo, hi = 100, 151                      # tiny window (speech + eos)
    rng = np.random.default_rng(3)
    prompt = make_prompt(cfg, rng, 6, 4)
    batch, mask = left_pad_batch([prompt] * 3, cfg.pad_token_id,
                                 cfg.speech_pad_token)
    steps = 12

    # speech-favored weights (a trained model's regime): zero flags
    p_speech = _with_text_bias(params, slice(lo, hi), 3.0)
    eng = GenerationEngine(cfg, p_speech, sampled_sampling(cfg.channels),
                           bucket=16, cache_dtype=jnp.float32, step_bucket=16,
                           restricted_text_head=True, restricted_audit_every=2)
    res = eng.generate(batch, mask, max_new_tokens=steps, seed=0)
    audited, flagged = res.audit
    assert audited > 0
    assert flagged == 0

    # an overwhelmingly attractive ORDINARY text token: every audited row
    # flags (the restriction is masking a token the full head would pick)
    p_text = _with_text_bias(params, slice(5, 6), 30.0)
    eng2 = GenerationEngine(cfg, p_text, sampled_sampling(cfg.channels),
                            bucket=16, cache_dtype=jnp.float32, step_bucket=16,
                            restricted_text_head=True, restricted_audit_every=2)
    res2 = eng2.generate(batch, mask, max_new_tokens=steps, seed=0)
    audited2, flagged2 = res2.audit
    assert audited2 > 0
    assert flagged2 == audited2


def test_audit_does_not_perturb_generation(setup):
    """Auditing is observation-only: token output is bitwise identical with
    and without it (no rng or logits interaction), and audit=None off."""
    cfg, model, params = setup
    rng = np.random.default_rng(5)
    prompt = make_prompt(cfg, rng, 5, 3)
    batch, mask = left_pad_batch([prompt] * 2, cfg.pad_token_id,
                                 cfg.speech_pad_token)
    kw = dict(bucket=16, cache_dtype=jnp.float32, step_bucket=16,
              restricted_text_head=True)
    plain = GenerationEngine(cfg, params, sampled_sampling(cfg.channels),
                             **kw).generate(batch, mask, max_new_tokens=10,
                                            seed=11)
    audited = GenerationEngine(cfg, params, sampled_sampling(cfg.channels),
                               restricted_audit_every=3,
                               **kw).generate(batch, mask, max_new_tokens=10,
                                              seed=11)
    assert plain.audit is None and audited.audit is not None
    assert plain.steps == audited.steps
    np.testing.assert_array_equal(plain.tokens, audited.tokens)
