"""END-TO-END generation parity: our jitted lax.while_loop engine vs the
reference's actual HF decode loop (CustomMixin._sample), run as a test-time
oracle on a small-hidden model with the FULL 152704 text vocab (the reference
hard-codes the speech-end id 152694 — modeling_asteroid.py:127-128 — so the
vocab cannot be shrunk). Greedy, fp32, same converted weights: token-exact."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_oracle import install_reference_stubs, reference_available

from moss_ttsd_tpu.core.config import (ChannelSamplingConfig, LMConfig,
                                       SamplingConfig)
from moss_ttsd_tpu.decode.engine import GenerationEngine
from moss_ttsd_tpu.utils.convert_lm import convert_asteroid_state_dict

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")

VOCAB = 152704
SPEECH_RANGE = (151665, 152690)
EOS = 152694          # hard-coded in reference _sample (:127-128)
PAD_TEXT = 151643
PAD_SPEECH = 1024


@pytest.fixture(scope="module")
def models():
    install_reference_stubs()
    import torch
    from modeling_asteroid import AsteroidTTSConfig, AsteroidTTSInstruct

    torch.manual_seed(0)
    ref_cfg = AsteroidTTSConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, attention_dropout=0.0,
        max_position_embeddings=512,
        channels=8, speech_pad_token=PAD_SPEECH, speech_vocab_size=1025,
        speech_token_range=list(SPEECH_RANGE),
        eos_token_id=EOS, pad_token_id=PAD_TEXT,
        attn_implementation="eager")
    ref_model = AsteroidTTSInstruct(ref_cfg).eval()
    # push some probability mass into the speech range so greedy decode emits
    # speech tokens before stopping
    with torch.no_grad():
        emb = ref_model.model.embedding_list[0].weight
        emb[SPEECH_RANGE[0]:SPEECH_RANGE[1]] += 0.2 * torch.randn(
            SPEECH_RANGE[1] - SPEECH_RANGE[0], emb.shape[1])
    ref_model.tie_weights()

    our_cfg = LMConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-6, rope_theta=10000.0,
        max_position_embeddings=512,
        channels=8, speech_pad_token=PAD_SPEECH, speech_vocab_size=1025,
        speech_token_range=SPEECH_RANGE, eos_token_id=EOS,
        pad_token_id=PAD_TEXT, dtype="float32", param_dtype="float32")
    params = convert_asteroid_state_dict(ref_model.state_dict(), our_cfg)
    return ref_model, our_cfg, params


def make_prompt(rng, text_len, audio_len):
    ids = np.full((text_len + audio_len, 8), PAD_SPEECH, np.int64)
    ids[:text_len, 0] = rng.integers(10, 5000, text_len)
    ids[text_len:, 0] = rng.integers(*SPEECH_RANGE, size=audio_len)
    for c in range(1, 8):
        ids[text_len:, c] = rng.integers(0, PAD_SPEECH, audio_len)
    # delay shift (parity with reference shifting_inputs proven elsewhere)
    from moss_ttsd_tpu.pipeline.prompt import shift_delay_pattern
    return shift_delay_pattern(ids, PAD_TEXT, PAD_SPEECH)


@pytest.mark.parametrize("steps", [24])
def test_greedy_generation_token_exact(models, steps):
    import torch
    from transformers import GenerationConfig

    ref_model, our_cfg, params = models
    rng = np.random.default_rng(3)
    prompts = [make_prompt(rng, 6, 4), make_prompt(rng, 4, 2)]
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    batch, mask = left_pad_batch(prompts, PAD_TEXT, PAD_SPEECH)

    from transformers.cache_utils import DynamicCache
    from transformers.generation.logits_process import LogitsProcessorList
    from transformers.generation.stopping_criteria import (
        EosTokenCriteria, MaxLengthCriteria, StoppingCriteriaList)

    L = batch.shape[1]
    gc = GenerationConfig(max_new_tokens=steps, eos_token_id=EOS,
                          pad_token_id=PAD_TEXT, do_sample=False)
    gc.max_length = L + steps
    gc.do_samples = [False] * 8
    gc.layers = [{} for _ in range(8)]
    stopping = StoppingCriteriaList([MaxLengthCriteria(max_length=L + steps),
                                     EosTokenCriteria(eos_token_id=EOS)])
    # call _sample directly: the installed transformers' generate() passes
    # streamer by keyword, the reference's signature predates that
    with torch.no_grad():
        ref_out = ref_model._sample(
            torch.from_numpy(batch),
            logits_processor=LogitsProcessorList(),
            stopping_criteria=stopping,
            generation_config=gc,
            synced_gpus=False,
            streamer=None,
            attention_mask=torch.from_numpy(mask),
            use_cache=True,
            past_key_values=DynamicCache())
    ref_out = ref_out.numpy()                       # (B, base+steps_ref, 8)

    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=False, temperature=None,
                                        top_k=None, top_p=None)
                  for _ in range(8)],
        max_new_tokens=steps)
    eng = GenerationEngine(our_cfg, params, sampling, bucket=L,
                           cache_dtype=jnp.float32)
    res = eng.generate(batch, mask, max_new_tokens=steps, seed=0)

    # reference trims trailing all-finished rows when every row stopped;
    # compare the overlapping region beyond the prompt
    base = L - 8 + 1
    ref_gen = ref_out[:, base:]
    our_gen = res.tokens[:, base:]
    n = min(ref_gen.shape[1], our_gen.shape[1])
    assert n >= 8, "generation stopped before the EOS flush completed"
    np.testing.assert_array_equal(our_gen[:, :n], ref_gen[:, :n])


@pytest.fixture(scope="module")
def deep_models():
    """8-layer / 8-head geometry (VERDICT r4 #5): deep enough that
    positioning/masking bugs which cancel at 2 layers would compound, with a
    biased non-speech token so one batch row EOS-flushes mid-generation."""
    install_reference_stubs()
    import torch
    from modeling_asteroid import AsteroidTTSConfig, AsteroidTTSInstruct

    torch.manual_seed(1)
    ref_cfg = AsteroidTTSConfig(
        vocab_size=VOCAB, hidden_size=128, intermediate_size=256,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16, rms_norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, attention_dropout=0.0,
        max_position_embeddings=512,
        channels=8, speech_pad_token=PAD_SPEECH, speech_vocab_size=1025,
        speech_token_range=list(SPEECH_RANGE),
        eos_token_id=EOS, pad_token_id=PAD_TEXT,
        attn_implementation="eager")
    ref_model = AsteroidTTSInstruct(ref_cfg).eval()
    with torch.no_grad():
        emb = ref_model.model.embedding_list[0].weight
        # speech mass so greedy decode emits speech...
        emb[SPEECH_RANGE[0]:SPEECH_RANGE[1]] += 0.13 * torch.randn(
            SPEECH_RANGE[1] - SPEECH_RANGE[0], emb.shape[1])
        # ...plus one attractive ORDINARY text token: tuned (d=0.8) so row 0
        # of the test batch greedily picks it immediately — a non-speech
        # token inside the teacher-forcing window, firing the reference's
        # EOS-flush machinery mid-batch (modeling_asteroid.py:140-153) while
        # the other rows decode to the step limit
        emb[5000] += 0.8 * torch.randn(emb.shape[1])
    ref_model.tie_weights()

    our_cfg = LMConfig(
        vocab_size=VOCAB, hidden_size=128, intermediate_size=256,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16, rms_norm_eps=1e-6, rope_theta=10000.0,
        max_position_embeddings=512,
        channels=8, speech_pad_token=PAD_SPEECH, speech_vocab_size=1025,
        speech_token_range=SPEECH_RANGE, eos_token_id=EOS,
        pad_token_id=PAD_TEXT, dtype="float32", param_dtype="float32")
    params = convert_asteroid_state_dict(ref_model.state_dict(), our_cfg)
    return ref_model, our_cfg, params


def _deep_prompts():
    rng = np.random.default_rng(7)
    # voice-clone rows (text + audio-token prompt prefix), a text-only row,
    # and a short row — mixed lengths exercise left-pad bucketing
    return [make_prompt(rng, 8, 10), make_prompt(rng, 6, 4),
            make_prompt(rng, 12, 0), make_prompt(rng, 3, 2)]


def _run_reference(ref_model, batch, mask, steps):
    import torch
    from transformers import GenerationConfig
    from transformers.cache_utils import DynamicCache
    from transformers.generation.logits_process import LogitsProcessorList
    from transformers.generation.stopping_criteria import (
        EosTokenCriteria, MaxLengthCriteria, StoppingCriteriaList)
    L = batch.shape[1]
    gc = GenerationConfig(max_new_tokens=steps, eos_token_id=EOS,
                          pad_token_id=PAD_TEXT, do_sample=False)
    gc.max_length = L + steps
    gc.do_samples = [False] * 8
    gc.layers = [{} for _ in range(8)]
    stopping = StoppingCriteriaList([MaxLengthCriteria(max_length=L + steps),
                                     EosTokenCriteria(eos_token_id=EOS)])
    with torch.no_grad():
        out = ref_model._sample(
            torch.from_numpy(batch),
            logits_processor=LogitsProcessorList(),
            stopping_criteria=stopping,
            generation_config=gc,
            synced_gpus=False,
            streamer=None,
            attention_mask=torch.from_numpy(mask),
            use_cache=True,
            past_key_values=DynamicCache())
    return out.numpy()


def test_deep_geometry_mixed_batch_token_exact(deep_models):
    """B=4 mixed prompt lengths (voice-clone rows + text-only + short) at the
    8-layer geometry, greedy, with one row EOS-flushing inside the
    teacher-forcing window while the rest decode to the limit: token-exact
    vs the reference loop, through BOTH the static engine and the continuous
    pool (VERDICT r4 #5; reference generation_utils.py:341-477)."""
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    ref_model, our_cfg, params = deep_models
    prompts = _deep_prompts()
    batch, mask = left_pad_batch(prompts, PAD_TEXT, PAD_SPEECH)
    L = batch.shape[1]
    steps = 40

    ref_out = _run_reference(ref_model, batch, mask, steps)
    base = L - 8 + 1
    ref_gen = ref_out[:, base:]

    # scenario sanity: row 0 flushed mid-batch (eos in its generated ch0),
    # at least one other row ran the full budget without stopping
    has_eos = (ref_gen[..., 0] == EOS).any(axis=1)
    assert has_eos[0], "tuning drifted: row 0 no longer EOS-flushes"
    assert not has_eos[1:].all(), "tuning drifted: every row stopped early"

    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=False, temperature=None,
                                        top_k=None, top_p=None)
                  for _ in range(8)],
        max_new_tokens=steps)
    eng = GenerationEngine(our_cfg, params, sampling, bucket=L,
                           cache_dtype=jnp.float32)
    res = eng.generate(batch, mask, max_new_tokens=steps, seed=0)
    our_gen = res.tokens[:, base:]
    n = min(ref_gen.shape[1], our_gen.shape[1])
    assert n >= steps, f"overlap {n} < steps {steps}"
    np.testing.assert_array_equal(our_gen[:, :n], ref_gen[:, :n])

    # continuous pool: same prompts as staggered independent requests —
    # each row must reproduce its reference tokens exactly
    from moss_ttsd_tpu.decode.continuous import ContinuousBatcher
    cb = ContinuousBatcher(our_cfg, params, sampling, slots=4,
                           base=L, max_steps=48, cache_dtype=jnp.float32)
    slots = []
    for i, p in enumerate(prompts):
        slots.append(cb.submit(p, max_new_tokens=steps))
        cb.run(steps=3)                  # stagger the joins
    for _ in range(30):
        cb.run(steps=8)
        if len(cb.finished()) == len(slots):
            break
    for row, slot in enumerate(slots):
        got = cb.collect(slot)
        pool_gen = got.tokens[0, got.base:]
        m = min(len(pool_gen), ref_gen.shape[1])
        assert m >= min(steps, got.steps)
        np.testing.assert_array_equal(
            pool_gen[:m], ref_gen[row, :m],
            err_msg=f"pool row {row} diverged from the reference")


def test_training_loss_parity(models):
    """Full training objective vs the reference forward-with-labels
    (per-channel shifted CE, -100 masking, [8,2,1,...] weighting)."""
    import torch
    ref_model, our_cfg, params = models

    rng = np.random.default_rng(5)
    B, T = 2, 12
    ids = np.full((B, T, 8), PAD_SPEECH, np.int64)
    ids[..., 0] = rng.integers(10, 5000, (B, T))
    ids[:, 6:, 0] = rng.integers(*SPEECH_RANGE, size=(B, T - 6))
    for c in range(1, 8):
        ids[:, 6:, c] = rng.integers(0, PAD_SPEECH, (B, T - 6))
    labels = ids.copy()
    labels[:, :6] = -100

    weights = [8, 2, 1, 1, 1, 1, 1, 1]          # reference finetune.py:132
    ref_model.set_weights(weights)
    with torch.no_grad():
        out = ref_model(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.ones(B, T, dtype=torch.long),
                        labels=torch.from_numpy(labels), skip_logits=False)
    ref_total = float(out.loss)
    ref_per = out.loss_all.numpy()

    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.ops.chunked_ce import asteroid_loss
    model = AsteroidLM(our_cfg)
    hidden, _ = model.apply(params, jnp.asarray(ids),
                            jnp.cumsum(jnp.ones((B, T), jnp.int32), 1) - 1,
                            jnp.ones((B, T), bool), None, 0,
                            method=AsteroidLM.backbone)
    emb_t = params["params"]["embed_text"]
    emb_s = params["params"]["embed_speech"]
    total, per = asteroid_loss(hidden, jnp.asarray(labels), emb_t, emb_s,
                               weights, num_chunks=4)
    np.testing.assert_allclose(np.asarray(per), ref_per, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)


def test_restricted_head_divergence_quantified(models):
    """VERDICT r4 #3: how often would the restricted head's stopping rule
    diverge from the reference's? On the speech-biased oracle (the closest
    available proxy for a trained checkpoint — no public weights ship in
    this environment) under a realistic sampled config (temp 0.9 / top-k 50 /
    top-p 0.95), measure (a) how often the FULL head emits an
    out-of-window channel-0 token mid-generation (the event the restriction
    masks) and (b) the restricted-head audit's flag rate on the same
    prompts. Prints both rates; asserts the audit agrees with the direct
    measurement in direction (zero/nonzero)."""
    ref_model, our_cfg, params = models
    rng = np.random.default_rng(21)
    prompts = [make_prompt(rng, 6, 4), make_prompt(rng, 4, 2),
               make_prompt(rng, 8, 6), make_prompt(rng, 5, 0)]
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    batch, mask = left_pad_batch(prompts, PAD_TEXT, PAD_SPEECH)
    steps = 24
    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=True, temperature=0.9,
                                        top_k=50, top_p=0.95)
                  for _ in range(8)],
        max_new_tokens=steps)

    # (a) full head: out-of-window ch0 emissions before each row's stop
    full_eng = GenerationEngine(our_cfg, params, sampling,
                                bucket=batch.shape[1],
                                cache_dtype=jnp.float32)
    emitted = total = 0
    for seed in range(4):
        res = full_eng.generate(batch, mask, max_new_tokens=steps, seed=seed)
        gen0 = res.tokens[:, res.base:, 0]
        for row in gen0:
            # count up to (and incl.) the first non-speech token: after it
            # the row is flushing/finished and fills are not "emissions"
            for t in row:
                total += 1
                if not (SPEECH_RANGE[0] <= t < SPEECH_RANGE[1]):
                    emitted += int(t != EOS)
                    break

    # (b) restricted head + audit on the same prompts/seeds
    import dataclasses
    r_cfg = dataclasses.replace(our_cfg, restricted_text_head=True,
                                restricted_audit_every=2)
    r_eng = GenerationEngine(r_cfg, params, sampling, bucket=batch.shape[1],
                             cache_dtype=jnp.float32)
    audited = flagged = 0
    for seed in range(4):
        res = r_eng.generate(batch, mask, max_new_tokens=steps, seed=seed)
        a, f = res.audit
        audited += a
        flagged += f
    print(f"restricted-head divergence on the speech-biased oracle: "
          f"full head emitted non-speech/non-EOS on {emitted}/{total} "
          f"pre-stop steps; audit flagged {flagged}/{audited} audited rows")
    assert audited > 0
    assert (flagged == 0) == (emitted == 0), (
        "audit disagrees with the direct full-head measurement")


def _hf_chain(rp, temp, top_k, top_p):
    from transformers.generation.logits_process import (
        LogitsProcessorList, RepetitionPenaltyLogitsProcessor,
        TemperatureLogitsWarper, TopKLogitsWarper, TopPLogitsWarper)
    chain = LogitsProcessorList()
    if rp is not None:
        chain.append(RepetitionPenaltyLogitsProcessor(penalty=rp))
    if temp is not None:
        chain.append(TemperatureLogitsWarper(temperature=temp))
    if top_k is not None:
        chain.append(TopKLogitsWarper(top_k=top_k))
    if top_p is not None:
        chain.append(TopPLogitsWarper(top_p=top_p))
    return chain


def _compare_processed(ours_np, hf_np, neg_inf_cut=-1e29):
    """Finite-support equality + value agreement on the kept entries."""
    kept_ours = ours_np > neg_inf_cut
    kept_hf = np.isfinite(hf_np)
    np.testing.assert_array_equal(kept_ours, kept_hf)
    np.testing.assert_allclose(ours_np[kept_ours], hf_np[kept_hf], rtol=1e-5,
                               atol=1e-5)


def test_processed_logits_match_hf_chain_on_model_logits(models):
    """The production sampling pipeline (repetition penalty -> temperature ->
    top-k -> top-p, ops/sampling.py) produces EXACTLY the logits HF's actual
    LogitsProcessorList yields (reference builds that chain per channel,
    modeling_asteroid.py:95-109) — rng-free, on real model logits with the
    real generation history (left-pads included, as HF sees them)."""
    import torch
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.ops.sampling import (ChannelParams,
                                            presence_from_history,
                                            processed_logits)
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch

    ref_model, our_cfg, params = models
    rng = np.random.default_rng(11)
    prompts = [make_prompt(rng, 6, 4), make_prompt(rng, 4, 2)]
    batch, mask = left_pad_batch(prompts, PAD_TEXT, PAD_SPEECH)
    B, L, _ = batch.shape

    model = AsteroidLM(our_cfg)
    text_logits, speech_logits = model.apply(params, jnp.asarray(batch),
                                             jnp.asarray(mask))
    # channel 0: big text vocab; reference generation_config.json-style params
    t_logits = np.asarray(text_logits[:, -1], np.float32)
    history0 = batch[..., 0]
    for rp, temp, top_k, top_p in [(1.3, 0.9, 50, 0.9), (None, 0.7, 30, None),
                                   (1.1, None, None, 0.8)]:
        hf = _hf_chain(rp, temp, top_k, top_p)(
            torch.from_numpy(history0),
            torch.from_numpy(t_logits.copy())).numpy()
        p = ChannelParams.from_config(ChannelSamplingConfig(
            do_sample=True, temperature=temp, top_k=top_k, top_p=top_p,
            repetition_penalty=rp))
        presence = presence_from_history(jnp.asarray(history0),
                                         our_cfg.vocab_size)
        ours = np.asarray(processed_logits(
            jnp.asarray(t_logits), presence, p,
            prefilter_k=our_cfg.vocab_size if top_p and not top_k else 128))
        _compare_processed(ours, hf)

    # a speech channel (1025-entry vocab, full-vocab exact regardless)
    s_logits = np.asarray(speech_logits[:, -1, 0], np.float32)
    history1 = batch[..., 1]
    hf = _hf_chain(1.2, 0.8, 25, 0.85)(
        torch.from_numpy(history1), torch.from_numpy(s_logits.copy())).numpy()
    p = ChannelParams(do_sample=True, temperature=0.8, top_k=25, top_p=0.85,
                      repetition_penalty=1.2)
    presence = presence_from_history(jnp.asarray(history1),
                                     our_cfg.speech_vocab_size)
    ours = np.asarray(processed_logits(jnp.asarray(s_logits), presence, p))
    _compare_processed(ours, hf)


def test_topp_prefilter_truncation_quantified(models):
    """Quantifies the static top-K prefilter's top-p truncation (ops/sampling
    docstring contract): EXACT when the nucleus fits in K; when it doesn't,
    our kept set is the top-m prefix of HF's kept set and the truncated
    probability mass is measured."""
    import torch
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.ops.sampling import ChannelParams, processed_logits

    ref_model, our_cfg, params = models
    rng = np.random.default_rng(13)
    prompts = [make_prompt(rng, 6, 4)]
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    batch, mask = left_pad_batch(prompts, PAD_TEXT, PAD_SPEECH)
    model = AsteroidLM(our_cfg)
    text_logits, _ = model.apply(params, jnp.asarray(batch), jnp.asarray(mask))
    base = np.asarray(text_logits[:, -1], np.float32)        # (1, 152704)

    K = 128
    p = ChannelParams(do_sample=True, temperature=1.0, top_k=0, top_p=0.95,
                      repetition_penalty=1.0)
    presence = jnp.zeros((1, our_cfg.vocab_size), bool)

    # peaked logits: nucleus fits in K -> exact match with HF
    peaked = base * 40.0
    hf = _hf_chain(None, None, None, 0.95)(
        torch.zeros(1, 0, dtype=torch.long),
        torch.from_numpy(peaked.copy())).numpy()
    assert np.isfinite(hf).sum() <= K, "test setup: nucleus must fit in K"
    ours = np.asarray(processed_logits(jnp.asarray(peaked), presence, p,
                                       prefilter_k=K))
    _compare_processed(ours, hf)

    # near-flat logits (random tiny model): nucleus >> K -> ours is the top-m
    # prefix; measure the truncated mass
    hf = _hf_chain(None, None, None, 0.95)(
        torch.zeros(1, 0, dtype=torch.long),
        torch.from_numpy(base.copy())).numpy()
    ours = np.asarray(processed_logits(jnp.asarray(base), presence, p,
                                       prefilter_k=K))
    kept_ours = ours[0] > -1e29
    kept_hf = np.isfinite(hf[0])
    assert kept_ours.sum() <= K < kept_hf.sum()
    assert not np.any(kept_ours & ~kept_hf)          # strict subset
    probs = torch.softmax(torch.from_numpy(base[0]), -1).numpy()
    truncated = probs[kept_hf & ~kept_ours].sum() / probs[kept_hf].sum()
    # document the scale of the approximation on a near-uniform distribution
    assert 0.0 < truncated < 1.0
    print(f"top-p prefilter truncation on near-flat 152k logits: "
          f"{truncated:.3f} of the nucleus mass (K={K})")
