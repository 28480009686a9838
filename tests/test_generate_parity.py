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
