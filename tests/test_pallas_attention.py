"""Pallas flash-attention kernels vs the XLA reference path (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_ttsd_tpu.ops.attention import causal_mask, gqa_attention
from moss_ttsd_tpu.ops.pallas_attention import flash_decode, flash_prefill


def make_qkv(rng, B, Tq, S, H, Hkv, D):
    q = jnp.asarray(rng.standard_normal((B, Tq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    return q, k, v


def test_flash_decode_matches_xla():
    rng = np.random.default_rng(0)
    B, S, H, Hkv, D = 2, 64, 8, 4, 16
    q, k, v = make_qkv(rng, B, 1, S, H, Hkv, D)
    valid = np.zeros((B, S), bool)
    valid[0, :40] = True
    valid[1, 5:50] = True          # left padding + partial fill
    scale = D ** -0.5

    ref = gqa_attention(q, k, v, jnp.asarray(valid)[:, None, :], scale)
    out = flash_decode(q, k, v, jnp.asarray(valid), scale, block_k=32,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_decode_single_block():
    rng = np.random.default_rng(1)
    B, S, H, Hkv, D = 1, 16, 4, 2, 8
    q, k, v = make_qkv(rng, B, 1, S, H, Hkv, D)
    valid = np.ones((B, S), bool)
    scale = D ** -0.5
    ref = gqa_attention(q, k, v, jnp.asarray(valid)[:, None, :], scale)
    out = flash_decode(q, k, v, jnp.asarray(valid), scale, block_k=64,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_prefill_matches_xla_causal():
    rng = np.random.default_rng(2)
    B, T, H, Hkv, D = 2, 96, 8, 4, 16
    q, k, v = make_qkv(rng, B, T, T, H, Hkv, D)
    valid = np.ones((B, T), bool)
    valid[1, :20] = False          # left padding
    scale = D ** -0.5

    mask = causal_mask(0, T, T, jnp.asarray(valid))
    ref = gqa_attention(q, k, v, mask, scale)
    out = flash_prefill(q, k, v, jnp.asarray(valid), scale,
                        block_q=32, block_k=32, interpret=True)
    # padded queries produce garbage rows in both paths; compare valid rows
    ref_n, out_n = np.asarray(ref), np.asarray(out)
    np.testing.assert_allclose(out_n[0], ref_n[0], atol=3e-5)
    np.testing.assert_allclose(out_n[1, 20:], ref_n[1, 20:], atol=3e-5)


def test_flash_prefill_ragged_length():
    """T not divisible by block sizes exercises the pad path."""
    rng = np.random.default_rng(3)
    B, T, H, Hkv, D = 1, 50, 4, 2, 8
    q, k, v = make_qkv(rng, B, T, T, H, Hkv, D)
    valid = np.ones((B, T), bool)
    scale = D ** -0.5
    mask = causal_mask(0, T, T, jnp.asarray(valid))
    ref = gqa_attention(q, k, v, mask, scale)
    out = flash_prefill(q, k, v, jnp.asarray(valid), scale,
                        block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_engine_pallas_matches_xla_greedy():
    """Full decode engine with pallas kernels (interpret) == XLA engine."""
    import dataclasses
    from moss_ttsd_tpu.core.config import LMConfig
    from moss_ttsd_tpu.decode.engine import GenerationEngine
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch, shift_delay_pattern
    from tests.test_decode import greedy_sampling, make_prompt

    cfg = LMConfig(dtype="float32", param_dtype="float32").tiny()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(5),
                        jnp.zeros((1, 4, cfg.channels), np.int64))
    rng = np.random.default_rng(7)
    prompts = [make_prompt(cfg, rng, 5, 3)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id, cfg.speech_pad_token)

    r_xla = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                             cache_dtype=jnp.float32).generate(batch, mask, 10)
    cfg_p = dataclasses.replace(cfg, attn_impl="pallas", pallas_interpret=True)
    r_pl = GenerationEngine(cfg_p, params, greedy_sampling(), bucket=32,
                            cache_dtype=jnp.float32).generate(batch, mask, 10)
    np.testing.assert_array_equal(r_pl.tokens[:, r_pl.base:],
                                  r_xla.tokens[:, r_xla.base:])
