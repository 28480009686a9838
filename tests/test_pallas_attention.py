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


def test_flash_prefill_ragged_unequal_blocks():
    """Mismatched block_q/block_k with ragged T: the pad path must pad to a
    length BOTH block sizes divide (lcm) — padding to max(bq, bk) alone
    re-entered the pad branch forever when the smaller block did not divide
    it (regression: bq=24, bk=32, T=50 -> lcm pad to 96)."""
    rng = np.random.default_rng(7)
    B, T, H, Hkv, D = 1, 50, 4, 2, 8
    q, k, v = make_qkv(rng, B, T, T, H, Hkv, D)
    valid = np.ones((B, T), bool)
    scale = D ** -0.5
    mask = causal_mask(0, T, T, jnp.asarray(valid))
    ref = gqa_attention(q, k, v, mask, scale)
    out = flash_prefill(q, k, v, jnp.asarray(valid), scale,
                        block_q=24, block_k=32, interpret=True)
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


def test_flash_decode_int8_matches_xla_dequant():
    """Fused int8-KV decode kernel == XLA dequant-then-attend oracle."""
    from moss_ttsd_tpu.ops.pallas_attention import (flash_decode_int8_hs,
                                                    quantize_kv)
    rng = np.random.default_rng(7)
    B, S, H, Hkv, D = 2, 96, 8, 4, 16
    q, k, v = make_qkv(rng, B, 1, S, H, Hkv, D)
    valid = np.zeros((B, S), bool)
    valid[0, :70] = True
    valid[1, 9:88] = True
    scale = D ** -0.5

    kt = jnp.moveaxis(k, 2, 1)                  # (B, Hkv, S, D)
    vt = jnp.moveaxis(v, 2, 1)
    kq, ks = quantize_kv(kt)
    vq, vs = quantize_kv(vt)

    # oracle: dequantize then dense attention on the SAME int8 values
    k_deq = jnp.moveaxis(kq.astype(jnp.float32) * ks[..., None], 1, 2)
    v_deq = jnp.moveaxis(vq.astype(jnp.float32) * vs[..., None], 1, 2)
    ref = gqa_attention(q, k_deq, v_deq, jnp.asarray(valid)[:, None, :], scale)

    out = flash_decode_int8_hs(q, kq, ks, vq, vs, jnp.asarray(valid), scale,
                               block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_quantize_kv_roundtrip_error():
    from moss_ttsd_tpu.ops.pallas_attention import quantize_kv
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((3, 4, 17, 32)).astype(np.float32))
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 4, 17)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s)[..., None]
                 - np.asarray(x))
    # per-row max-abs scaling: error bounded by half a quantization step
    bound = np.asarray(s)[..., None] * 0.5 + 1e-6
    assert np.all(err <= bound)


def test_engine_int8_kv_cache_close_to_bf16():
    """kv_quant="int8" engine: runs end-to-end (interpret-mode kernels on
    CPU) and the generated tokens track the exact-cache engine (greedy,
    tiny model). Per-step hidden agreement is verified at the model level."""
    from moss_ttsd_tpu.core.config import (ChannelSamplingConfig, LMConfig,
                                           SamplingConfig)
    from moss_ttsd_tpu.decode.engine import GenerationEngine
    from moss_ttsd_tpu.models.lm import AsteroidLM, init_cache

    cfg = LMConfig(dtype="float32", param_dtype="float32",
                   attn_impl="pallas", pallas_interpret=True).tiny()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))

    # model-level: one decode step, int8 cache vs exact cache
    import dataclasses
    rng = np.random.default_rng(9)
    B, T, S = 2, 6, 16
    ids = np.full((B, T, cfg.channels), cfg.speech_pad_token, np.int32)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (B, T))
    positions = jnp.tile(jnp.arange(T)[None], (B, 1))
    key_valid = jnp.zeros((B, S), bool).at[:, :T].set(True)

    hiddens = {}
    for kv in ("none", "int8"):
        c = dataclasses.replace(cfg, kv_quant=kv)
        m = AsteroidLM(c)
        cache = init_cache(c, B, S, jnp.float32)
        h, cache = m.apply(params, jnp.asarray(ids), positions, key_valid,
                           cache, 0, method=AsteroidLM.backbone)
        # one extra decode step reading the (possibly quantized) cache
        nxt = np.full((B, 1, cfg.channels), cfg.speech_pad_token, np.int32)
        nxt[..., 0] = rng.integers(0, cfg.vocab_size, (B, 1)) * 0 + 3
        kv2 = key_valid.at[:, T].set(True)
        h2, _ = m.apply(params, jnp.asarray(nxt),
                        jnp.full((B, 1), T, jnp.int32), kv2, cache, T,
                        method=AsteroidLM.backbone)
        hiddens[kv] = np.asarray(h2, np.float32)
    a, b = hiddens["none"].ravel(), hiddens["int8"].ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, f"int8 KV cache diverged: cos={cos}"

    # engine-level smoke: int8-cache engine generates valid tokens
    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=False, temperature=None,
                                        top_k=None, top_p=None)
                  for _ in range(cfg.channels)],
        max_new_tokens=8)
    from tests.test_decode import make_prompt
    prompts = [make_prompt(cfg, np.random.default_rng(4), 5, 3)]
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                 cfg.speech_pad_token)
    eng8 = GenerationEngine(cfg, params, sampling, bucket=batch.shape[1],
                            cache_dtype=jnp.float32, kv_quant="int8",
                            step_bucket=64)
    eng = GenerationEngine(cfg, params, sampling, bucket=batch.shape[1],
                           cache_dtype=jnp.float32, step_bucket=64)
    r8 = eng8.generate(batch, mask, max_new_tokens=8, seed=0)
    r = eng.generate(batch, mask, max_new_tokens=8, seed=0)
    assert r8.tokens.shape[0] == 1 and r8.steps >= 1
    # greedy tokens from the quantized cache track the exact cache
    n = min(r8.steps, r.steps)
    agree = np.mean(r8.tokens[:, r8.base:r8.base + n]
                    == r.tokens[:, r.base:r.base + n])
    assert agree > 0.9, f"token agreement {agree}"


def test_flash_decode_extent_matches_full():
    """Extent-clamped decode == full-buffer decode when every slot at or past
    the extent is invalid: out-of-extent key blocks are DMA-elided + compute-
    skipped, so agreement here proves the clamp drops only masked slots."""
    from moss_ttsd_tpu.ops.pallas_attention import flash_decode_hs
    rng = np.random.default_rng(7)
    B, S, H, Hkv, D = 2, 128, 8, 4, 16
    q, k, v = make_qkv(rng, B, 1, S, H, Hkv, D)
    kt, vt = jnp.moveaxis(k, 2, 1), jnp.moveaxis(v, 2, 1)
    valid = np.zeros((B, S), bool)
    valid[0, :40] = True
    valid[1, 5:70] = True
    scale = D ** -0.5
    full = flash_decode_hs(q, kt, vt, jnp.asarray(valid), scale, block_k=32,
                           interpret=True)
    for extent in (70, 96, 128):       # >= max written slot, incl. non-aligned
        out = flash_decode_hs(q, kt, vt, jnp.asarray(valid), scale,
                              block_k=32, interpret=True,
                              extent=jnp.int32(extent))
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   atol=2e-5)
    # tiny extent (< one block) with matching validity
    valid2 = np.zeros((B, S), bool)
    valid2[:, :7] = True
    full2 = flash_decode_hs(q, kt, vt, jnp.asarray(valid2), scale, block_k=32,
                            interpret=True)
    out2 = flash_decode_hs(q, kt, vt, jnp.asarray(valid2), scale, block_k=32,
                           interpret=True, extent=jnp.int32(7))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(full2), atol=2e-5)
    # per-row (B,) extent vector: each row clamps to its own written span
    out3 = flash_decode_hs(q, kt, vt, jnp.asarray(valid), scale, block_k=32,
                           interpret=True,
                           extent=jnp.asarray([40, 70], jnp.int32))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(full), atol=2e-5)


def test_flash_decode_int8_extent_matches_full():
    from moss_ttsd_tpu.ops.pallas_attention import (flash_decode_int8_hs,
                                                    quantize_kv)
    rng = np.random.default_rng(8)
    B, S, H, Hkv, D = 2, 128, 8, 4, 16
    q, k, v = make_qkv(rng, B, 1, S, H, Hkv, D)
    kt, vt = jnp.moveaxis(k, 2, 1), jnp.moveaxis(v, 2, 1)
    kq, ks = quantize_kv(kt)
    vq, vs = quantize_kv(vt)
    valid = np.zeros((B, S), bool)
    valid[0, :50] = True
    valid[1, 10:60] = True
    scale = D ** -0.5
    full = flash_decode_int8_hs(q, kq, ks, vq, vs, jnp.asarray(valid), scale,
                                block_k=32, interpret=True)
    out = flash_decode_int8_hs(q, kq, ks, vq, vs, jnp.asarray(valid), scale,
                               block_k=32, interpret=True,
                               extent=jnp.int32(60))
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=2e-5)
    outr = flash_decode_int8_hs(q, kq, ks, vq, vs, jnp.asarray(valid), scale,
                                block_k=32, interpret=True,
                                extent=jnp.asarray([50, 60], jnp.int32))
    np.testing.assert_allclose(np.asarray(outr), np.asarray(full), atol=2e-5)


def test_engine_extent_kernel_matches_switch_path():
    """Sequential engine with decode_extent_kernel (extent-clamped pallas
    kernels, interpret) == the default lax.switch prefix-read engine.

    Exactness proves the per-step extent (cache_pos + 1) covers every
    written slot on the sequential path — a too-small extent would drop
    real keys, a too-large one would read unwritten garbage slots (they
    are key_valid-masked, so only the DMA bound would hide it)."""
    import dataclasses
    from moss_ttsd_tpu.core.config import LMConfig
    from moss_ttsd_tpu.decode.engine import GenerationEngine
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    from tests.test_decode import greedy_sampling, make_prompt

    cfg = LMConfig(dtype="float32", param_dtype="float32").tiny()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(5),
                        jnp.zeros((1, 4, cfg.channels), np.int64))
    rng = np.random.default_rng(9)
    prompts = [make_prompt(cfg, rng, 5, 3), make_prompt(cfg, rng, 7, 2)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id,
                                 cfg.speech_pad_token)

    r_sw = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                            cache_dtype=jnp.float32).generate(batch, mask, 12)
    cfg_e = dataclasses.replace(cfg, pallas_interpret=True)
    r_ext = GenerationEngine(cfg_e, params, greedy_sampling(), bucket=32,
                             cache_dtype=jnp.float32,
                             decode_extent_kernel=True
                             ).generate(batch, mask, 12)
    assert r_ext.steps == r_sw.steps
    np.testing.assert_array_equal(r_ext.tokens[:, r_ext.base:],
                                  r_sw.tokens[:, r_sw.base:])


def test_flash_decode_layered_matches_sliced():
    """layer= mode (full (L, ...) cache stacks, scalar-prefetched layer
    index) == slicing the layer outside the kernel, for both bf16-shape and
    int8 variants. The layered form exists so the kernel's operands never
    go through a materialized dynamic_slice (models/lm.py decode path)."""
    from moss_ttsd_tpu.ops.pallas_attention import (flash_decode_hs,
                                                    flash_decode_int8_hs,
                                                    quantize_kv)
    rng = np.random.default_rng(12)
    L, B, S, H, Hkv, D = 3, 2, 96, 8, 4, 16
    q, _, _ = make_qkv(rng, B, 1, S, H, Hkv, D)
    kt = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.float32)
    valid = np.zeros((B, S), bool)
    valid[0, :33] = True
    valid[1, 4:61] = True
    scale = D ** -0.5
    for lay in (0, 2):
        ref = flash_decode_hs(q, kt[lay], vt[lay], jnp.asarray(valid), scale,
                              block_k=32, interpret=True,
                              extent=jnp.int32(61))
        got = flash_decode_hs(q, kt, vt, jnp.asarray(valid), scale,
                              block_k=32, interpret=True,
                              extent=jnp.int32(61), layer=jnp.int32(lay))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
    kq, ks = quantize_kv(kt)
    vq, vs = quantize_kv(vt)
    for lay in (1, 2):
        ref = flash_decode_int8_hs(q, kq[lay], ks[lay], vq[lay], vs[lay],
                                   jnp.asarray(valid), scale, block_k=32,
                                   interpret=True)
        got = flash_decode_int8_hs(q, kq, ks, vq, vs, jnp.asarray(valid),
                                   scale, block_k=32, interpret=True,
                                   layer=jnp.int32(lay))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
