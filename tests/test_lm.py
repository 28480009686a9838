"""AsteroidLM parity + KV-cache tests.

Oracle: transformers Qwen3Model (the same backbone the reference wraps at
modeling_asteroid.py:226) composed with plain torch embeddings/heads the way
the reference composes them (summed 8-channel embeddings, tied heads).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_ttsd_tpu.core.config import LMConfig
from moss_ttsd_tpu.models.lm import AsteroidLM, init_cache
from moss_ttsd_tpu.utils.convert_lm import convert_asteroid_state_dict


def tiny_cfg():
    return LMConfig(dtype="float32", param_dtype="float32").tiny()


def make_torch_oracle(cfg):
    """Build a torch Qwen3 stack + 8 embeddings with random weights, and the
    state_dict in reference naming for the converter."""
    import torch
    from transformers import Qwen3Config, Qwen3Model
    torch.manual_seed(0)
    qcfg = Qwen3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attention_bias=False, attention_dropout=0.0,
        max_position_embeddings=cfg.max_position_embeddings)
    qwen = Qwen3Model(qcfg).eval()
    embeds = torch.nn.ModuleList(
        [torch.nn.Embedding(cfg.vocab_size, cfg.hidden_size)] +
        [torch.nn.Embedding(cfg.speech_vocab_size, cfg.hidden_size)
         for _ in range(cfg.channels - 1)])
    for e in embeds:
        torch.nn.init.normal_(e.weight, std=0.05)

    sd = {}
    for i, e in enumerate(embeds):
        sd[f"model.embedding_list.{i}.weight"] = e.weight
    for k, v in qwen.state_dict().items():
        sd[f"model.language_model.{k}"] = v
    return qwen, embeds, sd


def torch_forward(qwen, embeds, ids_np, mask_np):
    import torch
    ids = torch.from_numpy(ids_np)
    mask = torch.from_numpy(mask_np)
    x = sum(embeds[i](ids[..., i]) for i in range(ids.shape[-1]))
    pos = torch.clamp(torch.cumsum(mask, dim=1) - 1, min=0)
    with torch.no_grad():
        out = qwen(inputs_embeds=x, attention_mask=mask, position_ids=pos)
        h = out.last_hidden_state
        text_logits = h @ embeds[0].weight.T
        speech_logits = torch.stack([h @ embeds[i].weight.T
                                     for i in range(1, len(embeds))], dim=-2)
    return h.numpy(), text_logits.numpy(), speech_logits.numpy()


@pytest.fixture(scope="module")
def oracle():
    cfg = tiny_cfg()
    qwen, embeds, sd = make_torch_oracle(cfg)
    params = convert_asteroid_state_dict(sd, cfg)
    return cfg, qwen, embeds, params


def test_logit_parity_right_padded(oracle):
    cfg, qwen, embeds, params = oracle
    rng = np.random.default_rng(0)
    B, T = 2, 12
    ids = rng.integers(0, cfg.speech_vocab_size, (B, T, cfg.channels)).astype(np.int64)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (B, T))
    mask = np.ones((B, T), np.int64)

    _, t_text, t_speech = torch_forward(qwen, embeds, ids, mask)

    model = AsteroidLM(cfg)
    j_text, j_speech = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(j_text), t_text, atol=5e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(j_speech), t_speech, atol=5e-3, rtol=2e-2)


def test_logit_parity_left_padded(oracle):
    """Left-padded batch (the generation-time convention, reference
    generation_utils.py:221-237)."""
    cfg, qwen, embeds, params = oracle
    rng = np.random.default_rng(1)
    B, T = 2, 10
    ids = rng.integers(0, cfg.speech_vocab_size, (B, T, cfg.channels)).astype(np.int64)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[0, :4] = 0   # left padding on sample 0

    _, t_text, _ = torch_forward(qwen, embeds, ids, mask)
    model = AsteroidLM(cfg)
    j_text, _ = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    # only non-pad positions are meaningful
    np.testing.assert_allclose(np.asarray(j_text)[0, 4:], t_text[0, 4:],
                               atol=5e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(j_text)[1], t_text[1],
                               atol=5e-3, rtol=2e-2)


def test_kv_cache_decode_matches_full_forward(oracle):
    """prefill + per-token cached decode == one full no-cache forward."""
    cfg, _, _, params = oracle
    rng = np.random.default_rng(2)
    B, T_prompt, T_gen, S = 2, 7, 5, 16
    T = T_prompt + T_gen
    ids = rng.integers(0, cfg.speech_vocab_size, (B, T, cfg.channels)).astype(np.int64)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[1, :2] = 0   # left padding

    model = AsteroidLM(cfg)
    full_text, full_speech = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))

    # cached: prefill prompt then decode one token at a time
    cache = init_cache(cfg, B, S, dtype=jnp.float32)
    key_valid = np.zeros((B, S), bool)
    key_valid[:, :T_prompt] = mask[:, :T_prompt].astype(bool)
    positions = np.maximum(np.cumsum(mask, axis=1) - 1, 0)

    def bb(p, i, pos, kv, c, cp):
        return model.apply(p, i, pos, kv, c, cp, method=AsteroidLM.backbone)

    hidden, cache = bb(params, jnp.asarray(ids[:, :T_prompt]),
                       jnp.asarray(positions[:, :T_prompt]),
                       jnp.asarray(key_valid), cache, 0)
    outs = [model.apply(params, hidden[:, -1:], method=AsteroidLM.logits_all)]
    for t in range(T_prompt, T):
        key_valid[:, t] = True
        hidden, cache = bb(params, jnp.asarray(ids[:, t:t + 1]),
                           jnp.asarray(positions[:, t:t + 1]),
                           jnp.asarray(key_valid), cache, t)
        outs.append(model.apply(params, hidden[:, -1:], method=AsteroidLM.logits_all))

    step_text = np.concatenate([np.asarray(o[0]) for o in outs], axis=1)
    np.testing.assert_allclose(step_text, np.asarray(full_text)[:, T_prompt - 1:],
                               atol=5e-3, rtol=2e-2)


def test_embed_sum_semantics(oracle):
    """Summed embeddings match the reference's additive multi-channel scheme."""
    cfg, _, embeds, params = oracle
    import torch
    ids = np.zeros((1, 1, cfg.channels), np.int64)
    ids[0, 0, 0] = 5
    ids[0, 0, 3] = 7
    model = AsteroidLM(cfg)
    ours = model.apply(params, jnp.asarray(ids), method=AsteroidLM.embed)
    theirs = sum(embeds[i](torch.from_numpy(ids[..., i])) for i in range(cfg.channels))
    np.testing.assert_allclose(np.asarray(ours)[0, 0],
                               theirs.detach().numpy()[0, 0], atol=1e-5)


def test_ablate_attention_stub_is_shape_preserving():
    """The bench-only cfg.ablate_attention knob (bench_full attnshare) keeps
    the decode step runnable: same shapes/dtypes/cache layout, different
    values (attention really was removed)."""
    import dataclasses
    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 30, (2, 1, cfg.channels)), jnp.int32)
    params = model.init(rng, ids)
    cache = init_cache(cfg, 2, 16, dtype=jnp.float32)
    pos = jnp.zeros((2, 1), jnp.int32)
    kv = jnp.ones((2, 16), bool)

    outs = {}
    for ablate in (False, True):
        m = AsteroidLM(dataclasses.replace(cfg, ablate_attention=ablate))
        hidden, new_cache = m.apply(params, ids, pos, kv, cache, 0,
                                    method=AsteroidLM.backbone)
        assert hidden.shape == (2, 1, cfg.hidden_size)
        assert np.isfinite(np.asarray(hidden)).all()
        # the cache write survives the stub (only reads are removed)
        assert not np.allclose(np.asarray(new_cache["k"][0, :, :, 0]), 0.0)
        outs[ablate] = np.asarray(hidden)
    assert not np.allclose(outs[False], outs[True])


def test_fuse_qk_norm_rope_parity():
    """cfg.fuse_qk_norm_rope: identical param tree, same logits to float-
    reassociation tolerance (the concatenated norm+rope pass is the same
    per-head math, scheduled differently by XLA)."""
    import dataclasses
    cfg = LMConfig(dtype="float32", param_dtype="float32").tiny()
    fcfg = dataclasses.replace(cfg, fuse_qk_norm_rope=True)
    m, fm = AsteroidLM(cfg), AsteroidLM(fcfg)
    rng = np.random.default_rng(0)
    ids = np.full((2, 10, cfg.channels), cfg.speech_pad_token, np.int64)
    ids[..., 0] = rng.integers(1, 90, (2, 10))
    p = m.init(jax.random.PRNGKey(3), jnp.asarray(ids))
    pf = fm.init(jax.random.PRNGKey(3), jnp.asarray(ids))
    paths = lambda t: sorted(
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(t)[0])
    assert paths(p) == paths(pf)        # checkpoints interchangeable
    t1, s1 = m.apply(p, jnp.asarray(ids))
    t2, s2 = fm.apply(p, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-6)
    # decode path too (cache + single-token step)
    from moss_ttsd_tpu.models.lm import init_cache
    B, S = 2, 12
    cache = init_cache(cfg, B, S, jnp.float32)
    kv = jnp.ones((B, S), bool)
    pos = jnp.broadcast_to(jnp.arange(1)[None], (B, 1))
    h1, _ = m.apply(p, jnp.asarray(ids[:, :1]), pos, kv, cache, 0,
                    method=AsteroidLM.backbone)
    h2, _ = fm.apply(p, jnp.asarray(ids[:, :1]), pos, kv, cache, 0,
                     method=AsteroidLM.backbone)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-6)
