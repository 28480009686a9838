"""HF-format export round-trip tests (VERDICT r1 #7).

The reference ecosystem consumes save_pretrained-style checkpoints
(finetune/finetune.py:234-247); export_asteroid_state_dict /
save_asteroid_checkpoint produce exactly that layout from flax params
(unstacking scan layers, re-transposing kernels, re-emitting tied heads).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moss_ttsd_tpu.core.config import LMConfig
from moss_ttsd_tpu.models.lm import AsteroidLM
from moss_ttsd_tpu.utils.convert_lm import (convert_asteroid_state_dict,
                                            export_asteroid_state_dict,
                                            load_asteroid_checkpoint,
                                            save_asteroid_checkpoint)


def tiny_cfg():
    return LMConfig(dtype="float32", param_dtype="float32").tiny()


def make_params(cfg, seed=0):
    model = AsteroidLM(cfg)
    return model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 8, cfg.channels), jnp.int32))


def logits_of(cfg, params, ids):
    model = AsteroidLM(cfg)
    t, s = model.apply(params, jnp.asarray(ids))
    return np.asarray(t), np.asarray(s)


def test_export_reload_identical_logits(tmp_path):
    """export -> load_asteroid_checkpoint -> bit-identical logits."""
    cfg = tiny_cfg()
    params = make_params(cfg)
    save_asteroid_checkpoint(params, cfg, str(tmp_path))
    assert (tmp_path / "model.safetensors").exists()
    assert (tmp_path / "config.json").exists()

    reloaded = load_asteroid_checkpoint(str(tmp_path), cfg)
    rng = np.random.default_rng(0)
    ids = np.full((2, 10, cfg.channels), cfg.speech_pad_token, np.int32)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (2, 10))
    t0, s0 = logits_of(cfg, params, ids)
    t1, s1 = logits_of(cfg, reloaded, ids)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(s0, s1)

    # config.json round-trips through from_hf_config_json
    cfg2 = LMConfig.from_hf_config_json(str(tmp_path / "config.json"))
    assert cfg2.hidden_size == cfg.hidden_size
    assert cfg2.speech_token_range == cfg.speech_token_range


def test_export_state_dict_inverse_of_convert():
    """export_asteroid_state_dict is the exact inverse of
    convert_asteroid_state_dict (every tensor, both directions)."""
    cfg = tiny_cfg()
    params = make_params(cfg, seed=1)
    sd = export_asteroid_state_dict(params, cfg)
    back = convert_asteroid_state_dict(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    # tree_leaves_with_path gives [(path, leaf)]; compare by path
    b_by_path = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for p, v in flat_a:
        key = jax.tree_util.keystr(p)
        np.testing.assert_array_equal(np.asarray(v, np.float32),
                                      np.asarray(b_by_path[key]),
                                      err_msg=key)
    # tied heads present and equal to embeddings
    np.testing.assert_array_equal(sd["lm_heads.0.weight"],
                                  sd["model.embedding_list.0.weight"])


def test_export_with_lora_merge(tmp_path):
    """LoRA factors fold into the export (reference merge_and_unload,
    finetune.py:234-241): reloaded logits == merged-params logits and differ
    from base."""
    from moss_ttsd_tpu.train.lora import init_lora, merge_lora

    cfg = tiny_cfg()
    params = make_params(cfg, seed=2)
    lora = init_lora(params, jax.random.PRNGKey(3), rank=4)
    # nudge B away from zero so the merge is non-trivial (init keeps B=0)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    merged = merge_lora(params, lora, rank=4, alpha=8.0)

    save_asteroid_checkpoint(params, cfg, str(tmp_path), lora=lora,
                             lora_rank=4, lora_alpha=8.0)
    reloaded = load_asteroid_checkpoint(str(tmp_path), cfg)

    rng = np.random.default_rng(5)
    ids = np.full((1, 8, cfg.channels), cfg.speech_pad_token, np.int32)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (1, 8))
    t_merged, _ = logits_of(cfg, merged, ids)
    t_loaded, _ = logits_of(cfg, reloaded, ids)
    t_base, _ = logits_of(cfg, params, ids)
    np.testing.assert_allclose(t_loaded, t_merged, atol=1e-6)
    assert np.abs(t_loaded - t_base).max() > 1e-4


def test_full_geometry_converter_coverage():
    """Round-2 VERDICT #8: audit the converters at the REAL MOSS-TTSD-v0.5
    geometry (configs/lm_moss_ttsd_v0.5.json) without materializing weights.

    The expected reference state-dict layout is derived independently from
    the config (modeling_asteroid.py:215-304: Embedding(vocab, H) +
    channels-1 x Embedding(speech_vocab, H); Qwen3 layers with
    q/k/v/o_proj, q/k_norm, input/post LN, gate/up/down mlp; final norm;
    tied lm_heads). convert_asteroid_state_dict must consume it into a tree
    that exactly matches jax.eval_shape of the model init, and
    export_asteroid_state_dict must emit exactly the reference name set with
    matching shapes — so a first real-checkpoint load cannot fail on a name
    or shape mismatch. Zero-strided broadcast arrays keep memory flat."""
    import os
    cfg = LMConfig.from_hf_config_json(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "lm_moss_ttsd_v0.5.json"))
    H, L = cfg.hidden_size, cfg.num_hidden_layers
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim

    expected = {"model.embedding_list.0.weight": (cfg.vocab_size, H)}
    for i in range(1, cfg.channels):
        expected[f"model.embedding_list.{i}.weight"] = (cfg.speech_vocab_size,
                                                        H)
    for l in range(L):
        b = f"model.language_model.layers.{l}."
        expected.update({
            b + "input_layernorm.weight": (H,),
            b + "self_attn.q_proj.weight": (qd, H),
            b + "self_attn.k_proj.weight": (kvd, H),
            b + "self_attn.v_proj.weight": (kvd, H),
            b + "self_attn.o_proj.weight": (H, qd),
            b + "self_attn.q_norm.weight": (cfg.head_dim,),
            b + "self_attn.k_norm.weight": (cfg.head_dim,),
            b + "post_attention_layernorm.weight": (H,),
            b + "mlp.gate_proj.weight": (cfg.intermediate_size, H),
            b + "mlp.up_proj.weight": (cfg.intermediate_size, H),
            b + "mlp.down_proj.weight": (H, cfg.intermediate_size),
        })
    expected["model.language_model.norm.weight"] = (H,)
    # names present in a real checkpoint beyond the converter's inputs
    full_expected = dict(expected)
    full_expected["model.language_model.embed_tokens.weight"] = (
        cfg.vocab_size, H)
    for i in range(cfg.channels):
        full_expected[f"lm_heads.{i}.weight"] = (
            (cfg.vocab_size, H) if i == 0 else (cfg.speech_vocab_size, H))

    # torch -> flax: the converted tree matches the abstract init exactly
    zero = np.zeros((), np.float32)
    sd = {k: np.broadcast_to(zero, s) for k, s in full_expected.items()}
    converted = convert_asteroid_state_dict(sd, cfg)
    model = AsteroidLM(cfg)
    abstract = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8, cfg.channels), jnp.int32)),
        jax.random.PRNGKey(0))
    conv_shapes = {jax.tree_util.keystr(p): v.shape for p, v in
                   jax.tree_util.tree_leaves_with_path(converted)}
    abs_shapes = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_leaves_with_path(abstract)}
    assert conv_shapes == abs_shapes

    # flax -> torch: exactly the reference name set, with reference shapes
    params = jax.tree.map(lambda s: np.broadcast_to(zero, s.shape), abstract)
    exported = export_asteroid_state_dict(params, cfg)
    assert set(exported) == set(full_expected)
    mismatches = {k: (exported[k].shape, full_expected[k])
                  for k in full_expected
                  if exported[k].shape != full_expected[k]}
    assert not mismatches, mismatches


def test_export_loads_into_reference_torch_model():
    """The exported state dict loads into the ACTUAL reference torch model
    (strict), and the torch forward matches our flax forward — finetuned
    weights are consumable by the reference ecosystem."""
    from tests.ref_oracle import install_reference_stubs, reference_available
    if not reference_available():
        pytest.skip("reference tree not mounted")
    install_reference_stubs()
    import torch
    from modeling_asteroid import AsteroidTTSConfig, AsteroidTTSInstruct

    VOCAB, SPEECH_RANGE, EOS, PAD_TEXT = 152704, (151665, 152690), 152694, 151643
    cfg = LMConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0, max_position_embeddings=512,
        speech_token_range=SPEECH_RANGE, eos_token_id=EOS,
        pad_token_id=PAD_TEXT, dtype="float32", param_dtype="float32")
    params = make_params(cfg, seed=7)
    sd = export_asteroid_state_dict(params, cfg)

    ref_cfg = AsteroidTTSConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=cfg.rms_norm_eps, rope_theta=10000.0,
        attention_bias=False, attention_dropout=0.0,
        max_position_embeddings=512, channels=8,
        speech_pad_token=cfg.speech_pad_token, speech_vocab_size=1025,
        speech_token_range=list(SPEECH_RANGE), eos_token_id=EOS,
        pad_token_id=PAD_TEXT, attn_implementation="eager")
    ref_model = AsteroidTTSInstruct(ref_cfg).eval()
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    assert not missing, missing

    rng = np.random.default_rng(9)
    B, T = 2, 9
    ids = np.full((B, T, 8), cfg.speech_pad_token, np.int64)
    ids[..., 0] = rng.integers(10, 5000, (B, T))
    with torch.no_grad():
        out = ref_model(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.ones(B, T, dtype=torch.long))
    t_ours, s_ours = logits_of(cfg, params, ids)
    np.testing.assert_allclose(t_ours, out.logits_all[0].numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(s_ours[:, :, 0], out.logits_all[1].numpy(),
                               atol=2e-4)


def test_convert_peft_lora_matches_native_registration(tmp_path):
    """A peft-format adapter (torch Linear layouts, base_model prefixes,
    .default. infix) converts into the factor tree and reproduces the
    SAME tokens as registering the native tree directly."""
    import jax
    import jax.numpy as jnp
    from moss_ttsd_tpu.decode.engine import GenerationEngine
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    from moss_ttsd_tpu.train.lora import init_lora
    from moss_ttsd_tpu.utils.convert_lora import convert_peft_lora
    from tests.test_decode import greedy_sampling, make_prompt, tiny_cfg

    cfg = tiny_cfg()
    from moss_ttsd_tpu.models.lm import AsteroidLM
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(7),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))
    native = init_lora(params, jax.random.PRNGKey(3), rank=2)
    # randomize b (init zeroes it) so the adapter changes outputs
    native = {k: {"a": v["a"],
                  "b": jax.random.normal(jax.random.fold_in(
                      jax.random.PRNGKey(9), i), v["b"].shape) * 0.5}
              for i, (k, v) in enumerate(sorted(native.items()))}

    # synthesize the peft layout: per-layer torch Linear weights with
    # realistic prefixes; lora_A.weight = a.T, lora_B.weight = b.T
    sd = {}
    for key, ab in native.items():
        target = key.split("/")[-2]
        L = ab["a"].shape[0]
        for layer in range(L):
            pre = (f"base_model.model.model.language_model.layers.{layer}."
                   f"{'self_attn' if 'proj' in target and target[0] in 'qkvo' else 'mlp'}."
                   f"{target}")
            sd[f"{pre}.lora_A.default.weight"] = np.asarray(ab["a"][layer]).T
            sd[f"{pre}.lora_B.default.weight"] = np.asarray(ab["b"][layer]).T
    converted = convert_peft_lora(sd, num_layers=cfg.num_hidden_layers)

    rng = np.random.default_rng(51)
    prompt = make_prompt(cfg, rng, 6, 4)
    batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                 cfg.speech_pad_token)

    def run(tree):
        eng = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                               bucket=31, cache_dtype=jnp.float32,
                               step_bucket=32)
        eng.register_adapter("v", tree, alpha=8.0)
        return eng.generate(batch, mask, max_new_tokens=10, adapter="v")

    ref, got = run(native), run(converted)
    assert ref.steps == got.steps
    np.testing.assert_array_equal(ref.tokens, got.tokens)
    # and differs from base (adapter not a no-op)
    eng = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                           bucket=31, cache_dtype=jnp.float32, step_bucket=32)
    base = eng.generate(batch, mask, max_new_tokens=10)
    assert not (base.steps == ref.steps
                and np.array_equal(base.tokens, ref.tokens))


def test_load_peft_adapter_dir(tmp_path):
    """adapter_model.safetensors + adapter_config.json load with the
    trained alpha/rslora."""
    import json
    from safetensors.numpy import save_file
    from moss_ttsd_tpu.utils.convert_lora import load_peft_adapter

    sd = {
        "base_model.model.model.language_model.layers.0.self_attn."
        "q_proj.lora_A.weight": np.ones((2, 8), np.float32),
        "base_model.model.model.language_model.layers.0.self_attn."
        "q_proj.lora_B.weight": np.ones((8, 2), np.float32) * 0.5,
    }
    save_file(sd, str(tmp_path / "adapter_model.safetensors"))
    (tmp_path / "adapter_config.json").write_text(json.dumps(
        {"r": 2, "lora_alpha": 16, "use_rslora": True}))
    tree, alpha, rslora = load_peft_adapter(str(tmp_path))
    assert alpha == 16.0 and rslora is True
    ab = tree["layers/block/q_proj/kernel"]
    assert ab["a"].shape == (1, 8, 2) and ab["b"].shape == (1, 2, 8)
    np.testing.assert_allclose(ab["b"], 0.5)


def test_attention_bias_roundtrip():
    """attention_bias=True wires end-to-end: the model grows q/k/v/o bias
    leaves (HF Qwen3 puts attention_bias on o_proj too), the exporter emits
    them, and the converter loads them back to bit-identical logits."""
    import dataclasses
    cfg = dataclasses.replace(tiny_cfg(), attention_bias=True)
    params = make_params(cfg, seed=2)
    block = params["params"]["layers"]["block"]
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        assert "bias" in block[proj], proj
    sd = export_asteroid_state_dict(params, cfg)
    assert "model.language_model.layers.0.self_attn.o_proj.bias" in sd
    back = convert_asteroid_state_dict(sd, cfg)
    rng = np.random.default_rng(0)
    ids = np.full((2, 6, cfg.channels), cfg.speech_pad_token, np.int32)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (2, 6))
    t0, s0 = logits_of(cfg, params, ids)
    t1, s1 = logits_of(cfg, back, ids)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(s0, s1)


def test_quantized_lora_config_rejected():
    """quantized+lora_rank has no QLoRA path — the config must refuse it
    instead of silently training nothing (the QDense branch would win and
    no adapter leaves would exist)."""
    import dataclasses
    with pytest.raises(ValueError, match="QLoRA"):
        dataclasses.replace(tiny_cfg(), quantized=True, lora_rank=8)
