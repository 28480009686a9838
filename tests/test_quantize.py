"""Weight-only int8 quantization: reconstruction error, logits fidelity, and
the int8 decode engine end-to-end."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_ttsd_tpu.decode.engine import GenerationEngine
from moss_ttsd_tpu.models.lm import AsteroidLM
from moss_ttsd_tpu.ops.quantize import dequantize_lm_params, quantize_lm_params
from moss_ttsd_tpu.pipeline.prompt import left_pad_batch

from tests.test_decode import greedy_sampling, make_prompt, tiny_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(4),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))
    return cfg, model, params


def test_quantized_tree_structure(setup):
    cfg, _, params = setup
    qparams = quantize_lm_params(params)
    blk = qparams["params"]["layers"]["block"]
    assert blk["q_proj"]["kernel_q"].dtype == jnp.int8
    assert blk["q_proj"]["kernel_s"].shape[-1] == blk["q_proj"]["kernel_q"].shape[-1]
    assert qparams["params"]["embed_text_q"].dtype == jnp.int8
    assert qparams["params"]["embed_text_s"].shape[-1] == 1
    # norms untouched
    assert not isinstance(qparams["params"]["final_norm"]["weight"], dict)
    # shapes match what the quantized model expects
    qcfg = dataclasses.replace(cfg, quantized=True)
    abstract = jax.eval_shape(
        lambda k: AsteroidLM(qcfg).init(k, jnp.zeros((1, 4, cfg.channels),
                                                     jnp.int32)),
        jax.random.PRNGKey(0))
    got = jax.tree.map(lambda x: (x.shape, x.dtype), qparams)
    want = jax.tree.map(lambda x: (x.shape,
                                   jnp.float32 if x.dtype == jnp.float32
                                   else x.dtype), abstract)
    assert jax.tree.structure(got) == jax.tree.structure(want)


def test_reconstruction_error_small(setup):
    _, _, params = setup
    rt = dequantize_lm_params(quantize_lm_params(params))
    w0 = params["params"]["layers"]["block"]["gate_proj"]["kernel"]
    w1 = rt["params"]["layers"]["block"]["gate_proj"]["kernel"]
    rel = float(jnp.linalg.norm(w0 - w1) / jnp.linalg.norm(w0))
    assert rel < 0.01
    e0 = params["params"]["embed_text"]
    e1 = rt["params"]["embed_text"]
    assert float(jnp.linalg.norm(e0 - e1) / jnp.linalg.norm(e0)) < 0.01


def test_logits_close_after_quantization(setup):
    cfg, model, params = setup
    qcfg = dataclasses.replace(cfg, quantized=True)
    qmodel = AsteroidLM(qcfg)
    qparams = quantize_lm_params(params)
    ids = np.zeros((2, 6, cfg.channels), np.int32)
    ids[..., 0] = np.random.default_rng(0).integers(0, 90, (2, 6))
    t0, s0 = model.apply(params, jnp.asarray(ids))
    t1, s1 = qmodel.apply(qparams, jnp.asarray(ids))

    def cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    assert cos(t0, t1) > 0.999
    assert cos(s0, s1) > 0.999


def test_int8_engine_generates(setup):
    cfg, _, params = setup
    rng = np.random.default_rng(13)
    prompts = [make_prompt(cfg, rng, 5, 3)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id, cfg.speech_pad_token)

    ref = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                           cache_dtype=jnp.float32).generate(
                               batch, mask, max_new_tokens=10, seed=0)
    eng = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                           cache_dtype=jnp.float32, quant="int8")
    res = eng.generate(batch, mask, max_new_tokens=10, seed=0)
    assert res.tokens.shape == ref.tokens.shape
    # the teacher-forcing window (channels > step during the first C-1
    # steps) is copied from the prompt and must match exactly
    C = cfg.channels
    gen = res.tokens[:, res.base:]
    ref_gen = ref.tokens[:, ref.base:]
    for s in range(C - 1):
        np.testing.assert_array_equal(gen[0, s, s + 1:], ref_gen[0, s, s + 1:])
    assert (gen[..., 1:] < cfg.speech_vocab_size).all()

    # streaming path also works quantized
    last = None
    for r in eng.generate_stream(batch, mask, max_new_tokens=10, seed=0,
                                 chunk_steps=4):
        last = r
    np.testing.assert_array_equal(last.tokens[:, :res.base + last.steps],
                                  res.tokens[:, :res.base + last.steps])


@pytest.mark.parametrize("data,model_par", [(8, 1), (4, 2)])
def test_int8_mesh_engine_matches_unsharded(setup, data, model_par):
    """int8 weights shard over the same TP/DP specs (scales follow their
    kernels; non-divisible dims fall back to replicated)."""
    cfg, _, params = setup
    from moss_ttsd_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(17)
    prompts = [make_prompt(cfg, rng, 4 + i % 2, 3) for i in range(8)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id, cfg.speech_pad_token)

    ref = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                           cache_dtype=jnp.float32, quant="int8").generate(
                               batch, mask, max_new_tokens=10, seed=0)
    eng = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                           cache_dtype=jnp.float32, quant="int8",
                           mesh=make_mesh(data=data, model=model_par))
    res = eng.generate(batch, mask, max_new_tokens=10, seed=0)
    assert res.steps == ref.steps
    np.testing.assert_array_equal(res.tokens, ref.tokens)


def test_prequantized_tree_engine_matches_online_quantization():
    """An engine fed a tree already in quantized layout (int8 checkpoint /
    direct quantized init) must decode exactly like one that quantizes the
    full-precision master itself — and must not re-quantize or cast it."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from moss_ttsd_tpu.decode.engine import GenerationEngine
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.ops.quantize import is_quantized_tree, quantize_lm_params
    from tests.test_decode import greedy_sampling, make_prompt, tiny_cfg
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch

    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))
    qtree = quantize_lm_params(params)
    assert is_quantized_tree(qtree) and not is_quantized_tree(params)

    rng = np.random.default_rng(0)
    batch, mask = left_pad_batch([make_prompt(cfg, rng, 6, 4)],
                                 cfg.pad_token_id, cfg.speech_pad_token)
    kw = dict(bucket=32, cache_dtype=jnp.float32, step_bucket=16)
    r_online = GenerationEngine(cfg, params, greedy_sampling(), quant="int8",
                                **kw).generate(batch, mask, 12, seed=0)
    r_pre = GenerationEngine(cfg, qtree, greedy_sampling(), quant="int8",
                             **kw).generate(batch, mask, 12, seed=0)
    np.testing.assert_array_equal(r_online.tokens, r_pre.tokens)
