"""Multi-chip serving: the generation engine on a (data, model) mesh must
produce exactly the tokens of the single-device engine (greedy, fp32).
Runs on the simulated 8-device CPU mesh (conftest)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_ttsd_tpu.decode.engine import GenerationEngine
from moss_ttsd_tpu.models.lm import AsteroidLM
from moss_ttsd_tpu.parallel.mesh import make_mesh
from moss_ttsd_tpu.pipeline.prompt import left_pad_batch

from tests.test_decode import greedy_sampling, make_prompt, tiny_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(9),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))
    rng = np.random.default_rng(21)
    prompts = [make_prompt(cfg, rng, 4 + i % 3, 3) for i in range(8)]
    batch, mask = left_pad_batch(prompts, cfg.pad_token_id, cfg.speech_pad_token)
    ref = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                           cache_dtype=jnp.float32).generate(
                               batch, mask, max_new_tokens=12, seed=0)
    return cfg, params, batch, mask, ref


@pytest.mark.parametrize("data,model_par", [(8, 1), (4, 2), (2, 4)])
def test_mesh_engine_matches_single(setup, data, model_par):
    cfg, params, batch, mask, ref = setup
    mesh = make_mesh(data=data, model=model_par)
    eng = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                           cache_dtype=jnp.float32, mesh=mesh)
    res = eng.generate(batch, mask, max_new_tokens=12, seed=0)
    assert res.steps == ref.steps
    np.testing.assert_array_equal(res.tokens, ref.tokens)


def test_mesh_engine_streaming(setup):
    cfg, params, batch, mask, ref = setup
    mesh = make_mesh(data=4, model=2)
    eng = GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                           cache_dtype=jnp.float32, mesh=mesh)
    last = None
    for res in eng.generate_stream(batch, mask, max_new_tokens=12, seed=0,
                                   chunk_steps=5):
        last = res
    assert last is not None and last.steps == ref.steps
    np.testing.assert_array_equal(last.tokens, ref.tokens)


def test_tp_specs_handle_attention_bias_tree():
    """attention_bias checkpoints grow (L, out) bias leaves under the
    projections; lm_param_specs must give them rank-2 specs (colwise bias
    shards with the output dim, rowwise bias stays replicated for GSPMD to
    add once after the partial-sum all-reduce) and shard_params must
    degrade indivisible leaves instead of failing device_put."""
    import dataclasses
    from moss_ttsd_tpu.core.config import LMConfig
    from moss_ttsd_tpu.parallel.mesh import lm_param_specs, shard_params
    from jax.sharding import PartitionSpec as P
    cfg = dataclasses.replace(
        LMConfig(dtype="float32", param_dtype="float32").tiny(),
        attention_bias=True)
    params = AsteroidLM(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.channels), jnp.int32))
    specs = lm_param_specs(params, model_size=2)
    block = specs["params"]["layers"]["block"]
    assert block["q_proj"]["bias"] == P(None, "model")
    assert block["o_proj"]["bias"] == P()
    assert block["q_proj"]["kernel"] == P(None, None, "model")
    # every spec fits its leaf's rank
    jax.tree.map(lambda s, x: None if len(s) <= x.ndim
                 else pytest.fail(f"{s} on rank-{x.ndim}"), specs, params)
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh)     # must not raise on 1025-vocab
    assert len(jax.tree.leaves(sharded)) == len(jax.tree.leaves(params))
