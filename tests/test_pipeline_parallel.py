"""Pipeline-parallel training: GPipe schedule over the "pipe" mesh axis.

The reference only declares pipeline hooks (_pp_plan/_no_split_modules,
modeling_asteroid.py:290-291, :204); here the pipelined step must match the
plain pjit step exactly (fp32, same CE denominators)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from moss_ttsd_tpu.core.config import LMConfig
from moss_ttsd_tpu.parallel.pipeline import (make_pp_mesh, make_pp_train_step,
                                             pp_batch_specs, pp_param_specs)
from moss_ttsd_tpu.train.step import (init_train_state, make_optimizer,
                                      make_train_step, train_state_specs)


def tiny_cfg(**kw):
    base = dict(num_hidden_layers=4)
    base.update(kw)
    return LMConfig(dtype="float32", param_dtype="float32").tiny(**base)


def make_batch(cfg, M=3, mb=4, T=12, seed=0):
    rng = np.random.default_rng(seed)
    C = cfg.channels
    ids = rng.integers(0, 30, (M, mb, T, C)).astype(np.int32)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (M, mb, T))
    labels = rng.integers(0, 30, (M, mb, T, C)).astype(np.int32)
    labels[..., 1, :, :] = -100                     # a fully masked row
    mask = np.ones((M, mb, T), np.int32)
    mask[:, 0, :3] = 0                              # left padding
    return {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
            "attention_mask": jnp.asarray(mask)}


def flatten_batch(batch):
    return {k: v.reshape((-1,) + v.shape[2:]) for k, v in batch.items()}


@pytest.mark.parametrize("pipe,data", [(4, 2), (2, 1)])
def test_pp_step_matches_plain_step(pipe, data):
    """One pipelined train step == one plain train step on the flattened
    batch: loss, grad_norm, and every updated param leaf."""
    cfg = tiny_cfg()
    mesh = make_pp_mesh(pipe=pipe, data=data,
                        devices=jax.devices()[:pipe * data])
    opt = make_optimizer(total_steps=10, lr_scheduler_type="constant")
    state = init_train_state(cfg, opt, jax.random.PRNGKey(0))
    batch = make_batch(cfg)

    plain = jax.jit(make_train_step(cfg, opt, remat=False, ce_chunks=2))
    pp = jax.jit(make_pp_train_step(cfg, opt, mesh, remat=False, ce_chunks=2))

    s_plain, m_plain = plain(state, flatten_batch(batch))
    s_pp, m_pp = pp(state, batch)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_plain["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m_pp["loss_per_channel"]),
                               np.asarray(m_plain["loss_per_channel"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_pp["grad_norm"]),
                               float(m_plain["grad_norm"]), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_pp.params)[0],
            jax.tree_util.tree_flatten_with_path(s_plain.params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg="/".join(str(k.key) for k in path))


def test_pp_microbatch_count_invariance():
    """The GPipe schedule is math-invariant to how the batch splits into
    microbatches (shared CE denominators)."""
    cfg = tiny_cfg()
    mesh = make_pp_mesh(pipe=2, data=2, devices=jax.devices()[:4])
    opt = make_optimizer(total_steps=10, lr_scheduler_type="constant")
    state = init_train_state(cfg, opt, jax.random.PRNGKey(1))
    pp = jax.jit(make_pp_train_step(cfg, opt, mesh, remat=False, ce_chunks=2))

    b6 = make_batch(cfg, M=6, mb=2, seed=3)
    flat = flatten_batch(b6)
    b2 = {k: v.reshape((2, 6) + v.shape[1:]) for k, v in flat.items()}

    _, m6 = pp(state, b6)
    _, m2 = pp(state, b2)
    np.testing.assert_allclose(float(m6["loss"]), float(m2["loss"]),
                               rtol=1e-6)


def test_pp_sharded_state_and_batch():
    """Explicit pjit shardings: layer params + Adam moments pipe-sharded,
    batch data-sharded; the step runs and matches the unsharded step."""
    cfg = tiny_cfg()
    pipe, data = 4, 2
    mesh = make_pp_mesh(pipe=pipe, data=data, devices=jax.devices()[:8])
    opt = make_optimizer(total_steps=10, lr_scheduler_type="constant")
    state = init_train_state(cfg, opt, jax.random.PRNGKey(2))
    batch = make_batch(cfg, M=2, mb=4, seed=5)

    param_specs = pp_param_specs(state.params, pipe)
    state_specs = train_state_specs(opt, state, param_specs)
    wrap = lambda specs: jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), specs,
        is_leaf=lambda x: isinstance(x, P))
    state_sh, batch_sh = wrap(state_specs), wrap(pp_batch_specs())
    state_p = jax.tree.map(jax.device_put, state, state_sh)
    batch_p = jax.tree.map(jax.device_put, batch, batch_sh)

    step = jax.jit(make_pp_train_step(cfg, opt, mesh, remat=False,
                                      ce_chunks=2),
                   in_shardings=(state_sh, batch_sh),
                   out_shardings=(state_sh, None))
    new_state, metrics = step(state_p, batch_p)

    # reference: same step without explicit shardings
    ref_step = jax.jit(make_pp_train_step(cfg, opt, mesh, remat=False,
                                          ce_chunks=2))
    _, ref_metrics = ref_step(state, batch)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-6)

    # layer leaves (and their Adam moments) really are pipe-sharded
    layer_leaf = new_state.params["params"]["layers"]["block"]["q_proj"]["kernel"]
    assert layer_leaf.sharding.spec == P("pipe")
    adam = [s for s in jax.tree.leaves(
        new_state.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(s, "mu")][0]
    mu_leaf = adam.mu["params"]["layers"]["block"]["q_proj"]["kernel"]
    assert mu_leaf.sharding.spec == P("pipe")


def test_pp_remat_matches_no_remat():
    """cfg.remat_layers inside the stage scan changes memory, not math."""
    cfg = tiny_cfg()
    mesh = make_pp_mesh(pipe=2, data=2, devices=jax.devices()[:4])
    opt = make_optimizer(total_steps=10, lr_scheduler_type="constant")
    state = init_train_state(cfg, opt, jax.random.PRNGKey(4))
    batch = make_batch(cfg, M=2, mb=2, seed=7)

    _, m0 = jax.jit(make_pp_train_step(cfg, opt, mesh, remat=False,
                                       ce_chunks=2))(state, batch)
    _, m1 = jax.jit(make_pp_train_step(cfg, opt, mesh, remat=True,
                                       ce_chunks=2))(state, batch)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m0["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-5)


def test_pp_lora_step():
    """LoRA factors ride the stacked layer axis, so they pipe-shard like any
    other layer leaf and the PP step runs with a LoRA-configured model."""
    cfg = tiny_cfg(lora_rank=2, lora_alpha=4.0)
    mesh = make_pp_mesh(pipe=2, data=2, devices=jax.devices()[:4])
    opt = make_optimizer(total_steps=10, lr_scheduler_type="constant")
    state = init_train_state(cfg, opt, jax.random.PRNGKey(5))
    batch = make_batch(cfg, M=2, mb=2, seed=9)

    specs = pp_param_specs(state.params, 2)
    assert specs["params"]["layers"]["block"]["q_proj"]["lora_a"] == P("pipe")

    step = jax.jit(make_pp_train_step(cfg, opt, mesh, remat=False,
                                      ce_chunks=2))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    blk = state.params["params"]["layers"]["block"]
    new_blk = new_state.params["params"]["layers"]["block"]
    # lora_b inits to zeros, so the first step's nonzero grads land there
    # (grad of lora_a is gated by b and stays zero at init)
    assert not np.allclose(np.asarray(blk["q_proj"]["lora_b"]),
                           np.asarray(new_blk["q_proj"]["lora_b"]))
