"""Pipeline-parallel training (GPipe schedule) over a "pipe" mesh axis.

The reference declares latent pipeline hooks it never executes:
``_pp_plan = {"lm_head": (["hidden_states"], ["logits"])}`` and
``_no_split_modules = ["Qwen3DecoderLayer"]`` (reference
modeling_asteroid.py:290-291, :204) — HF would place whole decoder layers on
successive devices and run them sequentially (no overlap). The TPU-native
version here is a real pipeline:

  * The LM's layers are ALREADY a stacked-weight scan (models/lm.py:419-429):
    every layer param leaf is (L, ...). Sharding that leading axis over a
    "pipe" mesh axis puts L/S contiguous layers on each stage — the natural
    JAX formulation (no module surgery, no per-stage parameter containers).
  * A `shard_map` runs the GPipe schedule: M microbatches flow through S
    stages over M+S-1 ticks; stage boundaries are `ppermute` shifts over the
    pipe axis (ICI neighbour hops on a real TPU torus). Reverse-mode autodiff
    differentiates straight through scan+ppermute, which yields the backward
    pipeline automatically — no hand-written schedule for grads.
  * Embeddings, final norm, and the (tied) heads/loss stay OUTSIDE the
    shard_map in plain GSPMD land, replicated over "pipe" and batch-sharded
    over "data" — they are one matmul each; the 28-layer backbone is where
    the pipeline pays.

Bubble fraction is the GPipe (S-1)/(M+S-1); pick n_microbatches >= 4*stages
to amortize. Peak activation memory per stage is one microbatch per live
tick (cfg.remat_layers recomputes layer interiors in the backward).

Exactness: with fp32 params the pipelined step's loss/grads match
train.step.make_train_step bitwise up to reduction order
(tests/test_pipeline_parallel.py asserts allclose at 1e-6).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LMConfig
from ..models.lm import AsteroidLM, _ScanBlock
from ..ops.attention import causal_mask
from ..ops.chunked_ce import asteroid_loss, valid_label_counts
from ..ops.rope import rope_cos_sin
from ..train.step import DEFAULT_LOSS_WEIGHTS, TrainState

import flax.linen as nn


def make_pp_mesh(pipe: int, data: int = 1, devices=None) -> Mesh:
    """("pipe", "data") mesh. On hardware, lay the pipe axis along an ICI
    ring so each ppermute hop is a single-neighbour transfer."""
    devices = devices if devices is not None else jax.devices()
    n = pipe * data
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(pipe, data)
    return Mesh(arr, ("pipe", "data"))


def pp_param_specs(params: Any, n_stages: int) -> Any:
    """PartitionSpecs: every stacked layer leaf (L, ...) shards its leading
    layer axis over "pipe" (stage s owns layers [s*L/S, (s+1)*L/S));
    embeddings / final norm replicate. Adam moments inherit these specs
    one-to-one via train.step.opt_state_specs, so optimizer state is
    pipeline-sharded too."""
    def spec_for(path: tuple, x) -> P:
        if "layers" in path:
            L = x.shape[0]
            assert L % n_stages == 0, (
                f"layer axis {L} not divisible by {n_stages} stages "
                f"({'/'.join(str(p) for p in path)})")
            return P("pipe")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: spec_for(tuple(k.key for k in path), x), params)


class _StageStack(nn.Module):
    """The per-stage layer scan: identical block/scan wiring to AsteroidLM
    (models/lm.py:414-429) with length = layers-per-stage, so a stage's
    param subtree is exactly the pipe-shard of the full model's
    params["params"]["layers"] (leading axis slice — scan stacks in layer
    order). Cache-free training path only (S == 0)."""

    cfg: LMConfig        # cfg.num_hidden_layers == layers per stage

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        c = self.cfg
        block = _ScanBlock
        if c.remat_layers:
            block = nn.remat(
                _ScanBlock, prevent_cse=False,
                policy=jax.checkpoint_policies.nothing_saveable)
        blocks = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast, 0, nn.broadcast),
            out_axes=0,
            length=c.num_hidden_layers,
        )(c, name="layers")
        B = x.shape[0]
        empty = jnp.zeros((c.num_hidden_layers, B, c.num_key_value_heads, 0,
                           c.head_dim), x.dtype)
        carry = (x, {"k": empty, "v": empty}, jnp.int32(0), jnp.int32(0))
        (x, _, _, _), _ = blocks(carry, cos, sin, mask, None, None, {}, None)
        return x


def make_pp_backbone(cfg: LMConfig, mesh: Mesh, remat: bool = True):
    """Returns pp_backbone(layer_params, x, cos, sin, mask) -> hidden.

    All array args carry a leading (M,) microbatch axis; batch dim is
    sharded over "data", everything is replicated over "pipe" except
    layer_params (P("pipe") on the stacked layer axis).
    """
    n_stages = mesh.shape["pipe"]
    assert cfg.num_hidden_layers % n_stages == 0, (
        f"{cfg.num_hidden_layers} layers not divisible by {n_stages} stages")
    stage_cfg = dataclasses.replace(
        cfg, num_hidden_layers=cfg.num_hidden_layers // n_stages,
        remat_layers=remat)
    stage = _StageStack(stage_cfg)

    def pp_fn(layer_params, x, cos, sin, mask):
        # per-shard: layer_params (L/S, ...); x (M, mb/data, T, H)
        S = n_stages
        stage_id = jax.lax.axis_index("pipe")
        M = x.shape[0]

        def apply_stage(xi, ci, si, mi):
            return stage.apply({"params": {"layers": layer_params}},
                               xi, ci, si, mi)

        take = lambda a, i: jax.lax.dynamic_index_in_dim(
            a, i, axis=0, keepdims=False)

        def tick(buf, t):
            # stage s processes microbatch t - s at tick t (GPipe); clip
            # keeps warmup/drain ticks in-bounds — their results never
            # reach the output slice below.
            mb = jnp.clip(t - stage_id, 0, M - 1)
            x_in = jnp.where(stage_id == 0, take(x, mb), buf)
            y = apply_stage(x_in, take(cos, mb), take(sin, mb), take(mask, mb))
            nxt = jax.lax.ppermute(
                y, "pipe", [(i, (i + 1) % S) for i in range(S)])
            return nxt, y

        _, ys = jax.lax.scan(tick, jnp.zeros_like(x[0]),
                             jnp.arange(M + S - 1))
        # last stage's outputs at ticks S-1 .. M+S-2 are microbatches 0..M-1;
        # gate + psum = broadcast from the last stage (backward: identity
        # into the last stage's cotangent, zero elsewhere — the reverse
        # pipeline then runs through the transposed ppermutes).
        out = ys[S - 1:]
        out = jnp.where(stage_id == S - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pipe")

    mb_spec = P(None, "data")
    return jax.shard_map(
        pp_fn, mesh=mesh,
        in_specs=(P("pipe"), mb_spec, mb_spec, mb_spec, mb_spec),
        out_specs=mb_spec,
        check_vma=False)


def make_pp_train_step(cfg: LMConfig, optimizer, mesh: Mesh,
                       loss_weights: Sequence[float] = DEFAULT_LOSS_WEIGHTS,
                       remat: bool = True, ce_chunks: int = 8):
    """Pipeline-parallel train_step(state, batch) -> (state, metrics).

    batch leaves carry a leading microbatch axis: input_ids/labels
    (M, mb, T, C), attention_mask (M, mb, T); mb must divide by the mesh's
    "data" size. Loss semantics identical to train.step.make_train_step on
    the flattened (M*mb, T, ...) batch (shared CE denominators over the whole
    effective batch, reference loss weights finetune.py:132)."""
    assert not cfg.quantized, "PP training expects unquantized params"
    model = AsteroidLM(cfg)
    pp_backbone = make_pp_backbone(cfg, mesh, remat=remat)

    def loss_fn(params, batch):
        ids = batch["input_ids"]                       # (M, mb, T, C)
        am = batch["attention_mask"]                   # (M, mb, T)
        M, mb, T, C = ids.shape
        flat = lambda a: a.reshape((M * mb,) + a.shape[2:])

        x = model.apply(params, flat(ids), method=AsteroidLM.embed)
        am_f = flat(am)
        positions = jnp.maximum(jnp.cumsum(am_f, axis=1) - 1, 0)
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        mask3 = causal_mask(0, T, T, am_f.astype(bool))

        to_mb = lambda a: a.reshape((M, mb) + a.shape[1:])
        hidden = pp_backbone(params["params"]["layers"], to_mb(x),
                             to_mb(cos), to_mb(sin), to_mb(mask3))
        hidden = hidden.reshape(M * mb, T, -1)

        # final_norm via the model's own functional norm (one copy of the
        # math; honors cfg.ablate_norms like every other norm site)
        from ..models.lm import rms_norm_fn
        hidden = rms_norm_fn(hidden, params["params"]["final_norm"]["weight"],
                             cfg.rms_norm_eps, cfg.ablate_norms)

        counts = valid_label_counts(batch["labels"])
        total, per_channel = asteroid_loss(
            hidden, flat(batch["labels"]),
            params["params"]["embed_text"], params["params"]["embed_speech"],
            loss_weights, num_chunks=ce_chunks, counts=counts)
        return total, per_channel

    def train_step(state: TrainState, batch):
        (loss, per_channel), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "loss_per_channel": per_channel,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def pp_batch_specs() -> dict:
    """Batch PartitionSpecs for the (M, mb, ...) microbatched layout."""
    return {"input_ids": P(None, "data"), "labels": P(None, "data"),
            "attention_mask": P(None, "data")}
