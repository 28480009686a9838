"""pjit training step for AsteroidLM finetuning.

Replaces the reference's HF Trainer + DDP + Liger loss stack
(reference finetune/finetune.py:118-230): one jitted train_step sharded over a
("data", "model") mesh via GSPMD — gradient all-reduce, TP collectives, and
remat all come from XLA.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LMConfig
from ..models.lm import AsteroidLM
from ..ops.chunked_ce import asteroid_loss

DEFAULT_LOSS_WEIGHTS = (8, 2, 1, 1, 1, 1, 1, 1)   # reference finetune.py:132


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_lr_schedule(learning_rate: float, warmup_ratio: float,
                     total_steps: int, lr_scheduler_type: str):
    """HF TrainingArguments lr_scheduler_type semantics: "cosine"/"linear"
    warm up then decay, "constant" is flat from step 0 (HF applies NO warmup
    for it), "constant_with_warmup" ramps then holds."""
    warmup = max(1, int(total_steps * warmup_ratio))
    end = max(total_steps, warmup + 1)
    if lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(0.0, learning_rate,
                                                  warmup, end)
    if lr_scheduler_type == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup),
             optax.linear_schedule(learning_rate, 0.0, end - warmup)],
            [warmup])
    if lr_scheduler_type == "constant":
        return optax.constant_schedule(learning_rate)
    if lr_scheduler_type == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup),
             optax.constant_schedule(learning_rate)], [warmup])
    raise ValueError(f"unknown lr_scheduler_type {lr_scheduler_type!r}")


def make_optimizer(learning_rate: float = 1e-4, warmup_ratio: float = 0.1,
                   total_steps: int = 10_000, weight_decay: float = 0.0,
                   grad_clip: float = 1.0, lr_scheduler_type: str = "cosine"):
    """AdamW + warmup schedule (reference training_config.yaml semantics via
    HF TrainingArguments; see make_lr_schedule for the scheduler surface)."""
    sched = make_lr_schedule(learning_rate, warmup_ratio, total_steps,
                             lr_scheduler_type)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=weight_decay))


def accum_value_and_grad(loss_fn, params, batch, *extra):
    """Gradient accumulation over a (K, ...) micro-batched ``batch``.

    ``loss_fn(params, micro_batch, counts, *extra) -> (loss, per_channel)``
    must normalize by the SHARED ``counts`` (valid_label_counts over the
    whole superbatch) — the per-micro losses are then linear in the micro
    batches, so summed micro gradients equal the one-big-batch gradient
    EXACTLY (tests/test_train.py proves bitwise fp32 equality up to reduction
    order). Reference semantics: gradient_accumulation_steps
    (/root/reference/finetune/training_config.yaml:2, HF Trainer).

    Memory: one params-shaped gradient accumulator rides the lax.scan carry;
    each micro forward/backward peaks like a single micro-batch step.
    """
    from ..ops.chunked_ce import valid_label_counts
    counts = valid_label_counts(batch["labels"])
    vag = jax.value_and_grad(loss_fn, has_aux=True)

    def body(acc, micro):
        (loss, per), g = vag(params, micro, counts, *extra)
        return jax.tree.map(jnp.add, acc, g), (loss, per)

    zeros = jax.tree.map(jnp.zeros_like, params)
    grads, (losses, pers) = jax.lax.scan(body, zeros, batch)
    return (losses.sum(), pers.sum(axis=0)), grads


def make_train_step(cfg: LMConfig, optimizer,
                    loss_weights: Sequence[float] = DEFAULT_LOSS_WEIGHTS,
                    remat: bool = True, ce_chunks: int = 8,
                    grad_accum_steps: int = 1,
                    hidden_sharding=None):
    """Returns train_step(state, batch) -> (state, metrics).

    batch: {"input_ids": (B, T, C), "labels": (B, T, C), "attention_mask": (B, T)}.
    With ``grad_accum_steps`` K > 1, every batch leaf gains a leading (K,)
    micro axis and the step scans K forward/backwards before ONE optimizer
    update — the only way to reach the reference's effective batch sizes at
    16k-token sequences on one chip (reference finetune.py:222-230 via HF
    Trainer's gradient_accumulation_steps).

    ``hidden_sharding`` (optional NamedSharding for the (B, T, D) backbone
    output, e.g. P("data", "seq")): pins the activation layout for
    sequence-parallel training so GSPMD keeps the time axis sharded through
    the backbone instead of gathering it at the embedding — the constraint
    propagates backward into the layer scan, and the attention contraction
    over sharded keys lowers to ICI collectives.
    """
    if remat:
        # per-layer remat (models/lm.py nn.remat'd scan block): backward
        # recomputes each layer from its input; a whole-forward
        # jax.checkpoint would still save per-layer scan residuals
        import dataclasses
        cfg = dataclasses.replace(cfg, remat_layers=True)
    model = AsteroidLM(cfg)

    def loss_fn(params, batch, counts=None):
        ids = batch["input_ids"]
        mask = batch["attention_mask"]
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        hidden, _ = model.apply(params, ids, positions, mask.astype(bool),
                                None, 0, method=AsteroidLM.backbone)
        if hidden_sharding is not None:
            hidden = jax.lax.with_sharding_constraint(hidden, hidden_sharding)
        embed_text = params["params"]["embed_text"]
        embed_speech = params["params"]["embed_speech"]
        total, per_channel = asteroid_loss(
            hidden, batch["labels"], embed_text, embed_speech, loss_weights,
            num_chunks=ce_chunks, counts=counts)
        return total, per_channel

    def train_step(state: TrainState, batch):
        if grad_accum_steps > 1:
            (loss, per_channel), grads = accum_value_and_grad(
                loss_fn, state.params, batch)
        else:
            (loss, per_channel), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "loss_per_channel": per_channel,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def opt_state_specs(optimizer, opt_state, param_specs):
    """PartitionSpecs for the optimizer state.

    Adam moments mirror the param shapes, so they inherit the param
    PartitionSpecs one-to-one (ZeRO-style: no replicated fp32 moment copies on
    the model axis); every non-param leaf (step counters, empty states) is
    replicated. This beats the reference's DDP memory contract of a full
    per-device optimizer (reference finetune/finetune.py:219).
    """
    return optax.tree_map_params(
        optimizer, lambda _, spec: spec, opt_state, param_specs,
        transform_non_params=lambda _: P())


def train_state_specs(optimizer, state: TrainState, param_specs) -> TrainState:
    """Full TrainState PartitionSpec tree: params + matching optimizer state."""
    return TrainState(
        step=P(),
        params=param_specs,
        opt_state=opt_state_specs(optimizer, state.opt_state, param_specs))


def shard_train_step(train_step, mesh: Mesh, state_specs, batch_spec_tree):
    """pjit the step with explicit shardings over ``mesh``.

    PartitionSpec trees are wrapped in NamedSharding here — bare specs
    passed to jax.jit require an ambient mesh context and fail at call
    time otherwise."""
    wrap = lambda specs: jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), specs,
        is_leaf=lambda x: isinstance(x, P))
    state_sh = wrap(state_specs)
    return jax.jit(
        train_step,
        in_shardings=(state_sh, wrap(batch_spec_tree)),
        out_shardings=(state_sh, None))


def init_train_state(cfg: LMConfig, optimizer, rng=None, params=None) -> TrainState:
    model = AsteroidLM(cfg)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 8, cfg.channels), jnp.int32)
        params = model.init(rng, dummy)
    opt_state = optimizer.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state)
