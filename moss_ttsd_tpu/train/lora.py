"""LoRA finetuning via parameter-tree surgery.

Equivalent of the reference's peft integration (reference finetune/finetune.py:
145-191: r=16, alpha=32, rslora, targets q/k/v/o/gate/up/down) rebuilt the JAX
way: low-rank (A, B) factors live in a separate pytree; the train step merges
``W + scale * A @ B`` before apply and differentiates only the factors.
merge_lora() produces a plain checkpoint (reference merge_and_unload,
finetune.py:237-241).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                   "gate_proj", "up_proj", "down_proj")   # reference finetune.py:153


def _is_target(path: Tuple[str, ...], targets: Sequence[str]) -> bool:
    return path[-1] == "kernel" and any(t in path for t in targets)


def lora_scale(rank: int, alpha: float, use_rslora: bool = True) -> float:
    return alpha / math.sqrt(rank) if use_rslora else alpha / rank


def init_lora(params: Dict, rng: jax.Array, rank: int = 16,
              targets: Sequence[str] = DEFAULT_TARGETS) -> Dict:
    """Build the low-rank factor tree for target kernels.

    Kernels are (L, in, out) (stacked scan layers). A: (L, in, r) gaussian,
    B: (L, r, out) zeros — standard LoRA init."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora: Dict[str, Any] = {}
    keys = jax.random.split(rng, len(flat))
    for (path, leaf), key in zip(flat, keys):
        names = tuple(k.key for k in path)
        if not _is_target(names, targets):
            continue
        *lead, fan_in, fan_out = leaf.shape
        a = jax.random.normal(key, (*lead, fan_in, rank), jnp.float32) * 0.02
        b = jnp.zeros((*lead, rank, fan_out), jnp.float32)
        lora["/".join(names)] = {"a": a, "b": b}
    return lora


def apply_lora(params: Dict, lora: Dict, rank: int = 16, alpha: float = 32.0,
               use_rslora: bool = True) -> Dict:
    """Merged params = W + scale * A @ B (differentiable in the factors)."""
    scale = lora_scale(rank, alpha, use_rslora)

    def merge(path, leaf):
        key = "/".join(k.key for k in path)
        if key in lora:
            a, b = lora[key]["a"], lora[key]["b"]
            delta = jnp.einsum("...ir,...ro->...io", a, b) * scale
            return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)


def merge_lora(params: Dict, lora: Dict, rank: int = 16, alpha: float = 32.0,
               use_rslora: bool = True) -> Dict:
    """Fold factors into a plain checkpoint (reference merge_and_unload)."""
    return jax.device_get(apply_lora(params, lora, rank, alpha, use_rslora))


def make_lora_train_step(cfg, optimizer, base_params, rank: int = 16,
                         alpha: float = 32.0, use_rslora: bool = True,
                         loss_weights=None, remat: bool = True,
                         ce_chunks: int = 8):
    """train_step over the LoRA factors only; base weights stay frozen."""
    from .step import DEFAULT_LOSS_WEIGHTS, TrainState, make_train_step
    from ..models.lm import AsteroidLM
    from ..ops.chunked_ce import asteroid_loss

    model = AsteroidLM(cfg)
    weights = loss_weights or DEFAULT_LOSS_WEIGHTS

    def loss_fn(lora, batch):
        merged = apply_lora(base_params, lora, rank, alpha, use_rslora)

        def forward(p):
            mask = batch["attention_mask"]
            positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
            hidden, _ = model.apply(p, batch["input_ids"], positions,
                                    mask.astype(bool), None, 0,
                                    method=AsteroidLM.backbone)
            return hidden
        fwd = jax.checkpoint(forward) if remat else forward
        hidden = fwd(merged)
        total, per = asteroid_loss(
            hidden, batch["labels"], merged["params"]["embed_text"],
            merged["params"]["embed_speech"], weights, num_chunks=ce_chunks)
        return total, per

    def train_step(state: TrainState, batch):
        (loss, per), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax
        new_lora = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "loss_per_channel": per,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, new_lora, opt_state), metrics

    return train_step
