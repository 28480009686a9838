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
    """Merged params = W + scale * A @ B (differentiable in the factors).

    ``rank`` only enters through the scale, so it MUST match the factors'
    actual rank — a mismatch would silently mis-scale the merge (the
    einsum runs fine on any rank). Validated against a.shape[-1];
    decode/lora_registry derives rank from the factors the same way."""
    for key, fac in lora.items():
        if fac["a"].shape[-1] != rank:
            raise ValueError(
                f"rank={rank} but factor {key!r} has rank "
                f"{fac['a'].shape[-1]}; the scale would be wrong — pass "
                f"the rank the factors were built with")
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


# -- layerwise LoRA (models/lm.py LoRADense; cfg.lora_rank > 0) -------------
#
# The memory-correct path at production geometry: adapters live INSIDE each
# projection (y = x W + scale (x A) B), so backward cotangents stay
# rank-sized. The merge-based helpers above remain for tests/export and for
# tiny geometries.

def split_lora_tree(params: Dict) -> Tuple[Dict, Dict]:
    """Full LoRA-model tree -> (frozen, trainable) nested dicts."""
    def walk(node, pick_lora):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                sub = walk(v, pick_lora)
                if sub:
                    out[k] = sub
            elif (k in ("lora_a", "lora_b")) == pick_lora:
                out[k] = v
        return out

    return walk(params, False), walk(params, True)


def merge_lora_tree(frozen: Dict, trainable: Dict) -> Dict:
    """Inverse of split_lora_tree (deep dict union)."""
    def walk(a, b):
        if not isinstance(a, dict):
            return a
        out = dict(a)
        for k, v in (b or {}).items():
            out[k] = walk(a[k], v) if isinstance(v, dict) and k in a else v
        return out

    return walk(frozen, trainable)


def graft_lora_params(base_params: Dict, cfg, rng: jax.Array) -> Dict:
    """Plain-checkpoint tree + fresh adapters -> full LoRA-model tree.

    cfg must have lora_rank > 0; the LoRA model's init supplies the
    lora_a/lora_b leaves while every base leaf comes from the checkpoint."""
    from ..models.lm import AsteroidLM
    model = AsteroidLM(cfg)
    abstract = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8, cfg.channels), jnp.int32)),
        rng)
    _, lora_shapes = split_lora_tree(abstract)
    keys = iter(jax.random.split(rng, 4096))

    def init_leaves(path, spec):
        last = path[-1].key
        if last == "lora_a":
            return jax.random.normal(next(keys), spec.shape,
                                     jnp.float32) * 0.02
        return jnp.zeros(spec.shape, jnp.float32)

    lora = jax.tree_util.tree_map_with_path(init_leaves, lora_shapes)
    return merge_lora_tree(base_params, lora)


def fold_lora_tree(params: Dict, cfg) -> Dict:
    """Fold adapters into kernels and drop the lora leaves: the layerwise
    equivalent of merge_lora (reference merge_and_unload)."""
    scale = lora_scale(cfg.lora_rank, cfg.lora_alpha, cfg.lora_rslora)

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "kernel" in node and "lora_a" in node:
            out = {k: v for k, v in node.items()
                   if k not in ("lora_a", "lora_b")}
            delta = jnp.einsum("...ir,...ro->...io",
                               node["lora_a"], node["lora_b"]) * scale
            out["kernel"] = (node["kernel"].astype(jnp.float32) + delta
                             ).astype(node["kernel"].dtype)
            return out
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def make_layerwise_lora_step(cfg, optimizer, loss_weights=None,
                             remat: bool = True, ce_chunks: int = 8,
                             grad_accum_steps: int = 1):
    """train_step(state, batch, frozen) for a cfg with lora_rank > 0.

    state.params is the TRAINABLE subtree (lora_a/lora_b leaves only);
    ``frozen`` is the base subtree passed as a runtime device input.
    ``grad_accum_steps`` K > 1 expects a leading (K,) micro axis on every
    batch leaf (see train/step.py accum_value_and_grad — exact big-batch
    equivalence; the accumulator here is only rank-sized)."""
    from .step import DEFAULT_LOSS_WEIGHTS, TrainState, accum_value_and_grad
    from ..models.lm import AsteroidLM
    from ..ops.chunked_ce import asteroid_loss

    assert cfg.lora_rank > 0, "cfg.lora_rank must be set for layerwise LoRA"
    if remat:
        import dataclasses
        cfg = dataclasses.replace(cfg, remat_layers=True)
    model = AsteroidLM(cfg)
    weights = loss_weights or DEFAULT_LOSS_WEIGHTS

    def loss_fn(trainable, batch, counts, frozen):
        full = merge_lora_tree(frozen, trainable)
        mask = batch["attention_mask"]
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        hidden, _ = model.apply(full, batch["input_ids"], positions,
                                mask.astype(bool), None, 0,
                                method=AsteroidLM.backbone)
        total, per = asteroid_loss(
            hidden, batch["labels"], frozen["params"]["embed_text"],
            frozen["params"]["embed_speech"], weights, num_chunks=ce_chunks,
            counts=counts)
        return total, per

    def train_step(state: TrainState, batch, frozen):
        import optax
        if grad_accum_steps > 1:
            (loss, per), grads = accum_value_and_grad(
                loss_fn, state.params, batch, frozen)
        else:
            (loss, per), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, None, frozen)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        new_tr = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "loss_per_channel": per,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, new_tr, opt_state), metrics

    return train_step


def make_lora_train_step(cfg, optimizer, base_params=None, rank: int = 16,
                         alpha: float = 32.0, use_rslora: bool = True,
                         loss_weights=None, remat: bool = True,
                         ce_chunks: int = 8):
    """train_step over the LoRA factors only; base weights stay frozen.

    The returned ``train_step(state, batch, base=None)`` takes the frozen
    base tree as a runtime argument — pass it on every call so jit treats it
    as a device-resident input. Closing over it (the ``base_params``
    default, kept for convenience at tiny geometry) embeds the full tree as
    compile-time constants: at 1.7B that is ~7 GB captured during lowering
    and a correspondingly huge program upload on remote backends."""
    from .step import DEFAULT_LOSS_WEIGHTS, TrainState
    from ..models.lm import AsteroidLM
    from ..ops.chunked_ce import asteroid_loss

    model = AsteroidLM(cfg)
    weights = loss_weights or DEFAULT_LOSS_WEIGHTS

    def loss_fn(lora, batch, base):
        merged = apply_lora(base, lora, rank, alpha, use_rslora)

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

    def train_step(state: TrainState, batch, base=None):
        base = base_params if base is None else base
        (loss, per), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, base)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax
        new_lora = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "loss_per_channel": per,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, new_lora, opt_state), metrics

    return train_step
