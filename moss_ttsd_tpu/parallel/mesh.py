"""Mesh + GSPMD sharding rules.

The reference's parallelism surface (SURVEY.md §2.3) maps to a 2-axis
jax.sharding.Mesh:
  * DP (torchrun DDP, reference finetune README.md:361-370)     -> "data" axis
  * TP (latent `_tp_plan = {"lm_head": "colwise_rep"}` hints,
    reference modeling_asteroid.py:290-291)                     -> "model" axis

Within a slice the collectives ride ICI; multi-host goes over DCN via standard
jax.distributed initialization — all inserted by XLA from these shardings.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None, seq: int = 1) -> Mesh:
    """Create a ("data", "model") mesh over the available devices.

    With ``seq`` > 1 the mesh gains a middle "seq" axis — ("data", "seq",
    "model") — for sequence-parallel training: batch leaves shard their
    time axis over "seq" (P("data", "seq")) and GSPMD turns the attention
    contraction over the sharded keys into ICI collectives. Specs that only
    name "data"/"model" keep working unchanged on the 3-axis mesh."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * seq)
    assert data * model * seq == n, f"{data}x{seq}x{model} != {n} devices"
    if seq > 1:
        arr = np.asarray(devices).reshape(data, seq, model)
        return Mesh(arr, ("data", "seq", "model"))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def parse_mesh_arg(spec: str) -> Mesh:
    """CLI "DATAxMODEL" string (e.g. "4x2") -> mesh over the first
    data*model devices. Shared by the inference CLI and the server."""
    data, model = (int(x) for x in spec.lower().split("x"))
    n = data * model
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"--mesh {spec} needs {n} devices, "
                         f"have {len(devices)}")
    return make_mesh(data=data, model=model, devices=devices[:n])


def lm_param_specs(params: dict, model_size: Optional[int] = None) -> dict:
    """PartitionSpecs for AsteroidLM params (tensor parallel over "model").

    Layout (stacked-layer scan params have a leading layer axis L):
      * q/k/v kernels (L, hidden, heads*dim) -> shard output dim (colwise)
      * o_proj (L, heads*dim, hidden)        -> shard input dim (rowwise)
      * gate/up (L, hidden, ffn)             -> colwise; down (L, ffn, hidden) rowwise
      * embed_text (vocab, hidden)           -> shard vocab (the tied lm_head
        becomes colwise on vocab, matching the reference's colwise_rep hint)
      * norms replicated

    When ``model_size`` (the "model" mesh-axis size) is given, any spec whose
    sharded dimension isn't divisible by it degrades to replicated — e.g. the
    odd 1025-entry speech vocab stays replicated (it's ~30 MB, negligible).
    """
    def spec_for(path: tuple, x) -> P:
        name = "/".join(str(p) for p in path)
        leaf = str(path[-1]) if path else ""
        spec = P()
        if leaf.startswith("bias"):
            # attention_bias checkpoints: (L, out) bias under the
            # projections. Colwise projections (q/k/v, gate/up) shard their
            # OUTPUT dim, so the bias shards with it; rowwise (o/down)
            # shard the input dim — their bias stays replicated (GSPMD adds
            # it once, after the partial-sum all-reduce).
            if any(p in name for p in ("q_proj", "k_proj", "v_proj",
                                       "gate_proj", "up_proj")):
                spec = P(None, "model")
        elif "q_proj" in name or "k_proj" in name or "v_proj" in name:
            spec = P(None, None, "model")
        elif "o_proj" in name or "down_proj" in name:
            spec = P(None, "model", None)
        elif "gate_proj" in name or "up_proj" in name:
            spec = P(None, None, "model")
        elif "embed_text" in name:
            spec = P("model", None)
        elif "embed_speech" in name:
            spec = P(None, "model", None)
        if len(spec) > x.ndim:          # never emit a spec wider than the leaf
            return P()
        if model_size is not None:
            for dim, ax in enumerate(spec):
                if ax == "model" and x.shape[dim] % model_size != 0:
                    return P()
        return spec

    return jax.tree_util.tree_map_with_path(
        lambda path, x: spec_for(tuple(k.key for k in path), x), params)


def shard_params(params: dict, mesh: Mesh) -> dict:
    """device_put every leaf under its lm_param_specs sharding. Passes the
    mesh's "model" axis size through so indivisible leaves (the 1025-row
    speech vocab, size-1 quant-scale dims) degrade to replicated instead of
    failing device_put."""
    model = dict(mesh.shape).get("model", 1)
    specs = lm_param_specs(params, model_size=model)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_spec() -> P:
    """Data-parallel batch sharding."""
    return P("data")
