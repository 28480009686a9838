"""peft LoRA adapter -> stacked multi-LoRA factor tree.

The reference finetunes with peft (reference finetune/finetune.py:145-191,
r=16 alpha=32 rslora, attn+MLP targets) and can only merge the adapter into
the checkpoint at export (:237-241). This converter loads a peft adapter
directory (adapter_model.safetensors / adapter_model.bin +
adapter_config.json) into the flat factor-tree format
decode/lora_registry.LoraRegistry.register accepts, so reference-trained
voices serve directly through the multi-LoRA engines — per request, without
touching the base weights.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Dict, List, Tuple

import numpy as np

# matches e.g. "base_model.model.model.language_model.layers.3.self_attn.
# q_proj.lora_A.weight" and the in-training variant with a ".default."
# adapter-name infix, regardless of prefix depth
_KEY = re.compile(
    r"layers\.(\d+)\.(?:[\w]+\.)*?"
    r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)"
    r"\.lora_(A|B)(?:\.[\w]+)?\.weight$")


def convert_peft_lora(sd: Dict[str, "np.ndarray"],
                      num_layers: int = None) -> dict:
    """peft state dict (torch tensors or numpy) -> flat factor tree
    {"layers/block/<target>/kernel": {"a": (L, in, r), "b": (L, r, out)}}.

    peft stores torch Linear layouts: lora_A.weight (r, in) and
    lora_B.weight (out, r); the scan-stacked factors here are their
    transposes. NO scale is folded into peft's saved weights — pass the
    adapter_config.json lora_alpha/use_rslora to register_adapter (or use
    load_peft_adapter, which reads them for you)."""
    def to_np(t):
        return np.asarray(
            t.detach().cpu().float().numpy() if hasattr(t, "detach") else t,
            np.float32)

    per: dict = {}
    dropped = []
    for key, t in sd.items():
        m = _KEY.search(key)
        if not m:
            if "lora_A" in key or "lora_B" in key:
                dropped.append(key)     # LoRA leaf on an unsupported module
            continue
        layer, target, ab = int(m.group(1)), m.group(2), m.group(3)
        per.setdefault(target, {"A": {}, "B": {}})[ab][layer] = to_np(t).T
    if not per:
        raise ValueError("no lora_A/lora_B leaves found — is this a peft "
                         "adapter state dict?")
    if dropped:
        # e.g. embed_tokens/lm_head adapters: converting silently would
        # serve a partial voice — make the loss loud
        logging.getLogger(__name__).warning(
            "convert_peft_lora: %d LoRA leaves target unsupported modules "
            "and were DROPPED (only %s convert): %s%s",
            len(dropped), "q/k/v/o/gate/up/down projections",
            ", ".join(sorted(dropped)[:4]),
            "…" if len(dropped) > 4 else "")
    out = {}
    for target, d in per.items():
        if not d["A"] or not d["B"]:
            raise ValueError(f"target {target!r}: incomplete A/B pair")
        L = num_layers or max(max(d["A"]), max(d["B"])) + 1
        a0 = next(iter(d["A"].values()))
        b0 = next(iter(d["B"].values()))
        a = np.zeros((L,) + a0.shape, np.float32)   # missing layers = zero
        b = np.zeros((L,) + b0.shape, np.float32)
        for layer, v in d["A"].items():
            a[layer] = v
        for layer, v in d["B"].items():
            b[layer] = v
        out[f"layers/block/{target}/kernel"] = {"a": a, "b": b}
    return out


def load_peft_adapter(adapter_dir: str,
                      num_layers: int = None) -> Tuple[dict, float, bool]:
    """peft adapter directory -> (factor tree, lora_alpha, use_rslora).

    Reads adapter_model.safetensors (preferred) or adapter_model.bin plus
    adapter_config.json (reference lora_config.yaml fields ride in it)."""
    alpha, rslora = 32.0, False
    cfg_path = os.path.join(adapter_dir, "adapter_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        alpha = float(c.get("lora_alpha", 32.0))
        rslora = bool(c.get("use_rslora", False))
    st = os.path.join(adapter_dir, "adapter_model.safetensors")
    bn = os.path.join(adapter_dir, "adapter_model.bin")
    if os.path.exists(st):
        from safetensors.numpy import load_file
        sd = load_file(st)
    elif os.path.exists(bn):
        import torch
        sd = torch.load(bn, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(
            f"no adapter_model.safetensors/.bin under {adapter_dir}")
    return convert_peft_lora(sd, num_layers), alpha, rslora


def load_adapter_any(path: str,
                     default_alpha: float = 32.0) -> Tuple[dict, float, bool]:
    """CLI helper: a peft adapter DIRECTORY loads with its own
    adapter_config.json scale; a .npz FILE is a lora_factors.npz from the
    finetune CLI (layerwise tree; reference lora_config defaults:
    alpha=default_alpha, rslora)."""
    if os.path.isdir(path):
        return load_peft_adapter(path)
    from ..core.checkpoint import load_pytree
    return load_pytree(path), default_alpha, True


def parse_adapter_specs(specs: List[str], default_alpha: float = 32.0,
                        error=None) -> Dict[str, Tuple[dict, float, bool]]:
    """Shared CLI parsing for repeated --lora_adapter NAME=PATH flags ->
    {name: (factor tree, alpha, use_rslora)} via load_adapter_any.
    ``error`` is argparse's parser.error (raises ValueError when absent)."""
    out: Dict[str, Tuple[dict, float, bool]] = {}
    for spec in specs:
        name, _, path = spec.partition("=")
        if not path:
            msg = f"--lora_adapter expects NAME=PATH, got {spec!r}"
            if error is not None:
                error(msg)
            raise ValueError(msg)
        out[name] = load_adapter_any(path, default_alpha)
    return out
