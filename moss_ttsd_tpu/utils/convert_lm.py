"""Convert reference AsteroidTTSInstruct (torch/HF) checkpoints to AsteroidLM
flax params.

Source layout (reference modeling_asteroid.py:215-304 over transformers
Qwen3Model): ``model.embedding_list.{i}.weight``, ``model.language_model.
layers.{l}.{self_attn.{q,k,v,o}_proj | self_attn.{q,k}_norm |
input_layernorm | post_attention_layernorm | mlp.{gate,up,down}_proj}``,
``model.language_model.norm.weight``, ``lm_heads.{i}.weight`` (tied).

Target layout: stacked-layer scan params (see models/lm.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.config import LMConfig


def convert_asteroid_state_dict(sd: Dict[str, "np.ndarray"], cfg: LMConfig) -> dict:
    """sd: name -> array (torch tensors or numpy). Returns flax params dict."""
    def get(name):
        t = sd[name]
        return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t,
                          np.float32)

    L = cfg.num_hidden_layers
    params: dict = {}
    params["embed_text"] = get("model.embedding_list.0.weight")
    params["embed_speech"] = np.stack(
        [get(f"model.embedding_list.{i}.weight") for i in range(1, cfg.channels)])

    def stack(fmt, transpose=False):
        arrs = [get(fmt.format(l=l)) for l in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    base = "model.language_model.layers.{l}."
    block = {
        "input_ln": {"weight": stack(base + "input_layernorm.weight")},
        "q_proj": {"kernel": stack(base + "self_attn.q_proj.weight", transpose=True)},
        "k_proj": {"kernel": stack(base + "self_attn.k_proj.weight", transpose=True)},
        "v_proj": {"kernel": stack(base + "self_attn.v_proj.weight", transpose=True)},
        "o_proj": {"kernel": stack(base + "self_attn.o_proj.weight", transpose=True)},
        "q_norm": {"weight": stack(base + "self_attn.q_norm.weight")},
        "k_norm": {"weight": stack(base + "self_attn.k_norm.weight")},
        "post_ln": {"weight": stack(base + "post_attention_layernorm.weight")},
        "gate_proj": {"kernel": stack(base + "mlp.gate_proj.weight", transpose=True)},
        "up_proj": {"kernel": stack(base + "mlp.up_proj.weight", transpose=True)},
        "down_proj": {"kernel": stack(base + "mlp.down_proj.weight", transpose=True)},
    }
    if cfg.attention_bias:
        # HF Qwen3 attention_bias puts a bias on q/k/v AND o_proj
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            block[proj]["bias"] = stack(base + f"self_attn.{proj}.bias")
    params["layers"] = {"block": block}
    params["final_norm"] = {"weight": get("model.language_model.norm.weight")}
    return {"params": params}


def export_asteroid_state_dict(params: dict, cfg: LMConfig,
                               include_tied_heads: bool = True
                               ) -> Dict[str, np.ndarray]:
    """Inverse of convert_asteroid_state_dict: flax params (stacked scan
    layers) -> reference-format state dict (per-layer, torch weight layout).

    Finetuned weights exported this way load through the reference ecosystem
    (AsteroidTTSInstruct.from_pretrained over safetensors — the reference
    saves with save_pretrained/merge_and_unload, finetune/finetune.py:234-247)
    and back through load_asteroid_checkpoint. ``include_tied_heads`` also
    emits the lm_heads.{i}.weight entries (the reference ties them to the
    embeddings, modeling_asteroid.py:315-317; from_pretrained re-ties either
    way, but torch.save-style checkpoints carry both names).
    """
    p = params["params"] if "params" in params else params
    to_np = lambda x: np.asarray(x, np.float32)
    sd: Dict[str, np.ndarray] = {}
    sd["model.embedding_list.0.weight"] = to_np(p["embed_text"])
    for i in range(1, cfg.channels):
        sd[f"model.embedding_list.{i}.weight"] = to_np(p["embed_speech"][i - 1])

    block = p["layers"]["block"]
    base = "model.language_model.layers.{l}."
    per_layer = {
        "input_layernorm.weight": (block["input_ln"]["weight"], False),
        "self_attn.q_proj.weight": (block["q_proj"]["kernel"], True),
        "self_attn.k_proj.weight": (block["k_proj"]["kernel"], True),
        "self_attn.v_proj.weight": (block["v_proj"]["kernel"], True),
        "self_attn.o_proj.weight": (block["o_proj"]["kernel"], True),
        "self_attn.q_norm.weight": (block["q_norm"]["weight"], False),
        "self_attn.k_norm.weight": (block["k_norm"]["weight"], False),
        "post_attention_layernorm.weight": (block["post_ln"]["weight"], False),
        "mlp.gate_proj.weight": (block["gate_proj"]["kernel"], True),
        "mlp.up_proj.weight": (block["up_proj"]["kernel"], True),
        "mlp.down_proj.weight": (block["down_proj"]["kernel"], True),
    }
    if cfg.attention_bias:
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            per_layer[f"self_attn.{proj}.bias"] = (block[proj]["bias"], False)
    for l in range(cfg.num_hidden_layers):
        for name, (stacked, transpose) in per_layer.items():
            a = to_np(stacked[l])
            sd[base.format(l=l) + name] = a.T if transpose else a
    sd["model.language_model.norm.weight"] = to_np(p["final_norm"]["weight"])
    # the inner Qwen3Model's own embed_tokens is dead weight in the reference
    # (AsteroidTTSModel always passes inputs_embeds, modeling_asteroid.py:
    # 235-250) but present in its state dict — emit the channel-0 table so
    # strict load_state_dict succeeds
    sd["model.language_model.embed_tokens.weight"] = sd[
        "model.embedding_list.0.weight"]
    if include_tied_heads:
        for i in range(cfg.channels):
            sd[f"lm_heads.{i}.weight"] = sd[f"model.embedding_list.{i}.weight"]
    return sd


def save_asteroid_checkpoint(params: dict, cfg: LMConfig, out_dir: str,
                             lora: Optional[dict] = None,
                             lora_rank: int = 16, lora_alpha: float = 32.0,
                             lora_rslora: bool = True,
                             include_tied_heads: bool = True) -> str:
    """Export (optionally LoRA-merged) flax params as an HF-format checkpoint
    directory: model.safetensors + config.json with the reference
    AsteroidTTSConfig fields. Returns the safetensors path.

    Matches the reference save path (finetune/finetune.py:234-247:
    merge_and_unload for LoRA runs, then save_pretrained).
    """
    import json
    import os
    if lora is not None:
        from ..train.lora import merge_lora
        params = merge_lora(params, lora, rank=lora_rank, alpha=lora_alpha,
                            use_rslora=lora_rslora)
    sd = export_asteroid_state_dict(params, cfg, include_tied_heads)
    os.makedirs(out_dir, exist_ok=True)
    from safetensors.numpy import save_file
    st_path = os.path.join(out_dir, "model.safetensors")
    # tied heads share buffers in torch; numpy save_file copies, so emitting
    # both names is safe here
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, st_path)
    config = cfg.to_dict()
    config.update({"architectures": ["AsteroidTTSInstruct"],
                   "model_type": "asteroid_tts"})
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return st_path


def load_asteroid_checkpoint(model_dir: str, cfg: LMConfig) -> dict:
    """Load an HF-format checkpoint directory (safetensors or .bin shards)."""
    import glob
    import os
    sd: dict = {}
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            sd.update(load_file(f))
    else:
        import torch
        for f in sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin"))):
            sd.update(torch.load(f, map_location="cpu", weights_only=True))
    if not sd:
        raise FileNotFoundError(f"no checkpoint files in {model_dir}")
    return convert_asteroid_state_dict(sd, cfg)
