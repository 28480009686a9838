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

from typing import Dict

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
    params["layers"] = {"block": block}
    params["final_norm"] = {"weight": get("model.language_model.norm.weight")}
    return {"params": params}


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
