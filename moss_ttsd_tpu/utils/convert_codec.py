"""Convert reference XY_Tokenizer torch checkpoints to XYTokenizerModule params.

Handles the reference layout (XY_Tokenizer/xy_tokenizer/model.py:13-52 wiring,
nn/modules.py + nn/quantizer.py parameters), including:
  * torch Conv1d (out,in,k) -> flax Conv kernel (k,in,out)
  * torch ConvTranspose1d (in,out,k) -> flax ConvTranspose kernel (k,in,out)
  * weight-norm folding for WNConv1d (quantizer.py:10-14): W = g * v / ||v||
    (supports both legacy weight_g/weight_v and new parametrizations.* keys)
  * VarLenAttention projections (k has no bias) -> SelfAttention q_w/k_w/...
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.config import CodecConfig


def _np(t):
    return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach")
                      else t, np.float32)


class _SD:
    def __init__(self, sd: Dict):
        self.sd = sd

    def __contains__(self, k):
        return k in self.sd

    def get(self, k):
        return _np(self.sd[k])

    def folded_wn(self, prefix: str):
        """Fold a weight-normed conv weight; returns (out, in, k) array."""
        if f"{prefix}.weight_v" in self.sd:
            v = self.get(f"{prefix}.weight_v")
            g = self.get(f"{prefix}.weight_g")
        elif f"{prefix}.parametrizations.weight.original1" in self.sd:
            v = self.get(f"{prefix}.parametrizations.weight.original1")
            g = self.get(f"{prefix}.parametrizations.weight.original0")
        else:
            return self.get(f"{prefix}.weight")
        norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        return g * v / np.maximum(norm, 1e-12)


def conv_kernel(w):
    """torch Conv1d (out,in,k) -> flax (k,in,out)."""
    return np.transpose(w, (2, 1, 0))


def deconv_kernel(w):
    """torch ConvTranspose1d (in,out,k) -> flax ConvTranspose (k,in,out).

    torch's transposed conv is the *gradient* of a conv (kernel flipped
    relative to flax's fractionally-strided correlation), so flip the
    spatial axis."""
    return np.transpose(w, (2, 0, 1))[::-1].copy()


def dense(sd: _SD, prefix: str, bias: bool = True):
    out = {"kernel": sd.get(f"{prefix}.weight").T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd.get(f"{prefix}.bias")
    return out


def wn_dense(sd: _SD, prefix: str):
    """WNConv1d(k=1) folded into a Dense: (out,in,1) -> kernel (in,out)."""
    w = sd.folded_wn(prefix)[:, :, 0]
    out = {"kernel": w.T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd.get(f"{prefix}.bias")
    return out


def layer_norm(sd: _SD, prefix: str):
    return {"scale": sd.get(f"{prefix}.weight"), "bias": sd.get(f"{prefix}.bias")}


def _attention(sd: _SD, prefix: str):
    return {
        "q_w": sd.get(f"{prefix}.q_proj.weight").T,
        "q_b": sd.get(f"{prefix}.q_proj.bias"),
        "k_w": sd.get(f"{prefix}.k_proj.weight").T,
        "v_w": sd.get(f"{prefix}.v_proj.weight").T,
        "v_b": sd.get(f"{prefix}.v_proj.bias"),
        "o_w": sd.get(f"{prefix}.out_proj.weight").T,
        "o_b": sd.get(f"{prefix}.out_proj.bias"),
    }


def _transformer_layer(sd: _SD, prefix: str):
    return {
        "attn_ln": layer_norm(sd, f"{prefix}.self_attn_layer_norm"),
        "attn": _attention(sd, f"{prefix}.self_attn"),
        "ffn_ln": layer_norm(sd, f"{prefix}.final_layer_norm"),
        "fc1": dense(sd, f"{prefix}.fc1"),
        "fc2": dense(sd, f"{prefix}.fc2"),
    }


def _stack_trees(per_layer):
    """Stack identical per-layer param trees into one (L, ...) tree — the
    layout of the scanned stacks (transformer_stack / VocosBackbone blocks)."""
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per_layer)


def restack_legacy_pytree(tree):
    """Upgrade a pre-scan native codec pytree to the scanned layout.

    Checkpoints saved before the transformer/ConvNeXt stacks ran under
    ``nn.scan`` hold per-layer subtrees (``layer_0..layer_{N-1}``,
    ``block_0..block_{N-1}``); the scanned modules expect ONE stacked
    (L, ...) tree under ``layers/layer`` / ``blocks/block``
    (models/codec/transformer.py transformer_stack, vocos.py VocosBackbone).
    Detects the legacy keys anywhere in the tree and stacks them in place —
    without this, an old checkpoint loads cleanly and then fails deep inside
    flax with a missing-param error on first use. New-format trees pass
    through untouched (detection requires a contiguous indexed run)."""
    if not isinstance(tree, dict):
        return tree
    out = {k: restack_legacy_pytree(v) for k, v in tree.items()}
    for prefix, group, inner in (("layer_", "layers", "layer"),
                                 ("block_", "blocks", "block")):
        idx = sorted(int(k[len(prefix):]) for k in out
                     if k.startswith(prefix) and k[len(prefix):].isdigit())
        if idx and idx == list(range(len(idx))) and group not in out:
            per = [out.pop(f"{prefix}{i}") for i in idx]
            out[group] = {inner: _stack_trees(per)}
    return out


def _transformer_layers(sd: _SD, prefix: str, num_layers: int):
    """Reference per-layer `layers.{i}.*` weights -> scanned `layers/layer/...`
    stacked tree (models/codec/transformer.py transformer_stack)."""
    return {"layer": _stack_trees(
        [_transformer_layer(sd, f"{prefix}.layers.{i}")
         for i in range(num_layers)])}


def _audio_encoder(sd: _SD, prefix: str, num_layers: int):
    out = {
        "conv1": {"kernel": conv_kernel(sd.get(f"{prefix}.conv1.weight")),
                  "bias": sd.get(f"{prefix}.conv1.bias")},
        "conv2": {"kernel": conv_kernel(sd.get(f"{prefix}.conv2.weight")),
                  "bias": sd.get(f"{prefix}.conv2.bias")},
        "final_ln": layer_norm(sd, f"{prefix}.layer_norm"),
        "layers": _transformer_layers(sd, prefix, num_layers),
    }
    return out


def _audio_decoder(sd: _SD, prefix: str, num_layers: int):
    out = {
        "deconv1": {"kernel": deconv_kernel(sd.get(f"{prefix}.deconv1.weight")),
                    "bias": sd.get(f"{prefix}.deconv1.bias")},
        "deconv2": {"kernel": deconv_kernel(sd.get(f"{prefix}.deconv2.weight")),
                    "bias": sd.get(f"{prefix}.deconv2.bias")},
        "final_ln": layer_norm(sd, f"{prefix}.layer_norm"),
        "layers": _transformer_layers(sd, prefix, num_layers),
    }
    return out


def _adapter(sd: _SD, prefix: str, num_layers: int):
    out = {"final_ln": layer_norm(sd, f"{prefix}.layer_norm"),
           "layers": _transformer_layers(sd, prefix, num_layers)}
    if f"{prefix}.proj.weight" in sd:
        out["in_proj"] = dense(sd, f"{prefix}.proj")
    if f"{prefix}.out_proj.weight" in sd:
        out["out_proj"] = dense(sd, f"{prefix}.out_proj")
    return out


def _ada_layer_norm(sd: _SD, prefix: str):
    """Reference AdaLayerNorm (modules.py:1157-1184) scale/shift embeddings."""
    return {"scale": sd.get(f"{prefix}.scale.weight"),
            "shift": sd.get(f"{prefix}.shift.weight")}


def _norm(sd: _SD, prefix: str, adanorm: bool):
    return _ada_layer_norm(sd, prefix) if adanorm else layer_norm(sd, prefix)


def _convnext_backbone(sd: _SD, prefix: str, num_layers: int,
                       adanorm: bool = False):
    def block(i):
        p = f"{prefix}.convnext.{i}"
        return {
            "dwconv": {"kernel": conv_kernel(sd.get(f"{p}.dwconv.weight")),
                       "bias": sd.get(f"{p}.dwconv.bias")},
            "norm": _norm(sd, f"{p}.norm", adanorm),
            "pwconv1": dense(sd, f"{p}.pwconv1"),
            "pwconv2": dense(sd, f"{p}.pwconv2"),
            "gamma": sd.get(f"{p}.gamma"),
        }

    return {
        "embed": {"kernel": conv_kernel(sd.get(f"{prefix}.embed.weight")),
                  "bias": sd.get(f"{prefix}.embed.bias")},
        "norm": _norm(sd, f"{prefix}.norm", adanorm),
        "final_ln": layer_norm(sd, f"{prefix}.final_layer_norm"),
        # scanned ConvNeXt stack (models/codec/vocos.py VocosBackbone)
        "blocks": {"block": _stack_trees([block(i)
                                          for i in range(num_layers)])},
    }


def _resnet_backbone(sd: _SD, prefix: str, num_blocks: int):
    """Reference VocosResNetBackbone (modules.py:1413-1449): weight-normed
    embed conv + ResBlock1 stack; weight norms folded, (dim,1) gammas
    squeezed to (dim,)."""
    backbone = {
        "embed": {"kernel": conv_kernel(sd.folded_wn(f"{prefix}.embed")),
                  "bias": sd.get(f"{prefix}.embed.bias")},
    }
    for i in range(num_blocks):
        p = f"{prefix}.resnet.{i}"
        blk = {}
        for j in range(3):
            blk[f"conv1_{j}"] = {
                "kernel": conv_kernel(sd.folded_wn(f"{p}.convs1.{j}")),
                "bias": sd.get(f"{p}.convs1.{j}.bias")}
            blk[f"conv2_{j}"] = {
                "kernel": conv_kernel(sd.folded_wn(f"{p}.convs2.{j}")),
                "bias": sd.get(f"{p}.convs2.{j}.bias")}
            if f"{p}.gamma.{j}" in sd:
                blk[f"gamma_{j}"] = sd.get(f"{p}.gamma.{j}")[:, 0]
        backbone[f"resblock_{i}"] = blk
    return backbone


def _vocos(sd: _SD, prefix: str, cfg):
    """Full Vocos generator family; ``cfg`` is a VocosConfig (an int is
    accepted as a legacy shorthand for convnext num_layers + istft head)."""
    from ..core.config import VocosConfig
    if isinstance(cfg, int):
        cfg = VocosConfig(num_layers=cfg)
    adanorm = cfg.adanorm_num_embeddings is not None
    if cfg.backbone == "convnext":
        backbone = _convnext_backbone(sd, f"{prefix}.backbone",
                                      cfg.num_layers, adanorm)
    elif cfg.backbone == "resnet":
        backbone = _resnet_backbone(sd, f"{prefix}.backbone", cfg.num_blocks)
    else:
        raise ValueError(f"unknown backbone {cfg.backbone!r}")
    # all reference heads expose one linear "out" (modules.py:957, 1014, 1071)
    return {"backbone": backbone, "head": {"out": dense(sd, f"{prefix}.head.out")}}


def convert_codec_state_dict(sd_raw: Dict, cfg: CodecConfig) -> dict:
    sd = _SD(sd_raw)
    q = cfg.quantizer
    codebooks = np.stack([sd.get(f"quantizer.quantizers.{i}.codebook")
                          for i in range(q.num_quantizers)])
    quantizer = {"codebook": codebooks}
    if q.input_dim != q.rvq_dim:
        quantizer["input_proj"] = wn_dense(sd, "quantizer.input_proj")
    if q.rvq_dim != q.output_dim:
        quantizer["output_proj"] = wn_dense(sd, "quantizer.output_proj")

    params = {
        "semantic_encoder": _audio_encoder(
            sd, "semantic_encoder", cfg.semantic_encoder.encoder_layers),
        "semantic_encoder_adapter": _adapter(
            sd, "semantic_encoder_adapter",
            cfg.semantic_encoder_adapter.encoder_layers),
        "acoustic_encoder": _audio_encoder(
            sd, "acoustic_encoder", cfg.acoustic_encoder.encoder_layers),
        "pre_rvq_adapter": _adapter(
            sd, "pre_rvq_adapter", cfg.pre_rvq_adapter.encoder_layers),
        "downsample": {
            "gate_proj": {"kernel": conv_kernel(sd.get("downsample.gate_proj.weight"))},
            "up_proj": {"kernel": conv_kernel(sd.get("downsample.up_proj.weight"))},
            "down_proj": {"kernel": sd.get("downsample.down_proj.weight").T},
            "ln": layer_norm(sd, "downsample.layer_norm"),
        },
        "quantizer": quantizer,
        "post_rvq_adapter": _adapter(
            sd, "post_rvq_adapter", cfg.post_rvq_adapter.encoder_layers),
        "upsample": {
            "up_conv": {"kernel": deconv_kernel(sd.get("upsample.up_conv.weight"))},
        },
        "acoustic_decoder": _audio_decoder(
            sd, "acoustic_decoder", cfg.acoustic_decoder.decoder_layers),
        "vocos": _vocos(sd, "enhanced_vocos", cfg.vocos),
    }
    return {"params": params}


def convert_codec_checkpoint(cfg: CodecConfig, ckpt_path: str) -> dict:
    import torch
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if "generator" in ckpt:       # reference model.py:274-277
        ckpt = ckpt["generator"]
    return convert_codec_state_dict(ckpt, cfg)
