"""Codec transformer stack — TPU-native equivalents of the reference's
Whisper-style modules (reference XY_Tokenizer/xy_tokenizer/nn/modules.py:25-640:
sinusoids, VarLenAttention, OmniWhisperTransformerLayer, OmniAudioEncoder,
OmniAudioDecoder, Transformer adapter).

Architecture redesign for TPU:
  * (B, T, D) layout end to end — the reference's (B, D, T) + transpose-per-layer
    pattern is a CUDA-conv convention; XLA convs are NWC-native.
  * Length masks are built once per stack and broadcast; attention masking is a
    single additive key-mask (padding query rows are zeroed at the stack output,
    matching the reference's post-hoc `torch.where(mask, h, 0)`).
  * exact (erf) GELU to match torch's ACT2FN["gelu"].
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import AdapterTransformerConfig, AudioDecoderConfig, AudioEncoderConfig


def sinusoid_table(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper sinusoidal positions (reference modules.py:25-31): [sin | cos]."""
    assert channels % 2 == 0
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool validity mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def masked_attention(x: jnp.ndarray, mask: jnp.ndarray, q_w, q_b, k_w, v_w, v_b,
                     o_w, o_b, num_heads: int) -> jnp.ndarray:
    """Dense variable-length self-attention (reference VarLenAttention,
    modules.py:58-160). k has no bias, q/v/o do — matching the reference.

    x: (B, T, D); mask: (B, T) key validity. fp32 softmax.
    """
    B, T, D = x.shape
    head_dim = D // num_heads
    scale = head_dim ** -0.5
    q = (x @ q_w + q_b) * scale
    k = x @ k_w
    v = x @ v_w + v_b
    q = q.reshape(B, T, num_heads, head_dim)
    k = k.reshape(B, T, num_heads, head_dim)
    v = v.reshape(B, T, num_heads, head_dim)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None, None, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
    return out @ o_w + o_b


class SelfAttention(nn.Module):
    """Projection container for masked_attention."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        d = self.d_model
        init = nn.initializers.lecun_normal()
        q_w = self.param("q_w", init, (d, d))
        q_b = self.param("q_b", nn.initializers.zeros, (d,))
        k_w = self.param("k_w", init, (d, d))
        v_w = self.param("v_w", init, (d, d))
        v_b = self.param("v_b", nn.initializers.zeros, (d,))
        o_w = self.param("o_w", init, (d, d))
        o_b = self.param("o_b", nn.initializers.zeros, (d,))
        return masked_attention(x, mask, q_w, q_b, k_w, v_w, v_b, o_w, o_b,
                                self.num_heads)


class TransformerLayer(nn.Module):
    """Pre-LN attention + GELU FFN block (reference OmniWhisperTransformerLayer,
    modules.py:163-205)."""

    d_model: int
    num_heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(name="attn_ln")(x)
        x = x + SelfAttention(self.d_model, self.num_heads, name="attn")(h, mask)
        h = nn.LayerNorm(name="ffn_ln")(x)
        h = nn.Dense(self.ffn_dim, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, name="fc2")(h)
        x = x + h
        if x.dtype in (jnp.float16, jnp.bfloat16):
            clamp = float(jnp.finfo(x.dtype).max) - 1000.0
            x = jnp.clip(x, -clamp, clamp)     # reference NaN/Inf guard, modules.py:201-204
        return x


class _ScanTransformerLayer(nn.Module):
    """scan-body wrapper: carry = x, broadcast mask, no per-layer outputs."""

    d_model: int
    num_heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        x = TransformerLayer(self.d_model, self.num_heads, self.ffn_dim,
                             name="layer")(x, mask)
        return x, None


def transformer_stack(num_layers: int, d_model: int, num_heads: int,
                      ffn_dim: int, name: str = "layers"):
    """The N identical transformer layers as ONE `nn.scan` over stacked
    (L, ...) weights instead of N Python-unrolled blocks: XLA compiles a
    single layer body (the 12-layer encoders x2 + adapters each used to emit
    per-layer HLO — the dominant share of the codec's cold compile), same
    pattern as the LM backbone scan (models/lm.py). Numerics are identical:
    scan executes the very same per-layer ops on slices of the stacked
    params. Param tree: ``{name}/layer/...`` with a leading (L,) axis
    (utils/convert_codec.py stacks reference per-layer weights to match)."""
    return nn.scan(
        _ScanTransformerLayer,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast,),
        length=num_layers,
    )(d_model, num_heads, ffn_dim, name=name)


class AudioEncoder(nn.Module):
    """Mel -> hidden states at half rate (reference OmniAudioEncoder,
    modules.py:208-326): conv(k3,p1) + GELU, conv(k3,s2,p1) + GELU, +sinusoid
    positions (fp32 add), N transformer layers, final LN, zero padding.

    Input  (B, T_mel, n_mels); output (B, T_mel//2, d_model), lengths//2.
    """

    cfg: AudioEncoderConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, lengths: jnp.ndarray):
        c = self.cfg
        x = nn.Conv(c.d_model, (c.kernel_size,), padding=[(1, 1)], name="conv1")(mel)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c.d_model, (c.kernel_size,), strides=(c.stride_size,),
                    padding=[(1, 1)], name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        out_lengths = lengths // c.stride_size

        T = x.shape[1]
        pos = jnp.asarray(sinusoid_table(c.max_source_positions, c.d_model))[:T]
        x = (x.astype(jnp.float32) + pos).astype(x.dtype)

        mask = length_mask(out_lengths, T)
        x, _ = transformer_stack(c.encoder_layers, c.d_model,
                                 c.encoder_attention_heads,
                                 c.encoder_ffn_dim)(x, mask)
        x = nn.LayerNorm(name="final_ln")(x)
        x = jnp.where(mask[:, :, None], x, 0)
        return x, out_lengths


class AudioDecoder(nn.Module):
    """Hidden states -> double-rate features (reference OmniAudioDecoder,
    modules.py:329-423): +positions, N layers, LN, mask, deconv(k3,s2,p0)+GELU,
    deconv(k3,s1,p0)+GELU, trim to T*stride.

    Input (B, T, d_model); output (B, T*stride, num_mel_bins), lengths*stride.
    """

    cfg: AudioDecoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        c = self.cfg
        B, T, D = x.shape
        pos = jnp.asarray(sinusoid_table(c.max_source_positions, c.d_model))[:T]
        x = (x.astype(jnp.float32) + pos).astype(x.dtype)

        mask = length_mask(lengths, T)
        x, _ = transformer_stack(c.decoder_layers, c.d_model,
                                 c.decoder_attention_heads,
                                 c.decoder_ffn_dim)(x, mask)
        x = nn.LayerNorm(name="final_ln")(x)
        x = jnp.where(mask[:, :, None], x, 0)

        x = nn.ConvTranspose(c.d_model, (c.kernel_size,), strides=(c.stride_size,),
                             padding="VALID", name="deconv1")(x)      # (B, 2T+1, D)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(c.num_mel_bins, (c.kernel_size,), strides=(1,),
                             padding="VALID", name="deconv2")(x)      # (B, 2T+3, M)
        x = jax.nn.gelu(x, approximate=False)
        x = x[:, :T * c.stride_size]                                  # trim, modules.py:417-419
        return x, lengths * c.stride_size


class AdapterTransformer(nn.Module):
    """Projection + transformer adapter (reference Transformer, modules.py:519-640)."""

    cfg: AdapterTransformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        c = self.cfg
        if c.input_dim != c.d_model:
            x = nn.Dense(c.d_model, name="in_proj")(x)
        T = x.shape[1]
        pos = jnp.asarray(sinusoid_table(c.max_source_positions, c.d_model))[:T]
        x = (x.astype(jnp.float32) + pos).astype(x.dtype)
        mask = length_mask(lengths, T)
        x, _ = transformer_stack(c.encoder_layers, c.d_model,
                                 c.encoder_attention_heads,
                                 c.encoder_ffn_dim)(x, mask)
        x = nn.LayerNorm(name="final_ln")(x)
        x = jnp.where(mask[:, :, None], x, 0)
        if c.output_dim != c.d_model:
            x = nn.Dense(c.output_dim, name="out_proj")(x)
        return x, lengths


class GatedDownsample(nn.Module):
    """x4 gated downsample (reference ResidualDownConv, modules.py:426-477):
    SiLU(gate_conv(x)) * up_conv(x) -> down_proj, + reshaped residual, LN.

    Input (B, T, d_model) -> (B, T//r, d_model*r), lengths//r.
    """

    d_model: int
    factor: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        r = self.factor
        inter = self.d_model * r
        B, T, D = x.shape
        if T % r != 0:                      # static right-pad to a multiple of r
            pad = r - T % r
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            T = T + pad
        g = nn.Conv(inter, (r,), strides=(r,), padding="VALID", use_bias=False,
                    name="gate_proj")(x)
        u = nn.Conv(inter, (r,), strides=(r,), padding="VALID", use_bias=False,
                    name="up_proj")(x)
        res = x.reshape(B, T // r, inter)
        c = nn.Dense(inter, use_bias=False, name="down_proj")(jax.nn.silu(g) * u)
        out = nn.LayerNorm(name="ln")(c + res)
        return out, lengths // r


class Upsample(nn.Module):
    """x4 upsample (reference UpConv, modules.py:480-515): ConvTranspose(k=s=r).

    Input (B, T, d_model*r) -> (B, T*r, d_model), lengths*r.
    """

    d_model: int
    stride: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        out = nn.ConvTranspose(self.d_model, (self.stride,), strides=(self.stride,),
                               padding="VALID", use_bias=False, name="up_conv")(x)
        return out, lengths * self.stride
