"""Vocos vocoder — TPU-native equivalent of the reference's ConvNeXt backbone +
ISTFT head (reference XY_Tokenizer/xy_tokenizer/nn/modules.py:1096-1479).

(B, T, C) layout; the ISTFT overlap-add is the static pad+add formulation from
ops.dsp (no F.fold).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.config import VocosConfig
from ...ops.dsp import istft_same_masked


class ConvNeXtBlock(nn.Module):
    """1D ConvNeXt block (reference modules.py:1096-1154): depthwise k7 conv,
    LN, pointwise 1x expand + GELU + project, layer-scale gamma, residual.

    ``mask`` zeroes the conv INPUT beyond each row's valid length: the
    reference runs on ragged (unpadded) tensors, so its conv zero-padding
    starts exactly at the valid end; masking every conv input on our
    fixed-shape padded tensors reproduces that bit-for-bit."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        x = jnp.where(mask, x, 0)
        residual = x
        x = nn.Conv(self.dim, (7,), padding=[(3, 3)], feature_group_count=self.dim,
                    name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return residual + gamma * x


class VocosBackbone(nn.Module):
    """Reference modules.py:1347-1410: embed conv k7, LN, N ConvNeXt blocks, LN."""

    cfg: VocosConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = jnp.where(mask, x, 0)
        x = nn.Conv(c.dim, (7,), padding=[(3, 3)], name="embed")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        scale = 1.0 / c.num_layers
        for i in range(c.num_layers):
            x = ConvNeXtBlock(c.dim, c.intermediate_dim, scale,
                              name=f"block_{i}")(x, mask)
        return nn.LayerNorm(epsilon=1e-6, name="final_ln")(x)


class ISTFTHead(nn.Module):
    """Reference modules.py:939-988: linear -> (log-mag | phase) -> complex
    spectrogram -> same-padding ISTFT (ragged-aware, see istft_same_masked)."""

    dim: int
    n_fft: int
    hop: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        n_bins = self.n_fft // 2 + 1
        h = nn.Dense(self.n_fft + 2, name="out")(x)          # (B, T, 2*n_bins)
        h = jnp.swapaxes(h, -1, -2)                          # (B, 2*n_bins, T)
        mag, p = h[..., :n_bins, :], h[..., n_bins:, :]
        mag = jnp.minimum(jnp.exp(mag.astype(jnp.float32)), 1e2)
        re = mag * jnp.cos(p.astype(jnp.float32))
        im = mag * jnp.sin(p.astype(jnp.float32))
        return istft_same_masked(re, im, self.n_fft, self.hop, lengths)


class Vocos(nn.Module):
    """Reference modules.py:1451-1479: backbone + ISTFT head, x hop_size upsample."""

    cfg: VocosConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        """x: (B, T, input_channels) at 100 Hz -> wav (B, T*hop), lengths*hop."""
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        h = VocosBackbone(self.cfg, name="backbone")(x, mask)
        wav = ISTFTHead(self.cfg.dim, self.cfg.n_fft, self.cfg.hop_size,
                        name="head")(h, lengths)
        return wav, lengths * self.cfg.hop_size
