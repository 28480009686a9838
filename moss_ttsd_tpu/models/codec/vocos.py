"""Vocos vocoder family — TPU-native equivalent of the reference's generators
(reference XY_Tokenizer/xy_tokenizer/nn/modules.py:795-1479).

(B, T, C) layout; the ISTFT overlap-add is the static pad+add formulation from
ops.dsp (no F.fold); the MDCT heads ride the real-matmul mdct/imdct bases.

Config-selectable (VocosConfig.backbone/head): the shipped checkpoint uses
ConvNeXt backbone + ISTFT head; the ResNet backbone (modules.py:1413-1449),
AdaLayerNorm conditioning (:1157-1184), and the IMDCT heads (:991-1093) are
the reference's alternative generators, all implemented for completeness.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import VocosConfig
from ...ops.dsp import imdct, istft_same_masked


def symexp(x: jnp.ndarray) -> jnp.ndarray:
    """Reference modules.py:661-662."""
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


class AdaLayerNorm(nn.Module):
    """Adaptive LayerNorm with per-class scale/shift embeddings
    (reference modules.py:1157-1184)."""

    num_embeddings: int
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond_id: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones,
                           (self.num_embeddings, self.dim))
        shift = self.param("shift", nn.initializers.zeros,
                           (self.num_embeddings, self.dim))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return x * jnp.take(scale, cond_id, axis=0) \
            + jnp.take(shift, cond_id, axis=0)


class ConvNeXtBlock(nn.Module):
    """1D ConvNeXt block (reference modules.py:1096-1154): depthwise k7 conv,
    LN (plain or AdaLayerNorm), pointwise 1x expand + GELU + project,
    layer-scale gamma, residual.

    ``mask`` zeroes the conv INPUT beyond each row's valid length: the
    reference runs on ragged (unpadded) tensors, so its conv zero-padding
    starts exactly at the valid end; masking every conv input on our
    fixed-shape padded tensors reproduces that bit-for-bit."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float
    adanorm_num_embeddings: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 cond_id: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = jnp.where(mask, x, 0)
        residual = x
        x = nn.Conv(self.dim, (7,), padding=[(3, 3)], feature_group_count=self.dim,
                    name="dwconv")(x)
        if self.adanorm_num_embeddings is not None:
            assert cond_id is not None, "adanorm needs a cond_id"
            x = AdaLayerNorm(self.adanorm_num_embeddings, self.dim,
                             name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return residual + gamma * x


class _ScanConvNeXtBlock(nn.Module):
    """scan-body wrapper: carry = x, broadcast mask/cond_id."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float
    adanorm_num_embeddings: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 cond_id: Optional[jnp.ndarray]):
        x = ConvNeXtBlock(self.dim, self.intermediate_dim,
                          self.layer_scale_init, self.adanorm_num_embeddings,
                          name="block")(x, mask, cond_id)
        return x, None


class VocosBackbone(nn.Module):
    """Reference modules.py:1347-1410: embed conv k7, LN (plain/adaptive),
    N ConvNeXt blocks, LN.

    The N identical blocks run as ONE `nn.scan` over stacked (L, ...) weights
    (param tree ``blocks/block/...``) instead of N Python-unrolled block
    bodies — XLA compiles a single block (the 30-block stack was a major
    share of the codec's cold compile); numerics are unchanged (same ops on
    slices of the stacked params)."""

    cfg: VocosConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 cond_id: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        x = jnp.where(mask, x, 0)
        x = nn.Conv(c.dim, (7,), padding=[(3, 3)], name="embed")(x)
        if c.adanorm_num_embeddings is not None:
            assert cond_id is not None, "adanorm needs a cond_id"
            x = AdaLayerNorm(c.adanorm_num_embeddings, c.dim,
                             name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        scale = 1.0 / c.num_layers
        blocks = nn.scan(
            _ScanConvNeXtBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=c.num_layers,
        )(c.dim, c.intermediate_dim, scale, c.adanorm_num_embeddings,
          name="blocks")
        x, _ = blocks(x, mask, cond_id)
        return nn.LayerNorm(epsilon=1e-6, name="final_ln")(x)


class ResBlock1(nn.Module):
    """HiFi-GAN V1 ResBlock without upsampling (reference modules.py:1187-1327):
    3x (leaky_relu -> dilated conv -> leaky_relu -> conv [-> gamma]) residual
    pairs, dilations (1,3,5). Weight-normed convs are folded at conversion."""

    dim: int
    kernel_size: int = 3
    dilation: tuple = (1, 3, 5)
    lrelu_slope: float = 0.1
    layer_scale_init: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        for i, d in enumerate(self.dilation):
            pad = (k * d - d) // 2
            xt = nn.leaky_relu(jnp.where(mask, x, 0),
                               negative_slope=self.lrelu_slope)
            xt = nn.Conv(self.dim, (k,), kernel_dilation=(d,),
                         padding=[(pad, pad)], name=f"conv1_{i}")(
                jnp.where(mask, xt, 0))
            xt = nn.leaky_relu(xt, negative_slope=self.lrelu_slope)
            pad1 = (k - 1) // 2
            xt = nn.Conv(self.dim, (k,), padding=[(pad1, pad1)],
                         name=f"conv2_{i}")(jnp.where(mask, xt, 0))
            if self.layer_scale_init is not None:
                gamma = self.param(f"gamma_{i}",
                                   nn.initializers.constant(self.layer_scale_init),
                                   (self.dim,))
                xt = gamma * xt
            x = xt + x
        return x


class VocosResNetBackbone(nn.Module):
    """Reference modules.py:1413-1449: weight-normed embed conv k3 +
    num_blocks ResBlock1 (layer_scale 1/blocks/3)."""

    cfg: VocosConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 cond_id: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        x = nn.Conv(c.dim, (3,), padding=[(1, 1)], name="embed")(
            jnp.where(mask, x, 0))
        scale = 1.0 / c.num_blocks / 3.0
        for i in range(c.num_blocks):
            x = ResBlock1(c.dim, layer_scale_init=scale,
                          name=f"resblock_{i}")(x, mask)
        return x


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


def _mel_scale_init(sample_rate: int, out_dim: int):
    """IMDCTSymExpHead's perceptual last-layer init (reference
    modules.py:1018-1026, htk mel scale): column k of the kernel is scaled by
    1 - f_k / f_max."""
    m_max = 2595.0 * np.log10(1.0 + (sample_rate // 2) / 700.0)
    m_pts = np.linspace(0, m_max, out_dim)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    scale = (1.0 - f_pts / f_pts.max()).astype(np.float32)
    base = nn.initializers.lecun_normal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale[None, :]

    return init


class IMDCTSymExpHead(nn.Module):
    """Reference modules.py:991-1048: linear -> symexp -> clip ±1e2 -> IMDCT.

    ``clip_audio`` clips the AUDIO to [-1, 1]. The reference's clip_audio
    branch instead clips — and returns — the coefficient tensor
    (``audio = torch.clip(x, ...)``, modules.py:1044-1046, a variable-misuse
    bug); ``clip_coeffs=True`` reproduces that bit-for-bit (returning the
    flattened clipped coefficients, frame_len//2 values per frame) for
    checkpoint-exactness audits."""

    dim: int
    mdct_frame_len: int
    padding: str = "same"
    sample_rate: Optional[int] = None
    clip_audio: bool = False
    clip_coeffs: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        out_dim = self.mdct_frame_len // 2
        kinit = (_mel_scale_init(self.sample_rate, out_dim)
                 if self.sample_rate is not None
                 else nn.initializers.lecun_normal())
        x = nn.Dense(out_dim, kernel_init=kinit, name="out")(x)
        x = jnp.clip(symexp(x.astype(jnp.float32)), -1e2, 1e2)
        T = x.shape[1]
        x = jnp.where((jnp.arange(T)[None, :] < lengths[:, None])[..., None],
                      x, 0)
        if self.clip_audio and self.clip_coeffs:
            return jnp.clip(x, -1.0, 1.0).reshape(x.shape[0], -1)
        audio = imdct(x, self.mdct_frame_len, self.padding)
        if self.clip_audio:
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio


class IMDCTCosHead(nn.Module):
    """Reference modules.py:1051-1093: linear -> exp(m)·cos(p) -> IMDCT.

    ``clip_audio`` clips the AUDIO. ``clip_coeffs=True`` reproduces the
    reference's clip_audio branch bit-for-bit: it returns the clipped RAW
    linear output (``audio = torch.clip(x, ...)``, modules.py:1091-1093 —
    frame_len values per frame, not audio), flattened."""

    dim: int
    mdct_frame_len: int
    padding: str = "same"
    clip_audio: bool = False
    clip_coeffs: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.mdct_frame_len, name="out")(x)
        x = x.astype(jnp.float32)
        T = x.shape[1]
        valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        if self.clip_audio and self.clip_coeffs:
            return jnp.clip(jnp.where(valid, x, 0),
                            -1.0, 1.0).reshape(x.shape[0], -1)
        m, p = jnp.split(x, 2, axis=-1)
        coeffs = jnp.minimum(jnp.exp(m), 1e2) * jnp.cos(p)
        coeffs = jnp.where(valid, coeffs, 0)
        audio = imdct(coeffs, self.mdct_frame_len, self.padding)
        if self.clip_audio:
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio


class Vocos(nn.Module):
    """Reference modules.py:1451-1479: backbone + head, config-selectable
    across the full reference generator family."""

    cfg: VocosConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 cond_id: Optional[jnp.ndarray] = None):
        """x: (B, T, input_channels) at 100 Hz -> wav (B, T*up), lengths*up."""
        c = self.cfg
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        if c.backbone == "convnext":
            h = VocosBackbone(c, name="backbone")(x, mask, cond_id)
        elif c.backbone == "resnet":
            h = VocosResNetBackbone(c, name="backbone")(x, mask, cond_id)
        else:
            raise ValueError(f"unknown backbone {c.backbone!r}")
        if c.head == "istft":
            if c.padding != "same":
                # istft_same_masked implements same-padding only (the XY
                # production config); silently computing 'same' semantics
                # for padding='center' would misalign the waveform
                raise NotImplementedError(
                    f"ISTFT head supports padding='same' only, got "
                    f"{c.padding!r} (the IMDCT heads honor both)")
            wav = ISTFTHead(c.dim, c.n_fft, c.hop_size, name="head")(h, lengths)
            up = c.hop_size
        elif c.head == "imdct_symexp":
            wav = IMDCTSymExpHead(c.dim, c.mdct_frame_len, c.padding,
                                  c.head_sample_rate, c.clip_audio,
                                  c.clip_coeffs, name="head")(h, lengths)
            # strict-parity clip_coeffs mode returns frame_len//2 coefficient
            # values per frame — numerically the same per-frame width as audio
            up = c.mdct_frame_len // 2
        elif c.head == "imdct_cos":
            wav = IMDCTCosHead(c.dim, c.mdct_frame_len, c.padding,
                               c.clip_audio, c.clip_coeffs,
                               name="head")(h, lengths)
            up = c.mdct_frame_len // 2
            if c.clip_audio and c.clip_coeffs:
                up = c.mdct_frame_len    # raw linear output width per frame
        else:
            raise ValueError(f"unknown head {c.head!r}")
        return wav, lengths * up
