"""Rotary position embeddings (Qwen3/NEOX-style rotate-half), fp32 tables.

Replaces the RoPE inside the reference's Qwen3Model backbone
(reference modeling_asteroid.py:226 uses transformers Qwen3Model).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int,
                 theta: float = 1_000_000.0):
    """positions (..., T) int -> (cos, sin) each (..., T, head_dim) fp32.

    Frequencies follow the HF convention: inv_freq over even indices, each
    table duplicated across the two rotate-half halves.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq      # (..., T, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)                   # (..., T, D)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (B, T, H, D); cos/sin (B, T, D) -> rotated x, original dtype."""
    xf = x.astype(jnp.float32)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    return (xf * c + rotate_half(xf) * s).astype(x.dtype)
