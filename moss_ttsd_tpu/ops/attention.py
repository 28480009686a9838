"""LLM attention for prefill / decode / training — XLA path.

Replaces the reference's flash-attn-2 CUDA dependency
(reference inference.py:29-30, generation_utils.py:18). The Pallas
flash-attention kernels in ops/pallas_attention.py plug into the same
interface; this module is the portable reference path XLA already fuses well
on TPU (bf16 QK^T on the MXU, fp32 softmax).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of finfo.min: survives bf16 softmax math


def repeat_kv(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """(B, S, Hkv, D) -> (B, S, Hkv*groups, D) for GQA."""
    if groups == 1:
        return x
    B, S, H, D = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (B, S, H, groups, D))
    return x.reshape(B, S, H * groups, D)


def gqa_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  mask: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Grouped-query attention.

    q: (B, T, H, D); k/v: (B, S, Hkv, D); mask: (B, T, S) bool (True = attend).
    Returns (B, T, H, D) in q.dtype. Softmax in fp32.
    """
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    g = H // Hkv
    qg = q.reshape(B, T, Hkv, g, D)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k).astype(jnp.float32) * scale
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v)
    return out.reshape(B, T, H, D)


def gqa_attention_hs(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     mask: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Grouped-query attention over head-major caches.

    q: (B, T, H, D); k/v: (B, Hkv, S, D) — the KV-cache storage layout (heads
    before sequence), read directly with no transpose; mask: (B, T, S) bool.
    Returns (B, T, H, D) in q.dtype. Softmax in fp32.
    """
    B, T, H, D = q.shape
    Hkv = k.shape[1]
    g = H // Hkv
    qg = q.reshape(B, T, Hkv, g, D)
    scores = jnp.einsum("bthgd,bhsd->bhgts", qg, k).astype(jnp.float32) * scale
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgts,bhsd->bthgd", probs, v)
    return out.reshape(B, T, H, D)


def causal_mask(cache_pos, q_len: int, kv_len: int,
                key_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Causal + validity mask (B, q_len, kv_len).

    cache_pos: absolute position of the first query token — a scalar, or a
    (B,) vector when rows sit at different cache depths (continuous batching).
    key_valid: (B, kv_len) validity of cache slots (covers left-padding and
    not-yet-written slots); None means all valid.
    """
    kpos = jnp.arange(kv_len)
    if jnp.ndim(cache_pos) == 0:
        qpos = cache_pos + jnp.arange(q_len)                   # (q,)
        causal = (kpos[None, :] <= qpos[:, None])[None]        # (1, q, k)
    else:
        qpos = jnp.asarray(cache_pos)[:, None] + jnp.arange(q_len)  # (B, q)
        causal = kpos[None, None, :] <= qpos[:, :, None]       # (B, q, k)
    if key_valid is None:
        return jnp.broadcast_to(causal, (causal.shape[0], q_len, kv_len))
    return causal & key_valid[:, None, :]
