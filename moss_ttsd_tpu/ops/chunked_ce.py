"""Memory-efficient multi-channel cross-entropy — the Liger-kernel equivalent.

The reference avoids materializing (B, T, 152k) logits with Triton
LigerForCausalLMLoss (reference modeling_asteroid.py:390-396). Here the same
memory behavior comes from chunking the flattened (B*T) rows through
jax.lax.map with jax.checkpoint: peak live logits are (chunk, V) in both the
forward and backward pass; XLA keeps the matmuls on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def _chunk_ce(h_chunk, labels_chunk, weight_t):
    """h (chunk, D), labels (chunk,), weight (V, D) -> per-row nll (chunk,)."""
    logits = (h_chunk.astype(jnp.float32)
              @ weight_t.astype(jnp.float32))          # (chunk, V)
    lse = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.maximum(labels_chunk, 0)
    tgt = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    nll = lse - tgt
    return jnp.where(labels_chunk == IGNORE_INDEX, 0.0, nll)


def chunked_cross_entropy(hidden: jnp.ndarray, labels: jnp.ndarray,
                          head_weight: jnp.ndarray,
                          num_chunks: int = 8,
                          denom=None) -> jnp.ndarray:
    """Causal-LM CE over one channel without materializing full logits.

    hidden: (B, T, D); labels: (B, T) with -100 = ignore (already shifted by
    the caller); head_weight: (V, D) (tied embedding). Returns mean NLL over
    valid positions (HF ForCausalLMLoss semantics).

    ``denom`` overrides the normalizer (default: this call's valid-label
    count). Gradient accumulation passes the valid count of the WHOLE
    effective batch so that summed micro-batch gradients equal the big-batch
    gradient exactly (the sum-NLL is linear in the micro batches; only the
    shared denominator couples them — see train/step.py).
    """
    B, T, D = hidden.shape
    h = hidden.reshape(B * T, D)
    y = labels.reshape(B * T)
    N = B * T
    # pad rows to a multiple of num_chunks
    pad = (-N) % num_chunks
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        y = jnp.pad(y, (0, pad), constant_values=IGNORE_INDEX)
    chunk = (N + pad) // num_chunks
    h = h.reshape(num_chunks, chunk, D)
    y = y.reshape(num_chunks, chunk)

    wt = head_weight.T                                  # (D, V)
    f = jax.checkpoint(functools.partial(_chunk_ce, weight_t=wt))
    nll = jax.lax.map(lambda args: f(*args), (h, y))    # (num_chunks, chunk)
    valid = (y != IGNORE_INDEX).sum() if denom is None else denom
    return nll.sum() / jnp.maximum(valid, 1)


def shift_for_causal(labels: jnp.ndarray) -> jnp.ndarray:
    """HF ForCausalLMLoss shift: position t predicts label t+1.

    labels (B, T) -> (B, T) where row t holds original label t+1 and the last
    position is ignored."""
    return jnp.concatenate(
        [labels[:, 1:], jnp.full_like(labels[:, :1], IGNORE_INDEX)], axis=1)


def valid_label_counts(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-channel valid (non--100) SHIFTED label counts.

    labels: (..., T, C) — any number of leading batch/micro axes. Returns
    (C,) int32. Used as the shared CE denominator for exact gradient
    accumulation (counts depend only on the labels, never on params)."""
    shifted = labels[..., 1:, :]        # shift_for_causal drops position 0
    return (shifted != IGNORE_INDEX).sum(
        axis=tuple(range(shifted.ndim - 1))).astype(jnp.int32)


def asteroid_loss(hidden: jnp.ndarray, labels: jnp.ndarray,
                  embed_text: jnp.ndarray, embed_speech: jnp.ndarray,
                  weights, num_chunks: int = 8, counts=None):
    """Weighted multi-channel loss (reference modeling_asteroid.py:382-410).

    labels: (B, T, C) with -100 masking; weights: per-channel list (the
    finetune default is [8,2,1,1,1,1,1,1], reference finetune.py:132).
    Returns (total_loss, per_channel_losses (C,)).

    ``counts`` (C,) overrides each channel's CE denominator with the valid
    count of the whole effective batch (gradient accumulation): summed
    micro-batch losses/gradients then equal the big-batch ones exactly.
    """
    C = labels.shape[-1]
    losses = []
    losses.append(chunked_cross_entropy(
        hidden, shift_for_causal(labels[..., 0]), embed_text, num_chunks,
        denom=None if counts is None else counts[0]))
    for i in range(1, C):
        losses.append(chunked_cross_entropy(
            hidden, shift_for_causal(labels[..., i]), embed_speech[i - 1],
            num_chunks=1, denom=None if counts is None else counts[i]))
    losses = jnp.stack(losses)
    w = jnp.asarray(weights, jnp.float32)
    w = w / w.sum()
    return jnp.sum(w * losses), losses
