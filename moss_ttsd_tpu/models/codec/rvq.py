"""Residual vector quantizer — TPU-native equivalent of the reference's
ResidualVQ/VectorQuantize (reference XY_Tokenizer/xy_tokenizer/nn/quantizer.py).

All quantizer math is fp32 (the reference force-casts to fp32 throughout,
quantizer.py:154-191). Codebooks live in a ``vq`` flax variable collection:
they are EMA-updated, not SGD-trained. The distributed codebook-statistics
protocol (reference quantizer.py:101-103 NCCL all_reduce) becomes a
``jax.lax.psum`` over the data-parallel mesh axis — see ``ema_update``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.config import RVQConfig


def nearest_codes(z_e: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """L2-nearest codebook index per vector.

    z_e: (..., D); codebook: (K, D). Returns (...,) int32.
    Matches reference quantizer.py:167-172 (argmax of negative distance).
    """
    z = z_e.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    # ||z||^2 - 2 z.cb + ||cb||^2 ; ||z||^2 constant per row -> drop it
    dist = -2.0 * (z @ cb.T) + jnp.sum(cb * cb, axis=-1)[None, :]
    return jnp.argmin(dist.reshape(-1, cb.shape[0]), axis=-1).reshape(z_e.shape[:-1]).astype(jnp.int32)


class ResidualVQ(nn.Module):
    """8-stage residual VQ with in/out projections.

    Reference parity: quantizer.py:196-343. The reference's WNConv1d(k=1)
    input/output projections are folded to plain dense layers (weight-norm
    reparameterization is an optimizer trick; the converter folds g*v/||v||).
    """

    cfg: RVQConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray, lengths: jnp.ndarray,
                 n_quantizers: Optional[int] = None):
        """Quantize z (B, T, input_dim) -> (zq (B, T, output_dim), codes (nq, B, T),
        commit_losses (nq,), lengths)."""
        c = self.cfg
        nq = n_quantizers or c.num_quantizers

        if c.input_dim != c.rvq_dim:
            z = nn.Dense(c.rvq_dim, name="input_proj")(z)
        z = z.astype(jnp.float32)

        codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.normal(key, shape, jnp.float32),
            (c.num_quantizers, c.codebook_size, c.codebook_dim))

        B, T, _ = z.shape
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]   # (B, T, 1)

        quantized_out = jnp.zeros_like(z)
        residual = z
        codes = []
        commit_losses = []
        for i in range(nq):
            masked_residual = jnp.where(mask, residual, 0.0)
            idx = nearest_codes(masked_residual, codebook[i])           # (B, T)
            z_q = jnp.take(codebook[i], idx, axis=0)                    # (B, T, D)
            commit = jnp.mean((masked_residual - z_q) ** 2, axis=(1, 2)) * c.commitment
            z_q = masked_residual + jax.lax.stop_gradient(z_q - masked_residual)
            quantized_out = quantized_out + jnp.where(mask, z_q, 0.0)
            residual = residual - jnp.where(mask, z_q, 0.0)
            codes.append(idx)
            commit_losses.append(jnp.mean(commit))

        out = quantized_out
        if c.rvq_dim != c.output_dim:
            out = nn.Dense(c.output_dim, name="output_proj")(out)
        return out, jnp.stack(codes), jnp.stack(commit_losses), lengths

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (nq, B, T) -> embeddings (B, T, output_dim).

        Reference parity: quantizer.py:345-364 (sum of codebook lookups then
        output projection). Implemented as one gather + sum over stages.
        """
        c = self.cfg
        codebook = self.get_variable("params", "codebook")
        nq = codes.shape[0]
        emb = jnp.zeros(codes.shape[1:] + (c.codebook_dim,), jnp.float32)
        for i in range(nq):
            emb = emb + jnp.take(codebook[i], codes[i], axis=0)
        if c.rvq_dim != c.output_dim:
            kernel = self.get_variable("params", "output_proj")["kernel"]
            bias = self.get_variable("params", "output_proj")["bias"]
            emb = emb @ kernel + bias
        return emb


# ---------------------------------------------------------------------------
# EMA codebook training machinery (reference quantizer.py:92-152)
# ---------------------------------------------------------------------------

def ema_update(cluster_size: jnp.ndarray, embed_avg: jnp.ndarray,
               codebook: jnp.ndarray, encodings: jnp.ndarray,
               indices: jnp.ndarray, decay: float = 0.99, epsilon: float = 1e-5,
               axis_name: Optional[str] = None):
    """One EMA codebook update for a single VQ stage.

    encodings: (N, D) fp32 vectors assigned this step; indices: (N,) their codes.
    When ``axis_name`` is set (inside shard_map/pjit over a data axis), the
    batch statistics are summed across the mesh with psum — the TPU-ICI
    equivalent of the reference's NCCL all_reduce (quantizer.py:101-103).

    Returns (new_cluster_size, new_embed_avg, new_codebook).
    """
    K = codebook.shape[0]
    onehot = jax.nn.one_hot(indices, K, dtype=jnp.float32)          # (N, K)
    cluster_new = jnp.sum(onehot, axis=0)                           # (K,)
    embed_sum = encodings.astype(jnp.float32).T @ onehot            # (D, K)
    if axis_name is not None:
        cluster_new = jax.lax.psum(cluster_new, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    new_cluster = cluster_size * decay + cluster_new * (1 - decay)
    new_avg = embed_avg * decay + embed_sum.T * (1 - decay)
    # Laplace smoothing (reference quantizer.py:108-111)
    n = jnp.sum(new_cluster)
    smoothed = (new_cluster + epsilon) / (n + K * epsilon) * n
    new_codebook = new_avg / smoothed[:, None]
    return new_cluster, new_avg, new_codebook


def replace_dead_codes(codebook: jnp.ndarray, cluster_size: jnp.ndarray,
                       encodings: jnp.ndarray, rng: jax.Array,
                       threshold: float = 2.0) -> jnp.ndarray:
    """Resample dead codebook entries from the batch (reference quantizer.py:113-130).

    Deterministic given rng — under pjit every device computes the same
    replacement, which supersedes the reference's rank-0 broadcast protocol.
    """
    K = codebook.shape[0]
    N = encodings.shape[0]
    idx = jax.random.randint(rng, (K,), 0, N)
    samples = jnp.take(encodings.astype(jnp.float32), idx, axis=0)
    dead = cluster_size < threshold
    return jnp.where(dead[:, None], samples, codebook)


def kmeans_init(encodings: jnp.ndarray, num_clusters: int, rng: jax.Array,
                num_iters: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-means codebook init (reference quantizer.py:25-52), jittable.

    Returns (means (K, D), bins (K,)).
    """
    x = encodings.astype(jnp.float32)
    N, D = x.shape
    perm = jax.random.permutation(rng, N)[:num_clusters]
    means = x[perm]

    def step(means, _):
        d = -2.0 * (x @ means.T) + jnp.sum(means * means, axis=-1)[None, :]
        buckets = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32)
        bins = jnp.sum(onehot, axis=0)
        sums = onehot.T @ x
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        means = jnp.where((bins == 0)[:, None], means, new_means)
        return means, None

    means, _ = jax.lax.scan(step, means, None, length=num_iters)
    d = -2.0 * (x @ means.T) + jnp.sum(means * means, axis=-1)[None, :]
    buckets = jnp.argmin(d, axis=-1)
    bins = jnp.sum(jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32), axis=0)
    return means, bins
