"""Residual vector quantizer — TPU-native equivalent of the reference's
ResidualVQ/VectorQuantize (reference XY_Tokenizer/xy_tokenizer/nn/quantizer.py).

All quantizer math is fp32 (the reference force-casts to fp32 throughout,
quantizer.py:154-191). Training-state design: the reference mutates torch
buffers (codebook / cluster_size / embed_avg / inited) inside
``VectorQuantize.forward`` (quantizer.py:181-185); here the module stays PURE
— ``train_call`` returns the per-stage batch statistics (cluster counts,
embedding sums, dead-code replacement candidates) and the functional EMA
update lives in ``train/codec_step.py``, which threads (cluster_size,
embed_avg) through the train state and rewrites the codebook param each step.
Under pjit/GSPMD the statistics are global-batch sums automatically; under
shard_map/pmap the legacy ``ema_update(axis_name=...)`` psum path applies —
both are the TPU-ICI equivalent of the reference's NCCL all_reduce
(quantizer.py:101-103).
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

    def setup(self):
        c = self.cfg
        if c.input_dim != c.rvq_dim:
            self.input_proj = nn.Dense(c.rvq_dim)
        if c.rvq_dim != c.output_dim:
            self.output_proj = nn.Dense(c.output_dim)
        self.codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.normal(key, shape, jnp.float32),
            (c.num_quantizers, c.codebook_size, c.codebook_dim))

    def _project_in(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.input_dim != self.cfg.rvq_dim:
            z = self.input_proj(z)
        return z.astype(jnp.float32)

    def _project_out(self, out: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.rvq_dim != self.cfg.output_dim:
            out = self.output_proj(out)
        return out

    def __call__(self, z: jnp.ndarray, lengths: jnp.ndarray,
                 n_quantizers: Optional[int] = None):
        """Inference forward: quantize z (B, T, input_dim) ->
        (zq (B, T, output_dim), codes (nq, B, T), commit_losses (nq,), lengths)."""
        c = self.cfg
        nq = n_quantizers or c.num_quantizers
        z = self._project_in(z)
        codebook = self.codebook

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

        out = self._project_out(quantized_out)
        return out, jnp.stack(codes), jnp.stack(commit_losses), lengths

    def train_call(self, z: jnp.ndarray, lengths: jnp.ndarray, rng: jax.Array,
                   n_active_override: Optional[jnp.ndarray] = None,
                   skip_override: Optional[jnp.ndarray] = None):
        """Training-mode forward (reference quantizer.py:244-343 with
        ``self.training`` set): quantizer dropout (:269-273), skip-rvq
        straight-through bypass (:262-267, 284-310), and per-stage EMA batch
        statistics for the functional codebook update in
        ``train/codec_step.py`` (the reference updates its buffers inside
        VectorQuantize.forward:181-185).

        Returns (zq, codes, commit_losses (nq,), lengths, stats) with
        stats = {"cluster_new": (nq, K), "embed_sum": (nq, K, D),
                 "samples": (nq, K, D)}.

        ``n_active_override`` (B,) float / ``skip_override`` (B,) bool replace
        the internally sampled dropout counts / skip mask (used by parity
        tests to pin randomness across frameworks).
        """
        c = self.cfg
        nq = c.num_quantizers
        K = c.codebook_size
        z = self._project_in(z)
        codebook = self.codebook

        B, T, _ = z.shape
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]   # (B, T, 1)
        rng_drop, rng_skip, rng_samp = jax.random.split(rng, 3)

        # quantizer dropout (reference :269-273): the first
        # int(B * quantizer_dropout) rows get a random active-stage count in
        # [1, nq]; the rest use every stage (nq + 1 sentinel).
        if n_active_override is not None:
            n_active = n_active_override.astype(jnp.float32)
        else:
            n_active = jnp.full((B,), nq + 1, jnp.float32)
            n_dropout = int(B * c.quantizer_dropout)
            if n_dropout > 0:
                drawn = jax.random.randint(rng_drop, (B,), 1, nq + 1)
                n_active = jnp.where(jnp.arange(B) < n_dropout,
                                     drawn.astype(jnp.float32), n_active)

        # skip-rvq straight-through bypass (reference :262-267); if every row
        # is skipped, row 0 is forced unskipped.
        if skip_override is not None:
            skip = skip_override.astype(bool)
        elif c.skip_rvq_ratio > 0:
            skip = jax.random.uniform(rng_skip, (B,)) < c.skip_rvq_ratio
            skip = skip.at[0].set(jnp.where(jnp.all(skip), False, skip[0]))
        else:
            skip = jnp.zeros((B,), bool)
        notskip = (~skip).astype(jnp.float32)

        quantized_out = jnp.zeros_like(z)
        residual = z
        codes, commits = [], []
        cluster_new, embed_sum, samples = [], [], []
        samp_rngs = jax.random.split(rng_samp, nq)
        # dead-code candidates are drawn from non-skipped rows only (the
        # reference quantizes only that subset, :290-299); padded time steps
        # participate exactly as in the reference (encodings span all B*T).
        flat_p = jnp.repeat(notskip / jnp.maximum(jnp.sum(notskip), 1.0) / T, T)

        for i in range(nq):
            masked_residual = jnp.where(mask, residual, 0.0)
            idx = nearest_codes(masked_residual, codebook[i])           # (B, T)
            z_q = jnp.take(codebook[i], idx, axis=0)
            commit = jnp.mean(
                (masked_residual - jax.lax.stop_gradient(z_q)) ** 2,
                axis=(1, 2)) * c.commitment                             # (B,)
            z_q = masked_residual + jax.lax.stop_gradient(z_q - masked_residual)

            # skip bypass: output := input, zero commit, zero index
            # (reference :284-310)
            z_q = jnp.where(skip[:, None, None], masked_residual, z_q)
            commit = jnp.where(skip, 0.0, commit)
            idx = jnp.where(skip[:, None], 0, idx)

            qmask = (jnp.float32(i) < n_active)                         # (B,)
            update = mask & qmask[:, None, None]
            quantized_out = quantized_out + jnp.where(update, z_q, 0.0)
            residual = residual - jnp.where(update, z_q, 0.0)

            # per-stage commit averaged over dropout-active rows
            # (reference :319-323)
            denom = jnp.sum(qmask.astype(jnp.float32))
            commits.append(jnp.where(
                denom > 0,
                jnp.sum(commit * qmask) / jnp.maximum(denom, 1.0), 0.0))
            codes.append(idx)

            # EMA batch statistics over non-skipped rows; dropout-gated rows
            # still contribute their (frozen) residual, exactly like the
            # reference where every VectorQuantize.forward call runs EMA on
            # its full input (:181-185)
            enc = jax.lax.stop_gradient(masked_residual)                # (B, T, D)
            onehot = (jax.nn.one_hot(idx, K, dtype=jnp.float32)
                      * notskip[:, None, None])                         # (B, T, K)
            cluster_new.append(jnp.sum(onehot, axis=(0, 1)))            # (K,)
            embed_sum.append(jnp.einsum("btd,btk->kd", enc, onehot))    # (K, D)
            flat_enc = enc.reshape(B * T, -1)
            cand_idx = jax.random.choice(samp_rngs[i], B * T, (K,),
                                         replace=True, p=flat_p)
            samples.append(jnp.take(flat_enc, cand_idx, axis=0))        # (K, D)

        out = self._project_out(quantized_out)
        stats = {"cluster_new": jnp.stack(cluster_new),
                 "embed_sum": jnp.stack(embed_sum),
                 "samples": jnp.stack(samples)}
        return out, jnp.stack(codes), jnp.stack(commits), lengths, stats

    def kmeans_init_call(self, z: jnp.ndarray, lengths: jnp.ndarray,
                         rng: jax.Array, num_iters: int = 10):
        """Sequential k-means initialization of every stage on one batch
        (reference init_codebook, quantizer.py:132-152): stage i is
        initialized from the current residual, quantization then proceeds
        with the fresh codebook before stage i+1.

        Returns (new_codebook (nq, K, D), cluster_sizes (nq, K)).
        """
        c = self.cfg
        z = self._project_in(z)
        B, T, _ = z.shape
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        residual = z
        new_cbs, bins_all = [], []
        for i in range(c.num_quantizers):
            masked_residual = jnp.where(mask, residual, 0.0)
            enc = masked_residual.reshape(B * T, -1)
            rng, sub = jax.random.split(rng)
            means, bins = kmeans_init(enc, c.codebook_size, sub, num_iters)
            new_cbs.append(means)
            bins_all.append(bins)
            idx = nearest_codes(masked_residual, means)
            z_q = jnp.take(means, idx, axis=0)
            residual = residual - jnp.where(mask, z_q, 0.0)
        return jnp.stack(new_cbs), jnp.stack(bins_all)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (nq, B, T) -> embeddings (B, T, output_dim).

        Reference parity: quantizer.py:345-364 (sum of codebook lookups then
        output projection). Implemented as one gather + sum over stages.
        """
        c = self.cfg
        codebook = self.codebook
        nq = codes.shape[0]
        emb = jnp.zeros(codes.shape[1:] + (c.codebook_dim,), jnp.float32)
        for i in range(nq):
            emb = emb + jnp.take(codebook[i], codes[i], axis=0)
        return self._project_out(emb)


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


def ema_update_stacked(cluster_size: jnp.ndarray, embed_avg: jnp.ndarray,
                       cluster_new: jnp.ndarray, embed_sum: jnp.ndarray,
                       decay: float = 0.99, epsilon: float = 1e-5):
    """Vectorized EMA update over ALL stages at once.

    cluster_size/cluster_new: (nq, K); embed_avg/embed_sum: (nq, K, D) — the
    stats shape produced by ``ResidualVQ.train_call``. Matches reference
    ema_update (quantizer.py:92-111) per stage.

    Returns (new_cluster_size, new_embed_avg, new_codebook).
    """
    K = cluster_size.shape[-1]
    new_cluster = cluster_size * decay + cluster_new * (1 - decay)
    new_avg = embed_avg * decay + embed_sum * (1 - decay)
    n = jnp.sum(new_cluster, axis=-1, keepdims=True)                # (nq, 1)
    smoothed = (new_cluster + epsilon) / (n + K * epsilon) * n      # (nq, K)
    new_codebook = new_avg / smoothed[..., None]
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
                num_iters: int = 10,
                init_means: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-means codebook init (reference quantizer.py:25-52), jittable.

    ``init_means`` pins the starting centroids (parity tests); by default K
    random rows of ``encodings`` are drawn, like reference sample_vectors.
    Returns (means (K, D), bins (K,)).
    """
    x = encodings.astype(jnp.float32)
    N, D = x.shape
    if init_means is None:
        # like reference sample_vectors (quantizer.py:16-23): permutation when
        # the batch has enough vectors, with-replacement otherwise
        if N >= num_clusters:
            perm = jax.random.permutation(rng, N)[:num_clusters]
        else:
            perm = jax.random.randint(rng, (num_clusters,), 0, N)
        means = x[perm]
    else:
        means = init_means.astype(jnp.float32)

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
