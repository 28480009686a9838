"""Codec (XY_Tokenizer) training step.

The reference ships the quantizer's full train-mode machinery — EMA
codebooks, k-means init, dead-code replacement, quantizer dropout, skip-rvq
(reference XY_Tokenizer/xy_tokenizer/nn/quantizer.py:92-152, 262-310) — but
no codec train script. This module supplies the TPU-native train step around
that machinery:

  * AdamW on the network parameters (encoders/adapters/decoder/vocos),
  * EMA (NOT SGD) on the RVQ codebooks, applied functionally from the batch
    statistics that ``ResidualVQ.train_call`` returns — the counterpart of
    the reference's in-place buffer updates inside VectorQuantize.forward
    (quantizer.py:181-185),
  * dead-code replacement from batch-sampled candidates (quantizer.py:113-130),
  * optional one-shot k-means bootstrap of all stages (quantizer.py:132-152),
  * a self-supervised reconstruction loss (waveform L1 + log-mel L1 at
    24 kHz) plus the commitment loss — the reference defines no codec loss
    in-repo, so the spectral-reconstruction choice is ours.

Everything is ONE pjit-able pure function. For data-parallel training shard
the batch over the mesh "data" axis: GSPMD turns the batch-statistic sums
inside train_call into global reductions — the TPU-ICI equivalent of the
reference's NCCL all_reduce (quantizer.py:101-103). The explicit-psum variant
for shard_map/pmap lives in models/codec/rvq.ema_update.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import CodecConfig
from ..models.codec.model import XYTokenizerModule
from ..models.codec.rvq import ema_update_stacked
from ..ops.dsp import log_mel_spectrogram, resample_jax


class CodecTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    cluster_size: jnp.ndarray    # (nq, K)  EMA cluster counts
    embed_avg: jnp.ndarray       # (nq, K, D)  EMA embedding sums


def _replace_codebook(params, codebook):
    p = dict(params)
    inner = dict(p["params"])
    q = dict(inner["quantizer"])
    q["codebook"] = codebook
    inner["quantizer"] = q
    p["params"] = inner
    return p


def init_codec_train_state(cfg: CodecConfig, optimizer, rng=None,
                           params=None, init_samples: int = 16000
                           ) -> CodecTrainState:
    """Fresh train state; embed_avg starts as a copy of the codebook and
    cluster_size at zero (reference buffer init, quantizer.py:86-90)."""
    module = XYTokenizerModule(cfg)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        wav = jnp.zeros((1, init_samples), jnp.float32)
        params = module.init(rng, wav, jnp.full((1,), init_samples, jnp.int32))
    opt_state = optimizer.init(params)
    codebook = params["params"]["quantizer"]["codebook"]
    return CodecTrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state,
        cluster_size=jnp.zeros(codebook.shape[:2], jnp.float32),
        embed_avg=jnp.array(codebook, jnp.float32))


def kmeans_bootstrap(cfg: CodecConfig, state: CodecTrainState,
                     wav: jnp.ndarray, lengths: jnp.ndarray,
                     rng: jax.Array) -> CodecTrainState:
    """One-shot k-means init of every RVQ stage from a bootstrap batch
    (reference init_codebook semantics: codebook := k-means means,
    embed_avg := codebook, cluster_size := final bin counts,
    quantizer.py:132-152). Call once before the first train step."""
    module = XYTokenizerModule(cfg)
    new_cb, bins = module.apply(
        state.params, wav, lengths, rng,
        method=XYTokenizerModule.kmeans_init_codebooks)
    return state._replace(
        params=_replace_codebook(state.params, new_cb),
        cluster_size=bins, embed_avg=jnp.array(new_cb, jnp.float32))


def make_codec_train_step(cfg: CodecConfig, optimizer,
                          commit_weight: float = 1.0,
                          mel_weight: float = 1.0,
                          wave_weight: float = 1.0,
                          mel_n_fft: int = 1024, mel_hop: int = 256,
                          mel_bins: int = 80):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"wav": (B, T) 16 kHz float32, "lengths": (B,) int32}. The 24 kHz
    reconstruction target is the input resampled on-device (self-supervised
    round-trip).
    """
    module = XYTokenizerModule(cfg)
    qc = cfg.quantizer
    in_sr = cfg.input_sample_rate
    out_sr = cfg.output_sample_rate

    def loss_fn(params, batch, rng):
        wav, lengths = batch["wav"], batch["lengths"]
        out = module.apply(params, wav, lengths, rng,
                           method=XYTokenizerModule.train_forward)
        target = resample_jax(wav, in_sr, out_sr)                   # (B, T24)
        recon = out["wav"]
        n = min(recon.shape[-1], target.shape[-1])
        recon, target = recon[..., :n], target[..., :n]
        # reduced ratio: lengths * out_sr overflows int32 beyond ~5.6 s
        # clips (lengths > 2^31/24000), silently truncating the loss mask
        import math
        g = math.gcd(out_sr, in_sr)
        t_len = jnp.minimum(out["wav_lengths"],
                            (lengths * (out_sr // g)) // (in_sr // g))
        valid = (jnp.arange(n)[None, :] < t_len[:, None]).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(valid), 1.0)

        wave_l1 = jnp.sum(jnp.abs(recon - target) * valid) / denom
        mel_r = log_mel_spectrogram(recon * valid, n_fft=mel_n_fft,
                                    hop=mel_hop, num_mels=mel_bins,
                                    sampling_rate=out_sr)
        mel_t = log_mel_spectrogram(target * valid, n_fft=mel_n_fft,
                                    hop=mel_hop, num_mels=mel_bins,
                                    sampling_rate=out_sr)
        mel_l1 = jnp.mean(jnp.abs(mel_r - mel_t))
        commit = jnp.mean(out["commit_losses"])
        loss = (wave_weight * wave_l1 + mel_weight * mel_l1
                + commit_weight * commit)
        aux = {"wave_l1": wave_l1, "mel_l1": mel_l1, "commit": commit,
               "vq_stats": out["vq_stats"]}
        return loss, aux

    def train_step(state: CodecTrainState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA codebook update (supersedes any SGD movement of the codebook —
        # its gradients are exactly zero through the stop-gradient paths, so
        # this overwrite is the whole update). Stats are global-batch sums
        # under pjit; the reference all_reduces them (quantizer.py:101-103).
        stats = aux.pop("vq_stats")
        new_cluster, new_avg, new_cb = ema_update_stacked(
            state.cluster_size, state.embed_avg,
            stats["cluster_new"], stats["embed_sum"],
            decay=qc.decay, epsilon=qc.epsilon)
        if qc.threshold_ema_dead > 0:
            # dead-code replacement from batch candidates, post-EMA mask
            # (reference replace_dead_codes, quantizer.py:113-130)
            dead = new_cluster < qc.threshold_ema_dead
            new_cb = jnp.where(dead[..., None], stats["samples"], new_cb)
        params = _replace_codebook(params, new_cb)

        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(grads),
                   "codebook_usage": jnp.mean(
                       (stats["cluster_new"] > 0).astype(jnp.float32))}
        return CodecTrainState(state.step + 1, params, opt_state,
                               new_cluster, new_avg), metrics

    return train_step
