"""XYTokenizer — the dual-channel (semantic + acoustic) neural audio codec,
TPU-native equivalent of the reference XY_Tokenizer
(reference XY_Tokenizer/xy_tokenizer/model.py).

16 kHz wav -> log-mel (100 Hz) -> [semantic encoder + adapter | acoustic
encoder] -> concat -> pre-RVQ adapter (50 Hz) -> x4 gated downsample (12.5 Hz)
-> ResidualVQ-8 -> post-RVQ adapter -> x4 upsample -> acoustic decoder
(100 Hz) -> Vocos -> 24 kHz wav.

TPU design: the whole tokenize/detokenize chunk path is one jitted function on
static 30 s shapes (3000 mel frames / 375 codes); the >30 s sliding-window
chunking loop (stride = 30 - overlap seconds, reference model.py:130-256) runs
host-side over identical-shape jit calls so nothing retraces.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import CodecConfig
from ...ops.dsp import log_mel_spectrogram
from .rvq import ResidualVQ
from .transformer import (AdapterTransformer, AudioDecoder, AudioEncoder,
                          GatedDownsample, Upsample)
from .vocos import Vocos


class XYTokenizerModule(nn.Module):
    """The codec network. Two entry points: tokenize (wav->codes) and
    detokenize (codes->wav); both jit-friendly with static chunk shapes."""

    cfg: CodecConfig

    def setup(self):
        c = self.cfg
        self.semantic_encoder = AudioEncoder(c.semantic_encoder)
        self.semantic_encoder_adapter = AdapterTransformer(c.semantic_encoder_adapter)
        self.acoustic_encoder = AudioEncoder(c.acoustic_encoder)
        self.pre_rvq_adapter = AdapterTransformer(c.pre_rvq_adapter)
        self.downsample = GatedDownsample(c.downsample_d_model, c.downsample_factor)
        self.quantizer = ResidualVQ(c.quantizer)
        self.post_rvq_adapter = AdapterTransformer(c.post_rvq_adapter)
        self.upsample = Upsample(c.upsample_d_model, c.upsample_stride)
        self.acoustic_decoder = AudioDecoder(c.acoustic_decoder)
        self.vocos = Vocos(c.vocos)

    def _encode_latents(self, wav: jnp.ndarray, lengths: jnp.ndarray,
                        cast_compute_dtype: bool):
        """Shared encode chain: mel frontend -> dual encoders -> adapters ->
        downsample -> (down (B, T', D), down_len). One source of truth for
        tokenize / train_forward / kmeans_init_codebooks.

        cast_compute_dtype: the inference path casts the fp32 mel to
        cfg.dtype at the stack boundary (bf16 serving — params cast by the
        XYTokenizer wrapper); training runs fp32 params so the cast is a
        no-op it skips. fp32 islands preserved inside the stack either way:
        sinusoid pos-embed adds (transformer.py), softmax, LayerNorm
        statistics (flax upcasts)."""
        c = self.cfg
        mel = log_mel_spectrogram(
            wav, n_fft=c.feature_extractor.n_fft, hop=c.feature_extractor.hop_length,
            num_mels=c.feature_extractor.feature_size,
            sampling_rate=c.feature_extractor.sampling_rate)      # (B, M, T)
        mel = jnp.swapaxes(mel, -1, -2)                           # (B, T, M)
        mel_lengths = jnp.ceil(lengths / c.feature_extractor.hop_length).astype(jnp.int32)
        if cast_compute_dtype:
            mel = mel.astype(jnp.dtype(c.dtype))
        sem, sem_len = self.semantic_encoder(mel, mel_lengths)            # 100->50 Hz
        sem, sem_len = self.semantic_encoder_adapter(sem, sem_len)
        aco, aco_len = self.acoustic_encoder(mel, mel_lengths)            # 100->50 Hz
        mixed = jnp.concatenate([sem, aco], axis=-1)                      # (B, T, 2D)
        mixed, mix_len = self.pre_rvq_adapter(mixed, aco_len)
        return self.downsample(mixed, mix_len)                            # 50->12.5 Hz

    def tokenize(self, wav: jnp.ndarray, lengths: jnp.ndarray):
        """wav (B, chunk_samples) 16 kHz + valid lengths -> codes.

        Mirrors reference inference_tokenize (model.py:54-101); the mel frontend
        runs on-device (replacing the CPU hop at reference model.py:66-73).
        Returns dict(zq (B, T', D), codes (nq, B, T'), codes_lengths (B,)).
        """
        down, down_len = self._encode_latents(wav, lengths,
                                              cast_compute_dtype=True)
        # RVQ fp32 contract (reference quantizer.py:154-191): codebook
        # distances and residuals always in fp32
        zq, codes, _, q_len = self.quantizer(down.astype(jnp.float32),
                                             down_len)
        return {"zq": zq, "codes": codes, "codes_lengths": q_len}

    def detokenize(self, codes: jnp.ndarray, codes_lengths: jnp.ndarray):
        """codes (nq, B, T') -> 24 kHz wav.

        Mirrors reference inference_detokenize (model.py:103-128).
        Returns dict(wav (B, T'*upsample), wav_lengths (B,)).
        """
        zq = self.quantizer.decode(codes)                                  # (B, T, D)
        # fp32 codebook sums (RVQ island) -> compute dtype for the decoder
        # stack; the ISTFT head's spectral ops re-enter fp32 internally
        zq = zq.astype(jnp.dtype(self.cfg.dtype))
        h, h_len = self.post_rvq_adapter(zq, codes_lengths)
        h, h_len = self.upsample(h, h_len)                                 # 12.5->50 Hz
        h, h_len = self.acoustic_decoder(h, h_len)                         # 50->100 Hz
        wav, wav_len = self.vocos(h, h_len)                                # 100Hz->24k
        return {"wav": wav, "wav_lengths": wav_len}

    def __call__(self, wav: jnp.ndarray, lengths: jnp.ndarray):
        """Round-trip (used for init and training)."""
        tok = self.tokenize(wav, lengths)
        det = self.detokenize(tok["codes"], tok["codes_lengths"])
        return {**tok, **det}

    def train_forward(self, wav: jnp.ndarray, lengths: jnp.ndarray,
                      rng: jax.Array):
        """Training round-trip: encoder stack -> RVQ in TRAIN mode (quantizer
        dropout / skip-rvq / EMA statistics, reference quantizer.py:244-343)
        -> decoder stack on the straight-through zq (gradients flow into the
        encoders through the commitment + reconstruction losses).

        Returns dict(wav, wav_lengths, codes, commit_losses (nq,), vq_stats).
        """
        down, down_len = self._encode_latents(wav, lengths,
                                              cast_compute_dtype=False)
        zq, codes, commits, q_len, stats = self.quantizer.train_call(
            down, down_len, rng)

        h, h_len = self.post_rvq_adapter(zq, q_len)
        h, h_len = self.upsample(h, h_len)
        h, h_len = self.acoustic_decoder(h, h_len)
        wav24, wav_len = self.vocos(h, h_len)
        return {"wav": wav24, "wav_lengths": wav_len, "codes": codes,
                "commit_losses": commits, "vq_stats": stats}

    def kmeans_init_codebooks(self, wav: jnp.ndarray, lengths: jnp.ndarray,
                              rng: jax.Array):
        """Run the encoder stack and k-means-initialize every RVQ stage from
        the first batch (reference init_codebook, quantizer.py:132-152).
        Returns (new_codebook (nq, K, D), cluster_sizes (nq, K))."""
        down, down_len = self._encode_latents(wav, lengths,
                                              cast_compute_dtype=False)
        return self.quantizer.kmeans_init_call(down, down_len, rng)


class XYTokenizer:
    """User-facing codec with the reference's chunked encode/decode API
    (reference model.py:130-256). Host-side loop over fixed-shape jit calls."""

    def __init__(self, cfg: CodecConfig, params, chunk_seconds: int = 30,
                 dtype: Optional[str] = None):
        """``dtype="bfloat16"`` runs the inference forward (encode + vocode)
        in bf16: all weights except the RVQ quantizer subtree are cast once,
        and the boundary casts in tokenize/detokenize keep the reference's
        fp32 islands (RVQ distances/codebook sums, quantizer.py:154-191;
        pos-embed adds, modules.py:300; softmax; LayerNorm stats; the ISTFT
        head's spectral math). ~half the HBM weight+activation traffic of the
        fp32 codec and bf16 MXU matmuls; measured audio deviation vs fp32 is
        bounded by the parity test (tests/test_codec_bf16.py). ``self.params``
        stays the full-precision master (training uses it)."""
        if dtype is not None:
            import dataclasses
            cfg = dataclasses.replace(cfg, dtype=dtype)
        self.cfg = cfg
        self.params = params
        if jnp.dtype(cfg.dtype) != jnp.float32:
            cd = jnp.dtype(cfg.dtype)

            def cast(path, x):
                in_rvq = any(getattr(k, "key", None) == "quantizer"
                             for k in path)
                if in_rvq or not hasattr(x, "dtype") or x.dtype != jnp.float32:
                    return x
                return x.astype(cd)

            self.infer_params = jax.tree_util.tree_map_with_path(cast, params)
        else:
            self.infer_params = params
        self.module = XYTokenizerModule(cfg)
        self.input_sample_rate = cfg.input_sample_rate
        self.output_sample_rate = cfg.output_sample_rate
        self.encoder_downsample_rate = cfg.encoder_downsample_rate
        self.decoder_upsample_rate = cfg.decoder_upsample_rate
        self.nq = cfg.quantizer.num_quantizers
        self.chunk_seconds = chunk_seconds
        self.chunk_samples = chunk_seconds * cfg.input_sample_rate
        self.chunk_codes = self.chunk_samples // cfg.encoder_downsample_rate

        self._tokenize = jax.jit(
            lambda p, wav, lens: self.module.apply(p, wav, lens,
                                                   method=XYTokenizerModule.tokenize))
        self._detokenize = jax.jit(
            lambda p, codes, lens: self.module.apply(p, codes, lens,
                                                     method=XYTokenizerModule.detokenize))

        def _detok16(p, codes, lens):
            out = self.module.apply(p, codes, lens,
                                    method=XYTokenizerModule.detokenize)
            pcm = jnp.clip(out["wav"], -1.0, 1.0) * 32767.0
            return {"wav": pcm.astype(jnp.int16),
                    "wav_lengths": out["wav_lengths"]}

        # int16-PCM variant: quantizes to the wav-file bit depth ON DEVICE,
        # halving device->host readback bytes (the dominant vocode cost off-
        # chip; audio is written as 16-bit PCM anyway)
        self._detokenize16 = jax.jit(_detok16)

    # -- construction ------------------------------------------------------

    @classmethod
    def init_random(cls, cfg: CodecConfig, seed: int = 0,
                    dtype: Optional[str] = None) -> "XYTokenizer":
        module = XYTokenizerModule(cfg)
        wav = jnp.zeros((1, cfg.input_sample_rate), jnp.float32)
        params = module.init(jax.random.PRNGKey(seed), wav, jnp.array([cfg.input_sample_rate]))
        return cls(cfg, params, dtype=dtype)

    @classmethod
    def load_from_checkpoint(cls, config_path: str, ckpt_path: str,
                             dtype: Optional[str] = None) -> "XYTokenizer":
        """Load a reference-format (yaml + torch .ckpt) or native checkpoint.

        Mirrors reference model.py:258-278; torch checkpoints go through the
        weight converter (moss_ttsd_tpu.utils.convert_codec).
        """
        cfg = CodecConfig.from_yaml(config_path)
        if ckpt_path.endswith((".ckpt", ".pt", ".bin")):
            from ...utils.convert_codec import convert_codec_checkpoint
            params = convert_codec_checkpoint(cfg, ckpt_path)
        else:
            from ...core.checkpoint import load_pytree
            from ...utils.convert_codec import restack_legacy_pytree
            # pre-scan native checkpoints hold per-layer layer_i/block_i
            # subtrees; stack them into the scanned (L, ...) layout
            params = restack_legacy_pytree(load_pytree(ckpt_path))
        return cls(cfg, params, dtype=dtype)

    # -- reference-parity API ---------------------------------------------

    def encode(self, wav_list: List[np.ndarray], overlap_seconds: int = 10):
        """wav_list: B * (T,) 16 kHz float arrays (any length) ->
        {"codes_list": B * (nq, T_codes) int32}.

        Chunking contract (reference model.py:130-192): window 30 s, stride
        (30 - overlap) s, keep the leading stride worth of codes per window,
        hard-concatenate, trim to len//1280 per item.
        """
        sr = self.input_sample_rate
        duration = self.chunk_samples - overlap_seconds * sr      # stride in samples
        code_duration = duration // self.encoder_downsample_rate  # codes kept per chunk

        B = len(wav_list)
        lengths = np.array([len(w) for w in wav_list], np.int64)
        max_len = int(lengths.max())
        max_chunks = max(1, -(-max_len // duration))

        # dispatch every chunk before reading any back: JAX dispatch is async,
        # so chunk i+1 computes on-device while chunk i's codes cross the
        # (slow) device->host link
        pending = []
        for ci in range(max_chunks):
            start = ci * duration
            chunk = np.zeros((B, self.chunk_samples), np.float32)
            chunk_lens = np.clip(lengths - start, 0, self.chunk_samples)
            for b, w in enumerate(wav_list):
                seg = np.asarray(w, np.float32)[start:start + self.chunk_samples]
                chunk[b, :len(seg)] = seg
            if chunk_lens.max() == 0:
                continue
            pending.append(self._tokenize(self.infer_params, jnp.asarray(chunk),
                                          jnp.asarray(chunk_lens)))

        chunks_codes = []
        for out in pending:
            codes = np.asarray(out["codes"])                      # (nq, B, T')
            code_lens = np.clip(np.asarray(out["codes_lengths"]), 0, code_duration)
            valid = np.zeros((self.nq, B, code_duration), codes.dtype)
            for b in range(B):
                n = int(code_lens[b])
                if n > 0:
                    valid[:, b, :n] = codes[:, b, :n]
            chunks_codes.append(valid)

        if chunks_codes:
            all_codes = np.concatenate(chunks_codes, axis=-1)
            codes_list = [all_codes[:, b, :int(lengths[b] // self.encoder_downsample_rate)]
                          for b in range(B)]
        else:
            codes_list = [np.zeros((self.nq, 0), np.int32) for _ in range(B)]
        return {"codes_list": codes_list}

    def decode(self, codes_list: List[np.ndarray], overlap_seconds: int = 10,
               pcm16: bool = False, rows_per_call: Optional[int] = None,
               len_buckets: Optional[str] = "auto"):
        """codes_list: B * (nq, T) -> {"syn_wav_list": B * (T*1920,) 24 kHz}.

        Chunking contract mirrors reference model.py:194-256. Implemented on
        top of IncrementalDecoder (one feed of everything) so the streaming
        overlap path and this serial path cannot drift.

        pcm16=True quantizes to int16 PCM on device before readback — half
        the device->host bytes; the host converts back to float32/32768 so
        the return contract is unchanged (serving writes 16-bit wavs, so the
        extra quantization is exactly the file bit depth).

        rows_per_call=N splits each chunk's batch into device calls of at
        most N rows: group i+1's vocode compute overlaps group i's
        device->host readback, hiding most of the transfer tax behind
        compute (rows are independent in the codec, so the audio is
        unchanged; see tests/test_decode_overlap.py).

        len_buckets="auto" truncates a PARTIAL final window to the smallest
        quarter-window bucket that holds it instead of padding to the full
        30 s window (the reference always pads, model.py:194-256) — up to
        4x less vocoder compute on short tails. Valid samples deviate from
        the padded-window result only at fp rounding level (~3e-7 — padded
        positions perturb reduction order, not masking); pass None for the
        reference's exact full-window dispatch.
        """
        inc = self.incremental_decoder(overlap_seconds, pcm16, rows_per_call,
                                       len_buckets)
        return inc.finish(codes_list)

    def incremental_decoder(self, overlap_seconds: int = 10,
                            pcm16: bool = False,
                            rows_per_call: Optional[int] = None,
                            len_buckets: Optional[str] = "auto"
                            ) -> "IncrementalDecoder":
        return IncrementalDecoder(self, overlap_seconds, pcm16, rows_per_call,
                                  len_buckets)


def quarter_window_buckets(chunk_codes: int):
    """Quarter-window bucket ladder shared by IncrementalDecoder and the
    streaming pipeline (pipeline/batch.stream_item): partial windows vocode
    through the smallest fitting fraction of the 30 s window instead of
    always padding to it (up to 4x less tail/TTFA compute)."""
    return sorted({-(-chunk_codes * q // 4) for q in (1, 2, 3, 4)})


def chunk_stride_codes(spt: "XYTokenizer", overlap_seconds: int) -> int:
    """Codes each decode chunk ADVANCES (window minus overlap) — the ONE
    source of truth for the stride, shared by IncrementalDecoder and
    StreamVocoder.effective_context. Reference formula
    ((30 - overlap)*sr) // dsr — floor AFTER the multiply, which differs
    from chunk_codes - (overlap*sr)//dsr by one code whenever overlap*sr
    isn't a multiple of dsr."""
    return ((spt.chunk_seconds - overlap_seconds) * spt.input_sample_rate
            ) // spt.encoder_downsample_rate


class IncrementalDecoder:
    """Incremental chunked detokenization with readback pipelining.

    Same chunking contract as XYTokenizer.decode — byte-identical by
    construction, since decode() is one feed of everything through this
    class. Two overlap mechanisms the reference's serial
    inference_detokenize loop (reference model.py:194-256) has no analogue
    for:

      * ``feed(codes_list, finished)`` may be called while the LM is still
        decoding: any 30 s codec chunk whose window is complete for every
        row (a row is complete when it is finished, or when it already has
        the chunk's full ``chunk_codes`` worth of codes — its clip()ed
        chunk length can then never change) is dispatched immediately, so
        its vocode and device->host readback overlap subsequent LM decode
        segments on the async dispatch stream.
      * ``rows_per_call`` splits each chunk's batch into groups dispatched
        as separate device calls; the device computes group i+1 while the
        host reads group i back, hiding transfer behind compute even for a
        single-chunk decode.

    ``finish(codes_list)`` dispatches whatever remains and assembles
    {"syn_wav_list": ...} exactly like the serial path.
    """

    def __init__(self, spt: "XYTokenizer", overlap_seconds: int = 10,
                 pcm16: bool = False, rows_per_call: Optional[int] = None,
                 len_buckets: Optional[str] = "auto"):
        self.spt = spt
        # quarter-window ladder for partial final chunks: every intermediate
        # chunk is full by construction, so at most ONE extra compiled shape
        # shows up per run (the tail bucket) and lives in the persistent
        # compile cache
        self.len_buckets = (quarter_window_buckets(spt.chunk_codes)
                            if len_buckets == "auto" else [spt.chunk_codes])
        self.duration_codes = chunk_stride_codes(spt, overlap_seconds)
        if self.duration_codes <= 0:
            raise ValueError(
                f"overlap_seconds={overlap_seconds} leaves no stride on a "
                f"{spt.chunk_seconds}s codec window")
        self.duration_wav = self.duration_codes * spt.decoder_upsample_rate
        self.pcm16 = pcm16
        self.detok = spt._detokenize16 if pcm16 else spt._detokenize
        self.rows_per_call = rows_per_call
        self.next_chunk = 0
        # flat dispatch-order list of (chunk_index, row_slice, device_out)
        self.pending: list = []

    def _dispatch(self, codes_list, lengths: np.ndarray, ci: int) -> None:
        spt = self.spt
        B = len(codes_list)
        start = ci * self.duration_codes
        chunk_lens = np.clip(lengths - start, 0, spt.chunk_codes)
        L = next(b for b in self.len_buckets if b >= int(chunk_lens.max()))
        chunk = np.zeros((spt.nq, B, L), np.int32)
        for b, c in enumerate(codes_list):
            seg = np.asarray(c, np.int32)[:, start:start + L]
            chunk[:, b, :seg.shape[-1]] = seg
        step = self.rows_per_call or B
        for g0 in range(0, B, step):
            g1 = min(g0 + step, B)
            out = self.detok(spt.infer_params,
                             jnp.asarray(chunk[:, g0:g1]),
                             jnp.asarray(chunk_lens[g0:g1]))
            self.pending.append((ci, slice(g0, g1), out))

    def feed(self, codes_list: List[np.ndarray],
             finished: Optional[List[bool]] = None) -> int:
        """Dispatch every chunk that has become immutable. codes_list rows
        must only ever GROW between calls (prefixes stay fixed — true for AR
        generation). Returns the number of chunks dispatched so far."""
        B = len(codes_list)
        lengths = np.array([c.shape[-1] for c in codes_list], np.int64)
        fin = finished if finished is not None else [True] * B
        while True:
            start = self.next_chunk * self.duration_codes
            window_done = all(
                fin[b] or lengths[b] >= start + self.spt.chunk_codes
                for b in range(B))
            has_content = bool((lengths > start).any())
            if not window_done:
                break
            if not has_content:
                # serial-path contract: a window past every row's data is
                # skipped — nothing remains to dispatch
                break
            self._dispatch(codes_list, lengths, self.next_chunk)
            self.next_chunk += 1
        return self.next_chunk

    def finish(self, codes_list: List[np.ndarray]) -> dict:
        """Dispatch the remaining chunks and read everything back (in
        dispatch order, so readback of early groups overlaps the device
        computing later ones)."""
        B = len(codes_list)
        code_lengths = np.array([c.shape[-1] for c in codes_list], np.int64)
        self.feed(codes_list, [True] * B)

        n_chunks = self.next_chunk
        wav_chunks = [np.zeros((B, self.duration_wav), np.float32)
                      for _ in range(n_chunks)]
        for ci, rows, out in self.pending:
            wav = np.asarray(out["wav"])
            if self.pcm16:
                wav = wav.astype(np.float32) / 32768.0
            wav_lens = np.clip(np.asarray(out["wav_lengths"]), 0,
                               self.duration_wav)
            valid = wav_chunks[ci]
            for gi, b in enumerate(range(rows.start, rows.stop)):
                n = int(wav_lens[gi])
                if n > 0:
                    valid[b, :n] = wav[gi, :n]

        if wav_chunks:
            full = np.concatenate(wav_chunks, axis=-1)
            up = self.spt.decoder_upsample_rate
            syn = [full[b, :int(code_lengths[b] * up)] for b in range(B)]
        else:
            syn = [np.zeros((0,), np.float32) for _ in range(B)]
        return {"syn_wav_list": syn}
