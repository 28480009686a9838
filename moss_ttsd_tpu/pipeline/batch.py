"""End-to-end batch synthesis pipeline.

Equivalent of reference generation_utils.py:341-477 process_batch +
load_model (:15-24): JSONL items -> normalized text + prompt audio -> codec
encode -> prompt assembly -> delay shift -> left-pad -> jitted AR generate ->
un-shift -> codec decode -> per-item audio.
"""

from __future__ import annotations

import dataclasses
import hashlib
import threading
import time
from collections import OrderedDict
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.config import CodecConfig, LMConfig, SamplingConfig
from ..decode.engine import GenerationEngine
from ..models.codec.model import XYTokenizer
from . import prompt as pp
from .jsonl import load_audio_data, process_jsonl_item
from .text import normalize_text, rewrite_speaker_tags
from ..utils.profiling import metrics

SYSTEM_PROMPT = ("You are a speech synthesizer that generates natural, "
                 "realistic, and human-like conversational audio from dialogue "
                 "text.")   # reference inference.py:11


@dataclasses.dataclass
class PhaseTimings:
    """Per-phase wall times — first-class observability the reference lacks
    (SURVEY.md §5: it only prints ad-hoc shapes/timings)."""

    tokenize_s: float = 0.0
    prefill_decode_s: float = 0.0
    vocode_s: float = 0.0
    generated_steps: int = 0

    def as_dict(self):
        return dataclasses.asdict(self)


class StreamVocoder:
    """Sliding-window incremental vocoder for ONE growing token stream.

    Converts an unshifted speech-id stream (whose prefix only ever grows —
    true for AR generation) into PCM chunks: each ``feed`` vocodes at most
    one codec window of new frames with ``context_frames`` of left context
    (so chunk boundaries see real receptive field), emits only the new
    samples, and delays each chunk's device->host readback by one feed so
    the (slow, tunnel-bound) transfer overlaps the caller's next decode
    segment. PCM is quantized to int16 on device (half the readback bytes).

    Shared by TTSPipeline.stream_item (single-stream latency path) and the
    continuous-pool streaming server (serve/server.py), so the two
    streaming surfaces cannot drift. Capability the reference lacks
    end-to-end (its Gradio path returns whole files — SURVEY §3.4).
    """

    def __init__(self, spt: XYTokenizer, context_frames: int = 25,
                 immediate_first: bool = True, timings=None):
        if not 0 <= context_frames < spt.chunk_codes:
            # a context as wide as the codec window means the sliding feed
            # window (context + new frames) can never advance: end_c =
            # emitted - context + chunk_codes <= emitted, and finish()
            # would loop forever dispatching empty re-vocodes. Use
            # effective_context() to clamp against the stride.
            raise ValueError(
                f"context_frames={context_frames} must be in [0, "
                f"{spt.chunk_codes}) (the codec window in codes)")
        self.spt = spt
        self.context = context_frames
        # surface the very first chunk's audio immediately (TTFA) instead
        # of one feed later
        self.immediate_first = immediate_first
        self.timings = timings
        self.up = spt.cfg.decoder_upsample_rate      # samples per frame
        self.K = spt.cfg.quantizer.codebook_size
        # quarter-window buckets — ONE source of truth with
        # IncrementalDecoder.len_buckets: a ~1 s first chunk vocodes
        # through a quarter-size window instead of a full padded 30 s one
        # (4x less TTFA vocode compute)
        from ..models.codec.model import quarter_window_buckets
        self.buckets = quarter_window_buckets(spt.chunk_codes)
        self.emitted = 0
        self._pending = None

    @staticmethod
    def effective_context(spt: XYTokenizer, overlap_s: int, feed_steps: int,
                          context_frames: int = 25) -> int:
        """Clamp the left context so one feed's sliding window (context +
        new frames) fits a single codec chunk call."""
        from ..models.codec.model import chunk_stride_codes
        return min(context_frames,
                   max(0, chunk_stride_codes(spt, overlap_s) - feed_steps))

    @property
    def sample_rate(self) -> int:
        return self.spt.output_sample_rate

    def _dispatch(self, speech_ids: np.ndarray, start: int, end_c: int):
        spt = self.spt
        codes = np.clip(speech_ids[0, start:end_c].T.astype(np.int32),
                        0, self.K - 1)
        n = codes.shape[-1]
        L = next(b for b in self.buckets if b >= n)
        buf = np.zeros((spt.nq, 1, L), np.int32)
        buf[:, 0, :n] = codes
        out = spt._detokenize16(spt.infer_params, jnp.asarray(buf),
                                jnp.asarray([n]))
        return out, self.emitted - start, n

    def _read(self, p) -> np.ndarray:
        out, skip_frames, n = p
        t0 = time.perf_counter()
        wav = np.asarray(out["wav"])[0].astype(np.float32) / 32768.0
        dt = time.perf_counter() - t0
        if self.timings is not None:
            self.timings.vocode_s += dt
        metrics.add("vocode_s", dt)
        return wav[skip_frames * self.up:n * self.up]

    def feed(self, speech_ids: np.ndarray, end: int) -> List[np.ndarray]:
        """speech_ids (1, T, nq) unshifted, ``end`` = frames valid so far.
        Returns 0-2 ready PCM chunks (float32 in [-1, 1])."""
        out: List[np.ndarray] = []
        new_p, end_c = None, 0
        if end > self.emitted:
            start = max(0, self.emitted - self.context)
            # one dispatch covers at most one codec window (the largest
            # bucket); frames past the cap drain in later feeds / finish,
            # so oversized feeds cannot overflow the bucket ladder
            end_c = min(end, start + self.spt.chunk_codes)
            new_p = self._dispatch(speech_ids, start, end_c)
        if self._pending is not None:
            new = self._read(self._pending)
            self._pending = None
            if new.size:
                out.append(new)
        if new_p is not None:
            if self.emitted == 0 and self.immediate_first:
                new = self._read(new_p)
                if new.size:
                    out.append(new)
            else:
                self._pending = new_p
            self.emitted = end_c
        return out

    def finish(self, speech_ids: Optional[np.ndarray],
               end: int) -> List[np.ndarray]:
        """Drain: vocode frames the per-feed window cap deferred, then read
        the last pending chunk."""
        out: List[np.ndarray] = []
        while speech_ids is not None and end > self.emitted:
            start = max(0, self.emitted - self.context)
            end_c = min(end, start + self.spt.chunk_codes)
            new_p = self._dispatch(speech_ids, start, end_c)
            if self._pending is not None:
                new = self._read(self._pending)
                if new.size:
                    out.append(new)
            self._pending = new_p
            self.emitted = end_c
        if self._pending is not None:
            new = self._read(self._pending)
            self._pending = None
            if new.size:
                out.append(new)
        return out


class TTSPipeline:
    """Bundles tokenizer + LM engine + codec (reference load_model)."""

    def __init__(self, tokenizer, lm_cfg: LMConfig, lm_params,
                 spt: XYTokenizer, sampling: Optional[SamplingConfig] = None,
                 bucket: int = 128, mesh=None, quant: Optional[str] = None,
                 vocode_rows_per_call: Optional[int] = 4,
                 overlap_vocode: bool = True, encode_cache_size: int = 16,
                 restricted_text_head: Optional[bool] = None,
                 attn_impl: Optional[str] = None,
                 restricted_audit_every: Optional[int] = None):
        """``vocode_rows_per_call`` batch-splits each vocode chunk so the
        device computes group i+1 while the host reads group i back (see
        XYTokenizer.decode); ``overlap_vocode`` dispatches completed 30 s
        codec chunks while the LM is still decoding (multi-chunk outputs
        only — a single-window output has nothing to overlap).
        ``encode_cache_size`` LRU-caches prompt-audio codec encodings in the
        per-request path (prepare_item): serving with fixed voices (podcast
        defaults, a product voice bank) otherwise re-runs the 12-layer codec
        encoders on the SAME prompt wav for every request. 0 disables.
        ``restricted_text_head`` opts the decode into the speech-window
        channel-0 head (LMConfig.restricted_text_head); ``attn_impl``
        overrides the attention backend ("mixed" | "pallas" | "xla",
        LMConfig.attn_impl — the reference's --attn_implementation switch,
        inference.py:29-30).

        Note: ``self.lm_cfg`` is rebound to ``engine.cfg``, which reflects
        these decode-policy overrides — it is NOT the ``lm_cfg`` object the
        caller passed in (identity/equality comparisons against the input
        config will differ whenever an override is set)."""
        self.tokenizer = tokenizer
        self.engine = GenerationEngine(
            lm_cfg, lm_params, sampling, bucket=bucket, mesh=mesh,
            quant=quant, restricted_text_head=restricted_text_head,
            attn_impl=attn_impl,
            restricted_audit_every=restricted_audit_every)
        self.lm_cfg = self.engine.cfg      # reflects decode-policy overrides
        self.spt = spt
        self.vocode_rows_per_call = vocode_rows_per_call
        self.overlap_vocode = overlap_vocode
        # codec chunking overlap (reference default 10 s on 30 s windows);
        # must be < spt.chunk_seconds
        self.vocode_overlap_s = min(10, max(0, spt.chunk_seconds - 1))
        self.timings = PhaseTimings()
        self.encode_cache_size = encode_cache_size
        self._encode_cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._encode_cache_lock = threading.Lock()

    @classmethod
    def load(cls, model_path: str, spt_config_path: str, spt_ckpt_path: str,
             sampling: Optional[SamplingConfig] = None, mesh=None,
             quant: Optional[str] = None,
             codec_dtype: Optional[str] = "bfloat16",
             restricted_text_head: Optional[bool] = None,
             attn_impl: Optional[str] = None,
             restricted_audit_every: Optional[int] = None):
        """Load from an HF-format LM dir + codec checkpoint
        (reference load_model, generation_utils.py:15-24).

        codec_dtype="bfloat16" (default, the measured serving config) runs
        the codec inference forward in bf16 with fp32 RVQ/spectral islands
        (see XYTokenizer); pass None for the reference's full-fp32 codec."""
        import os
        from transformers import AutoTokenizer
        from ..utils.convert_lm import load_asteroid_checkpoint
        tokenizer = AutoTokenizer.from_pretrained(model_path)
        cfg_path = os.path.join(model_path, "config.json")
        lm_cfg = LMConfig.from_hf_config_json(cfg_path)
        lm_params = load_asteroid_checkpoint(model_path, lm_cfg)
        spt = XYTokenizer.load_from_checkpoint(spt_config_path, spt_ckpt_path,
                                               dtype=codec_dtype)
        if sampling is None:
            gen_cfg = os.path.join(model_path, "generation_config.json")
            if os.path.exists(gen_cfg):
                sampling = SamplingConfig.from_generation_config_json(
                    gen_cfg, lm_cfg.channels)
        return cls(tokenizer, lm_cfg, lm_params, spt, sampling, mesh=mesh,
                   quant=quant, restricted_text_head=restricted_text_head,
                   attn_impl=attn_impl,
                   restricted_audit_every=restricted_audit_every)

    # ------------------------------------------------------------------

    def _prepare_text(self, item: dict, use_normalize: bool):
        """Text half of item preparation -> (final_text, meta, wav-or-None)."""
        processed = process_jsonl_item(item)
        text = processed["text"]
        prompt_text = processed["prompt_text"]
        full_text = prompt_text + text if prompt_text else text
        original = full_text
        if use_normalize:
            full_text = normalize_text(full_text)
        final_text = rewrite_speaker_tags(full_text)
        wav = None
        if processed["prompt_audio"] is not None:
            wav = load_audio_data(processed["prompt_audio"])
        meta = {"original_text": original,
                # full_text IS normalize_text(original) when use_normalize
                "normalized_text": full_text if use_normalize else None,
                "final_text": final_text, "use_normalize": use_normalize}
        return final_text, meta, wav

    def _assemble(self, final_text: str, audio_codes, system_prompt: str):
        """Prompt ids + delay shift for one item."""
        ids = pp.build_prompt_ids(self.tokenizer, system_prompt, final_text,
                                  audio_codes, channels=self.lm_cfg.channels,
                                  pad_token=self.lm_cfg.speech_pad_token,
                                  speech_offset=self.lm_cfg.speech_token_range[0])
        return pp.shift_delay_pattern(ids, self.tokenizer.pad_token_id,
                                      self.lm_cfg.speech_pad_token)

    def prepare_item(self, item: dict, system_prompt: str = SYSTEM_PROMPT,
                     use_normalize: bool = False):
        """One JSONL item -> (shifted prompt ids, text metadata).

        Prompt-audio codec encodings are LRU-cached by wav content hash
        (``encode_cache_size``): codec encode is deterministic in the wav,
        so a repeated prompt voice (the common serving case — fixed podcast
        voices, a cloned-speaker session) skips the two 12-layer encoder
        stacks entirely after its first request."""
        final_text, meta, wav = self._prepare_text(item, use_normalize)
        audio_codes = self._encode_prompt_cached(wav) if wav is not None \
            else None
        return self._assemble(final_text, audio_codes, system_prompt), meta

    def _encode_prompt_cached(self, wav: np.ndarray) -> np.ndarray:
        """Codec-encode ONE prompt wav -> (T, nq) codes, LRU-cached by wav
        content hash. Cached results are exact: encode is deterministic in
        the wav and every cache fill comes from the same batch-1 codec call
        a miss would make."""
        key = None
        if self.encode_cache_size > 0:
            key = hashlib.sha1(
                np.ascontiguousarray(wav, np.float32).tobytes()).hexdigest()
            with self._encode_cache_lock:
                cached = self._encode_cache.get(key)
                if cached is not None:
                    self._encode_cache.move_to_end(key)
                    metrics.add("tokenize_cache_hits", 1)
                    return cached
        t0 = time.perf_counter()
        codes = self.spt.encode([wav])["codes_list"][0]     # (nq, T)
        audio_codes = np.asarray(codes).T                   # (T, nq)
        dt = time.perf_counter() - t0
        self.timings.tokenize_s += dt
        metrics.add("tokenize_s", dt)
        if key is not None:
            with self._encode_cache_lock:
                self._encode_cache[key] = audio_codes
                while len(self._encode_cache) > self.encode_cache_size:
                    self._encode_cache.popitem(last=False)
        return audio_codes

    def process_batch(self, batch_items: List[dict],
                      system_prompt: str = SYSTEM_PROMPT,
                      start_idx: int = 0, use_normalize: bool = False,
                      max_new_tokens: Optional[int] = None, seed: int = 0,
                      adapter=None):
        """Reference process_batch parity (generation_utils.py:341-477).

        Returns (actual_texts_data, audio_results); audio_results entries are
        dicts {audio_data (1, T) float32, sample_rate, index} or None.

        Per-item isolation (the reference's contract, generation_utils.py:
        434-467): an item that fails preparation (bad audio path, malformed
        record) is reported as None + an "error" entry in its text metadata;
        the rest of the batch still generates.

        Prompt-audio codec encode runs as ONE batched call over all items
        that have a prompt voice (the reference encodes per item inside
        process_inputs, generation_utils.py:198 — serial batch-1 codec calls
        that would leave the compiled encoder's batch dimension idle here).
        Variable prompt lengths are masked inside the codec.

        ``adapter``: a registered LoRA voice for the whole batch, or a
        per-item list (aligned to batch_items; None entries = base model).
        """
        staged, texts_data = [], []   # staged: (i, meta_slot, final_text, wav)
        for i, item in enumerate(batch_items):
            try:
                final_text, meta, wav = self._prepare_text(item, use_normalize)
            except Exception as e:            # noqa: BLE001 — isolate items
                import traceback
                traceback.print_exc()
                texts_data.append({"index": start_idx + i, "error": str(e)})
                continue
            meta["index"] = start_idx + i
            staged.append((i, len(texts_data), final_text, wav))
            texts_data.append(meta)

        wavs = [wav for _, _, _, wav in staged if wav is not None]
        codes_list = []
        if len(wavs) == 1:
            # a single-voice batch is encode-identical to the per-request
            # path, so it shares the LRU cache (repeated gradio clicks /
            # batch-1 server groups with a fixed voice skip the encoders)
            codes_list = [self._encode_prompt_cached(wavs[0]).T]
        elif wavs:
            t0 = time.perf_counter()
            codes_list = self.spt.encode(wavs)["codes_list"]
            dt = time.perf_counter() - t0
            self.timings.tokenize_s += dt
            metrics.add("tokenize_s", dt)

        shifted_list, ok_idx, next_code = [], [], 0
        for i, meta_slot, final_text, wav in staged:
            audio_codes = None
            if wav is not None:
                audio_codes = np.asarray(codes_list[next_code]).T   # (T, nq)
                next_code += 1
            try:
                shifted = self._assemble(final_text, audio_codes, system_prompt)
            except Exception as e:            # noqa: BLE001 — isolate items
                import traceback
                traceback.print_exc()
                texts_data[meta_slot] = {"index": start_idx + i,
                                         "error": str(e)}
                continue
            shifted_list.append(shifted)
            ok_idx.append(i)

        if not shifted_list:
            return texts_data, [None] * len(batch_items)

        if isinstance(adapter, (list, tuple)):
            # per-item voices follow the SURVIVING rows (failed items were
            # isolated above) — the engine's adapter list is row-aligned
            if len(adapter) != len(batch_items):
                raise ValueError(f"{len(adapter)} adapter names for "
                                 f"{len(batch_items)} items")
            adapter = [adapter[i] for i in ok_idx]

        batch, mask = pp.left_pad_batch(shifted_list, self.tokenizer.pad_token_id,
                                        self.lm_cfg.speech_pad_token)
        # a (data, model) mesh shards the batch over the data axis: pad with
        # repeated rows to a data-axis multiple (extra rows are dropped below)
        n_real = batch.shape[0]
        if self.engine.mesh is not None:
            dp = self.engine.mesh.shape["data"]
            pad_rows = -n_real % dp
            if pad_rows:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad_rows, axis=0)], axis=0)
                mask = np.concatenate(
                    [mask, np.repeat(mask[-1:], pad_rows, axis=0)], axis=0)
                if isinstance(adapter, (list, tuple)):
                    adapter = list(adapter) + [adapter[-1]] * pad_rows
        t0 = time.perf_counter()
        C = self.lm_cfg.channels
        max_steps, _ = self.engine._step_budget(max_new_tokens, batch.shape[1])
        nq = self.spt.nq

        def trim(res):
            if res.tokens.shape[0] != n_real:
                unfin = (res.unfinished[:n_real]
                         if res.unfinished is not None else None)
                res = res._replace(tokens=res.tokens[:n_real], unfinished=unfin)
            return res

        # Decode<->vocode overlap (beats the reference's fully serial
        # process_batch, generation_utils.py:406-450, structurally): when the
        # step budget spans more than one 30 s codec window, generation runs
        # as compiled segments aligned to codec-chunk completion points;
        # each completed chunk's vocode + device->host readback dispatches
        # while the LM keeps decoding. Byte-identical to the serial path
        # (tests/test_pipeline_overlap.py).
        inc = None
        if self.overlap_vocode and max_steps - (C - 1) > self.spt.chunk_codes:
            inc = self.spt.incremental_decoder(
                overlap_seconds=self.vocode_overlap_s, pcm16=True,
                rows_per_call=self.vocode_rows_per_call)
            first_ready = self.spt.chunk_codes + C - 1
            n_chunks = -(-(max_steps - (C - 1)) // inc.duration_codes)
            bounds = [first_ready + ci * inc.duration_codes
                      for ci in range(n_chunks)]
            result = None
            for result in self.engine.generate_stream(
                    batch, mask, max_new_tokens, seed=seed, boundaries=bounds,
                    adapter=adapter):
                result = trim(result)
                codes_now = self.extract_codes(result)
                inc.feed([c if c is not None else np.zeros((nq, 0), np.int32)
                          for c in codes_now],
                         [not bool(u) for u in result.unfinished])
        else:
            result = trim(self.engine.generate(batch, mask, max_new_tokens,
                                               seed=seed, adapter=adapter))
        dt = time.perf_counter() - t0
        self.timings.prefill_decode_s += dt
        self.timings.generated_steps += result.steps
        metrics.add("prefill_decode_s", dt)
        metrics.add("generated_steps", result.steps)
        if result.audit is not None:
            # restricted-head audit evidence (cfg.restricted_audit_every):
            # exported via the metrics registry so server deployments can
            # read (rows audited, rows the full head would have flagged)
            # off /v1/metrics instead of the Python API
            metrics.add("restricted_audit_rows", result.audit[0])
            metrics.add("restricted_audit_flagged", result.audit[1])

        # ONE batched vocode per chunk for all valid items (variable lengths
        # are masked inside the codec's 30 s chunking) — per-item calls would
        # leave the batch dimension of the compiled codec idle
        final_codes = self.extract_codes(result)
        valid_idx, valid_codes = [], []
        for row, codes in enumerate(final_codes):
            if codes is None:
                continue
            valid_idx.append(ok_idx[row])
            valid_codes.append(codes)

        wavs = []
        if valid_codes:
            t0 = time.perf_counter()
            if inc is not None and len(valid_codes) == len(final_codes):
                wavs = inc.finish(final_codes)["syn_wav_list"]
            else:
                # Serial path — also taken when the overlap decoder ran but
                # some rows produced no speech: the serial contract vocodes
                # ONLY valid rows, and a different vocode batch dimension
                # changes XLA reduction tiling (~2e-7 deviations, see
                # tests/test_codec_bf16.py rows_per_call note), so the rare
                # mixed batch re-vocodes the valid rows rather than reading
                # back the full-batch overlap dispatches.
                wavs = self.spt.decode(
                    valid_codes, overlap_seconds=self.vocode_overlap_s,
                    pcm16=True,
                    rows_per_call=self.vocode_rows_per_call)["syn_wav_list"]
            dt = time.perf_counter() - t0
            self.timings.vocode_s += dt
            metrics.add("vocode_s", dt)

        audio_results = [None] * len(batch_items)
        for i, wav in zip(valid_idx, wavs):
            audio_results[i] = {
                "audio_data": np.asarray(wav, np.float32)[None, :],
                "sample_rate": self.spt.output_sample_rate,
                "index": start_idx + i,
            }
        return texts_data, audio_results

    def extract_codes(self, result) -> List[Optional[np.ndarray]]:
        """GenerateResult -> per-row codec codes (nq, T) int32 or None.

        The single post-generation contract (unshift -> last-valid-row scan
        -> codebook clip), shared by process_batch and the serving workers
        (serve/server.py) so the two paths cannot drift. The clip guards a
        malformed channel-0 row outside the speech range from indexing out
        of the codebook."""
        speech_ids, ends = self.unshift_end(result.tokens, result.base)
        li = ends - 1
        out: List[Optional[np.ndarray]] = []
        for row in range(speech_ids.shape[0]):
            end = int(li[row]) + 1
            if end <= 0:
                out.append(None)
                continue
            codes = speech_ids[row, :end].T.astype(np.int32)    # (nq, T)
            out.append(np.clip(codes, 0,
                               self.spt.cfg.quantizer.codebook_size - 1))
        return out

    def unshift_end(self, tokens: np.ndarray, base: int):
        """(B, T, C) generated tokens -> (unshifted speech_ids (B, T', C),
        per-row valid-frame counts (B,)). The delay un-shift + last-valid-row
        scan shared by extract_codes and the streaming paths."""
        speech_ids = pp.unshift_outputs(tokens, base, self.lm_cfg.channels,
                                        self.lm_cfg.speech_token_range[0])
        li = pp.find_max_valid_positions(speech_ids,
                                         self.lm_cfg.speech_pad_token)
        return speech_ids, li + 1

    def stream_item(self, item: dict, system_prompt: str = SYSTEM_PROMPT,
                    use_normalize: bool = False,
                    max_new_tokens: Optional[int] = None, seed: int = 0,
                    chunk_steps: int = 25, context_frames: int = 25,
                    first_chunk_steps: int = 12, adapter=None):
        """Streaming synthesis of ONE item: yields (audio_chunk (T,) float32,
        sample_rate) as generation progresses (~``chunk_steps``/12.5 s of new
        audio per yield).

        Latency design (TTFA): the FIRST segment is only
        ``first_chunk_steps`` decode steps (~1 s of audio at the default 12)
        and its vocode is read back immediately, so first audio surfaces
        after prefill + 12 steps + one small vocode. Every later segment's
        vocode runs ONE segment behind generation: it is dispatched onto the
        async device stream, and its (slow, tunnel-bound) device->host
        readback happens while the NEXT decode segment computes.

        The vocoder is re-run over a sliding window with ``context_frames``
        of left context (StreamVocoder) so chunk boundaries see real
        receptive field; only the new samples are emitted. Capability the
        reference lacks end-to-end (its Gradio path returns whole files —
        SURVEY §3.4).
        """
        shifted, _ = self.prepare_item(item, system_prompt, use_normalize)
        batch, mask = pp.left_pad_batch([shifted], self.tokenizer.pad_token_id,
                                        self.lm_cfg.speech_pad_token)
        sv = StreamVocoder(
            self.spt, StreamVocoder.effective_context(
                self.spt, self.vocode_overlap_s, chunk_steps, context_frames),
            timings=self.timings)
        max_steps, _ = self.engine._step_budget(max_new_tokens, batch.shape[1])
        bounds = [min(first_chunk_steps, chunk_steps, max_steps)]
        while bounds[-1] < max_steps:
            bounds.append(min(bounds[-1] + chunk_steps, max_steps))

        last_ids, last_end = None, 0
        for result in self.engine.generate_stream(batch, mask, max_new_tokens,
                                                  seed=seed,
                                                  boundaries=bounds,
                                                  adapter=adapter):
            speech_ids, ends = self.unshift_end(result.tokens, result.base)
            end = int(ends[0])
            last_ids, last_end = speech_ids, end
            for chunk in sv.feed(speech_ids, end):
                yield chunk, sv.sample_rate
        for chunk in sv.finish(last_ids, last_end):
            yield chunk, sv.sample_rate
