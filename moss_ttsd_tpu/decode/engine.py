"""Jitted autoregressive generation engine.

This replaces the reference's Python-per-step HF decode loop
(reference CustomMixin._sample, modeling_asteroid.py:52-197) with ONE compiled
XLA program: prefill + a lax.while_loop over decode steps with a static-shape
KV cache. All of the reference's delay-pattern control flow is reproduced as
vectorized lax ops:

  * teacher-forcing window — the last (channels-1) rows of the shifted prompt
    are re-fed channel-by-channel during the first 7 steps
    (reference :87-91, :143-145);
  * per-channel logit masks — pad-1024 forbidden on channel i once its delay
    has elapsed; end-of-speech forbidden on channel 0 inside the TF window
    (reference :124-128);
  * EOS flush — a non-speech token on channel 0 starts a (channels-1)-step
    staggered pad flush tracked by an integer countdown (reference :140-168);
  * per-channel repetition penalty / temperature / top-k / top-p sampling
    (reference :95-109, :129-138) with incremental presence masks.

Prompt lengths are bucketed (left-pad to a multiple of ``bucket``) so the
number of distinct compiled programs stays bounded.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LMConfig, SamplingConfig
from ..models.lm import AsteroidLM, init_cache
from ..ops.sampling import (ChannelParams, apply_repetition_penalty,
                            presence_from_history, sample_from_channel,
                            scatter_presence)
from ..ops.attention import NEG_INF

logger = logging.getLogger(__name__)


class GenerateResult(NamedTuple):
    tokens: np.ndarray       # (B, base + steps, C) — prompt-minus-tail + generated
    steps: int               # decode steps actually run
    base: int                # index of the first generated row (== bucketed L - C + 1)
    unfinished: Optional[np.ndarray] = None   # (B,) bool — rows still decoding
                                              # (populated by generate_stream)
    audit: Optional[Tuple[int, int]] = None   # restricted-head audit counters
                                              # (rows_audited, rows_flagged) —
                                              # cfg.restricted_audit_every


class DecodeState(NamedTuple):
    step: jnp.ndarray           # scalar int32 — decode step s
    tokens: jnp.ndarray         # (B, S, C) token buffer
    cache: dict                 # {"k","v"[, "k_s","v_s"]} (L, B, Hkv, S, ...)
    key_valid: jnp.ndarray      # (B, S) bool
    hidden_last: jnp.ndarray    # (B, 1, H)
    last_pos: jnp.ndarray       # (B,) last RoPE position used
    needs: jnp.ndarray          # (B,) int32 EOS-flush countdown, -1 = inactive
    unfinished: jnp.ndarray     # (B,) bool
    presence_text: jnp.ndarray  # (B, V_text) bool (restricted_text_head:
    #                             (B, window) over cfg.text_head_window())
    presence_speech: jnp.ndarray  # (B, C-1, V_speech) bool
    rng: jax.Array
    audit_rows: jnp.ndarray     # scalar int32 — unfinished rows audited
    audit_flagged: jnp.ndarray  # scalar int32 — rows where the full head's
    #                             best OUT-of-window logit beat the window max
    #                             (cfg.restricted_audit_every; 0 when off)


def sample_channels(rng, text_logits, speech_logits, presence_text,
                    presence_speech, srow, ch_params, prefilter, approx_topk,
                    eos, pad_speech, text_offset=0):
    """One sampling round -> next_tokens (B, C). Shared by the static engine
    and the continuous batcher.

    srow is the per-request decode step: a traced scalar (static batch — all
    rows in lockstep) or a (B,) vector (continuous batching — each row at its
    own depth). The two hard masks it gates (no end-of-speech during the
    teacher-forcing window, reference modeling_asteroid.py:127-128; no
    pad-1024 on channel i once its delay elapsed, reference :124-126)
    broadcast identically either way.

    text_offset: vocab id of text_logits/presence_text column 0
    (restricted_text_head window start; 0 = full vocab). ``eos`` is always
    the FULL vocab id; returned channel-0 tokens are full ids too."""
    C = len(ch_params)
    rngs = jax.random.split(rng, C)
    draw = lambda i, lg: (
        sample_from_channel(rngs[i], lg, ch_params[i], prefilter, approx_topk)
        if i == 0 else
        sample_from_channel(rngs[i], lg, ch_params[i], prefilter))
    return _sample_channels_body(draw, text_logits, speech_logits,
                                 presence_text, presence_speech, srow,
                                 ch_params, eos, pad_speech, text_offset)


def sample_channels_rowkeys(keys, text_logits, speech_logits, presence_text,
                            presence_speech, srow, ch_params, prefilter,
                            approx_topk, eos, pad_speech, text_offset=0):
    """sample_channels with PER-ROW rng keys (B, 2) and per-row depths
    (B,) — the continuous pool's sampler. Row b's tokens bit-match
    ``sample_channels(split-chain of keys[b], batch-1 slices)``, i.e. the
    static engine's draw sequence for that request: the per-channel key
    split replicates the engine's ``jax.random.split(step_rng, C)`` per
    row, while all heavy ops stay batched
    (ops.sampling.sample_from_channel_rowkeys). text_offset as in
    sample_channels (restricted_text_head window start)."""
    from ..ops.sampling import sample_from_channel_rowkeys
    C = len(ch_params)
    rngs = jax.vmap(lambda k: jax.random.split(k, C))(keys)   # (B, C, 2)
    draw = lambda i, lg: (
        sample_from_channel_rowkeys(rngs[:, i], lg, ch_params[i], prefilter,
                                    approx_topk)
        if i == 0 else
        sample_from_channel_rowkeys(rngs[:, i], lg, ch_params[i], prefilter))
    return _sample_channels_body(draw, text_logits, speech_logits,
                                 presence_text, presence_speech, srow,
                                 ch_params, eos, pad_speech, text_offset)


def _sample_channels_body(draw, text_logits, speech_logits, presence_text,
                          presence_speech, srow, ch_params, eos, pad_speech,
                          text_offset):
    """The ONE copy of the per-channel masking/penalty chain shared by the
    static and rowkeys samplers — the pool-vs-static row-bitmatch contract
    requires the two to stay identical, so only the draw closure differs."""
    C = len(ch_params)
    in_tf = srow < C - 1
    t_logits = text_logits.at[:, eos - text_offset].add(
        jnp.where(in_tf, NEG_INF, 0.0))
    t_logits = apply_repetition_penalty(t_logits, presence_text,
                                        ch_params[0].repetition_penalty)
    toks = [draw(0, t_logits) + text_offset]
    for i in range(1, C):
        sl = speech_logits[:, i - 1]
        sl = sl.at[:, pad_speech].add(jnp.where(srow >= i, NEG_INF, 0.0))
        sl = apply_repetition_penalty(sl, presence_speech[:, i - 1],
                                      ch_params[i].repetition_penalty)
        toks.append(draw(i, sl))
    return jnp.stack(toks, axis=-1)      # (B, C)


def _build_generate_fn(model: AsteroidLM, cfg: LMConfig, sampling: SamplingConfig,
                       base: int, max_steps: int, cache_dtype):
    """Compile-time-closed (prefill, run) pair for one (bucketed prompt
    length, buffer capacity) shape. ``max_steps`` sizes the token buffer and
    KV cache; the actual step bound is the dynamic ``upto`` arg of ``run``,
    so one compiled pair serves every request whose limit fits the buffer."""
    C = cfg.channels
    ch_params: List[ChannelParams] = [
        ChannelParams.from_config(c, exact_top_p=sampling.exact_top_p)
        for c in sampling.channels]
    prefilter = sampling.topk_prefilter
    approx_topk = sampling.approx_topk
    speech_lo, speech_hi = cfg.speech_token_range
    eos = cfg.eos_token_id
    pad_speech = cfg.speech_pad_token
    # restricted_text_head: channel-0 logits/presence span only the
    # [t_lo, t_hi) window (cfg.text_head_window); t_lo = 0 = full vocab
    t_lo, t_hi = cfg.text_head_window()
    restricted = cfg.restricted_text_head
    S = base + max_steps
    L = base + C - 1      # full shifted prompt length

    def is_speech(tok):
        return (tok >= speech_lo) & (tok < speech_hi)

    def to_window(ids):
        """Full vocab id -> presence index in the [t_lo, t_hi) window.
        Below-window ids map to t_hi - t_lo (out of bounds, so the drop-mode
        scatter skips them) — a bare subtraction would go negative and WRAP
        onto real window slots (ordinary text ids sit right below the speech
        range). Identity when t_lo == 0 (full vocab)."""
        idx = ids - t_lo
        return jnp.where(idx < 0, t_hi - t_lo, idx) if t_lo else idx

    def body(params, state: DecodeState, adapters, adapter_ids) -> DecodeState:
        s = state.step
        cur_len = base + s
        text_logits, speech_logits = model.apply(
            params, state.hidden_last, restricted,
            method=AsteroidLM.logits_all)
        text_logits = text_logits[:, 0]          # (B, t_hi - t_lo)
        speech_logits = speech_logits[:, 0]      # (B, C-1, Vs)

        rng, step_rng = jax.random.split(state.rng)
        next_tokens = sample_channels(
            step_rng, text_logits, speech_logits, state.presence_text,
            state.presence_speech, s, ch_params, prefilter, approx_topk,
            eos, pad_speech, t_lo)

        # restricted-head audit: every N-th step stream the FULL text head
        # once and count unfinished rows whose best out-of-window raw logit
        # beats the window max — the steps where the reference's full head
        # plausibly preferred an ordinary text token (and would have stopped
        # generation, modeling_asteroid.py:140-141). lax.cond keeps the
        # full-table stream off the other N-1 steps.
        audit_rows, audit_flagged = state.audit_rows, state.audit_flagged
        if restricted and cfg.restricted_audit_every > 0:
            def do_audit(hidden):
                outside = model.apply(params, hidden,
                                      method=AsteroidLM.text_logits_outside_max)
                inside = jnp.max(text_logits, axis=-1)
                live = state.unfinished & (state.needs < 0)
                return (jnp.sum(live).astype(jnp.int32),
                        jnp.sum(live & (outside > inside)).astype(jnp.int32))

            dr, df = jax.lax.cond(
                s % cfg.restricted_audit_every == 0, do_audit,
                lambda _: (jnp.int32(0), jnp.int32(0)), state.hidden_last)
            audit_rows = audit_rows + dr
            audit_flagged = audit_flagged + df

        # EOS detection on the *sampled* channel 0 (reference :140-141)
        trigger = (~is_speech(next_tokens[:, 0])) & (state.needs < 0)
        needs = jnp.where(trigger, C - 1, state.needs)

        # teacher forcing: while s < C-1, channels > s come from the shifted
        # prompt tail (reference :143-145)
        tf_row = jax.lax.dynamic_slice(state.tokens, (0, cur_len, 0),
                                       (state.tokens.shape[0], 1, C))[:, 0]
        chan = jnp.arange(C)
        tf_mask = (s < C - 1) & (chan[None, :] > s)
        next_tokens = jnp.where(tf_mask, tf_row, next_tokens)

        # staggered EOS flush (reference :148-153)
        flushing = (needs > 0) & (needs < C - 1)
        flush_val = jnp.where(chan[None, :] == 0, eos, pad_speech)
        flush_chan = (chan[None, :] == 0) | (needs[:, None] < C - chan[None, :])
        next_tokens = jnp.where(flushing[:, None] & flush_chan, flush_val,
                                next_tokens)

        # finished rows emit eos/pad (reference :155-158)
        fin_fill = jnp.where(chan[None, :] == 0, eos, pad_speech)
        next_tokens = jnp.where(state.unfinished[:, None], next_tokens, fin_fill)

        # append + bookkeeping
        tokens = jax.lax.dynamic_update_slice(
            state.tokens, next_tokens[:, None, :].astype(state.tokens.dtype),
            (0, cur_len, 0))
        presence_text = scatter_presence(state.presence_text,
                                         to_window(next_tokens[:, 0]))
        presence_speech = scatter_presence(state.presence_speech, next_tokens[:, 1:])

        needs = jnp.where(needs > 0, needs - 1, needs)
        stopping = (next_tokens[:, 0] == eos) | (needs == 0)
        unfinished = state.unfinished & ~stopping
        unfinished = unfinished | (needs > 0)

        # forward the new token (cache write at cur_len)
        key_valid = state.key_valid.at[:, cur_len].set(True)
        positions = (state.last_pos + 1)[:, None]
        hidden, new_cache = model.apply(
            params, next_tokens[:, None, :], positions, key_valid,
            state.cache, cur_len, method=AsteroidLM.backbone,
            read_extent=(jnp.asarray(cur_len, jnp.int32) + 1
                         if cfg.decode_extent_kernel else None),
            adapters=adapters, adapter_ids=adapter_ids)

        return DecodeState(
            step=s + 1, tokens=tokens, cache=new_cache,
            key_valid=key_valid, hidden_last=hidden,
            last_pos=state.last_pos + 1, needs=needs, unfinished=unfinished,
            presence_text=presence_text, presence_speech=presence_speech,
            rng=rng, audit_rows=audit_rows, audit_flagged=audit_flagged)

    def prefill(params, tokens_full, attn_mask, rng, adapters=None,
                adapter_ids=None) -> DecodeState:
        """tokens_full: (B, L, C) shifted prompt (bucketed, left-padded);
        attn_mask: (B, L) 1=real. Runs the prompt forward and returns the
        ready-to-decode state. adapters/adapter_ids: optional multi-LoRA
        stacks + per-row adapter selection (continuous pool serving; the
        prompt must prefill through the SAME adapter the row decodes with)."""
        B = tokens_full.shape[0]
        buf = jnp.zeros((B, S, C), tokens_full.dtype)
        buf = buf.at[:, :L].set(tokens_full)

        # prefill on the first `base` rows (reference drops the last C-1 rows
        # before the loop, :87-91)
        positions = jnp.maximum(jnp.cumsum(attn_mask[:, :base], axis=1) - 1, 0)
        key_valid = jnp.zeros((B, S), bool).at[:, :base].set(
            attn_mask[:, :base].astype(bool))
        cache = init_cache(cfg, B, S, cache_dtype)
        hidden, cache = model.apply(
            params, buf[:, :base], positions, key_valid, cache, 0,
            method=AsteroidLM.backbone, adapters=adapters,
            adapter_ids=adapter_ids)

        return DecodeState(
            step=jnp.int32(0), tokens=buf, cache=cache, key_valid=key_valid,
            hidden_last=hidden[:, -1:], last_pos=positions[:, -1],
            needs=jnp.full((B,), -1, jnp.int32),
            unfinished=jnp.ones((B,), bool),
            presence_text=presence_from_history(to_window(buf[:, :base, 0]),
                                                t_hi - t_lo),
            presence_speech=jnp.moveaxis(
                jax.vmap(presence_from_history, in_axes=(2, None))(
                    buf[:, :base, 1:], cfg.speech_vocab_size), 0, 1),
            rng=rng, audit_rows=jnp.int32(0), audit_flagged=jnp.int32(0))

    def run(params, state: DecodeState, upto, adapters=None,
            adapter_ids=None) -> DecodeState:
        """Decode until step == upto or every row finished (jit-friendly:
        upto is a traced scalar so one compiled program serves all segment
        boundaries). adapters/adapter_ids: optional multi-LoRA stacks +
        per-row selection (see models/lm.py Qwen3Block)."""
        return jax.lax.while_loop(
            lambda st: (st.step < upto) & jnp.any(st.unfinished),
            lambda st: body(params, st, adapters, adapter_ids),
            state)

    return prefill, run


class GenerationEngine:
    """Holds compiled generate programs per (batch, prompt-bucket, max_steps).

    Pass a ("data", "model") ``mesh`` (parallel.mesh.make_mesh) for multi-chip
    serving: weights are tensor-parallel-sharded over the "model" axis (the
    reference's latent `_tp_plan` hints, modeling_asteroid.py:290-291), the
    batch is data-parallel over "data", and XLA inserts the ICI collectives.
    Batch size must be divisible by the data-axis size.
    """

    def __init__(self, cfg: LMConfig, params, sampling: Optional[SamplingConfig] = None,
                 bucket: int = 128, cache_dtype=jnp.bfloat16, mesh=None,
                 quant: Optional[str] = None, step_bucket: int = 256,
                 max_cached_programs: int = 8, kv_quant: Optional[str] = None,
                 decode_len_bucket: Optional[int] = None,
                 decode_extent_kernel: Optional[bool] = None,
                 restricted_text_head: Optional[bool] = None,
                 attn_impl: Optional[str] = None,
                 restricted_audit_every: Optional[int] = None):
        """quant="int8" stores projection/embedding weights int8 with
        per-channel scales (w8a16): ~1.9x less HBM weight traffic per decode
        step, dequant fused into each matmul (ops/quantize.py). Composes with
        mesh sharding (tests/test_quantize.py::test_int8_mesh_engine_matches_unsharded).

        decode_len_bucket=N enables length-aware decode attention: each step
        reads only the first ceil((written+1)/N)*N cache slots via a
        lax.switch over static prefixes, so the HBM attention stream scales
        with the ACTUAL context, not the buffer capacity (kills the
        256-vs-512-slot buffer cliff; see LMConfig.decode_len_bucket).

        kv_quant="int8" additionally stores the KV cache int8 with
        per-head-per-token scales, dequantized inside the fused Pallas decode
        kernel — halves the cache HBM stream that dominates long-context
        decode (ops/pallas_attention.flash_decode_int8_hs). Measured v5e
        crossover: at a 256-slot cache the per-step quantize cost outweighs
        the saved reads (223 vs 229 steps/s); at >=512 slots int8 wins
        (201 vs 186) and the gap grows with cache length — enable it for
        long-form/podcast decodes, leave it off for short interactive ones.

        restricted_text_head=True computes channel-0 logits only over the
        speech-token window (LMConfig.restricted_text_head — an opt-in
        approximation equal to masking all out-of-window logits to -inf;
        skips the ~311 MB full-table stream per step)."""
        if kv_quant not in (None, "int8"):
            raise ValueError(f"unknown kv_quant mode {kv_quant!r}")
        if attn_impl not in (None, "mixed", "pallas", "xla"):
            raise ValueError(f"unknown attn_impl {attn_impl!r} "
                             "(choices: mixed, pallas, xla)")
        # constructor overrides of LMConfig decode policy (kv_quant="int8"
        # int8 KV cache; decode_len_bucket lax.switch prefix reads;
        # decode_extent_kernel extent-clamped Pallas kernels — see the
        # LMConfig field docs for each)
        overrides = {k: v for k, v in (("kv_quant", kv_quant),
                                       ("decode_len_bucket", decode_len_bucket),
                                       ("decode_extent_kernel",
                                        decode_extent_kernel),
                                       ("restricted_text_head",
                                        restricted_text_head),
                                       ("attn_impl", attn_impl),
                                       ("restricted_audit_every",
                                        restricted_audit_every))
                     if v is not None}
        if overrides:
            import dataclasses
            cfg = dataclasses.replace(cfg, **overrides)
        self.cfg = cfg
        from ..ops.quantize import is_quantized_tree, quantize_lm_params
        # a tree already in quantized layout (int8 checkpoint, or random init
        # of the quantized model) skips the cast + conversion — avoids ever
        # materializing a full-precision master copy on device
        pre_quantized = quant == "int8" and is_quantized_tree(params)
        # store weights in the compute dtype once — the decode step is
        # weight-bandwidth-bound, so fp32 storage would halve throughput
        target = jnp.dtype(cfg.dtype)
        if target != jnp.float32 and not pre_quantized:
            params = jax.tree.map(
                lambda x: x.astype(target)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
        self.quant = quant
        if quant == "int8":
            import dataclasses
            if not pre_quantized:
                params = quantize_lm_params(params)
            # lora_rank=0: a vestigial training-time rank on a serving cfg
            # would trip the config's quantized+LoRA rejection; int8 serving
            # always runs merged weights (per-request adapters ride the
            # engine's register_adapter stacks instead)
            cfg = dataclasses.replace(cfg, quantized=True, lora_rank=0)
            self.cfg = cfg
        elif quant is not None:
            raise ValueError(f"unknown quant mode {quant!r}")
        self.mesh = mesh
        self._param_shardings = None
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import lm_param_specs
            specs = lm_param_specs(params, model_size=mesh.shape["model"])
            self._param_shardings = jax.tree.map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P))
            params = jax.tree.map(jax.device_put, params, self._param_shardings)
            self._data_sharding = NamedSharding(mesh, P("data"))
            self._repl_sharding = NamedSharding(mesh, P())
        self.params = params
        self.sampling = sampling or SamplingConfig.default(cfg.channels)
        for i, ch in enumerate(self.sampling.channels):
            if (ch.do_sample and (ch.top_p or 1.0) < 1.0
                    and (ch.top_k or 0) <= 0
                    and not self.sampling.exact_top_p):
                logger.warning(
                    "channel %d samples with top_p=%.3g but no top_k: the "
                    "static top-%d prefilter truncates the nucleus whenever "
                    "it exceeds %d candidates (approximate vs HF's exact "
                    "TopPLogitsWarper); set top_k, raise "
                    "SamplingConfig.topk_prefilter, or set "
                    "SamplingConfig.exact_top_p for the full-vocab nucleus "
                    "path", i, ch.top_p,
                    self.sampling.topk_prefilter, self.sampling.topk_prefilter)
        self.model = AsteroidLM(cfg)
        self.bucket = bucket
        # buffer capacity (KV cache + token buffer) is bucketed to multiples
        # of step_bucket so varying max_tokens shares compiled programs; the
        # actual step bound is a dynamic scalar. Keep the bucket tight:
        # decode attention reads the FULL static buffer every step, so
        # oversizing it costs real bandwidth — measured on v5e at the
        # 256-step serving config: 229 steps/s with a 256-slot bucket vs
        # 186 with a 512-slot one (bf16 KV, w8a16). Larger buckets only pay
        # off for workloads whose max_tokens genuinely varies per request.
        if step_bucket < cfg.channels - 1:
            # prefill writes the (B, base + C-1, C) teacher-forcing tail into
            # a buffer of capacity base + buf_steps, and buf_steps is always
            # >= step_bucket — reject here rather than let the slice-shape
            # mismatch surface as an opaque trace-time broadcast error.
            raise ValueError(
                f"step_bucket={step_bucket} must be >= channels-1 "
                f"({cfg.channels - 1}) to hold the teacher-forcing tail")
        if max_cached_programs < 1:
            raise ValueError("max_cached_programs must be >= 1")
        self.step_bucket = step_bucket
        self.max_cached_programs = max_cached_programs
        self.cache_dtype = cache_dtype
        self._compiled: OrderedDict = OrderedDict()
        # the HTTP streaming handler and the batching worker can drive the
        # same engine from different threads; the LRU dict is lookup+insert+
        # evict, so serialize _get_fns (a jitted pair already handed out
        # stays valid after eviction — popitem only drops the cache's ref)
        import threading
        self._compile_lock = threading.RLock()
        # multi-LoRA registry (decode/lora_registry.py): id 0 = base model;
        # generate()/generate_stream() select per request via adapter=
        from .lora_registry import LoraRegistry
        self.lora = LoraRegistry(jnp.dtype(self.cfg.dtype),
                                 self.cfg.num_hidden_layers)

    def register_adapter(self, name: str, lora: dict, alpha: float = 32.0,
                         use_rslora: bool = True) -> int:
        """Register a LoRA adapter for per-request static-path serving
        (see decode/lora_registry.LoraRegistry.register). Registration grows
        the stacked arrays, so the next generate call retraces — register
        every adapter before serving traffic."""
        return self.lora.register(name, lora, alpha, use_rslora)

    def _adapter_operands(self, adapter, batch: int):
        """(stacks, ids) operands for prefill/run — (None, None) when the
        registry is empty and no adapter was requested."""
        if not self.lora:
            named = ([adapter] if adapter is None or isinstance(adapter, str)
                     else list(adapter))
            if any(a not in (None, "") for a in named):
                raise ValueError(
                    f"unknown adapter {adapter!r}; none registered")
            return None, None
        return self.lora.stacks, self.lora.row_ids(adapter, batch)

    def _get_fns(self, base: int, buf_steps: int):
        """(prefill, run) for one (prompt-base, buffer-capacity) key, with an
        LRU-capped cache so a long-tail serving mix (varying max_tokens /
        prompt lengths) compiles a bounded number of programs. Thread-safe
        (see _compile_lock)."""
        key = (base, buf_steps)
        with self._compile_lock:
            if key in self._compiled:
                self._compiled.move_to_end(key)
                return self._compiled[key]
            logger.info("GenerationEngine: compiling (base=%d, buf_steps=%d); "
                        "%d program pair(s) cached", base, buf_steps,
                        len(self._compiled))
            prefill, run = _build_generate_fn(
                self.model, self.cfg, self.sampling, base, buf_steps,
                self.cache_dtype)
            # donate the carried DecodeState: without it every segmented run
            # call (generate_stream / continuous splice) copies the full KV
            # cache in
            if self.mesh is not None:
                repl = self._repl_sharding
                io_sh = (self._param_shardings, self._data_sharding,
                         self._data_sharding, repl, repl, repl)
                prefill = jax.jit(prefill, in_shardings=io_sh)
                run = jax.jit(run, in_shardings=(self._param_shardings,
                                                 None, None, repl, repl),
                              donate_argnums=(1,))
            else:
                prefill = jax.jit(prefill)
                run = jax.jit(run, donate_argnums=(1,))
            self._compiled[key] = (prefill, run)
            while len(self._compiled) > self.max_cached_programs:
                old_key, _ = self._compiled.popitem(last=False)
                logger.info("GenerationEngine: evicting compiled pair %s",
                            old_key)
            return self._compiled[key]

    def _step_budget(self, max_new_tokens: Optional[int], prompt_len: int):
        """Resolve (steps to run, buffer capacity) for a request.

        HF max_length semantics: the reference drops the last channels-1
        teacher-forcing rows of the shifted prompt before its loop
        (modeling_asteroid.py:88-89), and MaxLengthCriteria counts from that
        truncated length — so the step budget is
        max_length - (prompt_len - channels + 1), NOT max_length - prompt_len.
        Buffer capacity is bucketed upward so the number of distinct compiled
        programs stays bounded.
        """
        if max_new_tokens is not None and max_new_tokens < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new_tokens}")
        steps = (self.sampling.max_new_tokens if max_new_tokens is None
                 else max_new_tokens)
        if self.sampling.max_length is not None and max_new_tokens is None:
            counted = prompt_len - (self.cfg.channels - 1)
            # a prompt already at/over max_length generates 0 new tokens
            # (HF MaxLengthCriteria; the old max(1, ...) emitted one extra)
            steps = min(steps, max(0, self.sampling.max_length - counted))
        sb = self.step_bucket
        buf = max(sb, -(-steps // sb) * sb)
        return steps, buf

    def _bucket_prompt(self, input_ids: np.ndarray, attention_mask: np.ndarray):
        """Left-pad the prompt to a bucket multiple; returns (ids, mask, base)."""
        C = self.cfg.channels
        B, L, _ = input_ids.shape
        L_b = max(self.bucket, -(-L // self.bucket) * self.bucket)
        pad = L_b - L
        if pad:
            pad_ids = np.zeros((B, pad, C), input_ids.dtype)
            pad_ids[..., 0] = self.cfg.pad_token_id
            pad_ids[..., 1:] = self.cfg.speech_pad_token
            input_ids = np.concatenate([pad_ids, input_ids], axis=1)
            attention_mask = np.concatenate(
                [np.zeros((B, pad), attention_mask.dtype), attention_mask],
                axis=1)
        return input_ids, attention_mask, L_b - C + 1

    def generate(self, input_ids: np.ndarray, attention_mask: np.ndarray,
                 max_new_tokens: Optional[int] = None, seed: int = 0,
                 adapter=None) -> GenerateResult:
        """input_ids: (B, L, C) delay-shifted prompt, left-padded;
        attention_mask: (B, L). Mirrors reference model.generate()
        (generation_utils.py:406-409) with jitted execution.

        adapter: a registered LoRA adapter name applied to the whole batch,
        or a per-row list of names (None = base model) — prefill and every
        decode step run through the selected adapters (register_adapter).
        """
        max_steps, buf_steps = self._step_budget(max_new_tokens,
                                                 input_ids.shape[1])
        stacks, aids = self._adapter_operands(adapter, input_ids.shape[0])
        input_ids, attention_mask, base = self._bucket_prompt(input_ids,
                                                              attention_mask)
        prefill, run = self._get_fns(base, buf_steps)
        state = prefill(self.params, jnp.asarray(input_ids),
                        jnp.asarray(attention_mask), jax.random.PRNGKey(seed),
                        stacks, aids)
        state = run(self.params, state, jnp.int32(max_steps), stacks, aids)
        if (self.cfg.restricted_text_head
                and self.cfg.restricted_audit_every > 0):
            # one packed readback: each scalar int() is its own
            # device->host round trip through the tunnel
            steps, a_rows, a_flag = (int(v) for v in jax.device_get(
                (state.step, state.audit_rows, state.audit_flagged)))
            audit = (a_rows, a_flag)
        else:
            steps, audit = int(state.step), None
        # read the FULL (static-shape) buffer and slice on host: a device
        # slice by the data-dependent step count would compile one program
        # per distinct steps value (remote compiles cost seconds through
        # the tunnel); the padding rows are a few hundred KB at worst
        return GenerateResult(tokens=np.asarray(state.tokens)[:, :base + steps],
                              steps=steps, base=base, audit=audit)

    def generate_stream(self, input_ids: np.ndarray, attention_mask: np.ndarray,
                        max_new_tokens: Optional[int] = None, seed: int = 0,
                        chunk_steps: int = 25,
                        boundaries: Optional[List[int]] = None,
                        adapter=None):
        """Incremental generation: yields GenerateResult after every
        ``chunk_steps`` decode steps (25 steps = 2 s of audio @12.5 Hz), or
        at the given absolute ``boundaries`` step counts (then to max_steps)
        — the pipeline uses codec-chunk completion points so vocode chunks
        dispatch as early as possible.

        Each yielded result contains ALL rows generated so far, so callers can
        un-shift and vocode any suffix they haven't consumed yet, plus the
        per-row ``unfinished`` flags. The token buffer is mirrored on the
        host and only the NEW rows of each segment cross the (slow)
        device->host link — a full-buffer readback per segment would cost
        O(S) transfer per yield. The loop runs as compiled segments over a
        carried DecodeState — same program, no recompilation per segment.
        The reference exposes (but never wires up) an HF streamer for this
        path (reference modeling_asteroid.py:161-162; SURVEY §3.4).
        """
        max_steps, buf_steps = self._step_budget(max_new_tokens,
                                                 input_ids.shape[1])
        stacks, aids = self._adapter_operands(adapter, input_ids.shape[0])
        input_ids, attention_mask, base = self._bucket_prompt(input_ids,
                                                              attention_mask)
        prefill, run = self._get_fns(base, buf_steps)
        state = prefill(self.params, jnp.asarray(input_ids),
                        jnp.asarray(attention_mask), jax.random.PRNGKey(seed),
                        stacks, aids)
        B, L, C = input_ids.shape
        host = np.zeros((B, base + buf_steps, C), np.int32)
        host[:, :L] = input_ids            # decode overwrites rows >= base
        bounds = iter(sorted(b for b in boundaries
                             if 0 < b < max_steps)) if boundaries else None
        audit_on = (self.cfg.restricted_text_head
                    and self.cfg.restricted_audit_every > 0)
        if max_steps == 0:
            # prompt already at sampling.max_length: 0 new tokens (HF
            # MaxLengthCriteria) — yield the prompt-only result so callers
            # always see at least one segment
            yield GenerateResult(tokens=host[:, :base], steps=0, base=base,
                                 unfinished=np.zeros(B, bool))
            return
        done = 0
        while done < max_steps:
            if bounds is not None:
                upto = next((b for b in bounds if b > done), max_steps)
            else:
                upto = min(done + chunk_steps, max_steps)
            state = run(self.params, state, jnp.int32(upto), stacks, aids)
            # ONE blocking sync per segment: slice the token buffer by the
            # static segment bound (steps <= upto; rows past the actual stop
            # are unwritten and never exposed) so step counter, new tokens,
            # finish flags (and audit counters when enabled) ride a single
            # device->host round trip — per-segment RTT through a tunnelled
            # device is a real cost
            vals = jax.device_get(
                (state.step, state.tokens[:, base + done:base + upto],
                 state.unfinished)
                + ((state.audit_rows, state.audit_flagged) if audit_on
                   else ()))
            steps_dev, new, unfin = vals[:3]
            audit = (int(vals[3]), int(vals[4])) if audit_on else None
            steps = int(steps_dev)
            host[:, base + done:base + steps] = new[:, :steps - done]
            yield GenerateResult(tokens=host[:, :base + steps].copy(),
                                 steps=steps, base=base,
                                 unfinished=np.asarray(unfin), audit=audit)
            if steps < upto or not bool(np.any(unfin)):
                break
            done = steps
