"""Continuous batching: a slot-based serving engine over the jitted decoder.

The reference serves whole static batches (reference generation_utils.py:
341-409): one slow request holds its whole batch hostage and new requests
wait for a full drain. This module keeps a fixed pool of ``slots`` rows
decoding in lockstep; requests JOIN the running pool at segment boundaries
(a compiled prompt-prefix prefill + a device-side row splice; bursts prefill
batched, padded to powers of two) and finished rows are EVICTED and reused
immediately — vLLM-style continuous batching, but with fully static shapes
so XLA compiles a BOUNDED program set (splice, segment, and one prefill per
power-of-two burst size) regardless of the request mix.

Per-row state is the key difference from decode/engine.py: every slot
carries its own decode-step counter, RoPE position, EOS-flush countdown and
repetition-penalty presence sets. The KV cache is RING-addressed: all rows
write the same scalar slot each pool step (in-place on the loop carry —
per-row write positions would copy the whole cache every step), and per-row
``key_valid`` masks carry time order; the token buffer stays in per-row
coordinates (``base + own_step``) for teacher forcing and unshifting.

Numerics per row are identical to the static engine: a request joined
mid-flight — greedy OR sampled — yields token-for-token the same output as
an isolated ``GenerationEngine.generate`` call with its seed: each slot
carries the request's own rng stream and replays the engine's exact
batch-1 draw sequence (tests/test_continuous.py).
"""

from __future__ import annotations

import logging
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LMConfig, SamplingConfig
from ..models.lm import AsteroidLM, init_cache
from ..ops.sampling import ChannelParams, scatter_presence
from .engine import (GenerateResult, _build_generate_fn,
                     sample_channels_rowkeys)

logger = logging.getLogger(__name__)


class PoolState(NamedTuple):
    gstep: jnp.ndarray           # scalar int32 — global pool step (ring clock)
    active: jnp.ndarray          # (B,) bool — slot holds a live request
    step_r: jnp.ndarray          # (B,) int32 — decode steps done per row
    max_r: jnp.ndarray           # (B,) int32 — per-row step budget
    tokens: jnp.ndarray          # (B, S, C)
    cache: dict                  # {"k","v"[, "k_s","v_s"]} (L, B, Hkv, S, ...)
    key_valid: jnp.ndarray       # (B, S) bool
    hidden_last: jnp.ndarray     # (B, 1, H)
    last_pos: jnp.ndarray        # (B,)
    needs: jnp.ndarray           # (B,) int32 EOS-flush countdown, -1 inactive
    unfinished: jnp.ndarray      # (B,) bool
    presence_text: jnp.ndarray   # (B, V_text) bool (restricted_text_head:
    #                              (B, window) over cfg.text_head_window())
    presence_speech: jnp.ndarray  # (B, C-1, V_speech) bool
    rng_r: jax.Array             # (B, 2) uint32 — PER-ROW rng keys: each
                                 # slot carries the request's own PRNGKey
                                 # stream, so sampled outputs are
                                 # reproducible per request (they bit-match
                                 # an isolated batch-1 engine run)
    adapter_r: jnp.ndarray       # (B,) int32 — per-row LoRA adapter id into
                                 # the registered multi-LoRA stacks
                                 # (0 = base model, models/lm.py Qwen3Block)


def _build_segment_fn(model: AsteroidLM, cfg: LMConfig,
                      sampling: SamplingConfig, base: int, max_steps: int,
                      len_aware: bool = True,
                      ablate: frozenset = frozenset()):
    """Compiled ``segment(params, state, k)``: advance every live row by up
    to ``k`` decode steps (rows stop individually at EOS or their budget).

    ``ablate`` is a BENCH-ONLY knob (bench_full.py pool_breakdown): each
    named component of the body is replaced by a shape-preserving stub that
    keeps its inputs alive (so XLA cannot dead-code-eliminate upstream work)
    — stripping components cumulatively attributes the pool's per-step cost
    the way the static decode step was accounted (README stub-isolation
    breakdown). Production callers always pass the default empty set.
    Components: "sampling" (per-row rng chain + channel sampling),
    "logits" (lm heads), "tf_flush" (teacher-forcing + EOS flush machinery),
    "tokenwrite" (per-row token-buffer writes), "presence" (repetition-
    penalty presence scatters), "extentcalc" (per-row extent reduction).

    Cache writes use RING addressing: every pool step writes all rows at the
    SAME scalar slot ``base + gstep % max_steps`` (frozen rows gated to keep
    their sliver), so the update is an in-place scalar dynamic_update_slice
    on the loop carry. Per-row write positions — however phrased (vmap'd
    scatter, one-hot select) — force XLA to copy the full cache every step
    (~1 ms per cache array at the serving geometry). Slot index therefore
    does NOT encode time order; per-row key_valid masks carry causality, and
    a live row can never collide with its own history (its budget is capped
    at max_steps, and it writes every pool step while unfinished)."""
    C = cfg.channels
    ch_params: List[ChannelParams] = [
        ChannelParams.from_config(c, exact_top_p=sampling.exact_top_p)
        for c in sampling.channels]
    prefilter = sampling.topk_prefilter
    approx_topk = sampling.approx_topk
    speech_lo, speech_hi = cfg.speech_token_range
    eos = cfg.eos_token_id
    pad_speech = cfg.speech_pad_token
    # restricted_text_head window (see decode/engine.py _build_generate_fn)
    t_lo, t_hi = cfg.text_head_window()
    restricted = cfg.restricted_text_head

    def is_speech(tok):
        return (tok >= speech_lo) & (tok < speech_hi)

    def to_window(ids):
        # full id -> window presence index; below-window ids land out of
        # bounds for the drop-mode scatter (see engine.to_window for why a
        # bare subtraction would wrap)
        idx = ids - t_lo
        return jnp.where(idx < 0, t_hi - t_lo, idx) if t_lo else idx

    def body(params, state: PoolState, adapters) -> PoolState:
        srow = state.step_r                              # (B,)
        cur_r = base + srow                  # (B,) per-row TOKEN buffer pos
        slot = base + state.gstep            # shared cache slot (ring clock
        #                                      is stored pre-wrapped below)
        S = state.tokens.shape[1]
        adv = state.active & state.unfinished            # rows that advance

        if "logits" in ablate:
            B = state.hidden_last.shape[0]
            dep = state.hidden_last.astype(jnp.float32).sum() * 0.0
            text_logits = jnp.zeros((B, t_hi - t_lo), jnp.float32) + dep
            speech_logits = jnp.zeros(
                (B, C - 1, cfg.speech_vocab_size), jnp.float32) + dep
        else:
            text_logits, speech_logits = model.apply(
                params, state.hidden_last, restricted,
                method=AsteroidLM.logits_all)
            text_logits = text_logits[:, 0]
            speech_logits = speech_logits[:, 0]

        # Per-row sampling with per-row rng keys (request-seed
        # reproducibility, reference set_seed inference.py:71): each row
        # replays EXACTLY the static engine's batch-1 draw sequence — the
        # outer split below is the engine body's
        # ``rng, step_rng = split(state.rng)`` per row, and
        # sample_channels_rowkeys replicates its per-channel splits +
        # categorical draws bit-for-bit while keeping all heavy ops batched
        # (tests/test_continuous.py::test_sampled_per_request_seed_determinism).
        if "sampling" in ablate:
            dep = ((text_logits.sum() + speech_logits.sum()) * 0.0
                   ).astype(jnp.int32)
            rng_r = state.rng_r
            next_tokens = jnp.full((srow.shape[0], C), speech_lo,
                                   jnp.int32) + dep
        else:
            split2 = jax.vmap(jax.random.split)(state.rng_r)  # (B, 2, 2)
            rng_r, step_keys = split2[:, 0], split2[:, 1]
            next_tokens = sample_channels_rowkeys(
                step_keys, text_logits, speech_logits, state.presence_text,
                state.presence_speech, srow, ch_params, prefilter,
                approx_topk, eos, pad_speech, t_lo)

        if "tf_flush" in ablate:
            needs = state.needs
        else:
            # adv-gated: a frozen row samples garbage (its output is
            # discarded below) and must not re-arm the flush countdown
            trigger = adv & (~is_speech(next_tokens[:, 0])) & (state.needs < 0)
            needs = jnp.where(trigger, C - 1, state.needs)

            # teacher forcing: per-row read of the shifted-prompt tail row
            tf_row = jax.vmap(
                lambda t, c: jax.lax.dynamic_slice(t, (c, 0), (1, C))[0]
            )(state.tokens, cur_r)                           # (B, C)
            chan = jnp.arange(C)
            tf_mask = (srow[:, None] < C - 1) & (chan[None, :] > srow[:, None])
            next_tokens = jnp.where(tf_mask, tf_row, next_tokens)

            flushing = (needs > 0) & (needs < C - 1)
            flush_val = jnp.where(chan[None, :] == 0, eos, pad_speech)
            flush_chan = (chan[None, :] == 0) | (needs[:, None]
                                                 < C - chan[None, :])
            next_tokens = jnp.where(flushing[:, None] & flush_chan, flush_val,
                                    next_tokens)
            fin_fill = jnp.where(chan[None, :] == 0, eos, pad_speech)
            next_tokens = jnp.where(adv[:, None], next_tokens, fin_fill)

        if "tokenwrite" in ablate:
            tokens = state.tokens
        else:
            # per-row token write; frozen rows keep their buffer untouched
            # (the select is over the whole (B, S, C) buffer — a few
            # hundred KB)
            written = jax.vmap(
                lambda t, nt, c: jax.lax.dynamic_update_slice(
                    t, nt[None], (c, 0))
            )(state.tokens, next_tokens.astype(state.tokens.dtype), cur_r)
            tokens = jnp.where(adv[:, None, None], written, state.tokens)

        if "presence" in ablate:
            presence_text = state.presence_text
            presence_speech = state.presence_speech
        else:
            presence_text = jnp.where(
                adv[:, None],
                scatter_presence(state.presence_text,
                                 to_window(next_tokens[:, 0])),
                state.presence_text)
            presence_speech = jnp.where(
                adv[:, None, None],
                scatter_presence(state.presence_speech, next_tokens[:, 1:]),
                state.presence_speech)

        if "tf_flush" in ablate:
            # budget-only stopping (the flush countdown is stubbed out)
            unfinished = state.unfinished & (srow + 1 < state.max_r)
        else:
            needs = jnp.where(adv & (needs > 0), needs - 1, needs)
            stopping = (next_tokens[:, 0] == eos) | (needs == 0)
            unfinished = state.unfinished & ~stopping
            unfinished = unfinished | (needs > 0)
            # per-row budget: a row that just wrote its max_r-th token stops
            unfinished = unfinished & (srow + 1 < state.max_r)

        # forward the new token; frozen rows run too (lockstep) but their
        # cache write is gated (write_gate) and their sampled tokens are
        # discarded above
        iota = jnp.arange(S)
        key_valid = state.key_valid | (adv[:, None] & (iota[None, :] == slot))
        positions = (state.last_pos + 1)[:, None]
        # Length-aware reads via the EXTENT-CLAMPED pallas decode kernels
        # (ops/pallas_attention.py): each row's extent is its own max
        # written slot + 1, so out-of-extent key blocks cost neither DMA
        # nor compute while the cache stays ONE full-size operand — a
        # freshly joined row streams only ITS OWN short history even while
        # an old row's ring span covers the whole buffer. The earlier
        # lax.switch-over-static-prefixes formulation is a MEASURED DEAD
        # END here: switching cache prefixes inside the write-gated ring
        # body defeats XLA's in-place aliasing of the carried cache (34.7
        # vs 220.4 steps/s, v5e serving geometry). Frozen/stale rows may
        # hold valid bits anywhere; their attention output is discarded
        # below, so they get a 1-slot extent.
        ext = None
        if len_aware:
            if "extentcalc" in ablate:
                # arithmetic stand-in for the (B, S) reduction: same DMA
                # clamping magnitude for rows live since pool start
                ext = jnp.where(adv, base + srow + 1, 1).astype(jnp.int32)
            else:
                ext = jnp.where(
                    adv,
                    jnp.max(jnp.where(key_valid, iota[None, :] + 1, 0),
                            axis=1),
                    1).astype(jnp.int32)
        hidden, new_cache = model.apply(
            params, next_tokens[:, None, :], positions, key_valid,
            state.cache, slot, adv, method=AsteroidLM.backbone,
            read_extent=ext, adapters=adapters,
            adapter_ids=state.adapter_r)
        hidden = jnp.where(adv[:, None, None], hidden, state.hidden_last)

        return PoolState(
            # keep the ring clock pre-wrapped: a monotonically growing int32
            # would jump discontinuously at 2^31 for non-power-of-two
            # max_steps, landing writes inside live rows' valid history
            gstep=jnp.mod(state.gstep + 1, max_steps),
            active=state.active,
            step_r=state.step_r + adv.astype(jnp.int32),
            max_r=state.max_r,
            tokens=tokens, cache=new_cache, key_valid=key_valid,
            hidden_last=hidden,
            last_pos=state.last_pos + adv.astype(state.last_pos.dtype),
            needs=needs,
            unfinished=unfinished & state.active,
            presence_text=presence_text, presence_speech=presence_speech,
            rng_r=jnp.where(adv[:, None], rng_r, state.rng_r),
            adapter_r=state.adapter_r)

    def segment(params, state: PoolState, k, adapters) -> PoolState:
        def cond(carry):
            t, st = carry
            return (t < k) & jnp.any(st.active & st.unfinished)

        def step(carry):
            t, st = carry
            return t + 1, body(params, st, adapters)

        _, state = jax.lax.while_loop(cond, step, (jnp.int32(0), state))
        return state

    return segment


class ContinuousBatcher:
    """Fixed-slot continuous batching over AsteroidLM.

    Parameters mirror GenerationEngine; ``slots`` is the pool width (the
    static batch the device decodes), ``base`` the single prompt bucket
    (shifted prompts longer than base + channels - 1 are rejected) and
    ``max_steps`` the per-slot KV/token capacity.

    Typical loop::

        cb = ContinuousBatcher(cfg, params, sampling, slots=8)
        cb.submit(shifted_prompt, max_new_tokens=200)   # whenever slots free
        cb.run(steps=25)                                # advance the pool
        for slot in cb.finished():
            result = cb.collect(slot)                   # frees the slot
    """

    def __init__(self, cfg: LMConfig, params,
                 sampling: Optional[SamplingConfig] = None, slots: int = 8,
                 base: int = 128, max_steps: int = 512,
                 cache_dtype=jnp.bfloat16, quant: Optional[str] = None,
                 kv_quant: Optional[str] = None, seed: int = 0, mesh=None,
                 len_aware: bool = True,
                 restricted_text_head: Optional[bool] = None):
        """mesh: a ("data", "model") Mesh (parallel.mesh.make_mesh) shards
        the weights tensor-parallel over the "model" axis for multi-chip
        serving latency. The pool state stays replicated (per-slot decode
        state is tiny next to the weights), so any data-axis size works —
        batch-1 prefills could not shard over "data" anyway."""
        # reuse the engine's param handling (dtype cast / int8 quantization
        # / TP sharding over the mesh)
        from .engine import GenerationEngine
        eng = GenerationEngine(cfg, params, sampling, bucket=base,
                               cache_dtype=cache_dtype, quant=quant,
                               step_bucket=max_steps, kv_quant=kv_quant,
                               mesh=mesh,
                               restricted_text_head=restricted_text_head)
        self.cfg = eng.cfg
        self.params = eng.params
        self.sampling = eng.sampling
        self.model = eng.model
        self.base = base
        self.max_steps = max_steps
        self.slots = slots
        self.cache_dtype = cache_dtype
        self.mesh = mesh
        C = self.cfg.channels
        if max_steps < C - 1:
            raise ValueError(f"max_steps={max_steps} must be >= channels-1 "
                             f"({C - 1}): the spliced prompt prefix would "
                             f"not fit the pool buffer")
        self.S = base + max_steps
        self.L = base + C - 1

        # three compiled programs: admission prefill, row splice, and the
        # pooled decode segment. The prefill's DecodeState buffers are sized
        # to the shifted prompt ONLY (base + C - 1 slots, vs the engine's
        # base + max_steps): admission never decodes in that state — the
        # splice copies its prefix into the pool rows — so a full-capacity
        # buffer would transiently allocate a second pool-sized KV cache per
        # admission burst (~GBs at the server geometry) for slots that hold
        # nothing but zeros.
        self._prefill1, _ = _build_generate_fn(
            self.model, self.cfg, self.sampling, base, C - 1, cache_dtype)
        psh = eng._param_shardings
        if mesh is not None:
            repl = eng._repl_sharding
            self._prefill1 = jax.jit(
                self._prefill1,
                in_shardings=(psh, repl, repl, repl, repl, repl))
            self._segment = jax.jit(_build_segment_fn(
                self.model, self.cfg, self.sampling, base, max_steps,
                len_aware=len_aware),
                donate_argnums=(1,), in_shardings=(psh, None, None, repl))
        else:
            self._prefill1 = jax.jit(self._prefill1)
            self._segment = jax.jit(_build_segment_fn(
                self.model, self.cfg, self.sampling, base, max_steps,
                len_aware=len_aware),
                donate_argnums=(1,))
        self._splice = jax.jit(self._splice_impl, donate_argnums=(0,),
                               static_argnames=())

        self.state = self._init_state(seed)
        self._slot_free = [True] * slots
        # multi-LoRA registry (decode/lora_registry.py): id 0 = base model
        from .lora_registry import LoraRegistry
        self.lora = LoraRegistry(jnp.dtype(self.cfg.dtype),
                                 self.cfg.num_hidden_layers)

    # ------------------------------------------------------------------

    def _init_state(self, seed: int) -> PoolState:
        cfg, B, S, C = self.cfg, self.slots, self.S, self.cfg.channels
        return PoolState(
            gstep=jnp.zeros((), jnp.int32),
            active=jnp.zeros((B,), bool),
            step_r=jnp.zeros((B,), jnp.int32),
            max_r=jnp.full((B,), self.max_steps, jnp.int32),
            tokens=jnp.zeros((B, S, C), jnp.int32),
            cache=init_cache(cfg, B, S, self.cache_dtype),
            key_valid=jnp.zeros((B, S), bool),
            hidden_last=jnp.zeros((B, 1, cfg.hidden_size),
                                  jnp.dtype(cfg.dtype)),
            last_pos=jnp.zeros((B,), jnp.int32),
            needs=jnp.full((B,), -1, jnp.int32),
            unfinished=jnp.zeros((B,), bool),
            presence_text=jnp.zeros((B, cfg.text_head_window()[1]
                                     - cfg.text_head_window()[0]), bool),
            presence_speech=jnp.zeros(
                (B, C - 1, cfg.speech_vocab_size), bool),
            rng_r=jax.random.split(jax.random.PRNGKey(seed), B),
            adapter_r=jnp.zeros((B,), jnp.int32))

    @staticmethod
    def _splice_impl(pool: PoolState, s1, k, j, max_new, rng,
                     aid) -> PoolState:
        """Install row ``k`` of a prefilled DecodeState into pool row ``j``.

        ``s1``'s buffers cover only the prompt prefix (base + C - 1 slots —
        see the prefill note in __init__), so tokens/key_valid/cache write
        that prefix and the rest of the row is RESET: key_valid must drop
        the previous occupant's valid bits (stale True bits past the prefix
        would leak its history into attention), while stale cache contents
        past the prefix are harmless (masked by key_valid and overwritten
        by the ring as the row decodes).

        ``rng`` is the request's own PRNGKey — the pool row starts the exact
        rng chain of an isolated batch-1 engine run (whose prefill returns
        the request key unsplit). ``aid`` is the row's LoRA adapter id."""
        Sp = s1.key_valid.shape[1]          # prompt-prefix length (static)
        row = lambda a, b: a.at[j].set(b[k])
        cache = {name: pool.cache[name].at[:, j, :, :Sp].set(v[:, k])
                 for name, v in s1.cache.items()}
        tokens = pool.tokens.at[j].set(0)
        tokens = tokens.at[j, :Sp].set(s1.tokens[k].astype(tokens.dtype))
        key_valid = pool.key_valid.at[j].set(False)
        key_valid = key_valid.at[j, :Sp].set(s1.key_valid[k])
        return PoolState(
            gstep=pool.gstep,
            active=pool.active.at[j].set(True),
            step_r=pool.step_r.at[j].set(0),
            max_r=pool.max_r.at[j].set(max_new),
            tokens=tokens,
            cache=cache,
            key_valid=key_valid,
            hidden_last=row(pool.hidden_last, s1.hidden_last),
            last_pos=row(pool.last_pos,
                         s1.last_pos.astype(pool.last_pos.dtype)),
            needs=pool.needs.at[j].set(-1),
            unfinished=pool.unfinished.at[j].set(True),
            presence_text=row(pool.presence_text, s1.presence_text),
            presence_speech=row(pool.presence_speech, s1.presence_speech),
            rng_r=pool.rng_r.at[j].set(rng),
            adapter_r=pool.adapter_r.at[j].set(aid))

    # -- multi-LoRA adapters -------------------------------------------

    def register_adapter(self, name: str, lora: dict, alpha: float = 32.0,
                         use_rslora: bool = True) -> int:
        """Register a LoRA adapter for per-request serving; returns its id.

        See decode/lora_registry.LoraRegistry.register for the accepted
        factor-tree formats and the scale/rank-padding semantics.
        Registration grows the stacked arrays' N dimension, so the next
        prefill/segment call recompiles: register every adapter BEFORE
        serving traffic. Rows select adapters per request via
        ``submit(..., adapter=name)``; the base model is adapter=None.
        Beyond the reference, which serves ONE voice per deployed checkpoint
        (LoRA merged at export, finetune.py:237-241)."""
        return self.lora.register(name, lora, alpha, use_rslora)

    # ------------------------------------------------------------------

    @property
    def free_slots(self) -> int:
        return sum(self._slot_free)

    def _padded_row(self, shifted_prompt: np.ndarray):
        """Left-pad one delay-shifted prompt (Lp, C) to the pool bucket."""
        Lp, C = shifted_prompt.shape
        if Lp > self.L:
            raise ValueError(
                f"shifted prompt ({Lp} rows) exceeds the pool bucket "
                f"({self.L}); raise base= or pre-chunk the prompt")
        ids = np.zeros((self.L, C), np.int32)
        ids[:, 0] = self.cfg.pad_token_id
        ids[:, 1:] = self.cfg.speech_pad_token
        ids[self.L - Lp:] = shifted_prompt
        mask = np.zeros((self.L,), np.int32)
        mask[self.L - Lp:] = 1
        return ids, mask

    def _resolve_steps(self, shifted_prompt: np.ndarray,
                       max_new_tokens: Optional[int]) -> int:
        if max_new_tokens is not None and max_new_tokens < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new_tokens}")
        if max_new_tokens is None and self.sampling.max_length is not None:
            # HF max_length total cap, counted like the static engine
            # (decode/engine.py _step_budget: the reference loop starts from
            # the shifted prompt minus its channels-1 teacher-forcing rows)
            counted = shifted_prompt.shape[0] - (self.cfg.channels - 1)
            cap = max(1, self.sampling.max_length - counted)
            max_new_tokens = min(self.sampling.max_new_tokens, cap,
                                 self.max_steps)
        if max_new_tokens is not None and max_new_tokens > self.max_steps:
            # an EXPLICIT budget above pool capacity is an error (silently
            # truncating it would cut the audio mid-sentence while the
            # static scheduler honours the same request in full); the
            # config-default budget merely clamps — it is an upper bound,
            # not a requested length
            raise ValueError(
                f"max_new_tokens={max_new_tokens} exceeds the pool's "
                f"per-slot capacity ({self.max_steps}); raise max_steps= "
                f"or route the request to the static engine (window "
                f"scheduler)")
        if max_new_tokens is None:
            max_new_tokens = self.sampling.max_new_tokens
        return min(max_new_tokens, self.max_steps)

    def submit(self, shifted_prompt: np.ndarray,
               max_new_tokens: Optional[int] = None,
               seed: int = 0, adapter: Optional[str] = None) -> Optional[int]:
        """Join one request: shifted_prompt (Lp, C) — the delay-shifted
        prompt (pipeline.prompt.shift_delay_pattern). Returns the slot id,
        or None when the pool is full. ``adapter`` selects a registered
        LoRA adapter for this request (None = base model)."""
        if not self.free_slots:
            return None
        return self.submit_many(
            [(shifted_prompt, max_new_tokens, seed, adapter)])[0]

    def submit_many(self, requests) -> List[int]:
        """Admit a burst of requests with ONE batched prefill.

        ``requests``: list of ``(shifted_prompt, max_new_tokens, seed)`` or
        ``(shifted_prompt, max_new_tokens, seed, adapter)`` tuples, at most
        ``free_slots`` long. Returns the slot ids in request order.
        Validation (oversized prompt, over-capacity budget, unknown adapter)
        runs for the whole burst BEFORE any device work, so a ValueError
        leaves the pool untouched — callers wanting per-request isolation
        catch it and fall back to one-by-one ``submit``.

        Why: admission cost is the prompt prefill, and prefill at batch K
        costs barely more than batch 1 (weight-streaming-bound, like the
        static engine's whole-batch prefill, reference generation_utils.py:
        406). A K-request burst therefore admits ~K× faster than serial
        ``submit`` calls. The batch is padded to the next power of two
        (bounding compiled program count at log2(slots)); each row's decode
        rng chain is still the request's own seed, so per-request
        reproducibility is unchanged.
        """
        K = len(requests)
        if K == 0:
            return []
        if K > self.free_slots:
            raise ValueError(f"{K} requests exceed {self.free_slots} free "
                             f"slots")
        rows = []
        for req in requests:
            prompt, max_new_tokens, seed = req[:3]
            aid = self.lora.id_of(req[3] if len(req) > 3 else None)
            ids, mask = self._padded_row(prompt)
            rows.append((ids, mask,
                         self._resolve_steps(prompt, max_new_tokens), seed,
                         aid))
        # pad the batch to the next power of two with repeats of row 0
        # (prefill memory stays proportional to the burst, and the number
        # of compiled prefill shapes is bounded)
        Kb = 1
        while Kb < K:
            Kb *= 2
        Kb = min(Kb, self.slots)
        ids = np.stack([r[0] for r in rows]
                       + [rows[0][0]] * (Kb - K))
        mask = np.stack([r[1] for r in rows]
                        + [rows[0][1]] * (Kb - K))
        aids = np.asarray([r[4] for r in rows]
                          + [rows[0][4]] * (Kb - K), np.int32)
        s1 = self._prefill1(self.params, jnp.asarray(ids), jnp.asarray(mask),
                            jax.random.PRNGKey(0), self.lora.stacks,
                            jnp.asarray(aids))
        out: List[int] = []
        for k, (_, _, steps, seed, aid) in enumerate(rows):
            j = self._slot_free.index(True)
            self.state = self._splice(self.state, s1, jnp.int32(k),
                                      jnp.int32(j), jnp.int32(steps),
                                      jax.random.PRNGKey(seed),
                                      jnp.int32(aid))
            self._slot_free[j] = False
            out.append(j)
        return out

    def run(self, steps: int = 25) -> None:
        """Advance every live row by up to ``steps`` decode steps."""
        self.state = self._segment(self.params, self.state, jnp.int32(steps),
                                   self.lora.stacks)

    def poll(self) -> List[tuple]:
        """[(slot, steps), ...] for completed requests — ONE device->host
        readback for flags and step counters together (each np.asarray is a
        full round trip on a remote-tunnelled device)."""
        packed = jnp.stack([
            (self.state.active & ~self.state.unfinished).astype(jnp.int32),
            self.state.step_r])
        arr = np.asarray(packed)
        return [(j, int(arr[1, j])) for j in range(self.slots) if arr[0, j]]

    def finished(self) -> List[int]:
        """Slot ids holding a completed request (ready to collect)."""
        return [j for j, _ in self.poll()]

    def progress(self) -> List[tuple]:
        """[(slot, steps, finished), ...] for every ACTIVE row — still ONE
        device->host readback per segment. Superset of poll() for callers
        (streaming serving) that also track live rows' step counts."""
        packed = jnp.stack([
            self.state.active.astype(jnp.int32),
            (self.state.active & ~self.state.unfinished).astype(jnp.int32),
            self.state.step_r])
        arr = np.asarray(packed)
        return [(j, int(arr[2, j]), bool(arr[1, j]))
                for j in range(self.slots) if arr[0, j]]

    def peek_tokens(self, slots: List[int], steps: List[int],
                    frm: int = 0) -> np.ndarray:
        """Snapshot several LIVE rows' token prefixes in ONE readback:
        (len(slots), base + max(steps) - frm, C). Does NOT free the slots;
        safe for AR streaming because a row's written prefix never changes.

        ``frm``: absolute row offset the caller has already mirrored on the
        host — only rows [frm, base + max(steps)) transfer, so a streaming
        consumer that mirrors pays O(T) cumulative readback instead of
        re-reading the ever-growing prefix every segment."""
        upto = self.base + max(steps)
        rows = jnp.asarray(slots, jnp.int32)
        return np.asarray(self.state.tokens[rows, frm:upto])

    def collect_async(self, j: int, steps: Optional[int] = None):
        """Free slot j immediately; return (steps, device_tokens).

        The token-row slice is dispatched on the device stream BEFORE any
        subsequent splice reuses the slot (single in-order stream), so the
        returned device array is safe to read back any time later —
        ``np.asarray`` it when the output is actually consumed. This keeps
        the serving loop at one blocking readback per segment (poll) with
        all output transfers pipelined."""
        if self._slot_free[j]:
            raise ValueError(f"slot {j} is free")
        if steps is None:
            steps = int(np.asarray(self.state.step_r[j]))
        tokens_dev = self.state.tokens[j, :self.base + steps]
        self.state = self.state._replace(
            active=self.state.active.at[j].set(False),
            unfinished=self.state.unfinished.at[j].set(False))
        self._slot_free[j] = True
        return steps, tokens_dev

    def collect(self, j: int, steps: Optional[int] = None) -> GenerateResult:
        """Read slot j's output and free the slot (blocking)."""
        steps, tokens_dev = self.collect_async(j, steps)
        return GenerateResult(tokens=np.asarray(tokens_dev)[None],
                              steps=steps, base=self.base)

    def release(self, j: int) -> None:
        """Free slot j WITHOUT reading its output (error-path cleanup).

        Host-side slot bookkeeping is restored even if the device state is
        unusable, so a serving loop can always reclaim its pool after an
        exception."""
        self._slot_free[j] = True
        try:
            self.state = self.state._replace(
                active=self.state.active.at[j].set(False),
                unfinished=self.state.unfinished.at[j].set(False))
        except Exception:                       # noqa: BLE001 — device dead
            logger.exception("release(%d): device state update failed", j)
