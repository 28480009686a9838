"""AsteroidLM — the 8-channel Qwen3-style autoregressive decoder, TPU-native
equivalent of the reference AsteroidTTSInstruct + Qwen3Model backbone
(reference modeling_asteroid.py:215-425).

Architecture (parity targets):
  * 8 embedding tables summed into one hidden stream
    (reference _prepare_multi_modal_inputs, modeling_asteroid.py:235-250).
  * Qwen3 blocks: RMSNorm, GQA attention with per-head q/k RMSNorm + RoPE,
    SwiGLU MLP.
  * 8 LM heads; all tied to their embedding tables
    (reference tie_weights, modeling_asteroid.py:315-317).

TPU design:
  * layers run under nn.scan (stacked params) — one compiled block body,
    fast compile inside the lax.while_loop decode graph.
  * static-shape KV cache (B, S, Hkv, D) per layer, stacked (L, ...) and
    updated with dynamic_update_slice; S == 0 selects the cache-free
    training path at trace time.
  * bf16 activations, fp32 softmax/norms.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import LMConfig
from ..ops.attention import causal_mask, gqa_attention, gqa_attention_hs
from ..ops.pallas_attention import (flash_decode_hs, flash_decode_int8_hs,
                                    flash_prefill, quantize_kv)
from ..ops.rope import apply_rope, rope_cos_sin


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    ablate: bool = False     # bench-only stub: x*w (cfg.ablate_norms)

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x=None returns the (dim,) weight alone — for callers that fuse
        the normalization math across modules (cfg.fuse_qk_norm_rope) while
        keeping this module's parameter path, so checkpoints are identical
        either way."""
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        if x is None:
            return w
        return rms_norm_fn(x, w, self.eps, self.ablate)


def rms_norm_fn(x: jnp.ndarray, w: jnp.ndarray, eps: float,
                ablate: bool = False) -> jnp.ndarray:
    """Functional RMSNorm — the ONE copy of the math, shared by the RMSNorm
    module and raw-param-tree callers (parallel/pipeline.py loss_fn)."""
    if ablate:
        return x * w.astype(x.dtype)
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * w.astype(x.dtype)


class QDense(nn.Module):
    """Weight-only int8 Dense (w8a16): int8 kernel + per-output-channel fp32
    scales. The dequant (`astype * scale`) sits directly on the dot operand,
    where XLA fuses it into the matmul's HBM read — only int8 bytes ever
    stream from HBM, halving decode weight traffic. Params are converted from
    a trained bf16/fp32 checkpoint by ops/quantize.quantize_lm_params (the
    random init here only fixes shapes/dtypes)."""

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        q = self.param("kernel_q",
                       lambda k, s: jax.random.randint(k, s, -127, 128, jnp.int8),
                       (x.shape[-1], self.features))
        s = self.param("kernel_s", nn.initializers.ones, (1, self.features))
        w = q.astype(self.dtype) * s.astype(self.dtype)
        y = x @ w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class LoRADense(nn.Module):
    """Dense with an additive low-rank adapter: y = x W + scale (x A) B.

    The layerwise form (vs merging W + scale A B up front) is what keeps LoRA
    training memory-light: the backward's cotangents w.r.t. the adapters stay
    rank-sized, while a merged tree receives a full kernel-sized cotangent per
    projection (~the whole parameter tree in fp32 — measured 31.8 GB at the
    1.7B geometry, an OOM on one v5e). Same math as the reference's peft
    adapters (reference finetune/finetune.py:165-175).

    The base kernel keeps the plain nn.Dense param layout ("kernel"/"bias"
    under the same module name), so checkpoints load identically whether
    cfg.lora_rank is 0 or not; "lora_a"/"lora_b" are extra leaves."""

    features: int
    rank: int
    scale: float
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        a = self.param("lora_a", nn.initializers.normal(stddev=0.02),
                       (x.shape[-1], self.rank))
        b = self.param("lora_b", nn.initializers.zeros,
                       (self.rank, self.features))
        y = x @ kernel.astype(self.dtype)
        y = y + ((x @ a.astype(self.dtype)) @ b.astype(self.dtype)
                 ) * self.scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Qwen3Block(nn.Module):
    """One decoder layer; scanned over the stacked layer axis.

    The FULL stacked KV cache (L, B, Hkv, S, D) rides through the layer scan
    as a *carry* and each layer writes only its new (B, T, ...) slice at
    (layer_idx, 0, cache_pos, ...). Passing the cache as scan xs/ys instead
    would stack a fresh cache every step — a full-cache copy per decode step
    that measured ~3.5x the attention-read traffic on v5e.
    """

    cfg: LMConfig

    @nn.compact
    def __call__(self, x, cache, layer_idx, cos, sin, mask, cache_pos,
                 write_gate=None, read_extent=None, adapters=None,
                 adapter_ids=None):
        c = self.cfg
        dtype = x.dtype
        H, Hkv, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        B, T, _ = x.shape
        ck_all = cache["k"]
        L, S = ck_all.shape[0], ck_all.shape[3]       # cache (L, B, Hkv, S, D)
        kv8 = "k_s" in cache                          # int8 KV cache + scales

        def dense(feat, name, use_bias=False):
            if c.quantized:
                base = QDense(feat, use_bias=use_bias, dtype=dtype, name=name)
            elif c.lora_rank and name in c.lora_targets:
                import math
                scale = (c.lora_alpha / math.sqrt(c.lora_rank)
                         if c.lora_rslora else c.lora_alpha / c.lora_rank)
                base = LoRADense(feat, rank=c.lora_rank, scale=scale,
                                 use_bias=use_bias, dtype=dtype, name=name)
            else:
                base = nn.Dense(feat, use_bias=use_bias, dtype=dtype,
                                name=name)
            if not adapters or name not in adapters:
                return base

            # multi-LoRA serving (S-LoRA style): every row of the batch can
            # run a DIFFERENT adapter. ``adapters[name]`` holds this layer's
            # stacked factors a (N, in, r), b (N, r, out) — the per-adapter
            # LoRA scale is folded into b at registration (every leaf here
            # is scanned over the layer axis, so a bare (N,) scale vector
            # cannot ride along). Rows gather their own factors by adapter
            # id and the delta is two rank-sized batched einsums. Index 0 is
            # the zero adapter (base model). Beyond the reference, which can
            # only bake ONE LoRA into the weights at export
            # (finetune.py:237-241).
            def with_adapter(h):
                y = base(h)
                a, b = adapters[name]
                a_sel = jnp.take(a, adapter_ids, axis=0)      # (B, in, r)
                b_sel = jnp.take(b, adapter_ids, axis=0)      # (B, r, out)
                delta = jnp.einsum("bti,bir->btr", h, a_sel.astype(dtype))
                delta = jnp.einsum("btr,bro->bto", delta, b_sel.astype(dtype))
                return y + delta
            return with_adapter

        h = RMSNorm(c.hidden_size, c.rms_norm_eps, name="input_ln",
                    ablate=c.ablate_norms)(x)
        q = dense(H * D, "q_proj", c.attention_bias)(h)
        k = dense(Hkv * D, "k_proj", c.attention_bias)(h)
        v = dense(Hkv * D, "v_proj", c.attention_bias)(h)
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        if c.fuse_qk_norm_rope and not (c.ablate_norms or c.ablate_rope):
            # one concatenated norm+rope pass over (B, T, H+Hkv, D): the norm
            # reduces over D and rope rotates within D, both per-head, so
            # this is the separate-path math (float-reassociation-level
            # differences only; tests/test_lm.py) with half the fusion
            # boundaries on the tiny decode tensors
            w_q = RMSNorm(D, c.rms_norm_eps, name="q_norm")(None)
            w_k = RMSNorm(D, c.rms_norm_eps, name="k_norm")(None)
            qk = jnp.concatenate([q, k], axis=2)
            xf = qk.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            normed = (xf * jax.lax.rsqrt(var + c.rms_norm_eps)).astype(dtype)
            w = jnp.concatenate(
                [jnp.broadcast_to(w_q, (H, D)),
                 jnp.broadcast_to(w_k, (Hkv, D))], axis=0).astype(dtype)
            qk = apply_rope(normed * w, cos, sin)
            q, k = qk[:, :, :H], qk[:, :, H:]
        else:
            q = RMSNorm(D, c.rms_norm_eps, name="q_norm",
                        ablate=c.ablate_norms)(q)
            k = RMSNorm(D, c.rms_norm_eps, name="k_norm",
                        ablate=c.ablate_norms)(k)
            if not c.ablate_rope:
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)

        # write_gate (continuous batching, decode/continuous.py): rows share
        # ONE scalar write slot per pool step (ring addressing), so the cache
        # update stays a scalar-start dynamic_update_slice that XLA performs
        # in place on the loop carry. Per-row write positions (a vmap'd
        # scatter or a one-hot select) force a full-cache copy every decode
        # step — measured ~1 ms per cache array per step at the serving
        # geometry, whichever way it is phrased. Frozen rows keep their old
        # sliver via the gate select (sliver-sized read, not full-slice).
        # pallas kernels only lower on TPU; elsewhere fall back to the XLA
        # path unless interpret mode is explicitly requested (CPU tests).
        # "mixed" picks by measured v5e crossover: pallas flash prefill
        # always; pallas decode only at long cache (>=512 slots) where its
        # ~1.8us/slot beats XLA's ~2.7us/slot, while XLA's fusion wins the
        # fixed overhead race on short caches.
        pallas_ok = jax.default_backend() == "tpu" or c.pallas_interpret
        if kv8:
            # int8 cache: XLA fuses the dequant into its attention reads, so
            # the XLA decode gets the halved HBM stream AND full MXU
            # utilization — measured 204 vs 173 steps/s for the pallas int8
            # kernel at S=569 (G=2 grouped heads starve the kernel's dots).
            # "pallas" still selects the fused int8 kernel explicitly.
            pallas_decode = pallas_ok and c.attn_impl == "pallas"
        else:
            pallas_decode = pallas_ok and (
                c.attn_impl == "pallas"
                or (c.attn_impl == "mixed" and not c.quantized and S >= 512))
        pallas_prefill = c.attn_impl in ("pallas", "mixed") and pallas_ok
        scale = D ** -0.5
        if S > 0:                      # decode/prefill path: write into cache
            # cache is head-major (L, B, Hkv, S, D): attention reads it with
            # zero transposes; the per-step write transposes only the new
            # (B, T, Hkv, D) token slice (tiny). cache_pos is a SCALAR slot
            # shared by all rows (ring addressing for continuous batching —
            # see the note above); write_gate masks rows that must keep
            # their old sliver.

            def cache_write(buf, new):
                """buf (L, B, Hkv, S[, D]); new (B, Hkv, T[, D])."""
                start = (layer_idx, 0, 0, cache_pos, 0)[:buf.ndim]
                upd = new[None].astype(buf.dtype)
                if write_gate is not None:
                    old = jax.lax.dynamic_slice(
                        buf, start, upd.shape)            # sliver-sized read
                    sel = write_gate.reshape(
                        (1, -1) + (1,) * (buf.ndim - 2))
                    upd = jnp.where(sel, upd, old)
                return jax.lax.dynamic_update_slice(buf, upd, start)

            k_hs = jnp.moveaxis(k, 2, 1)               # (B, Hkv, T, D)
            v_hs = jnp.moveaxis(v, 2, 1)
            cache = dict(cache)
            if kv8:
                k_w, k_sw = quantize_kv(k_hs)
                v_w, v_sw = quantize_kv(v_hs)
                cache["k"] = cache_write(cache["k"], k_w)
                cache["v"] = cache_write(cache["v"], v_w)
                cache["k_s"] = cache_write(cache["k_s"], k_sw)
                cache["v_s"] = cache_write(cache["v_s"], v_sw)
            else:
                cache["k"] = cache_write(cache["k"], k_hs)
                cache["v"] = cache_write(cache["v"], v_hs)
            if c.ablate_attention:
                # bench-only stub (core/config.py ablate_attention): keeps
                # the projections + cache writes alive, drops all reads
                attn = q
            elif pallas_prefill and T > 1:
                # prefill: queries only see keys < T, i.e. the current k/v
                # (with kv8 the prefill attends over the EXACT bf16 k/v; only
                # later decode steps read the quantized slots)
                attn = flash_prefill(q, k, v, mask[:, T - 1, :T], scale,
                                     interpret=c.pallas_interpret)
            else:
                def layer_slice(arr, Sp=S, with_d=True):
                    shape = (1, B, Hkv, Sp, D) if with_d else (1, B, Hkv, Sp)
                    start = (layer_idx, 0, 0, 0, 0)[:len(shape)]
                    return jax.lax.dynamic_slice(arr, start, shape)[0]

                def xla_attend(Sp):
                    """Dense attention over the first Sp cache slots (all
                    valid keys live there on the sequential decode path)."""
                    m = mask[:, :, :Sp]
                    if kv8:
                        # XLA fuses the dequant into its attention reads, so
                        # only int8 bytes stream from HBM
                        k_all = (layer_slice(cache["k"], Sp).astype(dtype) *
                                 layer_slice(cache["k_s"], Sp,
                                             with_d=False)[..., None].astype(dtype))
                        v_all = (layer_slice(cache["v"], Sp).astype(dtype) *
                                 layer_slice(cache["v_s"], Sp,
                                             with_d=False)[..., None].astype(dtype))
                        return gqa_attention_hs(q, k_all, v_all, m, scale)
                    return gqa_attention_hs(q,
                                            layer_slice(cache["k"],
                                                        Sp).astype(dtype),
                                            layer_slice(cache["v"],
                                                        Sp).astype(dtype),
                                            m, scale)

                lb = c.decode_len_bucket
                if lb == -1:
                    # auto: ~S/16 rounded up to a 128 multiple — at most 16
                    # switch branches so multi-thousand-slot long-form
                    # buffers don't explode compile time, floor 128 keeps
                    # the prefix MXU/lane-aligned. Measured v5e, bench
                    # serving config (320-slot buffer, w8a16): 261.5 vs
                    # 228.5 steps/s for the full-buffer read.
                    lb = max(128, (-(-S // 16) + 127) // 128 * 128)
                # length-aware decode: switch over static prefix sizes so
                # each step streams only ~the written cache slots from HBM,
                # not the whole static buffer. Sequential slot addressing
                # only (extent = cache_pos + 1). Extending it to the
                # ring-addressed pool (pre-wrap extent = write slot + 1) is
                # a MEASURED DEAD END on v5e: the switch over cache
                # prefixes inside the write-gated ring body defeats XLA's
                # in-place aliasing of the carried cache — pooled decode
                # cratered to 34.7 steps/s vs 220.4 with full-buffer reads
                # (serving geometry, int8 weights, bf16 KV). Don't revisit
                # without checking the pool segment's per-step cache-copy
                # behavior first.
                if T == 1 and read_extent is not None and pallas_ok:
                    # length-aware via the EXTENT-CLAMPED pallas kernels:
                    # out-of-extent key blocks are DMA-elided (index map
                    # repeats the last valid block) and compute-skipped, so
                    # per-step traffic scales with written slots. Two
                    # callers opt in by passing read_extent: the ring-
                    # addressed pool (per-row extents; crucially the cache
                    # stays ONE full-size operand — the lax.switch-over-
                    # prefixes formulation there defeats XLA's in-place
                    # aliasing of the carried cache, 34.7 vs 220.4 steps/s,
                    # see note above) and the sequential engine under
                    # cfg.decode_extent_kernel (scalar cache_pos + 1).
                    # the FULL (L, ...) cache stacks go into the kernel with
                    # layer_idx as a scalar-prefetched block index: a
                    # dynamic_slice feeding a custom call must MATERIALIZE
                    # its output (XLA fuses slices into its own fusions,
                    # never into an opaque kernel) — at the 2112-slot pool
                    # that was 28 layers x ~69 MB of per-step slice traffic,
                    # the dominant cost (HLO-verified; see
                    # ops/pallas_attention.flash_decode_hs docstring)
                    if kv8:
                        attn = flash_decode_int8_hs(
                            q, cache["k"], cache["k_s"],
                            cache["v"], cache["v_s"],
                            mask[:, 0], scale, extent=read_extent,
                            layer=layer_idx, block_k=c.decode_block_k,
                            interpret=c.pallas_interpret)
                    else:
                        attn = flash_decode_hs(
                            q, cache["k"], cache["v"],
                            mask[:, 0], scale, extent=read_extent,
                            layer=layer_idx, block_k=c.decode_block_k,
                            interpret=c.pallas_interpret)
                elif (T == 1 and not pallas_decode and lb and lb < S
                        and write_gate is None):
                    sizes = []
                    e = lb
                    while e < S:
                        sizes.append(e)
                        e += lb
                    sizes.append(S)
                    idx = jnp.clip(jnp.asarray(cache_pos, jnp.int32) // lb,
                                   0, len(sizes) - 1)
                    attn = jax.lax.switch(
                        idx, [lambda Sp=Sp: xla_attend(Sp) for Sp in sizes])
                elif kv8 and pallas_decode and T == 1:
                    # layered: full cache stacks, no materialized slice —
                    # see the read_extent branch above
                    attn = flash_decode_int8_hs(
                        q, cache["k"], cache["k_s"],
                        cache["v"], cache["v_s"],
                        mask[:, 0], scale, layer=layer_idx,
                        block_k=c.decode_block_k,
                        interpret=c.pallas_interpret)
                elif pallas_decode and T == 1:
                    # mask (B, 1, S): causal+validity collapses to a key mask
                    attn = flash_decode_hs(
                        q, cache["k"], cache["v"],
                        mask[:, 0], scale, layer=layer_idx,
                        block_k=c.decode_block_k,
                        interpret=c.pallas_interpret)
                else:
                    attn = xla_attend(S)
        else:                          # training path: attend over current tokens
            attn = gqa_attention(q, k, v, mask, scale)
        attn = attn.reshape(B, T, H * D)
        # HF Qwen3 applies attention_bias to o_proj as well as q/k/v
        x = x + dense(c.hidden_size, "o_proj", c.attention_bias)(attn)

        h = RMSNorm(c.hidden_size, c.rms_norm_eps, name="post_ln",
                    ablate=c.ablate_norms)(x)
        gate = dense(c.intermediate_size, "gate_proj")(h)
        up = dense(c.intermediate_size, "up_proj")(h)
        down = dense(c.hidden_size, "down_proj")(jax.nn.silu(gate) * up)
        return x + down, cache


class _ScanBlock(nn.Module):
    cfg: LMConfig

    @nn.compact
    def __call__(self, carry, cos, sin, mask, write_gate, read_extent,
                 adapters, adapter_ids):
        x, cache, layer_idx, cache_pos = carry
        x, cache = Qwen3Block(self.cfg, name="block")(
            x, cache, layer_idx, cos, sin, mask, cache_pos, write_gate,
            read_extent, adapters, adapter_ids)
        return (x, cache, layer_idx + 1, cache_pos), None


class AsteroidLM(nn.Module):
    """8-channel LM. Channel 0 = text+speech vocab; channels 1-7 = speech-only."""

    cfg: LMConfig

    def setup(self):
        c = self.cfg
        emb_init = nn.initializers.normal(stddev=0.02)
        if c.quantized:
            int8_init = lambda k, s: jax.random.randint(k, s, -127, 128, jnp.int8)
            self.embed_text_q = self.param(
                "embed_text_q", int8_init, (c.vocab_size, c.hidden_size))
            self.embed_text_s = self.param(
                "embed_text_s", nn.initializers.ones, (c.vocab_size, 1))
            self.embed_speech_q = self.param(
                "embed_speech_q", int8_init,
                (c.channels - 1, c.speech_vocab_size, c.hidden_size))
            self.embed_speech_s = self.param(
                "embed_speech_s", nn.initializers.ones,
                (c.channels - 1, c.speech_vocab_size, 1))
        else:
            self.embed_text = self.param("embed_text", emb_init,
                                         (c.vocab_size, c.hidden_size))
            # channels 1..C-1 stacked: (C-1, speech_vocab, hidden)
            self.embed_speech = self.param(
                "embed_speech", emb_init,
                (c.channels - 1, c.speech_vocab_size, c.hidden_size))
        block = _ScanBlock
        if c.remat_layers:
            block = nn.remat(
                _ScanBlock, prevent_cse=False,
                policy=jax.checkpoint_policies.nothing_saveable)
        self.blocks = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            # adapters (multi-LoRA stacks) are per-layer xs: each leaf is
            # (L, N, ...) and the scan hands layer l its (N, ...) slice
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast, 0, nn.broadcast),
            out_axes=0,
            length=c.num_hidden_layers,
        )(c, name="layers")
        self.final_norm = RMSNorm(c.hidden_size, c.rms_norm_eps,
                                  name="final_norm", ablate=c.ablate_norms)

    # -- embeddings (reference _prepare_multi_modal_inputs, :235-250) -------

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids (B, T, C) -> summed embeddings (B, T, hidden)."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        if c.quantized:
            # gather int8 rows + per-row scales; dequant on the gathered
            # slice only (B*T rows, not the whole table)
            x = (jnp.take(self.embed_text_q, input_ids[..., 0], axis=0,
                          mode="clip").astype(dtype) *
                 jnp.take(self.embed_text_s, input_ids[..., 0], axis=0,
                          mode="clip").astype(dtype))
            for i in range(1, c.channels):
                x = x + (jnp.take(self.embed_speech_q[i - 1], input_ids[..., i],
                                  axis=0, mode="clip").astype(dtype) *
                         jnp.take(self.embed_speech_s[i - 1], input_ids[..., i],
                                  axis=0, mode="clip").astype(dtype))
            return x
        x = jnp.take(self.embed_text, input_ids[..., 0], axis=0, mode="clip")
        for i in range(1, c.channels):
            x = x + jnp.take(self.embed_speech[i - 1], input_ids[..., i],
                             axis=0, mode="clip")
        return x.astype(dtype)

    # -- backbone ------------------------------------------------------------

    def backbone(self, input_ids: jnp.ndarray, positions: jnp.ndarray,
                 key_valid: Optional[jnp.ndarray], cache: Optional[dict],
                 cache_pos, write_gate: Optional[jnp.ndarray] = None,
                 read_extent=None, adapters: Optional[dict] = None,
                 adapter_ids: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[dict]]:
        """Run the decoder stack.

        input_ids: (B, T, C); positions: (B, T) absolute positions (RoPE);
        key_valid: (B, S) cache-slot validity (left-padding + unwritten slots)
                   or (B, T) for the cache-free path;
        cache: {"k","v": (L, B, Hkv, S, D)} or None (training);
        cache_pos: SCALAR write slot of this segment in the cache;
        write_gate: optional (B,) bool — ring-addressed decode (continuous
                   batching): every row writes the same scalar slot; gated-off
                   rows keep their old sliver, and causality/ordering is
                   carried entirely by key_valid (slot index != time order),
                   so the attention mask is the validity mask alone.
        adapters: optional multi-LoRA stacks {target: (a (L, N, in, r),
                   b (L, N, r, out))} — the per-adapter scale is folded
                   into b (see Qwen3Block); adapter_ids (B,) int32 selects
                   each row's adapter (0 = base).
        Returns (hidden (B, T, hidden), new_cache).
        """
        c = self.cfg
        x = self.embed(input_ids)
        B, T, _ = x.shape
        cos, sin = rope_cos_sin(positions, c.head_dim, c.rope_theta)

        if cache is None:
            S = T
            empty = jnp.zeros((c.num_hidden_layers, B, c.num_key_value_heads,
                               0, c.head_dim), x.dtype)
            cache_in = {"k": empty, "v": empty}
            mask = causal_mask(0, T, S, key_valid)
        else:
            S = cache["k"].shape[3]
            cache_in = cache
            if write_gate is not None:
                assert T == 1, "ring-addressed writes are decode-only"
                mask = jnp.broadcast_to(key_valid[:, None, :], (B, 1, S))
            else:
                mask = causal_mask(cache_pos, T, S, key_valid)

        carry = (x, cache_in, jnp.int32(0), jnp.asarray(cache_pos, jnp.int32))
        (x, new_cache, _, _), _ = self.blocks(carry, cos, sin, mask,
                                              write_gate, read_extent,
                                              adapters or {}, adapter_ids)
        x = self.final_norm(x)
        return x, (None if cache is None else new_cache)

    # -- heads (tied to embeddings; reference modeling_asteroid.py:315-317) --

    def logits_all(self, hidden: jnp.ndarray,
                   restricted: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """hidden (..., hidden) -> (text_logits (..., vocab),
        speech_logits (..., C-1, speech_vocab)). fp32 outputs.

        Matmuls run in the params' native dtype (bf16 on the inference path)
        with fp32 MXU accumulation — no fp32 weight materialization per step.
        Under int8 quantization the per-row scales apply on the OUTPUT side
        (logit v scales by s[v]), so HBM streams only the int8 table.

        restricted=True computes the text logits only over the
        cfg.text_head_window() rows (restricted_text_head decode policy):
        the static row slice keeps the weight stream at ~window/vocab of the
        full table — text_logits then has window width and index i means
        vocab id lo + i.
        """
        c = self.cfg
        lo, hi = c.text_head_window() if restricted else (0, c.vocab_size)
        if c.quantized:
            dtype = jnp.dtype(c.dtype)
            h = hidden.astype(dtype)
            t = jnp.einsum("...d,vd->...v", h,
                           self.embed_text_q[lo:hi].astype(dtype),
                           preferred_element_type=jnp.float32)
            t = t * self.embed_text_s[lo:hi, 0].astype(jnp.float32)
            s = jnp.einsum("...d,cvd->...cv", h,
                           self.embed_speech_q.astype(dtype),
                           preferred_element_type=jnp.float32)
            s = s * self.embed_speech_s[..., 0].astype(jnp.float32)
            return t, s
        h = hidden.astype(self.embed_text.dtype)
        t = jnp.einsum("...d,vd->...v", h, self.embed_text[lo:hi],
                       preferred_element_type=jnp.float32)
        s = jnp.einsum("...d,cvd->...cv", h, self.embed_speech,
                       preferred_element_type=jnp.float32)
        return t, s

    def text_logits_outside_max(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Max channel-0 logit OUTSIDE the restricted-head window
        (cfg.text_head_window) — the restricted-head audit probe
        (cfg.restricted_audit_every): one full-table head stream that
        answers "would the full head have preferred an ordinary text token
        here?". hidden (B, 1, H) -> (B,) fp32."""
        c = self.cfg
        lo, hi = c.text_head_window()
        if c.quantized:
            dtype = jnp.dtype(c.dtype)
            h = hidden.astype(dtype)
            t = jnp.einsum("...d,vd->...v", h, self.embed_text_q.astype(dtype),
                           preferred_element_type=jnp.float32)
            t = t * self.embed_text_s[:, 0].astype(jnp.float32)
        else:
            h = hidden.astype(self.embed_text.dtype)
            t = jnp.einsum("...d,vd->...v", h, self.embed_text,
                           preferred_element_type=jnp.float32)
        v = jnp.arange(c.vocab_size)
        outside = (v < lo) | (v >= hi)
        t = jnp.where(outside, t, jnp.float32(-jnp.inf))
        return jnp.max(t[:, 0], axis=-1)

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        """Training/eval forward without cache: full logits.

        attention_mask: (B, T) validity (1 = real token). Positions follow the
        HF convention for left-padded batches: cumsum(mask) - 1, clipped at 0.
        """
        B, T, _ = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, T), jnp.int32)
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
        hidden, _ = self.backbone(input_ids, positions,
                                  attention_mask.astype(bool), None, 0)
        return self.logits_all(hidden)


def init_cache(cfg: LMConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
    """Static KV cache, head-major (L, B, Hkv, S, D) so decode attention and
    the Pallas kernels read it directly with no per-step transpose.

    With cfg.kv_quant == "int8" the cache stores int8 values plus
    per-head-per-token fp32 scales (L, B, Hkv, S) — half the HBM bytes of a
    bf16 cache."""
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len,
             cfg.head_dim)
    if cfg.kv_quant == "int8":
        sshape = shape[:-1]
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_s": jnp.zeros(sshape, jnp.float32),
                "v_s": jnp.zeros(sshape, jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
