"""Pallas TPU flash-attention kernels for the LLM path.

Replaces the reference's flash-attn-2 CUDA kernels (reference inference.py:29,
generation_utils.py:18) with TPU-native blockwise attention:

  * ``flash_prefill`` — causal GQA attention over the full prompt: online
    softmax over key blocks, causal blocks skipped, key-validity mask for
    left-padded batches.
  * ``flash_decode``  — single-query attention against the static KV cache:
    grid iterates key blocks sequentially per (batch, kv-head), accumulating
    (max, denom, numerator) in VMEM scratch; all G grouped q-heads share one
    k/v block read.

Both kernels compute softmax in fp32 and return q.dtype. ``interpret=True``
paths make them testable on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Decode: q_len == 1 against a (B, S, Hkv, D) cache
# ---------------------------------------------------------------------------

def _decode_kernel(ext_ref, lay_ref, q_ref, k_ref, v_ref, valid_ref, o_ref,
                   m_ref, l_ref, acc_ref,
                   *, scale: float, seq_len: int, block_k: int):
    # grid (B, n_s): ALL Hkv heads of one batch row per cell (batched dot
    # over the head axis). Folding heads into the block cuts the grid from
    # B*Hkv*n_s to B*n_s cells — decisive because per-cell overhead, not
    # DMA, dominates this kernel at decode shapes: measured (v5e, S=2112,
    # bk=512, B=8, Hkv=8) 551 us/call with the (B, Hkv, n_s) grid vs an
    # ~86 us k+v DMA roof, and extent clamping only moved 551->459 us
    # because skipped cells still pay the grid tax.
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # extent clamp (per batch row): key blocks at/past the row's valid
    # extent were mapped to a repeated block by the index map (their DMA is
    # elided) and contribute nothing — skip their compute entirely
    @pl.when(s * block_k < ext_ref[b])
    def _():
        # dots run in the INPUT dtype with fp32 MXU accumulation: bf16
        # operands use the MXU's native bf16 passes, while a .astype(f32)
        # here decomposes every dot into multiple fp32 passes (several x
        # slower) for precision the softmax doesn't need. CPU parity tests
        # feed fp32 and stay exact.
        q = q_ref[0]                                   # (Hkv, G, D)
        # layered caches carry a leading (1,) layer block dim — collapse it.
        # The in-kernel astype is a no-op when cache and compute dtypes
        # match (the serving configs); it exists so a full-size cache never
        # needs an XLA-level convert (which would materialize).
        k = k_ref[...].reshape(k_ref.shape[-3:]).astype(q.dtype)
        v = v_ref[...].reshape(v_ref.shape[-3:]).astype(q.dtype)
        valid = valid_ref[0, 0]                        # (Bk,) int32

        scores = jax.lax.dot_general(                  # (Hkv, G, Bk) f32
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        kpos = s * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      (1, block_k), 1)
        ok = (valid[None, :] != 0) & (kpos < seq_len)   # ragged final block
        scores = jnp.where(ok[None], scores, NEG_INF)

        m_prev = m_ref[:]                              # (Hkv, G, 1)
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                    # (Hkv, G, Bk) f32
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (Hkv, G, D)
        m_ref[:] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def flash_decode(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 key_valid: jnp.ndarray, scale: float,
                 block_k: int = 512, interpret: bool = False) -> jnp.ndarray:
    """q (B, 1, H, D); k/v cache (B, S, Hkv, D); key_valid (B, S) bool.

    Returns (B, 1, H, D). Convenience wrapper that transposes to the
    head-major layout; prefer ``flash_decode_hs`` with caches already stored
    head-major (no copy)."""
    kt = jnp.moveaxis(k, 2, 1)                         # (B, Hkv, S, D)
    vt = jnp.moveaxis(v, 2, 1)
    return flash_decode_hs(q, kt, vt, key_valid, scale, block_k, interpret)


def _decode_specs(q, key_valid, Hkv, S, bk, extent, layer):
    """Shared plumbing for the single-query decode wrappers (bf16 + int8).

    Normalizes the scalar-prefetch operands (per-row extent vector, layer
    index) and builds the extent-clamped index maps and block specs — the
    clamp logic (`last = max((ext-1)//bk, 0); blk = min(s, last)`) must stay
    identical between the two serving paths, so it lives here once. See
    flash_decode_hs for the extent/layer contract. Returns
    (qg, validi, ext, lay, q_spec, kv_spec, sc_spec, valid_spec, scratch).
    """
    B, _, H, D = q.shape
    G = H // Hkv
    layered = layer is not None
    qg = q[:, 0].reshape(B, Hkv, G, D)                 # (B, Hkv, G, D)
    # (B, 1, S): TPU block shapes need the 2nd-to-last dim to equal the array's
    validi = key_valid.astype(jnp.int32)[:, None, :]
    ext = jnp.full((B,), S, jnp.int32) if extent is None else \
        jnp.broadcast_to(jnp.asarray(extent, jnp.int32).reshape(-1), (B,))
    lay = jnp.asarray(0 if layer is None else layer, jnp.int32).reshape(1)

    def _blk(b, s, ext_ref):
        # out-of-extent key blocks repeat the last in-extent block index:
        # Mosaic skips the DMA when an operand's block index is unchanged
        # from the previous grid step, and the kernel skips their compute
        last = jnp.maximum((ext_ref[b] - 1) // bk, 0)
        return jnp.minimum(s, last)

    def q_map(b, s, ext_ref, lay_ref):
        return (b, 0, 0, 0)

    def kv_map(b, s, ext_ref, lay_ref):
        blk = _blk(b, s, ext_ref)
        return (lay_ref[0], b, 0, blk, 0) if layered else (b, 0, blk, 0)

    def sc_map(b, s, ext_ref, lay_ref):
        blk = _blk(b, s, ext_ref)
        return (lay_ref[0], b, 0, blk) if layered else (b, 0, blk)

    def valid_map(b, s, ext_ref, lay_ref):
        return (b, 0, _blk(b, s, ext_ref))

    kv_block = (1, 1, Hkv, bk, D) if layered else (1, Hkv, bk, D)
    sc_block = (1, 1, Hkv, bk) if layered else (1, Hkv, bk)
    scratch = [pltpu.VMEM((Hkv, G, 1), jnp.float32),
               pltpu.VMEM((Hkv, G, 1), jnp.float32),
               pltpu.VMEM((Hkv, G, D), jnp.float32)]
    return (qg, validi, ext, lay,
            pl.BlockSpec((1, Hkv, G, D), q_map),
            pl.BlockSpec(kv_block, kv_map),
            pl.BlockSpec(sc_block, sc_map),
            pl.BlockSpec((1, 1, bk), valid_map), scratch)


def flash_decode_hs(q: jnp.ndarray, kt: jnp.ndarray, vt: jnp.ndarray,
                    key_valid: jnp.ndarray, scale: float,
                    block_k: int = 512, interpret: bool = False,
                    extent=None, layer=None) -> jnp.ndarray:
    """q (B, 1, H, D); kt/vt cache (B, Hkv, S, D) — head-major storage read
    directly from HBM, no transpose; key_valid (B, S) bool.

    ``extent`` (optional traced int32, scalar or per-row (B,) vector): upper
    bound on the number of leading cache slots that can hold valid keys for
    the/each row (every slot >= extent MUST be key_valid=False for that
    row). Key blocks past the extent are clamped to a repeated block index —
    Mosaic's pipeline emitter skips the DMA when an operand's block index is
    unchanged from the previous grid step — and their compute is skipped, so
    per-step HBM traffic scales with the written extent, not the static
    buffer size. A per-row vector lets a freshly joined pool row stream only
    ITS OWN short history even while an old row's span covers the whole
    ring. Unlike a lax.switch over static cache prefixes, the cache stays
    ONE full-size operand, which keeps XLA's in-place aliasing of a carried
    cache intact (the switch formulation is a measured dead end in the
    ring-addressed continuous pool, models/lm.py).

    ``layer`` (optional traced int32 scalar): kt/vt are the FULL per-layer
    stack (L, B, Hkv, S, D) and the kernel DMAs blocks of layer ``layer``
    straight from HBM via a scalar-prefetched index. This is the load-
    bearing option inside a scan-over-layers: a dynamic_slice feeding a
    custom call must MATERIALIZE its output (XLA fuses slices into its own
    ops, never into an opaque kernel) — measured 28x ~69 MB of slice
    traffic per decode step at the 2112-slot pool, the dominant cost.

    Returns (B, 1, H, D)."""
    B, _, H, D = q.shape
    Hkv, S = kt.shape[-3], kt.shape[-2]
    G = H // Hkv
    bk = min(block_k, S)
    n_s = -(-S // bk)                                   # ceil; ragged tail masked

    (qg, validi, ext, lay, q_spec, kv_spec, _,
     valid_spec, scratch) = _decode_specs(q, key_valid, Hkv, S, bk,
                                          extent, layer)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, seq_len=S, block_k=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_s),
            in_specs=[q_spec, kv_spec, kv_spec, valid_spec],
            out_specs=q_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(ext, lay, qg, kt, vt, validi)
    return out.reshape(B, 1, H, D)


# ---------------------------------------------------------------------------
# Decode against an INT8 KV cache (per-head-per-token scales): the cache is
# the dominant HBM stream at long S — storing it int8 and dequantizing inside
# the kernel halves that traffic (the weights are already int8 via w8a16)
# ---------------------------------------------------------------------------

def _decode_int8_kernel(ext_ref, lay_ref, q_ref, kq_ref, ks_ref, vq_ref,
                        vs_ref, valid_ref, o_ref, m_ref, l_ref, acc_ref,
                        *, scale: float, seq_len: int, block_k: int):
    # grid (B, n_s), all Hkv heads per cell — see _decode_kernel for why
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # extent clamp — see _decode_kernel
    @pl.when(s * block_k < ext_ref[b])
    def _():
        # dots run in q's dtype (bf16 on TPU — native MXU passes; int8
        # values up to 127 cast to bf16 exactly, 8 significant bits). CPU
        # parity tests feed fp32 q and stay exact. See _decode_kernel.
        q = q_ref[0]                                   # (Hkv, G, D)
        # layered caches carry a leading (1,) layer block dim — collapse it
        kq = kq_ref[...].reshape(kq_ref.shape[-3:])    # (Hkv, Bk, D) int8
        vq = vq_ref[...].reshape(vq_ref.shape[-3:])    # (Hkv, Bk, D) int8
        ks = ks_ref[...].reshape(ks_ref.shape[-2:]).astype(jnp.float32)
        vs = vs_ref[...].reshape(vs_ref.shape[-2:]).astype(jnp.float32)
        valid = valid_ref[0, 0]                        # (Bk,) int32

        # dequant folded around the dots: k's per-token scale applies to the
        # score column, v's to the probability row — the int8 tensors go
        # straight from HBM into VMEM and only tiny (Hkv, Bk) scale rows
        # ride along
        scores = jax.lax.dot_general(                  # (Hkv, G, Bk) f32
            q, kq.astype(q.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        scores = scores * (ks[:, None, :] * scale)
        kpos = s * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      (1, block_k), 1)
        ok = (valid[None, :] != 0) & (kpos < seq_len)
        scores = jnp.where(ok[None], scores, NEG_INF)

        m_prev = m_ref[:]                              # (Hkv, G, 1)
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                    # (Hkv, G, Bk) f32
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vs[:, None, :]).astype(q.dtype)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv, vq.astype(q.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (Hkv, G, D)
        m_ref[:] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def flash_decode_int8_hs(q: jnp.ndarray, kq: jnp.ndarray, ks: jnp.ndarray,
                         vq: jnp.ndarray, vs: jnp.ndarray,
                         key_valid: jnp.ndarray, scale: float,
                         block_k: int = 512,
                         interpret: bool = False,
                         extent=None, layer=None) -> jnp.ndarray:
    """Single-query decode attention over an int8 KV cache.

    q (B, 1, H, D); kq/vq (B, Hkv, S, D) int8; ks/vs (B, Hkv, S) fp32
    per-head-per-token scales (k ≈ kq * ks[..., None]); key_valid (B, S).
    ``extent``: optional traced int32 (scalar or per-row (B,) vector)
    bounding the valid leading slots — see flash_decode_hs (out-of-extent
    key blocks cost neither DMA nor compute). ``layer``: optional traced
    int32 — kq/ks/vq/vs are the FULL (L, ...) per-layer stacks and the
    kernel indexes the layer via a scalar-prefetched block index, avoiding
    the materialized dynamic_slice a custom call otherwise forces (see
    flash_decode_hs). Returns (B, 1, H, D) in q.dtype. Exact vs the XLA
    dequant-then-attend path up to fp32 accumulation order
    (tests/test_pallas_attention.py).
    """
    B, _, H, D = q.shape
    Hkv, S = kq.shape[-3], kq.shape[-2]
    G = H // Hkv
    bk = min(block_k, S)
    n_s = -(-S // bk)

    (qg, validi, ext, lay, q_spec, kv_spec, sc_spec,
     valid_spec, scratch) = _decode_specs(q, key_valid, Hkv, S, bk,
                                          extent, layer)
    out = pl.pallas_call(
        functools.partial(_decode_int8_kernel, scale=scale, seq_len=S,
                          block_k=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_s),
            in_specs=[q_spec, kv_spec, sc_spec, kv_spec, sc_spec, valid_spec],
            out_specs=q_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(ext, lay, qg, kq, ks, vq, vs, validi)
    return out.reshape(B, 1, H, D)


def quantize_kv(x: jnp.ndarray):
    """Per-head-per-token int8 quantization of k/v slices.

    x (..., D) -> (x_q int8 (..., D), scales fp32 (...,)) with
    x ≈ x_q * scales[..., None]."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-8)
    # round-half-up via floor(x+0.5): jnp.round lowers through a closed_call
    # that the axon TPU backend fails to cache inside scan/while bodies
    q = jnp.clip(jnp.floor(xf / s[..., None] + 0.5), -127, 127).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# Prefill: causal blockwise attention
# ---------------------------------------------------------------------------

def _prefill_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, m_ref, l_ref, acc_ref,
                    *, scale: float, block_q: int, block_k: int):
    i = pl.program_id(2)       # q block
    s = pl.program_id(3)       # k block
    n_s = pl.num_programs(3)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal block skip: key block strictly after the q block contributes nothing
    @pl.when(s * block_k <= i * block_q + block_q - 1)
    def _():
        # dots run in the INPUT dtype with fp32 MXU accumulation (same
        # rationale as the decode kernels): bf16 operands use the MXU's
        # native bf16 passes, where an .astype(f32) decomposes each dot
        # into multiple fp32 passes. fp32 parity inputs are unchanged.
        q = q_ref[0, 0]                                # (Bq, D)
        k = k_ref[0, 0]                                # (Bk, D)
        v = v_ref[0, 0]
        valid = valid_ref[0, 0]                        # (Bk,)

        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        qpos = i * block_q + jax.lax.broadcasted_iota(jnp.int32,
                                                      (block_q, block_k), 0)
        kpos = s * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      (block_q, block_k), 1)
        mask = (kpos <= qpos) & (valid[None, :] != 0)
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[:]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def flash_prefill(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  key_valid: jnp.ndarray, scale: float,
                  block_q: int = 256, block_k: int = 256,
                  interpret: bool = False) -> jnp.ndarray:
    """Causal GQA prefill attention.

    q (B, T, H, D); k/v (B, T, Hkv, D) (same T — prefill writes cache slots
    [0, T)); key_valid (B, T). Returns (B, T, H, D)."""
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    bq = min(block_q, T)
    bk = min(block_k, T)
    if T % bq or T % bk:
        # pad to a length both block sizes divide (lcm, not max — padding to
        # max(bq, bk) alone never terminates when the smaller block does not
        # divide it, e.g. bq=192, bk=256)
        pad_to = math.lcm(bq, bk)
        Tp = -(-T // pad_to) * pad_to
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        key_valid = jnp.pad(key_valid, ((0, 0), (0, Tp - T)))
        out = flash_prefill(q, k, v, key_valid, scale, bq, bk, interpret)
        return out[:, :T]

    qh = jnp.moveaxis(q, 2, 1)                          # (B, H, T, D)
    kt = jnp.moveaxis(k, 2, 1)                          # (B, Hkv, T, D)
    vt = jnp.moveaxis(v, 2, 1)
    validi = key_valid.astype(jnp.int32)[:, None, :]    # (B, 1, T)
    n_q = q.shape[1] // bq
    n_s = k.shape[1] // bk

    grid = (B, H, n_q, n_s)
    out = pl.pallas_call(
        functools.partial(_prefill_kernel, scale=scale, block_q=bq, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, s: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, s: (b, h // G, s, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, s: (b, h // G, s, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, h, i, s: (b, 0, s)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i, s: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kt, vt, validi)
    return jnp.moveaxis(out, 1, 2)                      # (B, T, H, D)
