"""Serving-memory estimator.

The reference publishes a VRAM-vs-generated-length table (reference
README.md:146-161: y = 0.00172 GB/s + 5.88 GB at batch 1 bf16). This utility
computes the equivalent HBM budget for this framework's static-shape engine,
so deployments can pick bucket sizes before compiling.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..core.config import LMConfig

FRAME_RATE = 12.5       # codec frames (LM steps) per second of audio


@dataclass
class MemoryEstimate:
    weights_gb: float
    kv_cache_gb: float
    buffers_gb: float

    @property
    def total_gb(self) -> float:
        return self.weights_gb + self.kv_cache_gb + self.buffers_gb


def lm_param_count(cfg: LMConfig) -> int:
    H, D = cfg.num_attention_heads, cfg.head_dim
    Hkv = cfg.num_key_value_heads
    h, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    per_layer = h * (H * D) + 2 * h * (Hkv * D) + (H * D) * h + 3 * h * f \
        + 2 * h + 2 * D
    embeds = cfg.vocab_size * h + (cfg.channels - 1) * cfg.speech_vocab_size * h
    return L * per_layer + embeds + h


def serving_memory(cfg: LMConfig, batch: int, max_audio_seconds: float,
                   prompt_len: int = 64, quant: str | None = None,
                   cache_bytes: int = 2) -> MemoryEstimate:
    """HBM estimate for one decode engine instance.

    quant="int8" stores projection/embedding weights int8 (+fp32 per-channel
    scales, ~1%); cache_bytes=2 for the bf16 KV cache.
    """
    params = lm_param_count(cfg)
    wbytes = params * (1.01 if quant == "int8" else 2.0)
    S = prompt_len + int(max_audio_seconds * FRAME_RATE) + cfg.channels
    kv = (cfg.num_hidden_layers * batch * cfg.num_key_value_heads * S
          * cfg.head_dim * 2 * cache_bytes)
    # token buffer + presence masks + logits workspace (fp32 text vocab row)
    buffers = batch * S * cfg.channels * 4 \
        + batch * cfg.vocab_size * (1 + 4) \
        + batch * (cfg.channels - 1) * cfg.speech_vocab_size
    return MemoryEstimate(weights_gb=wbytes / 1e9, kv_cache_gb=kv / 1e9,
                          buffers_gb=buffers / 1e9)
