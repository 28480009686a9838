"""moss_ttsd_tpu — a TPU-native (JAX / XLA / Pallas / pjit) spoken-dialogue TTS framework.

Re-implements the capabilities of MOSS-TTSD (reference: zsc/MOSS-TTSD) from scratch
with a TPU-first architecture:

  * ``models.lm``      — 8-channel Qwen3-style autoregressive decoder (AsteroidTTS
                         equivalent; reference modeling_asteroid.py).
  * ``models.codec``   — XY_Tokenizer-equivalent semantic+acoustic RVQ codec
                         (reference XY_Tokenizer/xy_tokenizer/).
  * ``decode``         — fully jitted lax.while_loop AR generation engine with a
                         static-shape KV cache (replaces the reference's Python
                         HF GenerationMixin loop, modeling_asteroid.py:52-197).
  * ``ops``            — TPU DSP + Pallas kernels: mel frontend, STFT/ISTFT
                         overlap-add, resampling, flash attention, chunked CE.
  * ``parallel``       — mesh/sharding utilities (GSPMD over jax.sharding.Mesh).
  * ``pipeline``       — JSONL parsing, text normalization, prompt assembly,
                         delay-pattern shift/unshift (reference generation_utils.py).
  * ``train``          — pjit train step, data preprocessing, LoRA
                         (reference finetune/).
  * ``serve``          — gradio UI, batch API client, podcast pipeline.
"""

__version__ = "0.1.0"
