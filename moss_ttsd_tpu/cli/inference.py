"""JSONL batch inference CLI.

Mirrors reference inference.py (flags: --jsonl --seed --output_dir
--summary_file --use_normalize --dtype) running the TPU-native pipeline.
``--tiny`` runs with tiny random-weight models (no checkpoint needed) for
smoke testing the full path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

MODEL_PATH = "fnlp/MOSS-TTSD-v0.5"
SPT_CONFIG_PATH = "XY_Tokenizer/config/xy_tokenizer_config.yaml"
SPT_CHECKPOINT_PATH = "XY_Tokenizer/weights/xy_tokenizer.ckpt"


def build_tiny_pipeline(seed: int = 0, bucket: int = 64, mesh=None,
                        restricted_text_head: bool = False,
                        attn_impl: str = None):
    """Random tiny LM + codec + mock tokenizer wired into the real pipeline."""
    import jax
    import jax.numpy as jnp
    from ..core.config import (ChannelSamplingConfig, CodecConfig, LMConfig,
                               SamplingConfig)
    from ..models.codec.model import XYTokenizer
    from ..models.lm import AsteroidLM
    from ..pipeline.batch import TTSPipeline
    from ..utils.mock_tokenizer import MockTokenizer

    tokenizer = MockTokenizer()
    # speech range dominates the tiny vocab so a random model emits speech
    lm_cfg = LMConfig(dtype="float32", param_dtype="float32").tiny(
        vocab_size=300, speech_vocab_size=65, speech_pad_token=64,
        speech_token_range=(0, 290), eos_token_id=290,
        pad_token_id=tokenizer.pad_token_id)
    model = AsteroidLM(lm_cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 4, lm_cfg.channels), jnp.int32))
    spt = XYTokenizer.init_random(CodecConfig().tiny(), seed=seed)
    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=True, temperature=1.0,
                                        top_k=30, top_p=0.95)
                  for _ in range(lm_cfg.channels)],
        max_new_tokens=64)
    pipe = TTSPipeline(tokenizer, lm_cfg, params, spt, sampling, bucket=bucket,
                       mesh=mesh,
                       restricted_text_head=restricted_text_head or None,
                       attn_impl=attn_impl)
    return pipe


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native MOSS-TTSD inference")
    parser.add_argument("--jsonl", default="examples/examples.jsonl")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--output_dir", default="outputs")
    parser.add_argument("--summary_file", default=None)
    parser.add_argument("--use_normalize", action="store_true", default=False)
    parser.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    parser.add_argument("--model_path", default=MODEL_PATH)
    parser.add_argument("--spt_config", default=SPT_CONFIG_PATH)
    parser.add_argument("--spt_ckpt", default=SPT_CHECKPOINT_PATH)
    parser.add_argument("--max_new_tokens", type=int, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="run with tiny random models (smoke test)")
    parser.add_argument("--platform", choices=["default", "cpu"], default="default",
                        help="force a JAX platform (cpu = 8 virtual devices)")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of the batch into this dir")
    parser.add_argument("--profiler_port", type=int, default=None,
                        help="start a live jax.profiler server on this port")
    parser.add_argument("--quant", choices=["int8"], default=None,
                        help="weight-only int8 serving (w8a16): ~1.5x faster decode")
    parser.add_argument("--attn_impl", choices=["mixed", "pallas", "xla"],
                        default=None,
                        help="attention backend (reference "
                             "--attn_implementation, inference.py:29-30): "
                             "mixed = pallas flash prefill + measured-best "
                             "decode policy (default), pallas = pallas "
                             "kernels everywhere, xla = einsum attention")
    parser.add_argument("--restricted_text_head", action="store_true",
                        help="channel-0 logits over the speech window only "
                             "(~+12%% decode; generation then stops only on "
                             "in-window non-speech ids: <|end_of_speech|> "
                             "plus the specials between the speech range "
                             "and eos — see LMConfig docs)")
    parser.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                        help="multi-chip (data, model) mesh, e.g. 4x2: batch "
                             "data-parallel over 4 chips, weights tensor-"
                             "parallel over 2 (XLA inserts ICI collectives)")
    parser.add_argument("--lora_adapter", action="append", default=[],
                        metavar="NAME=PATH",
                        help="register a LoRA voice; items select one with a "
                             "\"voice\" field. PATH is a lora_factors.npz "
                             "or a peft adapter directory. Repeatable")
    parser.add_argument("--adapter_alpha", type=float, default=32.0)
    args = parser.parse_args(argv)

    from ..utils.helpers import maybe_debug_attach
    maybe_debug_attach()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.output_dir, exist_ok=True)

    mesh = None
    if args.mesh:
        from ..parallel.mesh import parse_mesh_arg
        mesh = parse_mesh_arg(args.mesh)

    from ..utils.audio_io import write_wav
    if args.tiny:
        pipe = build_tiny_pipeline(seed=args.seed or 0, mesh=mesh,
                                   restricted_text_head=args.restricted_text_head,
                                   attn_impl=args.attn_impl)
    else:
        from ..pipeline.batch import TTSPipeline
        pipe = TTSPipeline.load(
            args.model_path, args.spt_config, args.spt_ckpt,
            quant=args.quant, mesh=mesh,
            codec_dtype="bfloat16" if args.dtype == "bf16" else None,
            restricted_text_head=args.restricted_text_head or None,
            attn_impl=args.attn_impl)

    from ..utils.convert_lora import parse_adapter_specs
    for name, (tree, alpha, rslora) in parse_adapter_specs(
            args.lora_adapter, args.adapter_alpha, parser.error).items():
        pipe.engine.register_adapter(name, tree, alpha=alpha,
                                     use_rslora=rslora)

    with open(args.jsonl) as f:
        items = [json.loads(line) for line in f if line.strip()]
    print(f"Loaded {len(items)} items from {args.jsonl}")
    # per-item LoRA voices: a "voice" field names a registered adapter
    voices = [it.get("voice") or None for it in items]
    adapter = voices if any(voices) else None

    from ..utils import profiling
    if args.profiler_port:
        profiling.start_profiler_server(args.profiler_port)
        print(f"jax.profiler server on :{args.profiler_port}")
    import contextlib
    prof = (profiling.trace(args.profile_dir) if args.profile_dir
            else contextlib.nullcontext())
    with prof:
        texts_data, audio_results = pipe.process_batch(
            items, use_normalize=args.use_normalize,
            max_new_tokens=args.max_new_tokens, seed=args.seed or 0,
            adapter=adapter)
    if args.profile_dir:
        print(f"Saved profiler trace to {args.profile_dir}")

    if args.summary_file:
        with open(args.summary_file, "w", encoding="utf-8") as f:
            for t in texts_data:
                f.write(json.dumps({
                    "text": t["original_text"],
                    "normalized_text": t["normalized_text"],
                    "final_text": t["final_text"],
                }, ensure_ascii=False) + "\n")
        print(f"Saved summary to {args.summary_file}")

    saved = 0
    for idx, res in enumerate(audio_results):
        if res is None:
            print(f"Skipping sample {idx} (no valid speech tokens)")
            continue
        out = os.path.join(args.output_dir, f"output_{idx}.wav")
        write_wav(out, res["audio_data"], res["sample_rate"])
        print(f"Saved audio to {out}")
        saved += 1

    print(f"Phase timings: {pipe.timings.as_dict()}")
    print(f"Inference completed. Saved {saved}/{len(items)} audio files to "
          f"{args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
