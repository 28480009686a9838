"""Gradio web UI for two-speaker dialogue synthesis.

Equivalent of reference gradio_demo.py: bilingual (zh/en) interface, two input
modes (Single = one combined prompt audio with [S1][S2] text; Role = separate
per-speaker prompt audios), example loading from JSONL, lazy model singleton,
and a status panel. Gradio is an optional dependency — building the demo
raises a clear error if it is not installed.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from typing import Optional

import numpy as np

_PIPELINE = None
_PIPELINE_LOCK = threading.Lock()


def get_pipeline(loader=None):
    """Lazy global pipeline (reference initialize_model, gradio_demo.py:154-166)."""
    global _PIPELINE
    with _PIPELINE_LOCK:
        if _PIPELINE is None:
            if loader is None:
                from ..cli.inference import build_tiny_pipeline
                loader = build_tiny_pipeline
            _PIPELINE = loader()
    return _PIPELINE


def load_examples_from_jsonl(paths, limit: int = 20):
    """Full example rows for the UI galleries — audio paths resolved against
    base_path, prompt transcripts, and normalize flags, split into Role /
    Single groups (reference load_examples_from_jsonl, gradio_demo.py:11-68).

    Returns (role_examples, single_examples):
      role row   = [text, s1_audio, s1_text, s2_audio, s2_text, use_normalize]
      single row = [text, prompt_audio, prompt_text, use_normalize]
    Rows whose audio files are missing are dropped so every gallery entry is
    clickable end-to-end.
    """
    if isinstance(paths, str):
        paths = [paths]
    role, single = [], []
    for path in paths:
        if not path or not os.path.exists(path):
            continue
        with open(path, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                data = json.loads(line)
                text = data.get("text", "")
                base = data.get("base_path", os.path.dirname(path) or ".")
                norm = bool(data.get("use_normalize", True))
                if ("prompt_audio_speaker1" in data
                        and "prompt_audio_speaker2" in data):
                    a1 = os.path.join(base, data["prompt_audio_speaker1"])
                    a2 = os.path.join(base, data["prompt_audio_speaker2"])
                    if os.path.exists(a1) and os.path.exists(a2):
                        role.append([text, a1,
                                     data.get("prompt_text_speaker1", ""),
                                     a2,
                                     data.get("prompt_text_speaker2", ""),
                                     norm])
                elif "prompt_audio" in data:
                    a = os.path.join(base, data["prompt_audio"])
                    if os.path.exists(a):
                        single.append([text, a,
                                       data.get("prompt_text", ""), norm])
                else:
                    single.append([text, None, "", norm])
    return role[:limit], single[:limit]


def synthesize_single(text: str, prompt_text: str, prompt_audio_path: Optional[str],
                      use_normalize: bool = True, seed: int = 0, loader=None,
                      voice: str = ""):
    """Single mode: one combined prompt audio + [S1]/[S2] script.

    Returns (sample_rate, wav int16 np array), status string — the gradio
    Audio-component contract (reference process_single_audio_generation,
    gradio_demo.py:168-275)."""
    pipe = get_pipeline(loader)
    item = {"text": text}
    if prompt_audio_path:
        item["prompt_audio"] = prompt_audio_path
        item["prompt_text"] = prompt_text or ""
    texts_data, audio_results = pipe.process_batch(
        [item], use_normalize=use_normalize, seed=seed,
        adapter=voice or None)
    if not audio_results or audio_results[0] is None:
        return None, "Generation produced no valid speech tokens."
    res = audio_results[0]
    wav = np.clip(res["audio_data"][0], -1, 1)
    status = (f"Generated {len(wav) / res['sample_rate']:.1f}s of audio | "
              f"final text: {texts_data[0]['final_text'][:120]}")
    return (res["sample_rate"], (wav * 32767).astype(np.int16)), status


def synthesize_role(text: str,
                    s1_text: str, s1_audio_path: Optional[str],
                    s2_text: str, s2_audio_path: Optional[str],
                    use_normalize: bool = True, seed: int = 0, loader=None,
                    voice: str = ""):
    """Role mode: separate speaker-1/2 prompt audios."""
    pipe = get_pipeline(loader)
    item = {"text": text}
    if s1_audio_path:
        item["prompt_audio_speaker1"] = s1_audio_path
        item["prompt_text_speaker1"] = s1_text or ""
    if s2_audio_path:
        item["prompt_audio_speaker2"] = s2_audio_path
        item["prompt_text_speaker2"] = s2_text or ""
    texts_data, audio_results = pipe.process_batch(
        [item], use_normalize=use_normalize, seed=seed,
        adapter=voice or None)
    if not audio_results or audio_results[0] is None:
        return None, "Generation produced no valid speech tokens."
    res = audio_results[0]
    wav = np.clip(res["audio_data"][0], -1, 1)
    status = f"Generated {len(wav) / res['sample_rate']:.1f}s of audio"
    return (res["sample_rate"], (wav * 32767).astype(np.int16)), status


def synthesize_single_stream(text: str, prompt_text: str,
                             prompt_audio_path: Optional[str],
                             use_normalize: bool = True, seed: int = 0,
                             loader=None, voice: str = ""):
    """Streaming variant of synthesize_single: yields ((sr, int16 chunk),
    status) as generation progresses — a generator the gradio Audio component
    consumes with streaming=True. Goes beyond the reference, whose streamer
    hook exists but is never wired to a caller (reference
    modeling_asteroid.py:161-162; SURVEY §3.4)."""
    pipe = get_pipeline(loader)
    item = {"text": text}
    if prompt_audio_path:
        item["prompt_audio"] = prompt_audio_path
        item["prompt_text"] = prompt_text or ""
    total = 0.0
    got = False
    for chunk, sr in pipe.stream_item(item, use_normalize=use_normalize,
                                      seed=seed, adapter=voice or None):
        got = True
        total += len(chunk) / sr
        wav = np.clip(chunk, -1, 1)
        yield (sr, (wav * 32767).astype(np.int16)), f"Streaming… {total:.1f}s"
    if not got:
        yield None, "Generation produced no valid speech tokens."


DEFAULT_EXAMPLE_JSONLS = ("examples/examples.jsonl",
                          "examples/examples_single_reference.jsonl")


def create_gradio_interface(loader=None, examples_jsonl=None, voices=None):
    """Build the Blocks app (reference create_gradio_interface,
    gradio_demo.py:278-528). Requires gradio. ``voices``: registered LoRA
    adapter names — when non-empty each tab gets a voice dropdown
    ("default" = base model), mapped to the engines' per-request adapters."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this environment; install it to use "
            "the web UI, or use the CLI (moss_ttsd_tpu.cli.inference)") from e

    role_ex, single_ex = load_examples_from_jsonl(
        examples_jsonl if examples_jsonl is not None
        else list(DEFAULT_EXAMPLE_JSONLS))

    with gr.Blocks(title="MOSS-TTSD TPU — Spoken Dialogue Synthesis") as demo:
        gr.Markdown("# MOSS-TTSD (TPU-native)\n"
                    "Two-speaker dialogue synthesis — tag turns with "
                    "`[S1]`/`[S2]` · 用 `[S1]`/`[S2]` 标注说话人")
        with gr.Tabs():
            with gr.Tab("Single (combined prompt) / 单音频模式"):
                text1 = gr.Textbox(label="Dialogue script / 对话文本", lines=6,
                                   placeholder="[S1]Hello! [S2]Hi there...")
                ptext1 = gr.Textbox(label="Prompt transcript / 参考文本", lines=2)
                paudio1 = gr.Audio(label="Prompt audio / 参考音频", type="filepath")
                norm1 = gr.Checkbox(label="Normalize text / 文本规整", value=True)
                seed1 = gr.Number(label="Seed", value=0, precision=0)
                stream1 = gr.Checkbox(label="Stream audio / 流式输出", value=False)
                voice1 = gr.Dropdown(
                    label="Voice (LoRA) / 音色", value="default",
                    choices=["default"] + list(voices or []),
                    visible=bool(voices))
                btn1 = gr.Button("Generate / 生成", variant="primary")
                out1 = gr.Audio(label="Output / 合成结果", streaming=True,
                                autoplay=True)
                status1 = gr.Textbox(label="Status / 状态", interactive=False)

                def _single(t, pt, pa, n, s, stream, v):
                    v = "" if v in (None, "default") else v
                    if stream:
                        yield from synthesize_single_stream(
                            t, pt, pa, n, int(s), loader, voice=v)
                    else:
                        yield synthesize_single(t, pt, pa, n, int(s), loader,
                                                voice=v)

                btn1.click(_single,
                           [text1, ptext1, paudio1, norm1, seed1, stream1,
                            voice1],
                           [out1, status1])
                if single_ex:
                    # full rows: text + prompt audio + transcript + normalize
                    # (reference wires the same columns, gradio_demo.py:484-520)
                    gr.Examples(
                        examples=[[t, a, pt, n] for t, a, pt, n in single_ex],
                        inputs=[text1, paudio1, ptext1, norm1],
                        label="Examples / 示例 (Single)")
            with gr.Tab("Role (per-speaker prompts) / 角色模式"):
                text2 = gr.Textbox(label="Dialogue script / 对话文本", lines=6)
                with gr.Row():
                    with gr.Column():
                        s1t = gr.Textbox(label="Speaker 1 transcript")
                        s1a = gr.Audio(label="Speaker 1 audio", type="filepath")
                    with gr.Column():
                        s2t = gr.Textbox(label="Speaker 2 transcript")
                        s2a = gr.Audio(label="Speaker 2 audio", type="filepath")
                norm2 = gr.Checkbox(label="Normalize text / 文本规整", value=True)
                seed2 = gr.Number(label="Seed", value=0, precision=0)
                voice2 = gr.Dropdown(
                    label="Voice (LoRA) / 音色", value="default",
                    choices=["default"] + list(voices or []),
                    visible=bool(voices))
                btn2 = gr.Button("Generate / 生成", variant="primary")
                out2 = gr.Audio(label="Output / 合成结果")
                status2 = gr.Textbox(label="Status / 状态", interactive=False)
                btn2.click(
                    lambda t, a, b, c, d, n, s, v: synthesize_role(
                        t, a, b, c, d, n, int(s), loader,
                        voice="" if v in (None, "default") else v),
                    [text2, s1t, s1a, s2t, s2a, norm2, seed2, voice2],
                    [out2, status2])
                if role_ex:
                    gr.Examples(
                        examples=[[t, a1, p1, a2, p2, n]
                                  for t, a1, p1, a2, p2, n in role_ex],
                        inputs=[text2, s1a, s1t, s2a, s2t, norm2],
                        label="Examples / 示例 (Role)")
    return demo


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="MOSS-TTSD TPU gradio demo")
    p.add_argument("--model_path", default=None)
    p.add_argument("--spt_config", default=None)
    p.add_argument("--spt_ckpt", default=None)
    p.add_argument("--examples", default=None)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--lora_adapter", action="append", default=[],
                   metavar="NAME=PATH",
                   help="register a LoRA voice for the dropdown; PATH is a "
                        "lora_factors.npz from the finetune CLI. Repeatable")
    p.add_argument("--adapter_alpha", type=float, default=32.0)
    args = p.parse_args(argv)

    from ..utils.convert_lora import parse_adapter_specs
    adapters = parse_adapter_specs(args.lora_adapter, args.adapter_alpha,
                                   p.error)

    base_loader = None
    if not args.tiny and args.model_path:
        from ..pipeline.batch import TTSPipeline
        base_loader = lambda: TTSPipeline.load(args.model_path,
                                               args.spt_config, args.spt_ckpt)

    loader = base_loader
    if adapters:
        def loader():
            if base_loader is None:
                from ..cli.inference import build_tiny_pipeline
                pipe = build_tiny_pipeline()
            else:
                pipe = base_loader()
            for name, (tree, alpha, rslora) in adapters.items():
                pipe.engine.register_adapter(name, tree, alpha=alpha,
                                             use_rslora=rslora)
            return pipe

    demo = create_gradio_interface(loader, args.examples,
                                   voices=sorted(adapters))
    demo.launch(server_port=args.port, server_name="0.0.0.0")


if __name__ == "__main__":
    main()
