"""Bundled example assets parse and drive the pipeline (reference examples/
exercises the same three JSONL input formats, reference inference.py:18)."""
import json
import os

import numpy as np
import pytest

from moss_ttsd_tpu.pipeline.jsonl import load_audio_data, process_jsonl_item

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def load_items(name):
    with open(os.path.join(EXAMPLES, name)) as f:
        return [json.loads(l) for l in f if l.strip()]


@pytest.fixture(autouse=True)
def _repo_cwd(monkeypatch):
    monkeypatch.chdir(REPO)   # base_path in the jsonl is repo-relative


def test_two_speaker_format():
    items = load_items("examples.jsonl")
    assert items
    parsed = process_jsonl_item(items[0])
    assert "[S1]" in parsed["text"] and "[S2]" in parsed["text"]
    assert parsed["prompt_text"].startswith("[S1]")
    wav = load_audio_data(parsed["prompt_audio"])
    assert wav.ndim == 1 and wav.dtype == np.float32
    assert len(wav) == 2 * 3 * 16000          # s1 3s + s2 3s at 16k


def test_single_reference_format():
    parsed = process_jsonl_item(load_items("examples_single_reference.jsonl")[0])
    assert parsed["prompt_text"].count("[S") == 2
    wav = load_audio_data(parsed["prompt_audio"])
    assert len(wav) == 4 * 16000


def test_text_only_format():
    items = load_items("examples_only_text.jsonl")
    assert len(items) == 2
    for it in items:
        parsed = process_jsonl_item(it)
        assert parsed["prompt_audio"] is None
        assert parsed["text"]


def test_codec_roundtrip_cli(tmp_path):
    """Codec CLI end-to-end over the bundled example voices (C15 parity)."""
    from moss_ttsd_tpu.cli.codec_roundtrip import main as rt_main
    out = str(tmp_path / "recon")
    metrics_path = str(tmp_path / "metrics.json")
    rc = rt_main(["--input_dir", EXAMPLES, "--output_dir", out, "--tiny",
                  "--platform", "cpu", "--batch_size", "2",
                  "--metrics", metrics_path])
    assert rc == 0
    recons = [f for f in os.listdir(out) if f.endswith("_recon.wav")]
    assert len(recons) == 3          # voice_s1, voice_s2, voice_both
    from moss_ttsd_tpu.utils.audio_io import read_wav
    wav, sr = read_wav(os.path.join(out, recons[0]))
    assert sr == 24000 and wav.shape[-1] > 0
    with open(metrics_path) as f:
        m = json.load(f)
    assert len(m["files"]) == 3
    assert np.isfinite(m["mean_mel_l1"]) and np.isfinite(m["mean_si_snr_db"])


def test_inference_cli_with_lora_voice(tmp_path):
    """The batch CLI registers --lora_adapter voices (peft directory
    format) and routes per-item "voice" fields to the engine."""
    import jax
    import json as _json
    from safetensors.numpy import save_file
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline, main
    from moss_ttsd_tpu.train.lora import init_lora

    pipe = build_tiny_pipeline()
    tree = init_lora(pipe.engine.params, jax.random.PRNGKey(2), rank=2)
    sd = {}
    for key, ab in tree.items():
        target = key.split("/")[-2]
        mod = "self_attn" if target[0] in "qkvo" else "mlp"
        for layer in range(ab["a"].shape[0]):
            pre = (f"base_model.model.model.language_model.layers."
                   f"{layer}.{mod}.{target}")
            sd[f"{pre}.lora_A.weight"] = np.asarray(ab["a"][layer]).T.copy()
            sd[f"{pre}.lora_B.weight"] = np.asarray(ab["b"][layer]).T.copy()
    adir = tmp_path / "adapter"
    adir.mkdir()
    save_file(sd, str(adir / "adapter_model.safetensors"))
    (adir / "adapter_config.json").write_text(_json.dumps(
        {"r": 2, "lora_alpha": 8, "use_rslora": True}))

    jsonl = tmp_path / "in.jsonl"
    jsonl.write_text(
        _json.dumps({"text": "[S1]voice cli[S2]ok", "voice": "v1"}) + "\n"
        + _json.dumps({"text": "[S1]plain[S2]ok"}) + "\n")
    out = tmp_path / "out"
    main(["--jsonl", str(jsonl), "--tiny", "--output_dir", str(out),
          "--max_new_tokens", "8", "--lora_adapter", f"v1={adir}"])
