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
    rc = rt_main(["--input_dir", EXAMPLES, "--output_dir", out, "--tiny",
                  "--platform", "cpu", "--batch_size", "2"])
    assert rc == 0
    recons = [f for f in os.listdir(out) if f.endswith("_recon.wav")]
    assert len(recons) == 3          # voice_s1, voice_s2, voice_both
    from moss_ttsd_tpu.utils.audio_io import read_wav
    wav, sr = read_wav(os.path.join(out, recons[0]))
    assert sr == 24000 and wav.shape[-1] > 0
