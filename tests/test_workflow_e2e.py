"""End-to-end one-click workflow (C19) + serve-layer generators on the tiny
pipeline: preprocess JSONL+wav -> train; gradio streaming fn; podcast fn."""
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def tiny_audio_jsonl(tmp_path):
    from moss_ttsd_tpu.utils.audio_io import write_wav
    wav = np.sin(np.linspace(0, 600, 32000)).astype(np.float32) * 0.5
    wav_path = str(tmp_path / "a.wav")
    write_wav(wav_path, wav, 16000)
    jsonl = str(tmp_path / "train.jsonl")
    with open(jsonl, "w") as f:
        f.write(json.dumps({"file_path": wav_path,
                            "full_transcript": "[S1]hello[S2]world"}) + "\n")
        f.write(json.dumps({"file_path": wav_path,
                            "full_transcript": "[S1]again[S2]ok"}) + "\n")
    return jsonl


def test_finetune_workflow_tiny(tiny_audio_jsonl, tmp_path):
    import yaml
    from moss_ttsd_tpu.cli.finetune_workflow import main as wf_main

    wf = {
        "data_preprocess": {
            "jsonl": tiny_audio_jsonl,
            "output_dir": str(tmp_path / "processed"),
        },
        "finetune": {
            "output_dir": str(tmp_path / "ft_out"),
            "max_steps": 2,
        },
    }
    cfg_path = str(tmp_path / "wf.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(wf, f)

    rc = wf_main(["--config", cfg_path, "--tiny"])
    assert rc == 0
    assert os.path.exists(os.path.join(str(tmp_path / "processed"),
                                       "processed_data_index.json"))
    assert os.path.exists(os.path.join(str(tmp_path / "ft_out"), "model.npz"))


def test_gradio_streaming_generator():
    """synthesize_single_stream works without gradio installed."""
    from moss_ttsd_tpu.serve import gradio_app

    chunks = list(gradio_app.synthesize_single_stream(
        "[S1]streaming test[S2]yes", "", None, use_normalize=False, seed=0))
    assert chunks
    payload, status = chunks[-1]
    if payload is None:
        pytest.skip("tiny random model generated no speech this seed")
    sr, pcm = payload
    assert pcm.dtype == np.int16 and len(pcm) > 0
    assert "Streaming" in status


def test_podcast_text_to_audio(tmp_path):
    """TXT source -> fallback script -> audio via the tiny pipeline."""
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from moss_ttsd_tpu.serve.podcast import process_input_to_audio

    src = str(tmp_path / "article.txt")
    with open(src, "w") as f:
        f.write("TPUs are systolic-array accelerators. " * 20)
    out = str(tmp_path / "podcast.wav")
    pipe = build_tiny_pipeline()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    voices = {
        "prompt_audio_speaker1": os.path.join(repo, "examples/voice_s1.wav"),
        "prompt_text_speaker1": "speaker one reference",
        "prompt_audio_speaker2": os.path.join(repo, "examples/voice_s2.wav"),
        "prompt_text_speaker2": "speaker two reference",
    }
    res = process_input_to_audio(src, pipe, out, language="en",
                                 voices=voices, base_path="")
    assert res["output"] == out and os.path.exists(out)
    assert res["duration_s"] > 0
    from moss_ttsd_tpu.utils.audio_io import read_wav
    wav, sr = read_wav(out)
    assert wav.shape[-1] > 0
