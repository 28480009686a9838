"""Regenerate the bundled example assets.

The reference ships real recorded prompt voices (reference examples/*.wav);
this repo cannot redistribute them, so we synthesize two clearly distinct
placeholder "voices" (harmonic stacks with different f0 and vibrato) that
exercise the same code paths: 16 kHz mono prompt wavs + the three JSONL
input formats (reference examples/examples.jsonl,
examples_single_reference.jsonl, examples_only_text.jsonl).

Run from the repo root: python examples/make_examples.py
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SR = 16000


def synth_voice(f0: float, seconds: float, vibrato_hz: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * vibrato_hz * t)
    wav = np.zeros_like(t)
    for h, amp in enumerate([1.0, 0.5, 0.33, 0.2, 0.1], start=1):
        wav += amp * np.sin(2 * np.pi * f0 * h * vib * t + rng.uniform(0, np.pi))
    # amplitude envelope with syllable-ish modulation
    env = 0.4 + 0.3 * np.clip(np.sin(2 * np.pi * 2.5 * t), 0, 1)
    wav = wav * env / np.max(np.abs(wav))
    return (wav * 0.6).astype(np.float32)


def write_wav(path: str, wav: np.ndarray) -> None:
    from scipy.io import wavfile
    wavfile.write(path, SR, (np.clip(wav, -1, 1) * 32767).astype(np.int16))


def main() -> None:
    write_wav(os.path.join(HERE, "voice_s1.wav"), synth_voice(130.0, 3.0, 5.0, 1))
    write_wav(os.path.join(HERE, "voice_s2.wav"), synth_voice(210.0, 3.0, 6.5, 2))
    write_wav(os.path.join(HERE, "voice_both.wav"),
              np.concatenate([synth_voice(130.0, 2.0, 5.0, 3),
                              synth_voice(210.0, 2.0, 6.5, 4)]))

    dialogue = ("[S1]Welcome back to the show. Today we are talking about "
                "tensor processing units.[S2]Thanks for having me. I have been "
                "looking forward to this conversation all week.")

    # repo-relative base_path: resolves when CLIs run from the repo root
    rel_base = os.path.relpath(HERE, os.getcwd())

    with open(os.path.join(HERE, "examples.jsonl"), "w") as f:
        f.write(json.dumps({
            "base_path": rel_base,
            "text": dialogue,
            "prompt_audio_speaker1": "voice_s1.wav",
            "prompt_text_speaker1": "This is the first speaker reference voice.",
            "prompt_audio_speaker2": "voice_s2.wav",
            "prompt_text_speaker2": "And this is the second speaker reference voice.",
        }) + "\n")

    with open(os.path.join(HERE, "examples_single_reference.jsonl"), "w") as f:
        f.write(json.dumps({
            "base_path": rel_base,
            "text": dialogue,
            "prompt_audio": "voice_both.wav",
            "prompt_text": "[S1]This is the first speaker reference voice."
                           "[S2]And this is the second speaker reference voice.",
        }) + "\n")

    with open(os.path.join(HERE, "examples_only_text.jsonl"), "w") as f:
        f.write(json.dumps({"text": dialogue}) + "\n")
        f.write(json.dumps({
            "text": "[S1]你好，欢迎收听本期节目。[S2]大家好，很高兴来到这里。",
        }) + "\n")

    print(f"wrote example assets to {HERE}")


if __name__ == "__main__":
    main()
