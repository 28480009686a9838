"""Host-side audio file IO (wav read/write, mono/resample helpers).

Replaces torchaudio.load/save (reference generation_utils.py:145,
inference.py:107-111). The hot paths dispatch to the native C++ runtime
(native/libmossaudio.so — multi-threaded polyphase resampler + wav codec,
bound via ctypes in utils/native.py) and fall back to scipy/numpy when the
library isn't built. No torch dependency.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..ops.dsp import resample
from . import native


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a wav file -> (float32 (channels, T) in [-1, 1], sample_rate)."""
    nat = native.read_wav(path)
    if nat is not None:
        return nat
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T
    return data, int(sr)


def write_wav(path: str, wav: np.ndarray, sample_rate: int) -> None:
    """Write float32 (T,) or (channels, T) audio as 16-bit PCM."""
    if native.write_wav(path, wav, sample_rate):
        return
    from scipy.io import wavfile
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 2:
        wav = wav.T                       # scipy expects (T, channels)
    pcm = np.clip(wav, -1.0, 1.0)
    wavfile.write(path, sample_rate, (pcm * 32767.0).astype(np.int16))


def to_mono_16k(wav: np.ndarray, sr: int, target_sr: int = 16000) -> np.ndarray:
    """(channels, T) any rate -> (T',) mono target_sr (reference
    load_audio_data semantics, generation_utils.py:112-123)."""
    if sr != target_sr:
        nat = native.resample(wav, sr, target_sr)
        wav = nat if nat is not None else resample(wav, sr, target_sr)
    if wav.shape[0] > 1:
        wav = wav.mean(axis=0, keepdims=True)
    return wav[0]
