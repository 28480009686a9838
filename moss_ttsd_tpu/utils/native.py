"""ctypes bindings to the native host audio runtime (native/libmossaudio.so).

The native library provides the multi-threaded polyphase resampler and wav
codec that replace the reference's torchaudio C++ host ops (reference
generation_utils.py:117,145; helpers.py:74-100). All entry points degrade
gracefully: if the library is absent and cannot be built (no compiler), the
callers in utils/audio_io.py fall back to the pure numpy/scipy paths, so the
framework works everywhere and is merely faster where g++ exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

# sources ship inside the package (moss_ttsd_tpu/native/) so an installed
# wheel is self-contained: make builds the .so next to them on first use
_PKG = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_PKG, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmossaudio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # always run make: it no-ops when the .so is newer than the source,
        # and rebuilds a stale .so after an ABI change
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.ma_resample_out_len.restype = ctypes.c_int64
        lib.ma_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                            ctypes.c_int32]
        lib.ma_resample.restype = ctypes.c_int32
        lib.ma_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32]
        lib.ma_wav_info.restype = ctypes.c_int32
        lib.ma_wav_info.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.POINTER(ctypes.c_int64)]
        lib.ma_wav_read.restype = ctypes.c_int32
        lib.ma_wav_read.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64]
        lib.ma_wav_write.restype = ctypes.c_int32
        lib.ma_wav_write.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int32, ctypes.c_int64,
                                     ctypes.c_int32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample(x: np.ndarray, sr_in: int, sr_out: int,
             window: str = "hann") -> Optional[np.ndarray]:
    """(..., T) float32 -> resampled, or None if the native lib is missing.

    window="hann" matches torchaudio.functional.resample's default
    (sinc_interp_hann, the reference's prompt-audio path); "kaiser" selects
    the sinc_interp_kaiser variant.
    """
    lib = _load()
    if lib is None:
        return None
    if sr_in == sr_out:
        return np.asarray(x, np.float32)
    lead = x.shape[:-1]
    n_in = x.shape[-1]
    if n_in == 0:                      # reshape(-1, 0) would raise
        return np.zeros(lead + (0,), np.float32)
    xf = np.ascontiguousarray(x, np.float32).reshape(-1, n_in)
    n_out = int(lib.ma_resample_out_len(n_in, sr_in, sr_out))
    out = np.empty((xf.shape[0], n_out), np.float32)
    rc = lib.ma_resample(_fptr(xf), xf.shape[0], n_in, sr_in, sr_out,
                         _fptr(out), n_out,
                         0 if window == "hann" else 1)
    if rc != 0:
        return None
    return out.reshape(lead + (n_out,))


def read_wav(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Read wav -> ((channels, T) float32, sr), or None on any failure."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    fr = ctypes.c_int64()
    if lib.ma_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                       ctypes.byref(fr)) != 0:
        return None
    out = np.empty((ch.value, fr.value), np.float32)
    if lib.ma_wav_read(path.encode(), _fptr(out), out.size) != 0:
        return None
    return out, int(sr.value)


def write_wav(path: str, wav: np.ndarray, sample_rate: int) -> bool:
    """Write planar (channels, T) or (T,) float32 as 16-bit PCM."""
    lib = _load()
    if lib is None:
        return False
    w = np.asarray(wav, np.float32)
    if w.ndim == 1:
        w = w[None, :]
    w = np.ascontiguousarray(w)
    rc = lib.ma_wav_write(path.encode(), _fptr(w), w.shape[0], w.shape[1],
                          sample_rate)
    return rc == 0
