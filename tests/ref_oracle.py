"""Shared helper: make the read-only reference tree importable as a test
oracle by stubbing the packages missing from this image (librosa, torchaudio,
liger_kernel — only two mel-scale helpers are actually touched)."""
import importlib.machinery
import math
import os
import sys
import types

REF_ROOT = "/root/reference"
REF_XY = os.path.join(REF_ROOT, "XY_Tokenizer")


def reference_available() -> bool:
    return os.path.isdir(REF_ROOT)


def _mkmod(name):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


def install_reference_stubs() -> None:
    _mkmod("librosa")
    ta = _mkmod("torchaudio")
    taf = _mkmod("torchaudio.functional")
    taff = _mkmod("torchaudio.functional.functional")

    def _hz_to_mel(freq, mel_scale="htk"):
        if mel_scale == "htk":
            return 2595.0 * math.log10(1.0 + freq / 700.0)
        f_min, f_sp = 0.0, 200.0 / 3
        mels = (freq - f_min) / f_sp
        min_log_hz = 1000.0
        if freq >= min_log_hz:
            mels = (min_log_hz - f_min) / f_sp + \
                math.log(freq / min_log_hz) / (math.log(6.4) / 27.0)
        return mels

    def _mel_to_hz(mels, mel_scale="htk"):
        if mel_scale == "htk":
            return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
        raise NotImplementedError(mel_scale)

    taff._hz_to_mel = _hz_to_mel
    taff._mel_to_hz = _mel_to_hz
    taf.functional = taff
    ta.functional = taf

    lk = _mkmod("liger_kernel")
    lkt = _mkmod("liger_kernel.transformers")
    lktm = _mkmod("liger_kernel.transformers.model")
    lktml = _mkmod("liger_kernel.transformers.model.loss_utils")
    lktml.LigerForCausalLMLoss = None
    lktm.loss_utils = lktml
    lkt.model = lktm
    lk.transformers = lkt

    for p in (REF_ROOT, REF_XY):
        if p not in sys.path:
            sys.path.insert(0, p)
