"""Native C++ audio runtime (native/libmossaudio.so) vs the numpy/scipy
reference paths. Skipped entirely when no compiler is available."""
import numpy as np
import pytest

from moss_ttsd_tpu.ops.dsp import resample as np_resample
from moss_ttsd_tpu.utils import native
from moss_ttsd_tpu.utils.audio_io import read_wav, write_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (no compiler?)")


def test_resample_matches_numpy_down():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 24001)).astype(np.float32)
    a = native.resample(x, 24000, 16000)
    b = np_resample(x, 24000, 16000)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_resample_matches_numpy_up():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(16000).astype(np.float32)
    a = native.resample(x, 16000, 24000)
    b = np_resample(x, 16000, 24000)
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_resample_odd_ratio():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(44100).astype(np.float32)
    a = native.resample(x, 44100, 16000)
    b = np_resample(x, 44100, 16000)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_wav_roundtrip_matches_scipy(tmp_path):
    from scipy.io import wavfile
    rng = np.random.default_rng(3)
    wav = np.clip(rng.standard_normal((2, 4000)) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "t.wav")
    assert native.write_wav(p, wav, 24000)
    got, sr = native.read_wav(p)
    assert sr == 24000 and got.shape == wav.shape
    np.testing.assert_allclose(got, wav, atol=1e-4)
    sr2, d2 = wavfile.read(p)
    assert sr2 == 24000
    np.testing.assert_allclose(d2.T / 32768.0, got, atol=1e-4)


def test_wav_read_scipy_written(tmp_path):
    """Native reader handles scipy-written int16, int32 and float32 wavs."""
    from scipy.io import wavfile
    rng = np.random.default_rng(4)
    mono = np.clip(rng.standard_normal(1600) * 0.3, -0.99, 0.99).astype(np.float32)
    for dtype, scale in [(np.int16, 32767.0), (np.int32, 2147483647.0),
                         (np.float32, 1.0)]:
        p = str(tmp_path / f"{np.dtype(dtype).name}.wav")
        wavfile.write(p, 16000, (mono * scale).astype(dtype))
        got, sr = native.read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(got[0], mono, atol=1e-3)


def test_audio_io_dispatches_native(tmp_path):
    """Public read/write round-trips through whichever backend is active."""
    wav = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.7
    p = str(tmp_path / "d.wav")
    write_wav(p, wav, 16000)
    got, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(got[0], wav, atol=1e-3)
