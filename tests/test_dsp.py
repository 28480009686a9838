"""DSP parity tests vs torch / transformers reference implementations.

These use the third-party libraries only as oracles (they are not part of the
framework's runtime path).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from moss_ttsd_tpu.ops import dsp


def test_hann_window_matches_torch():
    import torch
    ours = dsp.hann_window(400, periodic=True)
    theirs = torch.hann_window(400).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_frame_signal():
    x = jnp.arange(20.0)
    frames = dsp.frame_signal(x, 8, 4)
    assert frames.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(frames[1]), np.arange(4.0, 12.0))


def test_stft_magsq_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    n_fft, hop = 400, 160
    ours = np.asarray(dsp.stft_magsq(jnp.asarray(x), n_fft, hop,
                                     jnp.asarray(dsp.hann_window(n_fft))))
    t = torch.stft(torch.from_numpy(x), n_fft, hop, window=torch.hann_window(n_fft),
                   return_complex=True)
    theirs = (t.abs() ** 2).numpy()
    # fp32 DFT-matmul accumulates cancellation error on tiny bins; the contract
    # that matters is mel-domain parity (next test, tight tolerance).
    assert np.max(np.abs(ours - theirs)) / theirs.max() < 5e-3


def test_mel_filter_bank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_mel
    ours = dsp.mel_filter_bank(201, 80, 0.0, 8000.0, 16000)
    theirs = hf_mel(num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
                    max_frequency=8000.0, sampling_rate=16000,
                    norm="slaney", mel_scale="slaney")
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_log_mel_matches_reference_semantics():
    """End-to-end whisper log-mel vs a torch re-derivation of the reference
    pipeline (feature_extractor.py:78-104)."""
    import torch
    rng = np.random.default_rng(1)
    n_samples = 16000 * 2
    wav = rng.standard_normal((1, 480000)).astype(np.float32) * 0.1
    wav[:, n_samples:] = 0.0

    ours = np.asarray(dsp.log_mel_spectrogram(jnp.asarray(wav)))

    w = torch.from_numpy(wav)
    window = torch.hann_window(400)
    stft = torch.stft(w, 400, 160, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    from transformers.audio_utils import mel_filter_bank as hf_mel
    fb = torch.from_numpy(hf_mel(num_frequency_bins=201, num_mel_filters=80,
                                 min_frequency=0.0, max_frequency=8000.0,
                                 sampling_rate=16000, norm="slaney",
                                 mel_scale="slaney")).float()
    mel_spec = fb.T @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    max_val = log_spec.max(dim=2, keepdim=True)[0].max(dim=1, keepdim=True)[0]
    log_spec = torch.maximum(log_spec, max_val - 8.0)
    theirs = ((log_spec + 4.0) / 4.0).numpy()

    assert ours.shape == theirs.shape == (1, 80, 3000)
    np.testing.assert_allclose(ours, theirs, atol=1e-2)


def test_overlap_add_basic():
    # 2 frames of ones, win=8, hop=4 -> middle overlaps sum to 2
    frames = jnp.ones((8, 3))
    y = np.asarray(dsp.overlap_add(frames, 4))
    assert y.shape == (16,)
    np.testing.assert_allclose(y[:4], 1.0)
    np.testing.assert_allclose(y[4:8], 2.0)
    np.testing.assert_allclose(y[8:12], 2.0)
    np.testing.assert_allclose(y[12:], 1.0)


def test_istft_roundtrip_matches_torch_fold_reference():
    """Full 'same'-padding ISTFT vs a torch re-derivation of reference
    modules.py:737-792 (irfft + fold overlap-add + envelope normalize)."""
    import torch
    rng = np.random.default_rng(2)
    n_fft, hop, T = 960, 240, 50
    n_bins = n_fft // 2 + 1
    re = rng.standard_normal((2, n_bins, T)).astype(np.float32)
    im = rng.standard_normal((2, n_bins, T)).astype(np.float32)

    ours = np.asarray(dsp.istft_same(jnp.asarray(re), jnp.asarray(im), n_fft, hop))

    spec = torch.complex(torch.from_numpy(re), torch.from_numpy(im))
    window = torch.hann_window(n_fft)
    pad = (n_fft - hop) // 2
    ifft = torch.fft.irfft(spec, n_fft, dim=1, norm="backward")
    ifft = ifft * window[None, :, None]
    output_size = (T - 1) * hop + n_fft
    y = torch.nn.functional.fold(
        ifft, output_size=(1, output_size), kernel_size=(1, n_fft),
        stride=(1, hop))[:, 0, 0, pad:-pad]
    window_sq = window.square().expand(1, T, -1).transpose(1, 2)
    env = torch.nn.functional.fold(
        window_sq, output_size=(1, output_size), kernel_size=(1, n_fft),
        stride=(1, hop)).squeeze()[pad:-pad]
    theirs = (y / env).numpy()

    assert ours.shape == theirs.shape == (2, T * hop)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_istft_inverts_stft():
    """NOLA invariant: istft(stft(x)) == x away from the edges."""
    rng = np.random.default_rng(3)
    n_fft, hop = 960, 240
    x = rng.standard_normal((1, 240 * 40)).astype(np.float32)
    re, im = dsp.stft_complex(jnp.asarray(x), n_fft, hop,
                              jnp.asarray(dsp.hann_window(n_fft)), center=True)
    # center=True stft yields T//hop+1 frames; istft_same expects win==n_fft frames
    y = np.asarray(dsp.istft_same(re, im, n_fft, hop))
    # stft center pads n_fft//2; istft_same trims (n_fft-hop)//2 -> y[i] ~ x[i - off]
    off = n_fft // 2 - (n_fft - hop) // 2
    w = x.shape[-1]
    np.testing.assert_allclose(y[0, n_fft:w - n_fft],
                               x[0, n_fft - off:w - n_fft - off], atol=2e-2)


def test_resample_vs_torchaudio_semantics():
    """Resampler sanity: a pure tone survives 24k->16k with right length+freq."""
    sr_in, sr_out = 24000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None, :]
    y = dsp.resample(x, sr_in, sr_out)
    assert y.shape == (1, sr_out)
    # frequency preserved: zero crossings per second ~ 880
    zc = np.sum(np.abs(np.diff(np.sign(y[0, 1000:-1000])))) / 2
    expected = 880 * (y.shape[1] - 2000) / sr_out
    assert abs(zc - expected) < 10
    # amplitude preserved
    assert 0.95 < np.max(np.abs(y[0, 1000:-1000])) < 1.05


def test_resample_jax_matches_numpy():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 12345)).astype(np.float32)
    a = dsp.resample(x, 44100, 16000)
    b = np.asarray(dsp.resample_jax(jnp.asarray(x), 44100, 16000))
    np.testing.assert_allclose(a, b, atol=1e-2)  # fp32 accumulation-order noise
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99999


def test_istft_no_overlap_hop_equals_nfft():
    """hop == n_fft (pad == 0): the trim slice must keep all T*hop samples
    (y[..., 0:-0] would be EMPTY) and the w[0]=0 envelope sample must not
    produce NaN (guarded division)."""
    n_fft = hop = 16
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8 * hop)).astype(np.float32)
    win = jnp.asarray(dsp.hann_window(n_fft, periodic=True))
    re, im = dsp.stft_complex(x, n_fft, hop, win, center=True)
    T = re.shape[-1]
    y = np.asarray(dsp.istft_same(re, im, n_fft, hop))
    assert y.shape == (2, T * hop)
    assert np.isfinite(y).all()
    ym = np.asarray(dsp.istft_same_masked(re, im, n_fft, hop,
                                          jnp.full((2,), T, jnp.int32)))
    assert ym.shape == (2, T * hop)
    assert np.isfinite(ym).all()


def test_stft_magsq_composes_complex():
    """stft_magsq == re^2 + im^2 of stft_complex (single source of truth
    for the pad/frame/window/DFT chain)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 400)).astype(np.float32)
    win = jnp.asarray(dsp.hann_window(128, periodic=True))
    re, im = dsp.stft_complex(x, 128, 40, win)
    np.testing.assert_array_equal(np.asarray(dsp.stft_magsq(x, 128, 40, win)),
                                  np.asarray(re * re + im * im))
