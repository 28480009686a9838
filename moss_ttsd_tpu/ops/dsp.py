"""Audio DSP primitives in pure JAX — TPU-native replacements for the reference's
torch.stft / torch.fft.irfft / F.fold overlap-add / torchaudio.resample stack
(reference: XY_Tokenizer/xy_tokenizer/nn/modules.py:665-792,
feature_extractor.py:78-104, generation_utils.py:117).

Design notes (TPU-first):
  * STFT is expressed as frame-gather + (windowed frames) @ DFT-basis matmul so the
    FLOPs land on the MXU; the mel projection is a second matmul that XLA fuses.
  * ISTFT overlap-add exploits hop | win: the output is a sum of 4 statically
    shifted hop-sized segment streams — no scatter, no dynamic shapes.
  * Everything is shape-static and jittable.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windows / framing
# ---------------------------------------------------------------------------

def hann_window(win_length: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Hann window; periodic=True matches torch.hann_window's default."""
    n = np.arange(win_length, dtype=np.float64)
    denom = win_length if periodic else win_length - 1
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / denom))
    return w.astype(dtype)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice ``x`` (..., T) into overlapping frames -> (..., num_frames, frame_length).

    num_frames = 1 + (T - frame_length) // hop. Implemented as a static gather so
    XLA lowers it to an efficient copy (no dynamic shapes).
    """
    T = x.shape[-1]
    num_frames = 1 + (T - frame_length) // hop
    idx = (np.arange(num_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


# ---------------------------------------------------------------------------
# DFT basis (real FFT as a matmul — MXU-friendly for small n_fft)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _rdft_basis(n_fft: int) -> np.ndarray:
    """Real-input DFT basis of shape (n_fft, 2*(n_fft//2+1)): [cos | -sin] parts.

    frames @ basis == concat(Re(rfft(frames)), Im(rfft(frames)), axis=-1).
    """
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


def stft_magsq(x: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray,
               center: bool = True) -> jnp.ndarray:
    """|STFT|^2 of ``x`` (..., T) -> (..., n_bins, num_frames), float32.

    Matches torch.stft(center=True, pad_mode='reflect') magnitudes squared
    (reference feature_extractor.py:89-90). Composes stft_complex — the
    elementwise square fuses into the basis matmul under jit, so this costs
    the same as an inlined copy without duplicating the pad/frame/window
    logic."""
    re, im = stft_complex(x, n_fft, hop, window, center)
    return re * re + im * im


def stft_complex(x: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray,
                 center: bool = True):
    """Complex STFT -> (re, im) each (..., n_bins, num_frames), float32."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop) * window.astype(jnp.float32)
    basis = jnp.asarray(_rdft_basis(n_fft))
    spec = frames @ basis
    n_bins = n_fft // 2 + 1
    re = jnp.swapaxes(spec[..., :n_bins], -1, -2)
    im = jnp.swapaxes(spec[..., n_bins:], -1, -2)
    return re, im


# ---------------------------------------------------------------------------
# Mel filterbank (slaney norm + slaney scale — parity with
# transformers.audio_utils.mel_filter_bank used at reference
# feature_extractor.py:42-50)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=8)
def mel_filter_bank(num_frequency_bins: int, num_mel_filters: int,
                    min_frequency: float, max_frequency: float,
                    sampling_rate: int) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank.

    Returns (num_frequency_bins, num_mel_filters) float32, matching
    transformers.audio_utils.mel_filter_bank(norm='slaney', mel_scale='slaney').
    """
    fft_freqs = np.linspace(0.0, sampling_rate / 2, num_frequency_bins)
    mel_min = _hz_to_mel_slaney(min_frequency)
    mel_max = _hz_to_mel_slaney(max_frequency)
    mel_pts = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]          # (bins, mel+2)
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))                   # (bins, mel)

    # slaney area normalization
    enorm = 2.0 / (filter_freqs[2:num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


def log_mel_spectrogram(waveform: jnp.ndarray, n_fft: int = 400, hop: int = 160,
                        num_mels: int = 80, sampling_rate: int = 16000) -> jnp.ndarray:
    """Whisper-style log-mel features (reference feature_extractor.py:78-104).

    waveform: (B, n_samples) float32 (already padded to a fixed chunk length).
    Returns (B, num_mels, num_frames) with num_frames = n_samples // hop
    (torch.stft yields n_samples//hop + 1 frames with center=True; the reference
    drops the last frame — feature_extractor.py:90 `stft[..., :-1]`).

    Semantics preserved exactly: power spectrogram -> slaney mel -> clamp(1e-10)
    -> log10 -> per-sample floor at (max - 8) -> (x + 4) / 4.
    """
    window = jnp.asarray(hann_window(n_fft, periodic=True))
    mag2 = stft_magsq(waveform, n_fft, hop, window, center=True)   # (B, bins, F+1)
    mag2 = mag2[..., :-1]                                          # drop last frame
    fb = jnp.asarray(mel_filter_bank(n_fft // 2 + 1, num_mels, 0.0,
                                     sampling_rate / 2, sampling_rate))
    mel = jnp.einsum("bft,fm->bmt", mag2, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)      # per-sample max
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# ISTFT with "same" padding overlap-add (reference modules.py:709-792)
# ---------------------------------------------------------------------------

def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add frames (..., W, T) -> (..., (T-1)*hop + W).

    Requires hop | W. TPU-native formulation: with R = W // hop, output segment
    s (hop samples) is the sum of R statically-shifted frame slices — a pure
    pad+add, no scatter (replaces the reference's F.fold, modules.py:771-777).
    """
    W, T = frames.shape[-2], frames.shape[-1]
    assert W % hop == 0, f"overlap_add requires hop|win, got win={W} hop={hop}"
    R = W // hop
    out_len = (T - 1) * hop + W
    nseg = T - 1 + R                       # number of hop-sized output segments
    lead = frames.shape[:-2]
    y = jnp.zeros(lead + (nseg, hop), dtype=frames.dtype)
    # frames reshaped: (..., R, hop, T) -> contribution k occupies segments [k, k+T)
    fr = frames.reshape(lead + (R, hop, T))
    for k in range(R):
        seg = jnp.moveaxis(fr[..., k, :, :], -1, -2)   # (..., T, hop)
        y = y.at[..., k:k + T, :].add(seg)
    return y.reshape(lead + (nseg * hop,))[..., :out_len]


@functools.lru_cache(maxsize=8)
def _window_envelope(n_fft: int, hop: int, win_length: int, T: int) -> np.ndarray:
    """Squared-window overlap-add envelope of length (T-1)*hop + win_length."""
    w = hann_window(win_length, periodic=True).astype(np.float64) ** 2
    out_len = (T - 1) * hop + win_length
    env = np.zeros(out_len)
    for t in range(T):
        env[t * hop: t * hop + win_length] += w
    return env.astype(np.float32)


def istft_same_masked(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop: int,
                      num_frames: jnp.ndarray) -> jnp.ndarray:
    """ISTFT with "same" padding over a RAGGED batch: only the first
    ``num_frames[b]`` spectrogram frames of row b exist. Both the overlap-add
    and the squared-window normalization envelope are masked per row, so the
    output's tail matches what the reference computes on an unpadded tensor
    of exactly num_frames frames (reference chunks are ragged —
    model.py:225-227 — while we compute on fixed-shape padded chunks).

    re, im: (B, n_bins, T); num_frames: (B,). Returns (B, T * hop); samples
    beyond num_frames*hop are zero.
    """
    win_length = n_fft
    pad = (win_length - hop) // 2
    B = re.shape[0]
    T = re.shape[-1]
    spec = jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
    frames = jnp.fft.irfft(jnp.moveaxis(spec, -2, -1), n=n_fft, axis=-1)   # (B, T, n_fft)
    window = jnp.asarray(hann_window(win_length, periodic=True))
    fmask = (jnp.arange(T)[None, :] < num_frames[:, None])                 # (B, T)
    frames = frames * window * fmask[..., None]
    frames = jnp.moveaxis(frames, -1, -2)                                  # (B, n_fft, T)
    y = overlap_add(frames, hop)
    env_frames = jnp.broadcast_to((window ** 2)[None, :, None],
                                  (B, n_fft, T)) * fmask[:, None, :]
    env = overlap_add(env_frames, hop)
    y = jnp.where(env > 1e-11, y / jnp.maximum(env, 1e-11), 0.0)
    # pad == 0 (no-overlap hop == n_fft): y[..., 0:-0] would be EMPTY
    return y[..., pad:y.shape[-1] - pad]


def istft_same(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """ISTFT with "same" padding (reference ISTFT module, modules.py:709-792).

    re, im: (..., n_bins, T) spectrogram real/imag parts; win_length == n_fft.
    Returns (..., T * hop) — the reference trims (win-hop)//2 from both ends.
    """
    win_length = n_fft
    pad = (win_length - hop) // 2
    T = re.shape[-1]
    # irfft along the frequency axis, matching torch.fft.irfft(spec, n_fft, dim=1)
    spec = jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
    frames = jnp.fft.irfft(jnp.moveaxis(spec, -2, -1), n=n_fft, axis=-1)  # (..., T, n_fft)
    window = jnp.asarray(hann_window(win_length, periodic=True))
    frames = frames * window
    frames = jnp.moveaxis(frames, -1, -2)                                  # (..., n_fft, T)
    y = overlap_add(frames, hop)
    env = jnp.asarray(_window_envelope(n_fft, hop, win_length, int(T)))
    # guarded division: at hop == n_fft the periodic-Hann envelope is 0 at
    # sample 0 (w[0] = 0) AND the trim below keeps that sample (pad == 0);
    # for overlapping configs every kept sample has env > 1e-11, so this is
    # bit-identical to the plain divide there
    y = jnp.where(env > 1e-11, y / jnp.maximum(env, 1e-11), 0.0)
    return y[..., pad:y.shape[-1] - pad]


# ---------------------------------------------------------------------------
# Resampling (replaces torchaudio.functional.resample,
# reference generation_utils.py:117)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                     rolloff: float = 0.99, beta: float = 14.769656459379492,
                     window: str = "hann"):
    """Windowed-sinc polyphase kernel (torchaudio-compatible semantics).

    window="hann" matches torchaudio.functional.resample's default
    (sinc_interp_hann) — the variant the reference hits through its default
    resample calls (reference generation_utils.py:117) — so prompt audio at
    non-16 kHz rates produces the same samples. window="kaiser" matches
    sinc_interp_kaiser (better stopband).

    Returns (kernel, width) where kernel has shape (new_freq_r, kernel_size) and
    width is the one-sided support in input samples (after gcd reduction).
    """
    g = math.gcd(orig_freq, new_freq)
    orig_freq_r, new_freq_r = orig_freq // g, new_freq // g
    base_freq = min(orig_freq_r, new_freq_r) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq_r / base_freq)
    idx = np.arange(-width, width + orig_freq_r, dtype=np.float64)[None, :] / orig_freq_r
    t = np.arange(0, -new_freq_r, -1, dtype=np.float64)[:, None] / new_freq_r + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    if window == "hann":
        win = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    elif window == "kaiser":
        win = np.i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) / np.i0(beta)
    else:
        raise ValueError(f"unknown window {window!r}")
    t = t * np.pi
    scale = base_freq / orig_freq_r
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * win * scale
    return kernel.astype(np.float32), width, orig_freq_r, new_freq_r


def resample(x: np.ndarray, orig_freq: int, new_freq: int,
             window: str = "hann") -> np.ndarray:
    """Polyphase sinc resampling of (..., T) — numpy host-side (IO path).

    Default window="hann" matches torchaudio.functional.resample's default
    (sinc_interp_hann), the path the reference uses for prompt audio.
    """
    if orig_freq == new_freq:
        return x
    kernel, width, of_r, nf_r = _resample_kernel(int(orig_freq), int(new_freq),
                                                 window=window)
    length = x.shape[-1]
    lead = x.shape[:-1]
    xf = x.reshape((-1, length)).astype(np.float32)
    xf = np.pad(xf, [(0, 0), (width, width + of_r)])
    num_out_blocks = int(np.ceil(length / of_r))
    # frame into polyphase blocks: each output block consumes kernel_size input samples
    ksz = kernel.shape[1]
    idx = np.arange(num_out_blocks)[:, None] * of_r + np.arange(ksz)[None, :]
    frames = xf[:, idx]                                   # (N, blocks, ksz)
    out = np.einsum("nbk,pk->nbp", frames, kernel)        # (N, blocks, nf_r)
    out = out.reshape(xf.shape[0], -1)
    target_len = int(np.ceil(new_freq * length / orig_freq))
    out = out[:, :target_len]
    return out.reshape(lead + (target_len,))


def resample_jax(x: jnp.ndarray, orig_freq: int, new_freq: int,
                 window: str = "hann") -> jnp.ndarray:
    """Jittable polyphase sinc resampling of (..., T) on-device."""
    if orig_freq == new_freq:
        return x
    kernel, width, of_r, nf_r = _resample_kernel(int(orig_freq), int(new_freq),
                                                 window=window)
    length = x.shape[-1]
    lead = x.shape[:-1]
    xf = x.reshape((-1, length)).astype(jnp.float32)
    xf = jnp.pad(xf, [(0, 0), (width, width + of_r)])
    num_out_blocks = int(np.ceil(length / of_r))
    ksz = kernel.shape[1]
    idx = np.arange(num_out_blocks)[:, None] * of_r + np.arange(ksz)[None, :]
    frames = xf[:, idx]
    out = jnp.einsum("nbk,pk->nbp", frames, jnp.asarray(kernel))
    out = out.reshape(xf.shape[0], -1)
    target_len = int(np.ceil(new_freq * length / orig_freq))
    out = out[:, :target_len]
    return out.reshape(lead + (target_len,))


# ---------------------------------------------------------------------------
# MDCT / IMDCT (reference modules.py:795-937 — unused by the shipped config
# but part of the Vocos head family; config-selectable via VocosConfig)
# ---------------------------------------------------------------------------

def _cosine_window(M: int) -> np.ndarray:
    """scipy.signal.windows.cosine: w(n) = sin(pi*(n+0.5)/M)."""
    return np.sin(np.pi * (np.arange(M) + 0.5) / M).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _mdct_basis(frame_len: int) -> np.ndarray:
    """Real MDCT basis (frame_len, N): windowed-frame @ basis == MDCT.

    Folds the reference's pre/post twiddles + FFT (modules.py:846-854) into
    ONE real matmul — complex FFT never touches the device (TPU-native; the
    reference keeps complex buffers view_as_real only as an NCCL workaround).
    """
    N = frame_len // 2
    n0 = (N + 1) / 2
    n = np.arange(frame_len)[:, None].astype(np.float64)
    k = np.arange(N)[None, :].astype(np.float64)
    pre = np.exp(-1j * np.pi * n / frame_len)
    post = np.exp(-1j * np.pi * n0 * (k + 0.5) / N)
    fourier = np.exp(-2j * np.pi * n * k / frame_len)
    basis = np.real(pre * fourier * post) * np.sqrt(1.0 / N) * np.sqrt(2)
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _imdct_basis(frame_len: int) -> np.ndarray:
    """Real IMDCT basis (N, frame_len): X @ basis == windowless IMDCT frames.

    Folds the spectrum mirroring Y = [X, -flip(X)], the IFFT, and both
    twiddles (modules.py:883-911) into one real matmul.
    """
    N = frame_len // 2
    n0 = (N + 1) / 2
    k = np.arange(2 * N)[:, None].astype(np.float64)    # input bin (mirrored)
    m = np.arange(2 * N)[None, :].astype(np.float64)    # output sample
    pre = np.exp(1j * np.pi * n0 * k / N)
    post = np.exp(1j * np.pi * (m + n0) / (2 * N))
    fourier = np.exp(2j * np.pi * k * m / (2 * N)) / (2 * N)   # ifft kernel
    C = np.real(pre * fourier * post) * np.sqrt(N) * np.sqrt(2)  # (2N, 2N)
    # fold the mirror: y = X @ C[:N] - flip(X) @ C[N:]  ==  X @ D
    D = C[:N] - C[N:][::-1]
    return D.astype(np.float32)


def mdct(audio: jnp.ndarray, frame_len: int, padding: str = "same") -> jnp.ndarray:
    """Modified DCT of (..., T) -> (..., L, N) with N = frame_len//2.

    Matches reference MDCT.forward (modules.py:822-854): cosine window,
    lapped transform with hop N. "same" pads frame_len//4 per side,
    "center" pads frame_len//2.
    """
    if padding not in ("center", "same"):
        raise ValueError("padding must be 'center' or 'same'")
    N = frame_len // 2
    pad = frame_len // 2 if padding == "center" else frame_len // 4
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)])
    frames = frame_signal(x.astype(jnp.float32), frame_len, N)  # (..., L, frame_len)
    frames = frames * jnp.asarray(_cosine_window(frame_len))
    return frames @ jnp.asarray(_mdct_basis(frame_len))


def imdct(X: jnp.ndarray, frame_len: int, padding: str = "same") -> jnp.ndarray:
    """Inverse MDCT of (..., L, N) -> (..., L*N) ("same") / (..., (L-1)*N)
    ("center").

    Matches reference IMDCT.forward (modules.py:883-922): mirrored-spectrum
    inverse transform, cosine window, hop-N overlap-add (our static pad+add
    instead of F.fold).
    """
    if padding not in ("center", "same"):
        raise ValueError("padding must be 'center' or 'same'")
    N = frame_len // 2
    assert X.shape[-1] == N, f"expected {N} bins, got {X.shape[-1]}"
    y = X.astype(jnp.float32) @ jnp.asarray(_imdct_basis(frame_len))  # (..., L, 2N)
    y = y * jnp.asarray(_cosine_window(frame_len))
    audio = overlap_add(jnp.swapaxes(y, -1, -2), N)         # (..., (L+1)*N)
    pad = frame_len // 2 if padding == "center" else frame_len // 4
    return audio[..., pad:-pad]
