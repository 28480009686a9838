"""Decode->vocode overlap machinery (round-2 VERDICT task #1).

IncrementalDecoder must be byte-identical to the serial XYTokenizer.decode
path — decode() is literally one feed through it — and the two overlap
mechanisms (early chunk dispatch during generation, rows_per_call readback
pipelining) must not change a single sample.
"""

import numpy as np
import pytest

from moss_ttsd_tpu.core.config import CodecConfig
from moss_ttsd_tpu.models.codec.model import XYTokenizer


@pytest.fixture(scope="module")
def spt():
    return XYTokenizer.init_random(CodecConfig().tiny(), seed=0)


def make_codes(spt, lengths, seed=0):
    rng = np.random.default_rng(seed)
    K = spt.cfg.quantizer.codebook_size
    return [rng.integers(0, K, (spt.nq, n)).astype(np.int32) for n in lengths]


def test_rows_per_call_identical(spt):
    """Batch-split vocode calls produce the same audio as one batched call
    (rows are independent in the codec). Equality is at fp32 epsilon, not
    bit-exact: a different batch dimension changes XLA's tiling and thus
    float summation order (measured max |diff| ~2e-7 on unit-scale audio —
    two decades below the 3e-5 int16 PCM quantization floor)."""
    codes = make_codes(spt, [40, 25, 33], seed=1)
    ref = spt.decode(codes)["syn_wav_list"]
    split = spt.decode(codes, rows_per_call=1)["syn_wav_list"]
    for a, b in zip(ref, split):
        np.testing.assert_allclose(a, b, atol=2e-6)
    split2 = spt.decode(codes, rows_per_call=2, pcm16=True)["syn_wav_list"]
    ref2 = spt.decode(codes, pcm16=True)["syn_wav_list"]
    for a, b in zip(ref2, split2):
        np.testing.assert_allclose(a, b, atol=1.5 / 32768.0)


def test_incremental_feed_matches_serial(spt):
    """Streamed feed() during 'generation' dispatches early chunks before
    the final codes exist, and the assembled audio is byte-identical to the
    serial decode of the full code sequences."""
    # small windows so several chunks complete mid-stream: 4 s window /
    # 2 s overlap -> 50-code chunks, 25-code stride
    small = XYTokenizer(spt.cfg, spt.params, chunk_seconds=4)
    full = make_codes(small, [80, 55], seed=2)
    serial = small.decode(full, overlap_seconds=2)["syn_wav_list"]

    inc = small.incremental_decoder(overlap_seconds=2)
    dispatched_early = 0
    for step in range(10, 90, 10):
        prefixes = [c[:, :min(step, c.shape[-1])] for c in full]
        finished = [step >= c.shape[-1] for c in full]
        inc.feed(prefixes, finished)
        if step < 80:
            dispatched_early = max(dispatched_early, inc.next_chunk)
    assert dispatched_early >= 1, "no chunk dispatched before generation end"
    streamed = inc.finish(full)["syn_wav_list"]
    assert len(streamed) == len(serial)
    for a, b in zip(serial, streamed):
        np.testing.assert_array_equal(a, b)


def test_incremental_feed_waits_for_window(spt):
    """A chunk is NOT dispatched while any unfinished row's window is still
    incomplete (its clipped chunk length could still change)."""
    small = XYTokenizer(spt.cfg, spt.params, chunk_seconds=4)
    inc = small.incremental_decoder(overlap_seconds=2)
    full = make_codes(small, [60, 60], seed=3)
    # row 1 lags: 20 codes < 50-code window -> nothing dispatchable
    inc.feed([full[0][:, :55], full[1][:, :20]], [False, False])
    assert inc.next_chunk == 0
    # row 1 catches up past the window -> chunk 0 (and only it) dispatches
    inc.feed([full[0][:, :55], full[1][:, :50]], [False, False])
    assert inc.next_chunk == 1
    streamed = inc.finish(full)["syn_wav_list"]
    serial = small.decode(full, overlap_seconds=2)["syn_wav_list"]
    for a, b in zip(serial, streamed):
        np.testing.assert_array_equal(a, b)


def test_incremental_empty(spt):
    out = spt.decode(make_codes(spt, [0, 0]))["syn_wav_list"]
    assert all(w.size == 0 for w in out)


def test_len_buckets_match_full_window(spt):
    """Quarter-window bucketing of a partial final chunk ("auto", the
    default) matches the reference's always-pad-to-30s dispatch
    (len_buckets=None) to fp rounding level: padded positions only perturb
    reduction order, never masking (measured ~3e-7 on unit-scale audio).
    Multi-chunk inputs keep full windows for every non-final chunk."""
    W = spt.chunk_codes
    # partial tail (bucket W/2), plus a multi-chunk row exercising a full
    # intermediate window + a short bucketed tail
    codes = make_codes(spt, [W // 2 - 3, W + 5], seed=2)
    auto = spt.decode(codes)["syn_wav_list"]
    full = spt.decode(codes, len_buckets=None)["syn_wav_list"]
    for a, b in zip(auto, full):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-6)
    # pcm16 path: bucketing stays below the int16 quantization floor
    auto16 = spt.decode(codes, pcm16=True)["syn_wav_list"]
    full16 = spt.decode(codes, pcm16=True, len_buckets=None)["syn_wav_list"]
    for a, b in zip(auto16, full16):
        np.testing.assert_allclose(a, b, atol=1.5 / 32768.0)
