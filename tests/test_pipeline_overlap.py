"""process_batch decode<->vocode overlap parity (round-2 VERDICT task #1).

The overlapped path (generation segments at codec-chunk completion points,
chunks vocoded while the LM keeps decoding) must produce byte-identical
audio to the fully serial path: same engine programs, same seed, and the
IncrementalDecoder dispatches the exact same device calls as
XYTokenizer.decode.
"""

import numpy as np
import pytest

from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
from moss_ttsd_tpu.models.codec.model import XYTokenizer


@pytest.fixture(scope="module")
def pipe():
    p = build_tiny_pipeline(seed=0, bucket=32)
    # shrink the codec window (4 s window / 2 s overlap -> 50-code chunks,
    # 25-code stride) so a short test generation spans several chunks; the
    # chunking contract is identical
    p.spt = XYTokenizer(p.spt.cfg, p.spt.params, chunk_seconds=4)
    p.vocode_overlap_s = 2
    return p


ITEMS = [{"text": "[S1]Overlap parity check one.[S2]And a reply."},
         {"text": "[S1]Second item with different text so row lengths "
                  "differ across the batch."}]


def run(pipe, overlap, steps=80, rows=None):
    pipe.overlap_vocode = overlap
    pipe.vocode_rows_per_call = rows
    return pipe.process_batch(list(ITEMS), max_new_tokens=steps, seed=3)


def test_overlap_matches_serial(pipe):
    texts_a, audio_a = run(pipe, overlap=False)
    texts_b, audio_b = run(pipe, overlap=True)
    assert [t.get("final_text") for t in texts_a] == \
        [t.get("final_text") for t in texts_b]
    assert len(audio_a) == len(audio_b)
    for a, b in zip(audio_a, audio_b):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_array_equal(a["audio_data"], b["audio_data"])
            assert a["sample_rate"] == b["sample_rate"]


def test_overlap_with_rows_per_call_matches(pipe):
    """Overlap + batch-split readback vs serial with the same split: the
    dispatched device calls are identical, so the audio is too."""
    audio_a = run(pipe, overlap=False, rows=1)[1]
    audio_b = run(pipe, overlap=True, rows=1)[1]
    for a, b in zip(audio_a, audio_b):
        if a is not None:
            np.testing.assert_array_equal(a["audio_data"], b["audio_data"])


def test_mixed_none_row_matches_serial(pipe, monkeypatch):
    """A batch where one row produces NO speech: the serial contract vocodes
    only valid rows (a different vocode batch dimension changes XLA reduction
    tiling), so the overlap path must fall back to the valid-rows-only vocode
    and stay byte-identical."""
    orig = type(pipe).extract_codes

    def drop_last_row(self, result):
        out = orig(self, result)
        out[-1] = None
        return out

    monkeypatch.setattr(type(pipe), "extract_codes", drop_last_row)
    audio_a = run(pipe, overlap=False)[1]
    audio_b = run(pipe, overlap=True)[1]
    assert audio_a[-1] is None and audio_b[-1] is None
    assert audio_a[0] is not None
    np.testing.assert_array_equal(audio_a[0]["audio_data"],
                                  audio_b[0]["audio_data"])


def test_single_window_takes_serial_path(pipe):
    """A generation inside one codec window has nothing to overlap — the
    pipeline must fall back to the one-shot generate (and still work)."""
    _, audio = run(pipe, overlap=True, steps=20)
    assert any(a is not None for a in audio)
