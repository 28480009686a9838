"""Pipeline tests: text normalization rules, JSONL parsing, prompt assembly."""
import json
import numpy as np
import pytest

from moss_ttsd_tpu.pipeline.text import normalize_text, rewrite_speaker_tags
from moss_ttsd_tpu.pipeline.jsonl import process_jsonl_item, load_audio_data
from moss_ttsd_tpu.pipeline.prompt import build_prompt_ids, PROMPT_TEMPLATE
from moss_ttsd_tpu.utils.mock_tokenizer import MockTokenizer


class TestNormalizeText:
    def test_numeric_tags_become_speaker_tags(self):
        out = normalize_text("[1]hello there[2]hi")
        assert out.startswith("[S1]")
        assert "[S2]" in out

    def test_non_speaker_brackets_removed_content_kept(self):
        out = normalize_text("[S1]hello [music] world")
        assert "music" in out
        assert "[music]" not in out

    def test_decorative_symbols_removed(self):
        out = normalize_text("[S1]《hello》【x】（y）")
        for ch in "《》【】（）":
            assert ch not in out

    def test_internal_punct_to_comma(self):
        out = normalize_text("[S1]hello! are you; here: yes done.")
        assert "!" not in out and ";" not in out and ":" not in out
        assert out.endswith(".")

    def test_chinese_laughter(self):
        assert "(笑)" in normalize_text("[S1]哈哈哈真好。")
        assert "哈哈" not in normalize_text("[S1]哈哈哈真好。")

    def test_english_laughter(self):
        out = normalize_text("[S1]that's funny haha so good.")
        assert "(laughs)" in out

    def test_merge_adjacent_same_speaker(self):
        out = normalize_text("[S1]first. [S1]second. [S2]other.")
        assert out.count("[S1]") == 1
        assert out.count("[S2]") == 1

    def test_no_tags_passthrough(self):
        out = normalize_text("just some text without tags.")
        assert "just some text" in out

    def test_empty(self):
        assert normalize_text("") == ""

    def test_newlines_removed(self):
        assert "\n" not in normalize_text("[S1]line one\nline two.")

    def test_multiple_periods_only_last_kept(self):
        out = normalize_text("[S1]一句。两句。三句。")
        assert out.count("。") == 1
        assert out.endswith("。")


def test_rewrite_speaker_tags():
    assert rewrite_speaker_tags("[S1]a[S2]b") == "<speaker1>a<speaker2>b"


class TestProcessJsonlItem:
    def test_two_speaker_format(self):
        item = {"base_path": "examples", "text": "[S1]hi",
                "prompt_audio_speaker1": "a.wav", "prompt_text_speaker1": "t1",
                "prompt_audio_speaker2": "b.wav", "prompt_text_speaker2": "t2"}
        out = process_jsonl_item(item)
        assert out["prompt_audio"] == {"speaker1": "examples/a.wav",
                                       "speaker2": "examples/b.wav"}
        assert out["prompt_text"] == "[S1]t1[S2]t2"

    def test_single_reference_format(self):
        item = {"base_path": "ex", "text": "x", "prompt_audio": "ref.wav",
                "prompt_text": "[S1]a[S2]b"}
        out = process_jsonl_item(item)
        assert out["prompt_audio"] == "ex/ref.wav"
        assert out["prompt_text"] == "[S1]a[S2]b"

    def test_text_only_format(self):
        out = process_jsonl_item({"text": "[S1]hello"})
        assert out["prompt_audio"] is None
        assert out["prompt_text"] == ""

    def test_empty_prompt_audio_ignored(self):
        out = process_jsonl_item({"text": "t", "prompt_audio": "",
                                  "prompt_text": "p"})
        assert out["prompt_audio"] is None

    def test_real_example_files_parse(self):
        for name in ["examples.jsonl", "examples_only_text.jsonl",
                     "examples_single_reference.jsonl"]:
            with open(f"/root/reference/examples/{name}") as f:
                for line in f:
                    out = process_jsonl_item(json.loads(line))
                    assert out["text"]


def test_load_audio_merges_speakers(tmp_path):
    from moss_ttsd_tpu.utils.audio_io import write_wav
    sr = 16000
    a = np.zeros(sr, np.float32)
    b = np.ones(sr // 2, np.float32) * 0.5
    write_wav(str(tmp_path / "a.wav"), a, sr)
    write_wav(str(tmp_path / "b.wav"), b, sr)
    merged = load_audio_data({"speaker1": str(tmp_path / "a.wav"),
                              "speaker2": str(tmp_path / "b.wav")})
    assert merged.shape == (sr + sr // 2,)
    assert abs(merged[:sr]).max() < 1e-3
    assert merged[sr:].mean() > 0.4


def test_build_prompt_ids_template():
    tok = MockTokenizer()
    ids = build_prompt_ids(tok, "sys", "hello", channels=8, pad_token=1024)
    assert ids.shape[1] == 8
    assert (ids[:, 1:] == 1024).all()
    decoded = tok.decode(ids[:, 0])
    assert "<|begin_of_style|>" in decoded
    assert "<|begin_of_speech|>" in decoded


def test_build_prompt_ids_audio_offset():
    tok = MockTokenizer()
    codes = np.arange(16).reshape(2, 8)
    ids = build_prompt_ids(tok, "s", "t", audio_codes=codes, speech_offset=1000)
    assert ids[-2, 0] == 1000 + 0
    assert ids[-1, 0] == 1000 + 8
    assert ids[-1, 1] == 9


def test_process_batch_per_item_isolation():
    """A bad item (missing audio file) must not sink the batch
    (reference generation_utils.py:434-467 contract)."""
    import jax
    import jax.numpy as jnp
    from moss_ttsd_tpu.core.config import CodecConfig, LMConfig
    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.pipeline.batch import TTSPipeline
    from tests.test_decode import greedy_sampling

    tok = MockTokenizer()
    lm_cfg = LMConfig(dtype="float32", param_dtype="float32").tiny(
        vocab_size=300, speech_vocab_size=65, speech_pad_token=64,
        speech_token_range=(0, 290), eos_token_id=290,
        pad_token_id=tok.pad_token_id)
    model = AsteroidLM(lm_cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, lm_cfg.channels), jnp.int32))
    spt = XYTokenizer.init_random(CodecConfig().tiny(), seed=0)
    pipe = TTSPipeline(tok, lm_cfg, params, spt, greedy_sampling(), bucket=32)
    pipe.engine.cache_dtype = jnp.float32

    items = [
        {"text": "[S1]good item[S2]fine"},
        {"text": "[S1]bad", "prompt_audio": "/does/not/exist.wav",
         "prompt_text": "x"},
        {"text": "[S1]also good[S2]yes"},
    ]
    texts, audio = pipe.process_batch(items, max_new_tokens=8)
    assert len(texts) == 3 and len(audio) == 3
    assert "error" in texts[1] and audio[1] is None
    assert audio[0] is not None and audio[2] is not None
    assert texts[0]["index"] == 0 and texts[2]["index"] == 2


def test_process_batch_batched_prompt_encode_matches_per_item(tmp_path):
    """process_batch encodes all prompt voices in ONE batched codec call;
    the resulting prompt ids must equal the per-item prepare_item path
    (variable prompt lengths are masked inside the codec)."""
    import jax
    import jax.numpy as jnp
    from moss_ttsd_tpu.core.config import CodecConfig, LMConfig
    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.pipeline.batch import TTSPipeline
    from moss_ttsd_tpu.utils.audio_io import write_wav
    from tests.test_decode import greedy_sampling

    tok = MockTokenizer()
    lm_cfg = LMConfig(dtype="float32", param_dtype="float32").tiny(
        vocab_size=300, speech_vocab_size=65, speech_pad_token=64,
        speech_token_range=(0, 290), eos_token_id=290,
        pad_token_id=tok.pad_token_id)
    model = AsteroidLM(lm_cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, lm_cfg.channels), jnp.int32))
    spt = XYTokenizer.init_random(CodecConfig().tiny(), seed=0)
    pipe = TTSPipeline(tok, lm_cfg, params, spt, greedy_sampling(), bucket=32)
    pipe.engine.cache_dtype = jnp.float32

    rng = np.random.default_rng(0)
    sr = spt.input_sample_rate
    for name, secs in [("p1.wav", 0.5), ("p2.wav", 1.25)]:
        write_wav(str(tmp_path / name),
                  (rng.standard_normal(int(secs * sr)) * 0.1).astype(np.float32),
                  sr)

    items = [
        {"text": "[S1]cloned one[S2]ok", "prompt_audio": str(tmp_path / "p1.wav"),
         "prompt_text": "voice one"},
        {"text": "[S1]no clone here[S2]right"},
        {"text": "[S1]cloned two[S2]sure", "prompt_audio": str(tmp_path / "p2.wav"),
         "prompt_text": "voice two"},
    ]

    # reference path: per-item prepare (serial batch-1 codec encodes)
    expected = [pipe.prepare_item(dict(it))[0] for it in items]

    # capture what the batched path feeds the engine
    captured = {}
    orig_generate = pipe.engine.generate

    def spy(batch, mask, *a, **kw):
        captured["batch"], captured["mask"] = batch, mask
        return orig_generate(batch, mask, *a, **kw)

    pipe.engine.generate = spy
    texts, audio = pipe.process_batch(items, max_new_tokens=8)
    assert all("error" not in t for t in texts)

    from moss_ttsd_tpu.pipeline import prompt as pp
    exp_batch, exp_mask = pp.left_pad_batch(expected, tok.pad_token_id,
                                            lm_cfg.speech_pad_token)
    np.testing.assert_array_equal(captured["batch"], exp_batch)
    np.testing.assert_array_equal(captured["mask"], exp_mask)


def test_prepare_item_encode_cache(tmp_path):
    """A repeated prompt voice skips the codec encoders: prepare_item
    LRU-caches codes by wav content hash, and the cached request produces
    the identical shifted prompt. encode_cache_size=0 disables."""
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from scipy.io import wavfile

    rng = np.random.default_rng(3)
    wav = (rng.normal(0, 0.1, 16000) * 32767).astype(np.int16)
    path = tmp_path / "voice.wav"
    wavfile.write(path, 16000, wav)
    item = {"text": "[S1]hello there", "prompt_audio": str(path),
            "prompt_text": "[S1]ref"}

    pipe = build_tiny_pipeline()
    calls = []
    real_encode = pipe.spt.encode
    pipe.spt.encode = lambda *a, **k: (calls.append(1)
                                       or real_encode(*a, **k))
    first, _ = pipe.prepare_item(item)
    assert len(calls) == 1
    second, _ = pipe.prepare_item(item)
    assert len(calls) == 1, "second request should hit the encode cache"
    np.testing.assert_array_equal(first, second)
    # a different wav is a different key
    wavfile.write(path, 16000, (wav * 0.5).astype(np.int16))
    pipe.prepare_item(item)
    assert len(calls) == 2

    pipe.encode_cache_size = 0
    pipe.prepare_item(item)
    pipe.prepare_item(item)
    assert len(calls) == 4, "cache disabled: every request encodes"


def test_process_batch_single_voice_uses_cache(tmp_path):
    """A single-voice process_batch call shares the prompt-encode cache
    (it is encode-identical to the per-request path) and reproduces the
    uncached synthesis exactly."""
    from moss_ttsd_tpu.cli.inference import build_tiny_pipeline
    from scipy.io import wavfile

    rng = np.random.default_rng(5)
    wav = (rng.normal(0, 0.1, 16000) * 32767).astype(np.int16)
    path = tmp_path / "voice.wav"
    wavfile.write(path, 16000, wav)
    item = {"text": "[S1]cache check[S2]sure", "prompt_audio": str(path),
            "prompt_text": "[S1]ref"}

    pipe = build_tiny_pipeline()
    calls = []
    real_encode = pipe.spt.encode
    pipe.spt.encode = lambda *a, **k: (calls.append(1)
                                       or real_encode(*a, **k))
    _, audio1 = pipe.process_batch([item], max_new_tokens=6, seed=1)
    assert len(calls) == 1
    _, audio2 = pipe.process_batch([item], max_new_tokens=6, seed=1)
    assert len(calls) == 1, "repeat voice should hit the encode cache"
    if audio1[0] is None:       # tiny random model may emit no speech ids
        assert audio2[0] is None
    else:
        np.testing.assert_array_equal(audio1[0]["audio_data"],
                                      audio2[0]["audio_data"])
