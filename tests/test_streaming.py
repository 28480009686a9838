"""Streaming decode: segment-wise generation must equal one-shot generation,
and streaming synthesis must emit the same total audio length."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_ttsd_tpu.core.config import CodecConfig, LMConfig
from moss_ttsd_tpu.decode.engine import GenerationEngine
from moss_ttsd_tpu.models.lm import AsteroidLM
from moss_ttsd_tpu.pipeline.prompt import left_pad_batch

from tests.test_decode import greedy_sampling, make_prompt, tiny_cfg


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_cfg()
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))
    return cfg, GenerationEngine(cfg, params, greedy_sampling(), bucket=32,
                                 cache_dtype=jnp.float32)


def _prompt(cfg, n=2):
    rng = np.random.default_rng(11)
    prompts = [make_prompt(cfg, rng, 5 + i, 3) for i in range(n)]
    return left_pad_batch(prompts, cfg.pad_token_id, cfg.speech_pad_token)


def test_stream_matches_oneshot(engine):
    cfg, eng = engine
    batch, mask = _prompt(cfg)
    full = eng.generate(batch, mask, max_new_tokens=16, seed=0)

    last = None
    yields = 0
    for res in eng.generate_stream(batch, mask, max_new_tokens=16, seed=0,
                                   chunk_steps=5):
        yields += 1
        last = res
    assert yields >= 2                       # actually segmented
    assert last.steps == full.steps
    np.testing.assert_array_equal(last.tokens, full.tokens)


def test_stream_early_stop(engine):
    """All rows finishing inside a segment ends the stream without running
    the remaining segments."""
    cfg, eng = engine
    batch, mask = _prompt(cfg, n=1)
    results = list(eng.generate_stream(batch, mask, max_new_tokens=64, seed=0,
                                       chunk_steps=8))
    # greedy tiny model hits eos quickly; stream must stop at the same step
    full = eng.generate(batch, mask, max_new_tokens=64, seed=0)
    assert results[-1].steps == full.steps
    assert results[-1].steps < 64


def test_pipeline_stream_item_total_length():
    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    from moss_ttsd_tpu.pipeline.batch import TTSPipeline
    from moss_ttsd_tpu.utils.mock_tokenizer import MockTokenizer

    tok = MockTokenizer()
    # speech range dominates the tiny vocab so the random model emits speech
    lm_cfg = LMConfig(dtype="float32", param_dtype="float32").tiny(
        vocab_size=300, speech_vocab_size=65, speech_pad_token=64,
        speech_token_range=(0, 290), eos_token_id=290,
        pad_token_id=tok.pad_token_id)
    codec_cfg = CodecConfig().tiny()
    model = AsteroidLM(lm_cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, lm_cfg.channels), jnp.int32))
    spt = XYTokenizer.init_random(codec_cfg, seed=0)
    pipe = TTSPipeline(tok, lm_cfg, params, spt,
                       greedy_sampling(), bucket=32)
    pipe.engine.cache_dtype = jnp.float32

    item = {"text": "[S1]hello world[S2]general kenobi"}
    chunks = [c for c, sr in pipe.stream_item(item, max_new_tokens=12,
                                              chunk_steps=4)]
    assert chunks, "stream produced no audio"
    total = sum(len(c) for c in chunks)

    _, audio = pipe.process_batch([item], max_new_tokens=12)
    assert audio[0] is not None
    assert total == audio[0]["audio_data"].shape[-1]
    assert all(np.isfinite(c).all() for c in chunks)


def test_pipeline_stream_item_oversized_chunk_steps():
    """chunk_steps larger than one codec window must not overflow the
    vocode bucket ladder: windows cap at one codec chunk per dispatch and
    the remainder drains, preserving the total sample count."""
    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    from moss_ttsd_tpu.pipeline.batch import TTSPipeline
    from moss_ttsd_tpu.utils.mock_tokenizer import MockTokenizer

    tok = MockTokenizer()
    lm_cfg = LMConfig(dtype="float32", param_dtype="float32").tiny(
        vocab_size=300, speech_vocab_size=65, speech_pad_token=64,
        speech_token_range=(0, 290), eos_token_id=290,
        pad_token_id=tok.pad_token_id)
    codec_cfg = CodecConfig().tiny()
    model = AsteroidLM(lm_cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, lm_cfg.channels), jnp.int32))
    spt = XYTokenizer.init_random(codec_cfg, seed=0)
    # shrink the codec window so a modest generation spans several windows
    spt.chunk_seconds = 2
    spt.chunk_samples = 2 * spt.input_sample_rate
    spt.chunk_codes = spt.chunk_samples // codec_cfg.encoder_downsample_rate
    pipe = TTSPipeline(tok, lm_cfg, params, spt,
                       greedy_sampling(), bucket=32)
    pipe.engine.cache_dtype = jnp.float32

    steps = 2 * spt.chunk_codes + 3     # > one codec window per segment
    item = {"text": "[S1]hello world[S2]general kenobi"}
    chunks = [c for c, sr in pipe.stream_item(
        item, max_new_tokens=steps, chunk_steps=10 * spt.chunk_codes,
        first_chunk_steps=10 * spt.chunk_codes)]
    assert chunks, "stream produced no audio"
    total = sum(len(c) for c in chunks)
    _, audio = pipe.process_batch([item], max_new_tokens=steps)
    assert audio[0] is not None
    assert total == audio[0]["audio_data"].shape[-1]


def test_stream_vocoder_context_guard():
    """context_frames >= the codec window can never advance the sliding
    feed window (finish() would loop forever) — the constructor refuses."""
    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    from moss_ttsd_tpu.pipeline.batch import StreamVocoder
    spt = XYTokenizer.init_random(CodecConfig().tiny(), seed=0)
    with pytest.raises(ValueError, match="context_frames"):
        StreamVocoder(spt, context_frames=spt.chunk_codes)
    with pytest.raises(ValueError, match="context_frames"):
        StreamVocoder(spt, context_frames=-1)
    sv = StreamVocoder(spt, context_frames=spt.chunk_codes - 1)  # ok
    assert sv.context == spt.chunk_codes - 1


def test_effective_context_matches_incremental_stride():
    """effective_context derives its window-fit clamp from the SAME
    chunk_stride_codes helper IncrementalDecoder uses (the floor placement
    is off-by-one-sensitive; two copies of the formula could drift)."""
    from moss_ttsd_tpu.models.codec.model import (IncrementalDecoder,
                                                  XYTokenizer,
                                                  chunk_stride_codes)
    from moss_ttsd_tpu.pipeline.batch import StreamVocoder
    spt = XYTokenizer.init_random(CodecConfig().tiny(), seed=0)
    for overlap in range(spt.chunk_seconds):
        stride = chunk_stride_codes(spt, overlap)
        assert IncrementalDecoder(spt, overlap_seconds=overlap
                                  ).duration_codes == stride
        assert StreamVocoder.effective_context(
            spt, overlap, feed_steps=stride, context_frames=25) == 0
