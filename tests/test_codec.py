"""Codec (XYTokenizer) tests: rate contracts, chunking semantics, RVQ inverses.

Uses the tiny random-weight config — all rate/shape contracts are preserved
(12.5 Hz codes, 1280x encoder downsample, 1920x decoder upsample).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_ttsd_tpu.core.config import CodecConfig, RVQConfig
from moss_ttsd_tpu.models.codec.model import XYTokenizer, XYTokenizerModule
from moss_ttsd_tpu.models.codec.rvq import ResidualVQ, nearest_codes, ema_update


@pytest.fixture(scope="module")
def tiny_codec():
    return XYTokenizer.init_random(CodecConfig().tiny(), seed=0)


def test_tokenize_rate_contract(tiny_codec):
    """30 s chunk -> 3000 mel -> 1500 @50Hz -> 375 codes @12.5 Hz."""
    spt = tiny_codec
    wav = np.random.default_rng(0).standard_normal((2, 480000)).astype(np.float32) * 0.1
    lens = jnp.array([480000, 240000])
    out = spt._tokenize(spt.params, jnp.asarray(wav), lens)
    assert out["codes"].shape == (8, 2, 375)
    np.testing.assert_array_equal(np.asarray(out["codes_lengths"]), [375, 187])
    assert out["zq"].shape == (2, 375, 128)


def test_detokenize_rate_contract(tiny_codec):
    spt = tiny_codec
    codes = jnp.zeros((8, 2, 375), jnp.int32)
    out = spt._detokenize(spt.params, codes, jnp.array([375, 100]))
    assert out["wav"].shape == (2, 375 * 1920)     # 720000 @ 24 kHz = 30 s
    np.testing.assert_array_equal(np.asarray(out["wav_lengths"]), [720000, 192000])


def test_encode_trims_to_item_length(tiny_codec):
    spt = tiny_codec
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(16000 * 3).astype(np.float32) * 0.1,
            rng.standard_normal(16000 * 7 + 123).astype(np.float32) * 0.1]
    out = spt.encode(wavs, overlap_seconds=10)
    codes = out["codes_list"]
    assert codes[0].shape == (8, 16000 * 3 // 1280)       # 37
    assert codes[1].shape == (8, (16000 * 7 + 123) // 1280)
    assert codes[0].dtype in (np.int32, np.int64)


def test_encode_long_chunking_consistency(tiny_codec):
    """>30 s audio goes through the sliding window; the first stride of codes
    must equal the codes of the single-chunk prefix (right-context only affects
    nothing before the stride boundary — reference model.py:159-188)."""
    spt = tiny_codec
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(16000 * 45).astype(np.float32) * 0.1
    long_codes = spt.encode([wav], overlap_seconds=10)["codes_list"][0]
    assert long_codes.shape == (8, 45 * 25 // 2)          # 12.5 Hz -> 562
    short_codes = spt.encode([wav[:480000]], overlap_seconds=10)["codes_list"][0]
    np.testing.assert_array_equal(long_codes[:, :250], short_codes[:, :250])


def test_decode_roundtrip_shapes(tiny_codec):
    spt = tiny_codec
    rng = np.random.default_rng(3)
    codes = [rng.integers(0, 64, (8, 100)).astype(np.int32),
             rng.integers(0, 64, (8, 400)).astype(np.int32)]   # 8s and 32s
    out = spt.decode(codes, overlap_seconds=10)
    wavs = out["syn_wav_list"]
    assert wavs[0].shape == (100 * 1920,)
    assert wavs[1].shape == (400 * 1920,)
    assert np.isfinite(wavs[0]).all() and np.isfinite(wavs[1]).all()


def test_encode_batch_padding_invariance(tiny_codec):
    """An item's codes must not change when batched with a longer item."""
    spt = tiny_codec
    rng = np.random.default_rng(4)
    a = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    b = rng.standard_normal(16000 * 5).astype(np.float32) * 0.1
    solo = spt.encode([a])["codes_list"][0]
    batched = spt.encode([a, b])["codes_list"][0]
    np.testing.assert_array_equal(solo, batched)


def test_rvq_decode_inverts_quantize():
    """decode(codes) must equal the quantized embedding zq (same path)."""
    cfg = RVQConfig(input_dim=32, rvq_dim=16, output_dim=32, num_quantizers=4,
                    codebook_size=32, codebook_dim=16)
    mod = ResidualVQ(cfg)
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    lens = jnp.array([10, 10])
    params = mod.init(jax.random.PRNGKey(0), z, lens)
    zq, codes, _, _ = mod.apply(params, z, lens)
    decoded = mod.apply(params, codes, method=ResidualVQ.decode)
    np.testing.assert_allclose(np.asarray(zq), np.asarray(decoded), atol=1e-5)


def test_nearest_codes_matches_bruteforce():
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.standard_normal((7, 5)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((13, 5)).astype(np.float32))
    idx = np.asarray(nearest_codes(z, cb))
    brute = np.argmin(((np.asarray(z)[:, None] - np.asarray(cb)[None]) ** 2).sum(-1), -1)
    np.testing.assert_array_equal(idx, brute)


def test_ema_update_moves_codebook_toward_data():
    rng = np.random.default_rng(7)
    K, D, N = 8, 4, 100
    cb = jnp.asarray(rng.standard_normal((K, D)).astype(np.float32))
    cluster = jnp.ones((K,))
    avg = cb * cluster[:, None]
    enc = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32)) + 5.0
    idx = nearest_codes(enc, cb)
    new_cluster, new_avg, new_cb = ema_update(cluster, avg, cb, enc, idx, decay=0.5)
    # codebook entries with assignments move toward the (shifted) data
    used = np.asarray(jax.nn.one_hot(idx, K).sum(0)) > 0
    assert np.asarray(new_cb)[used].mean() > np.asarray(cb)[used].mean()


def test_ema_update_psum_equivalence():
    """psum-over-mesh EMA == single-host EMA on the concatenated batch
    (the TPU equivalent of the reference's NCCL all_reduce protocol)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rng = np.random.default_rng(8)
    K, D, N = 8, 4, 64
    cb = jnp.asarray(rng.standard_normal((K, D)).astype(np.float32))
    cluster = jnp.ones((K,))
    avg = cb.copy()
    enc = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    idx = nearest_codes(enc, cb)

    ref_out = ema_update(cluster, avg, cb, enc, idx)

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))
    f = shard_map(
        lambda c, a, b, e, i: ema_update(c, a, b, e, i, axis_name="data"),
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data")),
        out_specs=(P(), P(), P()))
    dist_out = f(cluster, avg, cb, enc, idx)
    for r, d in zip(ref_out, dist_out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(d), rtol=1e-5, atol=1e-5)


def test_checkpoint_roundtrip(tiny_codec, tmp_path):
    from moss_ttsd_tpu.core.checkpoint import save_pytree, load_pytree
    p = str(tmp_path / "codec.npz")
    save_pytree(p, tiny_codec.params)
    restored = load_pytree(p)
    flat_a = jax.tree.leaves(tiny_codec.params)
    flat_b = jax.tree.leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_pcm16_matches_fp32():
    """pcm16 readback differs from fp32 only by 16-bit quantization."""
    import numpy as np
    from moss_ttsd_tpu.core.config import CodecConfig
    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    spt = XYTokenizer.init_random(CodecConfig().tiny(), seed=0)
    rng = np.random.default_rng(0)
    codes = [rng.integers(0, spt.cfg.quantizer.codebook_size,
                          (spt.nq, 9)).astype(np.int32)]
    a = spt.decode(codes, overlap_seconds=10)["syn_wav_list"][0]
    b = spt.decode(codes, overlap_seconds=10, pcm16=True)["syn_wav_list"][0]
    assert a.shape == b.shape
    np.testing.assert_allclose(np.clip(a, -1, 1), b, atol=1.5 / 32768.0)
