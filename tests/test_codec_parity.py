"""Codec module ACTIVATION parity vs the reference implementation.

The reference's xy_tokenizer modules are imported at test time (librosa /
torchaudio stubbed — only two mel-scale helpers are touched), instantiated
tiny with random torch weights, converted through utils/convert_codec, and
compared output-for-output with our flax modules. Skips when /root/reference
is not mounted."""
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from moss_ttsd_tpu.core.config import (AudioDecoderConfig, AudioEncoderConfig,
                                       RVQConfig, VocosConfig)
from moss_ttsd_tpu.utils.convert_codec import (_SD, _audio_decoder,
                                               _audio_encoder, _vocos)

REF_ROOT = "/root/reference/XY_Tokenizer"


@pytest.fixture(scope="module")
def ref():
    """Import reference codec modules with stubbed librosa/torchaudio."""
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference tree not mounted")
    import math

    def mkmod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    mkmod("librosa")
    ta = mkmod("torchaudio")
    taf = mkmod("torchaudio.functional")
    taff = mkmod("torchaudio.functional.functional")

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
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from xy_tokenizer.nn import modules as ref_modules
    from xy_tokenizer.nn import quantizer as ref_quantizer
    return ref_modules, ref_quantizer


def prefixed_sd(module, prefix):
    import torch
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def test_audio_encoder_parity(ref):
    import torch
    ref_modules, _ = ref
    torch.manual_seed(0)
    cfg = AudioEncoderConfig(d_model=32, encoder_layers=2,
                             encoder_attention_heads=4, encoder_ffn_dim=64)
    enc = ref_modules.OmniAudioEncoder(
        num_mel_bins=cfg.num_mel_bins, sampling_rate=cfg.sampling_rate,
        hop_length=cfg.hop_length, stride_size=cfg.stride_size,
        kernel_size=cfg.kernel_size, d_model=cfg.d_model,
        scale_embedding=cfg.scale_embedding,
        max_audio_seconds=cfg.max_audio_seconds,
        encoder_layers=cfg.encoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        activation_function=cfg.activation_function).eval()

    B, T = 2, 50
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((B, cfg.num_mel_bins, T)).astype(np.float32)
    lens = np.array([50, 36], np.int64)
    with torch.no_grad():
        ref_out, ref_len = enc(torch.from_numpy(mel), torch.from_numpy(lens))

    from moss_ttsd_tpu.models.codec.transformer import AudioEncoder
    params = {"params": _audio_encoder(_SD(prefixed_sd(enc, "e")), "e",
                                       cfg.encoder_layers)}
    ours, our_len = AudioEncoder(cfg).apply(
        params, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(our_len), ref_len.numpy())
    np.testing.assert_allclose(np.asarray(ours),
                               ref_out.numpy().transpose(0, 2, 1), atol=2e-4)


def test_audio_decoder_parity(ref):
    import torch
    ref_modules, _ = ref
    torch.manual_seed(1)
    cfg = AudioDecoderConfig(d_model=32, decoder_layers=2,
                             decoder_attention_heads=4, decoder_ffn_dim=64)
    dec = ref_modules.OmniAudioDecoder(
        num_mel_bins=cfg.num_mel_bins, sampling_rate=cfg.sampling_rate,
        hop_length=cfg.hop_length, stride_size=cfg.stride_size,
        kernel_size=cfg.kernel_size, d_model=cfg.d_model,
        scale_embedding=cfg.scale_embedding,
        max_audio_seconds=cfg.max_audio_seconds,
        decoder_layers=cfg.decoder_layers,
        decoder_attention_heads=cfg.decoder_attention_heads,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        activation_function=cfg.activation_function).eval()

    B, T = 2, 25
    rng = np.random.default_rng(1)
    h = rng.standard_normal((B, cfg.d_model, T)).astype(np.float32)
    lens = np.array([25, 17], np.int64)
    with torch.no_grad():
        ref_out, ref_len = dec(torch.from_numpy(h), torch.from_numpy(lens))

    from moss_ttsd_tpu.models.codec.transformer import AudioDecoder
    params = {"params": _audio_decoder(_SD(prefixed_sd(dec, "d")), "d",
                                       cfg.decoder_layers)}
    ours, our_len = AudioDecoder(cfg).apply(
        params, jnp.asarray(h.transpose(0, 2, 1)), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(our_len), ref_len.numpy())
    np.testing.assert_allclose(np.asarray(ours),
                               ref_out.numpy().transpose(0, 2, 1), atol=2e-4)


def test_rvq_parity(ref):
    import torch
    _, ref_quantizer = ref
    torch.manual_seed(2)
    cfg = RVQConfig(input_dim=48, rvq_dim=16, output_dim=48, num_quantizers=4,
                    codebook_size=32, codebook_dim=16, quantizer_dropout=0.0)
    rvq = ref_quantizer.ResidualVQ(
        input_dim=cfg.input_dim, rvq_dim=cfg.rvq_dim,
        output_dim=cfg.output_dim, num_quantizers=cfg.num_quantizers,
        codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
        quantizer_dropout=0.0, kmeans_init=False,
        skip_rvq_ratio=0.0).eval()

    B, T = 2, 13
    rng = np.random.default_rng(2)
    z = rng.standard_normal((B, cfg.input_dim, T)).astype(np.float32)
    lens = np.array([13, 9], np.int64)
    with torch.no_grad():
        zq_ref, idx_ref, _, _, len_ref = rvq(torch.from_numpy(z),
                                             torch.from_numpy(lens))

    from moss_ttsd_tpu.models.codec.rvq import ResidualVQ as OurRVQ
    sd = _SD(prefixed_sd(rvq, "quantizer"))
    codebooks = np.stack([sd.get(f"quantizer.quantizers.{i}.codebook")
                          for i in range(cfg.num_quantizers)])
    from moss_ttsd_tpu.utils.convert_codec import wn_dense
    tree = {"codebook": codebooks,
            "input_proj": wn_dense(sd, "quantizer.input_proj"),
            "output_proj": wn_dense(sd, "quantizer.output_proj")}
    ours_zq, ours_codes, _, our_len = OurRVQ(cfg).apply(
        {"params": tree}, jnp.asarray(z.transpose(0, 2, 1)), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(ours_codes), idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(ours_zq),
                               zq_ref.numpy().transpose(0, 2, 1), atol=2e-4)

    # decode_codes inverse parity
    with torch.no_grad():
        emb_ref = rvq.decode_codes(idx_ref)
    ours_emb = OurRVQ(cfg).apply({"params": tree}, jnp.asarray(ours_codes),
                                 method=OurRVQ.decode)
    np.testing.assert_allclose(np.asarray(ours_emb),
                               emb_ref.numpy().transpose(0, 2, 1), atol=2e-4)


def test_vocos_parity(ref):
    import torch
    ref_modules, _ = ref
    torch.manual_seed(3)
    cfg = VocosConfig(input_channels=12, dim=16, intermediate_dim=32,
                      num_layers=2, n_fft=960, hop_size=240)
    voc = ref_modules.Vocos(input_channels=cfg.input_channels, dim=cfg.dim,
                            intermediate_dim=cfg.intermediate_dim,
                            num_layers=cfg.num_layers, n_fft=cfg.n_fft,
                            hop_size=cfg.hop_size, padding=cfg.padding).eval()

    # full lengths: the reference Vocos does no internal masking, so ragged
    # rows only match it through the decode driver (test_codec_full_parity)
    B, T = 2, 20
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, cfg.input_channels, T)).astype(np.float32)
    lens = np.array([20, 20], np.int64)
    with torch.no_grad():
        wav_ref, len_ref = voc(torch.from_numpy(x), torch.from_numpy(lens))

    from moss_ttsd_tpu.models.codec.vocos import Vocos as OurVocos
    params = {"params": _vocos(_SD(prefixed_sd(voc, "enhanced_vocos")),
                               "enhanced_vocos", cfg.num_layers)}
    ours, our_len = OurVocos(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 1)),
                                        jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(our_len), len_ref.numpy())
    np.testing.assert_allclose(np.asarray(ours), wav_ref.numpy()[:, 0, :],
                               atol=5e-4)
