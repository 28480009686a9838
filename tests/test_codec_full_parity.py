"""FULL-codec parity: the reference XY_Tokenizer (tiny geometry, random torch
weights, run as a test-time oracle) vs our XYTokenizer after weight
conversion — covering the mel frontend, both encoders, adapters, RVQ,
decoder, Vocos, AND the 30 s chunked encode/decode contracts."""
import numpy as np
import pytest

from tests.ref_oracle import install_reference_stubs, reference_available

from moss_ttsd_tpu.core.config import CodecConfig
from moss_ttsd_tpu.models.codec.model import XYTokenizer
from moss_ttsd_tpu.utils.convert_codec import convert_codec_state_dict

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")


def tiny_generator_params(cfg: CodecConfig) -> dict:
    """Reference generator_params mirroring CodecConfig.tiny()."""
    def enc_kwargs(c):
        return dict(num_mel_bins=c.num_mel_bins, sampling_rate=c.sampling_rate,
                    hop_length=c.hop_length, stride_size=c.stride_size,
                    kernel_size=c.kernel_size, d_model=c.d_model,
                    scale_embedding=c.scale_embedding,
                    max_audio_seconds=c.max_audio_seconds,
                    encoder_layers=c.encoder_layers,
                    encoder_attention_heads=c.encoder_attention_heads,
                    encoder_ffn_dim=c.encoder_ffn_dim,
                    activation_function=c.activation_function)

    def adapter_kwargs(c):
        return dict(input_dim=c.input_dim, output_dim=c.output_dim,
                    d_model=c.d_model,
                    max_source_positions=c.max_source_positions,
                    encoder_layers=c.encoder_layers,
                    encoder_attention_heads=c.encoder_attention_heads,
                    encoder_ffn_dim=c.encoder_ffn_dim)

    dec = cfg.acoustic_decoder
    q = cfg.quantizer
    v = cfg.vocos
    return {
        "input_sample_rate": cfg.input_sample_rate,
        "output_sample_rate": cfg.output_sample_rate,
        "feature_extractor_kwargs": dict(
            chunk_length=30, feature_size=80, hop_length=160, n_fft=400,
            n_samples=480000, nb_max_frames=3000, padding_side="right",
            padding_value=0.0, return_attention_mask=False,
            sampling_rate=cfg.input_sample_rate),
        "semantic_encoder_kwargs": enc_kwargs(cfg.semantic_encoder),
        "semantic_encoder_adapter_kwargs": adapter_kwargs(
            cfg.semantic_encoder_adapter),
        "acoustic_encoder_kwargs": enc_kwargs(cfg.acoustic_encoder),
        "pre_rvq_adapter_kwargs": adapter_kwargs(cfg.pre_rvq_adapter),
        "downsample_kwargs": dict(d_model=cfg.downsample_d_model,
                                  avg_pooler=cfg.downsample_factor),
        "quantizer_kwargs": dict(
            input_dim=q.input_dim, rvq_dim=q.rvq_dim, output_dim=q.output_dim,
            num_quantizers=q.num_quantizers, codebook_size=q.codebook_size,
            codebook_dim=q.codebook_dim, quantizer_dropout=0.0, commitment=1,
            kmeans_init=False, skip_rvq_ratio=0.0),
        "post_rvq_adapter_kwargs": adapter_kwargs(cfg.post_rvq_adapter),
        "upsample_kwargs": dict(d_model=cfg.upsample_d_model,
                                stride=cfg.upsample_stride),
        "acoustic_decoder_kwargs": dict(
            num_mel_bins=dec.num_mel_bins, sampling_rate=dec.sampling_rate,
            hop_length=dec.hop_length, stride_size=dec.stride_size,
            kernel_size=dec.kernel_size, d_model=dec.d_model,
            scale_embedding=dec.scale_embedding,
            max_audio_seconds=dec.max_audio_seconds,
            decoder_layers=dec.decoder_layers,
            decoder_attention_heads=dec.decoder_attention_heads,
            decoder_ffn_dim=dec.decoder_ffn_dim,
            activation_function=dec.activation_function),
        "vocos_kwargs": dict(input_channels=v.input_channels, dim=v.dim,
                             intermediate_dim=v.intermediate_dim,
                             num_layers=v.num_layers, n_fft=v.n_fft,
                             hop_size=v.hop_size, padding=v.padding),
    }


@pytest.fixture(scope="module")
def pair():
    install_reference_stubs()
    import torch
    from xy_tokenizer.model import XY_Tokenizer

    torch.manual_seed(7)
    cfg = CodecConfig().tiny()
    ref = XY_Tokenizer(tiny_generator_params(cfg)).eval()
    ours = XYTokenizer(cfg, convert_codec_state_dict(ref.state_dict(), cfg))
    return ref, ours


def test_encode_codes_agree(pair):
    import torch
    ref, ours = pair
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(24000).astype(np.float32) * 0.2,
            rng.standard_normal(16000).astype(np.float32) * 0.2]

    ref_out = ref.encode([torch.from_numpy(w) for w in wavs],
                         overlap_seconds=10, device=torch.device("cpu"))
    our_out = ours.encode(wavs, overlap_seconds=10)

    for rc, oc in zip(ref_out["codes_list"], our_out["codes_list"]):
        rc = rc.numpy()
        oc = np.asarray(oc)
        assert rc.shape == oc.shape
        agree = (rc == oc).mean()
        # tiny random model: mel-frontend float differences can flip a few
        # nearest-neighbour assignments; require near-total agreement
        assert agree > 0.95, f"code agreement {agree:.3f}"


def test_decode_wav_parity_on_same_codes(pair):
    import torch
    ref, ours = pair
    rng = np.random.default_rng(1)
    nq = ours.nq
    codes = [rng.integers(0, ours.cfg.quantizer.codebook_size,
                          (nq, 17)).astype(np.int64),
             rng.integers(0, ours.cfg.quantizer.codebook_size,
                          (nq, 11)).astype(np.int64)]

    # reference decoded ITEM-BY-ITEM: batched reference decode leaks
    # deconv-bias garbage into short rows' tails (its vocos does not mask
    # padded rows); our masked vocos gives every row the reference's
    # single-item semantics, so that is the contract to verify
    our_out = ours.decode([c.astype(np.int32) for c in codes],
                          overlap_seconds=10)
    for c, ow in zip(codes, our_out["syn_wav_list"]):
        rw = ref.decode([torch.from_numpy(c)], overlap_seconds=10,
                        device=torch.device("cpu"))["syn_wav_list"][0]
        rw = rw.numpy().reshape(-1)
        ow = np.asarray(ow)
        assert rw.shape == ow.shape
        scale = max(np.abs(rw).max(), 1e-6)
        np.testing.assert_allclose(ow / scale, rw / scale, atol=2e-3)


def test_long_input_chunked_encode_agrees(pair):
    """> 30 s input exercises the sliding-window chunking on both sides."""
    import torch
    ref, ours = pair
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(16000 * 41) * 0.2).astype(np.float32)
    ref_out = ref.encode([torch.from_numpy(wav)], overlap_seconds=10,
                         device=torch.device("cpu"))
    our_out = ours.encode([wav], overlap_seconds=10)
    rc = ref_out["codes_list"][0].numpy()
    oc = np.asarray(our_out["codes_list"][0])
    assert rc.shape == oc.shape == (ours.nq, 16000 * 41 // 1280)
    assert (rc == oc).mean() > 0.95
