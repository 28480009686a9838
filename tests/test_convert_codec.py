"""Codec converter tests: conv-convention parity vs torch + tree-structure
equality against a randomly initialized XYTokenizerModule."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from moss_ttsd_tpu.core.config import CodecConfig
from moss_ttsd_tpu.utils.convert_codec import (conv_kernel, deconv_kernel,
                                               convert_codec_state_dict, _SD,
                                               wn_dense)


def test_conv1d_kernel_convention():
    import torch
    tc = torch.nn.Conv1d(6, 10, 3, padding=1)
    x = torch.randn(2, 6, 12)
    with torch.no_grad():
        ref = tc(x).numpy()                        # (B, out, T)

    conv = nn.Conv(10, (3,), padding=[(1, 1)])
    params = {"params": {"kernel": jnp.asarray(conv_kernel(tc.weight.detach().numpy())),
                         "bias": jnp.asarray(tc.bias.detach().numpy())}}
    ours = conv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref,
                               atol=1e-5)


@pytest.mark.parametrize("stride,k", [(2, 3), (1, 3), (4, 4)])
def test_convtranspose1d_kernel_convention(stride, k):
    import torch
    tc = torch.nn.ConvTranspose1d(6, 10, k, stride=stride)
    x = torch.randn(2, 6, 9)
    with torch.no_grad():
        ref = tc(x).numpy()

    deconv = nn.ConvTranspose(10, (k,), strides=(stride,), padding="VALID")
    params = {"params": {"kernel": jnp.asarray(deconv_kernel(tc.weight.detach().numpy())),
                         "bias": jnp.asarray(tc.bias.detach().numpy())}}
    ours = deconv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    assert ours.shape[1] == ref.shape[2]
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref,
                               atol=1e-5)


def test_weight_norm_fold():
    import torch
    from torch.nn.utils import weight_norm
    tc = weight_norm(torch.nn.Conv1d(8, 4, 1))
    x = torch.randn(2, 8, 5)
    with torch.no_grad():
        ref = tc(x).numpy()
    sd2 = _SD({f"p.{k}": v for k, v in tc.state_dict().items()})
    d = wn_dense(sd2, "p")
    ours = x.numpy().transpose(0, 2, 1) @ np.asarray(d["kernel"]) + d["bias"]
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=1e-5)


def test_converter_tree_matches_module_init():
    """Converted tiny-torch state dict must produce exactly the tree that a
    random XYTokenizerModule init produces (same paths, same shapes)."""
    import torch
    torch.manual_seed(0)
    cfg = CodecConfig().tiny()

    sd = {}

    def add_linear(prefix, i, o, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o)

    def add_conv(prefix, i, o, k, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i, k)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o)

    def add_deconv(prefix, i, o, k, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(i, o, k)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o)

    def add_ln(prefix, d):
        sd[f"{prefix}.weight"] = torch.randn(d)
        sd[f"{prefix}.bias"] = torch.randn(d)

    def add_layer(prefix, d, ffn):
        for p, bias in [("q_proj", True), ("k_proj", False), ("v_proj", True),
                        ("out_proj", True)]:
            add_linear(f"{prefix}.self_attn.{p}", d, d, bias)
        add_ln(f"{prefix}.self_attn_layer_norm", d)
        add_ln(f"{prefix}.final_layer_norm", d)
        add_linear(f"{prefix}.fc1", d, ffn)
        add_linear(f"{prefix}.fc2", ffn, d)

    def add_encoder(prefix, c):
        add_conv(f"{prefix}.conv1", c.num_mel_bins, c.d_model, 3)
        add_conv(f"{prefix}.conv2", c.d_model, c.d_model, 3)
        add_ln(f"{prefix}.layer_norm", c.d_model)
        for i in range(c.encoder_layers):
            add_layer(f"{prefix}.layers.{i}", c.d_model, c.encoder_ffn_dim)

    def add_adapter(prefix, c):
        if c.input_dim != c.d_model:
            add_linear(f"{prefix}.proj", c.input_dim, c.d_model)
        if c.output_dim != c.d_model:
            add_linear(f"{prefix}.out_proj", c.d_model, c.output_dim)
        add_ln(f"{prefix}.layer_norm", c.d_model)
        for i in range(c.encoder_layers):
            add_layer(f"{prefix}.layers.{i}", c.d_model, c.encoder_ffn_dim)

    add_encoder("semantic_encoder", cfg.semantic_encoder)
    add_adapter("semantic_encoder_adapter", cfg.semantic_encoder_adapter)
    add_encoder("acoustic_encoder", cfg.acoustic_encoder)
    add_adapter("pre_rvq_adapter", cfg.pre_rvq_adapter)
    d = cfg.downsample_d_model
    r = cfg.downsample_factor
    add_conv("downsample.gate_proj", d, d * r, r, bias=False)
    add_conv("downsample.up_proj", d, d * r, r, bias=False)
    add_linear("downsample.down_proj", d * r, d * r, bias=False)
    add_ln("downsample.layer_norm", d * r)
    q = cfg.quantizer
    for i in range(q.num_quantizers):
        sd[f"quantizer.quantizers.{i}.codebook"] = torch.randn(q.codebook_size,
                                                               q.codebook_dim)
    sd["quantizer.input_proj.weight_v"] = torch.randn(q.rvq_dim, q.input_dim, 1)
    sd["quantizer.input_proj.weight_g"] = torch.randn(q.rvq_dim, 1, 1)
    sd["quantizer.input_proj.bias"] = torch.randn(q.rvq_dim)
    sd["quantizer.output_proj.weight_v"] = torch.randn(q.output_dim, q.rvq_dim, 1)
    sd["quantizer.output_proj.weight_g"] = torch.randn(q.output_dim, 1, 1)
    sd["quantizer.output_proj.bias"] = torch.randn(q.output_dim)
    add_adapter("post_rvq_adapter", cfg.post_rvq_adapter)
    add_deconv("upsample.up_conv", cfg.upsample_d_model * cfg.upsample_stride,
               cfg.upsample_d_model, cfg.upsample_stride, bias=False)
    dec = cfg.acoustic_decoder
    add_deconv("acoustic_decoder.deconv1", dec.d_model, dec.d_model, 3)
    add_deconv("acoustic_decoder.deconv2", dec.d_model, dec.num_mel_bins, 3)
    add_ln("acoustic_decoder.layer_norm", dec.d_model)
    for i in range(dec.decoder_layers):
        add_layer(f"acoustic_decoder.layers.{i}", dec.d_model, dec.decoder_ffn_dim)
    v = cfg.vocos
    add_conv("enhanced_vocos.backbone.embed", v.input_channels, v.dim, 7)
    add_ln("enhanced_vocos.backbone.norm", v.dim)
    add_ln("enhanced_vocos.backbone.final_layer_norm", v.dim)
    for i in range(v.num_layers):
        p = f"enhanced_vocos.backbone.convnext.{i}"
        add_conv(f"{p}.dwconv", 1, v.dim, 7)   # depthwise: groups=dim -> (dim,1,7)
        add_ln(f"{p}.norm", v.dim)
        add_linear(f"{p}.pwconv1", v.dim, v.intermediate_dim)
        add_linear(f"{p}.pwconv2", v.intermediate_dim, v.dim)
        sd[f"{p}.gamma"] = torch.randn(v.dim)
    add_linear("enhanced_vocos.head.out", v.dim, v.n_fft + 2)

    converted = convert_codec_state_dict(sd, cfg)

    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    ref = XYTokenizer.init_random(cfg, seed=0).params

    ref_flat = {"/".join(str(k.key) for k in path): leaf.shape
                for path, leaf in jax.tree_util.tree_flatten_with_path(ref)[0]}
    conv_flat = {"/".join(str(k.key) for k in path): np.asarray(leaf).shape
                 for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]}
    missing = set(ref_flat) - set(conv_flat)
    extra = set(conv_flat) - set(ref_flat)
    assert not missing, f"converter missing params: {sorted(missing)[:10]}"
    assert not extra, f"converter extra params: {sorted(extra)[:10]}"
    for k in ref_flat:
        assert ref_flat[k] == conv_flat[k], \
            f"shape mismatch at {k}: {ref_flat[k]} vs {conv_flat[k]}"


def test_depthwise_conv_convention():
    """torch groups=dim Conv1d (dim,1,7) vs flax feature_group_count=dim."""
    import torch
    dim = 8
    tc = torch.nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
    x = torch.randn(2, dim, 16)
    with torch.no_grad():
        ref = tc(x).numpy()
    conv = nn.Conv(dim, (7,), padding=[(3, 3)], feature_group_count=dim)
    params = {"params": {"kernel": jnp.asarray(conv_kernel(tc.weight.detach().numpy())),
                         "bias": jnp.asarray(tc.bias.detach().numpy())}}
    ours = conv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-5)


def test_restack_legacy_pytree_roundtrip():
    """A pre-scan native checkpoint (per-layer layer_i/block_i subtrees)
    upgrades to the scanned layout: unstacking a fresh init back to the
    legacy layout and restacking restores the exact tree, and the model
    runs on the upgraded params (load_from_checkpoint applies this on its
    native-pytree branch)."""
    from moss_ttsd_tpu.core.config import CodecConfig
    from moss_ttsd_tpu.models.codec.model import XYTokenizer
    from moss_ttsd_tpu.utils.convert_codec import restack_legacy_pytree

    cfg = CodecConfig().tiny()
    tok = XYTokenizer.init_random(cfg, seed=0)

    def unstack(tree):
        # inverse of restack: {"layers": {"layer": (L, ...)}} -> layer_i
        if not isinstance(tree, dict):
            return tree
        out = {k: unstack(v) for k, v in tree.items()}
        for group, inner, prefix in (("layers", "layer", "layer_"),
                                     ("blocks", "block", "block_")):
            sub = out.get(group)
            if isinstance(sub, dict) and set(sub) == {inner}:
                stacked = sub[inner]
                L = jax.tree_util.tree_leaves(stacked)[0].shape[0]
                del out[group]
                for i in range(L):
                    out[f"{prefix}{i}"] = jax.tree_util.tree_map(
                        lambda x: np.asarray(x)[i], stacked)
        return out

    legacy = unstack(tok.params)
    # the legacy tree really is a different layout...
    assert "layer_0" in str(jax.tree_util.tree_structure(legacy))
    assert "block_0" in str(jax.tree_util.tree_structure(legacy))
    restacked = restack_legacy_pytree(legacy)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restacked, tok.params)

    # ...and the upgraded tree drives the scanned modules
    upgraded = XYTokenizer(cfg, restacked)
    wav = np.random.default_rng(0).standard_normal(
        cfg.input_sample_rate // 4).astype(np.float32)
    codes = upgraded.encode([wav])["codes_list"][0]
    ref_codes = tok.encode([wav])["codes_list"][0]
    np.testing.assert_array_equal(codes, ref_codes)
