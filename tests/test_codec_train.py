"""Codec TRAINING parity and train-step tests.

The reference runs EMA codebook updates, quantizer dropout, skip-rvq bypass,
dead-code replacement, and k-means init inside VectorQuantize/ResidualVQ
forward during training (reference quantizer.py:92-152, 244-343). Here the
same behaviors are verified against the real reference modules run in TRAIN
mode (token/commit/codebook-movement parity), plus end-to-end tests of
train/codec_step.py including data-parallel-mesh equivalence.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moss_ttsd_tpu.core.config import CodecConfig, RVQConfig
from moss_ttsd_tpu.models.codec.rvq import (ResidualVQ, ema_update_stacked,
                                            kmeans_init)

from ref_oracle import reference_available, install_reference_stubs


@pytest.fixture(scope="module")
def ref_quantizer():
    if not reference_available():
        pytest.skip("reference tree not mounted")
    install_reference_stubs()
    from xy_tokenizer.nn import quantizer as ref_quantizer
    return ref_quantizer


def tiny_rvq_cfg(**kw):
    d = dict(input_dim=16, rvq_dim=16, output_dim=16, num_quantizers=3,
             codebook_size=12, codebook_dim=16, quantizer_dropout=0.0,
             skip_rvq_ratio=0.0, threshold_ema_dead=0.0)
    d.update(kw)
    return RVQConfig(**d)


def make_pair(ref_quantizer, cfg, seed=0):
    """A reference ResidualVQ (train mode) + our params with the SAME
    codebooks. Identity projections (input_dim == rvq_dim == codebook_dim ==
    output_dim) so the comparison isolates the VQ/EMA semantics."""
    import torch
    torch.manual_seed(seed)
    rvq = ref_quantizer.ResidualVQ(
        input_dim=cfg.input_dim, rvq_dim=cfg.rvq_dim,
        output_dim=cfg.output_dim, num_quantizers=cfg.num_quantizers,
        codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
        quantizer_dropout=cfg.quantizer_dropout,
        skip_rvq_ratio=cfg.skip_rvq_ratio,
        threshold_ema_dead=cfg.threshold_ema_dead,
        kmeans_init=False).train()
    codebooks = np.stack([q.codebook.numpy().copy() for q in rvq.quantizers])
    params = {"params": {"codebook": jnp.asarray(codebooks)}}
    return rvq, params, codebooks


def run_ref_train_forward(rvq, z_bdt, lens):
    """One reference train-mode forward (EMA buffers mutate in place)."""
    import torch
    zq, idx, commits, _, _ = rvq(torch.from_numpy(z_bdt),
                                 torch.from_numpy(lens))
    buffers = {
        "codebook": np.stack([q.codebook.detach().numpy() for q in rvq.quantizers]),
        "cluster_size": np.stack([q.cluster_size.numpy() for q in rvq.quantizers]),
        "embed_avg": np.stack([q.embed_avg.numpy() for q in rvq.quantizers]),
    }
    return (zq.detach().numpy(), idx.numpy(), commits.detach().numpy(),
            buffers)


def run_ours_train(cfg, params, z_btd, lens, rng, state=None, **overrides):
    """Our train_call + functional EMA, mirroring one reference step."""
    mod = ResidualVQ(cfg)
    zq, codes, commits, _, stats = mod.apply(
        params, jnp.asarray(z_btd), jnp.asarray(lens), rng,
        method=ResidualVQ.train_call, **overrides)
    codebook = params["params"]["codebook"]
    if state is None:
        state = (jnp.zeros(codebook.shape[:2], jnp.float32),
                 jnp.array(codebook, jnp.float32))
    cluster_size, embed_avg = state
    new_cluster, new_avg, new_cb = ema_update_stacked(
        cluster_size, embed_avg, stats["cluster_new"], stats["embed_sum"],
        decay=cfg.decay, epsilon=cfg.epsilon)
    if cfg.threshold_ema_dead > 0:
        dead = new_cluster < cfg.threshold_ema_dead
        new_cb = jnp.where(dead[..., None], stats["samples"], new_cb)
    return (np.asarray(zq), np.asarray(codes), np.asarray(commits),
            {"codebook": np.asarray(new_cb),
             "cluster_size": np.asarray(new_cluster),
             "embed_avg": np.asarray(new_avg)})


def test_rvq_train_ema_matches_reference(ref_quantizer):
    """Deterministic train mode (no dropout/skip/dead-replacement): outputs,
    codes, per-stage commit losses, AND the post-step EMA buffers (codebook /
    cluster_size / embed_avg) match the reference exactly."""
    cfg = tiny_rvq_cfg()
    rvq, params, _ = make_pair(ref_quantizer, cfg, seed=3)
    rng = np.random.default_rng(3)
    B, T = 4, 11
    z = rng.standard_normal((B, cfg.input_dim, T)).astype(np.float32)
    lens = np.array([11, 8, 11, 5], np.int64)

    ref_zq, ref_idx, ref_commits, ref_buf = run_ref_train_forward(
        rvq, z, lens)
    our_zq, our_idx, our_commits, our_buf = run_ours_train(
        cfg, params, z.transpose(0, 2, 1), lens, jax.random.PRNGKey(0))

    np.testing.assert_array_equal(our_idx, ref_idx)
    np.testing.assert_allclose(our_zq, ref_zq.transpose(0, 2, 1), atol=2e-5)
    np.testing.assert_allclose(our_commits, ref_commits, atol=2e-5)
    for k in ("cluster_size", "embed_avg", "codebook"):
        np.testing.assert_allclose(our_buf[k], ref_buf[k], atol=2e-5,
                                   err_msg=k)


def test_rvq_train_two_steps_codebook_movement(ref_quantizer):
    """Codebook movement tracks the reference across TWO consecutive train
    steps (EMA state threads through, second step quantizes against the
    EMA-moved codebook)."""
    cfg = tiny_rvq_cfg()
    rvq, params, _ = make_pair(ref_quantizer, cfg, seed=5)
    rng = np.random.default_rng(5)
    B, T = 3, 9
    lens = np.array([9, 9, 6], np.int64)
    state = None
    for step in range(2):
        z = rng.standard_normal((B, cfg.input_dim, T)).astype(np.float32)
        _, ref_idx, _, ref_buf = run_ref_train_forward(rvq, z, lens)
        _, our_idx, _, our_buf = run_ours_train(
            cfg, params, z.transpose(0, 2, 1), lens,
            jax.random.PRNGKey(step), state=state)
        np.testing.assert_array_equal(our_idx, ref_idx, err_msg=f"step {step}")
        # codebook magnitudes blow up while cluster_size warms up from zero
        # (EMA ratio), so compare relatively
        np.testing.assert_allclose(our_buf["codebook"], ref_buf["codebook"],
                                   rtol=1e-5, atol=5e-5,
                                   err_msg=f"step {step}")
        params = {"params": {"codebook": jnp.asarray(our_buf["codebook"])}}
        state = (jnp.asarray(our_buf["cluster_size"]),
                 jnp.asarray(our_buf["embed_avg"]))


def test_rvq_train_dropout_and_skip_match_reference(ref_quantizer,
                                                    monkeypatch):
    """Quantizer dropout (reference :269-273) + skip-rvq bypass (:262-267,
    284-310) with PINNED randomness: torch.randint/torch.rand are patched to
    fixed patterns and the same patterns are passed to train_call overrides."""
    import torch
    cfg = tiny_rvq_cfg(quantizer_dropout=0.5, skip_rvq_ratio=0.5)
    rvq, params, _ = make_pair(ref_quantizer, cfg, seed=7)
    rng = np.random.default_rng(7)
    B, T = 4, 10
    z = rng.standard_normal((B, cfg.input_dim, T)).astype(np.float32)
    lens = np.array([10, 7, 10, 4], np.int64)

    # n_dropout = int(4 * 0.5) = 2 -> rows 0,1 get drawn counts [1, 2]
    drawn = torch.tensor([1.0, 2.0, 3.0, 1.0])
    # rand < 0.5 -> skip pattern [False, True, False, True]
    randvals = torch.tensor([0.9, 0.1, 0.8, 0.2])
    monkeypatch.setattr(torch, "randint",
                        lambda *a, **k: drawn.clone().to(k.get("dtype", torch.float32)))
    monkeypatch.setattr(torch, "rand", lambda *a, **k: randvals.clone())

    ref_zq, ref_idx, ref_commits, ref_buf = run_ref_train_forward(
        rvq, z, lens)

    nq = cfg.num_quantizers
    n_active = np.full((B,), nq + 1, np.float32)
    n_active[:2] = [1.0, 2.0]
    skip = np.array([False, True, False, True])
    our_zq, our_idx, our_commits, our_buf = run_ours_train(
        cfg, params, z.transpose(0, 2, 1), lens, jax.random.PRNGKey(1),
        n_active_override=jnp.asarray(n_active),
        skip_override=jnp.asarray(skip))

    np.testing.assert_array_equal(our_idx, ref_idx)
    np.testing.assert_allclose(our_zq, ref_zq.transpose(0, 2, 1), atol=2e-5)
    np.testing.assert_allclose(our_commits, ref_commits, atol=2e-5)
    for k in ("cluster_size", "embed_avg", "codebook"):
        np.testing.assert_allclose(our_buf[k], ref_buf[k], atol=2e-5,
                                   err_msg=k)


def test_dead_code_replacement_applied():
    """Codes never hit in the batch fall below the EMA threshold and get
    replaced by batch-sampled candidates (reference quantizer.py:113-130)."""
    cfg = tiny_rvq_cfg(threshold_ema_dead=2.0, num_quantizers=1,
                       codebook_size=8)
    rng = np.random.default_rng(11)
    # two tight clusters -> at most 2 codes alive, others dead
    z = np.concatenate([rng.standard_normal((1, 5, cfg.input_dim)) * 0.01 + 5,
                        rng.standard_normal((1, 5, cfg.input_dim)) * 0.01 - 5],
                       axis=1).astype(np.float32)
    codebook = rng.standard_normal(
        (1, cfg.codebook_size, cfg.codebook_dim)).astype(np.float32)
    params = {"params": {"codebook": jnp.asarray(codebook)}}
    lens = np.array([10], np.int64)
    _, _, _, buf = run_ours_train(cfg, params, z, lens, jax.random.PRNGKey(2))
    # dead codes were overwritten with batch encodings (values near ±5)
    dead = buf["cluster_size"] < cfg.threshold_ema_dead
    assert dead.any()
    assert np.all(np.abs(np.abs(buf["codebook"][dead]) - 5.0) < 1.0)


def test_kmeans_matches_reference(ref_quantizer, monkeypatch):
    """kmeans_init == reference kmeans given the same initial centroids."""
    import torch
    rng = np.random.default_rng(13)
    N, D, K = 64, 6, 8
    x = rng.standard_normal((N, D)).astype(np.float32)
    means0 = x[rng.permutation(N)[:K]].copy()

    monkeypatch.setattr(ref_quantizer, "sample_vectors",
                        lambda samples, num: torch.from_numpy(means0.copy()))
    ref_means, ref_bins = ref_quantizer.kmeans(torch.from_numpy(x), K,
                                               num_iters=10)

    means, bins = kmeans_init(jnp.asarray(x), K, jax.random.PRNGKey(0),
                              num_iters=10, init_means=jnp.asarray(means0))
    np.testing.assert_allclose(np.asarray(means), ref_means.numpy(), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(bins), ref_bins.numpy())


# ---------------------------------------------------------------------------
# train/codec_step.py end-to-end
# ---------------------------------------------------------------------------

def test_codec_train_step_end_to_end():
    """Full codec train step on the tiny geometry: finite losses, codebooks
    move by EMA, network params move by AdamW, k-means bootstrap wires in."""
    from moss_ttsd_tpu.train.codec_step import (CodecTrainState,
                                                init_codec_train_state,
                                                kmeans_bootstrap,
                                                make_codec_train_step)
    from moss_ttsd_tpu.train.step import make_optimizer

    cfg = CodecConfig().tiny()
    opt = make_optimizer(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0)
    state = init_codec_train_state(cfg, opt, jax.random.PRNGKey(0),
                                   init_samples=4096)

    rng = np.random.default_rng(17)
    B, T = 2, 16000
    wav = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    batch = {"wav": jnp.asarray(wav),
             "lengths": jnp.array([T, T - 5000], jnp.int32)}

    state = kmeans_bootstrap(cfg, state, batch["wav"], batch["lengths"],
                             jax.random.PRNGKey(1))
    cb0 = np.asarray(state.params["params"]["quantizer"]["codebook"]).copy()
    enc_kernel0 = np.asarray(jax.tree.leaves(
        state.params["params"]["semantic_encoder"])[0]).copy()

    step = jax.jit(make_codec_train_step(cfg, opt))
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0
    assert float(metrics["codebook_usage"]) > 0
    cb1 = np.asarray(state.params["params"]["quantizer"]["codebook"])
    assert np.abs(cb1 - cb0).max() > 0            # EMA moved the codebook
    enc_kernel1 = np.asarray(jax.tree.leaves(
        state.params["params"]["semantic_encoder"])[0])
    assert np.abs(enc_kernel1 - enc_kernel0).max() > 0   # SGD moved the nets
    assert float(jnp.sum(state.cluster_size)) > 0


def test_codec_train_step_dp_mesh_equivalence():
    """DP-sharded codec step == single-device step: losses AND the EMA
    codebook statistics agree — GSPMD's global batch-stat sums are the psum
    the reference gets from NCCL all_reduce (quantizer.py:101-103)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from moss_ttsd_tpu.parallel.mesh import make_mesh
    from moss_ttsd_tpu.train.codec_step import (init_codec_train_state,
                                                make_codec_train_step)
    from moss_ttsd_tpu.train.step import make_optimizer

    cfg = CodecConfig().tiny()
    opt = make_optimizer(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0)
    state = init_codec_train_state(cfg, opt, jax.random.PRNGKey(3),
                                   init_samples=4096)

    rng = np.random.default_rng(19)
    B, T = 4, 8192
    wav = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    batch = {"wav": jnp.asarray(wav), "lengths": jnp.full((B,), T, jnp.int32)}
    step = make_codec_train_step(cfg, opt)

    s1, m1 = jax.jit(step)(state, batch, jax.random.PRNGKey(4))

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    shard = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    batch_dp = jax.tree.map(shard, batch)
    s2, m2 = jax.jit(step)(state, batch_dp, jax.random.PRNGKey(4))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s2.cluster_size),
                               np.asarray(s1.cluster_size), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2.params["params"]["quantizer"]["codebook"]),
        np.asarray(s1.params["params"]["quantizer"]["codebook"]), atol=1e-4)
