"""Multi-LoRA continuous serving: every pool row can run its own adapter.

The invariant: a request submitted with adapter=X reproduces token-for-token
an isolated static-engine run whose weights have X merged in
(train/lora.apply_lora — the reference's merge_and_unload semantics,
finetune.py:237-241), while a base request (adapter=None) in the same pool
stays bit-identical to the no-adapter engine (index 0 is a zero adapter).
"""
import numpy as np
import jax
import jax.numpy as jnp

from moss_ttsd_tpu.decode.continuous import ContinuousBatcher
from moss_ttsd_tpu.decode.engine import GenerationEngine
from moss_ttsd_tpu.train.lora import apply_lora, init_lora
from tests.test_decode import greedy_sampling, make_prompt, setup, tiny_cfg  # noqa: F401

BASE = 24
RANK = 4
ALPHA = 8.0


def make_adapter(params, seed):
    """init_lora factors with randomized b (standard init zeroes b, which
    would make the adapter a no-op and the test vacuous)."""
    lora = init_lora(params, jax.random.PRNGKey(seed), rank=RANK)
    key = jax.random.PRNGKey(seed + 100)
    out = {}
    for i, (k, ab) in enumerate(sorted(lora.items())):
        kk = jax.random.fold_in(key, i)
        out[k] = {"a": ab["a"],
                  "b": jax.random.normal(kk, ab["b"].shape,
                                         jnp.float32) * 0.5}
    return out


def isolated_greedy_with(cfg, params, prompt, steps):
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                 cfg.speech_pad_token)
    engine = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                              bucket=BASE + cfg.channels - 1,
                              cache_dtype=jnp.float32, step_bucket=32)
    return engine.generate(batch, mask, max_new_tokens=steps, seed=0)


def test_multilora_mixed_pool_matches_merged_engines(setup):
    """Three rows — base, adapter v1, adapter v2 — decode concurrently in
    one pool (staggered joins); each reproduces the isolated engine run
    with that adapter merged into the weights."""
    cfg, model, params = setup
    rng = np.random.default_rng(21)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2),
               make_prompt(cfg, rng, 4, 7)]
    budgets = [16, 12, 14]
    ad1, ad2 = make_adapter(params, 1), make_adapter(params, 2)
    merged1 = apply_lora(params, ad1, rank=RANK, alpha=ALPHA)
    merged2 = apply_lora(params, ad2, rank=RANK, alpha=ALPHA)
    expected = [isolated_greedy_with(cfg, params, prompts[0], budgets[0]),
                isolated_greedy_with(cfg, merged1, prompts[1], budgets[1]),
                isolated_greedy_with(cfg, merged2, prompts[2], budgets[2])]
    # the adapters must actually change the output for this test to mean
    # anything
    base1 = isolated_greedy_with(cfg, params, prompts[1], budgets[1])
    assert not (base1.steps == expected[1].steps and np.array_equal(
        base1.tokens, expected[1].tokens)), "adapter v1 is a no-op"

    cb = ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                           slots=3, base=BASE, max_steps=32,
                           cache_dtype=jnp.float32)
    cb.register_adapter("v1", ad1, alpha=ALPHA)
    cb.register_adapter("v2", ad2, alpha=ALPHA)
    s0 = cb.submit(prompts[0], max_new_tokens=budgets[0])
    cb.run(steps=4)
    s1 = cb.submit(prompts[1], max_new_tokens=budgets[1], adapter="v1")
    cb.run(steps=3)
    s2 = cb.submit(prompts[2], max_new_tokens=budgets[2], adapter="v2")
    for _ in range(12):
        cb.run(steps=4)
        if len(cb.finished()) == 3:
            break
    for slot, exp in zip([s0, s1, s2], expected):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


def test_multilora_burst_batched_prefill(setup):
    """A submit_many burst with per-row adapters prefills batched through
    the gathered factors and still matches the merged isolated runs."""
    import pytest
    cfg, model, params = setup
    rng = np.random.default_rng(22)
    pa, pb = make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 8, 3)
    ad1 = make_adapter(params, 5)
    merged1 = apply_lora(params, ad1, rank=RANK, alpha=ALPHA)
    exp_a = isolated_greedy_with(cfg, params, pa, 12)
    exp_b = isolated_greedy_with(cfg, merged1, pb, 14)

    cb = ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                           slots=2, base=BASE, max_steps=32,
                           cache_dtype=jnp.float32)
    cb.register_adapter("v1", ad1, alpha=ALPHA)
    with pytest.raises(ValueError):          # unknown adapter: pre-device
        cb.submit_many([(pa, 12, 0, "nope")])
    assert cb.free_slots == 2
    sa, sb = cb.submit_many([(pa, 12, 0, None), (pb, 14, 0, "v1")])
    for _ in range(10):
        cb.run(steps=4)
        if len(cb.finished()) == 2:
            break
    for slot, exp in ((sa, exp_a), (sb, exp_b)):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


def test_multilora_slot_reuse_clears_adapter(setup):
    """A slot freed by an adapter request serves a base request cleanly."""
    cfg, model, params = setup
    rng = np.random.default_rng(23)
    p1, p2 = make_prompt(cfg, rng, 5, 3), make_prompt(cfg, rng, 8, 1)
    ad1 = make_adapter(params, 9)
    exp2 = isolated_greedy_with(cfg, params, p2, 12)

    cb = ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                           slots=1, base=BASE, max_steps=32,
                           cache_dtype=jnp.float32)
    cb.register_adapter("v1", ad1, alpha=ALPHA)
    slot = cb.submit(p1, max_new_tokens=6, adapter="v1")
    cb.run(steps=10)
    cb.collect(slot)
    slot2 = cb.submit(p2, max_new_tokens=12)       # base model
    cb.run(steps=16)
    got = cb.collect(slot2)
    assert got.steps == exp2.steps
    np.testing.assert_array_equal(got.tokens[0, got.base:],
                                  exp2.tokens[0, exp2.base:])


def test_multilora_mesh_tp_pool_matches_unmeshed(setup):
    """Multi-LoRA under a TP mesh ((1, model): weights sharded, adapter
    stacks replicated) reproduces the unmeshed pool exactly."""
    from moss_ttsd_tpu.parallel.mesh import make_mesh
    cfg, model, params = setup
    rng = np.random.default_rng(24)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2)]
    budgets = [10, 8]
    ad1 = make_adapter(params, 11)

    def drive(mesh):
        cb = ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                               slots=2, base=BASE, max_steps=16,
                               cache_dtype=jnp.float32, mesh=mesh)
        cb.register_adapter("v1", ad1, alpha=ALPHA)
        s0 = cb.submit(prompts[0], max_new_tokens=budgets[0], adapter="v1")
        cb.run(steps=3)
        s1 = cb.submit(prompts[1], max_new_tokens=budgets[1])
        for _ in range(8):
            cb.run(steps=4)
            if len(cb.finished()) == 2:
                break
        return [cb.collect(s) for s in (s0, s1)]

    ref = drive(None)
    got = drive(make_mesh(data=1, model=2, devices=jax.devices()[:2]))
    for r, g in zip(ref, got):
        assert r.steps == g.steps
        np.testing.assert_array_equal(r.tokens, g.tokens)


def test_engine_generate_per_row_adapters_match_merged(setup):
    """The static engine's multi-LoRA path: one batched generate with
    per-row adapter names reproduces each row's merged-weight isolated
    run (prefill AND decode run through the selected adapters)."""
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    cfg, model, params = setup
    rng = np.random.default_rng(31)
    pa, pb = make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 6, 3)
    ad1 = make_adapter(params, 13)
    merged1 = apply_lora(params, ad1, rank=RANK, alpha=ALPHA)
    exp_a = isolated_greedy_with(cfg, merged1, pa, 12)
    exp_b = isolated_greedy_with(cfg, params, pb, 12)

    eng = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                           bucket=BASE + cfg.channels - 1,
                           cache_dtype=jnp.float32, step_bucket=32)
    eng.register_adapter("v1", ad1, alpha=ALPHA)
    batch, mask = left_pad_batch([pa, pb], cfg.pad_token_id,
                                 cfg.speech_pad_token)
    res = eng.generate(batch, mask, max_new_tokens=12,
                       adapter=["v1", None])
    for row, exp in ((0, exp_a), (1, exp_b)):
        np.testing.assert_array_equal(
            res.tokens[row, res.base:res.base + exp.steps],
            exp.tokens[0, exp.base:exp.base + exp.steps])

    import pytest
    with pytest.raises(ValueError):
        eng.generate(batch, mask, max_new_tokens=4, adapter="nope")


def test_engine_mesh_adapter_matches_unmeshed(setup):
    """Static-engine multi-LoRA under a (1, model) TP mesh (adapter stacks
    replicated) matches the unmeshed engine token-for-token."""
    from moss_ttsd_tpu.parallel.mesh import make_mesh
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    cfg, model, params = setup
    rng = np.random.default_rng(33)
    pa, pb = make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 7, 2)
    ad1 = make_adapter(params, 17)
    batch, mask = left_pad_batch([pa, pb], cfg.pad_token_id,
                                 cfg.speech_pad_token)

    def drive(mesh):
        eng = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                               bucket=BASE + cfg.channels - 1,
                               cache_dtype=jnp.float32, step_bucket=32,
                               mesh=mesh)
        eng.register_adapter("v1", ad1, alpha=ALPHA)
        return eng.generate(batch, mask, max_new_tokens=10,
                            adapter=["v1", None])

    ref = drive(None)
    got = drive(make_mesh(data=1, model=2, devices=jax.devices()[:2]))
    assert ref.steps == got.steps
    np.testing.assert_array_equal(ref.tokens, got.tokens)


def test_multilora_int8_pool_matches_int8_engine(setup):
    """Adapters over a w8a16 (int8 base) pool: no merged-weight oracle
    exists under quantization (quantize(W + dW) != quantize(W) + dW), so
    the invariant is cross-engine consistency — the quantized pool row with
    an adapter reproduces the quantized static engine run with the SAME
    adapter registered."""
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    cfg, model, params = setup
    rng = np.random.default_rng(41)
    pa, pb = make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 8, 2)
    ad1 = make_adapter(params, 19)

    eng = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                           bucket=BASE + cfg.channels - 1,
                           cache_dtype=jnp.float32, step_bucket=32,
                           quant="int8")
    eng.register_adapter("v1", ad1, alpha=ALPHA)

    def isolated(prompt, steps, adapter):
        batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                     cfg.speech_pad_token)
        return eng.generate(batch, mask, max_new_tokens=steps,
                            adapter=adapter)

    exp_a = isolated(pa, 12, "v1")
    exp_b = isolated(pb, 10, None)

    cb = ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                           slots=2, base=BASE, max_steps=32,
                           cache_dtype=jnp.float32, quant="int8")
    cb.register_adapter("v1", ad1, alpha=ALPHA)
    sa = cb.submit(pa, max_new_tokens=12, adapter="v1")
    cb.run(steps=3)                       # stagger the base join
    sb = cb.submit(pb, max_new_tokens=10)
    for _ in range(10):
        cb.run(steps=4)
        if len(cb.finished()) == 2:
            break
    for slot, exp in ((sa, exp_a), (sb, exp_b)):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


def test_registry_partial_layers_and_atomic_failure(setup):
    """Layer-subset adapters zero-pad to the model's scan length, and a
    failed registration leaves the registry exactly as before (a
    half-registered id would be CLAMPED by jnp.take onto another adapter)."""
    import pytest
    from moss_ttsd_tpu.decode.lora_registry import LoraRegistry
    cfg, model, params = setup
    L, hd = cfg.num_hidden_layers, cfg.hidden_size
    qd = cfg.num_attention_heads * cfg.head_dim
    reg = LoraRegistry(jnp.float32, num_layers=L)
    assert L > 1, "test needs a multi-layer tiny model"

    partial = {"layers/block/q_proj/kernel": {
        "a": np.ones((1, hd, 2), np.float32),
        "b": np.ones((1, 2, qd), np.float32)}}
    assert reg.register("p", partial) == 1
    a, b = reg.stacks["q_proj"]
    assert a.shape == (L, 2, hd, 2)
    assert float(jnp.abs(a[1:]).sum()) == 0.0     # padded layers = zero

    too_many = {"layers/block/q_proj/kernel": {
        "a": np.ones((L + 1, hd, 2), np.float32),
        "b": np.ones((L + 1, 2, qd), np.float32)}}
    with pytest.raises(ValueError):
        reg.register("bad", too_many)
    wrong_dims = {"layers/block/q_proj/kernel": {
        "a": np.ones((L, hd + 1, 2), np.float32),
        "b": np.ones((L, 2, qd), np.float32)}}
    with pytest.raises(ValueError):
        reg.register("bad2", wrong_dims)
    assert "bad" not in reg.ids and "bad2" not in reg.ids
    assert reg.id_of("p") == 1
    assert reg.stacks["q_proj"][0].shape == (L, 2, hd, 2)  # unchanged
