"""Continuous batching tests: per-row decode state vs the static engine.

The invariant: a request joined into a running pool (other slots mid-decode)
must produce token-for-token the output of an isolated
GenerationEngine.generate call — greedy mode makes this rng-free.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_ttsd_tpu.decode.continuous import ContinuousBatcher
from moss_ttsd_tpu.decode.engine import GenerationEngine
from tests.test_decode import greedy_sampling, make_prompt, setup, tiny_cfg  # noqa: F401


BASE = 24


def isolated_greedy(cfg, params, prompt, max_steps):
    """Static-engine result at the batcher's exact prompt bucket."""
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                 cfg.speech_pad_token)
    engine = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                              bucket=BASE + cfg.channels - 1,
                              cache_dtype=jnp.float32, step_bucket=32)
    return engine.generate(batch, mask, max_new_tokens=max_steps, seed=0)


def make_batcher(cfg, params, slots=3, max_steps=32):
    return ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                             slots=slots, base=BASE, max_steps=max_steps,
                             cache_dtype=jnp.float32)


def test_staggered_joins_match_isolated_greedy(setup):
    """Three requests joining at different pool times each reproduce their
    isolated static-engine output exactly."""
    cfg, model, params = setup
    rng = np.random.default_rng(0)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2),
               make_prompt(cfg, rng, 4, 7)]
    budgets = [20, 14, 18]
    expected = [isolated_greedy(cfg, params, p, b)
                for p, b in zip(prompts, budgets)]

    cb = make_batcher(cfg, params)
    s0 = cb.submit(prompts[0], max_new_tokens=budgets[0])
    cb.run(steps=5)                       # slot 0 is 5 steps deep...
    s1 = cb.submit(prompts[1], max_new_tokens=budgets[1])
    cb.run(steps=3)                       # ...slots at depth 8 and 3
    s2 = cb.submit(prompts[2], max_new_tokens=budgets[2])
    for _ in range(12):
        cb.run(steps=4)
        if len(cb.finished()) == 3:
            break
    assert sorted(cb.finished()) == sorted([s0, s1, s2])

    for slot, exp in zip([s0, s1, s2], expected):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


def test_slot_reuse_after_collect(setup):
    """A freed slot serves a new request with a clean state."""
    cfg, model, params = setup
    rng = np.random.default_rng(1)
    p1 = make_prompt(cfg, rng, 5, 3)
    p2 = make_prompt(cfg, rng, 8, 1)
    exp2 = isolated_greedy(cfg, params, p2, 12)

    cb = make_batcher(cfg, params, slots=1)
    slot = cb.submit(p1, max_new_tokens=6)
    assert cb.submit(p2) is None          # pool full
    cb.run(steps=10)
    assert cb.finished() == [slot]
    first = cb.collect(slot)
    assert first.steps == 6

    slot2 = cb.submit(p2, max_new_tokens=12)
    assert slot2 == slot                  # same physical slot, fresh state
    cb.run(steps=16)
    got = cb.collect(slot2)
    assert got.steps == exp2.steps
    np.testing.assert_array_equal(got.tokens[0, got.base:],
                                  exp2.tokens[0, exp2.base:])


def test_budget_freeze_does_not_corrupt_neighbours(setup):
    """A row frozen at its budget keeps decoding neighbours unaffected and
    its own buffer intact across further segments."""
    cfg, model, params = setup
    rng = np.random.default_rng(2)
    pa = make_prompt(cfg, rng, 6, 4)
    pb = make_prompt(cfg, rng, 9, 2)
    exp_a = isolated_greedy(cfg, params, pa, 4)
    exp_b = isolated_greedy(cfg, params, pb, 20)

    cb = make_batcher(cfg, params, slots=2)
    sa = cb.submit(pa, max_new_tokens=4)
    sb = cb.submit(pb, max_new_tokens=20)
    cb.run(steps=6)                       # A froze at 4; B still going
    assert sa in cb.finished()
    snap_a = np.asarray(cb.state.tokens[sa]).copy()
    cb.run(steps=30)                      # extra segments with A frozen
    np.testing.assert_array_equal(np.asarray(cb.state.tokens[sa]), snap_a)

    got_a, got_b = cb.collect(sa), cb.collect(sb)
    np.testing.assert_array_equal(got_a.tokens[0, got_a.base:],
                                  exp_a.tokens[0, exp_a.base:])
    np.testing.assert_array_equal(got_b.tokens[0, got_b.base:],
                                  exp_b.tokens[0, exp_b.base:])


def test_oversized_prompt_rejected(setup):
    cfg, model, params = setup
    rng = np.random.default_rng(3)
    cb = make_batcher(cfg, params, slots=1)
    big = make_prompt(cfg, rng, BASE + 10, 4)
    with pytest.raises(ValueError, match="exceeds the pool bucket"):
        cb.submit(big)


def test_explicit_budget_over_capacity_rejected(setup):
    """An explicit max_new_tokens above pool capacity raises (silent
    truncation would cut audio mid-sentence); the config-default budget
    merely clamps to capacity."""
    cfg, model, params = setup
    rng = np.random.default_rng(3)
    cb = make_batcher(cfg, params, slots=1, max_steps=16)
    p = make_prompt(cfg, rng, 5, 3)
    with pytest.raises(ValueError, match="per-slot capacity"):
        cb.submit(p, max_new_tokens=17)
    assert cb.free_slots == 1                 # nothing was consumed
    assert cb.submit(p) is not None           # default budget clamps fine


def test_zero_budget_rejected(setup):
    """An explicit max_new_tokens=0 raises instead of silently falling back
    to the config default (the old `x or default` pattern treated 0 as
    unset and decoded a full default budget for a zero-token request)."""
    cfg, model, params = setup
    rng = np.random.default_rng(3)
    cb = make_batcher(cfg, params, slots=1, max_steps=16)
    p = make_prompt(cfg, rng, 5, 3)
    with pytest.raises(ValueError, match="must be >= 1"):
        cb.submit(p, max_new_tokens=0)
    assert cb.free_slots == 1


def test_sampled_mode_runs(setup):
    """Sampled (non-greedy) pool smoke: rows produce speech-range tokens."""
    from moss_ttsd_tpu.core.config import ChannelSamplingConfig, SamplingConfig
    cfg, model, params = setup
    rng = np.random.default_rng(4)
    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=True, temperature=1.0,
                                        top_k=20, top_p=0.9)
                  for _ in range(cfg.channels)],
        max_new_tokens=10)
    cb = ContinuousBatcher(cfg, params, sampling, slots=2, base=BASE,
                           max_steps=16, cache_dtype=jnp.float32)
    s0 = cb.submit(make_prompt(cfg, rng, 5, 3), max_new_tokens=10)
    cb.run(steps=4)
    s1 = cb.submit(make_prompt(cfg, rng, 7, 2), max_new_tokens=10)
    for _ in range(8):
        cb.run(steps=4)
        if len(cb.finished()) == 2:
            break
    for s in (s0, s1):
        r = cb.collect(s)
        assert 1 <= r.steps <= 10
        assert r.tokens.shape[1] == r.base + r.steps


def test_poll_and_collect_async_match_blocking_collect(setup):
    """poll() reports (slot, steps) in one readback; collect_async frees the
    slot immediately and the deferred device slice survives slot reuse (the
    in-order device stream executes the slice before the next splice
    overwrites the row)."""
    cfg, model, params = setup
    rng = np.random.default_rng(5)
    pa = make_prompt(cfg, rng, 6, 4)
    pb = make_prompt(cfg, rng, 9, 2)
    exp_a = isolated_greedy(cfg, params, pa, 6)
    exp_b = isolated_greedy(cfg, params, pb, 6)

    cb = make_batcher(cfg, params, slots=1)
    sa = cb.submit(pa, max_new_tokens=6)
    cb.run(steps=8)
    polled = cb.poll()
    assert [s for s, _ in polled] == [sa]
    steps_a, tokens_a_dev = cb.collect_async(sa, polled[0][1])
    # slot freed -> immediately reuse it, overwriting the pool row
    sb = cb.submit(pb, max_new_tokens=6)
    assert sb == sa
    cb.run(steps=8)
    (slot_b, steps_b), = cb.poll()
    res_b = cb.collect(slot_b, steps_b)

    # the async slice still holds request A's tokens
    tokens_a = np.asarray(tokens_a_dev)[None]
    assert steps_a == exp_a.steps
    np.testing.assert_array_equal(tokens_a[0, exp_a.base:],
                                  exp_a.tokens[0, exp_a.base:])
    np.testing.assert_array_equal(res_b.tokens[0, exp_b.base:],
                                  exp_b.tokens[0, exp_b.base:])


def test_mesh_tp_pool_matches_unmeshed(setup):
    """A TP-sharded pool ((1, model) mesh: weights sharded, pool state
    replicated) reproduces the unmeshed batcher's tokens exactly for
    staggered joins (greedy, fp32)."""
    from moss_ttsd_tpu.parallel.mesh import make_mesh
    cfg, model, params = setup
    rng = np.random.default_rng(6)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2)]
    budgets = [10, 8]

    def drive(mesh):
        cb = ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                               slots=2, base=BASE, max_steps=16,
                               cache_dtype=jnp.float32, mesh=mesh)
        s0 = cb.submit(prompts[0], max_new_tokens=budgets[0])
        cb.run(steps=3)                 # stagger the second join
        s1 = cb.submit(prompts[1], max_new_tokens=budgets[1])
        for _ in range(8):
            cb.run(steps=4)
            if len(cb.finished()) == 2:
                break
        return [cb.collect(s) for s in (s0, s1)]

    ref = drive(None)
    got = drive(make_mesh(data=1, model=2,
                          devices=jax.devices()[:2]))
    for r, g in zip(ref, got):
        assert r.steps == g.steps
        np.testing.assert_array_equal(r.tokens, g.tokens)


def test_int8_kv_pool_matches_int8_kv_static(setup):
    """The pool with kv_quant="int8" (ring-gated writes over all four cache
    arrays: int8 k/v + their 4-dim scale buffers) reproduces the static
    engine's int8-KV output token-for-token for staggered joins (greedy,
    fp32 compute)."""
    cfg, model, params = setup
    rng = np.random.default_rng(7)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2)]
    budgets = [10, 8]

    def isolated_kv8(prompt, steps):
        from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
        batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                     cfg.speech_pad_token)
        eng = GenerationEngine(cfg, params, greedy_sampling(cfg.channels),
                               bucket=BASE + cfg.channels - 1,
                               cache_dtype=jnp.float32, step_bucket=16,
                               kv_quant="int8")
        return eng.generate(batch, mask, max_new_tokens=steps, seed=0)

    expected = [isolated_kv8(p, b) for p, b in zip(prompts, budgets)]

    cb = ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                           slots=2, base=BASE, max_steps=16,
                           cache_dtype=jnp.float32, kv_quant="int8")
    s0 = cb.submit(prompts[0], max_new_tokens=budgets[0])
    cb.run(steps=3)
    s1 = cb.submit(prompts[1], max_new_tokens=budgets[1])
    for _ in range(8):
        cb.run(steps=4)
        if len(cb.finished()) == 2:
            break
    for slot, exp in zip((s0, s1), expected):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


def test_pool_honours_max_length_like_static_engine(setup):
    """With sampling.max_length set (HF total-length cap) and no explicit
    max_new_tokens, the pool computes the same step budget as
    GenerationEngine._step_budget (prompt counted minus the channels-1
    teacher-forcing rows)."""
    cfg, model, params = setup
    rng = np.random.default_rng(8)
    prompt = make_prompt(cfg, rng, 6, 4)

    sampling = greedy_sampling(cfg.channels)
    counted = len(prompt) - cfg.channels + 1   # reference starting cur_len
    sampling.max_length = counted + 3          # cap => exactly 3 steps
    sampling.max_new_tokens = 100

    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                 cfg.speech_pad_token)
    eng = GenerationEngine(cfg, params, sampling,
                           bucket=BASE + cfg.channels - 1,
                           cache_dtype=jnp.float32, step_bucket=16)
    ref = eng.generate(batch, mask, seed=0)

    cb = ContinuousBatcher(cfg, params, sampling, slots=1, base=BASE,
                           max_steps=16, cache_dtype=jnp.float32)
    # submit pads the prompt to the pool bucket itself, so its counted
    # length matches the engine's bucketed prompt
    s0 = cb.submit(prompt)
    for _ in range(6):
        cb.run(steps=4)
        if cb.finished():
            break
    got = cb.collect(s0)
    assert ref.steps <= 3                    # the cap actually bound it
    assert got.steps == ref.steps
    np.testing.assert_array_equal(got.tokens[0, got.base:],
                                  ref.tokens[0, ref.base:])


def test_fuzz_random_schedule_matches_isolated(setup):
    """Randomized join/leave schedule: random prompts, budgets, segment
    sizes and slot-reuse order over a 3-slot pool; EVERY collected request
    must equal its isolated static-engine run token-for-token (greedy).
    Exercises ring wrap-around (cumulative pool steps far exceed max_steps),
    splice into freshly-freed slots, and frozen-row protection together."""
    cfg, model, params = setup
    rng = np.random.default_rng(42)
    cb = make_batcher(cfg, params, slots=3, max_steps=16)

    n_requests = 10
    pending = [(make_prompt(cfg, rng, int(rng.integers(3, 10)),
                            int(rng.integers(1, 6))),
                int(rng.integers(4, 17))) for _ in range(n_requests)]
    expected = {}
    live = {}
    collected = 0
    guard = 0
    queue = list(enumerate(pending))
    while collected < n_requests:
        guard += 1
        assert guard < 200, "fuzz schedule did not converge"
        while queue and cb.free_slots and rng.random() < 0.8:
            idx, (p, b) = queue.pop(0)
            slot = cb.submit(p, max_new_tokens=b)
            live[slot] = (idx, p, b)
        if not live:
            continue
        cb.run(steps=int(rng.integers(1, 7)))
        for slot, steps in cb.poll():
            idx, p, b = live.pop(slot)
            got = cb.collect(slot, steps)
            if idx not in expected:
                expected[idx] = isolated_greedy(cfg, params, p, b)
            exp = expected[idx]
            assert got.steps == exp.steps, f"request {idx}"
            np.testing.assert_array_equal(
                got.tokens[0, got.base:], exp.tokens[0, exp.base:],
                err_msg=f"request {idx}")
            collected += 1


def test_sampled_per_request_seed_determinism(setup):
    """Per-slot rng (round-2 VERDICT task #3c): a SAMPLED request joined
    into a busy pool reproduces, token for token, the output of an isolated
    batch-1 GenerationEngine.generate run with the same seed — the slot
    replays the exact split chain from the request's PRNGKey (reference
    per-batch set_seed, inference.py:71, upgraded to per-request)."""
    from moss_ttsd_tpu.core.config import ChannelSamplingConfig, SamplingConfig
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    cfg, model, params = setup
    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=True, temperature=0.9,
                                        top_k=8, top_p=0.9)
                  for _ in range(cfg.channels)],
        max_new_tokens=16)

    def isolated(prompt, steps, seed):
        batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                     cfg.speech_pad_token)
        eng = GenerationEngine(cfg, params, sampling,
                               bucket=BASE + cfg.channels - 1,
                               cache_dtype=jnp.float32, step_bucket=32)
        return eng.generate(batch, mask, max_new_tokens=steps, seed=seed)

    rng = np.random.default_rng(7)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 8, 3)]
    expected = [isolated(prompts[0], 14, 123), isolated(prompts[1], 10, 7)]

    cb = ContinuousBatcher(cfg, params, sampling, slots=2, base=BASE,
                           max_steps=32, cache_dtype=jnp.float32)
    s0 = cb.submit(prompts[0], max_new_tokens=14, seed=123)
    cb.run(steps=4)                      # second request joins mid-flight
    s1 = cb.submit(prompts[1], max_new_tokens=10, seed=7)
    for _ in range(10):
        cb.run(steps=4)
        if len(cb.finished()) == 2:
            break
    for slot, exp in ((s0, expected[0]), (s1, expected[1])):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


def test_pool_len_aware_extent_matches_full_reads(setup):
    """The extent-clamped pallas decode path (len_aware pool on TPU;
    interpret mode here) is token-exact vs the XLA full-buffer-read pool.

    The pool extent is max(written slot)+1 over advancing rows, so every
    slot the clamp drops is key_valid=False for every row whose output is
    kept — agreement across staggered joins (different per-row extents) and
    a mid-run collect (stale valid bits past the extent) proves the bound.
    """
    import dataclasses
    cfg, model, params = setup
    rng = np.random.default_rng(11)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2),
               make_prompt(cfg, rng, 4, 7)]
    budgets = [18, 12, 16]

    def run_pool(cfg_v, len_aware):
        cb = ContinuousBatcher(cfg_v, params, greedy_sampling(cfg.channels),
                               slots=2, base=BASE, max_steps=32,
                               cache_dtype=jnp.float32, len_aware=len_aware)
        s0 = cb.submit(prompts[0], max_new_tokens=budgets[0])
        cb.run(steps=5)
        s1 = cb.submit(prompts[1], max_new_tokens=budgets[1])
        cb.run(steps=9)                   # slot 1 finishes (12 steps)...
        out = {}
        assert s1 in cb.finished()
        out[1] = cb.collect(s1)           # ...freeing it with stale valids
        s2 = cb.submit(prompts[2], max_new_tokens=budgets[2])
        for _ in range(12):
            cb.run(steps=4)
            if len(cb.finished()) == 2:
                break
        out[0], out[2] = cb.collect(s0), cb.collect(s2)
        return out

    ref = run_pool(cfg, len_aware=False)
    got = run_pool(dataclasses.replace(cfg, pallas_interpret=True),
                   len_aware=True)
    for i in range(3):
        assert got[i].steps == ref[i].steps
        np.testing.assert_array_equal(got[i].tokens, ref[i].tokens)


def test_submit_many_matches_sequential(setup):
    """A burst admitted through one batched prefill reproduces the isolated
    static-engine outputs token-for-token (greedy, per-request budgets)."""
    cfg, model, params = setup
    rng = np.random.default_rng(13)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 9, 2),
               make_prompt(cfg, rng, 4, 7)]
    budgets = [20, 14, 18]
    expected = [isolated_greedy(cfg, params, p, b)
                for p, b in zip(prompts, budgets)]

    cb = make_batcher(cfg, params, slots=4)
    slots = cb.submit_many(list(zip(prompts, budgets, [0, 0, 0])))
    assert len(slots) == 3 and cb.free_slots == 1
    for _ in range(12):
        cb.run(steps=4)
        if len(cb.finished()) == 3:
            break
    for slot, exp in zip(slots, expected):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


def test_submit_many_burst_into_running_pool(setup):
    """A burst joins a pool with a live row mid-decode without disturbing
    it; burst validation failures leave the pool untouched."""
    cfg, model, params = setup
    rng = np.random.default_rng(14)
    p0 = make_prompt(cfg, rng, 6, 4)
    pa, pb = make_prompt(cfg, rng, 9, 2), make_prompt(cfg, rng, 4, 7)
    exp0 = isolated_greedy(cfg, params, p0, 20)
    expa = isolated_greedy(cfg, params, pa, 12)
    expb = isolated_greedy(cfg, params, pb, 16)

    cb = make_batcher(cfg, params, slots=3)
    s0 = cb.submit(p0, max_new_tokens=20)
    cb.run(steps=5)
    with pytest.raises(ValueError):               # burst > free slots
        cb.submit_many([(pa, 12, 0), (pb, 16, 0), (p0, 20, 0)])
    assert cb.free_slots == 2
    with pytest.raises(ValueError):               # over-capacity budget:
        cb.submit_many([(pa, 12, 0), (pb, 999, 0)])   # rejected pre-device
    assert cb.free_slots == 2
    sa, sb = cb.submit_many([(pa, 12, 0), (pb, 16, 0)])
    for _ in range(12):
        cb.run(steps=4)
        if len(cb.finished()) == 3:
            break
    for slot, exp in ((s0, exp0), (sa, expa), (sb, expb)):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])


def test_submit_many_sampled_seeds(setup):
    """Batched admission keeps per-request seed reproducibility: each row
    of the burst replays its own isolated sampled run."""
    from moss_ttsd_tpu.core.config import ChannelSamplingConfig, SamplingConfig
    from moss_ttsd_tpu.pipeline.prompt import left_pad_batch
    cfg, model, params = setup
    sampling = SamplingConfig(
        channels=[ChannelSamplingConfig(do_sample=True, temperature=0.9,
                                        top_k=8, top_p=0.9)
                  for _ in range(cfg.channels)],
        max_new_tokens=16)

    def isolated(prompt, steps, seed):
        batch, mask = left_pad_batch([prompt], cfg.pad_token_id,
                                     cfg.speech_pad_token)
        eng = GenerationEngine(cfg, params, sampling,
                               bucket=BASE + cfg.channels - 1,
                               cache_dtype=jnp.float32, step_bucket=32)
        return eng.generate(batch, mask, max_new_tokens=steps, seed=seed)

    rng = np.random.default_rng(15)
    prompts = [make_prompt(cfg, rng, 6, 4), make_prompt(cfg, rng, 8, 3)]
    expected = [isolated(prompts[0], 14, 123), isolated(prompts[1], 10, 7)]

    cb = ContinuousBatcher(cfg, params, sampling, slots=2, base=BASE,
                           max_steps=32, cache_dtype=jnp.float32)
    slots = cb.submit_many([(prompts[0], 14, 123), (prompts[1], 10, 7)])
    for _ in range(10):
        cb.run(steps=4)
        if len(cb.finished()) == 2:
            break
    for slot, exp in zip(slots, expected):
        got = cb.collect(slot)
        assert got.steps == exp.steps
        np.testing.assert_array_equal(got.tokens[0, got.base:],
                                      exp.tokens[0, exp.base:])
