"""Communication-accounting tests (parallel/comm_analysis.py, VERDICT r4 #4):
HLO collective parsing, loop-body attribution, and the v5e TP cost model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moss_ttsd_tpu.parallel.comm_analysis import (CollectiveOp,
                                                  collective_inventory,
                                                  format_inventory,
                                                  format_tp_cost_table,
                                                  summarize_inventory,
                                                  tp_decode_cost_model)

SYNTHETIC_HLO = """\
HloModule jit_run, entry_computation_layout={()->f32[]}

%add.1 (x: f32[], y: f32[]) -> f32[] {
  %x = f32[] parameter(0)
  %y = f32[] parameter(1)
  ROOT %sum = f32[] add(%x, %y)
}

%wide.region_0.39_spmd.clone (arg_tuple.5: (s32[], bf16[2,64], (s32[], s32[]))) -> (s32[], bf16[2,64]) {
  %p = bf16[2,64]{1,0} parameter(0)
  %ar = bf16[2,64]{1,0} all-reduce(%p), channel_id=1, to_apply=%add.1
  %ag = (f32[1,34]{1,0}, f32[1,34]{1,0}) all-gather(%ar, %ar), channel_id=2, dimensions={1}
  %ags = (f32[1,8]{1,0}, f32[4,8]{1,0}, u32[], u32[]) all-gather-start(%ar), channel_id=3, dimensions={0}
  %agd = f32[4,8]{1,0} all-gather-done(%ags)
  ROOT %t = (s32[], bf16[2,64]) tuple(%agd)
}

%region_1.50 (cond_param: (s32[], bf16[2,64], (s32[], s32[]))) -> pred[] {
  %cp2 = (s32[], bf16[2,64], (s32[], s32[])) parameter(0)
  ROOT %lt = pred[] constant(true)
}

%region_2.60 (branch_param: f32[2,2]) -> f32[2,2] {
  %bp = f32[2,2]{1,0} parameter(0)
  ROOT %cpb = f32[2,2]{1,0} collective-permute(%bp), channel_id=7, source_target_pairs={{0,1},{1,0}}
}

%region_3.61 (branch_param2: f32[2,2]) -> f32[2,2] {
  ROOT %bp2 = f32[2,2]{1,0} parameter(0)
}

ENTRY %main.7 (a: f32[2,2]) -> f32[] {
  %a = f32[2,2]{1,0} parameter(0)
  %cp = f32[2,2]{1,0} collective-permute(%a), channel_id=9, source_target_pairs={{0,1},{1,0}}
  %b = s32[] constant(0)
  %w = (s32[], bf16[2,64]) while(%b), condition=%region_1.50, body=%wide.region_0.39_spmd.clone
  %c = f32[2,2]{1,0} conditional(%b, %a, %a), branch_computations={%region_2.60, %region_3.61}
  ROOT %r = f32[] constant(0)
}
"""


def test_inventory_parses_synthetic_hlo():
    ops = collective_inventory(SYNTHETIC_HLO)
    s = summarize_inventory(ops)
    # loop body (named by the while op's body= attribute; tuple-typed args
    # with NESTED parens): 1 all-reduce (2*64*2 B) + 1 tuple all-gather
    # (2*34*4 B) + 1 async all-gather counted once at -start with the
    # LARGEST tuple part (the gathered 4*8*4 B result — summing the
    # (operand, result, context) parts would double-count the wire payload)
    assert s["per_step"]["all-reduce"] == (1, 2 * 64 * 2)
    assert s["per_step"]["all-gather"] == (2, 2 * 34 * 4 + 4 * 8 * 4)
    # straight-line code: the entry collective-permute AND the one inside a
    # lax.cond branch (%region_2.60 is a "region" computation referenced by
    # branch_computations=, not by a while body= — it runs once per call, so
    # name heuristics that key on "region" would misfile it as per-step)
    assert s["per_call"]["collective-permute"] == (2, 2 * (2 * 2 * 4))
    text = format_inventory("synthetic", ops)
    assert "per_step" in text and "collective-permute" in text


def test_inventory_empty_program():
    assert collective_inventory("ENTRY %m () -> f32[] {\n}") == []
    assert "(no collectives)" in format_inventory("x", [])


def test_tp2_decode_program_has_loop_collectives():
    """A TP=2-sharded decode `run` program must carry collectives INSIDE the
    decode while loop (the sharded matmul partial-sum all-reduces + sampler
    gathers) — the ground-truth check behind the dryrun's comm report."""
    from moss_ttsd_tpu.core.config import LMConfig, SamplingConfig
    from moss_ttsd_tpu.decode.engine import GenerationEngine
    from moss_ttsd_tpu.parallel.mesh import make_mesh
    from moss_ttsd_tpu.models.lm import AsteroidLM

    cfg = LMConfig(dtype="float32", param_dtype="float32").tiny(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, speech_vocab_size=34, speech_pad_token=32,
        speech_token_range=(100, 134), pad_token_id=0, eos_token_id=200)
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, cfg.channels), jnp.int32))
    greedy = SamplingConfig.default(cfg.channels)
    for ch in greedy.channels:
        ch.do_sample = False
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    eng = GenerationEngine(cfg, params, greedy, bucket=16,
                           cache_dtype=jnp.float32, mesh=mesh, step_bucket=8)
    rng = np.random.default_rng(0)
    gids = np.full((1, 12, cfg.channels), cfg.speech_pad_token, np.int32)
    gids[..., 0] = rng.integers(0, cfg.vocab_size, (1, 12))
    gmask = np.ones((1, 12), np.int32)
    steps, buf = eng._step_budget(4, 12)
    bids, bmask, base = eng._bucket_prompt(gids, gmask)
    pre, run = eng._get_fns(base, buf)
    st = pre(eng.params, jnp.asarray(bids), jnp.asarray(bmask),
             jax.random.PRNGKey(0), None, None)
    ops = collective_inventory(
        run.lower(eng.params, st, jnp.int32(steps), None, None).compile())
    per_step = [op for op in ops if op.per_step]
    assert per_step, "no collectives attributed to the decode loop body"
    kinds = {op.kind for op in per_step}
    assert "all-reduce" in kinds or "all-gather" in kinds
    assert all(op.bytes > 0 for op in per_step)


def test_tp_cost_model_full_geometry():
    from moss_ttsd_tpu.core.config import LMConfig
    costs = tp_decode_cost_model(LMConfig(), batch=8)
    assert [c.tp for c in costs] == [2, 4, 8]
    for c in costs:
        assert 1.0 < c.speedup < c.tp          # sub-linear but real speedup
        assert c.comm_us < 500                  # ICI cost stays sub-ms
        assert c.n_collectives == 2 * 28 + 1 + 1
    # wire bytes grow with (N-1)/N
    assert costs[0].comm_bytes < costs[1].comm_bytes < costs[2].comm_bytes
    table = format_tp_cost_table(costs, batch=8)
    assert "TP=2" in table and "TP=8" in table
