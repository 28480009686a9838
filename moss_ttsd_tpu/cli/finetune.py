"""Finetuning CLI: full or LoRA, DP/TP-sharded over the available mesh.

Mirrors reference finetune/finetune.py's surface (--model_path --data_dir
--output_dir --training_config --lora_config --lora) with a pjit train loop
instead of HF Trainer + torchrun DDP.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Finetune AsteroidLM (TPU)")
    parser.add_argument("--model_path", default=None,
                        help="HF checkpoint dir; omit with --tiny")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--training_config", default=None)
    parser.add_argument("--lora_config", default=None)
    parser.add_argument("--lora", action="store_true")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny random model (smoke test)")
    parser.add_argument("--platform", choices=["default", "cpu"], default="default")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--save_steps", type=int, default=None,
                        help="Orbax-checkpoint the train state every N steps "
                             "(default: training_config save_steps, else off)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in "
                             "<output_dir>/checkpoints (preemption recovery)")
    args = parser.parse_args(argv)

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import yaml
    from ..core.checkpoint import (latest_step, restore_train_state,
                                   save_pytree, save_train_state)
    from ..core.config import LMConfig
    from ..models.lm import AsteroidLM
    from ..train.data import TrainingDataset, collate
    from ..train.lora import DEFAULT_TARGETS
    from ..train.step import (TrainState, init_train_state, make_optimizer,
                              make_train_step)

    tc = {}
    if args.training_config and os.path.exists(args.training_config):
        with open(args.training_config) as f:
            tc = yaml.safe_load(f) or {}
    lc = {"r": 16, "lora_alpha": 32, "use_rslora": True,
          "target_modules": list(DEFAULT_TARGETS)}
    if args.lora_config and os.path.exists(args.lora_config):
        with open(args.lora_config) as f:
            lc.update(yaml.safe_load(f) or {})

    import dataclasses
    if args.tiny:
        from ..utils.mock_tokenizer import MockTokenizer
        tokenizer = MockTokenizer()
        cfg = LMConfig(dtype="float32", param_dtype="float32").tiny(
            pad_token_id=tokenizer.pad_token_id)
        model = AsteroidLM(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4, cfg.channels), jnp.int32))
    else:
        from transformers import AutoTokenizer
        from ..utils.convert_lm import load_asteroid_checkpoint
        tokenizer = AutoTokenizer.from_pretrained(args.model_path)
        cfg = LMConfig.from_hf_config_json(
            os.path.join(args.model_path, "config.json"))
        params = load_asteroid_checkpoint(args.model_path, cfg)
    if "bf16" in tc:       # reference training_config.yaml:5 (compute dtype;
        cfg = dataclasses.replace(   # params stay fp32 masters)
            cfg, dtype="bfloat16" if tc["bf16"] else "float32")

    dataset = TrainingDataset(args.data_dir, cfg.channels,
                              tokenizer.pad_token_id, cfg.speech_pad_token)
    if len(dataset) == 0:
        print("no training data found", file=sys.stderr)
        return 1

    # pipeline_stages > 1 selects the GPipe pipeline-parallel step
    # (parallel/pipeline.py): layer weights shard over a "pipe" mesh axis
    # and the gradient-accumulation micro axis doubles as the pipeline's
    # microbatch stream (same shared-denominator exactness either way)
    pp_stages = int(tc.get("pipeline_stages", 0) or 0)
    if pp_stages > 1:
        if args.lora:
            print("pipeline_stages is for full finetuning; the layerwise "
                  "LoRA step shards DP/TP instead", file=sys.stderr)
            return 1
        if jax.device_count() % pp_stages:
            print(f"pipeline_stages={pp_stages} must divide the "
                  f"{jax.device_count()} devices", file=sys.stderr)
            return 1
        if cfg.num_hidden_layers % pp_stages:
            print(f"pipeline_stages={pp_stages} must divide the model's "
                  f"{cfg.num_hidden_layers} layers", file=sys.stderr)
            return 1
    # sequence_parallel > 1 shards the TIME axis of every batch leaf over a
    # "seq" mesh axis (parallel/mesh.py make_mesh(seq=)): at 16k-token
    # sequences the per-device activation footprint divides by N while the
    # attention contraction over sharded keys rides ICI collectives. Rows
    # still shard over "data", so effective batch math is unchanged.
    sp = int(tc.get("sequence_parallel", 1) or 1)
    if sp > 1:
        if pp_stages > 1 or args.lora:
            print("sequence_parallel composes with the full-finetune DP "
                  "step only (not pipeline_stages or --lora)",
                  file=sys.stderr)
            return 1
        if jax.device_count() % sp:
            print(f"sequence_parallel={sp} must divide the "
                  f"{jax.device_count()} devices", file=sys.stderr)
            return 1
    data_devices = (jax.device_count() // pp_stages if pp_stages > 1
                    else jax.device_count() // sp)

    # effective batch = per-device x devices x accumulation (reference
    # training_config.yaml:1-2 via HF Trainer); one "step" below is one
    # OPTIMIZER step over grad_accum micro batches
    micro_bs = int(tc.get("per_device_train_batch_size", 1)) * data_devices
    grad_accum = max(1, int(tc.get("gradient_accumulation_steps", 1)))
    batch_size = micro_bs * grad_accum
    epochs = int(tc.get("num_train_epochs", 1))
    steps_per_epoch = max(1, len(dataset) // batch_size)
    total_steps = args.max_steps or steps_per_epoch * epochs
    remat = bool(tc.get("gradient_checkpointing", True))
    optimizer = make_optimizer(
        learning_rate=float(tc.get("learning_rate", 1e-4)),
        warmup_ratio=float(tc.get("warmup_ratio", 0.1)),
        total_steps=total_steps,
        weight_decay=float(tc.get("weight_decay", 0.0)),
        grad_clip=float(tc.get("max_grad_norm", 1.0)),
        lr_scheduler_type=str(tc.get("lr_scheduler_type", "cosine")))

    from jax.sharding import NamedSharding, PartitionSpec as P

    def dp_shardings():
        # data-parallel mesh over every device (the reference's torchrun DDP,
        # finetune.py:219): params/state replicated, batch sharded over
        # "data", gradient all-reduce inserted by GSPMD. Built only on the
        # DP branches — the PP step shards over its own (pipe, data) mesh.
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(data=data_devices, model=1, seq=sp)
        # with accumulation the batch leaves carry a leading (K,) micro axis;
        # rows stay sharded over "data" either way. Under sequence
        # parallelism the time axis additionally shards over "seq" (collate
        # pads T to a multiple of 64, so any sp <= 64 divides it).
        row = ("data", "seq") if sp > 1 else ("data",)
        spec = P(*row) if grad_accum == 1 else P(None, *row)
        return NamedSharding(mesh, P()), NamedSharding(mesh, spec), mesh

    if pp_stages > 1:
        from ..parallel.pipeline import (make_pp_mesh, make_pp_train_step,
                                         pp_batch_specs, pp_param_specs)
        from ..train.step import train_state_specs
        pp_mesh = make_pp_mesh(pipe=pp_stages, data=data_devices)
        state = init_train_state(cfg, optimizer, params=params)
        wrap = lambda specs: jax.tree.map(
            lambda sp: NamedSharding(pp_mesh, sp), specs,
            is_leaf=lambda x: isinstance(x, P))
        state_sh = wrap(train_state_specs(
            optimizer, state, pp_param_specs(state.params, pp_stages)))
        state = jax.tree.map(jax.device_put, state, state_sh)
        step_fn = jax.jit(
            make_pp_train_step(cfg, optimizer, pp_mesh, remat=remat),
            in_shardings=(state_sh, wrap(pp_batch_specs())),
            out_shardings=(state_sh, None))
    elif args.lora:
        # layerwise adapters (models/lm.py LoRADense): backward cotangents
        # stay rank-sized, vs the merge-based step's full-tree cotangent
        # (~2x params in fp32 — an OOM at the 1.7B geometry on one chip)
        from ..train.lora import (graft_lora_params,
                                  make_layerwise_lora_step, split_lora_tree)
        repl, data_sh, _ = dp_shardings()
        lcfg = dataclasses.replace(
            cfg, lora_rank=int(lc["r"]), lora_alpha=float(lc["lora_alpha"]),
            lora_rslora=bool(lc["use_rslora"]),
            lora_targets=tuple(lc["target_modules"]))
        frozen, trainable = split_lora_tree(
            graft_lora_params(params, lcfg, jax.random.PRNGKey(1)))
        # device-resident once: a host-numpy frozen tree would be re-uploaded
        # through the jit boundary on EVERY step (~7 GB/step at 1.7B)
        frozen = jax.device_put(frozen, repl)
        state = TrainState(jnp.zeros((), jnp.int32), trainable,
                           optimizer.init(trainable))
        lora_step = jax.jit(make_layerwise_lora_step(
            lcfg, optimizer, remat=remat, grad_accum_steps=grad_accum),
                            in_shardings=(repl, data_sh, repl),
                            out_shardings=(repl, None))
        step_fn = lambda s, b: lora_step(s, b, frozen)
    else:
        repl, data_sh, mesh = dp_shardings()
        hidden_sh = (NamedSharding(mesh, P("data", "seq")) if sp > 1
                     else None)
        state = init_train_state(cfg, optimizer, params=params)
        step_fn = jax.jit(make_train_step(
            cfg, optimizer, remat=remat, grad_accum_steps=grad_accum,
            hidden_sharding=hidden_sh),
                          in_shardings=(repl, data_sh),
                          out_shardings=(repl, None))

    os.makedirs(args.output_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    save_every = args.save_steps if args.save_steps is not None else int(
        tc.get("save_steps", 0))
    save_limit = int(tc.get("save_total_limit", 0) or 0)
    log_every = max(1, int(tc.get("logging_steps", 10) or 10))

    start_step = 0
    if args.resume:
        last = latest_step(ckpt_dir)
        if last is not None:
            state = restore_train_state(ckpt_dir, last, state)
            start_step = last
            print(f"resumed from {ckpt_dir}/step_{last}")

    def batch_indices(step: int) -> np.ndarray:
        """Deterministic per-epoch shuffles so resume replays the same data
        order the interrupted run would have seen."""
        epoch_i, bi = divmod(step, steps_per_epoch)
        order = np.random.default_rng(epoch_i).permutation(len(dataset))
        # tile so a batch_size larger than the dataset still fills exactly
        # batch_size rows (the sharded batch axis must divide evenly)
        reps = -(-((bi * batch_size) % len(dataset) + batch_size)
                 // len(dataset))
        tiled = np.concatenate([order] * max(reps, 1))
        return tiled[(bi * batch_size) % len(dataset):][:batch_size]

    def make_batch(step: int):
        idx = batch_indices(step - 1)
        batch = collate([dataset[i] for i in idx], tokenizer.pad_token_id,
                        pad_token=cfg.speech_pad_token,
                        max_length=int(tc.get("max_length", 16000)),
                        pad_to_multiple=64)
        if grad_accum > 1 or pp_stages > 1:
            # (K*B, T, ...) -> (K, B, T, ...) micro axis for the scanned
            # accumulation step OR the pipeline's microbatch stream; joint
            # collate keeps one padded length
            batch = {k: v.reshape((grad_accum, micro_bs) + v.shape[1:])
                     for k, v in batch.items()}
        return batch

    steps = range(start_step + 1, total_steps + 1)
    workers = int(tc.get("dataloader_num_workers", 1))
    if workers > 0:
        from ..train.data import Prefetcher
        batches = Prefetcher(make_batch, steps, depth=1 + workers)
    else:
        batches = ((s, make_batch(s)) for s in steps)

    from ..train.telemetry import TrainLogger
    # report_to: none (HF TrainingArguments key) disables tensorboard events;
    # jsonl + metrics registry always run
    report_to = tc.get("report_to", "tensorboard")
    if isinstance(report_to, str):
        report_to = [report_to]
    logger = TrainLogger(args.output_dir,
                         use_tensorboard="tensorboard" in report_to)
    t0 = time.perf_counter()
    step = start_step
    try:
        for step, batch in batches:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch)
            if step % log_every == 0 or step == total_steps:
                done = step - start_step
                sps = done / max(time.perf_counter() - t0, 1e-9)
                logger.log(step, {"loss": float(metrics["loss"]),
                                  "grad_norm": float(metrics["grad_norm"]),
                                  "steps_per_sec": sps,
                                  "epoch": step / steps_per_epoch})
                print(f"step {step}/{total_steps} loss={float(metrics['loss']):.4f} "
                      f"grad_norm={float(metrics['grad_norm']):.3f} "
                      f"({1.0 / max(sps, 1e-9):.2f}s/step)")
            if save_every and (step % save_every == 0 or step == total_steps):
                save_train_state(ckpt_dir, state, step, keep=save_limit)
                print(f"checkpointed step {step} -> {ckpt_dir}")
    finally:
        # flush/close sinks even on a crashing step — the tb/jsonl trail up
        # to the failure is exactly what post-mortems need
        logger.close()
        if hasattr(batches, "close"):
            batches.close()     # unblock the prefetch thread (train/data.py)

    if args.lora:
        from ..train.lora import fold_lora_tree, merge_lora_tree
        merged = jax.device_get(fold_lora_tree(
            merge_lora_tree(frozen, state.params), lcfg))
        save_pytree(os.path.join(args.output_dir, "model_merged.npz"), merged)
        save_pytree(os.path.join(args.output_dir, "lora_factors.npz"), state.params)
        print(f"LoRA merged model saved to {args.output_dir}")
    else:
        save_pytree(os.path.join(args.output_dir, "model.npz"), state.params)
        print(f"Model saved to {args.output_dir}")
    with open(os.path.join(args.output_dir, "train_config.json"), "w") as f:
        json.dump({"steps": step, "lora": args.lora, "config": tc}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
