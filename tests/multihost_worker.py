"""One process of a 2-process jax.distributed DP training run.

tests/test_multihost.py spawns two of these on localhost (CPU backend, 4
forced devices each) to exercise the REAL multi-host path — the same
`initialize_multihost` + `global_mesh` + pjit train step the repo would run
on a TPU pod over DCN (reference scales with torchrun + NCCL env plumbing,
/root/reference/README.md:361-370; here one jax.distributed.initialize call
replaces all of it and the GSPMD step runs unchanged).

`run_one_step()` is topology-agnostic: the parent test imports it in-process
(single process, 8 devices) and asserts the distributed run's loss matches.
All randomness is pinned, the GLOBAL batch is built identically on every
process, and globally-sharded arrays are assembled per-process with
jax.make_array_from_callback (each process materializes only its addressable
shards).
"""
import json
import os
import re
import sys


def _force_cpu(local_devices: int) -> None:
    """Hard CPU override BEFORE first jax backend use (sitecustomize pins
    JAX_PLATFORMS=axon, so env inherited from the parent is not enough)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


def run_one_step():
    """Init a tiny LM deterministically, run ONE DP train step over a
    ("data", "model"=1) mesh spanning ALL processes' devices, return
    (loss, grad_norm) as floats (replicated scalars are addressable
    everywhere)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from moss_ttsd_tpu.core.config import LMConfig
    from moss_ttsd_tpu.ops.chunked_ce import IGNORE_INDEX
    from moss_ttsd_tpu.parallel.distributed import global_mesh
    from moss_ttsd_tpu.train.step import (init_train_state, make_optimizer,
                                          make_train_step)

    cfg = LMConfig(dtype="float32", param_dtype="float32").tiny()
    opt = make_optimizer(learning_rate=3e-3, total_steps=10, warmup_ratio=0.0)
    state = init_train_state(cfg, opt, jax.random.PRNGKey(0))

    B, T = 8, 12
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 30, (B, T, cfg.channels)).astype(np.int32)
    ids[..., 0] = rng.integers(0, cfg.vocab_size, (B, T))
    labels = rng.integers(0, 30, (B, T, cfg.channels)).astype(np.int32)
    for b in range(B):
        labels[b, : 1 + b % 4] = IGNORE_INDEX      # row-varying masking
    batch_np = {"input_ids": ids, "labels": labels,
                "attention_mask": np.ones((B, T), np.int32)}

    mesh = global_mesh(data=jax.device_count())
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    def put(tree, sh):
        # per-process global-array assembly: the callback hands each local
        # device its shard of the (identical) host copy of the global value
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), sh, lambda idx, _x=x: np.asarray(_x)[idx]),
            tree)

    state = type(state)(*put(tuple(state), repl))
    batch = put(batch_np, data_sh)

    step = jax.jit(make_train_step(cfg, opt, remat=False, ce_chunks=2),
                   out_shardings=(None, None))
    new_state, metrics = step(state, batch)
    del new_state
    return float(metrics["loss"]), float(metrics["grad_norm"])


def main() -> int:
    coordinator = sys.argv[1]
    num_processes = int(sys.argv[2])
    process_id = int(sys.argv[3])
    local_devices = int(sys.argv[4])

    _force_cpu(local_devices)
    from moss_ttsd_tpu.parallel.distributed import initialize_multihost
    assert initialize_multihost(coordinator, num_processes, process_id)

    import jax
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.local_device_count() == local_devices
    loss, grad_norm = run_one_step()
    print(json.dumps({"process_id": process_id, "loss": loss,
                      "grad_norm": grad_norm,
                      "devices": jax.device_count()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
