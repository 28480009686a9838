"""Multi-host (DCN) initialization.

The reference scales across processes with torchrun + NCCL env plumbing
(reference README.md:361-370, finetune.py:219). The JAX equivalent is one
call to ``jax.distributed.initialize`` before any backend use; afterwards the
same pjit/shard_map code runs unchanged — collectives ride ICI within a slice
and DCN across slices, inserted by XLA from the mesh shardings.

On Cloud TPU pods the coordinator/process env is auto-detected; elsewhere
(CPU fleets, manual setups) pass or export:
  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        world size
  JAX_PROCESS_ID           this process's rank
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime if multi-host env is present.

    Returns True if distributed init ran, False for single-process runs (no
    env, nothing to do). Safe to call unconditionally at CLI startup; must be
    called before the first jax backend use.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)

    on_tpu_pod = any(k in os.environ for k in
                     ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not on_tpu_pod:
        return False

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return True


def global_mesh(data: Optional[int] = None, model: int = 1):
    """A ("data","model") mesh over ALL processes' devices (jax.devices()
    is global after initialize_multihost). The model axis should stay within
    one slice so TP collectives ride ICI; keep model <= devices-per-host
    unless the slice topology says otherwise."""
    from .mesh import make_mesh
    return make_mesh(data=data, model=model)
