"""Checkpoint IO — native pytree save/load plus Orbax integration.

The reference uses HF save_pretrained / torch.load single files
(reference generation_utils.py:18, model.py:258-278, finetune.py:240-247);
here the native format is a flat .npz of '/'-joined pytree paths (portable,
torch-free) with Orbax available for sharded training state.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def flatten_pytree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_pytree(flat: Dict[str, Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return tree


def save_pytree(path: str, tree) -> None:
    """Save a (possibly nested-dict) pytree of arrays to a single .npz."""
    flat = flatten_pytree(jax.device_get(tree))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_pytree(path: str) -> dict:
    """Load an .npz checkpoint back into a nested dict of jnp arrays."""
    with np.load(path) as data:
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    return unflatten_pytree(flat)


# -- Orbax (sharded training state) ----------------------------------------

def save_train_state(ckpt_dir: str, state, step: int,
                     keep: int = 0) -> None:
    """Orbax-save ``state`` under <ckpt_dir>/step_<step>.

    ``keep`` > 0 rotates old checkpoints, retaining only the ``keep``
    highest steps (the reference's HF Trainer save_total_limit,
    /root/reference/finetune/training_config.yaml:8, finetune.py:207-208)."""
    import orbax.checkpoint as ocp
    root = os.path.abspath(ckpt_dir)
    path = os.path.join(root, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if keep > 0:
        import shutil
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(root)
                       if d.startswith("step_") and d.split("_")[1].isdigit())
        for old in steps[:-keep]:
            shutil.rmtree(os.path.join(root, f"step_{old}"),
                          ignore_errors=True)


def restore_train_state(ckpt_dir: str, step: int, abstract_state):
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract_state)


def latest_step(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_") and d.split("_")[1].isdigit()]
    return max(steps) if steps else None
