"""Multi-LoRA adapter registry shared by the serving engines.

Holds named LoRA factor trees stacked into per-target arrays shaped for the
layer scan: a (L, N, in, r), b (L, N, r, out) with row 0 the zero adapter
(the base model). models/lm.py Qwen3Block gathers each batch row's factors
by adapter id and applies two rank-sized batched einsums — so one compiled
program serves any mix of adapters per batch (S-LoRA style). The per-adapter
LoRA scale (reference peft r/alpha/rslora semantics, finetune.py:165-175)
folds into ``b`` at registration; adapters of different ranks zero-pad to
the widest — both exact transformations.

Used by decode/continuous.ContinuousBatcher (per-slot adapters) and
decode/engine.GenerationEngine (per-row adapters on the static path).
Beyond the reference, which bakes ONE LoRA into the checkpoint at export
(reference finetune/finetune.py:237-241).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class LoraRegistry:
    """Name -> id registry + stacked factor arrays for per-row serving.

    ``num_layers`` (the model's scan length) bounds the stacked L dim:
    adapters covering only a layer prefix/subset (peft layers_to_transform)
    zero-pad to it, and a factor tree with MORE layers than the model is
    rejected up front instead of failing inside the compiled scan."""

    def __init__(self, dtype=jnp.bfloat16, num_layers: Optional[int] = None):
        self.dtype = jnp.dtype(dtype)
        self.num_layers = num_layers
        self.ids: Dict[Optional[str], int] = {None: 0, "": 0}
        self._entries: List[dict] = []     # id-1 -> {target: (a, b*scale)}
        self.stacks: Dict[str, tuple] = {}  # target -> (a (L,N,in,r), b)

    def __bool__(self) -> bool:
        return bool(self._entries)

    @property
    def names(self) -> List[str]:
        return sorted(k for k in self.ids if k)

    def id_of(self, adapter: Optional[str]) -> int:
        try:
            return self.ids[adapter]
        except KeyError:
            raise ValueError(
                f"unknown adapter {adapter!r}; registered: "
                f"{self.names}") from None

    def register(self, name: str, lora: dict, alpha: float = 32.0,
                 use_rslora: bool = True) -> int:
        """Register a factor tree under ``name``; returns its id.

        ``lora`` is either the flat init_lora format
        ({".../<target>/kernel": {"a": (L, in, r), "b": (L, r, out)}}) or
        the layerwise trainable tree the finetune CLI saves as
        lora_factors.npz (nested dict with lora_a/lora_b leaves,
        train/lora.split_lora_tree) — both with scan-stacked layer leading
        dims. Registration rebuilds the stacked arrays (their N dimension
        grows), so the caller's next compiled call retraces: register every
        adapter BEFORE serving traffic."""
        from ..train.lora import lora_scale
        if name in self.ids:
            raise ValueError(f"adapter {name!r} already registered")
        lora = self._normalize(lora)
        entry = {}
        for key, ab in lora.items():
            parts = key.split("/")
            target = parts[-2] if parts[-1] == "kernel" else parts[-1]
            a = np.asarray(ab["a"], np.float32)
            b = np.asarray(ab["b"], np.float32)
            if a.ndim != 3 or b.ndim != 3:
                raise ValueError(
                    f"adapter {name!r} target {target!r}: expected "
                    f"scan-stacked (L, in, r)/(L, r, out) factors, got "
                    f"{a.shape}/{b.shape}")
            rank = a.shape[-1]
            entry[target] = (a, b * lora_scale(rank, alpha, use_rslora))
        if not entry:
            raise ValueError(f"adapter {name!r}: no LoRA factors found")
        # commit atomically: a _rebuild failure (layer-count/shape mismatch)
        # must leave the registry exactly as before — a half-registered name
        # would otherwise resolve to an id that jnp.take silently CLAMPS to
        # a different adapter's row
        self._entries.append(entry)
        try:
            self._rebuild()
        except Exception:
            self._entries.pop()
            raise
        aid = len(self._entries)
        self.ids[name] = aid
        return aid

    @staticmethod
    def _normalize(lora: dict) -> dict:
        """Accept init_lora's flat format as-is; flatten a layerwise
        trainable tree (lora_a/lora_b leaves) into it."""
        if lora and all(isinstance(v, dict) and {"a", "b"} <= set(v)
                        for v in lora.values()):
            return lora
        groups: dict = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(lora)[0]:
            names = [getattr(k, "key", str(k)) for k in path]
            if names[-1] in ("lora_a", "lora_b"):
                key = "/".join(names[:-1]) + "/kernel"
                groups.setdefault(key, {})[names[-1][-1]] = leaf
        return {k: v for k, v in groups.items() if {"a", "b"} <= set(v)}

    def _rebuild(self) -> None:
        targets = sorted({t for e in self._entries for t in e})
        N = len(self._entries) + 1            # id 0 = zero adapter
        stacks = {}
        for t in targets:
            shapes = [e[t] for e in self._entries if t in e]
            fin = shapes[0][0].shape[1]
            fout = shapes[0][1].shape[-1]
            r = max(a.shape[-1] for a, _ in shapes)
            # stacked L = the model's scan length when known, else the
            # widest adapter; shorter factor trees (layer-subset adapters)
            # zero-pad — a zero delta IS the base model on those layers
            L = self.num_layers or max(a.shape[0] for a, _ in shapes)
            A = np.zeros((L, N, fin, r), np.float32)
            B = np.zeros((L, N, r, fout), np.float32)
            for i, e in enumerate(self._entries):
                if t not in e:
                    continue
                a, b = e[t]
                if a.shape[0] > L or b.shape[0] > L:
                    raise ValueError(
                        f"target {t!r}: factors cover {a.shape[0]} layers "
                        f"but the model has {L}")
                if a.shape[1] != fin or b.shape[-1] != fout:
                    raise ValueError(
                        f"target {t!r}: factor dims {a.shape[1]}->"
                        f"{b.shape[-1]} do not match the registered "
                        f"{fin}->{fout}")
                A[:a.shape[0], i + 1, :, :a.shape[-1]] = a
                B[:b.shape[0], i + 1, :b.shape[1]] = b
            stacks[t] = (jnp.asarray(A, self.dtype),
                         jnp.asarray(B, self.dtype))
        self.stacks = stacks

    def row_ids(self, adapter, batch: int) -> jnp.ndarray:
        """(B,) int32 id array from one name or a per-row list of names."""
        if adapter is None or isinstance(adapter, str):
            return jnp.full((batch,), self.id_of(adapter), jnp.int32)
        if len(adapter) != batch:
            raise ValueError(f"{len(adapter)} adapter names for a "
                             f"batch of {batch}")
        return jnp.asarray([self.id_of(a) for a in adapter], jnp.int32)
