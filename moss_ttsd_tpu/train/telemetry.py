"""Training-loop observability: loss/grad-norm/steps-per-sec sinks.

The reference delegates this to HF Trainer's tensorboard reporting
(/root/reference/finetune/finetune.py:207-213, requirements_finetune.txt:17-18).
Here the train loop reports every logging step into three sinks at once:

  * a jsonl event log (<output_dir>/train_log.jsonl) — the artifact of
    record; torch-free, greppable, survives any viewer;
  * tensorboard event files (<output_dir>/tb) when torch's SummaryWriter is
    importable — point `tensorboard --logdir` at it like the reference;
  * the process-wide metrics registry (utils/profiling.metrics) as
    ``train_*`` gauges, so a serving/inspection endpoint in the same process
    exports training progress like any other phase metric.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class TrainLogger:
    def __init__(self, output_dir: str, use_tensorboard: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.jsonl_path = os.path.join(output_dir, "train_log.jsonl")
        self._f = open(self.jsonl_path, "a")
        self.tb = None
        # Defer the torch import to the first log() — smoke runs that never
        # log (and runs with report_to: none) skip the multi-second import
        # and never write tb event files.
        self._tb_dir = os.path.join(output_dir, "tb") if use_tensorboard else None

    def _ensure_tb(self):
        if self._tb_dir is None:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(self._tb_dir)
        except Exception:
            self.tb = None          # torch-free env: jsonl + registry only
        self._tb_dir = None         # only attempt once

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        self._ensure_tb()
        scalars = {k: float(v) for k, v in scalars.items()}
        rec = {"step": int(step), "time": time.time(), **scalars}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        from ..utils.profiling import metrics
        metrics.set("train_step", float(step))
        for k, v in scalars.items():
            metrics.set(f"train_{k}", v)
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"train/{k}", v, step)

    def close(self) -> None:
        self._f.close()
        if self.tb is not None:
            self.tb.flush()
            self.tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
