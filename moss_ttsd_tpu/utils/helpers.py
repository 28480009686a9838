"""Misc utilities: parameter counting, logging setup, audio-file discovery.

Equivalent of reference XY_Tokenizer/utils/helpers.py (count_params_by_module,
set_logging with RANK tags, find_audio_files, ASR-style normalize).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Dict, List

import jax
import numpy as np

AUDIO_EXTENSIONS = (".wav", ".flac", ".mp3", ".ogg", ".m4a")


def count_params_by_module(params) -> Dict[str, int]:
    """Parameter counts grouped by top-level module (reference helpers.py:11-50)."""
    counts: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [str(k.key) for k in path if hasattr(k, "key")]
        top = names[1] if names and names[0] == "params" and len(names) > 1 else \
            (names[0] if names else "root")
        counts[top] = counts.get(top, 0) + int(np.prod(np.shape(leaf)))
    counts["__total__"] = sum(v for k, v in counts.items() if k != "__total__")
    return counts


def format_param_report(params) -> str:
    counts = count_params_by_module(params)
    total = counts.pop("__total__")
    lines = [f"{k:32s} {v / 1e6:10.2f}M" for k, v in sorted(counts.items())]
    lines.append(f"{'TOTAL':32s} {total / 1e6:10.2f}M")
    return "\n".join(lines)


def set_logging(level=logging.INFO) -> None:
    """Process-index-tagged logging (the reference tags NCCL RANK,
    helpers.py:59-65; here the JAX process index)."""
    rank = jax.process_index() if jax.process_count() > 1 else 0
    logging.basicConfig(
        level=level,
        format=f"[proc {rank}] %(asctime)s %(levelname)s %(name)s: %(message)s",
        force=True)


def find_audio_files(directory: str) -> List[str]:
    """Recursively list audio files (reference helpers.py:102-108)."""
    out: List[str] = []
    for root, _, files in os.walk(directory):
        for f in sorted(files):
            if f.lower().endswith(AUDIO_EXTENSIONS):
                out.append(os.path.join(root, f))
    return out


def asr_normalize_text(text: str) -> str:
    """Lowercase + strip punctuation (ASR-metric prep, reference helpers.py:110-116)."""
    text = text.lower()
    text = re.sub(r"[^\w\s一-鿿]", " ", text)
    return re.sub(r"\s+", " ", text).strip()


def maybe_debug_attach() -> None:
    """Env-gated remote-debug hook for the CLI entry points: set
    ``MOSS_TTSD_DEBUG=host:port`` (or just ``port``) to block at startup
    until a debugpy client attaches (reference wires the same hook through
    CLI flags, XY_Tokenizer/inference.py:21-28 + helpers.py:67-72)."""
    spec = os.environ.get("MOSS_TTSD_DEBUG")
    if not spec:
        return
    host, _, port = spec.rpartition(":")
    waiting_for_debug(host or "localhost", int(port))


def waiting_for_debug(ip: str = "localhost", port: int = 5678) -> None:
    """Block until a debugpy client attaches (reference helpers.py:67-72).

    Gated import: if debugpy is missing the hook degrades to a logged no-op
    instead of crashing the process.
    """
    import logging
    rank = os.environ.get("RANK", "0")
    try:
        import debugpy
    except ImportError:
        logging.warning("[rank %s] debugpy not installed; skipping "
                        "remote-attach wait", rank)
        return
    debugpy.listen((ip, port))
    logging.info("[rank %s] Waiting for debugger attach on %s:%d...",
                 rank, ip, port)
    debugpy.wait_for_client()
    logging.info("[rank %s] Debugger attached", rank)
