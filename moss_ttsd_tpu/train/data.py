"""Training data preprocessing + dataset/collator.

Equivalent of reference finetune/data_preprocess.py + finetune.py:24-116:
  * ``build_training_example`` — the 5-segment training prompt (style/text/
    speech-begin masked -100; audio tokens + <|end_of_speech|> supervised;
    reference data_preprocess.py:26-147).
  * ``process_data``   — JSONL (two formats) -> codec-encoded token records,
    stored as sharded .npz (replacing the pickle+byte-offset scheme,
    reference data_preprocess.py:281-294).
  * ``TrainingDataset``/``collate`` — delay-shift per example, right-pad to the
    batch max capped at 16000 (reference finetune.py:46-116, 197).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..pipeline.prompt import shift_delay_pattern
from ..pipeline.text import normalize_text, rewrite_speaker_tags

IGNORE = -100
SYSTEM_PROMPT = ("You are a speech synthesizer that generates natural, "
                 "realistic, and human-like conversational audio from dialogue "
                 "text.")


def build_training_example(tokenizer, text: str, audio_codes: np.ndarray,
                           system_prompt: str = SYSTEM_PROMPT,
                           channels: int = 8, pad_token: int = 1024,
                           speech_offset: int = 151665):
    """-> (input_ids (T, C), labels (T, C)).

    Segments (reference data_preprocess.py:26-147):
      1. style prompt + text-begin  (labels -100)
      2. text                       (labels -100)
      3. text-end + speech-begin    (labels -100)
      4. audio tokens (+offset ch0) (labels = ids)
      5. <|end_of_speech|>          (label kept on ch0)
    """
    def text_seg(s, add_special_tokens=True):
        ids = np.asarray(
            tokenizer.encode(s, add_special_tokens=add_special_tokens),
            np.int64)
        seg = np.full((len(ids), channels), pad_token, np.int64)
        seg[:, 0] = ids
        lab = np.full_like(seg, IGNORE)
        return seg, lab

    seg1, lab1 = text_seg(f"<|begin_of_style|>{system_prompt}<|end_of_style|>\n"
                          f"<|begin_of_text|>")
    # the transcript encodes WITHOUT special tokens (reference
    # data_preprocess.py:36) — a no-op for the Qwen tokenizer, but a
    # BOS/EOS-adding tokenizer must not inject tokens mid-prompt
    seg2, lab2 = text_seg(text, add_special_tokens=False)
    seg3, lab3 = text_seg("<|end_of_text|>\n<|begin_of_speech|>")

    codes = np.asarray(audio_codes, np.int64).copy()       # (T_audio, nq)
    if codes.shape[1] > channels:
        codes = codes[:, :channels]
    elif codes.shape[1] < channels:
        padded = np.full((codes.shape[0], channels), pad_token, np.int64)
        padded[:, :codes.shape[1]] = codes
        codes = padded
    codes[:, 0] += speech_offset
    lab4 = codes.copy()

    seg5, lab5 = text_seg("<|end_of_speech|>")
    lab5[:, 0] = seg5[:, 0]                                # end marker is learned

    input_ids = np.concatenate([seg1, seg2, seg3, codes, seg5])
    labels = np.concatenate([lab1, lab2, lab3, lab4, lab5])
    return input_ids, labels


def process_data(jsonl_path: str, tokenizer, spt, output_dir: str,
                 data_name: str = "processed_data", use_normalize: bool = True,
                 channels: int = 8, speech_offset: int = 151665,
                 shard_size: int = 512) -> str:
    """JSONL -> sharded npz records. Two input formats (reference
    data_preprocess.py:189-266):
      {"file_path", "full_transcript"} or
      {"reference_audio", "reference_text", "audio", "text"}.
    """
    from ..pipeline.jsonl import load_audio_data
    os.makedirs(output_dir, exist_ok=True)
    with open(jsonl_path) as f:
        items = [json.loads(l) for l in f if l.strip()]

    records: List[Dict] = []
    for idx, item in enumerate(items):
        try:
            if "file_path" in item and "full_transcript" in item:
                if not item["file_path"] or not os.path.exists(item["file_path"]):
                    print(f"skip {idx}: missing audio {item.get('file_path')}")
                    continue
                wav = load_audio_data(item["file_path"])
                text = item["full_transcript"]
                codes = np.asarray(spt.encode([wav])["codes_list"][0]).T
            elif all(k in item for k in ("reference_audio", "reference_text",
                                         "audio", "text")):
                if not (os.path.exists(item["reference_audio"]) and
                        os.path.exists(item["audio"])):
                    print(f"skip {idx}: missing audio files")
                    continue
                ref = load_audio_data(item["reference_audio"])
                main = load_audio_data(item["audio"])
                text = item["reference_text"] + item["text"]
                ref_codes = np.asarray(spt.encode([ref])["codes_list"][0]).T
                main_codes = np.asarray(spt.encode([main])["codes_list"][0]).T
                codes = np.concatenate([ref_codes, main_codes], axis=0)
            else:
                print(f"skip {idx}: unknown format")
                continue

            if use_normalize:
                text = normalize_text(text)
            text = rewrite_speaker_tags(text)
            input_ids, labels = build_training_example(
                tokenizer, text, codes, channels=channels,
                speech_offset=speech_offset)
            records.append({"input_ids": input_ids, "labels": labels})
        except Exception as e:                         # per-item isolation
            print(f"skip {idx}: {e}")

    index = []
    for si in range(0, max(len(records), 1), shard_size):
        shard = records[si:si + shard_size]
        if not shard:
            break
        path = os.path.join(output_dir, f"{data_name}_{si // shard_size:05d}.npz")
        flat = {}
        for i, rec in enumerate(shard):
            flat[f"input_ids_{i}"] = rec["input_ids"]
            flat[f"labels_{i}"] = rec["labels"]
        np.savez(path, **flat)
        index.append({"file": os.path.basename(path), "count": len(shard)})
    with open(os.path.join(output_dir, f"{data_name}_index.json"), "w") as f:
        json.dump({"shards": index, "total": len(records)}, f)
    print(f"wrote {len(records)} records to {output_dir}")
    return output_dir


class TrainingDataset:
    """Lazy shard-backed dataset with delay-shift per example
    (reference LazySupervisedDataset, finetune.py:24-76)."""

    def __init__(self, data_dir: str, channels: int, text_pad_id: int,
                 pad_token: int = 1024, seed: int = 0):
        self.channels = channels
        self.text_pad_id = text_pad_id
        self.pad_token = pad_token
        self.examples: List[Dict] = []
        for name in sorted(os.listdir(data_dir)):
            if not name.endswith(".npz"):
                continue
            with np.load(os.path.join(data_dir, name)) as z:
                n = len([k for k in z.files if k.startswith("input_ids_")])
                for i in range(n):
                    self.examples.append({"input_ids": z[f"input_ids_{i}"],
                                          "labels": z[f"labels_{i}"]})
        rng = np.random.default_rng(seed)
        rng.shuffle(self.examples)

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        ex = self.examples[i]
        ids = ex["input_ids"][:, :self.channels]
        labels = ex["labels"][:, :self.channels]
        C = self.channels
        T = ids.shape[0]
        shifted = shift_delay_pattern(ids, self.text_pad_id, self.pad_token)
        shifted_labels = np.full((T + C - 1, C), IGNORE, np.int64)
        for c in range(C):
            shifted_labels[c:T + c, c] = labels[:, c]
        return {"input_ids": shifted, "labels": shifted_labels,
                "attention_mask": np.ones(T + C - 1, np.int64)}


def collate(instances: Sequence[Dict[str, np.ndarray]], text_pad_id: int,
            max_length: int = 16000, pad_token: int = 1024,
            pad_to_multiple: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Right-pad/truncate to min(batch max, max_length)
    (reference DataCollatorForSupervisedDataset, finetune.py:78-116)."""
    C = instances[0]["input_ids"].shape[1]
    # hard content cap FIRST (the reference truncates at max_length);
    # pad_to_multiple only rounds the padded SHAPE up for tiling — content
    # between max_length and the rounded length must not escape truncation
    trunc = min(max(x["input_ids"].shape[0] for x in instances), max_length)
    L = (-(-trunc // pad_to_multiple) * pad_to_multiple
         if pad_to_multiple else trunc)
    B = len(instances)
    ids = np.zeros((B, L, C), np.int64)
    ids[..., :] = pad_token
    ids[..., 0] = text_pad_id
    labels = np.full((B, L, C), IGNORE, np.int64)
    mask = np.zeros((B, L), np.int64)
    for b, inst in enumerate(instances):
        n = min(inst["input_ids"].shape[0], trunc)
        ids[b, :n] = inst["input_ids"][:n]
        labels[b, :n] = inst["labels"][:n]
        mask[b, :n] = inst["attention_mask"][:n]
    return {"input_ids": ids, "labels": labels, "attention_mask": mask}


class Prefetcher:
    """Async host input pipeline — one background thread double-buffering
    batch assembly (the reference's dataloader_num_workers,
    /root/reference/finetune/training_config.yaml:9): the dataset[i] +
    collate work for step i+1 runs while the device executes step i, so at
    real geometry (16k-token sequences) the host never shadows device time.

    ``make_batch(step)`` is called on the worker thread for each step in
    ``steps``; iterate the Prefetcher to receive (step, batch) in order.
    Worker exceptions re-raise on the consuming thread. If the consumer
    abandons iteration (e.g. step_fn raised), call ``close()`` — without it
    the worker would block forever on the bounded queue, pinning depth+1
    assembled batches (tens of MB at 16k-token geometry) for the process
    lifetime."""

    _DONE = object()

    def __init__(self, make_batch, steps, depth: int = 2):
        import queue
        import threading
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()

        def worker():
            try:
                for s in steps:
                    batch = make_batch(s)
                    # bounded put that re-checks the stop flag so close()
                    # can unblock a worker stuck on a full queue
                    while not self._stop.is_set():
                        try:
                            self._q.put((s, batch), timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
                self._q.put(self._DONE)
            except BaseException as e:            # surfaced on next()
                self._q.put(e)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self) -> None:
        """Stop the worker and drop buffered batches (idempotent)."""
        self._stop.set()
        while True:                 # drain so a blocked put() sees the flag
            try:
                self._q.get_nowait()
            except Exception:
                break
        self._thread.join(timeout=5.0)
