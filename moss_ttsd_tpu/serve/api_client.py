"""Remote-API batch synthesis client.

Equivalent of reference use_api.py: fan a JSONL of dialogue items out to an
OpenAI-compatible ``/audio/speech`` endpoint with references (voice cloning via
base64 prompt audio), thread-pool concurrency, retry + thread-safe JSONL
append. Uses ``requests`` directly (no openai SDK dependency).
"""

from __future__ import annotations

import base64
import io
import json
import os
import threading
import time
import wave
from concurrent.futures import ThreadPoolExecutor, as_completed
from typing import Dict, List, Optional

import numpy as np

DEFAULT_MODEL = "fnlp/MOSS-TTSD-v0.5"
MAX_TOKENS = 16384          # reference use_api.py:184


def audio_file_to_base64(path: str) -> str:
    """wav file -> base64 string (reference audio_to_base64, use_api.py:27)."""
    with open(path, "rb") as f:
        return base64.b64encode(f.read()).decode("utf-8")


def wav_bytes_to_array(data: bytes):
    """Decode in-memory wav bytes -> (float32 (T,), sample_rate)."""
    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        ch = w.getnchannels()
    if width == 2:
        arr = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        arr = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 3:
        # 24-bit PCM (a common DAW export): widen each LE triple to int32
        # by zero-padding the low byte, then scale by 2^31
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        quads = np.zeros((b.shape[0], 4), np.uint8)
        quads[:, 1:] = b                     # little-endian: pad LOW byte
        arr = quads.view("<i4")[:, 0].astype(np.float32) / 2147483648.0
    else:
        arr = np.frombuffer(raw, np.uint8).astype(np.float32) / 128.0 - 1.0
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, sr


class SpeechAPIClient:
    """Minimal OpenAI-compatible audio/speech client."""

    def __init__(self, base_url: str, api_key: str = "",
                 model: str = DEFAULT_MODEL, max_retries: int = 3,
                 timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.max_retries = max_retries
        self.timeout = timeout

    def generate_speech(self, text: str,
                        references: Optional[List[Dict]] = None,
                        extra: Optional[Dict] = None,
                        voice: Optional[str] = None) -> bytes:
        """POST /audio/speech -> wav bytes (reference generate_speech,
        use_api.py:171-206). ``voice`` selects a LoRA adapter registered on
        the server (multi-LoRA serving; None = base model)."""
        import requests
        payload = {
            "model": self.model,
            "input": text,
            "response_format": "wav",
            "max_tokens": MAX_TOKENS,
        }
        if references:
            payload["references"] = references
        if voice:
            payload["voice"] = voice
        if extra:
            payload.update(extra)
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"

        last_err = None
        for attempt in range(self.max_retries):
            try:
                r = requests.post(f"{self.base_url}/audio/speech",
                                  json=payload, headers=headers,
                                  timeout=self.timeout)
                r.raise_for_status()
                return r.content
            except Exception as e:               # retry with backoff
                last_err = e
                status = getattr(getattr(e, "response", None),
                                 "status_code", None)
                if status is not None and 400 <= status < 500 \
                        and status != 429:
                    break                        # non-retryable client error
                if attempt < self.max_retries - 1:
                    time.sleep(2.0 * (attempt + 1))
        raise RuntimeError(f"speech API failed after {self.max_retries} "
                           f"retries: {last_err}")

    def stream_speech(self, text: str,
                      references: Optional[List[Dict]] = None,
                      extra: Optional[Dict] = None, chunk_samples: int = 4096,
                      voice: Optional[str] = None):
        """POST with ``stream: true`` -> yields (float32 audio chunk,
        sample_rate) as the server generates — playback can start ~TTFA
        after the request instead of after the whole synthesis.

        The server emits raw 16-bit mono PCM (``audio/L16; rate=N``). No
        retries: replaying a half-delivered stream would repeat audio.
        Capability the reference's hosted API lacks (use_api.py:171-206
        returns whole files).
        """
        import requests
        payload = {
            "model": self.model,
            "input": text,
            "stream": True,
            "response_format": "pcm",
            "max_tokens": MAX_TOKENS,
        }
        if references:
            payload["references"] = references
        if voice:
            payload["voice"] = voice
        if extra:
            payload.update(extra)
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        with requests.post(f"{self.base_url}/audio/speech", json=payload,
                           headers=headers, timeout=self.timeout,
                           stream=True) as r:
            r.raise_for_status()
            ct = r.headers.get("Content-Type", "")
            sr = 24000
            if "rate=" in ct:
                sr = int(ct.split("rate=")[1].split(";")[0].strip())
            carry = b""
            for raw in r.iter_content(chunk_size=2 * chunk_samples):
                if not raw:
                    continue
                raw = carry + raw
                n = len(raw) // 2 * 2           # PCM16 alignment
                carry = raw[n:]
                if n:
                    yield (np.frombuffer(raw[:n], "<i2").astype(np.float32)
                           / 32768.0, sr)
            if carry:
                # the connection ended mid-sample: surface the truncation
                # instead of silently dropping the half PCM16 sample
                raise IOError("PCM16 stream truncated mid-sample "
                              f"({len(carry)} trailing byte)")


def build_references(item: dict) -> List[Dict]:
    """JSONL item -> API `references` list (base64 audio + text)."""
    refs = []
    base = item.get("base_path", "")

    def full(p):
        return os.path.join(base, p) if base and not os.path.isabs(p) else p

    if item.get("prompt_audio"):
        refs.append({"audio": audio_file_to_base64(full(item["prompt_audio"])),
                     "text": item.get("prompt_text", "")})
    else:
        for spk in ("speaker1", "speaker2"):
            a = item.get(f"prompt_audio_{spk}")
            if a:
                refs.append({"audio": audio_file_to_base64(full(a)),
                             "text": item.get(f"prompt_text_{spk}", "")})
    return refs


def process_jsonl(jsonl_path: str, output_dir: str, client: SpeechAPIClient,
                  max_workers: int = 4, use_normalize: bool = False,
                  summary_file: Optional[str] = None) -> int:
    """ThreadPoolExecutor fan-out over items (reference use_api.py:248-264)
    with per-item isolation and a lock-guarded summary JSONL."""
    from ..pipeline.text import normalize_text
    os.makedirs(output_dir, exist_ok=True)
    with open(jsonl_path) as f:
        items = [json.loads(l) for l in f if l.strip()]

    lock = threading.Lock()
    done = 0

    def work(idx_item):
        idx, item = idx_item
        text = item.get("text", "")
        if use_normalize:
            text = normalize_text(text)
        refs = build_references(item)
        wav_bytes = client.generate_speech(text, refs,
                                           voice=item.get("voice"))
        out = os.path.join(output_dir, f"output_{idx}.wav")
        with open(out, "wb") as f:
            f.write(wav_bytes)
        if summary_file:
            with lock:
                with open(summary_file, "a", encoding="utf-8") as f:
                    f.write(json.dumps({"index": idx, "text": text,
                                        "output": out},
                                       ensure_ascii=False) + "\n")
        return idx

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = [ex.submit(work, (i, it)) for i, it in enumerate(items)]
        for fut in as_completed(futures):
            try:
                fut.result()
                done += 1
            except Exception as e:               # per-item isolation
                print(f"item failed: {e}")
    return done


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="Batch TTS via remote API")
    p.add_argument("--jsonl", required=True)
    p.add_argument("--output_dir", default="outputs_api")
    p.add_argument("--base_url", default=os.environ.get(
        "TTSD_API_BASE", "https://api.siliconflow.cn/v1"))
    p.add_argument("--api_key", default=os.environ.get("TTSD_API_KEY", ""))
    p.add_argument("--model", default=DEFAULT_MODEL)
    p.add_argument("--max_workers", type=int, default=4)
    p.add_argument("--use_normalize", action="store_true")
    p.add_argument("--summary_file", default=None)
    args = p.parse_args(argv)
    client = SpeechAPIClient(args.base_url, args.api_key, args.model)
    n = process_jsonl(args.jsonl, args.output_dir, client,
                      args.max_workers, args.use_normalize, args.summary_file)
    print(f"completed {n} items")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
