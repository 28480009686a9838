"""Standalone codec round-trip CLI: encode + decode a directory of wavs.

Equivalent of reference XY_Tokenizer/inference.py: batch round-trip through
the codec and save reconstructions for listening tests.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Codec round-trip (TPU)")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--config", default=None, help="codec yaml (reference format)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--tiny", action="store_true",
                   help="random tiny codec (smoke test)")
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    # remote-attach debug flags (reference XY_Tokenizer/inference.py:21-28)
    p.add_argument("--debug", type=int, default=0, nargs="?")
    p.add_argument("--debug_ip", default="localhost")
    p.add_argument("--debug_port", type=int, default=5678)
    args = p.parse_args(argv)

    if args.debug == 1:
        from ..utils.helpers import waiting_for_debug
        waiting_for_debug(args.debug_ip, args.debug_port)

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ..core.config import CodecConfig
    from ..models.codec.model import XYTokenizer
    from ..utils.audio_io import read_wav, to_mono_16k, write_wav
    from ..utils.helpers import find_audio_files

    if args.tiny:
        spt = XYTokenizer.init_random(CodecConfig().tiny(), seed=0)
    else:
        spt = XYTokenizer.load_from_checkpoint(args.config, args.checkpoint)

    files = find_audio_files(args.input_dir)
    if not files:
        print(f"no audio files in {args.input_dir}", file=sys.stderr)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    total_audio, total_wall = 0.0, 0.0
    for bi in range(0, len(files), args.batch_size):
        batch_files = files[bi:bi + args.batch_size]
        wavs = []
        for f in batch_files:
            wav, sr = read_wav(f)
            wavs.append(to_mono_16k(wav, sr, spt.input_sample_rate))
        t0 = time.perf_counter()
        codes = spt.encode(wavs, overlap_seconds=10)["codes_list"]
        recon = spt.decode(codes, overlap_seconds=10)["syn_wav_list"]
        total_wall += time.perf_counter() - t0
        for f, wav in zip(batch_files, recon):
            out = os.path.join(args.output_dir,
                               os.path.splitext(os.path.basename(f))[0] + "_recon.wav")
            write_wav(out, np.asarray(wav), spt.output_sample_rate)
            total_audio += len(wav) / spt.output_sample_rate
            print(f"saved {out}")
    rtf = total_audio / total_wall if total_wall else 0.0
    print(f"round-trip RTF: {rtf:.1f}x realtime "
          f"({total_audio:.1f}s audio / {total_wall:.2f}s wall)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
