"""Standalone codec round-trip CLI: encode + decode a directory of wavs.

Equivalent of reference XY_Tokenizer/inference.py: batch round-trip through
the codec and save reconstructions for listening tests. Beyond the
reference, ``--metrics`` also computes objective reconstruction quality per
file (log-mel L1 at the codec's own Whisper-mel frontend semantics + SI-SNR
at 16 kHz) and writes a summary JSON — listening tests stay the gold
standard, but regressions surface without ears.
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
    p.add_argument("--metrics", nargs="?", const="-", default=None,
                   metavar="OUT.json",
                   help="compute per-file log-mel L1 + SI-SNR vs the input "
                        "(summary JSON to OUT.json, or stdout when bare)")
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

    def recon_metrics(inp16, recon, out_sr):
        """log-mel L1 (codec mel semantics) + SI-SNR, both at 16 kHz."""
        import jax.numpy as jnp
        from ..ops.dsp import log_mel_spectrogram, resample
        r16 = resample(np.asarray(recon, np.float32), out_sr, 16000)
        n = min(len(inp16), len(r16))
        a, b = inp16[:n].astype(np.float32), r16[:n].astype(np.float32)
        mel_a = np.asarray(log_mel_spectrogram(jnp.asarray(a)[None]))[0]
        mel_b = np.asarray(log_mel_spectrogram(jnp.asarray(b)[None]))[0]
        m = min(mel_a.shape[-1], mel_b.shape[-1])
        mel_l1 = float(np.mean(np.abs(mel_a[..., :m] - mel_b[..., :m])))
        # SI-SNR: scale-invariant (the codec does not promise gain match)
        a0, b0 = a - a.mean(), b - b.mean()
        s_t = (np.dot(b0, a0) / (np.dot(a0, a0) + 1e-8)) * a0
        e = b0 - s_t
        si_snr = float(10 * np.log10(
            (np.dot(s_t, s_t) + 1e-8) / (np.dot(e, e) + 1e-8)))
        return {"mel_l1": round(mel_l1, 4), "si_snr_db": round(si_snr, 2)}

    per_file = []
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
        for f, inp, wav in zip(batch_files, wavs, recon):
            out = os.path.join(args.output_dir,
                               os.path.splitext(os.path.basename(f))[0] + "_recon.wav")
            write_wav(out, np.asarray(wav), spt.output_sample_rate)
            total_audio += len(wav) / spt.output_sample_rate
            if args.metrics is not None:
                m = recon_metrics(inp, np.asarray(wav),
                                  spt.output_sample_rate)
                m["file"] = os.path.basename(f)
                per_file.append(m)
                print(f"saved {out}  mel_l1={m['mel_l1']} "
                      f"si_snr={m['si_snr_db']}dB")
            else:
                print(f"saved {out}")
    rtf = total_audio / total_wall if total_wall else 0.0
    print(f"round-trip RTF: {rtf:.1f}x realtime "
          f"({total_audio:.1f}s audio / {total_wall:.2f}s wall)")
    if args.metrics is not None and per_file:
        import json
        summary = {
            "mean_mel_l1": round(float(np.mean([m["mel_l1"]
                                                for m in per_file])), 4),
            "mean_si_snr_db": round(float(np.mean([m["si_snr_db"]
                                                   for m in per_file])), 2),
            "files": per_file,
        }
        if args.metrics == "-":
            print(json.dumps(summary))
        else:
            with open(args.metrics, "w") as f:
                json.dump(summary, f, indent=1)
            print(f"metrics written to {args.metrics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
