"""One-click finetune workflow: preprocess -> train, driven by one YAML.

Equivalent of reference finetune/finetune_workflow.py (config-driven chaining
with a --pass_data_preprocess skip flag).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Finetune workflow (TPU)")
    p.add_argument("--config", required=True, help="workflow yaml")
    p.add_argument("--pass_data_preprocess", action="store_true",
                   help="skip preprocessing (data already prepared)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    args = p.parse_args(argv)

    import yaml
    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    data_cfg = cfg.get("data_preprocess", {})
    train_cfg = cfg.get("finetune", {})
    processed_dir = data_cfg.get("output_dir", "processed_data")

    if not args.pass_data_preprocess:
        if args.platform == "cpu":
            os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                       " --xla_force_host_platform_device_count=8").strip()
            import jax
            jax.config.update("jax_platforms", "cpu")
        from ..train.data import process_data
        if args.tiny:
            from ..core.config import CodecConfig
            from ..models.codec.model import XYTokenizer
            from ..utils.mock_tokenizer import MockTokenizer
            tokenizer = MockTokenizer()
            spt = XYTokenizer.init_random(CodecConfig().tiny(), seed=0)
            speech_offset = 100
        else:
            from transformers import AutoTokenizer
            from ..models.codec.model import XYTokenizer
            tokenizer = AutoTokenizer.from_pretrained(data_cfg["model_path"])
            spt = XYTokenizer.load_from_checkpoint(
                data_cfg["spt_config"], data_cfg["spt_checkpoint"])
            speech_offset = 151665
        process_data(data_cfg["jsonl"], tokenizer, spt, processed_dir,
                     data_name=data_cfg.get("data_name", "processed_data"),
                     use_normalize=data_cfg.get("use_normalize", True),
                     speech_offset=speech_offset)

    from .finetune import main as finetune_main
    ft_args = ["--data_dir", processed_dir,
               "--output_dir", train_cfg.get("output_dir", "finetune_out")]
    if train_cfg.get("model_path"):
        ft_args += ["--model_path", train_cfg["model_path"]]
    if train_cfg.get("training_config"):
        ft_args += ["--training_config", train_cfg["training_config"]]
    if train_cfg.get("lora"):
        ft_args += ["--lora"]
        if train_cfg.get("lora_config"):
            ft_args += ["--lora_config", train_cfg["lora_config"]]
    if train_cfg.get("max_steps"):
        ft_args += ["--max_steps", str(train_cfg["max_steps"])]
    if args.tiny:
        ft_args += ["--tiny"]
    if args.platform != "default":
        ft_args += ["--platform", args.platform]
    return finetune_main(ft_args)


if __name__ == "__main__":
    sys.exit(main())
