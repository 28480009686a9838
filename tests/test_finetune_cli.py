"""Finetune CLI end-to-end on tiny data: train, checkpoint, resume.

Exercises the preemption-recovery contract (SURVEY §5: the reference has no
resume; this framework adds Orbax checkpoint/restore)."""
import json
import os

import numpy as np
import pytest

from moss_ttsd_tpu.cli.finetune import main as finetune_main


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    """Synthesize a tiny preprocessed dataset directly (npz shards)."""
    d = tmp_path_factory.mktemp("ft_data")
    rng = np.random.default_rng(0)
    flat = {}
    for i in range(8):
        T = 12 + i
        ids = np.full((T, 8), 64, np.int64)          # tiny speech pad
        ids[:, 0] = rng.integers(1, 80, T)
        labels = ids.copy()
        labels[: T // 2] = -100
        flat[f"input_ids_{i}"] = ids
        flat[f"labels_{i}"] = labels
    np.savez(os.path.join(d, "processed_data_00000.npz"), **flat)
    return str(d)


def test_train_checkpoint_resume_equals_straight_run(tiny_data, tmp_path):
    out_a = str(tmp_path / "straight")
    out_b = str(tmp_path / "resumed")

    # straight 4-step run
    rc = finetune_main(["--data_dir", tiny_data, "--output_dir", out_a,
                        "--tiny", "--max_steps", "4"])
    assert rc == 0
    assert os.path.exists(os.path.join(out_a, "model.npz"))

    # interrupted run: 2 steps with checkpointing...
    rc = finetune_main(["--data_dir", tiny_data, "--output_dir", out_b,
                        "--tiny", "--max_steps", "2", "--save_steps", "2"])
    assert rc == 0
    assert os.path.isdir(os.path.join(out_b, "checkpoints", "step_2"))

    # ...then resume to step 4
    rc = finetune_main(["--data_dir", tiny_data, "--output_dir", out_b,
                        "--tiny", "--max_steps", "4", "--save_steps", "2",
                        "--resume"])
    assert rc == 0

    a = np.load(os.path.join(out_a, "model.npz"))
    b = np.load(os.path.join(out_b, "model.npz"))
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)

    cfg = json.load(open(os.path.join(out_b, "train_config.json")))
    assert cfg["steps"] == 4


def test_lora_train_smoke(tiny_data, tmp_path):
    out = str(tmp_path / "lora")
    rc = finetune_main(["--data_dir", tiny_data, "--output_dir", out,
                        "--tiny", "--lora", "--max_steps", "2"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "model_merged.npz"))
    assert os.path.exists(os.path.join(out, "lora_factors.npz"))
