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


def test_lora_artifact_serves_as_voice(tiny_data, tmp_path):
    """Train -> serve loop: the finetune CLI's lora_factors.npz registers
    as a multi-LoRA voice (layerwise-tree format via load_adapter_any) and
    the pool serves a request through it."""
    import jax
    import jax.numpy as jnp
    from moss_ttsd_tpu.core.config import LMConfig
    from moss_ttsd_tpu.decode.continuous import ContinuousBatcher
    from moss_ttsd_tpu.models.lm import AsteroidLM
    from moss_ttsd_tpu.utils.convert_lora import load_adapter_any
    from moss_ttsd_tpu.utils.mock_tokenizer import MockTokenizer
    from tests.test_decode import greedy_sampling

    out = str(tmp_path / "lora")
    rc = finetune_main(["--data_dir", tiny_data, "--output_dir", out,
                        "--tiny", "--lora", "--max_steps", "2"])
    assert rc == 0
    tree, alpha, rslora = load_adapter_any(
        os.path.join(out, "lora_factors.npz"))

    # the same tiny base model the finetune CLI trained against
    tok = MockTokenizer()
    cfg = LMConfig(dtype="float32", param_dtype="float32").tiny(
        pad_token_id=tok.pad_token_id)
    model = AsteroidLM(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, cfg.channels), jnp.int32))

    cb = ContinuousBatcher(cfg, params, greedy_sampling(cfg.channels),
                           slots=1, base=24, max_steps=16,
                           cache_dtype=jnp.float32)
    aid = cb.register_adapter("trained", tree, alpha=alpha,
                              use_rslora=rslora)
    assert aid == 1
    # every finetune target made it into the stacks at the right geometry
    assert set(cb.lora.stacks) == {"q_proj", "k_proj", "v_proj", "o_proj",
                                   "gate_proj", "up_proj", "down_proj"}
    a_q, _ = cb.lora.stacks["q_proj"]
    assert a_q.shape[0] == cfg.num_hidden_layers
    assert a_q.shape[2] == cfg.hidden_size

    prompt = np.full((8, cfg.channels), cfg.speech_pad_token, np.int32)
    prompt[:, 0] = np.arange(1, 9)
    slot = cb.submit(prompt, max_new_tokens=8, adapter="trained")
    cb.run(steps=12)
    res = cb.collect(slot)
    assert res.steps >= 1


def test_sp_train_matches_dp(tiny_data, tmp_path):
    """sequence_parallel: 2 in the training config shards the batch time
    axis over a "seq" mesh axis (cli/finetune.py dp_shardings) and, at
    matched effective batch, trains to the same weights as plain DP."""
    import yaml

    def run(out, extra_cfg):
        cfg = {"logging_steps": 1, "lr_scheduler_type": "constant",
               "report_to": "none"}
        cfg.update(extra_cfg)
        cfg_path = str(tmp_path / f"{os.path.basename(out)}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        rc = finetune_main(["--data_dir", tiny_data, "--output_dir", out,
                            "--tiny", "--max_steps", "3",
                            "--training_config", cfg_path])
        assert rc == 0
        return np.load(os.path.join(out, "model.npz"))

    # DP: 8 data devices x per_device 1 = 8 rows/step
    # SP: (data 4, seq 2) mesh x per_device 2 = 8 rows/step, T sharded 2-way
    dp = run(str(tmp_path / "dp"), {"per_device_train_batch_size": 1})
    sp = run(str(tmp_path / "sp"), {"per_device_train_batch_size": 2,
                                    "sequence_parallel": 2})
    assert set(dp.files) == set(sp.files)
    for k in dp.files:
        np.testing.assert_allclose(sp[k], dp[k], atol=2e-6, err_msg=k)


def test_pp_train_matches_dp(tiny_data, tmp_path):
    """pipeline_stages: 2 in the training config runs the GPipe step
    (parallel/pipeline.py) and, at matched effective batch, trains to the
    same weights as the plain DP+accumulation run."""
    import yaml

    def run(out, extra_cfg):
        cfg = {"gradient_accumulation_steps": 2, "logging_steps": 1,
               "lr_scheduler_type": "constant", "report_to": "none"}
        cfg.update(extra_cfg)
        cfg_path = str(tmp_path / f"{os.path.basename(out)}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        rc = finetune_main(["--data_dir", tiny_data, "--output_dir", out,
                            "--tiny", "--max_steps", "3",
                            "--training_config", cfg_path])
        assert rc == 0
        return np.load(os.path.join(out, "model.npz"))

    # DP: 8 data devices x per_device 1 x accum 2 = 16 rows/step
    # PP: pipe 2 x 4 data devices x per_device 2 x accum(=microbatch) 2 = 16
    dp = run(str(tmp_path / "dp"), {"per_device_train_batch_size": 1})
    pp = run(str(tmp_path / "pp"), {"per_device_train_batch_size": 2,
                                    "pipeline_stages": 2})
    assert set(dp.files) == set(pp.files)
    for k in dp.files:
        np.testing.assert_allclose(pp[k], dp[k], atol=2e-6, err_msg=k)
