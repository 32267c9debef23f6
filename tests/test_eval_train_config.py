"""Eval CLIs rebuild the model from the training run's persisted config
(VERDICT r2 weak #6 / next-round #8): training writes
<run>/.hydra/config.yaml (reference hydra layout, evaluation/utils.py:159-163)
and evaluate_calvin.build_agent reads it, with CLI flags as overrides only.
"""
from types import SimpleNamespace

from mode_diffusion_policy_tpu.evaluation.evaluate_calvin import (
    MODEL_ARG_DEFAULTS, build_agent, find_train_config)
from mode_diffusion_policy_tpu.training_common import persist_resolved_config


def _run_dir(tmp_path, **model_top):
    run = tmp_path / "run1"
    (run / "saved_models").mkdir(parents=True)
    cfg = {
        "model": {
            "latent_dim": 64, "resnet_type": "18", "sampler_type": "euler",
            "num_sampling_steps": 4, "cond_dim": 32,
            "model": {"inner_model": {"n_layers": 1, "n_heads": 2,
                                      "num_experts": 4, "top_k": 2}},
            **model_top,
        },
        "datamodule": {"root_data_dir": "/nonexistent"},
    }
    persist_resolved_config(cfg, run)
    return run


def _args(checkpoint, **over):
    ns = SimpleNamespace(checkpoint=str(checkpoint), bf16=False,
                         image_size=24, no_ema=True,
                         serving_mode="reference", clip_checkpoint=None)
    for k in MODEL_ARG_DEFAULTS:
        setattr(ns, k, None)
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_find_train_config_locations(tmp_path):
    run = _run_dir(tmp_path)
    assert find_train_config(str(run))["model"]["latent_dim"] == 64
    # saved_models/<step> paths search upward to the run dir
    step_dir = run / "saved_models" / "17"
    step_dir.mkdir()
    assert find_train_config(str(step_dir))["model"]["latent_dim"] == 64
    assert find_train_config(str(tmp_path / "nope")) is None
    assert find_train_config(None) is None


def test_build_agent_uses_train_config(tmp_path):
    run = _run_dir(tmp_path)
    agent, variables = build_agent(_args(run))
    assert agent.cfg.latent_dim == 64
    assert agent.cfg.n_layers == 1
    assert agent.cfg.resnet_type == "18"
    assert agent.cfg.sampler_type == "euler"
    assert agent.cfg.num_sampling_steps == 4
    assert agent.cfg.cond_dim == 32
    assert "params" in variables


def test_cli_flags_override_train_config(tmp_path):
    run = _run_dir(tmp_path)
    agent, _ = build_agent(_args(run, num_sampling_steps=7,
                                 sampler_type="ddim"))
    assert agent.cfg.num_sampling_steps == 7
    assert agent.cfg.sampler_type == "ddim"
    assert agent.cfg.latent_dim == 64  # non-overridden values stay


def test_defaults_without_train_config(tmp_path):
    ckpt = tmp_path / "empty_run"
    (ckpt / "saved_models").mkdir(parents=True)
    agent, _ = build_agent(_args(ckpt, latent_dim=64, n_layers=1,
                                 resnet_type="18"))
    assert agent.cfg.latent_dim == 64
    assert agent.cfg.sampler_type == MODEL_ARG_DEFAULTS["sampler_type"]
