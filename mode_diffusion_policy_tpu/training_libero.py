"""LIBERO training entry point.

The reference mode/training_libero.py is a byte-identical clone of
training_calvin.py pointed at config_libero (training_libero.py:59); here
the shared machinery lives in training_common and only the datamodule +
config name differ.

Usage:
    python -m mode_diffusion_policy_tpu.training_libero \
        root_data_dir=/data/libero benchmark_name=libero_10 ...
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path

logger = logging.getLogger(__name__)

CONF_DIR = Path(__file__).resolve().parents[1] / "conf"


def train(cfg: dict):
    import jax
    import jax.numpy as jnp

    from .config.builders import (build_agent, build_checkpoint_cfg,
                                  build_ema_cfg, build_lang_clip,
                                  build_libero_datamodule)
    from .models.encoders.lang_cache import LangEmbeddingCache
    from .training.loop import Trainer
    from .training_common import (load_pretrained_into_state,
                                  make_data_iters, make_train_preprocess,
                                  parse_camera_pipelines)
    from .utils.utils import log_environment_info

    log_environment_info(logger)
    seed = int(cfg.get("seed", 42))
    dtype = jnp.bfloat16 if str(cfg.get("trainer", {}).get(
        "precision", "bf16")).startswith("bf16") else jnp.float32
    agent, optimizer_kwargs, lang_cfg = build_agent(cfg["model"], dtype=dtype)

    lang = build_lang_clip(**{k: v for k, v in lang_cfg.items()
                              if not k.startswith("_")},
                           clip_checkpoint=cfg.get("clip_checkpoint"))
    lang_cache = LangEmbeddingCache(lang)
    datamodule = build_libero_datamodule(cfg["datamodule"],
                                         lang_embed=lang_cache).setup()
    pipelines = parse_camera_pipelines(cfg["datamodule"].get("transforms"))

    # in-training LIBERO rollouts: real benchmark when libero is installed,
    # fake envs when callbacks.rollout_lh.fake_env=true, else disabled
    from .training_common import build_libero_rollout_callback
    rollout_cfg = dict(cfg.get("callbacks", {}).get("rollout_lh", {}))
    rollout_cfg.setdefault("benchmark_name", cfg.get("libero_benchmark"))
    rollout_callback = build_libero_rollout_callback(rollout_cfg, lang_cache,
                                                     pipelines)

    trainer_cfg = cfg.get("trainer", {})
    callbacks_cfg = cfg.get("callbacks", {})
    trainer = Trainer(
        agent,
        log_dir=str(Path(cfg.get("log_dir", "runs"))
                    / cfg.get("logger", {}).get("name", "mode_libero")),
        max_epochs=int(trainer_cfg.get("max_epochs", 20)),
        limit_train_batches=int(trainer_cfg.get("limit_train_batches", 1000)),
        limit_val_batches=int(trainer_cfg.get("limit_val_batches", 4)),
        rollout_freq=int(callbacks_cfg.get("rollout_lh", {})
                         .get("rollout_freq", 5)),
        optimizer_kwargs=optimizer_kwargs,
        ema_kwargs=build_ema_cfg(**callbacks_cfg.get("ema", {})),
        checkpoint_kwargs=build_checkpoint_cfg(
            **callbacks_cfg.get("checkpoint", {})),
        use_wandb=bool(cfg.get("logger", {}).get("use_wandb", False)),
        preprocess_fn=make_train_preprocess(pipelines),
        rollout_callback=rollout_callback,
        monitor=callbacks_cfg.get("checkpoint", {}).get(
            "monitor", "eval/avg_success_rate"),
        auto_layout=str(trainer_cfg.get("auto_layout",
                                        "false")).lower() == "true",
        bf16_full_state=str(trainer_cfg.get("bf16_full_state",
                                            "false")).lower() == "true")

    from .training_common import persist_resolved_config
    persist_resolved_config(cfg, trainer.logger.log_dir)

    image_hw = (pipelines["rgb_static"]["size"],
                pipelines["rgb_static"]["size"])
    state = trainer.setup(jax.random.PRNGKey(seed), image_hw=image_hw)
    if (cfg.get("model", {}).get("start_from_pretrained")
            and cfg.get("model", {}).get("ckpt_path")
            and not trainer.resumed):
        state = load_pretrained_into_state(state, cfg, logger)

    train_iter, val_iter = make_data_iters(datamodule, pipelines)
    try:
        state = trainer.fit(state, train_iter, val_iter)
    finally:
        trainer.logger.close()
    return state


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    argv = list(sys.argv[1:] if argv is None else argv)
    from .config.loader import load_config
    cfg = load_config(CONF_DIR, "config_libero", overrides=argv)
    return train(cfg)


if __name__ == "__main__":
    main()
