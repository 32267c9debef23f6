"""CALVIN training entry point.

Re-design of the reference mode/training_calvin.py:59-175 without Lightning/
Hydra: the same config surface (conf/config_calvin.yaml + dotted overrides),
auto-resume from the newest checkpoint, pretrained-weight initialization,
EMA + rollout callbacks, crash forensics, and mesh data parallelism instead
of DDP. Camera augmentation runs inside the jitted train step
(training_common.make_train_preprocess) — raw uint8 ships to the device once.

Usage:
    python -m mode_diffusion_policy_tpu.training_calvin \
        root_data_dir=/data/calvin/task_D_D [trainer.max_epochs=20] ...
"""
from __future__ import annotations

import logging
import sys
import traceback
from pathlib import Path

logger = logging.getLogger(__name__)

CONF_DIR = Path(__file__).resolve().parents[1] / "conf"


def train(cfg: dict):
    import jax
    import jax.numpy as jnp

    from .config.builders import (build_agent, build_calvin_datamodule,
                                  build_checkpoint_cfg, build_ema_cfg,
                                  build_lang_clip)
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

    datamodule = build_calvin_datamodule(cfg["datamodule"],
                                         lang_embed=lang_cache).setup()
    pipelines = parse_camera_pipelines(cfg["datamodule"].get("transforms"))

    # optional in-training rollout: real calvin_env when installed, the
    # fake env when callbacks.rollout_lh.fake_env=true, else disabled
    from .training_common import build_calvin_rollout_callback
    rollout_cfg = dict(cfg.get("callbacks", {}).get("rollout_lh", {}))
    rollout_cfg.setdefault("dataset_path", cfg.get("root_data_dir"))
    rollout_callback = build_calvin_rollout_callback(rollout_cfg, lang_cache,
                                                     pipelines)

    trainer_cfg = cfg.get("trainer", {})
    callbacks_cfg = cfg.get("callbacks", {})
    trainer = Trainer(
        agent,
        log_dir=str(Path(cfg.get("log_dir", "runs"))
                    / cfg.get("logger", {}).get("name", "mode_calvin")),
        max_epochs=int(trainer_cfg.get("max_epochs", 20)),
        limit_train_batches=int(trainer_cfg.get("limit_train_batches", 1000)),
        limit_val_batches=int(trainer_cfg.get("limit_val_batches", 4)),
        rollout_freq=int(rollout_cfg.get("rollout_freq", 5)),
        optimizer_kwargs=optimizer_kwargs,
        ema_kwargs=build_ema_cfg(**callbacks_cfg.get("ema", {})),
        checkpoint_kwargs=build_checkpoint_cfg(
            **callbacks_cfg.get("checkpoint", {})),
        use_wandb=bool(cfg.get("logger", {}).get("use_wandb", False)),
        rollout_callback=rollout_callback,
        preprocess_fn=make_train_preprocess(pipelines),
        auto_layout=str(trainer_cfg.get("auto_layout",
                                        "false")).lower() == "true",
        bf16_full_state=str(trainer_cfg.get("bf16_full_state",
                                            "false")).lower() == "true")

    # persist the resolved config into the run dir (reference .hydra layout)
    # so eval CLIs can rebuild the model shape without re-typed flags
    from .training_common import persist_resolved_config
    persist_resolved_config(cfg, trainer.logger.log_dir)

    image_hw = (pipelines["rgb_static"]["size"],
                pipelines["rgb_static"]["size"])
    state = trainer.setup(jax.random.PRNGKey(seed), image_hw=image_hw)

    # start_from_pretrained applies only to FRESH runs — when auto-resume
    # restored a checkpoint, keep the restored weights (otherwise a crash
    # restart would silently reset weights mid-run while keeping opt/LR state)
    if (cfg.get("model", {}).get("start_from_pretrained")
            and cfg.get("model", {}).get("ckpt_path")
            and not trainer.resumed):
        state = load_pretrained_into_state(state, cfg, logger)

    train_iter, val_iter = make_data_iters(datamodule, pipelines)
    try:
        state = trainer.fit(state, train_iter, val_iter)
    except Exception:
        # crash forensics (training_calvin.py:116-132)
        exc_type, exc_value, tb = sys.exc_info()
        logger.error("training crashed:\n%s",
                     "".join(traceback.format_exception(exc_type, exc_value,
                                                        tb)))
        frames = traceback.extract_tb(tb)
        if frames:
            logger.error("crash frame: %s:%d in %s", frames[-1].filename,
                         frames[-1].lineno, frames[-1].name)
        raise
    finally:
        trainer.logger.close()
    return state


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    argv = list(sys.argv[1:] if argv is None else argv)
    from .config.loader import load_config
    cfg = load_config(CONF_DIR, "config_calvin", overrides=argv)
    return train(cfg)


if __name__ == "__main__":
    main()
