"""LIBERO training entry point.

The reference mode/training_libero.py is a byte-identical clone of
training_calvin.py pointed at config_libero (training_libero.py:59); here the
same factoring: reuse the CALVIN train() with the LIBERO config + datamodule.

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
    import numpy as np

    from .config.builders import (build_agent, build_lang_clip,
                                  build_libero_datamodule)
    from .models.encoders.lang_cache import LangEmbeddingCache
    from .ops.image import preprocess_camera
    from .training.loop import Trainer
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

    trainer_cfg = cfg.get("trainer", {})
    trainer = Trainer(
        agent,
        log_dir=str(Path(cfg.get("log_dir", "runs"))
                    / cfg.get("logger", {}).get("name", "mode_libero")),
        max_epochs=int(trainer_cfg.get("max_epochs", 20)),
        limit_train_batches=int(trainer_cfg.get("limit_train_batches", 1000)),
        limit_val_batches=int(trainer_cfg.get("limit_val_batches", 4)),
        rollout_freq=int(cfg.get("callbacks", {}).get("rollout_lh", {})
                         .get("rollout_freq", 5)),
        optimizer_kwargs=optimizer_kwargs,
        use_wandb=bool(cfg.get("logger", {}).get("use_wandb", False)),
        monitor=cfg.get("callbacks", {}).get("checkpoint", {}).get(
            "monitor", "eval/avg_success_rate"))

    image_hw = (224, 224)
    state = trainer.setup(jax.random.PRNGKey(seed), image_hw=image_hw)

    def _device_ready(batch, train: bool):
        out = {k: batch[k] for k in
               ("rgb_static", "rgb_gripper", "actions", "lang_emb")}
        key = jax.random.PRNGKey(seed + int(np.sum(batch["idx"]) % 65536))
        out["rgb_static"] = np.asarray(preprocess_camera(
            key, jnp.asarray(out["rgb_static"]), size=image_hw[0],
            shift_pad=10, train=train))
        out["rgb_gripper"] = np.asarray(preprocess_camera(
            key, jnp.asarray(out["rgb_gripper"]), size=image_hw[0],
            shift_pad=4, train=train))
        return out

    def train_iter(epoch=0):
        for batch in datamodule.train_batches(epoch):
            yield _device_ready(batch, train=True)

    def val_iter(epoch=0):
        for batch in datamodule.val_batches():
            yield _device_ready(batch, train=False)

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
