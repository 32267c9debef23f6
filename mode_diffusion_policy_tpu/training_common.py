"""Shared helpers for the training entry points (CALVIN + LIBERO).

The camera pipelines are parsed from the datamodule transforms config
(conf/datamodule/transforms/*.yaml) and executed INSIDE the jitted train step
(make_train_step(preprocess_fn=...)): raw uint8 frames ship to the device
once and augmentation fuses with the forward pass. Each camera draws an
independent shift key per step from the train-step RNG (matching the
reference's independent per-camera torchvision transforms).
"""
from __future__ import annotations

import logging
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_PIPELINES = {
    "rgb_static": {"size": 224, "pad": 10},
    "rgb_gripper": {"size": 224, "pad": 4},
}


def persist_resolved_config(cfg: Dict, log_dir) -> None:
    """Write the fully-resolved run config to <log_dir>/.hydra/config.yaml —
    the reference's hydra run-dir layout (evaluation/utils.py:159-163 merges
    exactly this file at eval time) — so evaluate_calvin/evaluate_libero can
    rebuild the trained model shape from the checkpoint dir alone and CLI
    flags become overrides instead of required re-typed hyperparameters."""
    import yaml
    from pathlib import Path

    def plain(node):
        if isinstance(node, dict):
            return {str(k): plain(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [plain(v) for v in node]
        if isinstance(node, (str, int, float, bool)) or node is None:
            return node
        return str(node)

    d = Path(log_dir) / ".hydra"
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(plain(cfg), f, sort_keys=False)


def parse_camera_pipelines(transforms_cfg: Optional[Dict]) -> Dict[str, Dict]:
    """{'rgb_static': {'size', 'pad'[, 'jitter', 'erasing']}, ...} from the
    (train) transform specs, plus optional 'word_dropout_p' for a language
    RandomWordDropout entry (reference transforms.py:144-195)."""
    out = {k: dict(v) for k, v in DEFAULT_PIPELINES.items()}
    train = (transforms_cfg or {}).get("train", {})
    for cam in out:
        for spec in train.get(cam, []):
            target = str(spec.get("_target_", ""))
            if target.endswith("Resize"):
                out[cam]["size"] = int(spec.get("size", out[cam]["size"]))
            elif target.endswith("RandomShiftsAug"):
                out[cam]["pad"] = int(spec.get("pad", out[cam]["pad"]))
            elif target.endswith("RobustColorJitter"):
                out[cam]["jitter"] = {
                    "brightness": float(spec.get("brightness", 0.3)),
                    "contrast": float(spec.get("contrast", 0.3)),
                    "saturation": float(spec.get("saturation", 0.3)),
                    "hue": float(spec.get("hue", 0.1))}
            elif target.endswith("RobustRandomErasing"):
                out[cam]["erasing"] = {
                    "p": float(spec.get("p", 0.2)),
                    "scale": tuple(spec.get("scale", (0.02, 0.33))),
                    "ratio": tuple(spec.get("ratio", (0.3, 3.3))),
                    "value": float(spec.get("value", 0))}
    for lang_key in ("language", "lang", "lang_emb"):
        for spec in train.get(lang_key, []):
            if str(spec.get("_target_", "")).endswith("RandomWordDropout"):
                out["word_dropout_p"] = float(spec.get("p", 0.1))
    return out


def make_train_preprocess(pipelines: Dict[str, Dict]) -> Callable:
    """In-jit preprocess_fn(batch, key): uint8 -> augmented normalized
    float, independent shift keys per camera."""
    from .ops.image import preprocess_camera

    def preprocess(batch, key):
        out = dict(batch)
        for i, cam in enumerate(("rgb_static", "rgb_gripper")):
            cam_key = jax.random.fold_in(key, i)
            p = pipelines[cam]
            out[cam] = preprocess_camera(cam_key, batch[cam], size=p["size"],
                                         shift_pad=p["pad"], train=True,
                                         jitter=p.get("jitter"),
                                         erasing=p.get("erasing"))
        wd_p = pipelines.get("word_dropout_p")
        if wd_p and "lang_emb" in batch:
            from .ops.image import random_word_dropout
            out["lang_emb"] = random_word_dropout(
                jax.random.fold_in(key, 7), batch["lang_emb"], wd_p)
        return out

    return preprocess


def make_data_iters(datamodule, pipelines: Dict[str, Dict]):
    """(train_iter, val_iter): train batches stay raw uint8 (preprocessing is
    fused into the jitted step); validation batches are preprocessed eagerly
    in eval mode (no augmentation, 4 batches/epoch)."""
    import jax.numpy as jnp

    from .ops.image import preprocess_camera

    keep = ("rgb_static", "rgb_gripper", "actions", "lang_emb")

    def train_iter(epoch=0):
        for batch in datamodule.train_batches(epoch):
            yield {k: batch[k] for k in keep}

    def val_iter(epoch=0):
        for batch in datamodule.val_batches():
            out = {k: batch[k] for k in keep}
            for cam in ("rgb_static", "rgb_gripper"):
                out[cam] = np.asarray(preprocess_camera(
                    None, jnp.asarray(out[cam]), size=pipelines[cam]["size"],
                    shift_pad=0, train=False))
            yield out

    return train_iter, val_iter


def load_pretrained_into_state(state, cfg: Dict, logger=logger):
    """start_from_pretrained: convert reference torch weights into the fresh
    state (initialize_pretrained_weights, utils/utils.py:31-42). Returns the
    updated state."""
    import jax.numpy as jnp

    from .utils.checkpoint_convert import (convert_film_resnet,
                                           convert_modedit, detect_layout,
                                           load_torch_checkpoint,
                                           normalize_state_dict)
    ckpt_path = cfg.get("model", {}).get("ckpt_path")
    sd = normalize_state_dict(load_torch_checkpoint(str(ckpt_path)))
    n_layers, n_experts, prefix = detect_layout(sd)
    params = dict(state.params)
    params["inner_model"] = convert_modedit(sd, n_layers, n_experts, prefix)
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
    logger.info("initialized from pretrained %s (layers=%d, experts=%d)",
                ckpt_path, n_layers, n_experts)
    return state.replace(params=params, batch_stats=batch_stats,
                         ema_params=jax.tree.map(jnp.copy, params))


def build_calvin_rollout_callback(rollout_cfg: Dict, lang_cache,
                                  pipelines: Dict[str, Dict]):
    """In-training long-horizon rollout hook (the reference's
    RolloutLongHorizon callback wiring, training_calvin.py:92-114): real
    calvin_env when installed, the scripted fake env when
    ``callbacks.rollout_lh.fake_env`` is set (hermetic testing), else None.
    """
    import jax.numpy as jnp

    from .data.calvin_dataset import DEFAULT_OBS_SPACE, DEFAULT_PROPRIO
    from .models.agent import RolloutPolicy
    from .ops.image import preprocess_camera
    from .rollout.env import CalvinEnvWrapper, FakeCalvinEnv
    from .rollout.rollout_long_horizon import make_rollout_callback

    val_annotations = rollout_cfg.get("val_annotations")
    if not val_annotations:
        from .evaluation.evaluate_calvin import load_val_annotations
        val_annotations = load_val_annotations()

    if rollout_cfg.get("fake_env"):
        from .rollout.multistep_sequences import tasks as all_tasks
        raw = FakeCalvinEnv(
            hw=int(rollout_cfg.get("fake_hw", 24)),
            solvable_tasks=set(all_tasks.keys()),
            steps_to_success=int(rollout_cfg.get("fake_steps_to_success", 2)))
        env = CalvinEnvWrapper(raw, DEFAULT_OBS_SPACE, DEFAULT_PROPRIO)
        oracle = raw.make_oracle()
    else:
        try:
            import yaml
            from pathlib import Path
            from calvin_env.envs.play_table_env import get_env
            from calvin_env.envs.tasks import Tasks
            env_raw = get_env(
                Path(rollout_cfg["dataset_path"]) / "validation",
                show_gui=False)
            env = CalvinEnvWrapper(env_raw, DEFAULT_OBS_SPACE, DEFAULT_PROPRIO)
            tasks_yaml = (Path(__file__).resolve().parents[1] / "conf"
                          / "callbacks" / "rollout_lh" / "tasks"
                          / "new_playtable_tasks.yaml")
            with open(tasks_yaml) as f:
                oracle = Tasks(yaml.safe_load(f)["tasks"])
        except (ImportError, KeyError, TypeError) as e:
            logger.info("in-training rollouts disabled (%s)", e)
            return None

    def make_policy(agent, variables):
        class PreprocPolicy(RolloutPolicy):
            def step(self, obs, goal):
                if self._counter % self.multistep == 0:
                    obs = dict(obs)
                    for cam in ("rgb_static", "rgb_gripper"):
                        obs[cam] = np.asarray(preprocess_camera(
                            None, jnp.asarray(obs["rgb_obs"][cam]),
                            size=pipelines[cam]["size"], train=False))
                return super().step(obs, goal)

        return PreprocPolicy(agent, variables, lang_cache)

    return make_rollout_callback(
        env, oracle, val_annotations, make_policy,
        num_sequences=int(rollout_cfg.get("num_sequences", 1000)),
        ep_len=int(rollout_cfg.get("ep_len", 360)))


def build_libero_rollout_callback(rollout_cfg: Dict, lang_cache,
                                  pipelines: Dict[str, Dict]):
    """In-training LIBERO rollout hook (the reference's RolloutLibero
    callback, conf/callbacks/libero.yaml rollout_lh + libero_rollout.py):
    real LIBERO benchmark when installed, scripted FakeLiberoEnv when
    ``callbacks.rollout_lh.fake_env`` is set, else None. Envs are created
    per rollout and closed after, so no simulator state leaks across epochs.
    """
    import jax.numpy as jnp

    from .models.agent import RolloutPolicy
    from .ops.image import preprocess_camera
    from .rollout.libero_rollout import (FakeLiberoEnv, LiberoEvaluator,
                                         make_libero_env)

    fake = bool(rollout_cfg.get("fake_env"))
    if not fake:
        try:
            import libero.libero.benchmark  # noqa: F401
        except ImportError as e:
            logger.info("in-training LIBERO rollouts disabled (%s)", e)
            return None

    size = pipelines["rgb_static"]["size"]

    def make_tasks():
        if fake:
            return [(f"fake task {i}",
                     FakeLiberoEnv(
                         hw=int(rollout_cfg.get("fake_hw", 24)),
                         steps_to_success=int(
                             rollout_cfg.get("fake_steps_to_success", 4))),
                     None)
                    for i in range(int(rollout_cfg.get("fake_tasks", 2)))]
        import os
        from libero.libero import get_libero_path
        from libero.libero.benchmark import get_benchmark
        bench = get_benchmark(rollout_cfg["benchmark_name"])()
        bddl_base = get_libero_path("bddl_files")
        tasks = []
        for i in range(bench.n_tasks):
            task = bench.get_task(i)
            env = make_libero_env(
                os.path.join(bddl_base, task.problem_folder, task.bddl_file),
                size, size)
            tasks.append((task.language, env, bench.get_task_init_states(i)))
        return tasks

    def callback(agent, variables, epoch):
        class PreprocPolicy(RolloutPolicy):
            def step(self, obs, goal):
                if self._counter % self.multistep == 0:
                    obs = dict(obs)
                    for cam in ("rgb_static", "rgb_gripper"):
                        obs[cam] = np.asarray(preprocess_camera(
                            None, jnp.asarray(obs["rgb_obs"][cam]),
                            size=size, train=False))
                return super().step(obs, goal)

        policy = PreprocPolicy(agent, variables, lang_cache)
        evaluator = LiberoEvaluator(
            n_eval=int(rollout_cfg.get("n_eval", 20)),
            max_steps=int(rollout_cfg.get("max_steps", 520)))
        names, rates = [], []
        for desc, env, init_states in make_tasks():
            try:
                rates.append(evaluator.evaluate_task(policy, env, desc,
                                                     init_states))
                names.append(desc)
            finally:
                env.close()
        return evaluator.metrics(evaluator.gather_success_rates(rates), names)

    return callback
