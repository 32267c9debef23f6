"""Standalone CALVIN long-horizon benchmark CLI.

Re-design of the reference mode/evaluation/mode_evaluate.py: load a trained
MoDE agent (orbax checkpoint dir or published torch safetensors via the
converter), build the calvin_env wrapper (or --fake-env for smoke runs), run
``--num-sequences`` five-task chains with sampler/step overrides, and write
results.json (SR_1..SR_5, avg_seq_len, per-task stats).

Usage:
    python -m mode_diffusion_policy_tpu.evaluation.evaluate_calvin \
        --checkpoint runs/exp1 --dataset-path /data/calvin/task_D_D \
        [--sampler-type ddim --num-sampling-steps 10] [--fake-env]
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np
import yaml

logger = logging.getLogger(__name__)


def load_val_annotations(path=None):
    path = path or (Path(__file__).resolve().parents[2] / "conf" /
                    "annotations" / "new_playtable_validation.yaml")
    with open(path) as f:
        return yaml.safe_load(f)


# model-shape/sampler flags the CLI can override; parser defaults are None
# so "not passed" is distinguishable from "explicitly set" — when the
# checkpoint dir carries the training run's resolved config
# (<run>/.hydra/config.yaml, written by persist_resolved_config and present
# in the reference's published checkpoint dirs too), the model is rebuilt
# from THAT and CLI flags apply on top (reference
# /root/reference/mode/evaluation/utils.py:159-163 semantics)
MODEL_ARG_DEFAULTS = {
    "sampler_type": "ddim", "num_sampling_steps": 10,
    "noise_scheduler": "exponential", "sigma_min": 0.001, "sigma_max": 80.0,
    "latent_dim": 1024, "n_layers": 12, "resnet_type": "50",
}


def find_train_config(checkpoint):
    """Locate the persisted training config for a checkpoint path: the run
    dir's .hydra/config.yaml (orbax runs + published reference dirs), also
    searched one/two levels up for saved_models/<step> paths."""
    if not checkpoint:
        return None
    ckpt = Path(checkpoint)
    candidates = [ckpt]
    if ckpt.name.isdigit():               # <run>/saved_models/<step>
        candidates += [ckpt.parent, ckpt.parent.parent]
    for base in candidates:
        for rel in (".hydra/config.yaml", "config.yaml"):
            p = base / rel
            if p.is_file():
                import logging
                from ..config.loader import resolve_interpolations
                with open(p) as f:
                    cfg = yaml.safe_load(f)
                if isinstance(cfg, dict) and "model" in cfg:
                    logging.getLogger(__name__).info(
                        "model shape from training config %s", p)
                    return resolve_interpolations(cfg)
    return None


def build_agent(args):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models.agent import MoDEAgent, MoDEAgentConfig
    from ..training.state import TrainState

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    overrides = {k: getattr(args, k) for k in MODEL_ARG_DEFAULTS
                 if getattr(args, k, None) is not None}
    train_cfg = find_train_config(args.checkpoint)
    if train_cfg is not None:
        from ..config.builders import build_agent as build_agent_from_cfg
        agent, _, _ = build_agent_from_cfg(train_cfg["model"], dtype=dtype)
        cfg = agent.cfg
    else:
        cfg = MoDEAgentConfig(dtype=dtype, **MODEL_ARG_DEFAULTS)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(0),
                                     image_hw=(args.image_size,
                                               args.image_size))
    ckpt = Path(args.checkpoint) if args.checkpoint else None
    if ckpt and not ckpt.exists():
        raise FileNotFoundError(f"--checkpoint {ckpt} does not exist")
    if ckpt and ckpt.exists():
        if (ckpt / "saved_models").exists() or ckpt.name.isdigit():
            from ..training.loop import CheckpointManager
            from ..training.optim import make_optimizer as _mo
            opt, _ = _mo(variables["params"], use_lr_scheduler=False)
            state = TrainState.create(variables, opt, jax.random.PRNGKey(0))
            if (ckpt / "saved_models").exists():
                mgr = CheckpointManager(str(ckpt / "saved_models"))
                # prefer the best-by-metric checkpoint when one exists
                state = mgr.restore_best(state)
            else:
                # a specific step directory was requested — restore exactly it
                mgr = CheckpointManager(str(ckpt.parent))
                state = mgr.restore(state, step=int(ckpt.name))
            variables = state.eval_variables(use_ema=not args.no_ema)
            logger.info("restored orbax checkpoint from %s (step %d)", ckpt,
                        int(state.step))
        else:
            # published torch checkpoint (safetensors dir / .ckpt / .pt)
            from ..utils.checkpoint_convert import (convert_modedit,
                                                    detect_layout,
                                                    load_torch_checkpoint,
                                                    normalize_state_dict,
                                                    convert_film_resnet)
            sd = normalize_state_dict(load_torch_checkpoint(str(ckpt)))
            n_layers, n_experts, prefix = detect_layout(sd)
            variables["params"]["inner_model"] = convert_modedit(
                sd, n_layers, n_experts, prefix)
            for enc in ("static_resnet", "gripper_resnet"):
                try:
                    conv = convert_film_resnet(
                        sd, depth=int(cfg.resnet_type), prefix=f"{enc}.")
                    variables["params"][enc] = conv["params"]
                    variables["batch_stats"][enc] = conv["batch_stats"]
                except KeyError:
                    logger.warning("no %s weights in checkpoint", enc)
            logger.info("converted torch checkpoint %s (layers=%d experts=%d)",
                        ckpt, n_layers, n_experts)
    # serving-mode fast paths (Pallas/int8 MoE, fused attention, folded/int8
    # encoders) — applied AFTER restore so the derived collections are built
    # from the loaded weights (docs/PERF.md serving-mode table)
    from ..serving import apply_serving_mode, resolve_serving_mode
    mode = resolve_serving_mode(getattr(args, "serving_mode", "auto"))
    logger.info("serving mode: %s", mode)
    agent, variables = apply_serving_mode(agent, variables, mode)
    return agent, variables


def build_env(args, observation_space, proprio_state):
    from ..rollout.env import CalvinEnvWrapper, FakeCalvinEnv

    if args.fake_env:
        from ..rollout.multistep_sequences import tasks as all_tasks
        raw = FakeCalvinEnv(hw=args.image_size,
                            solvable_tasks=set(all_tasks.keys()),
                            steps_to_success=args.fake_steps_to_success)
        return (CalvinEnvWrapper(raw, observation_space, proprio_state),
                raw.make_oracle())
    # real calvin_env (PyBullet) — external dependency
    try:
        from calvin_env.envs.play_table_env import get_env
        from calvin_env.envs.tasks import Tasks
    except ImportError as e:
        print("calvin_env not installed; use --fake-env for a smoke run",
              file=sys.stderr)
        raise
    env = get_env(Path(args.dataset_path) / "validation", show_gui=False)
    tasks_yaml = (Path(__file__).resolve().parents[2] / "conf" / "callbacks"
                  / "rollout_lh" / "tasks" / "new_playtable_tasks.yaml")
    with open(tasks_yaml) as f:
        oracle = Tasks(yaml.safe_load(f)["tasks"])
    return (CalvinEnvWrapper(env, observation_space, proprio_state), oracle)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--dataset-path", default=None)
    p.add_argument("--num-sequences", type=int, default=1000)
    p.add_argument("--ep-len", type=int, default=360)
    # model/sampler flags: None = "use the training run's persisted config
    # (.hydra/config.yaml in the checkpoint dir) or the flagship defaults";
    # a passed value always wins (MODEL_ARG_DEFAULTS)
    p.add_argument("--sampler-type", default=None)
    p.add_argument("--num-sampling-steps", type=int, default=None)
    p.add_argument("--sampler-unroll", type=int, default=1,
                   help="DDIM scan unroll factor; = num sampling steps fully "
                        "unrolls so per-step routing/sigma gathers fold into "
                        "constants (bit-identical; longer compile — "
                        "docs/PERF.md 'sampler glue')")
    p.add_argument("--noise-scheduler", default=None)
    p.add_argument("--sigma-min", type=float, default=None)
    p.add_argument("--sigma-max", type=float, default=None)
    p.add_argument("--latent-dim", type=int, default=None)
    p.add_argument("--n-layers", type=int, default=None)
    p.add_argument("--resnet-type", default=None)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--serving-mode", default="auto",
                   help="TPU fast-path preset: reference | parity | "
                        "max-throughput | b1-latency | b1-latency-max | auto (parity on TPU, "
                        "reference elsewhere). docs/PERF.md has the measured "
                        "speed/accuracy of each.")
    p.add_argument("--clip-checkpoint", default=None,
                   help="OpenAI CLIP state dict for the language tower "
                        "(random-init tower otherwise; required for "
                        "meaningful language conditioning)")
    p.add_argument("--log-dir", default="eval_results")
    p.add_argument("--fake-env", action="store_true")
    p.add_argument("--fake-steps-to-success", type=int, default=3)
    p.add_argument("--num-videos", type=int, default=0)
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from ..data.calvin_dataset import DEFAULT_OBS_SPACE, DEFAULT_PROPRIO
    from ..evaluation.utils import print_and_save
    from ..models.agent import RolloutPolicy
    from ..models.encoders.lang_cache import LangEmbeddingCache
    from ..rollout.rollout_long_horizon import LongHorizonEvaluator
    from ..rollout.video import RolloutVideo

    agent, variables = build_agent(args)
    env, oracle = build_env(args, DEFAULT_OBS_SPACE, DEFAULT_PROPRIO)
    val_annotations = load_val_annotations()

    from ..config.builders import build_lang_clip
    lang = build_lang_clip(clip_checkpoint=args.clip_checkpoint)
    lang_cache = LangEmbeddingCache(lang)

    class PreprocPolicy(RolloutPolicy):
        """RolloutPolicy + on-device image preprocessing for raw env obs."""

        def step(self, obs, goal):
            from ..ops.image import preprocess_camera
            import jax.numpy as jnp
            if self._counter % self.multistep == 0:
                obs = dict(obs)
                obs["rgb_static"] = np.asarray(preprocess_camera(
                    None, jnp.asarray(obs["rgb_obs"]["rgb_static"]),
                    size=args.image_size, train=False))
                obs["rgb_gripper"] = np.asarray(preprocess_camera(
                    None, jnp.asarray(obs["rgb_obs"]["rgb_gripper"]),
                    size=args.image_size, train=False))
            return super().step(obs, goal)

    policy = PreprocPolicy(agent, variables, lang_cache,
                           sampler_unroll=args.sampler_unroll)
    video = RolloutVideo(save_dir=str(Path(args.log_dir) / "videos")) \
        if args.num_videos > 0 else None
    evaluator = LongHorizonEvaluator(
        env, oracle, val_annotations, num_sequences=args.num_sequences,
        ep_len=args.ep_len, num_videos=args.num_videos, rollout_video=video)
    local = evaluator.evaluate_policy(policy)
    results = evaluator.gather_results(local)
    if video is not None:
        video.log()
    ranking = print_and_save(results, evaluator.eval_sequences[:len(results)],
                             args.log_dir)
    print(f"avg_seq_len: {ranking['avg_seq_len']:.3f}")
    print(f"chain_sr: {ranking['chain_sr']}")
    return ranking


if __name__ == "__main__":
    main()
