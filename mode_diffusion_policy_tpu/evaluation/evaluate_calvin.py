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


def build_agent(args):
    import jax
    import jax.numpy as jnp

    from ..models.agent import MoDEAgent, MoDEAgentConfig
    from ..training.state import TrainState

    cfg = MoDEAgentConfig(
        sampler_type=args.sampler_type,
        num_sampling_steps=args.num_sampling_steps,
        noise_scheduler=args.noise_scheduler,
        sigma_min=args.sigma_min, sigma_max=args.sigma_max,
        latent_dim=args.latent_dim, n_layers=args.n_layers,
        resnet_type=args.resnet_type,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
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
                        sd, depth=int(args.resnet_type), prefix=f"{enc}.")
                    variables["params"][enc] = conv["params"]
                    variables["batch_stats"][enc] = conv["batch_stats"]
                except KeyError:
                    logger.warning("no %s weights in checkpoint", enc)
            logger.info("converted torch checkpoint %s (layers=%d experts=%d)",
                        ckpt, n_layers, n_experts)
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
    p.add_argument("--sampler-type", default="ddim")
    p.add_argument("--num-sampling-steps", type=int, default=10)
    p.add_argument("--noise-scheduler", default="exponential")
    p.add_argument("--sigma-min", type=float, default=0.001)
    p.add_argument("--sigma-max", type=float, default=80.0)
    p.add_argument("--latent-dim", type=int, default=1024)
    p.add_argument("--n-layers", type=int, default=12)
    p.add_argument("--resnet-type", default="50")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no-ema", action="store_true")
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

    policy = PreprocPolicy(agent, variables, lang_cache)
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
