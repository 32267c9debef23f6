"""Standalone LIBERO benchmark CLI.

Re-design of the reference mode/evaluation/mode_evaluate_libero.py:83-355:
evaluate a MoDE agent on libero_10/libero_90 (20 rollouts/task, 520-step
cap) with fixed init states, writing per-task and average success rates.
``--fake-env`` runs the full pipeline against scripted envs for smoke tests.

Usage:
    python -m mode_diffusion_policy_tpu.evaluation.evaluate_libero \
        --checkpoint runs/exp1 --benchmark libero_10 [--fake-env]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--benchmark", default="libero_10")
    p.add_argument("--root-data-dir", default=None)
    p.add_argument("--n-eval", type=int, default=20)
    p.add_argument("--max-steps", type=int, default=520)
    p.add_argument("--img-size", type=int, default=224)
    # None = use the checkpoint dir's persisted training config (or the
    # flagship defaults) — see evaluate_calvin.MODEL_ARG_DEFAULTS
    p.add_argument("--latent-dim", type=int, default=None)
    p.add_argument("--n-layers", type=int, default=None)
    p.add_argument("--resnet-type", default=None)
    p.add_argument("--sampler-type", default=None)
    p.add_argument("--num-sampling-steps", type=int, default=None)
    p.add_argument("--sampler-unroll", type=int, default=1,
                   help="DDIM scan unroll factor (see evaluate_calvin)")
    p.add_argument("--noise-scheduler", default=None)
    p.add_argument("--sigma-min", type=float, default=None)
    p.add_argument("--sigma-max", type=float, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--serving-mode", default="auto",
                   help="TPU fast-path preset: reference | parity | "
                        "max-throughput | b1-latency | b1-latency-max | auto")
    p.add_argument("--clip-checkpoint", default=None)
    p.add_argument("--log-dir", default="eval_results_libero")
    p.add_argument("--fake-env", action="store_true")
    p.add_argument("--fake-tasks", type=int, default=2)
    p.add_argument("--fake-steps-to-success", type=int, default=4)
    p.add_argument("--num-videos", type=int, default=0)
    args = p.parse_args(argv)
    args.image_size = args.img_size  # build_agent compat

    logging.basicConfig(level=logging.INFO)
    import jax

    from ..models.agent import RolloutPolicy
    from ..models.encoders.lang_cache import LangEmbeddingCache
    from ..ops.image import preprocess_camera
    from ..rollout.libero_rollout import (FakeLiberoEnv, LiberoEvaluator,
                                          make_libero_env)
    from ..rollout.video import RolloutVideo
    from .evaluate_calvin import build_agent

    agent, variables = build_agent(args)
    from ..config.builders import build_lang_clip
    lang = build_lang_clip(clip_checkpoint=args.clip_checkpoint)
    lang_cache = LangEmbeddingCache(lang)

    class PreprocPolicy(RolloutPolicy):
        def step(self, obs, goal):
            import jax.numpy as jnp
            if self._counter % self.multistep == 0:
                obs = dict(obs)
                for k_out, k_in in (("rgb_static", "rgb_static"),
                                    ("rgb_gripper", "rgb_gripper")):
                    obs[k_out] = np.asarray(preprocess_camera(
                        None, jnp.asarray(obs["rgb_obs"][k_in]),
                        size=args.img_size, train=False))
            return super().step(obs, goal)

    policy = PreprocPolicy(agent, variables, lang_cache,
                           sampler_unroll=args.sampler_unroll)

    if args.fake_env:
        tasks = [(f"fake task {i}",
                  FakeLiberoEnv(hw=args.img_size,
                                steps_to_success=args.fake_steps_to_success),
                  None)
                 for i in range(args.fake_tasks)]
    else:
        from libero.libero.benchmark import get_benchmark
        from libero.libero import get_libero_path
        bench = get_benchmark(args.benchmark)()
        bddl_base = get_libero_path("bddl_files")
        init_base = get_libero_path("init_states")
        tasks = []
        for i in range(bench.n_tasks):
            task = bench.get_task(i)
            env = make_libero_env(
                os.path.join(bddl_base, task.problem_folder, task.bddl_file),
                args.img_size, args.img_size)
            init_states = bench.get_task_init_states(i)
            tasks.append((task.language, env, init_states))

    video = RolloutVideo(save_dir=str(Path(args.log_dir) / "videos")) \
        if args.num_videos > 0 else None
    evaluator = LiberoEvaluator(n_eval=args.n_eval, max_steps=args.max_steps,
                                rollout_video=video,
                                num_videos=args.num_videos)
    names, rates = [], []
    for desc, env, init_states in tasks:
        sr = evaluator.evaluate_task(policy, env, desc, init_states)
        logger.info("task '%s': SR=%.3f", desc, sr)
        names.append(desc)
        rates.append(sr)
        env.close()
    rates = evaluator.gather_success_rates(rates)
    metrics = evaluator.metrics(rates, names)
    if video is not None:
        video.log()
    os.makedirs(args.log_dir, exist_ok=True)
    with open(Path(args.log_dir) / "results_libero.json", "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"avg_success_rate: {metrics['eval/avg_success_rate']:.3f}")
    return metrics


if __name__ == "__main__":
    main()
