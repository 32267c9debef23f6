"""LIBERO evaluation: per-task fixed-init-state rollouts with a done-flag
success criterion.

Re-design of the reference RolloutLibero
(/root/reference/mode/rollout/libero_rollout.py:211-467): per task, reset to
fixed init states (the benchmark's determinism contract), warm up physics
with 5 dummy zero-action steps (:339-342), run the chunked policy up to
max_steps (520 cap), success = env done flag; rollouts are sharded across
hosts (:273-279). Real MuJoCo envs come from the LIBERO package (gated
import with the reference's 5-attempt retry, :292-311); ``FakeLiberoEnv``
keeps the logic testable hermetically.
"""
from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..parallel.mesh import process_local_slice

logger = logging.getLogger(__name__)


def translate_obs(env_obs: Dict) -> Dict:
    """LIBERO obs keys -> CALVIN-style interface (libero_rollout.py:395-407).
    Images are flipped vertically (LIBERO renders upside-down) upstream by
    the env; here we only remap keys and batch to [1,1,H,W,3]."""
    out = {"rgb_obs": {}, "depth_obs": {}}
    out["rgb_obs"]["rgb_static"] = np.asarray(
        env_obs["agentview_image"], np.uint8)[None, None]
    out["rgb_obs"]["rgb_gripper"] = np.asarray(
        env_obs["robot0_eye_in_hand_image"], np.uint8)[None, None]
    robot = np.concatenate([np.asarray(env_obs["robot0_joint_pos"]),
                            np.asarray(env_obs["robot0_gripper_qpos"])])
    out["robot_obs"] = robot[None, None].astype(np.float32)
    return out


class FakeLiberoEnv:
    """OffScreenRenderEnv-surface stand-in: reset/set_init_state/step/close.
    Succeeds (done=True) after ``steps_to_success`` steps when scripted."""

    def __init__(self, hw: int = 24, steps_to_success: Optional[int] = 4,
                 seed: int = 0):
        self.hw = hw
        self.steps_to_success = steps_to_success
        self._rng = np.random.default_rng(seed)
        self._steps = 0

    def _obs(self):
        img = self._rng.integers(0, 255, (self.hw, self.hw, 3), np.uint8)
        return {"agentview_image": img, "robot0_eye_in_hand_image": img,
                "robot0_joint_pos": np.zeros(7),
                "robot0_gripper_qpos": np.zeros(2)}

    def reset(self):
        self._steps = 0
        return self._obs()

    def set_init_state(self, init_state):
        self._steps = 0
        return self._obs()

    def step(self, action):
        self._steps += 1
        done = (self.steps_to_success is not None
                and self._steps >= self.steps_to_success)
        return self._obs(), 0.0, done, {}

    def get_sim_state(self):
        return np.zeros(8)

    def close(self):
        pass


def make_libero_env(bddl_file: str, img_h: int, img_w: int, retries: int = 5):
    """Create a real OffScreenRenderEnv with the reference's retry loop
    (libero_rollout.py:292-311)."""
    from libero.libero.envs import OffScreenRenderEnv
    last_err = None
    for _ in range(retries):
        try:
            return OffScreenRenderEnv(bddl_file_name=bddl_file,
                                      camera_heights=img_h,
                                      camera_widths=img_w)
        except Exception as e:  # env creation is flaky under load
            last_err = e
            time.sleep(5)
    raise RuntimeError(f"Failed to create environment: {last_err}")


class LiberoEvaluator:
    """Evaluate a chunked policy over a benchmark's tasks
    (conf/callbacks/libero.yaml: n_eval 20, 520-step cap)."""

    def __init__(self, *, n_eval: int = 20, max_steps: int = 520,
                 warmup_steps: int = 5, rollout_video=None,
                 num_videos: int = 0):
        self.n_eval = n_eval
        self.max_steps = max_steps
        self.warmup_steps = warmup_steps
        self.rollout_video = rollout_video
        self.num_videos = num_videos

    def evaluate_task(self, policy, env, task_description: str,
                      init_states: Optional[np.ndarray] = None,
                      shard_across_hosts: bool = True) -> float:
        """Success rate over this host's share of the n_eval rollouts."""
        if shard_across_hosts:
            start, end = process_local_slice(self.n_eval)
        else:
            start, end = 0, self.n_eval
        if end <= start:
            return 0.0
        n_success = 0
        for i in range(start, end):
            record = (i - start) < self.num_videos and \
                self.rollout_video is not None
            if record:
                self.rollout_video.new_video(
                    tag=f"libero_{task_description[:40].replace(' ', '_')}_{i}",
                    caption=task_description)
            env.reset()
            if init_states is not None:
                obs = env.set_init_state(
                    init_states[i % len(init_states)])
            else:
                obs = env.reset()
            policy.reset()
            dummy = np.zeros(7)
            for _ in range(self.warmup_steps):
                obs, _, _, _ = env.step(dummy)
            done = False
            goal = {"lang_text": task_description}
            for _ in range(self.max_steps):
                data = translate_obs(obs)
                action = policy.step(data, goal)
                obs, _, d, _ = env.step(np.asarray(action).squeeze())
                if record:
                    self.rollout_video.update(obs["agentview_image"])
                if d:
                    done = True
                    break
            if record:
                self.rollout_video.draw_outcome(done)
            n_success += int(done)
        return n_success / (end - start)

    @staticmethod
    def gather_success_rates(local_rates: List[float]) -> List[float]:
        """Average per-task success across hosts
        (libero_rollout.py:97-122)."""
        import jax
        if jax.process_count() == 1:
            return list(local_rates)
        from jax.experimental import multihost_utils
        arr = np.asarray(local_rates, np.float32)
        gathered = multihost_utils.process_allgather(arr)
        return np.mean(gathered, axis=0).tolist()

    def metrics(self, success_rates: Sequence[float],
                task_names: Sequence[str]) -> Dict[str, float]:
        out = {f"eval/sr_{name[:48].replace(' ', '_')}": sr
               for name, sr in zip(task_names, success_rates)}
        out["eval/avg_success_rate"] = float(np.mean(list(success_rates))) \
            if len(success_rates) else 0.0
        return out
