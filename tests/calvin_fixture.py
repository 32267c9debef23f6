"""Synthetic CALVIN-format dataset fixture: the same on-disk layout the
reference loaders expect (episode_%07d.npz frames, ep_start_end_ids.npy,
lang_annotations/auto_lang_ann.npy), at toy resolution."""
import numpy as np
from pathlib import Path

INSTRUCTIONS = [
    "push the red block right",
    "open the drawer",
    "turn on the led",
]


def make_calvin_dataset(root: Path, *, n_episodes=3, ep_len=30, hw=24,
                        seed=0, splits=("training", "validation")):
    root = Path(root)
    rng = np.random.default_rng(seed)
    for split in splits:
        d = root / split
        (d / "lang_annotations").mkdir(parents=True, exist_ok=True)
        frame = 0
        indx = []
        for ep in range(n_episodes):
            start = frame
            for t in range(ep_len):
                np.savez(
                    d / f"episode_{frame:07d}.npz",
                    rgb_static=rng.integers(0, 255, (hw, hw, 3), np.uint8),
                    rgb_gripper=rng.integers(0, 255, (hw, hw, 3), np.uint8),
                    robot_obs=rng.standard_normal(15).astype(np.float32),
                    scene_obs=rng.standard_normal(24).astype(np.float32),
                    rel_actions=rng.uniform(-1, 1, 7).astype(np.float32),
                    actions=rng.uniform(-1, 1, 7).astype(np.float32),
                )
                frame += 1
            indx.append((start, frame - 1))
        np.save(d / "ep_start_end_ids.npy", np.asarray(indx))
        n_ann = len(indx)
        lang_data = {
            "info": {"indx": indx},
            "language": {
                "emb": rng.standard_normal((n_ann, 1, 384)).astype(np.float32),
                "ann": [INSTRUCTIONS[i % len(INSTRUCTIONS)]
                        for i in range(n_ann)],
            },
        }
        np.save(d / "lang_annotations" / "auto_lang_ann.npy",
                np.asarray(lang_data, dtype=object), allow_pickle=True)
    return root
