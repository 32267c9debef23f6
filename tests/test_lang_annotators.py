"""Language annotator tools: manual CLI loop (scripted prompts) and the
oracle-driven automatic annotator."""
import numpy as np
import pytest

from calvin_fixture import make_calvin_dataset
from mode_diffusion_policy_tpu.data.calvin_dataset import (DEFAULT_OBS_SPACE,
                                                           DEFAULT_PROPRIO,
                                                           DiskDataset)
from mode_diffusion_policy_tpu.rollout.env import CalvinEnvWrapper, FakeCalvinEnv
from mode_diffusion_policy_tpu.utils.lang_annotators import (auto_annotate,
                                                             manual_annotate)


def test_manual_annotate(tmp_path):
    root = make_calvin_dataset(tmp_path / "c", n_episodes=2, ep_len=15, hw=8,
                               splits=("training",))
    ds = DiskDataset(root / "training", key="lang",
                     lang_folder="lang_annotations", min_window_size=5,
                     max_window_size=5, pad=False)
    answers = iter(["open the drawer", "push the block", "q"])
    out = manual_annotate(ds, out_dir=str(tmp_path),
                          sample_fraction=0.2,
                          prompt=lambda msg: next(answers))
    assert out["language"] == [["open the drawer"], ["push the block"]]
    assert len(out["indx"]) == 2
    # resumable: next run appends
    answers = iter(["turn on the led", "q"])
    out2 = manual_annotate(ds, out_dir=str(tmp_path), sample_fraction=0.2,
                           prompt=lambda msg: next(answers))
    assert len(out2["language"]) >= 3
    # embedding pass
    emb_calls = []
    manual_annotate(ds, out_dir=str(tmp_path), sample_fraction=0.2,
                    prompt=lambda msg: "q",
                    lang_encoder=lambda texts: (emb_calls.append(texts),
                                                np.zeros((len(texts), 1, 4)))[1])
    assert emb_calls and len(emb_calls[0]) >= 3
    assert (tmp_path / "lang_emb_ann.npy").exists()


def test_auto_annotate(tmp_path):
    raw = FakeCalvinEnv(hw=8)
    env = CalvinEnvWrapper(raw, DEFAULT_OBS_SPACE, DEFAULT_PROPRIO)

    class DrawerOracle:
        def get_task_info_for_set(self, start, cur, task_set):
            out = set()
            if cur["scene_obs"][1] > start["scene_obs"][1] + 0.1:
                out.add("open_drawer")
            if cur["scene_obs"][5] > start["scene_obs"][5]:
                out.add("turn_on_led")
            return out & task_set

    annotations = {"open_drawer": ["open the drawer", "pull the drawer open"],
                   "turn_on_led": ["turn on the led"]}

    def seq(delta_idx, delta):
        robot = np.zeros((5, 15))
        scene = np.zeros((5, 24))
        scene[-1, delta_idx] = delta
        return {"state_info": {"robot_obs": robot, "scene_obs": scene},
                "indx": (0, 5)}

    sequences = [seq(1, 0.22), seq(5, 1.0), seq(3, 0.01),  # last: no task
                 seq(1, 0.22)]
    out = auto_annotate(sequences, env, DrawerOracle(), annotations,
                        lang_encoder=lambda t: np.zeros((len(t), 1, 4)),
                        out_dir=str(tmp_path))
    assert out["language"]["task"] == ["open_drawer", "turn_on_led",
                                       "open_drawer"]
    assert all(a in annotations[t][0:2]
               for a, t in zip(out["language"]["ann"],
                               out["language"]["task"]))
    assert out["language"]["emb"].shape == (3, 1, 4)
    assert (tmp_path / "auto_lang_ann.npy").exists()
    # the output format round-trips through the dataset lang loader format
    loaded = np.load(tmp_path / "auto_lang_ann.npy",
                     allow_pickle=True).item()
    assert "language" in loaded and "info" in loaded
