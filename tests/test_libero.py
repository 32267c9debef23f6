"""LIBERO stack: hdf5 sequence dataset semantics, obs translation, data
module, fake-env evaluation, and the evaluate CLI."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from mode_diffusion_policy_tpu.data.libero import (
    LiberoDataModule, LiberoMultitaskDataset, LiberoSequenceDataset,
    task_description_from_filename)
from mode_diffusion_policy_tpu.rollout.libero_rollout import (
    FakeLiberoEnv, LiberoEvaluator, translate_obs)


def make_libero_hdf5(path, n_demos=2, demo_len=15, hw=24, seed=0):
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for d in range(n_demos):
            g = f.create_group(f"data/demo_{d}")
            g.create_dataset("actions",
                             data=rng.uniform(-1, 1, (demo_len, 7)
                                              ).astype(np.float32))
            o = g.create_group("obs")
            o.create_dataset("agentview_rgb",
                             data=rng.integers(0, 255, (demo_len, hw, hw, 3),
                                               np.uint8))
            o.create_dataset("eye_in_hand_rgb",
                             data=rng.integers(0, 255, (demo_len, hw, hw, 3),
                                               np.uint8))
            o.create_dataset("joint_states",
                             data=rng.standard_normal((demo_len, 7)
                                                      ).astype(np.float32))
            o.create_dataset("gripper_states",
                             data=rng.standard_normal((demo_len, 2)
                                                      ).astype(np.float32))
    return path


@pytest.fixture(scope="module")
def libero_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("libero") / "libero_10"
    root.mkdir()
    make_libero_hdf5(root / "SCENE1_open_the_top_drawer_demo.hdf5", seed=0)
    make_libero_hdf5(root / "SCENE2_put_the_bowl_on_the_plate_demo.hdf5",
                     seed=1)
    return root.parent


def test_task_description_from_filename():
    assert task_description_from_filename(
        "KITCHEN_SCENE10_put_the_butter_in_the_basket_demo.hdf5") == \
        "put the butter in the basket"
    assert task_description_from_filename(
        "SCENE1_open_the_top_drawer_demo.hdf5") == "open the top drawer"


def test_sequence_dataset_windows_and_padding(libero_root):
    path = next((libero_root / "libero_10").glob("*.hdf5"))
    ds = LiberoSequenceDataset(path, seq_len=10, obs_seq_len=1)
    assert len(ds) == 2 * 15  # one index per frame, pad_seq_length
    item = ds[0]
    assert item["rgb_obs"]["rgb_static"].shape == (1, 24, 24, 3)
    assert item["actions"].shape == (10, 7)
    assert item["robot_obs"].shape == (1, 9)  # 7 joints + 2 gripper
    assert item["lang_text"] == "open the top drawer"
    # end-of-demo padding repeats the last action
    last = ds[14]  # final frame of demo_0
    np.testing.assert_array_equal(last["actions"][0], last["actions"][5])
    ds.close()


def test_sequence_dataset_cache_all_matches(libero_root):
    path = next((libero_root / "libero_10").glob("*.hdf5"))
    a = LiberoSequenceDataset(path, seq_len=10)
    b = LiberoSequenceDataset(path, seq_len=10, cache_all=True)
    for i in (0, 7, 29):
        np.testing.assert_array_equal(a[i]["actions"], b[i]["actions"])
        np.testing.assert_array_equal(a[i]["rgb_obs"]["rgb_static"],
                                      b[i]["rgb_obs"]["rgb_static"])
    a.close()


def test_multitask_concat(libero_root):
    paths = sorted((libero_root / "libero_10").glob("*.hdf5"))
    ds = LiberoMultitaskDataset([
        LiberoSequenceDataset(p, seq_len=10) for p in paths])
    assert len(ds) == 60
    assert ds[0]["lang_text"] != ds[59]["lang_text"]


def test_datamodule(libero_root):
    def fake_lang(texts):
        return np.stack([np.full((1, 8), float(len(t)), np.float32)
                         for t in texts])

    dm = LiberoDataModule("libero_10", str(libero_root), batch_size=4,
                          seq_len=10, lang_embed=fake_lang).setup()
    assert len(dm.task_descriptions) == 2
    batch = next(dm.train_batches())
    assert batch["rgb_static"].shape == (4, 1, 24, 24, 3)
    assert batch["actions"].shape == (4, 10, 7)
    assert batch["lang_emb"].shape == (4, 1, 8)


def test_translate_obs():
    env = FakeLiberoEnv(hw=16)
    obs = env.reset()
    t = translate_obs(obs)
    assert t["rgb_obs"]["rgb_static"].shape == (1, 1, 16, 16, 3)
    assert t["robot_obs"].shape == (1, 1, 9)


class CountingPolicy:
    def __init__(self):
        self.resets = 0
        self.steps = 0

    def reset(self):
        self.resets += 1

    def step(self, obs, goal):
        assert goal["lang_text"]
        self.steps += 1
        return np.zeros((1, 7), np.float32)


def test_libero_evaluator_fake_env():
    env = FakeLiberoEnv(steps_to_success=12)  # 5 warmup + 7 policy steps
    evaluator = LiberoEvaluator(n_eval=4, max_steps=20, warmup_steps=5)
    policy = CountingPolicy()
    sr = evaluator.evaluate_task(policy, env, "fake task",
                                 shard_across_hosts=False)
    assert sr == 1.0
    assert policy.resets == 4
    env_fail = FakeLiberoEnv(steps_to_success=None)
    sr = evaluator.evaluate_task(policy, env_fail, "never succeeds",
                                 shard_across_hosts=False)
    assert sr == 0.0


def test_evaluate_libero_cli(tmp_path):
    from mode_diffusion_policy_tpu.evaluation import evaluate_libero
    metrics = evaluate_libero.main([
        "--fake-env", "--fake-tasks", "2", "--n-eval", "2",
        "--max-steps", "6", "--latent-dim", "32", "--n-layers", "1",
        "--resnet-type", "18", "--img-size", "24",
        "--log-dir", str(tmp_path), "--fake-steps-to-success", "3"])
    assert metrics["eval/avg_success_rate"] == 1.0
    assert (tmp_path / "results_libero.json").exists()


def test_in_training_libero_rollout_callback_fake_env():
    """training_libero's rollout wiring end-to-end over FakeLiberoEnv:
    callback returns eval/avg_success_rate the Trainer ranks on."""
    import jax
    import numpy as np
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    from mode_diffusion_policy_tpu.training_common import (
        build_libero_rollout_callback)
    cfg = MoDEAgentConfig(latent_dim=32, n_layers=1, n_heads=2, cond_dim=8,
                          resnet_type="18", multistep=2, act_window_size=10)
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(0), image_hw=(16, 16))

    def lang(texts):
        return np.zeros((len(texts), 1, cfg.cond_dim), np.float32)

    cb = build_libero_rollout_callback(
        {"fake_env": True, "fake_hw": 24, "fake_tasks": 2,
         "fake_steps_to_success": 1, "n_eval": 2, "max_steps": 4},
        lang, {"rgb_static": {"size": 16, "pad": 2},
               "rgb_gripper": {"size": 16, "pad": 2}})
    metrics = cb(agent, variables, 0)
    assert "eval/avg_success_rate" in metrics
    assert 0.0 <= metrics["eval/avg_success_rate"] <= 1.0


def test_in_training_libero_rollout_disabled_without_libero():
    from mode_diffusion_policy_tpu.training_common import (
        build_libero_rollout_callback)
    assert build_libero_rollout_callback(
        {"benchmark_name": "libero_10"}, lambda t: None,
        {"rgb_static": {"size": 16, "pad": 2},
         "rgb_gripper": {"size": 16, "pad": 2}}) is None


def test_sequence_dataset_frame_stack_goal_next_obs(libero_root):
    """robomimic frame_stack>1 / goal_mode='last' / next_obs semantics
    (robomimic_dataset.py:399-537)."""
    path = next((libero_root / "libero_10").glob("*.hdf5"))
    ds = LiberoSequenceDataset(path, seq_len=10, obs_seq_len=1,
                               frame_stack=3, goal_mode="last",
                               load_next_obs=True)
    with h5py.File(path, "r") as f:
        agent = np.asarray(f["data/demo_0/obs/agentview_rgb"])

    # frame 0: frame-stack pads repeat the first frame
    item = ds[0]
    rs = item["rgb_obs"]["rgb_static"]
    assert rs.shape == (3, 24, 24, 3)   # fs-1 + obs_seq_len
    np.testing.assert_array_equal(rs[0], agent[0])
    np.testing.assert_array_equal(rs[1], agent[0])
    np.testing.assert_array_equal(rs[2], agent[0])
    assert item["robot_obs"].shape == (3, 9)

    # mid-demo frame t=5: window is obs[3:6]
    item5 = ds[5]
    np.testing.assert_array_equal(item5["rgb_obs"]["rgb_static"],
                                  agent[3:6])
    # next_obs is the same window shifted by one (next_obs[t] == obs[t+1])
    np.testing.assert_array_equal(item5["next_obs"]["rgb_static"],
                                  agent[4:7])
    # goal_obs is the final observation of the demo, no sequence dim
    np.testing.assert_array_equal(item5["goal_obs"]["rgb_static"],
                                  agent[-1])
    ds.close()


def test_sequence_dataset_padding_flags(libero_root):
    """pad_frame_stack / pad_seq_length shrink the per-demo index range
    (robomimic_dataset.py:189-201,412-421)."""
    path = next((libero_root / "libero_10").glob("*.hdf5"))
    # demo_len 15, 2 demos
    ds = LiberoSequenceDataset(path, seq_len=10, frame_stack=3,
                               pad_frame_stack=False)
    assert len(ds) == 2 * (15 - 2)      # first fs-1 frames excluded
    first = ds[0]
    assert first["rgb_obs"]["rgb_static"].shape[0] == 3
    ds.close()
    ds = LiberoSequenceDataset(path, seq_len=10, pad_seq_length=False)
    assert len(ds) == 2 * (15 - 9)      # last seq_len-1 starts excluded
    # no end padding: last valid index still has 10 real actions
    with h5py.File(path, "r") as f:
        acts = np.asarray(f["data/demo_0/actions"])
    np.testing.assert_array_equal(ds[5]["actions"], acts[5:15])
    ds.close()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        LiberoSequenceDataset(path, goal_mode="nope")


def test_sequence_dataset_next_obs_last_frame_fs1(libero_root):
    """Regression (code review): frame_stack=1 + load_next_obs at the LAST
    frame of a demo — the shifted window starts at the demo end and must
    clamp to the final frame (robomimic next_obs convention), not return a
    zero-length array."""
    path = next((libero_root / "libero_10").glob("*.hdf5"))
    ds = LiberoSequenceDataset(path, seq_len=1, obs_seq_len=1,
                               frame_stack=1, load_next_obs=True)
    with h5py.File(path, "r") as f:
        agent = np.asarray(f["data/demo_0/obs/agentview_rgb"])
        L = agent.shape[0]
    item = ds[L - 1]
    nxt = item["next_obs"]["rgb_static"]
    assert nxt.shape[0] == 1, nxt.shape
    np.testing.assert_array_equal(nxt[0], agent[-1])
    ds.close()
