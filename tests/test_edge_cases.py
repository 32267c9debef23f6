"""Edge-case coverage: stochastic churn samplers vs reference, geometric
window sampling, config group switching, pretrain window offset, and misc
utils."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_euler_churn_matches_reference_shape_and_scale():
    """s_churn > 0 adds noise; cannot match torch RNG, but the deterministic
    part (gamma/sigma_hat ladder) must match the reference's formula."""
    from mode_diffusion_policy_tpu.models.edm.samplers import _churn_gammas
    from mode_diffusion_policy_tpu.models.edm.schedules import (
        get_sigmas_exponential)
    sigmas = get_sigmas_exponential(10, 0.001, 80.0)
    sigma_hat, noise_scale = _churn_gammas(sigmas, s_churn=4.0, s_tmin=0.05,
                                           s_tmax=50.0)
    n = len(sigmas) - 1
    for i in range(n):
        if 0.05 <= sigmas[i] <= 50.0:
            gamma = min(4.0 / n, 2 ** 0.5 - 1)
        else:
            gamma = 0.0
        assert sigma_hat[i] == pytest.approx(sigmas[i] * (1 + gamma), rel=1e-6)
        want_ns = np.sqrt(max(sigma_hat[i] ** 2 - sigmas[i] ** 2, 0))
        assert noise_scale[i] == pytest.approx(want_ns, rel=1e-4, abs=1e-4)


def test_heun_with_churn_runs():
    from mode_diffusion_policy_tpu.models.edm.samplers import sample_loop
    from mode_diffusion_policy_tpu.models.edm.schedules import (
        get_sigmas_exponential)
    sigmas = get_sigmas_exponential(10, 0.001, 80.0)

    def den(x, s, i):
        return x / (1 + s.reshape(-1, 1, 1) ** 2)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 7)) * 80
    out = sample_loop("heun", den, x, sigmas, jax.random.PRNGKey(1),
                      extra_args={"s_churn": 2.0, "s_tmin": 0.05})
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() < 10


def test_geometric_window_sampling(tmp_path):
    from calvin_fixture import make_calvin_dataset
    from mode_diffusion_policy_tpu.data.calvin_dataset import DiskDataset
    root = make_calvin_dataset(tmp_path / "c", n_episodes=2, ep_len=30, hw=8,
                               splits=("training",))
    ds = DiskDataset(root / "training", key="lang",
                     lang_folder="lang_annotations", min_window_size=5,
                     max_window_size=16, pad=True,
                     window_sampling_strategy="geometric",
                     geometric_p_value=0.3)
    sizes = [ds._get_window_size(i) for i in range(30)]
    assert all(5 <= s <= 16 for s in sizes)
    # geometric sampling skews short
    assert np.mean(sizes) < 10


def test_pretrain_window_offset(tmp_path):
    """pretrain=True restricts language windows to episode tails
    (disk_dataset.py:128-130)."""
    from calvin_fixture import make_calvin_dataset
    from mode_diffusion_policy_tpu.data.calvin_dataset import DiskDataset
    root = make_calvin_dataset(tmp_path / "c", n_episodes=2, ep_len=30, hw=8,
                               splits=("training",))
    full = DiskDataset(root / "training", key="lang",
                       lang_folder="lang_annotations", min_window_size=10,
                       max_window_size=10, pad=False)
    pre = DiskDataset(root / "training", key="lang",
                      lang_folder="lang_annotations", min_window_size=10,
                      max_window_size=10, pad=False, pretrain=True,
                      aux_lang_loss_window=1)
    assert len(pre) < len(full)


def test_config_group_switch():
    """group=option override replaces the whole group (hydra semantics)."""
    from pathlib import Path
    from mode_diffusion_policy_tpu.config.loader import load_config
    conf = Path(__file__).resolve().parents[1] / "conf"
    cfg = load_config(conf, "config_calvin", ["datamodule=libero"])
    assert cfg["datamodule"]["_target_"].endswith("LiberoDataModule")
    assert "benchmark_name" in cfg["datamodule"]


def test_shm_cache_rebuild_over_stale_segment(tmp_path):
    """Rebuilding with an existing segment name must not crash."""
    from calvin_fixture import make_calvin_dataset
    from mode_diffusion_policy_tpu.data.shm_cache import SharedEpisodeCache
    root = make_calvin_dataset(tmp_path / "c", n_episodes=1, ep_len=4, hw=8,
                               splits=("training",))
    c1 = SharedEpisodeCache.build(root / "training", keys=["rel_actions"],
                                  tag="stale_test")
    # simulate a crashed process leaving the segment behind: don't cleanup
    c1._owner = False
    c2 = SharedEpisodeCache.build(root / "training", keys=["rel_actions"],
                                  tag="stale_test")
    assert c2.array("rel_actions").shape == (4, 7)
    c2.cleanup()


def test_rollout_policy_goal_change_recomputes():
    """Changing the goal text mid-rollout takes effect at the next replan."""
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig,
                                                        RolloutPolicy)
    cfg = MoDEAgentConfig(latent_dim=32, n_layers=1, n_heads=2, cond_dim=8,
                          resnet_type="18", multistep=2, act_window_size=10)
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(0), image_hw=(16, 16))
    seen = []

    def lang(texts):
        seen.extend(texts)
        return np.full((len(texts), 1, cfg.cond_dim),
                       float(len(texts[0])), np.float32)

    policy = RolloutPolicy(agent, variables, lang,
                           use_routing_precompute=False)
    obs = {"rgb_static": np.zeros((1, 1, 16, 16, 3), np.float32),
           "rgb_gripper": np.zeros((1, 1, 16, 16, 3), np.float32)}
    policy.step(obs, {"lang_text": "goal a"})
    policy.step(obs, {"lang_text": "goal a"})
    policy.step(obs, {"lang_text": "second goal"})
    assert seen == ["goal a", "second goal"]
