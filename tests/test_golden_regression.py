"""Golden-value regression pins: fixed-seed end-to-end outputs on CPU.

These freeze the numerical behavior of the full inference path (tiny config)
so refactors across rounds can't silently change results. If a change is
*intentional* (e.g. a bugfix that alters numerics), update the pinned values
in the same commit and say why.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.agent import MoDEAgent, MoDEAgentConfig


@pytest.fixture(scope="module")
def setup():
    cfg = MoDEAgentConfig(latent_dim=32, n_layers=2, n_heads=2, cond_dim=8,
                          resnet_type="18")
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(1234),
                                     image_hw=(32, 32))
    return cfg, agent, variables


def _batch(cfg, B=2):
    rng = np.random.default_rng(99)
    return {
        "rgb_static": jnp.asarray(
            rng.standard_normal((B, 1, 32, 32, 3)).astype(np.float32)),
        "rgb_gripper": jnp.asarray(
            rng.standard_normal((B, 1, 32, 32, 3)).astype(np.float32)),
        "actions": jnp.asarray(
            rng.standard_normal((B, 10, 7)).astype(np.float32) * 0.3),
        "lang_emb": jnp.asarray(
            rng.standard_normal((B, 1, cfg.cond_dim)).astype(np.float32)),
    }


def test_inference_chunk_pinned(setup):
    cfg, agent, variables = setup
    batch = _batch(cfg)
    emb, _ = agent.embed_visual_obs(variables, batch["rgb_static"],
                                    batch["rgb_gripper"], batch["lang_emb"],
                                    train=False)
    out = agent.denoise_actions(variables, emb, batch["lang_emb"],
                                jax.random.PRNGKey(7), inference=True,
                                use_routing_precompute=True)
    fingerprint = [float(jnp.mean(out)), float(jnp.std(out)),
                   float(out[0, 0, 0]), float(out[1, 9, 6])]
    # pinned 2026-08-16 (round 1); update only with an intentional
    # numerics change, and explain it in the commit message
    np.testing.assert_allclose(
        fingerprint,
        [0.02552623674273491, 0.38418903946876526,
         0.3792133033275604, -0.41365382075309753],
        rtol=1e-4, atol=1e-6)


def test_training_loss_pinned(setup):
    cfg, agent, variables = setup
    batch = _batch(cfg)
    loss, (metrics, _) = agent.training_loss(variables, batch,
                                             jax.random.PRNGKey(3))
    assert float(loss) == pytest.approx(float(metrics["train/total_loss"]))
    np.testing.assert_allclose(float(loss), 0.9766592383384705, rtol=1e-4)
