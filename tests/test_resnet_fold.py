"""Inference-time encoder folding: BN-into-conv + space-to-depth stem.

These are exact graph rewrites (see encoders/resnet.py): the folded modules
must reproduce the unfolded inference outputs to float32 roundoff, including
through MoDEAgent.embed_visual_obs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mode_diffusion_policy_tpu.models.encoders.resnet import (
    FiLMResNetPolicy, ResNetEncoderWithFiLM, fold_resnet_params,
    fold_stem_kernel, space_to_depth_2x2)


def test_stem_space_to_depth_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    w7 = jnp.asarray(
        rng.standard_normal((7, 7, 3, 16)).astype(np.float32)) * 0.1
    dn = ("NHWC", "HWIO", "NHWC")
    y_ref = jax.lax.conv_general_dilated(x, w7, (2, 2), [(3, 3), (3, 3)],
                                         dimension_numbers=dn)
    y_new = jax.lax.conv_general_dilated(
        space_to_depth_2x2(x), fold_stem_kernel(w7), (1, 1),
        [(2, 1), (2, 1)], dimension_numbers=dn)
    assert y_new.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_new),
                               atol=1e-5)


@pytest.mark.parametrize("mod_kw", [
    (FiLMResNetPolicy, dict(depth=18)),
    (FiLMResNetPolicy, dict(depth=50)),
    (ResNetEncoderWithFiLM, dict(latent_dim=64)),
])
def test_folded_encoder_matches_inference(mod_kw):
    Mod, kw = mod_kw
    rng = np.random.default_rng(1)
    m = Mod(32, **kw)
    mf = Mod(32, folded=True, **kw)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, img, cond, train=False)
    # perturb batch stats away from init (mean 0 / var 1) so the fold is
    # genuinely exercised
    bs = jax.tree.map(lambda a: a + 0.3 * jnp.abs(a) + 0.05,
                      v["batch_stats"])
    y0 = m.apply({"params": v["params"], "batch_stats": bs}, img, cond,
                 train=False)
    y1 = mf.apply({"params": fold_resnet_params(v["params"], bs)}, img, cond,
                  train=False)
    assert float(jnp.std(y0)) > 1e-4  # non-degenerate output
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)


def test_agent_embed_visual_obs_folded():
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    cfg = MoDEAgentConfig(latent_dim=64, n_layers=1, n_heads=2, cond_dim=16,
                          resnet_type="50")
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(0), image_hw=(64, 64))
    variables["batch_stats"] = jax.tree.map(
        lambda a: a + 0.2 * jnp.abs(a) + 0.05, variables["batch_stats"])
    rng = np.random.default_rng(2)
    rs = jnp.asarray(rng.standard_normal((2, 1, 64, 64, 3)).astype(np.float32))
    rg = jnp.asarray(rng.standard_normal((2, 1, 64, 64, 3)).astype(np.float32))
    goal = jnp.asarray(rng.standard_normal((2, 1, 16)).astype(np.float32))
    emb0, _ = agent.embed_visual_obs(variables, rs, rg, goal, train=False)
    folded = agent.fold_encoders_for_inference(variables)
    emb1, _ = agent.embed_visual_obs(folded, rs, rg, goal, train=False)
    np.testing.assert_allclose(np.asarray(emb0["state_images"]),
                               np.asarray(emb1["state_images"]), atol=2e-4)
    # train path is untouched by the folded collection
    emb2, upd = agent.embed_visual_obs(
        folded, rs, rg, goal, train=True)
    assert upd is not None
