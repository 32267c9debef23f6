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

@pytest.mark.parametrize("mod_kw", [
    (FiLMResNetPolicy, dict(depth=50)),
    (ResNetEncoderWithFiLM, dict(latent_dim=64)),
])
@pytest.mark.slow
def test_q8_encoder_close_to_folded(mod_kw):
    """int8 QuantConv path: approximate — feature output must track the
    folded float output closely (per-channel weights + dynamic per-tensor
    activations; the bound here is empirical on random weights)."""
    from mode_diffusion_policy_tpu.models.encoders.resnet import (
        quantize_resnet_params)
    Mod, kw = mod_kw
    rng = np.random.default_rng(3)
    m = Mod(32, **kw)
    mq = Mod(32, folded=True, q8=True, **kw)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(1)}, img, cond, train=False)
    bs = jax.tree.map(lambda a: a + 0.3 * jnp.abs(a) + 0.05,
                      v["batch_stats"])
    y0 = m.apply({"params": v["params"], "batch_stats": bs}, img, cond,
                 train=False)
    qp = quantize_resnet_params(fold_resnet_params(v["params"], bs))
    y1 = mq.apply({"params": qp}, img, cond, train=False)
    assert y1.shape == y0.shape
    rel = float(jnp.linalg.norm(y1 - y0) / (jnp.linalg.norm(y0) + 1e-9))
    # random-weight nets are the worst case for int8 (no trained structure;
    # error compounds through 50 layers) — the bound is empirical; e2e
    # action-MAE on the flagship is the adoption gate (docs/PERF.md)
    assert rel < 0.10, rel


@pytest.mark.slow
def test_agent_embed_visual_obs_q8():
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    cfg = MoDEAgentConfig(latent_dim=64, n_layers=1, n_heads=2, cond_dim=16,
                          resnet_type="50")
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(0), image_hw=(64, 64))
    variables["batch_stats"] = jax.tree.map(
        lambda a: a + 0.2 * jnp.abs(a) + 0.05, variables["batch_stats"])
    rng = np.random.default_rng(4)
    rs = jnp.asarray(rng.standard_normal((2, 1, 64, 64, 3)).astype(np.float32))
    rg = jnp.asarray(rng.standard_normal((2, 1, 64, 64, 3)).astype(np.float32))
    goal = jnp.asarray(rng.standard_normal((2, 1, 16)).astype(np.float32))
    emb0, _ = agent.embed_visual_obs(variables, rs, rg, goal, train=False)
    q8 = agent.quantize_encoders_for_inference(variables)
    assert "q8_encoder_params" in q8 and "folded_params" in q8
    emb1, _ = agent.embed_visual_obs(q8, rs, rg, goal, train=False)
    a0, a1 = emb0["state_images"], emb1["state_images"]
    rel = float(jnp.linalg.norm(a1 - a0) / (jnp.linalg.norm(a0) + 1e-9))
    assert rel < 0.10, rel
    # train path still uses the float params + batch stats
    _, upd = agent.embed_visual_obs(q8, rs, rg, goal, train=True)
    assert upd is not None
    # static-calibrated variant: act_scale params present, close to dynamic
    calib = {"rgb_static": rs, "rgb_gripper": rg, "lang_emb": goal}
    q8s = agent.quantize_encoders_for_inference(variables, calib_batch=calib)
    from mode_diffusion_policy_tpu.models.agent import _tree_has_key
    assert _tree_has_key(q8s["q8_encoder_params"], "act_scale")
    emb2, _ = agent.embed_visual_obs(q8s, rs, rg, goal, train=False)
    a2 = emb2["state_images"]
    rel2 = float(jnp.linalg.norm(a2 - a0) / (jnp.linalg.norm(a0) + 1e-9))
    assert rel2 < 0.10, rel2


@pytest.mark.slow
def test_q8_skip_stages_self_describing():
    """Partial quantization: skipped stages stay float in the param tree,
    infer_q8_skip recovers the skip set, and the agent path runs it."""
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    from mode_diffusion_policy_tpu.models.encoders.resnet import infer_q8_skip
    cfg = MoDEAgentConfig(latent_dim=64, n_layers=1, n_heads=2, cond_dim=16,
                          resnet_type="50")
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(0), image_hw=(64, 64))
    rng = np.random.default_rng(5)
    rs = jnp.asarray(rng.standard_normal((2, 1, 64, 64, 3)).astype(np.float32))
    rg = jnp.asarray(rng.standard_normal((2, 1, 64, 64, 3)).astype(np.float32))
    goal = jnp.asarray(rng.standard_normal((2, 1, 16)).astype(np.float32))
    calib = {"rgb_static": rs, "rgb_gripper": rg, "lang_emb": goal}
    skip = ("stem", "layer4")
    q8 = agent.quantize_encoders_for_inference(variables, calib_batch=calib,
                                               skip=skip)
    qp = q8["q8_encoder_params"]["static_resnet"]
    assert infer_q8_skip(qp) == skip
    trunk = qp["resnet"]
    assert "kernel" in trunk["conv1"] and "kernel_q" not in trunk["conv1"]
    assert "kernel_q" in trunk["layer1_0"]["conv1"]
    assert "kernel" in trunk["layer4_0"]["conv1"]
    emb0, _ = agent.embed_visual_obs(variables, rs, rg, goal, train=False)
    emb1, _ = agent.embed_visual_obs(q8, rs, rg, goal, train=False)
    a0, a1 = emb0["state_images"], emb1["state_images"]
    rel = float(jnp.linalg.norm(a1 - a0) / (jnp.linalg.norm(a0) + 1e-9))
    assert rel < 0.10, rel
