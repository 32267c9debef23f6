"""Agent facade tests: end-to-end training loss, validation denoise, chunked
rollout stepping, and the routing-precompute fast path (tiny config, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.agent import (MoDEAgent, MoDEAgentConfig,
                                                    RolloutPolicy)

CFG = MoDEAgentConfig(latent_dim=64, n_layers=2, n_heads=4, cond_dim=16,
                      resnet_type="18", num_experts=4, top_k=2,
                      router_z_delta=0.001, entropy_gamma=0.01)
HW = 32


@pytest.fixture(scope="module")
def agent_and_vars():
    agent = MoDEAgent(CFG)
    variables = agent.init_variables(jax.random.PRNGKey(0), image_hw=(HW, HW))
    return agent, variables


def make_batch(B=2, T=1):
    rng = np.random.default_rng(0)
    return {
        "rgb_static": rng.standard_normal((B, T, HW, HW, 3)).astype(np.float32),
        "rgb_gripper": rng.standard_normal((B, T, HW, HW, 3)).astype(np.float32),
        "actions": rng.standard_normal((B, 10, 7)).astype(np.float32),
        "lang_emb": rng.standard_normal((B, 1, CFG.cond_dim)).astype(np.float32),
    }


def test_training_loss(agent_and_vars):
    agent, variables = agent_and_vars
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    loss, (metrics, bs_updates) = agent.training_loss(
        variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "train/action_loss" in metrics
    assert "train/load_balancing_loss" in metrics
    assert "train/router_z_delta" in metrics
    assert metrics["expert_counts"].shape == (CFG.n_layers, CFG.num_experts)
    # BN stats updated in both encoders
    assert bs_updates["static_resnet"] and bs_updates["gripper_resnet"]


def test_training_loss_is_differentiable(agent_and_vars):
    agent, variables = agent_and_vars
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        loss, _ = agent.training_loss(v, batch, jax.random.PRNGKey(1))
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    # router gradients flow (load-balance + z-loss)
    r = grads["inner_model"]["blocks_0"]["router"]["mlp"]["fc1"]["kernel"]
    assert float(jnp.abs(r).max()) > 0


def test_validation_denoise(agent_and_vars):
    agent, variables = agent_and_vars
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    pred, metrics = agent.validation_denoise(variables, batch,
                                             jax.random.PRNGKey(2))
    assert pred.shape == (2, 10, 7)
    assert np.isfinite(float(metrics["val_act/lang_act_loss_pp"]))


def test_routing_precompute_matches_dense(agent_and_vars):
    agent, variables = agent_and_vars
    batch = make_batch()
    emb, _ = agent.embed_visual_obs(
        variables, jnp.asarray(batch["rgb_static"]),
        jnp.asarray(batch["rgb_gripper"]),
        jnp.asarray(batch["lang_emb"]), train=False)
    goal = jnp.asarray(batch["lang_emb"])
    key = jax.random.PRNGKey(3)
    slow = agent.denoise_actions(variables, emb, goal, key, inference=True,
                                 use_routing_precompute=False)
    fast = agent.denoise_actions(variables, emb, goal, key, inference=True,
                                 use_routing_precompute=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-5)


@pytest.mark.parametrize("sampler", ["ddim", "euler", "dpmpp_2m", "heun",
                                     "euler_ancestral"])
def test_samplers_through_agent(agent_and_vars, sampler):
    agent, variables = agent_and_vars
    a2 = MoDEAgent(
        MoDEAgentConfig(latent_dim=64, n_layers=2, n_heads=4, cond_dim=16,
                        resnet_type="18", sampler_type=sampler))
    batch = make_batch()
    emb, _ = agent.embed_visual_obs(
        variables, jnp.asarray(batch["rgb_static"]),
        jnp.asarray(batch["rgb_gripper"]), jnp.asarray(batch["lang_emb"]),
        train=False)
    out = a2.denoise_actions(variables, emb, jnp.asarray(batch["lang_emb"]),
                             jax.random.PRNGKey(0), inference=True,
                             use_routing_precompute=(sampler in
                                                     ("ddim", "euler")))
    assert out.shape == (2, 10, 7)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rollout_policy_chunking(agent_and_vars):
    agent, variables = agent_and_vars
    calls = []

    def fake_lang(texts):
        calls.append(texts)
        return np.zeros((len(texts), 1, CFG.cond_dim), np.float32)

    policy = RolloutPolicy(agent, variables, fake_lang,
                           use_routing_precompute=True)
    obs = {"rgb_static": np.zeros((1, 1, HW, HW, 3), np.float32),
           "rgb_gripper": np.zeros((1, 1, HW, HW, 3), np.float32)}
    goal = {"lang_text": "open the drawer"}
    actions = [policy.step(obs, goal) for _ in range(25)]
    assert all(a.shape == (1, 7) for a in actions)
    # the model ran only ceil(25/10)=3 times
    assert len(calls) == 3
    # chunk actions differ across the 10 steps but repeat per chunk position
    a0, a10 = actions[0], actions[10]
    assert actions[1].shape == a0.shape
    policy.reset()
    a_new = policy.step(obs, goal)
    assert a_new.shape == (1, 7)

def test_bf16_fast_path_matches_bf16_dense(agent_and_vars):
    """The chunk-level bf16 weight pre-cast (_cast_matmul_weights) must be
    numerically identical to the per-step casts of the dense bf16 path —
    same leaves end up bf16 either way (round-3 sampler-glue/b1-latency
    lever)."""
    import dataclasses
    agent_f32, variables = agent_and_vars
    agent = MoDEAgent(dataclasses.replace(CFG, dtype=jnp.bfloat16))
    batch = make_batch()
    emb, _ = agent.embed_visual_obs(
        variables, jnp.asarray(batch["rgb_static"]),
        jnp.asarray(batch["rgb_gripper"]), jnp.asarray(batch["lang_emb"]),
        train=False)
    goal = jnp.asarray(batch["lang_emb"])
    key = jax.random.PRNGKey(3)
    slow = agent.denoise_actions(variables, emb, goal, key, inference=True,
                                 use_routing_precompute=False)
    fast = agent.denoise_actions(variables, emb, goal, key, inference=True,
                                 use_routing_precompute=True)
    # eager step-by-step the two paths are BIT-EQUAL (verified when this
    # lever landed); inside jit the hoisted program fuses differently and
    # bf16 rounding reorders — tolerance covers that compile noise only
    np.testing.assert_allclose(np.asarray(fast, np.float32),
                               np.asarray(slow, np.float32), atol=5e-3)
    mae = np.abs(np.asarray(fast, np.float32)
                 - np.asarray(slow, np.float32)).mean()
    assert mae <= 5e-4, mae


@pytest.mark.parametrize("hoist,precast", [(False, True), (True, False)])
def test_fast_path_structure_knobs_match(agent_and_vars, hoist, precast):
    """hoist_chunk_invariants=False must recover the round-2 denoiser
    (per-step embeds, routing overrides still applied); precast_weights=False
    must keep the hoist but skip the chunk-level weight cast. Both are
    bit-identical restructurings (round-4 b=1 latency bisection knobs)."""
    import dataclasses
    agent, variables = agent_and_vars
    batch = make_batch()
    emb, _ = agent.embed_visual_obs(
        variables, jnp.asarray(batch["rgb_static"]),
        jnp.asarray(batch["rgb_gripper"]), jnp.asarray(batch["lang_emb"]),
        train=False)
    goal = jnp.asarray(batch["lang_emb"])
    key = jax.random.PRNGKey(3)
    ref = agent.denoise_actions(variables, emb, goal, key, inference=True,
                                use_routing_precompute=True)
    a2 = MoDEAgent(dataclasses.replace(
        CFG, hoist_chunk_invariants=hoist, precast_weights=precast))
    out = a2.denoise_actions(variables, emb, goal, key, inference=True,
                             use_routing_precompute=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_precast_for_serving_bit_identical(agent_and_vars):
    """Host-side one-time weight precast (round-4 b=1 fix) must not change
    denoise numerics: every consumer casts the same leaves to cfg.dtype per
    use anyway, so bf16-resident weights are bit-identical."""
    agent, variables = agent_and_vars
    batch = make_batch()
    emb, _ = agent.embed_visual_obs(
        variables, jnp.asarray(batch["rgb_static"]),
        jnp.asarray(batch["rgb_gripper"]), jnp.asarray(batch["lang_emb"]),
        train=False)
    goal = jnp.asarray(batch["lang_emb"])
    key = jax.random.PRNGKey(9)
    import dataclasses
    bf16_agent = MoDEAgent(dataclasses.replace(CFG, dtype=jnp.bfloat16))
    ref = bf16_agent.denoise_actions(variables, emb, goal, key,
                                     inference=True,
                                     use_routing_precompute=True)
    pre = bf16_agent.precast_for_serving(variables)
    # the precast must actually have cast something
    assert pre["params"]["inner_model"] is not variables["params"]["inner_model"]
    out = bf16_agent.denoise_actions(pre, emb, goal, key, inference=True,
                                     use_routing_precompute=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
