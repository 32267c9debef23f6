"""Golden-value parity: JAX MoDeDiT vs the reference PyTorch implementation.

Strategy: instantiate the reference torch model (random torch init), convert
its state dict with utils/checkpoint_convert.convert_modedit, and compare
eval-mode forward outputs on identical inputs. This validates the model math
AND the checkpoint converter in one shot (SURVEY.md §4 consequence (a))."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.modedit import (
    MoDeDiT, MoDeDiTConfig, load_balancing_loss, router_z_loss)
from mode_diffusion_policy_tpu.utils.checkpoint_convert import convert_modedit
from reference_oracle import load_reference_modedit


CFG = dict(obs_dim=32, goal_dim=16, action_dim=7, embed_dim=64, n_layers=2,
           n_heads=4, goal_seq_len=1, obs_seq_len=1, action_seq_len=10)


def make_pair(seed=0):
    ref = load_reference_modedit()
    torch.manual_seed(seed)
    tmodel = ref.MoDeDiT(
        obs_dim=CFG["obs_dim"], goal_dim=CFG["goal_dim"], device="cpu",
        goal_conditioned=True, action_dim=CFG["action_dim"],
        embed_dim=CFG["embed_dim"], embed_pdrob=0.0, attn_pdrop=0.3,
        n_layers=CFG["n_layers"], n_heads=CFG["n_heads"],
        goal_seq_len=1, obs_seq_len=1, action_seq_len=10, state_dim=8,
        mlp_pdrop=0.1, goal_drop=0.1, cond_router=True, num_experts=4,
        top_k=2, router_normalize=True, use_argmax=False,
        use_shared_expert=False, use_noise_token_as_input=True,
        init_style="olmoe")
    tmodel.eval()
    # randomize pos_emb (torch init leaves it zeros)
    with torch.no_grad():
        tmodel.pos_emb.normal_(0, 0.02)

    jcfg = MoDeDiTConfig(**CFG)
    jmodel = MoDeDiT(jcfg)
    params = convert_modedit(tmodel.state_dict(), n_layers=CFG["n_layers"],
                             num_experts=4, prefix="")
    return tmodel, jmodel, params


def make_inputs(seed=1, B=3):
    rng = np.random.default_rng(seed)
    states = rng.standard_normal((B, 2, CFG["obs_dim"])).astype(np.float32)
    actions = rng.standard_normal((B, 10, CFG["action_dim"])).astype(np.float32)
    goals = rng.standard_normal((B, 1, CFG["goal_dim"])).astype(np.float32)
    sigma = np.exp(rng.uniform(np.log(1e-3), np.log(80), (B,))).astype(np.float32)
    return states, actions, goals, sigma


@pytest.fixture(scope="module")
def pair():
    return make_pair()


def test_eval_forward_parity(pair):
    tmodel, jmodel, params = pair
    states, actions, goals, sigma = make_inputs()

    with torch.no_grad():
        t_out = tmodel({"state_images": torch.tensor(states)},
                       torch.tensor(actions), torch.tensor(goals),
                       torch.tensor(sigma)).numpy()

    j_out = jmodel.apply({"params": params},
                         {"state_images": jnp.asarray(states)},
                         jnp.asarray(actions), jnp.asarray(goals),
                         jnp.asarray(sigma), train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5, rtol=1e-4)


def test_uncond_forward_parity(pair):
    tmodel, jmodel, params = pair
    states, actions, goals, sigma = make_inputs(seed=7)
    with torch.no_grad():
        t_out = tmodel({"state_images": torch.tensor(states)},
                       torch.tensor(actions), torch.tensor(goals),
                       torch.tensor(sigma), uncond=True).numpy()
    j_out = jmodel.apply({"params": params},
                         {"state_images": jnp.asarray(states)},
                         jnp.asarray(actions), jnp.asarray(goals),
                         jnp.asarray(sigma), train=False, uncond=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5, rtol=1e-4)


def test_aux_losses_match_reference_definitions(pair):
    """Load-balancing & router z-loss parity in eval-mode routing.

    The torch reference only records aux terms in training mode where routing
    is stochastic, so compare against manually-computed golden values from the
    reference formulas (modedit.py:583-593, 930-969) using eval-mode top-k."""
    tmodel, jmodel, params = pair
    states, actions, goals, sigma = make_inputs(seed=3)
    j_out, aux = jmodel.apply({"params": params},
                              {"state_images": jnp.asarray(states)},
                              jnp.asarray(actions), jnp.asarray(goals),
                              jnp.asarray(sigma), train=False, return_aux=True)
    lb = load_balancing_loss(aux)
    zl = router_z_loss(aux)
    assert np.isfinite(float(lb)) and float(lb) > 0
    assert np.isfinite(float(zl))

    # manual golden recompute for layer 0 from reference formulas
    a = aux[0]
    probs = np.asarray(a["probs"])          # [B,T,E] true softmax probs
    mask = np.asarray(a["router_mask"])     # [B,T,E]
    rp = probs * mask
    rp = rp / rp.sum(-1, keepdims=True)
    E = probs.shape[-1]
    bt = probs.shape[0] * probs.shape[1]
    golden = E * np.sum(rp.mean((0, 1)) * (mask.sum((0, 1)) / bt))
    np.testing.assert_allclose(float(a["load_balancing_term"]), golden, rtol=1e-5)


def test_routing_is_sigma_only(pair):
    """The router must depend only on sigma (cond token), not on tokens —
    the property that makes per-sigma expert precompute exact
    (modedit.py:440,331-334)."""
    tmodel, jmodel, params = pair
    states, actions, goals, sigma = make_inputs(seed=5)
    states2 = states + 10.0
    _, aux1 = jmodel.apply({"params": params},
                           {"state_images": jnp.asarray(states)},
                           jnp.asarray(actions), jnp.asarray(goals),
                           jnp.asarray(sigma), train=False, return_aux=True)
    _, aux2 = jmodel.apply({"params": params},
                           {"state_images": jnp.asarray(states2)},
                           jnp.asarray(actions), jnp.asarray(goals),
                           jnp.asarray(sigma), train=False, return_aux=True)
    np.testing.assert_allclose(np.asarray(aux1[0]["probs"]),
                               np.asarray(aux2[0]["probs"]), atol=1e-6)


def test_precomputed_routing_fast_path(pair):
    """Inference with per-sigma precomputed top-2 overrides must equal the
    normal eval forward (the sigma-indexed replacement for the reference's
    fused-expert cache, modedit.py:971-1011)."""
    tmodel, jmodel, params = pair
    states, actions, goals, _ = make_inputs(seed=9)
    B = states.shape[0]
    sigma_scalar = 1.7
    sigma = np.full((B,), sigma_scalar, np.float32)

    routing = jmodel.apply({"params": params}, jnp.asarray([sigma_scalar]),
                           method=MoDeDiT.precompute_routing)
    overrides = [(idx[0], p[0]) for idx, p in routing]

    out_fast = jmodel.apply({"params": params},
                            {"state_images": jnp.asarray(states)},
                            jnp.asarray(actions), jnp.asarray(goals),
                            jnp.asarray(sigma), train=False,
                            moe_overrides=overrides)
    out_ref = jmodel.apply({"params": params},
                           {"state_images": jnp.asarray(states)},
                           jnp.asarray(actions), jnp.asarray(goals),
                           jnp.asarray(sigma), train=False)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def test_train_mode_runs_with_rngs(pair):
    tmodel, jmodel, params = pair
    states, actions, goals, sigma = make_inputs(seed=11)
    out, aux = jmodel.apply(
        {"params": params},
        {"state_images": jnp.asarray(states)}, jnp.asarray(actions),
        jnp.asarray(goals), jnp.asarray(sigma), train=True, return_aux=True,
        rngs={"dropout": jax.random.PRNGKey(0),
              "router": jax.random.PRNGKey(1),
              "goal_mask": jax.random.PRNGKey(2)})
    assert out.shape == (3, 10, 7)
    assert np.all(np.isfinite(np.asarray(out)))
    counts = np.asarray(aux[0]["expert_counts"])
    assert counts.sum() == 3 * 14 * 2  # B tokens * top_k


# ---------------------------------------------------------------------------
# Shared-expert / cross-attention / identity-expert options (round-2)
# ---------------------------------------------------------------------------

def make_shared_pair(seed=21):
    """Reference MoDeDiT with use_shared_expert=True: router over E-1 experts
    picking top-(k-1), plus an unweighted always-on shared MLP
    (reference modedit.py:477-508,574-581)."""
    ref = load_reference_modedit()
    torch.manual_seed(seed)
    tmodel = ref.MoDeDiT(
        obs_dim=CFG["obs_dim"], goal_dim=CFG["goal_dim"], device="cpu",
        goal_conditioned=True, action_dim=CFG["action_dim"],
        embed_dim=CFG["embed_dim"], embed_pdrob=0.0, attn_pdrop=0.3,
        n_layers=CFG["n_layers"], n_heads=CFG["n_heads"],
        goal_seq_len=1, obs_seq_len=1, action_seq_len=10, state_dim=8,
        mlp_pdrop=0.1, goal_drop=0.1, cond_router=True, num_experts=4,
        top_k=2, router_normalize=True, use_argmax=False,
        use_shared_expert=True, use_noise_token_as_input=True,
        init_style="olmoe")
    tmodel.eval()
    with torch.no_grad():
        tmodel.pos_emb.normal_(0, 0.02)
    jcfg = MoDeDiTConfig(use_shared_expert=True, **CFG)
    jmodel = MoDeDiT(jcfg)
    params = convert_modedit(tmodel.state_dict(), n_layers=CFG["n_layers"],
                             num_experts=jcfg.num_mlp_experts, prefix="")
    return tmodel, jmodel, params


def test_shared_expert_forward_parity():
    tmodel, jmodel, params = make_shared_pair()
    states, actions, goals, sigma = make_inputs(seed=22)
    with torch.no_grad():
        t_out = tmodel({"state_images": torch.tensor(states)},
                       torch.tensor(actions), torch.tensor(goals),
                       torch.tensor(sigma)).numpy()
    j_out = jmodel.apply({"params": params},
                         {"state_images": jnp.asarray(states)},
                         jnp.asarray(actions), jnp.asarray(goals),
                         jnp.asarray(sigma), train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5, rtol=1e-4)


def test_shared_expert_fast_path_matches_dense():
    _, jmodel, params = make_shared_pair()
    states, actions, goals, _ = make_inputs(seed=23)
    B = states.shape[0]
    sigma = np.full((B,), 0.8, np.float32)
    routing = jmodel.apply({"params": params}, jnp.asarray([0.8]),
                           method=MoDeDiT.precompute_routing)
    overrides = [(idx[0], p[0]) for idx, p in routing]
    # with a shared expert the router picks top-(k-1)=1
    assert overrides[0][0].shape == (1,)
    out_fast = jmodel.apply({"params": params},
                            {"state_images": jnp.asarray(states)},
                            jnp.asarray(actions), jnp.asarray(goals),
                            jnp.asarray(sigma), train=False,
                            moe_overrides=overrides)
    out_ref = jmodel.apply({"params": params},
                           {"state_images": jnp.asarray(states)},
                           jnp.asarray(actions), jnp.asarray(goals),
                           jnp.asarray(sigma), train=False)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("noise_in_cross", [False, True])
def test_cross_attention_block_parity(noise_in_cross):
    """Block-level cross-attention option (reference modedit.py:458-467,
    534-538; the reference MoDeDiT never threads it, so parity is tested at
    the block level with an explicit context).

    NOTE: the reference's cross_att construction is itself broken — it omits
    the required ``block_size`` argument (modedit.py:460-467 vs the Attention
    signature at :94-104), a TypeError at init. The oracle here patches ONLY
    that missing default (block_size=100, matching the self-attn at :456);
    the forward math is unmodified reference code."""
    from mode_diffusion_policy_tpu.models.modedit import NoiseBlockMoE
    from mode_diffusion_policy_tpu.utils.checkpoint_convert import (
        convert_block)
    ref = load_reference_modedit()
    torch.manual_seed(31 + noise_in_cross)
    D, H = 64, 4

    orig_attention = ref.Attention

    class PatchedAttention(orig_attention):
        def __init__(self, n_embd, n_head, attn_pdrop=0.0, resid_pdrop=0.0,
                     block_size=100, causal=False, bias=False, qk_norm=False):
            super().__init__(n_embd, n_head, attn_pdrop, resid_pdrop,
                             block_size, causal=causal, bias=bias,
                             qk_norm=qk_norm)

    ref.Attention = PatchedAttention
    try:
        tblock = ref.NoiseBlockMoE(
            D, H, 0.0, 0.0, noise_in_cross_attention=noise_in_cross,
            cond_router=True, use_cross_attention=True, num_experts=4,
            top_k=2, router_normalize=True, router_context_cond_only=True,
            use_argmax=False, use_shared_expert=False)
    finally:
        ref.Attention = orig_attention
    tblock.eval()

    jcfg = MoDeDiTConfig(obs_dim=32, goal_dim=16, embed_dim=D, n_layers=1,
                         n_heads=H, attn_pdrop=0.0, mlp_pdrop=0.0,
                         use_cross_attention=True,
                         noise_in_cross_attention=noise_in_cross)
    jblock = NoiseBlockMoE(jcfg)
    sd = {k: v.detach().numpy() for k, v in tblock.state_dict().items()}
    params = convert_block(sd, "", num_experts=4)

    rng = np.random.default_rng(41)
    B, T, S = 2, 14, 3
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    c = rng.standard_normal((B, 1, D)).astype(np.float32)
    ctx = rng.standard_normal((B, S, D)).astype(np.float32)
    with torch.no_grad():
        t_out = tblock(torch.tensor(x), torch.tensor(c),
                       context=torch.tensor(ctx)).numpy()
    j_out, _ = jblock.apply({"params": params}, jnp.asarray(x),
                            jnp.asarray(c), train=False,
                            context=jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5, rtol=1e-4)


def test_identity_expert_semantics():
    """identity_expert: the last routed expert is a passthrough. The reference
    registers it under key expert_{E_r} while the forward loop reads
    expert_{E_r-1} (modedit.py:495-508,560), a KeyError at runtime — so the
    intended semantics are tested against a manual golden recompute."""
    from mode_diffusion_policy_tpu.models.modedit import NoiseBlockMoE
    jcfg = MoDeDiTConfig(obs_dim=32, goal_dim=16, embed_dim=32, n_layers=1,
                         n_heads=2, num_experts=4, top_k=2,
                         identity_expert=True)
    assert jcfg.num_routed_experts == 4 and jcfg.num_mlp_experts == 3
    block = NoiseBlockMoE(jcfg)
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.standard_normal((2, 14, 32)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, 1, 32)), jnp.float32)
    v = block.init({"params": jax.random.PRNGKey(0)}, x, c)
    out, aux = block.apply(v, x, c, train=False)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))

    # golden recompute: attn -> ln_2 -> weighted experts + p_id * x
    p = v["params"]

    def rms(z, g):
        return z / np.sqrt(np.mean(np.asarray(z, np.float64) ** 2, -1,
                                   keepdims=True) + 1e-6) * g

    from mode_diffusion_policy_tpu.models.modedit import Attention
    attn = Attention(jcfg, causal=True, qk_norm=True)
    h = np.asarray(x) + np.asarray(attn.apply(
        {"params": p["attn"]}, rms(np.asarray(x), p["ln_1"]["g"]) + np.asarray(c)))
    h = rms(h, p["ln_2"]["g"]).astype(np.float32)

    probs = np.asarray(aux["probs"])       # [B,T,4] routed probs (E_r = 4)
    mask = np.asarray(aux["router_mask"])
    rp = probs * mask
    rp = rp / rp.sum(-1, keepdims=True)
    from mode_diffusion_policy_tpu.ops.moe import moe_ffn_dense
    mlp_out = np.asarray(moe_ffn_dense(
        jnp.asarray(h), jnp.asarray(rp[..., :3], jnp.float32),
        p["experts_w1"].astype(jnp.float32),
        p["experts_b1"].astype(jnp.float32),
        p["experts_w2"].astype(jnp.float32)))
    golden = h + mlp_out + rp[..., 3:] * h
    np.testing.assert_allclose(np.asarray(out), golden, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_grouped_moe_equals_dense():
    """use_grouped_moe (sort + ragged_dot, top-k-only compute) must produce
    the identical loss and parameter gradients as the dense-4 path — the
    weighted sums are the same because non-selected probabilities are zero,
    and cotangents on masked prob entries die at the mask Jacobian."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mode_diffusion_policy_tpu.models.modedit import (
        MoDeDiT, MoDeDiTConfig, load_balancing_loss, router_z_loss)

    base = MoDeDiTConfig(obs_dim=16, goal_dim=8, embed_dim=32, n_layers=2,
                         n_heads=2, num_experts=4, top_k=2, mlp_pdrop=0.0,
                         attn_pdrop=0.0, goal_drop=0.0)
    rng = np.random.default_rng(0)
    B = 3
    states = {"state_images": jnp.asarray(
        rng.standard_normal((B, 2, 16)), jnp.float32)}
    actions = jnp.asarray(rng.standard_normal((B, 10, 7)), jnp.float32)
    goals = jnp.asarray(rng.standard_normal((B, 1, 8)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(0.01, 5.0, (B,)), jnp.float32)

    m0 = MoDeDiT(base)
    m1 = MoDeDiT(dataclasses.replace(base, use_grouped_moe=True))
    v = m0.init({"params": jax.random.PRNGKey(0)}, states, actions, goals,
                sigma)

    def loss(model, params):
        pred, aux = model.apply(
            {"params": params}, states, actions, goals, sigma,
            train=True, return_aux=True,
            rngs={"router": jax.random.PRNGKey(5),
                  "dropout": jax.random.PRNGKey(6),
                  "goal_mask": jax.random.PRNGKey(7)})
        return (jnp.sum(pred ** 2) + load_balancing_loss(aux)
                + 0.1 * router_z_loss(aux))

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    assert abs(float(l0 - l1)) < 1e-5
    errs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    assert max(jax.tree.leaves(errs)) < 1e-4, errs
    # eval (no-precompute) path too
    p0 = m0.apply({"params": v["params"]}, states, actions, goals, sigma,
                  train=False)
    p1 = m1.apply({"params": v["params"]}, states, actions, goals, sigma,
                  train=False)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-5)


def test_grouped_moe_identity_expert():
    """Grouped path with identity_expert: identity selections contribute
    p*x and nothing through the GEMMs (remapped to expert 0, prob 0)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mode_diffusion_policy_tpu.models.modedit import (MoDeDiT,
                                                          MoDeDiTConfig)

    base = MoDeDiTConfig(obs_dim=16, goal_dim=8, embed_dim=32, n_layers=1,
                         n_heads=2, num_experts=4, top_k=2,
                         identity_expert=True, mlp_pdrop=0.0,
                         attn_pdrop=0.0, goal_drop=0.0)
    rng = np.random.default_rng(1)
    B = 4
    states = {"state_images": jnp.asarray(
        rng.standard_normal((B, 2, 16)), jnp.float32)}
    actions = jnp.asarray(rng.standard_normal((B, 10, 7)), jnp.float32)
    goals = jnp.asarray(rng.standard_normal((B, 1, 8)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(0.01, 5.0, (B,)), jnp.float32)
    m0 = MoDeDiT(base)
    m1 = MoDeDiT(dataclasses.replace(base, use_grouped_moe=True))
    v = m0.init({"params": jax.random.PRNGKey(0)}, states, actions, goals,
                sigma)
    p0 = m0.apply({"params": v["params"]}, states, actions, goals, sigma,
                  train=False)
    p1 = m1.apply({"params": v["params"]}, states, actions, goals, sigma,
                  train=False)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-5)
