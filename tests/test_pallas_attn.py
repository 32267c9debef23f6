"""Fused attention sub-block kernel vs the XLA lowering (interpret mode on
CPU; the same kernel compiles natively on TPU — see docs/PERF.md)."""
import dataclasses
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.ops.pallas.attn_kernel import fused_attn_block


def ref_block(x, c, g, wqkv, bqkv, qg, kg, wout, T, H, hd, eps=1e-6):
    """The XLA attention sub-block (modedit.Attention + ln_1 + residual)."""
    B = x.shape[0]
    D = H * hd

    def rms(v, gg, d):
        v32 = v.astype(jnp.float32)
        n = jnp.linalg.norm(v32, axis=-1, keepdims=True) * (d ** -0.5)
        return (v32 / jnp.maximum(n, eps) * gg).astype(v.dtype)

    h = rms(x, g, D) + c
    qkv = h @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = rms(q.reshape(B, T, H, hd), qg, hd)
    k = rms(k.reshape(B, T, H, hd), kg, hd)
    v = v.reshape(B, T, H, hd)
    logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(
        jnp.float32) / math.sqrt(hd)
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    a = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhts,bshd->bthd", a, v).reshape(B, T, D)
    return x + o @ wout


@pytest.mark.parametrize("B,T,H,hd", [(3, 14, 2, 128), (17, 14, 8, 128),
                                      (2, 6, 4, 128)])
def test_fused_attn_matches_xla(B, T, H, hd):
    D = H * hd
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((D,)) * 0.1 + 1, jnp.float32)
    qg = jnp.asarray(rng.standard_normal((hd,)) * 0.1 + 1, jnp.float32)
    kg = jnp.asarray(rng.standard_normal((hd,)) * 0.1 + 1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * D,)) * 0.01, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.float32)
    want = ref_block(x, c, g, wqkv, bqkv, qg, kg, wout, T, H, hd)
    got = fused_attn_block(x, c, g, wqkv, bqkv, qg, kg, wout,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_modedit_fused_attn_path():
    """use_pallas_attn flag: the DiT forward is unchanged (interpret mode)."""
    from mode_diffusion_policy_tpu.models.modedit import MoDeDiT, MoDeDiTConfig
    from mode_diffusion_policy_tpu.ops.pallas import attn_kernel

    base = MoDeDiTConfig(obs_dim=16, goal_dim=8, embed_dim=256, n_layers=2,
                         n_heads=2, num_experts=4, top_k=2, attn_pdrop=0.0,
                         mlp_pdrop=0.0, goal_drop=0.0)
    rng = np.random.default_rng(1)
    B = 3
    states = {"state_images": jnp.asarray(
        rng.standard_normal((B, 2, 16)), jnp.float32)}
    actions = jnp.asarray(rng.standard_normal((B, 10, 7)), jnp.float32)
    goals = jnp.asarray(rng.standard_normal((B, 1, 8)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(0.01, 5.0, (B,)), jnp.float32)

    m0 = MoDeDiT(base)
    m1 = MoDeDiT(dataclasses.replace(base, use_pallas_attn=True))
    v = m0.init({"params": jax.random.PRNGKey(0)}, states, actions, goals,
                sigma)
    p0 = m0.apply({"params": v["params"]}, states, actions, goals, sigma,
                  train=False)

    orig = attn_kernel.fused_attn_block

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig.__wrapped__(*a, **kw)

    attn_kernel.fused_attn_block = interp
    try:
        p1 = m1.apply({"params": v["params"]}, states, actions, goals, sigma,
                      train=False)
        # precomputed-routing fast path composes with the fused attention
        routing = m1.apply({"params": v["params"]}, jnp.asarray([0.5, 2.0]),
                           method=MoDeDiT.precompute_routing)
        ovr = [(idx[0], p[0]) for idx, p in routing]
        p2 = m1.apply({"params": v["params"]}, states, actions, goals,
                      jnp.full((B,), 0.5), train=False, moe_overrides=ovr)
    finally:
        attn_kernel.fused_attn_block = orig
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-4,
                               rtol=1e-4)
    assert np.isfinite(np.asarray(p2)).all()


def test_fused_attn_train_and_small_head_fall_back():
    """train=True and hd != 128 must use the XLA path (no kernel calls)."""
    from mode_diffusion_policy_tpu.models.modedit import MoDeDiT, MoDeDiTConfig
    from mode_diffusion_policy_tpu.ops.pallas import attn_kernel

    called = []
    orig = attn_kernel.fused_attn_block
    attn_kernel.fused_attn_block = lambda *a, **kw: called.append(1)
    try:
        # hd = 32/2 = 16 != 128 -> fallback even with the flag on
        cfg = MoDeDiTConfig(obs_dim=16, goal_dim=8, embed_dim=32, n_layers=1,
                            n_heads=2, num_experts=4, top_k=2,
                            use_pallas_attn=True)
        m = MoDeDiT(cfg)
        rng = np.random.default_rng(2)
        states = {"state_images": jnp.asarray(
            rng.standard_normal((2, 2, 16)), jnp.float32)}
        actions = jnp.asarray(rng.standard_normal((2, 10, 7)), jnp.float32)
        goals = jnp.asarray(rng.standard_normal((2, 1, 8)), jnp.float32)
        sigma = jnp.ones((2,))
        v = m.init({"params": jax.random.PRNGKey(0)}, states, actions, goals,
                   sigma)
        m.apply({"params": v["params"]}, states, actions, goals, sigma,
                train=False)
        assert not called
    finally:
        attn_kernel.fused_attn_block = orig


def test_fused_attn_q8_close():
    """int8-projection kernel: close to the f32 path (QK-norm absorbs q/k
    scale error; weights per-output-channel, activations per-row)."""
    from mode_diffusion_policy_tpu.ops.pallas.attn_kernel import (
        fused_attn_block_q8)
    from mode_diffusion_policy_tpu.ops.quant import quantize_attn
    B, T, H, hd = 5, 14, 2, 128
    D = H * hd
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((D,)) * 0.1 + 1, jnp.float32)
    qg = jnp.asarray(rng.standard_normal((hd,)) * 0.1 + 1, jnp.float32)
    kg = jnp.asarray(rng.standard_normal((hd,)) * 0.1 + 1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * D,)) * 0.01, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.float32)
    want = ref_block(x, c, g, wqkv, bqkv, qg, kg, wout, T, H, hd)
    qa = quantize_attn(wqkv, bqkv, wout)
    got = fused_attn_block_q8(x, c, g, qa, qg, kg, interpret=True)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_agent_int8_attn_denoise():
    """use_int8_attn through the agent fast path (interpret mode): the quant
    collection carries attn_q and the denoise chunk stays close to the
    unquantized fused path."""
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    from mode_diffusion_policy_tpu.ops.pallas import attn_kernel

    kw = dict(latent_dim=256, n_layers=2, n_heads=2, cond_dim=32,
              resnet_type="18", num_experts=4, top_k=2)
    a_ref = MoDEAgent(MoDEAgentConfig(**kw))
    a_q8 = MoDEAgent(MoDEAgentConfig(**kw, use_pallas_attn=True,
                                     use_int8_attn=True))
    v = a_ref.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    v8 = a_q8.quantize_for_inference(v)
    assert "quant" in v8
    layer0 = next(iter(v8["quant"]["inner_model"].values()))
    assert "attn" in layer0 and "attn_q" in layer0["attn"]

    rng = np.random.default_rng(4)
    emb = {"state_images": jnp.asarray(
        rng.standard_normal((4, 2, a_ref.cfg.obs_dim)), jnp.float32)}
    lang = jnp.asarray(rng.standard_normal((4, 1, 32)), jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = a_ref.denoise_actions(v, emb, lang, key, inference=True,
                                use_routing_precompute=True)

    origs = (attn_kernel.fused_attn_block, attn_kernel.fused_attn_block_q8)

    def interp(orig):
        def f(*a, **kwargs):
            kwargs["interpret"] = True
            return orig.__wrapped__(*a, **kwargs)
        return f

    attn_kernel.fused_attn_block = interp(origs[0])
    attn_kernel.fused_attn_block_q8 = interp(origs[1])
    try:
        got = a_q8.denoise_actions(v8, emb, lang, key, inference=True,
                                   use_routing_precompute=True)
    finally:
        (attn_kernel.fused_attn_block,
         attn_kernel.fused_attn_block_q8) = origs
    mae = float(np.abs(np.asarray(got) - np.asarray(ref)).mean())
    assert np.isfinite(np.asarray(got)).all()
    assert mae < 2e-3, mae


def test_int8_attn_init_and_quantless_apply():
    """Regression (code review): with use_int8_attn, (a) module init must
    NOT run the kernel (CPU init host) and must create the quant collection,
    (b) applies WITHOUT a quant collection (training, pre-quantize eval)
    fall back instead of failing the variable lookup, (c) the config rejects
    use_int8_attn without use_pallas_attn or with head_dim % 128 != 0."""
    from mode_diffusion_policy_tpu.models.modedit import MoDeDiT, MoDeDiTConfig

    cfg = MoDeDiTConfig(obs_dim=16, goal_dim=8, embed_dim=256, n_layers=1,
                        n_heads=2, num_experts=4, top_k=2,
                        use_pallas_attn=True, use_int8_attn=True)
    m = MoDeDiT(cfg)
    rng = np.random.default_rng(0)
    states = {"state_images": jnp.asarray(
        rng.standard_normal((2, 2, 16)), jnp.float32)}
    actions = jnp.asarray(rng.standard_normal((2, 10, 7)), jnp.float32)
    goals = jnp.asarray(rng.standard_normal((2, 1, 8)), jnp.float32)
    sigma = jnp.ones((2,))
    v = m.init({"params": jax.random.PRNGKey(0)}, states, actions, goals,
               sigma)
    assert "quant" in v
    out = m.apply({"params": v["params"]}, states, actions, goals, sigma,
                  train=True, rngs={"router": jax.random.PRNGKey(1),
                                    "dropout": jax.random.PRNGKey(2),
                                    "goal_mask": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="use_pallas_attn"):
        MoDeDiTConfig(use_int8_attn=True)
    with pytest.raises(ValueError, match="head_dim"):
        MoDeDiTConfig(embed_dim=256, n_heads=4, use_pallas_attn=True,
                      use_int8_attn=True)


@pytest.mark.parametrize("sampler", ["ddim", "heun", "dpm",
                                     "euler_ancestral", "dpmpp_2m"])
def test_samplers_with_fused_kernels(sampler):
    """Fused attention + Pallas MoE (interpret) under representative sampler
    structures — scheduled gathers, off-schedule midpoint evals (inline
    routing), ancestral noise, multistep memory — must match the unfused
    agent path."""
    import dataclasses

    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    from mode_diffusion_policy_tpu.ops.pallas import attn_kernel
    from mode_diffusion_policy_tpu.ops.pallas import moe_kernel as mk

    base = MoDEAgentConfig(latent_dim=256, n_layers=2, n_heads=2, cond_dim=32,
                           resnet_type="18", num_experts=4, top_k=2,
                           sampler_type=sampler)
    a0 = MoDEAgent(base)
    a1 = MoDEAgent(dataclasses.replace(base, use_pallas_attn=True,
                                       use_pallas_moe=True))
    v = a0.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    rng = np.random.default_rng(6)
    emb = {"state_images": jnp.asarray(
        rng.standard_normal((2, 2, 512)), jnp.float32)}
    lang = jnp.asarray(rng.standard_normal((2, 1, 32)), jnp.float32)
    key = jax.random.PRNGKey(11)
    ref = a0.denoise_actions(v, emb, lang, key, inference=True,
                             use_routing_precompute=True)

    origs = (attn_kernel.fused_attn_block, mk.fused_top2_mlp)

    def interp(orig):
        def f(*a, **kw):
            kw["interpret"] = True
            return orig.__wrapped__(*a, **kw)
        return f

    attn_kernel.fused_attn_block = interp(origs[0])
    mk.fused_top2_mlp = interp(origs[1])
    try:
        got = a1.denoise_actions(v, emb, lang, key, inference=True,
                                 use_routing_precompute=True)
    finally:
        attn_kernel.fused_attn_block, mk.fused_top2_mlp = origs
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4,
                               rtol=1e-3)
