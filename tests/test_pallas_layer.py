"""Whole-layer fused kernel (attn + int8 MoE in one launch) vs the
two-kernel composition, interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.ops.pallas.attn_kernel import fused_attn_block
from mode_diffusion_policy_tpu.ops.pallas.layer_kernel import fused_layer_q8c
from mode_diffusion_policy_tpu.ops.pallas.moe_kernel import fused_top2_mlp_q8c
from mode_diffusion_policy_tpu.ops.quant import quantize_experts


def _setup(B=4, T=14, D=256, H=2, HH=256, E=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, jnp.float32)
    c = jnp.asarray(rng.standard_normal((1, 1, D)) * 0.2, jnp.float32)
    ln1 = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    ln2 = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * D) * 0.02, jnp.float32)
    hd = D // H
    qg = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    kg = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.05, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, D, 2 * HH)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((E, 2 * HH)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, HH, D)) * 0.05, jnp.float32)
    q = quantize_experts(w1, b1, w2)
    return x, c, ln1, wqkv, bqkv, qg, kg, wout, ln2, q


def _two_kernel_ref(x, c, ln1, wqkv, bqkv, qg, kg, wout, ln2, q, idx, p):
    x_mid = fused_attn_block(x, c, ln1, wqkv, bqkv, qg, kg, wout,
                             block_samples=4, interpret=True)
    return fused_top2_mlp_q8c(x_mid, idx, p, q, residual=True, ln_g=ln2,
                              block_tokens=56, block_hidden=128,
                              interpret=True)


@pytest.mark.parametrize("idx,p", [([0, 2], [0.7, 0.3]),
                                   ([3, 1], [0.55, 0.45])])
def test_fused_layer_matches_two_kernels(idx, p):
    args = _setup()
    idx = jnp.asarray(idx, jnp.int32)
    p = jnp.asarray(p, jnp.float32)
    want = _two_kernel_ref(*args, idx, p)
    got = fused_layer_q8c(*args[:2], *args[2:9], args[9], idx, p,
                          block_samples=4, block_hidden=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_fused_layer_sigma_table_step():
    """Full [S,2] routing tables + a step selector pick the right row."""
    args = _setup(seed=1)
    idx_tab = jnp.asarray([[0, 1], [2, 3], [1, 2]], jnp.int32)
    p_tab = jnp.asarray([[.6, .4], [.7, .3], [.5, .5]], jnp.float32)
    for s in range(3):
        want = _two_kernel_ref(*args, idx_tab[s], p_tab[s])
        got = fused_layer_q8c(*args[:2], *args[2:9], args[9], idx_tab, p_tab,
                              step=jnp.int32(s), block_samples=4,
                              block_hidden=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4, err_msg=f"step {s}")


def test_fused_layer_per_sample_cond():
    """Per-sample cond tokens (use_goal_in_routing shape) also work."""
    args = list(_setup(seed=2))
    rng = np.random.default_rng(3)
    args[1] = jnp.asarray(rng.standard_normal((4, 1, 256)) * 0.2, jnp.float32)
    idx = jnp.asarray([1, 3], jnp.int32)
    p = jnp.asarray([0.8, 0.2], jnp.float32)
    want = _two_kernel_ref(*args, idx, p)
    got = fused_layer_q8c(*args[:2], *args[2:9], args[9], idx, p,
                          block_samples=4, block_hidden=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_fused_layer_through_model():
    """use_fused_layer=True agent denoise == the default-kernel agent
    (both on the routing-precompute fast path, CPU interpret)."""
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    kw = dict(latent_dim=256, n_layers=2, n_heads=2, cond_dim=64,
              resnet_type="18")
    a_ref = MoDEAgent(MoDEAgentConfig(**kw, use_int8_moe=True,
                                      use_pallas_attn=True))
    a_fl = MoDEAgent(MoDEAgentConfig(**kw, use_int8_moe=True,
                                     use_pallas_attn=True,
                                     use_fused_layer=True))
    v = a_ref.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    rng = np.random.default_rng(0)
    emb = {"state_images": jnp.asarray(rng.standard_normal((4, 2, 512)),
                                       jnp.float32)}
    lang = jnp.asarray(rng.standard_normal((4, 1, 64)), jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = a_ref.denoise_actions(v, emb, lang, key, inference=True,
                                use_routing_precompute=True)
    got = a_fl.denoise_actions(v, emb, lang, key, inference=True,
                               use_routing_precompute=True)
    assert got.shape == (4, 10, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


@pytest.mark.parametrize("B,T,BS", [(3, 11, 8), (5, 14, 4), (1, 7, 8)])
def test_fused_layer_odd_shapes(B, T, BS):
    """Batch not a multiple of the token block and odd T exercise
    _block_layout's sublane-granule search + padding; compare against the
    two-kernel composition at the same shapes. (T=11/7 need 8 samples per
    block to tile the 8-row sublane granule — the model default of 16
    always finds one; block_samples too small for T is a documented
    ValueError.)"""
    D, H, HH, E = 256, 2, 256, 4
    hd = D // H
    rng = np.random.default_rng(10 * B + T)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, jnp.float32)
    c = jnp.asarray(rng.standard_normal((1, 1, D)) * 0.2, jnp.float32)
    ln1 = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    ln2 = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * D) * 0.02, jnp.float32)
    qg = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    kg = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.05, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, D, 2 * HH)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((E, 2 * HH)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, HH, D)) * 0.05, jnp.float32)
    q = quantize_experts(w1, b1, w2)
    idx = jnp.asarray([3, 0], jnp.int32)
    p = jnp.asarray([0.65, 0.35], jnp.float32)
    from mode_diffusion_policy_tpu.ops.pallas.attn_kernel import (
        fused_attn_block)
    xm = fused_attn_block(x, c, ln1, wqkv, bqkv, qg, kg, wout,
                          block_samples=BS, interpret=True)
    want = fused_top2_mlp_q8c(xm, idx, p, q, residual=True, ln_g=ln2,
                              block_tokens=BS * T, block_hidden=128,
                              interpret=True)
    got = fused_layer_q8c(x, c, ln1, wqkv, bqkv, qg, kg, wout, ln2, q,
                          idx, p, block_samples=BS, block_hidden=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_fused_layer_int8_attn_matches_two_kernels():
    """qattn= switches the in-kernel attention projections to int8; must
    match the fused_attn_block_q8 + MoE two-kernel composition."""
    from mode_diffusion_policy_tpu.ops.pallas.attn_kernel import (
        fused_attn_block_q8)
    from mode_diffusion_policy_tpu.ops.quant import quantize_attn

    x, c, ln1, wqkv, bqkv, qg, kg, wout, ln2, q = _setup(seed=4)
    qa = quantize_attn(wqkv, bqkv, wout)
    idx = jnp.asarray([0, 2], jnp.int32)
    p = jnp.asarray([0.7, 0.3], jnp.float32)
    xm = fused_attn_block_q8(x, c, ln1, qa, qg, kg, block_samples=4,
                             interpret=True)
    want = fused_top2_mlp_q8c(xm, idx, p, q, residual=True, ln_g=ln2,
                              block_tokens=56, block_hidden=128,
                              interpret=True)
    got = fused_layer_q8c(x, c, ln1, None, None, qg, kg, None, ln2, q,
                          idx, p, qattn=qa, block_samples=4,
                          block_hidden=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_fused_layer_int8_attn_through_model():
    """use_fused_layer + use_int8_attn agent == the two-kernel int8-attn
    agent on the routing-precompute fast path (CPU interpret)."""
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    kw = dict(latent_dim=256, n_layers=2, n_heads=2, cond_dim=64,
              resnet_type="18", use_int8_moe=True, use_pallas_attn=True,
              use_int8_attn=True)
    a_ref = MoDEAgent(MoDEAgentConfig(**kw))
    a_fl = MoDEAgent(MoDEAgentConfig(**kw, use_fused_layer=True))
    v = a_ref.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    v = a_ref.quantize_for_inference(v)
    rng = np.random.default_rng(0)
    emb = {"state_images": jnp.asarray(rng.standard_normal((4, 2, 512)),
                                       jnp.float32)}
    lang = jnp.asarray(rng.standard_normal((4, 1, 64)), jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = a_ref.denoise_actions(v, emb, lang, key, inference=True,
                                use_routing_precompute=True)
    got = a_fl.denoise_actions(v, emb, lang, key, inference=True,
                               use_routing_precompute=True)
    assert got.shape == (4, 10, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_megakernel_int8_attn_through_model():
    """use_megakernel + use_int8_attn == the two-kernel int8-attn agent
    (stack_layers stacks the QuantizedAttn leaves; CPU interpret)."""
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    kw = dict(latent_dim=256, n_layers=2, n_heads=2, cond_dim=64,
              resnet_type="18", use_int8_moe=True, use_pallas_attn=True,
              use_int8_attn=True)
    a_ref = MoDEAgent(MoDEAgentConfig(**kw))
    a_mk = MoDEAgent(MoDEAgentConfig(**kw, use_megakernel=True))
    v = a_ref.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    v = a_ref.quantize_for_inference(v)
    rng = np.random.default_rng(0)
    emb = {"state_images": jnp.asarray(rng.standard_normal((4, 2, 512)),
                                       jnp.float32)}
    lang = jnp.asarray(rng.standard_normal((4, 1, 64)), jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = a_ref.denoise_actions(v, emb, lang, key, inference=True,
                                use_routing_precompute=True)
    got = a_mk.denoise_actions(v, emb, lang, key, inference=True,
                               use_routing_precompute=True)
    assert got.shape == (4, 10, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_megakernel_through_model():
    """use_megakernel=True agent denoise == the default-kernel agent on the
    routing-precompute fast path (CPU interpret)."""
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    kw = dict(latent_dim=256, n_layers=3, n_heads=2, cond_dim=64,
              resnet_type="18")
    a_ref = MoDEAgent(MoDEAgentConfig(**kw, use_int8_moe=True,
                                      use_pallas_attn=True))
    a_mk = MoDEAgent(MoDEAgentConfig(**kw, use_int8_moe=True,
                                     use_pallas_attn=True,
                                     use_megakernel=True))
    v = a_ref.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    rng = np.random.default_rng(0)
    emb = {"state_images": jnp.asarray(rng.standard_normal((4, 2, 512)),
                                       jnp.float32)}
    lang = jnp.asarray(rng.standard_normal((4, 1, 64)), jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = a_ref.denoise_actions(v, emb, lang, key, inference=True,
                                use_routing_precompute=True)
    got = a_mk.denoise_actions(v, emb, lang, key, inference=True,
                               use_routing_precompute=True)
    assert got.shape == (4, 10, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)
