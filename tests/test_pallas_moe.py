"""Pallas fused top-2 MoE kernel vs the XLA gather reference (interpret mode
on CPU; the same kernel compiles natively on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.ops.moe import moe_ffn_top2_gather
from mode_diffusion_policy_tpu.ops.pallas.moe_kernel import fused_top2_mlp


def make_weights(E=4, D=128, H=512, seed=0, dtype=jnp.float32):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    w1 = (jax.random.normal(k1, (E, D, 2 * H)) * 0.02).astype(dtype)
    b1 = (jax.random.normal(k2, (E, 2 * H)) * 0.02).astype(dtype)
    w2 = (jax.random.normal(k3, (E, H, D)) * 0.02).astype(dtype)
    return w1, b1, w2


@pytest.mark.parametrize("idx,probs", [([0, 2], [0.7, 0.3]),
                                       ([3, 1], [0.55, 0.45])])
def test_fused_top2_matches_gather(idx, probs):
    D, H = 128, 512
    w1, b1, w2 = make_weights(D=D, H=H)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 14, D))
    idx = jnp.asarray(idx, jnp.int32)
    probs = jnp.asarray(probs, jnp.float32)
    want = moe_ffn_top2_gather(x, idx, probs, w1, b1, w2)
    got = fused_top2_mlp(x, idx, probs, w1, b1, w2, block_tokens=16,
                         block_hidden=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_fused_top2_token_padding():
    """Token counts not divisible by the block size are padded and trimmed."""
    D, H = 128, 256
    w1, b1, w2 = make_weights(D=D, H=H)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 13, D))  # 13 tokens
    idx = jnp.asarray([1, 3], jnp.int32)
    probs = jnp.asarray([0.6, 0.4], jnp.float32)
    want = moe_ffn_top2_gather(x, idx, probs, w1, b1, w2)
    got = fused_top2_mlp(x, idx, probs, w1, b1, w2, block_tokens=8,
                         block_hidden=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_fused_top2_bf16():
    D, H = 128, 256
    w1, b1, w2 = make_weights(D=D, H=H, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 14, D), jnp.bfloat16)
    idx = jnp.asarray([0, 1], jnp.int32)
    probs = jnp.asarray([0.5, 0.5], jnp.float32)
    want = moe_ffn_top2_gather(x, idx, probs, w1, b1, w2)
    got = fused_top2_mlp(x, idx, probs, w1, b1, w2, block_tokens=16,
                         block_hidden=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2,
                               rtol=2e-2)


def test_quantized_experts_roundtrip():
    from mode_diffusion_policy_tpu.ops.quant import (dequantize_experts,
                                                     quantize_experts)
    w1, b1, w2 = make_weights(D=128, H=256)
    q = quantize_experts(w1, b1, w2)
    assert q.w1_q.dtype == jnp.int8 and q.w2_q.dtype == jnp.int8
    w1_d, b1_d, w2_d = dequantize_experts(q)
    # per-channel int8: reconstruction within ~1% of weight scale
    scale = float(jnp.abs(w1).max())
    assert float(jnp.abs(w1_d - w1).max()) < scale * 0.01


def test_fused_top2_q8_matches_dequantized_reference():
    from mode_diffusion_policy_tpu.ops.pallas.moe_kernel import fused_top2_mlp_q8
    from mode_diffusion_policy_tpu.ops.quant import (dequantize_experts,
                                                     quantize_experts)
    D, H = 128, 256
    w1, b1, w2 = make_weights(D=D, H=H)
    q = quantize_experts(w1, b1, w2)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 14, D))
    idx = jnp.asarray([1, 2], jnp.int32)
    probs = jnp.asarray([0.7, 0.3], jnp.float32)
    got = fused_top2_mlp_q8(x, idx, probs, q, block_tokens=16,
                            block_hidden=128, interpret=True)
    w1_d, b1_d, w2_d = dequantize_experts(q)
    want = moe_ffn_top2_gather(x, idx, probs, w1_d, b1_d, w2_d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-3)
    # and close to the unquantized fp computation (weight-only int8 error)
    full = moe_ffn_top2_gather(x, idx, probs, w1, b1, w2)
    rel = float(jnp.abs(got - full).max() / (jnp.abs(full).std() + 1e-9))
    assert rel < 0.1, rel


def test_fused_top2_mlp_q8c_interpret_matches_bf16():
    """int8-compute kernel: per-token activation quant + int8 MXU dots stay
    within ~2% of the exact fused kernel."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mode_diffusion_policy_tpu.ops.pallas.moe_kernel import (
        fused_top2_mlp, fused_top2_mlp_q8c)
    from mode_diffusion_policy_tpu.ops.quant import quantize_experts
    B, T, D, H, E = 4, 14, 128, 256, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, D, 2 * H)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((E, 2 * H)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, H, D)) * 0.05, jnp.float32)
    idx = jnp.asarray([1, 3], jnp.int32)
    p = jnp.asarray([0.6, 0.4], jnp.float32)
    ref = fused_top2_mlp(x, idx, p, w1, b1, w2, interpret=True,
                         block_tokens=28, block_hidden=128)
    got = fused_top2_mlp_q8c(x, idx, p, quantize_experts(w1, b1, w2),
                             interpret=True, block_tokens=28,
                             block_hidden=128)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() \
        / (np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.slow
def test_int8_quant_collection_and_e2e_divergence():
    """use_int8_moe: init builds the "quant" collection, requantize matches,
    and the 10-step denoise diverges <1e-3 from the exact path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    import mode_diffusion_policy_tpu.ops.pallas.moe_kernel as mk

    kw = dict(latent_dim=128, n_layers=2, n_heads=2, cond_dim=32,
              resnet_type="18", use_pallas_moe=False)
    a_ref = MoDEAgent(MoDEAgentConfig(**kw, use_int8_moe=False))
    a_q8 = MoDEAgent(MoDEAgentConfig(**kw, use_int8_moe=True))
    v = a_ref.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    assert "quant" not in v
    v8 = a_q8.quantize_for_inference(v)
    assert "quant" in v8
    v8_init = a_q8.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    chk = jax.tree.map(np.array_equal, v8["quant"], v8_init["quant"])
    assert all(jax.tree.leaves(chk))

    emb = {"state_images": jnp.asarray(np.random.default_rng(1)
           .standard_normal((4, 2, a_ref.cfg.obs_dim)), jnp.float32)}
    lang = jnp.asarray(np.random.default_rng(2).standard_normal((4, 1, 32)),
                       jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = a_ref.denoise_actions(v, emb, lang, key, inference=True,
                                use_routing_precompute=True)
    orig = mk.fused_top2_mlp_q8c

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig.__wrapped__(*args, **kwargs)

    mk.fused_top2_mlp_q8c = interp
    try:
        got = a_q8.denoise_actions(v8, emb, lang, key, inference=True,
                                   use_routing_precompute=True)
    finally:
        mk.fused_top2_mlp_q8c = orig
    mae = np.abs(np.asarray(got) - np.asarray(ref)).mean()
    assert mae < 1e-3, mae


def test_fused_top2_residual_epilogue():
    """residual=True returns x + moe(x) with the add fused in-kernel."""
    D, H = 128, 512
    w1, b1, w2 = make_weights(D=D, H=H)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 14, D))
    idx = jnp.asarray([1, 2], jnp.int32)
    probs = jnp.asarray([0.6, 0.4], jnp.float32)
    want = x + moe_ffn_top2_gather(x, idx, probs, w1, b1, w2)
    got = fused_top2_mlp(x, idx, probs, w1, b1, w2, block_tokens=16,
                         block_hidden=256, interpret=True, residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)
    # q8 variant
    from mode_diffusion_policy_tpu.ops.pallas.moe_kernel import (
        fused_top2_mlp_q8)
    from mode_diffusion_policy_tpu.ops.quant import (dequantize_experts,
                                                     quantize_experts)
    q = quantize_experts(w1, b1, w2)
    w1d, b1d, w2d = dequantize_experts(q)
    want_q = x + moe_ffn_top2_gather(x, idx, probs, w1d, b1d, w2d)
    got_q = fused_top2_mlp_q8(x, idx, probs, q, block_tokens=16,
                              block_hidden=256, interpret=True, residual=True)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                               atol=2e-4, rtol=1e-3)


def test_fused_top2_ln_fusion():
    """ln_g fuses the pre-MoE RMSNorm: kernel(x_raw, ln_g) ==
    x_normed + moe(x_normed)."""
    from mode_diffusion_policy_tpu.ops.primitives import RMSNorm
    D, H = 128, 512
    w1, b1, w2 = make_weights(D=D, H=H)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 14, D)) * 3.0
    g = jax.random.normal(jax.random.PRNGKey(5), (D,)) * 0.1 + 1.0
    idx = jnp.asarray([0, 3], jnp.int32)
    probs = jnp.asarray([0.7, 0.3], jnp.float32)
    norm = RMSNorm(D, eps=1e-6)
    xn = norm.apply({"params": {"g": g}}, x)
    want = xn + moe_ffn_top2_gather(xn, idx, probs, w1, b1, w2)
    got = fused_top2_mlp(x, idx, probs, w1, b1, w2, block_tokens=16,
                         block_hidden=256, interpret=True, residual=True,
                         ln_g=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)
