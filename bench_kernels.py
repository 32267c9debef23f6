"""Micro-benchmarks for individual kernels at the flagship hot shapes.

Usage: python bench_kernels.py [name ...]   (default: all)

Timing uses the same scan-differencing method as bench.py (N iterations
inside one jit with key-dependent input jitter, T(N)-T(1) differencing) —
per-call host timing through the axon tunnel is unreliable (CLAUDE.md).
"""
from __future__ import annotations

import os
import sys
import time

os.makedirs(os.path.expanduser("~/.cache/jax_mode_tpu"), exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_mode_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, iters=2000):
    """Scan-differencing: time fn folded over `iters` steps inside one jit."""
    import functools

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def repeat(f, key, n, *a):
        def body(carry, i):
            k = jax.random.fold_in(carry, i)
            jit8 = (jax.random.uniform(k, ()) * 1e-6).astype(a[0].dtype)
            out = f(a[0] + jit8, *a[1:])
            return k, jnp.sum(out.astype(jnp.float32))
        _, s = jax.lax.scan(body, key, jnp.arange(n))
        return s

    k = jax.random.PRNGKey(0)
    np.asarray(repeat(fn, k, 1, *args))       # compile n=1
    np.asarray(repeat(fn, k, iters, *args))   # compile n=iters
    t0 = time.time(); np.asarray(repeat(fn, jax.random.PRNGKey(1), 1, *args))
    t1 = time.time() - t0
    t0 = time.time(); np.asarray(repeat(fn, jax.random.PRNGKey(2), iters, *args))
    tN = time.time() - t0
    return (tN - t1) / (iters - 1)


def bench_attn_proj():
    """qkv + out-proj matmuls at the DiT hot shape (b=128 x 14 tokens)."""
    N, D = 1792, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)

    def bf16(x, wqkv, wout):
        qkv = x @ wqkv
        y = qkv[:, :D]
        return y @ wout

    # int8 weights, per-output-channel scales; per-token activation quant
    def q8(w):
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
        q = jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8)
        return q, s

    qkv_q, qkv_s = q8(wqkv)
    out_q, out_s = q8(wout)

    def quant_dot(x, wq, ws):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                     keepdims=True) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / ax).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * ax * ws[None, :]

    def int8(x, qkv_q, qkv_s, out_q, out_s):
        qkv = quant_dot(x, qkv_q, qkv_s)
        y = qkv[:, :D].astype(jnp.bfloat16)
        return quant_dot(y, out_q, out_s)

    t_bf = timeit(bf16, x, wqkv, wout)
    t_q8 = timeit(int8, x, qkv_q, qkv_s, out_q, out_s)
    flops = 2 * N * D * (3 * D + D)
    print(f"attn_proj bf16: {t_bf*1e6:.0f} us  ({flops/t_bf/1e12:.0f} TF/s)")
    print(f"attn_proj int8: {t_q8*1e6:.0f} us  ({flops/t_q8/1e12:.0f} TF/s)")


def bench_attn_core():
    """The non-matmul attention ops at the hot shape (B=128,H=8,T=14,hd=128)."""
    B, H, T, hd = 128, 8, 14, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.bfloat16)

    def core(q, k, v):
        import math
        logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        logits = logits / math.sqrt(hd)
        mask = jnp.tril(jnp.ones((T, T), dtype=bool))
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * hd)

    t = timeit(core, q, k, v)
    print(f"attn_core (qk^T+softmax+@v): {t*1e6:.0f} us")


def bench_encoder():
    """2x FiLM-ResNet-50 @224 b=128: folded vs unfolded inference."""
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    cfg = MoDEAgentConfig(latent_dim=1024, n_layers=1, n_heads=8,
                          cond_dim=512, resnet_type="50", dtype=jnp.bfloat16)
    agent = MoDEAgent(cfg)
    shapes = jax.eval_shape(
        lambda kk: agent.init_variables(kk, image_hw=(224, 224)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                             shapes)
    folded = agent.fold_encoders_for_inference(variables)
    B = 128
    rng = np.random.default_rng(0)
    rs = jnp.asarray(rng.standard_normal((B, 1, 224, 224, 3)), jnp.float32)
    rg = jnp.asarray(rng.standard_normal((B, 1, 224, 224, 3)), jnp.float32)
    goal = jnp.asarray(rng.standard_normal((B, 1, 512)), jnp.float32)

    def enc(rs, v):
        emb, _ = agent.embed_visual_obs(v, rs, rg, goal, train=False)
        return emb["state_images"]

    q8 = agent.quantize_encoders_for_inference(folded)
    calib = {"rgb_static": rs, "rgb_gripper": rg, "lang_emb": goal}
    q8s = agent.quantize_encoders_for_inference(folded, calib_batch=calib)
    t0 = timeit(lambda rs: enc(rs, variables), rs, iters=30)
    t1 = timeit(lambda rs: enc(rs, folded), rs, iters=30)
    t2 = timeit(lambda rs: enc(rs, q8), rs, iters=30)
    t3 = timeit(lambda rs: enc(rs, q8s), rs, iters=30)
    print(f"2x resnet50 b=128 unfolded:    {t0*1e3:.2f} ms")
    print(f"2x resnet50 b=128 folded:      {t1*1e3:.2f} ms")
    print(f"2x resnet50 b=128 int8 dyn:    {t2*1e3:.2f} ms")
    print(f"2x resnet50 b=128 int8 static: {t3*1e3:.2f} ms")


def bench_moe():
    """Fused top-2 MoE kernel variants at the flagship hot shape."""
    from mode_diffusion_policy_tpu.ops.pallas.moe_kernel import (
        fused_top2_mlp, fused_top2_mlp_q8, fused_top2_mlp_q8c)
    from mode_diffusion_policy_tpu.ops.quant import quantize_experts

    E, D, H = 4, 1024, 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((128, 14, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((E, D, 2 * H)) * 0.02, jnp.float32)
    b1 = jnp.zeros((E, 2 * H), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, H, D)) * 0.02, jnp.float32)
    q = quantize_experts(w1, b1, w2)
    idx = jnp.array([1, 3], jnp.int32)
    p = jnp.array([0.6, 0.4], jnp.float32)
    w1b, b1b, w2b = (w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
                     w2.astype(jnp.bfloat16))

    flops = 2 * 128 * 14 * D * 3 * H * 2
    t = timeit(lambda x: fused_top2_mlp(x, idx, p, w1b, b1b, w2b), x,
               iters=500)
    print(f"moe bf16: {t*1e6:.0f} us ({flops/t/1e12:.0f} TF/s)")
    t = timeit(lambda x: fused_top2_mlp_q8(x, idx, p, q), x, iters=500)
    print(f"moe q8 (weight-only): {t*1e6:.0f} us")
    t = timeit(lambda x: fused_top2_mlp_q8c(x, idx, p, q), x, iters=500)
    print(f"moe q8c (int8 compute): {t*1e6:.0f} us")



def bench_layer():
    """Whole-layer kernel orderings at the flagship hot shape (b=128).

    The fused_layer_q8c grid is (n_tok, 2, n_h) — token block OUTERMOST —
    so each expert weight block is re-DMA'd for every token block (8x at
    b=128: ~190 MB/layer-step of redundant HBM traffic against the ~24 MB
    the weights occupy). fused_dit_q8c's grid is (L, 2, n_h, n_tok) —
    token block INNERMOST, weights stationary — so calling it with L=1
    measures the weight-stationary ordering of the SAME fused layer.
    L=12 measures the full megakernel per-step cost for comparison.
    """
    from mode_diffusion_policy_tpu.ops.pallas.attn_kernel import (
        fused_attn_block)
    from mode_diffusion_policy_tpu.ops.pallas.layer_kernel import (
        fused_dit_q8c, fused_layer_q8c)
    from mode_diffusion_policy_tpu.ops.pallas.moe_kernel import (
        fused_top2_mlp_q8c)
    from mode_diffusion_policy_tpu.ops.quant import quantize_experts

    B, T, D, H, HH, E = 128, 14, 1024, 8, 4096, 4
    hd = D // H
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, jnp.bfloat16)
    c = jnp.asarray(rng.standard_normal((1, 1, D)) * 0.2, jnp.bfloat16)
    ln1 = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    ln2 = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal(3 * D) * 0.02, jnp.float32)
    qg = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    kg = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((E, D, 2 * HH)) * 0.02, jnp.float32)
    b1 = jnp.zeros((E, 2 * HH), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, HH, D)) * 0.02, jnp.float32)
    q = quantize_experts(w1, b1, w2)
    idx = jnp.array([1, 3], jnp.int32)
    p = jnp.array([0.6, 0.4], jnp.float32)

    def two_kernel(x):
        xm = fused_attn_block(x, c, ln1, wqkv, bqkv, qg, kg, wout)
        return fused_top2_mlp_q8c(xm, idx, p, q, residual=True, ln_g=ln2)

    def one_layer(x):
        return fused_layer_q8c(x, c, ln1, wqkv, bqkv, qg, kg, wout, ln2, q,
                               idx, p)

    stacked1 = {
        "ln1": ln1[None], "wqkv": wqkv[None], "bqkv": bqkv[None],
        "q_g": qg[None], "k_g": kg[None], "wout": wout[None],
        "ln2": ln2[None], "w1_q": q.w1_q[None], "w1_s": q.w1_s[None],
        "b1": q.b1[None], "w2_q": q.w2_q[None], "w2_s": q.w2_s[None],
    }

    def mega1(x):
        return fused_dit_q8c(x, c, stacked1, idx[None], p[None])

    L = 12
    stackedL = {k: jnp.concatenate([v] * L) for k, v in stacked1.items()}
    idxL = jnp.broadcast_to(idx, (L, 2))
    pL = jnp.broadcast_to(p, (L, 2))

    def megaL(x):
        return fused_dit_q8c(x, c, stackedL, idxL, pL)

    t = timeit(two_kernel, x, iters=500)
    print(f"layer two-kernel (attn + q8c MoE):   {t*1e6:.0f} us")
    t = timeit(one_layer, x, iters=500)
    print(f"layer fused (token-outer grid):      {t*1e6:.0f} us")
    t = timeit(mega1, x, iters=500)
    print(f"layer fused (weights-stationary L=1):{t*1e6:.0f} us")
    t = timeit(megaL, x, iters=100)
    print(f"megakernel L=12 (per layer):         {t*1e6/L:.0f} us")


ALL = {"attn_proj": bench_attn_proj, "attn_core": bench_attn_core,
       "encoder": bench_encoder, "moe": bench_moe, "layer": bench_layer}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print("devices:", jax.devices(), file=sys.stderr)
    for n in names:
        ALL[n]()
