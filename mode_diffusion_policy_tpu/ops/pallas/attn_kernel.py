"""Pallas TPU kernel: fully fused attention sub-block of NoiseBlockMoE.

Computes ``x + c_proj(attn(qk_norm(split(wqkv(rmsnorm(x)*g + c)))))`` — the
reference block's ``x = x + self.attn(self.ln_1(x) + c)``
(/root/reference/mode/models/networks/modedit.py:530-532 with the QK-RMSNorm
attention of :94-167) — in ONE kernel.

Why fused: at the hot shape (B=128, T=14, D=1024, 8 heads) the XLA lowering
spends ~124 us/layer on non-matmul work (three RMSNorm passes, the sigma-token
add, head reshapes/transposes, f32 mask+softmax, residual) against ~110 us of
matmul — nearly half the attention time is HBM round trips between tiny ops.
This kernel keeps every intermediate in VMEM.

TPU-native design notes:
- Rows are (sample, token) pairs; a grid step processes ``block_samples``
  whole samples so attention never crosses a block boundary.
- Per-head QK-RMSNorm runs WITHOUT lane reshapes: per-head sum-of-squares is
  a matmul against a [D, H] head-indicator one-hot, and the inverse norms are
  scattered back with its transpose — MXU-friendly, no relayout.
- Scores are computed per head as a [TM, TM] dot over the block with an
  iota-generated block-diagonal causal mask; with 16 samples/block the extra
  FLOPs vs true 14x14 attention are ~9 us/layer, far cheaper than the
  relayouts they replace.
- Weights stream in as f32 and are cast to the compute dtype in VMEM: XLA
  does not hoist per-step weight casts out of the sampler ``lax.scan``, so
  the unfused path re-materializes bf16 copies of wqkv/c_proj to HBM every
  denoise step; here the cast never touches HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, c_ref, lng_ref, wqkv_ref, bqkv_ref, qgt_ref, kgt_ref,
            wout_ref, out_ref, *, T, H, hd, eps_ln, eps_qk, scale):
    D = H * hd
    TM = x_ref.shape[0]
    dt = x_ref.dtype
    x32 = x_ref[:].astype(jnp.float32)

    # ln_1 (reference RMSNorm semantics: x / max(||x|| * D^-0.5, eps) * g)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=1, keepdims=True)) * (D ** -0.5)
    h = x32 / jnp.maximum(norm, eps_ln) * lng_ref[0].astype(jnp.float32)
    # c is either per-row [TM, D] or one shared sigma-token row [1, D]
    # broadcast over the block (c_shared — saves the [N, D] HBM copy)
    c = c_ref[0] if c_ref.shape[0] == 1 else c_ref[:]
    h = (h + c.astype(jnp.float32)).astype(dt)

    qkv = jnp.dot(h, wqkv_ref[:].astype(dt),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0].astype(jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    # per-head RMSNorm without reshapes: head one-hot [D, H]
    col_head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
    head_id = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    onehot = (col_head == head_id).astype(jnp.float32)

    def headnorm(a, g_tiled):
        ss = jnp.dot(a * a, onehot)                     # [TM, H]
        n = jnp.sqrt(ss) * (hd ** -0.5)
        inv = 1.0 / jnp.maximum(n, eps_qk)
        rows = jnp.dot(inv, onehot.T)                   # [TM, D]
        return a * rows * g_tiled[0].astype(jnp.float32)

    qn = headnorm(q, qgt_ref).astype(dt)
    kn = headnorm(k, kgt_ref).astype(dt)
    v = v.astype(dt)

    # block-diagonal causal mask over (sample, token) rows
    ri = jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 1)
    allowed = jnp.logical_and(ri // T == ci // T, ri % T >= ci % T)

    outs = []
    for h_i in range(H):
        sl = slice(h_i * hd, (h_i + 1) * hd)
        sc = jax.lax.dot_general(qn[:, sl], kn[:, sl],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        sc = jnp.where(allowed, sc, -1e30)
        a = jax.nn.softmax(sc, axis=1).astype(dt)
        outs.append(jnp.dot(a, v[:, sl], preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=1).astype(dt)        # [TM, D]

    y = jnp.dot(o, wout_ref[:].astype(dt), preferred_element_type=jnp.float32)
    out_ref[:] = (x32 + y).astype(out_ref.dtype)


def _block_layout(x, c, block_samples):
    """Shared tiling/pad logic: pick S whole samples per grid step (rows per
    block must tile the TPU sublane granule; small batches use the smallest
    valid S >= B so padded compute stays proportional), pad batch to a
    multiple of S, and flatten to rows.

    When c is sample-AND-token-invariant ([1, 1, D], the cond-only sigma
    token of the precomputed fast path), it is returned as one shared
    [1, D] row — the kernels broadcast it in VMEM instead of reading a
    materialized [N, D] copy from HBM per layer."""
    B, T, D = x.shape
    S = block_samples
    while (S * T) % 8 != 0 and S > 1:
        S -= 1
    if B < S:
        S_small = 1
        while (S_small * T) % 8 != 0 or S_small < B:
            S_small += 1
        S = S_small
    if (S * T) % 8 != 0:
        raise ValueError(
            f"no block size S in [1, {block_samples}] satisfies the sublane "
            f"constraint (S*T) % 8 == 0 for T={T}; pick a block_samples "
            "whose multiples of T can tile the 8-row granule")
    Bp = -(-B // S) * S
    if Bp != B:
        x_in = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
    else:
        x_in = x
    N = Bp * T
    if c.shape[0] == 1 and c.shape[1] == 1:
        c_rows = c.reshape(1, D).astype(x.dtype)
    else:
        c_in = jnp.broadcast_to(c, (B, T, D))
        if Bp != B:
            c_in = jnp.pad(c_in, ((0, Bp - B), (0, 0), (0, 0)))
        c_rows = c_in.reshape(N, D).astype(x.dtype)
    return x_in.reshape(N, D), c_rows, Bp, N, S * T


@functools.partial(jax.jit, static_argnames=("block_samples", "interpret",
                                             "ln_eps", "qk_eps"))
def fused_attn_block(x: jax.Array, c: jax.Array, ln_g: jax.Array,
                     wqkv: jax.Array, bqkv: jax.Array,
                     q_g: jax.Array, k_g: jax.Array, wout: jax.Array, *,
                     block_samples: int = 16, ln_eps: float = 1e-6,
                     qk_eps: float = 1e-6,
                     interpret: bool = False) -> jax.Array:
    """x: [B, T, D]; c: [B, 1, D] or [B, T, D] sigma token; ln_g [D];
    wqkv [D, 3D] (+ bias [3D]); q_g/k_g [hd] per-head RMSNorm scales;
    wout [D, D]. Returns ``x + attn_block(x)`` in x.dtype.

    Weights may stay f32 — they are cast to x.dtype inside VMEM."""
    B, T, D = x.shape
    H3 = wqkv.shape[1]
    D_ = H3 // 3
    assert D_ == D, (D_, D)
    hd = q_g.shape[-1]
    H = D // hd

    xf, cf, Bp, N, TM = _block_layout(x, c, block_samples)
    qgt = jnp.tile(q_g.astype(jnp.float32), H)[None, :]   # [1, D]
    kgt = jnp.tile(k_g.astype(jnp.float32), H)[None, :]

    c_spec = (pl.BlockSpec((1, D), lambda i: (0, 0)) if cf.shape[0] == 1
              else pl.BlockSpec((TM, D), lambda i: (i, 0)))
    grid = (N // TM,)
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, H=H, hd=hd, eps_ln=ln_eps,
                          eps_qk=qk_eps, scale=float(1.0 / np.sqrt(hd))),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0)),
            c_spec,
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # single-grid-step specializations (small B) put the f32 weight
            # loads on the scoped-vmem stack and blow the default 16MB limit
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * (4 * D) + 2 * N * TM * D * 2,
            bytes_accessed=(4 * D * 4 * D) + N * D * 2 * x.dtype.itemsize,
            transcendentals=N * TM * H,
        ),
    )(xf, cf, ln_g[None, :], wqkv, bqkv[None, :], qgt, kgt, wout)
    return out.reshape(Bp, T, D)[:B]


# ---------------------------------------------------------------------------
# int8 x int8 projection variant: wqkv and c_proj run as native int8 MXU dots
# with per-row dynamic activation quantization that never leaves VMEM. The
# per-head QK-RMSNorm divides the q/k scale errors back out (only direction
# error survives), and the scores/AV dots stay in the compute dtype.
# Weight DMA drops 4x vs f32 (16.6 -> 4.2 MB per call at the hot shape).
# ---------------------------------------------------------------------------


from .quant_math import quant_rows as _qrows


def _kernel_q8(x_ref, c_ref, lng_ref, wqkv_ref, sqkv_ref, bqkv_ref, qgt_ref,
               kgt_ref, wout_ref, sout_ref, out_ref, *, T, H, hd, eps_ln,
               eps_qk, scale):
    D = H * hd
    TM = x_ref.shape[0]
    dt = x_ref.dtype
    x32 = x_ref[:].astype(jnp.float32)

    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=1, keepdims=True)) * (D ** -0.5)
    h = x32 / jnp.maximum(norm, eps_ln) * lng_ref[0].astype(jnp.float32)
    c = c_ref[0] if c_ref.shape[0] == 1 else c_ref[:]
    h = h + c.astype(jnp.float32)

    hq, hs = _qrows(h)
    qkv = jax.lax.dot_general(hq, wqkv_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = qkv.astype(jnp.float32) * (hs * sqkv_ref[0][None, :]) \
        + bqkv_ref[0].astype(jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    col_head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
    head_id = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    onehot = (col_head == head_id).astype(jnp.float32)

    def headnorm(a, g_tiled):
        ss = jnp.dot(a * a, onehot)
        n = jnp.sqrt(ss) * (hd ** -0.5)
        inv = 1.0 / jnp.maximum(n, eps_qk)
        rows = jnp.dot(inv, onehot.T)
        return a * rows * g_tiled[0].astype(jnp.float32)

    qn = headnorm(q, qgt_ref).astype(dt)
    kn = headnorm(k, kgt_ref).astype(dt)
    v = v.astype(dt)

    ri = jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 1)
    allowed = jnp.logical_and(ri // T == ci // T, ri % T >= ci % T)

    outs = []
    for h_i in range(H):
        sl = slice(h_i * hd, (h_i + 1) * hd)
        sc = jax.lax.dot_general(qn[:, sl], kn[:, sl],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        sc = jnp.where(allowed, sc, -1e30)
        a = jax.nn.softmax(sc, axis=1).astype(dt)
        outs.append(jnp.dot(a, v[:, sl], preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=1)                    # [TM, D] f32

    oq, os_ = _qrows(o)
    y = jax.lax.dot_general(oq, wout_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (os_ * sout_ref[0][None, :])
    out_ref[:] = (x32 + y).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_samples", "interpret",
                                             "ln_eps", "qk_eps"))
def fused_attn_block_q8(x: jax.Array, c: jax.Array, ln_g: jax.Array,
                        qa, q_g: jax.Array, k_g: jax.Array, *,
                        block_samples: int = 16, ln_eps: float = 1e-6,
                        qk_eps: float = 1e-6,
                        interpret: bool = False) -> jax.Array:
    """int8-projection variant of fused_attn_block; ``qa`` is
    ops.quant.QuantizedAttn."""
    B, T, D = x.shape
    hd = q_g.shape[-1]
    H = D // hd

    xf, cf, Bp, N, TM = _block_layout(x, c, block_samples)
    qgt = jnp.tile(q_g.astype(jnp.float32), H)[None, :]
    kgt = jnp.tile(k_g.astype(jnp.float32), H)[None, :]

    c_spec = (pl.BlockSpec((1, D), lambda i: (0, 0)) if cf.shape[0] == 1
              else pl.BlockSpec((TM, D), lambda i: (i, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_q8, T=T, H=H, hd=hd, eps_ln=ln_eps,
                          eps_qk=qk_eps, scale=float(1.0 / np.sqrt(hd))),
        grid=(N // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0)),
            c_spec,
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * (4 * D) + 2 * N * TM * D * 2,
            bytes_accessed=4 * D * D + N * D * 2 * x.dtype.itemsize,
            transcendentals=N * TM * H,
        ),
    )(xf, cf, ln_g[None, :], qa.wqkv_q, qa.wqkv_s[None, :],
      qa.bqkv[None, :], qgt, kgt, qa.wout_q, qa.wout_s[None, :])
    return out.reshape(Bp, T, D)[:B]
