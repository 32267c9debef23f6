"""Pallas TPU kernel: one ENTIRE NoiseBlockMoE layer per launch.

Round-5 follow-up to the sigma-table work: eliminating the per-step XLA
gather ops was measured NEUTRAL at b=128 (74.0 vs 73.7 ms/chunk) — the
~7 ms of non-kernel time in the denoise scan is dominated by the 240
pallas_call launches per chunk (12 attn + 12 MoE kernels x 10 steps), each
paying grid setup + an HBM round trip of the [B*T, D] activation between
the attention and MoE kernels. This kernel fuses the full inference layer

    x_mid = x + c_proj(attn(qk_norm(split(wqkv(rmsnorm(x)*g1 + c)))))
    out   = x_mid + moe_top2(rmsnorm(x_mid)*g2)        (int8 x int8 experts)

into ONE launch (120 per chunk): the attention sub-block runs once per
token block on the (e=0, k=0) grid visit and parks ``x_mid`` in a VMEM
scratch that the 2 x n_h MoE revisits consume — the inter-block activation
never touches HBM, and half the launch/barrier overhead is gone.

Routing rides the sigma-table scalar-prefetch path (idx/probs [S,2] +
traced step), so the whole denoise step is 12 launches + the head.

Reference behavior being fused: NoiseBlockMoE.forward
(/root/reference/mode/models/networks/modedit.py:530-572) with the
precomputed fused-expert inference path (modedit.py:541-546).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .moe_kernel import _norm_tables
from .quant_math import dot_i8 as _dot_i8
from .quant_math import quant_rows as _qrows


def _rmsnorm_rows(x32, g_ref, eps):
    D = x32.shape[1]
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=1, keepdims=True)) * (D ** -0.5)
    return x32 / jnp.maximum(norm, eps) * g_ref[0].astype(jnp.float32)


def _kernel(idx_ref, probs_ref, step_ref,
            # attention operands (wqkv/wout are int8 when int8_attn, with
            # the per-output-channel scale rows sqkv/sout; bf16 otherwise,
            # scales passed as ignored dummies)
            x_ref, c_ref, lng1_ref, wqkv_ref, sqkv_ref, bqkv_ref, qgt_ref,
            kgt_ref, wout_ref, sout_ref,
            # MoE operands (int8 weights + scales)
            lng2_ref, w1v_ref, w1g_ref, s1v_ref, s1g_ref, b1v_ref, b1g_ref,
            w2_ref, s2_ref,
            out_ref, acc_ref, xq_ref, sx_ref, *,
            T, H, hd, n_h, eps1, eps_qk, eps2, scale, int8_attn=False):
    e = pl.program_id(1)
    k = pl.program_id(2)
    D = H * hd
    TM = x_ref.shape[0]
    dt = x_ref.dtype

    # ---- attention sub-block, once per token block --------------------
    @pl.when(jnp.logical_and(e == 0, k == 0))
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        h = _rmsnorm_rows(x32, lng1_ref, eps1)
        c = c_ref[0] if c_ref.shape[0] == 1 else c_ref[:]
        if int8_attn:
            # per-row dynamic activation quant + int8 MXU dot, exactly the
            # attn_kernel._kernel_q8 math (the per-head QK-RMSNorm divides
            # the q/k scale error back out)
            h32 = h + c.astype(jnp.float32)
            hq, hs = _qrows(h32)
            qkv = _dot_i8(hq, wqkv_ref[:]).astype(jnp.float32) \
                * (hs * sqkv_ref[0][None, :]) \
                + bqkv_ref[0].astype(jnp.float32)
        else:
            h = (h + c.astype(jnp.float32)).astype(dt)
            qkv = jnp.dot(h, wqkv_ref[:].astype(dt),
                          preferred_element_type=jnp.float32)
            qkv = qkv + bqkv_ref[0].astype(jnp.float32)
        q, kk, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

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
        kn = headnorm(kk, kgt_ref).astype(dt)
        v = v.astype(dt)

        ri = jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 1)
        allowed = jnp.logical_and(ri // T == ci // T, ri % T >= ci % T)

        outs = []
        for h_i in range(H):
            sl = slice(h_i * hd, (h_i + 1) * hd)
            sc = jax.lax.dot_general(qn[:, sl], kn[:, sl],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                * scale
            sc = jnp.where(allowed, sc, -1e30)
            a = jax.nn.softmax(sc, axis=1).astype(dt)
            outs.append(jnp.dot(a, v[:, sl],
                                preferred_element_type=jnp.float32))
        if int8_attn:
            o = jnp.concatenate(outs, axis=1)            # [TM, D] f32
            oq, os_ = _qrows(o)
            y = _dot_i8(oq, wout_ref[:]).astype(jnp.float32) \
                * (os_ * sout_ref[0][None, :])
        else:
            o = jnp.concatenate(outs, axis=1).astype(dt)
            y = jnp.dot(o, wout_ref[:].astype(dt),
                        preferred_element_type=jnp.float32)
        xmid32 = x32 + y
        # seed the MoE accumulator with ln_2(x_mid): the reference block
        # REPLACES x with its norm before the MoE residual
        # (x = ln_2(x); x = x + moe(x) — the norm-replaces-residual quirk,
        # matching moe_kernel's residual+ln_g semantics). Cast through dt
        # first: the two-kernel path's MoE reads x_mid from HBM in dt.
        # The normalized row is ALSO the MoE input: quantize it once here
        # and park int8 rows + per-row scales in scratch — recomputing
        # rmsnorm+quant on all 2*n_h MoE revisits was ~60 us/layer-step of
        # redundant VPU work at the flagship shape (round-5 trace).
        xm0 = xmid32.astype(dt).astype(jnp.float32)
        xm_dt = _rmsnorm_rows(xm0, lng2_ref, eps2).astype(dt)
        acc_ref[:] = xm_dt.astype(jnp.float32)
        xq0, sx0 = _qrows(xm_dt.astype(jnp.float32))
        xq_ref[:] = xq0
        sx_ref[:] = jnp.broadcast_to(sx0, sx_ref.shape)

    # ---- MoE (int8 x int8), 2 experts x n_h hidden blocks -------------
    xq, sx = xq_ref[:], sx_ref[:, 0:1]
    value = _dot_i8(xq, w1v_ref[0]).astype(jnp.float32)
    value = value * (sx * s1v_ref[0, 0][None, :]) \
        + b1v_ref[0, 0].astype(jnp.float32)
    gate = _dot_i8(xq, w1g_ref[0]).astype(jnp.float32)
    gate = gate * (sx * s1g_ref[0, 0][None, :]) \
        + b1g_ref[0, 0].astype(jnp.float32)
    act = value * jax.nn.silu(gate)
    aq, sa = _qrows(act)
    contrib = _dot_i8(aq, w2_ref[0]).astype(jnp.float32)
    contrib = contrib * (sa * s2_ref[0, 0][None, :])
    acc_ref[:] += probs_ref[step_ref[0], e].astype(jnp.float32) * contrib

    @pl.when(jnp.logical_and(e == 1, k == n_h - 1))
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "block_samples", "block_hidden", "interpret", "eps1", "eps_qk", "eps2"))
def fused_layer_q8c(x: jax.Array, c: jax.Array,
                    ln1_g: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                    q_g: jax.Array, k_g: jax.Array, wout: jax.Array,
                    ln2_g: jax.Array, qexp, top2_idx: jax.Array,
                    top2_probs: jax.Array, *, step: jax.Array = None,
                    qattn=None,
                    # round-5 flagship sweeps (R5_MEASURE.log r5j/r5k):
                    # micro 32-sample blocks measured 422 vs 431 us at 16
                    # (8: 651, 64: 794; block_hidden 512/2048/4096 all
                    # worse) but e2e 32 was SLOWER (70.2 ms vs 68.1-68.6),
                    # so the default stays at the e2e-validated 16
                    block_samples: int = 16, block_hidden: int = 1024,
                    eps1: float = 1e-6, eps_qk: float = 1e-6,
                    eps2: float = 1e-6,
                    interpret: bool = False) -> jax.Array:
    """One full NoiseBlockMoE inference layer in a single pallas launch.

    x [B,T,D]; c the cond/sigma token ([1,1,D] shared row or [B,1|T,D]);
    ln1_g/ln2_g [D] RMSNorm scales; wqkv [D,3D] (+bias), q_g/k_g [hd]
    per-head QK-norm scales, wout [D,D]; ``qexp`` an ops.quant.
    QuantizedExperts; top2_idx/probs the per-sigma routing tables ([S,2] or
    single rows [2]) with a traced ``step`` row selector.
    ``qattn`` (an ops.quant.QuantizedAttn) switches the attention
    projections to int8 MXU dots with per-row activation quant — the
    max-throughput preset; wqkv/bqkv/wout are then ignored (pass None).
    Returns x + attn_block(x) + moe(ln2(x + attn_block(x))) in x.dtype."""
    from .attn_kernel import _block_layout

    if qattn is not None:
        wqkv, bqkv, wout = qattn.wqkv_q, qattn.bqkv, qattn.wout_q
        sqkv, sout = qattn.wqkv_s, qattn.wout_s
    else:
        sqkv = jnp.zeros((3 * x.shape[-1],), jnp.float32)
        sout = jnp.zeros((x.shape[-1],), jnp.float32)

    B, T, D = x.shape
    hd = q_g.shape[-1]
    H = D // hd
    E, _, H2 = qexp.w1_q.shape
    HH = H2 // 2
    TH = min(block_hidden, HH)
    assert HH % TH == 0, (HH, TH)
    n_h = HH // TH

    xf, cf, Bp, N, TM = _block_layout(x, c, block_samples)
    qgt = jnp.tile(q_g.astype(jnp.float32), H)[None, :]
    kgt = jnp.tile(k_g.astype(jnp.float32), H)[None, :]
    c_shared = cf.shape[0] == 1

    def cix(i, e, k, idx, probs, st):
        return (0, 0) if c_shared else (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # idx table, probs table, step
        grid=(N // TM, 2, n_h),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i, e, k, idx, probs, st: (i, 0)),
            pl.BlockSpec((1, D) if c_shared else (TM, D), cix),
            pl.BlockSpec((1, D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((D, 3 * D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((1, D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((1, D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((D, D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((1, D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((1, D), lambda i, e, k, idx, probs, st: (0, 0)),
            pl.BlockSpec((1, D, TH),
                         lambda i, e, k, idx, probs, st: (idx[st[0], e], 0, k)),
            pl.BlockSpec((1, D, TH),
                         lambda i, e, k, idx, probs, st:
                         (idx[st[0], e], 0, n_h + k)),
            pl.BlockSpec((1, 1, TH),
                         lambda i, e, k, idx, probs, st: (idx[st[0], e], 0, k)),
            pl.BlockSpec((1, 1, TH),
                         lambda i, e, k, idx, probs, st:
                         (idx[st[0], e], 0, n_h + k)),
            pl.BlockSpec((1, 1, TH),
                         lambda i, e, k, idx, probs, st: (idx[st[0], e], 0, k)),
            pl.BlockSpec((1, 1, TH),
                         lambda i, e, k, idx, probs, st:
                         (idx[st[0], e], 0, n_h + k)),
            pl.BlockSpec((1, TH, D),
                         lambda i, e, k, idx, probs, st: (idx[st[0], e], k, 0)),
            pl.BlockSpec((1, 1, D),
                         lambda i, e, k, idx, probs, st: (idx[st[0], e], 0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, D),
                               lambda i, e, k, idx, probs, st: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TM, D), jnp.float32),   # accumulator
                        pltpu.VMEM((TM, D), jnp.int8),      # quantized rows
                        pltpu.VMEM((TM, 128), jnp.float32)],  # row scales
    )
    out_call = pl.pallas_call(
        functools.partial(_kernel, T=T, H=H, hd=hd, n_h=n_h, eps1=eps1,
                          eps_qk=eps_qk, eps2=eps2,
                          scale=float(1.0 / np.sqrt(hd)),
                          int8_attn=qattn is not None),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * (4 * D) + 2 * N * TM * D * 2
            + 2 * N * D * (3 * HH),
            bytes_accessed=4 * D * D * wqkv.dtype.itemsize
            + 2 * (D * H2 + HH * D)
            + N * D * 2 * x.dtype.itemsize,
            transcendentals=N * TM * H + N * HH * 2,
        ),
    )
    idx_t, probs_t, step_t = _norm_tables(top2_idx, top2_probs, step)
    out = out_call(idx_t, probs_t, step_t,
                   xf, cf, ln1_g.astype(jnp.float32)[None, :], wqkv,
                   sqkv[None, :], bqkv[None, :], qgt, kgt, wout,
                   sout[None, :],
                   ln2_g.astype(jnp.float32)[None, :],
                   qexp.w1_q, qexp.w1_q, qexp.w1_s[:, None, :],
                   qexp.w1_s[:, None, :], qexp.b1[:, None, :],
                   qexp.b1[:, None, :], qexp.w2_q, qexp.w2_s[:, None, :])
    return out.reshape(Bp, T, D)[:B]


# ---------------------------------------------------------------------------
# The DiT megakernel: ALL L layers in one launch.
#
# Grid (L, 2, n_h, n_tok) with the token-block axis INNERMOST so each
# weight block DMAs once per (l, e, k) and streams while the previous
# block computes. The full activation lives in VMEM scratch across the
# whole launch ([Np, D] is 3.7 MB at the flagship b=128 shape) — between
# layers nothing touches HBM. Per denoise step the entire 12-layer DiT is
# ONE pallas launch; the 10-step chunk is 10 launches + the head/embed
# glue, versus 240 launches for the two-kernel path.
# ---------------------------------------------------------------------------


def _mega_kernel(idx_ref, probs_ref, step_ref,
                 x_ref, c_ref, ln1_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                 qgt_ref, kgt_ref, wout_ref, sout_ref, ln2_ref, w1v_ref,
                 w1g_ref, s1v_ref, s1g_ref, b1v_ref, b1g_ref, w2_ref, s2_ref,
                 out_ref, xcur_ref, acc_ref, xq_ref, sx_ref, *,
                 T, H, hd, n_h, n_layers, TM, eps1, eps_qk, eps2, scale,
                 int8_attn=False):
    lyr = pl.program_id(0)
    e = pl.program_id(1)
    k = pl.program_id(2)
    i = pl.program_id(3)
    D = H * hd
    dt = x_ref.dtype
    sl = pl.ds(i * TM, TM)

    # ---- attention sub-block for token block i, once per layer ---------
    @pl.when(jnp.logical_and(e == 0, k == 0))
    def _():
        @pl.when(lyr == 0)
        def _():
            xcur_ref[sl, :] = x_ref[sl, :]
        x32 = xcur_ref[sl, :].astype(jnp.float32)
        h = _rmsnorm_rows(x32, ln1_ref[0], eps1)
        c = c_ref[0] if c_ref.shape[0] == 1 else c_ref[sl, :]
        if int8_attn:
            h32 = h + c.astype(jnp.float32)
            hq, hs = _qrows(h32)
            qkv = _dot_i8(hq, wqkv_ref[0]).astype(jnp.float32) \
                * (hs * sqkv_ref[0, 0][None, :]) \
                + bqkv_ref[0, 0].astype(jnp.float32)
        else:
            h = (h + c.astype(jnp.float32)).astype(dt)
            qkv = jnp.dot(h, wqkv_ref[0].astype(dt),
                          preferred_element_type=jnp.float32)
            qkv = qkv + bqkv_ref[0, 0].astype(jnp.float32)
        q, kk, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

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
        kn = headnorm(kk, kgt_ref).astype(dt)
        v = v.astype(dt)

        ri = jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 1)
        allowed = jnp.logical_and(ri // T == ci // T, ri % T >= ci % T)

        outs = []
        for h_i in range(H):
            hsl = slice(h_i * hd, (h_i + 1) * hd)
            sc = jax.lax.dot_general(qn[:, hsl], kn[:, hsl],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                * scale
            sc = jnp.where(allowed, sc, -1e30)
            a = jax.nn.softmax(sc, axis=1).astype(dt)
            outs.append(jnp.dot(a, v[:, hsl],
                                preferred_element_type=jnp.float32))
        if int8_attn:
            o = jnp.concatenate(outs, axis=1)            # f32
            oq, os_ = _qrows(o)
            y = _dot_i8(oq, wout_ref[0]).astype(jnp.float32) \
                * (os_ * sout_ref[0, 0][None, :])
        else:
            o = jnp.concatenate(outs, axis=1).astype(dt)
            y = jnp.dot(o, wout_ref[0].astype(dt),
                        preferred_element_type=jnp.float32)
        xmid32 = x32 + y
        # ln_2(x_mid) seeds the accumulator (norm-replaces-residual quirk),
        # cast through dt to match the per-layer kernels bit-for-bit; the
        # normalized row is also quantized ONCE here for all 2*n_h MoE
        # revisits (same redundancy fix as _kernel)
        xm0 = xmid32.astype(dt).astype(jnp.float32)
        xm_dt = _rmsnorm_rows(xm0, ln2_ref[0], eps2).astype(dt)
        acc_ref[sl, :] = xm_dt.astype(jnp.float32)
        xq0, sx0 = _qrows(xm_dt.astype(jnp.float32))
        xq_ref[sl, :] = xq0
        sx_ref[sl, :] = jnp.broadcast_to(sx0, (TM, sx_ref.shape[1]))

    # ---- MoE (int8 x int8) -------------------------------------------
    xq, sx = xq_ref[sl, :], sx_ref[sl, 0:1]
    value = _dot_i8(xq, w1v_ref[0, 0]).astype(jnp.float32)
    value = value * (sx * s1v_ref[0, 0, 0][None, :]) \
        + b1v_ref[0, 0, 0].astype(jnp.float32)
    gate = _dot_i8(xq, w1g_ref[0, 0]).astype(jnp.float32)
    gate = gate * (sx * s1g_ref[0, 0, 0][None, :]) \
        + b1g_ref[0, 0, 0].astype(jnp.float32)
    act = value * jax.nn.silu(gate)
    aq, sa = _qrows(act)
    contrib = _dot_i8(aq, w2_ref[0, 0]).astype(jnp.float32)
    contrib = contrib * (sa * s2_ref[0, 0, 0][None, :])
    acc_ref[sl, :] += probs_ref[lyr, step_ref[0], e].astype(jnp.float32) \
        * contrib

    # ---- layer epilogue: write back / final output --------------------
    @pl.when(jnp.logical_and(e == 1, k == n_h - 1))
    def _():
        res = acc_ref[sl, :].astype(dt)
        xcur_ref[sl, :] = res

        @pl.when(lyr == n_layers - 1)
        def _():
            out_ref[sl, :] = res


@functools.partial(jax.jit, static_argnames=(
    "block_samples", "block_hidden", "interpret", "eps1", "eps_qk", "eps2"))
def fused_dit_q8c(x: jax.Array, c: jax.Array, stacked, top2_idx: jax.Array,
                  top2_probs: jax.Array, *, step: jax.Array = None,
                  block_samples: int = 16, block_hidden: int = 1024,
                  eps1: float = 1e-6, eps_qk: float = 1e-6,
                  eps2: float = 1e-6, interpret: bool = False) -> jax.Array:
    """All L NoiseBlockMoE layers in ONE pallas launch.

    ``stacked`` is the dict produced by ``MoDeDiT.stack_layers``: per-layer
    leaves stacked on a leading L axis — ln1 [L,D], wqkv [L,D,3D],
    bqkv [L,3D], q_g/k_g [L,hd], wout [L,D,D], ln2 [L,D], and the int8
    experts w1_q [L,E,D,2H], w1_s [L,E,2H], b1 [L,E,2H], w2_q [L,E,H,D],
    w2_s [L,E,D]. ``top2_idx/probs`` are the per-layer sigma tables
    [L,S,2] (or [L,2] single rows) with a traced ``step`` selector.

    When ``stacked`` carries int8 attention projections (keys "sqkv"/"sout"
    with int8 "wqkv"/"wout" — stack_layers under use_int8_attn), the
    projections run as int8 MXU dots: the b=1 chunk is weight-DMA-bound
    and the attention weights shrink 4x."""
    from .attn_kernel import _block_layout

    int8_attn = "sqkv" in stacked
    B, T, D = x.shape
    hd = stacked["q_g"].shape[-1]
    H = D // hd
    L = stacked["wqkv"].shape[0]
    H2 = stacked["w1_q"].shape[-1]
    HH = H2 // 2
    TH = min(block_hidden, HH)
    assert HH % TH == 0, (HH, TH)
    n_h = HH // TH

    xf, cf, Bp, N, TM = _block_layout(x, c, block_samples)
    n_tok = N // TM
    qgt = jnp.tile(stacked["q_g"].astype(jnp.float32), (1, H))[:, None, :]
    kgt = jnp.tile(stacked["k_g"].astype(jnp.float32), (1, H))[:, None, :]
    c_shared = cf.shape[0] == 1

    idx = jnp.asarray(top2_idx, jnp.int32)
    probs = jnp.asarray(top2_probs, jnp.float32)
    if idx.ndim == 2:    # [L,2] single rows -> [L,1,2] tables
        idx, probs = idx[:, None, :], probs[:, None, :]
    step_t = (jnp.zeros((1,), jnp.int32) if step is None
              else jnp.asarray(step, jnp.int32).reshape((1,)))

    def cix(l, e, k, i, idx, probs, st):
        # the cond block is fully resident either way ([1,D] shared row or
        # the whole [N,D]); no per-grid-step indexing
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L, 2, n_h, n_tok),
        in_specs=[
            # full activation + cond resident for the whole launch
            pl.BlockSpec((N, D), lambda l, e, k, i, idx, probs, st: (0, 0)),
            pl.BlockSpec((1, D) if c_shared else (N, D), cix),
            pl.BlockSpec((1, 1, D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, D, 3 * D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, 1, 3 * D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, 1, 3 * D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, 1, D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, 1, D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, D, D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, 1, D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, 1, D),
                         lambda l, e, k, i, idx, probs, st: (l, 0, 0)),
            pl.BlockSpec((1, 1, D, TH),
                         lambda l, e, k, i, idx, probs, st:
                         (l, idx[l, st[0], e], 0, k)),
            pl.BlockSpec((1, 1, D, TH),
                         lambda l, e, k, i, idx, probs, st:
                         (l, idx[l, st[0], e], 0, n_h + k)),
            pl.BlockSpec((1, 1, 1, TH),
                         lambda l, e, k, i, idx, probs, st:
                         (l, idx[l, st[0], e], 0, k)),
            pl.BlockSpec((1, 1, 1, TH),
                         lambda l, e, k, i, idx, probs, st:
                         (l, idx[l, st[0], e], 0, n_h + k)),
            pl.BlockSpec((1, 1, 1, TH),
                         lambda l, e, k, i, idx, probs, st:
                         (l, idx[l, st[0], e], 0, k)),
            pl.BlockSpec((1, 1, 1, TH),
                         lambda l, e, k, i, idx, probs, st:
                         (l, idx[l, st[0], e], 0, n_h + k)),
            pl.BlockSpec((1, 1, TH, D),
                         lambda l, e, k, i, idx, probs, st:
                         (l, idx[l, st[0], e], k, 0)),
            pl.BlockSpec((1, 1, 1, D),
                         lambda l, e, k, i, idx, probs, st:
                         (l, idx[l, st[0], e], 0, 0)),
        ],
        out_specs=pl.BlockSpec((N, D),
                               lambda l, e, k, i, idx, probs, st: (0, 0)),
        scratch_shapes=[pltpu.VMEM((N, D), x.dtype),       # x_cur
                        pltpu.VMEM((N, D), jnp.float32),   # accumulator
                        pltpu.VMEM((N, D), jnp.int8),      # quantized rows
                        pltpu.VMEM((N, 128), jnp.float32)],  # row scales
    )
    out_call = pl.pallas_call(
        functools.partial(_mega_kernel, T=T, H=H, hd=hd, n_h=n_h,
                          n_layers=L, TM=TM, eps1=eps1, eps_qk=eps_qk,
                          eps2=eps2, scale=float(1.0 / np.sqrt(hd)),
                          int8_attn=int8_attn),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=L * (2 * N * D * (4 * D) + 2 * N * TM * D * 2
                       + 2 * N * D * (3 * HH)),
            bytes_accessed=L * (4 * D * D
                                * stacked["wqkv"].dtype.itemsize
                                + 2 * (D * H2 + HH * D))
            + N * D * 2 * x.dtype.itemsize,
            transcendentals=L * (N * TM * H + N * HH * 2),
        ),
    )
    bq = stacked["bqkv"][:, None, :]
    L_ = stacked["wqkv"].shape[0]
    sqkv = (stacked["sqkv"] if int8_attn
            else jnp.zeros((L_, 3 * D), jnp.float32))[:, None, :]
    sout = (stacked["sout"] if int8_attn
            else jnp.zeros((L_, D), jnp.float32))[:, None, :]
    out = out_call(idx, probs, step_t,
                   xf, cf, stacked["ln1"].astype(jnp.float32)[:, None, :],
                   stacked["wqkv"],
                   sqkv, bq, qgt, kgt, stacked["wout"], sout,
                   stacked["ln2"].astype(jnp.float32)[:, None, :],
                   stacked["w1_q"], stacked["w1_q"],
                   stacked["w1_s"][:, :, None, :], stacked["w1_s"][:, :, None, :],
                   stacked["b1"][:, :, None, :], stacked["b1"][:, :, None, :],
                   stacked["w2_q"], stacked["w2_s"][:, :, None, :])
    return out.reshape(Bp, T, D)[:B]
