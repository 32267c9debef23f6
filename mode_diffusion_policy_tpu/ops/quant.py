"""Weight-only int8 quantization for the MoE expert FFNs.

Single-sample policy latency is bound by streaming the two selected experts'
weights from HBM (~605MB per denoise step at flagship scale); int8 weights
halve that traffic. Quantization is symmetric per output channel, so the
dequantization scale factors out of the matmul:
``x @ (q * s) == (x @ q) * s`` — the kernel multiplies by a row vector after
the MXU dot instead of dequantizing the weight tile.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedExperts(NamedTuple):
    w1_q: jax.Array   # int8 [E, D, 2H]
    w1_s: jax.Array   # f32  [E, 2H]   per-output-channel scales
    b1: jax.Array     # [E, 2H]
    w2_q: jax.Array   # int8 [E, H, D]
    w2_s: jax.Array   # f32  [E, D]


def quantize_per_channel(w: jax.Array, axis: int = -1):
    """Symmetric int8 per-output-channel: returns (q int8, scales f32)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=tuple(
        a for a in range(w.ndim) if a != axis % w.ndim and a != 0),
        keepdims=False)
    # keep the leading expert axis: reduce over all middle axes
    scales = amax / 127.0
    scales = jnp.maximum(scales, 1e-12)
    shape = [1] * w.ndim
    shape[0] = w.shape[0]
    shape[axis % w.ndim] = w.shape[axis % w.ndim]
    q = jnp.clip(jnp.round(w.astype(jnp.float32)
                           / scales.reshape(shape)), -127, 127
                 ).astype(jnp.int8)
    return q, scales


def quantize_experts(w1: jax.Array, b1: jax.Array, w2: jax.Array
                     ) -> QuantizedExperts:
    w1_q, w1_s = quantize_per_channel(w1, axis=-1)
    w2_q, w2_s = quantize_per_channel(w2, axis=-1)
    return QuantizedExperts(w1_q, w1_s.astype(jnp.float32), b1,
                            w2_q, w2_s.astype(jnp.float32))


def dequantize_experts(q: QuantizedExperts):
    """Reference dequantization (for tests / XLA fallback)."""
    w1 = q.w1_q.astype(jnp.float32) * q.w1_s[:, None, :]
    w2 = q.w2_q.astype(jnp.float32) * q.w2_s[:, None, :]
    return w1, q.b1, w2


class QuantizedAttn(NamedTuple):
    """int8 attention projection weights (per-output-channel symmetric)."""

    wqkv_q: jax.Array   # int8 [D, 3D]
    wqkv_s: jax.Array   # f32  [3D]
    bqkv: jax.Array     # f32  [3D]
    wout_q: jax.Array   # int8 [D, D]
    wout_s: jax.Array   # f32  [D]


def quantize_attn(wqkv: jax.Array, bqkv: jax.Array, wout: jax.Array
                  ) -> QuantizedAttn:
    def q(w):
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
        s = jnp.maximum(amax, 1e-12) / 127.0
        return (jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127
                         ).astype(jnp.int8), s)

    wqkv_q, wqkv_s = q(wqkv)
    wout_q, wout_s = q(wout)
    return QuantizedAttn(wqkv_q, wqkv_s, bqkv.astype(jnp.float32),
                         wout_q, wout_s)
