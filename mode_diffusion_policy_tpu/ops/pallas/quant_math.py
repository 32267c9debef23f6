"""Shared in-kernel helpers for the int8 pallas kernels.

Per-row symmetric int8 activation quantization (reciprocal multiply — VPU
divides are multi-op and this runs serialized between MXU dots) and the
int8 x int8 -> int32 MXU dot. One definition so the attention, MoE, and
whole-layer kernels stay bit-comparable by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quant_rows(x):
    """[N, D] f32 -> (int8 [N, D], f32 [N, 1] per-row scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-6) / 127.0
    q = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def dot_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
