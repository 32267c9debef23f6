"""Grouped mixture-of-experts FFN compute for TPU.

The reference executes experts as a Python loop over 4 ``nn.Module``s with
boolean-mask scatter-adds (modedit.py:560-572). On TPU we instead keep the
expert weights *stacked* along a leading expert axis and evaluate the MoE as
dense grouped einsums weighted by the (top-k-masked, renormalized) router
probabilities. Because non-selected experts carry probability exactly 0, the
result is bit-for-bit the same weighted sum — but it is static-shaped, fully
MXU-tileable, and the expert axis is trivially shardable over a mesh axis
("expert parallelism" falls out of a sharding annotation instead of
all-to-alls).

Weight layout (E experts, model dim D, hidden H = 4*D):
    w1 : [E, D, 2H]   (SwishGLU projection; columns [:H] = value, [H:] = gate)
    b1 : [E, 2H]
    w2 : [E, H, D]    (no bias, matching reference Mlp bias=False)

A Pallas kernel for the σ-indexed top-2 "fused expert" inference path lives in
``ops/pallas/moe_kernel.py`` — it reads only the two selected experts' weights
from HBM (speed-of-light traffic at small batch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .primitives import swish_glu


def moe_ffn_dense(
    x: jax.Array,          # [B, T, D]
    router_probs: jax.Array,  # [B, T, E] — zero for non-selected experts
    w1: jax.Array,         # [E, D, 2H]
    b1: jax.Array,         # [E, 2H]
    w2: jax.Array,         # [E, H, D]
    *,
    precision=None,
) -> jax.Array:
    """Evaluate all experts densely and combine with router probabilities.

    Equivalent to the reference's masked expert loop (modedit.py:560-572):
    ``out[b,t] = sum_e probs[b,t,e] * (swishglu(x W1_e + b1_e) W2_e)``.
    """
    h = jnp.einsum("btd,edh->ebth", x, w1, precision=precision)
    h = h + b1[:, None, None, :]
    act = swish_glu(h)
    eo = jnp.einsum("ebth,ehd->ebtd", act, w2, precision=precision)
    out = jnp.einsum("bte,ebtd->btd", router_probs, eo, precision=precision)
    return out


def moe_ffn_topk_grouped(
    x: jax.Array,             # [B, T, D]
    pair_probs: jax.Array,    # [B, T, k] — probability per selected slot
    top_idx: jax.Array,       # [B, T, k] int32 selected expert ids
    w1: jax.Array,            # [E, D, 2H]
    b1: jax.Array,            # [E, 2H]
    w2: jax.Array,            # [E, H, D]
    *,
    act_dropout=None,         # optional fn applied to the SwishGLU activations
) -> jax.Array:
    """Top-k MoE via sort + ``jax.lax.ragged_dot`` — computes ONLY the
    selected experts (k/E of the dense FLOPs) and is exactly the same
    weighted sum as ``moe_ffn_dense`` (non-selected probabilities are zero).

    The TPU-native grouped-GEMM formulation: flatten (token, slot) pairs,
    sort by expert id, run both SwishGLU projections as ragged dots over the
    per-expert contiguous groups, then weight by the router probability and
    scatter-add back per token. Fully differentiable (ragged_dot carries a
    VJP; sort indices are integer). Replaces the reference's Python expert
    loop + masked scatter-add (modedit.py:560-572) on the training path.
    """
    B, T, D = x.shape
    E = w1.shape[0]
    k = top_idx.shape[-1]
    N = B * T
    xf = x.reshape(N, D)
    flat_e = top_idx.reshape(N * k)
    pairs_p = pair_probs.reshape(N * k)
    tok = jnp.repeat(jnp.arange(N), k)

    order = jnp.argsort(flat_e)
    tok_sorted = tok[order]
    xs = jnp.take(xf, tok_sorted, axis=0)                     # [Nk, D]
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    h = jax.lax.ragged_dot(xs, w1, group_sizes)
    h = h + jnp.take(b1, flat_e[order], axis=0)
    act = swish_glu(h)
    if act_dropout is not None:
        act = act_dropout(act)
    eo = jax.lax.ragged_dot(act, w2, group_sizes)             # [Nk, D]
    weighted = eo * pairs_p[order][:, None].astype(eo.dtype)
    out = jnp.zeros((N, D), weighted.dtype).at[tok_sorted].add(weighted)
    return out.reshape(B, T, D)


def moe_ffn_top2_gather(
    x: jax.Array,            # [B, T, D]
    top2_idx: jax.Array,     # [2] int32 — expert ids (identical for all tokens
                             #   at a fixed noise level; see modedit.py:440,331-334)
    top2_probs: jax.Array,   # [2]
    w1: jax.Array,           # [E, D, 2H]
    b1: jax.Array,           # [E, 2H]
    w2: jax.Array,           # [E, H, D]
    *,
    precision=None,
) -> jax.Array:
    """Inference fast path: the cond-only router picks the same two experts for
    every token at a given sigma, so gather just those two experts' weights and
    compute ``p0*E_i0(x) + p1*E_i1(x)`` (the reference's FusedMLPV2 semantics,
    modedit.py:21-68)."""
    w1g = jnp.take(w1, top2_idx, axis=0)   # [2, D, 2H]
    b1g = jnp.take(b1, top2_idx, axis=0)   # [2, 2H]
    w2g = jnp.take(w2, top2_idx, axis=0)   # [2, H, D]
    h = jnp.einsum("btd,edh->ebth", x, w1g, precision=precision) + b1g[:, None, None, :]
    act = swish_glu(h)
    eo = jnp.einsum("ebth,ehd->ebtd", act, w2g, precision=precision)
    return jnp.einsum("e,ebtd->btd", top2_probs, eo, precision=precision)
