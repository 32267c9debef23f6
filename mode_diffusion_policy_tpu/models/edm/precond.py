"""Karras/EDM preconditioning as pure functions.

Behavioral parity: reference GCDenoiser
(/root/reference/mode/models/edm_diffusion/score_wrappers.py:31-80). Instead of
wrapping the denoiser in an nn.Module, the scalings are free functions applied
around any ``inner_apply(states, scaled_actions, goal, sigma) -> pred`` —
jit/scan-friendly and trivially shardable.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ...ops.primitives import append_dims


def edm_scalings(sigma: jax.Array, sigma_data: float = 0.5
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """c_skip, c_out, c_in (score_wrappers.py:31-43)."""
    sd2 = sigma_data ** 2
    c_skip = sd2 / (sigma ** 2 + sd2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma ** 2 + sd2)
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + sd2)
    return c_skip, c_out, c_in


def denoiser_forward(inner_apply: Callable, states, action: jax.Array,
                     goal: jax.Array, sigma: jax.Array, *,
                     sigma_data: float = 0.5, **kwargs) -> jax.Array:
    """D(x, sigma) = inner(c_in * x, sigma) * c_out + x * c_skip
    (score_wrappers.py:65-80). ``sigma``: [B]."""
    c_skip, c_out, c_in = [append_dims(c, action.ndim)
                           for c in edm_scalings(sigma, sigma_data)]
    model_out = inner_apply(states, action * c_in, goal, sigma, **kwargs)
    return model_out * c_out + action * c_skip


def denoiser_loss(inner_apply: Callable, states, action: jax.Array,
                  goal: jax.Array, noise: jax.Array, sigma: jax.Array, *,
                  sigma_data: float = 0.5, **kwargs):
    """EDM score-matching loss (score_wrappers.py:45-63). Returns
    (scalar mse, model_output)."""
    c_skip, c_out, c_in = [append_dims(c, action.ndim)
                           for c in edm_scalings(sigma, sigma_data)]
    noised = action + noise * append_dims(sigma, action.ndim)
    model_out = inner_apply(states, noised * c_in, goal, sigma, **kwargs)
    target = (action - c_skip * noised) / c_out
    loss = jnp.mean((model_out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return loss, model_out
