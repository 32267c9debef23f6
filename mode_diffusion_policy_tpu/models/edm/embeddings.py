"""Time/sigma embedding modules the reference ships but does not use in the
final model (mode/models/edm_diffusion/utils.py:22-143; MoDeDiT uses the
Linear sigma path instead, modedit.py:680-681). Provided for API parity and
for experimenting with alternative noise conditioners."""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class GaussianFourierProjection(nn.Module):
    """Random-feature time encoding (utils.py:22-32); weights fixed."""

    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, x):
        W = self.param("W", lambda key, shape: jax.random.normal(key, shape)
                       * self.scale, (self.embed_dim // 2,))
        W = jax.lax.stop_gradient(W)
        proj = x[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class FourierFeatures(nn.Module):
    """utils.py:35-47."""

    embed_dim: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x):
        if x.ndim == 1:
            x = x[:, None]
        W = self.param("weight", lambda key, shape:
                       jax.random.normal(key, shape) * self.std,
                       (self.embed_dim // 2, x.shape[-1]))
        f = 2 * jnp.pi * x @ W.T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


def sinusoidal_pos_emb(x, dim: int):
    """utils.py:103-115."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = jnp.exp(jnp.arange(half) * -emb)
    emb = x[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class SinusoidalPosEmbedding(nn.Module):
    """Sinusoidal embedding + MLP head (utils.py:66-79)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t):
        h = sinusoidal_pos_emb(t, self.embed_dim)
        h = nn.Dense(self.embed_dim * 2)(h)
        h = h * jnp.tanh(jax.nn.softplus(h))  # Mish
        return nn.Dense(self.embed_dim)(h)


class GaussianFourierEmbedding(nn.Module):
    """GaussianFourierProjection + MLP head (utils.py:50-63)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t):
        h = GaussianFourierProjection(self.embed_dim)(t)
        h = nn.Dense(self.embed_dim * 2)(h)
        h = h * jnp.tanh(jax.nn.softplus(h))
        return nn.Dense(self.embed_dim)(h)
