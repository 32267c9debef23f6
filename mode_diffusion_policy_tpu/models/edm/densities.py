"""Training-time sigma sample densities.

Parity: /root/reference/mode/models/edm_diffusion/utils.py:154-203 and the
dispatch in mode_agent.py:692-731. All samplers take an explicit JAX PRNG key
(functional replacement for torch's global RNG).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def rand_log_normal(key, shape, loc=0.0, scale=1.0, dtype=jnp.float32):
    return jnp.exp(jax.random.normal(key, shape, dtype) * scale + loc)


def rand_log_logistic(key, shape, loc=0.0, scale=1.0, min_value=0.0,
                      max_value=float("inf"), dtype=jnp.float32):
    """Truncated log-logistic (the MoDE default density, utils.py:159-166).
    The CDF bounds are static scalars, computed host-side in float64."""
    def _cdf(v):
        return 1.0 / (1.0 + math.exp(-(math.log(v) - loc) / scale))
    min_cdf = jnp.float32(_cdf(min_value) if min_value > 0 else 0.0)
    max_cdf = jnp.float32(_cdf(max_value) if math.isfinite(max_value) else 1.0)
    u = jax.random.uniform(key, shape, jnp.float32) * (max_cdf - min_cdf) + min_cdf
    return jnp.exp(jax.scipy.special.logit(u) * scale + loc).astype(dtype)


def rand_log_uniform(key, shape, min_value, max_value, dtype=jnp.float32):
    lo, hi = math.log(min_value), math.log(max_value)
    return jnp.exp(jax.random.uniform(key, shape, dtype) * (hi - lo) + lo)


def rand_uniform(key, shape, min_value, max_value, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype) * (max_value - min_value) + min_value


def rand_v_diffusion(key, shape, sigma_data=1.0, min_value=0.0,
                     max_value=float("inf"), dtype=jnp.float32):
    min_cdf = math.atan(min_value / sigma_data) * 2 / math.pi
    max_cdf = math.atan(max_value / sigma_data) * 2 / math.pi if math.isfinite(max_value) else 1.0
    u = jax.random.uniform(key, shape, dtype) * (max_cdf - min_cdf) + min_cdf
    return jnp.tan(u * math.pi / 2) * sigma_data


def rand_split_log_normal(key, shape, loc, scale_1, scale_2, dtype=jnp.float32):
    kn, ku = jax.random.split(key)
    n = jnp.abs(jax.random.normal(kn, shape, dtype))
    u = jax.random.uniform(ku, shape, dtype)
    n_left = n * -scale_1 + loc
    n_right = n * scale_2 + loc
    ratio = scale_1 / (scale_1 + scale_2)
    return jnp.exp(jnp.where(u < ratio, n_left, n_right))


def rand_discrete(key, shape, values: Sequence[float], dtype=jnp.float32):
    values = jnp.asarray(np.asarray(values), dtype)
    idx = jax.random.randint(key, shape, 0, len(values))
    return values[idx]


SIGMA_DENSITIES = ("lognormal", "loglogistic", "loguniform", "uniform",
                   "v-diffusion", "discrete", "split-lognormal")


def make_sample_density(density_type: str, *, sigma_data: float = 0.5,
                        sigma_min: float = 0.001, sigma_max: float = 80.0,
                        num_sampling_steps: int = 10,
                        **kw) -> Callable:
    """Return fn(key, shape) -> sigmas, matching mode_agent.py:692-731
    defaults (loglogistic: loc=log(sigma_data), scale=0.5, truncated to
    [sigma_min, sigma_max])."""
    if density_type == "lognormal":
        return lambda key, shape: rand_log_normal(
            key, shape, loc=kw.get("loc", 0.0), scale=kw.get("scale", 1.0))
    if density_type == "loglogistic":
        return lambda key, shape: rand_log_logistic(
            key, shape, loc=kw.get("loc", math.log(sigma_data)),
            scale=kw.get("scale", 0.5),
            min_value=kw.get("min_value", sigma_min),
            max_value=kw.get("max_value", sigma_max))
    if density_type == "loguniform":
        return lambda key, shape: rand_log_uniform(key, shape, sigma_min, sigma_max)
    if density_type == "uniform":
        return lambda key, shape: rand_uniform(key, shape, sigma_min, sigma_max)
    if density_type == "v-diffusion":
        return lambda key, shape: rand_v_diffusion(
            key, shape, sigma_data=sigma_data, min_value=sigma_min, max_value=sigma_max)
    if density_type == "discrete":
        from .schedules import get_sigmas_exponential
        sigmas = get_sigmas_exponential(int(num_sampling_steps * 1e5), sigma_min, sigma_max)
        return lambda key, shape: rand_discrete(key, shape, sigmas)
    if density_type == "split-lognormal":
        return lambda key, shape: rand_split_log_normal(
            key, shape, kw["loc"], kw["scale_1"], kw["scale_2"])
    raise ValueError(f"Unknown sample density type: {density_type}")
