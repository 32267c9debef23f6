"""k-diffusion-style samplers, re-designed as jitted ``lax.scan`` loops.

Parity targets: the 15 samplers of the reference
(/root/reference/mode/models/edm_diffusion/gc_sampling.py:164-994) and the
dispatch table in mode_agent.py:771-840. Design notes (TPU-first):

- The sigma schedule is **static** (host numpy); every per-step scalar
  (sigma_hat, ancestral sigma_down/up, DPM++ log-ratios, LMS quadrature
  coefficients) is precomputed host-side in float64 and scanned over as small
  constant arrays. The model is the only device work per step.
- The denoiser callback has signature ``denoiser(x, sigma_vec, step_idx)``:
  ``step_idx`` is the scheduled-step index (>= 0) for on-schedule sigmas so an
  agent can dispatch its per-sigma precomputed MoE routing, or -1 for
  off-schedule midpoint evals (Heun/DPM-2 internal points) where the model
  routes inline.
- The final-step special cases (sigma_next == 0) are *statically* split out of
  the scan instead of being traced branches, so no wasted model evals.
- DDIM / DPM++ updates are written in sigma-ratio form
  (``sigma_next/sigma`` and ``1 - sigma_next/sigma``), algebraically equal to
  the reference's ``t = -log(sigma)`` / ``expm1`` formulation but finite at
  sigma_next = 0 (no inf/NaN plumbing inside jit).
- Stochastic samplers take an explicit PRNG key. The BrownianTree noise of
  ``dpmpp_sde`` is replaced with i.i.d. Gaussian increments (documented
  deviation: the tree only fixes the seed structure, the marginal law of each
  increment is the same).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side helpers (float64 numpy on static schedules)
# ---------------------------------------------------------------------------

def _ancestral_steps(sigmas: np.ndarray, eta: float = 1.0):
    """sigma_down/sigma_up per step (gc_sampling.py:102-109)."""
    s_from = sigmas[:-1].astype(np.float64)
    s_to = sigmas[1:].astype(np.float64)
    if not eta:
        return s_to.astype(np.float32), np.zeros_like(s_to, dtype=np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        su = np.minimum(s_to, eta * np.sqrt(s_to ** 2 * (s_from ** 2 - s_to ** 2)
                                            / s_from ** 2))
    su = np.nan_to_num(su, nan=0.0)
    sd = np.sqrt(np.maximum(s_to ** 2 - su ** 2, 0.0))
    return sd.astype(np.float32), su.astype(np.float32)


def _churn_gammas(sigmas: np.ndarray, s_churn: float, s_tmin: float, s_tmax: float):
    n = len(sigmas) - 1
    gammas = np.zeros(n, dtype=np.float64)
    for i in range(n):
        if s_tmin <= sigmas[i] <= s_tmax:
            gammas[i] = min(s_churn / n, 2 ** 0.5 - 1)
    sigma_hat = sigmas[:-1] * (gammas + 1)
    noise_scale = np.sqrt(np.maximum(sigma_hat ** 2 - sigmas[:-1] ** 2, 0.0))
    return sigma_hat.astype(np.float32), noise_scale.astype(np.float32)


def _lms_coeffs(sigmas: np.ndarray, order: int) -> np.ndarray:
    """Quadrature coefficients of the linear multistep method
    (gc_sampling.py:413-426), integrated host-side with scipy."""
    from scipy import integrate

    t = sigmas.astype(np.float64)
    n = len(sigmas) - 1
    coeffs = np.zeros((n, order), dtype=np.float64)

    def coeff(cur_order, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(cur_order):
                if j == k:
                    continue
                prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
            return prod
        return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]

    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            coeffs[i, j] = coeff(cur_order, i, j)
    return coeffs.astype(np.float32)


def _s_in(x: jax.Array, sigma) -> jax.Array:
    return jnp.full((x.shape[0],), sigma, dtype=jnp.float32)


def _randn_like(key, x):
    return jax.random.normal(key, x.shape, x.dtype)


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def sample_euler(denoiser, x, sigmas, key=None, *, s_churn=0.0, s_tmin=0.0,
                 s_tmax=float("inf"), s_noise=1.0, **_):
    """Karras Algorithm 2 Euler variant (gc_sampling.py:164-210)."""
    sigmas = np.asarray(sigmas)
    sigma_hat, noise_scale = _churn_gammas(sigmas, s_churn, s_tmin, s_tmax)
    n = len(sigmas) - 1
    on_schedule = s_churn == 0.0
    if key is None:
        key = jax.random.PRNGKey(0)

    def step(carry, inp):
        x, key = carry
        i, sh, ns, s_next = inp
        key, sub = jax.random.split(key)
        if s_churn > 0:
            x = x + _randn_like(sub, x) * s_noise * ns
        den = denoiser(x, _s_in(x, sh), i if on_schedule else -1)
        d = (x - den) / sh
        x = x + d * (s_next - sh)
        return (x, key), None

    xs = (jnp.arange(n), jnp.asarray(sigma_hat), jnp.asarray(noise_scale),
          jnp.asarray(sigmas[1:]))
    (x, _), _ = jax.lax.scan(step, (x, key), xs)
    return x


def sample_euler_ancestral(denoiser, x, sigmas, key, *, eta=1.0, s_noise=1.0, **_):
    """gc_sampling.py:213-253."""
    sigmas = np.asarray(sigmas)
    sd, su = _ancestral_steps(sigmas, eta)
    noise_gate = (sd > 0).astype(np.float32)  # reference gates on sigma_down > 0
    n = len(sigmas) - 1

    def step(carry, inp):
        x, key = carry
        i, s_i, s_down, s_up, gate = inp
        den = denoiser(x, _s_in(x, s_i), i)
        d = (x - den) / s_i
        x = x + d * (s_down - s_i)
        key, sub = jax.random.split(key)
        x = x + _randn_like(sub, x) * (s_up * gate)
        return (x, key), None

    xs = (jnp.arange(n), jnp.asarray(sigmas[:-1]), jnp.asarray(sd),
          jnp.asarray(su), jnp.asarray(noise_gate))
    (x, _), _ = jax.lax.scan(step, (x, key), xs)
    return x


def sample_heun(denoiser, x, sigmas, key=None, *, s_churn=0.0, s_tmin=0.0,
                s_tmax=float("inf"), s_noise=1.0, **_):
    """Karras Algorithm 2 with 2nd-order correction (gc_sampling.py:256-311).
    The final sigma->0 step is statically an Euler step, split out of the scan.
    """
    sigmas = np.asarray(sigmas)
    sigma_hat, noise_scale = _churn_gammas(sigmas, s_churn, s_tmin, s_tmax)
    n = len(sigmas) - 1
    on_schedule = s_churn == 0.0
    if key is None:
        key = jax.random.PRNGKey(0)

    def heun_step(carry, inp):
        x, key = carry
        i, sh, ns, s_next = inp
        key, sub = jax.random.split(key)
        if s_churn > 0:
            x = x + _randn_like(sub, x) * s_noise * ns
        den = denoiser(x, _s_in(x, sh), i if on_schedule else -1)
        d = (x - den) / sh
        dt = s_next - sh
        x_2 = x + d * dt
        den_2 = denoiser(x_2, _s_in(x, s_next), i + 1 if on_schedule else -1)
        d_2 = (x_2 - den_2) / s_next
        x = x + 0.5 * (d + d_2) * dt
        return (x, key), None

    # steps with sigma_next > 0 use Heun; trailing zero-sigma steps use Euler
    nz = int(np.sum(sigmas[1:] > 0))
    xs = (jnp.arange(nz), jnp.asarray(sigma_hat[:nz]), jnp.asarray(noise_scale[:nz]),
          jnp.asarray(sigmas[1:nz + 1]))
    (x, key), _ = jax.lax.scan(heun_step, (x, key), xs)
    for i in range(nz, n):
        key, sub = jax.random.split(key)
        if s_churn > 0:
            x = x + _randn_like(sub, x) * s_noise * noise_scale[i]
        den = denoiser(x, _s_in(x, sigma_hat[i]), i if on_schedule else -1)
        d = (x - den) / sigma_hat[i]
        x = x + d * (sigmas[i + 1] - sigma_hat[i])
    return x


def sample_dpm_2(denoiser, x, sigmas, key=None, *, s_churn=0.0, s_tmin=0.0,
                 s_tmax=float("inf"), s_noise=1.0, **_):
    """DPM-Solver-2-style midpoint sampler (gc_sampling.py:314-372)."""
    sigmas = np.asarray(sigmas)
    sigma_hat, noise_scale = _churn_gammas(sigmas, s_churn, s_tmin, s_tmax)
    n = len(sigmas) - 1
    on_schedule = s_churn == 0.0
    nz = int(np.sum(sigmas[1:] > 0))
    # geometric midpoint in log space (gc_sampling.py:363)
    sigma_mid = np.exp(0.5 * (np.log(sigma_hat[:nz]) + np.log(sigmas[1:nz + 1])))
    if key is None:
        key = jax.random.PRNGKey(0)

    def step(carry, inp):
        x, key = carry
        i, sh, ns, s_mid, s_next = inp
        key, sub = jax.random.split(key)
        if s_churn > 0:
            x = x + _randn_like(sub, x) * s_noise * ns
        den = denoiser(x, _s_in(x, sh), i if on_schedule else -1)
        d = (x - den) / sh
        x_2 = x + d * (s_mid - sh)
        den_2 = denoiser(x_2, _s_in(x, s_mid), -1)
        d_2 = (x_2 - den_2) / s_mid
        x = x + d_2 * (s_next - sh)
        return (x, key), None

    xs = (jnp.arange(nz), jnp.asarray(sigma_hat[:nz]), jnp.asarray(noise_scale[:nz]),
          jnp.asarray(sigma_mid.astype(np.float32)), jnp.asarray(sigmas[1:nz + 1]))
    (x, key), _ = jax.lax.scan(step, (x, key), xs)
    for i in range(nz, n):
        den = denoiser(x, _s_in(x, sigma_hat[i]), i if on_schedule else -1)
        d = (x - den) / sigma_hat[i]
        x = x + d * (sigmas[i + 1] - sigma_hat[i])
    return x


def sample_dpm_2_ancestral(denoiser, x, sigmas, key, *, eta=1.0, **_):
    """gc_sampling.py:375-410 (MoDE's 'ancestral' sampler)."""
    sigmas = np.asarray(sigmas)
    sd, su = _ancestral_steps(sigmas, eta)
    n = len(sigmas) - 1
    nz = int(np.sum(sd > 0))
    sigma_mid = np.exp(0.5 * (np.log(sigmas[:nz]) + np.log(sd[:nz])))

    def step(carry, inp):
        x, key = carry
        i, s_i, s_down, s_up, s_mid = inp
        den = denoiser(x, _s_in(x, s_i), i)
        d = (x - den) / s_i
        x_2 = x + d * (s_mid - s_i)
        den_2 = denoiser(x_2, _s_in(x, s_mid), -1)
        d_2 = (x_2 - den_2) / s_mid
        x = x + d_2 * (s_down - s_i)
        key, sub = jax.random.split(key)
        x = x + _randn_like(sub, x) * s_up
        return (x, key), None

    xs = (jnp.arange(nz), jnp.asarray(sigmas[:nz]), jnp.asarray(sd[:nz]),
          jnp.asarray(su[:nz]), jnp.asarray(sigma_mid.astype(np.float32)))
    (x, key), _ = jax.lax.scan(step, (x, key), xs)
    for i in range(nz, n):
        den = denoiser(x, _s_in(x, sigmas[i]), i)
        d = (x - den) / sigmas[i]
        x = x + d * (sd[i] - sigmas[i])
    return x


def sample_lms(denoiser, x, sigmas, key=None, *, order=4, **_):
    """Linear multistep sampler (gc_sampling.py:429-465); quadrature
    coefficients precomputed host-side."""
    sigmas = np.asarray(sigmas)
    n = len(sigmas) - 1
    coeffs = _lms_coeffs(sigmas, order)  # [n, order], zero-padded

    def step(carry, inp):
        x, ds_buf = carry
        i, s_i, c = inp
        den = denoiser(x, _s_in(x, s_i), i)
        d = (x - den) / s_i
        ds_buf = jnp.concatenate([d[None], ds_buf[:-1]], axis=0)  # newest first
        x = x + jnp.einsum("j,j...->...", c, ds_buf)
        return (x, ds_buf), None

    ds_buf = jnp.zeros((order,) + x.shape, x.dtype)
    xs = (jnp.arange(n), jnp.asarray(sigmas[:-1]), jnp.asarray(coeffs))
    (x, _), _ = jax.lax.scan(step, (x, ds_buf), xs)
    return x


def sample_ddim(denoiser, x, sigmas, key=None, unroll: int = 1, **_):
    """DDIM / DPM-Solver-1 (gc_sampling.py:922-951), the MoDE default.
    Update in ratio form: x <- (s_next/s) x + (1 - s_next/s) denoised.

    ``unroll``: lax.scan unroll factor (pass via sample_loop extra_args).
    Full unroll makes the per-step gathers (sigma embeds, routing tables,
    EDM scalings) static slices XLA folds away — see docs/PERF.md
    "sampler glue". Compile time grows with the factor."""
    sigmas = np.asarray(sigmas)
    n = len(sigmas) - 1
    ratios = (sigmas[1:] / sigmas[:-1]).astype(np.float32)

    def step(x, inp):
        i, s_i, r = inp
        den = denoiser(x, _s_in(x, s_i), i)
        x = r * x + (1.0 - r) * den
        return x, None

    xs = (jnp.arange(n), jnp.asarray(sigmas[:-1]), jnp.asarray(ratios))
    x, _ = jax.lax.scan(step, x, xs, unroll=max(1, min(int(unroll), n)))
    return x


def sample_dpmpp_2m(denoiser, x, sigmas, key=None, **_):
    """DPM-Solver++(2M) (gc_sampling.py:699-733)."""
    sigmas = np.asarray(sigmas).astype(np.float64)
    n = len(sigmas) - 1
    ratios = np.zeros(n)
    rs = np.zeros(n)
    simple = np.zeros(n, dtype=bool)
    for i in range(n):
        ratios[i] = sigmas[i + 1] / sigmas[i]
        if i == 0 or sigmas[i + 1] == 0:
            simple[i] = True
        else:
            h = math.log(sigmas[i]) - math.log(sigmas[i + 1])
            h_last = math.log(sigmas[i - 1]) - math.log(sigmas[i])
            rs[i] = h_last / h

    def step(carry, inp):
        x, old_den = carry
        i, s_i, ratio, r, is_simple = inp
        den = denoiser(x, _s_in(x, s_i), i)
        fac = 1.0 / (2.0 * jnp.maximum(r, 1e-30))
        den_d = (1 + fac) * den - fac * old_den
        den_eff = jnp.where(is_simple, den, den_d)
        x = ratio * x + (1.0 - ratio) * den_eff
        return (x, den), None

    xs = (jnp.arange(n), jnp.asarray(sigmas[:-1], jnp.float32),
          jnp.asarray(ratios, jnp.float32), jnp.asarray(rs, jnp.float32),
          jnp.asarray(simple))
    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), xs)
    return x


def sample_dpmpp_2s(denoiser, x, sigmas, key=None, **_):
    """DPM-Solver++(2S) (gc_sampling.py:955-994)."""
    sigmas = np.asarray(sigmas).astype(np.float64)
    n = len(sigmas) - 1
    nz = int(np.sum(sigmas[1:] > 0))
    sigma_s = np.sqrt(sigmas[:nz] * sigmas[1:nz + 1])  # log-midpoint
    ratio_s = (sigma_s / sigmas[:nz])
    ratio = (sigmas[1:nz + 1] / sigmas[:nz])

    def step(x, inp):
        i, s_i, s_mid, r_s, r = inp
        den = denoiser(x, _s_in(x, s_i), i)
        x_2 = r_s * x + (1.0 - r_s) * den
        den_2 = denoiser(x_2, _s_in(x, s_mid), -1)
        x = r * x + (1.0 - r) * den_2
        return x, None

    xs = (jnp.arange(nz), jnp.asarray(sigmas[:nz], jnp.float32),
          jnp.asarray(sigma_s, jnp.float32), jnp.asarray(ratio_s, jnp.float32),
          jnp.asarray(ratio, jnp.float32))
    x, _ = jax.lax.scan(step, x, xs)
    for i in range(nz, n):
        den = denoiser(x, _s_in(x, sigmas[i]), i)
        d = (x - den) / sigmas[i]
        x = x + d * (sigmas[i + 1] - sigmas[i])
    return x


def sample_dpmpp_2s_ancestral(denoiser, x, sigmas, key, *, eta=1.0, s_noise=1.0, **_):
    """gc_sampling.py:873-919."""
    sigmas = np.asarray(sigmas).astype(np.float64)
    sd, su = _ancestral_steps(sigmas.astype(np.float32), eta)
    sd = sd.astype(np.float64)
    n = len(sigmas) - 1
    nz = int(np.sum(sd > 0))
    sigma_s = np.sqrt(sigmas[:nz] * sd[:nz])
    ratio_s = sigma_s / sigmas[:nz]
    ratio = sd[:nz] / sigmas[:nz]

    def step(carry, inp):
        x, key = carry
        i, s_i, s_mid, r_s, r, s_up = inp
        den = denoiser(x, _s_in(x, s_i), i)
        x_2 = r_s * x + (1.0 - r_s) * den
        den_2 = denoiser(x_2, _s_in(x, s_mid), -1)
        x = r * x + (1.0 - r) * den_2
        key, sub = jax.random.split(key)
        x = x + _randn_like(sub, x) * s_noise * s_up
        return (x, key), None

    xs = (jnp.arange(nz), jnp.asarray(sigmas[:nz], jnp.float32),
          jnp.asarray(sigma_s, jnp.float32), jnp.asarray(ratio_s, jnp.float32),
          jnp.asarray(ratio, jnp.float32), jnp.asarray(su[:nz]))
    (x, key), _ = jax.lax.scan(step, (x, key), xs)
    for i in range(nz, n):
        den = denoiser(x, _s_in(x, sigmas[i]), i)
        d = (x - den) / sigmas[i]
        x = x + d * (sd[i] - sigmas[i])
    return x


def sample_dpmpp_sde(denoiser, x, sigmas, key, *, eta=1.0, s_noise=1.0, r=0.5, **_):
    """DPM-Solver++ (stochastic) (gc_sampling.py:736-792). The reference's
    BrownianTree noise source is replaced by i.i.d. Gaussians with matching
    marginal scale (documented deviation)."""
    sigmas64 = np.asarray(sigmas).astype(np.float64)
    n = len(sigmas64) - 1
    nz = int(np.sum(sigmas64[1:] > 0))

    t = -np.log(sigmas64[:nz])
    t_next = -np.log(sigmas64[1:nz + 1])
    h = t_next - t
    s = t + h * r
    fac = 1 / (2 * r)
    sigma_sf = np.exp(-s)
    # ancestral (sigma_down, sigma_up) pairs per step, host-side
    sd_1 = np.zeros(nz); su_1 = np.zeros(nz); sd_2 = np.zeros(nz); su_2 = np.zeros(nz)
    for i in range(nz):
        a, b = _ancestral_steps(np.array([sigmas64[i], sigma_sf[i]], np.float32), eta)
        sd_1[i], su_1[i] = a[0], b[0]
        a, b = _ancestral_steps(np.array([sigmas64[i], sigmas64[i + 1]], np.float32), eta)
        sd_2[i], su_2[i] = a[0], b[0]
    # sigma ratios for the deterministic parts of both stages
    ratio_1 = sd_1 / sigmas64[:nz]      # sigma(s_)/sigma(t)
    ratio_2 = sd_2 / sigmas64[:nz]      # sigma(t_next_)/sigma(t)

    def step(carry, inp):
        x, key = carry
        (i, s_i, s_mid, r1, r2, su1, su2) = inp
        den = denoiser(x, _s_in(x, s_i), i)
        x_2 = r1 * x + (1.0 - r1) * den
        key, k1, k2 = jax.random.split(key, 3)
        x_2 = x_2 + _randn_like(k1, x) * s_noise * su1
        den_2 = denoiser(x_2, _s_in(x, s_mid), -1)
        den_d = (1 - fac) * den + fac * den_2
        x = r2 * x + (1.0 - r2) * den_d
        x = x + _randn_like(k2, x) * s_noise * su2
        return (x, key), None

    xs = (jnp.arange(nz), jnp.asarray(sigmas64[:nz], jnp.float32),
          jnp.asarray(sigma_sf, jnp.float32), jnp.asarray(ratio_1, jnp.float32),
          jnp.asarray(ratio_2, jnp.float32), jnp.asarray(su_1, jnp.float32),
          jnp.asarray(su_2, jnp.float32))
    (x, key), _ = jax.lax.scan(step, (x, key), xs)
    for i in range(nz, n):
        den = denoiser(x, _s_in(x, sigmas64[i]), i)
        d = (x - den) / sigmas64[i]
        x = x + d * (sigmas64[i + 1] - sigmas64[i])
    return x


# ---------------------------------------------------------------------------
# DPM-Solver fast / adaptive (gc_sampling.py:524-696, 833-870)
# ---------------------------------------------------------------------------

def _dpm_eps(denoiser, x, t, step_idx=-1):
    sigma = math.exp(-t) if not isinstance(t, jax.Array) else jnp.exp(-t)
    den = denoiser(x, _s_in(x, sigma), step_idx)
    return (x - den) / sigma


def sample_dpm_fast(denoiser, x, sigmas, key=None, *, sigma_min=None,
                    sigma_max=None, n=None, eta=0.0, s_noise=1.0, **_):
    """DPM-Solver-Fast with the reference's order schedule
    (gc_sampling.py:579-616). Statically unrolled (n is tiny)."""
    sigmas = np.asarray(sigmas)
    if sigma_min is None:
        sigma_min = float(sigmas[sigmas > 0].min())
    if sigma_max is None:
        sigma_max = float(sigmas.max())
    if n is None:
        n = len(sigmas)
    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    m = n // 3 + 1
    ts = np.linspace(t_start, t_end, m + 1)
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [n % 3]
    if key is None:
        key = jax.random.PRNGKey(0)

    def sig(t):
        return math.exp(-t)

    for i, order in enumerate(orders):
        t, t_next = float(ts[i]), float(ts[i + 1])
        h = t_next - t
        eps = _dpm_eps(denoiser, x, t)
        if order == 1:
            x = x - sig(t_next) * math.expm1(h) * eps
        elif order == 2:
            r1 = 0.5
            s1 = t + r1 * h
            u1 = x - sig(s1) * math.expm1(r1 * h) * eps
            eps_r1 = _dpm_eps(denoiser, u1, s1)
            x = x - sig(t_next) * math.expm1(h) * eps \
                - sig(t_next) / (2 * r1) * math.expm1(h) * (eps_r1 - eps)
        else:
            r1, r2 = 1 / 3, 2 / 3
            s1, s2 = t + r1 * h, t + r2 * h
            u1 = x - sig(s1) * math.expm1(r1 * h) * eps
            eps_r1 = _dpm_eps(denoiser, u1, s1)
            u2 = x - sig(s2) * math.expm1(r2 * h) * eps \
                - sig(s2) * (r2 / r1) * (math.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps)
            eps_r2 = _dpm_eps(denoiser, u2, s2)
            x = x - sig(t_next) * math.expm1(h) * eps \
                - sig(t_next) / r2 * (math.expm1(h) / h - 1) * (eps_r2 - eps)
    return x


class _PIDController:
    """PID step-size controller (gc_sampling.py:495-521)."""

    def __init__(self, h, pcoeff, icoeff, dcoeff, order=1, accept_safety=0.81,
                 eps=1e-8):
        self.h = h
        self.b1 = (pcoeff + icoeff + dcoeff) / order
        self.b2 = -(pcoeff + 2 * dcoeff) / order
        self.b3 = dcoeff / order
        self.accept_safety = accept_safety
        self.eps = eps
        self.errs = []

    def propose_step(self, error):
        inv_error = 1 / (float(error) + self.eps)
        if not self.errs:
            self.errs = [inv_error, inv_error, inv_error]
        self.errs[0] = inv_error
        factor = self.errs[0] ** self.b1 * self.errs[1] ** self.b2 * self.errs[2] ** self.b3
        factor = 1 + math.atan(factor - 1)
        accept = factor >= self.accept_safety
        if accept:
            self.errs[2] = self.errs[1]
            self.errs[1] = self.errs[0]
        self.h *= factor
        return accept


def sample_dpm_adaptive(denoiser, x, sigmas, key=None, *, sigma_min=None,
                        sigma_max=None, order=3, rtol=0.05, atol=0.0078,
                        h_init=0.05, pcoeff=0.0, icoeff=1.0, dcoeff=0.0,
                        accept_safety=0.81, **_):
    """DPM-Solver-12/23 adaptive (gc_sampling.py:618-669). Host-driven control
    loop (data-dependent step count can't be a static scan); each model eval is
    still jitted by the caller's denoiser."""
    sigmas = np.asarray(sigmas)
    if sigma_min is None:
        sigma_min = float(sigmas[sigmas > 0].min())
    if sigma_max is None:
        sigma_max = float(sigmas.max())
    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    if order not in (2, 3):
        raise ValueError("order should be 2 or 3")
    s = t_start
    x_prev = x
    pid = _PIDController(abs(h_init), pcoeff, icoeff, dcoeff, order, accept_safety)

    def sig(t):
        return math.exp(-t)

    def solver_1(x, t, t_next, eps):
        return x - sig(t_next) * math.expm1(t_next - t) * eps

    def solver_2(x, t, t_next, eps, r1=0.5):
        h = t_next - t
        s1 = t + r1 * h
        u1 = x - sig(s1) * math.expm1(r1 * h) * eps
        eps_r1 = _dpm_eps(denoiser, u1, s1)
        return x - sig(t_next) * math.expm1(h) * eps \
            - sig(t_next) / (2 * r1) * math.expm1(h) * (eps_r1 - eps), eps_r1

    def solver_3(x, t, t_next, eps, eps_r1, r1=1 / 3, r2=2 / 3):
        h = t_next - t
        s2 = t + r2 * h
        u2 = x - sig(s2) * math.expm1(r2 * h) * eps \
            - sig(s2) * (r2 / r1) * (math.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps)
        eps_r2 = _dpm_eps(denoiser, u2, s2)
        return x - sig(t_next) * math.expm1(h) * eps \
            - sig(t_next) / r2 * (math.expm1(h) / h - 1) * (eps_r2 - eps)

    while s < t_end - 1e-5:
        t = min(t_end, s + pid.h)
        eps = _dpm_eps(denoiser, x, s)
        if order == 2:
            x_low = solver_1(x, s, t, eps)
            x_high, _ = solver_2(x, s, t, eps)
        else:
            x_low, eps_r1 = solver_2(x, s, t, eps, r1=1 / 3)
            x_high = solver_3(x, s, t, eps, eps_r1)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
        error = float(jnp.linalg.norm((x_low - x_high) / delta) / math.sqrt(x.size))
        if pid.propose_step(error):
            x_prev = x_low
            x = x_high
            s = t
    return x


def log_likelihood(denoiser, x, sigma_min, sigma_max, key, *, atol=1e-4,
                   rtol=1e-4):
    """Log-likelihood via the probability-flow ODE with a Hutchinson-Rademacher
    divergence estimate (gc_sampling.py:468-492); torchdiffeq replaced by
    jax.experimental.ode.odeint, autograd by jvp."""
    from jax.experimental.ode import odeint

    v = (jax.random.randint(key, x.shape, 0, 2).astype(x.dtype)) * 2 - 1

    def ode_fn(state, sigma):
        xt, _ = state
        def f(xx):
            den = denoiser(xx, _s_in(xx, sigma), -1)
            return (xx - den) / sigma
        d, jvp_v = jax.jvp(f, (xt,), (v,))
        d_ll = jnp.sum((v * jvp_v).reshape(x.shape[0], -1), axis=1)
        return d, d_ll

    init = (x, jnp.zeros((x.shape[0],), x.dtype))
    ts = jnp.asarray([sigma_min, sigma_max], jnp.float32)
    sol = odeint(ode_fn, init, ts, atol=atol, rtol=rtol)
    latent, delta_ll = sol[0][-1], sol[1][-1]
    ll_prior = jax.scipy.stats.norm.logpdf(latent, 0.0, sigma_max)
    ll_prior = jnp.sum(ll_prior.reshape(x.shape[0], -1), axis=1)
    return ll_prior + delta_ll


# ---------------------------------------------------------------------------
# Dispatch (reference mode_agent.py:771-840)
# ---------------------------------------------------------------------------

SAMPLERS: Dict[str, Callable] = {
    "lms": sample_lms,
    "heun": sample_heun,
    "euler": sample_euler,
    "ancestral": sample_dpm_2_ancestral,
    "euler_ancestral": sample_euler_ancestral,
    "dpm": sample_dpm_2,
    "dpm_adaptive": sample_dpm_adaptive,
    "dpm_fast": sample_dpm_fast,
    "dpmpp_2s_ancestral": sample_dpmpp_2s_ancestral,
    "dpmpp_2m": sample_dpmpp_2m,
    "dpmpp_2m_sde": sample_dpmpp_sde,
    "ddim": sample_ddim,
    "dpmpp_2s": sample_dpmpp_2s,
    "dpmpp_2_with_lms": sample_dpmpp_2m,  # reference aliases this to 2M math
    "debugging": sample_dpmpp_2m,
}


def sample_loop(sampler_type: str, denoiser: Callable, x: jax.Array,
                sigmas: np.ndarray, key: Optional[jax.Array] = None,
                extra_args: Optional[dict] = None) -> jax.Array:
    """Run the named sampler. ``denoiser(x, sigma_vec, step_idx) -> denoised``."""
    if sampler_type not in SAMPLERS:
        raise ValueError(f"desired sampler type not found: {sampler_type}")
    extra = dict(extra_args or {})
    extra.pop("keep_last_actions", None)
    if key is None:
        key = jax.random.PRNGKey(0)
    return SAMPLERS[sampler_type](denoiser, x, sigmas, key, **extra)
