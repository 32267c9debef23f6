"""Sampler parity vs the reference k-diffusion-style samplers.

The reference gc_sampling.py is loaded as a test oracle with stub modules for
its unused heavy deps (torchsde/torchdiffeq/tqdm/matplotlib). All
deterministic samplers (and stochastic ones at eta=0) are compared step-exact
on an analytic denoiser implemented identically in torch and JAX."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import importlib.util
import pathlib

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.edm import samplers as jsamp
from mode_diffusion_policy_tpu.models.edm import schedules as jsched


def _stub(name, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def load_reference_sampling():
    _stub("torchsde", BrownianTree=object)
    _stub("torchdiffeq", odeint=lambda *a, **k: None)
    class _T:
        def __init__(self, it=None, total=None, disable=None):
            self.it = it
        def __iter__(self):
            return iter(self.it)
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False
        def update(self, *a):
            pass
    _stub("tqdm", trange=lambda n, disable=None: _T(range(n)),
          tqdm=lambda *a, **k: _T(*a))
    _stub("tqdm.auto", trange=lambda n, disable=None: _T(range(n)),
          tqdm=lambda *a, **k: _T(*a))
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        _stub("matplotlib", pyplot=None)
        _stub("matplotlib.pyplot")

    ref_root = pathlib.Path("/root/reference/mode/models/edm_diffusion")
    pkg = types.ModuleType("refedm")
    pkg.__path__ = [str(ref_root)]
    sys.modules["refedm"] = pkg
    for name in ("utils", "gc_sampling"):
        spec = importlib.util.spec_from_file_location(
            f"refedm.{name}", ref_root / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refedm.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refedm.gc_sampling"]


REF = load_reference_sampling()

SIGMA_DATA = 0.5
B, T, D = 2, 10, 7


def torch_model(state, action, goal, sigma, **kw):
    # analytic "optimal denoiser of unit-gaussian data" surrogate
    s2 = (sigma ** 2).view(-1, 1, 1)
    return action / (1 + s2) + 0.1 * torch.tanh(action)


def jax_denoiser(x, sigma, step_idx):
    s2 = (sigma ** 2).reshape(-1, 1, 1)
    return x / (1 + s2) + 0.1 * jnp.tanh(x)


def make_x(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, T, D)).astype(np.float32) * 80.0


SCHEDULE = jsched.get_sigmas_exponential(10, 0.001, 80.0)


def run_ref(fn_name, x, sigmas, **kw):
    fn = getattr(REF, fn_name)
    out = fn(torch_model, None, torch.tensor(x.copy()), None,
             torch.tensor(sigmas.copy()), disable=True, **kw)
    return out.numpy()


def run_jax(name, x, sigmas, **kw):
    out = jsamp.sample_loop(name, jax_denoiser, jnp.asarray(x),
                            sigmas, key=jax.random.PRNGKey(0),
                            extra_args=kw)
    return np.asarray(out)


CASES = [
    ("euler", "sample_euler", {}),
    ("heun", "sample_heun", {}),
    ("dpm", "sample_dpm_2", {}),
    ("lms", "sample_lms", {}),
    ("ddim", "sample_ddim", {}),
    ("dpmpp_2m", "sample_dpmpp_2m", {}),
    ("dpmpp_2s", "sample_dpmpp_2s", {}),
    ("euler_ancestral", "sample_euler_ancestral", {"eta": 0.0}),
    ("ancestral", "sample_dpm_2_ancestral", {"eta": 0.0}),
    ("dpmpp_2s_ancestral", "sample_dpmpp_2s_ancestral", {"eta": 0.0}),
]


@pytest.mark.parametrize("jname,refname,kw", CASES, ids=[c[0] for c in CASES])
def test_sampler_parity(jname, refname, kw):
    x = make_x()
    ref = run_ref(refname, x, SCHEDULE, **kw)
    got = run_jax(jname, x, SCHEDULE, **kw)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("sched", ["karras", "linear"])
def test_sampler_parity_other_schedules(sched):
    sigmas = jsched.get_noise_schedule(10, sched, 0.001, 80.0)
    x = make_x(3)
    ref = run_ref("sample_ddim", x, sigmas)
    got = run_jax("ddim", x, sigmas)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_schedules_parity():
    """All 7 noise schedules vs reference implementations."""
    for n in (5, 10):
        pairs = [
            (jsched.get_sigmas_karras(n, 0.001, 80.0),
             REF.get_sigmas_karras(n, 0.001, 80.0).numpy()),
            (jsched.get_sigmas_exponential(n, 0.001, 80.0),
             REF.get_sigmas_exponential(n, 0.001, 80.0).numpy()),
            (jsched.get_sigmas_linear(n, 0.001, 80.0),
             REF.get_sigmas_linear(n, 0.001, 80.0).numpy()),
            (jsched.cosine_beta_schedule(n),
             REF.cosine_beta_schedule(n).numpy()),
            (jsched.get_sigmas_ve(n, 0.02, 100.0),
             REF.get_sigmas_ve(n, 0.02, 100.0).numpy()),
            (jsched.get_iddpm_sigmas(n, 0.02, 100.0),
             REF.get_iddpm_sigmas(n, 0.02, 100.0).numpy()),
            (jsched.get_sigmas_vp(n),
             REF.get_sigmas_vp(n).numpy()),
        ]
        for got, ref in pairs:
            np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_dpm_fast_runs():
    x = make_x(5)
    out = run_jax("dpm_fast", x, SCHEDULE)
    assert np.all(np.isfinite(out))
    # reference signature: (model, state, action, goal, sigma_min, sigma_max, n)
    # matching the dispatch in mode_agent.py:820 (sigmas[-2], sigmas[0], len)
    # (noise_sampler passed explicitly: the reference has a latent NameError at
    # gc_sampling.py:580 when it is None; unused at eta=0 anyway)
    ref = REF.sample_dpm_fast(
        torch_model, None, torch.tensor(x.copy()), None,
        float(SCHEDULE[-2]), float(SCHEDULE[0]), len(SCHEDULE),
        disable=True, noise_sampler=lambda a, b: 0.0).numpy()
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_stochastic_samplers_finite():
    """eta>0 paths draw different RNG than torch — check statistical sanity."""
    x = make_x(7)
    for name in ("euler_ancestral", "ancestral", "dpmpp_2s_ancestral",
                 "dpmpp_2m_sde"):
        out = run_jax(name, x, SCHEDULE, eta=1.0)
        assert np.all(np.isfinite(out)), name
        assert np.abs(out).max() < 10.0, name  # denoised to data scale


def test_dpm_adaptive_runs():
    x = make_x(9)
    out = run_jax("dpm_adaptive", x, SCHEDULE)
    assert np.all(np.isfinite(out))
    assert np.abs(out).max() < 10.0


def test_ddim_unroll_bit_exact():
    """unroll=n is a scheduling hint only: the fully unrolled DDIM scan must
    be bit-identical to the rolled one (it feeds the serving fast path,
    docs/PERF.md "sampler glue")."""
    x = make_x()
    rolled = run_jax("ddim", x, SCHEDULE)
    unrolled = run_jax("ddim", x, SCHEDULE, unroll=len(SCHEDULE))
    np.testing.assert_array_equal(rolled, unrolled)
