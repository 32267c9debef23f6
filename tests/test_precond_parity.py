"""EDM preconditioner + sigma-density parity vs the reference GCDenoiser
(score_wrappers.py) and edm utils densities."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.edm.precond import (
    denoiser_forward, denoiser_loss, edm_scalings)
from mode_diffusion_policy_tpu.models.edm.densities import make_sample_density
from reference_oracle import load_module


def load_ref_precond():
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hydra.utils = types.ModuleType("hydra.utils")
        hydra.utils.instantiate = lambda x: x
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hydra.utils
    pkg = types.ModuleType("refsw_pkg")
    pkg.__path__ = ["/root/reference/mode/models/edm_diffusion"]
    sys.modules["refsw_pkg"] = pkg
    import importlib.util
    for name in ("utils", "score_wrappers"):
        spec = importlib.util.spec_from_file_location(
            f"refsw_pkg.{name}",
            f"/root/reference/mode/models/edm_diffusion/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsw_pkg.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refsw_pkg.score_wrappers"]


class TorchInner(torch.nn.Module):
    def forward(self, state, action, goal, sigma, **kw):
        return torch.tanh(action) * 0.7 + 0.01 * sigma.view(-1, 1, 1)


def jax_inner(states, action, goal, sigma, **kw):
    return jnp.tanh(action) * 0.7 + 0.01 * sigma.reshape(-1, 1, 1)


B, T, D = 4, 10, 7


def test_forward_and_loss_parity():
    sw = load_ref_precond()
    ref = sw.GCDenoiser(TorchInner(), sigma_data=0.5)
    rng = np.random.default_rng(0)
    action = rng.standard_normal((B, T, D)).astype(np.float32)
    noise = rng.standard_normal((B, T, D)).astype(np.float32)
    sigma = np.exp(rng.uniform(np.log(1e-3), np.log(80), (B,))).astype(np.float32)

    with torch.no_grad():
        t_fwd = ref(None, torch.tensor(action), None, torch.tensor(sigma)).numpy()
        t_loss, t_out = ref.loss(None, torch.tensor(action), None,
                                 torch.tensor(noise), torch.tensor(sigma))
        t_loss = float(t_loss)

    j_fwd = denoiser_forward(jax_inner, None, jnp.asarray(action), None,
                             jnp.asarray(sigma), sigma_data=0.5)
    j_loss, j_out = denoiser_loss(jax_inner, None, jnp.asarray(action), None,
                                  jnp.asarray(noise), jnp.asarray(sigma),
                                  sigma_data=0.5)
    np.testing.assert_allclose(np.asarray(j_fwd), t_fwd, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(j_loss), t_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_scalings():
    sigma = jnp.asarray([0.001, 0.5, 80.0])
    c_skip, c_out, c_in = edm_scalings(sigma, 0.5)
    sd = 0.5
    s = np.asarray(sigma)
    np.testing.assert_allclose(np.asarray(c_skip), sd**2 / (s**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), s * sd / np.sqrt(s**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_in), 1 / np.sqrt(s**2 + sd**2), rtol=1e-6)


@pytest.mark.parametrize("density", ["loglogistic", "lognormal", "loguniform",
                                     "uniform", "v-diffusion", "discrete"])
def test_densities_statistics(density):
    """Distributional check of each density vs the reference torch impl
    (KS-style quantile comparison on 20k samples)."""
    ref_utils = sys.modules.get("refsw_pkg.utils") or load_ref_precond() and sys.modules["refsw_pkg.utils"]
    n = 20000
    fn = make_sample_density(density, sigma_data=0.5, sigma_min=0.001,
                            sigma_max=80.0, num_sampling_steps=10)
    j = np.asarray(fn(jax.random.PRNGKey(0), (n,)))
    assert np.all(np.isfinite(j))
    torch.manual_seed(0)
    import math
    if density == "loglogistic":
        t = ref_utils.rand_log_logistic((n,), loc=math.log(0.5), scale=0.5,
                                        min_value=0.001, max_value=80.0).numpy()
    elif density == "lognormal":
        t = ref_utils.rand_log_normal((n,), loc=0.0, scale=1.0).numpy()
    elif density == "loguniform":
        t = ref_utils.rand_log_uniform((n,), 0.001, 80.0).numpy()
    elif density == "uniform":
        t = ref_utils.rand_uniform((n,), 0.001, 80.0).numpy()
    elif density == "v-diffusion":
        t = ref_utils.rand_v_diffusion((n,), sigma_data=0.5, min_value=0.001,
                                       max_value=80.0).numpy()
    else:
        assert j.min() >= 0.001 - 1e-6 and j.max() <= 80.0 + 1e-4
        return
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        jq, tq = np.quantile(j, q), np.quantile(t, q)
        assert abs(np.log(jq) - np.log(tq)) < 0.15, (density, q, jq, tq)
