"""FiLM-ResNet encoder parity: flax NHWC encoders + checkpoint converter vs
a torch-side golden implementation with timm-layout state dicts."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.encoders.resnet import (
    FiLMResNetPolicy, ResNetEncoderWithFiLM)
from mode_diffusion_policy_tpu.utils.checkpoint_convert import convert_film_resnet
from mode_diffusion_policy_tpu.utils.torch_oracles import TorchFiLMResNetPolicy

B, H, W, COND = 2, 64, 64, 24


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("depth", [18, 50])
def test_film_resnet_policy_parity(depth):
    torch.manual_seed(0)
    tmodel = TorchFiLMResNetPolicy(COND, depth=depth, zero_film=False)
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    tmodel.eval()

    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, 3, H, W)).astype(np.float32)
    cond = rng.standard_normal((B, COND)).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.tensor(x), torch.tensor(cond)).numpy()

    jmodel = FiLMResNetPolicy(condition_dim=COND, depth=depth)
    variables = convert_film_resnet(tmodel.state_dict(), depth=depth)
    j_out = jmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(cond), train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-4, rtol=1e-3)
    assert j_out.shape == (B, 2048 if depth == 50 else 512)


def test_film_zero_init_is_identity():
    """Fresh FiLM params are zero-init so conditioning starts as identity
    (pretrained_resnets.py:13-17)."""
    jmodel = FiLMResNetPolicy(condition_dim=COND, depth=18)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, 3))
    c1 = jax.random.normal(jax.random.PRNGKey(1), (B, COND))
    c2 = jax.random.normal(jax.random.PRNGKey(2), (B, COND))
    variables = jmodel.init(key, x, c1, train=False)
    o1 = jmodel.apply(variables, x, c1, train=False)
    o2 = jmodel.apply(variables, x, c2, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_scratch_resnet18_runs_and_batchnorm_updates():
    jmodel = ResNetEncoderWithFiLM(condition_dim=COND, latent_dim=512)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, 3))
    cond = jax.random.normal(key, (B, COND))
    variables = jmodel.init(key, x, cond, train=False)
    out = jmodel.apply(variables, x, cond, train=False)
    assert out.shape == (B, 512)

    out_t, updates = jmodel.apply(variables, x, cond, train=True,
                                  mutable=["batch_stats"])
    assert out_t.shape == (B, 512)
    old = variables["batch_stats"]["resnet"]["bn1"]["mean"]
    new = updates["batch_stats"]["resnet"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_scratch_resnet18_time_series():
    jmodel = ResNetEncoderWithFiLM(condition_dim=COND, latent_dim=64)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 3, 32, 32, 3))  # [B,T,H,W,C]
    cond = jax.random.normal(key, (B, COND))
    variables = jmodel.init(key, x, cond, train=False)
    out = jmodel.apply(variables, x, cond, train=False)
    assert out.shape == (B, 3, 64)
