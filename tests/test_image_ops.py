"""On-device image pipeline: RandomShiftsAug equivalence vs the reference's
grid_sample formulation, resize/normalize semantics, relative actions."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.ops.image import (CLIP_MEAN, CLIP_STD,
                                                 preprocess_camera,
                                                 random_shift_aug,
                                                 relative_actions,
                                                 resize_images,
                                                 scale_and_normalize)


def torch_random_shift(x_nchw: np.ndarray, shifts: np.ndarray, pad: int):
    """The reference RandomShiftsAug forward (transforms.py:74-95) with the
    random shift injected for determinism. shifts: [N,2] ints in [0, 2p]."""
    x = torch.tensor(x_nchw).float()
    n, c, h, w = x.shape
    padding = tuple([pad] * 4)
    x = F.pad(x, padding, "replicate")
    eps = 1.0 / (h + 2 * pad)
    arange = torch.linspace(-1.0 + eps, 1.0 - eps, h + 2 * pad)[:h]
    arange = arange.unsqueeze(0).repeat(h, 1).unsqueeze(2)
    base_grid = torch.cat([arange, arange.transpose(1, 0)], dim=2)
    base_grid = base_grid.unsqueeze(0).repeat(n, 1, 1, 1)
    shift = torch.tensor(shifts, dtype=torch.float32).view(n, 1, 1, 2)
    shift *= 2.0 / (h + 2 * pad)
    grid = base_grid + shift
    return F.grid_sample(x, grid, padding_mode="zeros",
                         align_corners=False).numpy()


def test_random_shift_equals_reference_grid_sample():
    """Integer-crop implementation == the reference's grid_sample for every
    possible shift (the grid points land exactly on pixel centers)."""
    rng = np.random.default_rng(0)
    pad = 3
    x = rng.integers(0, 255, (4, 3, 16, 16)).astype(np.float32)  # NCHW
    shifts = rng.integers(0, 2 * pad + 1, (4, 2))
    want = torch_random_shift(x, shifts, pad)  # NCHW

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    padded = jnp.pad(x_nhwc, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge")

    # grid_sample x-coordinate is the W axis: shift[...,0] moves columns
    def crop(img, s):
        return jax.lax.dynamic_slice(img, (s[1], s[0], 0), (16, 16, 3))

    got = jax.vmap(crop)(padded, jnp.asarray(shifts))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-3)  # grid_sample fp32 rounding


def test_random_shift_aug_shapes_and_range():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 24, 24, 3)) * 255
    out = random_shift_aug(key, x, pad=4)
    assert out.shape == x.shape
    # content preserved up to shifting: same value multiset bounds
    assert float(out.min()) >= float(x.min()) - 1e-4
    assert float(out.max()) <= float(x.max()) + 1e-4
    # different keys give different shifts
    out2 = random_shift_aug(jax.random.PRNGKey(1), x, pad=4)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_resize_matches_torch_bilinear_antialias():
    torchvision_interp = pytest.importorskip("torch.nn.functional")
    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, (2, 24, 24, 3)).astype(np.float32)
    got = np.asarray(resize_images(jnp.asarray(x), 12))
    want = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), size=12,
                         mode="bilinear", antialias=True,
                         align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=0.51, rtol=0.02)


def test_scale_and_normalize():
    x = jnp.full((1, 4, 4, 3), 255.0)
    out = np.asarray(scale_and_normalize(x))
    want = (1.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_preprocess_camera_pipeline():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (2, 1, 24, 24, 3), 0, 255, jnp.int32
                           ).astype(jnp.uint8)
    out_train = preprocess_camera(key, x, size=16, shift_pad=2, train=True)
    out_eval = preprocess_camera(None, x, size=16, shift_pad=2, train=False)
    assert out_train.shape == out_eval.shape == (2, 1, 16, 16, 3)
    assert np.isfinite(np.asarray(out_train)).all()
    # eval path deterministic
    out_eval2 = preprocess_camera(None, x, size=16, shift_pad=2, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))


def test_relative_actions_matches_reference_formula():
    rng = np.random.default_rng(2)
    actions = rng.uniform(-1, 1, (5, 7)).astype(np.float32)
    robot_obs = rng.uniform(-1, 1, (5, 7)).astype(np.float32)
    got = np.asarray(relative_actions(jnp.asarray(actions),
                                      jnp.asarray(robot_obs),
                                      max_pos=0.02, max_orn=0.05))
    rel_pos = np.clip(actions[:, :3] - robot_obs[:, :3], -0.02, 0.02) / 0.02
    diff = actions[:, 3:6] - robot_obs[:, 3:6]
    rel_orn = np.clip((diff + np.pi) % (2 * np.pi) - np.pi, -0.05, 0.05) / 0.05
    want = np.concatenate([rel_pos, rel_orn, actions[:, -1:]], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)
