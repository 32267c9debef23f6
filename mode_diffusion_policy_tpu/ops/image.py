"""On-device image preprocessing, fused into the jitted train/eval step.

The reference runs its per-camera pipelines (Resize 224 antialias ->
RandomShiftsAug -> /255 -> CLIP-Normalize, conf/datamodule/transforms/
calvin_transforms.yaml) inside torchvision on DataLoader workers. On TPU the
raw uint8 frames ship to the device and the whole pipeline is XLA — fused
with the encoder convs, zero host preprocessing cost.

RandomShiftsAug note: the DrQ-v2 implementation (reference
mode/utils/transforms.py:74-95) pads by replication then grid_samples with
*integer* shifts in [0, 2*pad] — the sampling points land exactly on pixel
centers, so it is exactly an integer-pixel crop of the replicate-padded
image. We implement it that way (dynamic_slice), which is both exact and far
cheaper than a gather-based grid_sample.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# CLIP normalization stats (calvin_transforms.yaml:9-11)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_images(x: jax.Array, size: int, *, antialias: bool = True,
                  method: str = "bilinear") -> jax.Array:
    """Resize [..., H, W, C] images to [..., size, size, C]
    (torchvision.transforms.Resize(size, antialias=True) semantics on square
    inputs)."""
    batch_shape = x.shape[:-3]
    C = x.shape[-1]
    if x.shape[-3] == size and x.shape[-2] == size:
        # same-size bilinear resize is the identity; skip the gather kernel
        return x.astype(jnp.float32)
    out_shape = batch_shape + (size, size, C)
    return jax.image.resize(x.astype(jnp.float32), out_shape, method=method,
                            antialias=antialias)


def random_shift_aug(key: jax.Array, x: jax.Array, pad: int) -> jax.Array:
    """DrQ-v2 random shift: replicate-pad by ``pad`` then crop at a random
    integer offset in [0, 2*pad], one shift per leading-batch element.
    x: [B, H, W, C] (H == W)."""
    B, H, W, C = x.shape
    padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    shifts = jax.random.randint(key, (B, 2), 0, 2 * pad + 1)

    def crop(img, s):
        return jax.lax.dynamic_slice(img, (s[0], s[1], 0), (H, W, C))

    return jax.vmap(crop)(padded, shifts)


def scale_and_normalize(x: jax.Array,
                        mean: Sequence[float] = CLIP_MEAN,
                        std: Sequence[float] = CLIP_STD) -> jax.Array:
    """uint8/float [0,255] -> scaled [0,1] -> normalized."""
    x = x.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def add_gaussian_noise(key, x, mean=0.0, std=1.0):
    """reference transforms.py:38-48."""
    return x + jax.random.normal(key, x.shape, x.dtype) * std + mean


def add_depth_noise(key, x, shape=1000.0, rate=1000.0):
    """Multiplicative gamma noise (reference transforms.py:51-66); one draw
    per call, as in the reference."""
    g = jax.random.gamma(key, shape) / rate
    return g * x


def preprocess_camera(key: Optional[jax.Array], x: jax.Array, *,
                      size: int = 224, shift_pad: int = 10,
                      train: bool = False,
                      mean: Sequence[float] = CLIP_MEAN,
                      std: Sequence[float] = CLIP_STD) -> jax.Array:
    """Full per-camera pipeline on raw uint8 [B, T, H, W, 3]:
    Resize -> (train) RandomShiftsAug -> /255 -> Normalize.
    Returns float32 [B, T, size, size, 3]."""
    B, T = x.shape[:2]
    flat = x.reshape((B * T,) + x.shape[2:])
    flat = resize_images(flat, size)
    if train and shift_pad > 0:
        assert key is not None
        flat = random_shift_aug(key, flat, shift_pad)
    flat = scale_and_normalize(flat, mean, std)
    return flat.reshape((B, T, size, size, 3))


def relative_actions(actions, robot_obs, max_pos: float = 0.02,
                     max_orn: float = 0.05):
    """Absolute -> relative actions (reference transforms.py:98-125).
    actions/robot_obs: [..., 7+]."""
    rel_pos = actions[..., :3] - robot_obs[..., :3]
    rel_pos = jnp.clip(rel_pos, -max_pos, max_pos) / max_pos
    diff = actions[..., 3:6] - robot_obs[..., 3:6]
    rel_orn = (diff + jnp.pi) % (2 * jnp.pi) - jnp.pi
    rel_orn = jnp.clip(rel_orn, -max_orn, max_orn) / max_orn
    gripper = actions[..., -1:]
    return jnp.concatenate([rel_pos, rel_orn, gripper], axis=-1)


def normalize_vector(x, mean=0.0, std=1.0):
    std = jnp.asarray(std, jnp.float32)
    std = jnp.where(std == 0.0, 1.0, std)
    return (x - jnp.asarray(mean, jnp.float32)) / std
