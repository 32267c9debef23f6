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

import math
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
                      std: Sequence[float] = CLIP_STD,
                      jitter: Optional[dict] = None,
                      erasing: Optional[dict] = None) -> jax.Array:
    """Full per-camera pipeline on raw uint8 [B, T, H, W, 3]:
    Resize -> (train) RandomShiftsAug -> /255 -> (train) ColorJitter ->
    (train) RandomErasing -> Normalize. Returns float32 [B,T,size,size,3].

    jitter/erasing: optional kwarg dicts for color_jitter / random_erasing,
    enabled by transform configs naming RobustColorJitter /
    RobustRandomErasing (reference transforms.py:144-169; unused by the
    default configs)."""
    B, T = x.shape[:2]
    flat = x.reshape((B * T,) + x.shape[2:])
    flat = resize_images(flat, size)
    if train:
        # derive independent streams up front — random_shift_aug consumes
        # its key, so reusing it for the jitter/erasing splits would violate
        # the no-key-reuse contract
        assert key is not None
        k_shift, k_jit, k_erase = jax.random.split(key, 3)
    if train and shift_pad > 0:
        flat = random_shift_aug(k_shift, flat, shift_pad)
    flat = flat.astype(jnp.float32) / 255.0
    if train and jitter is not None:
        flat = color_jitter(k_jit, flat, **jitter)
    if train and erasing is not None:
        flat = random_erasing(k_erase, flat, **erasing)
    flat = (flat - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return flat.reshape((B, T, size, size, 3))


# ---------------------------------------------------------------------------
# Color jitter (reference RobustColorJitter, transforms.py:144-155 — a
# torchvision.transforms.ColorJitter wrapper; semantics reimplemented from
# torchvision's functional definitions on float images in [0, 1])
# ---------------------------------------------------------------------------

def rgb_to_grayscale(x: jax.Array) -> jax.Array:
    """ITU-R 601-2 luma (torchvision rgb_to_grayscale). x: [..., 3]."""
    w = jnp.asarray([0.2989, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def _blend(img1: jax.Array, img2: jax.Array, ratio: jax.Array) -> jax.Array:
    # torchvision _blend: ratio*img1 + (1-ratio)*img2, clamped to [0, 1]
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def rgb_to_hsv(x: jax.Array) -> jax.Array:
    """[..., 3] RGB in [0,1] -> HSV in [0,1] (hue wraps), matching
    colorsys/torchvision conventions."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(x: jax.Array) -> jax.Array:
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(key: jax.Array, x: jax.Array, *, brightness: float = 0.3,
                 contrast: float = 0.3, saturation: float = 0.3,
                 hue: float = 0.1) -> jax.Array:
    """torchvision ColorJitter semantics on [B, H, W, 3] floats in [0, 1]:
    brightness/contrast/saturation factors ~ U[max(0, 1-a), 1+a], hue shift
    ~ U[-hue, hue], the four ops applied in a random order. The reference
    applies the transform per sample in DataLoader workers, so factors and
    order are drawn PER IMAGE here (reference transforms.py:144-155)."""
    B = x.shape[0]
    k_b, k_c, k_s, k_h, k_o = jax.random.split(key, 5)
    shp = (B, 1, 1, 1)
    fb = jax.random.uniform(k_b, shp, minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(k_c, shp, minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(k_s, shp, minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(k_h, shp[:1] + (1, 1), minval=-hue, maxval=hue)

    def do_brightness(img):
        return _blend(img, jnp.zeros_like(img), fb)

    def do_contrast(img):
        mean = jnp.mean(rgb_to_grayscale(img), axis=(1, 2, 3), keepdims=True)
        return _blend(img, mean, fc)

    def do_saturation(img):
        return _blend(img, jnp.broadcast_to(rgb_to_grayscale(img), img.shape),
                      fs)

    def do_hue(img):
        hsv = rgb_to_hsv(img)
        h = (hsv[..., 0] + fh) % 1.0
        return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))

    ops = [do_brightness, do_contrast, do_saturation, do_hue]
    # one random op order per call (torchvision permutes per __call__); a
    # per-image order would need a 4-deep vmapped switch for no statistical
    # gain at training scale
    perm = jax.random.permutation(k_o, 4)
    for step in range(4):
        x = jax.lax.switch(perm[step], ops, x)
    return x


def random_erasing(key: jax.Array, x: jax.Array, *, p: float = 0.2,
                   scale: Tuple[float, float] = (0.02, 0.33),
                   ratio: Tuple[float, float] = (0.3, 3.3),
                   value: float = 0.0, attempts: int = 10) -> jax.Array:
    """torchvision RandomErasing semantics, jit-safe (reference
    RobustRandomErasing, transforms.py:156-169): per image, with probability
    ``p``, zero a rectangle whose area ~ U(scale)*H*W and aspect ~
    exp(U(log ratio)); like torchvision, up to ``attempts`` candidates are
    drawn and the first that fits is used (no erase if none fits).
    x: [B, H, W, C]."""
    B, H, W, _ = x.shape
    k_apply, k_cand = jax.random.split(key)
    ks = jax.random.split(k_cand, 4)
    area = jax.random.uniform(ks[0], (B, attempts), minval=scale[0],
                              maxval=scale[1]) * (H * W)
    log_r = jax.random.uniform(ks[1], (B, attempts),
                               minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_r)
    h = jnp.round(jnp.sqrt(area * aspect)).astype(jnp.int32)
    w = jnp.round(jnp.sqrt(area / aspect)).astype(jnp.int32)
    valid = (h < H) & (w < W) & (h > 0) & (w > 0)
    pick = jnp.argmax(valid, axis=1)                      # first valid
    any_valid = jnp.any(valid, axis=1)
    h = jnp.take_along_axis(h, pick[:, None], 1)[:, 0]
    w = jnp.take_along_axis(w, pick[:, None], 1)[:, 0]
    u_i = jax.random.uniform(ks[2], (B,))
    u_j = jax.random.uniform(ks[3], (B,))
    i0 = (u_i * (H - h + 1).astype(jnp.float32)).astype(jnp.int32)
    j0 = (u_j * (W - w + 1).astype(jnp.float32)).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]                   # [1,H,1]
    cols = jnp.arange(W)[None, None, :]                   # [1,1,W]
    inside = ((rows >= i0[:, None, None]) & (rows < (i0 + h)[:, None, None])
              & (cols >= j0[:, None, None]) & (cols < (j0 + w)[:, None, None]))
    apply = (jax.random.uniform(k_apply, (B,)) < p) & any_valid
    mask = inside & apply[:, None, None]
    return jnp.where(mask[..., None], jnp.asarray(value, x.dtype), x)


def random_word_dropout(key: jax.Array, x: jax.Array, p: float = 0.1):
    """Elementwise Bernoulli zeroing of the language embedding, probability
    ``p``, no rescaling (reference RandomWordDropout, transforms.py:181-187)."""
    mask = jax.random.uniform(key, x.shape) > p
    return x * mask.astype(x.dtype)


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
