"""FiLM-conditioned ResNet camera encoders in flax (NHWC, TPU-native).

Re-designs of the reference encoders:
- ``FiLMResNetPolicy`` (depths 18/34/50): ImageNet-style backbone with a FiLM
  layer after each of the 4 stages, ``(1+gamma)*x + beta`` with zero-init
  conditioning Linears — reference
  /root/reference/mode/models/perceptual_encoders/pretrained_resnets.py:5-138
  (ResNet-50 is the model-config default, conf/model/mode_agent.yaml:22).
- ``ResNetEncoderWithFiLM``: the scratch ResNet-18 variant with *per-block*
  FiLM (gamma*x + beta, non-zero init) driven by per-stage FilmModules —
  reference resnets.py:27-200.

TPU-first notes: NHWC layout throughout (MXU-friendly, torch OIHW weights are
transposed by the checkpoint converter); BatchNorm carries a ``batch_stats``
collection and takes ``axis_name`` for cross-replica statistics under
shard_map/pjit (replacing Lightning's sync_batchnorm,
training_calvin.py:102).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    block: str                     # 'basic' | 'bottleneck'
    stage_sizes: Tuple[int, ...]
    stage_widths: Tuple[int, ...] = (64, 128, 256, 512)

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @property
    def out_dim(self) -> int:
        return self.stage_widths[-1] * self.expansion


RESNET_SPECS = {
    18: ResNetSpec("basic", (2, 2, 2, 2)),
    34: ResNetSpec("basic", (3, 4, 6, 3)),
    50: ResNetSpec("bottleneck", (3, 4, 6, 3)),
}


def _conv(features, kernel, stride, name, dtype, use_bias=False):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=use_bias,
                   name=name, dtype=dtype)


def _bn(name, dtype, axis_name):
    # torch BatchNorm2d defaults: momentum .1 (flax: .9), eps 1e-5
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=name, dtype=dtype,
                        axis_name=axis_name)


def _apply_norm(x, name, dtype, axis_name, kind, train):
    """BatchNorm (reference parity) or GroupNorm(32) under the same param
    name ("bn*": both carry scale+bias; GN has no batch_stats).

    ``kind="group"`` is the training-mode swap SURVEY §2.3 blesses against
    the reference's ``sync_batchnorm: True`` (training_calvin.py:102): no
    running statistics, no cross-replica reduction, and — the round-5
    motivation — the backward pass loses BatchNorm's full-batch per-channel
    grad reductions (the largest remaining HBM-bound chunk of the train
    step, docs/PERF.md). Per-sample statistics also make train == eval
    graphs. Not checkpoint-compatible with published BN weights — use for
    from-scratch training only."""
    if kind == "group":
        return nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-5,
                            name=name, dtype=dtype)(x)
    if kind != "batch":
        raise ValueError(f"unknown encoder norm kind {kind!r} "
                         "(expected 'batch' or 'group')")
    return _bn(name, dtype, axis_name)(x, use_running_average=not train)


# ---------------------------------------------------------------------------
# Inference-time BatchNorm folding + space-to-depth stem
#
# ``folded=True`` modules consume params produced by ``fold_resnet_params``:
# every conv absorbs its BatchNorm (kernel*scale, bias=beta-mean*scale) so the
# inference graph is pure conv+bias, and the 7x7/2 stem is rewritten exactly
# as a 4x4/1 conv on a 2x2 space-to-depth input (3 -> 12 input channels),
# which maps far better onto the MXU (the raw stem runs at ~3/8 systolic
# occupancy because of the 3-channel input).
# ---------------------------------------------------------------------------

def space_to_depth_2x2(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel order (r_h, r_w, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def fold_stem_kernel(w7: jax.Array) -> jax.Array:
    """Exact rewrite of a 7x7 stride-2 pad-3 conv kernel [7,7,C,O] into the
    equivalent 4x4 stride-1 kernel [4,4,4C,O] over a 2x2 space-to-depth input
    (padding [(2,1),(2,1)]). Derivation: output o[i] = sum_k w[k] x[2i+k-3];
    substituting x~[j,r] = x[2j+r] gives k = 2(n-2)+r+3 = 2n+r-1 for kernel
    tap n in [0,4), i.e. the 7-tap kernel zero-padded to 8 and reshaped."""
    w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    kh, kw, C, O = w8.shape
    w = w8.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    return w.reshape(4, 4, 4 * C, O)


class QuantConv(nn.Module):
    """int8 inference conv for the BN-folded path: per-output-channel int8
    weights (``quantize_resnet_params``) + per-tensor symmetric activation
    quantization, with the conv itself running int8 x int8 -> int32 on the
    MXU (``preferred_element_type``). The dequant is a single fused
    scale+bias epilogue.

    Two activation-scale modes (measured on v5e, b=128 @224, docs/PERF.md):
    dynamic (per-tensor max |x| per call) is accuracy-safe but the extra
    reduction pass over every activation tensor erases the MXU win (18.6 vs
    17.9 ms for the 2x-ResNet-50 stage); *static* uses per-INPUT-channel
    ``act_scale`` params calibrated from a representative batch (the module
    sows per-channel ``calib/act_amax`` in dynamic mode for this). The
    channel scales are folded into the float kernel before weight
    quantization (``quantize_resnet_params(act_amax=...)``), so the requant
    is a single fusable per-channel multiply, the conv epilogue is just
    ``y * w_scale + bias``, and the per-channel resolution costs nothing at
    runtime. Trunk runs at 1.39x bf16 (12.96 vs 17.96 ms for the 2-encoder
    stage)."""

    features: int
    kernel: int
    stride: int = 1
    padding: Any = None      # default: SAME-style kernel//2
    dtype: Any = jnp.float32
    static_act: bool = False

    @nn.compact
    def __call__(self, x):
        k, O = self.kernel, self.features
        C = x.shape[-1]
        kq = self.param("kernel_q", nn.initializers.zeros, (k, k, C, O),
                        jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (O,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (O,), jnp.float32)
        if self.static_act:
            # per-input-channel amax from calibration; the matching 1/s_c is
            # already folded into kernel_q, so dequant needs no sx factor
            sx = self.param("act_scale", nn.initializers.ones, (C,),
                            jnp.float32) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                          -127, 127).astype(jnp.int8)
            post = scale
        else:
            amax_c = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1))
                             ).astype(jnp.float32)
            self.sow("calib", "act_amax", amax_c,
                     reduce_fn=lambda a, b: jnp.maximum(a, b) if a is not None
                     else b, init_fn=lambda: None)
            # per-channel RMS too: the clip-selection search builds
            # k*sigma_c candidate clips from it (quantize_encoders_for_
            # inference; amax alone over-spends int8 range on outliers)
            msq_c = jnp.mean(jnp.square(x.astype(jnp.float32)),
                             axis=tuple(range(x.ndim - 1)))
            self.sow("calib", "act_msq", msq_c,
                     reduce_fn=lambda a, b: jnp.maximum(a, b) if a is not None
                     else b, init_fn=lambda: None)
            sx = jnp.maximum(jnp.max(amax_c), 1e-6) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                          -127, 127).astype(jnp.int8)
            post = sx * scale
        pad = self.padding if self.padding is not None else [
            (k // 2, k // 2)] * 2
        y = jax.lax.conv_general_dilated(
            xq, kq, window_strides=(self.stride, self.stride), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * post + bias).astype(self.dtype)


def quantize_resnet_params(folded_params, act_amax=None,
                           headroom: float = 1.0, skip=()):
    """Quantize every folded conv kernel ([kh,kw,C,O] leaves) to symmetric
    per-output-channel int8; FiLM/fc Denses (2-d kernels) pass through in
    float. Consumed by the ``q8`` module variants.

    With ``act_amax`` (a tree of per-input-channel calibration maxima as
    sown by QuantConv dynamic mode, same nesting as the conv modules), the
    per-channel activation scales ``s_c = amax_c * headroom / 127`` are
    folded into each float kernel before weight quantization and stored as
    ``act_scale`` params — producing params for the fast ``q8="static"``
    modules.

    ``skip`` holds stage-name prefixes ("stem", "layer1".."layer4") whose
    convs stay in float — must match the module's ``q8_skip``."""

    def _skipped(name, skip, at_trunk):
        # the stem is the trunk-level "conv1"; blocks have their own conv1
        return (at_trunk and "stem" in skip and name == "conv1") or (
            at_trunk and any(name.startswith(s_) for s_ in skip
                             if s_ != "stem"))

    def walk(p, a, skip):
        at_trunk = any(k.startswith("layer1") for k in p)
        out = {}
        for name, sub in p.items():
            if _skipped(name, skip, at_trunk):
                out[name] = sub
            elif (isinstance(sub, dict) and "kernel" in sub
                    and sub["kernel"].ndim == 4):
                kf = sub["kernel"].astype(jnp.float32)
                entry = {}
                if a is not None and name in a:
                    amax_c = jnp.maximum(
                        jnp.asarray(a[name]["act_amax"], jnp.float32)
                        * headroom, 1e-6)
                    # fold s_c into the kernel: conv(w*s_c, x/s_c) == conv(w,x)
                    kf = kf * (amax_c / 127.0)[None, None, :, None]
                    entry["act_scale"] = amax_c
                wmax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
                s = jnp.maximum(wmax, 1e-12) / 127.0
                q = jnp.clip(jnp.round(kf / s), -127, 127).astype(jnp.int8)
                entry.update(kernel_q=q, scale=s,
                             bias=sub["bias"].astype(jnp.float32))
                out[name] = entry
            elif isinstance(sub, dict) and "kernel" not in sub:
                out[name] = walk(sub, a.get(name) if isinstance(a, dict)
                                 else None, skip)
            else:
                out[name] = sub
        return out

    return walk(folded_params, act_amax, tuple(skip))


def infer_q8_skip(qparams) -> Tuple[str, ...]:
    """Recover the ``skip`` stage list from a quantize_resnet_params tree
    (skipped convs kept their float "kernel" leaf) so q8 param trees are
    self-describing."""
    trunk = qparams.get("resnet", qparams)
    skip = []
    if "kernel" in trunk.get("conv1", {}):
        skip.append("stem")
    for stage in ("layer1", "layer2", "layer3", "layer4"):
        blocks = [v for k, v in trunk.items() if k.startswith(stage)]
        if blocks and all("kernel" in b.get("conv1", {}) for b in blocks):
            skip.append(stage)
    return tuple(skip)


def _fold_conv_bn(kernel, bn_params, bn_stats, eps=1e-5):
    """Fold inference BatchNorm into the preceding conv: returns
    (kernel * s, beta - mean * s) with s = gamma / sqrt(var + eps)."""
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return kernel * s, bn_params["bias"] - bn_stats["mean"] * s


def fold_resnet_params(params, batch_stats, eps=1e-5):
    """Fold every conv+BN pair in an encoder params tree (FiLMResNetPolicy or
    ResNetEncoderWithFiLM layout) and space-to-depth-transform the stem.
    Non-conv leaves (FiLM Denses, fc head) pass through unchanged."""

    def bn_for(name):
        if name == "downsample_conv":
            return "downsample_bn"
        if name.startswith("conv"):
            return "bn" + name[len("conv"):]
        return None

    def walk(p, s):
        out = {}
        for name, sub in p.items():
            bn = bn_for(name)
            if name.startswith("bn") or name == "downsample_bn":
                continue
            if bn is not None and bn in p:
                k, b = _fold_conv_bn(sub["kernel"], p[bn], s[bn], eps)
                out[name] = {"kernel": k, "bias": b}
            elif isinstance(sub, dict) and "kernel" not in sub:
                out[name] = walk(sub, s.get(name, {}) if isinstance(s, dict)
                                 else {})
            else:
                out[name] = sub
        return out

    folded = walk(params, batch_stats)
    trunk = folded["resnet"] if "resnet" in folded else folded
    trunk["conv1"] = {"kernel": fold_stem_kernel(trunk["conv1"]["kernel"]),
                      "bias": trunk["conv1"]["bias"]}
    return folded


class _BlockBase(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    folded: bool = False
    q8: Any = False           # False | True (dynamic act scales) | "static"
    norm: str = "batch"       # "batch" | "group" (see _apply_norm)

    def _cbn(self, x, features, kernel, stride, idx, train):
        """conv{idx} -> bn{idx}, or the BN-folded conv+bias when folded
        (int8 QuantConv when additionally q8)."""
        if self.folded:
            if self.q8:
                return QuantConv(features, kernel, stride,
                                 name=f"conv{idx}", dtype=self.dtype,
                                 static_act=self.q8 == "static")(x)
            return _conv(features, kernel, stride, f"conv{idx}", self.dtype,
                         use_bias=True)(x)
        out = _conv(features, kernel, stride, f"conv{idx}", self.dtype)(x)
        return _apply_norm(out, f"bn{idx}", self.dtype, self.axis_name,
                           self.norm, train)

    def _downsample(self, x, features, train):
        if self.folded:
            if self.q8:
                return QuantConv(features, 1, self.stride,
                                 name="downsample_conv", dtype=self.dtype,
                                 static_act=self.q8 == "static")(x)
            return _conv(features, 1, self.stride, "downsample_conv",
                         self.dtype, use_bias=True)(x)
        identity = _conv(features, 1, self.stride, "downsample_conv",
                         self.dtype)(x)
        return _apply_norm(identity, "downsample_bn", self.dtype,
                           self.axis_name, self.norm, train)


class BasicBlock(_BlockBase):

    @nn.compact
    def __call__(self, x, *, train: bool = False, film=None):
        identity = x
        out = nn.relu(self._cbn(x, self.planes, 3, self.stride, 1, train))
        out = self._cbn(out, self.planes, 3, 1, 2, train)
        if film is not None:
            # per-block FiLM: gamma*x + beta after bn2 (resnets.py:70-77)
            gamma, beta = film
            out = gamma[:, None, None, :] * out + beta[:, None, None, :]
        if self.has_downsample:
            identity = self._downsample(x, self.planes, train)
        return nn.relu(out + identity)


class Bottleneck(_BlockBase):

    @nn.compact
    def __call__(self, x, *, train: bool = False, film=None):
        identity = x
        out = nn.relu(self._cbn(x, self.planes, 1, 1, 1, train))
        # stride on the 3x3 (torchvision/timm v1.5 style)
        out = nn.relu(self._cbn(out, self.planes, 3, self.stride, 2, train))
        out = self._cbn(out, self.planes * 4, 1, 1, 3, train)
        if film is not None:
            gamma, beta = film
            out = gamma[:, None, None, :] * out + beta[:, None, None, :]
        if self.has_downsample:
            identity = self._downsample(x, self.planes * 4, train)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """Headless ResNet trunk; returns the pre-pool stage outputs."""

    spec: ResNetSpec
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    folded: bool = False
    q8: Any = False
    q8_skip: Tuple[str, ...] = ()   # stage names kept float: "stem","layer1"..
    norm: str = "batch"             # "batch" | "group" (see _apply_norm)

    @nn.compact
    def __call__(self, x, *, train: bool = False, stage_films=None,
                 block_films=None):
        """x: [B,H,W,3]. stage_films: optional per-stage (gamma,beta) applied
        AFTER each stage (timm-policy style). block_films: optional per-stage
        list of per-block (gamma,beta) applied inside each block (scratch
        ResNet-18 style)."""
        if self.folded:
            # exact space-to-depth rewrite of the 7x7/2 stem + folded BN
            x = space_to_depth_2x2(x)
            if self.q8 and "stem" not in self.q8_skip:
                x = QuantConv(64, 4, 1, padding=[(2, 1), (2, 1)],
                              name="conv1", dtype=self.dtype,
                              static_act=self.q8 == "static")(x)
            else:
                x = nn.Conv(64, (4, 4), strides=(1, 1),
                            padding=[(2, 1), (2, 1)], use_bias=True,
                            name="conv1", dtype=self.dtype)(x)
        else:
            x = _conv(64, 7, 2, "conv1", self.dtype)(x)
            x = _apply_norm(x, "bn1", self.dtype, self.axis_name, self.norm,
                            train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        Block = Bottleneck if self.spec.block == "bottleneck" else BasicBlock
        exp = self.spec.expansion
        in_ch = 64
        for s, (n_blocks, width) in enumerate(zip(self.spec.stage_sizes,
                                                  self.spec.stage_widths)):
            for b in range(n_blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                has_ds = (b == 0) and (stride != 1 or in_ch != width * exp)
                film = None
                if block_films is not None:
                    film = block_films[s][b]
                q8_b = (False if f"layer{s + 1}" in self.q8_skip
                        else self.q8)
                x = Block(width, stride, has_ds, self.dtype, self.axis_name,
                          self.folded, q8_b, self.norm,
                          name=f"layer{s + 1}_{b}")(x, train=train, film=film)
                in_ch = width * exp
            if stage_films is not None:
                gamma, beta = stage_films[s]
                # stage-level FiLM: (1+gamma)*x + beta (pretrained_resnets.py:19-23)
                x = (1.0 + gamma[:, None, None, :]) * x + beta[:, None, None, :]
        return x


class FiLMResNetPolicy(nn.Module):
    """FiLM-ResNet policy encoder: backbone + zero-init stage FiLM + GAP.

    forward(images [B,H,W,3], condition [B,cond_dim]) -> [B, out_dim]
    (out_dim 2048 for depth 50, 512 for 18/34) — matching the reference
    FiLMResNet{18,34,50}Policy (pretrained_resnets.py:25-138).
    """

    condition_dim: int
    depth: int = 50
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    folded: bool = False
    q8: Any = False
    q8_skip: Tuple[str, ...] = ()
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, condition, *, train: bool = False):
        spec = RESNET_SPECS[self.depth]
        if condition.ndim == 3:
            condition = condition[:, 0, :]
        condition = condition.astype(self.dtype)
        films = []
        zeros = nn.initializers.zeros
        for s, width in enumerate(spec.stage_widths):
            ch = width * spec.expansion
            gamma = nn.Dense(ch, kernel_init=zeros, bias_init=zeros,
                             name=f"film{s + 1}_gamma", dtype=self.dtype)(condition)
            beta = nn.Dense(ch, kernel_init=zeros, bias_init=zeros,
                            name=f"film{s + 1}_beta", dtype=self.dtype)(condition)
            films.append((gamma, beta))
        x = ResNetBackbone(spec, self.dtype, self.axis_name, self.folded,
                           self.q8, self.q8_skip, self.norm, name="resnet")(
            x.astype(self.dtype), train=train, stage_films=films)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> [B, out_dim]


class FilmModule(nn.Module):
    """SiLU -> Dense(4*hidden): emits two (gamma, beta) pairs per stage
    (reference resnets.py:27-44). Non-zero default init, matching the
    reference's commented-out zero init."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        h = nn.Dense(4 * self.hidden_size, name="fc", dtype=self.dtype)(
            jax.nn.silu(c))
        first, second = jnp.split(h, 2, axis=-1)
        g1, b1 = jnp.split(first, 2, axis=-1)
        g2, b2 = jnp.split(second, 2, axis=-1)
        return [(g1, b1), (g2, b2)]


class ResNetEncoderWithFiLM(nn.Module):
    """Scratch ResNet-18 with per-block FiLM and a projection head
    (reference resnets.py:91-200). forward(x [B,H,W,3] or [B,T,H,W,3],
    cond [B,cond_dim]) -> [B, latent_dim] (or [B,T,latent_dim])."""

    condition_dim: int
    latent_dim: int = 512
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    folded: bool = False
    q8: Any = False
    q8_skip: Tuple[str, ...] = ()
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, condition=None, *, train: bool = False):
        spec = RESNET_SPECS[18]
        time_series = x.ndim == 5
        if time_series:
            B, T = x.shape[:2]
            x = x.reshape((B * T,) + x.shape[2:])
            if condition is not None:
                condition = jnp.concatenate([condition] * T, axis=0)
        block_films = None
        if condition is not None:
            if condition.ndim == 3:
                condition = condition[:, 0, :]
            condition = condition.astype(self.dtype)
            block_films = []
            for s, width in enumerate(spec.stage_widths):
                block_films.append(
                    FilmModule(width, self.dtype, name=f"film_module{s + 1}")(
                        condition))
        x = ResNetBackbone(spec, self.dtype, self.axis_name, self.folded,
                           self.q8, self.q8_skip, self.norm, name="resnet")(
            x.astype(self.dtype), train=train, block_films=block_films)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.latent_dim, name="fc", dtype=self.dtype)(x)
        if time_series:
            x = x.reshape(B, T, self.latent_dim)
        return x


class NoEncoder(nn.Module):
    """Identity passthrough (reference no_encoder.py:6-12)."""

    @nn.compact
    def __call__(self, x, condition=None, *, train: bool = False):
        return x


class ResNetTokenEncoderWithFiLM(ResNetEncoderWithFiLM):
    """Token-output variant of the scratch FiLM ResNet-18 (reference
    resnets.py:204-304 — identical computation with a smaller projection
    head; latent_dim defaults to 128 there)."""

    latent_dim: int = 128
