"""CLIP visual towers in flax: VisionTransformer and ModifiedResNet.

Re-design of the image path of the reference's vendored OpenAI CLIP
(/root/reference/mode/models/networks/clip.py:47-315):

- ``CLIPVisionTransformer`` (clip.py:273-315): patch conv -> [class token;
  patches] + positional embedding -> ln_pre -> pre-LN transformer (no causal
  mask) -> ln_post on the class token -> projection.
- ``ModifiedResNet`` (clip.py:47-215): 3-conv stem with an avgpool (no
  maxpool), anti-aliased strides (avgpool before every stride-2 conv), and a
  QKV attention pool instead of GAP (clip.py:97-133).

The reference only exercises the text tower at runtime (goal embedding), so
these exist for full vendored-component parity: ``encode_image`` on real
ViT-B/32 / RN50 checkpoints via ``convert_clip_visual``. BatchNorms run with
their running statistics (CLIP visual weights are frozen/eval everywhere in
the reference, clip_lang_encoder.py:23-28).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .clip_text import ResidualAttentionBlock


# ---------------------------------------------------------------------------
# Vision transformer (clip.py:273-315)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: Any = jnp.float32


class CLIPVisionTransformer(nn.Module):
    cfg: CLIPViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, 3] NHWC float -> [B, output_dim]."""
        cfg = self.cfg
        scale = cfg.width ** -0.5
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    padding="VALID", name="conv1", dtype=cfg.dtype)(
            x.astype(cfg.dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.width)                      # [B, grid^2, W]
        cls = self.param("class_embedding", nn.initializers.normal(scale),
                         (cfg.width,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (B, 1, cfg.width)), x],
            axis=1)
        n_tok = (cfg.input_resolution // cfg.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(scale),
                         (n_tok, cfg.width), jnp.float32)
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre", dtype=cfg.dtype)(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, cfg.dtype,
                                       causal=False,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post", dtype=cfg.dtype)(
            x[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(scale),
                          (cfg.width, cfg.output_dim), jnp.float32)
        return x @ proj.astype(cfg.dtype)


# ---------------------------------------------------------------------------
# ModifiedResNet (clip.py:47-215)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)   # RN50
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64
    dtype: Any = jnp.float32


def _cbn(x, features, kernel, stride, pad, name, dtype):
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)], use_bias=False,
                name=f"{name}_conv", dtype=dtype)(x)
    # frozen/eval BatchNorm: CLIP visual weights always run with running
    # stats in the reference (the tower is frozen, clip_lang_encoder.py:23)
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        name=f"{name}_bn", dtype=dtype)(x)


class CLIPBottleneck(nn.Module):
    """clip.py:47-95: all convs stride 1; avgpool after conv2 when stride>1;
    downsample = avgpool -> 1x1 conv -> BN."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.relu(_cbn(x, self.planes, 1, 1, 0, "c1", self.dtype))
        out = nn.relu(_cbn(out, self.planes, 3, 1, 1, "c2", self.dtype))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride),
                              (self.stride, self.stride))
        out = _cbn(out, self.planes * 4, 1, 1, 0, "c3", self.dtype)
        if self.has_downsample:
            identity = x
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       (self.stride, self.stride))
            identity = _cbn(identity, self.planes * 4, 1, 1, 0, "ds",
                            self.dtype)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """clip.py:97-133: [mean; HW tokens] + pos emb, one MHA step, return the
    mean-token output. Only the query for token 0 is computed (equivalent)."""

    embed_dim: int
    heads: int
    output_dim: int
    n_tokens: int            # spacial_dim**2 + 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] -> [B, output_dim]."""
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (self.n_tokens, C), jnp.float32)
        x = x + pos[None].astype(x.dtype)
        hd = C // self.heads
        q = nn.Dense(C, name="q_proj", dtype=self.dtype)(x[:, :1])
        k = nn.Dense(C, name="k_proj", dtype=self.dtype)(x)
        v = nn.Dense(C, name="v_proj", dtype=self.dtype)(x)
        q = q.reshape(B, 1, self.heads, hd)
        k = k.reshape(B, -1, self.heads, hd)
        v = v.reshape(B, -1, self.heads, hd)
        logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        logits = logits / np.sqrt(hd)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        y = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, C)
        return nn.Dense(self.output_dim, name="c_proj", dtype=self.dtype)(y)


class ModifiedResNet(nn.Module):
    cfg: ModifiedResNetConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, 3] NHWC float -> [B, output_dim]."""
        cfg = self.cfg
        w = cfg.width
        x = x.astype(cfg.dtype)
        # 3-conv stem + avgpool (clip.py:150-157,179-184)
        x = nn.relu(_cbn(x, w // 2, 3, 2, 1, "stem1", cfg.dtype))
        x = nn.relu(_cbn(x, w // 2, 3, 1, 1, "stem2", cfg.dtype))
        x = nn.relu(_cbn(x, w, 3, 1, 1, "stem3", cfg.dtype))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        in_ch = w
        for s, n_blocks in enumerate(cfg.layers):
            planes = w * (2 ** s)
            for b in range(n_blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                has_ds = (b == 0) and (stride > 1 or in_ch != planes * 4)
                x = CLIPBottleneck(planes, stride, has_ds, cfg.dtype,
                                   name=f"layer{s + 1}_{b}")(x)
                in_ch = planes * 4
        embed_dim = w * 32
        n_tok = (cfg.input_resolution // 32) ** 2 + 1
        return AttentionPool2d(embed_dim, cfg.heads, cfg.output_dim, n_tok,
                               cfg.dtype, name="attnpool")(x)


# ---------------------------------------------------------------------------
# Checkpoint conversion (OpenAI CLIP state dict -> flax params/batch_stats)
# ---------------------------------------------------------------------------

def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def infer_visual_config(state_dict: Mapping[str, Any]):
    """Mirror clip.py build_model's architecture sniffing (clip.py:476-496).
    Returns ('vit', CLIPViTConfig) or ('resnet', ModifiedResNetConfig)."""
    sd = state_dict
    if "visual.proj" in sd:
        width = sd["visual.conv1.weight"].shape[0]
        patch = sd["visual.conv1.weight"].shape[-1]
        layers = len({k.split(".")[3] for k in sd
                      if k.startswith("visual.transformer.resblocks.")})
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        return "vit", CLIPViTConfig(
            input_resolution=patch * grid, patch_size=patch, width=width,
            layers=layers, heads=width // 64,
            output_dim=sd["visual.proj"].shape[1])
    counts = []
    for b in (1, 2, 3, 4):
        blocks = {k.split(".")[2] for k in sd
                  if k.startswith(f"visual.layer{b}.")}
        counts.append(len(blocks))
    width = sd["visual.layer1.0.conv1.weight"].shape[0]
    embed_dim = width * 32
    output_dim = sd["visual.attnpool.c_proj.weight"].shape[0]
    spacial = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1)
                    ** 0.5)
    return "resnet", ModifiedResNetConfig(
        layers=tuple(counts), output_dim=output_dim,
        heads=embed_dim // 64, input_resolution=spacial * 32, width=width)


def _conv_k(wt):
    return _np(wt).transpose(2, 3, 1, 0)      # OIHW -> HWIO


def _bn(sd, prefix):
    return ({"scale": _np(sd[prefix + ".weight"]),
             "bias": _np(sd[prefix + ".bias"])},
            {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])})


def convert_clip_visual(state_dict: Mapping[str, Any]):
    """OpenAI CLIP state dict -> (kind, config, variables) for the flax
    visual tower. ``variables`` carries params (+ batch_stats for RN)."""
    kind, cfg = infer_visual_config(state_dict)
    sd = {k[len("visual."):]: v for k, v in state_dict.items()
          if k.startswith("visual.")}
    if kind == "vit":
        params: Dict[str, Any] = {
            "conv1": {"kernel": _conv_k(sd["conv1.weight"])},
            "class_embedding": _np(sd["class_embedding"]),
            "positional_embedding": _np(sd["positional_embedding"]),
            "ln_pre": {"scale": _np(sd["ln_pre.weight"]),
                       "bias": _np(sd["ln_pre.bias"])},
            "ln_post": {"scale": _np(sd["ln_post.weight"]),
                        "bias": _np(sd["ln_post.bias"])},
            "proj": _np(sd["proj"]),
        }
        for i in range(cfg.layers):
            p = f"transformer.resblocks.{i}."
            params[f"resblocks_{i}"] = {
                "ln_1": {"scale": _np(sd[p + "ln_1.weight"]),
                         "bias": _np(sd[p + "ln_1.bias"])},
                "ln_2": {"scale": _np(sd[p + "ln_2.weight"]),
                         "bias": _np(sd[p + "ln_2.bias"])},
                "attn": {
                    "in_proj": {"kernel": _np(sd[p + "attn.in_proj_weight"]).T,
                                "bias": _np(sd[p + "attn.in_proj_bias"])},
                    "out_proj": {"kernel": _np(sd[p + "attn.out_proj.weight"]).T,
                                 "bias": _np(sd[p + "attn.out_proj.bias"])},
                },
                "c_fc": {"kernel": _np(sd[p + "mlp.c_fc.weight"]).T,
                         "bias": _np(sd[p + "mlp.c_fc.bias"])},
                "c_proj": {"kernel": _np(sd[p + "mlp.c_proj.weight"]).T,
                           "bias": _np(sd[p + "mlp.c_proj.bias"])},
            }
        return kind, cfg, {"params": params}

    params = {}
    stats: Dict[str, Any] = {}
    for i, torch_name in enumerate(["conv1", "conv2", "conv3"], start=1):
        bn_p, bn_s = _bn(sd, f"bn{i}")
        params[f"stem{i}_conv"] = {"kernel": _conv_k(sd[f"{torch_name}.weight"])}
        params[f"stem{i}_bn"] = bn_p
        stats[f"stem{i}_bn"] = bn_s
    for s, n_blocks in enumerate(cfg.layers):
        for b in range(n_blocks):
            p = f"layer{s + 1}.{b}."
            name = f"layer{s + 1}_{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for j in (1, 2, 3):
                bn_p, bn_s = _bn(sd, p + f"bn{j}")
                bp[f"c{j}_conv"] = {"kernel": _conv_k(sd[p + f"conv{j}.weight"])}
                bp[f"c{j}_bn"] = bn_p
                bs[f"c{j}_bn"] = bn_s
            if p + "downsample.0.weight" in sd:
                bn_p, bn_s = _bn(sd, p + "downsample.1")
                bp["ds_conv"] = {"kernel": _conv_k(sd[p + "downsample.0.weight"])}
                bp["ds_bn"] = bn_p
                bs["ds_bn"] = bn_s
            params[name] = bp
            stats[name] = bs
    ap = "attnpool."
    params["attnpool"] = {
        "positional_embedding": _np(sd[ap + "positional_embedding"]),
        "q_proj": {"kernel": _np(sd[ap + "q_proj.weight"]).T,
                   "bias": _np(sd[ap + "q_proj.bias"])},
        "k_proj": {"kernel": _np(sd[ap + "k_proj.weight"]).T,
                   "bias": _np(sd[ap + "k_proj.bias"])},
        "v_proj": {"kernel": _np(sd[ap + "v_proj.weight"]).T,
                   "bias": _np(sd[ap + "v_proj.bias"])},
        "c_proj": {"kernel": _np(sd[ap + "c_proj.weight"]).T,
                   "bias": _np(sd[ap + "c_proj.bias"])},
    }
    return kind, cfg, {"params": params, "batch_stats": stats}


def encode_image(variables, images: jax.Array, kind: str, cfg) -> jax.Array:
    """CLIP.encode_image (clip.py:415-416): images NHWC -> [B, output_dim]."""
    model = (CLIPVisionTransformer(cfg) if kind == "vit"
             else ModifiedResNet(cfg))
    return model.apply(variables, images)
