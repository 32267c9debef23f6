"""CLIP text tower in flax — the frozen language-goal encoder.

Re-design of the text path of the reference's vendored OpenAI CLIP
(/root/reference/mode/models/networks/clip.py:317-472): token embedding +
learned positional embedding -> pre-LN transformer with QuickGELU MLPs and a
causal mask -> final LayerNorm -> take the EOT-token feature -> text
projection (clip.py:418-431). The wrapper ``LangClip`` mirrors
clip_lang_encoder.py:15-37: frozen weights, ``forward(list[str]) ->
[B, 1, embed_dim]``.

The tower runs once per *new* instruction only — results are memoized by the
host-side ``LangEmbeddingCache`` (lang_cache.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .tokenizer import tokenize


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    # ViT-B/32 text defaults (the reference model-config default,
    # conf/config_calvin.yaml:12)
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    dtype: Any = jnp.float32


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """Equivalent of torch nn.MultiheadAttention self-attention; the text
    tower uses a causal mask, the vision towers none
    (clip.py ResidualAttentionBlock / Transformer attn_mask)."""

    width: int
    heads: int
    dtype: Any = jnp.float32
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        hd = C // self.heads
        qkv = nn.Dense(3 * C, name="in_proj", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.heads, hd)
        k = k.reshape(B, T, self.heads, hd)
        v = v.reshape(B, T, self.heads, hd)
        logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        logits = logits / np.sqrt(hd)
        if self.causal:
            mask = jnp.tril(jnp.ones((T, T), dtype=bool))
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        y = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, C)
        return nn.Dense(C, name="out_proj", dtype=self.dtype)(y)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        x = x + CLIPAttention(self.width, self.heads, self.dtype, self.causal,
                              name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1", dtype=self.dtype)(x))
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2", dtype=self.dtype)(x)
        h = nn.Dense(4 * self.width, name="c_fc", dtype=self.dtype)(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="c_proj", dtype=self.dtype)(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: [B, context_length] int32 -> [B, embed_dim]."""
        cfg = self.cfg
        tok_emb = self.param("token_embedding", nn.initializers.normal(0.02),
                             (cfg.vocab_size, cfg.width), jnp.float32)
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (cfg.context_length, cfg.width), jnp.float32)
        x = jnp.take(tok_emb, tokens, axis=0).astype(cfg.dtype)
        x = x + pos_emb[None].astype(cfg.dtype)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, cfg.dtype,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final", dtype=cfg.dtype)(x)
        # feature at the EOT token (highest token id, clip.py:429-431)
        eot_idx = jnp.argmax(tokens, axis=-1)
        feats = x[jnp.arange(x.shape[0]), eot_idx]
        text_proj = self.param("text_projection", nn.initializers.normal(0.02),
                               (cfg.width, cfg.embed_dim), jnp.float32)
        return feats @ text_proj.astype(cfg.dtype)


class LangClip:
    """Frozen language-goal encoder facade (clip_lang_encoder.py:15-37).

    ``__call__(texts: list[str]) -> np.ndarray [B, 1, embed_dim]``; runs the
    jitted tower on device, returns host arrays for caching.
    """

    def __init__(self, params: Mapping[str, Any],
                 cfg: CLIPTextConfig = CLIPTextConfig(),
                 model_name: str = "ViT-B/32"):
        self.cfg = cfg
        self.model_name = model_name
        self.model = CLIPTextModel(cfg)
        self.params = params
        self._apply = jax.jit(
            lambda tokens: self.model.apply({"params": self.params}, tokens))

    @classmethod
    def initialize_random(cls, key, cfg: CLIPTextConfig = CLIPTextConfig()):
        """Random-weight tower (for tests / training without published CLIP
        weights available offline)."""
        model = CLIPTextModel(cfg)
        params = model.init(key, jnp.zeros((1, cfg.context_length), jnp.int32))
        return cls(params["params"], cfg)

    def __call__(self, texts: List[str]) -> np.ndarray:
        tokens = tokenize(texts, self.cfg.context_length, truncate=True)
        emb = self._apply(jnp.asarray(tokens))
        return np.asarray(emb)[:, None, :]


# ---------------------------------------------------------------------------
# Checkpoint conversion (OpenAI CLIP state dict -> flax params)
# ---------------------------------------------------------------------------

def convert_clip_text(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Map the text-tower weights of an OpenAI CLIP state dict
    (clip.py:474-521 layout) onto CLIPTextModel params."""

    def np_(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t)

    sd = {k: np_(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "text_projection": sd["text_projection"],
        "ln_final": {"scale": sd["ln_final.weight"],
                     "bias": sd["ln_final.bias"]},
    }
    n_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks.")})
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}."
        params[f"resblocks_{i}"] = {
            "ln_1": {"scale": sd[p + "ln_1.weight"], "bias": sd[p + "ln_1.bias"]},
            "ln_2": {"scale": sd[p + "ln_2.weight"], "bias": sd[p + "ln_2.bias"]},
            "attn": {
                "in_proj": {"kernel": sd[p + "attn.in_proj_weight"].T,
                            "bias": sd[p + "attn.in_proj_bias"]},
                "out_proj": {"kernel": sd[p + "attn.out_proj.weight"].T,
                             "bias": sd[p + "attn.out_proj.bias"]},
            },
            "c_fc": {"kernel": sd[p + "mlp.c_fc.weight"].T,
                     "bias": sd[p + "mlp.c_fc.bias"]},
            "c_proj": {"kernel": sd[p + "mlp.c_proj.weight"].T,
                       "bias": sd[p + "mlp.c_proj.bias"]},
        }
    return params


def infer_text_config(state_dict: Mapping[str, Any]) -> CLIPTextConfig:
    """Infer CLIPTextConfig from a state dict (clip.py:497-507)."""
    width = state_dict["ln_final.weight"].shape[0]
    return CLIPTextConfig(
        vocab_size=state_dict["token_embedding.weight"].shape[0],
        context_length=state_dict["positional_embedding"].shape[0],
        width=width,
        heads=width // 64,
        layers=len({k.split(".")[2] for k in state_dict
                    if k.startswith("transformer.resblocks.")}),
        embed_dim=state_dict["text_projection"].shape[1],
    )


# The reference ships a second wrapper (LangClip2, clip_lang_encoder.py:40-58)
# that differs only in loading weights through the pip `clip` package; the
# call surface is identical here.
LangClip2 = LangClip
