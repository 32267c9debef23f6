"""PyTorch checkpoint -> JAX parameter pytree conversion.

Maps the reference MoDE state dicts (Lightning .ckpt / HF
``model_cleaned.safetensors``, see /root/reference/mode/models/mode_agent.py:
134-265 for the reference's own remapping rules) onto this framework's
parameter layout. Linear ``weight`` tensors are transposed ([out,in] ->
[in,out] flax kernels), per-expert FFN weights are *stacked* along a leading
expert axis, and the per-head q/k/v projections are fused into one qkv kernel.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np


# the reference's own prefix remaps for published checkpoints
# (mode_agent.py:218-223)
_PREFIX_REMAPS = {
    "img_encoder_image_wrist.": "gripper_resnet.",
    "img_encoder_image_secondary.": "static_resnet.",
    "img_encoder_image_primary.": "static_resnet.",
    "net.": "gripper_resnet.resnet.",
}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def normalize_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Strip Lightning prefixes and apply the reference's historical key
    remaps; drop CLIP visual towers (mode_agent.py:209-226)."""
    out = {}
    for key, val in state_dict.items():
        if "visual" in key or "clip" in key.lower():
            continue
        for old, new in _PREFIX_REMAPS.items():
            if key.startswith(old):
                key = key.replace(old, new, 1)
                break
        out[key] = _np(val)
    return out


def convert_modedit(state_dict: Mapping[str, Any], n_layers: int,
                    num_experts: int, prefix: str = "model.inner_model.",
                    ) -> Dict[str, Any]:
    """Convert the reference MoDeDiT weights to this framework's flax params.

    Reference module paths (modedit.py:641-725):
      {p}sigma_emb / sigma_linear / tok_emb / goal_emb / action_emb / pos_emb
      {p}blocks.{i}.ln_1.g, .attn.{query,key,value,c_proj}, .attn.{q,k}_norm.g
      {p}blocks.{i}.router.router.mlp.{0,3}
      {p}blocks.{i}.experts.expert_{e}.mlp.{0.project,2}
      {p}ln.g, {p}out
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    p = prefix
    params: Dict[str, Any] = {}

    def dense(src: str, dst_path, bias: bool = True):
        _set(params, dst_path + ("kernel",), sd[f"{src}.weight"].T)
        if bias and f"{src}.bias" in sd:
            _set(params, dst_path + ("bias",), sd[f"{src}.bias"])

    dense(f"{p}sigma_emb", ("sigma_emb",))
    dense(f"{p}sigma_linear", ("sigma_linear",), bias=False)
    dense(f"{p}tok_emb", ("tok_emb",), bias=False)
    dense(f"{p}goal_emb", ("goal_emb",), bias=False)
    dense(f"{p}action_emb", ("action_emb",), bias=False)
    if f"{p}state_embed.weight" in sd:
        dense(f"{p}state_embed", ("state_embed",), bias=False)
    params["pos_emb"] = sd[f"{p}pos_emb"]
    params["ln"] = {"g": sd[f"{p}ln.g"]}
    dense(f"{p}out", ("out",))

    for i in range(n_layers):
        params[f"blocks_{i}"] = convert_block(sd, f"{p}blocks.{i}.",
                                              num_experts)

    return params


def convert_block(sd: Mapping[str, np.ndarray], b: str,
                  num_experts: int) -> Dict[str, Any]:
    """Convert one reference NoiseBlockMoE's weights (key prefix ``b``).

    num_experts = MLP-carrying experts only (shared and identity experts are
    not in the expert_{e} keyspace)."""
    blk: Dict[str, Any] = {}
    blk["ln_1"] = {"g": sd[b + "ln_1.g"]}
    blk["ln_2"] = {"g": sd[b + "ln_2.g"]}
    # fused qkv (reference has separate query/key/value Linears,
    # modedit.py:108-110)
    qw, kw, vw = (sd[b + f"attn.{n}.weight"] for n in ("query", "key", "value"))
    qb, kb, vb = (sd[b + f"attn.{n}.bias"] for n in ("query", "key", "value"))
    attn = {
        "wqkv": {"kernel": np.concatenate([qw.T, kw.T, vw.T], axis=1),
                 "bias": np.concatenate([qb, kb, vb])},
        "c_proj": {"kernel": sd[b + "attn.c_proj.weight"].T},
        "q_norm": {"g": sd[b + "attn.q_norm.g"]},
        "k_norm": {"g": sd[b + "attn.k_norm.g"]},
    }
    blk["attn"] = attn
    if b + "cross_att.query.weight" in sd:
        # block-level cross-attention (reference modedit.py:458-467):
        # separate q kernel, fused kv kernel over the context input
        qw = sd[b + "cross_att.query.weight"]
        kw, vw = sd[b + "cross_att.key.weight"], sd[b + "cross_att.value.weight"]
        qb = sd[b + "cross_att.query.bias"]
        kb, vb = sd[b + "cross_att.key.bias"], sd[b + "cross_att.value.bias"]
        blk["cross_att"] = {
            "wq": {"kernel": qw.T, "bias": qb},
            "wkv": {"kernel": np.concatenate([kw.T, vw.T], axis=1),
                    "bias": np.concatenate([kb, vb])},
            "c_proj": {"kernel": sd[b + "cross_att.c_proj.weight"].T},
            "q_norm": {"g": sd[b + "cross_att.q_norm.g"]},
            "k_norm": {"g": sd[b + "cross_att.k_norm.g"]},
        }
        blk["ln_3"] = {"g": sd[b + "ln_3.g"]}
    blk["router"] = {"mlp": {
        "fc1": {"kernel": sd[b + "router.router.mlp.0.weight"].T,
                "bias": sd[b + "router.router.mlp.0.bias"]},
        "fc2": {"kernel": sd[b + "router.router.mlp.3.weight"].T,
                "bias": sd[b + "router.router.mlp.3.bias"]},
    }}
    # stacked experts (reference Mlp: SwishGLU.project + out Linear,
    # modedit.py:220-265)
    blk["experts_w1"] = np.stack(
        [sd[b + f"experts.expert_{e}.mlp.0.project.weight"].T
         for e in range(num_experts)])
    blk["experts_b1"] = np.stack(
        [sd[b + f"experts.expert_{e}.mlp.0.project.bias"]
         for e in range(num_experts)])
    blk["experts_w2"] = np.stack(
        [sd[b + f"experts.expert_{e}.mlp.2.weight"].T
         for e in range(num_experts)])
    if b + "shared_mlp.mlp.0.project.weight" in sd:
        # shared expert (reference modedit.py:507-508)
        blk["shared_w1"] = sd[b + "shared_mlp.mlp.0.project.weight"].T
        blk["shared_b1"] = sd[b + "shared_mlp.mlp.0.project.bias"]
        blk["shared_w2"] = sd[b + "shared_mlp.mlp.2.weight"].T
    return blk


def detect_layout(state_dict: Mapping[str, Any]):
    """Infer (n_layers, num_experts, prefix) from a reference state dict."""
    keys = list(state_dict.keys())
    prefix = ""
    for k in keys:
        m = re.match(r"(.*?)blocks\.0\.ln_1\.g$", k)
        if m:
            prefix = m.group(1)
            break
    layers = set()
    experts = set()
    for k in keys:
        m = re.match(re.escape(prefix) + r"blocks\.(\d+)\.", k)
        if m:
            layers.add(int(m.group(1)))
        m = re.match(re.escape(prefix) + r"blocks\.\d+\.experts\.expert_(\d+)\.", k)
        if m:
            experts.add(int(m.group(1)))
    return (max(layers) + 1 if layers else 0,
            max(experts) + 1 if experts else 0, prefix)


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def extract_ema_state_dict(ckpt: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Replace trained weights with the EMA weights stored in Lightning
    callback state.

    The reference EMA callback stores ``ema_weights`` as a bare list of
    tensors ordered by ``model.named_parameters()`` (callbacks/ema.py:144-153)
    and the eval loader zips it back onto parameter names
    (evaluation/utils.py:92-103). torch's state_dict recurses modules in
    registration order emitting parameters before buffers per module, so the
    parameter-name order equals the state_dict keys with buffer keys
    (BN running stats / num_batches_tracked) filtered out.
    """
    sd = {k: _np(v) for k, v in ckpt["state_dict"].items()}
    ema_list = ckpt["callbacks"]["EMA"]["ema_weights"]
    param_names = [k for k in sd if not k.endswith(_BUFFER_SUFFIXES)]
    if len(param_names) != len(ema_list):
        raise ValueError(
            f"EMA weight count {len(ema_list)} != parameter count "
            f"{len(param_names)} — cannot align ema_weights to names")
    out = dict(sd)
    for name, w in zip(param_names, ema_list):
        out[name] = _np(w)
    return out


def load_lightning_checkpoint(path: str, use_ema: bool = True,
                              ) -> Dict[str, np.ndarray]:
    """Load a Lightning .ckpt into a numpy state dict, swapping in EMA
    weights from callback state when present (the published-checkpoint load
    path, reference evaluation/utils.py:64-103)."""
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    if use_ema and "ema_weights" in data.get("callbacks", {}).get("EMA", {}):
        return extract_ema_state_dict(data)
    return {k: _np(v) for k, v in data["state_dict"].items()}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a Lightning .ckpt, raw .pt, or safetensors file into numpy."""
    import os
    if path.endswith(".safetensors") or (
            os.path.isdir(path)):
        from safetensors.numpy import load_file
        if os.path.isdir(path):
            for cand in ("model_cleaned.safetensors", "model.safetensors"):
                f = os.path.join(path, cand)
                if os.path.exists(f):
                    return dict(load_file(f))
            raise FileNotFoundError(f"no safetensors found in {path}")
        return dict(load_file(path))
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("state_dict", data) if isinstance(data, dict) else data
    return {k: _np(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# FiLM-ResNet encoders
# ---------------------------------------------------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _convert_bn(sd, src, params_path, stats_path, params, stats):
    _set(params, params_path + ("scale",), sd[f"{src}.weight"])
    _set(params, params_path + ("bias",), sd[f"{src}.bias"])
    _set(stats, stats_path + ("mean",), sd[f"{src}.running_mean"])
    _set(stats, stats_path + ("var",), sd[f"{src}.running_var"])


def convert_film_resnet(state_dict: Mapping[str, Any], depth: int,
                        prefix: str = "", style: str = "policy"):
    """Convert reference FiLM-ResNet weights to this framework's layout.

    style='policy': FiLMResNet{18,34,50}Policy (pretrained_resnets.py) —
      timm backbone under ``{prefix}resnet.`` + ``{prefix}film{1..4}``.
    style='scratch': ResNetEncoderWithFiLM (resnets.py) — backbone modules at
      ``{prefix}`` top level + ``{prefix}film_module{1..4}.modulation.1`` + fc.

    Returns {'params': ..., 'batch_stats': ...}.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    stage_sizes = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}[depth]
    bottleneck = depth == 50
    bb = f"{prefix}resnet." if style == "policy" else prefix

    params.setdefault("resnet", {})
    stats.setdefault("resnet", {})
    _set(params, ("resnet", "conv1", "kernel"), _conv_w(sd[f"{bb}conv1.weight"]))
    _convert_bn(sd, f"{bb}bn1", ("resnet", "bn1"), ("resnet", "bn1"), params, stats)

    n_convs = 3 if bottleneck else 2
    for s, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            src = f"{bb}layer{s + 1}.{b}."
            dst = ("resnet", f"layer{s + 1}_{b}")
            for c in range(1, n_convs + 1):
                _set(params, dst + (f"conv{c}", "kernel"),
                     _conv_w(sd[src + f"conv{c}.weight"]))
                _convert_bn(sd, src + f"bn{c}", dst + (f"bn{c}",),
                            dst + (f"bn{c}",), params, stats)
            if src + "downsample.0.weight" in sd:
                _set(params, dst + ("downsample_conv", "kernel"),
                     _conv_w(sd[src + "downsample.0.weight"]))
                _convert_bn(sd, src + "downsample.1",
                            dst + ("downsample_bn",), dst + ("downsample_bn",),
                            params, stats)

    if style == "policy":
        for s in range(1, 5):
            for part in ("gamma", "beta"):
                _set(params, (f"film{s}_{part}", "kernel"),
                     sd[f"{prefix}film{s}.{part}.weight"].T)
                _set(params, (f"film{s}_{part}", "bias"),
                     sd[f"{prefix}film{s}.{part}.bias"])
    else:
        for s in range(1, 5):
            _set(params, (f"film_module{s}", "fc", "kernel"),
                 sd[f"{prefix}film_module{s}.modulation.1.weight"].T)
            _set(params, (f"film_module{s}", "fc", "bias"),
                 sd[f"{prefix}film_module{s}.modulation.1.bias"])
        if f"{prefix}fc.weight" in sd:
            _set(params, ("fc", "kernel"), sd[f"{prefix}fc.weight"].T)
            _set(params, ("fc", "bias"), sd[f"{prefix}fc.bias"])

    return {"params": params, "batch_stats": stats}
