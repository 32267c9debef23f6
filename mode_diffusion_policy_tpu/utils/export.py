"""Checkpoint export: orbax TrainState -> cleaned safetensors + config.json
(+ optional HF hub upload), and JAX -> PyTorch-layout state dicts.

Re-design of the reference mode/utils/save_to_hf.py:97-155: the published
format is ``model_cleaned.safetensors`` with reference-style key names, so
models trained in this framework round-trip through the same tooling (and
back through utils/checkpoint_convert.py).
"""
from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import numpy as np

logger = logging.getLogger(__name__)


def modedit_params_to_torch_layout(params: Mapping[str, Any],
                                   prefix: str = "model.inner_model."
                                   ) -> Dict[str, np.ndarray]:
    """Inverse of checkpoint_convert.convert_modedit: flax pytree -> flat
    reference-named tensors (Linear kernels transposed back to [out,in],
    stacked experts unstacked, fused qkv split)."""
    out: Dict[str, np.ndarray] = {}
    p = prefix

    def dense(src_path: Dict, dst: str, bias: bool = True):
        out[f"{dst}.weight"] = np.asarray(src_path["kernel"]).T
        if bias and "bias" in src_path:
            out[f"{dst}.bias"] = np.asarray(src_path["bias"])

    dense(params["sigma_emb"], f"{p}sigma_emb")
    dense(params["sigma_linear"], f"{p}sigma_linear", bias=False)
    dense(params["tok_emb"], f"{p}tok_emb", bias=False)
    dense(params["goal_emb"], f"{p}goal_emb", bias=False)
    dense(params["action_emb"], f"{p}action_emb", bias=False)
    out[f"{p}pos_emb"] = np.asarray(params["pos_emb"])
    out[f"{p}ln.g"] = np.asarray(params["ln"]["g"])
    dense(params["out"], f"{p}out")

    i = 0
    while f"blocks_{i}" in params:
        blk = params[f"blocks_{i}"]
        b = f"{p}blocks.{i}."
        out[b + "ln_1.g"] = np.asarray(blk["ln_1"]["g"])
        out[b + "ln_2.g"] = np.asarray(blk["ln_2"]["g"])
        qkv_k = np.asarray(blk["attn"]["wqkv"]["kernel"])
        qkv_b = np.asarray(blk["attn"]["wqkv"]["bias"])
        D = qkv_k.shape[0]
        for j, name in enumerate(("query", "key", "value")):
            out[b + f"attn.{name}.weight"] = qkv_k[:, j * D:(j + 1) * D].T
            out[b + f"attn.{name}.bias"] = qkv_b[j * D:(j + 1) * D]
        out[b + "attn.c_proj.weight"] = np.asarray(
            blk["attn"]["c_proj"]["kernel"]).T
        out[b + "attn.q_norm.g"] = np.asarray(blk["attn"]["q_norm"]["g"])
        out[b + "attn.k_norm.g"] = np.asarray(blk["attn"]["k_norm"]["g"])
        out[b + "router.router.mlp.0.weight"] = np.asarray(
            blk["router"]["mlp"]["fc1"]["kernel"]).T
        out[b + "router.router.mlp.0.bias"] = np.asarray(
            blk["router"]["mlp"]["fc1"]["bias"])
        out[b + "router.router.mlp.3.weight"] = np.asarray(
            blk["router"]["mlp"]["fc2"]["kernel"]).T
        out[b + "router.router.mlp.3.bias"] = np.asarray(
            blk["router"]["mlp"]["fc2"]["bias"])
        w1 = np.asarray(blk["experts_w1"])
        b1 = np.asarray(blk["experts_b1"])
        w2 = np.asarray(blk["experts_w2"])
        for e in range(w1.shape[0]):
            eb = b + f"experts.expert_{e}."
            out[eb + "mlp.0.project.weight"] = w1[e].T
            out[eb + "mlp.0.project.bias"] = b1[e]
            out[eb + "mlp.2.weight"] = w2[e].T
        i += 1
    return out


def save_cleaned_checkpoint(params: Mapping[str, Any], out_dir: str,
                            config: Optional[Dict] = None,
                            model_card: Optional[str] = None) -> str:
    """Write model_cleaned.safetensors (+ config.json + README.md), the
    published-checkpoint format (save_to_hf.py:97-155)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    flat = modedit_params_to_torch_layout(params["inner_model"]) \
        if "inner_model" in params else dict(params)
    flat = {k: np.ascontiguousarray(v) for k, v in flat.items()}
    path = os.path.join(out_dir, "model_cleaned.safetensors")
    save_file(flat, path)
    if config is not None:
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    if model_card:
        with open(os.path.join(out_dir, "README.md"), "w") as f:
            f.write(model_card)
    logger.info("wrote %d tensors to %s", len(flat), path)
    return path


def push_to_hub(out_dir: str, repo_id: str, token: Optional[str] = None):
    """Upload an exported checkpoint dir to the HF hub
    (save_to_hf.py:142-155). Requires network access."""
    from huggingface_hub import HfApi
    api = HfApi(token=token)
    api.create_repo(repo_id, exist_ok=True)
    api.upload_folder(folder_path=out_dir, repo_id=repo_id)
    logger.info("uploaded %s to %s", out_dir, repo_id)


def main(argv=None):
    """CLI: export an orbax training run to the HF safetensors layout
    (reference save_to_hf.py:97-155). Usage:
        python -m mode_diffusion_policy_tpu.utils.export \
            --run-dir runs/mode_calvin --out-dir export/ [--repo-id user/x]
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--run-dir", required=True,
                    help="training run dir containing orbax checkpoints")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--repo-id", default=None,
                    help="optional HF hub repo to upload to (needs network)")
    ap.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="export the EMA weights (reference behavior); "
                         "--no-use-ema exports the raw params")
    args = ap.parse_args(argv)

    params = load_run_params(args.run_dir, use_ema=args.use_ema)
    save_cleaned_checkpoint(params, args.out_dir)
    if args.repo_id:
        push_to_hub(args.out_dir, args.repo_id)


def load_run_params(run_dir: str, use_ema: bool = True):
    """Restore the best (else latest) orbax checkpoint of a training run as
    a raw pytree and return its (EMA) params (Trainer layout:
    {run_dir}/saved_models[/best])."""
    import os

    import orbax.checkpoint as ocp

    base = os.path.join(os.path.abspath(run_dir), "saved_models")
    for sub in (os.path.join(base, "best"), base):
        if not os.path.isdir(sub):
            continue
        mngr = ocp.CheckpointManager(sub)
        step = mngr.latest_step()
        if step is None:
            continue
        raw = mngr.restore(step)
        ema = raw.get("ema_params")
        params = ema if (use_ema and ema) else raw["params"]
        logger.info("restored step %d from %s (ema=%s)", step, sub,
                    use_ema and bool(ema))
        return params
    raise FileNotFoundError(f"no orbax checkpoints under {base}")


if __name__ == "__main__":
    main()
