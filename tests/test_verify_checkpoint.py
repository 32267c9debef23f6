"""Self-test for the turnkey checkpoint-fidelity harness (VERDICT r2 #3):
utils/verify_checkpoint.py must pass its own gates on a random-weight
reference-shaped checkpoint, and fail loudly when the weights are corrupted.
"""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mode_diffusion_policy_tpu.utils import verify_checkpoint as vck
from mode_diffusion_policy_tpu.utils.torch_oracles import TorchFiLMResNetPolicy
from reference_oracle import load_reference_modedit

DIMS = dict(obs_dim=512, goal_dim=16, embed_dim=64, n_layers=2, n_heads=4,
            action_dim=7, action_seq_len=10)


def _make_checkpoint(tmp_path, seed=11):
    ref = load_reference_modedit()
    torch.manual_seed(seed)
    tdit = ref.MoDeDiT(
        obs_dim=DIMS["obs_dim"], goal_dim=DIMS["goal_dim"], device="cpu",
        goal_conditioned=True, action_dim=DIMS["action_dim"],
        embed_dim=DIMS["embed_dim"], embed_pdrob=0.0, attn_pdrop=0.3,
        n_layers=DIMS["n_layers"], n_heads=DIMS["n_heads"], goal_seq_len=1,
        obs_seq_len=1, action_seq_len=DIMS["action_seq_len"], state_dim=8,
        mlp_pdrop=0.1, goal_drop=0.1, cond_router=True, num_experts=4,
        top_k=2, router_normalize=True, use_argmax=False,
        use_shared_expert=False, use_noise_token_as_input=True,
        init_style="olmoe")
    with torch.no_grad():
        tdit.pos_emb.normal_(0, 0.02)
    sd = {}
    for k, v in tdit.state_dict().items():
        sd[f"model.inner_model.{k}"] = v
    g = torch.Generator().manual_seed(seed + 1)
    for enc in ("static_resnet", "gripper_resnet"):
        tenc = TorchFiLMResNetPolicy(DIMS["goal_dim"], depth=18)
        with torch.no_grad():
            for m in tenc.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.5, generator=g)
                    m.running_var.uniform_(0.5, 1.5, generator=g)
        for k, v in tenc.state_dict().items():
            sd[f"{enc}.{k}"] = v
    path = tmp_path / "epoch=1.ckpt"
    torch.save({"state_dict": sd}, path)
    return path


def test_verify_checkpoint_passes_on_faithful_weights(tmp_path):
    path = _make_checkpoint(tmp_path)
    out = tmp_path / "report.json"
    rc = vck.main(["--checkpoint", str(path), "--image-size", "32",
                   "--out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["pass"]
    names = {r["module"] for r in report["modules"]}
    assert {"encoder/static_resnet", "encoder/gripper_resnet",
            "dit/forward", "e2e/ddim_chunk (rel_action)",
            "e2e/routing_precompute"} <= names


def test_verify_checkpoint_catches_converter_drift(tmp_path, monkeypatch):
    """Both frameworks load the same file, so the harness's job is to catch
    CONVERTER regressions: perturb the jax-side conversion and the gates
    must fail."""
    from mode_diffusion_policy_tpu.utils import checkpoint_convert as cc
    path = _make_checkpoint(tmp_path, seed=13)
    real = cc.convert_modedit

    def drifted(*a, **kw):
        params = real(*a, **kw)
        k = params["blocks_0"]["attn"]["c_proj"]["kernel"]
        params["blocks_0"]["attn"]["c_proj"]["kernel"] = k * 1.35
        return params

    monkeypatch.setattr(cc, "convert_modedit", drifted)
    rc = vck.main(["--checkpoint", str(path), "--image-size", "32"])
    assert rc != 0


def test_infer_shape_helpers(tmp_path):
    from mode_diffusion_policy_tpu.utils.checkpoint_convert import (
        detect_layout, load_torch_checkpoint, normalize_state_dict)
    path = _make_checkpoint(tmp_path, seed=17)
    sd = normalize_state_dict(load_torch_checkpoint(str(path)))
    n_layers, n_experts, prefix = detect_layout(sd)
    shape = vck.infer_dit_shape(sd, prefix)
    assert (n_layers, n_experts) == (2, 4)
    assert shape["embed_dim"] == 64 and shape["n_heads"] == 4
    assert shape["obs_dim"] == 512 and shape["action_seq_len"] == 10
    assert vck.infer_resnet_depth(sd) == 18
