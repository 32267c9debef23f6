"""Turnkey published-checkpoint fidelity harness.

One command that converts a published PyTorch MoDE checkpoint (safetensors
dir / Lightning .ckpt / raw .pt), rebuilds the SAME model in both frameworks
— PyTorch via the reference implementation (loaded as an oracle from
``--reference-repo``, never imported by the runtime), JAX via this
framework's converter — runs identical fixed inputs through a per-module
ladder plus the full 10-step DDIM action chunk, and prints per-module + e2e
MAE against the BASELINE fidelity gate (rel_action MAE <= 1e-3).

This converts the environment-blocked "validate vs the published HF
checkpoints" target into a five-minute task the moment weight files are
available (VERDICT r2 next-round #3), and continuously de-risks converter
drift: tests/test_verify_checkpoint.py runs this exact CLI against a
random-weight reference-shaped checkpoint.

Reference loader semantics being validated:
/root/reference/mode/models/mode_agent.py:134-265 (prefix remaps + reshape),
export layout mode/utils/save_to_hf.py:97-155.

Usage:
    python -m mode_diffusion_policy_tpu.utils.verify_checkpoint \
        --checkpoint <MoDE_CALVIN_D dir | .ckpt | .pt> \
        [--clip ViT-B-32.pt] [--reference-repo /root/reference] \
        [--tolerance 1e-3] [--image-size 112] [--out report.json]
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import logging
import sys
import types
from pathlib import Path
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

GATE_DEFAULT = 1e-3


# ---------------------------------------------------------------------------
# reference-repo oracle loading (file-path imports with stubs for the heavy
# unused deps, mirroring the test-suite's oracle loaders)
# ---------------------------------------------------------------------------

def _stub(name, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def _load_file_module(path: Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_stack(reference_repo: str):
    """(modedit, score_wrappers, gc_sampling) torch modules from the
    reference repo, with stubs for torchsde/torchdiffeq/tqdm/hydra."""
    root = Path(reference_repo)
    if not (root / "mode").exists():
        raise FileNotFoundError(
            f"--reference-repo {reference_repo} has no mode/ package")
    _stub("torchsde", BrownianTree=object)
    _stub("torchdiffeq", odeint=lambda *a, **k: None)

    class _T:
        def __init__(self, it=None, total=None, disable=None):
            self.it = it

        def __iter__(self):
            return iter(self.it)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def update(self, *a):
            pass

    _stub("tqdm", trange=lambda n, disable=None: _T(range(n)),
          tqdm=lambda *a, **k: _T(*a))
    _stub("tqdm.auto", trange=lambda n, disable=None: _T(range(n)),
          tqdm=lambda *a, **k: _T(*a))
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        _stub("matplotlib", pyplot=None)
        _stub("matplotlib.pyplot")
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hydra.utils = types.ModuleType("hydra.utils")
        hydra.utils.instantiate = lambda x: x
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hydra.utils

    edm = root / "mode" / "models" / "edm_diffusion"
    pkg = types.ModuleType("vck_refedm")
    pkg.__path__ = [str(edm)]
    sys.modules["vck_refedm"] = pkg
    for name in ("utils", "score_wrappers", "gc_sampling"):
        spec = importlib.util.spec_from_file_location(
            f"vck_refedm.{name}", edm / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"vck_refedm.{name}"] = mod
        spec.loader.exec_module(mod)
    modedit = _load_file_module(
        root / "mode" / "models" / "networks" / "modedit.py", "vck_modedit")
    return (modedit, sys.modules["vck_refedm.score_wrappers"],
            sys.modules["vck_refedm.gc_sampling"])


# ---------------------------------------------------------------------------
# model-shape inference from the converted state dict
# ---------------------------------------------------------------------------

def infer_dit_shape(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, int]:
    """Derive the MoDeDiT hyperparameters from weight shapes (torch Linear
    weights are [out, in]; reference module paths in convert_modedit)."""
    p = prefix
    D = sd[f"{p}ln.g"].shape[-1]
    head_dim = sd[f"{p}blocks.0.attn.q_norm.g"].shape[-1]
    seq = sd[f"{p}pos_emb"].shape[1]
    return {
        "embed_dim": int(D),
        "obs_dim": int(sd[f"{p}tok_emb.weight"].shape[1]),
        "goal_dim": int(sd[f"{p}goal_emb.weight"].shape[1]),
        "action_dim": int(sd[f"{p}action_emb.weight"].shape[1]),
        "n_heads": int(D // head_dim),
        # seq_size = goal_seq_len + obs_seq_len - 1 + action_seq_len
        # (modedit.py:682); published checkpoints use goal/obs seq len 1
        "action_seq_len": int(seq - 1),
    }


def infer_resnet_depth(sd: Dict[str, np.ndarray],
                       enc: str = "static_resnet") -> Optional[int]:
    if f"{enc}.resnet.conv1.weight" not in sd:
        return None
    if f"{enc}.resnet.layer1.0.conv3.weight" in sd:
        return 50
    return 34 if f"{enc}.resnet.layer1.2.conv1.weight" in sd else 18


def _sub_state_dict(sd: Dict[str, np.ndarray], prefix: str):
    import torch
    return {k[len(prefix):]: torch.tensor(np.array(v))
            for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# checks
# ---------------------------------------------------------------------------

class Report:
    def __init__(self, tolerance: float):
        self.tolerance = tolerance
        self.rows = []

    def add(self, module: str, mae: float, gate: Optional[float] = None,
            note: str = ""):
        gate = self.tolerance if gate is None else gate
        ok = bool(mae <= gate)
        self.rows.append({"module": module, "mae": float(mae),
                          "gate": float(gate), "pass": ok, "note": note})
        print(f"  {module:<28s} MAE {mae:.3e}  gate {gate:.0e}  "
              f"{'PASS' if ok else 'FAIL'}{('  ' + note) if note else ''}")
        return ok

    @property
    def ok(self):
        return all(r["pass"] for r in self.rows)

    def to_json(self):
        return {"pass": self.ok, "tolerance": self.tolerance,
                "modules": self.rows}


def verify(checkpoint: str, reference_repo: str, clip: Optional[str] = None,
           resnet_ckpt: Optional[str] = None, tolerance: float = GATE_DEFAULT,
           image_size: int = 112, batch: int = 2, seed: int = 0,
           num_sampling_steps: int = 10, int8_encoders: bool = False,
           int8_tolerance: Optional[float] = None) -> Report:
    import torch

    import jax
    import jax.numpy as jnp

    from ..models.agent import MoDEAgent, MoDEAgentConfig
    from ..models.edm import sample_loop
    from ..models.encoders.resnet import FiLMResNetPolicy
    from .checkpoint_convert import (convert_film_resnet, convert_modedit,
                                     detect_layout, load_torch_checkpoint,
                                     normalize_state_dict)
    from .torch_oracles import TorchFiLMResNetPolicy

    report = Report(tolerance)
    print(f"checkpoint: {checkpoint}")
    sd = normalize_state_dict(load_torch_checkpoint(checkpoint))
    n_layers, n_experts, prefix = detect_layout(sd)
    shape = infer_dit_shape(sd, prefix)
    depth = infer_resnet_depth(sd)
    print(f"detected: layers={n_layers} experts={n_experts} "
          f"D={shape['embed_dim']} heads={shape['n_heads']} "
          f"obs={shape['obs_dim']} resnet={depth}")

    ref_modedit, ref_sw, ref_gs = load_reference_stack(reference_repo)

    # ---- torch reference model, loaded with ITS OWN weights --------------
    torch.manual_seed(seed)
    tdit = ref_modedit.MoDeDiT(
        obs_dim=shape["obs_dim"], goal_dim=shape["goal_dim"], device="cpu",
        goal_conditioned=True, action_dim=shape["action_dim"],
        embed_dim=shape["embed_dim"], embed_pdrob=0.0, attn_pdrop=0.3,
        n_layers=n_layers, n_heads=shape["n_heads"], goal_seq_len=1,
        obs_seq_len=1, action_seq_len=shape["action_seq_len"], state_dim=8,
        mlp_pdrop=0.1, goal_drop=0.1, cond_router=True,
        num_experts=n_experts, top_k=2, router_normalize=True,
        use_argmax=False, use_shared_expert=False,
        use_noise_token_as_input=True, init_style="olmoe")
    missing, unexpected = tdit.load_state_dict(_sub_state_dict(sd, prefix),
                                               strict=False)
    if missing:
        raise ValueError(f"DiT weights missing from checkpoint: "
                         f"{sorted(missing)[:8]}...")
    if unexpected:
        logger.warning("unused DiT checkpoint keys: %s",
                       sorted(unexpected)[:8])
    tdit.eval()

    # ---- jax model via the converter -------------------------------------
    obs_dim_ok = shape["obs_dim"] in (512, 2048)
    agent = MoDEAgent(MoDEAgentConfig(
        latent_dim=shape["embed_dim"], n_layers=n_layers,
        n_heads=shape["n_heads"], cond_dim=shape["goal_dim"],
        action_dim=shape["action_dim"],
        act_window_size=shape["action_seq_len"],
        resnet_type=str(depth or 50), num_experts=n_experts, top_k=2,
        num_sampling_steps=num_sampling_steps))
    variables = {"params": {"inner_model": convert_modedit(
        sd, n_layers=n_layers, num_experts=n_experts, prefix=prefix)},
        "batch_stats": {}}

    rng = np.random.default_rng(seed)
    B, W, A = batch, shape["action_seq_len"], shape["action_dim"]
    goal = rng.standard_normal((B, 1, shape["goal_dim"])).astype(np.float32)

    # ---- encoders ---------------------------------------------------------
    has_encoders = depth is not None
    enc_imgs = {}
    if has_encoders:
        st_feats = {}
        for enc in ("static_resnet", "gripper_resnet"):
            tenc = TorchFiLMResNetPolicy(shape["goal_dim"], depth=depth)
            m2, u2 = tenc.load_state_dict(_sub_state_dict(sd, f"{enc}."),
                                          strict=False)
            if m2:
                raise ValueError(f"{enc} weights missing: {sorted(m2)[:8]}")
            tenc.eval()
            conv = convert_film_resnet(sd, depth=depth, prefix=f"{enc}.",
                                       style="policy")
            variables["params"][enc] = conv["params"]
            variables["batch_stats"][enc] = conv["batch_stats"]
            img = (rng.standard_normal((B, 3, image_size, image_size))
                   .astype(np.float32) * 0.3)
            enc_imgs[enc] = img
            with torch.no_grad():
                t_feat = tenc(torch.tensor(img), torch.tensor(goal)).numpy()
            # published checkpoints carry the pretrained *policy*-style
            # encoders (pretrained_resnets.py) at every depth
            mod = FiLMResNetPolicy(shape["goal_dim"], depth=depth)
            j_feat = np.asarray(mod.apply(
                {"params": conv["params"], "batch_stats": conv["batch_stats"]},
                jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                jnp.asarray(goal[:, 0]), train=False))
            report.add(f"encoder/{enc}",
                       float(np.abs(j_feat - t_feat).mean()))
            st_feats[enc] = t_feat
        state_images = np.stack(
            [st_feats["static_resnet"], st_feats["gripper_resnet"]], axis=1)
    else:
        logger.warning("no encoder weights in checkpoint — using random "
                       "perceptual embeddings for the DiT/e2e checks")
        state_images = rng.standard_normal(
            (B, 2, shape["obs_dim"])).astype(np.float32)

    # ---- single DiT forward at fixed sigma --------------------------------
    actions = rng.standard_normal((B, W, A)).astype(np.float32)
    sigma = np.full((B,), 1.7, np.float32)
    with torch.no_grad():
        t_pred = tdit(
            {"state_images": torch.tensor(state_images)},
            torch.tensor(actions), torch.tensor(goal),
            torch.tensor(sigma)).numpy()
    j_pred = np.asarray(agent.dit.apply(
        {"params": variables["params"]["inner_model"]},
        {"state_images": jnp.asarray(state_images)}, jnp.asarray(actions),
        jnp.asarray(goal), jnp.asarray(sigma), train=False))
    report.add("dit/forward", float(np.abs(j_pred - t_pred).mean()))

    # ---- end-to-end 10-step DDIM chunk ------------------------------------
    sigmas = np.asarray(agent.sigmas, np.float32)
    x0 = (rng.standard_normal((B, W, A)) * agent.cfg.sigma_max
          ).astype(np.float32)
    with torch.no_grad():
        denoiser = ref_sw.GCDenoiser(tdit, sigma_data=agent.cfg.sigma_data)
        t_out = ref_gs.sample_ddim(
            denoiser, {"state_images": torch.tensor(state_images)},
            torch.tensor(x0), torch.tensor(goal), torch.tensor(sigmas),
            disable=True).numpy()
    emb = {"state_images": jnp.asarray(state_images)}
    den = agent.make_denoiser(variables, emb, jnp.asarray(goal))
    j_out = np.asarray(jax.jit(lambda x: sample_loop(
        "ddim", den, x, sigmas, jax.random.PRNGKey(0)))(jnp.asarray(x0)))
    report.add("e2e/ddim_chunk (rel_action)",
               float(np.abs(j_out - t_out).mean()),
               note="BASELINE fidelity target")

    # fast-path consistency: the serving routing precompute must match the
    # converted dense path (this is what eval/serving actually run)
    fast = np.asarray(agent.denoise_actions(
        variables, emb, jnp.asarray(goal), jax.random.PRNGKey(3),
        inference=True, use_routing_precompute=True))
    dense = np.asarray(agent.denoise_actions(
        variables, emb, jnp.asarray(goal), jax.random.PRNGKey(3),
        inference=True))
    report.add("e2e/routing_precompute", float(np.abs(fast - dense).mean()),
               gate=1e-5)

    # ---- optional: int8-encoder serving mode on the REAL weights ----------
    # The random-weight harness is the worst case for int8 (iid channel
    # ranges); this measures the actual divergence of the max-throughput
    # encoder path for the checkpoint at hand (report-only unless
    # --int8-tolerance is set). docs/PERF.md "int8 encoder convs".
    if int8_encoders and has_encoders:
        nhwc = {k: jnp.asarray(np.transpose(v, (0, 2, 3, 1))[:, None])
                for k, v in enc_imgs.items()}
        calib = {"rgb_static": nhwc["static_resnet"],
                 "rgb_gripper": nhwc["gripper_resnet"],
                 "lang_emb": jnp.asarray(goal)}
        v2 = agent.fold_encoders_for_inference(variables)
        v2 = agent.quantize_encoders_for_inference(v2, calib_batch=calib)
        emb_q, _ = agent.embed_visual_obs(
            v2, nhwc["static_resnet"], nhwc["gripper_resnet"],
            jnp.asarray(goal), train=False)
        gate_q = int8_tolerance if int8_tolerance else float("inf")
        den_q = agent.make_denoiser(variables, emb_q, jnp.asarray(goal))
        j_q = np.asarray(jax.jit(lambda x: sample_loop(
            "ddim", den_q, x, sigmas, jax.random.PRNGKey(0)))(
            jnp.asarray(x0)))
        report.add("e2e/int8_encoders (vs torch)",
                   float(np.abs(j_q - t_out).mean()), gate=gate_q,
                   note="" if int8_tolerance else
                   "report-only (set --int8-tolerance to gate)")

    # ---- optional CLIP text tower ----------------------------------------
    if clip:
        _verify_clip(clip, reference_repo, report, seed)
    if resnet_ckpt and not has_encoders:
        logger.warning("--resnet given but checkpoint has no encoder keys; "
                       "standalone backbone verification not implemented")
    if not obs_dim_ok:
        logger.warning("obs_dim=%d outside the reference encoder family",
                       shape["obs_dim"])
    return report


def _verify_clip(clip_path: str, reference_repo: str, report: Report,
                 seed: int):
    import torch

    from ..config.builders import build_lang_clip
    from ..models.encoders.tokenizer import tokenize

    clip_py = Path(reference_repo) / "mode" / "models" / "networks" / "clip.py"
    ref_clip = _load_file_module(clip_py, "vck_refclip")
    try:
        jit_model = torch.jit.load(clip_path, map_location="cpu")
        t_sd = jit_model.state_dict()
    except RuntimeError:
        t_sd = torch.load(clip_path, map_location="cpu")
        t_sd = t_sd.get("state_dict", t_sd)
    tmodel = ref_clip.build_model({k: v.float() for k, v in t_sd.items()})
    tmodel.eval()

    lang = build_lang_clip(clip_checkpoint=clip_path)
    texts = ["push the red block", "open the drawer",
             "turn on the led light"]
    ids = np.asarray(tokenize(texts))
    with torch.no_grad():
        t_emb = tmodel.encode_text(torch.tensor(ids).long()).numpy()
    j_emb = np.asarray(lang(texts))[:, 0]
    report.add("clip/encode_text", float(np.abs(j_emb - t_emb).mean()))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="published MoDE checkpoint: safetensors dir, "
                        "Lightning .ckpt, or raw .pt")
    p.add_argument("--clip", default=None,
                   help="OpenAI CLIP checkpoint (jit .pt or state dict) for "
                        "the language-tower check")
    p.add_argument("--resnet", default=None,
                   help="timm ImageNet backbone .pt (reserved; encoder "
                        "weights usually ship inside the MoDE checkpoint)")
    p.add_argument("--reference-repo", default="/root/reference",
                   help="path to the PyTorch reference repo (oracle side)")
    p.add_argument("--tolerance", type=float, default=GATE_DEFAULT)
    p.add_argument("--int8-encoders", action="store_true",
                   help="also measure the int8-encoder (max-throughput) "
                        "path's e2e action MAE on these weights")
    p.add_argument("--int8-tolerance", type=float, default=None,
                   help="gate the int8-encoder check (report-only if unset)")
    p.add_argument("--image-size", type=int, default=112,
                   help="input resolution for the encoder checks (112 keeps "
                        "CPU runs fast; weight coverage identical to 224)")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="write the JSON report here")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    report = verify(args.checkpoint, args.reference_repo, clip=args.clip,
                    resnet_ckpt=args.resnet, tolerance=args.tolerance,
                    image_size=args.image_size, batch=args.batch,
                    seed=args.seed, int8_encoders=args.int8_encoders,
                    int8_tolerance=args.int8_tolerance)
    verdict = "PASS" if report.ok else "FAIL"
    print(f"fidelity: {verdict} ({len(report.rows)} checks, "
          f"tolerance {args.tolerance:g})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report.to_json(), f, indent=2)
    return 0 if report.ok else 1


if __name__ == "__main__":
    sys.exit(main())
