"""MoDEAgent — the training/inference facade, as pure functions over one
variables pytree.

Re-design of the reference LightningModule
(/root/reference/mode/models/mode_agent.py:41-873). No Lightning: the agent
owns the model definitions and exposes pure jit-able functions
(``training_loss``, ``validation_denoise``, ``denoise_actions``) plus a small
host-side rollout wrapper (``RolloutPolicy``) for chunked env stepping
(mode_agent.py:612-637).

Inference fast path: ``denoise_actions(..., use_routing_precompute=True)``
precomputes the per-sigma top-2 expert routing once (sigma-indexed arrays,
replacing the reference's float-keyed fused-expert cache,
mode_agent.py:639-644 / modedit.py:971-1011) and the sampler's scheduled
steps gather just those two experts' weights.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modedit import (MoDeDiT, MoDeDiTConfig, load_balancing_loss,
                      router_z_loss)
from .encoders.resnet import FiLMResNetPolicy, ResNetEncoderWithFiLM
from .edm.precond import denoiser_forward, denoiser_loss
from .edm.schedules import get_noise_schedule

logger = logging.getLogger(__name__)


def _dit_vars(variables):
    """DiT apply collections: params plus the optional int8 quant weights
    (present only when MoDeDiTConfig.use_int8_moe built them)."""
    out = {"params": variables["params"]["inner_model"]}
    if "quant" in variables:
        out["quant"] = variables["quant"]["inner_model"]
    return out


def _tree_has_key(tree, key) -> bool:
    if not isinstance(tree, dict):
        return False
    return key in tree or any(_tree_has_key(v, key) for v in tree.values())


# matmul-feeding parameter leaves: pre-cast these to the compute dtype ONCE
# per chunk on the inference fast path. The modules cast them per use anyway
# (DenseP dtype / in-VMEM casts), but inside the sampler scan that means
# either a re-materialized bf16 copy every denoise step or (Pallas) reading
# the f32 bytes over HBM — 16.6 MB/layer-step for the fused attention kernel
# alone (docs/PERF.md). Norm scales stay f32 (the kernels' norm math is f32).
_CAST_LEAF_NAMES = ("kernel", "bias", "pos_emb")
_CAST_LEAF_PREFIXES = ("experts_", "shared_")


def _clip_candidates(calib_tree, headroom: float = 1.0):
    """(label, clip_tree) candidates for the int8 encoder activation clips,
    built from the calibration sow tree ({conv: {act_amax, act_msq}}):

    - ``amax``: the per-channel maxima (round-2 behavior — no clipping, all
      quantization error lands in the folded weights)
    - ``amax*q``: fractional amax (percentile-style clipping)
    - ``k*sigma``: min(amax, k * per-channel RMS) — for heavy-tailed
      activations the MSE-optimal int8 clip sits near 3-4 sigma, trading a
      little clipping for 8-bit resolution on the bulk of the mass

    The caller picks the winner by final-feature MSE on the calibration
    batch (quantize_encoders_for_inference)."""

    def build(node, fn):
        if isinstance(node, dict) and "act_amax" in node:
            amax = jnp.asarray(node["act_amax"], jnp.float32)
            msq = jnp.asarray(node.get("act_msq", amax ** 2), jnp.float32)
            return {"act_amax": jnp.maximum(fn(amax, msq) * headroom, 1e-6)}
        return {k: build(v, fn) for k, v in node.items()
                if isinstance(v, dict)}

    cands = [("amax", lambda a, m: a)]
    for qf in (0.9, 0.8, 0.7):
        cands.append((f"amax*{qf}", lambda a, m, qf=qf: a * qf))
    for k in (3.0, 3.5, 4.0):
        cands.append((f"{k}*sigma",
                      lambda a, m, k=k: jnp.minimum(a, k * jnp.sqrt(m))))
    return [(label, build(calib_tree, fn)) for label, fn in cands]


def _cast_matmul_weights(tree, dt):
    import jax.tree_util as jtu

    def walk(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if x.dtype == jnp.float32 and (
                name in _CAST_LEAF_NAMES
                or any(name.startswith(p) for p in _CAST_LEAF_PREFIXES)):
            return x.astype(dt)
        return x

    return jtu.tree_map_with_path(walk, tree)
from .edm.densities import make_sample_density
from .edm.samplers import sample_loop


@dataclasses.dataclass(frozen=True)
class MoDEAgentConfig:
    """Mirrors conf/model/mode_agent.yaml:1-84 of the reference."""

    latent_dim: int = 1024
    multistep: int = 10
    sampler_type: str = "ddim"
    num_sampling_steps: int = 10
    sigma_data: float = 0.5
    sigma_min: float = 0.001
    sigma_max: float = 80.0
    noise_scheduler: str = "exponential"
    sigma_sample_density_type: str = "loglogistic"
    cond_dim: int = 512
    resnet_type: str = "50"
    act_window_size: int = 10
    action_dim: int = 7
    obs_seq_len: int = 1
    goal_seq_len: int = 1
    entropy_gamma: float = 0.0
    router_z_delta: float = 0.001
    use_proprio: bool = False
    n_layers: int = 12
    n_heads: int = 8
    num_experts: int = 4
    top_k: int = 2
    use_shared_expert: bool = False
    identity_expert: bool = False
    # inner_model passthrough (conf/model/mode_agent.yaml:46-76)
    goal_conditioned: bool = True
    causal: bool = True
    embed_pdrob: float = 0.0
    goal_drop: float = 0.1
    attn_pdrop: float = 0.3
    mlp_pdrop: float = 0.1
    cond_router: bool = True
    router_normalize: bool = True
    use_goal_in_routing: bool = False
    use_argmax: bool = False
    use_noise_token_as_input: bool = True
    init_style: str = "olmoe"
    use_cross_attention: bool = False
    noise_in_cross_attention: bool = False
    seed: int = 42
    dtype: Any = jnp.float32
    use_pallas_moe: bool = False
    use_int8_moe: bool = False
    use_grouped_moe: bool = False
    use_pallas_attn: bool = False
    use_int8_attn: bool = False
    use_fused_layer: bool = False
    use_megakernel: bool = False
    # Inference fast-path structure (round-4 bisection knobs — docs/PERF.md
    # "b=1 latency"). hoist_chunk_invariants: compute camera/goal/sigma
    # tokens + EDM scalings once per chunk (MoDeDiT.forward_precomputed)
    # instead of inside every denoise step. precast_weights: additionally
    # cast the f32 matmul leaves to the compute dtype once per chunk.
    # Both bit-identical to the per-step path; flip off to recover the
    # round-2 denoiser shape when profiling small-batch latency.
    hoist_chunk_invariants: bool = True
    precast_weights: bool = True
    # rematerialize encoder activations in the train-step backward. True
    # trades one extra encoder forward (~8 ms @ b=32 flagship) for ~7GB of
    # activation memory; set False when the batch/model fits HBM without it
    # (docs/PERF.md "train step")
    encoder_remat: bool = True
    # "batch" (reference parity: torch BatchNorm2d + sync_batchnorm under
    # DP) or "group" (GroupNorm(32): no running stats, no cross-replica
    # sync, no full-batch grad reductions in the backward — the SURVEY §2.3
    # blessed training-mode swap; NOT loadable from published BN weights)
    encoder_norm: str = "batch"

    @property
    def obs_dim(self) -> int:
        # mode_agent.py:76
        return 2048 if self.resnet_type == "50" else 512

    def dit_config(self) -> MoDeDiTConfig:
        return MoDeDiTConfig(
            obs_dim=self.obs_dim, goal_dim=self.cond_dim,
            action_dim=self.action_dim, embed_dim=self.latent_dim,
            n_layers=self.n_layers, n_heads=self.n_heads,
            goal_seq_len=self.goal_seq_len, obs_seq_len=self.obs_seq_len,
            action_seq_len=self.act_window_size,
            use_proprio=self.use_proprio, num_experts=self.num_experts,
            top_k=self.top_k, use_shared_expert=self.use_shared_expert,
            identity_expert=self.identity_expert,
            goal_conditioned=self.goal_conditioned, causal=self.causal,
            embed_pdrob=self.embed_pdrob, goal_drop=self.goal_drop,
            attn_pdrop=self.attn_pdrop, mlp_pdrop=self.mlp_pdrop,
            cond_router=self.cond_router,
            router_normalize=self.router_normalize,
            use_goal_in_routing=self.use_goal_in_routing,
            use_argmax=self.use_argmax,
            use_noise_token_as_input=self.use_noise_token_as_input,
            init_style=self.init_style,
            use_cross_attention=self.use_cross_attention,
            noise_in_cross_attention=self.noise_in_cross_attention,
            dtype=self.dtype,
            use_pallas_moe=self.use_pallas_moe,
            use_int8_moe=self.use_int8_moe,
            use_grouped_moe=self.use_grouped_moe,
            use_pallas_attn=self.use_pallas_attn,
            use_int8_attn=self.use_int8_attn,
            use_fused_layer=self.use_fused_layer,
            use_megakernel=self.use_megakernel)


class MoDEAgent:
    """Owns module definitions + pure compute functions. All state lives in
    the caller-held ``variables`` pytree."""

    def __init__(self, cfg: MoDEAgentConfig):
        self.cfg = cfg
        self.dit = MoDeDiT(cfg.dit_config())
        if cfg.resnet_type in ("34", "50"):
            depth = int(cfg.resnet_type)
            mk = lambda folded, **kw: FiLMResNetPolicy(  # noqa: E731
                cfg.cond_dim, depth=depth, dtype=cfg.dtype, folded=folded,
                norm=cfg.encoder_norm, **kw)
        else:
            mk = lambda folded, **kw: ResNetEncoderWithFiLM(  # noqa: E731
                cfg.cond_dim, latent_dim=512, dtype=cfg.dtype, folded=folded,
                norm=cfg.encoder_norm, **kw)
        self._mk_encoder = mk
        self.static_resnet = mk(False)
        self.gripper_resnet = mk(False)
        # BN-folded + space-to-depth-stem inference variants; consume params
        # produced by fold_encoders_for_inference (exact same math, better
        # MXU mapping — see encoders/resnet.py). int8 variants on top of the
        # folded graph (QuantConv, quantize_encoders_for_inference) are
        # built on demand with the q8/q8_skip mode inferred from the param
        # tree itself (see embed_visual_obs).
        self.static_resnet_folded = mk(True)
        self.gripper_resnet_folded = mk(True)
        self.sigmas = get_noise_schedule(
            cfg.num_sampling_steps, cfg.noise_scheduler, cfg.sigma_min,
            cfg.sigma_max)
        self.sample_density = make_sample_density(
            cfg.sigma_sample_density_type, sigma_data=cfg.sigma_data,
            sigma_min=cfg.sigma_min, sigma_max=cfg.sigma_max,
            num_sampling_steps=cfg.num_sampling_steps)

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init_variables(self, key, image_hw: Tuple[int, int] = (224, 224)):
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        B = 1
        h, w = image_hw
        dummy_states = {"state_images": jnp.zeros((B, 2, cfg.obs_dim))}
        dummy_actions = jnp.zeros((B, cfg.act_window_size, cfg.action_dim))
        dummy_goal = jnp.zeros((B, 1, cfg.cond_dim))
        dummy_sigma = jnp.ones((B,))
        dit_vars = self.dit.init({"params": k1}, dummy_states, dummy_actions,
                                 dummy_goal, dummy_sigma)
        img = jnp.zeros((B, h, w, 3))
        cond = jnp.zeros((B, cfg.cond_dim))
        sr = self.static_resnet.init({"params": k2}, img, cond, train=False)
        gr = self.gripper_resnet.init({"params": k3}, img, cond, train=False)
        out = {
            "params": {
                "inner_model": dit_vars["params"],
                "static_resnet": sr["params"],
                "gripper_resnet": gr["params"],
            },
            "batch_stats": {
                "static_resnet": sr.get("batch_stats", {}),
                "gripper_resnet": gr.get("batch_stats", {}),
            },
        }
        if "quant" in dit_vars:
            out["quant"] = {"inner_model": dit_vars["quant"]}
        return out

    def fold_encoders_for_inference(self, variables):
        """Fold encoder BatchNorms into conv weights and rewrite the 7x7/2
        stems as space-to-depth 4x4/1 convs (exact transforms). Adds a
        "folded_params" collection which embed_visual_obs prefers on the
        inference path; train-mode params are untouched.

        GroupNorm encoders (cfg.encoder_norm="group") have no foldable
        running statistics — the norm is input-dependent — so folding is a
        no-op for them (serving presets still work; they just keep the
        unfolded GN graph)."""
        if self.cfg.encoder_norm != "batch":
            logger.info("encoder_norm=%r has no foldable statistics; "
                        "fold_encoders_for_inference is a no-op",
                        self.cfg.encoder_norm)
            return variables
        from .encoders.resnet import fold_resnet_params
        folded = {name: fold_resnet_params(variables["params"][name],
                                           variables["batch_stats"][name])
                  for name in ("static_resnet", "gripper_resnet")}
        return {**variables, "folded_params": folded}

    def quantize_encoders_for_inference(self, variables, calib_batch=None,
                                        headroom: float = 1.0, skip=()):
        """int8-quantize the folded encoder convs (per-output-channel weights
        + per-tensor activation quant; see encoders/resnet.py::QuantConv).
        Adds a "q8_encoder_params" collection which embed_visual_obs prefers
        over folded/raw params on the inference path.

        Without ``calib_batch`` the activation scales are dynamic (max |x|
        per call — accuracy-safe but the extra pass erases the int8 conv
        win). With ``calib_batch`` — a dict with 'rgb_static', 'rgb_gripper'
        [B,T,H,W,3] and 'lang_emb' — the static per-input-channel clip
        scales are SELECTED per encoder by minimizing final-feature MSE vs
        the float path over candidate clips (pure amax, fractional amax,
        and k*sigma_c RMS-based — round-3 accuracy recovery, docs/PERF.md
        "int8 encoder convs"), folded into the quantized kernels, and the
        fast static-scale modules are used. Approximate either way —
        validate the end-to-end action MAE for your checkpoint
        (utils/verify_checkpoint.py --int8-encoders does this the moment
        real weights are available)."""
        import logging

        from .encoders.resnet import quantize_resnet_params
        if "folded_params" not in variables:
            variables = self.fold_encoders_for_inference(variables)
        skip = tuple(skip)
        q = {name: quantize_resnet_params(variables["folded_params"][name],
                                          skip=skip)
             for name in ("static_resnet", "gripper_resnet")}
        if calib_batch is None:
            return {**variables, "q8_encoder_params": q}

        log_ = logging.getLogger(__name__)
        cond = calib_batch["lang_emb"]
        cond = cond[:, 0] if cond.ndim == 3 else cond
        mod = self._mk_encoder(True, q8=True, q8_skip=skip)
        static_mod = self._mk_encoder(True, q8="static", q8_skip=skip)
        for name, imgs in (("static_resnet", calib_batch["rgb_static"]),
                           ("gripper_resnet", calib_batch["rgb_gripper"])):
            x = imgs.reshape((-1,) + imgs.shape[2:])
            # images flatten to B*T rows — the FiLM cond must follow
            # (embed_visual_obs repeats it the same way at inference)
            T = imgs.shape[1]
            cond_rep = jnp.repeat(cond, T, axis=0) if T > 1 else cond
            folded = variables["folded_params"][name]
            fold_mod = (self.static_resnet_folded if name == "static_resnet"
                        else self.gripper_resnet_folded)
            ref = fold_mod.apply({"params": folded}, x, cond_rep, train=False)
            _, calib = mod.apply({"params": q[name]}, x, cond_rep,
                                 train=False, mutable=["calib"])
            best = None
            for label, clips in _clip_candidates(calib["calib"], headroom):
                qp = quantize_resnet_params(folded, act_amax=clips, skip=skip)
                feat = static_mod.apply({"params": qp}, x, cond_rep,
                                        train=False)
                mse = float(jnp.mean(jnp.square(
                    feat.astype(jnp.float32) - ref.astype(jnp.float32))))
                if best is None or mse < best[0]:
                    best = (mse, label, qp)
            ref_sq = float(jnp.mean(jnp.square(ref.astype(jnp.float32))))
            log_.info("int8 calibration %s: clip=%s, feature rel err %.4f",
                      name, best[1], (best[0] / max(ref_sq, 1e-12)) ** 0.5)
            q[name] = best[2]
        return {**variables, "q8_encoder_params": q}

    def quantize_for_inference(self, variables):
        """(Re)build the int8 "quant" collection from the current fp32
        params — call after loading a checkpoint when cfg.use_int8_moe /
        cfg.use_int8_attn are set."""
        from ..ops.quant import quantize_attn, quantize_experts
        quant = {}
        for name, layer in variables["params"]["inner_model"].items():
            if not isinstance(layer, dict):
                continue
            entry = {}
            if "experts_w1" in layer and self.cfg.use_int8_moe:
                entry["experts_q"] = tuple(quantize_experts(
                    layer["experts_w1"], layer["experts_b1"],
                    layer["experts_w2"]))
            if "attn" in layer and self.cfg.use_int8_attn:
                a = layer["attn"]
                entry["attn"] = {"attn_q": tuple(quantize_attn(
                    a["wqkv"]["kernel"], a["wqkv"]["bias"],
                    a["c_proj"]["kernel"]))}
            if entry:
                quant[name] = entry
        return {**variables, "quant": {"inner_model": quant}}

    # ------------------------------------------------------------------
    # embeddings (mode_agent.py:525-567)
    # ------------------------------------------------------------------
    def embed_visual_obs(self, variables, rgb_static, rgb_gripper, latent_goal,
                         *, train: bool = False):
        """rgb_*: [B, T, H, W, 3] NHWC; latent_goal [B, 1, cond] or [B, cond].
        Returns perceptual_emb {'state_images': [B, 2T, obs_dim]} and, in
        train mode, the batch_stats updates."""
        B, T = rgb_static.shape[:2]
        cond = latent_goal[:, 0] if latent_goal.ndim == 3 else latent_goal
        cond_rep = jnp.repeat(cond, T, axis=0) if T > 1 else cond

        use_q8 = not train and "q8_encoder_params" in variables
        use_folded = not train and "folded_params" in variables

        def run(mod, name, imgs):
            x = imgs.reshape((B * T,) + imgs.shape[2:])
            if use_q8:
                from .encoders.resnet import infer_q8_skip
                qp = variables["q8_encoder_params"][name]
                static = _tree_has_key(qp, "act_scale")
                mod = self._mk_encoder(True, q8="static" if static else True,
                                       q8_skip=infer_q8_skip(qp))
                v = {"params": qp}
                return mod.apply(v, x, cond_rep,
                                 train=False).reshape(B, T, -1), None
            if use_folded:
                mod = (self.static_resnet_folded if name == "static_resnet"
                       else self.gripper_resnet_folded)
                v = {"params": variables["folded_params"][name]}
                return mod.apply(v, x, cond_rep,
                                 train=False).reshape(B, T, -1), None
            # GroupNorm encoders (cfg.encoder_norm="group") carry no
            # batch_stats — keep the collection out of apply entirely
            bs = variables.get("batch_stats", {}).get(name, {})
            v = {"params": variables["params"][name]}
            if bs:
                v["batch_stats"] = bs
            if train:
                # rematerialize encoder activations in the backward pass —
                # ResNet-50 at 224px dominates training HBM otherwise
                # (jax.checkpoint trades ~1/3 extra encoder FLOPs for ~7GB;
                # cfg.encoder_remat=False skips it when memory allows)
                def fwd(v, x, cond):
                    return mod.apply(v, x, cond, train=True,
                                     mutable=["batch_stats"])
                if self.cfg.encoder_remat:
                    fwd = jax.checkpoint(fwd)
                out, upd = fwd(v, x, cond_rep)
                return out.reshape(B, T, -1), upd.get("batch_stats", {})
            return mod.apply(v, x, cond_rep, train=False).reshape(B, T, -1), None

        st, st_upd = run(self.static_resnet, "static_resnet", rgb_static)
        gr, gr_upd = run(self.gripper_resnet, "gripper_resnet", rgb_gripper)
        token_seq = jnp.concatenate([st, gr], axis=1)
        perceptual_emb = {"state_images": token_seq}
        updates = None
        if train:
            updates = {"static_resnet": st_upd, "gripper_resnet": gr_upd}
        return perceptual_emb, updates

    # ------------------------------------------------------------------
    # losses (mode_agent.py:386-440, 659-672)
    # ------------------------------------------------------------------
    def training_loss(self, variables, batch: Dict[str, Any], rng):
        """batch: {'rgb_static': [B,T,H,W,3], 'rgb_gripper': ..., 'actions':
        [B,W,7], 'lang_emb': [B,1,cond]}. Returns (total_loss, (metrics,
        batch_stats_updates))."""
        cfg = self.cfg
        k_sigma, k_noise, k_drop, k_router, k_goal = jax.random.split(rng, 5)
        latent_goal = batch["lang_emb"].astype(jnp.float32)
        perceptual_emb, bs_updates = self.embed_visual_obs(
            variables, batch["rgb_static"], batch["rgb_gripper"], latent_goal,
            train=True)

        actions = batch["actions"].astype(jnp.float32)
        sigmas = self.sample_density(k_sigma, (actions.shape[0],))
        noise = jax.random.normal(k_noise, actions.shape)

        aux_out = {}

        def inner_apply(states, scaled_actions, goal, sigma, **kw):
            pred, aux = self.dit.apply(
                _dit_vars(variables),
                states, scaled_actions, goal, sigma, train=True,
                return_aux=True,
                rngs={"dropout": k_drop, "router": k_router,
                      "goal_mask": k_goal})
            aux_out["layers"] = aux
            return pred

        act_loss, _ = denoiser_loss(inner_apply, perceptual_emb, actions,
                                    latent_goal, noise, sigmas,
                                    sigma_data=cfg.sigma_data)
        total = act_loss
        metrics = {"train/action_loss": act_loss}
        aux_layers = aux_out["layers"]
        if cfg.entropy_gamma > 0:
            lb = load_balancing_loss(aux_layers)
            total = total + cfg.entropy_gamma * lb
            metrics["train/load_balancing_loss"] = lb
        if cfg.router_z_delta > 0:
            zl = router_z_loss(aux_layers)
            total = total + cfg.router_z_delta * zl
            metrics["train/router_z_delta"] = zl
        metrics["train/total_loss"] = total
        # expert usage telemetry (mode_agent.py:466-511): [L, E] counts
        metrics["expert_counts"] = jnp.stack(
            [a["expert_counts"] for a in aux_layers])
        return total, (metrics, bs_updates)

    def validation_denoise(self, variables, batch: Dict[str, Any], rng):
        """Full inference-schedule denoise + MSE (mode_agent.py:442-464
        calls denoise_actions(inference=True), which uses
        num_sampling_steps)."""
        latent_goal = batch["lang_emb"].astype(jnp.float32)
        perceptual_emb, _ = self.embed_visual_obs(
            variables, batch["rgb_static"], batch["rgb_gripper"], latent_goal,
            train=False)
        pred = self.denoise_actions(variables, perceptual_emb, latent_goal,
                                    rng, inference=True)
        mse = jnp.mean((pred - batch["actions"].astype(jnp.float32)) ** 2)
        return pred, {"val_act/lang_act_loss_pp": mse}

    # ------------------------------------------------------------------
    # sampling (mode_agent.py:733-840)
    # ------------------------------------------------------------------
    def precompute_routing(self, variables, sigmas: Optional[np.ndarray] = None):
        """Per-sigma top-2 routing for every layer; sigma-indexed arrays
        (mode_agent.py:639-644). Uses the *scheduled* sigmas (the trailing 0
        is excluded)."""
        if sigmas is None:
            sigmas = self.sigmas[:-1]
        return self.dit.apply(
            _dit_vars(variables),
            jnp.asarray(sigmas), method=MoDeDiT.precompute_routing)

    def precast_for_serving(self, variables):
        """Cast the DiT matmul parameter leaves to the compute dtype ONCE, at
        serving setup, outside any jit (round 4, docs/PERF.md "b=1 latency").

        The round-3 fast path ran `_cast_matmul_weights` INSIDE the jitted
        per-chunk policy: ~0.7 GB of f32 parameter reads + 0.35 GB of bf16
        writes per chunk, which amortizes at b=128 but dominated the b=1
        budget (the 8.11 -> 9.13 ms r3 regression). With bf16-resident
        leaves, the in-jit cast becomes a dtype-equal no-op that XLA folds
        away. Bit-identical to per-use casting: every consumer (DenseP /
        Pallas kernels / router) casts these same leaves to ``cfg.dtype``
        before use anyway; norm scales stay f32."""
        if self.cfg.dtype == jnp.float32:
            return variables
        params = dict(variables["params"])
        params["inner_model"] = _cast_matmul_weights(params["inner_model"],
                                                     self.cfg.dtype)
        return {**variables, "params": params}

    def make_denoiser(self, variables, perceptual_emb, latent_goal,
                      routing=None, sigmas=None) -> Callable:
        """Returns denoiser(x, sigma_vec, step_idx) for the samplers. With
        ``routing``, scheduled steps (step_idx >= 0, traced) gather the
        precomputed top-2 experts AND run the hoisted-embedding fast forward
        (MoDeDiT.forward_precomputed): camera/goal tokens, per-step sigma
        tokens, and the EDM scalings are computed ONCE per chunk instead of
        inside every scan step (docs/PERF.md "sampler glue"). Off-schedule
        midpoint evals (literal -1) route + embed inline."""
        cfg = self.cfg
        from .modedit import MoDeDiT as _DiT

        pre = None
        fast_vars = None
        if routing is not None and cfg.hoist_chunk_invariants:
            fast_vars = _dit_vars(variables)
            if cfg.dtype == jnp.bfloat16 and cfg.precast_weights:
                # bf16-resident matmul weights: cast once per chunk, outside
                # the sampler scan (bit-identical — the per-step path casts
                # the same leaves to cfg.dtype per use)
                fast_vars = {**fast_vars,
                             "params": _cast_matmul_weights(
                                 fast_vars["params"], cfg.dtype)}
            sched = jnp.asarray(np.asarray(self.sigmas if sigmas is None
                                           else sigmas)[:-1], jnp.float32)
            static_x, goal_embed = self.dit.apply(
                fast_vars, perceptual_emb, latent_goal,
                method=_DiT.embed_static_tokens)
            emb_all = self.dit.apply(
                fast_vars, sched,
                method=_DiT.process_sigma_embeddings)       # [S,1,D]
            from .edm.precond import edm_scalings
            # one [S,3] table -> ONE per-step gather for all three scalings
            scal_all = jnp.stack(edm_scalings(sched, cfg.sigma_data), axis=1)
            pre = (static_x, goal_embed, emb_all, scal_all)

        mega = None
        if (pre is not None and cfg.use_megakernel and cfg.use_int8_moe
                # the megakernel embeds the fully fused pallas attention:
                # honoring use_pallas_attn=False keeps that explicit opt-out
                # meaningful (and the BENCH_PALLAS_ATTN=0 lever honest)
                and cfg.use_pallas_attn
                and cfg.top_k == 2 and not cfg.identity_expert
                and not cfg.use_shared_expert and not cfg.use_cross_attention
                and (cfg.latent_dim // cfg.n_heads) % 128 == 0):
            # the whole DiT stack in ONE pallas launch per denoise step
            # (fused_dit_q8c): stack the per-layer weights + routing tables
            # once per chunk, outside the sampler scan
            stacked = self.dit.apply(fast_vars, method=_DiT.stack_layers)
            idx_L = jnp.stack([i for i, _ in routing])     # [L, S, 2]
            p_L = jnp.stack([p for _, p in routing])
            mega = (stacked, idx_L, p_L)

        def denoiser(x, sigma, step_idx):
            on_sched = routing is not None and not (
                isinstance(step_idx, int) and step_idx < 0)
            overrides = None
            if on_sched:
                # sigma-table mode: hand each block the FULL [S,2] tables
                # plus the traced step — the Pallas kernels index them in
                # SMEM via scalar prefetch, so the 2-per-layer XLA gathers
                # the scan used to pay vanish (VERDICT r4 #2)
                overrides = [(idx, p, step_idx) for idx, p in routing]
            if on_sched and pre is not None:
                static_x, goal_embed, emb_all, scal_all = pre
                emb_t = jnp.take(emb_all, step_idx, axis=0)[None]  # [1,1,D]
                scal = jnp.take(scal_all, step_idx, axis=0)        # [3]
                cs, co, ci = scal[0], scal[1], scal[2]
                if mega is not None:
                    stacked, idx_L, p_L = mega
                    pred = self.dit.apply(
                        fast_vars, static_x, goal_embed, emb_t, x * ci,
                        stacked, idx_L, p_L, step_idx,
                        method=_DiT.forward_precomputed_mega)
                else:
                    pred = self.dit.apply(
                        fast_vars, static_x, goal_embed, emb_t,
                        x * ci, moe_overrides=overrides,
                        method=_DiT.forward_precomputed)
                return pred * co + x * cs

            def inner_apply(states, scaled_actions, goal, sigma, **kw):
                return self.dit.apply(
                    _dit_vars(variables),
                    states, scaled_actions, goal, sigma, train=False,
                    moe_overrides=overrides)

            return denoiser_forward(inner_apply, perceptual_emb, x,
                                    latent_goal, sigma,
                                    sigma_data=cfg.sigma_data)

        return denoiser

    def denoise_actions(self, variables, perceptual_emb, latent_goal, rng, *,
                        inference: bool = False,
                        use_routing_precompute: bool = False,
                        extra_args: Optional[dict] = None):
        """Sample an action chunk (mode_agent.py:733-760). rng drives both the
        initial noise and any stochastic sampler steps."""
        cfg = self.cfg
        sigmas = self.sigmas if inference else get_noise_schedule(
            10, cfg.noise_scheduler, cfg.sigma_min, cfg.sigma_max)
        B = latent_goal.shape[0]
        k_init, k_samp = jax.random.split(rng)
        x = jax.random.normal(
            k_init, (B, cfg.act_window_size, cfg.action_dim)) * cfg.sigma_max
        routing = None
        if use_routing_precompute:
            routing = self.precompute_routing(variables, sigmas[:-1])
        denoiser = self.make_denoiser(variables, perceptual_emb, latent_goal,
                                      routing, sigmas=sigmas)
        return sample_loop(cfg.sampler_type, denoiser, x, sigmas, k_samp,
                           extra_args)


class RolloutPolicy:
    """Host-side chunked-inference wrapper around a jitted policy step
    (reference MoDEAgent.step/reset, mode_agent.py:577-637).

    ``step(obs, goal)`` returns one action per call; the underlying model
    runs once every ``multistep`` calls and produces an action chunk.
    """

    def __init__(self, agent: MoDEAgent, variables, lang_encoder,
                 use_routing_precompute: bool = True, seed: int = 0,
                 sampler_unroll: int = 1):
        self.agent = agent
        # one-time host-side weight precast (see precast_for_serving): the
        # policy owns this copy, training state is untouched
        self.variables = agent.precast_for_serving(variables)
        variables = self.variables
        self.lang = lang_encoder  # callable: list[str] -> [B,1,D]
        self.multistep = agent.cfg.multistep
        self._key = jax.random.PRNGKey(seed)
        self._counter = 0
        self._chunk = None
        self._use_fast = use_routing_precompute

        def _policy(variables, rgb_static, rgb_gripper, lang_emb, key):
            emb, _ = agent.embed_visual_obs(variables, rgb_static, rgb_gripper,
                                            lang_emb, train=False)
            return agent.denoise_actions(
                variables, emb, lang_emb, key, inference=True,
                use_routing_precompute=use_routing_precompute,
                # sampler_unroll=num_sampling_steps fully unrolls the DDIM
                # scan: per-step routing/sigma/scaling gathers fold into
                # constants (bit-identical; compile time grows — docs/PERF.md
                # "sampler glue")
                extra_args={"unroll": sampler_unroll})

        self._policy = jax.jit(_policy)

    @classmethod
    def with_serving_mode(cls, agent: MoDEAgent, variables, lang_encoder,
                          mode: str = "auto", *, calib_batch=None, **kw):
        """Build a policy with a serving-mode fast-path preset applied
        (serving.apply_serving_mode; docs/PERF.md serving-mode table)."""
        from ..serving import apply_serving_mode
        agent, variables = apply_serving_mode(agent, variables, mode,
                                              calib_batch=calib_batch)
        return cls(agent, variables, lang_encoder, **kw)

    def reset(self):
        self._counter = 0
        self._chunk = None

    def step(self, obs: Dict[str, Any], goal: Dict[str, Any]) -> np.ndarray:
        if self._counter % self.multistep == 0:
            if "lang_text" in goal:
                lang_emb = jnp.asarray(self.lang([goal["lang_text"]] if
                                                 isinstance(goal["lang_text"], str)
                                                 else goal["lang_text"]))
            else:
                lang_emb = jnp.asarray(goal["lang_emb"])
            self._key, sub = jax.random.split(self._key)
            chunk = self._policy(self.variables,
                                 jnp.asarray(obs["rgb_static"]),
                                 jnp.asarray(obs["rgb_gripper"]),
                                 lang_emb, sub)
            self._chunk = np.asarray(chunk)
            self._counter = 0
        action = self._chunk[:, self._counter]
        self._counter += 1
        if self._counter == self.multistep:
            self._counter = 0
        return action
