"""Serving-mode presets: the measured inference fast paths, reachable from
the product entrypoints.

Round-2 left the headline perf (Pallas/int8 MoE, fused attention, BN-folded
and optionally int8 encoders) enabled only via bench.py env knobs; this
module packages the same measured configurations (docs/PERF.md
"Serving-mode summary") as named modes for the eval CLIs and RolloutPolicy.
Reference analog: the runtime sampler/steps overrides in
/root/reference/mode/evaluation/mode_evaluate.py:248-259 — the framework's
runtime knobs additionally cover the TPU execution strategy.

Modes (one v5e chip, b=128 e2e, measured docs/PERF.md):

- ``reference``       plain XLA bf16/f32 graph, no Pallas — the strict
                      bit-for-bit baseline (~966 chunks/s).
- ``parity``          int8 MoE + fused attention composed as the whole-layer
                      kernel with the quant-scratch fix (round 5) + BN-folded
                      encoders: 1880 chunks/s, action MAE vs bf16 6e-5
                      (20x under the 1e-3 budget).
- ``max-throughput``  int8 attention projections (two-kernel path) + int8
                      encoder convs: 2038-2134 chunks/s (round-5 re-measure
                      on the quant-scratch kernels; same-session A/B keeps
                      this pairing ~0.7% ahead of the int8 fused layer),
                      action MAE ~6e-3 — over the parity budget; validate
                      on your checkpoint's task metric before serving.
- ``b1-latency``      int8 MoE + folded bf16 encoders + the DiT megakernel
                      (whole 12-layer stack in one pallas launch per denoise
                      step, on bf16-precast weights): 6.2 ms per 10-step
                      chunk (50-iter differencing, round 5; 6.9 on the
                      per-layer fused kernel, 7.2 two-kernel round 4).
- ``b1-latency-max``  b1-latency + int8 attention projections inside the
                      megakernel: 5.5 ms/chunk (0.55 ms/env-step) — the b=1
                      chunk is weight-DMA-bound and int8 shrinks the attn
                      weights 4x. Action MAE ~5.2e-3 like max-throughput:
                      over the parity budget, validate before serving.
- ``auto``            ``parity`` on TPU, ``reference`` elsewhere (off-TPU
                      the Pallas kernels run in interpret mode — correct but
                      slow, for tests/debug only).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Tuple

logger = logging.getLogger(__name__)

SERVING_MODES = ("reference", "parity", "max-throughput", "b1-latency",
                 "b1-latency-max", "auto")


def resolve_serving_mode(mode: str) -> str:
    if mode not in SERVING_MODES:
        raise ValueError(f"unknown serving mode {mode!r}; pick one of "
                         f"{SERVING_MODES}")
    if mode == "auto":
        import jax
        return "parity" if jax.default_backend() == "tpu" else "reference"
    return mode


def apply_serving_mode(agent, variables, mode: str, *, calib_batch=None
                       ) -> Tuple["MoDEAgent", dict]:
    """Reconfigure (agent, variables) for a serving mode.

    Call AFTER checkpoint restore — the derived collections (folded encoder
    params, int8 weight quantizations) are computed from the loaded weights.
    ``calib_batch`` (dict with 'rgb_static'/'rgb_gripper' [B,T,H,W,3] and
    'lang_emb') calibrates static int8 encoder activation scales for
    ``max-throughput``; without it the encoders use dynamic per-tensor
    scales (accuracy-safe, but the extra max pass erases most of the int8
    conv win — docs/PERF.md "int8 encoder convs").
    """
    from .models.agent import MoDEAgent

    mode = resolve_serving_mode(mode)
    if mode == "reference":
        return agent, variables

    cfg = agent.cfg
    head_dim = cfg.latent_dim // cfg.n_heads
    # the fused kernels cover the reference's flagship shapes; fall back per
    # feature where a config is outside a kernel's tiling support
    fusable_attn = head_dim % 128 == 0
    # the fused MoE kernels serve the routed top-2 gather (identity-expert
    # selections and the shared expert are handled outside the kernel —
    # modedit._override_out)
    top2 = (cfg.top_k - (1 if cfg.use_shared_expert else 0)) == 2

    flags = dict(use_pallas_moe=top2, use_int8_moe=top2)
    # round 5: whole-layer kernel (attention + int8 MoE in one launch, with
    # the MoE input quantized once per token block into VMEM scratch) on
    # the routing-precompute path — measured 1880 vs 1719 chunks/s at b=128
    # same-session, same math as the two-kernel path
    # (tests/test_pallas_layer.py); eligible whenever both fused halves are
    fused_layer = (top2 and fusable_attn and not cfg.identity_expert
                   and not cfg.use_shared_expert
                   and not cfg.use_cross_attention)
    if mode in ("b1-latency", "b1-latency-max"):
        # round 4: with the serving-time bf16 weight precast
        # (RolloutPolicy / precast_for_serving) the fused attention kernel's
        # per-step weight DMA halves and it WINS at batch 1 (7.2 vs 8.8 ms
        # measured — docs/PERF.md "b=1 latency"); int8 attention stays off
        # (parity) and int8 encoders stay off (quant overhead loses at b=1).
        # Round 5: the DiT megakernel (whole 12-layer stack in one launch,
        # fused_dit_q8c) wins at b=1 ONLY — 6.3-6.8 vs 6.97 ms, launch
        # overhead dominates there; at b=128 it LOSES (1542 vs 1769 pre-
        # scratch-fix, the serialized layers forfeit XLA's inter-launch
        # overlap) so the throughput modes stay on the per-layer kernel.
        # -max: int8 attention projections inside the megakernel (5.5 vs
        # 6.2 ms measured) — over the parity budget, opt-in by name
        flags.update(use_pallas_attn=fusable_attn,
                     use_int8_attn=(mode == "b1-latency-max" and fusable_attn),
                     use_fused_layer=fused_layer,
                     use_megakernel=fused_layer)
    else:
        flags.update(use_pallas_attn=fusable_attn,
                     use_int8_attn=(mode == "max-throughput" and fusable_attn),
                     use_fused_layer=fused_layer and mode != "max-throughput")
    if not top2:
        logger.warning("serving mode %s: routed top-k=%d outside the fused "
                       "top-2 kernel — MoE stays on the XLA gather path",
                       mode, cfg.top_k - (1 if cfg.use_shared_expert else 0))
    if not fusable_attn and not mode.startswith("b1-latency"):
        logger.warning("serving mode %s: head_dim=%d not a lane multiple — "
                       "attention stays on the XLA path", mode, head_dim)

    new_agent = MoDEAgent(dataclasses.replace(cfg, **flags))
    variables = new_agent.fold_encoders_for_inference(variables)
    if flags["use_int8_moe"] or flags["use_int8_attn"]:
        variables = new_agent.quantize_for_inference(variables)
    if mode == "max-throughput":
        if calib_batch is None:
            logger.warning("max-throughput without calib_batch: int8 "
                           "encoders use dynamic activation scales (slower; "
                           "pass a representative batch to calibrate)")
        variables = new_agent.quantize_encoders_for_inference(
            variables, calib_batch=calib_batch)
    return new_agent, variables
