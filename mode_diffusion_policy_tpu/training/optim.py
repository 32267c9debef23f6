"""Optimizers and learning-rate schedules.

- ``tri_stage_schedule``: warmup -> hold -> cosine-decay, matching the
  reference TriStageLRScheduler exactly (tri_stage_scheduler.py:96-139; note
  the "decay" stage is cosine, not exponential — the reference replaced it at
  :138-139).
- ``make_optimizer``: AdamW with the reference's decay/no-decay parameter
  groups (mode_agent.py:267-384): the DiT excludes only ``bias`` leaves from
  weight decay (the reference's 'LayerNorm'/'embedding' substrings never
  match its actual parameter names); encoder params all get decay.
- ``adopt``: the ADOPT optimizer (clipped-denominator adaptive momentum) the
  reference ships but leaves unwired (mode/utils/adopt.py:11-154) — provided
  as an optax transform for capability parity.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def tri_stage_schedule(peak_lr: float, total_steps: int,
                       phase_ratio: Tuple[float, float, float] = (0.02, 0.08, 0.9),
                       init_lr_scale: float = 0.1,
                       final_lr_scale: float = 1e-6):
    """optax schedule replicating TriStageLRScheduler.step semantics."""
    warmup_steps = int(total_steps * phase_ratio[0])
    hold_steps = int(total_steps * phase_ratio[1])
    decay_steps = int(total_steps * phase_ratio[2])
    init_lr = init_lr_scale * peak_lr
    final_lr = final_lr_scale * peak_lr
    warmup_rate = (peak_lr - init_lr) / warmup_steps if warmup_steps else 0.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        in_warmup = step < warmup_steps
        in_hold = step < warmup_steps + hold_steps
        in_decay = step <= warmup_steps + hold_steps + decay_steps
        warmup_lr = init_lr + warmup_rate * step
        decay_t = (step - warmup_steps - hold_steps) / max(decay_steps, 1)
        cos_lr = final_lr + 0.5 * (peak_lr - final_lr) * (
            1 + jnp.cos(decay_t * math.pi))
        return jnp.where(in_warmup, warmup_lr,
                         jnp.where(in_hold, peak_lr,
                                   jnp.where(in_decay, cos_lr, final_lr)))

    return schedule


def _decay_mask(params) -> Any:
    """True where weight decay applies. Mirrors get_optim_groups
    (mode_agent.py:365-384): DiT biases are excluded; everything else
    (including RMSNorm gains and pos_emb, per the reference's actual name
    matching) decays; encoder groups decay wholesale
    (mode_agent.py:281-284)."""
    def mask_fn(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if keys and keys[0] == "inner_model":
            return keys[-1] != "bias"
        return True
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(params, *, learning_rate: float = 1e-4,
                   betas: Tuple[float, float] = (0.9, 0.95),
                   transformer_weight_decay: float = 0.05,
                   use_lr_scheduler: bool = True,
                   total_steps: int = 45000,
                   phase_ratio: Tuple[float, float, float] = (0.02, 0.08, 0.9),
                   init_lr_scale: float = 0.1,
                   final_lr_scale: float = 1e-6,
                   max_grad_norm: Optional[float] = None,
                   optimizer_type: str = "adamw",
                   mu_dtype: Optional[Any] = None):
    """AdamW (or ADOPT) + tri-stage LR, masked weight decay. Returns
    (optax.GradientTransformation, schedule_fn). ``mu_dtype=jnp.bfloat16``
    halves the first-moment memory (useful to fit flagship-scale training on
    a single 16GB chip; the reference's DDP replicates fp32 state per GPU
    the same way)."""
    if use_lr_scheduler:
        schedule = tri_stage_schedule(learning_rate, total_steps, phase_ratio,
                                      init_lr_scale, final_lr_scale)
    else:
        schedule = optax.constant_schedule(learning_rate)

    mask = _decay_mask(params)
    if optimizer_type == "adamw":
        opt = optax.adamw(schedule, b1=betas[0], b2=betas[1],
                          weight_decay=transformer_weight_decay, mask=mask,
                          mu_dtype=mu_dtype)
    elif optimizer_type == "adopt":
        opt = optax.chain(
            adopt(b1=betas[0], b2=0.9999),
            optax.add_decayed_weights(transformer_weight_decay, mask),
            optax.scale_by_learning_rate(schedule))
    else:
        raise ValueError(f"unknown optimizer_type: {optimizer_type}")
    if max_grad_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
    return opt, schedule


class AdoptState(NamedTuple):
    count: jax.Array
    m: Any
    v: Any


def adopt(b1: float = 0.9, b2: float = 0.9999, eps: float = 1e-6):
    """ADOPT (arXiv 2411.02853; reference mode/utils/adopt.py): second moment
    initialized from the first gradient, momentum applied to the *normalized*
    gradient with the denominator from the previous step."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdoptState(count=jnp.zeros((), jnp.int32), m=zeros,
                          v=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        count = state.count

        def first(g, v):
            return g * g

        def later_v(g, v):
            return b2 * v + (1 - b2) * g * g

        is_first = count == 0
        is_second = count == 1

        new_v = jax.tree.map(
            lambda g, v: jnp.where(is_first, g * g, b2 * v + (1 - b2) * g * g),
            updates, state.v)

        def normed(g, v_prev):
            return g / jnp.maximum(jnp.sqrt(v_prev), eps)

        new_m = jax.tree.map(
            lambda g, v_prev, m: jnp.where(
                is_first, jnp.zeros_like(g),
                jnp.where(is_second, normed(g, v_prev),
                          b1 * m + (1 - b1) * normed(g, v_prev))),
            updates, state.v, state.m)
        out = jax.tree.map(lambda m: -m, new_m)  # scaled by lr downstream
        return out, AdoptState(count + 1, new_m, new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_decay_schedule(step, *, inv_gamma: float = 1.0, power: float = 2 / 3,
                       min_value: float = 0.0, max_value: float = 0.9999,
                       start_step: int = 0):
    """NVIDIA-style EMA warmup decay: ``1 - (1 + step/inv_gamma)^-power``
    clamped (reference ema.py:84-91, conf/callbacks/calvin.yaml:4-13)."""
    step = jnp.maximum(0, step - start_step - 1).astype(jnp.float32)
    value = 1.0 - (1.0 + step / inv_gamma) ** (-power)
    return jnp.clip(value, min_value, max_value)


def ema_update(ema_params, new_params, decay):
    """ema <- ema - (1-decay)*(ema - new)  (reference ema.py:117-126).
    Preserves the EMA leaves' dtype (they may be stored in bf16)."""
    return jax.tree.map(
        lambda e, p: (e - (1.0 - decay) * (e - p.astype(e.dtype))
                      ).astype(e.dtype),
        ema_params, new_params)
