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


def stochastic_round_bf16(x32: jax.Array, key: jax.Array,
                          noise: str = "hw") -> jax.Array:
    """Round f32 -> bf16 stochastically: each value rounds to one of its two
    neighboring bf16 values with probability proportional to proximity, so
    E[round(x)] = x and tiny updates (|u| below half a bf16 ulp of p, which
    round-to-nearest would drop EVERY step) land with the right frequency.

    The TPU recipe for training with bf16 parameter storage and no f32
    master copy (-8 B/param of optimizer read+write traffic). Implemented as
    the classic bit trick: add uniform 16-bit noise to the low mantissa bits
    and truncate — carries propagate correctly through mantissa/exponent in
    IEEE bit space, and sign-magnitude layout makes it unbiased for both
    signs. inf/NaN pass through unperturbed.

    ``noise`` selects the 16-bit noise source (SR needs uniformity, not
    cross-backend reproducibility; runs stay deterministic per backend for
    a fixed key):

    - ``"hw"`` (default): ``lax.rng_bit_generator`` with the backend-default
      algorithm (the TPU hardware RNG). Lowers as one custom call per leaf
      (528 calls, ~4 ms/step flagship) that runs as a SEPARATE cheap pass
      and leaves the fused optimizer update single-pass — the measured
      winner (device traces tt_r4/tt_r4c, docs/PERF.md "train step").
    - ``"threefry"``: ``jax.random.bits`` — pure arithmetic XLA INLINES
      into the 518 per-leaf update fusions, which splits them into extra
      HBM passes (+9 ms/step measured at flagship scale vs hw). Kept for
      cross-backend reproducibility of the noise stream.
    - ``"threefry8"``: threefry generating ONE BYTE per parameter (4x less
      RNG arithmetic than 32-bit threefry), expanded to 16 bits as
      ``r8 * 257`` — uniform over the 257-strided lattice {0, 257, ...,
      65535} with mean exactly 32767.5, so the rounding stays EXACTLY
      unbiased, just with 256 probability levels instead of 65536 (far
      more than SR needs; tests cover unbiasedness + sub-ulp accumulation
      for every source). Same inlining penalty as ``"threefry"``: the
      fusion split, not bit generation, dominates the threefry cost.
    """
    x32 = x32.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    if noise == "threefry8":
        r8 = jax.random.bits(key, x32.shape, jnp.uint8)
        rnd = r8.astype(jnp.uint32) * jnp.uint32(257)
    elif noise == "threefry":
        rnd = jax.random.bits(key, x32.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    else:
        kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
        seed = jnp.tile(kd, 2)[:4]
        _, rnd = jax.lax.rng_bit_generator(seed, x32.shape, dtype=jnp.uint32)
        rnd = rnd & jnp.uint32(0xFFFF)
    rounded = jnp.where(jnp.isfinite(x32), bits + rnd, bits)
    return jax.lax.bitcast_convert_type(
        rounded & jnp.uint32(0xFFFF0000), jnp.float32).astype(jnp.bfloat16)


class FusedAdamWEmaState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


class FusedAdamWEma:
    """AdamW (+ optional global-norm clip) + masked weight decay + LR
    schedule + parameter update + EMA maintenance as ONE elementwise pass
    per parameter leaf.

    Why: the optax chain materializes the intermediate ``updates`` tree
    between ``scale_by_adam`` / ``add_decayed_weights`` / ``apply_updates``
    / ``ema_update``, and at flagship scale (~0.5B params) the measured
    optimizer+EMA stage was 37.4 ms of the 81.9 ms train step @ b=32 —
    ~2x the ~17 ms HBM roofline of the minimal read/write set (docs/PERF.md
    "train step"). Fusing the whole update into a single tree_map lets XLA
    emit one loop fusion per leaf touching each byte exactly once.

    Numerics replicate ``optax.adamw`` (scale_by_adam -> add_decayed_weights
    -> scale_by_learning_rate) + ``optax.apply_updates`` + ``ema_update``
    bit-for-bit, including the bf16 ``mu_dtype`` promotion behavior
    (``b1*mu`` computed in bf16 before the f32 add, as optax's
    ``tree_update_moment`` does) and the f32 bias-correction scalars
    (tested: tests/test_training.py::test_fused_adamw_matches_optax).
    Bit-equality holds under jit — the boundary that matters; in eager mode
    optax's internally inline-jitted bias correction can differ by 1 ulp
    (XLA's compiled pow lowering vs the eager kernel).

    The state is a flat ``FusedAdamWEmaState(count, mu, nu)`` (not the optax
    chain tuple); opt_state trees checkpointed with the unfused optimizer
    are not resume-compatible. GSPMD/ZeRO-1 sharding works unchanged — the
    update stays elementwise so XLA shards it with the state
    (parallel/mesh.py::zero1_state_sharding).
    """

    def __init__(self, schedule, *, b1: float = 0.9, b2: float = 0.95,
                 eps: float = 1e-8, weight_decay: float = 0.05,
                 mask: Any = None, mu_dtype: Optional[Any] = None,
                 nu_dtype: Optional[Any] = None,
                 max_grad_norm: Optional[float] = None,
                 stochastic_round: bool = False,
                 sr_noise: str = "hw"):
        self.schedule = schedule
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        self.mask = mask  # pytree of static Python bools (or None = decay all)
        self.mu_dtype = mu_dtype
        # nu_dtype=bf16 is an OPT-IN traffic saver (-4 B/param of the
        # 28 B/param update pass, measured ~-3 ms/step at flagship scale):
        # unlike mu_dtype it has no optax equivalent and is NOT
        # bit-compatible with optax.adamw — the second moment loses 16
        # mantissa bits, perturbing the effective per-parameter LR by up to
        # ~0.2%. Gate on the convergence smoke before adopting for a run.
        self.nu_dtype = nu_dtype
        # stochastic_round=True: bf16-parameter training with no f32 master
        # copy (params/grads/moments/EMA all bf16 = 18 B/param vs the f32-
        # master 28 B/param on the HBM-bound update pass). The update math
        # runs in f32 and the parameter write-back uses
        # :func:`stochastic_round_bf16`, so sub-ulp updates accumulate in
        # expectation instead of being dropped by round-to-nearest. Requires
        # passing ``key=`` to update_with_ema; convergence-tested at tiny
        # scale (tests/test_training.py) — gate on the flagship convergence
        # smoke before adopting for a run (docs/PERF.md "train step").
        self.stochastic_round = stochastic_round
        # SR noise source — see :func:`stochastic_round_bf16`. "hw" wins
        # with default layouts; "threefry" wins under trainer.auto_layout
        # (it fuses into the update pass). The Trainer picks per-config.
        self.sr_noise = sr_noise
        self.max_grad_norm = max_grad_norm

    def init(self, params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=self.mu_dtype or p.dtype),
            params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=self.nu_dtype or p.dtype),
            params)
        return FusedAdamWEmaState(count=jnp.zeros([], jnp.int32), mu=mu,
                                  nu=nu)

    def _prep(self, grads, count):
        """(count_inc, c1, c2, lr, clip_scale) — the per-step scalars."""
        count_inc = optax.safe_increment(count)
        c1 = 1 - self.b1 ** count_inc   # f32 scalars, as optax
        c2 = 1 - self.b2 ** count_inc   # tree_bias_correction computes them
        lr = self.schedule(count)
        if self.max_grad_norm is not None:
            g_norm = optax.global_norm(grads)
            trigger = g_norm < self.max_grad_norm
            clip = lambda t: jnp.where(  # noqa: E731 — optax clip semantics
                trigger, t, (t / g_norm.astype(t.dtype)) * self.max_grad_norm)
        else:
            clip = None
        return count_inc, c1, c2, lr, clip

    def _mask_tree(self, params):
        return self.mask if self.mask is not None else jax.tree.map(
            lambda _: True, params)

    def _leaf(self, c1, c2, lr, clip, ema_decay):
        b1, b2, eps, wd = self.b1, self.b2, self.eps, self.weight_decay
        mu_dtype, nu_dtype = self.mu_dtype, self.nu_dtype
        sr = self.stochastic_round
        sr_noise = self.sr_noise

        def leaf(g, p, mu, nu, e, decay_p, k=None):
            if clip is not None:
                g = clip(g)
            if sr:
                # bf16-storage mode: the whole update runs in f32 (the
                # stored tensors may all be bf16) and the parameter
                # write-back rounds stochastically
                g32 = g.astype(jnp.float32)
                p32 = p.astype(jnp.float32)
                mu_f = (1 - b1) * g32 + b1 * mu.astype(jnp.float32)
                nu_f = (1 - b2) * (g32 ** 2) + b2 * nu.astype(jnp.float32)
            else:
                # optax tree_update_moment: b1*mu runs in mu's (maybe bf16)
                # dtype; the (1-b1)*g term is f32 — keep that promotion
                # order for bit-compatibility
                p32 = p
                mu_f = (1 - b1) * g + b1 * mu
                nu_f = (1 - b2) * (g ** 2) + b2 * nu
            u = (mu_f / c1.astype(mu_f.dtype)) / (
                jnp.sqrt(nu_f / c2.astype(nu_f.dtype)) + eps)
            if decay_p:
                u = u + wd * p32
            u = (-lr) * u
            if sr and p.dtype == jnp.bfloat16:
                p_new = stochastic_round_bf16(p32 + u, k, noise=sr_noise)
            else:
                p_new = jnp.asarray(p32 + u).astype(p.dtype)
            mu_new = mu_f.astype(mu_dtype) if mu_dtype is not None else \
                mu_f.astype(mu.dtype)
            nu_new = nu_f.astype(nu_dtype) if nu_dtype is not None else \
                nu_f.astype(nu.dtype)
            if e is None:
                return p_new, mu_new, nu_new, None
            e_new = (e - (1.0 - ema_decay) * (e - p_new.astype(e.dtype))
                     ).astype(e.dtype)
            return p_new, mu_new, nu_new, e_new

        return leaf

    def update_with_ema(self, grads, state: FusedAdamWEmaState, params,
                        ema_params, ema_decay, *, key=None):
        """The fused path: returns (new_params, new_state, new_ema).
        ``key`` is required when ``stochastic_round`` is on (one fold per
        parameter leaf seeds the rounding noise)."""
        count_inc, c1, c2, lr, clip = self._prep(grads, state.count)
        leaf = self._leaf(c1, c2, lr, clip, ema_decay)
        if self.stochastic_round:
            if key is None:
                raise ValueError("stochastic_round=True requires passing "
                                 "key= to update_with_ema")
            flat, treedef = jax.tree.flatten(params)
            keys = jax.tree.unflatten(
                treedef, list(jax.random.split(key, len(flat))))
            out = jax.tree.map(leaf, grads, params, state.mu, state.nu,
                               ema_params, self._mask_tree(params), keys)
        else:
            out = jax.tree.map(leaf, grads, params, state.mu, state.nu,
                               ema_params, self._mask_tree(params))
        is4 = lambda x: isinstance(x, tuple) and len(x) == 4  # noqa: E731
        new_p = jax.tree.map(lambda t: t[0], out, is_leaf=is4)
        new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=is4)
        new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=is4)
        new_e = jax.tree.map(lambda t: t[3], out, is_leaf=is4)
        return new_p, FusedAdamWEmaState(count_inc, new_mu, new_nu), new_e

    def update(self, grads, state: FusedAdamWEmaState, params=None):
        """optax-compatible (updates, state) — same math, EMA not touched.
        Kept so generic callers (and the parity test) can drive this like a
        GradientTransformation; the Trainer uses update_with_ema."""
        if self.stochastic_round:
            raise ValueError("stochastic_round needs the fused write-back; "
                             "use update_with_ema(key=...)")
        count_inc, c1, c2, lr, clip = self._prep(grads, state.count)
        b1, b2, eps, wd = self.b1, self.b2, self.eps, self.weight_decay

        def leaf(g, p, mu, nu, decay_p):
            if clip is not None:
                g = clip(g)
            mu_f = (1 - b1) * g + b1 * mu
            nu_f = (1 - b2) * (g ** 2) + b2 * nu
            u = (mu_f / c1.astype(mu_f.dtype)) / (
                jnp.sqrt(nu_f / c2.astype(nu_f.dtype)) + eps)
            if decay_p:
                u = u + wd * p
            mu_new = (mu_f.astype(self.mu_dtype)
                      if self.mu_dtype is not None else mu_f)
            nu_new = (nu_f.astype(self.nu_dtype)
                      if self.nu_dtype is not None else nu_f)
            return (-lr) * u, mu_new, nu_new

        out = jax.tree.map(leaf, grads, params, state.mu, state.nu,
                           self._mask_tree(params))
        is3 = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        updates = jax.tree.map(lambda t: t[0], out, is_leaf=is3)
        new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=is3)
        new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=is3)
        return updates, FusedAdamWEmaState(count_inc, new_mu, new_nu)


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
                   mu_dtype: Optional[Any] = None,
                   nu_dtype: Optional[Any] = None,
                   stochastic_round: bool = False,
                   sr_noise: str = "hw",
                   fused: bool = True):
    """AdamW (or ADOPT) + tri-stage LR, masked weight decay. Returns
    (optimizer, schedule_fn). ``mu_dtype=jnp.bfloat16`` halves the
    first-moment memory (useful to fit flagship-scale training on a single
    16GB chip; the reference's DDP replicates fp32 state per GPU the same
    way). For adamw the default is the single-pass :class:`FusedAdamWEma`
    (bit-identical numerics, ~2x faster update at flagship scale);
    ``fused=False`` returns the plain optax chain."""
    if use_lr_scheduler:
        schedule = tri_stage_schedule(learning_rate, total_steps, phase_ratio,
                                      init_lr_scale, final_lr_scale)
    else:
        schedule = optax.constant_schedule(learning_rate)

    mask = _decay_mask(params)
    if not (optimizer_type == "adamw" and fused):
        if nu_dtype is not None:
            raise ValueError("nu_dtype requires the fused AdamW path")
        if stochastic_round:
            raise ValueError("stochastic_round requires the fused AdamW "
                             "path")
    if optimizer_type == "adamw":
        if fused:
            return FusedAdamWEma(
                schedule, b1=betas[0], b2=betas[1],
                weight_decay=transformer_weight_decay, mask=mask,
                mu_dtype=mu_dtype, nu_dtype=nu_dtype,
                stochastic_round=stochastic_round, sr_noise=sr_noise,
                max_grad_norm=max_grad_norm), schedule
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
