"""Functional train state: params + EMA + optimizer + BN stats in one pytree
(replaces the reference's LightningModule attributes + EMA-callback state,
mode_agent.py / callbacks/ema.py:144-153)."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    rng: jax.Array
    # completed-epoch counter, advanced host-side by the Trainer so resume
    # restarts at the right epoch even when epochs yield fewer batches than
    # limit_train_batches
    epoch: jax.Array = flax.struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))

    @classmethod
    def create(cls, variables, optimizer, rng, ema_dtype=None,
               param_dtype=None):
        """ema_dtype=jnp.bfloat16 halves EMA memory (EMA weights are only
        used for bf16 eval anyway). ``param_dtype=jnp.bfloat16`` stores the
        parameters themselves in bf16 (no f32 master copy) — pair it with
        the optimizer's ``stochastic_round=True`` so sub-ulp updates survive
        the write-back (optim.stochastic_round_bf16)."""
        params = variables["params"]
        if param_dtype is not None:
            params = jax.tree.map(lambda x: x.astype(param_dtype), params)
        if ema_dtype is not None:
            # copy=True: astype alone is a no-op when the dtype already
            # matches (e.g. bf16 params + bf16 EMA), and aliasing params
            # breaks buffer donation in the jitted train step ("donate the
            # same buffer twice")
            ema = jax.tree.map(
                lambda x: jnp.array(x, dtype=ema_dtype, copy=True), params)
        else:
            # materialize a distinct buffer copy — aliasing params would
            # break buffer donation in the jitted train step
            ema = jax.tree.map(jnp.copy, params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(params),
            ema_params=ema,
            rng=rng,
            epoch=jnp.zeros((), jnp.int32),
        )

    def eval_variables(self, use_ema: bool = True):
        """Variables for validation/rollout — EMA weights by default
        (conf/callbacks/calvin.yaml: evaluate_ema_weights_instead)."""
        return {"params": self.ema_params if use_ema else self.params,
                "batch_stats": self.batch_stats}

    def train_variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}
