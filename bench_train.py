"""Training-throughput benchmark on one chip (not run by the driver; bench.py
is the headline inference benchmark).

Measures the full flagship train step — on-device augmentation, 2x
FiLM-ResNet-50 (rematerialized), EDM loss with router aux losses, backward,
AdamW + EMA — scanned n times inside one jit with the state donated and
chained (see CLAUDE.md for why per-call host timing lies on this tunnel).

Flagship (739M params) fits a single 16GB v5e at per-chip batch 32 — the
reference's per-GPU load (global 128 over 4 GPUs) — using bf16 AdamW first
moment + bf16 EMA storage. On a multi-chip mesh, prefer ZeRO-1 sharding
(parallel/mesh.zero1_state_sharding) over these dtype tricks.
"""
from __future__ import annotations

import json
import os
import sys
import time

# Same repo-local persistent compile cache as bench.py (advisor r4: the
# ~/.cache dir is wiped between rounds, so every queued train run paid the
# full remote first-compile inside its timeout budget).
_CACHE_DIR = os.environ.get("JAX_MODE_CACHE_DIR",
                            os.path.join(os.path.dirname(
                                os.path.abspath(__file__)), ".jax_cache"))
os.makedirs(_CACHE_DIR, exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def setup_flagship_train():
    """(state, train_n_impl, B) for the flagship train benchmark, with every
    BENCH_* env knob applied. Shared with bench_train_trace.py so the device
    trace always profiles exactly the program this benchmark times.

    Env knobs: BENCH_TRAIN_BATCH, BENCH_IMG, BENCH_TRAIN_GROUPED,
    BENCH_REMAT=0 (skip encoder jax.checkpoint), BENCH_BF16_STATE=1
    (full-bf16 state + stochastic-rounded updates, 18 vs 28 B/param on the
    update pass), BENCH_NU_BF16=1 (bf16 second moment only) — docs/PERF.md
    "train step".
    """
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    from mode_diffusion_policy_tpu.ops.image import preprocess_camera
    from mode_diffusion_policy_tpu.training.loop import make_train_step
    from mode_diffusion_policy_tpu.training.optim import make_optimizer
    from mode_diffusion_policy_tpu.training.state import TrainState

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "32"))
    IMG = int(os.environ.get("BENCH_IMG", "224"))

    cfg = MoDEAgentConfig(latent_dim=1024, n_layers=12, n_heads=8,
                          cond_dim=512, resnet_type="50", num_experts=4,
                          top_k=2, entropy_gamma=0.01, router_z_delta=0.001,
                          dtype=jnp.bfloat16,
                          # sort+ragged_dot top-2 MoE: loss/grad-equivalent
                          # (tests/test_modedit_parity.py) but MEASURED
                          # SLOWER at this scale (85.1 vs 80.0 ms/step @
                          # b=32 — ragged_dot lowering overhead exceeds the
                          # 2x MoE-FLOP saving when MoE is a minor share of
                          # the step); off by default, see docs/PERF.md
                          use_grouped_moe=os.environ.get(
                              "BENCH_TRAIN_GROUPED", "0") == "1",
                          encoder_remat=os.environ.get(
                              "BENCH_REMAT", "1") == "1",
                          # BENCH_GN=1: GroupNorm(32) encoders — kills the
                          # BatchNorm backward's full-batch per-channel grad
                          # reductions (VERDICT r4 #3); training-mode swap,
                          # not BN-checkpoint compatible
                          encoder_norm="group" if os.environ.get(
                              "BENCH_GN", "0") == "1" else "batch")
    agent = MoDEAgent(cfg)
    t0 = time.time()
    variables = agent.init_variables(jax.random.PRNGKey(0),
                                     image_hw=(IMG, IMG))
    log(f"init {time.time()-t0:.0f}s")
    bf16_state = os.environ.get("BENCH_BF16_STATE") == "1"
    # SR noise source mirrors the Trainer's pick (hw: separate cheap RNG
    # pass keeps the fused update single-pass; inlined threefry splits it —
    # docs/PERF.md); BENCH_SR_NOISE={hw,threefry,threefry8} for sweeps
    sr_noise = os.environ.get("BENCH_SR_NOISE", "hw")
    optimizer, _ = make_optimizer(
        variables["params"], mu_dtype=jnp.bfloat16,
        stochastic_round=bf16_state, sr_noise=sr_noise,
        nu_dtype=jnp.bfloat16 if bf16_state
        or os.environ.get("BENCH_NU_BF16") == "1" else None)
    state = TrainState.create(variables, optimizer, jax.random.PRNGKey(1),
                              ema_dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16 if bf16_state
                              else None)
    step_fn = make_train_step(agent, optimizer, log_grad_norms=False)

    rng = np.random.default_rng(0)
    # the raw batch is an explicit jit ARGUMENT, not a closure capture:
    # closed-over device arrays become HLO constants, which (a) bloats the
    # program/compile-cache key by ~10 MB and (b) makes AOT lowering fetch
    # them device->host (`mlir.ir_constant(val._value)`) — a round-trip that
    # flaked twice on the axon relay (INVALID_ARGUMENT / RESOURCE_EXHAUSTED)
    raw = {
        "ru8": jnp.asarray(rng.integers(0, 255, (B, 1, IMG, IMG, 3),
                                        np.uint8)),
        "gu8": jnp.asarray(rng.integers(0, 255, (B, 1, IMG, IMG, 3),
                                        np.uint8)),
        "actions": jnp.asarray(
            rng.standard_normal((B, 10, 7)).astype(np.float32) * .3),
        "lang_emb": jnp.asarray(
            rng.standard_normal((B, 1, 512)).astype(np.float32)),
    }

    def train_n_impl(state, raw, n):
        """n steps; ``n`` is a DEVICE scalar (dynamic fori_loop trip count),
        so every call — any n — runs ONE executable that feeds itself. On
        the axon relay, XLA-chosen-layout arrays are only reliable inside a
        single executable's donate-feedback loop: handing them to a second
        executable (a different static scan length) flakes with
        INVALID_ARGUMENT at execution, and every relayout path (device_put,
        host round-trip, compiled identity) can be silently canonicalized
        or rejected. Returns (state, (mean_loss, last_loss))."""
        def body(i, carry):
            st, s, _ = carry
            key = jax.random.fold_in(jax.random.PRNGKey(7), i)
            batch = {
                "rgb_static": preprocess_camera(key, raw["ru8"], size=IMG,
                                                shift_pad=10, train=True),
                "rgb_gripper": preprocess_camera(key, raw["gu8"], size=IMG,
                                                 shift_pad=4, train=True),
                "actions": raw["actions"], "lang_emb": raw["lang_emb"],
            }
            st, metrics = step_fn(st, batch)
            loss = metrics["train/total_loss"]
            return st, s + loss, loss
        state, s, last = jax.lax.fori_loop(
            0, n, body, (state, jnp.float32(0), jnp.float32(0)))
        return state, (s / jnp.maximum(n, 1).astype(jnp.float32), last)

    return state, raw, train_n_impl, B


def main():
    N = int(os.environ.get("BENCH_TRAIN_ITERS", "6"))
    state, raw, train_n_impl, B = setup_flagship_train()

    if os.environ.get("BENCH_AUTO_LAYOUT") == "1":
        # Let XLA choose entry layouts (kills the per-step expert-weight
        # transpose copies — docs/PERF.md "train step"). ONE executable for
        # every n (dynamic fori_loop count): the state's XLA-chosen-layout
        # buffers only ever feed the program that produced them.
        from mode_diffusion_policy_tpu.training.loop import jit_auto_layout
        cell = {}

        def train_n(st, n):
            if "fn" not in cell:
                cell["fn"], st = jit_auto_layout(
                    train_n_impl, st,
                    example_args=(raw, jnp.int32(n)),
                    rest_shardings=(None, None))
            return cell["fn"](st, raw, jnp.int32(n))
    else:
        jfn = jax.jit(train_n_impl, donate_argnums=(0,))

        def train_n(st, n):
            return jfn(st, raw, jnp.int32(n))
        state = jax.device_put(state)

    if int(os.environ.get("BENCH_TRAIN_CONVERGE", "0")):
        # Convergence smoke (VERDICT r1 #10): optimize the flagship stack for
        # ~500 real-shape steps on-chip on a fixed batch under per-step
        # random augmentation (a learnable objective) and require a sustained
        # loss decrease with finite losses throughout.
        #
        # All steps run in ONE executable call with per-window loss means
        # accumulated in-program: under AUTO_LAYOUT the earlier chunked loop
        # re-entered the executable 10x, and the axon relay canonicalizes
        # some donated-output layouts at runtime (bf16[7,7,3,64]
        # T(4,128)->T(8,128)) so re-entry flaked INVALID_ARGUMENT through
        # every relayout path (R5_TRAIN_QUEUE.log 2026-08-20). Inside one
        # donate-feedback loop the layouts never cross a program boundary.
        steps = int(os.environ["BENCH_TRAIN_CONVERGE"])
        chunk = 50
        n_win = steps // chunk
        inner = train_n_impl

        def conv_impl(state, raw, n):
            def win_body(w, carry):
                st, means = carry
                st, (mean, _) = inner(st, raw, n)
                return st, means.at[w].set(mean)
            return jax.lax.fori_loop(
                0, n_win, win_body, (state, jnp.zeros((n_win,), jnp.float32)))

        t0 = time.time()
        if os.environ.get("BENCH_AUTO_LAYOUT") == "1":
            from mode_diffusion_policy_tpu.training.loop import jit_auto_layout
            fn, state = jit_auto_layout(conv_impl, state,
                                        example_args=(raw, jnp.int32(chunk)),
                                        rest_shardings=(None, None))
            state, means = fn(state, raw, jnp.int32(chunk))
        else:
            state, means = jax.jit(conv_impl, donate_argnums=(0,))(
                state, raw, jnp.int32(chunk))
        means = np.asarray(means)
        assert np.isfinite(means).all(), means
        for c, m in enumerate(means):
            log(f"steps {c*chunk}-{(c+1)*chunk}: mean loss {m:.4f}")
        first, last = float(means[0]), float(means[-1])
        print(f"convergence: {steps} steps in {time.time()-t0:.0f}s, "
              f"loss {first:.4f} -> {last:.4f} "
              f"({'OK' if last < 0.7 * first else 'NO DECREASE'})")
        assert last < 0.7 * first, (first, last)
        return

    t0 = time.time()
    state, (m1, _) = train_n(state, 1)
    log(f"n=1 compile+run {time.time()-t0:.0f}s loss={float(np.asarray(m1)):.6f}")
    t0 = time.time()
    state, (mN, _) = train_n(state, N)
    np.asarray(mN)
    log(f"n={N} run {time.time()-t0:.0f}s")
    t0 = time.time()
    state, l = train_n(state, 1)
    np.asarray(l[0])
    t1 = time.time() - t0
    t0 = time.time()
    state, l = train_n(state, N)
    mean, last = (float(np.asarray(v)) for v in l)
    tN = time.time() - t0
    per = (tN - t1) / (N - 1)
    print(f"train step: {per*1000:.1f} ms @ b={B} -> "
          f"{B/per:.0f} samples/s/chip; loss mean={mean:.4f} last={last:.4f}")
    # machine-readable result line (harvested into BENCH_TRAIN_r*.json by
    # the queue scripts so train perf is a committed, driver-checkable record)
    knobs = {k: os.environ[k] for k in sorted(os.environ)
             if k.startswith("BENCH_") and k != "BENCH_PROFILE"}
    print(json.dumps({
        "metric": "flagship train step (739M params, b=%d, aug+2xRN50 remat"
                  "+EDM loss+AdamW+EMA)" % B,
        "value": round(per * 1000, 2), "unit": "ms/step",
        "samples_per_s_chip": round(B / per, 1),
        "loss_mean": round(mean, 4), "knobs": knobs,
    }))


if __name__ == "__main__":
    main()
