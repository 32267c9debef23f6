"""Training-step stage profile on one chip (VERDICT r2 #2).

Decomposes the flagship train step (77.6 ms @ b=32 in round 2) into a
PERF.md-grade stage accounting by timing nested subsets of the step, each as
an n-iteration scan inside one jit (T(N)-T(1) differencing; per-call host
timing lies on this tunnel — see CLAUDE.md):

  aug                 on-device uint8 -> resize/shift/normalize x2 cameras
  enc_fwd             aug + 2x folded?no, train-mode ResNet-50 forward
  enc_grad            aug + encoder forward+backward (remat as in training)
  dit_grad            DiT loss+grad at fixed perceptual emb
  loss_grad           full loss forward+backward (no optimizer)
  full                + AdamW update + EMA (the real train step)

Run: python bench_train_profile.py   [BENCH_TRAIN_BATCH=32 BENCH_ITERS=6]
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.makedirs(os.path.expanduser("~/.cache/jax_mode_tpu"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_mode_tpu"))
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    from mode_diffusion_policy_tpu.ops.image import preprocess_camera
    from mode_diffusion_policy_tpu.training.loop import make_train_step
    from mode_diffusion_policy_tpu.training.optim import make_optimizer
    from mode_diffusion_policy_tpu.training.state import TrainState

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "32"))
    IMG = int(os.environ.get("BENCH_IMG", "224"))
    N = int(os.environ.get("BENCH_ITERS", "6"))

    cfg = MoDEAgentConfig(latent_dim=1024, n_layers=12, n_heads=8,
                          cond_dim=512, resnet_type="50", num_experts=4,
                          top_k=2, entropy_gamma=0.01, router_z_delta=0.001,
                          dtype=jnp.bfloat16,
                          encoder_remat=os.environ.get("BENCH_REMAT",
                                                       "1") == "1")
    agent = MoDEAgent(cfg)
    t0 = time.time()
    variables = agent.init_variables(jax.random.PRNGKey(0),
                                     image_hw=(IMG, IMG))
    log(f"init {time.time()-t0:.0f}s")
    optimizer, _ = make_optimizer(variables["params"], mu_dtype=jnp.bfloat16)
    state = TrainState.create(variables, optimizer, jax.random.PRNGKey(1),
                              ema_dtype=jnp.bfloat16)
    step_fn = make_train_step(agent, optimizer, log_grad_norms=False)

    rng = np.random.default_rng(0)
    ru8 = jnp.asarray(rng.integers(0, 255, (B, 1, IMG, IMG, 3), np.uint8))
    gu8 = jnp.asarray(rng.integers(0, 255, (B, 1, IMG, IMG, 3), np.uint8))
    acts = jnp.asarray(rng.standard_normal((B, 10, 7)).astype(np.float32) * .3)
    lang = jnp.asarray(rng.standard_normal((B, 1, 512)).astype(np.float32))
    emb_fixed = jnp.asarray(
        rng.standard_normal((B, 2, 2048)).astype(np.float32))

    def aug(key):
        return {
            "rgb_static": preprocess_camera(key, ru8, size=IMG, shift_pad=10,
                                            train=True),
            "rgb_gripper": preprocess_camera(key, gu8, size=IMG, shift_pad=4,
                                             train=True),
            "actions": acts, "lang_emb": lang,
        }


    def _consume(g):
        # reduce EVERY grad leaf into the scalar output — without this XLA
        # dead-code-eliminates whole backward subtrees (e.g. grads wrt one
        # layer-0 weight need no encoder backward at all) and the stage
        # under-measures
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(g)) * 1e-12

    # ---- stage bodies: each maps (carry_key, i) -> (key, scalar) ----------
    def body_aug(key, i):
        k = jax.random.fold_in(key, i)
        b = aug(k)
        return k, jnp.mean(b["rgb_static"]) + jnp.mean(b["rgb_gripper"])

    def body_enc_fwd(key, i):
        k = jax.random.fold_in(key, i)
        b = aug(k)
        emb, _ = agent.embed_visual_obs(
            {"params": state.params, "batch_stats": state.batch_stats},
            b["rgb_static"], b["rgb_gripper"], b["lang_emb"], train=True)
        return k, jnp.mean(emb["state_images"])

    def body_enc_grad(key, i):
        k = jax.random.fold_in(key, i)
        b = aug(k)

        def loss_of(p):
            emb, _ = agent.embed_visual_obs(
                {"params": p, "batch_stats": state.batch_stats},
                b["rgb_static"], b["rgb_gripper"], b["lang_emb"], train=True)
            return jnp.mean(emb["state_images"] ** 2)
        l, g = jax.value_and_grad(loss_of)(state.params)
        return k, l + _consume((g["static_resnet"], g["gripper_resnet"]))

    def body_dit_grad(key, i):
        k = jax.random.fold_in(key, i)
        from mode_diffusion_policy_tpu.models.modedit import (
            load_balancing_loss, router_z_loss)
        from mode_diffusion_policy_tpu.models.edm.precond import denoiser_loss
        ks, kn, kd, kr, kg = jax.random.split(k, 5)
        sigmas = agent.sample_density(ks, (B,))
        noise = jax.random.normal(kn, acts.shape)
        # key-jittered emb so the encoder-free stage can't be hoisted
        emb = {"state_images": emb_fixed
               + jax.random.normal(kg, (1,), emb_fixed.dtype) * 1e-3}

        def loss_of(p):
            aux_out = {}

            def inner_apply(states, scaled_actions, goal, sigma, **kw):
                pred, aux = agent.dit.apply(
                    {"params": p["inner_model"]}, states, scaled_actions,
                    goal, sigma, train=True, return_aux=True,
                    rngs={"dropout": kd, "router": kr, "goal_mask": kg})
                aux_out["layers"] = aux
                return pred
            al, _ = denoiser_loss(inner_apply, emb, acts, lang, noise, sigmas,
                                  sigma_data=cfg.sigma_data)
            total = al + cfg.entropy_gamma * load_balancing_loss(
                aux_out["layers"]) + cfg.router_z_delta * router_z_loss(
                aux_out["layers"])
            return total
        l, g = jax.value_and_grad(loss_of)(state.params)
        return k, l + _consume(g["inner_model"])

    def body_loss_grad(key, i):
        k = jax.random.fold_in(key, i)
        b = aug(k)

        def loss_of(p):
            loss, (_, _) = agent.training_loss(
                {"params": p, "batch_stats": state.batch_stats}, b, k)
            return loss
        l, g = jax.value_and_grad(loss_of)(state.params)
        return k, l + _consume(g)

    def body_opt(key, i):
        # optimizer+EMA in isolation: grads = params * per-iter scalar
        # (the multiply fuses into the update kernels — no materialized
        # grads tree, so traffic ~= the true optimizer read/write set)
        k = jax.random.fold_in(key, i)
        s = jax.random.uniform(k, (), minval=0.9, maxval=1.1) * 1e-3
        g = jax.tree_util.tree_map(lambda p: p.astype(jnp.float32) * s,
                                   state.params)
        if hasattr(optimizer, "update_with_ema"):
            p2, _, e2 = optimizer.update_with_ema(
                g, state.opt_state, state.params, state.ema_params, 0.999)
        else:
            import optax as _ox
            upd, _ = optimizer.update(g, state.opt_state, state.params)
            p2 = _ox.apply_updates(state.params, upd)
            from mode_diffusion_policy_tpu.training.optim import ema_update
            e2 = ema_update(state.ema_params, p2, 0.999)
        # consume EVERY output leaf (fused reductions) or XLA DCEs the rest
        return k, _consume(p2) + _consume(e2)

    stages = [("aug", body_aug), ("enc_fwd", body_enc_fwd),
              ("enc_grad", body_enc_grad), ("dit_grad", body_dit_grad),
              ("loss_grad", body_loss_grad), ("opt", body_opt)]
    only = os.environ.get("BENCH_STAGES")
    if only:
        keep = set(only.split(","))
        stages = [s for s in stages if s[0] in keep]

    # params/state travel as jit ARGUMENTS: the stage bodies close over
    # `state`, and a closure capture ships 2.7GB of weights as lowered
    # constants through the remote-compile tunnel (measured: the dit_grad
    # compile never returned). Rebind via a params argument instead.
    results = {}
    for name, body in stages:
        @functools.partial(jax.jit, static_argnums=(2,))
        def run_n(params, key, n, body=body):
            nonlocal state
            state_bound = state.replace(params=params)
            orig, state = state, state_bound
            try:
                def b(c, i):
                    return body(c, i)
                _, outs = jax.lax.scan(b, key, jnp.arange(n))
            finally:
                state = orig
            return outs
        t0 = time.time()
        np.asarray(run_n(state.params, jax.random.PRNGKey(1), 1))
        log(f"{name}: n=1 compile+run {time.time()-t0:.0f}s")
        t0 = time.time()
        np.asarray(run_n(state.params, jax.random.PRNGKey(1), N))
        log(f"{name}: n={N} compile+run {time.time()-t0:.0f}s")
        t0 = time.time()
        np.asarray(run_n(state.params, jax.random.PRNGKey(2), 1))
        t1 = time.time() - t0
        t0 = time.time()
        np.asarray(run_n(state.params, jax.random.PRNGKey(3), N))
        tN = time.time() - t0
        per = (tN - t1) / (N - 1)
        results[name] = per
        log(f"{name}: {per*1000:.2f} ms")

    # full real step (donated state, same as bench_train.py)
    if not only or "full" in (only or "full").split(","):
        @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
        def train_n(st, n):
            def b(st, i):
                key = jax.random.fold_in(jax.random.PRNGKey(7), i)
                st, metrics = step_fn(st, aug(key))
                return st, metrics["train/total_loss"]
            return jax.lax.scan(b, st, jnp.arange(n))
        st = jax.device_put(state)
        t0 = time.time()
        st, _ = train_n(st, 1)
        jax.block_until_ready(st.step)
        log(f"full: n=1 compile+run {time.time()-t0:.0f}s")
        st, _ = train_n(st, N)
        jax.block_until_ready(st.step)
        t0 = time.time()
        st, _ = train_n(st, 1)
        jax.block_until_ready(st.step)
        t1 = time.time() - t0
        t0 = time.time()
        st, l = train_n(st, N)
        l = np.asarray(l)
        tN = time.time() - t0
        results["full"] = (tN - t1) / (N - 1)
        log(f"full: {results['full']*1000:.2f} ms (loss {l[:2]})")

    print("\n== train-step stage profile (b=%d) ==" % B)
    for k, v in results.items():
        print(f"  {k:<10s} {v*1000:7.2f} ms")
    if "full" in results and "loss_grad" in results:
        print(f"  optimizer+EMA (full - loss_grad): "
              f"{(results['full'] - results['loss_grad'])*1000:.2f} ms")
    if "enc_grad" in results and "dit_grad" in results \
            and "loss_grad" in results:
        print(f"  interaction (loss_grad - enc_grad - dit_grad + aug): "
              f"{(results['loss_grad'] - results['enc_grad'] - results['dit_grad'] + results.get('aug', 0)) * 1000:.2f} ms")


if __name__ == "__main__":
    main()
