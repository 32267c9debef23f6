"""Benchmark: end-to-end batched 10-step action-chunk inference on one chip.

Measures the BASELINE.json north-star pipeline: raw uint8 camera frames ->
on-device resize/normalize -> 2x FiLM-ResNet-50 -> 10-step DDIM denoise of
the 307M-active-class MoDE (12 layers, 1024 embed, 4 experts top-2) with
per-sigma routing precompute, all inside one jit, batch 128, bfloat16.

Prints ONE JSON line:
  {"metric": ..., "value": chunks/s/chip, "unit": ..., "vs_baseline": ...}

vs_baseline is measured against the north-star target of >=5k chunks/s on a
v5e-8, i.e. 625 chunks/s/chip.
"""
from __future__ import annotations

import json
import os
import sys
import time

# The persistent compile cache lives INSIDE the repo (and is committed) so
# the driver's end-of-round bench run hits warm executables even though the
# home directory is wiped between rounds: the round-3 driver bench paid a
# 456.8 s first-compile through the remote-compile service for the exact
# program this file had already compiled in-session (VERDICT r3 item 5).
# Cache keys cover the serialized HLO + compile options + backend, so a hit
# requires the committed cache to have been populated by running THIS
# revision of the model code on the same jax/libtpu — refresh it (make
# bench-cache) whenever the benched program changes.
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


def main():
    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    from mode_diffusion_policy_tpu.ops.image import preprocess_camera

    B = int(os.environ.get("BENCH_BATCH", "128"))
    IMG = int(os.environ.get("BENCH_IMG", "224"))
    ITERS = int(os.environ.get("BENCH_ITERS", "10"))

    log(f"devices: {jax.devices()}")
    cfg = MoDEAgentConfig(latent_dim=1024, n_layers=12, n_heads=8,
                          cond_dim=512, resnet_type="50", num_experts=4,
                          top_k=2, dtype=jnp.bfloat16,
                          # Pallas fused top-2 kernel: ~1.6x the XLA gather
                          # path at b=1 (46 vs 74 us/layer), ~par at b=128
                          use_pallas_moe=os.environ.get(
                              "BENCH_PALLAS", "1") == "1",
                          # int8 x int8 MoE compute (weights quantized once
                          # into the "quant" collection): 1627 vs 1289
                          # chunks/s; e2e action MAE vs bf16 is 6e-5 (20x
                          # under the 1e-3 parity budget). BENCH_INT8=0
                          # reverts to pure bf16.
                          use_int8_moe=os.environ.get(
                              "BENCH_INT8", "1") == "1",
                          # fused ln+sigma-add+QKV+QK-norm+SDPA+proj+residual
                          # attention kernel: 171 -> 128 us/layer vs the XLA
                          # lowering (f32-accumulated, parity-neutral; CPU
                          # interpret parity 2e-7). BENCH_PALLAS_ATTN=0
                          # reverts.
                          use_pallas_attn=os.environ.get(
                              "BENCH_PALLAS_ATTN", "1") == "1",
                          # whole-layer kernel (attention + MoE in ONE
                          # pallas launch; halves the 240 launches/chunk and
                          # keeps the inter-block activation in VMEM —
                          # round 5, after the sigma-table glue removal
                          # measured neutral). BENCH_FUSED_LAYER=0 reverts
                          # to the two-kernel path.
                          use_fused_layer=os.environ.get(
                              "BENCH_FUSED_LAYER", "1") == "1",
                          # the whole 12-layer DiT in ONE launch per denoise
                          # step (fused_dit_q8c): 10 launches/chunk. Takes
                          # precedence over use_fused_layer on the hoisted
                          # fast path when enabled.
                          use_megakernel=os.environ.get(
                              "BENCH_MEGA", "0") == "1",
                          # int8 wqkv/c_proj inside the fused attention
                          # kernel (107 vs 135 us/layer) — e2e action MAE
                          # 5.2e-3 vs bf16, OVER the 1e-3 parity budget
                          # (attention error scales with the full activation,
                          # unlike the MoE contribution), so opt-in like the
                          # int8 encoders (docs/PERF.md).
                          use_int8_attn=os.environ.get(
                              "BENCH_INT8_ATTN", "0") == "1",
                          # round-4 bisection knobs for the round-3 hoisted
                          # chunk-invariant path (BENCH_HOIST=0 restores the
                          # round-2 per-step denoiser; BENCH_PRECAST=0 keeps
                          # the hoist but skips the per-chunk f32->bf16
                          # weight cast)
                          hoist_chunk_invariants=os.environ.get(
                              "BENCH_HOIST", "1") == "1",
                          precast_weights=os.environ.get(
                              "BENCH_PRECAST", "1") == "1")
    agent = MoDEAgent(cfg)
    t0 = time.time()
    if os.environ.get("BENCH_REAL_INIT", "0") == "1":
        variables = agent.init_variables(jax.random.PRNGKey(0),
                                         image_hw=(IMG, IMG))
    else:
        # throughput is data-independent on TPU; shape-only init skips ~3 min
        # of on-device random initialization through the tunnel
        shapes = jax.eval_shape(
            lambda k: agent.init_variables(k, image_hw=(IMG, IMG)),
            jax.random.PRNGKey(0))
        variables = jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    log(f"init: {n_params/1e6:.0f}M params in {time.time()-t0:.1f}s")

    if os.environ.get("BENCH_FOLD", "1") == "1":
        # BN-folded encoders + space-to-depth stem (exact rewrites; see
        # tests/test_resnet_fold.py). BENCH_FOLD=0 reverts.
        variables = agent.fold_encoders_for_inference(variables)

    if os.environ.get("BENCH_HOSTCAST", "1") == "1":
        # one-time host-side bf16 precast of the DiT matmul weights (round 4:
        # the in-jit per-chunk cast was the r3 b=1 regression — with
        # bf16-resident leaves it becomes a no-op XLA folds away; bit-exact).
        # BENCH_HOSTCAST=0 restores the r3 per-chunk-cast shape.
        variables = agent.precast_for_serving(variables)

    latency_variables = variables   # b=1 serving: int8 encoders don't pay
                                    # back their quant overhead at batch 1
                                    # (8.2 vs 6.5 ms measured) — latency path
                                    # stays on the folded bf16 encoders
    if os.environ.get("BENCH_INT8_ENC", "0") == "1":
        # static-calibrated int8 encoder convs: 17.96 -> 12.96 ms for the
        # 2x-ResNet-50 stage, +6.7% e2e (1552 -> 1656 chunks/s same-session)
        # — but e2e action MAE vs the bf16 encoders is 3.6e-3, OVER the 1e-3
        # parity budget on this random-weight harness, so it is opt-in, not
        # the headline default (docs/PERF.md "int8 encoder convs").
        # Calibration batch = the bench input distribution.
        from mode_diffusion_policy_tpu.ops.image import preprocess_camera
        rng_c = np.random.default_rng(7)
        calib_raw = jnp.asarray(
            rng_c.integers(0, 255, (32, 1, IMG, IMG, 3), np.uint8))
        calib = {
            "rgb_static": preprocess_camera(None, calib_raw, size=IMG,
                                            train=False),
            "rgb_gripper": preprocess_camera(None, calib_raw, size=IMG,
                                             train=False),
            "lang_emb": jnp.asarray(rng_c.standard_normal(
                (32, 1, cfg.cond_dim)).astype(np.float32)),
        }
        variables = agent.quantize_encoders_for_inference(
            variables, calib_batch=calib)

    # Per-call host timing through the remote-execution tunnel both adds a
    # large fixed RPC overhead and can elide repeated identical executions,
    # so the honest device throughput is measured by scanning the pipeline n
    # times INSIDE one jit (chained PRNG keys force real re-execution) and
    # differencing n=1 vs n=ITERS wall times, each ending in a host fetch.
    import functools

    def make_repeat_n(ag):
        def chunk_fn(variables, rgb_static, rgb_gripper, lang_emb, key):
            rs = preprocess_camera(None, rgb_static, size=IMG, train=False)
            rg = preprocess_camera(None, rgb_gripper, size=IMG, train=False)
            emb, _ = ag.embed_visual_obs(variables, rs, rg, lang_emb,
                                         train=False)
            # BENCH_UNROLL=10 fully unrolls the DDIM scan: per-step routing/
            # sigma/scaling gathers become static slices XLA folds away
            return ag.denoise_actions(variables, emb, lang_emb, key,
                                      inference=True,
                                      use_routing_precompute=True,
                                      extra_args={"unroll": int(os.environ.get(
                                          "BENCH_UNROLL", "1"))})

        @functools.partial(jax.jit, static_argnums=(5,))
        def repeat_n(variables, rgb_static, rgb_gripper, lang_emb, key, n):
            def body(carry, i):
                k = jax.random.fold_in(carry, i)
                # key-dependent pixel jitter: without it XLA hoists the
                # loop-invariant preprocess+encoder stages out of the scan
                # and the measurement silently drops ~17 ms/batch of real
                # work (serving sees new frames every call, so they must be
                # timed)
                jit8 = jax.random.randint(k, (), 0, 2, dtype=jnp.uint8)
                out = chunk_fn(variables, rgb_static + jit8,
                               rgb_gripper + jit8, lang_emb, k)
                return k, jnp.mean(out)
            _, means = jax.lax.scan(body, key, jnp.arange(n))
            return means

        return repeat_n

    repeat_n = make_repeat_n(agent)

    rng = np.random.default_rng(0)
    rgb_static = jnp.asarray(
        rng.integers(0, 255, (B, 1, IMG, IMG, 3), np.uint8))
    rgb_gripper = jnp.asarray(
        rng.integers(0, 255, (B, 1, IMG, IMG, 3), np.uint8))
    lang_emb = jnp.asarray(
        rng.standard_normal((B, 1, cfg.cond_dim)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def fetch(n, key):
        t0 = time.time()
        r = np.asarray(repeat_n(variables, rgb_static, rgb_gripper, lang_emb,
                                key, n))
        return time.time() - t0, r

    t0 = time.time()
    _, r1 = fetch(1, key)
    log(f"n=1 compile+first: {time.time()-t0:.1f}s, finite="
        f"{bool(np.isfinite(r1).all())}")
    t0 = time.time()
    _, rN = fetch(ITERS, key)
    log(f"n={ITERS} compile+first: {time.time()-t0:.1f}s")
    t1, _ = fetch(1, jax.random.PRNGKey(2))
    tN, rN = fetch(ITERS, jax.random.PRNGKey(3))
    assert np.isfinite(rN).all()
    dt = (tN - t1) / (ITERS - 1)
    chunks_per_s = B / dt
    log(f"steady: T(1)={t1:.3f}s T({ITERS})={tN:.3f}s -> {dt*1000:.1f} ms / "
        f"batch of {B} -> {chunks_per_s:.1f} chunks/s/chip "
        f"(fixed call overhead ~{(t1-dt)*1000:.0f} ms)")

    # optional: p50 single-sample policy latency (BASELINE.json metric #2),
    # measured the same way at B=1. Round 4: with the host weight precast
    # the FUSED attention wins at batch 1 too (7.2 vs 8.8 ms — the round-2
    # unfuse-at-batch-1 call was about f32 weight DMA, which the precast
    # halves), so fused is now the default (BENCH_LAT_FUSED=0 reverts).
    if os.environ.get("BENCH_LATENCY", "1") == "1":
        import dataclasses

        lat_fused = os.environ.get("BENCH_LAT_FUSED", "1") == "1"
        # round 5: the DiT megakernel wins at b=1 only (6.28 vs 6.97 ms —
        # the 240->10 launch reduction dominates when the arithmetic is
        # tiny); at b=128 it loses (1542 vs 1769), so only the latency leg
        # defaults to it. BENCH_LAT_MEGA=0 reverts to the per-layer kernels.
        lat_mega = lat_fused and os.environ.get("BENCH_LAT_MEGA", "1") == "1"
        lat_agent = MoDEAgent(dataclasses.replace(
            cfg, use_pallas_attn=lat_fused, use_int8_attn=False,
            use_megakernel=lat_mega))
        repeat_n_lat = make_repeat_n(lat_agent)
        rs1, rg1, le1 = rgb_static[:1], rgb_gripper[:1], lang_emb[:1]
        np.asarray(repeat_n_lat(latency_variables, rs1, rg1, le1, key, 1))
        np.asarray(repeat_n_lat(latency_variables, rs1, rg1, le1, key, ITERS))
        t0 = time.time()
        np.asarray(repeat_n_lat(latency_variables, rs1, rg1, le1,
                                jax.random.PRNGKey(5), 1))
        t1 = time.time() - t0
        t0 = time.time()
        np.asarray(repeat_n_lat(latency_variables, rs1, rg1, le1,
                                jax.random.PRNGKey(6), ITERS))
        tN = time.time() - t0
        lat = (tN - t1) / (ITERS - 1)
        log(f"b=1 device latency per 10-step chunk (amortized over "
            f"{cfg.multistep} env steps): {lat*1000:.2f} ms")

    if os.environ.get("BENCH_PROFILE"):
        trace_dir = os.environ["BENCH_PROFILE"]
        # python/host tracing OFF: the python tracer floods the 1M-event cap
        # and the device op lane gets dropped (observed on the axon relay)
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0
        opts.host_tracer_level = 1
        jax.profiler.start_trace(trace_dir, profiler_options=opts)
        np.asarray(repeat_n(variables, rgb_static, rgb_gripper, lang_emb,
                            jax.random.PRNGKey(9), 2))
        jax.profiler.stop_trace()
        log(f"profiler trace written to {trace_dir}")

    baseline = 625.0  # north star: 5k chunks/s on v5e-8 => 625 per chip
    print(json.dumps({
        "metric": "10-step action-chunks/sec/chip (307M-active MoDE, b=128, "
                  "e2e uint8->preprocess->2xResNet50->DDIM)",
        "value": round(chunks_per_s, 2),
        "unit": "chunks/s/chip",
        "vs_baseline": round(chunks_per_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
