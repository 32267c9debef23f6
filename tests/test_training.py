"""Training stack tests: tri-stage schedule parity vs the reference
implementation, EMA semantics, masked weight decay, ADOPT, and a full
mesh-parallel train step on the 8-virtual-device CPU mesh (loss decreasing)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.agent import MoDEAgent, MoDEAgentConfig
from mode_diffusion_policy_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                     replicated, shard_batch)
from mode_diffusion_policy_tpu.training.loop import (jit_auto_layout,
                                                     make_train_step,
                                                     grad_telemetry,
                                                     relayout_default)
from mode_diffusion_policy_tpu.training.optim import (adopt,
                                                      ema_decay_schedule,
                                                      ema_update,
                                                      make_optimizer,
                                                      tri_stage_schedule)
from mode_diffusion_policy_tpu.training.state import TrainState


def test_tri_stage_matches_reference():
    """Step-exact vs the reference TriStageLRScheduler driven with a stub
    optimizer."""
    torch = pytest.importorskip("torch")
    import importlib.util
    import pathlib

    # stub omegaconf for the reference module
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.DictConfig = dict
        sys.modules["omegaconf"] = oc
    ref_dir = pathlib.Path("/root/reference/mode/utils/lr_schedulers")
    spec = importlib.util.spec_from_file_location(
        "ref_lrs", ref_dir / "lr_scheduler.py")
    lrs = importlib.util.module_from_spec(spec)
    sys.modules["ref_lrs"] = lrs
    spec.loader.exec_module(lrs)
    src = (ref_dir / "tri_stage_scheduler.py").read_text()
    src = src.replace("from .lr_scheduler import LearningRateScheduler",
                      "from ref_lrs import LearningRateScheduler")
    src = src.replace(
        "from . import register_scheduler, LearningRateSchedulerConfigs",
        "register_scheduler = lambda *a, **k: (lambda cls: cls)\n"
        "class LearningRateSchedulerConfigs: pass")
    mod = types.ModuleType("ref_tri")
    mod.__dict__["__file__"] = str(ref_dir / "tri_stage_scheduler.py")
    exec(compile(src, "tri_stage_scheduler.py", "exec"), mod.__dict__)

    class Cfg:
        pass

    cfg = Cfg()
    cfg.lr_scheduler = Cfg()
    cfg.lr_scheduler.init_lr = 1e-4
    cfg.lr_scheduler.init_lr_scale = 0.1
    cfg.lr_scheduler.final_lr_scale = 1e-6
    cfg.lr_scheduler.total_steps = 1000
    cfg.lr_scheduler.phase_ratio = "(0.02, 0.08, 0.9)"
    cfg.lr_scheduler.lr = 1e-4

    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([param], lr=1e-4)
    ref_sched = mod.TriStageLRScheduler(opt, cfg)

    sched = tri_stage_schedule(1e-4, 1000, (0.02, 0.08, 0.9), 0.1, 1e-6)
    ours = [float(sched(i)) for i in range(1100)]
    # step() computes lr at the current update_step then self-increments
    theirs = [ref_sched.step() for _ in range(1100)]
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-11)


def test_ema_decay_schedule():
    # reference ema.py:84-91 with conf/callbacks/calvin.yaml values
    d0 = float(ema_decay_schedule(jnp.asarray(0)))
    assert d0 == 0.0
    d10 = float(ema_decay_schedule(jnp.asarray(10)))
    assert abs(d10 - (1 - (1 + 9) ** (-2 / 3))) < 1e-6
    d_huge = float(ema_decay_schedule(jnp.asarray(10**9)))
    assert d_huge == pytest.approx(0.9999)


def test_ema_update_moves_toward_params():
    ema = {"w": jnp.zeros(3)}
    new = {"w": jnp.ones(3)}
    out = ema_update(ema, new, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3),
                               rtol=1e-6)


def test_weight_decay_mask():
    params = {
        "inner_model": {"blocks_0": {"attn": {"wqkv": {"kernel": jnp.ones((2, 2)),
                                                       "bias": jnp.ones(2)}}},
                        "ln": {"g": jnp.ones(2)}},
        "static_resnet": {"conv": {"kernel": jnp.ones((1, 1))}},
    }
    from mode_diffusion_policy_tpu.training.optim import _decay_mask
    mask = _decay_mask(params)
    assert mask["inner_model"]["blocks_0"]["attn"]["wqkv"]["kernel"] is True
    assert mask["inner_model"]["blocks_0"]["attn"]["wqkv"]["bias"] is False
    assert mask["inner_model"]["ln"]["g"] is True  # reference quirk preserved
    assert mask["static_resnet"]["conv"]["kernel"] is True


@pytest.mark.parametrize("mu_dtype", [None, jnp.bfloat16])
@pytest.mark.parametrize("max_grad_norm", [None, 0.5])
def test_fused_adamw_matches_optax(mu_dtype, max_grad_norm):
    """FusedAdamWEma.update_with_ema must be BIT-identical to the unfused
    optax chain (adamw + apply_updates + ema_update) it replaces — including
    the bf16 mu_dtype promotion order and global-norm clipping."""
    import optax

    from mode_diffusion_policy_tpu.training.optim import _decay_mask

    rng = np.random.default_rng(0)
    params = {
        "inner_model": {"blocks_0": {"wqkv": {
            "kernel": jnp.asarray(rng.standard_normal((8, 12)), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(12), jnp.float32)}}},
        "static_resnet": {"conv": {
            "kernel": jnp.asarray(rng.standard_normal((3, 3, 2, 4)),
                                  jnp.float32)}},
    }
    kw = dict(learning_rate=3e-3, betas=(0.9, 0.95),
              transformer_weight_decay=0.05, use_lr_scheduler=True,
              total_steps=100, max_grad_norm=max_grad_norm,
              mu_dtype=mu_dtype)
    fused_opt, _ = make_optimizer(params, fused=True, **kw)
    ref_opt, schedule = make_optimizer(params, fused=False, **kw)
    assert hasattr(fused_opt, "update_with_ema")
    assert not hasattr(ref_opt, "update_with_ema")

    # jit both steps — the realistic boundary (train steps are always
    # jitted), and the one where bit-equality holds: optax's
    # tree_bias_correction is internally inline-jitted, and XLA's pow
    # lowering differs by 1 ulp between eager and compiled at some counts
    @jax.jit
    def step_f(grads, st, p, e, decay):
        return fused_opt.update_with_ema(grads, st, p, e, decay)

    @jax.jit
    def step_r(grads, st, p, e, decay):
        upd, st2 = ref_opt.update(grads, st, p)
        p2 = optax.apply_updates(p, upd)
        return p2, st2, ema_update(e, p2, decay)

    f_state, r_state = fused_opt.init(params), ref_opt.init(params)
    f_params = r_params = params
    f_ema = r_ema = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    for step in range(4):
        grads = jax.tree.map(
            lambda x: jnp.asarray(
                rng.standard_normal(x.shape) * (3.0 if step % 2 else 0.01),
                jnp.float32), params)
        decay = ema_decay_schedule(jnp.asarray(step))
        f_params, f_state, f_ema = step_f(grads, f_state, f_params, f_ema,
                                          decay)
        r_params, r_state, r_ema = step_r(grads, r_state, r_params, r_ema,
                                          decay)
        for fa, ra in zip(jax.tree.leaves(f_params),
                          jax.tree.leaves(r_params)):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(ra))
        for fa, ra in zip(jax.tree.leaves(f_ema), jax.tree.leaves(r_ema)):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(ra))
    # moments match the optax state too (find mu/nu inside the chain state)
    adam = [s for s in jax.tree.leaves(
        r_state, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(x := s, "mu")][0]
    for fa, ra in zip(jax.tree.leaves(f_state.mu), jax.tree.leaves(adam.mu)):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(ra))
    for fa, ra in zip(jax.tree.leaves(f_state.nu), jax.tree.leaves(adam.nu)):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(ra))
    # the decay mask actually matters in both (bias had no decay)
    mask = _decay_mask(params)
    assert mask["inner_model"]["blocks_0"]["wqkv"]["bias"] is False


def test_fused_adamw_nu_bf16_close_to_f32():
    """nu_dtype=bf16 (the opt-in optimizer-traffic saver) must track the f32
    second moment closely: after a few steps the parameters should agree to
    ~1e-3 relative — a sanity bound on the documented ≲0.2% effective-LR
    perturbation, not bit-parity (docs/PERF.md "train step")."""
    rng = np.random.default_rng(3)
    params = {"w": jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)}
    kw = dict(learning_rate=3e-3, betas=(0.9, 0.95),
              transformer_weight_decay=0.05, use_lr_scheduler=False)
    opt_b, _ = make_optimizer(params, fused=True, nu_dtype=jnp.bfloat16, **kw)
    opt_f, _ = make_optimizer(params, fused=True, **kw)
    st_b, st_f = opt_b.init(params), opt_f.init(params)
    assert jax.tree.leaves(st_b.nu)[0].dtype == jnp.bfloat16
    p_b = p_f = params
    e_b = e_f = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    for step in range(8):
        grads = {"w": jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)}
        decay = ema_decay_schedule(jnp.asarray(step))
        p_b, st_b, e_b = opt_b.update_with_ema(grads, st_b, p_b, e_b, decay)
        p_f, st_f, e_f = opt_f.update_with_ema(grads, st_f, p_f, e_f, decay)
    np.testing.assert_allclose(np.asarray(p_b["w"]), np.asarray(p_f["w"]),
                               rtol=0, atol=2e-4)
    with pytest.raises(ValueError):
        make_optimizer(params, fused=False, nu_dtype=jnp.bfloat16, **kw)


@pytest.mark.parametrize("noise", ["hw", "threefry", "threefry8"])
def test_stochastic_round_bf16_properties(noise):
    """stochastic_round_bf16 (the bf16-parameter write-back): unbiased in
    expectation, exact on representable values, inf/NaN pass through — for
    both 16-bit noise sources (hw rng_bit_generator and fusable threefry)."""
    from mode_diffusion_policy_tpu.training.optim import stochastic_round_bf16

    # representable values round exactly under every key
    exact = jnp.asarray([0.0, 1.0, -2.5, 3.140625], jnp.float32)
    for seed in range(3):
        out = stochastic_round_bf16(exact, jax.random.PRNGKey(seed),
                                    noise=noise)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(exact))
    # a value strictly between two bf16 neighbors: mean over many draws
    # approaches the value (round-to-nearest would give one neighbor always)
    lo = np.float32(1.0)
    hi = np.float32(np.nextafter(jnp.bfloat16(1.0), jnp.bfloat16(2.0),
                                 dtype=jnp.bfloat16))
    x = jnp.full((4096,), lo + 0.25 * (hi - lo), jnp.float32)
    out = stochastic_round_bf16(x, jax.random.PRNGKey(7), noise=noise)
    frac_hi = float(np.mean(np.asarray(out, np.float32) == hi))
    assert abs(frac_hi - 0.25) < 0.05, frac_hi
    # inf/NaN unperturbed
    spec = jnp.asarray([np.inf, -np.inf, np.nan], jnp.float32)
    out = np.asarray(stochastic_round_bf16(spec, jax.random.PRNGKey(0),
                                           noise=noise),
                     np.float32)
    assert np.isposinf(out[0]) and np.isneginf(out[1]) and np.isnan(out[2])


def test_stochastic_round_accumulates_sub_ulp_updates():
    """Repeatedly adding an update far below half a bf16 ulp must still move
    the parameter at the right average rate — the whole point of SR: with
    round-to-nearest the parameter would never move."""
    from mode_diffusion_policy_tpu.training.optim import stochastic_round_bf16

    u = 1e-4  # bf16 ulp at 8.0 is 0.0625 — u is ~600x below half-ulp
    n = 2000
    x = jnp.full((256,), 8.0, jnp.bfloat16)
    rtn = x
    key = jax.random.PRNGKey(3)

    @jax.jit
    def run(x, key):
        def body(carry, _):
            x, k = carry
            k, sub = jax.random.split(k)
            x = stochastic_round_bf16(x.astype(jnp.float32) + u, sub)
            return (x, k), None
        (x, _), _ = jax.lax.scan(body, (x, key), None, length=n)
        return x

    out = np.asarray(run(x, key), np.float32).mean()
    assert abs(out - (8.0 + n * u)) < 0.02, out       # moved ~0.2 on average
    rtn = np.asarray((rtn.astype(jnp.float32) + u).astype(jnp.bfloat16)
                     .astype(jnp.float32)).mean()
    assert rtn == 8.0  # round-to-nearest drops the update entirely


@pytest.mark.slow
def test_bf16_full_state_training_converges(tiny_setup):
    """Full-bf16 training state (params/moments/EMA bf16, stochastic-rounded
    updates — trainer.bf16_full_state): state dtypes are actually bf16, loss
    decreases comparably to the f32-master run, and EMA stays finite."""
    cfg, agent, variables = tiny_setup
    batch = jax.tree.map(jnp.asarray, make_batch(cfg))

    def run(bf16_state):
        opt_kw = dict(learning_rate=3e-3, use_lr_scheduler=False)
        if bf16_state:
            opt_kw.update(stochastic_round=True, mu_dtype=jnp.bfloat16,
                          nu_dtype=jnp.bfloat16)
        optimizer, _ = make_optimizer(variables["params"], **opt_kw)
        state = TrainState.create(
            variables, optimizer, jax.random.PRNGKey(1),
            param_dtype=jnp.bfloat16 if bf16_state else None,
            ema_dtype=jnp.bfloat16 if bf16_state else None)
        step_fn = jax.jit(make_train_step(agent, optimizer,
                                          log_grad_norms=False))
        losses = []
        for _ in range(30):
            state, m = step_fn(state, batch)
            losses.append(float(m["train/total_loss"]))
        return state, losses

    state_b, losses_b = run(True)
    assert jax.tree.leaves(state_b.params)[0].dtype == jnp.bfloat16
    assert jax.tree.leaves(state_b.opt_state.nu)[0].dtype == jnp.bfloat16
    assert all(np.isfinite(l) for l in losses_b)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state_b.ema_params))
    _, losses_f = run(False)
    # same optimization signal: both runs cut the loss, and the bf16 run's
    # final loss is within 1.5x of the f32 run's on this tiny problem
    assert losses_b[-1] < 0.8 * losses_b[0]
    assert losses_f[-1] < 0.8 * losses_f[0]
    assert losses_b[-1] < 1.5 * losses_f[-1] + 1e-3


def test_fused_adamw_update_method_matches_update_with_ema():
    """The optax-compatible .update fallback applies the same math."""
    import optax

    params = {"w": jnp.asarray(np.random.default_rng(1)
                               .standard_normal((16,)), jnp.float32)}
    opt, _ = make_optimizer(params, fused=True, use_lr_scheduler=False)
    st = opt.init(params)
    grads = {"w": jnp.full((16,), 0.3)}
    p1, st1, _ = opt.update_with_ema(grads, st, params, params, 0.99)
    upd, st2 = opt.update(grads, st, params)
    p2 = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(p2["w"]))
    np.testing.assert_array_equal(np.asarray(st1.nu["w"]),
                                  np.asarray(st2.nu["w"]))


def test_adopt_runs():
    import optax
    opt = optax.chain(adopt(), optax.scale(-0.01))
    params = {"w": jnp.ones(4)}
    opt_state = opt.init(params)
    for i in range(3):
        grads = {"w": jnp.full(4, 0.5)}
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    assert np.all(np.isfinite(np.asarray(params["w"])))


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = MoDEAgentConfig(latent_dim=32, n_layers=2, n_heads=2, cond_dim=8,
                          resnet_type="18", router_z_delta=0.001)
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    return cfg, agent, variables


def make_batch(cfg, B=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "rgb_static": rng.standard_normal((B, 1, 32, 32, 3)).astype(np.float32),
        "rgb_gripper": rng.standard_normal((B, 1, 32, 32, 3)).astype(np.float32),
        "actions": rng.standard_normal((B, 10, 7)).astype(np.float32) * 0.1,
        "lang_emb": rng.standard_normal((B, 1, cfg.cond_dim)).astype(np.float32),
    }


@pytest.mark.slow
def test_mesh_train_step_8dev(tiny_setup):
    """Full train step jitted over the 8-virtual-device CPU mesh; sharded
    batch, replicated params, loss decreases over steps."""
    cfg, agent, variables = tiny_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8

    optimizer, _ = make_optimizer(variables["params"], learning_rate=1e-3,
                                  use_lr_scheduler=False)
    state = TrainState.create(variables, optimizer, jax.random.PRNGKey(1))
    step_fn = make_train_step(agent, optimizer)
    rep = replicated(mesh)
    train_step = jax.jit(step_fn, out_shardings=(rep, rep))

    state = jax.device_put(state, rep)
    losses = []
    for i in range(8):
        batch = shard_batch(mesh, make_batch(cfg, B=8, seed=0))  # same batch
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["train/total_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert float(metrics["debug/total_grad_norm"]) > 0
    # EMA params differ from raw params after updates
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, state.ema_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_batch_actually_sharded(tiny_setup):
    cfg, agent, variables = tiny_setup
    mesh = make_mesh()
    batch = shard_batch(mesh, make_batch(cfg, B=8))
    shard_counts = {len(v.sharding.device_set)
                    for v in jax.tree.leaves(batch)}
    assert shard_counts == {8}


@pytest.mark.slow
def test_zero1_optimizer_state_sharding(tiny_setup):
    """ZeRO-1: optimizer moments + EMA sharded over dp, params replicated;
    training remains numerically identical to the fully-replicated setup."""
    from mode_diffusion_policy_tpu.parallel.mesh import zero1_state_sharding

    cfg, agent, variables = tiny_setup
    mesh = make_mesh()
    optimizer, _ = make_optimizer(variables["params"], learning_rate=1e-3,
                                  use_lr_scheduler=False)
    step_fn = make_train_step(agent, optimizer, log_grad_norms=False)
    batch = shard_batch(mesh, make_batch(cfg, B=8, seed=0))

    # replicated baseline
    state_r = TrainState.create(variables, optimizer, jax.random.PRNGKey(1))
    rep = replicated(mesh)
    step_rep = jax.jit(step_fn, out_shardings=(rep, rep))
    sr, mr = step_rep(jax.device_put(state_r, rep), batch)

    # zero-1 sharded
    state_z = TrainState.create(variables, optimizer, jax.random.PRNGKey(1))
    zsh = zero1_state_sharding(mesh, state_z)
    step_z = jax.jit(step_fn, out_shardings=(zsh, rep))
    sz, mz = step_z(jax.device_put(state_z, zsh), batch)

    np.testing.assert_allclose(float(mz["train/total_loss"]),
                               float(mr["train/total_loss"]), rtol=1e-6)
    # params identical, moments actually sharded
    pr = jax.tree.leaves(sr.params)[0]
    pz = jax.tree.leaves(sz.params)[0]
    np.testing.assert_allclose(np.asarray(pz), np.asarray(pr), atol=1e-6)
    sharded_leaves = [x for x in jax.tree.leaves(sz.opt_state)
                      if hasattr(x, "sharding")
                      and x.sharding.spec == ("dp",)]
    assert sharded_leaves, "no optimizer leaves actually sharded"


@pytest.mark.slow
def test_trainer_preemption_checkpoint(tiny_setup, tmp_path):
    """SIGTERM mid-epoch (TPU-pool preemption): the Trainer finishes the
    in-flight batch, checkpoints at the boundary, and returns; a fresh
    Trainer auto-resumes from that exact step."""
    import os
    import signal

    from mode_diffusion_policy_tpu.training.loop import Trainer

    cfg, agent, _ = tiny_setup
    batches = [make_batch(cfg, B=8, seed=s) for s in range(5)]
    kw = dict(log_dir=str(tmp_path / "run"), max_epochs=3,
              limit_train_batches=5,
              optimizer_kwargs={"learning_rate": 1e-3,
                                "use_lr_scheduler": False})

    def gen():
        for i, b in enumerate(batches):
            if i == 2:   # preempt while the 3rd batch is pending
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    before = signal.getsignal(signal.SIGTERM)
    t1 = Trainer(agent, **kw)
    s1 = t1.setup(jax.random.PRNGKey(0), image_hw=(32, 32))
    s1 = t1.fit(s1, lambda: gen())
    assert int(s1.step) == 3           # stopped mid-epoch, not at 5 or 15
    assert t1.ckpt.latest_step() == 3  # boundary checkpoint written
    assert signal.getsignal(signal.SIGTERM) == before  # handler restored

    t2 = Trainer(agent, **kw)
    s2 = t2.setup(jax.random.PRNGKey(0), image_hw=(32, 32))
    assert t2.resumed and int(s2.step) == 3


@pytest.mark.slow
def test_bf16_state_checkpoint_resume(tiny_setup, tmp_path):
    """Orbax auto-resume round-trips the full-bf16 SR training state: a
    fresh Trainer pointed at the same log_dir restores bf16 dtypes and the
    exact parameter/moment values saved at the epoch boundary."""
    from mode_diffusion_policy_tpu.training.loop import Trainer

    cfg, agent, _ = tiny_setup
    batches = [make_batch(cfg, B=8, seed=s) for s in range(2)]
    kw = dict(log_dir=str(tmp_path / "run"), max_epochs=1,
              limit_train_batches=2,
              optimizer_kwargs={"learning_rate": 1e-3,
                                "use_lr_scheduler": False},
              bf16_full_state=True)
    t1 = Trainer(agent, **kw)
    s1 = t1.setup(jax.random.PRNGKey(0), image_hw=(32, 32))
    s1 = t1.fit(s1, lambda: iter(batches))

    t2 = Trainer(agent, **kw)
    s2 = t2.setup(jax.random.PRNGKey(0), image_hw=(32, 32))
    assert t2.resumed
    assert int(s2.step) == int(s1.step) == 2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        assert b.dtype == a.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    for a, b in zip(jax.tree.leaves(s1.opt_state.nu),
                    jax.tree.leaves(s2.opt_state.nu)):
        assert b.dtype == a.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


@pytest.mark.slow
def test_zero1_sharding_with_bf16_sr_state(tiny_setup):
    """ZeRO-1 sharding composes with the full-bf16 stochastic-rounded state:
    the sharded step must be BIT-equal to the unsharded one (threefry bits
    are position-based, so the per-leaf rounding noise is sharding-
    invariant), with moments actually sharded on dp."""
    from mode_diffusion_policy_tpu.parallel.mesh import zero1_state_sharding

    cfg, agent, variables = tiny_setup
    mesh = make_mesh()
    optimizer, _ = make_optimizer(variables["params"], learning_rate=1e-3,
                                  use_lr_scheduler=False,
                                  stochastic_round=True,
                                  mu_dtype=jnp.bfloat16,
                                  nu_dtype=jnp.bfloat16)
    step_fn = make_train_step(agent, optimizer, log_grad_norms=False)
    batch = shard_batch(mesh, make_batch(cfg, B=8, seed=0))
    mk = lambda: TrainState.create(variables, optimizer,  # noqa: E731
                                   jax.random.PRNGKey(1),
                                   param_dtype=jnp.bfloat16,
                                   ema_dtype=jnp.bfloat16)
    rep = replicated(mesh)
    sr_state, _ = jax.jit(step_fn, out_shardings=(rep, rep))(
        jax.device_put(mk(), rep), batch)
    zsh = zero1_state_sharding(mesh, mk())
    sz_state, _ = jax.jit(step_fn, out_shardings=(zsh, rep))(
        jax.device_put(mk(), zsh), batch)
    for a, b in zip(jax.tree.leaves(sr_state.params),
                    jax.tree.leaves(sz_state.params)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    assert [x for x in jax.tree.leaves(sz_state.opt_state)
            if hasattr(x, "sharding") and x.sharding.spec == ("dp",)]


def test_checkpoint_manager_best_tracking(tmp_path, tiny_setup):
    from mode_diffusion_policy_tpu.training.loop import CheckpointManager
    cfg, agent, variables = tiny_setup
    import optax
    opt = optax.sgd(1e-3)
    state = TrainState.create(variables, opt, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ck"), monitor="m", mode="max",
                            save_top_k=1)
    mgr.save(1, state, {"m": 0.5})
    mgr.save(2, state, {"m": 0.9})
    mgr.save(3, state, {"m": 0.2})
    assert mgr.best_step() == 2
    assert mgr.latest_step() == 3
    restored = mgr.restore(state)  # latest by default (auto-resume)
    assert int(restored.step) == int(state.step)


def test_jitted_val_step_matches_eager(tiny_setup, tmp_path):
    """The Trainer's compiled validation step (built once in setup, reused
    across epochs) must produce the same loss as the eager
    agent.validation_denoise call (round-1 VERDICT weak #4)."""
    from mode_diffusion_policy_tpu.training.loop import Trainer

    cfg, agent, variables = tiny_setup
    trainer = Trainer(agent, log_dir=str(tmp_path / "run"), max_epochs=1,
                      optimizer_kwargs={"learning_rate": 1e-3,
                                        "use_lr_scheduler": False})
    state = trainer.setup(jax.random.PRNGKey(0), image_hw=(32, 32))
    batch = make_batch(cfg, B=8, seed=5)
    from mode_diffusion_policy_tpu.parallel.mesh import shard_batch
    sharded = shard_batch(trainer.mesh, batch)
    rng = jax.random.PRNGKey(3)
    m_jit = trainer._val_step(state.eval_variables(), sharded, rng)
    _, m_eager = agent.validation_denoise(
        state.eval_variables(), {k: jnp.asarray(v) for k, v in batch.items()},
        rng)
    np.testing.assert_allclose(
        float(m_jit["val_act/lang_act_loss_pp"]),
        float(m_eager["val_act/lang_act_loss_pp"]), rtol=1e-5)


@pytest.mark.slow
def test_trainer_auto_layout_fit(tiny_setup, tmp_path):
    """trainer.auto_layout=true (the productized layout knob from
    conf/config_calvin.yaml) must train through the real Trainer.fit path —
    lazy AOT compile on the first sharded batch, state donation, checkpoint
    save — and end at the same parameters as the default-jit Trainer."""
    from mode_diffusion_policy_tpu.training.loop import Trainer

    cfg, agent, _ = tiny_setup
    batches = [make_batch(cfg, B=8, seed=s) for s in range(3)]
    finals = {}
    for auto in (False, True):
        trainer = Trainer(agent, log_dir=str(tmp_path / f"run{auto}"),
                          max_epochs=1, limit_train_batches=3,
                          optimizer_kwargs={"learning_rate": 1e-3,
                                            "use_lr_scheduler": False},
                          auto_layout=auto)
        state = trainer.setup(jax.random.PRNGKey(0), image_hw=(32, 32))
        state = trainer.fit(state, lambda: iter(batches))
        assert int(state.step) == 3
        finals[auto] = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(finals[False]),
                    jax.tree.leaves(finals[True])):
        np.testing.assert_allclose(a, b, atol=1e-6)
    # the two TPU train levers compose: AUTO layouts + full-bf16 SR state
    trainer = Trainer(agent, log_dir=str(tmp_path / "run_combo"),
                      max_epochs=1, limit_train_batches=2,
                      optimizer_kwargs={"learning_rate": 1e-3,
                                        "use_lr_scheduler": False},
                      auto_layout=True, bf16_full_state=True)
    state = trainer.setup(jax.random.PRNGKey(0), image_hw=(32, 32))
    state = trainer.fit(state, lambda: iter(batches[:2]))
    assert int(state.step) == 2
    assert jax.tree.leaves(state.params)[0].dtype == jnp.bfloat16
    assert all(np.isfinite(np.asarray(x, np.float32)).all()
               for x in jax.tree.leaves(state.params))


@pytest.mark.slow
def test_dryrun_multichip_numerics_gate():
    """The driver's dp x ep dryrun now asserts loss + grads of the sharded
    train step match the unsharded single-device step (VERDICT r2 #7); run
    the same gate in-process on the 8-virtual-device CPU mesh so the suite
    catches sharding-numerics regressions without the driver."""
    import pathlib
    import sys
    root = str(pathlib.Path(__file__).resolve().parents[1])
    if root not in sys.path:
        sys.path.insert(0, root)
    import __graft_entry__ as ge
    ge._dryrun_multichip_impl(8)   # raises on any parity violation


def test_mesh_batched_inference_sharded(tiny_setup):
    """DP-sharded batched serving: the full denoise chunk (embed + 10-step
    sampler with routing precompute) jitted over the 8-device mesh with the
    batch sharded on dp must equal the single-device result — the
    correctness basis for the v5e-8 throughput extrapolation in README."""
    cfg, agent, variables = tiny_setup
    mesh = make_mesh()
    batch = make_batch(cfg, B=8, seed=3)
    rs = jnp.asarray(batch["rgb_static"])
    rg = jnp.asarray(batch["rgb_gripper"])
    lang = jnp.asarray(batch["lang_emb"])
    key = jax.random.PRNGKey(9)

    def chunk(variables, rs, rg, lang):
        emb, _ = agent.embed_visual_obs(variables, rs, rg, lang, train=False)
        return agent.denoise_actions(variables, emb, lang, key,
                                     inference=True,
                                     use_routing_precompute=True)

    ref = np.asarray(jax.jit(chunk)(variables, rs, rg, lang))

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    sharded = jax.jit(chunk, in_shardings=(rep, bsh, bsh, bsh),
                      out_shardings=bsh)
    v_rep = jax.device_put(variables, rep)
    got = sharded(v_rep, jax.device_put(rs, bsh), jax.device_put(rg, bsh),
                  jax.device_put(lang, bsh))
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_jit_auto_layout_matches_default(tiny_setup):
    """jit_auto_layout (the AUTO-entry-layout train-loop compile that kills
    the expert-weight transpose copies, docs/PERF.md "train step") is a
    scheduling change only: losses and final params must match the plain jit
    path, and relayout_default must hand back arrays a fresh jit accepts."""
    cfg, agent, variables = tiny_setup
    optimizer, _ = make_optimizer(variables["params"], learning_rate=1e-3,
                                  use_lr_scheduler=False)
    state = TrainState.create(variables, optimizer, jax.random.PRNGKey(1))
    step_fn = make_train_step(agent, optimizer, log_grad_norms=False)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg))

    def train_n(st, n):
        def body(st, _):
            st, m = step_fn(st, batch)
            return st, m["train/total_loss"]
        return jax.lax.scan(body, st, jnp.arange(n))

    ref_fn = jax.jit(train_n, static_argnums=(1,))
    ref_state, ref_losses = ref_fn(state, 3)

    auto_fn, auto_state = jit_auto_layout(train_n, state, static_argnums=(1,),
                                          example_args=(3,))
    auto_state, auto_losses = auto_fn(auto_state, 3)
    np.testing.assert_allclose(np.asarray(auto_losses),
                               np.asarray(ref_losses), rtol=1e-6)

    back = relayout_default(auto_state.params)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and eager/other-program consumption works after relayout
    leaf = jax.tree.leaves(back)[0]
    assert np.isfinite(np.asarray(leaf + 1.0)).all()


def test_groupnorm_encoder_mode():
    """encoder_norm="group": no batch_stats collection, the train step runs
    and optimizes, and eval forward works (per-sample stats, train == eval
    graph). The SURVEY §2.3 blessed swap for the reference's
    sync_batchnorm: True (training_calvin.py:102)."""
    cfg = MoDEAgentConfig(latent_dim=32, n_layers=2, n_heads=2, cond_dim=16,
                          resnet_type="50", encoder_norm="group")
    agent = MoDEAgent(cfg)
    v = agent.init_variables(jax.random.PRNGKey(0), image_hw=(24, 24))
    assert not jax.tree.leaves(v.get("batch_stats", {}))
    # GN params live under the same bn* names (scale+bias only)
    bn1 = v["params"]["static_resnet"]["resnet"]["bn1"]
    assert set(bn1) == {"scale", "bias"}

    opt, _ = make_optimizer(v["params"], learning_rate=3e-3,
                            use_lr_scheduler=False)
    state = TrainState.create(v, opt, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(agent, opt, log_grad_norms=False))
    rng = np.random.default_rng(0)
    batch = {
        "rgb_static": jnp.asarray(rng.standard_normal((2, 1, 24, 24, 3)),
                                  jnp.float32),
        "rgb_gripper": jnp.asarray(rng.standard_normal((2, 1, 24, 24, 3)),
                                   jnp.float32),
        "actions": jnp.asarray(rng.standard_normal((2, 10, 7)) * .3,
                               jnp.float32),
        "lang_emb": jnp.asarray(rng.standard_normal((2, 1, 16)), jnp.float32),
    }
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["train/total_loss"]))
    assert np.isfinite(losses).all(), losses
    # per-step loss is noisy (random sigma draw per step) — gate the trend
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses

    emb, upd = agent.embed_visual_obs(
        state.train_variables(), batch["rgb_static"], batch["rgb_gripper"],
        batch["lang_emb"], train=False)
    assert np.isfinite(np.asarray(emb["state_images"])).all()

    # GroupNorm has no foldable statistics: fold is a no-op (not a KeyError
    # crash into the empty batch_stats, and never a silently dropped norm
    # — advisor round 5), so serving presets keep the unfolded GN graph
    v_after = agent.fold_encoders_for_inference(state.train_variables())
    assert "folded_params" not in v_after


def test_groupnorm_unknown_kind_rejected():
    """Typo'd encoder_norm values hard-error instead of silently training
    with BatchNorm (advisor round 5)."""
    from mode_diffusion_policy_tpu.config.builders import build_agent
    with pytest.raises(ValueError, match="encoder_norm"):
        build_agent({"inner_model": {}, "encoder_norm": "groupnorm"})
