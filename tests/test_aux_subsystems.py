"""Aux subsystems: agent HTTP proxy round-trip, shared-memory episode cache,
and checkpoint export round-trip (flax -> reference-layout safetensors ->
back through the converter)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_agent_proxy_roundtrip():
    from mode_diffusion_policy_tpu.evaluation.agent_proxy import (
        AgentProxyClient, start_server)

    class TinyAgent:
        def __init__(self):
            self.reset_count = 0

        def step(self, obs, lang_annotation):
            assert isinstance(lang_annotation, str)
            return np.full((7,), 0.5, np.float32)

        def reset(self):
            self.reset_count += 1
            return self.reset_count

        def __call__(self, x):
            return x * 2

    server = start_server(TinyAgent, host="127.0.0.1", port=0,
                          background=True)
    port = server.server_address[1]
    client = AgentProxyClient(f"http://127.0.0.1:{port}")
    # calling before init errors cleanly
    with pytest.raises(RuntimeError):
        client.step({"x": 1}, "hello")
    assert client.init() == "agent created"
    action = client.step({"x": 1}, "open the drawer")
    np.testing.assert_array_equal(action, np.full((7,), 0.5, np.float32))
    assert client.reset() == 1
    assert client(21) == 42
    # unknown method errors and destroys the agent, then re-init works
    with pytest.raises(RuntimeError):
        client._call("not_a_method")
    with pytest.raises(RuntimeError):
        client.step({"x": 1}, "needs re-init")
    client.init()
    assert client.reset() == 1  # fresh agent
    assert client.shutdown() == "shutdown"


def test_shm_cache_roundtrip(tmp_path):
    from calvin_fixture import make_calvin_dataset
    from mode_diffusion_policy_tpu.data.shm_cache import SharedEpisodeCache

    root = make_calvin_dataset(tmp_path / "calvin", n_episodes=1, ep_len=5,
                               hw=8, splits=("training",))
    cache = SharedEpisodeCache.build(root / "training",
                                     keys=["rel_actions", "rgb_static"],
                                     tag="testcache")
    try:
        assert "rel_actions" in cache
        arr = cache.array("rel_actions")
        assert arr.shape == (5, 7)
        raw = np.load(root / "training" / "episode_0000002.npz")
        np.testing.assert_array_equal(cache.episode(2, "rel_actions"),
                                      raw["rel_actions"])
        # sibling attach sees the same data zero-copy
        sibling = SharedEpisodeCache.attach("testcache")
        np.testing.assert_array_equal(sibling.array("rgb_static"),
                                      cache.array("rgb_static"))
        sibling.cleanup()
    finally:
        cache.cleanup()


def test_export_roundtrip(tmp_path):
    """flax params -> reference-layout safetensors -> convert_modedit ->
    identical pytree."""
    from mode_diffusion_policy_tpu.models.modedit import MoDeDiT, MoDeDiTConfig
    from mode_diffusion_policy_tpu.utils.checkpoint_convert import (
        convert_modedit, detect_layout)
    from mode_diffusion_policy_tpu.utils.export import (
        modedit_params_to_torch_layout, save_cleaned_checkpoint)

    cfg = MoDeDiTConfig(obs_dim=16, goal_dim=8, embed_dim=32, n_layers=2,
                        n_heads=2)
    model = MoDeDiT(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key}, {"state_images": jnp.zeros((1, 2, 16))},
        jnp.zeros((1, 10, 7)), jnp.zeros((1, 1, 8)), jnp.ones((1,)))["params"]

    out_dir = str(tmp_path / "export")
    save_cleaned_checkpoint({"inner_model": params}, out_dir,
                            config={"latent_dim": 32})
    from safetensors.numpy import load_file
    sd = load_file(f"{out_dir}/model_cleaned.safetensors")
    n_layers, n_experts, prefix = detect_layout(sd)
    assert (n_layers, n_experts) == (2, 4)
    back = convert_modedit(sd, n_layers, n_experts, prefix)

    flat_orig = jax.tree_util.tree_leaves_with_path(params)
    flat_back = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, val in flat_orig:
        k = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(val), flat_back[k], atol=1e-6,
                                   err_msg=k)
    # forward outputs identical after the round trip
    x = {"state_images": jnp.ones((1, 2, 16))}
    a = model.apply({"params": params}, x, jnp.ones((1, 10, 7)) * 0.1,
                    jnp.ones((1, 1, 8)), jnp.ones((1,)))
    b = model.apply({"params": back}, x, jnp.ones((1, 10, 7)) * 0.1,
                    jnp.ones((1, 1, 8)), jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_export_cli_from_orbax_run(tmp_path):
    """utils/export.py CLI: restore the best orbax checkpoint of a run and
    write the HF model_cleaned.safetensors layout (save_to_hf.py:97-155)."""
    import jax
    import jax.numpy as jnp

    from mode_diffusion_policy_tpu.models.agent import (MoDEAgent,
                                                        MoDEAgentConfig)
    from mode_diffusion_policy_tpu.training.loop import CheckpointManager
    from mode_diffusion_policy_tpu.training.optim import make_optimizer
    from mode_diffusion_policy_tpu.training.state import TrainState
    from mode_diffusion_policy_tpu.utils.export import load_run_params, main

    cfg = MoDEAgentConfig(latent_dim=16, n_layers=1, n_heads=2, cond_dim=8,
                          resnet_type="18")
    agent = MoDEAgent(cfg)
    variables = agent.init_variables(jax.random.PRNGKey(0), image_hw=(32, 32))
    opt, _ = make_optimizer(variables["params"], use_lr_scheduler=False)
    state = TrainState.create(variables, opt, jax.random.PRNGKey(1))
    run_dir = tmp_path / "run"
    mgr = CheckpointManager(str(run_dir / "saved_models"), monitor="m",
                            mode="max")
    mgr.save(1, state, {"m": 1.0})

    params = load_run_params(str(run_dir))
    assert "inner_model" in params

    out_dir = tmp_path / "export"
    main(["--run-dir", str(run_dir), "--out-dir", str(out_dir)])
    from safetensors.numpy import load_file
    flat = load_file(out_dir / "model_cleaned.safetensors")
    assert any("inner_model" in k for k in flat), sorted(flat)[:5]
    assert len(flat) > 5
