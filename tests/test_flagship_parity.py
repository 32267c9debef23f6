"""Flagship-scale end-to-end parity vs the PyTorch reference stack.

Round-1 VERDICT item 2: the per-module parity tests run at small dims, which
validates the math but not the full-scale converter key-mapping a real HF
checkpoint would hit. This builds the reference MoDEAgent-equivalent stack at
REAL dims — MoDeDiT 12L/1024d/8H/4E-top2 (obs_dim 2048, goal_dim 512) +
2x FiLM-ResNet-50 — with random weights on CPU, converts via
utils/checkpoint_convert, and runs the full 10-step DDIM action chunk through
both frameworks (reference call stack: mode_agent.py:584-610 forward ->
embed_visual_obs:548-567 -> denoise_actions:733-760 -> gc_sampling.py:923-951
sample_ddim), asserting the BASELINE.json fidelity target (rel_action MAE
<= 1e-3).

Also covers Lightning-.ckpt ingestion with EMA weights stored in callback
state (reference callbacks/ema.py:144-153, evaluation/utils.py:92-103).
"""
import numpy as np
import pytest

# flagship-dims oracle comparisons: minutes each on this host
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.agent import MoDEAgent, MoDEAgentConfig
from mode_diffusion_policy_tpu.models.edm import sample_loop
from mode_diffusion_policy_tpu.utils.checkpoint_convert import (
    convert_film_resnet, convert_modedit, extract_ema_state_dict,
    load_lightning_checkpoint)
from reference_oracle import load_reference_modedit
from test_precond_parity import load_ref_precond
from test_samplers_parity import load_reference_sampling
from mode_diffusion_policy_tpu.utils.torch_oracles import TorchFiLMResNetPolicy

B = 2
# 112px keeps the CPU suite fast; every weight shape, converter mapping and
# token dim is identical to 224px (the ResNet trunk is fully convolutional)
HW = 112
FLAGSHIP = dict(obs_dim=2048, goal_dim=512, action_dim=7, embed_dim=1024,
                n_layers=12, n_heads=8)


def _randomize_bn_stats(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.fixture(scope="module")
def flagship():
    ref = load_reference_modedit()
    torch.manual_seed(100)
    tdit = ref.MoDeDiT(
        obs_dim=FLAGSHIP["obs_dim"], goal_dim=FLAGSHIP["goal_dim"],
        device="cpu", goal_conditioned=True,
        action_dim=FLAGSHIP["action_dim"], embed_dim=FLAGSHIP["embed_dim"],
        embed_pdrob=0.0, attn_pdrop=0.3, n_layers=FLAGSHIP["n_layers"],
        n_heads=FLAGSHIP["n_heads"], goal_seq_len=1, obs_seq_len=1,
        action_seq_len=10, state_dim=8, mlp_pdrop=0.1, goal_drop=0.1,
        cond_router=True, num_experts=4, top_k=2, router_normalize=True,
        use_argmax=False, use_shared_expert=False,
        use_noise_token_as_input=True, init_style="olmoe")
    tdit.eval()
    with torch.no_grad():
        tdit.pos_emb.normal_(0, 0.02)
    tstatic = TorchFiLMResNetPolicy(512, depth=50)
    tgripper = TorchFiLMResNetPolicy(512, depth=50)
    _randomize_bn_stats(tstatic, 7)
    _randomize_bn_stats(tgripper, 8)
    tstatic.eval()
    tgripper.eval()

    agent = MoDEAgent(MoDEAgentConfig(
        latent_dim=FLAGSHIP["embed_dim"], n_layers=FLAGSHIP["n_layers"],
        n_heads=FLAGSHIP["n_heads"], cond_dim=FLAGSHIP["goal_dim"],
        resnet_type="50", num_experts=4, top_k=2))
    sres = convert_film_resnet(tstatic.state_dict(), depth=50, style="policy")
    gres = convert_film_resnet(tgripper.state_dict(), depth=50, style="policy")
    variables = {
        "params": {
            "inner_model": convert_modedit(
                tdit.state_dict(), n_layers=FLAGSHIP["n_layers"],
                num_experts=4, prefix=""),
            "static_resnet": sres["params"],
            "gripper_resnet": gres["params"],
        },
        "batch_stats": {
            "static_resnet": sres["batch_stats"],
            "gripper_resnet": gres["batch_stats"],
        },
    }
    return tdit, tstatic, tgripper, agent, variables


def test_flagship_e2e_ddim_chunk(flagship):
    tdit, tstatic, tgripper, agent, variables = flagship
    rng = np.random.default_rng(200)
    # transform-boundary inputs: preprocessed float images (the on-device
    # transform pipeline itself is parity-tested in test_image_ops)
    img_s = rng.standard_normal((B, 1, 3, HW, HW)).astype(np.float32) * 0.3
    img_g = rng.standard_normal((B, 1, 3, HW, HW)).astype(np.float32) * 0.3
    goal = rng.standard_normal((B, 1, 512)).astype(np.float32)
    x0 = (rng.standard_normal((B, 10, 7)) * 80.0).astype(np.float32)
    sigmas = np.asarray(agent.sigmas, np.float32)   # exponential, 10 steps

    # ---- torch reference flow (mode_agent.py:548-567,733-760) ----
    sw = load_ref_precond()
    gs = load_reference_sampling()
    with torch.no_grad():
        st = tstatic(torch.tensor(img_s).flatten(0, 1), torch.tensor(goal))
        gt = tgripper(torch.tensor(img_g).flatten(0, 1), torch.tensor(goal))
        state_images = torch.cat([st.view(B, 1, -1), gt.view(B, 1, -1)], 1)
        denoiser = sw.GCDenoiser(tdit, sigma_data=0.5)
        t_out = gs.sample_ddim(denoiser, {"state_images": state_images},
                               torch.tensor(x0), torch.tensor(goal),
                               torch.tensor(sigmas), disable=True).numpy()

    # ---- this framework (NHWC images) ----
    j_img_s = jnp.asarray(np.transpose(img_s, (0, 1, 3, 4, 2)))
    j_img_g = jnp.asarray(np.transpose(img_g, (0, 1, 3, 4, 2)))
    emb, _ = agent.embed_visual_obs(variables, j_img_s, j_img_g,
                                    jnp.asarray(goal), train=False)
    # encoder-boundary check first, to localize any failure
    np.testing.assert_allclose(np.asarray(emb["state_images"]),
                               state_images.numpy(), atol=1e-3, rtol=1e-3)

    den = agent.make_denoiser(variables, emb, jnp.asarray(goal))

    @jax.jit
    def run(x):
        return sample_loop("ddim", den, x, sigmas, jax.random.PRNGKey(0))

    j_out = np.asarray(run(jnp.asarray(x0)))
    mae = float(np.abs(j_out - t_out).mean())
    assert mae <= 1e-3, f"flagship e2e action MAE {mae} > 1e-3"
    np.testing.assert_allclose(j_out, t_out, atol=5e-3, rtol=1e-3)


def test_flagship_fast_path_matches_dense(flagship):
    """The sigma-indexed routing precompute must be consistent at flagship
    dims too (replaces the reference fused-expert cache path used by step(),
    mode_agent.py:594-596,639-644)."""
    _, _, _, agent, variables = flagship
    rng = np.random.default_rng(300)
    emb = {"state_images": jnp.asarray(
        rng.standard_normal((B, 2, 2048)), jnp.float32)}
    goal = jnp.asarray(rng.standard_normal((B, 1, 512)), jnp.float32)
    key = jax.random.PRNGKey(4)
    slow = agent.denoise_actions(variables, emb, goal, key, inference=True)
    fast = agent.denoise_actions(variables, emb, goal, key, inference=True,
                                 use_routing_precompute=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-5)


# ---------------------------------------------------------------------------
# Lightning .ckpt with EMA weights in callback state
# ---------------------------------------------------------------------------

def _tiny_torch_agent():
    """Reference-shaped Lightning module skeleton: model.inner_model (MoDeDiT)
    + two FiLM ResNets, like MoDEAgent's attribute layout
    (mode_agent.py:79,90-91)."""
    ref = load_reference_modedit()
    torch.manual_seed(400)

    class Wrapper(torch.nn.Module):
        def __init__(self):
            super().__init__()
            holder = torch.nn.Module()
            holder.inner_model = ref.MoDeDiT(
                obs_dim=32, goal_dim=16, device="cpu", goal_conditioned=True,
                action_dim=7, embed_dim=64, embed_pdrob=0.0, attn_pdrop=0.3,
                n_layers=2, n_heads=4, goal_seq_len=1, obs_seq_len=1,
                action_seq_len=10, state_dim=8)
            self.model = holder
            self.static_resnet = TorchFiLMResNetPolicy(16, depth=18)
            self.gripper_resnet = TorchFiLMResNetPolicy(16, depth=18)

    return Wrapper()


def test_lightning_ckpt_ema_extraction(tmp_path):
    module = _tiny_torch_agent()
    # EMA weights = params * 0.5, stored as a bare ordered list exactly like
    # the reference EMA callback state (ema.py:144-153)
    ema_list = [p.detach().clone() * 0.5 for _, p in
                module.named_parameters()]
    ckpt = {
        "state_dict": module.state_dict(),
        "callbacks": {"EMA": {"cur_step": 123, "ema_weights": ema_list}},
        "epoch": 3,
    }
    path = tmp_path / "epoch=3.ckpt"
    torch.save(ckpt, path)

    sd = load_lightning_checkpoint(str(path), use_ema=True)

    # alignment check: filtered state_dict names == named_parameters order
    param_names = [n for n, _ in module.named_parameters()]
    buffer_suffixes = ("running_mean", "running_var", "num_batches_tracked")
    filtered = [k for k in module.state_dict()
                if not k.endswith(buffer_suffixes)]
    assert filtered == param_names

    for name, p in module.named_parameters():
        np.testing.assert_allclose(sd[name], p.detach().numpy() * 0.5,
                                   rtol=1e-6)
    # buffers keep their trained values
    np.testing.assert_allclose(
        sd["static_resnet.resnet.bn1.running_mean"],
        module.static_resnet.resnet.bn1.running_mean.numpy())

    # and the EMA-swapped dict converts cleanly into framework params
    params = convert_modedit(sd, n_layers=2, num_experts=4,
                             prefix="model.inner_model.")
    with torch.no_grad():
        golden = (module.model.inner_model.blocks[0]
                  .attn.c_proj.weight.numpy().T * 0.5)
    np.testing.assert_allclose(
        params["blocks_0"]["attn"]["c_proj"]["kernel"], golden, rtol=1e-6)


def test_ema_extraction_count_mismatch_raises():
    with pytest.raises(ValueError, match="cannot align"):
        extract_ema_state_dict({
            "state_dict": {"a.weight": torch.zeros(2),
                           "b.weight": torch.zeros(2)},
            "callbacks": {"EMA": {"ema_weights": [torch.zeros(2)]}},
        })
