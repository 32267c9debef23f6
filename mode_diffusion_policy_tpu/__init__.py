"""mode_diffusion_policy_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of intuitive-robots/MoDE_Diffusion_Policy.

Language-conditioned robot imitation learning with a mixture-of-denoising-experts
diffusion transformer policy:

- ``models.modedit``    — the MoDE DiT denoiser (noise-conditioned top-k MoE FFNs)
- ``models.edm``        — EDM preconditioner, noise schedules, scan-based samplers
- ``models.encoders``   — FiLM-ResNet camera encoders, CLIP text tower + BPE tokenizer
- ``ops``               — TPU compute primitives (grouped MoE matmul, Pallas kernels,
                          on-device image preprocessing)
- ``parallel``          — mesh-based data parallelism (pjit/shard_map over ICI/DCN)
- ``training``          — functional train state, optimizer groups, EMA, train loop
- ``data``              — CALVIN/LIBERO episode datasets with deterministic windowing
- ``rollout``           — long-horizon CALVIN chains + LIBERO rollout evaluation
- ``evaluation``        — standalone benchmark CLIs and the HTTP agent proxy

The reference implementation being re-designed (not ported) lives at
/root/reference (PyTorch + Lightning + Hydra); see SURVEY.md for the map.
"""

__version__ = "0.1.0"
