"""Pallas TPU kernels (fused MoE + attention sub-block).

Every kernel takes a static ``interpret`` flag; ``runtime_interpret()`` is
the call-site default, flipping to the (slow, exact) interpreter off-TPU so
the fast-path configs stay runnable in CPU tests and debug sessions.
"""
from __future__ import annotations


def runtime_interpret() -> bool:
    """True when the default jax backend cannot compile Mosaic TPU kernels
    (CPU tests, debug hosts); Pallas calls then use interpret mode."""
    import jax
    return jax.default_backend() != "tpu"
