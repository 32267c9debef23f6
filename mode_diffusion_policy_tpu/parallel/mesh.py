"""Device-mesh data parallelism (the TPU-native replacement for DDP/NCCL).

The reference trains with PyTorch-Lightning DDP over 4 GPUs
(training_calvin.py:97-102). Here the same scaling is one mesh + sharding
annotations: the batch is sharded over a ``dp`` axis (ICI within a slice, an
optional leading ``dcn`` axis across slices), parameters are replicated, and
XLA inserts the gradient all-reduce — no process-group code. Sync-batchnorm
(training_calvin.py:102) falls out for free: under GSPMD the batch-stat means
are global-batch means by construction.

Expert weights are stacked along a leading expert axis (ops/moe.py), so
expert parallelism later is the one-line change of sharding that axis.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              dcn_slices: int = 1) -> Mesh:
    """1D ``(dp,)`` mesh over all devices, or 2D ``(dcn, dp)`` when spanning
    multiple slices (dp rides ICI, dcn rides the data-center network)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn_slices > 1:
        assert n % dcn_slices == 0
        dev_array = np.asarray(devices).reshape(dcn_slices, n // dcn_slices)
        return Mesh(dev_array, ("dcn", "dp"))
    dev_array = mesh_utils.create_device_mesh((n,), devices=devices)
    return Mesh(dev_array, ("dp",))


def batch_spec(mesh: Mesh) -> P:
    """Shard the leading (batch) dim over every data axis of the mesh."""
    axes = tuple(n for n in mesh.axis_names if n in ("dcn", "dp"))
    return P(axes if len(axes) > 1 else axes[0])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading dim sharded over dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def global_batch_size(per_device_batch: int, mesh: Mesh) -> int:
    return per_device_batch * mesh.devices.size


def process_local_slice(total: int) -> Tuple[int, int]:
    """[start, end) index range owned by this host (replaces
    DistributedSampler / rank-sliced eval, rollout_long_horizon.py:43-79)."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = total // n_proc
    extra = total % n_proc
    start = pid * per + min(pid, extra)
    end = start + per + (1 if pid < extra else 0)
    return start, end


def zero1_state_sharding(mesh: Mesh, state, *, axis: str = "dp"):
    """ZeRO-1-style sharding spec for a TrainState: parameters and batch
    stats replicated (pure data parallelism, as the reference's DDP), but
    optimizer moments and EMA weights sharded over the data axis — each chip
    stores 1/N of the fp32 state, and GSPMD inserts the all-gathers around
    the (elementwise) optimizer update. Leaves whose leading dim does not
    divide the axis size stay replicated.

    Goes beyond the reference (which replicates all state per GPU); at the
    flagship 739M-param scale this frees ~7.5GB/chip on an 8-chip mesh.
    """
    n = mesh.shape[axis]
    rep = NamedSharding(mesh, P())

    def shard_leaf(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0 \
                and x.shape[0] > 0:
            return NamedSharding(mesh, P(axis))
        return rep

    def map_tree(tree):
        return jax.tree.map(shard_leaf, tree)

    return type(state)(
        step=rep,
        epoch=rep,
        rng=rep,
        params=jax.tree.map(lambda _: rep, state.params),
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=jax.tree.map(shard_leaf, state.opt_state,
                               is_leaf=lambda x: hasattr(x, "shape")),
        ema_params=map_tree(state.ema_params),
    )
