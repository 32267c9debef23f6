"""Worker for the 2-process jax.distributed CPU emulation test.

Each process owns 2 virtual CPU devices (4 global). Exercises the real
multi-controller path the framework claims for multi-host TPU training:
make_mesh over global devices, per-process batch shards via
process_local_slice (replacing DistributedSampler, reference
rollout_long_horizon.py:43-79), a jitted cross-process reduction (replacing
DDP all-reduce), and process_allgather (replacing all_gather_object,
rollout_long_horizon.py:82-90).

Usage: mp_worker.py <process_id> <num_processes> <port>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nproc

    from jax.experimental import multihost_utils

    from mode_diffusion_policy_tpu.parallel.mesh import (
        batch_sharding, make_mesh, process_local_slice, replicated)

    mesh = make_mesh()          # 1D dp mesh over GLOBAL devices
    assert mesh.devices.size == 2 * nproc

    # --- per-process dataset sharding -> global array -> global reduction
    total = 8
    start, end = process_local_slice(total)
    spans = multihost_utils.process_allgather(
        np.array([start, end], np.int64))
    flat = sorted(map(tuple, spans.reshape(-1, 2).tolist()))
    # the slices must tile [0, total) exactly
    assert flat[0][0] == 0 and flat[-1][1] == total
    for (s0, e0), (s1, _) in zip(flat, flat[1:]):
        assert e0 == s1, flat

    local = np.arange(total, dtype=np.float32)[start:end].reshape(-1, 1)
    garr = jax.make_array_from_process_local_data(batch_sharding(mesh), local)
    assert garr.shape == (total, 1)

    total_sum = jax.jit(jnp.sum, out_shardings=replicated(mesh))(garr)
    # replicated output: every process holds the full value locally
    got = float(np.asarray(total_sum.addressable_data(0)))
    assert got == float(np.arange(total).sum()), got

    # --- python-object gather equivalent (per-host rollout results)
    gathered = multihost_utils.process_allgather(
        np.array([100 + pid], np.int64))
    assert sorted(np.asarray(gathered).reshape(-1).tolist()) == \
        [100 + i for i in range(nproc)]

    print(f"MP OK pid={pid} devices={len(jax.devices())}")


if __name__ == "__main__":
    main()
