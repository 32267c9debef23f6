"""Host data-pipeline benchmark: can the host feed the train step?

The flagship train step consumes 412 samples/s/chip (bench_train.py), and a
dp-mesh multiplies that by the chip count — the host loader is the classic
silent bottleneck. This benchmark measures the end-to-end host pipeline in
samples/s: dataset window assembly (FNV-validated windows, padding
semantics) -> optional POSIX shared-memory episode cache -> collate ->
threaded prefetch, on a synthetic CALVIN-format dataset (or a real one via
--data-root).

Reference analog: the torch DataLoader workers + SharedMemoryLoader
(/root/reference/mode/datasets/hulc_data_module.py:77-160); here the hot
path is npz-free shm reads + numpy collate, and heavy augmentation runs ON
DEVICE inside the jitted step (ops/image.py), so the host only moves uint8
bytes.

Prints one JSON line: {"metric": "host_loader", "value": <samples/s>, ...}.
Knobs: BENCH_DATA_BATCH (32), BENCH_DATA_BATCHES (30), BENCH_DATA_SHM (1),
BENCH_DATA_HW (200 synthetic image size), BENCH_DATA_WORKERS (0 = inline
assembly; N >= 1 forks N batch-assembly workers over the shm cache),
--data-root <real CALVIN dir>.
"""
from __future__ import annotations

import argparse
import json
import sys
import os
import tempfile
import time
from pathlib import Path


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synth_dataset(root: Path, hw: int, n_episodes: int, ep_len: int):
    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from calvin_fixture import make_calvin_dataset
    return make_calvin_dataset(root, n_episodes=n_episodes, ep_len=ep_len,
                               hw=hw, splits=("training", "validation"))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default=None,
                   help="real CALVIN dir; default: synthetic fixture")
    args = p.parse_args(argv)

    from mode_diffusion_policy_tpu.data.datamodule import CalvinDataModule

    B = int(os.environ.get("BENCH_DATA_BATCH", "32"))
    n_batches = int(os.environ.get("BENCH_DATA_BATCHES", "30"))
    use_shm = os.environ.get("BENCH_DATA_SHM", "1") == "1"
    hw = int(os.environ.get("BENCH_DATA_HW", "200"))
    workers = int(os.environ.get("BENCH_DATA_WORKERS", "0"))

    tmp = None
    if args.data_root:
        root = Path(args.data_root)
    else:
        tmp = tempfile.TemporaryDirectory()
        # enough episodes that the index sweep wraps several times
        root = synth_dataset(Path(tmp.name) / "calvin", hw=hw,
                             n_episodes=8, ep_len=64)
        log(f"synthetic CALVIN fixture at {root} ({hw}x{hw} frames)")

    t0 = time.time()
    dm = CalvinDataModule(str(root), batch_size=B, num_workers=workers,
                          use_shm_cache=use_shm).setup()
    setup_s = time.time() - t0
    log(f"setup (incl. shm preload: {use_shm}): {setup_s:.1f}s, "
        f"{len(dm.train_dataset)} train examples")

    # warmup one epoch pass so prefetch threads and caches are hot
    got = 0
    it = dm.train_batches(epoch=0)
    next(it)
    it.close()   # release loader workers before starting the timed pass

    t0 = time.time()
    epoch = 1
    it = dm.train_batches(epoch=epoch)
    while got < n_batches:
        try:
            batch = next(it)
        except StopIteration:
            it.close()
            epoch += 1
            it = dm.train_batches(epoch=epoch)
            continue
        assert batch["rgb_static"].dtype.kind in "uif"
        got += 1
    dt = time.time() - t0
    # abandoning a multi-worker iterator mid-epoch without close() leaves
    # forked workers blocked on their full queue; interpreter shutdown then
    # deadlocks in multiprocessing's atexit join (observed) — close runs the
    # generator's finally, which terminates and joins the workers
    it.close()
    sps = got * B / dt
    log(f"{got} batches of {B} in {dt:.2f}s")
    chips_fed = sps / 412.0   # measured flagship train step (docs/PERF.md)
    print(json.dumps({
        "metric": "host_loader_samples_per_s", "value": round(sps, 1),
        "unit": "samples/s",
        "batch": B, "shm_cache": use_shm, "workers": workers,
        "vs_train_step": round(chips_fed, 2),
    }))
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
