"""CALVIN data module: datasets -> per-host sharded, prefetched device-ready
batches.

Replaces the reference HulcDataModule (hulc_data_module.py:23-160) +
DataLoader workers + DistributedSampler: each host shards the example index
space (parallel/mesh.process_local_slice), a background thread prefetches
numpy batches, language instructions are embedded once through the
LangEmbeddingCache, and images stay uint8 until the on-device transform graph
(ops/image.py) inside the jitted step.
"""
from __future__ import annotations

import logging
import os
import queue
import threading
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from ..parallel.mesh import process_local_slice
from .calvin_dataset import ExtendedDiskDataset
from .episode_utils import load_dataset_statistics

logger = logging.getLogger(__name__)


def collate_episodes(items: List[Dict],
                     lang_embed: Optional[Callable] = None) -> Dict[str, Any]:
    """Stack a list of dataset items into one batch dict with uint8 images.
    Output keys match MoDEAgent.training_loss expectations."""
    batch = {
        "rgb_static": np.stack([it["rgb_obs"]["rgb_static"] for it in items]),
        "rgb_gripper": np.stack([it["rgb_obs"]["rgb_gripper"] for it in items]),
        "actions": np.stack([it["actions"] for it in items]).astype(np.float32),
        "robot_obs": np.stack([it["robot_obs"] for it in items]).astype(np.float32),
        "idx": np.asarray([it["idx"] for it in items], np.int64),
    }
    texts = [str(it.get("lang_text", "")) for it in items]
    batch["lang_text"] = texts
    if lang_embed is not None:
        batch["lang_emb"] = np.asarray(lang_embed(texts), np.float32)
    elif "lang" in items[0]:
        batch["lang_emb"] = np.stack(
            [np.asarray(it["lang"], np.float32).reshape(1, -1)
             for it in items])
    return batch


class _Prefetcher:
    """Background-thread batch prefetch (the host-side stand-in for the
    reference's 12 DataLoader worker processes)."""

    def __init__(self, gen_fn, depth: int = 2):
        self._gen_fn = gen_fn
        self._depth = depth

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        DONE = object()
        stop = threading.Event()

        def put(item):
            # bounded put that gives up when the consumer abandons the
            # iterator — a plain q.put would block this thread forever,
            # keeping the inner generator (and any fork-pool workers it
            # manages) alive past interpreter shutdown (observed deadlock
            # in multiprocessing's atexit join, bench_data 2026-08-19)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            gen = self._gen_fn()
            try:
                for item in gen:
                    if not put(item):
                        return
                put(DONE)
            except BaseException as e:  # propagate loader failures to the
                put(e)                  # training loop instead of silently
                                        # ending the epoch early
            finally:
                gen.close()   # run the inner finally (terminates fork pool)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join(timeout=10)


def _pool_worker(dataset, wid, num_workers, chunks, q):
    """Assemble every batch with ``batch_idx % num_workers == wid`` in
    order and ship ``("batch", idx, batch)`` over this worker's own bounded
    queue. Runs in a spawn/forkserver child: only numpy work happens here;
    anything jax-flavored (the language embedder) runs in the parent."""
    # guard against accidental axon/TPU registration from any lazy import
    # this child makes: scrub IN the child, not in the parent — the parent
    # runs this pool from the prefetcher daemon thread, and mutating the
    # parent's os.environ there races the main thread's live TPU session
    # (advisor round 5). Dataset unpickling stays numpy-only by design
    # (SharedEpisodeCache.__setstate__).
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        for bi in range(wid, len(chunks), num_workers):
            items = [dataset[int(j)] for j in chunks[bi]]
            q.put(("batch", bi, collate_episodes(items, lang_embed=None)))
    except BaseException as e:  # surfaced by the parent as RuntimeError
        try:
            q.put(("error", wid, repr(e)))
        except Exception:
            pass


class _WorkerPool:
    """Multi-process batch assembly over the (shared-memory backed) dataset —
    the host-side analog of the reference's 12-worker DataLoaders
    (/root/reference/mode/datasets/hulc_data_module.py:100-116 +
    shared_memory_utils.py:174-186, 8-proc loader).

    Workers are started via the ``forkserver`` context (override with
    MODE_TPU_MP_CONTEXT=spawn): bare ``fork()`` of the jax-initialized
    (multithreaded) parent is only usually-lucky, and jax itself warns on it
    (VERDICT r4). The dataset is pickled to each child; shm segments
    re-attach by name (SharedEpisodeCache.__setstate__) so frame data is
    still zero-copy shared.

    Ordering and memory: worker ``w`` owns batches ``w, w+W, w+2W, ...`` and
    its OWN queue bounded at 2 entries, and the parent reads queue
    ``bi % W`` for batch ``bi`` — so the stream is bit-identical to the
    single-process iterator with NO parent-side reorder buffer (a fast
    worker blocks after 2 undelivered batches instead of ballooning parent
    memory; the r4 design's shared queue + unbounded reorder dict could).
    See tests/test_data_calvin.py::test_multiworker_batches_deterministic."""

    QUEUE_DEPTH = 2   # per-worker in-flight bound => parent holds <= 1 batch

    def __init__(self, dataset, indices, batch_size: int, num_workers: int,
                 drop_last: bool = True):
        self.dataset = dataset
        self.indices = indices
        self.bs = batch_size
        self.num_workers = num_workers
        self.drop_last = drop_last

    def _chunks(self):
        bs, idx = self.bs, self.indices
        out = []
        for i in range(0, len(idx), bs):
            c = idx[i:i + bs]
            if self.drop_last and len(c) < bs:
                break
            out.append(c)
        return out

    def __iter__(self):
        import multiprocessing as mp
        method = os.environ.get("MODE_TPU_MP_CONTEXT", "forkserver")
        ctx = mp.get_context(method)
        chunks = self._chunks()
        if not chunks:
            return
        W = min(self.num_workers, len(chunks))
        qs = [ctx.Queue(maxsize=self.QUEUE_DEPTH) for _ in range(W)]
        procs = []
        # children must never touch the TPU relay; the scrub happens inside
        # _pool_worker (in the child) rather than by mutating the parent's
        # os.environ here — this __iter__ runs on the prefetcher daemon
        # thread, and a parent-side scrub/restore window would race the
        # main thread's live TPU session (advisor round 5).
        try:
            try:
                for w in range(W):
                    p = ctx.Process(target=_pool_worker,
                                    args=(self.dataset, w, W, chunks, qs[w]),
                                    daemon=True)
                    p.start()
                    procs.append(p)
            except Exception as e:
                # e.g. an unpicklable dataset under spawn/forkserver
                raise RuntimeError(
                    f"loader worker failed to start: {e!r}") from e
            for bi in range(len(chunks)):
                q = qs[bi % W]
                while True:
                    try:
                        tag, wid, payload = q.get(timeout=0.5)
                        break
                    except queue.Empty:
                        if not procs[bi % W].is_alive():
                            try:   # batch may have landed just before exit
                                tag, wid, payload = q.get(timeout=0.5)
                                break
                            except queue.Empty:
                                raise RuntimeError(
                                    f"loader workers exited early: batch "
                                    f"{bi} of {len(chunks)} never arrived")
                if tag == "error":
                    raise RuntimeError(f"loader worker failed: {payload}")
                assert tag == "batch" and wid == bi, (tag, wid, bi)
                yield payload
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
                p.join(timeout=5)
            for q in qs:
                q.close()


class CalvinDataModule:
    """Builds train/val ExtendedDiskDatasets and batch iterators
    (reference HulcDataModule.setup/train_dataloader,
    hulc_data_module.py:77-160). ``num_workers >= 1`` starts that many batch
    assembly processes over the shm cache (see :class:`_WorkerPool`);
    0 assembles inline under the prefetch thread."""

    def __init__(self, root_data_dir: str, *, batch_size: int = 32,
                 act_seq_len: int = 10, obs_seq_len: int = 1,
                 lang_folder: str = "lang_annotations",
                 use_extracted_rel_actions: bool = False,
                 use_shm_cache: bool = False,
                 lang_embed: Optional[Callable] = None,
                 shuffle_val: bool = False, seed: int = 42,
                 transforms: Optional[Dict] = None,
                 dataset_cls=ExtendedDiskDataset,
                 dataset_kwargs: Optional[Dict] = None,
                 num_workers: int = 0):
        self.root = Path(root_data_dir)
        self.training_dir = self.root / "training"
        self.val_dir = self.root / "validation"
        self.batch_size = batch_size
        self.act_seq_len = act_seq_len
        self.obs_seq_len = obs_seq_len
        self.lang_folder = lang_folder
        self.use_extracted_rel_actions = use_extracted_rel_actions
        self.use_shm_cache = use_shm_cache
        self._shm_caches = []
        self.lang_embed = lang_embed
        self.shuffle_val = shuffle_val
        self.seed = seed
        self.dataset_cls = dataset_cls
        self.dataset_kwargs = dataset_kwargs or {}
        self.num_workers = num_workers
        self.transforms = transforms or {"train": {}, "val": {}}
        self.train_dataset = None
        self.val_dataset = None

    def setup(self):
        self.transforms = load_dataset_statistics(
            self.training_dir, self.val_dir, self.transforms)
        common = dict(
            key="lang", lang_folder=self.lang_folder,
            batch_size=self.batch_size,
            min_window_size=self.act_seq_len,
            max_window_size=self.act_seq_len, pad=False,
            aux_lang_loss_window=8,
            obs_seq_len=self.obs_seq_len, action_seq_len=self.act_seq_len,
            future_range=1,
            use_extracted_rel_actions=self.use_extracted_rel_actions,
            **self.dataset_kwargs)
        shm = {"training": None, "validation": None}
        if self.use_shm_cache:
            # preload frames into POSIX shared memory once per machine
            # (the reference's SharedMemoryLoader fast path; ~40x host
            # item throughput vs per-frame npz reads)
            from .shm_cache import SharedEpisodeCache
            keys = ["rgb_static", "rgb_gripper", "robot_obs", "scene_obs",
                    "rel_actions"]
            for split, d in (("training", self.training_dir),
                             ("validation", self.val_dir)):
                cache = SharedEpisodeCache.build(
                    d, keys=keys, tag=f"calvin_{split}")
                shm[split] = cache
                self._shm_caches.append(cache)
        self.train_dataset = self.dataset_cls(
            self.training_dir, shm_cache=shm["training"], **common)
        self.val_dataset = self.dataset_cls(
            self.val_dir, shm_cache=shm["validation"], **common)
        logger.info("train examples: %d, val examples: %d",
                    len(self.train_dataset), len(self.val_dataset))
        return self

    def _iter_batches(self, dataset, shuffle: bool, epoch_seed: int,
                      drop_last: bool = True) -> Iterator[Dict]:
        n = len(dataset)
        start, end = process_local_slice(n)
        indices = np.arange(start, end)
        if shuffle:
            np.random.default_rng(self.seed + epoch_seed).shuffle(indices)
        bs = self.batch_size
        if self.num_workers >= 1:
            # worker-pool assembly; the (possibly jax-backed) language
            # embedder must run here in the parent, never in a child
            for batch in _WorkerPool(dataset, indices, bs,
                                     self.num_workers, drop_last):
                if self.lang_embed is not None:
                    batch["lang_emb"] = np.asarray(
                        self.lang_embed(batch["lang_text"]), np.float32)
                yield batch
            return
        for i in range(0, len(indices) - (bs - 1 if drop_last else 0), bs):
            chunk = indices[i:i + bs]
            if drop_last and len(chunk) < bs:
                return
            items = [dataset[int(j)] for j in chunk]
            yield collate_episodes(items, self.lang_embed)

    def train_batches(self, epoch: int = 0) -> Iterator[Dict]:
        return iter(_Prefetcher(
            lambda: self._iter_batches(self.train_dataset, True, epoch)))

    def val_batches(self, epoch: int = 0) -> Iterator[Dict]:
        return iter(_Prefetcher(
            lambda: self._iter_batches(self.val_dataset, self.shuffle_val,
                                       epoch)))
