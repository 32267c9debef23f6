"""Shared-memory episode cache: preload a CALVIN episode directory into POSIX
shared memory once per machine, then serve zero-copy numpy views to every
data-loading process.

Re-design of the reference SharedMemoryLoader
(/root/reference/mode/datasets/utils/shared_memory_utils.py:61-324): one
shared-memory segment per (split, key) holding the packed frames, an offset
lookup dict persisted to /tmp so DDP-style sibling processes can attach, and
SIGTERM/atexit unlink handlers.
"""
from __future__ import annotations

import atexit
import logging
import os
import signal
from concurrent.futures import ThreadPoolExecutor
from multiprocessing import shared_memory
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_LOOKUP_DIR = "/tmp"


def _lookup_path(tag: str) -> str:
    return os.path.join(DEFAULT_LOOKUP_DIR, f"{tag}_shm_lookup.npy")


class SharedEpisodeCache:
    """Pack selected keys of every episode_*.npz into shared memory."""

    def __init__(self, tag: str):
        self.tag = tag
        self._segments: Dict[str, shared_memory.SharedMemory] = {}
        self.lookup: Dict = {}
        self._owner = False

    # -- building ---------------------------------------------------------
    @classmethod
    def build(cls, dataset_dir, keys: Sequence[str], tag: str,
              workers: int = 8) -> "SharedEpisodeCache":
        from .preprocess import list_episode_files
        self = cls(tag)
        self._owner = True
        files = list_episode_files(str(dataset_dir))
        if not files:
            raise FileNotFoundError(f"no episodes under {dataset_dir}")

        def load(item):
            _, path = item
            with np.load(path, allow_pickle=True) as d:
                return {k: np.asarray(d[k]) for k in keys}

        with ThreadPoolExecutor(max_workers=workers) as pool:
            episodes = list(pool.map(load, files))

        self.lookup = {"episode_ids": [idx for idx, _ in files], "keys": {}}
        for key in keys:
            arrs = [ep[key] for ep in episodes]
            shape = (len(arrs),) + arrs[0].shape
            dtype = arrs[0].dtype
            nbytes = int(np.prod(shape)) * dtype.itemsize
            seg_name = f"mode_tpu_{tag}_{key}"
            try:
                seg = shared_memory.SharedMemory(name=seg_name, create=True,
                                                 size=nbytes)
            except FileExistsError:
                old = shared_memory.SharedMemory(name=seg_name)
                old.close()
                old.unlink()
                seg = shared_memory.SharedMemory(name=seg_name, create=True,
                                                 size=nbytes)
            view = np.ndarray(shape, dtype=dtype, buffer=seg.buf)
            for i, a in enumerate(arrs):
                view[i] = a
            self._segments[key] = seg
            self.lookup["keys"][key] = {"segment": seg_name, "shape": shape,
                                        "dtype": str(dtype)}
        np.save(_lookup_path(tag), np.asarray(self.lookup, dtype=object),
                allow_pickle=True)
        self._install_cleanup()
        logger.info("shm cache '%s': %d episodes, keys=%s", tag, len(files),
                    list(keys))
        return self

    # -- attaching (sibling processes) ------------------------------------
    @classmethod
    def attach(cls, tag: str) -> "SharedEpisodeCache":
        self = cls(tag)
        self.lookup = np.load(_lookup_path(tag), allow_pickle=True).item()
        for key, meta in self.lookup["keys"].items():
            self._segments[key] = shared_memory.SharedMemory(
                name=meta["segment"])
        return self

    # -- pickling (spawn/forkserver loader workers) ------------------------
    def __getstate__(self):
        # Workers re-attach by segment name; SharedMemory handles and the
        # unlink duty (ownership) never cross process boundaries.
        return {"tag": self.tag, "lookup": self.lookup}

    def __setstate__(self, state):
        self.tag = state["tag"]
        self.lookup = state["lookup"]
        self._owner = False
        self._segments = {}
        for key, meta in self.lookup["keys"].items():
            self._segments[key] = shared_memory.SharedMemory(
                name=meta["segment"])

    # -- access -----------------------------------------------------------
    def array(self, key: str) -> np.ndarray:
        meta = self.lookup["keys"][key]
        return np.ndarray(tuple(meta["shape"]), dtype=np.dtype(meta["dtype"]),
                          buffer=self._segments[key].buf)

    def episode(self, episode_id: int, key: str) -> np.ndarray:
        if not hasattr(self, "_id_to_idx"):
            self._id_to_idx = {int(e): i for i, e in
                               enumerate(self.lookup["episode_ids"])}
        return self.array(key)[self._id_to_idx[int(episode_id)]]

    def __contains__(self, key: str) -> bool:
        return key in self.lookup.get("keys", {})

    # -- cleanup (shared_memory_utils.py:264,311-324) ----------------------
    def _install_cleanup(self):
        atexit.register(self.cleanup)
        prev = signal.getsignal(signal.SIGTERM)

        def handler(signum, frame):
            self.cleanup()
            if callable(prev):
                prev(signum, frame)
            else:
                raise SystemExit(0)

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:
            pass  # not main thread

    def cleanup(self):
        for seg in self._segments.values():
            try:
                seg.close()
                if self._owner:
                    seg.unlink()
            except FileNotFoundError:
                pass
        self._segments.clear()
        if self._owner:
            try:
                os.unlink(_lookup_path(self.tag))
            except FileNotFoundError:
                pass
