"""Misc utilities (reference mode/utils/utils.py): environment/git logging,
timing, batch-portion selection."""
from __future__ import annotations

import logging
import subprocess
import sys
import time
from functools import wraps
from pathlib import Path
from typing import Optional

import numpy as np


def timeit(fn):
    """Timing decorator (utils.py:16-28)."""
    @wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        logging.getLogger(fn.__module__).debug(
            "%s took %.3fs", fn.__name__, time.time() - t0)
        return out
    return wrapper


def get_git_commit_hash(repo_path: Optional[Path] = None) -> str:
    """utils.py:45-54."""
    try:
        repo_path = repo_path or Path(__file__).resolve().parents[2]
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=repo_path,
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return "unknown"


def log_environment_info(logger: logging.Logger):
    """utils.py:92-137 equivalent: python/jax versions, devices, git hash."""
    import jax
    logger.info("python %s", sys.version.split()[0])
    logger.info("jax %s, backend %s", jax.__version__,
                jax.default_backend())
    logger.info("devices: %s", jax.devices())
    logger.info("process %d/%d", jax.process_index(), jax.process_count())
    logger.info("git commit: %s", get_git_commit_hash())


def get_portion_of_batch_ids(percentage: float, batch_size: int) -> np.ndarray:
    """Deterministically select a percentage of batch indices
    (utils.py:140-158)."""
    num = int(batch_size * percentage)
    if num == 0:
        return np.array([], dtype=int)
    indices = np.arange(batch_size)
    rng = np.random.default_rng(0)
    return np.sort(rng.choice(indices, num, replace=False))


def device_memory_stats() -> dict:
    """HBM usage of the first local device (the TPU analog of the reference's
    CUDA memory logging, training_calvin.py:29-42). Returns {} when the
    backend doesn't expose stats (e.g. CPU)."""
    import jax
    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    gib = 1024 ** 3
    return {
        "mem/bytes_in_use_gib": stats.get("bytes_in_use", 0) / gib,
        "mem/peak_bytes_in_use_gib": stats.get("peak_bytes_in_use", 0) / gib,
        "mem/bytes_limit_gib": stats.get("bytes_limit", 0) / gib,
    }


def add_text_overlay(img: np.ndarray, text: str,
                     color=(255, 255, 255)) -> np.ndarray:
    """Burn an instruction string into a frame (reference utils.py:161-186)."""
    import cv2
    img = np.ascontiguousarray(img)
    h = img.shape[0]
    cv2.putText(img, text, (5, h - 8), cv2.FONT_HERSHEY_SIMPLEX,
                max(0.3, h / 500.0), color, 1, cv2.LINE_AA)
    return img


def format_sftp_path(path) -> "Path":
    """Rewrite sftp://host/... paths to local mounts
    (reference utils.py:189-196)."""
    from pathlib import Path
    path = str(path)
    if path.startswith("sftp://"):
        path = "/" + path.split("/", 3)[-1]
    return Path(path)
