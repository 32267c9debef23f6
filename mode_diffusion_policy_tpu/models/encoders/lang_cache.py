"""Thread-safe LRU cache for language-goal embeddings.

Host-side replacement for the reference AdvancedLangEmbeddingBuffer
(/root/reference/mode/utils/lang_buffer.py:6-72): instruction text ->
embedding, batch-encoding only cache misses, with pickle save/load. Text is
host data, so the cache lives on the host; only the (rare) encoder calls
touch the device.
"""
from __future__ import annotations

import pickle
import threading
from collections import OrderedDict
from typing import Callable, List, Sequence

import numpy as np


class LangEmbeddingCache:
    def __init__(self, encoder: Callable[[List[str]], np.ndarray],
                 buffer_size: int = 10000):
        """encoder: list[str] -> [B, 1, D] embeddings (e.g. LangClip)."""
        self.encoder = encoder
        self.buffer_size = buffer_size
        self._buf: OrderedDict[str, np.ndarray] = OrderedDict()
        self._lock = threading.Lock()

    def __len__(self):
        return len(self._buf)

    def get_goal_instruction_embeddings(self, texts) -> np.ndarray:
        """Return [B, 1, D] embeddings for a batch of instructions, encoding
        only the texts not already cached (lang_buffer.py:13-38)."""
        if isinstance(texts, str):
            texts = [texts]
        texts = list(texts)
        with self._lock:
            misses = [t for t in dict.fromkeys(texts) if t not in self._buf]
        if misses:
            encoded = self.encoder(misses)
            with self._lock:
                for t, e in zip(misses, encoded):
                    self._put(t, np.asarray(e))
        with self._lock:
            out = [self._get(t) for t in texts]
        return np.stack(out)

    __call__ = get_goal_instruction_embeddings

    def _put(self, key: str, value: np.ndarray):
        if key in self._buf:
            self._buf.move_to_end(key)
        self._buf[key] = value
        while len(self._buf) > self.buffer_size:
            self._buf.popitem(last=False)

    def _get(self, key: str) -> np.ndarray:
        self._buf.move_to_end(key)
        return self._buf[key]

    def save(self, path: str):
        with self._lock:
            with open(path, "wb") as f:
                pickle.dump(dict(self._buf), f)

    def load(self, path: str):
        with open(path, "rb") as f:
            data = pickle.load(f)
        with self._lock:
            for k, v in data.items():
                self._put(k, np.asarray(v))


class VLMEmbeddingCache(LangEmbeddingCache):
    """Variable-length token-embedding cache with padding + attention masks
    (reference VLMEmbeddingBuffer, lang_buffer.py:76-226): for encoders that
    return per-token embeddings of varying length rather than one pooled
    vector. ``encoder(texts) -> list of [L_i, D]`` arrays."""

    def __init__(self, encoder, buffer_size: int = 10000,
                 max_length: int = 77, pad_token_id: int = 0):
        super().__init__(encoder, buffer_size)
        self.max_length = max_length
        self.pad_token_id = pad_token_id

    @staticmethod
    def pad_sequences(sequences, max_len=None):
        """Zero-pad [L_i, D] arrays to a common length; returns
        (padded [N, L, D], attention_mask [N, L])."""
        sequences = [np.asarray(s) for s in sequences]
        if max_len is None:
            max_len = max(s.shape[0] for s in sequences)
        D = sequences[0].shape[-1]
        padded = np.zeros((len(sequences), max_len, D), sequences[0].dtype)
        mask = np.zeros((len(sequences), max_len), np.float32)
        for i, s in enumerate(sequences):
            L = min(s.shape[0], max_len)
            padded[i, :L] = s[:L]
            mask[i, :L] = 1.0
        return padded, mask

    def get_goal_instruction_embeddings(self, texts):
        """[N, max_length, D] padded embeddings + [N, max_length] mask."""
        if isinstance(texts, str):
            texts = [texts]
        texts = list(texts)
        with self._lock:
            misses = [t for t in dict.fromkeys(texts) if t not in self._buf]
        if misses:
            encoded = self.encoder(misses)
            with self._lock:
                for t, e in zip(misses, encoded):
                    self._put(t, np.asarray(e))
        with self._lock:
            seqs = [self._get(t) for t in texts]
        return self.pad_sequences(seqs, self.max_length)

    __call__ = get_goal_instruction_embeddings
