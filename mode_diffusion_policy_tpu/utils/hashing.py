"""pyhash-compatible hash factories with a native C fast path.

The reference depends on the pyhash C++ extension for three determinism
guarantees (SURVEY.md §2.1): validation-window sizing
(base_dataset.py:24-37), LIBERO window sizing (libero_dataset.py:32-45) and
CALVIN evaluation scene seeding (evaluation/utils.py:333-335). This module
reproduces pyhash's exact call semantics:

- callables constructed per algorithm: ``hasher = fnv1_32(); hasher("5")``
- default seed 0 (NOT the canonical FNV offset basis — pyhash quirk,
  Hash.h:123)
- unicode is hashed as its UTF-16LE encoding *without* BOM (Hash.h:241-291)
- bytes / buffers hashed raw; multiple args chain the hash value as seed

The native `_pyhashx` C extension (built via setup.py) is preferred; a
bit-identical pure-Python fallback keeps everything functional without a
compiler.
"""
from __future__ import annotations

from typing import Union

try:
    from ..native import _pyhashx as _C
    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build
    _C = None
    HAVE_NATIVE = False

_MASK32 = 0xFFFFFFFF
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _data(obj: Union[str, bytes, bytearray, memoryview]) -> bytes:
    if isinstance(obj, str):
        return obj.encode("utf-16-le")
    if isinstance(obj, bytes):
        return obj
    return bytes(obj)


class _PyHasher:
    """Pure-Python fallback with pyhash call semantics."""

    _is64 = False

    def __init__(self, seed: int = 0):
        self.seed = seed

    def _hash(self, buf: bytes, value: int) -> int:
        raise NotImplementedError

    def __call__(self, *args, seed: int | None = None) -> int:
        value = self.seed if seed is None else seed
        for arg in args:
            value = self._hash(_data(arg), value)
        return value & (_MASK64 if self._is64 else _MASK32)


class _Fnv1_32(_PyHasher):
    def _hash(self, buf, h):
        for b in buf:
            h = ((h * 16777619) & _MASK32) ^ b
        return h


class _Fnv1a_32(_PyHasher):
    def _hash(self, buf, h):
        for b in buf:
            h = ((h ^ b) * 16777619) & _MASK32
        return h


class _Fnv1_64(_PyHasher):
    _is64 = True

    def _hash(self, buf, h):
        for b in buf:
            h = ((h * 1099511628211) & _MASK64) ^ b
        return h


class _Fnv1a_64(_PyHasher):
    _is64 = True

    def _hash(self, buf, h):
        for b in buf:
            h = ((h ^ b) * 1099511628211) & _MASK64
        return h


if HAVE_NATIVE:
    fnv1_32 = _C.fnv1_32
    fnv1a_32 = _C.fnv1a_32
    fnv1_64 = _C.fnv1_64
    fnv1a_64 = _C.fnv1a_64
    murmur2_32 = _C.murmur2_32
    murmur2_x64_64a = _C.murmur2_x64_64a
    murmur3_32 = _C.murmur3_32
    xx_32 = _C.xx_32
    xx_64 = _C.xx_64
    super_fast_hash = _C.super_fast_hash
    lookup3_little = _C.lookup3_little
    lookup3 = _C.lookup3_little  # little-endian host (pyhash/__init__.py:30)
    # full pyhash export surface (reference Hash.cpp:17-105); values verified
    # bit-exact against the reference build in tests/test_hashing.py
    murmur1_32 = _C.murmur1_32
    murmur1_aligned_32 = _C.murmur1_aligned_32
    murmur2a_32 = _C.murmur2a_32
    murmur2_aligned_32 = _C.murmur2_aligned_32
    murmur2_neutral_32 = _C.murmur2_neutral_32
    murmur2_x86_64b = _C.murmur2_x86_64b
    murmur3_x86_128 = _C.murmur3_x86_128
    murmur3_x64_128 = _C.murmur3_x64_128
    lookup3_big = _C.lookup3_big
    city_32 = _C.city_32
    city_64 = _C.city_64
    city_128 = _C.city_128
    city_crc_128 = _C.city_crc_128
    city_fingerprint_256 = _C.city_fingerprint_256
    spooky_32 = _C.spooky_32
    spooky_64 = _C.spooky_64
    spooky_128 = _C.spooky_128
    farm_32 = _C.farm_32
    farm_64 = _C.farm_64
    farm_128 = _C.farm_128
    farm_fingerprint_32 = _C.farm_fingerprint_32
    farm_fingerprint_64 = _C.farm_fingerprint_64
    farm_fingerprint_128 = _C.farm_fingerprint_128
    metro_64_1 = _C.metro_64_1
    metro_64_2 = _C.metro_64_2
    metro_128_1 = _C.metro_128_1
    metro_128_2 = _C.metro_128_2
    metro_64_crc_1 = _C.metro_64_crc_1
    metro_64_crc_2 = _C.metro_64_crc_2
    metro_128_crc_1 = _C.metro_128_crc_1
    metro_128_crc_2 = _C.metro_128_crc_2
    mum_64 = _C.mum_64
    t1ha2_atonce = _C.t1ha2_atonce
    t1ha2_atonce128 = _C.t1ha2_atonce128
    t1ha1_le = _C.t1ha1_le
    t1ha1_be = _C.t1ha1_be
    t1ha0 = _C.t1ha0
    t1ha = _C.t1ha
else:  # pragma: no cover
    fnv1_32 = _Fnv1_32
    fnv1a_32 = _Fnv1a_32
    fnv1_64 = _Fnv1_64
    fnv1a_64 = _Fnv1a_64

    def _needs_native(name):
        class _Missing:
            def __init__(self, *a, **kw):
                raise ImportError(
                    f"hasher '{name}' requires the _pyhashx C extension — "
                    "build it with `python setup.py build_ext --inplace` "
                    "(only the runtime-critical fnv1 family has a "
                    "pure-Python fallback)")
        _Missing.__name__ = name
        return _Missing

    # the remaining pyhash surface exists at import time (so `from ...
    # hashing import city_64` works either way) but raises a clear error on
    # construction without the native extension
    for _n in ("murmur2_32", "murmur2_x64_64a", "murmur3_32", "xx_32",
               "xx_64", "super_fast_hash", "lookup3_little", "lookup3",
               "murmur1_32", "murmur1_aligned_32", "murmur2a_32",
               "murmur2_aligned_32", "murmur2_neutral_32", "murmur2_x86_64b",
               "murmur3_x86_128", "murmur3_x64_128", "lookup3_big",
               "city_32", "city_64", "city_128", "city_crc_128",
               "city_fingerprint_256", "spooky_32", "spooky_64",
               "spooky_128", "farm_32", "farm_64", "farm_128",
               "farm_fingerprint_32", "farm_fingerprint_64",
               "farm_fingerprint_128", "metro_64_1", "metro_64_2",
               "metro_128_1", "metro_128_2", "metro_64_crc_1",
               "metro_64_crc_2", "metro_128_crc_1", "metro_128_crc_2",
               "mum_64", "t1ha2_atonce", "t1ha2_atonce128", "t1ha1_le",
               "t1ha1_be", "t1ha0", "t1ha"):
        globals()[_n] = _needs_native(_n)
    del _n

# pure-python references always available (used for cross-checking the C ext)
py_fnv1_32 = _Fnv1_32
py_fnv1a_32 = _Fnv1a_32
py_fnv1_64 = _Fnv1_64
py_fnv1a_64 = _Fnv1a_64


def get_validation_window_size(idx: int, min_window_size: int,
                               max_window_size: int,
                               hasher=None) -> int:
    """Deterministic validation window size via FNV-1 32 of str(idx)
    (reference base_dataset.py:24-37)."""
    h = hasher or fnv1_32()
    window_range = max_window_size - min_window_size + 1
    return min_window_size + h(str(idx)) % window_range
