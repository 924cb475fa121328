"""ctypes bridge to the C++ host runtime (``native/librc_native.so``).

The device compute path is JAX/XLA/Pallas; the *host* runtime around it
— shape-bucket planning and gather bookkeeping for large heterogeneous
block streams — is C++ (``native/rc_native.cpp``). This module loads it,
builds it on demand when a toolchain is present, and falls back to the
pure-Python implementation in ``parallel.scheduler`` otherwise (both
produce identical plans; tests assert it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

__all__ = ["available", "plan", "chunk_batch", "NativePlan"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librc_native.so")

_lib = None
_load_failed = False


def _load():
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        src = os.path.join(_NATIVE_DIR, "rc_native.cpp")
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)):
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s", "-B"],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rc_bucket_dim.restype = ctypes.c_int64
        lib.rc_bucket_dim.argtypes = [ctypes.c_int64, ctypes.c_int64]
        p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.rc_plan.restype = ctypes.c_int64
        lib.rc_plan.argtypes = [ctypes.c_int64, p64, p64, ctypes.c_int64,
                                ctypes.c_int64, p64, p64, p64, p64, p64]
        lib.rc_gather_plan.restype = None
        lib.rc_gather_plan.argtypes = [ctypes.c_int64, p64, p64,
                                       ctypes.c_int64, ctypes.c_int64, p64]
        lib.rc_plan_bytes.restype = ctypes.c_int64
        lib.rc_plan_bytes.argtypes = [ctypes.c_int64, p64, p64, p64, p64,
                                      p64, ctypes.c_int64]
        lib.rc_chunk_batch.restype = ctypes.c_int64
        lib.rc_chunk_batch.argtypes = [ctypes.c_int64] * 6
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    """True if the C++ runtime is loadable (building it if needed)."""
    return _load() is not None


class NativePlan:
    """A planned heterogeneous block stream (see ``rc_plan``)."""

    def __init__(self, shapes: Sequence[tuple[int, int]], bucket_m, bucket_n,
                 order, group_off, group_batch, n_groups: int):
        self.shapes = list(shapes)
        self.bucket_m = bucket_m
        self.bucket_n = bucket_n
        self.order = order
        self.group_off = group_off[:n_groups + 1]
        self.group_batch = group_batch[:n_groups]
        self.n_groups = n_groups

    def groups(self) -> dict[tuple[int, int], list[int]]:
        """The plan as ``{(bucket_m, bucket_n): [submission indices]}`` —
        the exact structure of ``parallel.scheduler.plan_buckets``."""
        out: dict[tuple[int, int], list[int]] = {}
        for gi in range(self.n_groups):
            lo, hi = self.group_off[gi], self.group_off[gi + 1]
            rep = int(self.order[lo])
            key = (int(self.bucket_m[rep]), int(self.bucket_n[rep]))
            out[key] = [int(i) for i in self.order[lo:hi]]
        return out

    def padded_bytes(self, elem_size: int = 4) -> int:
        """Total bytes of the padded stacks this plan materializes."""
        lib = _load()
        return int(lib.rc_plan_bytes(
            self.n_groups, self.group_off, self.order, self.bucket_m,
            self.bucket_n, self.group_batch, elem_size))

    def gather_slots(self) -> np.ndarray:
        """``slots[i] = group * max_batch + slot`` for submission-order
        scatter of per-group factor stacks."""
        lib = _load()
        n = len(self.shapes)
        max_batch = int(self.group_batch.max()) if self.n_groups else 0
        slots = np.zeros(n, dtype=np.int64)
        lib.rc_gather_plan(n, self.order, self.group_off, self.n_groups,
                           max_batch, slots)
        return slots


def chunk_batch(count: int, granule: int, bm: int, bn: int,
                elem_size: int, budget_bytes: int) -> int | None:
    """Fixed per-bucket chunk batch under a byte budget (``rc_chunk_batch``);
    None if the C++ runtime is unavailable (caller falls back to the
    Python mirror in ``parallel.scheduler._chunk_batch``)."""
    lib = _load()
    if lib is None:
        return None
    out = int(lib.rc_chunk_batch(count, granule, bm, bn, elem_size,
                                 budget_bytes))
    if out < 0:
        raise ValueError("invalid chunk_batch inputs")
    return out


def plan(shapes: Sequence[tuple[int, int]], floor: int = 128,
         granule: int = 1) -> NativePlan | None:
    """Plan a block stream with the C++ runtime; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(shapes)
    ms = np.ascontiguousarray([s[0] for s in shapes], dtype=np.int64)
    ns = np.ascontiguousarray([s[1] for s in shapes], dtype=np.int64)
    bucket_m = np.zeros(n, dtype=np.int64)
    bucket_n = np.zeros(n, dtype=np.int64)
    order = np.zeros(n, dtype=np.int64)
    group_off = np.zeros(n + 1, dtype=np.int64)
    group_batch = np.zeros(max(n, 1), dtype=np.int64)
    n_groups = int(lib.rc_plan(n, ms, ns, floor, granule, bucket_m,
                               bucket_n, order, group_off, group_batch))
    if n_groups < 0:
        raise ValueError(f"invalid plan inputs (shapes={shapes[:3]}..., "
                         f"floor={floor}, granule={granule})")
    return NativePlan(shapes, bucket_m, bucket_n, order, group_off,
                      group_batch, n_groups)
