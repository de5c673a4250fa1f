"""ctypes bindings for the C++ degradation engine (csrc/degrade.cpp).

The native path batches the whole blur->hazy->downscale->noise->jpeg->resize
chain into one call with an internal thread pool — the TPU-native runtime
counterpart of the reference's native layer (its CUDA ops are Pallas/XLA
here; its CPU-bound data loader becomes this). Falls back to the numpy
implementation transparently when the .so hasn't been built.

Build: `sh csrc/build.sh` (links the system OpenCV).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libvspbfr_degrade.so")
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vspbfr_degrade_batch.restype = ctypes.c_int
    lib.vspbfr_degrade_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
    ]
    if lib.vspbfr_degrade_abi_version() != 1:
        return None
    _lib = lib
    return lib


def degrade_batch(gt: np.ndarray, seeds: np.ndarray,
                  n_threads: int | None = None) -> np.ndarray:
    """Degrade (N, H, W, 3) float32 [0,1] GT images; one seed per image."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native degrade library not built; run csrc/build.sh")
    gt = np.ascontiguousarray(gt, dtype=np.float32)
    n, h, w, c = gt.shape
    assert c == 3
    seeds = np.ascontiguousarray(seeds, dtype=np.uint64)
    assert seeds.shape == (n,)
    out = np.empty_like(gt)
    if n_threads is None:
        n_threads = min(n, os.cpu_count() or 1)
    rc = lib.vspbfr_degrade_batch(
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, h, w,
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n_threads)
    if rc != 0:
        raise RuntimeError(f"native degrade failed with code {rc}")
    return out
