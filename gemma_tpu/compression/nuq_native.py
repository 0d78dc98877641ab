"""ctypes loader for the native NUQ cluster encoder (native/nuq_encode.cc)."""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "nuq_encode.cc")
_CACHE_DIR = os.path.expanduser("~/.cache/gemma_tpu")

GROUP_SIZE = 256
CLUSTERS = 16


@functools.lru_cache(maxsize=1)
def lib():
    so = os.path.join(_CACHE_DIR, "libgemma_tpu_nuq.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            os.makedirs(_CACHE_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-std=c++17", "-shared", "-fPIC", "-O3",
                 "-march=native", "-ffp-contract=off", "-pthread",
                 _SRC, "-o", so],
                check=True, capture_output=True)
        handle = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None
    handle.gemma_nuq_cluster.restype = None
    handle.gemma_nuq_cluster.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    return handle


def cluster(handle, padded: np.ndarray, num_groups: int,
            threads: int | None = None):
    """padded: f32 [num_groups * 256] -> (centers [G, 16], indices [G, 256])."""
    if threads is None:
        threads = min(32, os.cpu_count() or 4)
    padded = np.ascontiguousarray(padded, np.float32)
    centers = np.empty((num_groups, CLUSTERS), np.float32)
    indices = np.empty((num_groups, GROUP_SIZE), np.uint8)
    handle.gemma_nuq_cluster(
        padded.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_groups,
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads,
    )
    return centers, indices
