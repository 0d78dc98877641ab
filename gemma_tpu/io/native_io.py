"""ctypes loader for the native parallel file reader (native/io_reader.cc).

Builds the shared library on first use (g++, ~1s) into the user cache;
falls back silently to None when no toolchain is available so the pure
memmap path keeps working.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "io_reader.cc")
_CACHE_DIR = os.path.expanduser("~/.cache/gemma_tpu")


@functools.lru_cache(maxsize=1)
def _lib():
    so = os.path.join(_CACHE_DIR, "libgemma_tpu_io.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            os.makedirs(_CACHE_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-std=c++17", "-shared", "-fPIC", "-O2", "-pthread",
                 _SRC, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None
    lib.gemma_parallel_read.restype = ctypes.c_int
    lib.gemma_parallel_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint64,
    ]
    return lib


def available() -> bool:
    return _lib() is not None


def parallel_read(path: str, ranges: list[tuple[int, int]],
                  threads: int | None = None,
                  chunk_bytes: int = 8 << 20) -> list[np.ndarray] | None:
    """Read (offset, size) ranges with multithreaded pread.

    Returns a list of uint8 arrays, or None if the native reader is
    unavailable (caller falls back to memmap).
    """
    lib = _lib()
    if lib is None:
        return None
    if threads is None:
        threads = min(16, os.cpu_count() or 4)
    n = len(ranges)
    bufs = [np.empty(size, np.uint8) for _, size in ranges]
    offsets = (ctypes.c_uint64 * n)(*[o for o, _ in ranges])
    sizes = (ctypes.c_uint64 * n)(*[s for _, s in ranges])
    dsts = (ctypes.c_void_p * n)(*[b.ctypes.data for b in bufs])
    rc = lib.gemma_parallel_read(path.encode(), offsets, sizes, dsts, n,
                                 threads, chunk_bytes)
    if rc != 0:
        return None
    return bufs
