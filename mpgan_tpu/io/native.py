"""ctypes bindings + auto-build for the native .uni codec (native/uni_native.cpp).

The library is compiled once on first use (g++ -O3, cached next to the
source); everything degrades gracefully to the pure-Python codec when no
toolchain is present. ctypes calls release the GIL, so
:func:`read_many` decodes files in parallel with a thread pool — the
dataset-load hot path (SURVEY.md §2.13 N2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "uni_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libuni_native.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    # build to a temp path + os.replace: two processes rebuilding
    # concurrently must never clobber a .so another is about to dlopen
    tmp = _LIB + f".tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp, "-lz"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Any | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib or None
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        stale = os.path.exists(_LIB) and os.path.exists(_SRC) and \
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        if not os.path.exists(_LIB) or stale:
            if not os.path.exists(_SRC) or not _build():
                # a failed rebuild (no toolchain) must not abandon a
                # perfectly loadable committed .so — git mtimes are
                # arbitrary, so "stale" is only a hint, not a verdict
                if not os.path.exists(_LIB):
                    _lib = False
                    return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib = False
            return None
        lib.uni_read_header.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_int32)]
        lib.uni_read_header.restype = ctypes.c_int
        lib.uni_read_data.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                      ctypes.c_int64]
        lib.uni_read_data.restype = ctypes.c_int64
        lib.uni_write.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.c_int]
        lib.uni_write.restype = ctypes.c_int
        _lib = lib
        return lib


def available() -> bool:
    return get_lib() is not None


def read_header(path: str) -> dict:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native uni codec unavailable")
    dims = (ctypes.c_int32 * 7)()
    rc = lib.uni_read_header(path.encode(), dims)
    if rc != 0:
        raise IOError(f"uni_read_header({path}) failed: {rc}")
    return dict(dimZ=dims[0], dimY=dims[1], dimX=dims[2], channels=dims[3],
                elementType=dims[4], dimT=dims[5], gridType=dims[6])


def read_gridtype(path: str) -> int:
    """gridType bits via the native header probe (no Python gzip decode).

    Falls back to the Python codec when the loaded .so predates the
    gridType export (it zero-fills the extra slot, and mantaflow never
    writes TypeNone=0 for a real grid)."""
    gt = read_header(path)["gridType"]
    if gt == 0:
        from mpgan_tpu.io import uni
        return uni.read_gridtype(path)
    return gt


def read(path: str) -> np.ndarray:
    """Decode one .uni file → (Z, Y, X, C) array (float32 or int32)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native uni codec unavailable")
    h = read_header(path)
    dtype = np.int32 if h["elementType"] == 0 else np.float32
    shape = (h["dimZ"], h["dimY"], h["dimX"], h["channels"])
    if h["dimT"] > 1:
        shape = (h["dimT"],) + shape
    out = np.empty(shape, dtype=dtype)
    n = lib.uni_read_data(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                          out.nbytes)
    if n != out.nbytes:
        raise IOError(f"uni_read_data({path}) returned {n}, want {out.nbytes}")
    return out


def write(path: str, arr: np.ndarray, grid_type: int, element_type: int,
          info: bytes = b"mpgan_tpu", timestamp: int = 0,
          level: int = 1) -> None:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native uni codec unavailable")
    arr = np.ascontiguousarray(
        arr, dtype=np.int32 if element_type == 0 else np.float32)
    dims = (ctypes.c_int32 * 4)(*arr.shape)
    # atomic (tmp + rename), matching uni.writeUni: an existing file must
    # always be a complete one for skip-existing restart logic
    tmp = path + ".tmp"
    rc = lib.uni_write(tmp.encode(), dims, grid_type, element_type,
                       arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes,
                       info, timestamp, level)
    if rc != 0:
        raise IOError(f"uni_write({path}) failed: {rc}")
    os.replace(tmp, path)


def read_many(paths: list[str], workers: int = 8) -> list[np.ndarray]:
    """Parallel decode (ctypes releases the GIL → real thread parallelism)."""
    if get_lib() is None:
        raise RuntimeError("native uni codec unavailable")
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(read, paths))
