"""ctypes loader for the native host library (native/hbird_native.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source), exposing:
- tar_index(path) -> list[(name, offset, size, typeflag)]
- hungarian(cost) -> (row_ind, col_ind)

Both have pure-Python fallbacks; callers use `available()` / try-except.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

from hbird_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "hbird_native.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libhbird_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_TAR_CB = ctypes.CFUNCTYPE(
    None, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char,
    ctypes.c_void_p,
)


def _build() -> bool:
    if not os.path.isfile(_SRC):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native build failed (%s); using Python fallbacks", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.isfile(_LIB_PATH) or (
            os.path.isfile(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.hbird_tar_index.restype = ctypes.c_int64
            lib.hbird_tar_index.argtypes = [ctypes.c_char_p, _TAR_CB, ctypes.c_void_p]
            lib.hbird_hungarian.restype = ctypes.c_int
            lib.hbird_hungarian.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except OSError as e:
            logger.warning("native load failed (%s); using Python fallbacks", e)
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def tar_index(path: str) -> List[Tuple[str, int, int, str]]:
    """Scan tar headers natively: [(member name, payload offset, size, typeflag)].

    Raises RuntimeError if the native library is unavailable or the archive
    is malformed (callers fall back to Python tarfile).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out: List[Tuple[str, int, int, str]] = []

    @_TAR_CB
    def cb(name, offset, size, typeflag, _user):
        out.append((name.decode("utf-8", "surrogateescape"), offset, size,
                    typeflag.decode("latin1")))

    rc = lib.hbird_tar_index(path.encode(), cb, None)
    if rc < 0:
        raise RuntimeError(f"hbird_tar_index failed with {rc} for {path}")
    return out


def hungarian(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Native Jonker-Volgenant assignment (scipy-compatible interface)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    r, c = cost.shape
    n = min(r, c)
    row_ind = np.zeros(n, np.int64)
    col_ind = np.zeros(n, np.int64)
    n_out = lib.hbird_hungarian(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        r,
        c,
        row_ind.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        col_ind.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_out < 0:
        raise RuntimeError("hbird_hungarian failed")
    return row_ind[:n_out], col_ind[:n_out]
