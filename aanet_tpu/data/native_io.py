"""ctypes bridge to the native decode library (libaanet_io.so).

Loads the C++ threaded PNG/PFM decoder built from
`aanet_tpu/data/_native/loader.cpp`; builds it on first use when a
toolchain is present. All entry points degrade gracefully: when the
library is unavailable or a file uses an unsupported sub-format the
caller falls back to the Python readers in `file_io.py`.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaanet_io.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.exists(_LIB_PATH)
    _build_attempted = True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception as e:  # missing toolchain/zlib: fall back, but say so
        stderr = getattr(e, "stderr", b"") or b""
        logging.getLogger("aanet_tpu").warning(
            "native IO library build failed (%s); falling back to the "
            "slower Python PNG/PFM decoders. make stderr:\n%s",
            e,
            stderr.decode(errors="replace").strip()[-2000:],
        )
        return False
    return os.path.exists(_LIB_PATH)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if os.environ.get("AANET_NATIVE_IO", "1") == "0":
            return None
        if not os.path.exists(_LIB_PATH) and not _try_build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logging.getLogger("aanet_tpu").warning(
                "native IO library exists but failed to load (%s); "
                "falling back to the Python decoders", e,
            )
            return None
        lib.aanet_decode.restype = ctypes.POINTER(ctypes.c_float)
        lib.aanet_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.aanet_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.aanet_decode_batch.restype = ctypes.c_int64
        lib.aanet_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _take(lib, ptr, h: int, w: int, c: int) -> np.ndarray:
    """Copy a malloc'd [h, w, c] float buffer into numpy, then free it."""
    n = h * w * c
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.aanet_free(ptr)
    arr = arr.reshape(h, w, c)
    return arr[..., 0] if c == 1 else arr


def decode(path: str) -> Optional[np.ndarray]:
    """Decode one PNG/PFM file natively.

    Returns float32 [H, W] (single channel) or [H, W, 3], raw sample
    values (images 0..255 / 0..65535; PFM verbatim, top-down rows), or
    None when native decode is unavailable/unsupported for this file.
    """
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    c = ctypes.c_int64()
    ptr = lib.aanet_decode(path.encode(), ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c))
    if not ptr:
        return None
    return _take(lib, ptr, h.value, w.value, c.value)


def decode_batch(
    paths: Sequence[str], num_threads: int = 0
) -> Optional[List[Optional[np.ndarray]]]:
    """Threaded native decode of many files; None entries for failures.
    Returns None entirely when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    dims = (ctypes.c_int64 * (3 * n))()
    lib.aanet_decode_batch(c_paths, n, outs, dims, num_threads)
    results: List[Optional[np.ndarray]] = []
    for i in range(n):
        if not outs[i]:
            results.append(None)
            continue
        h, w, c = dims[3 * i], dims[3 * i + 1], dims[3 * i + 2]
        results.append(_take(lib, outs[i], h, w, c))
    return results
