"""Native (C++) runtime components, consumed via ctypes.

``load_canvas_native`` is the data-loader hot path: a GIL-free C++ thread
pool (native/loader.cc) that decodes + normalizes + resize-to-fits +
canvas-pads a whole image batch into one numpy buffer, mirroring
``data/pipeline.py::canvas_batch``'s image semantics exactly (equality-
tested). The library is compiled on first use with the system toolchain
and cached next to the source; environments without a compiler or the
OpenCV dev libraries fall back to the Python path transparently
(``native_available()`` -> False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_SO = os.path.join(_DIR, "_build", "libdensebox_loader.so")
_ABI = 1

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _compile() -> None:
    # compile to a per-process temp name and atomically rename: concurrent
    # processes (multi-host loaders, pytest-xdist) must never dlopen a
    # half-written .so or truncate one another's mapped library
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        "-I/usr/include/opencv4",
        _SRC, "-o", tmp,
        "-lopencv_core", "-lopencv_imgcodecs", "-lopencv_imgproc",
        "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_SO)
            lib.densebox_loader_abi_version.restype = ctypes.c_int
            if lib.densebox_loader_abi_version() != _ABI:
                raise OSError("ABI mismatch")
            lib.densebox_load_canvas.restype = ctypes.c_int
            lib.densebox_load_canvas.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _load_failed = True
    return _lib


def native_available() -> bool:
    """True when the compiled loader is usable on this machine."""
    return _get_lib() is not None


def load_canvas_native(
    paths: Sequence[str], canvas_hw: Tuple[int, int],
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """Decode + normalize + fit + pad ``paths`` onto zeroed canvases.

    Returns ``(images (n, hc, wc, 3) f32, scales (n,) f32, status list)``
    with status 0 = ok per image. Raises FileNotFoundError on any failed
    read, matching the Python path's behavior (the loader's failure
    propagation contract — see PrefetchLoader)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable (no compiler or "
                           "OpenCV dev libs) — use the python backend")
    hc, wc = canvas_hw
    n = len(paths)
    images = np.zeros((n, hc, wc, 3), np.float32)
    scales = np.ones((n,), np.float32)
    status = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    failures = lib.densebox_load_canvas(
        arr, n, hc, wc,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads)
    if failures:
        bad = [paths[i] for i in range(n) if status[i] != 0]
        raise FileNotFoundError(f"native loader failed on {bad}")
    return images, scales, list(status)
