"""ctypes binding + on-demand g++ build of the native patch kernels."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "patch_ops.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    """Compile patch_ops.cpp to a cached shared object and load it."""
    cache = os.environ.get(
        "CMLPL_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "cmlpl_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "patch_ops.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-fopenmp", _SRC, "-o", so_path + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so_path + ".tmp", so_path)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    i64 = ctypes.c_int64
    fp = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    for name in ("extract_patches_nhwc_f32", "extract_patches_nchw_f32"):
        fn = getattr(lib, name)
        fn.argtypes = [fp, fp, i64, i64, i64, i64, i64]
        fn.restype = None
    lib.pad_symmetric_f32.argtypes = [fp, fp, i64, i64, i64, i64]
    lib.pad_symmetric_f32.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_lib()
            _TRIED = True
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def pad_symmetric_native(x: np.ndarray, hw: int) -> np.ndarray:
    """Symmetric pad of the two leading dims; NumPy fallback if the
    native library is unavailable."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = _get_lib()
    rows, cols, ch = x.shape
    if lib is None:
        return np.pad(x, ((hw, hw), (hw, hw), (0, 0)), mode="symmetric")
    out = np.empty((rows + 2 * hw, cols + 2 * hw, ch), dtype=np.float32)
    lib.pad_symmetric_f32(x, out, rows, cols, ch, hw)
    return out


def extract_patches_native(padded: np.ndarray, rows: int, cols: int,
                           w: int, layout: str = "nchw") -> np.ndarray:
    """Materialise all rows*cols patches from the padded cube.

    layout "nchw" matches the reference's XP.npy (K, n_PC, w, w)
    (hyper_tools.py:242 moveaxis); "nhwc" is the framework layout.
    Falls back to a vectorised NumPy path without the library.
    """
    padded = np.ascontiguousarray(padded, dtype=np.float32)
    prows, pcols, ch = padded.shape
    k = rows * cols
    lib = _get_lib()
    if lib is None:
        # stride-tricks fallback: windows view then copy
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(padded, (w, w), axis=(0, 1))
        win = win[:rows, :cols]                # (rows, cols, ch, w, w)
        if layout == "nchw":
            return np.ascontiguousarray(win.reshape(k, ch, w, w))
        return np.ascontiguousarray(
            win.transpose(0, 1, 3, 4, 2).reshape(k, w, w, ch))
    if layout == "nchw":
        out = np.empty((k, ch, w, w), dtype=np.float32)
        lib.extract_patches_nchw_f32(padded, out, rows, cols, pcols, ch, w)
    else:
        out = np.empty((k, w, w, ch), dtype=np.float32)
        lib.extract_patches_nhwc_f32(padded, out, rows, cols, pcols, ch, w)
    return out
