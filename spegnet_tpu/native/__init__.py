"""ctypes binding for the C++ data plane (native/libspegnet_native.so).

Loads the shared library if present (build with ``make -C native``); every
entry point has a pure-Python fallback in the callers, so the framework works
without it — the native plane just makes the host side of the pipeline
(preprocessing, EDT, edge generation) fast on few-core hosts.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libspegnet_native.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    makefile = _LIB_PATH.parent / "Makefile"
    if not makefile.exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_LIB_PATH.parent)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as e:  # pragma: no cover - toolchain dependent
        logger.debug(f"native build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use if a toolchain exists."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and not _try_build():
        logger.info("native data plane unavailable; using NumPy fallbacks")
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.preprocess_image.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ]
        lib.edt_with_indices.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p, i32p]
        lib.morphological_edges.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.threshold_mask.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p]
        for fn in ("preprocess_image", "edt_with_indices",
                   "morphological_edges", "threshold_mask"):
            getattr(lib, fn).restype = ctypes.c_int
        _lib = lib
        logger.info(f"native data plane loaded from {_LIB_PATH}")
    except OSError as e:  # pragma: no cover
        logger.warning(f"failed to load native library: {e}")
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def preprocess_image(
    rgb: np.ndarray, target_size: int, mean: np.ndarray, std: np.ndarray
) -> Optional[np.ndarray]:
    """uint8 [H, W, 3] -> normalized float32 [S, S, 3], or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = rgb.shape
    out = np.empty((target_size, target_size, c), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.preprocess_image(
        _ptr(rgb, ctypes.c_uint8), h, w, c,
        _ptr(out, ctypes.c_float), target_size, target_size,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
    )
    return out if rc == 0 else None


def edt_with_indices(fg: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Distance + nearest-fg flat index for a binary [H, W] mask."""
    lib = get_lib()
    if lib is None:
        return None
    fg = np.ascontiguousarray(fg > 0, np.uint8)
    h, w = fg.shape
    dist = np.empty((h, w), np.float32)
    idx = np.empty((h, w), np.int32)
    rc = lib.edt_with_indices(
        _ptr(fg, ctypes.c_uint8), h, w,
        _ptr(dist, ctypes.c_float), _ptr(idx, ctypes.c_int32),
    )
    return (dist, idx) if rc == 0 else None


def morphological_edges(mask: np.ndarray, edge_width: int = 1) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    out = np.empty((h, w), np.uint8)
    rc = lib.morphological_edges(
        _ptr(mask, ctypes.c_uint8), h, w, edge_width, _ptr(out, ctypes.c_uint8)
    )
    return out if rc == 0 else None
