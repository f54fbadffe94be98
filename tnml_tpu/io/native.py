"""ctypes bindings for the native runtime library (native/tnml_native.cc).

Builds the shared library on first use (``make`` in native/), then exposes:
- ``load_features``: fused IDX -> X[B,N,d] float32 + labels, with per-label cap and
  feature map applied in one native pass;
- ``Spool``: fixed-slot binary environment store (the proj_images analog).

Everything degrades gracefully: ``available()`` is False when no compiler/library
exists and callers fall back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtnml_native.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tnml_idx_header.restype = ctypes.c_int
    lib.tnml_idx_header.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_longlong)]
    lib.tnml_load_features.restype = ctypes.c_longlong
    lib.tnml_load_features.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int,
        ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_longlong]
    lib.tnml_spool_create.restype = ctypes.c_void_p
    lib.tnml_spool_create.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                      ctypes.c_longlong]
    lib.tnml_spool_write.restype = ctypes.c_int
    lib.tnml_spool_write.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                     ctypes.c_void_p, ctypes.c_longlong]
    lib.tnml_spool_read.restype = ctypes.c_int
    lib.tnml_spool_read.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                    ctypes.c_void_p, ctypes.c_longlong]
    lib.tnml_spool_close.restype = None
    lib.tnml_spool_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


_FEATURE_CODE = {"normal": 0, "series": 1}


def idx_header(path: str) -> Tuple[int, ...]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    nd = ctypes.c_int(0)
    dims = (ctypes.c_longlong * 4)()
    rc = lib.tnml_idx_header(path.encode(), ctypes.byref(nd), dims)
    if rc != 0:
        raise ValueError(f"{path}: bad IDX header (rc={rc})")
    return tuple(int(dims[i]) for i in range(nd.value))


def load_features(img_path: str, lbl_path: str, nt: int, feature: str,
                  d: int, rescale: float) -> Tuple[np.ndarray, np.ndarray]:
    """Fused IDX -> (X [B,N,d] f32, labels [B] i32); semantics of readMNIST+phi."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if feature not in _FEATURE_CODE:
        raise ValueError(f"feature {feature!r} not recognized")
    if feature == "normal" and d != 2:
        raise ValueError("'normal' feature map requires d=2")
    dims = idx_header(img_path)
    if len(dims) != 3:
        raise ValueError(f"{img_path}: expected rank-3 IDX file")
    count, h, w = dims
    n_sites = h * w
    # upper bound on kept rows
    cap = min(count, nt * 10 if nt < count else count)
    X = np.empty((cap, n_sites, d), dtype=np.float32)
    labels = np.empty((cap,), dtype=np.int32)
    kept = lib.tnml_load_features(
        img_path.encode(), lbl_path.encode(), nt, _FEATURE_CODE[feature], d,
        rescale, X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), X.size)
    if kept < 0:
        raise RuntimeError(f"tnml_load_features failed (rc={kept})")
    return X[:kept].copy(), labels[:kept].copy()


class Spool:
    """Fixed-slot binary store for out-of-core wing stacks (proj_images analog)."""

    def __init__(self, path: str, n_slots: int, slot_bytes: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.tnml_spool_create(path.encode(), n_slots, slot_bytes)
        if not self._h:
            raise OSError(f"cannot create spool at {path}")
        self.n_slots = n_slots
        self.slot_bytes = slot_bytes

    def write(self, slot: int, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        rc = self._lib.tnml_spool_write(self._h, slot,
                                        arr.ctypes.data_as(ctypes.c_void_p),
                                        arr.nbytes)
        if rc != 0:
            raise OSError(f"spool write failed (rc={rc})")

    def read(self, slot: int, like: np.ndarray) -> np.ndarray:
        out = np.empty_like(like)
        rc = self._lib.tnml_spool_read(self._h, slot,
                                       out.ctypes.data_as(ctypes.c_void_p),
                                       out.nbytes)
        if rc != 0:
            raise OSError(f"spool read failed (rc={rc})")
        return out

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.tnml_spool_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
