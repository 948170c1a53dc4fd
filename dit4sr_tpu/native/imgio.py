"""ctypes bindings for the native image loader (imgio.cpp).

`decode_image` is a drop-in for the cv2 read+resize in
data/satext.py:_read_image (returns None on any failure so callers fall
back); `ImageLoader` is the threaded decode-ahead pipeline — results come
back strictly in submission order, in-flight work is bounded, and the whole
decode+resize runs outside the GIL.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libdit4sr_native.so")


def _load():
    global _LIB
    if _LIB is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        if not hasattr(lib, "imgio_decode_file"):
            return None  # stale .so from before imgio existed; rebuild needed
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.imgio_decode_file.restype = ctypes.c_int
        lib.imgio_decode_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, f32p,
        ]
        lib.imgio_probe_file.restype = ctypes.c_int
        lib.imgio_probe_file.argtypes = [ctypes.c_char_p, i32p, i32p]
        lib.imgio_loader_create.restype = ctypes.c_void_p
        lib.imgio_loader_create.argtypes = [ctypes.c_int] * 4
        lib.imgio_loader_submit.restype = ctypes.c_int64
        lib.imgio_loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.imgio_loader_next.restype = ctypes.c_int
        lib.imgio_loader_next.argtypes = [ctypes.c_void_p, f32p]
        lib.imgio_loader_destroy.restype = None
        lib.imgio_loader_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def imgio_available() -> bool:
    return _load() is not None


def probe_image(path: str) -> Optional[Tuple[int, int]]:
    """JPEG (width, height) without a full decode, or None."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    rc = lib.imgio_probe_file(
        path.encode(), ctypes.byref(w), ctypes.byref(h)
    )
    return (w.value, h.value) if rc == 0 else None


def decode_image(path: str, out_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """Decode a JPEG and bilinear-resize to (h, w); float32 RGB in [0,1].
    Returns None on any failure (unreadable, non-JPEG, CMYK) — callers fall
    back to the cv2 path."""
    lib = _load()
    if lib is None:
        return None
    h, w = out_hw
    out = np.empty((h, w, 3), np.float32)
    rc = lib.imgio_decode_file(
        path.encode(), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


class ImageLoader:
    """Threaded decode-ahead pipeline over the native library.

    submit(path) queues a decode (blocks once `capacity` items are in
    flight); next() returns (image | None, rc) strictly in submission order.
    Use as a context manager; destroy() joins the worker threads.
    """

    def __init__(self, out_hw: Tuple[int, int], threads: int = 2,
                 capacity: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native library missing imgio symbols; run "
                "`python -m dit4sr_tpu.native.build`"
            )
        self._lib = lib
        self._hw = out_hw
        self._handle = lib.imgio_loader_create(
            out_hw[0], out_hw[1], threads, capacity
        )
        self._pending = 0

    def submit(self, path: str) -> int:
        seq = self._lib.imgio_loader_submit(self._handle, path.encode())
        if seq >= 0:
            self._pending += 1
        return seq

    def next(self):
        if self._pending == 0:
            raise RuntimeError("ImageLoader.next() with nothing submitted")
        h, w = self._hw
        out = np.empty((h, w, 3), np.float32)
        rc = self._lib.imgio_loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        self._pending -= 1
        return (out if rc == 0 else None), rc

    def destroy(self):
        if self._handle is not None:
            self._lib.imgio_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.destroy()

    def __del__(self):
        try:
            self.destroy()
        except Exception:
            pass
