"""Native (C++) host-side components.

The reference's native layer is CUDA kernels + C++ eval utilities
(SURVEY.md §2.4). On TPU the device-side kernels are Pallas/XLA; the
host-side sequential pieces that the reference keeps native (Hungarian
assignment feeding the OCR loss every step, reference matcher.py:74 via
scipy) are implemented here in C++ (lap.cpp, Jonker-Volgenant) with a scipy
fallback when the shared library hasn't been built.

Build: `python -m dit4sr_tpu.native.build` (uses g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libdit4sr_native.so")


def _load():
    global _LIB
    if _LIB is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lap_solve.restype = ctypes.c_int
        lib.lap_solve.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    return _LIB


def linear_sum_assignment(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimum-cost assignment on a (n_rows, n_cols) matrix with
    n_rows >= n_cols. Returns (row_idx, col_idx) like scipy."""
    lib = _load()
    if lib is None:
        from scipy.optimize import linear_sum_assignment as scipy_lsa

        return scipy_lsa(cost)

    c = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = c.shape
    col_to_row = np.full((m,), -1, dtype=np.int32)
    rc = lib.lap_solve(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(n),
        ctypes.c_int(m),
        col_to_row.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:  # degenerate input; fall back
        from scipy.optimize import linear_sum_assignment as scipy_lsa

        return scipy_lsa(cost)
    cols = np.arange(m, dtype=np.int64)
    return col_to_row.astype(np.int64), cols


def native_available() -> bool:
    return _load() is not None
