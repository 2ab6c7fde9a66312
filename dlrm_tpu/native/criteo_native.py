"""ctypes binding for the native Criteo preprocessor (criteo_preproc.cc).

Auto-builds the shared library with `make` on first use if a toolchain is
present; falls back cleanly (available() -> False) otherwise, in which case
dlrm_tpu/data/criteo.py uses the pure-numpy path.

Note: the native subsampler uses xorshift64*, the python fallback numpy's
MT19937 — with sub_sample_rate > 0 the two paths keep different (equally
random) row subsets. All other outputs are bit-identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcriteo_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.criteo_count_rows.restype = ctypes.c_int64
    lib.criteo_count_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_uint64,
    ]
    lib.criteo_parse.restype = ctypes.c_int64
    lib.criteo_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_uint64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.criteo_write_bin.restype = ctypes.c_int64
    lib.criteo_write_bin.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_raw_day(
    path: str,
    max_ind_range: int = -1,
    sub_sample_rate: float = 0.0,
    seed: int = 123,
) -> Dict[str, np.ndarray]:
    lib = _load()
    assert lib is not None
    bpath = path.encode()
    n = lib.criteo_count_rows(bpath, sub_sample_rate, seed)
    if n < 0:
        raise FileNotFoundError(path)
    y = np.empty(n, dtype=np.int32)
    x_int = np.empty((n, 13), dtype=np.int32)
    x_cat = np.empty((n, 26), dtype=np.int64)
    got = lib.criteo_parse(
        bpath, sub_sample_rate, seed, max_ind_range,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        x_int.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        x_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
    )
    assert got == n, (got, n)
    return {"y": y, "X_int": x_int, "X_cat": x_cat}


def write_bin(path: str, y: np.ndarray, x_int: np.ndarray, x_cat: np.ndarray) -> int:
    lib = _load()
    assert lib is not None
    y = np.ascontiguousarray(y, dtype=np.int32)
    x_int = np.ascontiguousarray(x_int, dtype=np.int32)
    x_cat = np.ascontiguousarray(x_cat, dtype=np.int32)
    return lib.criteo_write_bin(
        path.encode(),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        x_int.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        x_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        y.shape[0],
    )
