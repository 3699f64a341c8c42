"""ctypes binding to the native CSV writer (``native/csvio.cpp``), with a
pandas fallback when the shared library isn't built.

The native path replaces the reference's per-particle Python write loop
(``src/s01-dataset-generation.py:218-241``): one C pass over contiguous
column arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from nbody_tpu.data.schema import CSV_FIELDS

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnbodyio.so"))

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    """Load (building on first use if a toolchain is available) the native IO
    library; returns None when unavailable — callers fall back to pandas."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nbody_write_csv.restype = ctypes.c_int
        lib.nbody_write_csv.argtypes = [
            ctypes.c_char_p,  # path
            ctypes.c_char_p,  # header
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,  # int cols
            ctypes.POINTER(ctypes.c_int32),  # str idx
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,  # str names
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,  # dbl cols
            ctypes.c_int64,  # n_rows
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


_INT_COLS = ["scene", "step"]
_STR_COL = "scene_type"
_DBL_COLS = [c for c in CSV_FIELDS if c not in _INT_COLS and c != _STR_COL]


def write_csv(df, path: str) -> None:
    """Write a trajectory DataFrame in the reference schema to ``path``.

    Uses the native writer when available, pandas ``to_csv`` otherwise.
    """
    lib = _load_lib()
    if lib is None:
        df.to_csv(path, index=False)
        return

    n = len(df)
    ints = np.ascontiguousarray(
        np.stack([df[c].to_numpy(np.int64) for c in _INT_COLS])
    )
    types, str_idx = np.unique(df[_STR_COL].to_numpy(object), return_inverse=True)
    str_idx = np.ascontiguousarray(str_idx.astype(np.int32))
    names = (ctypes.c_char_p * len(types))(
        *[str(t).encode() for t in types]
    )
    dbls = np.ascontiguousarray(
        np.stack([df[c].to_numpy(np.float64) for c in _DBL_COLS])
    )
    header = ",".join(CSV_FIELDS).encode()
    rc = lib.nbody_write_csv(
        path.encode(),
        header,
        ints.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(_INT_COLS),
        str_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        names,
        len(types),
        dbls.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(_DBL_COLS),
        n,
    )
    if rc != 0:
        raise IOError(f"native CSV writer failed with code {rc} for {path}")


def native_available() -> bool:
    return _load_lib() is not None
