"""ctypes loader for the native C++ table builder (native/iqo_tables.cpp).

Compiled on first use with g++ (strict IEEE: -O2 -fno-fast-math so the
float32 quantization matches the NumPy engine bit-for-bit); falls back to
None when no toolchain is available — callers then use the pure-Python
engine.  Validated equal to the engine in tests/test_native_tables.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "iqo_tables.cpp"
_lib = None
_checked = False


def _build_dir() -> Path:
    d = Path(os.environ.get("LIBIQO_TPU_CACHE",
                            Path(tempfile.gettempdir()) / "libiqo_tpu_native"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if os.environ.get("LIBIQO_TPU_NO_NATIVE"):
        return None
    so = _build_dir() / "iqo_tables.so"
    if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O2", "-fno-fast-math", "-shared", "-fPIC",
                 str(_SRC), "-o", str(so)],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    i64 = ctypes.c_int64
    p32 = ctypes.POINTER(ctypes.c_int32)
    lib.iqo_lanczos_tables.argtypes = [ctypes.c_int, i64, i64, i64, i64, i64, p32]
    lib.iqo_area_tables.argtypes = [i64, i64, i64, i64, p32]
    lib.iqo_linear_tables.argtypes = [i64, i64, i64, p32]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _out(shape) -> np.ndarray:
    return np.zeros(shape, dtype=np.int32)


def lanczos_tables(degree, r_src, r_dst, px_scale, num_coefs, bias):
    lib = _load()
    if lib is None:
        return None
    out = _out((r_dst, num_coefs))
    rc = lib.iqo_lanczos_tables(degree, r_src, r_dst, px_scale, num_coefs,
                                bias, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if rc == 0 else None


def area_tables(r_src, r_dst, num_coefs, bias):
    lib = _load()
    if lib is None:
        return None
    out = _out((r_dst, num_coefs))
    rc = lib.iqo_area_tables(r_src, r_dst, num_coefs, bias,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if rc == 0 else None


def linear_tables(r_src, r_dst, bias):
    lib = _load()
    if lib is None:
        return None
    out = _out((r_dst, 2))
    rc = lib.iqo_linear_tables(r_src, r_dst, bias,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if rc == 0 else None
