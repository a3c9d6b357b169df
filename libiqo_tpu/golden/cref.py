"""ctypes harness over the reference's Generic implementations.

Used only by the test suite to cross-validate the NumPy golden oracle
(golden/numpy_ref.py) against the actual C++ Generic code: it compiles a
tiny extern-C shim against the reference static library and drives the
``XxxResizerImpl_new<ArchGeneric>()`` factories directly (the public facades
would dispatch to the best SIMD path instead,
ref: src/IQOLanczosResizer.cpp:15-37).

Gracefully unavailable when the reference tree or toolchain is missing —
callers must check :func:`available` and skip.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

REF_ROOT = Path(os.environ.get("LIBIQO_REF", "/root/reference"))
BUILD_DIR = Path(__file__).resolve().parents[2] / "build_ref"
SHIM_SO = BUILD_DIR / "libiqo_shim.so"

_SHIM_SRC = r"""
#include <stddef.h>
#include <stdint.h>
#include "IQOLanczosResizerImpl.hpp"
#include "IQOAreaResizerImpl.hpp"
#include "IQOLinearResizerImpl.hpp"

extern "C" {

int iqo_lanczos_generic(
    unsigned degree, size_t srcW, size_t srcH, size_t dstW, size_t dstH,
    size_t pxScale, const uint8_t* src, uint8_t* dst)
{
    iqo::ILanczosResizerImpl* p = iqo::LanczosResizerImpl_new<iqo::ArchGeneric>();
    if (!p) return 1;
    p->init(degree, srcW, srcH, dstW, dstH, pxScale);
    p->resize(srcW, src, dstW, dst);
    delete p;
    return 0;
}

int iqo_area_generic(
    size_t srcW, size_t srcH, size_t dstW, size_t dstH,
    const uint8_t* src, uint8_t* dst)
{
    iqo::IAreaResizerImpl* p = iqo::AreaResizerImpl_new<iqo::ArchGeneric>();
    if (!p) return 1;
    p->init(srcW, srcH, dstW, dstH);
    p->resize(srcW, src, dstW, dst);
    delete p;
    return 0;
}

int iqo_linear_generic(
    size_t srcW, size_t srcH, size_t dstW, size_t dstH,
    const uint8_t* src, uint8_t* dst)
{
    iqo::ILinearResizerImpl* p = iqo::LinearResizerImpl_new<iqo::ArchGeneric>();
    if (!p) return 1;
    p->init(srcW, srcH, dstW, dstH);
    p->resize(srcW, src, dstW, dst);
    delete p;
    return 0;
}

}  // extern "C"
"""

_lib = None
_checked = False


def _build() -> bool:
    lib_a = BUILD_DIR / "lib" / "libiqo.a"
    if not (REF_ROOT / "src").is_dir():
        return False
    if not lib_a.exists():
        try:
            subprocess.run(
                # -O2 -fno-fast-math instead of the reference's -Ofast:
                # fast-math changes coefficient values at exact rational
                # tie-break boundaries (e.g. 701.5/23 via reciprocal
                # approximation), so the strict-IEEE Generic build is the
                # stable numeric contract the oracle matches bit-for-bit.
                ["cmake", "-S", str(REF_ROOT), "-B", str(BUILD_DIR),
                 "-DCMAKE_BUILD_TYPE=RelIEEE", "-G", "Ninja",
                 "-DCMAKE_CXX_FLAGS_RELIEEE=-O2 -fno-fast-math",
                 "-DCMAKE_POSITION_INDEPENDENT_CODE=ON"],
                check=True, capture_output=True)
            subprocess.run(["ninja", "-C", str(BUILD_DIR), "iqo"],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False
    if not lib_a.exists():
        return False
    src_cpp = BUILD_DIR / "iqo_shim.cpp"
    src_cpp.write_text(_SHIM_SRC)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", str(src_cpp),
             "-I", str(REF_ROOT / "src"), "-I", str(REF_ROOT / "include"),
             str(lib_a), "-o", str(SHIM_SO)],
            check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return SHIM_SO.exists()


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if not SHIM_SO.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(SHIM_SO))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    st = ctypes.c_size_t
    lib.iqo_lanczos_generic.argtypes = [ctypes.c_uint, st, st, st, st, st, u8p, u8p]
    lib.iqo_area_generic.argtypes = [st, st, st, st, u8p, u8p]
    lib.iqo_linear_generic.argtypes = [st, st, st, st, u8p, u8p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _run(fn, args, src: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    src = np.ascontiguousarray(src, dtype=np.uint8)
    dst = np.zeros((dst_h, dst_w), dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = fn(*args, src.ctypes.data_as(u8p), dst.ctypes.data_as(u8p))
    if rc != 0:
        raise RuntimeError("reference Generic factory returned NULL")
    return dst


def lanczos(degree: int, src: np.ndarray, dst_w: int, dst_h: int,
            px_scale: int = 1) -> np.ndarray:
    lib = _load()
    src_h, src_w = src.shape
    return _run(lib.iqo_lanczos_generic,
                (degree, src_w, src_h, dst_w, dst_h, px_scale),
                src, dst_h, dst_w)


def area(src: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    lib = _load()
    src_h, src_w = src.shape
    return _run(lib.iqo_area_generic, (src_w, src_h, dst_w, dst_h),
                src, dst_h, dst_w)


def linear(src: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    lib = _load()
    src_h, src_w = src.shape
    return _run(lib.iqo_linear_generic, (src_w, src_h, dst_w, dst_h),
                src, dst_h, dst_w)
