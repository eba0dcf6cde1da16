"""Native host library loader: builds ``host_ops.cc`` into a shared
object on first import (JIT build — reference parity: ``spconv/build.py``
builds its C++ on import when not AOT) and binds it via ctypes."""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "host_ops.cc"


def _build() -> Path:
    src = _SRC.read_text()
    tag = hashlib.sha1(src.encode()).hexdigest()[:12]
    so = _DIR / f"libspconv_host_{tag}.so"
    if so.exists():
        return so
    for old in _DIR.glob("libspconv_host_*.so"):
        old.unlink()
    subprocess.check_call([
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(so),
    ])
    return so


_lib = None


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(_build()))
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        _lib.spconv_generate_subm_pairs.restype = ctypes.c_int32
        _lib.spconv_generate_subm_pairs.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p, i32p, i32p, i32p]
        _lib.spconv_generate_conv_pairs.restype = ctypes.c_int32
        _lib.spconv_generate_conv_pairs.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p, i32p, i32p,
            i32p, i32p, ctypes.c_int32, ctypes.c_int64, i32p, i32p, i32p]
        _lib.spconv_point_to_voxel.restype = ctypes.c_int32
        _lib.spconv_point_to_voxel.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, f32p, f32p,
            ctypes.c_int64, ctypes.c_int32, f32p, i32p, i32p, i32p]
        _lib.spconv_gather.restype = None
        _lib.spconv_gather.argtypes = [f32p, i32p, ctypes.c_int64,
                                       ctypes.c_int64, f32p]
        _lib.spconv_scatter_add.restype = None
        _lib.spconv_scatter_add.argtypes = [f32p, i32p, ctypes.c_int64,
                                            ctypes.c_int64, f32p]
    return _lib
