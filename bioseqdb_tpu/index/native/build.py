"""Compile-on-demand loader for the native SA-IS library.

The one genuinely host-native piece of the framework, mirroring where
the reference is native (libbwa's is_bwt, bwa.cpp:47). Compiled with g++
on first use and cached next to the source, keyed by a source hash so
edits invalidate the cache. Loaded with ctypes (no pybind11 in the
environment).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sais.cpp")
_lib = None


def _lib_path() -> str:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"libsais_tpu.{digest}.so")


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    path = _lib_path()
    if not os.path.exists(path):
        tmp = path + f".tmp.{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, path)  # atomic under concurrent builders
    lib = ctypes.CDLL(path)
    lib.sais_u8_i32.restype = ctypes.c_int
    lib.sais_u8_i32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sais_u8_i64.restype = ctypes.c_int
    lib.sais_u8_i64.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 array with an implicit appended sentinel.

    Returns SA with ``n + 1`` entries; ``SA[0] == n`` is the sentinel row.
    int32 result when it fits (n + 1 < 2**31), else int64.
    """
    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = text.shape[0]
    lib = get_lib()
    if n + 1 < 2**31:
        sa = np.empty(n + 1, dtype=np.int32)
        rc = lib.sais_u8_i32(
            text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    else:
        sa = np.empty(n + 1, dtype=np.int64)
        rc = lib.sais_u8_i64(
            text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    if rc != 0:
        raise RuntimeError(f"sais failed with code {rc}")
    return sa
