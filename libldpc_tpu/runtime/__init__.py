"""Optional native (C++) host runtime.

The reference's entire native layer exists for speed on the host CPU: file
parsing (``src/core/sparse.h:92-153``), GF(2) Gaussian elimination
(``src/core/sparse.h:229-370``) and bit-level codeword ops.  On TPU the
compute path is JAX/Pallas, but these host-side jobs still profit from
native code, so this package ships a small C++ library (``native.cpp``)
exposed over a C ABI and loaded with ``ctypes``.

The library is built lazily with ``g++`` on first import (a few hundred ms)
and cached next to the source; every entry point has a NumPy fallback, so the
framework works — just slower on huge code files — without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_LIB = os.path.join(_HERE, f"_native_{sys.implementation.cache_tag}.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    # try -march=native first (word-parallel rank profits from wide SIMD),
    # but fall back to plain -O3: the flag is non-portable (unsupported on
    # some toolchains/targets) and the library must still build there
    for extra in (["-march=native"], []):
        cmd = [
            "g++", "-O3", *extra, "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", _LIB,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.ldpc_parse_pairs.restype = ctypes.c_longlong
        lib.ldpc_parse_pairs.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_longlong,
        ]
        lib.ldpc_gf2_rank.restype = ctypes.c_int
        lib.ldpc_gf2_rank.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


class native:
    """Namespace of native entry points (with availability checks)."""

    @staticmethod
    def available() -> bool:
        return _load() is not None

    @staticmethod
    def parse_pairs(path: str):
        """Parse all non-header ``row col`` integer pairs from a codefile.

        Returns ``(rows, cols)`` int32 arrays.  Raises if the native library
        is unavailable (callers fall back to the Python parser).
        """
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime not available")
        cap = os.path.getsize(path) // 3 + 16  # >= number of pairs
        rows = np.empty(cap, dtype=np.int32)
        cols = np.empty(cap, dtype=np.int32)
        n = lib.ldpc_parse_pairs(
            path.encode(),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        if n < 0:
            raise IOError(f"native parser failed on {path} (code {n})")
        return rows[:n].copy(), cols[:n].copy()

    @staticmethod
    def gf2_rank(packed: np.ndarray, n_cols: int) -> int:
        """Rank of a bit-packed GF(2) matrix ``[m, words]`` over uint64."""
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime not available")
        packed = np.ascontiguousarray(packed, dtype=np.uint64)
        m, words = packed.shape
        return lib.ldpc_gf2_rank(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            m, words, n_cols,
        )
