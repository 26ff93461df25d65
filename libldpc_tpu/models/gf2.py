"""Dense bit-packed GF(2) linear algebra on the host.

The reference implements GF(2) arithmetic as a scalar ``struct gf2``
(``src/core/gf2.h:11-40``) and computes matrix rank by Gaussian elimination
over ``std::forward_list`` adjacency (``src/core/sparse.h:229-370``).  Here
the same capabilities are built on bit-packed ``uint64`` words: 64 GF(2)
elements per machine word, XOR for row addition.  This is orders of magnitude
faster than pointer-chasing lists and is the natural host-side companion of
the TPU compute path (which does GF(2) via integer matmul + ``% 2``).

A C++ implementation of the elimination kernel lives in
``libldpc_tpu/runtime`` and is used automatically when built; these NumPy
versions are the portable fallback and the correctness oracle.
"""

from __future__ import annotations

import numpy as np


def pack_rows(mat: np.ndarray) -> np.ndarray:
    """Pack a binary matrix ``[m, n]`` (0/1) into ``[m, ceil(n/64)]`` uint64."""
    mat = np.asarray(mat, dtype=np.uint8) & 1
    m, n = mat.shape
    pad = (-n) % 64
    if pad:
        mat = np.concatenate([mat, np.zeros((m, pad), dtype=np.uint8)], axis=1)
    bits = mat.reshape(m, -1, 64).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, None, :]
    return (bits * weights).sum(axis=2, dtype=np.uint64)


def unpack_rows(packed: np.ndarray, n: int) -> np.ndarray:
    """Inverse of :func:`pack_rows`."""
    m, _ = packed.shape
    bits = (packed[:, :, None] >> np.arange(64, dtype=np.uint64)[None, None, :]) & np.uint64(1)
    return bits.reshape(m, -1)[:, :n].astype(np.uint8)


def rank(mat: np.ndarray) -> int:
    """Rank of a binary matrix over GF(2).

    Mathematically identical to the reference's list-based elimination
    (``src/core/sparse.h:229-294``) but runs bit-parallel Gaussian
    elimination on packed words (native C++ kernel when built).
    """
    packed = pack_rows(np.asarray(mat))
    try:
        from ..runtime import native

        if native.available():
            return native.gf2_rank(packed, np.asarray(mat).shape[1])
    except Exception:
        pass
    m, words = packed.shape
    n = np.asarray(mat).shape[1]
    r = 0
    for col in range(n):
        word, bit = divmod(col, 64)
        mask = np.uint64(1) << np.uint64(bit)
        # find a pivot row at or below r with a 1 in this column
        col_bits = (packed[r:, word] & mask) != 0
        if not col_bits.any():
            continue
        pivot = r + int(np.argmax(col_bits))
        if pivot != r:
            packed[[r, pivot]] = packed[[pivot, r]]
        # eliminate this column from every other row holding a 1
        sel = (packed[:, word] & mask) != 0
        sel[r] = False
        packed[sel] ^= packed[r]
        r += 1
        if r == m:
            break
    return r


def mat_vec(mat: np.ndarray, vec: np.ndarray) -> np.ndarray:
    """``H @ v`` over GF(2) — the syndrome map (``src/core/sparse.h:196-221``)."""
    return (np.asarray(mat, dtype=np.int64) @ (np.asarray(vec, dtype=np.int64) & 1)) % 2


def vec_mat(vec: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """``u @ G`` over GF(2) — the encoding map (``src/core/sparse.h:162-187``)."""
    return ((np.asarray(vec, dtype=np.int64) & 1) @ np.asarray(mat, dtype=np.int64)) % 2


def mat_mat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``A @ B`` over GF(2)."""
    return (np.asarray(a, dtype=np.int64) @ np.asarray(b, dtype=np.int64)) % 2


def is_generator_matrix(H: np.ndarray, G: np.ndarray) -> bool:
    """Check ``H @ G^T == 0`` over GF(2), the invariant the reference's
    integration test verifies entry-by-entry via sparse row intersections
    (``tests/ldpctest.cpp:27-55``)."""
    return not mat_mat(H, G.T).any()
