"""Code construction utilities.

The reference benchmarks over generated ``code_dv3_dc6_i=*.txt`` regular
codes whose generator script/data is not in the snapshot
(``gpu/tests/tp.cpp:217-273``, ``.MISSING_LARGE_BLOBS``).  These builders make
the benchmark suite self-contained: random regular Gallager-style ensembles
via the configuration model, plus a systematic generator-matrix solver so any
constructed code can also be encoded.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import gf2
from .code import LDPCCode


def make_regular_code(
    nc: int, dv: int, dc: int, seed: int = 0, max_tries: int = 100
) -> LDPCCode:
    """Random (dv, dc)-regular LDPC code with ``nc`` variable nodes.

    Uses the configuration model: ``nc*dv`` variable sockets matched to
    ``mc*dc`` check sockets by a random permutation, resampled locally until
    no duplicate edges remain.
    """
    if (nc * dv) % dc != 0:
        raise ValueError(f"nc*dv ({nc * dv}) must be divisible by dc ({dc})")
    mc = nc * dv // dc
    rng = np.random.default_rng(seed)
    vn_sockets = np.repeat(np.arange(nc, dtype=np.int64), dv)

    rows = rng.permutation(nc * dv) // dc  # check socket owner per edge
    cols = vn_sockets
    # swap-based repair: while duplicate (row, col) pairs exist, swap the
    # check side of each duplicate with a random other edge
    for _ in range(max_tries):
        key = rows.astype(np.int64) * nc + cols
        _, inverse, counts = np.unique(key, return_inverse=True, return_counts=True)
        dup_positions = np.nonzero(counts[inverse] > 1)[0]
        if dup_positions.size == 0:
            order = np.argsort(key, kind="stable")
            return LDPCCode(
                rows=rows[order].astype(np.int32),
                cols=cols[order].astype(np.int32),
                nc=nc,
                mc=mc,
            )
        # keep one representative of each duplicate group in place
        move = []
        seen = set()
        for p in dup_positions:
            g = inverse[p]
            if g in seen:
                move.append(p)
            else:
                seen.add(g)
        move = np.array(move, dtype=np.int64)
        partners = rng.integers(0, nc * dv, size=move.size)
        rows[move], rows[partners] = rows[partners].copy(), rows[move].copy()
    raise RuntimeError(
        f"could not construct a simple (dv={dv}, dc={dc}) graph in "
        f"{max_tries} tries"
    )


def systematic_generator(code: LDPCCode, seed: int = 0) -> Optional[np.ndarray]:
    """Solve for a generator matrix G with ``H @ G^T = 0`` and full rank k.

    Performs GF(2) Gaussian elimination on a dense bit-packed copy of H to
    find an information set, then back-substitutes.  Returns ``None`` when H
    is rank deficient in a way that leaves no full-rank information set
    (callers should construct a fresh code).  Column order of the returned G
    matches the code's natural column order (no permutation is applied), so
    ``u @ G`` is directly a codeword of H.
    """
    H = code.H_dense.astype(np.uint8)
    mc, nc = H.shape
    # bit-packed Gaussian elimination to reduced row echelon form — the
    # dense-byte version is ~50x slower at n=8192
    R = gf2.pack_rows(H)
    pivot_cols: list[int] = []
    r = 0
    for col in range(nc):
        if r >= mc:
            break
        w, bit = divmod(col, 64)
        mask = np.uint64(1) << np.uint64(bit)
        colbits = (R[r:, w] & mask) != 0
        if not colbits.any():
            continue
        p = r + int(np.argmax(colbits))
        if p != r:
            R[[r, p]] = R[[p, r]]
        sel = (R[:, w] & mask) != 0
        sel[r] = False
        R[sel] ^= R[r]
        pivot_cols.append(col)
        r += 1
    rank = r
    free_cols = np.array(
        [c for c in range(nc) if c not in set(pivot_cols)], dtype=np.int64
    )
    k = nc - rank
    if free_cols.size != k:
        return None
    Rd = gf2.unpack_rows(R[:rank], nc)
    # RREF rows: x[pivot_cols[i]] = sum_j Rd[i, free_j] x[free_j]
    G = np.zeros((k, nc), dtype=np.uint8)
    G[np.arange(k), free_cols] = 1
    piv = np.array(pivot_cols, dtype=np.int64)
    # dependence of each pivot variable on each free variable
    G[:, piv] = Rd[:, free_cols].T
    # sanity: full H·Gᵀ=0 check for small codes, sampled check for large
    # ones (the dense product is O(mc·nc·k) and dominates otherwise)
    if nc <= 2048:
        assert not gf2.mat_mat(H, G.T).any()
    else:
        rng = np.random.default_rng(0)
        u = rng.integers(0, 2, size=(16, k)).astype(np.int64)
        cw = (u @ G.astype(np.int64)) % 2
        assert not ((H.astype(np.int64) @ cw.T) % 2).any()
    return G


def expand_qc(base_matrix: np.ndarray, Z: int) -> LDPCCode:
    """Expand a quasi-cyclic base matrix into an :class:`LDPCCode`.

    ``base_matrix`` is ``[mb, nb]`` of ints: ``-1`` marks an all-zero
    ``Z×Z`` block, ``s >= 0`` a ``Z×Z`` identity right-cyclic-shifted by
    ``s`` (the convention of 802.11n/802.16e/5G-NR protograph tables).
    Beyond the reference's capabilities — included because deployed LDPC
    codes are overwhelmingly QC, and expansion is pure index arithmetic.

    Row ``i``, column ``j`` of block ``(bi, bj)`` with shift ``s`` connects
    check ``bi*Z + i`` to variable ``bj*Z + (i + s) mod Z``.
    """
    B = np.asarray(base_matrix, dtype=np.int64)
    mb, nb = B.shape
    rows_list = []
    cols_list = []
    i_in_block = np.arange(Z, dtype=np.int64)
    for bi in range(mb):
        for bj in range(nb):
            s = B[bi, bj]
            if s < 0:
                continue
            rows_list.append(bi * Z + i_in_block)
            cols_list.append(bj * Z + (i_in_block + s) % Z)
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    order = np.lexsort((cols, rows))
    return LDPCCode(
        rows=rows[order].astype(np.int32),
        cols=cols[order].astype(np.int32),
        nc=nb * Z,
        mc=mb * Z,
    )


def make_benchmark_code(
    nc: int, dv: int = 3, dc: int = 6, seed: int = 0, with_G: bool = False
) -> LDPCCode:
    """A (dv, dc)-regular benchmark code like the reference's generated
    ``dat/code_dv3_dc6_i=*.txt`` inputs (``gpu/tests/tp.cpp:217-273``)."""
    for attempt in range(20):
        code = make_regular_code(nc, dv, dc, seed=seed + 1000 * attempt)
        if not with_G:
            return code
        G = systematic_generator(code)
        if G is not None:
            code.G = G
            return code
    raise RuntimeError("failed to construct benchmark code with generator")
