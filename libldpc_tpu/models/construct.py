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
        qc=(Z, B.copy()),
    )


def make_peg_code(
    nc: int,
    dv,
    mc: Optional[int] = None,
    rate: Optional[float] = None,
    seed: int = 0,
) -> LDPCCode:
    """Progressive edge-growth (PEG) construction (Hu/Eleftheriou/Arnold).

    Greedily places each edge so the new cycle it closes is as long as
    possible: for every variable node's k-th edge, BFS the current graph
    from the variable; if some checks are unreachable, connect to the
    lowest-degree unreachable check (no new cycle); otherwise connect to a
    lowest-degree check at maximal BFS distance (longest possible new
    cycle).  PEG graphs have substantially larger girth than the
    configuration-model ensembles (``make_regular_code``) — typically
    girth >= 6 (no 4-cycles) at practical rates — which directly improves
    BP waterfall/floor performance.  Beyond the reference's capabilities
    (its benchmark codes are random regular ensembles).

    ``dv`` is an int (regular) or a length-``nc`` degree sequence
    (irregular; processed in PEG's nondecreasing-degree order).  Give the
    check count via ``mc`` or ``rate`` (design rate ``1 - mc/nc``).

    Cost: one BFS per edge over the growing graph — O(E^2); a few seconds
    up to n ~ 8192 at dv = 3.
    """
    if (mc is None) == (rate is None):
        raise ValueError("give exactly one of mc or rate")
    if mc is None:
        mc = int(round(nc * (1.0 - rate)))
    if np.ndim(dv) == 0:
        degs = np.full(nc, int(dv), np.int64)
    else:
        degs = np.asarray(dv, np.int64)
        if degs.shape != (nc,):
            raise ValueError(f"dv sequence must have length {nc}")
    if (degs < 1).any() or (degs > mc).any():
        raise ValueError("variable degrees must be in [1, mc]")
    rng = np.random.default_rng(seed)
    order = np.argsort(degs, kind="stable")  # nondecreasing degree

    vn_adj = [[] for _ in range(nc)]  # checks per variable
    cn_adj = [[] for _ in range(mc)]  # variables per check
    cn_deg = np.zeros(mc, np.int64)

    def lowest_degree_pick(mask):
        """Random lowest-degree check among ``mask`` (bool [mc])."""
        cand = np.nonzero(mask)[0]
        d = cn_deg[cand]
        cand = cand[d == d.min()]
        return int(cand[rng.integers(cand.size)])

    for v in order:
        for k in range(degs[v]):
            if k == 0:
                c = lowest_degree_pick(np.ones(mc, bool))
            else:
                # BFS from v: levels of checks reachable in the current
                # graph; stop when coverage saturates or is total
                seen_c = np.zeros(mc, bool)
                seen_v = np.zeros(nc, bool)
                seen_v[v] = True
                frontier_c = np.asarray(vn_adj[v], np.int64)
                seen_c[frontier_c] = True
                prev_cov = seen_c.copy()
                while True:
                    nxt_v = [cn_adj[c_] for c_ in frontier_c]
                    vs = (np.unique(np.concatenate(nxt_v))
                          if nxt_v else np.empty(0, np.int64))
                    vs = vs[~seen_v[vs]]
                    seen_v[vs] = True
                    nxt_c = [vn_adj[v_] for v_ in vs]
                    cs = (np.unique(np.concatenate(nxt_c))
                          if nxt_c else np.empty(0, np.int64))
                    cs = cs[~seen_c[cs]]
                    if cs.size == 0:
                        # saturated below full coverage: any unreachable
                        # check closes no cycle at all
                        break
                    prev_cov = seen_c.copy()
                    seen_c[cs] = True
                    if seen_c.all():
                        # full coverage: deepest level = complement of the
                        # previous coverage → longest new cycle
                        seen_c = prev_cov
                        break
                    frontier_c = cs
                c = lowest_degree_pick(~seen_c)
            vn_adj[v].append(c)
            cn_adj[c].append(v)
            cn_deg[c] += 1

    rows = np.concatenate(
        [np.asarray(cn_adj[c_], np.int64) * 0 + c_ for c_ in range(mc)]
    )
    cols = np.concatenate([np.asarray(cn_adj[c_], np.int64)
                           for c_ in range(mc)])
    order_e = np.lexsort((cols, rows))
    return LDPCCode(
        rows=rows[order_e].astype(np.int32),
        cols=cols[order_e].astype(np.int32),
        nc=nc,
        mc=mc,
    )


def count_4cycles(code: LDPCCode) -> int:
    """Number of length-4 cycles of the Tanner graph (check pairs sharing
    >= 2 variables, counted with multiplicity C(shared, 2)).

    Works on the sparse edge list — per variable of degree d, each of its
    C(d, 2) check pairs contributes one shared variable; a check pair with
    s shared variables then yields C(s, 2) 4-cycles.  O(sum_v dv^2) time
    and memory, so it scales to the large blocklengths the lane-major path
    targets (the previous dense ``H @ H.T`` was O(mc^2 * nc) and hundreds
    of MB at n = 8192)."""
    rows = code.rows.astype(np.int64)
    cols = code.cols.astype(np.int64)
    order = np.argsort(cols, kind="stable")
    r_sorted = rows[order]
    c_sorted = cols[order]
    # enumerate all ordered (check_a < check_b) pairs within each variable
    starts = np.searchsorted(c_sorted, np.arange(code.nc))
    ends = np.searchsorted(c_sorted, np.arange(code.nc), side="right")
    pair_a = []
    pair_b = []
    for s, e in zip(starts, ends):
        chks = np.sort(r_sorted[s:e])
        d = e - s
        if d < 2:
            continue
        ia, ib = np.triu_indices(d, k=1)
        pair_a.append(chks[ia])
        pair_b.append(chks[ib])
    if not pair_a:
        return 0
    keys = np.concatenate(pair_a) * np.int64(code.mc) + np.concatenate(pair_b)
    _, shared = np.unique(keys, return_counts=True)
    return int((shared * (shared - 1) // 2).sum())


def girth(code: LDPCCode, cap: int = 16) -> int:
    """Girth of the Tanner graph (length of its shortest cycle), by
    edge-parent BFS from every check node; returns ``cap`` if no cycle
    shorter than ``cap`` exists.  O(V·E) — meant for construction-time
    analysis of small/medium codes."""
    # adjacency with edge ids so the BFS can refuse its arrival edge
    n_nodes = code.nc + code.mc  # variables then checks
    adj: list = [[] for _ in range(n_nodes)]
    for e, (r, c) in enumerate(zip(code.rows, code.cols)):
        adj[int(c)].append((e, code.nc + int(r)))
        adj[code.nc + int(r)].append((e, int(c)))
    best = cap
    for s in range(code.nc, n_nodes):
        dist = np.full(n_nodes, -1, np.int64)
        via = np.full(n_nodes, -1, np.int64)
        dist[s] = 0
        queue = [s]
        while queue:
            nxt = []
            for u in queue:
                if 2 * dist[u] + 1 >= best:
                    continue
                for e, w in adj[u]:
                    if e == via[u]:
                        continue
                    if dist[w] < 0:
                        dist[w] = dist[u] + 1
                        via[w] = e
                        nxt.append(w)
                    else:
                        cyc = dist[u] + dist[w] + 1
                        if cyc < best:
                            best = cyc
            queue = nxt
    return int(best)


def qc_natural_layers(code: LDPCCode) -> list:
    """The natural layered-decoding schedule of a QC code: one layer per
    base row — ``Z`` structurally-parallel checks that touch each
    variable at most once (single-circulant cells), the grouping layered
    hardware decoders use.  Sets and returns ``code.layers`` (consumed by
    the layered schedule exactly like a layerfile,
    ``gpu/ldpc/ldpc.cpp:111-138``).  Requires ``code.qc``
    (:func:`expand_qc` or :func:`detect_qc`)."""
    if code.qc is None:
        raise ValueError(
            "qc_natural_layers requires QC metadata (expand_qc/detect_qc)")
    Z = code.qc[0]
    code.layers = [
        np.arange(r * Z, (r + 1) * Z, dtype=np.int32)
        for r in range(code.mc // Z)
    ]
    return code.layers


def detect_qc(code: LDPCCode, Z=None) -> np.ndarray:
    """Verify that ``code``'s H is quasi-cyclic (every ``Z×Z`` block is
    zero or a single cyclically-shifted identity) and stamp
    ``code.qc = (Z, base)``; returns the recovered base matrix (the found
    lifting size is ``code.qc[0]``).

    ``Z=None`` (or ``"auto"``/``0``) searches for the lifting size
    itself: every divisor ``>= 2`` of ``gcd(nc, mc)`` is tried largest
    first, so a file-loaded QC code needs no side-channel metadata at all
    — matching the reference GPU loader, where any loaded code gets full
    capability from the file alone (``gpu/ldpc/ldpc.cpp:32-83``).  ``Z=1``
    is excluded (trivially true for every code, and structurally useless).
    Raises ``ValueError`` when H is not QC at the given ``Z`` / at any
    candidate.

    Codefile/alist formats carry no lifting structure, so this is how a
    file-loaded QC code reaches the structure-aware ``"qc"`` lane-major
    transport (the CLI exposes it as ``--qc-z N`` / ``--qc-z auto``).
    """
    if Z in (None, 0, "auto"):
        import math

        g = math.gcd(code.nc, code.mc)
        divisors = set()
        d = 1
        while d * d <= g:
            if g % d == 0:
                divisors.update((d, g // d))
            d += 1
        for cand in sorted(divisors, reverse=True):
            if cand < 2:
                continue
            try:
                return detect_qc(code, cand)
            except ValueError:
                continue
        raise ValueError(
            f"no QC structure found: H is not quasi-cyclic at any "
            f"lifting size >= 2 dividing gcd(nc={code.nc}, mc={code.mc})"
            f" = {g}"
        )
    Z = int(Z)
    if Z < 1:
        raise ValueError(f"lifting size must be positive (got Z={Z})")
    if code.nc % Z or code.mc % Z:
        raise ValueError(
            f"nc={code.nc} / mc={code.mc} not multiples of Z={Z}")
    mb, nb = code.mc // Z, code.nc // Z
    rows = code.rows.astype(np.int64)
    cols = code.cols.astype(np.int64)
    base = np.full((mb, nb), -1, dtype=np.int64)
    be = (rows // Z) * nb + (cols // Z)
    order = np.argsort(be, kind="stable")
    pos = 0
    while pos < rows.size:
        b = be[order[pos]]
        end = pos
        while end < rows.size and be[order[end]] == b:
            end += 1
        grp = order[pos:end]
        if grp.size != Z:
            raise ValueError(
                f"base cell ({b // nb}, {b % nb}) has {grp.size} edges, "
                f"not Z={Z}: H is not QC at this lifting size")
        k = rows[grp] % Z
        i = cols[grp] % Z
        if np.bincount(k, minlength=Z).max() != 1:
            raise ValueError(
                f"base cell ({b // nb}, {b % nb}) is not a permutation "
                "block")
        s = int((i[0] - k[0]) % Z)
        if not (((k + s) % Z) == i).all():
            raise ValueError(
                f"base cell ({b // nb}, {b % nb}) is not a single "
                "cyclic-shift circulant")
        base[b // nb, b % nb] = s
        pos = end
    code.qc = (int(Z), base)
    return base


def make_qc_benchmark_code(
    nc: int, Z: int, dv: int = 3, dc: int = 6, seed: int = 0,
    with_G: bool = False,
) -> LDPCCode:
    """A (dv, dc)-regular quasi-cyclic benchmark code: a balanced base
    graph lifted by ``Z`` with pseudo-random circulant shifts — the QC
    counterpart of :func:`make_benchmark_code`, used to measure the
    structure-aware ``"qc"`` lane-major transport.

    The base puts column ``j``'s ``dv`` cells at rows
    ``(j*dv + t) % mb`` (t = 0..dv-1): distinct per column, and every row
    carries exactly ``dc`` cells when ``gcd(dv, mb) == 1`` divides evenly
    (asserted).  Requires ``nc % Z == 0`` and ``(nc // Z) * dv % dc == 0``.
    """
    if nc % Z:
        raise ValueError(f"nc={nc} not a multiple of Z={Z}")
    nb = nc // Z
    if nb * dv % dc:
        raise ValueError(f"(nc/Z)*dv = {nb * dv} not a multiple of dc={dc}")
    mb = nb * dv // dc
    if dv > mb:
        raise ValueError(f"dv={dv} > mb={mb}: base too small for distinct "
                         "rows per column")
    rng = np.random.default_rng(seed)
    B = np.full((mb, nb), -1, dtype=np.int64)
    for j in range(nb):
        for t in range(dv):
            r = (j * dv + t) % mb
            if B[r, j] >= 0:
                raise ValueError("base construction collision; pick nb/mb "
                                 "with gcd(dv, mb) = 1")
            B[r, j] = int(rng.integers(0, Z))
    counts = (B >= 0).sum(axis=1)
    assert (counts == dc).all(), counts
    code = expand_qc(B, Z)
    if with_G:
        G = systematic_generator(code)
        if G is not None:
            code.G = G
    return code


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
