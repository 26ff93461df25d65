"""Beneš switching networks for static permutations on TPU.

TPU vector memory has no efficient general gather: permuting the rows of a
``[N, batch]`` tensor inside a Pallas kernel cannot be expressed as indexed
loads without serialising.  A Beneš network factors an *arbitrary* static
permutation into ``2*log2(N) - 1`` stages of conditional pairwise exchanges
at power-of-two distances — and a fixed-distance exchange vectorises
perfectly as two ``pltpu.roll``s and a select.  The switch settings are
computed once on the host (the classic recursive 2-colouring / looping
algorithm) and shipped to the kernel as boolean mask planes.

Cost: ``2*log2(N)-1`` elementwise passes over the tensor — for the decoder's
``N = 4096`` edge space that is 23 stages, ~50 MB of VPU traffic per 2 MB
permuted, all VMEM-resident.  The same stage masks applied in reverse order
compute the inverse permutation (each stage is an involution).

Stage convention (recursion level ``l``, block size ``N/2^l``):
pair ``(i, i XOR d)`` with distance ``d = N / 2^(l+1)``; stages run
``d = N/2, N/4, …, 1, …, N/4, N/2``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BenesNetwork(NamedTuple):
    """Host-side network description.

    ``swap[s]`` is a length-N boolean plane for stage ``s``: element ``i``
    exchanges with its partner ``i XOR dist[s]`` iff ``swap[s][i]`` (the
    plane is symmetric: ``swap[i] == swap[i ^ d]``).
    """

    n: int
    dists: np.ndarray  # int32 [S] exchange distance per stage
    swap: np.ndarray  # bool [S, N]


def _route(perm: np.ndarray):
    """Recursive Beneš routing.

    ``perm`` maps output position -> input position (``out[i] = in[perm[i]]``).
    Returns ``(in_swap, mid_stages, out_swap)`` where ``in_swap``/``out_swap``
    are boolean arrays over the top half (pair ``(j, j+half)``) and
    ``mid_stages`` is a list of (upper, lower) sub-stage tuples.
    """
    N = perm.size
    if N == 2:
        return None, [np.array([perm[0] == 1])], None

    half = N // 2
    inv = np.empty(N, dtype=np.int64)
    inv[perm] = np.arange(N)

    # 2-colour terminals: colour[i] = subnet of input i; ocolour[o] likewise
    # for outputs.  Constraints: (a) ocolour[o] == colour[perm[o]];
    # (b) colour[i] != colour[i ^ half]; (c) ocolour[o] != ocolour[o ^ half].
    # The constraint graph of a Beneš routing instance is always bipartite,
    # so a DFS 2-colouring succeeds.
    colour = np.full(N, -1, dtype=np.int8)
    ocolour = np.full(N, -1, dtype=np.int8)
    for seed in range(N):
        if ocolour[seed] >= 0:
            continue
        stack = [(False, seed, 0)]
        while stack:
            is_input, t, c = stack.pop()
            if is_input:
                if colour[t] >= 0:
                    continue
                colour[t] = c
                stack.append((True, t ^ half, 1 - c))  # (b)
                stack.append((False, inv[t], c))  # (a)
            else:
                if ocolour[t] >= 0:
                    continue
                ocolour[t] = c
                stack.append((False, t ^ half, 1 - c))  # (c)
                stack.append((True, perm[t], c))  # (a)

    in_swap = colour[:half] == 1  # input j routed to lower subnet
    out_swap = ocolour[:half] == 1

    # sub-permutations: upper subnet output position k delivers output
    # ou(k) = k (+half if swapped); its source input sits at upper position
    # perm[ou(k)] mod half.
    ou = np.where(out_swap, np.arange(half) + half, np.arange(half))
    ol = np.where(out_swap, np.arange(half), np.arange(half) + half)
    sub_u = perm[ou] % half
    sub_l = perm[ol] % half

    iu_sw, mid_u, ou_sw = _route(sub_u)
    il_sw, mid_l, ol_sw = _route(sub_l)

    mid = []
    if iu_sw is not None:
        mid.append(np.concatenate([iu_sw, il_sw]))
    for su, sl in zip(mid_u, mid_l):
        mid.append(np.concatenate([su, sl]))
    if ou_sw is not None:
        mid.append(np.concatenate([ou_sw, ol_sw]))
    return in_swap, mid, out_swap


def build_benes(perm: np.ndarray) -> BenesNetwork:
    """Build the network for ``out[i] = in[perm[i]]``.

    ``len(perm)`` is padded to the next power of two with identity slots;
    apply the result to arrays padded to the same length.
    """
    perm = np.asarray(perm, dtype=np.int64)
    n0 = perm.size
    N = 1 << max(1, int(np.ceil(np.log2(max(2, n0)))))
    if N != n0:
        perm = np.concatenate([perm, np.arange(n0, N)])

    in_sw, mid, out_sw = _route(perm)
    half_planes: list[np.ndarray] = []
    if in_sw is not None:
        half_planes.append(in_sw)
    # middle stages returned shallowest-first; they nest recursively with
    # distances N/4 … 1 … N/4 — but _route flattens them already in order
    half_planes.extend(mid)
    if out_sw is not None:
        half_planes.append(out_sw)

    S = len(half_planes)
    k = int(np.log2(N))
    assert S == 2 * k - 1, (S, k)
    dists = np.array(
        [N >> (l + 1) for l in range(k)] + [N >> (k - l) for l in range(1, k)],
        dtype=np.int32,
    )

    # expand half-planes (indexed by pair) to full element planes
    swap = np.zeros((S, N), dtype=bool)
    for s, plane in enumerate(half_planes):
        d = dists[s]
        idx = np.arange(N)
        top = (idx & d) == 0
        # pair id: position with bit d cleared, compacted over blocks
        block = idx // (2 * d)
        within = idx % d
        pair = block * d + within
        swap[s] = plane[pair]
    return BenesNetwork(n=N, dists=dists, swap=swap)


def apply_benes_numpy(net: BenesNetwork, x: np.ndarray, reverse=False) -> np.ndarray:
    """Reference application on a ``[N, ...]`` array (host, for tests)."""
    v = x.copy()
    order = range(len(net.dists) - 1, -1, -1) if reverse else range(len(net.dists))
    idx = np.arange(net.n)
    for s in order:
        d = int(net.dists[s])
        partner = v[idx ^ d]
        sw = net.swap[s]
        v = np.where(sw[(...,) + (None,) * (v.ndim - 1)], partner, v)
    return v
