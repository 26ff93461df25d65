"""Clos (three-stage) factorisation of static permutations for the MXU.

The Beneš transport (:mod:`.benes`) realises an arbitrary permutation as
``2*log2(N)-1`` conditional-exchange stages — all VPU work, and for large
edge spaces the fine-distance lane rolls dominate the fused decoder
(~60% of kernel time at ``N = 32768``).  The block one-hot matmul
transport (:mod:`.layout`) rides the otherwise-idle MXU instead, but only
pays off when the permutation is *block-local* (few source blocks feed
each 128-aligned destination block) — true for structured/QC codes, false
for random constructions.

This module removes the locality requirement.  Any permutation of
``N = nb * 128`` elements factors as a rearrangeable three-stage Clos
network ``C(128, 128, nb)``:

* **stage 1** — an independent permutation *within* each 128-block
  (block-diagonal one-hot matmuls: exactly ``nb`` MXU ops);
* **middle** — per-lane permutations *across* blocks: element ``(b, l)``
  moves to ``(tau_l(b), l)``.  Realised as a Beneš network over the ``nb``
  blocks whose exchange distances are all multiples of 128 — on TPU these
  are whole-tile copies (no intra-lane shuffling), ``2*log2(nb)-1``
  stages;
* **stage 3** — another block-diagonal one-hot matmul pass.

Routing uses the classic bipartite edge-colouring argument (Slepian–
Duguid): each element is an edge ``source block -> destination block`` of
a 128-regular bipartite multigraph; a proper 128-edge-colouring assigns
every element a middle lane such that stages 1 and 3 are block-local
bijections and each colour class is a perfect matching between blocks.
The colouring is computed by recursive Euler splitting (exact for the
power-of-two regularity used here).

The inverse permutation needs no extra tables: one-hot matrices invert by
transposition (contract on the other operand axis) and the middle network
reverses stage order (each stage is an involution).

This is a TPU-native replacement for the reference's CUDA gather-based
message passing (``gpu/device/kernel.cpp:237-293`` indexes messages
through ``mCN``/``mVN`` edge-index tables); TPU vector memory has no
efficient general gather, so the permutation is factored into MXU matmuls
and tile moves instead.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .benes import build_benes

BLOCK = 128


class ClosNetwork(NamedTuple):
    """Host-side three-stage factorisation of ``out[i] = in[perm[i]]``.

    ``p1``/``p3`` are ``[nb, BLOCK, BLOCK]`` one-hot stacks in the
    *operator* convention ``out_b = P_b @ in_b`` for column-major
    ``[BLOCK, batch]`` block slices (row-major ``[batch, BLOCK]`` slices
    use ``out_b = in_b @ P_b^T``).  ``mid_swap[s]`` is the length-``n``
    boolean exchange plane of middle stage ``s`` at element distance
    ``mid_dists[s]`` (always a multiple of BLOCK).
    """

    n: int
    nb: int
    p1: np.ndarray  # float32 one-hot [nb, BLOCK, BLOCK]
    p3: np.ndarray  # float32 one-hot [nb, BLOCK, BLOCK]
    mid_dists: np.ndarray  # int32 [S], element units, multiples of BLOCK
    mid_swap: np.ndarray  # bool [S, n]


def _closed_trail_split(src: np.ndarray, dst: np.ndarray, edge_ids: np.ndarray,
                        nb: int):
    """Split a ``k``-regular (k even) bipartite multigraph's edges into two
    ``k/2``-regular halves by alternating along closed trails.

    Vertices: source blocks ``0..nb-1``, destination blocks ``nb..2nb-1``.
    In an all-even-degree multigraph a greedy walk from any vertex can only
    get stuck back at its start, and bipartite closed trails have even
    length, so strict alternation splits every vertex's incident edges
    evenly.
    """
    n_v = 2 * nb
    # adjacency as flat arrays: for vertex v, slots adj_e/adj_o[ptr[v]:ptr[v+1]]
    u = np.concatenate([src[edge_ids], dst[edge_ids] + nb])
    w = np.concatenate([dst[edge_ids] + nb, src[edge_ids]])
    e2 = np.concatenate([edge_ids, edge_ids])
    order = np.argsort(u, kind="stable")
    adj_e = e2[order]
    adj_o = w[order]
    counts = np.bincount(u, minlength=n_v)
    starts = np.concatenate([[0], np.cumsum(counts)])
    ptr = starts[:-1].copy()
    used = np.zeros(int(edge_ids.max(initial=-1)) + 1, dtype=bool)
    half_a: list[int] = []
    half_b: list[int] = []
    for v0 in range(n_v):
        while True:
            # find an unused edge at v0
            p = ptr[v0]
            while p < starts[v0 + 1] and used[adj_e[p]]:
                p += 1
            ptr[v0] = p
            if p >= starts[v0 + 1]:
                break
            # walk a closed trail from v0, alternating halves
            v = v0
            side = 0
            while True:
                p = ptr[v]
                while p < starts[v + 1] and used[adj_e[p]]:
                    p += 1
                ptr[v] = p
                if p >= starts[v + 1]:
                    break  # stuck: must be back at v0 with trail closed
                e = adj_e[p]
                used[e] = True
                (half_a if side == 0 else half_b).append(e)
                side = 1 - side
                v = adj_o[p]
    return np.array(half_a, dtype=np.int64), np.array(half_b, dtype=np.int64)


def _edge_colour(src_block: np.ndarray, dst_block: np.ndarray, nb: int,
                 k: int = BLOCK) -> np.ndarray:
    """Proper ``k``-edge-colouring of the ``k``-regular bipartite multigraph
    whose edges are ``src_block[i] -> dst_block[i]`` (``k`` a power of two),
    by recursive Euler splitting."""
    n = src_block.size
    colour = np.empty(n, dtype=np.int64)
    next_colour = [0]

    def rec(ids: np.ndarray, k: int):
        if k == 1:
            colour[ids] = next_colour[0]
            next_colour[0] += 1
            return
        a, b = _closed_trail_split(src_block, dst_block, ids, nb)
        assert a.size == b.size == ids.size // 2, (a.size, b.size, ids.size)
        rec(a, k // 2)
        rec(b, k // 2)

    rec(np.arange(n, dtype=np.int64), k)
    assert next_colour[0] == k
    return colour


def build_clos(perm: np.ndarray, block: int = BLOCK) -> ClosNetwork:
    """Factor ``out[i] = in[perm[i]]``; ``len(perm)`` must be a multiple of
    ``block`` (pad with identity slots first).

    ``block`` is the Clos switch size: stage 1/3 use ``n/block`` one-hot
    ``block x block`` matmuls per pass and the middle network has
    ``2*log2(n/block)-1`` stages at distances that are multiples of
    ``block``.  Larger blocks trade MXU flops (each pass costs
    ``n * block`` MACs per row) for fewer, denser matmul ops and fewer
    middle stages.  Must be a power-of-two multiple of 128 (TPU lane
    tile).
    """
    perm = np.asarray(perm, dtype=np.int64)
    n = perm.size
    if block % 128 or block & (block - 1):
        raise ValueError(f"block {block} must be a power-of-two multiple of 128")
    if n % block:
        raise ValueError(f"permutation size {n} not a multiple of {block}")
    nb = n // block
    d = np.arange(n, dtype=np.int64)
    s = perm
    sb = s // block
    db = d // block

    if nb == 1:
        # single block: stage 1 carries the whole permutation
        p1 = np.zeros((1, block, block), dtype=np.float32)
        p1[0, np.arange(block), perm] = 1.0
        p3 = np.zeros((1, block, block), dtype=np.float32)
        p3[0, np.arange(block), np.arange(block)] = 1.0
        return ClosNetwork(
            n=n, nb=1, p1=p1, p3=p3,
            mid_dists=np.zeros(0, np.int32), mid_swap=np.zeros((0, n), bool),
        )

    colour = _edge_colour(sb, db, nb, k=block)

    # stage 1: within source block, move offset (s % block) to lane colour
    p1 = np.zeros((nb, block, block), dtype=np.float32)
    p1[sb, colour, s % block] = 1.0
    # every (block, lane) filled exactly once — proper colouring
    assert int(p1.sum()) == n and p1.max() == 1.0

    # middle: per lane c, block permutation mid_perm_c[db] = sb; merged
    # Beneš planes over the nb blocks, broadcast to element space
    mid_perm = np.empty((block, nb), dtype=np.int64)
    mid_perm[colour, db] = sb
    nets = [build_benes(mid_perm[c]) for c in range(block)]
    S = len(nets[0].dists)
    assert all(len(nt.dists) == S and nt.n == nb for nt in nets)
    mid_dists = (nets[0].dists.astype(np.int64) * block).astype(np.int32)
    mid_swap = np.zeros((S, n), dtype=bool)
    for c in range(block):
        mid_swap[:, c::block] = nets[c].swap
    # element layout: position b*block + c holds (block b, lane c)
    # mid_swap[:, b*block + c] == nets[c].swap[:, b]  <- c::block stride view

    # stage 3: within destination block, move lane colour to offset (d % block)
    p3 = np.zeros((nb, block, block), dtype=np.float32)
    p3[db, d % block, colour] = 1.0
    assert int(p3.sum()) == n and p3.max() == 1.0

    return ClosNetwork(n=n, nb=nb, p1=p1, p3=p3, mid_dists=mid_dists,
                       mid_swap=mid_swap)


def apply_clos_numpy(net: ClosNetwork, x: np.ndarray,
                     reverse: bool = False) -> np.ndarray:
    """Reference application on a ``[N, ...]`` array (host, for tests)."""
    block = net.p1.shape[1]
    v = x.reshape(net.nb, block, *x.shape[1:]).astype(np.float64)

    def blockmul(mats, v, transpose):
        out = np.empty_like(v)
        for b in range(net.nb):
            m = mats[b].T if transpose else mats[b]
            out[b] = np.tensordot(m, v[b], axes=(1, 0))
        return out

    def mid(v, reverse):
        flat = v.reshape(net.n, *v.shape[2:])
        idx = np.arange(net.n)
        order = (
            range(len(net.mid_dists) - 1, -1, -1)
            if reverse
            else range(len(net.mid_dists))
        )
        for s in order:
            d = int(net.mid_dists[s])
            partner = flat[idx ^ d]
            sw = net.mid_swap[s]
            flat = np.where(
                sw[(...,) + (None,) * (flat.ndim - 1)], partner, flat
            )
        return flat.reshape(v.shape)

    if reverse:
        v = blockmul(net.p3, v, transpose=True)
        v = mid(v, reverse=True)
        v = blockmul(net.p1, v, transpose=True)
    else:
        v = blockmul(net.p1, v, transpose=False)
        v = mid(v, reverse=False)
        v = blockmul(net.p3, v, transpose=False)
    return v.reshape(x.shape).astype(x.dtype)
