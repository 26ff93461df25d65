"""Kernel-side code layout for the fused Pallas decoder.

Extends the degree-class-sorted layout (:mod:`libldpc_tpu.ops.sorted`) with
two kernel-specific choices:

* **Position-major class blocks.**  Within a degree class of ``count`` nodes
  and degree ``d``, edge slot ``base + j*count + i`` holds the ``j``-th edge
  of node ``i``.  The forward/backward exclusion combine and the per-node
  sums then touch only *contiguous* ``[count, batch]`` slices — no strided
  sublane access, which Mosaic lowers poorly.
* **Beneš-factored edge permutation.**  The CN-space ↔ VN-space edge
  permutation is shipped as switch planes of a Beneš network
  (:mod:`libldpc_tpu.ops.pallas.benes`) so the kernel permutes with rolls
  and selects instead of gathers.

Node labellings (sorted-by-degree) are *identical* to
:func:`libldpc_tpu.ops.sorted.to_sorted_device`, so LLR inputs, codewords and
outputs are interchangeable between the XLA and Pallas paths.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...models.code import LDPCCode
from ..sorted import SortedDeviceCode, to_sorted_device
from .benes import build_benes


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PallasDeviceCode:
    """Device tables for the fused kernel.

    Delegates the channel-facing surface (G, bit_pos, puncture/shorten,
    dims) to an embedded :class:`SortedDeviceCode` with the same VN
    labelling.
    """

    sorted_dc: SortedDeviceCode
    # static
    n_pad: int  # power-of-two padded edge-space size
    benes_dists: tuple[int, ...]
    benes_active: tuple[bool, ...]  # stage has any swaps (skip when False)
    cn_blocks: tuple[tuple[int, int, int], ...]  # (base, count, degree)
    vn_blocks: tuple[tuple[int, int, int], ...]  # (base_edge, count, degree)
    vn_node_base: tuple[int, ...]  # node offset of each vn class block
    #: per-direction block-matmul permutation plans: for each destination
    #: 128-block, the list of ``(stacked_block_index, src_block)`` pairs.
    #: The degree-class position-major layout makes the CN<->VN edge
    #: permutation strongly block-local (the bundled n=1024 code touches
    #: only 60 of 1024 possible 128-block pairs), so the permutation can
    #: run as a handful of one-hot 128x128 matmuls on the otherwise-idle
    #: MXU instead of ~19 Benes roll stages on the VPU.
    mxu_plan_fwd: tuple = ()
    mxu_plan_rev: tuple = ()
    #: Clos middle-network exchange distances (element units, multiples of
    #: the Clos switch size); empty when the factorisation was not built
    clos_mid_dists: tuple = ()
    # arrays
    swap_planes: jnp.ndarray = None  # int32 [n_pad, S] switch planes
    #: int32 [n_pad, nl] per-layer CN-edge membership planes for the
    #: layered schedule (None for flooding-only codes)
    layer_planes: Optional[jnp.ndarray] = None
    #: bf16 [P, 128, 128] stacked one-hot blocks, forward (CN->VN edge
    #: space) and reverse; None when the pair count made MXU permutation
    #: unattractive
    mxu_blocks_fwd: Optional[jnp.ndarray] = None
    mxu_blocks_rev: Optional[jnp.ndarray] = None
    #: Clos three-stage factorisation of the same permutation (:mod:`.clos`)
    #: — the MXU transport for codes whose permutation is NOT block-local:
    #: bf16 one-hot stacks [nb, K, K] and int32 middle switch planes
    #: [n_pad, S_mid].  None unless built with ``with_clos=True``.
    clos_p1: Optional[jnp.ndarray] = None
    clos_p3: Optional[jnp.ndarray] = None
    clos_mid_planes: Optional[jnp.ndarray] = None
    #: int32 [n_pad] sorted VN label feeding each CN-space edge slot (-1 on
    #: pad slots) — lets XLA pre-gather edge-space priors for the streaming
    #: kernel's reload (``fresh_lv2c``), eliminating the per-frame warm-up
    #: pass of the zero-init reload
    cn_edge_node: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (
            self.sorted_dc, self.swap_planes, self.layer_planes,
            self.mxu_blocks_fwd, self.mxu_blocks_rev,
            self.clos_p1, self.clos_p3, self.clos_mid_planes,
            self.cn_edge_node,
        ), (
            self.n_pad,
            self.benes_dists,
            self.benes_active,
            self.cn_blocks,
            self.vn_blocks,
            self.vn_node_base,
            self.mxu_plan_fwd,
            self.mxu_plan_rev,
            self.clos_mid_dists,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (sorted_dc, swap_planes, layer_planes, mxu_blocks_fwd,
         mxu_blocks_rev, clos_p1, clos_p3, clos_mid_planes,
         cn_edge_node) = children
        (n_pad, benes_dists, benes_active, cn_blocks, vn_blocks,
         vn_node_base, mxu_plan_fwd, mxu_plan_rev, clos_mid_dists) = aux
        return cls(
            sorted_dc=sorted_dc,
            n_pad=n_pad,
            benes_dists=benes_dists,
            benes_active=benes_active,
            cn_blocks=cn_blocks,
            vn_blocks=vn_blocks,
            vn_node_base=vn_node_base,
            mxu_plan_fwd=mxu_plan_fwd,
            mxu_plan_rev=mxu_plan_rev,
            clos_mid_dists=clos_mid_dists,
            swap_planes=swap_planes,
            layer_planes=layer_planes,
            mxu_blocks_fwd=mxu_blocks_fwd,
            mxu_blocks_rev=mxu_blocks_rev,
            clos_p1=clos_p1,
            clos_p3=clos_p3,
            clos_mid_planes=clos_mid_planes,
            cn_edge_node=cn_edge_node,
        )

    # channel-facing delegation -------------------------------------------
    @property
    def nc(self):
        return self.sorted_dc.nc

    @property
    def mc(self):
        return self.sorted_dc.mc

    @property
    def nnz(self):
        return self.sorted_dc.nnz

    @property
    def nct(self):
        return self.sorted_dc.nct

    @property
    def kc(self):
        return self.sorted_dc.kc

    @property
    def G(self):
        return self.sorted_dc.G

    @property
    def bit_pos(self):
        return self.sorted_dc.bit_pos

    @property
    def puncture(self):
        return self.sorted_dc.puncture

    @property
    def shorten(self):
        return self.sorted_dc.shorten


def _block_permute_plan(perm: np.ndarray, block: int = 128):
    """Factor ``out[i] = in[perm[i]]`` into one-hot ``block x block``
    matmuls.

    Returns ``(plan, blocks)``: ``plan[dst_block]`` is a tuple of
    ``(stacked_index, src_block)`` pairs and ``blocks`` is the stacked
    ``[P, block, block]`` one-hot array (``out_d = sum_s M[p] @ in_s``).
    """
    N = perm.size
    nb = N // block
    dst_of = np.arange(N) // block
    src_of = perm // block
    keys = dst_of * nb + src_of
    order = np.argsort(keys, kind="stable")
    uniq, starts = np.unique(keys[order], return_index=True)
    blocks = np.zeros((uniq.size, block, block), dtype=np.float32)
    plan: list[list[tuple[int, int]]] = [[] for _ in range(nb)]
    bounds = np.append(starts, N)
    for p, key in enumerate(uniq):
        d, s = int(key) // nb, int(key) % nb
        idx = order[bounds[p] : bounds[p + 1]]
        blocks[p, idx % block, perm[idx] % block] = 1.0
        plan[d].append((p, s))
    return tuple(tuple(x) for x in plan), blocks


#: Use the MXU permutation only while the one-hot matmul flops stay under
#: this multiple of the dense-identity cost (pairs <= factor * nb); above
#: it the Benes network wins.
_MXU_MAX_PAIRS_PER_DST = 6.0


def to_pallas_device(code: LDPCCode, with_layers: bool = False,
                     with_clos=False,
                     clos_block: int = 128) -> PallasDeviceCode:
    """Build the fused-kernel layout.

    ``with_clos=True`` additionally ships the Clos three-stage MXU
    factorisation of the edge permutation (:mod:`.clos`) for
    ``permute="clos"``; ``with_clos="auto"`` builds it only when the
    block-local one-hot plan was not viable (unstructured codes — the
    case where the Beneš transport would otherwise dominate).
    """
    sdc = to_sorted_device(code, with_layers=with_layers)
    rows = code.rows.astype(np.int64)
    cols = code.cols.astype(np.int64)
    nnz = code.nnz

    # recompute the relabelling in NumPy rather than pulling sdc.vn_inv back
    # from the device (device->host of a fresh shape is very expensive on
    # tunneled backends); _degree_classes is deterministic, so this matches
    # the embedded SortedDeviceCode exactly
    cn_deg = np.bincount(rows, minlength=code.mc)
    vn_deg = np.bincount(cols, minlength=code.nc)
    cn_inv = np.empty(code.mc, dtype=np.int64)
    cn_inv[np.argsort(cn_deg, kind="stable")] = np.arange(code.mc)
    vn_inv = np.empty(code.nc, dtype=np.int64)
    vn_inv[np.argsort(vn_deg, kind="stable")] = np.arange(code.nc)

    # --- CN space, position-major ---
    # edge order key: (sorted row label, position-in-row); slot of edge =
    # class_base + j*count + (row index within class)
    order_by_row = np.argsort(cn_inv[rows], kind="stable")
    pos_in_row = np.empty(nnz, dtype=np.int64)
    srt_rows = cn_inv[rows][order_by_row]
    row_starts = np.concatenate([[0], np.cumsum(np.sort(cn_deg))[:-1]])
    pos_in_row[order_by_row] = np.arange(nnz) - row_starts[srt_rows]

    cn_blocks = []
    base_e = 0
    base_n = 0
    cn_slot = np.empty(nnz, dtype=np.int64)
    for count, degree in sdc.cn_classes:
        cn_blocks.append((base_e, count, degree))
        sel = (cn_inv[rows] >= base_n) & (cn_inv[rows] < base_n + count)
        i_in_class = cn_inv[rows][sel] - base_n
        cn_slot[sel] = base_e + pos_in_row[sel] * count + i_in_class
        base_e += count * degree
        base_n += count

    # --- VN space, position-major ---
    order_by_col = np.argsort(vn_inv[cols], kind="stable")
    pos_in_col = np.empty(nnz, dtype=np.int64)
    srt_cols = vn_inv[cols][order_by_col]
    col_starts = np.concatenate([[0], np.cumsum(np.sort(vn_deg))[:-1]])
    pos_in_col[order_by_col] = np.arange(nnz) - col_starts[srt_cols]

    vn_blocks = []
    vn_node_base = []
    base_e = 0
    base_n = 0
    vn_slot = np.empty(nnz, dtype=np.int64)
    for count, degree in sdc.vn_classes:
        vn_blocks.append((base_e, count, degree))
        vn_node_base.append(base_n)
        sel = (vn_inv[cols] >= base_n) & (vn_inv[cols] < base_n + count)
        i_in_class = vn_inv[cols][sel] - base_n
        vn_slot[sel] = base_e + pos_in_col[sel] * count + i_in_class
        base_e += count * degree
        base_n += count

    # permutation: VN slot s receives the edge at CN slot perm[s]
    perm_c2v = np.empty(nnz, dtype=np.int64)
    perm_c2v[vn_slot] = cn_slot
    net = build_benes(perm_c2v)

    # block-matmul permutation plans (both directions); built only when
    # the permutation is block-local enough for the MXU to win
    full_perm = np.arange(net.n, dtype=np.int64)
    full_perm[:nnz] = perm_c2v
    # pad slots beyond nnz map identically only if they were not disturbed
    # by build_benes' internal padding (they are not: perm extends with
    # identity there)
    mxu_plan_fwd: tuple = ()
    mxu_plan_rev: tuple = ()
    mxu_blocks_fwd = mxu_blocks_rev = None
    if net.n >= 256 and net.n % 128 == 0:
        inv_perm = np.empty(net.n, dtype=np.int64)
        inv_perm[full_perm] = np.arange(net.n)
        plan_f, blocks_f = _block_permute_plan(full_perm)
        if blocks_f.shape[0] <= _MXU_MAX_PAIRS_PER_DST * (net.n // 128):
            plan_r, blocks_r = _block_permute_plan(inv_perm)
            mxu_plan_fwd, mxu_plan_rev = plan_f, plan_r
            mxu_blocks_fwd = jnp.asarray(blocks_f.astype(jnp.bfloat16))
            mxu_blocks_rev = jnp.asarray(blocks_r.astype(jnp.bfloat16))

    clos_p1 = clos_p3 = clos_mid_planes = None
    clos_mid_dists: tuple = ()
    if with_clos == "auto":
        with_clos = mxu_blocks_fwd is None
    if with_clos and net.n % clos_block == 0:
        from .clos import build_clos

        cnet = build_clos(full_perm, block=clos_block)
        clos_p1 = jnp.asarray(cnet.p1.astype(jnp.bfloat16))
        clos_p3 = jnp.asarray(cnet.p3.astype(jnp.bfloat16))
        clos_mid_planes = jnp.asarray(
            np.ascontiguousarray(cnet.mid_swap.T.astype(np.int32))
        )
        clos_mid_dists = tuple(int(d) for d in cnet.mid_dists)

    # sorted VN label per CN-space edge slot (-1 on pad slots): the XLA-side
    # gather map behind the streaming kernel's warm-up-free reload
    cn_edge_node = np.full(net.n, -1, dtype=np.int32)
    cn_edge_node[cn_slot] = vn_inv[cols].astype(np.int32)

    layer_planes = None
    if with_layers and code.layers:
        # per-layer membership of each CN-space position-major edge slot
        # (layered schedule capability, gpu/ldpc/ldpc.cpp:111-138); padded
        # slots belong to no layer
        row_layer = np.full(code.mc, -1, dtype=np.int64)
        for li, layer in enumerate(code.layers):
            row_layer[np.asarray(layer, dtype=np.int64)] = li
        planes = np.zeros((net.n, len(code.layers)), dtype=np.int32)
        slot_layer = row_layer[rows]  # per original edge
        valid = slot_layer >= 0
        planes[cn_slot[valid], slot_layer[valid]] = 1
        layer_planes = jnp.asarray(planes)

    return PallasDeviceCode(
        sorted_dc=sdc,
        n_pad=net.n,
        benes_dists=tuple(int(d) for d in net.dists),
        benes_active=tuple(bool(net.swap[s].any()) for s in range(len(net.dists))),
        cn_blocks=tuple(cn_blocks),
        vn_blocks=tuple(vn_blocks),
        vn_node_base=tuple(vn_node_base),
        # planes compressed to ACTIVE stages only (quiet stages are
        # skipped); int32 because sub-word vector compares are rejected by
        # Mosaic on some TPU targets
        swap_planes=jnp.asarray(
            np.ascontiguousarray(
                net.swap[[s for s in range(len(net.dists)) if net.swap[s].any()]]
                .T.astype(np.int32)
            )
        ),
        layer_planes=layer_planes,
        mxu_plan_fwd=mxu_plan_fwd,
        mxu_plan_rev=mxu_plan_rev,
        clos_mid_dists=clos_mid_dists,
        mxu_blocks_fwd=mxu_blocks_fwd,
        mxu_blocks_rev=mxu_blocks_rev,
        clos_p1=clos_p1,
        clos_p3=clos_p3,
        clos_mid_planes=clos_mid_planes,
        cn_edge_node=jnp.asarray(cn_edge_node),
    )
