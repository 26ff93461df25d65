"""Lane-major code layout for the large-blocklength fused Pallas decoder.

The ``[edges, frames]`` kernel layout (:mod:`.layout`) keeps frames on the
128-lane axis and edges on sublanes.  That is ideal up to padded edge
spaces of ~16K, but beyond it two hard walls appear: Mosaic's compile time
scales with the number of ``(8, 128)`` vector tiles each op touches
(``n_pad * bt / 1024`` — pathological at ``n_pad = 32768``), and the
VMEM-resident message state (``n_pad * bt * 4`` bytes, twice over for the
roll double-buffer) exceeds on-chip memory.  The reference GPU kernels
have no such wall — their grid-stride loops decode any blocklength that
fits device memory (``gpu/device/kernel.cpp:237-293``).

This module flips the layout: **frames on sublanes, edges on lanes** —
messages are ``[frame_tile, n_pad]`` with ``frame_tile`` = 8 (one native
sublane tile).  Per-op tile count and VMEM residency both drop by
``128 / frame_tile = 16x``, so the fully-fused single-kernel design (all
iterations in VMEM, Benes-network edge transport, per-frame early
termination) extends to arbitrary blocklengths; batch throughput comes
from the Pallas grid over frame tiles instead of from the lane axis.

Two layout consequences:

* Benes exchanges run **along the lane axis** (``pltpu.roll(axis=1)``);
  switch planes are **bit-packed** into int32 words (stage ``s`` = bit
  ``s % 31`` of word ``s // 31``) so the whole network costs one
  ``[W, n_pad]`` VMEM ref instead of ``[n_pad, S]``.
* CN/VN degree-class blocks are sliced on the lane axis, where Mosaic
  wants 128-aligned static slices — so every degree class is padded with
  **fake nodes** up to a multiple of 128.  Fake edges are forced to
  :data:`~libldpc_tpu.ops.device.PAD_LLR` every iteration (one select
  against the packed real-edge mask plane), which makes fake checks
  trivially satisfied and keeps junk out of the syndrome; the
  CN-space <-> VN-space permutation maps fake slots only to fake slots,
  so they never contaminate real messages.

Node labellings are the sorted-by-degree labels of
:func:`libldpc_tpu.ops.sorted.to_sorted_device` (the embedded
``sorted_dc`` shares them); ``lane_of_vn`` / ``vn_of_lane`` convert
between sorted labels and padded lane positions at the wrapper boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...models.code import LDPCCode
from ..sorted import SortedDeviceCode, to_sorted_device
from .benes import build_benes

#: switch-plane bits packed per int32 word (bit 31 is left unused so the
#: unpack shift never touches the sign bit)
_BITS_PER_WORD = 31

#: Above this padded edge space the Clos one-hot selection planes are
#: stored int8 instead of bf16 (VMEM halving for the giant-edge-space
#: spill form; in-kernel casts of one-hot 0/1 entries are exact).
#: Matches decode_lanes.SPILL_FREE_LIMIT.
CLOS_PMAT_INT8_MIN = 65536


def _ceil128(x: int) -> int:
    return -(-x // 128) * 128


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LanesDeviceCode:
    """Device tables for the lane-major fused kernel.

    ``transport`` selects how the kernel realises the CN-space <-> VN-space
    edge permutation: ``"benes"`` ships the full Beneš network (switch
    planes over all exchange distances, VPU rolls), ``"clos"`` ships the
    three-stage Clos factorisation (:mod:`.clos`) — block-diagonal one-hot
    MXU matmuls around a block-granular middle network whose exchange
    distances are all multiples of 128 lanes (whole-tile moves).  The
    ``planes`` word-packing carries whichever stage set the transport
    uses; ``clos_p1``/``clos_p3`` are populated only for ``"clos"``.
    """

    sorted_dc: SortedDeviceCode
    # static
    n_pad: int  # power-of-two padded edge-space size (lane extent)
    nc_pad: int  # 128-aligned padded VN-node lane extent
    benes_dists: tuple[int, ...]  # ACTIVE stages only
    benes_words: tuple[tuple[int, int], ...]  # (word, bit) per active stage
    n_words: int  # switch-plane words (mask word excluded)
    cn_blocks: tuple[tuple[int, int, int], ...]  # (base, count_pad, degree)
    vn_blocks: tuple[tuple[int, int, int], ...]  # (base_edge, count_pad, deg)
    vn_node_base: tuple[int, ...]  # padded node-lane offset per VN class
    transport: str = "benes"
    #: (word, bit) per decoding layer — CN-space edge-membership planes for
    #: the layered schedule, bit-packed into ``planes`` words after the
    #: real-edge mask word (empty when built without layers); the layered
    #: analogue of the edge-major layout's ``layer_planes``
    layer_words: tuple[tuple[int, int], ...] = ()
    #: ``"qc"`` transport: circulant lifting size ``Z`` (any value) and
    #: the per-base-edge segments ``(vn_start, cn_start, shift)`` — the
    #: whole CN-space <-> VN-space permutation factors into one cyclic
    #: roll per base edge (no switching network, no matmuls).  Each
    #: circulant occupies ``qc_zq = ceil(Z/128)*128`` lanes: the first
    #: ``Z`` are real, the rest are fake (pinned to PAD).  When
    #: ``Z == qc_zq`` the roll is a single lane rotation; otherwise the
    #: embedded ``Z``-cyclic shift costs two static rolls + one
    #: iota-select per segment (see decode_lanes.qc_transport).
    qc_z: int = 0
    qc_zq: int = 0
    qc_segments: tuple[tuple[int, int, int], ...] = ()
    #: Fast layered engine metadata (round 5): one tuple per decoding
    #: layer (= base row, the natural QC schedule), each a tuple of
    #: ``(ac, col_node_lane, s)`` segments — the CN-space edge block, the
    #: node-lane base of the column circulant in the ``nc_pad`` space,
    #: and the circulant shift.  Present only when the layout was built
    #: ``with_layers`` on natural per-base-row layers where every column
    #: circulant is touched at most once per layer (single-diagonal
    #: cells); empty otherwise (the exact full-space layered kernel runs
    #: instead).  See decode_lanes.kernel_layered_qc.
    qc_layers: tuple = ()
    # arrays
    planes: jnp.ndarray = None  # int32 [n_words + 1, n_pad]; last word bit 0
    #                             is the real-edge (CN-space) mask
    lane_of_vn: jnp.ndarray = None  # int32 [nc] sorted VN label -> lane
    vn_of_lane: jnp.ndarray = None  # int32 [nc_pad] lane -> sorted label
    #                                 (arbitrary valid label on fake lanes)
    clos_p1: Optional[jnp.ndarray] = None  # one-hot [nb, 128, 128]; bf16,
    clos_p3: Optional[jnp.ndarray] = None  # int8 past the spill point
    #: int32 [n_pad] node lane feeding each CN-space edge slot (-1 on
    #: fake slots) — XLA-side gather map for the streaming kernel's
    #: warm-up-free ``fresh_lv2c`` reload
    cn_edge_node: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (
            self.sorted_dc, self.planes, self.lane_of_vn, self.vn_of_lane,
            self.clos_p1, self.clos_p3, self.cn_edge_node,
        ), (
            self.n_pad, self.nc_pad, self.benes_dists, self.benes_words,
            self.n_words, self.cn_blocks, self.vn_blocks, self.vn_node_base,
            self.transport, self.layer_words, self.qc_z, self.qc_zq,
            self.qc_segments, self.qc_layers,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (sorted_dc, planes, lane_of_vn, vn_of_lane, clos_p1,
         clos_p3, cn_edge_node) = children
        (n_pad, nc_pad, benes_dists, benes_words, n_words, cn_blocks,
         vn_blocks, vn_node_base, transport, layer_words, qc_z, qc_zq,
         qc_segments, qc_layers) = aux
        return cls(
            sorted_dc=sorted_dc, n_pad=n_pad, nc_pad=nc_pad,
            benes_dists=benes_dists, benes_words=benes_words,
            n_words=n_words, cn_blocks=cn_blocks, vn_blocks=vn_blocks,
            vn_node_base=vn_node_base, transport=transport,
            layer_words=layer_words, qc_z=qc_z, qc_zq=qc_zq,
            qc_segments=qc_segments, qc_layers=qc_layers,
            planes=planes,
            lane_of_vn=lane_of_vn, vn_of_lane=vn_of_lane,
            clos_p1=clos_p1, clos_p3=clos_p3, cn_edge_node=cn_edge_node,
        )

    # channel-facing delegation (same surface as PallasDeviceCode)
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


def _derive_qc_segments(code, Z, Zq, rows, cols, vn_slot, cn_slot,
                        cn_end, vn_end):
    """Factor the lane permutation of a quasi-cyclic code into per-base-edge
    cyclic rolls — for ANY lifting size ``Z``.

    For a circulant diagonal (base row ``r``, base col ``c``, shift
    ``s``), check ``r*Z + k`` connects to variable ``c*Z + (k+s) % Z``
    (the 802.11n/802.16e/5G-NR convention of
    :func:`...models.construct.expand_qc`).  The circulant-granular
    layout (see :func:`to_lanes_device`) places the ``Z`` lifts of each
    base node on the first ``Z`` lanes of a ``Zq = ceil(Z/128)*128``-lane
    block, so each diagonal's CN-space and VN-space slots are two
    ``Zq``-aligned segments related by an embedded ``Z``-cyclic roll of
    ``s``: VN slot ``Av + (k+s) % Z`` holds the edge at CN slot
    ``Ac + k``.  Grouping is by ``(base row, base col, diagonal)``, so a
    multi-diagonal base cell yields one segment per diagonal — provided
    the edge file order keeps each diagonal's lifts in a single
    position-block (single-diagonal cells in row/col-sorted order always
    do; wrapping multi-diagonal cells generally do not and raise).

    Returns ``((Av, Ac, s), ...)`` or raises ``ValueError`` when the
    structure does not hold in the layout."""
    nnz = rows.size
    if nnz % Z:
        raise ValueError(
            f"qc transport: nnz={nnz} is not a multiple of Z={Z}"
        )
    nb = code.nc // Z
    k_lift = rows % Z
    i_lift = cols % Z
    diag = (i_lift - k_lift) % Z
    # group by (base row, base col, diagonal): each group is one circulant
    be = ((rows // Z) * nb + (cols // Z)) * Z + diag
    order = np.argsort(be, kind="stable")
    be_sorted = be[order]
    bounds = np.flatnonzero(np.diff(be_sorted)) + 1
    groups = np.split(order, bounds)
    segments = []
    seg_rc = []  # (base row, base col) per segment, for qc_layers
    for grp in groups:
        if grp.size != Z:
            raise ValueError(
                "qc transport: a circulant diagonal has "
                f"{grp.size} edges, not Z={Z}"
            )
        k = k_lift[grp]
        i = i_lift[grp]
        # CN slots must be Ac + k for one Zq-aligned Ac (all lifts of the
        # diagonal in a single position block of the lane layout)
        ac_all = cn_slot[grp] - k
        av_all = vn_slot[grp] - i
        ac = int(ac_all[0])
        av = int(av_all[0])
        if (ac_all != ac).any() or (av_all != av).any():
            raise ValueError(
                "qc transport: a diagonal's lifts are not contiguous in "
                "the lane layout (file edge order splits the circulant "
                "across position blocks)"
            )
        if av % 128 or ac % 128:
            raise ValueError("qc transport: segment start not lane-aligned")
        s = int(diag[grp[0]])
        segments.append((av, ac, s))
        seg_rc.append((int(rows[grp[0]]) // Z, int(cols[grp[0]]) // Z))
    # both slot spaces must be tiled contiguously by the Zq-wide segment
    # blocks (the kernel reassembles the space by concatenating segment
    # outputs in output order — see decode_lanes.qc_transport)
    span = len(segments) * Zq
    if sorted(ac for _, ac, _ in segments) != list(range(0, span, Zq)):
        raise ValueError("qc transport: CN segments do not tile the space")
    if sorted(av for av, _, _ in segments) != list(range(0, span, Zq)):
        raise ValueError("qc transport: VN segments do not tile the space")
    if span != cn_end or span != vn_end:
        raise ValueError(
            f"qc transport: segment span {span} does not cover the slot "
            f"spaces (cn_end={cn_end}, vn_end={vn_end})"
        )
    return tuple(segments), tuple(seg_rc)


def _derive_qc_layers(code, Z, Zq, segments, seg_rc, lane_of_vn, vn_inv):
    """Per-layer segment metadata for the fast layered engine
    (decode_lanes.kernel_layered_qc): requires the NATURAL schedule (layer
    ``r`` = checks ``[r*Z, (r+1)*Z)``) and at most one segment per column
    circulant per layer (single-diagonal cells), so a layer's update
    touches each app block once.  Returns ``()`` when the structure does
    not hold — callers fall back to the exact full-space layered kernel.

    Each layer entry is ``(ac, col_node_lane, s)`` per segment, ordered
    by ``ac`` (the CN position order — matching the exclusion order of
    the XLA decoders on row/col-sorted edge files)."""
    mb = code.mc // Z
    if len(code.layers) != mb:
        return ()
    for r, layer in enumerate(code.layers):
        if not np.array_equal(
            np.sort(np.asarray(layer, dtype=np.int64)),
            np.arange(r * Z, (r + 1) * Z, dtype=np.int64),
        ):
            return ()  # not the natural per-base-row schedule
    # node-lane base of each base column's circulant (verify contiguity)
    nb_cols = code.nc // Z
    col_lane = np.empty(nb_cols, dtype=np.int64)
    for c in range(nb_cols):
        lanes = lane_of_vn[vn_inv[c * Z : (c + 1) * Z]]
        base = int(lanes[0])
        if base % 128 or not np.array_equal(
            lanes, base + np.arange(Z, dtype=lanes.dtype)
        ):
            return ()  # lifts not on one aligned block (layout mismatch)
        col_lane[c] = base
    layers: list = [[] for _ in range(mb)]
    for (av, ac, s), (r, c) in zip(segments, seg_rc):
        layers[r].append((ac, int(col_lane[c]), s))
    out = []
    for r, segs in enumerate(layers):
        if len({c for _, c, _ in segs}) != len(segs):
            return ()  # a column circulant touched twice in one layer
        out.append(tuple(sorted(segs)))
    return tuple(out)


def to_lanes_device(
    code: LDPCCode, transport: str = "benes", with_layers: bool = False,
) -> LanesDeviceCode:
    """Build the lane-major device layout.

    ``with_layers`` additionally bit-packs per-layer CN-edge membership
    planes (from the code's layerfile, GPU-stack capability
    ``gpu/ldpc/ldpc.cpp:111-138``) into ``planes`` for the layered
    schedule of :func:`.decode_lanes.bp_decode_lanes`.

    ``transport="qc"`` — structure-aware transport for quasi-cyclic codes
    (``code.qc`` set by ``expand_qc``/``detect_qc``, ANY lifting size
    ``Z``): every degree class is a whole number of circulant blocks laid
    out at circulant granularity — each circulant's ``Z`` lifts on the
    first ``Z`` lanes of a ``Zq = ceil(Z/128)*128``-lane block — so the
    CN-space <-> VN-space permutation factors into exactly one embedded
    ``Z``-cyclic roll per base edge: no switching network, no one-hot
    matmuls, and the edge space needs only 128-alignment (not the Beneš
    power of two).  When ``Z % 128 == 0`` there are no fake lanes and the
    roll is a single lane rotation (the round-4 form); otherwise
    ``Zq - Z`` fake lanes per circulant are pinned to PAD and the roll
    costs two rotations + one select.  Deployed standards need this:
    802.11n lifts Z ∈ {27, 54, 81}, 802.16e Z ∈ {24..96}, and 48 of
    5G-NR's 51 lifting sizes are not 128-multiples
    (``gpu/ldpc/ldpc.cpp:32-83`` — the reference decodes any loaded code
    at full speed).  Lane inflation ``Zq/Z`` is capped at 2 (beyond it
    the generic transports are the better trade — e.g. Z=27 would waste
    4.7x the lanes); raises ``ValueError`` when the code has no
    recoverable QC structure in the lane layout or the inflation exceeds
    the cap (callers fall back to ``benes``/``clos``)."""
    if transport not in ("benes", "clos", "qc"):
        raise ValueError(f"unknown transport {transport!r}")
    qc_meta = getattr(code, "qc", None)
    qc_z = qc_zq = 0
    if transport == "qc":
        if qc_meta is None:
            raise ValueError(
                "qc transport requires QC structure metadata on the code "
                "(LDPCCode.qc, set by models.construct.expand_qc)"
            )
        qc_z = int(qc_meta[0])
        qc_zq = _ceil128(qc_z)
        if qc_zq > 2 * qc_z:
            raise ValueError(
                f"qc transport lane inflation {qc_zq}/{qc_z} = "
                f"{qc_zq / qc_z:.2f}x exceeds the 2x cap (Z < 64 wastes "
                f"more than half of every circulant block); use the "
                f"benes/clos transports for small lifting sizes"
            )
    sdc = to_sorted_device(code)
    rows = code.rows.astype(np.int64)
    cols = code.cols.astype(np.int64)
    nnz = code.nnz

    # sorted relabelling recomputed in NumPy (deterministic, matches sdc —
    # see layout.py:to_pallas_device for why device pull-back is avoided)
    cn_deg = np.bincount(rows, minlength=code.mc)
    vn_deg = np.bincount(cols, minlength=code.nc)
    cn_inv = np.empty(code.mc, dtype=np.int64)
    cn_inv[np.argsort(cn_deg, kind="stable")] = np.arange(code.mc)
    vn_inv = np.empty(code.nc, dtype=np.int64)
    vn_inv[np.argsort(vn_deg, kind="stable")] = np.arange(code.nc)

    # position-in-row / position-in-col (file order within each node)
    order_by_row = np.argsort(cn_inv[rows], kind="stable")
    pos_in_row = np.empty(nnz, dtype=np.int64)
    srt_rows = cn_inv[rows][order_by_row]
    row_starts = np.concatenate([[0], np.cumsum(np.sort(cn_deg))[:-1]])
    pos_in_row[order_by_row] = np.arange(nnz) - row_starts[srt_rows]

    order_by_col = np.argsort(vn_inv[cols], kind="stable")
    pos_in_col = np.empty(nnz, dtype=np.int64)
    srt_cols = vn_inv[cols][order_by_col]
    col_starts = np.concatenate([[0], np.cumsum(np.sort(vn_deg))[:-1]])
    pos_in_col[order_by_col] = np.arange(nnz) - col_starts[srt_cols]

    def _class_lanes(count, i_in_class, where):
        """Padded lane count and per-node lane offset within one degree
        class.  Generic transports pad the whole class to 128; the qc
        transport pads at CIRCULANT granularity — lift ``k`` of the
        class's ``j``-th base node sits at lane ``j*Zq + k``, keeping
        every circulant's lifts on the first ``Z`` lanes of a Zq-aligned
        block (the structure _derive_qc_segments factors into rolls)."""
        if transport != "qc":
            return _ceil128(count), i_in_class
        if count % qc_z:
            raise ValueError(
                f"qc transport: a degree class has {count} {where} nodes "
                f"— not a whole number of Z={qc_z} lifts (H is not QC in "
                f"the lane layout)"
            )
        cp = (count // qc_z) * qc_zq
        return cp, (i_in_class // qc_z) * qc_zq + (i_in_class % qc_z)

    # --- CN space: position-major class blocks, counts padded to 128 ---
    cn_blocks = []
    base_e = 0
    base_n = 0
    cn_slot = np.empty(nnz, dtype=np.int64)
    cn_real = []  # (block_base, count_real, count_pad, degree)
    for count, degree in sdc.cn_classes:
        sel = (cn_inv[rows] >= base_n) & (cn_inv[rows] < base_n + count)
        i_in_class = cn_inv[rows][sel] - base_n
        cp, node_off = _class_lanes(count, i_in_class, "check")
        cn_blocks.append((base_e, cp, degree))
        cn_slot[sel] = base_e + pos_in_row[sel] * cp + node_off
        cn_real.append((base_e, count, cp, degree))
        base_e += cp * degree
        base_n += count
    cn_end = base_e

    # --- VN space ---
    vn_blocks = []
    vn_node_base = []
    base_e = 0
    base_n = 0
    base_lane = 0
    vn_slot = np.empty(nnz, dtype=np.int64)
    lane_of_vn = np.empty(code.nc, dtype=np.int32)
    for count, degree in sdc.vn_classes:
        sel = (vn_inv[cols] >= base_n) & (vn_inv[cols] < base_n + count)
        i_in_class = vn_inv[cols][sel] - base_n
        cp, node_off = _class_lanes(count, i_in_class, "variable")
        vn_blocks.append((base_e, cp, degree))
        vn_node_base.append(base_lane)
        vn_slot[sel] = base_e + pos_in_col[sel] * cp + node_off
        node_ids = np.arange(count)
        _, node_lane = _class_lanes(count, node_ids, "variable")
        lane_of_vn[base_n : base_n + count] = base_lane + node_lane
        base_e += cp * degree
        base_n += count
        base_lane += cp
    vn_end = base_e
    nc_pad = base_lane

    vn_of_lane = np.zeros(nc_pad, dtype=np.int32)
    vn_of_lane[lane_of_vn] = np.arange(code.nc, dtype=np.int32)

    # --- permutation over the common padded edge space -----------------
    # qc: 128-aligned only (no network, so no Beneš power-of-two need)
    n0 = max(cn_end, vn_end, 2)
    if transport == "qc":
        N = _ceil128(n0)
    else:
        N = 1 << int(np.ceil(np.log2(n0)))
    perm = np.full(N, -1, dtype=np.int64)
    perm[vn_slot] = cn_slot  # VN slot s receives the edge at CN slot perm[s]
    # pair the remaining (fake/free) slots in order: fake VN slots receive
    # fake CN slots only, so junk never crosses into real messages
    cn_used = np.zeros(N, dtype=bool)
    cn_used[cn_slot] = True
    free_cn = np.flatnonzero(~cn_used)
    free_vn = np.flatnonzero(perm < 0)
    assert free_cn.size == free_vn.size == N - nnz
    perm[free_vn] = free_cn

    clos_p1 = clos_p3 = None
    qc_segments: tuple = ()
    qc_layers: tuple = ()
    if transport == "qc":
        qc_segments, seg_rc = _derive_qc_segments(
            code, qc_z, qc_zq, rows, cols, vn_slot, cn_slot,
            cn_end, vn_end,
        )
        if with_layers and code.layers:
            qc_layers = _derive_qc_layers(
                code, qc_z, qc_zq, qc_segments, seg_rc,
                lane_of_vn, vn_inv,
            )
        stage_dists: list[int] = []
        stage_swap = np.zeros((0, N), dtype=bool)
    elif transport == "clos":
        from .clos import build_clos

        cnet = build_clos(perm)
        stage_dists = [int(d) for d in cnet.mid_dists]
        stage_swap = cnet.mid_swap
        # one-hot selection matrices: bf16 below the spill point (kernel
        # casts are no-ops for the default bf16 messages), int8 above it
        # — at n_pad = 131072 the bf16 planes alone are 2 x 33.5M of the
        # 128M VMEM, and the in-kernel astype from int8 is exact for
        # one-hot 0/1 entries (see decode_lanes.SPILL_FREE_LIMIT)
        pm_dtype = jnp.int8 if N > CLOS_PMAT_INT8_MIN else jnp.bfloat16
        clos_p1 = jnp.asarray(cnet.p1.astype(pm_dtype))
        clos_p3 = jnp.asarray(cnet.p3.astype(pm_dtype))
    else:
        net = build_benes(perm)
        assert net.n == N
        stage_dists = [int(d) for d in net.dists]
        stage_swap = net.swap

    # --- bit-pack ACTIVE switch planes + the real-edge mask ---
    active = [s for s in range(len(stage_dists)) if stage_swap[s].any()]
    n_words = -(-len(active) // _BITS_PER_WORD) if active else 1
    planes = np.zeros((n_words + 1, N), dtype=np.int64)
    benes_dists = []
    benes_words = []
    for k, s in enumerate(active):
        w, b = k // _BITS_PER_WORD, k % _BITS_PER_WORD
        planes[w] |= stage_swap[s].astype(np.int64) << b
        benes_dists.append(stage_dists[s])
        benes_words.append((w, b))
    planes[n_words][cn_slot] = 1  # real-edge mask, CN space

    # --- per-layer CN-edge membership planes (layered schedule) ---------
    # Layer ``li`` lives at bit ``li % 31`` of word ``n_words + 1 + li//31``.
    # Membership is set on REAL edge lanes only; fake check lanes never
    # refresh and instead hold PAD_LLR state from the kernel's lc2v init,
    # keeping fake checks trivially satisfied (see decode_lanes).
    layer_words: list[tuple[int, int]] = []
    if with_layers and code.layers and len(code.layers) > 1:
        nl = len(code.layers)
        lw_count = -(-nl // _BITS_PER_WORD)
        lplanes = np.zeros((lw_count, N), dtype=np.int64)
        for li, layer in enumerate(code.layers):
            in_layer = np.zeros(code.mc, dtype=bool)
            in_layer[np.asarray(layer, dtype=np.int64)] = True
            w, b = li // _BITS_PER_WORD, li % _BITS_PER_WORD
            member = cn_slot[in_layer[rows]]
            lplanes[w][member] |= 1 << b
            layer_words.append((n_words + 1 + w, b))
        planes = np.concatenate([planes, lplanes], axis=0)
    planes = planes.astype(np.int32)

    # node lane per CN-space edge slot (-1 on fake slots): the XLA-side
    # gather map behind the streaming kernel's warm-up-free reload
    cn_edge_node = np.full(N, -1, dtype=np.int32)
    cn_edge_node[cn_slot] = lane_of_vn[vn_inv[cols]]

    return LanesDeviceCode(
        sorted_dc=sdc,
        n_pad=N,
        nc_pad=nc_pad,
        benes_dists=tuple(benes_dists),
        benes_words=tuple(benes_words),
        n_words=n_words,
        cn_blocks=tuple(cn_blocks),
        vn_blocks=tuple(vn_blocks),
        vn_node_base=tuple(vn_node_base),
        transport=transport,
        layer_words=tuple(layer_words),
        qc_z=qc_z,
        qc_zq=qc_zq,
        qc_segments=qc_segments,
        qc_layers=qc_layers,
        planes=jnp.asarray(planes),
        lane_of_vn=jnp.asarray(lane_of_vn),
        vn_of_lane=jnp.asarray(vn_of_lane),
        clos_p1=clos_p1,
        clos_p3=clos_p3,
        cn_edge_node=jnp.asarray(cn_edge_node),
    )
