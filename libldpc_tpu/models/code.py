"""The LDPC code model and its TPU-native edge layout.

The reference stores H as ``sparse_csr``: an edge list plus per-row/per-column
adjacency vectors of ``node{nodeIndex, edgeIndex}`` (``src/core/sparse.h:11-81``)
walked by pointer-chasing loops.  That representation cannot feed a vector
unit.  The TPU-native layout built here is the **padded CN-major edge space**
(descended from the GPU stack's flat ``mR/mC/mCN/mVN`` index arrays,
``gpu/ldpc/ldpc.h:56-66``, but padded to static shapes):

* Edges are sorted by check row (stable, preserving in-row file order so the
  decoder's forward/backward combine order matches the reference's
  ``row_neighbor`` order, ``src/core/sparse.h:133``).
* Row ``i`` owns the ``max_dc`` consecutive padded slots
  ``[i*max_dc, (i+1)*max_dc)``; unused slots are padding.
* Check-node message tensors live in this space, shape ``[E, batch]`` with
  ``E = mc * max_dc``: the CN update becomes a *reshape* to
  ``[mc, max_dc, batch]`` — no gather at all.
* The variable-node side keeps two static index tables: ``pad_col[E]`` (VN
  index per padded slot, ``nc`` for padding → a dummy VN) and
  ``vn_edges[nc, max_dv]`` (+ mask) for the per-VN sum.  Both drive static
  leading-axis gathers, which XLA lowers efficiently on TPU.

All metadata (degrees, puncture/shorten, ``bit_pos``) follows
``src/core/ldpc.{h,cpp}``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import numpy as np

from . import gf2, io


class EdgeLayout(NamedTuple):
    """Static (host, NumPy) index tables for the padded CN-major edge space."""

    pad_col: np.ndarray  # int32 [E]  VN index per padded edge slot (nc = dummy)
    pad_valid: np.ndarray  # bool [E]  True for real edges
    cn_mask: np.ndarray  # bool [mc, max_dc]
    vn_edges: np.ndarray  # int32 [nc, max_dv]  padded-slot index (E for padding)
    vn_mask: np.ndarray  # bool [nc, max_dv]
    edge_vslot: np.ndarray  # int32 [E]  padded slot -> index into the
    #                        flattened [nc*max_dv] VN-major space
    #                        (nc*max_dv sentinel for padding slots)
    edge_perm: np.ndarray  # int32 [nnz]  file-order edge -> padded slot
    cn_degree: np.ndarray  # int32 [mc]
    vn_degree: np.ndarray  # int32 [nc]


def _build_layout(
    rows: np.ndarray, cols: np.ndarray, nc: int, mc: int
) -> EdgeLayout:
    nnz = rows.size
    cn_degree = np.bincount(rows, minlength=mc).astype(np.int32)
    vn_degree = np.bincount(cols, minlength=nc).astype(np.int32)
    max_dc = int(cn_degree.max()) if nnz else 0
    max_dv = int(vn_degree.max()) if nnz else 0
    E = mc * max_dc

    # stable sort by row keeps in-row file order (reference row_neighbor order)
    order = np.argsort(rows, kind="stable")
    slot_in_row = np.zeros(nnz, dtype=np.int64)
    counts = np.zeros(mc, dtype=np.int64)
    sorted_rows = rows[order]
    # position within its row, in sorted order
    slot_in_row = np.arange(nnz) - np.concatenate(
        [[0], np.cumsum(cn_degree)[:-1]]
    )[sorted_rows]
    del counts
    pad_slot_sorted = sorted_rows.astype(np.int64) * max_dc + slot_in_row

    edge_perm = np.empty(nnz, dtype=np.int64)
    edge_perm[order] = pad_slot_sorted

    pad_col = np.full(E, nc, dtype=np.int32)
    pad_col[edge_perm] = cols
    pad_valid = np.zeros(E, dtype=bool)
    pad_valid[edge_perm] = True
    cn_mask = pad_valid.reshape(mc, max_dc)

    # per-VN list of padded slots, stable in file order (reference
    # col_neighbor order, src/core/sparse.h:132); padding entries point
    # out of bounds (E) so gathers clamp/mask and scatters drop them
    vn_edges = np.full((nc, max_dv), E, dtype=np.int64)
    vn_mask = np.zeros((nc, max_dv), dtype=bool)
    corder = np.argsort(cols, kind="stable")
    col_starts = np.concatenate([[0], np.cumsum(vn_degree)[:-1]])
    slot_in_col = np.arange(nnz) - col_starts[cols[corder]]
    vn_edges[cols[corder], slot_in_col] = edge_perm[corder]
    vn_mask[cols[corder], slot_in_col] = True

    # inverse: padded CN slot -> flattened VN-major slot
    edge_vslot = np.full(E, nc * max_dv, dtype=np.int64)
    edge_vslot[edge_perm[corder]] = cols[corder].astype(np.int64) * max_dv + slot_in_col

    return EdgeLayout(
        pad_col=pad_col,
        pad_valid=pad_valid,
        cn_mask=cn_mask,
        vn_edges=vn_edges.astype(np.int32),
        vn_mask=vn_mask,
        edge_vslot=edge_vslot.astype(np.int32),
        edge_perm=edge_perm.astype(np.int32),
        cn_degree=cn_degree,
        vn_degree=vn_degree,
    )


@dataclasses.dataclass
class LDPCCode:
    """An LDPC code: parity-check matrix H, optional generator G,
    puncture/shorten patterns and derived structure.

    Mirrors the surface of the reference's ``ldpc_code``
    (``src/core/ldpc.h:12-83``): ``nc/mc/kc/nnz``, transmitted sizes
    ``nct/mct/kct``, ``bit_pos``, ``max_degree``, plus the TPU edge layout.
    """

    rows: np.ndarray  # int32 [nnz] check index per edge, file order
    cols: np.ndarray  # int32 [nnz] variable index per edge, file order
    nc: int
    mc: int
    puncture: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32)
    )
    shorten: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32)
    )
    G: Optional[np.ndarray] = None  # dense uint8 [kc, nc]
    layers: Optional[list[np.ndarray]] = None  # CN index lists, layered sched
    #: quasi-cyclic structure, when known: ``(Z, base_matrix)`` with
    #: ``base_matrix[mb, nb]`` of shifts (-1 = zero block) — set by
    #: :func:`libldpc_tpu.models.construct.expand_qc`, consumed by the
    #: structure-aware ``"qc"`` lane-major transport
    #: (:func:`libldpc_tpu.ops.pallas.lanes_layout.to_lanes_device`)
    qc: Optional[tuple[int, np.ndarray]] = None

    # ---------------------------------------------------------------- loading

    @classmethod
    def from_files(
        cls,
        pc_file: str,
        gen_file: str = "",
        layer_file: str = "",
    ) -> "LDPCCode":
        """Load from the reference's codefile (+ optional G / layerfile)
        formats; see :mod:`libldpc_tpu.models.io`."""
        parsed = io.parse_codefile(pc_file)
        G = io.parse_genfile(gen_file, nc=parsed.nc) if gen_file else None
        layers = io.parse_layerfile(layer_file) if layer_file else None
        return cls(
            rows=parsed.rows,
            cols=parsed.cols,
            nc=parsed.nc,
            mc=parsed.mc,
            puncture=parsed.puncture,
            shorten=parsed.shorten,
            G=G,
            layers=layers,
        )

    @classmethod
    def from_alist(cls, path: str) -> "LDPCCode":
        """Load from MacKay alist format (see
        :func:`libldpc_tpu.models.io.parse_alist`)."""
        parsed = io.parse_alist(path)
        return cls(
            rows=parsed.rows, cols=parsed.cols, nc=parsed.nc, mc=parsed.mc
        )

    def save(self, path: str, headered: bool = True) -> None:
        """Write the parity-check matrix in the reference codefile format."""
        io.write_codefile(
            path, self.rows, self.cols, self.nc, self.mc,
            puncture=self.puncture, shorten=self.shorten, headered=headered,
        )

    def save_alist(self, path: str) -> None:
        io.write_alist(path, self.rows, self.cols, self.nc, self.mc)

    @classmethod
    def from_dense(cls, H: np.ndarray, **kwargs) -> "LDPCCode":
        H = np.asarray(H, dtype=np.uint8) & 1
        r, c = np.nonzero(H)
        return cls(
            rows=r.astype(np.int32), cols=c.astype(np.int32),
            nc=H.shape[1], mc=H.shape[0], **kwargs,
        )

    # ------------------------------------------------------------- dimensions

    @property
    def nnz(self) -> int:
        return int(self.rows.size)

    @property
    def kc(self) -> int:
        return self.nc - self.mc

    @property
    def nct(self) -> int:
        """Transmitted block length (``src/core/ldpc.h:52``)."""
        return self.nc - len(self.puncture) - len(self.shorten)

    @property
    def mct(self) -> int:
        return self.mc - len(self.puncture)

    @property
    def kct(self) -> int:
        return self.nct - self.mct

    @functools.cached_property
    def bit_pos(self) -> np.ndarray:
        """Indices of transmitted bits: all columns not punctured/shortened,
        ascending (``src/core/ldpc.cpp:89-100``)."""
        excluded = set(self.puncture.tolist()) | set(self.shorten.tolist())
        return np.array(
            [i for i in range(self.nc) if i not in excluded], dtype=np.int32
        )

    @functools.cached_property
    def layout(self) -> EdgeLayout:
        return _build_layout(self.rows, self.cols, self.nc, self.mc)

    @property
    def max_dc(self) -> int:
        return self.layout.cn_mask.shape[1]

    @property
    def max_dv(self) -> int:
        return self.layout.vn_mask.shape[1]

    @property
    def max_degree(self) -> int:
        """Max over CN and VN degrees (``src/core/ldpc.cpp:82-87``)."""
        return max(self.max_dc, self.max_dv)

    # ------------------------------------------------------ dense / GF(2) ops

    @functools.cached_property
    def H_dense(self) -> np.ndarray:
        H = np.zeros((self.mc, self.nc), dtype=np.uint8)
        H[self.rows, self.cols] ^= 1
        return H

    def rank(self) -> int:
        """GF(2) rank of H (reference: ``sparse_csr::rank``,
        ``src/core/sparse.h:229-294``)."""
        return gf2.rank(self.H_dense)

    def encode(self, info_word: np.ndarray) -> np.ndarray:
        """Encode ``u`` (length ``kc``) to the full codeword ``u @ G`` of
        length ``nc`` (``src/core/sparse.h:162-187``)."""
        if self.G is None:
            raise RuntimeError("No generator matrix provided for encoding")
        return gf2.vec_mat(info_word, self.G).astype(np.uint8)

    def syndrome(self, word: np.ndarray) -> np.ndarray:
        """``H @ v`` over GF(2), length ``mc`` (``src/shared.cpp:67-77``)."""
        return gf2.mat_vec(self.H_dense, word).astype(np.uint8)

    # ------------------------------------------------------------------ misc

    def layer_masks(self) -> np.ndarray:
        """Boolean ``[num_layers, mc]`` CN membership masks for the layered
        schedule; a single all-true layer when no layerfile was given
        (matching the GPU default, ``gpu/ldpc/ldpc.cpp:129-138``)."""
        if not self.layers:
            return np.ones((1, self.mc), dtype=bool)
        masks = np.zeros((len(self.layers), self.mc), dtype=bool)
        for i, layer in enumerate(self.layers):
            masks[i, layer] = True
        return masks

    @property
    def rate(self) -> float:
        """Rate of the transmitted code (``src/core/ldpc.cpp:115``)."""
        return 1.0 - self.mct / self.nct

    def summary(self) -> str:
        """Code summary in the reference's print format
        (``src/core/ldpc.cpp:112-130``)."""
        lines = [
            f"N : {self.nc}",
            f"M : {self.mc}",
            f"K : {self.kc}",
            f"NNZ : {self.nnz}",
            f"puncture[{len(self.puncture)}] : {list(self.puncture)}",
            f"shorten[{len(self.shorten)}] : {list(self.shorten)}",
            f"Rate : {self.rate:g}",
            f"N (transmitted) : {self.nct}",
            f"M (transmitted) : {self.mct}",
            f"K (transmitted) : {self.kct}",
        ]
        return "\n".join(lines)
