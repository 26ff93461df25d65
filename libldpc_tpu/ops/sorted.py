"""Degree-class-sorted edge layout and the optimized BP decoder over it.

The padded CN-major layout (:mod:`libldpc_tpu.models.code`) is simple and
reference-faithful, but pays for irregularity with padding: the bundled code
has VN degrees {1, 2, 15}, so its ``[nc, max_dv]`` gather moves ~5× more
bytes than the real edges.  This module removes **all** padding by sorting
nodes into degree classes:

* check nodes are relabelled so equal-degree CNs are contiguous; the CN-major
  edge space is then a concatenation of dense ``[count_c, degree_c]`` blocks
  — the CN update is a per-class reshape + exclusion combine with no masks;
* variable nodes are relabelled the same way; a VN-major edge space (also
  exactly ``nnz`` slots) makes the VN sum a per-class reshape + sum;
* one static permutation ``perm_c2v`` maps CN-edge-space → VN-edge-space, and
  one static index vector ``col_sorted`` maps edges → (sorted) VN labels.

Every per-node tensor (LLRs, codewords, ``bit_pos``, G's columns) lives in
the *sorted VN labelling*, so channels and error counting work unchanged;
``vn_perm``/``vn_inv`` convert at the API boundary.

Decoding semantics are identical to :mod:`libldpc_tpu.ops.decoder` (and to
the reference ``src/decoding/decoder.cpp:11-78``): in-row file order is
preserved within each class block, so the forward/backward exclusion
combines associate in the same order.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.code import LDPCCode
from . import cn_ops


def _degree_classes(degrees: np.ndarray) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """Stable-sort node labels by degree.

    Returns ``(perm, classes)`` where ``perm[new_label] = old_label`` and
    ``classes`` is a list of ``(count, degree)`` in sorted order.
    """
    perm = np.argsort(degrees, kind="stable").astype(np.int32)
    classes: list[tuple[int, int]] = []
    for d in np.unique(degrees[perm]):
        classes.append((int((degrees == d).sum()), int(d)))
    return perm, classes


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SortedDeviceCode:
    """Device tables for the degree-class-sorted layout.

    Array fields are pytree children; the class structure and dimensions are
    static aux data (hashable, participates in jit cache keys).
    """

    # --- static structure ---
    nc: int
    mc: int
    nnz: int
    cn_classes: tuple[tuple[int, int], ...]  # (count, degree) blocks, CN space
    vn_classes: tuple[tuple[int, int], ...]  # (count, degree) blocks, VN space

    # --- device arrays ---
    col_sorted: jnp.ndarray  # int32 [nnz] sorted-VN label per CN-space slot
    perm_c2v: jnp.ndarray  # int32 [nnz] CN-space slot per VN-space slot
    bit_pos: jnp.ndarray  # int32 [nct] sorted-VN labels of transmitted bits
    puncture: jnp.ndarray  # int32 [P] sorted labels
    shorten: jnp.ndarray  # int32 [S] sorted labels
    vn_perm: jnp.ndarray  # int32 [nc] sorted label -> original label
    vn_inv: jnp.ndarray  # int32 [nc] original label -> sorted label
    G: Optional[jnp.ndarray]  # f32 [kc, nc] generator, columns sorted
    #: bool [nl, nnz] per-layer CN-edge membership for the layered schedule
    #: (None when the code has no layers / layers not requested)
    layer_edge_masks: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        children = (
            self.col_sorted,
            self.perm_c2v,
            self.bit_pos,
            self.puncture,
            self.shorten,
            self.vn_perm,
            self.vn_inv,
            self.G,
            self.layer_edge_masks,
        )
        aux = (self.nc, self.mc, self.nnz, self.cn_classes, self.vn_classes)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        nc, mc, nnz, cn_classes, vn_classes = aux
        (col_sorted, perm_c2v, bit_pos, puncture, shorten, vn_perm, vn_inv, G,
         layer_edge_masks) = children
        return cls(
            nc=nc, mc=mc, nnz=nnz, cn_classes=cn_classes, vn_classes=vn_classes,
            col_sorted=col_sorted, perm_c2v=perm_c2v, bit_pos=bit_pos,
            puncture=puncture, shorten=shorten, vn_perm=vn_perm, vn_inv=vn_inv,
            G=G, layer_edge_masks=layer_edge_masks,
        )

    @property
    def nct(self) -> int:
        return self.bit_pos.shape[0]

    @property
    def kc(self) -> int:
        if self.G is None:
            raise RuntimeError("code has no generator matrix")
        return self.G.shape[0]


def sorted_vn_inv(code: LDPCCode) -> np.ndarray:
    """The sorted-layout VN relabelling (original label -> sorted label) as a
    host array — for relabelling host-side per-bit tables (e.g. modulation
    bit mappers) without pulling device arrays back."""
    vn_deg = np.bincount(code.cols.astype(np.int64), minlength=code.nc)
    vn_inv = np.empty(code.nc, dtype=np.int64)
    vn_inv[np.argsort(vn_deg, kind="stable")] = np.arange(code.nc)
    return vn_inv


def to_sorted_device(code: LDPCCode, with_layers: bool = False) -> SortedDeviceCode:
    """Build the sorted-layout device tables from a host code.

    ``with_layers`` additionally builds per-layer CN-edge masks from the
    code's layerfile for the layered schedule (GPU stack capability,
    ``gpu/ldpc/ldpc.cpp:111-138``)."""
    rows = code.rows.astype(np.int64)
    cols = code.cols.astype(np.int64)
    nc, mc, nnz = code.nc, code.mc, code.nnz

    cn_deg = np.bincount(rows, minlength=mc)
    vn_deg = np.bincount(cols, minlength=nc)
    cn_perm, cn_classes = _degree_classes(cn_deg)  # new -> old
    vn_perm, vn_classes = _degree_classes(vn_deg)
    cn_inv = np.empty(mc, dtype=np.int64)
    cn_inv[cn_perm] = np.arange(mc)
    vn_inv = np.empty(nc, dtype=np.int64)
    vn_inv[vn_perm] = np.arange(nc)

    # CN-major edge order: sort edges by (sorted CN label, file order).
    # Stable sort keeps in-row file order (reference row_neighbor order).
    order_c = np.argsort(cn_inv[rows], kind="stable")
    col_sorted = vn_inv[cols[order_c]]  # [nnz] sorted-VN label per slot

    # VN-major edge order: sort edges by (sorted VN label, file order); for
    # each VN-space slot, find its CN-space slot.
    cn_slot_of_edge = np.empty(nnz, dtype=np.int64)
    cn_slot_of_edge[order_c] = np.arange(nnz)
    order_v = np.argsort(vn_inv[cols], kind="stable")
    perm_c2v = cn_slot_of_edge[order_v]

    # convert on the host before uploading: device-side dtype conversion
    # dispatches tiny remote compiles on tunneled backends
    def dev(x, dtype):
        return jnp.asarray(np.ascontiguousarray(np.asarray(x, dtype=dtype)))

    layer_edge_masks = None
    if with_layers and code.layers:
        # per-edge sorted row label: class blocks are contiguous rows
        slot_row = np.repeat(
            np.arange(mc), np.sort(cn_deg)
        )  # [nnz] sorted row per CN-space slot
        masks = np.zeros((len(code.layers), nnz), dtype=bool)
        for li, layer in enumerate(code.layers):
            in_layer = np.zeros(mc, dtype=bool)
            in_layer[cn_inv[np.asarray(layer, dtype=np.int64)]] = True
            masks[li] = in_layer[slot_row]
        layer_edge_masks = jnp.asarray(masks)

    return SortedDeviceCode(
        nc=nc,
        mc=mc,
        nnz=nnz,
        cn_classes=tuple(cn_classes),
        vn_classes=tuple(vn_classes),
        col_sorted=dev(col_sorted, np.int32),
        perm_c2v=dev(perm_c2v, np.int32),
        bit_pos=dev(vn_inv[code.bit_pos], np.int32),
        puncture=dev(vn_inv[code.puncture] if len(code.puncture) else [], np.int32),
        shorten=dev(vn_inv[code.shorten] if len(code.shorten) else [], np.int32),
        vn_perm=dev(vn_perm, np.int32),
        vn_inv=dev(vn_inv, np.int32),
        G=None if code.G is None else dev(code.G[:, vn_perm], np.float32),
        layer_edge_masks=layer_edge_masks,
    )


# --------------------------------------------------------------------------
# class-blocked primitives
# --------------------------------------------------------------------------


def _class_slices(classes: Sequence[tuple[int, int]]):
    """Yield ``(edge_start, edge_stop, count, degree)`` per class block."""
    e = 0
    for count, degree in classes:
        yield e, e + count * degree, count, degree
        e += count * degree


def cn_update_sorted(
    sdc: SortedDeviceCode, lv2c: jnp.ndarray, minsum_mode: bool
) -> jnp.ndarray:
    """CN exclusion update, per degree class (no padding, no masks)."""
    tanh = cn_ops.is_tanh_mode(minsum_mode)
    phi = cn_ops.is_phi_mode(minsum_mode)
    op = None if (tanh or phi) else cn_ops.get_op(minsum_mode)
    B = lv2c.shape[1]
    parts = []
    for e0, e1, count, degree in _class_slices(sdc.cn_classes):
        if degree == 0:
            continue
        M = jax.lax.slice_in_dim(lv2c, e0, e1, axis=0).reshape(count, degree, B)
        if tanh:
            excl = cn_ops.exclusion_combine_tanh(M)
        elif phi:
            excl = cn_ops.exclusion_combine_phi(M)
        else:
            excl = cn_ops.exclusion_combine(M, op)
        parts.append(excl.reshape(count * degree, B))
    out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return cn_ops.cn_postprocess(out, minsum_mode)


def vn_sum_sorted(sdc: SortedDeviceCode, lc2v_vnspace: jnp.ndarray) -> jnp.ndarray:
    """Per-VN message sums ``[nc, B]`` from VN-space messages ``[nnz, B]``."""
    B = lc2v_vnspace.shape[1]
    parts = []
    for e0, e1, count, degree in _class_slices(sdc.vn_classes):
        if degree == 0:
            parts.append(jnp.zeros((count, B), dtype=lc2v_vnspace.dtype))
            continue
        M = jax.lax.slice_in_dim(lc2v_vnspace, e0, e1, axis=0)
        parts.append(M.reshape(count, degree, B).sum(axis=1))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def syndrome_ok_sorted(sdc: SortedDeviceCode, hard: jnp.ndarray) -> jnp.ndarray:
    """Per-frame codeword check from sorted-space hard decisions [nc, B]."""
    bits = jnp.take(hard.astype(jnp.int32), sdc.col_sorted, axis=0)  # [nnz, B]
    oks = []
    for e0, e1, count, degree in _class_slices(sdc.cn_classes):
        if degree == 0:
            continue
        B = bits.shape[1]
        blk = jax.lax.slice_in_dim(bits, e0, e1, axis=0).reshape(count, degree, B)
        oks.append((blk.sum(axis=1) % 2).any(axis=0))
    bad = oks[0]
    for o in oks[1:]:
        bad = bad | o
    return ~bad


def syndrome_ok_from_posterior(
    sdc: SortedDeviceCode, g: jnp.ndarray
) -> jnp.ndarray:
    """Per-frame codeword check from the posterior LLRs *gathered at the
    CN-space edge slots* (``g = take(llr_out, col_sorted)``).

    ``sign(g)`` at an edge is the hard decision of that edge's variable,
    so the parity of ``signbit(g)`` per check row is the syndrome — no
    second gather needed when ``g`` is already in hand for the extrinsic
    update (``lv2c = g - lc2v``).  Equivalent to
    :func:`syndrome_ok_sorted` on ``hard = llr_out <= 0`` because the
    reference's decision rule is exactly ``LLROut <= 0``
    (``src/decoding/decoder.cpp:58``) and ``signbit`` differs only at
    ``llr == 0``, where the decision is 1 and ``signbit`` is False —
    handled by using ``g <= 0`` below.
    """
    # int8 accumulation: the check is memory-bound, and the [nnz, B] bit
    # plane in int8 moves 4x less data than int32 (max check degree < 128
    # so the parity sums are exact)
    bits = (g <= 0).astype(jnp.int8)  # [nnz, B]
    bad = None
    for e0, e1, count, degree in _class_slices(sdc.cn_classes):
        if degree == 0:
            continue
        B = bits.shape[1]
        blk = jax.lax.slice_in_dim(bits, e0, e1, axis=0).reshape(count, degree, B)
        o = ((blk.sum(axis=1, dtype=jnp.int8) & 1) > 0).any(axis=0)
        bad = o if bad is None else (bad | o)
    return ~bad


class SortedDecodeOutput(NamedTuple):
    llr_out: jnp.ndarray  # f32 [nc, B] (sorted VN labelling)
    hard: jnp.ndarray  # bool [nc, B]
    iterations: jnp.ndarray  # int32 [B]
    is_codeword: jnp.ndarray  # bool [B]


def bp_decode_sorted(
    sdc: SortedDeviceCode,
    llr_in: jnp.ndarray,  # f32 [nc, B], sorted VN labelling
    iterations: int = 50,
    early_term: bool = True,
    minsum_mode: bool = False,
    layered: bool = False,
) -> SortedDecodeOutput:
    """Flooding (or layered) BP over the sorted layout; same semantics as
    :func:`libldpc_tpu.ops.decoder.bp_decode` (iteration counting,
    freezing, early termination)."""
    if (
        layered
        and sdc.layer_edge_masks is not None
        and sdc.layer_edge_masks.shape[0] > 1
    ):
        return _bp_decode_sorted_layered(
            sdc, llr_in, iterations, early_term, minsum_mode
        )
    B = llr_in.shape[1]

    if not early_term and iterations > 0:
        # fixed-work fast path: no masks, no syndrome, no loop-exit checks
        def body_fixed(_, carry):
            lv2c = carry
            lc2v = cn_update_sorted(sdc, lv2c, minsum_mode)
            lc2v_v = jnp.take(lc2v, sdc.perm_c2v, axis=0)
            llr_out = llr_in + vn_sum_sorted(sdc, lc2v_v)
            return (jnp.take(llr_out, sdc.col_sorted, axis=0) - lc2v,
                    llr_out)

        lv2c = jnp.take(llr_in, sdc.col_sorted, axis=0)
        lv2c, llr_out = jax.lax.fori_loop(
            0, iterations, lambda i, c: body_fixed(i, c[0]),
            (lv2c, jnp.zeros_like(llr_in)),
        )
        hard = llr_out <= 0
        return SortedDecodeOutput(
            llr_out=llr_out,
            hard=hard,
            iterations=jnp.full((B,), iterations, jnp.int32),
            is_codeword=syndrome_ok_sorted(sdc, hard),
        )

    state = dict(
        i=jnp.int32(0),
        lv2c=jnp.take(llr_in, sdc.col_sorted, axis=0),
        llr_out=jnp.zeros_like(llr_in),
        hard=jnp.zeros(llr_in.shape, dtype=bool),
        done=jnp.zeros((B,), dtype=bool),
        iters=jnp.zeros((B,), dtype=jnp.int32),
    )

    def cond(s):
        return (s["i"] < iterations) & ~jnp.all(s["done"])

    def body(s):
        lc2v = cn_update_sorted(sdc, s["lv2c"], minsum_mode)
        lc2v_v = jnp.take(lc2v, sdc.perm_c2v, axis=0)
        llr_out = llr_in + vn_sum_sorted(sdc, lc2v_v)
        hard = llr_out <= 0
        lv2c = jnp.take(llr_out, sdc.col_sorted, axis=0) - lc2v
        if early_term:
            finished_now = ~s["done"] & syndrome_ok_sorted(sdc, hard)
        else:
            finished_now = jnp.zeros_like(s["done"])
        active = ~s["done"]
        keep = s["done"][None, :]
        return dict(
            i=s["i"] + 1,
            lv2c=jnp.where(keep, s["lv2c"], lv2c),
            llr_out=jnp.where(keep, s["llr_out"], llr_out),
            hard=jnp.where(keep, s["hard"], hard),
            done=s["done"] | finished_now,
            iters=s["iters"] + (active & ~finished_now).astype(jnp.int32),
        )

    if iterations > 0:
        state = jax.lax.while_loop(cond, body, state)
    return SortedDecodeOutput(
        llr_out=state["llr_out"],
        hard=state["hard"],
        iterations=state["iters"],
        is_codeword=syndrome_ok_sorted(sdc, state["hard"]),
    )


def _bp_decode_sorted_layered(sdc, llr_in, iterations, early_term, minsum_mode):
    """Layered (serial) schedule over the sorted layout, mirroring the GPU
    stack's per-layer CN update + APP recompute sequence
    (``gpu/device/kernel.cpp:54-74``) and the padded-layout implementation
    (:func:`libldpc_tpu.ops.decoder._bp_decode_layered`)."""
    B = llr_in.shape[1]
    layer_edges = sdc.layer_edge_masks  # bool [nl, nnz]
    nl = layer_edges.shape[0]

    state = dict(
        i=jnp.int32(0),
        lv2c=jnp.take(llr_in, sdc.col_sorted, axis=0),
        lc2v=jnp.zeros((sdc.nnz, B), dtype=llr_in.dtype),
        llr_out=jnp.zeros_like(llr_in),
        hard=jnp.zeros(llr_in.shape, dtype=bool),
        done=jnp.zeros((B,), dtype=bool),
        iters=jnp.zeros((B,), dtype=jnp.int32),
    )

    def cond(s):
        return (s["i"] < iterations) & ~jnp.all(s["done"])

    def body(s):
        lv2c, lc2v = s["lv2c"], s["lc2v"]
        llr_out, hard = s["llr_out"], s["hard"]
        done = s["done"]
        for l in range(nl):
            lc2v_new = cn_update_sorted(sdc, lv2c, minsum_mode)
            lc2v_l = jnp.where(layer_edges[l][:, None], lc2v_new, lc2v)
            lc2v_v = jnp.take(lc2v_l, sdc.perm_c2v, axis=0)
            llr_out_l = llr_in + vn_sum_sorted(sdc, lc2v_v)
            hard_l = llr_out_l <= 0
            lv2c_l = jnp.take(llr_out_l, sdc.col_sorted, axis=0) - lc2v_l
            if early_term:
                finished_now = ~done & syndrome_ok_sorted(sdc, hard_l)
            else:
                finished_now = jnp.zeros_like(done)
            keep = done[None, :]
            lv2c = jnp.where(keep, lv2c, lv2c_l)
            lc2v = jnp.where(keep, lc2v, lc2v_l)
            llr_out = jnp.where(keep, llr_out, llr_out_l)
            hard = jnp.where(keep, hard, hard_l)
            done = done | finished_now
        active = ~s["done"]
        return dict(
            i=s["i"] + 1,
            lv2c=lv2c,
            lc2v=lc2v,
            llr_out=llr_out,
            hard=hard,
            done=done,
            iters=s["iters"] + (active & ~done).astype(jnp.int32),
        )

    if iterations > 0:
        state = jax.lax.while_loop(cond, body, state)
    return SortedDecodeOutput(
        llr_out=state["llr_out"],
        hard=state["hard"],
        iterations=state["iters"],
        is_codeword=syndrome_ok_sorted(sdc, state["hard"]),
    )
