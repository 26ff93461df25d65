"""BEC decoder over the degree-class-sorted layout.

Same semantics as :mod:`libldpc_tpu.ops.bec` (including the reference-exact
iteration counting and the optional degree-1 stale-byte compat mode) but over
the padding-free sorted layout: the bundled code's ``max_dv = 15`` makes the
padded VN gather move ~5× the real edges, which this path avoids entirely.
Used automatically by the sweep driver for BEC channels.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .bec import BECDecodeOutput
from .channel import BEC_ERASURE
from .sorted import SortedDeviceCode, _class_slices


def _cn_op(l, r):
    erased = (l == BEC_ERASURE) | (r == BEC_ERASURE)
    return jnp.where(erased, BEC_ERASURE, jnp.bitwise_xor(l, r))


def _exclusion_and_total(M, op):
    """fwd/bwd all-but-one combine + total along axis 1 of [n, d, B]."""
    d = M.shape[1]
    if d == 1:
        return jnp.full_like(M, BEC_ERASURE), M[:, 0]
    fwd = [M[:, 0]]
    bwd = [M[:, d - 1]]
    for j in range(1, d):
        fwd.append(op(fwd[-1], M[:, j]))
        bwd.append(op(bwd[-1], M[:, d - 1 - j]))
    out = [bwd[d - 2]]
    for j in range(1, d - 1):
        out.append(op(fwd[j - 1], bwd[d - 2 - j]))
    out.append(fwd[d - 2])
    return jnp.stack(out, axis=1), fwd[d - 1]


def bec_decode_sorted(
    sdc: SortedDeviceCode,
    symbols_in: jnp.ndarray,  # int8 [nc, B], sorted VN labelling
    codeword: jnp.ndarray,  # uint8 [nc, B], sorted VN labelling
    iterations: int = 50,
    early_term: bool = True,
    degree1_stale_byte: Optional[int] = None,
) -> BECDecodeOutput:
    B = symbols_in.shape[1]
    xi = codeword.astype(jnp.int8)
    known = symbols_in != BEC_ERASURE
    inv_perm = jnp.argsort(sdc.perm_c2v)  # CN slot -> VN slot

    def cn_update(lv2c_c):
        parts = []
        for e0, e1, count, d in _class_slices(sdc.cn_classes):
            if d == 0:
                continue
            M = jax.lax.slice_in_dim(lv2c_c, e0, e1, axis=0).reshape(
                count, d, B
            )
            excl, _ = _exclusion_and_total(M, _cn_op)
            # degree-1 check: empty exclusion = XOR identity 0, i.e. the
            # check pins its only variable to 0 (valid parity logic)
            if d == 1:
                excl = jnp.zeros_like(M)
            parts.append(excl.reshape(count * d, B))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def vn_update(lc2v_v):
        lv2c_parts = []
        sym_parts = []
        node = 0
        for e0, e1, count, d in _class_slices(sdc.vn_classes):
            if d == 0:
                sym_parts.append(
                    jnp.full((count, B), BEC_ERASURE, dtype=jnp.int8)
                )
                continue
            M = jax.lax.slice_in_dim(lc2v_v, e0, e1, axis=0).reshape(
                count, d, B
            )
            xi_blk = jax.lax.slice_in_dim(xi, node, node + count, axis=0)
            known_blk = jax.lax.slice_in_dim(known, node, node + count, axis=0)

            def vn_op(l, r):
                reveal = (l == xi_blk) | (r == xi_blk)
                return jnp.where(reveal, xi_blk, BEC_ERASURE)

            excl, total = _exclusion_and_total(M, vn_op)
            if d == 1:
                # posterior of a degree-1 VN is its single raw message
                # (decoder.cpp:147,163); its outgoing message carries no
                # extrinsic info — ERASURE, or the reference's stale byte
                total = M[:, 0]
                if degree1_stale_byte is not None:
                    excl = jnp.full_like(excl, jnp.int8(degree1_stale_byte))
            elif degree1_stale_byte is not None:
                pass  # stale byte only affects degree-1 VNs
            lv2c_blk = jnp.where(known_blk[:, None, :], xi_blk[:, None, :], excl)
            sym_blk = jnp.where(known_blk, xi_blk, total)
            lv2c_parts.append(lv2c_blk.reshape(count * d, B))
            sym_parts.append(sym_blk)
            node += count
        lv2c_v = (
            jnp.concatenate(lv2c_parts, axis=0)
            if len(lv2c_parts) > 1
            else lv2c_parts[0]
        )
        sym_out = (
            jnp.concatenate(sym_parts, axis=0)
            if len(sym_parts) > 1
            else sym_parts[0]
        )
        return lv2c_v, sym_out

    state = dict(
        i=jnp.int32(0),
        lv2c=jnp.take(symbols_in, sdc.col_sorted, axis=0),
        sym_out=jnp.full((sdc.nc, B), BEC_ERASURE, dtype=jnp.int8),
        done=jnp.zeros((B,), dtype=bool),
        iters=jnp.zeros((B,), dtype=jnp.int32),
    )

    def cond(s):
        return (s["i"] < iterations) & ~jnp.all(s["done"])

    def body(s):
        lc2v_c = cn_update(s["lv2c"])
        lc2v_v = jnp.take(lc2v_c, sdc.perm_c2v, axis=0)
        lv2c_v, sym_out = vn_update(lc2v_v)
        lv2c_c = jnp.take(lv2c_v, inv_perm, axis=0)
        if early_term:
            finished_now = ~s["done"] & ~(sym_out == BEC_ERASURE).any(axis=0)
        else:
            finished_now = jnp.zeros_like(s["done"])
        active = ~s["done"]
        keep = s["done"][None, :]
        return dict(
            i=s["i"] + 1,
            lv2c=jnp.where(keep, s["lv2c"], lv2c_c),
            sym_out=jnp.where(keep, s["sym_out"], sym_out),
            done=s["done"] | finished_now,
            iters=s["iters"] + (active & ~finished_now).astype(jnp.int32),
        )

    if iterations > 0:
        state = jax.lax.while_loop(cond, body, state)

    sym_out = state["sym_out"]
    unresolved = sym_out == BEC_ERASURE
    if degree1_stale_byte is not None:
        wrong = jnp.ones_like(codeword, dtype=jnp.int32)
    else:
        wrong = 1 - codeword.astype(jnp.int32)
    hard = jnp.where(unresolved, wrong, codeword.astype(jnp.int32)).astype(
        jnp.uint8
    )
    return BECDecodeOutput(
        symbols_out=sym_out,
        hard=hard,
        iterations=state["iters"],
        resolved=~unresolved.any(axis=0),
    )


@functools.partial(
    jax.jit, static_argnames=("iterations", "early_term", "degree1_stale_byte")
)
def bec_decode_sorted_jit(
    sdc, symbols_in, codeword, iterations=50, early_term=True,
    degree1_stale_byte=None,
):
    return bec_decode_sorted(
        sdc, symbols_in, codeword, iterations, early_term, degree1_stale_byte
    )
