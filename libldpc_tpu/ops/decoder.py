"""Batched belief-propagation decoding (flooding and layered schedules).

TPU-native rebuild of the reference's hot loop (``ldpc_decoder::decode``,
``src/decoding/decoder.cpp:11-78``).  The reference decodes one frame at a
time with scalar loops over a CSR adjacency; here a whole batch of frames is
decoded at once over the padded CN-major edge layout
(:mod:`libldpc_tpu.models.code`):

* message tensors are ``[E, batch]`` with the **batch on the minor (lane)
  axis** — TPU vector units see 128 frames per register, and every index
  table drives a *static leading-axis* gather;
* the CN update is a reshape to ``[mc, max_dc, batch]`` + the vectorised
  forward/backward exclusion combine (:mod:`libldpc_tpu.ops.cn_ops`);
* the VN update is a masked gather-sum (``LLROut = LLRIn + Σ Lc2v``) and a
  per-edge extrinsic subtraction (``Lv2c = LLROut[col] − Lc2v``), matching
  ``src/decoding/decoder.cpp:47-64``;
* per-frame early termination runs inside a ``lax.while_loop``: finished
  frames are frozen by masks, the loop exits when every frame has converged
  or the iteration budget is spent.  Iteration counting reproduces the
  reference's break-before-increment semantics (``decoder.cpp:66-77``): a
  frame whose first iteration already yields a codeword reports **0**
  iterations, and a frame that never converges reports ``iterations``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cn_ops
from .device import PAD_LLR, DeviceCode


class DecodeOutput(NamedTuple):
    llr_out: jnp.ndarray  # f32 [nc, B] posterior LLRs
    hard: jnp.ndarray  # bool [nc, B] hard decisions (LLROut <= 0)
    iterations: jnp.ndarray  # int32 [B] per-frame iteration count
    is_codeword: jnp.ndarray  # bool [B] final syndrome check


def _extend(x: jnp.ndarray, fill) -> jnp.ndarray:
    """Append one dummy-VN row (for the ``pad_col == nc`` padding slots)."""
    row = jnp.full((1,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([x, row], axis=0)


def init_messages(dcode: DeviceCode, llr_in: jnp.ndarray) -> jnp.ndarray:
    """``Lv2c[e] = LLRIn[col(e)]`` (``src/decoding/decoder.cpp:16-19``);
    padding slots get the combine identity ``PAD_LLR``."""
    return jnp.take(_extend(llr_in, PAD_LLR), dcode.pad_col, axis=0)


def cn_update(
    dcode: DeviceCode, lv2c: jnp.ndarray, minsum_mode: bool
) -> jnp.ndarray:
    """Check-node update: ``[E, B] -> [E, B]`` extrinsic messages."""
    M = lv2c.reshape(dcode.mc, dcode.max_dc, -1)
    if cn_ops.is_tanh_mode(minsum_mode):
        return cn_ops.exclusion_combine_tanh(M).reshape(dcode.E, -1)
    if cn_ops.is_phi_mode(minsum_mode):
        return cn_ops.exclusion_combine_phi(M).reshape(dcode.E, -1)
    op = cn_ops.get_op(minsum_mode)
    out = cn_ops.exclusion_combine(M, op).reshape(dcode.E, -1)
    return cn_ops.cn_postprocess(out, minsum_mode)


def vn_update(
    dcode: DeviceCode, llr_in: jnp.ndarray, lc2v: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Variable-node / APP update (``src/decoding/decoder.cpp:47-64``).

    Returns ``(llr_out [nc,B], hard [nc,B], lv2c [E,B])``.
    """
    gathered = jnp.take(lc2v, dcode.vn_edges.reshape(-1), axis=0).reshape(
        dcode.nc, dcode.max_dv, -1
    )
    sums = jnp.where(dcode.vn_mask[:, :, None], gathered, 0.0).sum(axis=1)
    llr_out = llr_in + sums
    hard = llr_out <= 0
    lv2c = jnp.take(_extend(llr_out, PAD_LLR), dcode.pad_col, axis=0) - lc2v
    return llr_out, hard, lv2c


def syndrome_ok(dcode: DeviceCode, hard: jnp.ndarray) -> jnp.ndarray:
    """Per-frame ``is_codeword`` — XOR-reduce hard decisions per check row
    (``src/decoding/decoder.h:47-64``).  ``hard`` is bool ``[nc, B]``;
    returns bool ``[B]``."""
    bits = jnp.take(
        _extend(hard.astype(jnp.int32), 0), dcode.pad_col, axis=0
    ).reshape(dcode.mc, dcode.max_dc, -1)
    odd = bits.sum(axis=1) % 2  # padding contributes 0
    return ~(odd.any(axis=0))


def bp_decode(
    dcode: DeviceCode,
    llr_in: jnp.ndarray,
    iterations: int = 50,
    early_term: bool = True,
    minsum_mode: bool = False,
    layered: bool = False,
) -> DecodeOutput:
    """Decode a batch. ``llr_in`` is ``[nc, B]`` (node-major, frames on the
    minor axis).  All options are trace-time static."""
    if layered and dcode.layer_masks is not None and dcode.layer_masks.shape[0] > 1:
        return _bp_decode_layered(
            dcode, llr_in, iterations, early_term, minsum_mode
        )
    return _bp_decode_flooding(
        dcode, llr_in, iterations, early_term, minsum_mode
    )


def _bp_decode_flooding(dcode, llr_in, iterations, early_term, minsum_mode):
    B = llr_in.shape[1]
    state = dict(
        i=jnp.int32(0),
        lv2c=init_messages(dcode, llr_in),
        llr_out=jnp.zeros_like(llr_in),
        hard=jnp.zeros(llr_in.shape, dtype=bool),
        done=jnp.zeros((B,), dtype=bool),
        iters=jnp.zeros((B,), dtype=jnp.int32),
    )

    def cond(s):
        return (s["i"] < iterations) & ~jnp.all(s["done"])

    def body(s):
        lc2v = cn_update(dcode, s["lv2c"], minsum_mode)
        llr_out, hard, lv2c = vn_update(dcode, llr_in, lc2v)
        if early_term:
            finished_now = ~s["done"] & syndrome_ok(dcode, hard)
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
    return DecodeOutput(
        llr_out=state["llr_out"],
        hard=state["hard"],
        iterations=state["iters"],
        is_codeword=syndrome_ok(dcode, state["hard"]),
    )


def _bp_decode_layered(dcode, llr_in, iterations, early_term, minsum_mode):
    """Layered (serial) schedule: per iteration the CN update runs layer by
    layer, with an APP recompute after every layer, mirroring the GPU
    stack's ``decode_lyr_*`` sequence (``gpu/device/kernel.cpp:54-74``).
    Early termination is checked after each layer; the iteration counter
    advances only on completed full iterations (``kernel.cpp:64-78``)."""
    B = llr_in.shape[1]
    layer_rows = dcode.layer_masks  # bool [nl, mc]
    nl = layer_rows.shape[0]
    # expand per-layer row masks to padded edge space once
    layer_edges = jnp.repeat(layer_rows, dcode.max_dc, axis=1)  # [nl, E]

    state = dict(
        i=jnp.int32(0),
        lv2c=init_messages(dcode, llr_in),
        lc2v=jnp.zeros((dcode.E, B), dtype=llr_in.dtype),
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
            lc2v_new = cn_update(dcode, lv2c, minsum_mode)
            lc2v_l = jnp.where(layer_edges[l][:, None], lc2v_new, lc2v)
            llr_out_l, hard_l, lv2c_l = vn_update(dcode, llr_in, lc2v_l)
            if early_term:
                finished_now = ~done & syndrome_ok(dcode, hard_l)
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
    return DecodeOutput(
        llr_out=state["llr_out"],
        hard=state["hard"],
        iterations=state["iters"],
        is_codeword=syndrome_ok(dcode, state["hard"]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "early_term", "minsum_mode", "layered"),
)
def bp_decode_jit(
    dcode: DeviceCode,
    llr_in: jnp.ndarray,
    iterations: int = 50,
    early_term: bool = True,
    minsum_mode: bool = False,
    layered: bool = False,
) -> DecodeOutput:
    return bp_decode(
        dcode, llr_in, iterations, early_term, minsum_mode, layered
    )
