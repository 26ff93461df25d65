"""Batched BEC (binary erasure channel) message-passing decoder.

Rebuilds ``ldpc_decoder_bec`` (``src/decoding/decoder.cpp:91-192``) as masked
integer tensor algebra over the 3-state alphabet {0, 1, ERASURE} (int8; the
reference uses the char sentinel ``'E'``, ``src/core/functions.h:105``).

Pairwise operators (``src/decoding/decoder.h:145-155``):

* CN: ``cn(l, r) = ERASURE if l or r erased else l XOR r`` — GF(2) addition
  with an absorbing erasure; identity is 0, used on padding lanes.
* VN (given the channel-known bit ``xi``):
  ``vn(l, r | xi) = xi if (l == xi or r == xi) else ERASURE`` — identity is
  ERASURE, used on padding lanes.

Like the reference, the decoder receives the true codeword: over a BEC a
non-erased observation is always correct, so "the channel value" and "the
true bit" coincide (``channel_bec`` dispatches ``decode(mCodeWord)``,
``src/sim/channel.h:226-229``).  A variable still erased at the end decides
the *wrong* bit so the frame is counted as errored
(``src/decoding/decoder.cpp:163-165``).  Early termination stops a frame
when no erasures remain in its output (``decoder.cpp:169-186``), with the
same break-before-increment iteration count as the BP decoder.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .channel import BEC_ERASURE
from .device import DeviceCode


class BECDecodeOutput(NamedTuple):
    symbols_out: jnp.ndarray  # int8 [nc, B] posterior symbols {0,1,ERASURE}
    hard: jnp.ndarray  # uint8 [nc, B] decided bits (wrong bit if unresolved)
    iterations: jnp.ndarray  # int32 [B]
    resolved: jnp.ndarray  # bool [B] True when no erasures remain


def _cn_op(l: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    erased = (l == BEC_ERASURE) | (r == BEC_ERASURE)
    return jnp.where(erased, BEC_ERASURE, jnp.bitwise_xor(l, r))


def _exclusion_combine(M: jnp.ndarray, op) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fwd/bwd all-but-one combine along axis 1; also returns the total
    combine (needed for the BEC final decision, ``decoder.cpp:163``)."""
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


def bec_decode(
    dcode: DeviceCode,
    symbols_in: jnp.ndarray,  # int8 [nc, B] channel symbols (E for erased)
    codeword: jnp.ndarray,  # uint8 [nc, B] true codeword
    iterations: int = 50,
    early_term: bool = True,
    degree1_stale_byte: Optional[int] = None,
) -> BECDecodeOutput:
    """See module docstring.

    ``degree1_stale_byte`` emulates a reference bug: for a degree-1 VN the
    reference's exclusion code indexes its scratch vector at ``vw - 2 ==
    SIZE_MAX`` (``src/decoding/decoder.cpp:155-160``), i.e. reads the byte
    just *before* the heap buffer — in practice usually 0x00 from the malloc
    chunk header.  Degree-1 erased VNs therefore emit a hard 0 instead of an
    erasure, which (because BEC messages can only ever resolve to the true
    bit) acts as a per-bit genie hint and substantially improves the
    reference's measured BEC performance on codes with degree-1 VNs.  Set to
    0 to reproduce the reference's numbers; leave ``None`` for the correct
    algorithm.
    """
    B = symbols_in.shape[1]
    xi = codeword.astype(jnp.int8)  # [nc, B]
    known = symbols_in != BEC_ERASURE  # channel revealed this bit

    def extend(x, fill):
        row = jnp.full((1, B), fill, dtype=x.dtype)
        return jnp.concatenate([x, row], axis=0)

    # Lv2c init = channel symbol of the edge's VN; CN-identity 0 on padding
    lv2c0 = jnp.take(extend(symbols_in, 0), dcode.pad_col, axis=0)

    state = dict(
        i=jnp.int32(0),
        lv2c=lv2c0,
        sym_out=jnp.full((dcode.nc, B), BEC_ERASURE, dtype=jnp.int8),
        done=jnp.zeros((B,), dtype=bool),
        iters=jnp.zeros((B,), dtype=jnp.int32),
    )

    def cond(s):
        return (s["i"] < iterations) & ~jnp.all(s["done"])

    def body(s):
        # CN update over padded rows
        M = s["lv2c"].reshape(dcode.mc, dcode.max_dc, B)
        lc2v, _ = _exclusion_combine(M, _cn_op)
        lc2v = lc2v.reshape(dcode.E, B)

        # VN update: gather each VN's incoming messages (padding → ERASURE)
        gathered = jnp.take(lc2v, dcode.vn_edges.reshape(-1), axis=0).reshape(
            dcode.nc, dcode.max_dv, B
        )
        gathered = jnp.where(
            dcode.vn_mask[:, :, None], gathered, BEC_ERASURE
        )

        def vn_op(l, r):
            reveal = (l == xi) | (r == xi)
            return jnp.where(reveal, xi, BEC_ERASURE)

        excl, total = _exclusion_combine(gathered, vn_op)

        # known channel bit: propagate it on every outgoing edge and output
        # (decoder.cpp:131-141); erased: extrinsic exclusion + full combine
        deg1 = dcode.vn_mask.sum(axis=1) == 1  # [nc]
        # a degree-1 VN's posterior is its single raw incoming message
        # (mLLROut[i] = mExMsgF[0] = mLc2v[vn[0]], decoder.cpp:147,163)
        total = jnp.where(deg1[:, None], gathered[:, 0, :], total)
        if degree1_stale_byte is not None:
            excl = jnp.where(
                deg1[:, None, None], jnp.int8(degree1_stale_byte), excl
            )
        lv2c_vnspace = jnp.where(known[:, None, :], xi[:, None, :], excl)
        sym_out = jnp.where(known, xi, total)

        # turn VN-space messages back into padded CN-edge space via the
        # static inverse table; padding slots read the appended CN-identity
        # row (0)
        vn_flat = jnp.concatenate(
            [
                lv2c_vnspace.reshape(dcode.nc * dcode.max_dv, B),
                jnp.zeros((1, B), dtype=jnp.int8),
            ],
            axis=0,
        )
        lv2c_new = jnp.take(vn_flat, dcode.edge_vslot, axis=0)

        if early_term:
            finished_now = ~s["done"] & ~(sym_out == BEC_ERASURE).any(axis=0)
        else:
            finished_now = jnp.zeros_like(s["done"])
        active = ~s["done"]
        keep = s["done"][None, :]
        return dict(
            i=s["i"] + 1,
            lv2c=jnp.where(keep, s["lv2c"], lv2c_new),
            sym_out=jnp.where(keep, s["sym_out"], sym_out),
            done=s["done"] | finished_now,
            iters=s["iters"] + (active & ~finished_now).astype(jnp.int32),
        )

    if iterations > 0:
        state = jax.lax.while_loop(cond, body, state)

    sym_out = state["sym_out"]
    unresolved = sym_out == BEC_ERASURE
    # An unresolved bit decides "the wrong bit" so the frame counts as
    # errored (decoder.cpp:163-165).  The reference's gf2 unary minus is
    # `~value != 0` (src/core/gf2.cpp:5-8), i.e. `-x == 1` for BOTH bit
    # values — so it actually decides a constant 1, erroring only on
    # true-zero bits.  Compat mode reproduces that; the default flips the
    # bit, which is what the reference *intended* (a guaranteed error).
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
def bec_decode_jit(
    dcode,
    symbols_in,
    codeword,
    iterations=50,
    early_term=True,
    degree1_stale_byte=None,
):
    return bec_decode(
        dcode, symbols_in, codeword, iterations, early_term, degree1_stale_byte
    )
