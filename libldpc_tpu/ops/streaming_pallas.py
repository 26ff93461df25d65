"""Streaming compaction on the fused Pallas kernel.

Same scheme as :mod:`libldpc_tpu.ops.streaming` — every batch lane is an
independent frame stream that reloads on convergence, so early-termination
work tracks ``avg_iter`` — but the BP passes run inside the fused Pallas
chunk kernel (:func:`libldpc_tpu.ops.pallas.decode_fused.bp_chunk_pallas`):
messages stay VMEM-resident for ``k`` passes at a time, per-frame
convergence/iteration bookkeeping happens in-kernel, and the reload
machinery (channel generation, counting, stream resets) runs in XLA
between chunks.  Per-pass cost is the fused kernel's (~3.1x cheaper than
the XLA sorted path on structured codes with bf16+MXU transport); the
price is reload granularity — a finished stream idles until its chunk
ends, ~``k/2`` passes on average.

Per-frame semantics (decisions at first convergence, break-before-
increment iteration counts, cap at ``iterations``) are identical to both
:mod:`libldpc_tpu.ops.streaming` and the batch decoders.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .channel import simulate_channel
from .pallas.decode_fused import bp_chunk_pallas
from .pallas.layout import PallasDeviceCode
from .streaming import _INT32_SAFE, FRAME_AXIS, StreamDeltas


class PStreamState(NamedTuple):
    llr_in: jnp.ndarray  # f32 [nc, B]
    codeword: jnp.ndarray  # u8 [nc, B]
    lv2c: jnp.ndarray  # msg dtype [n_pad, B]
    done8: jnp.ndarray  # i32 [8, B] (row 0: finished flag)
    iters8: jnp.ndarray  # i32 [8, B]
    age8: jnp.ndarray  # i32 [8, B]
    counted: jnp.ndarray  # bool [B]
    started: jnp.ndarray  # i32 [n_dev]


def _init_state(pdc: PallasDeviceCode, batch: int, dtype,
                n_dev: int = 1) -> PStreamState:
    done8 = jnp.zeros((8, batch), jnp.int32).at[0].set(1)  # empty = frozen
    return PStreamState(
        llr_in=jnp.zeros((pdc.nc, batch), jnp.float32),
        codeword=jnp.zeros((pdc.nc, batch), jnp.uint8),
        lv2c=jnp.zeros((pdc.n_pad, batch), dtype),
        done8=done8,
        iters8=jnp.zeros((8, batch), jnp.int32),
        age8=jnp.zeros((8, batch), jnp.int32),
        counted=jnp.ones((batch,), bool),  # nothing to count yet
        started=jnp.zeros((n_dev,), jnp.int32),
    )


def _superstep(
    pdc, channel_type, iterations, cn_mode, batch, modulation, quota,
    k, n_outer, batch_tile, message_dtype, permute, interpret,
    key, x_value, refill, st: PStreamState,
):
    """``n_outer`` chunks of ``k`` fused decode passes, with counting and
    reload between chunks — all inside one jitted call, so per-dispatch
    host/tunnel latency amortises over a full decode's worth of passes."""
    is_tx = jnp.zeros((pdc.nc,), bool).at[pdc.bit_pos].set(True)[:, None]

    def one_chunk(j, carry):
        st, acc = carry
        # --- k fused decode passes with in-kernel bookkeeping -------------
        lv2c, llr_out, done8, iters8, age8 = bp_chunk_pallas(
            pdc, st.llr_in, st.lv2c, st.done8, st.iters8, st.age8,
            k=k, cap=iterations, minsum_mode=cn_mode, batch_tile=batch_tile,
            message_dtype=message_dtype, permute=permute,
            interpret=interpret,
        )
        done = done8[0] > 0
        # --- count frames that finished during this chunk ------------------
        newly = done & ~st.counted
        hard = llr_out <= 0
        biterr = (
            (hard != (st.codeword > 0)) & is_tx
        ).astype(jnp.int32).sum(0)
        acc = StreamDeltas(
            bit_errors=acc.bit_errors + jnp.where(newly, biterr, 0).sum(),
            frame_errors=acc.frame_errors
            + (newly & (biterr > 0)).astype(jnp.int32).sum(),
            frames=acc.frames + newly.astype(jnp.int32).sum(),
            iter_sum=acc.iter_sum + jnp.where(newly, iters8[0], 0).sum(),
            n_active=acc.n_active,
        )
        counted = st.counted | newly
        # --- reload finished streams with fresh frames ----------------------
        ch = simulate_channel(
            pdc, channel_type, jax.random.fold_in(key, j), batch, x_value,
            modulation=modulation,
        )
        rs = refill & done & counted
        rs = rs & (st.started[0] + jnp.cumsum(rs.astype(jnp.int32)) <= quota)
        rs_i = rs.astype(jnp.int32)
        st2 = PStreamState(
            llr_in=jnp.where(rs, ch.llr, st.llr_in),
            codeword=jnp.where(rs, ch.codeword, st.codeword),
            lv2c=jnp.where(rs, jnp.zeros((), lv2c.dtype), lv2c),
            done8=done8 * (1 - rs_i),
            iters8=iters8 * (1 - rs_i),
            age8=age8 * (1 - rs_i),
            counted=counted & ~rs,
            started=st.started + rs_i.sum()[None],
        )
        return st2, acc

    zero = jnp.int32(0)
    acc0 = StreamDeltas(zero, zero, zero, zero, zero)
    st, acc = jax.lax.fori_loop(0, n_outer, one_chunk, (st, acc0))
    acc = acc._replace(
        n_active=(st.done8[0] == 0).astype(jnp.int32).sum()
    )
    return st, acc


def make_streaming_pallas_step(
    pdc: PallasDeviceCode,
    channel_type: str,
    dec,
    batch_per_device: int,
    mesh: Optional[Mesh] = None,
    modulation=None,
    chunk_iters: int = 0,
    max_frames: int = int(10e9),
    batch_tile: int = 256,
    interpret: bool = False,
):
    """Build ``(init_fn, step_fn)`` like
    :func:`libldpc_tpu.ops.streaming.make_streaming_step`, with decode
    chunks on the fused Pallas kernel.  ``chunk_iters`` (default
    ``max(4, iterations // 8)``) trades reload granularity (idle ~k/2
    passes per frame) against per-chunk XLA/reload overhead."""
    if channel_type == "BEC":
        raise ValueError("streaming decode does not cover the BEC decoder")
    iterations = dec.iterations
    if iterations < 1:
        raise ValueError("streaming decode requires iterations >= 1")
    k = chunk_iters or max(4, min(8, iterations // 8))
    # one step_fn call covers ~a full decode's worth of passes so the
    # per-dispatch latency amortises
    n_outer = max(1, -(-iterations // k))
    permute = dec.permute
    if permute == "auto":
        permute = "mxu" if pdc.mxu_blocks_fwd is not None else "benes"
    dtype = jnp.dtype(dec.message_dtype)

    def body(quota):
        return functools.partial(
            _superstep, pdc, channel_type, iterations, dec.cn_mode,
            batch_per_device, modulation, quota, k, n_outer, batch_tile,
            dec.message_dtype, permute, interpret,
        )

    if mesh is None:
        step_body = body(jnp.int32(min(max_frames, _INT32_SAFE)))

        def init_fn(started_offset: int = 0):
            st = _init_state(pdc, batch_per_device, dtype)
            if started_offset:
                st = st._replace(
                    started=jnp.full((1,), min(started_offset, _INT32_SAFE),
                                     jnp.int32)
                )
            return st

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, key, x_value, refill):
            return step_body(key, x_value, refill, state)

        return init_fn, step_fn

    n_dev = int(np.prod(mesh.devices.shape))
    base, rem = divmod(min(max_frames, n_dev * _INT32_SAFE), n_dev)

    def shard_body(state, key, x_value, refill):
        idx = jax.lax.axis_index(FRAME_AXIS)
        quota = jnp.minimum(
            jnp.int32(base) + (idx < rem).astype(jnp.int32),
            jnp.int32(_INT32_SAFE),
        )
        state, acc = body(quota)(
            jax.random.fold_in(key, idx), x_value, refill, state
        )
        acc = StreamDeltas(*(jax.lax.psum(a, FRAME_AXIS) for a in acc))
        return state, acc

    state_specs = PStreamState(
        llr_in=P(None, FRAME_AXIS),
        codeword=P(None, FRAME_AXIS),
        lv2c=P(None, FRAME_AXIS),
        done8=P(None, FRAME_AXIS),
        iters8=P(None, FRAME_AXIS),
        age8=P(None, FRAME_AXIS),
        counted=P(FRAME_AXIS),
        started=P(FRAME_AXIS),
    )
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(state_specs, P(), P(), P()),
        out_specs=(state_specs, StreamDeltas(P(), P(), P(), P(), P())),
        check_vma=False,
    )

    def init_fn(started_offset: int = 0):
        st = _init_state(pdc, batch_per_device * n_dev, dtype, n_dev=n_dev)
        if started_offset:
            per = -(-started_offset // n_dev)
            st = st._replace(
                started=jnp.full((n_dev,), min(per, _INT32_SAFE), jnp.int32)
            )
        from jax.sharding import NamedSharding

        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            st, state_specs,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, key, x_value, refill):
        return sharded(state, key, x_value, refill)

    return init_fn, step_fn
