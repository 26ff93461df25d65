"""Streaming compaction on the fused Pallas kernel, with in-kernel reload.

Same scheme as :mod:`libldpc_tpu.ops.streaming` — every batch lane is an
independent frame stream that reloads on convergence, so early-termination
work tracks ``avg_iter`` — but the entire per-stream loop lives inside the
fused kernel (:func:`libldpc_tpu.ops.pallas.decode_fused.bp_stream_chunk_pallas`):
messages stay VMEM-resident, per-frame convergence/iteration bookkeeping,
error counting *and stream reloads* all happen in-kernel.  A finished
stream restarts on the next pass (no idle-until-chunk-end), and the only
XLA work between chunks is occasional regeneration of the lane-aligned
fresh-frame pool.

This is the second-generation design: the first ran reloads/counting in
XLA between chunks (full-batch channel generation every chunk at ~25%
utilisation, ``[n_pad, B]`` reload selects, ~k/2 idle passes per frame),
which measured 3-4x the fixed-iteration per-pass cost and capped the
early-termination win at ``avg_iter ≲ 13``.

**Fresh-frame pool.**  Lane ``i`` can only reload from pool entry ``i``
(lane-aligned — no gathers anywhere).  Between chunks, when at least
``gen_watermark`` entries have been consumed, one ``simulate_channel``
batch refills exactly the consumed entries (unused entries keep their
never-started frames — no draws are discarded by overwrite, only the
regen draws landing on still-fresh lanes are, bounding generation waste
by ``1 - watermark``).  A lane that finishes twice between regens idles
(``done``, counted once) until the next regen — the watermark trades that
idle wait against generation waste.

``max_frames`` is enforced *exactly*: each device holds a start quota and
the kernel grants starts against a running remaining-counter in SMEM (see
``kernel_stream``), so the drained total lands on ``min(max_frames, ...)``
with no host round-trip.

Per-frame semantics (decisions at first convergence, break-before-
increment iteration counts, cap at ``iterations``) are identical to
:mod:`libldpc_tpu.ops.streaming` and the batch decoders.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .channel import BEC_ERASURE, simulate_channel
from .pallas.decode_fused import DEFAULT_QUANT_SCALE, bp_stream_chunk_pallas
from .pallas.layout import PallasDeviceCode
from .streaming import (
    _INT32_SAFE,
    FRAME_AXIS,
    POINT_AXIS,
    StreamDeltas,
    split_exact,
    split_exact_multi,
)


def _edge_prior_pool(idx, fresh_llr, dtype, axis=0,
                     qscale=DEFAULT_QUANT_SCALE):
    """Edge-space gathered priors for the warm-up-free in-kernel reload.

    ``idx`` is the layout's ``cn_edge_node`` map (-1 on pad/fake slots);
    the value transform must byte-match the kernel's ``to_store(prior(.))``
    so a reloaded lane is indistinguishable from a batch-kernel init
    (``decode_fused.init_lv2c``) — including the int8 lattice rounding.
    ``axis=0`` gathers rows ([nc, B] -> [n_pad, B], edge-major layout),
    ``axis=1`` gathers lanes ([B, nc_pad] -> [B, n_pad], lane-major)."""
    valid = idx >= 0
    safe = jnp.where(valid, idx, 0)
    if axis == 0:
        v = jnp.where(valid[:, None], fresh_llr[safe, :], 0.0)
    else:
        v = jnp.where(valid[None, :], fresh_llr[:, safe], 0.0)
    if jnp.dtype(dtype) == jnp.int8:
        return jnp.clip(
            jnp.round(v * (1.0 / qscale)), -127.0, 127.0
        ).astype(jnp.int8)
    return v.astype(dtype)


class PStreamState(NamedTuple):
    llr_in: jnp.ndarray  # f32 [nc, B] carried channel LLRs
    codeword: jnp.ndarray  # i32 [nc, B] carried true codewords
    lv2c: jnp.ndarray  # msg dtype [n_pad, B]
    done8: jnp.ndarray  # i32 [8, B] (row 0: finished/empty flag)
    iters8: jnp.ndarray  # i32 [8, B]
    age8: jnp.ndarray  # i32 [8, B]
    avail8: jnp.ndarray  # i32 [8, B] (row 0: pool entry unused)
    ctr8: jnp.ndarray  # i32 [8, B] in-kernel counter planes
    fresh_llr: jnp.ndarray  # f32 [nc, B] fresh-frame pool
    fresh_cw: jnp.ndarray  # i32 [nc, B]
    fresh_lv2c: jnp.ndarray  # msg dtype [n_pad, B] pre-gathered edge priors
    started: jnp.ndarray  # i32 [n_dev] frames started per device


def _init_state(pdc: PallasDeviceCode, batch: int, dtype,
                n_dev: int = 1) -> PStreamState:
    done8 = jnp.zeros((8, batch), jnp.int32).at[0].set(1)  # empty = frozen
    return PStreamState(
        llr_in=jnp.zeros((pdc.nc, batch), jnp.float32),
        codeword=jnp.zeros((pdc.nc, batch), jnp.int32),
        lv2c=jnp.zeros((pdc.n_pad, batch), dtype),
        done8=done8,
        iters8=jnp.zeros((8, batch), jnp.int32),
        age8=jnp.zeros((8, batch), jnp.int32),
        avail8=jnp.zeros((8, batch), jnp.int32),  # pool starts empty
        ctr8=jnp.zeros((8, batch), jnp.int32),
        fresh_llr=jnp.zeros((pdc.nc, batch), jnp.float32),
        fresh_cw=jnp.zeros((pdc.nc, batch), jnp.int32),
        fresh_lv2c=jnp.zeros((pdc.n_pad, batch), dtype),
        started=jnp.zeros((n_dev,), jnp.int32),
    )


def _superstep(
    pdc, channel_type, iterations, cn_mode, batch, modulation, quota,
    k, n_outer, batch_tile, message_dtype, permute, interpret, watermark,
    quant_scale,
    key, x_value, refill, st: PStreamState,
):
    """``n_outer`` self-refilling chunks of ``k`` fused passes, with pool
    regeneration between chunks — all inside one jitted call, so per-
    dispatch host/tunnel latency amortises over a full decode's worth of
    passes."""
    refill_i = jnp.asarray(refill, jnp.int32)

    def one_chunk(j, st):
        # --- regenerate consumed pool entries when depleted enough -------
        used = jnp.int32(batch) - jnp.sum(st.avail8[0])
        do_gen = (refill_i > 0) & (used >= jnp.int32(watermark))

        def gen(_):
            ch = simulate_channel(
                pdc, channel_type, jax.random.fold_in(key, j), batch,
                x_value, modulation=modulation,
            )
            unused = st.avail8[0:1, :] > 0  # [1, B] lane-broadcast
            llr = jnp.where(unused, st.fresh_llr, ch.llr)
            # edge-space gathered priors for the warm-up-free reload
            # (pure function of the merged pool, so recomputing over the
            # whole pool is idempotent on kept entries)
            return (
                llr,
                jnp.where(unused, st.fresh_cw,
                          ch.codeword.astype(jnp.int32)),
                _edge_prior_pool(pdc.cn_edge_node, llr,
                                 jnp.dtype(message_dtype),
                                 qscale=quant_scale),
                jnp.zeros((8, batch), jnp.int32).at[0].set(1),
            )

        def keep(_):
            return st.fresh_llr, st.fresh_cw, st.fresh_lv2c, st.avail8

        fresh_llr, fresh_cw, fresh_lv2c, avail8 = jax.lax.cond(
            do_gen, gen, keep, 0
        )
        # --- exact remaining-starts budget for this chunk -----------------
        started_now = st.started[0] + jnp.sum(st.ctr8[4])
        remaining = jnp.clip(quota - started_now, 0, _INT32_SAFE)
        llr_in, cw, lv2c, done8, iters8, age8, avail8, ctr8 = (
            bp_stream_chunk_pallas(
                pdc, st.llr_in, st.codeword, st.lv2c, st.done8, st.iters8,
                st.age8, avail8, st.ctr8, fresh_llr, fresh_cw, fresh_lv2c,
                refill_i,
                remaining, k=k, cap=iterations, minsum_mode=cn_mode,
                batch_tile=batch_tile, message_dtype=message_dtype,
                permute=permute, interpret=interpret,
                quant_scale=quant_scale,
            )
        )
        return PStreamState(
            llr_in=llr_in, codeword=cw, lv2c=lv2c, done8=done8,
            iters8=iters8, age8=age8, avail8=avail8, ctr8=ctr8,
            fresh_llr=fresh_llr, fresh_cw=fresh_cw, fresh_lv2c=fresh_lv2c,
            started=st.started,
        )

    st = st._replace(ctr8=jnp.zeros_like(st.ctr8))
    st = jax.lax.fori_loop(0, n_outer, one_chunk, st)
    acc = StreamDeltas(
        bit_errors=jnp.sum(st.ctr8[0]),
        frame_errors=jnp.sum(st.ctr8[1]),
        frames=jnp.sum(st.ctr8[2]),
        iter_sum=jnp.sum(st.ctr8[3]),
        n_active=jnp.sum((st.done8[0] == 0).astype(jnp.int32)),
    )
    st = st._replace(
        started=st.started + jnp.sum(st.ctr8[4])[None],
        ctr8=jnp.zeros_like(st.ctr8),
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
    gen_watermark: Optional[int] = None,
):
    """Build ``(init_fn, step_fn)`` like
    :func:`libldpc_tpu.ops.streaming.make_streaming_step`, with the whole
    per-stream loop (decode, counting, reload) inside the fused Pallas
    kernel.  ``chunk_iters`` only sets the pool-regeneration granularity
    (reloads happen per pass in-kernel); ``gen_watermark`` (default
    ``3 * batch_per_device // 4``) is how many pool entries must be
    consumed before a regeneration batch is drawn — higher wastes fewer
    draws, lower shortens the idle wait of twice-finishing lanes
    (measured on-chip at batch 8192: 0.75 beats 0.5 by ~20% at
    ``avg_iter ~ 20`` and matches it elsewhere; 0.25 / 0.875 no
    better)."""
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
    if dtype == jnp.int8:
        # same constraints as the batch kernel (bp_decode_pallas): the
        # integer lattice is only exact for min-sum-family CN forms and
        # rides the native s8 MXU transport
        kind = dec.cn_mode[0] if isinstance(dec.cn_mode, tuple) else dec.cn_mode
        if kind not in ("BP_MS", "BP_NMS", "BP_OMS", True):
            raise ValueError(
                "int8 streaming requires a min-sum-family CN form "
                "(BP_MS/BP_NMS/BP_OMS)"
            )
        if permute != "mxu":
            raise ValueError(
                "int8 streaming requires the MXU transport (block-local "
                "permutation plan)"
            )
    if gen_watermark is None:
        gen_watermark = max(1, 3 * batch_per_device // 4)

    def body(quota):
        return functools.partial(
            _superstep, pdc, channel_type, iterations, dec.cn_mode,
            batch_per_device, modulation, quota, k, n_outer, batch_tile,
            dec.message_dtype, permute, interpret, gen_watermark,
            dec.quant_scale,
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
        avail8=P(None, FRAME_AXIS),
        ctr8=P(None, FRAME_AXIS),
        fresh_llr=P(None, FRAME_AXIS),
        fresh_cw=P(None, FRAME_AXIS),
        fresh_lv2c=P(None, FRAME_AXIS),
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
            # EXACT resume split — see streaming.split_exact
            st = st._replace(
                started=jnp.asarray(split_exact(started_offset, n_dev))
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


def make_streaming_pallas_multipoint_step(
    pdc: PallasDeviceCode,
    channel_type: str,
    dec,
    batch_per_device: int,
    mesh: Mesh,
    modulation=None,
    chunk_iters: int = 0,
    max_frames: int = int(10e9),
    batch_tile: int = 256,
    interpret: bool = False,
    gen_watermark: Optional[int] = None,
):
    """In-kernel streaming over a 2-D ``(points, frames)`` mesh — the
    point-parallel analogue of :func:`make_streaming_pallas_step` (see
    :func:`libldpc_tpu.ops.streaming.make_streaming_multipoint_step` for
    the scheme).  ``step_fn(state, key, x_vec, refill_vec) -> (state,
    StreamDeltas with leading n_points axis)``."""
    if channel_type == "BEC":
        raise ValueError("streaming decode does not cover the BEC decoder")
    iterations = dec.iterations
    if iterations < 1:
        raise ValueError("streaming decode requires iterations >= 1")
    k = chunk_iters or max(4, min(8, iterations // 8))
    n_outer = max(1, -(-iterations // k))
    permute = dec.permute
    if permute == "auto":
        permute = "mxu" if pdc.mxu_blocks_fwd is not None else "benes"
    dtype = jnp.dtype(dec.message_dtype)
    if dtype == jnp.int8:
        # same constraints as the batch kernel (bp_decode_pallas): the
        # integer lattice is only exact for min-sum-family CN forms and
        # rides the native s8 MXU transport
        kind = dec.cn_mode[0] if isinstance(dec.cn_mode, tuple) else dec.cn_mode
        if kind not in ("BP_MS", "BP_NMS", "BP_OMS", True):
            raise ValueError(
                "int8 streaming requires a min-sum-family CN form "
                "(BP_MS/BP_NMS/BP_OMS)"
            )
        if permute != "mxu":
            raise ValueError(
                "int8 streaming requires the MXU transport (block-local "
                "permutation plan)"
            )
    if gen_watermark is None:
        gen_watermark = max(1, 3 * batch_per_device // 4)
    n_points = mesh.shape[POINT_AXIS]
    n_frame_dev = mesh.shape[FRAME_AXIS]
    base, rem = divmod(
        min(max_frames, n_frame_dev * _INT32_SAFE), n_frame_dev
    )

    def shard_body(state, key, x_vec, refill_vec):
        p_idx = jax.lax.axis_index(POINT_AXIS)
        f_idx = jax.lax.axis_index(FRAME_AXIS)
        quota = jnp.minimum(
            jnp.int32(base) + (f_idx < rem).astype(jnp.int32),
            jnp.int32(_INT32_SAFE),
        )
        body = functools.partial(
            _superstep, pdc, channel_type, iterations, dec.cn_mode,
            batch_per_device, modulation, quota, k, n_outer, batch_tile,
            dec.message_dtype, permute, interpret, gen_watermark,
            dec.quant_scale,
        )
        state, acc = body(
            jax.random.fold_in(jax.random.fold_in(key, p_idx), f_idx),
            x_vec[0], refill_vec[0], state,
        )
        acc = StreamDeltas(
            *(jax.lax.psum(a, FRAME_AXIS)[None] for a in acc)
        )
        return state, acc

    both = (POINT_AXIS, FRAME_AXIS)
    state_specs = PStreamState(
        llr_in=P(None, both),
        codeword=P(None, both),
        lv2c=P(None, both),
        done8=P(None, both),
        iters8=P(None, both),
        age8=P(None, both),
        avail8=P(None, both),
        ctr8=P(None, both),
        fresh_llr=P(None, both),
        fresh_cw=P(None, both),
        fresh_lv2c=P(None, both),
        started=P(both),
    )
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(state_specs, P(), P(POINT_AXIS), P(POINT_AXIS)),
        out_specs=(
            state_specs,
            StreamDeltas(*(P(POINT_AXIS) for _ in range(5))),
        ),
        check_vma=False,
    )

    def init_fn(started_offset=None):
        st = _init_state(
            pdc, batch_per_device * n_points * n_frame_dev, dtype,
            n_dev=n_points * n_frame_dev,
        )
        if started_offset is not None:
            # EXACT per-point resume split — see streaming.split_exact_multi
            st = st._replace(
                started=jnp.asarray(
                    split_exact_multi(started_offset, n_frame_dev)
                )
            )
        from jax.sharding import NamedSharding

        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            st, state_specs,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, key, x_vec, refill_vec):
        return sharded(state, key, x_vec, refill_vec)

    return init_fn, step_fn


# --------------------------------------------------------------------------
# Lane-major variant: in-kernel streaming at blocklengths the edge-major
# kernel cannot compile (frames on sublanes — see ops/pallas/decode_lanes.py)


class LStreamState(NamedTuple):
    llr_in: jnp.ndarray  # f32 [B, nc_pad] carried channel LLRs (lane space)
    codeword: jnp.ndarray  # i32 [B, nc_pad]
    lv2c: jnp.ndarray  # msg dtype [B, n_pad]
    done: jnp.ndarray  # i32 [B, 128] (col 0: finished/empty flag)
    iters: jnp.ndarray  # i32 [B, 128]
    age: jnp.ndarray  # i32 [B, 128]
    avail: jnp.ndarray  # i32 [B, 128] (col 0: pool entry unused)
    ctr: jnp.ndarray  # i32 [B, 128] counters in cols 0..4
    fresh_llr: jnp.ndarray  # f32 [B, nc_pad]
    fresh_cw: jnp.ndarray  # i32 [B, nc_pad]
    fresh_lv2c: jnp.ndarray  # msg dtype [B, n_pad] pre-gathered edge priors
    started: jnp.ndarray  # i32 [n_dev]


def _init_lanes_state(ldc, batch: int, dtype, n_dev: int = 1) -> LStreamState:
    done = jnp.zeros((batch, 128), jnp.int32).at[:, 0].set(1)
    return LStreamState(
        llr_in=jnp.zeros((batch, ldc.nc_pad), jnp.float32),
        codeword=jnp.zeros((batch, ldc.nc_pad), jnp.int32),
        lv2c=jnp.zeros((batch, ldc.n_pad), dtype),
        done=done,
        iters=jnp.zeros((batch, 128), jnp.int32),
        age=jnp.zeros((batch, 128), jnp.int32),
        avail=jnp.zeros((batch, 128), jnp.int32),
        ctr=jnp.zeros((batch, 128), jnp.int32),
        fresh_llr=jnp.zeros((batch, ldc.nc_pad), jnp.float32),
        fresh_cw=jnp.zeros((batch, ldc.nc_pad), jnp.int32),
        fresh_lv2c=jnp.zeros((batch, ldc.n_pad), dtype),
        started=jnp.zeros((n_dev,), jnp.int32),
    )


def _lanes_superstep(
    ldc, channel_type, iterations, cn_mode, batch, modulation, quota,
    k, n_outer, frame_tile, message_dtype, interpret, watermark,
    quant_scale, layered,
    key, x_value, refill, st: LStreamState,
):
    """Lane-major :func:`_superstep`: pool regeneration converts the
    sorted-label channel batch into lane space (gather + transpose) and
    the chunks run :func:`...decode_lanes.bp_stream_chunk_lanes`."""
    from .pallas.decode_lanes import bp_stream_chunk_lanes

    refill_i = jnp.asarray(refill, jnp.int32)
    real_lane = (
        jnp.zeros((ldc.nc_pad, 1), jnp.float32)
        .at[ldc.lane_of_vn].set(1.0)
    )

    def lanes_of(arr, dtype):
        v = jnp.take(arr.astype(jnp.float32), ldc.vn_of_lane, axis=0,
                     mode="fill", fill_value=0.0)
        return (v * real_lane).T.astype(dtype)  # [B, nc_pad]

    def one_chunk(j, st):
        used = jnp.int32(batch) - jnp.sum(st.avail[:, 0])
        do_gen = (refill_i > 0) & (used >= jnp.int32(watermark))

        def gen(_):
            ch = simulate_channel(
                ldc.sorted_dc, channel_type, jax.random.fold_in(key, j),
                batch, x_value, modulation=modulation,
            )
            vals = ch.llr
            if channel_type == "BEC":
                # sign encoding of the 3-state symbols (bit 0 -> +1,
                # bit 1 -> -1, erasure -> exact 0) — the BEC peeling
                # algebra IS min-sum BP over it (see bec_decode_lanes)
                vals = jnp.where(
                    ch.llr == BEC_ERASURE,
                    jnp.float32(0.0),
                    1.0 - 2.0 * ch.llr.astype(jnp.float32),
                )
            unused = st.avail[:, 0:1] > 0  # [B, 1] row-broadcast
            llr = jnp.where(unused, st.fresh_llr,
                            lanes_of(vals, jnp.float32))
            # edge-space gathered priors for the warm-up-free reload
            return (
                llr,
                jnp.where(unused, st.fresh_cw,
                          lanes_of(ch.codeword, jnp.int32)),
                # (the layered engine ignores the pre-gathered edge
                # priors — app = prior / lc2v = 0 reloads in kernel —
                # but the pool is computed unconditionally: skipping it
                # via a lax.cond branch asymmetry tickles a jax MLIR
                # lowering-cache KeyError, and the gather is cheap)
                _edge_prior_pool(ldc.cn_edge_node, llr,
                                 jnp.dtype(message_dtype), axis=1,
                                 qscale=quant_scale),
                jnp.zeros((batch, 128), jnp.int32).at[:, 0].set(1),
            )

        def keep(_):
            return st.fresh_llr, st.fresh_cw, st.fresh_lv2c, st.avail

        fresh_llr, fresh_cw, fresh_lv2c, avail = jax.lax.cond(
            do_gen, gen, keep, 0
        )
        started_now = st.started[0] + jnp.sum(st.ctr[:, 4])
        remaining = jnp.clip(quota - started_now, 0, _INT32_SAFE)
        llr_in, cw, lv2c, done, iters, age, avail, ctr = (
            bp_stream_chunk_lanes(
                ldc, st.llr_in, st.codeword, st.lv2c, st.done, st.iters,
                st.age, avail, st.ctr, fresh_llr, fresh_cw, fresh_lv2c,
                refill_i,
                remaining, k=k, cap=iterations, minsum_mode=cn_mode,
                frame_tile=frame_tile, message_dtype=message_dtype,
                interpret=interpret, bec_mode=channel_type == "BEC",
                quant_scale=quant_scale, layered=layered,
            )
        )
        return LStreamState(
            llr_in=llr_in, codeword=cw, lv2c=lv2c, done=done, iters=iters,
            age=age, avail=avail, ctr=ctr, fresh_llr=fresh_llr,
            fresh_cw=fresh_cw, fresh_lv2c=fresh_lv2c, started=st.started,
        )

    st = st._replace(ctr=jnp.zeros_like(st.ctr))
    st = jax.lax.fori_loop(0, n_outer, one_chunk, st)
    acc = StreamDeltas(
        bit_errors=jnp.sum(st.ctr[:, 0]),
        frame_errors=jnp.sum(st.ctr[:, 1]),
        frames=jnp.sum(st.ctr[:, 2]),
        iter_sum=jnp.sum(st.ctr[:, 3]),
        n_active=jnp.sum((st.done[:, 0] == 0).astype(jnp.int32)),
    )
    st = st._replace(
        started=st.started + jnp.sum(st.ctr[:, 4])[None],
        ctr=jnp.zeros_like(st.ctr),
    )
    return st, acc


def make_streaming_lanes_step(
    ldc,
    channel_type: str,
    dec,
    batch_per_device: int,
    mesh: Optional[Mesh] = None,
    modulation=None,
    chunk_iters: int = 0,
    max_frames: int = int(10e9),
    frame_tile: int = 0,
    interpret: bool = False,
    gen_watermark: Optional[int] = None,
):
    """:func:`make_streaming_pallas_step` over the lane-major kernel — the
    in-kernel streaming path for large blocklengths (any ``n`` the
    :class:`~libldpc_tpu.ops.pallas.lanes_layout.LanesDeviceCode` layout
    accepts).  Same state/step contract and semantics.

    Unlike the other streaming builders this one also covers the BEC:
    over the sign encoding the peeling algebra is min-sum BP (see
    :func:`...decode_lanes.bec_decode_lanes`), so the same in-kernel
    reload/counting machinery applies with the "no erasures left"
    convergence predicate."""
    iterations = dec.iterations
    if iterations < 1:
        raise ValueError("streaming decode requires iterations >= 1")
    k = chunk_iters or max(4, min(8, iterations // 8))
    n_outer = max(1, -(-iterations // k))
    dtype = jnp.dtype(dec.message_dtype)
    if dtype == jnp.int8:
        # same constraints as the batch lanes kernel (bp_decode_lanes):
        # the integer lattice is only exact for min-sum-family CN forms
        # and rides the clos transport's native s8 MXU matmuls
        kind = dec.cn_mode[0] if isinstance(dec.cn_mode, tuple) \
            else dec.cn_mode
        if kind not in ("BP_MS", "BP_NMS", "BP_OMS", True):
            raise ValueError(
                "int8 streaming requires a min-sum-family CN form "
                "(BP_MS/BP_NMS/BP_OMS)"
            )
        if ldc.transport not in ("clos", "qc"):
            raise ValueError(
                "int8 lane-major streaming requires the clos or qc "
                "transport"
            )
    if gen_watermark is None:
        gen_watermark = max(1, 3 * batch_per_device // 4)

    layered = bool(getattr(dec, "layered", False))
    if layered:
        if channel_type == "BEC":
            raise ValueError("streaming layered decoding has no BEC form")
        if not getattr(ldc, "qc_layers", ()):
            raise ValueError(
                "streaming layered decoding requires natural-QC layer "
                "metadata on the lanes layout"
            )
    cn_mode = "BP_MS" if channel_type == "BEC" else dec.cn_mode
    if channel_type == "BEC" and frame_tile == 0:
        # the BEC variant's scoped-VMEM footprint is larger than BP's at
        # the default tile (measured: ft=32/bf16 overflows VMEM by ~13MB
        # at n_pad 32768 where the BP kernel fits; ft=16 compiles and runs)
        frame_tile = 16 if jnp.dtype(dec.message_dtype) == jnp.bfloat16 else 8

    def body(quota):
        return functools.partial(
            _lanes_superstep, ldc, channel_type, iterations, cn_mode,
            batch_per_device, modulation, quota, k, n_outer, frame_tile,
            dec.message_dtype, interpret, gen_watermark,
            dec.quant_scale, layered,
        )

    if mesh is None:
        step_body = body(jnp.int32(min(max_frames, _INT32_SAFE)))

        def init_fn(started_offset: int = 0):
            st = _init_lanes_state(ldc, batch_per_device, dtype)
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

    state_specs = LStreamState(
        llr_in=P(FRAME_AXIS, None),
        codeword=P(FRAME_AXIS, None),
        lv2c=P(FRAME_AXIS, None),
        done=P(FRAME_AXIS, None),
        iters=P(FRAME_AXIS, None),
        age=P(FRAME_AXIS, None),
        avail=P(FRAME_AXIS, None),
        ctr=P(FRAME_AXIS, None),
        fresh_llr=P(FRAME_AXIS, None),
        fresh_cw=P(FRAME_AXIS, None),
        fresh_lv2c=P(FRAME_AXIS, None),
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
        st = _init_lanes_state(ldc, batch_per_device * n_dev, dtype,
                               n_dev=n_dev)
        if started_offset:
            # EXACT resume split — see streaming.split_exact
            st = st._replace(
                started=jnp.asarray(split_exact(started_offset, n_dev))
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


def make_streaming_lanes_multipoint_step(
    ldc,
    channel_type: str,
    dec,
    batch_per_device: int,
    mesh: Mesh,
    modulation=None,
    chunk_iters: int = 0,
    max_frames: int = int(10e9),
    frame_tile: int = 0,
    interpret: bool = False,
    gen_watermark: Optional[int] = None,
):
    """Lane-major in-kernel streaming over a 2-D ``(points, frames)``
    mesh — point-parallel wide sweeps on large blocklengths (see
    :func:`make_streaming_lanes_step` and
    :func:`make_streaming_pallas_multipoint_step`; like it, this builder
    also covers the BEC)."""
    iterations = dec.iterations
    if iterations < 1:
        raise ValueError("streaming decode requires iterations >= 1")
    k = chunk_iters or max(4, min(8, iterations // 8))
    n_outer = max(1, -(-iterations // k))
    dtype = jnp.dtype(dec.message_dtype)
    if dtype == jnp.int8:
        kind = dec.cn_mode[0] if isinstance(dec.cn_mode, tuple) \
            else dec.cn_mode
        if kind not in ("BP_MS", "BP_NMS", "BP_OMS", True):
            raise ValueError(
                "int8 streaming requires a min-sum-family CN form "
                "(BP_MS/BP_NMS/BP_OMS)"
            )
        if ldc.transport not in ("clos", "qc"):
            raise ValueError(
                "int8 lane-major streaming requires the clos or qc "
                "transport"
            )
    if gen_watermark is None:
        gen_watermark = max(1, 3 * batch_per_device // 4)
    n_points = mesh.shape[POINT_AXIS]
    n_frame_dev = mesh.shape[FRAME_AXIS]
    base, rem = divmod(
        min(max_frames, n_frame_dev * _INT32_SAFE), n_frame_dev
    )

    def shard_body(state, key, x_vec, refill_vec):
        p_idx = jax.lax.axis_index(POINT_AXIS)
        f_idx = jax.lax.axis_index(FRAME_AXIS)
        quota = jnp.minimum(
            jnp.int32(base) + (f_idx < rem).astype(jnp.int32),
            jnp.int32(_INT32_SAFE),
        )
        ft_l = frame_tile
        if channel_type == "BEC" and ft_l == 0:
            ft_l = 16 if jnp.dtype(dec.message_dtype) == jnp.bfloat16 else 8
        body = functools.partial(
            _lanes_superstep, ldc, channel_type, iterations,
            "BP_MS" if channel_type == "BEC" else dec.cn_mode,
            batch_per_device, modulation, quota, k, n_outer, ft_l,
            dec.message_dtype, interpret, gen_watermark,
            dec.quant_scale, bool(getattr(dec, "layered", False)),
        )
        state, acc = body(
            jax.random.fold_in(jax.random.fold_in(key, p_idx), f_idx),
            x_vec[0], refill_vec[0], state,
        )
        acc = StreamDeltas(
            *(jax.lax.psum(a, FRAME_AXIS)[None] for a in acc)
        )
        return state, acc

    both = (POINT_AXIS, FRAME_AXIS)
    state_specs = LStreamState(
        llr_in=P(both, None),
        codeword=P(both, None),
        lv2c=P(both, None),
        done=P(both, None),
        iters=P(both, None),
        age=P(both, None),
        avail=P(both, None),
        ctr=P(both, None),
        fresh_llr=P(both, None),
        fresh_cw=P(both, None),
        fresh_lv2c=P(both, None),
        started=P(both),
    )
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(state_specs, P(), P(POINT_AXIS), P(POINT_AXIS)),
        out_specs=(
            state_specs,
            StreamDeltas(*(P(POINT_AXIS) for _ in range(5))),
        ),
        check_vma=False,
    )

    def init_fn(started_offset=None):
        st = _init_lanes_state(
            ldc, batch_per_device * n_points * n_frame_dev, dtype,
            n_dev=n_points * n_frame_dev,
        )
        if started_offset is not None:
            # EXACT per-point resume split — see streaming.split_exact_multi
            st = st._replace(
                started=jnp.asarray(
                    split_exact_multi(started_offset, n_frame_dev)
                )
            )
        from jax.sharding import NamedSharding

        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            st, state_specs,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, key, x_vec, refill_vec):
        return sharded(state, key, x_vec, refill_vec)

    return init_fn, step_fn
