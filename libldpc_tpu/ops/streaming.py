"""Streaming compaction decoder: early termination that strictly saves work.

The batch decoders (:func:`libldpc_tpu.ops.sorted.bp_decode_sorted`) run a
``while_loop`` gated on the *slowest* frame of the batch, so one
non-converging frame forces all ``iterations`` on everyone — sustained
early-termination sweeps ran ~3x slower than the fixed-iteration fast path
even at ``avg_iter ~ 13``.  The reference has no such inversion because
each OpenMP thread loops frames independently
(``src/sim/ldpcsim.cpp:150-256``): a thread that finishes a frame
immediately starts the next one.

This module is the TPU-native equivalent of that per-thread loop: each of
the ``batch`` lanes is an independent *frame stream*.  Every device
iteration advances all streams by one BP iteration; a stream whose frame
converges (or hits the iteration cap) is counted and *immediately reloaded
with a fresh frame*, so device work per decoded frame is proportional to
``avg_iter`` instead of ``max_iter``.  Decode semantics per frame are
identical to the batch decoder (same CN/VN order, same
break-before-increment iteration counts, decisions taken at first
convergence — ``src/decoding/decoder.cpp:11-78``).

Two tricks keep the per-iteration overhead small:

* **Warm-up-free reload.**  A fresh frame's messages are reloaded with
  the standard ``Lv2c = LLRIn[col]`` init, pre-gathered inside the
  channel-generation branch (one ``[nnz, B]`` gather per *generation*,
  amortised over a whole reload burst), so a reloaded stream starts at
  real iteration 1 (``age = 1``).  Externally injected state may still
  use the zero-init protocol (``age = 0``): one BP iteration on all-zero
  ``Lv2c`` outputs zero CN messages and reproduces the same init at the
  pass's end, with the convergence check gated off during that warm-up
  pass — per-frame counting is identical either way.
* **Free syndrome.**  The extrinsic update needs
  ``g = take(llr_out, col_sorted)`` anyway; the syndrome is the per-check
  parity of ``g <= 0`` (:func:`~libldpc_tpu.ops.sorted.syndrome_ok_from_posterior`),
  so early termination adds no extra gather.

The stopping rule composes with streaming as *refill gating*: while the
rule is unmet the driver calls steps with ``refill=True``; once met it
drains (``refill=False``) until every in-flight frame completes, so every
started frame is counted and the censoring bias of discarding
preferentially-slow frames is avoided (the reference's threads likewise
finish their current frame before observing the stop,
``src/sim/ldpcsim.cpp:255``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .channel import simulate_channel
from .sorted import (
    SortedDeviceCode,
    cn_update_sorted,
    syndrome_ok_from_posterior,
    vn_sum_sorted,
)

FRAME_AXIS = "frames"
POINT_AXIS = "points"


class StreamState(NamedTuple):
    """Per-stream decode state (pytree; arrays carry the batch on the last
    axis so it shards over the ``frames`` mesh axis)."""

    llr_in: jnp.ndarray  # f32 [nc, B] channel LLRs (sorted VN labelling)
    codeword: jnp.ndarray  # u8 [nc, B] true codeword
    lv2c: jnp.ndarray  # f32 [nnz, B] messages (CN-space edge slots)
    active: jnp.ndarray  # bool [B] stream holds an in-flight frame
    age: jnp.ndarray  # i32 [B] passes since reload (0 = warm-up pending)
    iters: jnp.ndarray  # i32 [B] reference-semantics iteration count
    started: jnp.ndarray  # i32 [1] frames started on this device so far


class StreamDeltas(NamedTuple):
    """Counters for frames *completed* during one super-step."""

    bit_errors: jnp.ndarray  # i32 scalar
    frame_errors: jnp.ndarray  # i32 scalar
    frames: jnp.ndarray  # i32 scalar
    iter_sum: jnp.ndarray  # i32 scalar
    n_active: jnp.ndarray  # i32 scalar: in-flight frames after the step


def _init_state(sdc: SortedDeviceCode, batch: int,
                n_dev: int = 1) -> StreamState:
    return StreamState(
        llr_in=jnp.zeros((sdc.nc, batch), jnp.float32),
        codeword=jnp.zeros((sdc.nc, batch), jnp.uint8),
        lv2c=jnp.zeros((sdc.nnz, batch), jnp.float32),
        active=jnp.zeros((batch,), bool),
        age=jnp.zeros((batch,), jnp.int32),
        iters=jnp.zeros((batch,), jnp.int32),
        started=jnp.zeros((n_dev,), jnp.int32),
    )


def _tx_mask(sdc: SortedDeviceCode) -> jnp.ndarray:
    """bool [nc]: transmitted-bit positions (sorted labelling) — bit errors
    count transmitted bits only (``src/sim/ldpcsim.cpp:184-188``)."""
    return jnp.zeros((sdc.nc,), bool).at[sdc.bit_pos].set(True)


def _superstep_body(
    sdc: SortedDeviceCode,
    channel_type: str,
    iterations: int,
    cn_mode,
    batch: int,
    modulation,
    quota,
    fast_rng: bool,
    gen_threshold: int,
    key: jax.Array,
    x_value: jnp.ndarray,
    refill: jnp.ndarray,
    state: StreamState,
    n_iters: int,
):
    is_tx = _tx_mask(sdc)[:, None]
    if fast_rng:
        # Hardware-RNG ("rbg") keys for the channel draws — measured
        # NEGATIVE result on v5e: 50x normal(1024x4096) takes 37 ms with
        # rbg vs 41 ms with threefry, because the uniform->normal erfinv
        # transform dominates, not bit generation.  Kept as an option
        # (identical distribution, backend-deterministic streams) but the
        # default stays threefry; the effective fix for channel-gen cost
        # is the idle-threshold gating below.
        key = jax.random.wrap_key_data(
            jax.random.bits(key, (4,), jnp.uint32), impl="rbg"
        )

    def one_pass(i, carry):
        st, acc = carry
        # --- one flooding BP iteration over every stream -----------------
        lc2v = cn_update_sorted(sdc, st.lv2c, cn_mode)
        lc2v_v = jnp.take(lc2v, sdc.perm_c2v, axis=0)
        llr_out = st.llr_in + vn_sum_sorted(sdc, lc2v_v)
        g = jnp.take(llr_out, sdc.col_sorted, axis=0)  # posterior at edges
        # --- convergence / iteration accounting --------------------------
        # warm-up passes (age == 0) only materialise the standard Lv2c
        # init; no check, no count — keeps per-frame semantics identical
        # to the batch decoder
        checking = st.active & (st.age >= 1)
        ok = syndrome_ok_from_posterior(sdc, g)
        newly = checking & ok
        iters = st.iters + (checking & ~ok).astype(jnp.int32)
        age = st.age + st.active.astype(jnp.int32)
        finished = st.active & (newly | (age >= iterations + 1))
        # --- count completed frames --------------------------------------
        hard = llr_out <= 0
        biterr = ((hard != (st.codeword > 0)) & is_tx).astype(jnp.int32).sum(0)
        acc = StreamDeltas(
            bit_errors=acc.bit_errors + jnp.where(finished, biterr, 0).sum(),
            frame_errors=acc.frame_errors
            + (finished & (biterr > 0)).astype(jnp.int32).sum(),
            frames=acc.frames + finished.astype(jnp.int32).sum(),
            iter_sum=acc.iter_sum + jnp.where(finished, iters, 0).sum(),
            n_active=acc.n_active,
        )
        active = st.active & ~finished
        # --- reload finished/idle streams with fresh frames --------------
        # Generating fresh frames costs ~30% of a decode pass (the
        # uniform->normal transform dominates); gate generation on enough
        # streams being idle so the cost amortises in the slow-convergence
        # regime, where few streams finish per pass, at the price of a
        # bounded idle wait (<~1 pass on average) for finished streams.
        idle = ~active
        do_gen = refill & (
            idle.astype(jnp.int32).sum() >= jnp.int32(gen_threshold)
        )

        def gen(k):
            ch = simulate_channel(
                sdc, channel_type, k, batch, x_value, modulation=modulation
            )
            # warm-up-free reload: pre-gather the standard Lv2c init
            # (``Lv2c = LLRIn[col]``) so a reloaded stream starts at real
            # iteration 1 — one pass cheaper per frame than zero-init
            return ch.llr, ch.codeword, jnp.take(ch.llr, sdc.col_sorted,
                                                 axis=0)

        def no_gen(k):
            return (
                jnp.zeros((sdc.nc, batch), st.llr_in.dtype),
                jnp.zeros((sdc.nc, batch), st.codeword.dtype),
                jnp.zeros((sdc.nnz, batch), st.lv2c.dtype),
            )

        fresh_llr, fresh_cw, fresh_lv2c = jax.lax.cond(
            do_gen, gen, no_gen, jax.random.fold_in(key, i)
        )
        rs = do_gen & idle  # [B] lane-broadcast reload mask
        # max_frames enforcement: never start more than this device's
        # quota of frames (the TPU equivalent of the reference's
        # per-frame `frames < maxFrames` check, src/sim/ldpcsim.cpp:255)
        rs = rs & (st.started[0] + jnp.cumsum(rs.astype(jnp.int32)) <= quota)
        started = st.started + rs.astype(jnp.int32).sum()[None]
        lv2c = jnp.where(rs, fresh_lv2c, g - lc2v)
        return (
            StreamState(
                llr_in=jnp.where(rs, fresh_llr, st.llr_in),
                codeword=jnp.where(rs, fresh_cw, st.codeword),
                lv2c=lv2c,
                active=active | rs,
                age=jnp.where(rs, 1, age),
                iters=jnp.where(rs, 0, iters),
                started=started,
            ),
            acc,
        )

    zero = jnp.int32(0)
    acc0 = StreamDeltas(zero, zero, zero, zero, zero)
    state, acc = jax.lax.fori_loop(0, n_iters, one_pass, (state, acc0))
    acc = acc._replace(n_active=state.active.astype(jnp.int32).sum())
    return state, acc


_INT32_SAFE = 2**31 - 2**20  # per-device start-quota clamp


def split_exact(total, parts: int) -> np.ndarray:
    """Split an already-counted frame offset (checkpoint resume) over
    ``parts`` per-device ``started`` counters so they sum to ``total``
    EXACTLY, with the remainder on low device indices — the same split the
    per-device quotas use (``base + (idx < rem)``), so each device's resume
    offset never exceeds its quota.

    Exactness matters: a ceil-division split overshoots by up to
    ``parts - 1`` frames, making ``max_frames`` unreachable when it is the
    binding stopping rule — the kernels grant zero starts once the
    per-device quota is consumed, counted frames stall short of
    ``max_frames``, and the driver would spin dispatching no-op supersteps
    forever."""
    total = int(min(int(total), parts * _INT32_SAFE))
    base, rem = divmod(total, parts)
    out = np.full(parts, base, np.int64)
    out[:rem] += 1
    return np.minimum(out, _INT32_SAFE).astype(np.int32)


def split_exact_multi(offsets, n_frame_dev: int) -> np.ndarray:
    """Per-point resume offsets, each split exactly over that point's
    ``n_frame_dev`` frame devices (2-D points x frames mesh)."""
    return np.concatenate(
        [split_exact(o, n_frame_dev) for o in np.asarray(offsets).ravel()]
    )


def make_streaming_step(
    sdc: SortedDeviceCode,
    channel_type: str,
    dec,
    batch_per_device: int,
    mesh: Optional[Mesh] = None,
    modulation=None,
    chunk_iters: int = 0,
    max_frames: int = int(10e9),
    fast_rng: bool = False,
    gen_threshold: Optional[int] = None,
):
    """Build ``(init_fn, step_fn)`` for the streaming decoder.

    ``step_fn(state, key, x_value, refill) -> (state, StreamDeltas)`` runs
    ``chunk_iters`` device passes (default ``iterations``) with the state
    donated, refilling finished streams when ``refill`` is truthy.  With a
    mesh, the state is sharded over the ``frames`` axis and the deltas are
    ``psum``-reduced, exactly like :func:`libldpc_tpu.parallel.mesh.make_sim_step`.

    ``max_frames`` is enforced on-device: each device holds a start quota
    (its share of ``max_frames``, clamped to int32 range — ~2.1e9 frames
    per device per sweep point) and stops reloading streams once it is
    consumed, so the drained total lands on ``min(max_frames, ...)``
    exactly.
    """
    if channel_type == "BEC":
        raise ValueError("streaming decode does not cover the BEC decoder")
    iterations = dec.iterations
    if iterations < 1:
        raise ValueError("streaming decode requires iterations >= 1")
    cn_mode = dec.cn_mode
    n_iters = chunk_iters or iterations
    if gen_threshold is None:
        # default: reload in bursts of ~1/16 of the pool — amortises the
        # channel-generation cost ~16x in the slow-convergence regime for
        # an average idle wait well under one pass elsewhere
        gen_threshold = max(1, batch_per_device // 16)

    def body_with_quota(quota):
        return functools.partial(
            _superstep_body, sdc, channel_type, iterations, cn_mode,
            batch_per_device, modulation, quota, fast_rng, gen_threshold,
        )

    if mesh is None:
        body = body_with_quota(jnp.int32(min(max_frames, _INT32_SAFE)))

        def init_fn(started_offset: int = 0):
            st = _init_state(sdc, batch_per_device)
            if started_offset:
                st = st._replace(
                    started=jnp.full((1,), min(started_offset, _INT32_SAFE),
                                     jnp.int32)
                )
            return st

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, key, x_value, refill):
            return body(key, x_value, refill, state, n_iters)

        return init_fn, step_fn

    n_dev = int(np.prod(mesh.devices.shape))
    base, rem = divmod(min(max_frames, n_dev * _INT32_SAFE), n_dev)

    def shard_body(state, key, x_value, refill):
        idx = jax.lax.axis_index(FRAME_AXIS)
        quota = jnp.minimum(
            jnp.int32(base) + (idx < rem).astype(jnp.int32),
            jnp.int32(_INT32_SAFE),
        )
        state, acc = body_with_quota(quota)(
            jax.random.fold_in(key, idx), x_value, refill, state, n_iters
        )
        acc = StreamDeltas(*(jax.lax.psum(a, FRAME_AXIS) for a in acc))
        return state, acc

    state_specs = StreamState(
        llr_in=P(None, FRAME_AXIS),
        codeword=P(None, FRAME_AXIS),
        lv2c=P(None, FRAME_AXIS),
        active=P(FRAME_AXIS),
        age=P(FRAME_AXIS),
        iters=P(FRAME_AXIS),
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
        st = _init_state(sdc, batch_per_device * n_dev, n_dev=n_dev)
        if started_offset:
            # distribute already-counted frames (checkpoint resume) over
            # the per-device quotas — EXACT split (sums to started_offset)
            st = st._replace(
                started=jnp.asarray(split_exact(started_offset, n_dev))
            )
        # commit to the mesh sharding so step_fn's buffer donation aliases
        # input and output shards exactly
        from jax.sharding import NamedSharding

        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            st, state_specs,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, key, x_value, refill):
        return sharded(state, key, x_value, refill)

    return init_fn, step_fn


def make_streaming_multipoint_step(
    sdc: SortedDeviceCode,
    channel_type: str,
    dec,
    batch_per_device: int,
    mesh: Mesh,
    modulation=None,
    chunk_iters: int = 0,
    max_frames: int = int(10e9),
    gen_threshold: Optional[int] = None,
):
    """Streaming compaction over a 2-D ``(points, frames)`` mesh.

    The point-parallel analogue of :func:`make_streaming_step`: every
    point group runs its own independent stream pool at its own sweep
    value.  ``step_fn(state, key, x_vec[n_points], refill_vec[n_points])
    -> (state, StreamDeltas with leading n_points axis)`` — per-point
    deltas come back ``psum``-reduced over the frames axis only, so the
    host can retire each point's stopping rule independently (refill
    gating + drain per point, exactly like the 1-D driver loop).

    This combines the two throughput features the reference lacks: sweep
    points in parallel (``src/sim/ldpcsim.cpp:141`` is strictly
    sequential) and early termination that strictly saves work.
    """
    if channel_type == "BEC":
        raise ValueError("streaming decode does not cover the BEC decoder")
    iterations = dec.iterations
    if iterations < 1:
        raise ValueError("streaming decode requires iterations >= 1")
    cn_mode = dec.cn_mode
    n_iters = chunk_iters or iterations
    if gen_threshold is None:
        gen_threshold = max(1, batch_per_device // 16)
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
            _superstep_body, sdc, channel_type, iterations, cn_mode,
            batch_per_device, modulation, quota, False, gen_threshold,
        )
        state, acc = body(
            jax.random.fold_in(jax.random.fold_in(key, p_idx), f_idx),
            x_vec[0], refill_vec[0], state, n_iters,
        )
        acc = StreamDeltas(
            *(jax.lax.psum(a, FRAME_AXIS)[None] for a in acc)
        )
        return state, acc

    both = (POINT_AXIS, FRAME_AXIS)
    state_specs = StreamState(
        llr_in=P(None, both),
        codeword=P(None, both),
        lv2c=P(None, both),
        active=P(both),
        age=P(both),
        iters=P(both),
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
            sdc, batch_per_device * n_points * n_frame_dev,
            n_dev=n_points * n_frame_dev,
        )
        if started_offset is not None:
            # per-point already-counted frames (checkpoint resume), split
            # EXACTLY over each point's frame devices
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
