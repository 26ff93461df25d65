"""Device-mesh scale-out for Monte-Carlo simulation.

The reference parallelises frames over OpenMP threads with atomic shared
counters (``src/sim/ldpcsim.cpp:150-256``) and has no multi-device or
multi-host story.  The TPU-native replacement is pure data parallelism over a
``jax.sharding.Mesh``: every device simulates and decodes its own sub-batch
of frames (with a device-distinct RNG fold), and the error counters are
globally reduced with ``jax.lax.psum`` — over ICI within a slice, over DCN
across hosts.  The host-side stopping rule then reads small replicated
scalars, replacing both the OpenMP atomics and the cooperative stop flag
polling.

``make_sim_step`` builds the one jitted function the sweep driver calls per
batch: channel simulation → decode → per-frame error counting → global
counter reduction.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.bec import bec_decode
from ..ops.channel import simulate_channel
from ..ops.decoder import bp_decode
from ..ops.device import DeviceCode
from ..ops.sorted import SortedDeviceCode, bp_decode_sorted
from ..utils.params import DecoderParams

FRAME_AXIS = "frames"
POINT_AXIS = "points"


class StepCounters(NamedTuple):
    """Counters for one decoded batch — the tensor analogue of the
    reference's ``bec/fec/frames/iters`` accumulators
    (``src/sim/ldpcsim.cpp:99-102``)."""

    bit_errors: jnp.ndarray  # int32 scalar: Σ wrong transmitted bits
    frame_errors: jnp.ndarray  # int32 scalar: frames with >=1 bit error
    frames: jnp.ndarray  # int32 scalar
    iter_sum: jnp.ndarray  # int32 scalar: Σ per-frame iterations
    frame_bit_errors: jnp.ndarray  # int32 [B]: per-frame error counts


class ForensicStepCounters(NamedTuple):
    """:class:`StepCounters` plus the per-frame decisions and truth, for
    per-error-frame forensic logging (GPU stack's ``log_error``,
    ``gpu/sim/ldpcsim.cpp:351-464``).  Only materialised when requested —
    the extra fields cost a [nc, B] device→host transfer per batch."""

    bit_errors: jnp.ndarray
    frame_errors: jnp.ndarray
    frames: jnp.ndarray
    iter_sum: jnp.ndarray
    frame_bit_errors: jnp.ndarray
    hard: jnp.ndarray  # uint8 [nc, B] decoded bits
    codeword: jnp.ndarray  # uint8 [nc, B] true codeword


def default_mesh(max_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over all (or the first ``max_devices``) local devices."""
    devs = jax.devices()
    if max_devices is not None:
        devs = devs[: max_devices]
    return jax.make_mesh((len(devs),), (FRAME_AXIS,), devices=devs)


def _sim_and_count(
    dcode: DeviceCode,
    key: jax.Array,
    x_value: jnp.ndarray,
    channel_type: str,
    dec: DecoderParams,
    batch: int,
    use_pallas: bool = False,
    modulation=None,
    forensics: bool = False,
) -> StepCounters:
    """One device-local batch: simulate channel, decode, count errors.

    Bit errors are counted over transmitted bits only (``bit_pos``), as in
    ``src/sim/ldpcsim.cpp:184-188``.
    """
    ch = simulate_channel(dcode, channel_type, key, batch, x_value,
                          modulation=modulation)
    if channel_type == "BEC":
        from ..ops.pallas.lanes_layout import LanesDeviceCode

        if isinstance(dcode, LanesDeviceCode):
            # fused BEC: min-sum over the sign encoding on the lane-major
            # kernel (ops/pallas/decode_lanes.bec_decode_lanes); the
            # stale-byte compat mode never routes here (driver keeps it
            # on the XLA path)
            from ..ops.pallas.decode_lanes import bec_decode_lanes

            out = bec_decode_lanes(
                dcode,
                ch.llr,
                ch.codeword,
                iterations=dec.iterations,
                early_term=dec.early_term,
                # bf16 is EXACT for the BEC sign/zero algebra (validated
                # bit-identical vs the XLA peeling decoder) and measured
                # ~3x faster than f32/Benes — always use it on clos/qc
                message_dtype=(
                    "bfloat16" if dcode.transport in ("clos", "qc")
                    else "float32"
                ),
            )
        elif isinstance(dcode, SortedDeviceCode):
            from ..ops.bec_sorted import bec_decode_sorted

            out = bec_decode_sorted(
                dcode,
                ch.llr,
                ch.codeword,
                iterations=dec.iterations,
                early_term=dec.early_term,
                degree1_stale_byte=0 if dec.bec_ref_bug_compat else None,
            )
        else:
            out = bec_decode(
                dcode,
                ch.llr,
                ch.codeword,
                iterations=dec.iterations,
                early_term=dec.early_term,
                degree1_stale_byte=0 if dec.bec_ref_bug_compat else None,
            )
        hard = out.hard
        iters = out.iterations
    else:
        if use_pallas:
            from ..ops.pallas.lanes_layout import LanesDeviceCode

            if isinstance(dcode, LanesDeviceCode):
                # lane-major fused kernel: the arbitrary-blocklength path
                # (frames on sublanes; see ops/pallas/decode_lanes.py),
                # flooding or layered (layouts built with with_layers).
                # bf16 messages require the clos transport (the layout
                # builder enforces the pairing).
                from ..ops.pallas import decode_lanes

                out = decode_lanes.bp_decode_lanes(
                    dcode,
                    ch.llr,
                    iterations=dec.iterations,
                    early_term=dec.early_term,
                    minsum_mode=dec.cn_mode,
                    layered=dec.layered,
                    message_dtype=(
                        dec.message_dtype
                        if dcode.transport in ("clos", "qc")
                        else "float32"
                    ),
                    quant_scale=dec.quant_scale,
                )
            else:
                from ..ops.pallas import decode_fused

                perm = dec.permute
                if perm == "auto":
                    # block-local plan -> one-hot MXU matmuls; otherwise the
                    # Clos factorisation if the layout shipped one (any
                    # permutation as MXU matmuls + tile moves); Benes last
                    if dcode.mxu_blocks_fwd is not None:
                        perm = "mxu"
                    elif dcode.clos_p1 is not None:
                        perm = "clos"
                    else:
                        perm = "benes"
                out = decode_fused.bp_decode_pallas(
                    dcode,
                    ch.llr,
                    iterations=dec.iterations,
                    early_term=dec.early_term,
                    minsum_mode=dec.cn_mode,
                    layered=dec.layered,
                    message_dtype=dec.message_dtype,
                    permute=perm,
                    quant_scale=dec.quant_scale,
                )
        elif isinstance(dcode, SortedDeviceCode):
            out = bp_decode_sorted(
                dcode,
                ch.llr,
                iterations=dec.iterations,
                early_term=dec.early_term,
                minsum_mode=dec.cn_mode,
                layered=dec.layered,
            )
        else:
            out = bp_decode(
                dcode,
                ch.llr,
                iterations=dec.iterations,
                early_term=dec.early_term,
                minsum_mode=dec.cn_mode,
                layered=dec.layered,
            )
        hard = out.hard.astype(jnp.uint8)
        iters = out.iterations

    tx_hard = hard[dcode.bit_pos]
    tx_true = ch.codeword[dcode.bit_pos]
    frame_errs = (tx_hard != tx_true).astype(jnp.int32).sum(axis=0)  # [B]
    base = StepCounters(
        bit_errors=frame_errs.sum(),
        frame_errors=(frame_errs > 0).astype(jnp.int32).sum(),
        frames=jnp.int32(batch),
        iter_sum=iters.astype(jnp.int32).sum(),
        frame_bit_errors=frame_errs,
    )
    if forensics:
        return ForensicStepCounters(
            *base, hard=hard.astype(jnp.uint8), codeword=ch.codeword
        )
    return base


def make_sim_step(
    dcode: DeviceCode,
    channel_type: str,
    dec: DecoderParams,
    batch_per_device: int,
    mesh: Optional[Mesh] = None,
    use_pallas: bool = False,
    modulation=None,
    forensics: bool = False,
) -> Callable[[jax.Array, jnp.ndarray], StepCounters]:
    """Build the jitted per-batch simulation step.

    Without a mesh the step runs on the default device.  With a mesh the
    same math runs under ``shard_map``: each device folds its
    ``axis_index`` into the RNG key (device-disjoint streams — the TPU
    equivalent of the reference's per-thread ``seed + i``,
    ``src/sim/ldpcsim.cpp:39``) and the scalar counters are ``psum``-reduced,
    so the caller always sees *global* counts.  Per-frame error vectors stay
    device-local and are all-gathered for forensic logging.
    """

    if mesh is None:

        @jax.jit
        def step(key: jax.Array, x_value: jnp.ndarray) -> StepCounters:
            return _sim_and_count(
                dcode, key, x_value, channel_type, dec, batch_per_device,
                use_pallas, modulation, forensics,
            )

        return step

    def shard_body(key: jax.Array, x_value: jnp.ndarray) -> StepCounters:
        idx = jax.lax.axis_index(FRAME_AXIS)
        local = _sim_and_count(
            dcode,
            jax.random.fold_in(key, idx),
            x_value,
            channel_type,
            dec,
            batch_per_device,
            use_pallas,
            modulation,
            forensics,
        )
        # per-frame outputs stay device-local shards; shard_map assembles
        # the global [batch] / [nc, batch] arrays from the P(FRAME_AXIS)
        # out_specs (an explicit all_gather here would make every device
        # return the full array and the concatenated result would repeat
        # each frame n_devices times)
        out = [
            jax.lax.psum(local.bit_errors, FRAME_AXIS),
            jax.lax.psum(local.frame_errors, FRAME_AXIS),
            jax.lax.psum(local.frames, FRAME_AXIS),
            jax.lax.psum(local.iter_sum, FRAME_AXIS),
            local.frame_bit_errors,
        ]
        if forensics:
            out.append(local.hard)
            out.append(local.codeword)
        return tuple(out)

    out_specs = [P(), P(), P(), P(), P(FRAME_AXIS)]
    if forensics:
        out_specs += [P(None, FRAME_AXIS), P(None, FRAME_AXIS)]
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=tuple(out_specs),
        check_vma=False,
    )

    cls = ForensicStepCounters if forensics else StepCounters

    @jax.jit
    def step(key: jax.Array, x_value: jnp.ndarray) -> StepCounters:
        out = sharded(key, x_value)
        return cls(*out)

    return step


def make_multipoint_sim_step(
    dcode,
    channel_type: str,
    dec: DecoderParams,
    batch_per_device: int,
    mesh: Mesh,
    use_pallas: bool = False,
    modulation=None,
    forensics: bool = False,
):
    """Sweep-point × frame parallelism over a 2-D mesh.

    The reference processes sweep points strictly sequentially
    (``src/sim/ldpcsim.cpp:141``).  On a pod slice with devices to spare, a
    2-D mesh ``(points, frames)`` simulates several sweep points
    concurrently: the x-value vector is sharded over the ``points`` axis,
    frames shard over the ``frames`` axis within each point group, and the
    counters come back per-point (``psum`` over frames only).

    Returns ``step(key, x_values[n_points]) -> counters with leading
    n_points axis`` where ``n_points = mesh.shape[POINT_AXIS]``.  With
    ``forensics`` the per-point decisions and truth come back too
    (``[n_points, nc, batch]``) so the wide driver can write the same
    per-error-frame log as the sequential one (the GPU stack's
    ``log_error`` works in its only driver mode,
    ``gpu/sim/ldpcsim.cpp:351-464`` — ours must work in every mode).
    """
    n_points = mesh.shape[POINT_AXIS]

    def shard_body(key, x_values):
        p_idx = jax.lax.axis_index(POINT_AXIS)
        f_idx = jax.lax.axis_index(FRAME_AXIS)
        local = _sim_and_count(
            dcode,
            jax.random.fold_in(jax.random.fold_in(key, p_idx), f_idx),
            x_values[0],  # this point group's shard
            channel_type,
            dec,
            batch_per_device,
            use_pallas,
            modulation,
            forensics,
        )
        out = [
            jax.lax.psum(local.bit_errors[None], FRAME_AXIS),
            jax.lax.psum(local.frame_errors[None], FRAME_AXIS),
            jax.lax.psum(local.frames[None], FRAME_AXIS),
            jax.lax.psum(local.iter_sum[None], FRAME_AXIS),
            jax.lax.all_gather(
                local.frame_bit_errors, FRAME_AXIS, tiled=True
            )[None],
        ]
        if forensics:
            # frame shards assemble on the last axis via the out_specs
            out.append(local.hard[None])
            out.append(local.codeword[None])
        return tuple(out)

    out_specs = [
        P(POINT_AXIS),
        P(POINT_AXIS),
        P(POINT_AXIS),
        P(POINT_AXIS),
        P(POINT_AXIS, None),
    ]
    if forensics:
        out_specs += [
            P(POINT_AXIS, None, FRAME_AXIS),
            P(POINT_AXIS, None, FRAME_AXIS),
        ]
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(POINT_AXIS)),
        out_specs=tuple(out_specs),
        check_vma=False,
    )

    cls = ForensicStepCounters if forensics else StepCounters

    @jax.jit
    def step(key: jax.Array, x_values: jnp.ndarray) -> StepCounters:
        if x_values.shape[0] != n_points:
            raise ValueError(
                f"x_values has {x_values.shape[0]} points, mesh expects {n_points}"
            )
        return cls(*sharded(key, x_values))

    return step
