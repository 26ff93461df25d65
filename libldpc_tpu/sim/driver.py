"""Monte-Carlo sweep driver.

TPU-native rebuild of ``ldpc_sim::start`` (``src/sim/ldpcsim.cpp:97-263``).
The reference runs an OpenMP parallel region per sweep point where each
thread loops encode → simulate → LLRs → decode one frame at a time, sharing
``bec/fec/frames/iters`` counters through atomics, until
``fec >= minFec || frames >= maxFrames || *stopFlag``
(``src/sim/ldpcsim.cpp:255``).

Here each sweep point instead runs *fixed-size device batches*: one jitted
step simulates and decodes ``batch`` frames entirely on device (optionally
sharded over a mesh with ``psum``-reduced counters) and returns four scalars;
the host evaluates the stopping rule between batches.  This is the standard
resolution of the dynamic-stopping-vs-static-shapes tension: device work is
static, control flow is host-side, and the cooperative stop flag is checked
between batches instead of between frames.

Preserved reference behaviours:

* sweep values built by float accumulation with the max exclusive, reversed
  for BSC/BEC (``ldpcsim.cpp:104-122``);
* live single-line console row per point in the same column format
  (``ldpcsim.cpp:137-139, 202-208``);
* results file rewritten in full whenever the numbers change
  (``ldpcsim.cpp:221-229``), columns ``snr fer ber frames avg_iter
  [frame_time]`` (``ldpcsim.cpp:128-134``);
* BER = bit_errors / (frames·nc) quirk (see
  :meth:`libldpc_tpu.sim.results.SimResults.update_point`);
* frame timing excludes printing/IO time (``ldpcsim.cpp:192-195,251``).

New capabilities: checkpoint/resume of the sweep state, per-error-frame
forensic logging (GPU stack's ``log_error``), and transparent multi-device /
multi-host scale-out.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from typing import Callable, Optional

import jax
import numpy as np

from ..models.code import LDPCCode
from ..models.io import format_result_row, write_results_file
from ..parallel.mesh import make_sim_step
from ..utils.params import ChannelParams, DecoderParams, SimulationParams
from .results import SimResults

#: Largest padded edge space the [edges, frames] fused kernel handles with
#: the Beneš transport on current hardware/toolchains: at n_pad = 8192 the
#: 25-stage unrolled Beneš fails to compile on-chip for every message
#: dtype (measured 2026-08-17: remote tpu_compile_helper crash / scoped
#: VMEM allocation failure), while MXU-block-local codes compile and run
#: far larger (n_pad 32768 QC measured 2.45x XLA).  Unstructured codes
#: beyond this route to the lane-major kernel (ops/pallas/decode_lanes.py:
#: frames on sublanes, 16x fewer vector tiles, any blocklength).
#: Module-level so tests can lower it to exercise the routing.
FUSED_EDGE_SPACE_LIMIT = 4096

#: Upper bound of the lane-major kernel's padded edge space.  Round-3's
#: n_pad = 65536 wall turned out to be a Mosaic limitation on programs
#: with a dataflow edge connecting two Beneš transport chains, not the
#: lane extent (benchmarks/probe_lane_wall*.py bisected it); above
#: ``decode_lanes.SPILL_FREE_LIMIT`` the kernels materialise every
#: cross-chain value through VMEM spill refs, and n_pad = 131072
#: (n = 32768 (3,6)-regular) compiles and decodes bit-identically to
#: the XLA sorted decoder (re-measured 2026-08-20 on v5e,
#: benchmarks/res_tp_bl_scale.txt).  n_pad = 262144 (n = 65536) sits AT
#: the chip's 128M VMEM wall: a 127.6M scoped stack was measured to
#: compile during round-4 bring-up, but the production toolchain crashes
#: on it today (f32, frame tiles 8 and 4 — failure rows in
#: res_tp_bl_scale.txt), so the guarded envelope stays at the last size
#: that compiles reproducibly.  Beyond it the driver falls back to the
#: XLA sorted decoder (still any-n, and for QC-alignable codes the
#: structure-aware transport extends fused decoding to n_pad = 393216
#: first — see QC_LANES_EDGE_SPACE_LIMIT) with the reroute recorded in
#: the results-file provenance.  Module-level so tests can lower it to
#: exercise the routing.
LANES_EDGE_SPACE_LIMIT = 131072

#: The structure-aware qc transport carries no switching network and no
#: one-hot matmul planes, so its wall sits furthest out — and the
#: round-5 segment-write spill (decode_lanes.qc_spill_transport) moved
#: it again: n = 262144 (3,6)-regular QC (n_pad = 786432, DOUBLE the
#: round-4 envelope which measured this size as failing) compiles and
#: decodes bit-exactly at 616 us/frame = 9.62x XLA (measured 2026-08-20
#: on v5e, benchmarks/res_qc_transport.txt).  The next octave is
#: unprobed; sub-32 dtypes widen to f32 well before this limit.
QC_LANES_EDGE_SPACE_LIMIT = 786432

#: The qc transport's sub-32-bit (bfloat16/int8) kernel forms wall
#: earlier than f32, and — since the round-5 segment-write spill
#: (decode_lanes.qc_spill_transport) — per (dtype, CN form): at
#: n_pad = 294912 (n = 98304 (3,6)-regular QC) every sub-32
#: combination EXCEPT bf16 with the exact pairwise box-plus compiles
#: and decodes (int8/BP_MS 179 us/frame = 10.1x XLA, 549 Mbits/s;
#: bf16 BP_MS/BP_LIN/BP_PHI/BP_TANH 198/282/237/220 us/frame = 6.4-9.1x),
#: while bf16/BP still crashes there (the round-4 wall) and 393216
#: crashes everything sub-32 (measured 2026-08-20 on v5e,
#: benchmarks/res_qc_transport.txt; f32 runs bit-exactly through
#: 393216).  Past a combination's wall the driver keeps the
#: structure-aware transport and widens messages to f32 (still 5-9x
#: the XLA decoder there) instead of crashing; fused BEC (whose sign
#: algebra rides the bf16 form, unprobed past the round-4 wall)
#: conservatively reroutes to the XLA peeling decoder at the lower
#: limit.
QC_LANES_SUB32_EDGE_SPACE_LIMIT = 196608  # bf16 exact-BP + fused-BEC wall
QC_LANES_SUB32_WIDE_EDGE_SPACE_LIMIT = 294912  # every other sub-32 combo

#: Clos-transport fill wall within the lane extent above.  Round 4
#: measured the crash at 55296 padded real edges (49152 compiled); the
#: round-5 chain-break spill (decode_lanes.clos_spill_transport,
#: triggered from the fill via CLOS_SPILL_FILL_LIMIT) moves the wall
#: past the whole n_pad = 65536 space — bf16/Clos now measures
#: 1.70x/1.98x/2.04x XLA at n = 18432/20480/21504 (fill 55296-64512,
#: 2026-08-20, benchmarks/res_tp_bl_scale.txt), so the limit is the
#: full lane extent.  The n_pad = 131072 bf16/Clos compile still
#: crashes even in spill form (same record) — past n_pad 65536 the
#: clos fallback below drops to f32/Benes lanes (or the XLA peeling
#: decoder for fused BEC) exactly as the fill case does.
CLOS_LANES_FILL_LIMIT = 65536

#: Measured FIXED-ITERATION (no early termination) throughput of the
#: f32/Benes lane-major kernel relative to the XLA sorted decoder on one
#: v5e chip — the perf-aware routing table behind
#: :func:`_select_layout`'s reroute.  Sources: n = 4096/8192 from
#: benchmarks/res_tp_bl_pallas.txt vs res_tp_bl_tpu.txt (batch 4096, BP,
#: 32 iters); n = 16384/32768 from benchmarks/res_tp_bl_scale.txt (batch
#: 256, fixed 32 iters, bit-exact check).  The kernel never beats XLA at
#: fixed iterations (~0.9x small, 0.53-0.70x large), so requesting
#: ``use_pallas`` for a fixed-iteration f32 job on an unstructured large
#: code would construct a measured-slower path: the driver reroutes those
#: to XLA (warn + provenance).  With early termination the picture
#: flips — the in-kernel streaming form measured 2.4-3.1x the XLA
#: streaming path at n = 8192 (round 3) and per-frame-tile in-kernel ET
#: beats the XLA decoder's whole-batch while_loop — so ET jobs stay on
#: the fused kernel.
LANES_F32_BENES_FIXED_ITER_VS_XLA = {
    4096: 0.90,
    8192: 0.95,
    16384: 0.53,
    32768: 0.70,
}


def _select_layout(code, decoder_params, channel_params, use_pallas,
                   record_fallback):
    """Device-layout + kernel-family selection shared by the simulation
    driver and the one-shot :meth:`libldpc_tpu.api.LDPC.decode` fast path.

    Applies, in order: the fused-BEC ride, the edge-major/lane-major
    kernel family choice with the structure-aware qc transport for
    QC-alignable codes, every measured compile-envelope fallback
    (``LANES_EDGE_SPACE_LIMIT`` / ``QC_LANES_*`` / ``CLOS_LANES_FILL_LIMIT``)
    and the measured perf-aware reroute
    (``LANES_F32_BENES_FIXED_ITER_VS_XLA``).  Every reroute goes through
    ``record_fallback(reason, warn_msg)``.

    Returns ``(dcode, use_pallas, decoder_params, bec_fused)`` —
    ``decoder_params`` may differ from the input (message dtype widened
    past a sub-32-bit envelope).
    """
    #: BEC runs fused on the lane-major kernel (min-sum over the sign
    #: encoding — see ops/pallas/decode_lanes.bec_decode_lanes;
    #: measured motivation: the XLA peeling path reached only ~5.5% of
    #: VPU peak, benchmarks/res_tp_bec.txt) — except in the layered or
    #: stale-byte bug-compat modes, which stay on the XLA decoder.
    bec_fused = (
        use_pallas
        and channel_params.type == "BEC"
        and not decoder_params.layered
        and not decoder_params.bec_ref_bug_compat
    )

    # the degree-class-sorted layout is the fast path for BP, BEC and
    # layered decoding (fused Pallas kernel over it when use_pallas)
    def _lanes_layout(generic_transport, with_layers=False):
        """Lane-major layout with the structure-aware qc transport
        when the code's QC structure survives into the lane layout
        (one cyclic roll per base edge — no switching network, no
        matmuls; see lanes_layout._derive_qc_segments), else the
        requested generic transport."""
        from ..ops.pallas.lanes_layout import to_lanes_device

        qc_meta = getattr(code, "qc", None)
        if qc_meta is not None:
            try:
                # any lifting size: Z % 128 == 0 rides single rolls, other
                # Z the embedded two-roll form (Z < 64 raises on the 2x
                # lane-inflation cap and falls through)
                return to_lanes_device(code, transport="qc",
                                       with_layers=with_layers)
            except ValueError:
                pass  # not qc-alignable: generic transport below
        return to_lanes_device(code, transport=generic_transport,
                               with_layers=with_layers)

    if bec_fused:
        # always Clos + bf16 for fused BEC (qc when the code is
        # QC-alignable): the sign/zero algebra is EXACT in bf16 (no
        # accuracy trade, unlike BP), and measured 2.8-3.3x the XLA
        # peeling path where the f32/Benes variant is SLOWER than XLA
        # (benchmarks/res_tp_bec.txt: the peeling algebra is too cheap
        # to amortise VPU roll stages)
        dcode = _lanes_layout("clos")
    elif decoder_params.layered and not (
        use_pallas and channel_params.type != "BEC"
    ):
        from ..ops.sorted import to_sorted_device

        dcode = to_sorted_device(code, with_layers=True)
    elif use_pallas and channel_params.type != "BEC":
        from ..ops.pallas.layout import to_pallas_device

        dcode = to_pallas_device(
            code, with_layers=decoder_params.layered, with_clos="auto"
        )
        _qc_meta = getattr(code, "qc", None)
        # Z >= 64: within the qc transport's 2x lane-inflation cap
        # (lanes_layout.to_lanes_device), so the structure-aware lanes
        # route beats the edge-major MXU kernel for any QC code
        if dcode.n_pad > FUSED_EDGE_SPACE_LIMIT and (
            dcode.mxu_blocks_fwd is None
            or (_qc_meta is not None and _qc_meta[0] >= 64)
        ):
            # Mosaic compile time scales with the vector tile count and
            # becomes pathological for [edges, frames] Benes kernels on
            # edge spaces this large (see ops/pallas/decode_fused.py).
            # Block-local (structured/QC) codes run the MXU-permute
            # kernel instead (n=8192 QC: 2.45x the XLA path, ~6 min
            # first compile, seconds warm); unstructured large codes
            # switch to the lane-major fused kernel
            # (ops/pallas/decode_lanes.py: frames on sublanes, 16x
            # fewer vector tiles, n=8192 compiles in ~16 s) — the
            # capability analogue of the reference GPU kernels' any-n
            # grid-stride loops (gpu/device/kernel.cpp:237-293) —
            # carrying layer planes when the layered schedule was
            # requested (kernel_layered in decode_lanes).
            # clos transport unlocks bf16 AND int8 messages (the
            # integer-lattice min-sum rides native s8 MXU matmuls —
            # available on unstructured codes since round 4) and
            # replaces the dominant intra-lane Benes rolls with MXU
            # matmuls + tile moves; f32 stays on Benes (the f32
            # HIGHEST-precision matmul form does not compile on
            # current Mosaic for lane-major shapes).  QC-alignable
            # codes take the structure-aware qc transport instead
            # (every dtype, no fill wall).
            dcode = _lanes_layout(
                "clos"
                if decoder_params.message_dtype in ("bfloat16", "int8")
                else "benes",
                with_layers=decoder_params.layered,
            )
    else:
        if use_pallas and channel_params.type == "BEC":
            # only the layered / stale-byte-compat BEC modes reroute
            # to the XLA peeling decoder
            record_fallback(
                "BEC layered/bug-compat mode -> xla peeling decoder",
                "fused BEC decoding supports neither the layered "
                "schedule nor the stale-byte bug-compat mode; running "
                "the XLA peeling decoder instead",
            )
        use_pallas = False
        from ..ops.sorted import to_sorted_device

        dcode = to_sorted_device(code)
    # lane-major kernel envelope: padded edge spaces past the toolchain
    # wall (see LANES_EDGE_SPACE_LIMIT) fall back to the XLA sorted
    # decoder — still any-n, ~3x slower than the fused kernel at the
    # envelope edge — with the reroute recorded in the provenance
    from ..ops.pallas.lanes_layout import LanesDeviceCode as _LDC

    _lanes_limit = (
        QC_LANES_EDGE_SPACE_LIMIT
        if isinstance(dcode, _LDC) and dcode.transport == "qc"
        else LANES_EDGE_SPACE_LIMIT
    )
    if (
        isinstance(dcode, _LDC)
        and dcode.n_pad > _lanes_limit
    ):
        record_fallback(
            f"lanes n_pad {dcode.n_pad} > envelope "
            f"{_lanes_limit} -> xla sorted decoder",
            f"padded edge space {dcode.n_pad} exceeds the "
            f"lane-major kernel's measured compile envelope "
            f"({_lanes_limit}); running the XLA sorted "
            f"decoder instead",
        )
        use_pallas = False
        from ..ops.sorted import to_sorted_device

        dcode = to_sorted_device(
            code, with_layers=decoder_params.layered
        )
    elif (
        isinstance(dcode, _LDC)
        and dcode.transport == "qc"
        and (
            (
                dcode.n_pad > QC_LANES_SUB32_EDGE_SPACE_LIMIT
                and (bec_fused
                     or (decoder_params.message_dtype == "bfloat16"
                         # unknown type strings behave like BP
                         # (src/decoding/decoder.h:73-80)
                         and decoder_params.type not in (
                             "BP_MS", "BP_NMS", "BP_OMS", "BP_LIN",
                             "BP_TANH", "BP_PHI")))
            )
            or (
                dcode.n_pad > QC_LANES_SUB32_WIDE_EDGE_SPACE_LIMIT
                and decoder_params.message_dtype in ("bfloat16", "int8")
            )
        )
    ):
        # the qc transport's bf16/int8 kernel forms wall earlier than
        # f32 (see QC_LANES_SUB32_EDGE_SPACE_LIMIT): between the two
        # walls, widen messages to f32 on the same structure-aware
        # transport (still 5-9x XLA, benchmarks/res_qc_transport.txt);
        # fused BEC — exact only in the bf16 sign algebra — reroutes
        # to the XLA peeling decoder.
        if bec_fused:
            record_fallback(
                f"qc n_pad {dcode.n_pad} > sub-32-bit envelope "
                f"{QC_LANES_SUB32_EDGE_SPACE_LIMIT} -> xla peeling "
                f"decoder",
                f"padded edge space {dcode.n_pad} exceeds the qc "
                f"transport's bf16 compile envelope "
                f"({QC_LANES_SUB32_EDGE_SPACE_LIMIT}); running the "
                f"XLA peeling decoder instead",
            )
            use_pallas = False
            bec_fused = False
            from ..ops.sorted import to_sorted_device

            dcode = to_sorted_device(code)
        else:
            import dataclasses as _dc

            _bp_form = decoder_params.type not in (
                "BP_MS", "BP_NMS", "BP_OMS", "BP_LIN", "BP_TANH",
                "BP_PHI")
            _lim = (QC_LANES_SUB32_EDGE_SPACE_LIMIT
                    if decoder_params.message_dtype == "bfloat16"
                    and _bp_form
                    else QC_LANES_SUB32_WIDE_EDGE_SPACE_LIMIT)
            record_fallback(
                f"qc n_pad {dcode.n_pad} > "
                f"{decoder_params.message_dtype} envelope {_lim} "
                f"-> f32 qc lanes",
                f"padded edge space {dcode.n_pad} exceeds the qc "
                f"transport's {decoder_params.message_dtype} compile "
                f"envelope ({_lim}); widening messages to float32 on "
                f"the same transport",
            )
            decoder_params = _dc.replace(
                decoder_params, message_dtype="float32"
            )
    elif isinstance(dcode, _LDC) and dcode.transport == "clos":
        # the Clos transport's wall is tighter than Benes'.  Round 5's
        # chain-break spill (decode_lanes.clos_spill_transport) cleared
        # the round-4 fill wall — bf16/Clos now runs the whole
        # n_pad = 65536 space at 1.7-2.0x XLA — but the n_pad = 131072
        # program still crashes the remote compiler even in spill form
        # (benchmarks/res_tp_bl_scale.txt, 2026-08-20), so both the
        # fill AND the lane extent gate here.  Past the envelope,
        # non-BEC decoding drops to the f32/Benes lanes kernel (still
        # fused, ~XLA-parity per pass but 3-4x XLA with in-kernel
        # streaming ET); fused BEC — where f32/Benes measured SLOWER
        # than XLA — reroutes to the XLA peeling decoder.
        cb = dcode.cn_blocks[-1]
        vb = dcode.vn_blocks[-1]
        fill = max(cb[0] + cb[1] * cb[2], vb[0] + vb[1] * vb[2])
        if fill > CLOS_LANES_FILL_LIMIT or dcode.n_pad > 65536:
            import dataclasses as _dc

            _what = (f"fill {fill}" if fill > CLOS_LANES_FILL_LIMIT
                     else f"n_pad {dcode.n_pad}")
            if channel_params.type == "BEC":
                record_fallback(
                    f"clos {_what} > envelope -> xla peeling decoder",
                    f"Clos transport {_what} exceeds the measured "
                    f"compile envelope (fill {CLOS_LANES_FILL_LIMIT} / "
                    f"n_pad 65536); running the XLA peeling decoder "
                    f"instead",
                )
                use_pallas = False
                bec_fused = False
                from ..ops.sorted import to_sorted_device

                dcode = to_sorted_device(code)
            else:
                record_fallback(
                    f"clos {_what} > envelope -> f32/benes lanes",
                    f"Clos transport {_what} exceeds the measured "
                    f"compile envelope (fill {CLOS_LANES_FILL_LIMIT} / "
                    f"n_pad 65536); running the f32/Benes lane-major "
                    f"kernel instead",
                )
                decoder_params = _dc.replace(
                    decoder_params, message_dtype="float32"
                )
                from ..ops.pallas.lanes_layout import to_lanes_device

                dcode = to_lanes_device(
                    code,
                    transport="benes",
                    with_layers=decoder_params.layered,
                )
    # perf-aware routing: the f32/Benes lane-major kernel never beats the
    # XLA sorted decoder at FIXED iterations (measured 0.53-0.95x — see
    # LANES_F32_BENES_FIXED_ITER_VS_XLA), so constructing it for a
    # no-early-termination job would hand the user a measured slowdown
    # for asking for the fast path.  Early-terminating jobs stay fused:
    # per-frame-tile in-kernel ET / in-kernel streaming are where the
    # lane-major kernel wins (2.4-3.1x XLA streaming at n = 8192).
    if (
        isinstance(dcode, _LDC)
        and dcode.transport == "benes"
        and not decoder_params.early_term
    ):
        record_fallback(
            "fixed-iteration f32/benes lanes measured slower than xla "
            "-> xla sorted decoder",
            "the f32/Benes lane-major kernel is measured slower than the "
            "XLA sorted decoder at fixed iterations (0.53-0.95x, "
            "benchmarks/res_tp_bl_scale.txt) — without early termination "
            "there is nothing for the fused kernel to win back; running "
            "the XLA sorted decoder instead",
        )
        use_pallas = False
        from ..ops.sorted import to_sorted_device

        dcode = to_sorted_device(code, with_layers=decoder_params.layered)

    # measured-slower KEPT paths (no reroute — the requested semantics
    # are honoured — but the perf contract says never construct a
    # measured-slower path silently; operating points from
    # benchmarks/res_qc_deployed.txt, Z=54 802.11n n=1296 rows):
    if isinstance(dcode, _LDC) and dcode.transport in ("benes", "clos"):
        import warnings as _w

        # (int8 on Clos was a measured-slower point here until round 5's
        # single-upcast middle network fixed it: 0.56x -> 2.46x XLA at
        # n=1296, benchmarks/res_qc_deployed.txt — no warning needed.)
        if (decoder_params.layered and len(dcode.layer_words) > 1
                and not dcode.qc_layers):
            _w.warn(
                "the layered schedule on a generic (non-QC) lane "
                "transport runs the exact full-space kernel, measured "
                "0.35-0.47x XLA flooding at fixed iterations "
                "(benchmarks/res_qc_deployed.txt); the fast layered "
                "engine needs QC structure with Z >= 64 — keeping the "
                "layered schedule as requested",
                UserWarning, stacklevel=2,
            )
    return dcode, use_pallas, decoder_params, bec_fused

_CONSOLE_HEADER = (
    "==============================================================="
    "=============================\n"
    "  FEC   |      FRAME     |   {xval}   |    BER     |    FER     "
    "| AVGITERS  |  TIME/FRAME   \n"
    "========+================+=========+============+============+="
    "==========+=============="
)


@dataclasses.dataclass
class _PointCounters:
    """Raw accumulators for one sweep point (reference:
    ``src/sim/ldpcsim.cpp:99-102``)."""

    bit_errors: int = 0
    frame_errors: int = 0
    frames: int = 0
    iter_sum: int = 0
    elapsed_s: float = 0.0
    next_batch: int = 0

    def as_list(self):
        return [
            self.bit_errors,
            self.frame_errors,
            self.frames,
            self.iter_sum,
            self.elapsed_s,
            self.next_batch,
        ]

    @classmethod
    def from_list(cls, vals):
        c = cls()
        (
            c.bit_errors,
            c.frame_errors,
            c.frames,
            c.iter_sum,
            c.elapsed_s,
            c.next_batch,
        ) = (
            int(vals[0]),
            int(vals[1]),
            int(vals[2]),
            int(vals[3]),
            float(vals[4]),
            int(vals[5]),
        )
        return c


class Simulator:
    """Drives a BER/FER sweep for one code over one channel family."""

    def __init__(
        self,
        code: LDPCCode,
        decoder_params: DecoderParams = DecoderParams(),
        channel_params: ChannelParams = ChannelParams(),
        simulation_params: SimulationParams = SimulationParams(),
        mesh=None,
        use_pallas: bool = False,
        modulation=None,
        verbose: bool = True,
    ):
        self.code = code
        self.dec = decoder_params
        self.ch = channel_params
        self.sim = simulation_params
        self.mesh = mesh
        self.verbose = verbose
        (self.dcode, use_pallas, decoder_params, _bec_fused) = \
            _select_layout(
                code, decoder_params, channel_params, use_pallas,
                self._record_fallback,
            )
        self.dec = decoder_params
        n_dev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
        if simulation_params.batch_size % n_dev:
            raise ValueError(
                f"batch_size {simulation_params.batch_size} not divisible by "
                f"{n_dev} mesh devices"
            )
        # modulation: (Constellation, bit_mapper) with the mapper in the
        # code's original bit labelling; relabelled here for sorted layouts
        # (GPU stack analogue: simfile/mapfile, gpu/sim/ldpcsim.cpp:48-138)
        mod_for_step = None
        if modulation is not None:
            if channel_params.type != "AWGN":
                raise ValueError("modulation requires the AWGN channel")
            cstl, mapper = modulation
            mapper = np.asarray(mapper, dtype=np.int64)
            if mapper.size != code.nct:
                raise ValueError(
                    f"bit mapper covers {mapper.size} bits, expected "
                    f"nct={code.nct} (reference check: gpu/sim/ldpcsim.cpp:117-122)"
                )
            # every driver layout (sorted / pallas / sorted-layered) uses the
            # sorted VN labelling
            from ..ops.sorted import sorted_vn_inv

            mapper = sorted_vn_inv(code)[mapper]
            import jax.numpy as jnp

            mod_for_step = (cstl, jnp.asarray(mapper.astype(np.int32)))
            # host copy for forensic Euclidean distances (log_error analogue)
            self._forensic_mod = (cstl, mapper)
        else:
            self._forensic_mod = None
        self._use_pallas = use_pallas
        self._mod_for_step = mod_for_step

        # all driver layouts relabel VNs; keep both maps for reporting
        # forensic bit indices in the code's original labelling
        from ..ops.sorted import sorted_vn_inv

        self._vn_inv = sorted_vn_inv(code)  # original -> sorted label
        unsort = np.empty_like(self._vn_inv)
        unsort[self._vn_inv] = np.arange(code.nc)
        self._vn_unsort = unsort  # sorted -> original label

        # streaming compaction (ops/streaming.py): the early-termination
        # fast path — per-stream reload makes ET strictly cheaper than
        # fixed-iteration decoding (vs. the batch decoder's whole-batch
        # while_loop, gated by its slowest frame)
        from ..ops.pallas.lanes_layout import LanesDeviceCode as _LanesDC

        stream_eligible = (
            simulation_params.streaming
            and decoder_params.early_term
            and decoder_params.iterations >= 1
            # BEC stays batch-stepped: in-kernel streaming exists for it
            # (make_streaming_lanes_step covers BEC over the sign-encoded
            # min-sum ride, drain-exact vs the batch kernel) but measured
            # at best a TIE with the batch fused path (n=8192, 48 vs 49
            # us/frame at avg_iter 32) and a 2-6x LOSS at n=1024 — BEC
            # iteration counts concentrate tightly, so the batch kernel's
            # per-tile early exit already captures the avg_iter saving
            # without the superstep machinery.  Negative result recorded
            # in benchmarks/EARLY_TERM.md.
            and channel_params.type != "BEC"
            # layered sweeps stream too since round 5 — on the fast
            # app-update engine only (the lanes layout must carry
            # natural-QC layers; kernel_stream_layered_qc).  Other
            # layered paths stay batch-stepped.
            and (
                not decoder_params.layered
                or (
                    use_pallas
                    and isinstance(self.dcode, _LanesDC)
                    and bool(getattr(self.dcode, "qc_layers", ()))
                )
            )
        )
        if stream_eligible and simulation_params.error_log_file is not None:
            # forensic logging needs the per-frame decisions of a whole
            # batch, which the streaming compaction pools don't surface —
            # the ET fast path drops to batch stepping.  Warned AND
            # recorded in the provenance like every other reroute (the
            # round-3 contract: no reroute is ever console-silent).
            self._record_fallback(
                "forensic error log -> streaming ET disabled (batch "
                "stepping)",
                "forensic error logging (error_log_file) needs whole-batch "
                "per-frame decisions, which the streaming compaction pools "
                "don't surface; the streaming ET fast path is disabled for "
                "this sweep (batch stepping instead)",
            )
        self._streaming = (
            stream_eligible and simulation_params.error_log_file is None
        )
        from ..ops.pallas.lanes_layout import LanesDeviceCode

        if (
            self._streaming
            and use_pallas
            and isinstance(self.dcode, LanesDeviceCode)
        ):
            # lane-major in-kernel streaming: measured 2.4-3.1x the XLA
            # streaming path at n=8192 (24 vs 56-74 us/frame sustained).
            # Cold Mosaic compile of the Clos/bf16 stream kernel at
            # n_pad=32768 takes minutes (persistent cache in .jax_cache)
            from ..ops.streaming_pallas import make_streaming_lanes_step

            self._stream_init, self._stream_step = make_streaming_lanes_step(
                self.dcode,
                channel_params.type,
                decoder_params,
                simulation_params.batch_size // n_dev,
                mesh=mesh,
                modulation=mod_for_step,
                chunk_iters=simulation_params.streaming_chunk,
                max_frames=simulation_params.max_frames,
            )
            self._step = None
        elif self._streaming and use_pallas:
            # streaming compaction with the decode chunks on the fused
            # Pallas kernel (ops/streaming_pallas.py)
            from ..ops.streaming_pallas import make_streaming_pallas_step

            self._stream_init, self._stream_step = make_streaming_pallas_step(
                self.dcode,
                channel_params.type,
                decoder_params,
                simulation_params.batch_size // n_dev,
                mesh=mesh,
                modulation=mod_for_step,
                chunk_iters=simulation_params.streaming_chunk,
                max_frames=simulation_params.max_frames,
            )
            self._step = None
        elif self._streaming:
            from ..ops.streaming import make_streaming_step

            self._stream_init, self._stream_step = make_streaming_step(
                self.dcode,
                channel_params.type,
                decoder_params,
                simulation_params.batch_size // n_dev,
                mesh=mesh,
                modulation=mod_for_step,
                chunk_iters=simulation_params.streaming_chunk,
                max_frames=simulation_params.max_frames,
            )
            self._step = None
        else:
            self._step = make_sim_step(
                self.dcode,
                channel_params.type,
                decoder_params,
                simulation_params.batch_size // n_dev,
                mesh=mesh,
                use_pallas=use_pallas,
                modulation=mod_for_step,
                forensics=simulation_params.error_log_file is not None,
            )
        self.results: Optional[SimResults] = None
        self.decode_path = self._describe_decode_path()

    def _record_fallback(self, reason: str, warn_msg: str = "") -> None:
        """Single choke point for every capability reroute: emits a
        ``UserWarning`` and stamps the reason into the results-file
        provenance via ``decode_path``, so no fallback is ever silent in
        either channel (every production caller passes ``warn_msg``; the
        empty default exists only for tests that stamp synthetic
        provenance)."""
        import warnings

        if warn_msg:
            warnings.warn(warn_msg, stacklevel=3)
        if not hasattr(self, "_fallback_reasons"):
            self._fallback_reasons: list[str] = []
        self._fallback_reasons.append(reason)

    def _describe_decode_path(self) -> str:
        """One-line description of the decode path actually constructed —
        kernel family, transport, message dtype, schedule, streaming mode,
        and any capability fallback taken — recorded in the results-file
        header so a silent fallback (e.g. an unsupported kernel/schedule
        combination rerouting to XLA) is visible in the artifact itself."""
        from ..ops.pallas.lanes_layout import LanesDeviceCode
        from ..ops.pallas.layout import PallasDeviceCode

        if isinstance(self.dcode, LanesDeviceCode):
            kernel = "pallas-lanes"
            transport = self.dcode.transport
        elif isinstance(self.dcode, PallasDeviceCode):
            kernel = "pallas-fused"
            transport = (
                "mxu" if self.dcode.mxu_blocks_fwd is not None
                else ("clos" if self.dcode.clos_p1 is not None else "benes")
            )
        else:
            kernel = "xla-sorted"
            transport = "gather"
        dtype = self.dec.message_dtype if self._use_pallas else "float32"
        if self.ch.type == "BEC" and kernel == "pallas-lanes":
            dtype = "bfloat16-exact"  # BEC sign/zero algebra is exact
        schedule = "flooding"
        if self.dec.layered:
            # the fast app-update engine runs when the lanes layout
            # carries natural-QC layer metadata (decode_lanes.
            # kernel_layered_qc); the exact full-space kernel otherwise
            schedule = (
                "layered-fast"
                if isinstance(self.dcode, LanesDeviceCode)
                and getattr(self.dcode, "qc_layers", ())
                else "layered"
            )
        parts = [
            f"kernel={kernel}",
            f"transport={transport}",
            f"dtype={dtype}",
            f"cn={self.dec.type}",
            f"schedule={schedule}",
            f"streaming={'on' if self._streaming else 'off'}",
        ]
        for reason in getattr(self, "_fallback_reasons", []):
            parts.append(f"fallback[{reason}]")
        return " ".join(parts)

    # ------------------------------------------------------------------ API

    def start(
        self,
        stop_flag: Optional[Callable[[], bool]] = None,
        resume: bool = False,
    ) -> SimResults:
        """Run the sweep.  ``stop_flag`` is polled between batches — the
        cooperative-cancellation analogue of the reference's ``bool*``
        threaded through the C ABI (``src/shared.cpp:26-30``)."""
        x_vals = self.ch.sweep_values()
        results = SimResults.empty(len(x_vals), x_vals)
        start_point = 0
        counters = _PointCounters()
        if resume:
            loaded = self._load_checkpoint(x_vals)
            if loaded is not None:
                results, start_point, counters = loaded

        self.results = results
        xval_name = "SNR" if self.ch.type == "AWGN" else "EPS"
        if self.verbose:
            print(_CONSOLE_HEADER.format(xval=xval_name))

        result_rows = [
            self._row(results, i) if results.frames[i] > 0 else ""
            for i in range(len(x_vals))
        ]

        key = jax.random.PRNGKey(self.ch.seed)

        if start_point < len(x_vals):
            # trigger compilation outside the frame clock so the first
            # point's time/frame is comparable to later points (the
            # reference's clock also starts after setup,
            # src/sim/ldpcsim.cpp:148); the warm-up batch is discarded
            if self._streaming:
                wstate, wacc = self._stream_step(
                    self._stream_init(),
                    jax.random.fold_in(key, 0x7FFFFFFF),
                    np.float32(x_vals[start_point]),
                    np.bool_(False),
                )
                int(wacc.frames)
                del wstate
            else:
                warm = self._step(
                    jax.random.fold_in(key, 0x7FFFFFFF),
                    np.float32(x_vals[start_point]),
                )
                int(warm.frames)

        for i in range(start_point, len(x_vals)):
            point_key = jax.random.fold_in(key, i)
            c = counters if i == start_point else _PointCounters()
            last_print_fec = -1

            def should_stop() -> bool:
                return stop_flag is not None and bool(stop_flag())

            if self._streaming:
                self._run_point_streaming(
                    i, x_vals, point_key, c, results, result_rows,
                    should_stop,
                )
                if self.verbose:
                    sys.stdout.write("\n")
                if should_stop():
                    break
                self._save_checkpoint(x_vals, results, i + 1, _PointCounters())
                continue

            # lookahead pipeline: keep a few batches in flight so the host
            # counter read never stalls the device (see
            # SimulationParams.pipeline_depth)
            depth = max(1, self.sim.pipeline_depth)
            inflight: list = []
            # rebase so a resumed point continues its accumulated time
            t_point = time.perf_counter() - c.elapsed_s

            def dispatch():
                inflight.append(
                    self._step(
                        jax.random.fold_in(point_key, c.next_batch),
                        np.float32(x_vals[i]),
                    )
                )
                c.next_batch += 1

            def can_dispatch() -> bool:
                # predictive max_frames gate: never launch a batch whose
                # frames couldn't be counted; fec overshoot of up to
                # depth-1 batches remains (documented, statistically fine)
                return (
                    c.frame_errors < self.sim.fec
                    and c.frames + len(inflight) * self.sim.batch_size
                    < self.sim.max_frames
                    and not should_stop()
                )

            while (
                c.frame_errors < self.sim.fec
                and c.frames < self.sim.max_frames
                and not should_stop()
            ) or inflight:
                while len(inflight) < depth and can_dispatch():
                    dispatch()
                out = inflight.pop(0)
                # one batched device_get: sequential int() reads each pay a
                # full dispatch+transfer round trip on remote-tunnel
                # backends (~40 ms each; 5 sequential reads measured ~800 ms)
                bec_, fec_, fr_, it_ = jax.device_get(
                    (out.bit_errors, out.frame_errors, out.frames,
                     out.iter_sum)
                )  # blocks until device done
                batch_bec = int(bec_)
                c.elapsed_s = time.perf_counter() - t_point  # excl. printing
                c.bit_errors += batch_bec
                c.frame_errors += int(fec_)
                c.frames += int(fr_)
                c.iter_sum += int(it_)

                results.update_point(
                    i,
                    bit_errors=c.bit_errors,
                    frame_errors=c.frame_errors,
                    frames=c.frames,
                    iter_sum=c.iter_sum,
                    elapsed_s=c.elapsed_s,
                    nc=self.code.nc,
                )
                t_io = time.perf_counter()
                if c.frame_errors != last_print_fec:
                    last_print_fec = c.frame_errors
                    result_rows[i] = self._row(results, i)
                    self._emit(results, i, x_vals[i], result_rows)
                if self.sim.error_log_file and batch_bec:
                    self._log_error_frames(out, x_vals[i], c.frames)
                self._save_checkpoint(x_vals, results, i, c)
                # don't charge printing/IO to the frame clock
                # (src/sim/ldpcsim.cpp:251)
                t_point += time.perf_counter() - t_io

            if self.verbose:
                sys.stdout.write("\n")
            if should_stop():
                break
            # point finished: checkpoint the *next* point at batch 0
            self._save_checkpoint(x_vals, results, i + 1, _PointCounters())

        return results

    # ------------------------------------------------------------- internals

    def _run_point_streaming(
        self, i, x_vals, point_key, c: _PointCounters,
        results: SimResults, result_rows, should_stop,
    ) -> None:
        """One sweep point on the streaming compaction decoder.

        Super-steps are dispatched with ``refill = stopping-rule-unmet``;
        once the rule trips, further steps run with ``refill=False`` until
        every in-flight frame drains, so every started frame is counted
        (no censoring of preferentially-slow frames).  Counter absorption
        lags dispatch by ``pipeline_depth`` steps to keep the device busy;
        the overshoot is bounded and statistically harmless (see
        :class:`~libldpc_tpu.utils.params.SimulationParams`).
        """
        x = np.float32(x_vals[i])
        state = self._stream_init(started_offset=c.frames)
        pending: list = []
        last_print_fec = -1
        n_active_last: Optional[int] = None
        # streaming supersteps are short (~one decode's worth of passes);
        # on remote-tunnel backends the per-absorb round trip (~40 ms) is
        # comparable to a whole superstep's device time, so the window
        # grows to >= 4 in-flight steps and ready counters are absorbed
        # coalesced.  The window slow-starts at 1 so easy points (rule met
        # within the first superstep) do not dispatch a full window of
        # overshoot; stopping-rule overshoot stays bounded by the window
        # (documented, statistically harmless; drain counts everything).
        depth = max(4, self.sim.pipeline_depth)
        window = 1
        stall_rounds = 0  # no-progress detector (quota-exhaustion guard)
        t_point = time.perf_counter() - c.elapsed_s

        def absorb(n: int = 1):
            nonlocal n_active_last, last_print_fec
            # ONE batched device_get for n supersteps: each device_get
            # pays a full dispatch+transfer round trip on remote-tunnel
            # backends (~40 ms — comparable to a whole superstep's device
            # time at slow sweep points), so reads are coalesced across
            # every superstep that is ready
            accs = [pending.pop(0) for _ in range(n)]
            vals = jax.device_get(
                [(a.bit_errors, a.frame_errors, a.frames, a.iter_sum,
                  a.n_active) for a in accs]
            )  # blocks until the last step finishes
            bec = 0
            c.elapsed_s = time.perf_counter() - t_point
            for bec_, fec_, fr_, it_, na_ in vals:
                bec += int(bec_)
                c.frame_errors += int(fec_)
                c.frames += int(fr_)
                c.iter_sum += int(it_)
                n_active_last = int(na_)
            c.bit_errors += bec
            if c.frames:
                results.update_point(
                    i,
                    bit_errors=c.bit_errors,
                    frame_errors=c.frame_errors,
                    frames=c.frames,
                    iter_sum=c.iter_sum,
                    elapsed_s=c.elapsed_s,
                    nc=self.code.nc,
                )
            t_io = time.perf_counter()
            if c.frame_errors != last_print_fec and c.frames:
                last_print_fec = c.frame_errors
                result_rows[i] = self._row(results, i)
                self._emit(results, i, float(x), result_rows)
            self._save_checkpoint(x_vals, results, i, c)
            return t_io

        while True:
            can_refill = (
                c.frame_errors < self.sim.fec
                and c.frames < self.sim.max_frames
                and not should_stop()
            )
            if not can_refill and n_active_last == 0 and not pending:
                break  # drained
            # fill the pipeline window, then absorb every ready superstep
            # in ONE coalesced device read
            while (can_refill or n_active_last != 0) and len(pending) < window:
                state, acc = self._stream_step(
                    state,
                    jax.random.fold_in(point_key, c.next_batch),
                    x,
                    np.bool_(can_refill),
                )
                c.next_batch += 1
                pending.append(acc)
            if pending:
                if not can_refill and n_active_last == 0:
                    n = len(pending)  # draining: flush everything
                else:
                    n = max(1, len(pending) - (window - 1) // 2)
                frames_before = c.frames
                t_io = absorb(n)
                # don't charge printing/IO to the frame clock
                t_point += time.perf_counter() - t_io
                # quota-exhaustion guard: refill is being requested, nothing
                # is in flight, and the absorbed supersteps made zero
                # progress — the per-device start quotas are consumed (e.g.
                # a resume offset written by an older build that split the
                # offset inexactly).  Treat as the max_frames rule met
                # instead of spinning no-op supersteps forever.
                if (
                    can_refill
                    and n_active_last == 0
                    and c.frames == frames_before
                ):
                    stall_rounds += 1
                    if stall_rounds >= 3 and not pending:
                        import warnings

                        warnings.warn(
                            "streaming point stalled with start quotas "
                            "exhausted before the stopping rule was met; "
                            "treating max_frames as reached"
                        )
                        break
                else:
                    stall_rounds = 0
            if can_refill:
                window = min(depth, window * 2)

    @staticmethod
    def _device_get_global(tree):
        """Host read of per-point device values in wide mode.  Per-point
        counters come back ``P(points)``-sharded; when the points axis
        spans processes those shards are not locally addressable, so the
        values are first replicated across processes (every process runs
        the identical host loop and must see identical global counters —
        the multi-host stopping-rule contract)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(tree, tiled=True)
        return jax.device_get(tree)

    def _row(self, results: SimResults, i: int) -> str:
        return format_result_row(
            results.x_values[i],
            results.fer[i],
            results.ber[i],
            int(results.frames[i]),
            results.avg_iter[i],
            results.time[i],
        )

    def _emit(self, results: SimResults, i: int, x: float, rows) -> None:
        """Console line + full results-file rewrite, reference format
        (``src/sim/ldpcsim.cpp:202-229``)."""
        if self.verbose:
            sys.stdout.write(
                "\r %2d/%2d  |  %12d  |  %.3f  |  %.2e  |  %.2e  |  %.1e  |  %.3fms"
                % (
                    int(results.fec[i]),
                    self.sim.fec,
                    int(results.frames[i]),
                    x,
                    results.ber[i],
                    results.fer[i],
                    results.avg_iter[i],
                    results.time[i] * 1e3,
                )
            )
            sys.stdout.flush()
        if self.sim.result_file:
            write_results_file(
                self.sim.result_file, rows, comment=self.decode_path
            )

    def _forensic_dE(self, hard_col, cw_col, tx_errs: int) -> float:
        """Squared-root Euclidean distance between the modulated true and
        decoded words (``gpu/sim/ldpcsim.cpp:423-431``).  BPSK (the CPU
        stack's map, ``src/sim/channel.cpp:54-59``) gives
        ``dE^2 = 4 * (# differing transmitted bits)``; with a constellation
        the bits are packed through the bit mapper to symbols first."""
        if self._forensic_mod is None:
            return 2.0 * float(np.sqrt(tx_errs))
        cstl, mapper = self._forensic_mod  # mapper [bits, n_sym] sorted labels
        bits = mapper.shape[0]
        weights = (1 << np.arange(bits - 1, -1, -1))[:, None]

        def symbols(col):
            lab = (col[mapper].astype(np.int64) * weights).sum(axis=0)
            return cstl.points[cstl.labels_rev[lab]]

        d = symbols(hard_col) - symbols(cw_col)
        return float(np.sqrt((d * d).sum()))

    def _log_error_frames(self, out, x: float, frames: int) -> None:
        """Forensic per-error-frame log — the capability of the GPU stack's
        ``log_error`` (``gpu/sim/ldpcsim.cpp:351-464``): per errored frame,
        the failed (transmitted-)bit indices, the Euclidean and Hamming
        distances between decision and truth, the syndrome weight and the
        failed check indices."""
        errs = np.asarray(out.frame_bit_errors)
        bad = np.nonzero(errs > 0)[0]
        if bad.size == 0:
            return
        hard = np.asarray(out.hard) if hasattr(out, "hard") else None
        cw = np.asarray(out.codeword) if hasattr(out, "codeword") else None

        def trunc(idx):
            s = ",".join(map(str, idx[:64]))
            return s + (f",...({idx.size} total)" if idx.size > 64 else "")

        with open(self.sim.error_log_file, "a") as f:
            for b in bad:
                line = (
                    f"x={x:g} frame={frames - len(errs) + int(b)} "
                    f"bit_errors={int(errs[b])}"
                )
                if hard is not None:
                    # full-word Hamming distance over all nc bits
                    # (gpu/sim/ldpcsim.cpp:380-388 counts over nc())
                    wrong = np.nonzero(hard[:, b] != cw[:, b])[0]
                    if self._vn_unsort is not None:
                        wrong = np.sort(self._vn_unsort[wrong])
                    synd = self.code.syndrome(
                        hard[self._vn_inv, b]
                        if self._vn_inv is not None
                        else hard[:, b]
                    )
                    failed_checks = np.nonzero(synd)[0]
                    dE = self._forensic_dE(hard[:, b], cw[:, b], int(errs[b]))
                    line += (
                        f" is_codeword={int(failed_checks.size == 0)}"
                        f" dE={dE:.3f} dH={wrong.size}"
                        f" syndrome_weight={failed_checks.size}"
                        f" failed_bits={trunc(wrong)}"
                        f" failed_checks={trunc(failed_checks)}"
                    )
                    if self.sim.error_log_codewords:
                        # LOG_CW capability: full decided word + true
                        # codeword, hex-packed MSB-first in the code's
                        # original bit labelling (gpu/make.sh -D LOG_CW)
                        def hexpack(col):
                            bits = (
                                col[self._vn_inv]
                                if self._vn_inv is not None else col
                            ).astype(np.uint8)
                            return np.packbits(bits).tobytes().hex()

                        line += (
                            f" decided_cw={hexpack(hard[:, b])}"
                            f" true_cw={hexpack(cw[:, b])}"
                        )
                f.write(line + "\n")

    # ------------------------------------------------------------ wide sweep

    def start_wide(
        self,
        mesh,
        stop_flag: Optional[Callable[[], bool]] = None,
        resume: bool = False,
    ) -> SimResults:
        """Point-parallel sweep over a 2-D ``(points, frames)`` mesh.

        The reference runs sweep points strictly sequentially
        (``src/sim/ldpcsim.cpp:141``); with devices to spare, groups of
        ``mesh.shape['points']`` points run concurrently, frames sharded
        within each group.  Each group runs until *every* point in it meets
        the stopping rule (once a point finishes, further batches for its
        slot are discarded).  Output totals match :meth:`start` semantics:
        same stopping rule per point, same results file format, live console
        status, and checkpoint/resume parity.
        """
        from ..parallel.mesh import POINT_AXIS, make_multipoint_sim_step

        n_pts_parallel = mesh.shape[POINT_AXIS]
        n_frame_dev = mesh.shape["frames"]
        if self.sim.batch_size % n_frame_dev:
            raise ValueError(
                f"batch_size {self.sim.batch_size} not divisible by "
                f"{n_frame_dev} frame-axis devices"
            )
        stream_bundle = None
        if self._streaming:
            # point-parallel streaming: each point group runs its own
            # stream pool with per-point refill gating + drain — the two
            # throughput features the reference lacks, composed
            from ..ops.pallas.layout import PallasDeviceCode
            from ..ops.pallas.lanes_layout import LanesDeviceCode

            kw = dict(
                modulation=self._mod_for_step,
                chunk_iters=self.sim.streaming_chunk,
                max_frames=self.sim.max_frames,
            )
            if self._use_pallas and isinstance(self.dcode, PallasDeviceCode):
                from ..ops.streaming_pallas import (
                    make_streaming_pallas_multipoint_step,
                )

                stream_bundle = make_streaming_pallas_multipoint_step(
                    self.dcode, self.ch.type, self.dec,
                    self.sim.batch_size // n_frame_dev, mesh, **kw,
                )
            elif self._use_pallas and isinstance(self.dcode, LanesDeviceCode):
                from ..ops.streaming_pallas import (
                    make_streaming_lanes_multipoint_step,
                )

                stream_bundle = make_streaming_lanes_multipoint_step(
                    self.dcode, self.ch.type, self.dec,
                    self.sim.batch_size // n_frame_dev, mesh, **kw,
                )
            else:
                from ..ops.streaming import make_streaming_multipoint_step

                sdc = (
                    self.dcode.sorted_dc
                    if isinstance(self.dcode,
                                  (PallasDeviceCode, LanesDeviceCode))
                    else self.dcode
                )
                stream_bundle = make_streaming_multipoint_step(
                    sdc, self.ch.type, self.dec,
                    self.sim.batch_size // n_frame_dev, mesh, **kw,
                )
        step = None
        if stream_bundle is None:
            step = make_multipoint_sim_step(
                self.dcode,
                self.ch.type,
                self.dec,
                self.sim.batch_size // n_frame_dev,
                mesh,
                use_pallas=self._use_pallas,
                modulation=self._mod_for_step,
                forensics=self.sim.error_log_file is not None,
            )
        x_vals = self.ch.sweep_values()
        results = SimResults.empty(len(x_vals), x_vals)
        group_start = 0
        resumed_counters: dict[int, _PointCounters] = {}
        resumed_batch = 0
        if resume:
            loaded = self._load_checkpoint_wide(x_vals)
            if loaded is not None:
                results, group_start, resumed_counters, resumed_batch = loaded
        self.results = results
        key = jax.random.PRNGKey(self.ch.seed)
        if self.verbose:
            xval_name = "SNR" if self.ch.type == "AWGN" else "EPS"
            print(_CONSOLE_HEADER.format(xval=xval_name))

        def emit_rows():
            if self.sim.result_file:
                rows = [
                    self._row(results, i) if results.frames[i] else ""
                    for i in range(len(x_vals))
                ]
                write_results_file(
                    self.sim.result_file, rows, comment=self.decode_path
                )

        for g0 in range(group_start, len(x_vals), n_pts_parallel):
            group = list(range(g0, min(g0 + n_pts_parallel, len(x_vals))))
            # pad the group to the mesh width by repeating the last point
            # (its duplicate stats are discarded)
            padded = group + [group[-1]] * (n_pts_parallel - len(group))
            xg = np.asarray([x_vals[i] for i in padded], dtype=np.float32)
            if g0 == group_start and resumed_counters:
                c = {i: resumed_counters.get(i, _PointCounters()) for i in group}
                batch_idx = resumed_batch
            else:
                c = {i: _PointCounters() for i in group}
                batch_idx = 0
            done_printed: set[int] = set()
            t_start = time.perf_counter() - max(
                (cc.elapsed_s for cc in c.values()), default=0.0
            )
            if stream_bundle is not None:
                stopped = self._wide_group_streaming(
                    stream_bundle, group, padded, x_vals, c, results,
                    key, g0, batch_idx, t_start, emit_rows, stop_flag,
                )
                if stopped:
                    return results
                if self.verbose:
                    for i in group:
                        if results.frames[i]:
                            sys.stdout.write(
                                "\r" + " " * 100 + "\r"
                                + self._row(results, i) + "\n"
                            )
                    sys.stdout.flush()
                self._save_checkpoint_wide(
                    x_vals, results, g0 + n_pts_parallel, {}, 0
                )
                continue
            while True:
                if stop_flag is not None and stop_flag():
                    return results

                def finished(i):
                    return (
                        c[i].frame_errors >= self.sim.fec
                        or c[i].frames >= self.sim.max_frames
                    )

                for i in group:
                    if finished(i) and i not in done_printed:
                        done_printed.add(i)
                        if self.verbose and results.frames[i]:
                            sys.stdout.write(
                                "\r" + " " * 100 + "\r"
                                + self._row(results, i) + "\n"
                            )
                            sys.stdout.flush()
                if all(finished(i) for i in group):
                    break
                out = step(
                    jax.random.fold_in(jax.random.fold_in(key, g0), batch_idx),
                    xg,
                )
                # one batched device_get (sequential reads pay ~40 ms each
                # on remote-tunnel backends)
                bec, fec, frames, iters = self._device_get_global(
                    (out.bit_errors, out.frame_errors, out.frames,
                     out.iter_sum)
                )
                batch_idx += 1
                elapsed = time.perf_counter() - t_start
                t_io = time.perf_counter()
                forensic_data = None  # fetched lazily, once per batch
                for slot, i in enumerate(padded[: len(group)]):
                    cc = c[i]
                    if (
                        cc.frame_errors >= self.sim.fec
                        or cc.frames >= self.sim.max_frames
                    ):
                        continue
                    cc.bit_errors += int(bec[slot])
                    cc.frame_errors += int(fec[slot])
                    cc.frames += int(frames[slot])
                    cc.iter_sum += int(iters[slot])
                    if self.sim.error_log_file and int(bec[slot]):
                        # per-point forensic log from the multipoint batch
                        # (same line format as the sequential driver's;
                        # finished slots are skipped above, so logged frames
                        # are exactly the counted ones)
                        import types

                        if forensic_data is None:
                            forensic_data = self._device_get_global(
                                (out.frame_bit_errors, out.hard,
                                 out.codeword)
                            )
                        fb_, hard_, cw_ = forensic_data
                        self._log_error_frames(
                            types.SimpleNamespace(
                                frame_bit_errors=fb_[slot],
                                hard=hard_[slot],
                                codeword=cw_[slot],
                            ),
                            x_vals[i],
                            cc.frames,
                        )
                    # per-point device window: each point owns its own
                    # slice of the points axis, so its honest elapsed time
                    # is the group wall-clock while it was still live (a
                    # finished point is `continue`d above, freezing its
                    # clock) — NOT an even split of group time, which would
                    # fabricate the TIME/FRAME column (the reference's is a
                    # real per-point measurement, src/sim/ldpcsim.cpp:192-195)
                    cc.elapsed_s = elapsed
                    results.update_point(
                        i,
                        bit_errors=cc.bit_errors,
                        frame_errors=cc.frame_errors,
                        frames=cc.frames,
                        iter_sum=cc.iter_sum,
                        elapsed_s=cc.elapsed_s,
                        nc=self.code.nc,
                    )
                if self.verbose:
                    status = "  ".join(
                        f"x={x_vals[i]:g}:{c[i].frame_errors}/{self.sim.fec}"
                        for i in group
                    )
                    sys.stdout.write(f"\r {status}"[:100].ljust(100))
                    sys.stdout.flush()
                emit_rows()
                self._save_checkpoint_wide(x_vals, results, g0, c, batch_idx)
                # don't charge printing/forensic/checkpoint IO to the group
                # frame clock (src/sim/ldpcsim.cpp:251 analogue)
                t_start += time.perf_counter() - t_io
            # group finished: checkpoint the next group at batch 0
            self._save_checkpoint_wide(
                x_vals, results, g0 + n_pts_parallel, {}, 0
            )
        emit_rows()
        return results

    def _wide_group_streaming(
        self, bundle, group, padded, x_vals, c, results, key, g0,
        batch_idx, t_start, emit_rows, stop_flag,
    ) -> bool:
        """One point group of :meth:`start_wide` on the streaming
        decoders: per-point refill gating + drain, per-point counters
        ``psum``-reduced over the frames axis.  Returns True when the
        stop flag tripped (the caller abandons the sweep)."""
        import jax.numpy as jnp

        init_fn, step_fn = bundle
        n_slots = len(padded)
        n_real = len(group)
        xg = jnp.asarray(
            np.asarray([x_vals[i] for i in padded], np.float32)
        )
        offsets = [
            c[padded[s]].frames if s < n_real else 0 for s in range(n_slots)
        ]
        state = init_fn(started_offset=offsets)
        pending: list = []
        n_active = np.full(n_slots, -1, np.int64)  # -1 = unknown yet
        depth = max(4, self.sim.pipeline_depth)
        window = 1  # slow-start (see _run_point_streaming)
        stall_rounds = 0  # no-progress detector (quota-exhaustion guard)

        def finished(i):
            return (
                c[i].frame_errors >= self.sim.fec
                or c[i].frames >= self.sim.max_frames
            )

        while True:
            if stop_flag is not None and stop_flag():
                return True
            all_fin = all(finished(i) for i in group)
            drained = all(n_active[s] == 0 for s in range(n_real))
            if all_fin and drained and not pending:
                return False
            while len(pending) < window and not (all_fin and drained):
                refill = jnp.asarray(
                    np.array(
                        [s < n_real and not finished(padded[s])
                         for s in range(n_slots)],
                        bool,
                    )
                )
                state, acc = step_fn(
                    state,
                    jax.random.fold_in(jax.random.fold_in(key, g0),
                                       batch_idx),
                    xg,
                    refill,
                )
                batch_idx += 1
                pending.append(acc)
            if not pending:
                continue
            n = len(pending) if (all_fin and drained) else max(
                1, len(pending) - (window - 1) // 2
            )
            if not all_fin:
                window = min(depth, window * 2)
            accs = [pending.pop(0) for _ in range(n)]
            vals = self._device_get_global(
                [(a.bit_errors, a.frame_errors, a.frames, a.iter_sum,
                  a.n_active) for a in accs]
            )
            elapsed = time.perf_counter() - t_start
            frames_before = sum(c[i].frames for i in group)
            for bec, fec, fr, it, na in vals:
                for s in range(n_real):
                    i = padded[s]
                    cc = c[i]
                    was_live = not finished(i)
                    cc.bit_errors += int(bec[s])
                    cc.frame_errors += int(fec[s])
                    cc.frames += int(fr[s])
                    cc.iter_sum += int(it[s])
                    # per-point device window (see the non-streaming loop):
                    # advance a point's clock while it is live or still
                    # draining counted frames; freeze it once done
                    if was_live or int(fr[s]):
                        cc.elapsed_s = elapsed
                n_active = np.asarray(na, np.int64)
            for i in group:
                if c[i].frames:
                    results.update_point(
                        i,
                        bit_errors=c[i].bit_errors,
                        frame_errors=c[i].frame_errors,
                        frames=c[i].frames,
                        iter_sum=c[i].iter_sum,
                        elapsed_s=c[i].elapsed_s,
                        nc=self.code.nc,
                    )
            t_io = time.perf_counter()
            if self.verbose:
                status = "  ".join(
                    f"x={x_vals[i]:g}:{c[i].frame_errors}/{self.sim.fec}"
                    for i in group
                )
                sys.stdout.write(f"\r {status}"[:100].ljust(100))
                sys.stdout.flush()
            emit_rows()
            self._save_checkpoint_wide(x_vals, results, g0, c, batch_idx)
            # don't charge printing/checkpoint IO to the group frame clock
            t_start += time.perf_counter() - t_io
            # quota-exhaustion guard (see _run_point_streaming): unfinished
            # points, nothing in flight anywhere, zero progress — the
            # per-device start quotas are consumed; stop this group instead
            # of spinning forever.
            if (
                not all(finished(i) for i in group)
                and all(n_active[s] == 0 for s in range(n_real))
                and sum(c[i].frames for i in group) == frames_before
            ):
                stall_rounds += 1
                if stall_rounds >= 3 and not pending:
                    import warnings

                    warnings.warn(
                        "wide streaming group stalled with start quotas "
                        "exhausted before the stopping rule was met; "
                        "treating max_frames as reached"
                    )
                    return False
            else:
                stall_rounds = 0

    # --------------------------------------------------------- checkpointing

    def _checkpoint_config(self) -> dict:
        """Experiment identity stored with every checkpoint: the full
        decoder configuration, the batch size (which fixes the RNG stream
        mapping) and the constructed decode path.  Resuming under a
        different value of any of these would merge statistics from two
        different experiments into one curve, so the loaders refuse (start
        fresh with a warning) on mismatch.  ``fec``/``max_frames`` are
        deliberately NOT part of the identity: raising them to extend a
        finished sweep is a legitimate, statistics-preserving resume (the
        stopping rule is evaluated on the host, not baked into the data)."""
        return {
            "dec": dataclasses.asdict(self.dec),
            "batch_size": self.sim.batch_size,
            "decode_path": self.decode_path,
        }

    def _check_checkpoint_config(self, state: dict) -> bool:
        """True when the checkpoint's experiment identity matches this
        simulator's; warns and returns False otherwise (the caller starts
        the sweep fresh rather than merging incompatible statistics)."""
        import warnings

        stored = state.get("config")
        if stored == self._checkpoint_config():
            return True
        if stored is None:
            warnings.warn(
                "checkpoint predates config stamping (no experiment "
                "identity recorded); refusing to resume — starting fresh"
            )
        else:
            cur = self._checkpoint_config()
            diffs = [
                k for k in set(stored) | set(cur)
                if stored.get(k) != cur.get(k)
            ]
            warnings.warn(
                "checkpoint was written by a different experiment "
                f"configuration (mismatched: {', '.join(sorted(diffs))}); "
                "refusing to resume — starting fresh"
            )
        return False

    def _save_checkpoint(
        self, x_vals, results: SimResults, point: int, c: _PointCounters
    ) -> None:
        if not self.sim.checkpoint_file:
            return
        state = {
            "x_vals": list(map(float, x_vals)),
            "point": point,
            "counters": c.as_list(),
            "seed": self.ch.seed,
            "channel": self.ch.type,
            "config": self._checkpoint_config(),
            "results": json.loads(results.to_json()),
        }
        tmp = self.sim.checkpoint_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.sim.checkpoint_file)

    def _save_checkpoint_wide(
        self, x_vals, results: SimResults, group_start: int,
        counters: dict, batch_idx: int,
    ) -> None:
        if not self.sim.checkpoint_file:
            return
        state = {
            "wide": True,
            "x_vals": list(map(float, x_vals)),
            "group_start": group_start,
            "batch_idx": batch_idx,
            "counters": {str(i): c.as_list() for i, c in counters.items()},
            "seed": self.ch.seed,
            "channel": self.ch.type,
            "config": self._checkpoint_config(),
            "results": json.loads(results.to_json()),
        }
        tmp = self.sim.checkpoint_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.sim.checkpoint_file)

    def _load_checkpoint_wide(self, x_vals):
        path = self.sim.checkpoint_file
        if not path or not os.path.exists(path):
            return None
        with open(path) as f:
            state = json.load(f)
        if (
            not state.get("wide")
            or state.get("x_vals") != list(map(float, x_vals))
            or state.get("seed") != self.ch.seed
            or state.get("channel") != self.ch.type
        ):
            return None  # sweep config changed; start fresh
        if not self._check_checkpoint_config(state):
            return None  # experiment identity changed; warned, start fresh
        results = SimResults.from_json(json.dumps(state["results"]))
        counters = {
            int(i): _PointCounters.from_list(v)
            for i, v in state["counters"].items()
        }
        return results, state["group_start"], counters, state["batch_idx"]

    def _load_checkpoint(self, x_vals):
        path = self.sim.checkpoint_file
        if not path or not os.path.exists(path):
            return None
        with open(path) as f:
            state = json.load(f)
        if (
            state.get("x_vals") != list(map(float, x_vals))
            or state.get("seed") != self.ch.seed
            or state.get("channel") != self.ch.type
        ):
            return None  # sweep config changed; start fresh
        if not self._check_checkpoint_config(state):
            return None  # experiment identity changed; warned, start fresh
        results = SimResults.from_json(json.dumps(state["results"]))
        return results, state["point"], _PointCounters.from_list(state["counters"])
