"""Runtime configuration objects.

The reference carries three POD param structs across its C ABI
(``src/core/functions.h:107-127`` mirrored byte-compatibly in
``pyLDPC/ldpc.py:16-30``).  Here they are plain Python dataclasses — there is
no ABI to keep compatible, and everything is runtime-configurable (no
compile-time forks like the reference's ``SIM_FLAGS`` cache variable,
``CMakeLists.txt:9``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

#: Sentinel LLR magnitude used to pin "known" (shortened) bits, mirroring the
#: reference's ``99999.9`` (``src/sim/channel.cpp:84``).
SHORTEN_LLR = 99999.9

#: Clamp bounds applied to modulated-channel LLRs, mirroring the GPU stack's
#: ``MAX_LLR``/``MIN_LLR`` guards (``gpu/sim/ldpcsim.h:59-60``,
#: ``gpu/device/kernel.cpp:170-181``).
MAX_LLR = 9999.9
MIN_LLR = -9999.9


@dataclasses.dataclass(frozen=True)
class DecoderParams:
    """Decoder configuration (reference: ``decoder_param``,
    ``src/core/functions.h:107-112``).

    Attributes:
      early_term: stop per-frame once the hard decision is a codeword
        (``src/decoding/decoder.cpp:66-72``).
      iterations: max BP iterations (reference default 50,
        ``src/sim_cpu.cpp:14``).
      type: ``"BP"`` (exact sum-product via pairwise box-plus) or ``"BP_MS"``
        (min-sum).  Extensions beyond the CPU reference: ``"BP_TANH"``
        (sum-product in tanh-product form — the GPU stack's CN update,
        ``gpu/device/kernel.cpp:237-264``; same algorithm as ``BP`` with
        different rounding, ~5x fewer transcendentals per check — but its
        tanh-domain product caps extrinsics at ~17.3, measurably raising
        the deep error floor), ``"BP_PHI"`` (sum-product with the CN
        combine in Gallager's φ/log-tanh domain: the tanh form's
        transcendental count with box-plus dynamic range — the fast exact
        form without the floor caveat),
        ``"BP_LIN"`` (piecewise-linear correction, the GPU
        ``CN_APPROX_LIN``), ``"BP_NMS"``/``"BP_OMS"`` (normalized/offset
        min-sum).  Any other string behaves like ``"BP"``, matching
        ``ldpc_decoder_base::set_param`` (``src/decoding/decoder.h:73-80``).
    """

    early_term: bool = True
    iterations: int = 50
    type: str = "BP"
    #: Layered (serial) CN schedule, from the code's layerfile — the GPU
    #: stack's capability (``gpu/ldpc/ldpc.cpp:111-138``).  Flooding when
    #: False or when the code has no layers.
    layered: bool = False
    #: Normalized min-sum scale (used when ``type == "BP_NMS"``) and
    #: offset min-sum offset (``type == "BP_OMS"``) — standard
    #: hardware-decoder corrections, not present in the reference.
    ms_scale: float = 0.75
    ms_offset: float = 0.15
    #: Message storage/transport dtype for the fused Pallas kernel
    #: (``"float32"``, ``"bfloat16"`` or ``"int8"``).  bf16 halves VMEM
    #: residency and the Beneš transport cost at ~0.4% relative message
    #: quantisation (arithmetic stays float32); BER impact validated
    #: statistically in ``benchmarks/parity.py``.  int8 is quantized
    #: min-sum (messages = ``round(L / quant_scale)`` saturated to +-127)
    #: — requires a min-sum-family ``type`` and an MXU-block-local code;
    #: see :func:`libldpc_tpu.ops.pallas.decode_fused.bp_decode_pallas`.
    #: Ignored by the XLA paths.
    message_dtype: str = "float32"
    #: Quantisation step for ``message_dtype="int8"`` (default 0.1875:
    #: LLR span +-23.8 at ~0.19 resolution).
    quant_scale: float = 0.1875
    #: Edge-permutation transport for the fused Pallas kernel: ``"auto"``
    #: picks one-hot 128x128 block matmuls on the MXU when the code's
    #: permutation is block-local (structured/QC codes — 1.9x faster than
    #: the Beneš network on the bundled code, 2.3x in bf16) and the Beneš
    #: roll/select network otherwise.
    permute: str = "auto"
    #: Reproduce the reference's out-of-bounds scratch read for degree-1
    #: variable nodes in the BEC decoder (``src/decoding/decoder.cpp:155-160``
    #: indexes ``mExMsgF[vw-2]`` with ``vw == 1``).  The stale byte (0x00 in
    #: practice) makes degree-1 erased VNs emit a hard 0 instead of an
    #: erasure, which acts as a genie hint and inflates the reference's BEC
    #: performance on codes with degree-1 VNs (e.g. the bundled test code).
    #: False = correct peeling algorithm; True = bit-compatible curves.
    bec_ref_bug_compat: bool = False

    @property
    def use_minsum(self) -> bool:
        return self.type == "BP_MS"

    @property
    def cn_mode(self):
        """The (hashable) CN-operator spec passed to the decoders."""
        if self.type in ("BP_NMS", "BP_OMS"):
            return (self.type, self.ms_scale, self.ms_offset)
        return self.type


@dataclasses.dataclass(frozen=True)
class ChannelParams:
    """Channel configuration (reference: ``channel_param``,
    ``src/core/functions.h:114-119``).

    ``x_range`` is ``(min, max, step)`` with ``max`` exclusive, accumulated in
    float exactly like the reference sweep builder
    (``src/sim/ldpcsim.cpp:104-110``).  For BSC/BEC the sweep is run in
    reverse (worst erasure/crossover probability first,
    ``src/sim/ldpcsim.cpp:116-122``).
    """

    seed: int = 0
    x_range: Sequence[float] = (0.0, 2.0, 1.0)
    type: str = "AWGN"
    #: Explicit sweep-point list (used as-is, no reversal) — the GPU stack's
    #: simfile provides SNRs as a list (``gpu/sim/ldpcsim.cpp:87-98``).
    #: Overrides ``x_range`` when set.
    x_values: Optional[Sequence[float]] = None

    def sweep_values(self) -> list[float]:
        if self.x_values is not None:
            return [float(v) for v in self.x_values]
        lo, hi, step = self.x_range
        vals = []
        val = float(lo)
        while val < hi:
            vals.append(val)
            val += step
        if self.type in ("BSC", "BEC"):
            vals.reverse()
        return vals


@dataclasses.dataclass(frozen=True)
class SimulationParams:
    """Monte-Carlo sweep configuration (reference: ``simulation_param``,
    ``src/core/functions.h:121-127``).

    ``batch_size`` replaces the reference's OpenMP ``threads`` knob: instead
    of one frame per CPU thread (``src/sim/ldpcsim.cpp:150-153``) we decode
    ``batch_size`` frames per device step as a leading tensor axis.
    """

    batch_size: int = 1024
    max_frames: int = int(10e9)
    fec: int = 50
    result_file: Optional[str] = None
    #: Optional path for per-error-frame forensic logging (GPU stack's
    #: ``log_error``, ``gpu/sim/ldpcsim.cpp:351-464``).
    error_log_file: Optional[str] = None
    #: Also dump the full decided word and true codeword (hex-packed bit
    #: strings) per errored frame — the runtime equivalent of the GPU
    #: stack's ``LOG_CW`` compile-time flag (``gpu/make.sh`` ``-D`` define,
    #: ``src/sim/ldpcsim.cpp:235-237``).  Requires ``error_log_file``.
    error_log_codewords: bool = False
    #: Optional path for sweep checkpoint/resume state.
    checkpoint_file: Optional[str] = None
    #: Device batches kept in flight before the host reads counters.  >1
    #: hides dispatch/transfer latency (important on tunneled backends) at
    #: the cost of overshooting the stopping rule by up to
    #: ``(pipeline_depth-1)`` batches — statistically harmless, like the
    #: reference's in-flight OpenMP threads at stop time
    #: (``src/sim/ldpcsim.cpp:178-181``).
    pipeline_depth: int = 2
    #: Use the streaming compaction decoder for early-terminating sweeps
    #: (:mod:`libldpc_tpu.ops.streaming`): each batch lane is an
    #: independent frame stream that reloads on convergence, so device
    #: work per frame tracks ``avg_iter`` instead of the batch's slowest
    #: frame.  Applies when early termination is on and the point is not
    #: BEC/layered/Pallas/forensic (those use the batch decoders).
    streaming: bool = True
    #: Device passes per streaming super-step (0 = one decode's worth,
    #: ``iterations``).  Larger chunks amortise dispatch; the stopping
    #: rule is still evaluated between super-steps.
    streaming_chunk: int = 0
