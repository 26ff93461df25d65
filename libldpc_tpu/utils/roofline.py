"""VPU roofline / operation-count model for the decode paths.

The reference publishes no performance numbers (``BASELINE.md``), so this
repo's own figures are the baseline — which means they must be
*interpretable*: frames/s alone says nothing about how much headroom is
left.  This module prices one decoded frame in VPU operations for each
path (fused Pallas kernel vs XLA sorted layout) and relates measured
frames/s to the chip's VPU peak.

The decoder does no matmuls: every op is elementwise VPU work (the MXU is
idle — see ``docs/DESIGN.md`` for the measured negative result on MXU
permutations).  The natural roofline is therefore **VPU issue rate**, not
HBM bandwidth (the fused kernel's messages are VMEM-resident; HBM traffic
per frame is only the input LLRs and outputs, ~16 KB at n=1024 vs ~40 MB
of VPU traffic).

Operation counting conventions (all counts per frame per iteration):

* one pairwise box-plus = ``BOXPLUS_OPS`` VPU ops (2 abs, 1 min, 2 sign
  extractions, 3 mul/add for the core, plus two softplus evaluations
  priced at ``TRANSCENDENTAL_OPS`` each — exp and log1p both occupy the
  VPU transcendental pipe for multiple cycles);
* one pairwise min-sum = ``MINSUM_OPS`` ops (same minus the correction);
* CN exclusion combine over a degree-``d`` check: ``3d - 4`` pairwise ops
  (forward ``d-1``, backward ``d-1``, interior combines ``d-2``);
* one Beneš stage: 2 ``roll``s + 1 compare + 1 select over the padded
  edge space = ``BENES_STAGE_OPS`` ops per element (a roll is a lane/
  sublane move through the permute unit — 1 op per element per roll);
* VN stage: per-VN message sum (``nnz`` adds), posterior add (``nc``),
  extrinsic subtract (``nnz``);
* syndrome check (early-term path): sign extract + parity accumulate
  ≈ 3 ops per edge.

VPU peak: a v5e TensorCore issues 8x128 lanes x 4 ALUs per cycle at
940 MHz ≈ 3.85e12 f32 ops/s.  This is the documented assumption behind
``roofline_pct``; absolute percentages inherit its accuracy, ratios
between paths do not depend on it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

#: Assumed VPU peak for TPU v5e (8 sublanes x 128 lanes x 4 ALUs x 940 MHz).
VPU_PEAK_OPS = 8 * 128 * 4 * 0.94e9

#: VPU ops charged per transcendental (exp / log1p occupy the pipe longer
#: than an add; 4 is the conventional deduction used here).
TRANSCENDENTAL_OPS = 4

BOXPLUS_OPS = 8 + 2 * (1 + TRANSCENDENTAL_OPS)  # core + 2 softplus
MINSUM_OPS = 7
#: tanh-product form (exact sum-product, the reference GPU update,
#: ``gpu/device/kernel.cpp:237-264``): per input edge one ``tanh_pre``
#: (exp + divide), per output edge one ``tanh_post`` (log + divide);
#: pairwise combines collapse to single multiplies.
TANH_PRE_OPS = 2 + TRANSCENDENTAL_OPS
TANH_POST_OPS = 3 + TRANSCENDENTAL_OPS
#: phi (log-tanh domain) form: forward = exp + 2 log1p + max per input
#: edge, inverse = tanh + log + max per output edge; pairwise combines
#: are a sign multiply + magnitude add (2 ops).
PHI_IN_OPS = 2 + 3 * TRANSCENDENTAL_OPS
PHI_OUT_OPS = 2 + 2 * TRANSCENDENTAL_OPS
BENES_STAGE_OPS = 4


#: Assumed MXU peak for TPU v5e (bf16).
MXU_PEAK_FLOPS = 197e12


@dataclasses.dataclass(frozen=True)
class FrameCost:
    """Per-frame operation budget at a fixed iteration count."""

    cn_ops: float  # check-node exclusion combines
    permute_ops: float  # Beneš stages (pallas) or gather cost proxy (xla)
    vn_ops: float  # VN sums + posterior + extrinsic
    syndrome_ops: float  # early-termination checks
    other_ops: float  # init gather + channel (AWGN sim + LLRs)
    iterations: float
    #: MXU matmul flops per frame when the permutation runs as one-hot
    #: block matmuls (0 when the Beneš/gather transport is used — those
    #: are charged to ``permute_ops`` on the VPU instead)
    mxu_flops: float = 0.0

    @property
    def total_ops(self) -> float:
        """VPU ops per frame (the MXU budget is separate)."""
        return (
            self.cn_ops + self.permute_ops + self.vn_ops
            + self.syndrome_ops + self.other_ops
        )

    def as_dict(self) -> dict:
        return {
            "cn_ops": round(self.cn_ops),
            "permute_ops": round(self.permute_ops),
            "vn_ops": round(self.vn_ops),
            "syndrome_ops": round(self.syndrome_ops),
            "other_ops": round(self.other_ops),
            "total_ops": round(self.total_ops),
            "mxu_flops": round(self.mxu_flops),
            "iterations": self.iterations,
        }


def _cn_pairwise_ops(cn_classes) -> float:
    """Pairwise-op applications per CN-update sweep (all checks)."""
    total = 0.0
    for count, d in cn_classes:
        if d >= 2:
            total += count * (3 * d - 4)
    return total


def decode_frame_cost(
    *,
    nc: int,
    nnz: int,
    cn_classes,
    iterations: float,
    minsum: bool = False,
    cn_form: str = "auto",
    early_term: bool = True,
    n_pad: Optional[int] = None,
    benes_stages: Optional[int] = None,
    channel: bool = True,
    mxu_pairs: int = 0,
) -> FrameCost:
    """Operation budget for one decoded frame.

    ``n_pad``/``benes_stages`` set -> fused Pallas kernel (permutation =
    2 Beneš applications per iteration over the padded edge space + one
    for the Lv2c init); otherwise the XLA sorted path (permutation = 2
    ``jnp.take`` gathers per iteration, priced at 2 ops/element as a
    *lower bound* — XLA gathers on TPU re-stream HBM and cost strictly
    more than this model charges, which only flatters the XLA path).
    """
    if cn_form == "auto":
        cn_form = "minsum" if minsum else "boxplus"
    if cn_form in ("tanh", "phi"):
        # pairwise combines are cheap (tanh: one multiply; phi: sign
        # multiply + magnitude add); the transcendental work moves to the
        # per-edge pre/post transforms
        pair = 1.0 if cn_form == "tanh" else 2.0
        pre, post = (
            (TANH_PRE_OPS, TANH_POST_OPS) if cn_form == "tanh"
            else (PHI_IN_OPS, PHI_OUT_OPS)
        )
        cn = _cn_pairwise_ops(cn_classes) * pair
        for count, d in cn_classes:
            if d >= 2:
                cn += count * d * (pre + post)
        cn *= iterations
    else:
        op_cost = MINSUM_OPS if cn_form == "minsum" else BOXPLUS_OPS
        cn = _cn_pairwise_ops(cn_classes) * op_cost * iterations
    mxu_flops = 0.0
    if mxu_pairs:
        # one-hot block matmuls on the MXU: 2*128*128 flops per pair per
        # batch element, two transports per iteration plus the init
        mxu_flops = mxu_pairs * 2 * 128 * 128 * (2 * iterations + 1)
        permute = 0.0
    elif n_pad is not None:
        stages = benes_stages if benes_stages is not None else 0
        per_pass = n_pad * stages * BENES_STAGE_OPS
        permute = per_pass * (2 * iterations + 1)
    else:
        permute = 2 * nnz * 2 * iterations
    vn = (2 * nnz + nc) * iterations
    synd = 3 * nnz * iterations if early_term else 3 * nnz
    # AWGN channel: normal draw (~8 ops incl. transcendentals), BPSK map,
    # LLR scale per transmitted bit; encode matmul runs on the MXU and is
    # not charged against the VPU budget
    other = (12 * nc) if channel else 0
    return FrameCost(
        cn_ops=cn,
        permute_ops=permute,
        vn_ops=vn,
        syndrome_ops=synd,
        other_ops=other,
        iterations=iterations,
        mxu_flops=mxu_flops,
    )


def roofline_pct(frames_per_s: float, cost: FrameCost,
                 peak_ops: float = VPU_PEAK_OPS) -> float:
    """Fraction of the assumed VPU peak the measured rate corresponds to."""
    return 100.0 * frames_per_s * cost.total_ops / peak_ops
