"""Check-node combining operators and exclusion combines.

The reference selects between two pairwise operators at runtime
(``src/decoding/decoder.h:12-20``): ``jacobian`` — the exact box-plus
(min-sum magnitude plus a log-ratio correction) — and ``minsum``.  Both are
associative and commutative, which is what makes the reference's
forward/backward exclusion-prefix trick (J. Chen et al., applied at
``src/decoding/decoder.cpp:31-44``) valid.

On TPU the same trick vectorises perfectly: messages for a whole batch of
frames and all checks sit in a ``[mc, max_dc, batch]`` tensor and the
forward/backward prefixes are ``max_dc - 1`` elementwise ops over
``[mc, batch]`` slices — a statically unrolled loop, no sequential scalar
work.  Padding lanes hold :data:`~libldpc_tpu.ops.device.PAD_LLR`, which is
an exact identity for both operators, so no masking is needed inside the
combine.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .device import PAD_LLR

PairwiseOp = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _sign(x: jnp.ndarray) -> jnp.ndarray:
    """``1 - 2*signbit(x)`` — the reference's sign with sign(+0) = +1
    (``src/decoding/decoder.h:7-10``)."""
    return 1.0 - 2.0 * jnp.signbit(x).astype(x.dtype)


def boxplus(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Exact pairwise box-plus (``jacobian``, ``src/decoding/decoder.h:12-15``):

    ``sign(x)sign(y)·min(|x|,|y|) + log((1+e^{-|x+y|})/(1+e^{-|x-y|}))``

    computed with ``softplus`` for float32 stability.  ``boxplus(x, PAD_LLR)
    == x`` exactly (identity for padding lanes).
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    m = jnp.minimum(ax, ay)
    corr = jax.nn.softplus(-jnp.abs(x + y)) - jax.nn.softplus(-jnp.abs(x - y))
    return _sign(x) * _sign(y) * m + corr


def minsum(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise min-sum (``src/decoding/decoder.h:17-20``)."""
    return _sign(x) * _sign(y) * jnp.minimum(jnp.abs(x), jnp.abs(y))


def _lin_approx(L: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear approximation of ``log(1 + e^{-|L|})``
    (``jacobian_lin_approx``, ``gpu/ldpc/ldpc.cpp:243-259``)."""
    a = jnp.abs(L)
    return jnp.where(
        a < 1.0,
        -0.375 * a + 0.6825,
        jnp.where(a < 2.625, -0.1875 * a + 0.5, 0.0),
    )


def boxplus_linear(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Box-plus with the GPU stack's piecewise-linear correction
    (``CN_APPROX_LIN``, ``gpu/ldpc/ldpc.cpp:232-236``) — transcendental-free,
    which matters on the VPU."""
    m = jnp.minimum(jnp.abs(x), jnp.abs(y))
    return _sign(x) * _sign(y) * m + _lin_approx(x + y) - _lin_approx(x - y)


#: Largest float32 strictly below 1 — tanh-domain products are clipped here
#: before the inverse transform, capping CN extrinsics at
#: ``2*atanh(TANH_CLIP)`` ~= 17.3.  (The GPU reference computes the same
#: product form in doubles with no clip and can overflow the log ratio,
#: ``gpu/device/kernel.cpp:250-263``; the clip trades a bounded extrinsic
#: for that hazard.  VN posteriors still accumulate freely.)
TANH_CLIP = float(np.nextafter(np.float32(1.0), np.float32(0.0)))


def tanh_pre(x: jnp.ndarray) -> jnp.ndarray:
    """LLR -> tanh domain.  ``tanh(PAD_LLR/2) == 1.0`` exactly, so padding
    lanes are an exact multiplicative identity in the prefix products."""
    return jnp.tanh(x * 0.5)


def tanh_post(t: jnp.ndarray) -> jnp.ndarray:
    """tanh domain -> LLR: ``2*atanh(t)`` as ``log1p(t) - log1p(-t)``
    (stable near ``|t| = 1`` after the clip)."""
    p = jnp.clip(t, -TANH_CLIP, TANH_CLIP)
    return jnp.log1p(p) - jnp.log1p(-p)


def is_tanh_mode(minsum_mode) -> bool:
    """True for the tanh-product sum-product form (``"BP_TANH"``) — the CN
    update the reference GPU stack uses (``decode_lyr_cnupdate``,
    ``gpu/device/kernel.cpp:237-264``: ``t_j = tanh(Lv2c/2)``, product over
    the check, log-ratio back-transform).  Mathematically identical to the
    pairwise box-plus (``jacobian``) exclusion — same sum-product
    algorithm, different rounding — but needs only ``2*dc``
    transcendentals per check instead of ``~4`` per pairwise op (``~12*dc``
    per check), which matters on the VPU where box-plus dominates
    large-blocklength decoding."""
    if isinstance(minsum_mode, tuple):
        minsum_mode = minsum_mode[0]
    return minsum_mode == "BP_TANH"


def exclusion_combine_tanh(M: jnp.ndarray) -> jnp.ndarray:
    """All-but-one combine along axis 1 in the tanh domain (see
    :func:`is_tanh_mode`).  Same shape contract as
    :func:`exclusion_combine`; degree-1 rows return ``PAD_LLR`` (combine of
    zero messages — identity), matching the pairwise form."""
    dc = M.shape[1]
    if dc == 1:
        return jnp.full_like(M, PAD_LLR)
    T = tanh_pre(M)
    fwd = [T[:, 0]]
    bwd = [T[:, dc - 1]]
    for j in range(1, dc):
        fwd.append(fwd[-1] * T[:, j])
        bwd.append(bwd[-1] * T[:, dc - 1 - j])
    out = [bwd[dc - 2]]
    for j in range(1, dc - 1):
        out.append(fwd[j - 1] * bwd[dc - 2 - j])
    out.append(fwd[dc - 2])
    return tanh_post(jnp.stack(out, axis=1))


def phi(x: jnp.ndarray) -> jnp.ndarray:
    """Gallager's self-inverse f-function ``φ(x) = -log(tanh(x/2))`` for
    ``x >= 0`` — the FORWARD transform, ``log1p(e^-x) - log1p(-e^-x)``
    with ``x`` floored at 1e-6.

    ``log1p`` keeps ``log(1 - e^-x)`` accurate from its exact argument,
    so this single formula holds over the whole LLR range above the
    floor; at the floor (near-zero LLRs, e.g. punctured bits) φ caps at
    ``φ(1e-6) ≈ 15.1``, giving neighbours extrinsics of ~5e-7 instead of
    exactly 0 — decoding-equivalent.  ``φ(PAD_LLR) == 0`` exactly
    (additive identity for padding lanes).  The INVERSE of φ-domain sums
    is :func:`phi_out` (asymmetric on purpose: sums can be tiny, where
    ``e^-s`` rounds to 1; inputs cannot).  Unlike the tanh-domain
    product (capped at ``2*atanh(TANH_CLIP)`` ≈ 17.3), the pair keeps
    ~4x the extrinsic dynamic range.
    """
    e = jnp.exp(-jnp.maximum(x, 1e-6))
    return jnp.log1p(e) - jnp.log1p(-e)


#: Floor for φ-domain sums before the inverse transform: a sum of exact
#: zeros (every other input saturated past ~88, where ``e^-L``
#: underflows) would otherwise invert to ``inf`` and poison the
#: extrinsic subtraction with NaNs.  The floor caps extrinsics at
#: ``-log(PHI_SUM_FLOOR/2) ~ 69.7`` — ~4x the tanh form's 17.3 cap, and
#: finite.  (1e-30 rather than the smallest normal float32: TPUs flush
#: subnormals, and ``tanh(s/2)`` must stay in the normal range.)
PHI_SUM_FLOOR = 1e-30


def phi_out(s: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform of a φ-domain sum: ``-log(tanh(s/2))``, floored
    (see :data:`PHI_SUM_FLOOR`).  ``tanh`` stays linear for tiny sums, so
    extrinsics up to ~69.7 come back accurately — the regime where the
    forward formula's ``e^-s`` would round to 1."""
    return -jnp.log(jnp.tanh(jnp.maximum(s, PHI_SUM_FLOOR) * 0.5))


def is_phi_mode(minsum_mode) -> bool:
    """True for ``"BP_PHI"`` — exact sum-product with the CN combine in
    the φ (log-tanh) domain: per-edge transcendental count of the tanh
    form, extrinsic dynamic range of the pairwise box-plus.  Same
    algorithm as ``BP``/``BP_TANH``; the three differ only in float
    rounding (measured: the tanh form's 17.3 extrinsic cap raises the
    deep error floor ~3x on the bundled code, the φ form does not —
    ``benchmarks/soak_sweep_tanh.txt``)."""
    if isinstance(minsum_mode, tuple):
        minsum_mode = minsum_mode[0]
    return minsum_mode == "BP_PHI"


def exclusion_combine_phi(M: jnp.ndarray) -> jnp.ndarray:
    """All-but-one combine along axis 1 in the φ domain (see
    :func:`is_phi_mode`): sign chains are products of ±1, magnitude
    chains are sums of ``φ(|L|)``; outputs are ``sign · φ(sum)``.  Same
    shape contract as :func:`exclusion_combine`."""
    dc = M.shape[1]
    if dc == 1:
        return jnp.full_like(M, PAD_LLR)
    S = _sign(M)
    A = phi(jnp.abs(M))
    fs, fa = [S[:, 0]], [A[:, 0]]
    bs, ba = [S[:, dc - 1]], [A[:, dc - 1]]
    for j in range(1, dc):
        fs.append(fs[-1] * S[:, j])
        fa.append(fa[-1] + A[:, j])
        bs.append(bs[-1] * S[:, dc - 1 - j])
        ba.append(ba[-1] + A[:, dc - 1 - j])
    out = [bs[dc - 2] * phi_out(ba[dc - 2])]
    for j in range(1, dc - 1):
        out.append(
            fs[j - 1] * bs[dc - 2 - j] * phi_out(fa[j - 1] + ba[dc - 2 - j])
        )
    out.append(fs[dc - 2] * phi_out(fa[dc - 2]))
    return jnp.stack(out, axis=1)


#: Decoder-type string -> pairwise CN operator.  ``BP`` is the exact
#: sum-product (any unknown string also maps to it, matching
#: ``set_param``, ``src/decoding/decoder.h:73-80``); ``BP_MS`` is min-sum;
#: ``BP_LIN`` is the piecewise-linear approximation (the GPU stack's
#: compile-time ``CN_APPROX_LIN``, exposed here as a runtime type);
#: ``BP_NMS``/``BP_OMS`` are normalized/offset min-sum (min-sum exclusion
#: followed by output scaling / offset — see :func:`cn_postprocess`);
#: ``BP_TANH`` is product-form sum-product and has no pairwise operator —
#: decoders must branch on :func:`is_tanh_mode` before calling
#: :func:`get_op` (it raises, so a forgotten branch fails loudly instead
#: of silently decoding with different numerics).
OPS = {
    "BP": boxplus,
    "BP_MS": minsum,
    "BP_LIN": boxplus_linear,
    "BP_NMS": minsum,
    "BP_OMS": minsum,
}


def get_op(minsum_mode) -> PairwiseOp:
    """Operator lookup: accepts the legacy bool (min-sum toggle), a
    decoder-type string, or a ``(type, scale, offset)`` tuple."""
    if isinstance(minsum_mode, tuple):
        minsum_mode = minsum_mode[0]
    if minsum_mode in ("BP_TANH", "BP_PHI"):
        raise ValueError(
            f"{minsum_mode} has no pairwise operator; branch on "
            "is_tanh_mode()/is_phi_mode() and use the domain exclusion"
        )
    if isinstance(minsum_mode, str):
        return OPS.get(minsum_mode, boxplus)
    return minsum if minsum_mode else boxplus


def cn_postprocess(lc2v: jnp.ndarray, minsum_mode) -> jnp.ndarray:
    """Check-output correction for normalized/offset min-sum.

    ``minsum_mode = ("BP_NMS", scale, offset)`` scales every extrinsic CN
    output by ``scale``; ``("BP_OMS", scale, offset)`` shrinks magnitudes by
    ``offset`` (floored at 0).  Both are the standard hardware-friendly
    min-sum corrections; no-ops for other modes.
    """
    if not isinstance(minsum_mode, tuple):
        return lc2v
    kind, scale, offset = minsum_mode
    if kind == "BP_NMS":
        return lc2v * jnp.asarray(scale, lc2v.dtype)
    if kind == "BP_OMS":
        mag = jnp.maximum(jnp.abs(lc2v) - jnp.asarray(offset, lc2v.dtype), 0.0)
        return _sign(lc2v) * mag
    return lc2v


def exclusion_combine(M: jnp.ndarray, op: PairwiseOp) -> jnp.ndarray:
    """All-but-one combine along axis 1.

    ``M`` is ``[mc, max_dc, batch]`` check-node input messages (padding lanes
    = ``PAD_LLR``).  Returns same-shape extrinsic outputs where slot ``j`` is
    the combine of all slots except ``j`` — the vectorised equivalent of the
    reference's forward/backward pass (``src/decoding/decoder.cpp:31-44``),
    in the same left-to-right association order (bit-for-bit comparable
    modulo dtype).
    """
    dc = M.shape[1]
    if dc == 1:
        return jnp.full_like(M, PAD_LLR)
    fwd = [M[:, 0]]
    bwd = [M[:, dc - 1]]
    for j in range(1, dc):
        fwd.append(op(fwd[-1], M[:, j]))
        bwd.append(op(bwd[-1], M[:, dc - 1 - j]))
    out = [bwd[dc - 2]]  # slot 0: combine of 1..dc-1
    for j in range(1, dc - 1):
        out.append(op(fwd[j - 1], bwd[dc - 2 - j]))
    out.append(fwd[dc - 2])  # slot dc-1
    return jnp.stack(out, axis=1)


def total_combine(M: jnp.ndarray, op: PairwiseOp) -> jnp.ndarray:
    """Combine of all slots along axis 1 (``[mc, max_dc, B] -> [mc, B]``)."""
    acc = M[:, 0]
    for j in range(1, M.shape[1]):
        acc = op(acc, M[:, j])
    return acc
