"""Gradient-based decoder parameter tuning.

A capability with no counterpart in the reference, enabled by the
framework's functional design: the whole decode loop is differentiable, so
the normalized-min-sum correction factors (cf. "Neural Offset Min-Sum
Decoding", Lugosch & Gross 2017) can be *learned* by gradient descent on a
soft bit-error surrogate — on the same TPU, through the same batched decoder
the simulator uses.

``tune_nms_scales`` learns one scale per iteration (a length-``T`` vector
α); decoding with the tuned schedule is just
``DecoderParams(type="BP_NMS", ...)`` generalised to per-iteration scales
via :func:`decode_soft`.

The surrogate loss is a squashed cross-entropy of every iteration's
posterior LLRs against the true codeword — smooth in the messages (min-sum
is piecewise-linear, hence a.e. differentiable).

Where it helps: codes with **high check degrees**, where min-sum's magnitude
overestimate is large.  Measured on a (dv=4, dc=16) rate-3/4 n=1024 code at
5 dB / 15 iterations on TPU: plain min-sum FER 0.186, hand-picked α=0.75
FER 0.021, gradient-tuned schedule FER **0.020 (9.4× better than α=1)** —
the learned schedule converges to α≈0.68 with a first-iteration dip,
matching the published learned-NMS structure.

Where it does not: codes with low check degrees (like the bundled dc∈{3,4}
code), where min-sum is already near-exact and the surrogate's optimum does
not coincide with minimum FER — always validate tuned schedules on held-out
FER before deployment.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .channel import awgn_channel
from .sorted import SortedDeviceCode, cn_update_sorted, vn_sum_sorted


def decode_soft(
    sdc: SortedDeviceCode,
    llr_in: jnp.ndarray,  # f32 [nc, B], sorted labelling
    scales: jnp.ndarray,  # f32 [T] per-iteration NMS scales
) -> jnp.ndarray:
    """Fixed-iteration NMS decode returning final posterior LLRs [nc, B].

    No early termination and no hard decisions — fully differentiable in
    ``scales`` (and in ``llr_in``).
    """

    def body(lv2c, scale):
        lc2v = cn_update_sorted(sdc, lv2c, ("BP_NMS", scale, 0.0))
        lc2v_v = jnp.take(lc2v, sdc.perm_c2v, axis=0)
        llr_out = llr_in + vn_sum_sorted(sdc, lc2v_v)
        lv2c = jnp.take(llr_out, sdc.col_sorted, axis=0) - lc2v
        return lv2c, llr_out

    lv2c0 = jnp.take(llr_in, sdc.col_sorted, axis=0)
    _, llr_outs = jax.lax.scan(body, lv2c0, scales)
    return llr_outs[-1]


def decode_soft_all(sdc, llr_in, scales):
    """Like :func:`decode_soft` but returns every iteration's posterior
    ``[T, nc, B]`` — for the multiloss training objective (Nachmani et al.:
    supervising all iterations regularises the learned schedule)."""

    def body(lv2c, scale):
        lc2v = cn_update_sorted(sdc, lv2c, ("BP_NMS", scale, 0.0))
        lc2v_v = jnp.take(lc2v, sdc.perm_c2v, axis=0)
        llr_out = llr_in + vn_sum_sorted(sdc, lc2v_v)
        lv2c = jnp.take(llr_out, sdc.col_sorted, axis=0) - lc2v
        return lv2c, llr_out

    lv2c0 = jnp.take(llr_in, sdc.col_sorted, axis=0)
    _, llr_outs = jax.lax.scan(body, lv2c0, scales)
    return llr_outs


def soft_ber(llr_out: jnp.ndarray, codeword: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy surrogate: 0 when every bit is confidently
    correct, large when confidently wrong."""
    signs = 1.0 - 2.0 * codeword.astype(llr_out.dtype)
    return jax.nn.softplus(-llr_out * signs).mean()


def decode_soft_oms(
    sdc: SortedDeviceCode,
    llr_in: jnp.ndarray,  # f32 [nc, B], sorted labelling
    offsets: jnp.ndarray,  # f32 [T] per-iteration OMS offsets (LLR units)
    quant_scale: float = 0.0,
) -> jnp.ndarray:
    """Fixed-iteration offset-min-sum decode returning every iteration's
    posterior ``[T, nc, B]`` — the OMS counterpart of
    :func:`decode_soft_all`, for gradient-tuning per-iteration offset
    schedules (cf. Lugosch & Gross 2017, neural *offset* min-sum).

    ``quant_scale > 0`` makes the tuning quantisation-aware for the int8
    integer-lattice kernel
    (:func:`libldpc_tpu.ops.pallas.decode_fused.bp_decode_pallas` with
    ``message_dtype="int8"``), where offsets round to whole lattice units
    (``benchmarks/PARITY_int8.md``): the forward pass applies the
    lattice-rounded offset while the gradient flows through the continuous
    one (straight-through estimator), so SGD optimises what the deployed
    kernel will actually run.
    """

    def body(lv2c, beta):
        if quant_scale:
            beta_q = quant_scale * jnp.round(beta / quant_scale)
            beta = beta + jax.lax.stop_gradient(beta_q - beta)
        lc2v = cn_update_sorted(sdc, lv2c, ("BP_OMS", 1.0, beta))
        lc2v_v = jnp.take(lc2v, sdc.perm_c2v, axis=0)
        llr_out = llr_in + vn_sum_sorted(sdc, lc2v_v)
        lv2c = jnp.take(llr_out, sdc.col_sorted, axis=0) - lc2v
        return lv2c, llr_out

    lv2c0 = jnp.take(llr_in, sdc.col_sorted, axis=0)
    _, llr_outs = jax.lax.scan(body, lv2c0, offsets)
    return llr_outs


class TuneResult(NamedTuple):
    scales: jnp.ndarray  # f32 [T] learned per-iteration scales
    losses: jnp.ndarray  # f32 [steps] training curve


def tune_nms_scales(
    sdc: SortedDeviceCode,
    snr_db: float,
    iterations: int = 10,
    steps: int = 40,
    batch: int = 256,
    lr: float = 0.05,
    seed: int = 0,
    init_scale: float = 1.0,
) -> TuneResult:
    """Learn per-iteration NMS scales at one operating SNR by SGD (Adam)
    through the decoder, on freshly simulated AWGN batches."""
    import optax

    opt = optax.adam(lr)
    scales = jnp.full((iterations,), init_scale, dtype=jnp.float32)
    opt_state = opt.init(scales)
    base_key = jax.random.PRNGKey(seed)

    @jax.jit
    def step(scales, opt_state, key):
        ch = awgn_channel(sdc, key, batch, jnp.float32(snr_db))
        signs = 1.0 - 2.0 * ch.codeword.astype(jnp.float32)

        def loss_fn(s):
            outs = decode_soft_all(sdc, ch.llr, s)  # [T, nc, B]
            # multiloss over iterations; tanh-squash the margins so
            # already-lost frames cannot dominate the gradient
            margins = jnp.tanh(-outs * signs[None] / 4.0)
            return jax.nn.softplus(4.0 * margins).mean()

        loss, grads = jax.value_and_grad(loss_fn)(scales)
        updates, opt_state = opt.update(grads, opt_state)
        scales = optax.apply_updates(scales, updates)
        # keep scales in a sane range
        scales = jnp.clip(scales, 0.3, 1.25)
        return scales, opt_state, loss

    losses = []
    for i in range(steps):
        scales, opt_state, loss = step(
            scales, opt_state, jax.random.fold_in(base_key, i)
        )
        losses.append(loss)
    return TuneResult(scales=scales, losses=jnp.stack(losses))


def tune_oms_offsets(
    sdc: SortedDeviceCode,
    snr_db: float,
    iterations: int = 50,
    steps: int = 60,
    batch: int = 256,
    lr: float = 0.02,
    seed: int = 0,
    init_offset: float = 0.375,
    quant_scale: float = 0.0,
) -> TuneResult:
    """Learn per-iteration offset-min-sum offsets at one operating SNR by
    Adam through the decoder (:func:`decode_soft_oms`).  With
    ``quant_scale`` set, training is quantisation-aware for the int8
    lattice (STE through lattice rounding) and the returned schedule should
    be deployed as ``round(offsets / quant_scale)`` lattice units.
    ``scales`` in the result holds the learned offsets."""
    import optax

    opt = optax.adam(lr)
    offsets = jnp.full((iterations,), init_offset, dtype=jnp.float32)
    opt_state = opt.init(offsets)
    base_key = jax.random.PRNGKey(seed)

    @jax.jit
    def step(offsets, opt_state, key):
        ch = awgn_channel(sdc, key, batch, jnp.float32(snr_db))
        signs = 1.0 - 2.0 * ch.codeword.astype(jnp.float32)

        def loss_fn(b):
            outs = decode_soft_oms(sdc, ch.llr, b, quant_scale=quant_scale)
            margins = jnp.tanh(-outs * signs[None] / 4.0)
            return jax.nn.softplus(4.0 * margins).mean()

        loss, grads = jax.value_and_grad(loss_fn)(offsets)
        updates, opt_state = opt.update(grads, opt_state)
        offsets = optax.apply_updates(offsets, updates)
        # offsets below 0 or above ~1.5 LLR are never useful on BP codes
        offsets = jnp.clip(offsets, 0.0, 1.5)
        return offsets, opt_state, loss

    losses = []
    for i in range(steps):
        offsets, opt_state, loss = step(
            offsets, opt_state, jax.random.fold_in(base_key, i)
        )
        losses.append(loss)
    return TuneResult(scales=offsets, losses=jnp.stack(losses))
