"""Higher-order modulation: constellations, bit mapping, bitwise LLRs.

Rebuilds the GPU stack's modulation capability (the CPU stack hardwires
BPSK):

* ``Constellation`` — uniform M-ASK points ``-M+1+2j`` normalised to unit
  energy with uniform priors (``gpu/sim/ldpcsim.cpp:6-20``), plus arbitrary
  bit labels from the simfile.
* bit mapper ``[bits, n_sym]`` assigning codeword bits to symbol positions
  (``gpu/sim/ldpcsim.cpp:126-138``).
* ``map_bits_to_symbols`` — pack bits into symbol label indices and look up
  constellation points (``map_c_to_x``, ``gpu/device/kernel.cpp:202-219``).
* ``bitwise_llrs`` — exact per-bit LLRs over the constellation,
  ``log(Σ_{x: bit=0} p(y|x) p(x) / Σ_{x: bit=1} p(y|x) p(x))``
  (``calc_llrs``, ``gpu/device/kernel.cpp:141-189``) — computed here with
  logsumexp for numerical stability instead of the reference's exp-ratio,
  but clamped to the same ``MAX_LLR``/``MIN_LLR`` bounds.

All ops are batched ``[n_sym, B]`` and MXU/VPU-friendly: the per-bit sums
over constellation points are einsums over an ``[M]`` axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.params import MAX_LLR, MIN_LLR


@dataclasses.dataclass(frozen=True)
class Constellation:
    """Uniform M-ASK constellation with bit labels."""

    M: int
    points: np.ndarray  # f64 [M] unit-energy amplitudes, natural order
    priors: np.ndarray  # f64 [M]
    labels: np.ndarray  # int [M] bit label of each point
    labels_rev: np.ndarray  # int [M] point index of each label

    @classmethod
    def mask(cls, M: int, labels: Optional[np.ndarray] = None) -> "Constellation":
        """Uniform M-ASK like ``constellation::constellation``
        (``gpu/sim/ldpcsim.cpp:6-20``)."""
        if M < 2 or M & (M - 1):
            raise ValueError(f"M must be a power of two, got {M}")
        pts = -M + 1 + 2.0 * np.arange(M)
        priors = np.full(M, 1.0 / M)
        pts = pts / np.sqrt((pts**2 * priors).sum())
        if labels is None:
            labels = np.arange(M)  # natural labelling
        labels = np.asarray(labels, dtype=np.int64)
        if sorted(labels.tolist()) != list(range(M)):
            raise ValueError("labels must be a permutation of 0..M-1")
        rev = np.empty(M, dtype=np.int64)
        rev[labels] = np.arange(M)
        return cls(M=M, points=pts, priors=priors, labels=labels, labels_rev=rev)

    @property
    def bits_per_symbol(self) -> int:
        return int(np.log2(self.M))


def default_bit_mapper(bits: int, n_sym: int) -> np.ndarray:
    """Consecutive mapping: symbol ``l`` carries codeword bits
    ``l*bits .. l*bits+bits-1`` (most-significant first)."""
    return np.arange(bits * n_sym).reshape(n_sym, bits).T.copy()


def map_bits_to_symbols(
    cstl: Constellation,
    bit_mapper: jnp.ndarray,  # int32 [bits, n_sym]
    codeword_bits: jnp.ndarray,  # uint8 [nct_or_more, B]
) -> jnp.ndarray:
    """Pack mapped bits into labels (MSB first) and return point indices,
    mirroring ``map_c_to_x`` (``gpu/device/kernel.cpp:202-219``)."""
    bits = bit_mapper.shape[0]
    gathered = codeword_bits[bit_mapper.reshape(-1)].reshape(
        bits, bit_mapper.shape[1], -1
    )
    weights = (2 ** jnp.arange(bits - 1, -1, -1, dtype=jnp.int32))[:, None, None]
    label = (gathered.astype(jnp.int32) * weights).sum(axis=0)  # [n_sym, B]
    labels_rev = jnp.asarray(cstl.labels_rev, dtype=jnp.int32)
    return labels_rev[label]


def modulate(cstl: Constellation, sym_idx: jnp.ndarray) -> jnp.ndarray:
    """Point indices -> amplitudes."""
    return jnp.asarray(cstl.points, dtype=jnp.float32)[sym_idx]


def bitwise_llrs(
    cstl: Constellation,
    y: jnp.ndarray,  # f32 [n_sym, B] received amplitudes
    sigma2: jnp.ndarray,
) -> jnp.ndarray:
    """Exact bitwise LLRs ``[bits, n_sym, B]``.

    ``llr_i = log Σ_{x: bit_i(label(x))=0} w(x)  −  log Σ_{x: bit_i=1} w(x)``
    with ``log w(x) = −(y−x)²/(2σ²) + log p(x)``; stabilised with logsumexp
    and clamped like the reference (``gpu/device/kernel.cpp:168-181``).
    """
    bits = cstl.bits_per_symbol
    pts = jnp.asarray(cstl.points, dtype=jnp.float32)  # [M]
    logp = jnp.asarray(np.log(cstl.priors), dtype=jnp.float32)
    # [n_sym, B, M] log-weights
    logw = -((y[..., None] - pts) ** 2) / (2.0 * sigma2) + logp
    # bit of each *point*: bit i of its label, MSB first
    # (kernel.cpp:158: labels[j] & (1 << (log2M-1-i)))
    point_bits = (
        (cstl.labels[None, :] >> np.arange(bits - 1, -1, -1)[:, None]) & 1
    ).astype(bool)  # [bits, M]
    masks0 = jnp.asarray(~point_bits)  # [bits, M]
    neg_inf = jnp.float32(-1e30)

    def llr_for_bit(mask0):
        l0 = jax.nn.logsumexp(jnp.where(mask0, logw, neg_inf), axis=-1)
        l1 = jax.nn.logsumexp(jnp.where(~mask0, logw, neg_inf), axis=-1)
        return l0 - l1

    llr = jax.vmap(llr_for_bit)(masks0)  # [bits, n_sym, B]
    return jnp.clip(llr, MIN_LLR, MAX_LLR)


def demap_llrs_to_codeword(
    llr_bits: jnp.ndarray,  # f32 [bits, n_sym, B]
    bit_mapper: jnp.ndarray,  # int32 [bits, n_sym]
    nc: int,
) -> jnp.ndarray:
    """Scatter per-symbol bit LLRs into codeword-bit positions
    (``kernel.cpp:184-188``): position ``bit_mapper[k, l]`` gets
    ``llr_bits[k, l]``."""
    B = llr_bits.shape[-1]
    out = jnp.zeros((nc, B), dtype=llr_bits.dtype)
    return out.at[bit_mapper.reshape(-1)].set(
        llr_bits.reshape(-1, B), mode="drop"
    )
