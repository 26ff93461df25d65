"""On-device channel simulation: encode → map → noise → LLRs.

Rebuilds the reference channel hierarchy (``src/sim/channel.{h,cpp}``) as
batched, functional JAX ops.  Everything runs on device in one jitted step;
there is no per-thread RNG (the reference seeds one ``mt19937_64`` per OpenMP
thread, ``src/sim/ldpcsim.cpp:29-75``) — instead a single counter-based
``jax.random`` key is folded with the sweep-point and batch indices, which
gives reproducible, non-overlapping streams across any number of devices and
hosts.

Semantics mirrored per channel (node-major ``[nc, B]`` / ``[nct, B]``):

* **AWGN** — ``sigma2 = 10^(-snr/10)``, BPSK ``0→+1, 1→−1`` on transmitted
  bits, ``y = x + N(0, sigma2)``, ``LLR = 2y/σ²``; punctured bits LLR 0,
  shortened pinned to ``SHORTEN_LLR`` (``src/sim/channel.cpp:32-93``).
* **BSC** — flip with prob ε, ``LLR = ±log((1−ε)/ε)``; punctured 0,
  shortened ``+δ`` (``src/sim/channel.cpp:129-162``).
* **BEC** — erase with prob ε; the "LLRs" are 3-state symbols
  {0, 1, ERASURE}; punctured → ERASURE, shortened → true bit
  (``src/sim/channel.cpp:199-229``).

Encoding is ``c = u·G mod 2`` as a real matmul + parity (MXU-friendly),
matching ``sparse_csr::multiply_left`` (``src/core/sparse.h:162-187``).
When no G is given the all-zero codeword is transmitted, like the reference
when ``G().empty()`` (``src/sim/ldpcsim.cpp:162-165`` — the channel buffers
keep their all-zero initialisation, ``src/sim/channel.cpp:29,100,170``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.params import SHORTEN_LLR
from .device import DeviceCode

#: 3-state BEC symbol alphabet (int8): bit values 0/1 plus the erasure mark.
#: The reference uses the char sentinel ``'E'`` (``src/core/functions.h:105``).
BEC_ERASURE = jnp.int8(2)


class ChannelOutput(NamedTuple):
    """One simulated batch ready for decoding."""

    llr: jnp.ndarray  # f32 [nc, B] decoder input (int8 symbols for BEC)
    codeword: jnp.ndarray  # uint8 [nc, B] true transmitted codeword


def encode_batch(
    dcode: DeviceCode, key: jax.Array, batch: int
) -> jnp.ndarray:
    """Draw random info words and encode: ``uint8 [nc, B]`` codewords.

    Random info bits mirror the reference's Bernoulli(0.5) info-word stream
    (``src/sim/channel.cpp:11``, ``channel.cpp:44-51``).
    """
    if dcode.G is None:
        return jnp.zeros((dcode.nc, batch), dtype=jnp.uint8)
    u = jax.random.bernoulli(key, 0.5, (dcode.kc, batch))
    # c = u @ G over GF(2); counts fit float32 exactly for kc < 2^24
    c = jnp.dot(dcode.G.T, u.astype(jnp.float32), preferred_element_type=jnp.float32)
    return (c.astype(jnp.int32) % 2).astype(jnp.uint8)


def _scatter_transmitted(
    dcode: DeviceCode, base: jnp.ndarray, values: jnp.ndarray
) -> jnp.ndarray:
    """Place per-transmitted-bit values into full-length [nc, B] rows."""
    return base.at[dcode.bit_pos].set(values)


def awgn_channel(
    dcode: DeviceCode,
    key: jax.Array,
    batch: int,
    snr_db: jnp.ndarray,
) -> ChannelOutput:
    """AWGN with BPSK on the transmitted bits (``channel_awgn``)."""
    kenc, knoise = jax.random.split(key)
    c = encode_batch(dcode, kenc, batch)
    sigma2 = 10.0 ** (-snr_db / 10.0)
    x = 1.0 - 2.0 * c[dcode.bit_pos].astype(jnp.float32)  # [nct, B]
    noise = jax.random.normal(knoise, x.shape, dtype=jnp.float32)
    y = x + noise * jnp.sqrt(sigma2).astype(jnp.float32)
    llr_t = 2.0 * y / sigma2
    llr = jnp.zeros((dcode.nc, batch), dtype=jnp.float32)
    # punctured stay 0 (erasure); shortened pinned as known
    if dcode.shorten.shape[0]:
        llr = llr.at[dcode.shorten].set(SHORTEN_LLR)
    llr = _scatter_transmitted(dcode, llr, llr_t)
    return ChannelOutput(llr=llr, codeword=c)


def bsc_channel(
    dcode: DeviceCode,
    key: jax.Array,
    batch: int,
    epsilon: jnp.ndarray,
) -> ChannelOutput:
    """Binary symmetric channel (``channel_bsc``)."""
    kenc, kflip = jax.random.split(key)
    c = encode_batch(dcode, kenc, batch)
    x = c[dcode.bit_pos]
    flips = jax.random.bernoulli(kflip, epsilon, x.shape)
    y = jnp.bitwise_xor(x, flips.astype(jnp.uint8))
    delta = jnp.log((1.0 - epsilon) / epsilon).astype(jnp.float32)
    llr_t = delta * (1.0 - 2.0 * y.astype(jnp.float32))
    llr = jnp.zeros((dcode.nc, batch), dtype=jnp.float32)
    if dcode.shorten.shape[0]:
        llr = llr.at[dcode.shorten].set(delta)
    llr = _scatter_transmitted(dcode, llr, llr_t)
    return ChannelOutput(llr=llr, codeword=c)


def bec_channel(
    dcode: DeviceCode,
    key: jax.Array,
    batch: int,
    epsilon: jnp.ndarray,
) -> ChannelOutput:
    """Binary erasure channel (``channel_bec``): 3-state int8 symbols."""
    kenc, kerase = jax.random.split(key)
    c = encode_batch(dcode, kenc, batch)
    x = c[dcode.bit_pos].astype(jnp.int8)
    erase = jax.random.bernoulli(kerase, epsilon, x.shape)
    y = jnp.where(erase, BEC_ERASURE, x)
    sym = jnp.full((dcode.nc, batch), BEC_ERASURE, dtype=jnp.int8)  # punctured
    if dcode.shorten.shape[0]:
        sym = sym.at[dcode.shorten].set(c[dcode.shorten].astype(jnp.int8))
    sym = _scatter_transmitted(dcode, sym, y)
    return ChannelOutput(llr=sym, codeword=c)


def modulated_awgn_channel(
    dcode: DeviceCode,
    key: jax.Array,
    batch: int,
    snr_db: jnp.ndarray,
    cstl,
    bit_mapper: jnp.ndarray,  # int32 [bits, n_sym] codeword-bit positions
) -> ChannelOutput:
    """AWGN with a higher-order M-ASK constellation — the GPU stack's frame
    pipeline (encode → ``map_c_to_x`` → ``awgn`` → ``calc_llrs``,
    ``gpu/device/kernel.cpp:26-79``) done directly on the true codeword
    instead of the all-zero + sign-flip trick.
    """
    from . import modulation as mod

    kenc, knoise = jax.random.split(key)
    c = encode_batch(dcode, kenc, batch)
    sym_idx = mod.map_bits_to_symbols(cstl, bit_mapper, c)  # [n_sym, B]
    x = mod.modulate(cstl, sym_idx)
    sigma2 = (10.0 ** (-snr_db / 10.0)).astype(jnp.float32)
    y = x + jax.random.normal(knoise, x.shape, dtype=jnp.float32) * jnp.sqrt(
        sigma2
    )
    llr_bits = mod.bitwise_llrs(cstl, y, sigma2)
    llr = mod.demap_llrs_to_codeword(llr_bits, bit_mapper, dcode.nc)
    if dcode.shorten.shape[0]:
        llr = llr.at[dcode.shorten].set(SHORTEN_LLR)
    return ChannelOutput(llr=llr, codeword=c)


def simulate_channel(
    dcode: DeviceCode,
    channel_type: str,
    key: jax.Array,
    batch: int,
    x_value: jnp.ndarray,
    modulation=None,
) -> ChannelOutput:
    """Dispatch on the reference's channel-type strings
    (``src/sim/ldpcsim.cpp:32-74``).  ``modulation``, when given as
    ``(Constellation, bit_mapper)``, upgrades AWGN to the modulated pipeline.
    """
    if channel_type == "AWGN":
        if modulation is not None:
            cstl, bit_mapper = modulation
            return modulated_awgn_channel(
                dcode, key, batch, x_value, cstl, bit_mapper
            )
        return awgn_channel(dcode, key, batch, x_value)
    if channel_type == "BSC":
        return bsc_channel(dcode, key, batch, x_value)
    if channel_type == "BEC":
        return bec_channel(dcode, key, batch, x_value)
    raise ValueError(f"No channel selected: {channel_type!r}")
