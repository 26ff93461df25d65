"""Lane-major fused BP decoder: arbitrary blocklengths in one Pallas kernel.

The ``[edges, frames]`` fused kernel (:mod:`.decode_fused`) hits two walls
at padded edge spaces beyond 16K (Mosaic compile time and VMEM residency —
see :mod:`.lanes_layout`).  This decoder keeps **frames on sublanes and
edges on lanes**: messages are ``[frame_tile, n_pad]`` with the message
state VMEM-resident, all iterations stay fused in one kernel, and batch
throughput comes from the Pallas grid over frame tiles.

Two transports (chosen at layout build time, :func:`.lanes_layout.to_lanes_device`):

* ``"benes"`` — full Beneš network, ``2*log2(n_pad)-1`` conditional lane
  exchanges (VPU rolls), float32 messages.
* ``"clos"`` — three-stage Clos factorisation (:mod:`.clos`): one-hot
  128x128 block-diagonal matmuls on the MXU around a block-granular
  middle network whose exchange distances are all multiples of 128 lanes
  (whole-tile moves, no intra-lane shuffling).  Supports bf16 message
  storage (one-hot matmuls are exact for bf16 operands), which halves
  both VMEM residency and VPU traffic; CN/VN arithmetic stays float32.

Capability parity target: the reference GPU kernels decode any
blocklength that fits device memory (``gpu/device/kernel.cpp:237-293``);
this kernel restores that for the fused path (the ``[edges, frames]``
Beneš kernel fails to compile on-chip beyond ``n_pad = 4096`` — see
``sim/driver.py:FUSED_EDGE_SPACE_LIMIT``).

Semantics match :func:`libldpc_tpu.ops.sorted.bp_decode_sorted` exactly
(iteration counting with break-before-increment per
``src/decoding/decoder.cpp:66-77``, freeze at first convergence, syndrome
from the transported posterior).  Both schedules are supported: flooding
(default) and the layered/serial schedule of the reference GPU stack
(``gpu/device/kernel.cpp:54-74``) when the layout carries layer planes —
so the fused path covers any blocklength x any schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cn_ops
from ..device import PAD_LLR
from ..sorted import SortedDecodeOutput
from .lanes_layout import LanesDeviceCode


#: Largest padded edge space the lane-major kernels compile WITHOUT the
#: spill point (measured 2026-08-19 on v5e): at n_pad = 131072 any program
#: containing two Benes transport chains crashes the Mosaic compile helper
#: unless the value between the chains is materialised through a VMEM
#: scratch ref (benchmarks/probe_lane_wall*.py — 2 chains FAIL, 2/4 chains
#: via scratch OK, fori(10) x 4 chains via scratch OK).  Below this size
#: the kernels keep their round-3 form (no spill, measured envelopes
#: unchanged); above it every kernel routes the CN extrinsics through the
#: spill ref between the forward and reverse transports.
SPILL_FREE_LIMIT = 65536

#: The Clos transport's own wall is keyed on padded REAL edges (fill),
#: not n_pad: at n_pad = 65536 the round-4 form compiled at <= 49152
#: fill and crashed at 55296 (benchmarks/res_tp_bl_scale.txt).  Round 5
#: adds the chain-break spill INSIDE the Clos transport
#: (clos_spill_transport) and triggers it from the fill too, so Clos
#: kernels above this fill run the spill form even below
#: SPILL_FREE_LIMIT.
CLOS_SPILL_FILL_LIMIT = 49152


def _clos_fill(ldc):
    """Padded real edge count (the Clos program-size driver)."""
    cb = ldc.cn_blocks[-1]
    vb = ldc.vn_blocks[-1]
    return max(cb[0] + cb[1] * cb[2], vb[0] + vb[1] * vb[2])


def _spill_for(ldc):
    """Whether the kernels for this layout run the spill form."""
    if ldc.n_pad > SPILL_FREE_LIMIT:
        return True
    return (ldc.transport == "clos"
            and _clos_fill(ldc) > CLOS_SPILL_FILL_LIMIT)


def _make_kernel(ldc: LanesDeviceCode, iterations, early_term, minsum_mode,
                 ft, dtype, stream=False, cap=0, layered=False,
                 bec_mode=False, spill=False, qscale=0.1875,
                 scale_prior=False, layered_fast=False):
    N = ldc.n_pad
    nc_pad = ldc.nc_pad
    tanh = cn_ops.is_tanh_mode(minsum_mode)
    phi = cn_ops.is_phi_mode(minsum_mode)
    op = None if (tanh or phi) else cn_ops.get_op(minsum_mode)
    mask_word = ldc.n_words  # real-edge mask lives in the last plane word
    compute = jnp.float32
    clos = ldc.transport == "clos"
    qc = ldc.transport == "qc"
    quantized = dtype == jnp.int8
    if quantized:
        # int8 quantized min-sum on the lane-major kernel — the same
        # integer-lattice design as the edge-major kernel (see
        # decode_fused._make_kernel): messages and posteriors live as
        # q = round(L / qscale) saturated to +-127; min/sign/sum/subtract
        # run in f32 on exact small integers, the channel prior enters
        # pre-scaled to lattice units (done by the wrapper), and only the
        # NMS/OMS correction re-rounds.  The OMS offset is given in LLR
        # units, so it shrinks to lattice units here.
        if isinstance(minsum_mode, tuple) and len(minsum_mode) == 3:
            minsum_mode = (minsum_mode[0], minsum_mode[1],
                           minsum_mode[2] / qscale)
        #: lattice PAD: +127 is an exact min-sum identity
        #: (sign(127) = +, min(|m|, 127) = |m| for every lattice value)
        pad_store = 127.0

        def to_store(x):
            return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)
    else:
        pad_store = PAD_LLR

        def to_store(x):
            return x.astype(dtype)

    # Channel priors enter the batch wrappers pre-scaled to lattice units
    # (one host-side multiply per node per decode); the STREAMING state
    # instead carries raw-LLR priors (shared pool format across message
    # dtypes), so the stream kernel scales them here — same f32 multiply,
    # byte-identical posteriors (see bp_stream_chunk_lanes).
    prior_mul = (1.0 / qscale) if (quantized and scale_prior) else 1.0

    def select_rows(mask, a, b):
        """``jnp.where(mask, a, b)`` for message-typed values, with an
        int8-safe bf16 arithmetic blend (Mosaic cannot lower int8 VPU
        select/arithmetic; integers |v| <= 127 are exact in bf16)."""
        if a.dtype == jnp.int8:
            m = mask.astype(jnp.bfloat16)
            return (a.astype(jnp.bfloat16) * m
                    + b.astype(jnp.bfloat16) * (1 - m)).astype(jnp.int8)
        return jnp.where(mask, a, b)

    def roll_lanes(v, k):
        """Static lane roll ``out[i] = v[i - k mod N]``.  Distances that
        are multiples of 128 are whole-tile moves expressed as a
        tile-aligned concatenation (dtype-agnostic — Mosaic's roll
        primitive is 32-bit-only); others fall back to ``pltpu.roll``."""
        k = k % N
        if k == 0:
            return v
        if k % 128 == 0:
            return jnp.concatenate([v[:, N - k :], v[:, : N - k]], axis=1)
        return pltpu.roll(v, k, axis=1)

    def mid_stages(w_ref, v, reverse):
        """Conditional-exchange stages from the packed switch planes
        (full Beneš network, or the Clos middle network whose distances
        are all tile-granular).  int8 messages upcast to bf16 ONCE for
        the whole network (integers |v| <= 127 are exact in bf16) and
        downcast at exit — round 5; the previous per-stage
        blend-and-requantise form cost 2 casts + a 5-op blend per stage
        and measured 5x slower than bf16 on the Clos middle network
        (benchmarks/res_qc_deployed.txt, n=1296 int8 rows)."""
        quant_in = v.dtype == jnp.int8
        if quant_in:
            v = v.astype(jnp.bfloat16)
        stages = list(zip(ldc.benes_dists, ldc.benes_words))
        if reverse:
            stages = stages[::-1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        for d, (w, b) in stages:
            sw = ((w_ref[w : w + 1, :] >> b) & 1) > 0
            top = (iota & d) == 0
            if v.dtype == jnp.int8:
                # arithmetic blends instead of selects (the [1, N]
                # mask-relayout limit), computed in bf16: Mosaic cannot
                # lower int8 VPU arithmetic (arith.addi on i8 vectors
                # fails), and every value here is an integer |v| <= 127 —
                # exact in bf16 — so upcast/blend/downcast is lossless
                vb = v.astype(jnp.bfloat16)
                swm = sw.astype(jnp.bfloat16)
                topm = top.astype(jnp.bfloat16)
                partner = (topm * roll_lanes(vb, N - d)
                           + (1 - topm) * roll_lanes(vb, d))
                v = (swm * partner + (1 - swm) * vb).astype(jnp.int8)
            else:
                partner = jnp.where(
                    top, roll_lanes(v, N - d), roll_lanes(v, d)
                )
                v = jnp.where(sw, partner, v)
        return v.astype(jnp.int8) if quant_in else v

    def blockmul(pref, v, contract_dim):
        """Block-diagonal one-hot matmul: per 128-lane block ``b``,
        ``out_b = v_b @ P_b^T`` (``contract_dim=1``) or ``v_b @ P_b``
        (``contract_dim=0``).  One-hot selection is exact for bf16
        operands; float32 messages use HIGHEST precision so the values
        pass through the MXU's bf16-decomposed passes unchanged (same
        guarantee as :func:`.decode_fused._make_kernel.mxu_permute`)."""
        precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                     else None)
        # int8 rides native s8 x s8 -> s32 MXU passes — exact (one-hot
        # selection of values bounded at +-127)
        acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
        parts = []
        for b in range(N // 128):
            m = pref[b].astype(dtype)
            parts.append(
                jax.lax.dot_general(
                    v[:, b * 128 : (b + 1) * 128],
                    m,
                    dimension_numbers=(((1,), (contract_dim,)), ((), ())),
                    preferred_element_type=acc,
                    precision=precision,
                ).astype(dtype)
            )
        return jnp.concatenate(parts, axis=1)

    #: populated (with two [ft, N] VMEM refs) by the kernel bodies when
    #: ``spill`` and the transport is clos or qc — the round-5
    #: chain-break: a Clos transport is itself three chained sub-networks
    #: (blockmul -> middle network -> blockmul), and the same Mosaic wall
    #: that killed two SSA-connected Benes chains (SPILL_FREE_LIMIT) hits
    #: the SSA edges *inside* one Clos transport at giant edge spaces;
    #: the qc transport's per-segment concat keeps the WHOLE edge space
    #: live while it assembles, so its spill form writes each segment
    #: straight into a chain ref instead (qc_spill_transport).
    chain_refs = []

    def blockmul_ref(pref, src_ref, contract_dim, out_ref):
        """Ref-to-ref :func:`blockmul`: each 128-lane block is read from
        ``src_ref``, multiplied, and written straight into ``out_ref`` —
        peak liveness is one block instead of the full ``[ft, N]`` value
        (the concat form keeps the whole edge space live across all
        ``N/128`` matmuls, which is exactly the scoped-stack pressure the
        spill form exists to avoid)."""
        precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                     else None)
        acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
        for b in range(N // 128):
            sl = slice(b * 128, (b + 1) * 128)
            m = pref[b].astype(dtype)
            out_ref[:, sl] = jax.lax.dot_general(
                src_ref[:, sl],
                m,
                dimension_numbers=(((1,), (contract_dim,)), ((), ())),
                preferred_element_type=acc,
                precision=precision,
            ).astype(dtype)

    def clos_spill_transport(p1_ref, p3_ref, w_ref, src_ref, reverse):
        """Clos transport with every sub-network boundary materialised
        through a VMEM ref (ping-pong ``tc1 -> tc2 -> tc1``); returns the
        final CN/VN-space value as a fresh read of ``tc1``."""
        tc1, tc2 = chain_refs
        first, last = (p3_ref, p1_ref) if reverse else (p1_ref, p3_ref)
        cd = 0 if reverse else 1
        blockmul_ref(first, src_ref, cd, tc1)
        tc2[:] = mid_stages(w_ref, tc1[:], reverse=reverse)
        blockmul_ref(last, tc2, cd, tc1)
        return tc1[:]

    def qc_spill_transport(src_ref, reverse):
        """QC transport, ref-to-ref: each output segment is read from
        ``src_ref``, rolled, and written straight into its slot of the
        first chain ref — peak liveness one ``[ft, Zq]`` segment instead
        of the whole edge space held live by the concat form (the same
        pressure the Clos chain-break relieves)."""
        tc1, _tc2 = chain_refs
        Z = ldc.qc_z
        Zq = ldc.qc_zq
        segs = ldc.qc_segments
        if reverse:
            triples = [(ac, av, (Z - s) % Z) for av, ac, s in segs]
        else:
            triples = [(av, ac, s) for av, ac, s in segs]
        if Z == Zq:
            for out_start, in_start, k in triples:
                tc1[:, out_start : out_start + Zq] = roll_seg(
                    src_ref[:, in_start : in_start + Zq], k, Zq
                )
        else:
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, Zq), 1)
            pad_c = jnp.asarray(pad_store, compute)
            for out_start, in_start, k in triples:
                seg = src_ref[:, in_start : in_start + Zq].astype(compute)
                k = k % Z
                a = pltpu.roll(seg, k, axis=1) if k else seg
                if k:
                    b = pltpu.roll(seg, (k - Z) % Zq, axis=1)
                    out = jnp.where(iota < k, b, a)
                else:
                    out = a
                out = jnp.where(iota < Z, out, pad_c)
                tc1[:, out_start : out_start + Zq] = (
                    to_store(out) if quantized else out.astype(dtype)
                )
        tail = N - len(segs) * Zq
        if tail:
            tc1[:, len(segs) * Zq :] = jnp.full(
                (ft, tail), pad_store, compute
            ).astype(dtype)
        return tc1[:]

    def roll_seg(seg, k, Zq):
        """Cyclic roll of one ``[ft, Zq]`` circulant segment by ``k``
        lanes.  Tile-granular distances are dtype-agnostic concatenations;
        others ride ``pltpu.roll`` — 32-bit only, so sub-32-bit messages
        round-trip through f32 (exact: bf16 values and lattice integers
        are both f32-representable)."""
        k = k % Zq
        if k == 0:
            return seg
        if k % 128 == 0:
            return jnp.concatenate(
                [seg[:, Zq - k :], seg[:, : Zq - k]], axis=1
            )
        if seg.dtype.itemsize < 4:
            return pltpu.roll(
                seg.astype(jnp.float32), k, axis=1
            ).astype(seg.dtype)
        return pltpu.roll(seg, k, axis=1)

    def qc_transport(v, reverse):
        """Structure-aware QC edge permutation: one cyclic roll per base
        edge (see lanes_layout._derive_qc_segments) — no switching
        network, no matmuls.  Forward (CN->VN): VN segment at ``Av`` =
        CN segment at ``Ac`` rolled by ``s``; reverse rolls by ``-s``.

        Arbitrary lifting sizes: each circulant occupies ``Zq``
        (128-aligned) lanes with the ``Z`` real lifts on lanes
        ``[0, Z)``.  ``Z == Zq`` is a single lane rotation; otherwise the
        embedded ``Z``-cyclic shift is two static rotations + one
        iota-select — ``out[i] = in[(i - s) mod Z]`` splits into
        ``roll(s)`` for lanes ``[s, Z)`` and ``roll(s - Z)`` for lanes
        ``[0, s)`` (both read real input lanes only, so fake lanes never
        leak), with lanes ``[Z, Zq)`` pinned to PAD.  Lanes past the real
        edge space carry the PAD constant (read only through force_pad /
        class-sliced updates)."""
        Z = ldc.qc_z
        Zq = ldc.qc_zq
        segs = ldc.qc_segments
        if reverse:
            parts_by_start = sorted(
                (ac, av, (Z - s) % Z) for av, ac, s in segs
            )
        else:
            parts_by_start = sorted(
                (av, ac, s) for av, ac, s in segs
            )
        parts = []
        if Z == Zq:
            for _out_start, in_start, s in parts_by_start:
                parts.append(
                    roll_seg(v[:, in_start : in_start + Zq], s, Zq)
                )
        else:
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, Zq), 1)
            pad_c = jnp.asarray(pad_store, compute)
            for _out_start, in_start, s in parts_by_start:
                seg = v[:, in_start : in_start + Zq].astype(compute)
                a = pltpu.roll(seg, s, axis=1) if s else seg
                if s:
                    b = pltpu.roll(seg, (s - Z) % Zq, axis=1)
                    out = jnp.where(iota < s, b, a)
                else:
                    out = a
                out = jnp.where(iota < Z, out, pad_c)
                parts.append(to_store(out) if quantized
                             else out.astype(v.dtype))
        tail = N - len(segs) * Zq
        if tail:
            parts.append(jnp.full((v.shape[0], tail), pad_store, compute)
                         .astype(v.dtype))
        return jnp.concatenate(parts, axis=1)

    def transport(p1_ref, p3_ref, w_ref, v, reverse):
        """CN-space <-> VN-space edge permutation."""
        if qc:
            return qc_transport(v, reverse)
        if not clos:
            return mid_stages(w_ref, v, reverse)
        if reverse:
            v = blockmul(p3_ref, v, contract_dim=0)
            v = mid_stages(w_ref, v, reverse=True)
            return blockmul(p1_ref, v, contract_dim=0)
        v = blockmul(p1_ref, v, contract_dim=1)
        v = mid_stages(w_ref, v, reverse=False)
        return blockmul(p3_ref, v, contract_dim=1)

    def transport_ref(p1_ref, p3_ref, w_ref, src_ref, reverse):
        """Spill-form transport entry: reads from a VMEM ref.  Clos
        breaks its internal sub-network chains
        (:func:`clos_spill_transport`), qc writes per segment
        (:func:`qc_spill_transport`); Benes reads the ref once."""
        if clos and chain_refs:
            return clos_spill_transport(p1_ref, p3_ref, w_ref, src_ref,
                                        reverse)
        if qc and chain_refs:
            return qc_spill_transport(src_ref, reverse)
        return transport(p1_ref, p3_ref, w_ref, src_ref[:], reverse)

    def force_pad(w_ref, v):
        """Pin fake/free CN-space slots to PAD_LLR (see lanes_layout)."""
        real = ((w_ref[mask_word : mask_word + 1, :]) & 1) > 0
        if v.dtype == jnp.int8:
            # bf16 arithmetic blend (see mid_stages); lattice PAD is +127
            m = real.astype(jnp.bfloat16)
            vb = v.astype(jnp.bfloat16)
            return (vb * m + jnp.bfloat16(127) * (1 - m)).astype(jnp.int8)
        if v.dtype == jnp.bfloat16:
            # arithmetic blend instead of select: Mosaic cannot relayout a
            # [1, N] i1 mask onto 16-sublane-packed bf16 tiles in every
            # kernel context ("Invalid relayout ... (8,128) -> (16,128)",
            # hit by the layered kernel).  m is exactly 0/1 so
            # v*m + PAD*(1-m) is exact in bf16 (values are finite).
            m = real.astype(v.dtype)
            return v * m + jnp.asarray(PAD_LLR, v.dtype) * (1 - m)
        return jnp.where(real, v, jnp.asarray(PAD_LLR, v.dtype))

    def cn_exclusion(v):
        """CN update on CN-space lanes ``[ft, N]`` -> ``[ft, N]``."""
        parts = []
        for base, cp, d in ldc.cn_blocks:
            M = [
                v[:, base + j * cp : base + (j + 1) * cp].astype(compute)
                for j in range(d)
            ]
            if d == 1:
                parts.append(jnp.full_like(M[0], PAD_LLR))
                continue
            if phi:
                S = [1.0 - 2.0 * jnp.signbit(m).astype(compute) for m in M]
                A = [cn_ops.phi(jnp.abs(m)) for m in M]
                fs, fa = [S[0]], [A[0]]
                bs, ba = [S[d - 1]], [A[d - 1]]
                for j in range(1, d):
                    fs.append(fs[-1] * S[j])
                    fa.append(fa[-1] + A[j])
                    bs.append(bs[-1] * S[d - 1 - j])
                    ba.append(ba[-1] + A[d - 1 - j])
                out = [bs[d - 2] * cn_ops.phi_out(ba[d - 2])]
                for j in range(1, d - 1):
                    out.append(
                        fs[j - 1] * bs[d - 2 - j]
                        * cn_ops.phi_out(fa[j - 1] + ba[d - 2 - j])
                    )
                out.append(fs[d - 2] * cn_ops.phi_out(fa[d - 2]))
                parts.extend(out)
                continue
            if tanh:
                M = [cn_ops.tanh_pre(m) for m in M]
            fwd = [M[0]]
            bwd = [M[d - 1]]
            for j in range(1, d):
                if tanh:
                    fwd.append(fwd[-1] * M[j])
                    bwd.append(bwd[-1] * M[d - 1 - j])
                else:
                    fwd.append(op(fwd[-1], M[j]))
                    bwd.append(op(bwd[-1], M[d - 1 - j]))
            out = [bwd[d - 2]]
            for j in range(1, d - 1):
                out.append(
                    fwd[j - 1] * bwd[d - 2 - j]
                    if tanh
                    else op(fwd[j - 1], bwd[d - 2 - j])
                )
            out.append(fwd[d - 2])
            if tanh:
                out = [cn_ops.tanh_post(o) for o in out]
            parts.extend(out)
        cn_end = sum(cp * d for _, cp, d in ldc.cn_blocks)
        if N > cn_end:
            # PAD_LLR (positive), not zero: free-slot values reach fake VN
            # posteriors and come back to fake checks' syndrome lanes,
            # where a zero would read as a hard 1 and block early term
            # (to_store saturates it to the +127 lattice PAD for int8)
            parts.append(
                jnp.full((v.shape[0], N - cn_end), PAD_LLR, compute)
            )
        return to_store(cn_ops.cn_postprocess(
            jnp.concatenate(parts, axis=1), minsum_mode
        ))

    def vn_stage(llr, lc2v_v):
        """Posterior per node ``[ft, nc_pad]`` and per VN-space slot
        ``[ft, N]`` (see decode_fused.vn_stage for why the posterior is
        transported rather than the extrinsic)."""
        llr_parts = []
        post_parts = []
        for (base_e, cp, d), nb in zip(ldc.vn_blocks, ldc.vn_node_base):
            lin = llr[:, nb : nb + cp].astype(compute)
            if prior_mul != 1.0:
                lin = lin * prior_mul
            if d == 0:
                llr_parts.append(to_store(lin))
                continue
            tot = lc2v_v[:, base_e : base_e + cp].astype(compute)
            for j in range(1, d):
                tot = tot + lc2v_v[
                    :, base_e + j * cp : base_e + (j + 1) * cp
                ].astype(compute)
            llr_b = to_store(lin + tot)
            llr_parts.append(llr_b)
            for _ in range(d):
                post_parts.append(llr_b)
        vn_end = sum(cp * d for _, cp, d in ldc.vn_blocks)
        if N > vn_end:
            # positive fill — these slots land on fake checks (see
            # cn_exclusion) and must read as hard-0 bits in the syndrome
            post_parts.append(
                jnp.full((llr.shape[0], N - vn_end), pad_store).astype(dtype)
            )
        return (
            jnp.concatenate(llr_parts, axis=1),
            jnp.concatenate(post_parts, axis=1),
        )

    def init_lv2c(p1_ref, p3_ref, w_ref, llr):
        parts = []
        for (base_e, cp, d), nb in zip(ldc.vn_blocks, ldc.vn_node_base):
            if d == 0:
                continue
            lin = to_store(llr[:, nb : nb + cp].astype(compute))
            for _ in range(d):
                parts.append(lin)
        vn_end = sum(cp * d for _, cp, d in ldc.vn_blocks)
        if N > vn_end:
            parts.append(jnp.zeros((llr.shape[0], N - vn_end), dtype))
        v = jnp.concatenate(parts, axis=1)
        if chain_refs and (clos or qc):
            # giant edge space: even the one-shot init transport carries
            # the full chain/concat pressure — stage it through the
            # chain refs like every in-loop transport
            tc1, tc2 = chain_refs
            tc2[:] = v
            if clos:
                return clos_spill_transport(p1_ref, p3_ref, w_ref, tc2,
                                            reverse=True)
            return qc_spill_transport(tc2, reverse=True)
        return transport(p1_ref, p3_ref, w_ref, v, reverse=True)

    def syndrome(q):
        """Per-frame satisfied flag from CN-space posteriors ``[ft, N]``.

        Fake checks hold PAD_LLR on every input lane (force_pad), so their
        parity is 0 and no real-node mask is needed.
        """
        viol = jnp.zeros((q.shape[0], 1), jnp.int32)
        for base, cp, d in ldc.cn_blocks:
            bits = None
            for j in range(d):
                # compare in f32 (Mosaic rejects cmpf on some bf16 forms)
                b = (
                    q[:, base + j * cp : base + (j + 1) * cp]
                    .astype(jnp.float32)
                    <= 0
                ).astype(jnp.int32)
                bits = b if bits is None else bits + b
            odd = jnp.bitwise_and(bits, 1)
            viol = viol + jnp.sum(odd, axis=1, keepdims=True)
        return jnp.where(viol == 0, 1, 0)  # int32 [ft, 1]

    def resolved(llr_out):
        """BEC convergence: every REAL node lane's posterior is nonzero
        (erasure == exact 0 in the sign encoding — see
        :func:`bec_decode_lanes`; exactness is preserved because the
        min-sum algebra only mins/adds same-sign values).  The reference's
        criterion: no erasures left in the output,
        ``src/decoding/decoder.cpp:169-186``."""
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, nc_pad), 1)
        real = jnp.zeros((1, nc_pad), jnp.bool_)
        for (count, _d), nb in zip(ldc.sorted_dc.vn_classes,
                                   ldc.vn_node_base):
            if qc and ldc.qc_z != ldc.qc_zq:
                # circulant-granular layout: real node lanes are the
                # first Z of every Zq-lane circulant block (see
                # lanes_layout._class_lanes)
                for j in range(count // ldc.qc_z):
                    s0 = nb + j * ldc.qc_zq
                    real = real | ((iota >= s0) & (iota < s0 + ldc.qc_z))
            else:
                real = real | ((iota >= nb) & (iota < nb + count))
        unres = jnp.sum(
            jnp.where(real & (llr_out == 0.0), 1, 0), axis=1, keepdims=True
        )
        return jnp.where(unres == 0, 1, 0)  # int32 [ft, 1]

    def kernel_stream(*refs):
        """Self-refilling streaming chunk, frames on sublanes — the
        lane-major counterpart of ``decode_fused.kernel_stream`` (same
        per-frame semantics, counting and exact-quota scheme; see that
        kernel's docstring).  Rows of the ``[ft, 128]`` bookkeeping
        planes are per-frame; counter columns are
        0 bit_errors / 1 frame_errors / 2 frames / 3 iter_sum /
        4 started."""
        np_ = 3 if clos else 1
        pref = refs[:np_]
        if spill:
            if clos or qc:
                *refs, tmp_ref, tmp2_ref, tmpn_ref, tc1_ref, tc2_ref = refs
                chain_refs[:] = [tc1_ref, tc2_ref]
            else:
                *refs, tmp_ref, tmp2_ref, tmpn_ref = refs
        (istx_ref, fresh_llr_ref, fresh_cw_ref, fresh_lv2c_ref, refill_ref,
         remaining_ref,
         llr_in, cw_in, lv2c_in, done_in, iters_in, age_in, avail_in,
         ctr_in,
         llr_ref, cw_ref, lv2c_ref, done_ref, iters_ref, age_ref,
         avail_ref, ctr_ref, rem_s) = refs[np_:]
        if clos:
            p1_ref, p3_ref, w_ref = pref
        else:
            (w_ref,) = pref
            p1_ref = p3_ref = None

        @pl.when(pl.program_id(0) == 0)
        def _():
            rem_s[0] = remaining_ref[0, 0]

        llr_ref[:] = llr_in[:]
        cw_ref[:] = cw_in[:]
        lv2c_ref[:] = lv2c_in[:]
        done_ref[:] = done_in[:]
        iters_ref[:] = iters_in[:]
        age_ref[:] = age_in[:]
        avail_ref[:] = avail_in[:]
        ctr_ref[:] = ctr_in[:]

        row = jax.lax.broadcasted_iota(jnp.int32, (ft, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ft, 128), 1)
        refill_on = refill_ref[0, 0] > 0

        def body(it, carry):
            # ---- phase 1: reload idle frame rows from the pool ----------
            done_i = done_ref[:, 0:1]
            avail_i = avail_ref[:, 0:1]
            eligible = done_i * avail_i  # i32 0/1 [ft, 1]

            @pl.when(refill_on & (jnp.sum(eligible) > 0))
            def _():
                # inclusive scan over the ft sublane rows caps starts at
                # the remaining global quota exactly
                cum = eligible
                d = 1
                while d < ft:
                    cum = cum + jnp.where(
                        row >= d, pltpu.roll(cum, d, axis=0), 0
                    )
                    d *= 2
                allowed = eligible * jnp.where(cum <= rem_s[0], 1, 0)
                rs = allowed > 0  # [ft, 1] broadcasts over lanes
                llr_ref[:] = jnp.where(rs, fresh_llr_ref[:], llr_ref[:])
                cw_ref[:] = jnp.where(rs, fresh_cw_ref[:], cw_ref[:])
                # warm-up-free reload: the pool ships pre-gathered
                # edge-space priors; the next pass is real iteration 1
                # (age = 1), one pass cheaper per frame than zero-init
                lv2c_ref[:] = select_rows(rs, fresh_lv2c_ref[:], lv2c_ref[:])
                done_ref[:, 0:1] = done_i * (1 - allowed)
                age_ref[:, 0:1] = (
                    age_ref[:, 0:1] * (1 - allowed) + allowed
                )
                iters_ref[:, 0:1] = iters_ref[:, 0:1] * (1 - allowed)
                avail_ref[:, 0:1] = avail_i - allowed
                ctr_ref[:] = ctr_ref[:] + jnp.where(
                    col == 4, allowed, 0
                )
                rem_s[0] = rem_s[0] - jnp.sum(allowed)

            # ---- phase 2: one BP pass over in-flight rows ---------------
            @pl.when(jnp.sum(done_ref[:, 0:1]) < ft)
            def _():
                # force_pad after the reload select keeps fake slots pinned
                # to PAD_LLR for live rows (fresh_lv2c carries zeros there)
                if spill:
                    # giant-edge-space form (see the flooding kernel)
                    tmp_ref[:] = cn_exclusion(
                        force_pad(w_ref, lv2c_ref[:])
                    )
                    lc2v_v = transport_ref(p1_ref, p3_ref, w_ref, tmp_ref,
                                           reverse=False)
                    llr_out, post_v = vn_stage(llr_ref[:], lc2v_v)
                    tmp2_ref[:] = post_v
                    tmpn_ref[:] = llr_out.astype(jnp.float32)
                    q = transport_ref(p1_ref, p3_ref, w_ref, tmp2_ref,
                                      reverse=True)
                    lv2c_new = force_pad(
                        w_ref,
                        to_store(q.astype(compute)
                     - tmp_ref[:].astype(compute)),
                    )
                    lv2c = lv2c_ref[:]  # fresh read, not live across chains
                    llr_out = tmpn_ref[:]
                else:
                    lv2c = lv2c_ref[:]
                    lc2v_c = cn_exclusion(force_pad(w_ref, lv2c))
                    lc2v_v = transport(p1_ref, p3_ref, w_ref, lc2v_c,
                                       reverse=False)
                    llr_out, post_v = vn_stage(llr_ref[:], lc2v_v)
                    q = transport(p1_ref, p3_ref, w_ref, post_v,
                                  reverse=True)
                    lv2c_new = force_pad(
                        w_ref,
                        to_store(q.astype(compute)
                     - lc2v_c.astype(compute)),
                    )
                    llr_out = llr_out.astype(jnp.float32)

                done_i2 = done_ref[:, 0:1]
                age_i = age_ref[:, 0:1]
                # BEC convergence is "no erasures left", not a syndrome
                # (same switch as the batch kernels above)
                is_cw = resolved(llr_out) if bec_mode else syndrome(q)
                checking = (1 - done_i2) * jnp.where(age_i >= 1, 1, 0)
                newly = checking * is_cw
                iters2 = iters_ref[:, 0:1] + checking * (1 - is_cw)
                iters_ref[:, 0:1] = iters2
                age2 = age_i + (1 - done_i2)
                age_ref[:, 0:1] = age2
                finished = (1 - done_i2) * jnp.where(
                    (newly > 0) | (age2 >= cap + 1), 1, 0
                )
                done_ref[:, 0:1] = done_i2 + finished
                # transmitted-bit errors along the lane axis.  BEC: errors
                # are exactly the unresolved transmitted bits — revealed
                # messages always equal the true bit, and unresolved bits
                # decide the WRONG bit (src/decoding/decoder.cpp:163-165)
                if bec_mode:
                    err = jnp.where(llr_out == 0.0, istx_ref[:], 0)
                else:
                    err = jnp.where(
                        (llr_out <= 0) != (cw_ref[:] > 0), istx_ref[:], 0
                    )
                biterr = jnp.sum(err, axis=1, keepdims=True)  # [ft, 1]
                upd = (
                    jnp.where(col == 0, finished * biterr, 0)
                    + jnp.where(
                        col == 1,
                        finished * jnp.where(biterr > 0, 1, 0),
                        0,
                    )
                    + jnp.where(col == 2, finished, 0)
                    + jnp.where(col == 3, finished * iters2, 0)
                )
                ctr_ref[:] = ctr_ref[:] + upd
                keep = done_i2 > 0
                lv2c_ref[:] = select_rows(keep, lv2c, lv2c_new)
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)

    def kernel_stream_layered_qc(*refs):
        """Streaming chunk on the fast layered engine (round 5): the
        self-refilling compaction of ``kernel_stream`` with the
        APP-update layered iteration of ``kernel_layered_qc`` as the
        decode pass — the measured best-of-both (layered converges in
        ~2x fewer iterations; streaming keeps every row busy).

        State reinterpretation (the streaming state tuple is unchanged):
        the ``llr_in`` plane carries the PERSISTENT APP posterior (the
        channel prior is only ever read at init — ``Lv2c = app - stale``
        thereafter), and ``lv2c`` carries the persisted CN-space
        extrinsics.  A reloaded row starts ``app = fresh_llr x
        prior_mul`` and ``lc2v = 0`` (``fresh_lv2c`` is ignored — the
        engine needs no pre-gathered edge priors); rows entering at
        ``age == 0`` (the initial batch, shipped raw by the XLA side)
        get the same in-kernel init on their warm-up pass, so counting
        semantics match the flooding stream exactly."""
        (w_ref,) = refs[:1]
        (istx_ref, fresh_llr_ref, fresh_cw_ref, fresh_lv2c_ref, refill_ref,
         remaining_ref,
         llr_in, cw_in, lv2c_in, done_in, iters_in, age_in, avail_in,
         ctr_in,
         llr_ref, cw_ref, lv2c_ref, done_ref, iters_ref, age_ref,
         avail_ref, ctr_ref, rem_s) = refs[1:]

        syndrome_qc, layered_pass = _qc_engine(llr_ref, lv2c_ref)

        @pl.when(pl.program_id(0) == 0)
        def _():
            rem_s[0] = remaining_ref[0, 0]

        llr_ref[:] = llr_in[:]
        cw_ref[:] = cw_in[:]
        lv2c_ref[:] = lv2c_in[:]
        done_ref[:] = done_in[:]
        iters_ref[:] = iters_in[:]
        age_ref[:] = age_in[:]
        avail_ref[:] = avail_in[:]
        ctr_ref[:] = ctr_in[:]

        row = jax.lax.broadcasted_iota(jnp.int32, (ft, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ft, 128), 1)
        refill_on = refill_ref[0, 0] > 0

        def body(it, carry):
            # ---- phase 0: in-kernel init of raw age-0 rows -------------
            done_0 = done_ref[:, 0:1]
            raw = (1 - done_0) * jnp.where(age_ref[:, 0:1] == 0, 1, 0)

            @pl.when(jnp.sum(raw) > 0)
            def _():
                rs = raw > 0
                if prior_mul != 1.0:
                    llr_ref[:] = jnp.where(
                        rs, llr_ref[:] * prior_mul, llr_ref[:]
                    )
                lv2c_ref[:] = select_rows(
                    rs, jnp.zeros((ft, N), dtype), lv2c_ref[:]
                )
                # app = prior IS the engine's init — the coming pass is
                # real iteration 1 (no uncounted warm-up pass like the
                # flooding stream's zero-message gather pass), so raw
                # rows promote straight to age 1 like reloaded rows
                age_ref[:, 0:1] = age_ref[:, 0:1] + raw

            # ---- phase 1: reload idle frame rows from the pool ----------
            done_i = done_ref[:, 0:1]
            avail_i = avail_ref[:, 0:1]
            eligible = done_i * avail_i  # i32 0/1 [ft, 1]

            @pl.when(refill_on & (jnp.sum(eligible) > 0))
            def _():
                cum = eligible
                d = 1
                while d < ft:
                    cum = cum + jnp.where(
                        row >= d, pltpu.roll(cum, d, axis=0), 0
                    )
                    d *= 2
                allowed = eligible * jnp.where(cum <= rem_s[0], 1, 0)
                rs = allowed > 0  # [ft, 1] broadcasts over lanes
                llr_ref[:] = jnp.where(
                    rs, fresh_llr_ref[:] * prior_mul, llr_ref[:]
                )
                cw_ref[:] = jnp.where(rs, fresh_cw_ref[:], cw_ref[:])
                # the engine needs no warm-up state: app = prior and
                # lc2v = 0 make the next pass real iteration 1
                lv2c_ref[:] = select_rows(
                    rs, jnp.zeros((ft, N), dtype), lv2c_ref[:]
                )
                done_ref[:, 0:1] = done_i * (1 - allowed)
                age_ref[:, 0:1] = (
                    age_ref[:, 0:1] * (1 - allowed) + allowed
                )
                iters_ref[:, 0:1] = iters_ref[:, 0:1] * (1 - allowed)
                avail_ref[:, 0:1] = avail_i - allowed
                ctr_ref[:] = ctr_ref[:] + jnp.where(
                    col == 4, allowed, 0
                )
                rem_s[0] = rem_s[0] - jnp.sum(allowed)

            # ---- phase 2: one layered iteration over in-flight rows -----
            @pl.when(jnp.sum(done_ref[:, 0:1]) < ft)
            def _():
                done_i2 = done_ref[:, 0:1]
                age_i = age_ref[:, 0:1]
                layered_pass(done_i2 > 0)
                is_cw = syndrome_qc()
                checking = (1 - done_i2) * jnp.where(age_i >= 1, 1, 0)
                newly = checking * is_cw
                iters2 = iters_ref[:, 0:1] + checking * (1 - is_cw)
                iters_ref[:, 0:1] = iters2
                age2 = age_i + (1 - done_i2)
                age_ref[:, 0:1] = age2
                finished = (1 - done_i2) * jnp.where(
                    (newly > 0) | (age2 >= cap + 1), 1, 0
                )
                done_ref[:, 0:1] = done_i2 + finished
                # transmitted-bit errors from the app posterior
                err = jnp.where(
                    (llr_ref[:] <= 0) != (cw_ref[:] > 0), istx_ref[:], 0
                )
                biterr = jnp.sum(err, axis=1, keepdims=True)  # [ft, 1]
                upd = (
                    jnp.where(col == 0, finished * biterr, 0)
                    + jnp.where(
                        col == 1,
                        finished * jnp.where(biterr > 0, 1, 0),
                        0,
                    )
                    + jnp.where(col == 2, finished, 0)
                    + jnp.where(col == 3, finished * iters2, 0)
                )
                ctr_ref[:] = ctr_ref[:] + upd
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)


    def kernel_layered(*refs):
        """Layered (serial) schedule, lane-major: per iteration, each layer
        refreshes its checks' messages and the APP recomputes — the GPU
        stack's kernel capability (``gpu/device/kernel.cpp:54-74``), with
        per-layer freeze/early-termination semantics identical to the XLA
        layered decoder (:func:`..sorted._bp_decode_sorted_layered`) and
        the edge-major layered kernel (:func:`.decode_fused` —
        ``kernel_layered``).  Needs one extra ``[ft, N]`` VMEM state buffer
        for the persisted ``Lc2v`` (stale layers keep their last
        messages)."""
        if spill:
            if clos or qc:
                *refs, tmp_ref, tmp2_ref, tmpn_ref, tc1_ref, tc2_ref = refs
                chain_refs[:] = [tc1_ref, tc2_ref]
            else:
                *refs, tmp_ref, tmp2_ref, tmpn_ref = refs
        if clos:
            (p1_ref, p3_ref, w_ref, llr_ref, out_llr_ref, out_iters_ref,
             out_iscw_ref, lv2c_ref, done_ref, iters_ref, iscw_ref,
             lc2v_ref) = refs
        else:
            (w_ref, llr_ref, out_llr_ref, out_iters_ref, out_iscw_ref,
             lv2c_ref, done_ref, iters_ref, iscw_ref, lc2v_ref) = refs
            p1_ref = p3_ref = None
        llr = llr_ref[:]
        lv2c_ref[:] = force_pad(w_ref, init_lv2c(p1_ref, p3_ref, w_ref, llr))
        # persisted Lc2v starts 0 on real lanes (XLA layered semantics);
        # fake check lanes are pinned to PAD_LLR from the start — they are
        # never in any layer, so this keeps fake checks trivially
        # satisfied in the syndrome (the flooding kernel gets the same
        # effect from cn_exclusion's PAD outputs every pass)
        lc2v_ref[:] = force_pad(w_ref, jnp.zeros((ft, N), dtype))
        done_ref[:] = jnp.zeros((ft, 128), jnp.int32)
        iters_ref[:] = jnp.zeros((ft, 128), jnp.int32)
        iscw_ref[:] = jnp.zeros((ft, 128), jnp.int32)
        out_llr_ref[:] = jnp.zeros((ft, nc_pad), jnp.float32)

        def body(it, carry):
            def iteration():
                done_start = done_ref[:, 0:1]
                for lw, lb in ldc.layer_words:
                    lp = ((w_ref[lw : lw + 1, :] >> lb) & 1) > 0
                    if spill:
                        # giant-edge-space form (see the flooding kernel):
                        # every value crossing a transport chain goes
                        # through a spill ref
                        lc2v_new = cn_exclusion(lv2c_ref[:])
                        if dtype == jnp.bfloat16:
                            lpm = lp.astype(dtype)
                            tmp_ref[:] = (lc2v_new * lpm
                                          + lc2v_ref[:] * (1 - lpm))
                        else:
                            tmp_ref[:] = jnp.where(lp, lc2v_new, lc2v_ref[:])
                        lc2v_v = transport_ref(p1_ref, p3_ref, w_ref,
                                               tmp_ref, reverse=False)
                        llr_out, post_v = vn_stage(llr_ref[:], lc2v_v)
                        tmp2_ref[:] = post_v
                        tmpn_ref[:] = llr_out.astype(jnp.float32)
                        q = transport_ref(p1_ref, p3_ref, w_ref, tmp2_ref,
                                          reverse=True)
                        lv2c_l = force_pad(
                            w_ref,
                            to_store(q.astype(compute)
                     - tmp_ref[:].astype(compute)),
                        )
                        lv2c = lv2c_ref[:]  # fresh reads after the chains
                        lc2v_state = lc2v_ref[:]
                        lc2v_l = tmp_ref[:]
                        llr_out = tmpn_ref[:]
                    else:
                        lv2c = lv2c_ref[:]
                        lc2v_state = lc2v_ref[:]
                        lc2v_new = cn_exclusion(lv2c)
                        if dtype == jnp.bfloat16:
                            # same [1, N]-mask-on-bf16 relayout limit as
                            # force_pad: exact arithmetic blend (0/1 mask)
                            lpm = lp.astype(dtype)
                            lc2v_l = lc2v_new * lpm + lc2v_state * (1 - lpm)
                        else:
                            lc2v_l = jnp.where(lp, lc2v_new, lc2v_state)
                        lc2v_v = transport(p1_ref, p3_ref, w_ref, lc2v_l,
                                           reverse=False)
                        llr_out, post_v = vn_stage(llr, lc2v_v)
                        q = transport(p1_ref, p3_ref, w_ref, post_v,
                                      reverse=True)
                        lv2c_l = force_pad(
                            w_ref,
                            to_store(q.astype(compute)
                     - lc2v_l.astype(compute)),
                        )
                        llr_out = llr_out.astype(jnp.float32)
                    done_i = done_ref[:, 0:1]
                    keep = done_i > 0  # [ft, 1] broadcasts over lanes
                    if early_term:
                        is_cw = syndrome(q)
                        newly = (1 - done_i) * is_cw
                        done_ref[:, 0:1] = done_i + newly
                        iscw_ref[:, 0:1] = (
                            done_i * iscw_ref[:, 0:1] + (1 - done_i) * is_cw
                        )
                    lv2c_ref[:] = select_rows(keep, lv2c, lv2c_l)
                    lc2v_ref[:] = select_rows(keep, lc2v_state, lc2v_l)
                    out_llr_ref[:] = jnp.where(keep, out_llr_ref[:], llr_out)
                    last_q = q
                if early_term:
                    # iteration counted iff unconverged at both the start
                    # and the end of the full iteration (XLA layered
                    # semantics, ops/sorted.py _bp_decode_sorted_layered)
                    iters_ref[:, 0:1] = iters_ref[:, 0:1] + (
                        (1 - done_start) * (1 - done_ref[:, 0:1])
                    )
                else:
                    @pl.when(it == iterations - 1)
                    def _():
                        iscw_ref[:, 0:1] = syndrome(last_q)

            if early_term:
                active = jnp.sum(done_ref[:, 0:1]) < ft

                @pl.when(active)
                def _():
                    iteration()
            else:
                iteration()
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)
        if not early_term:
            iters_ref[:, 0:1] = jnp.full((ft, 1), iterations, jnp.int32)
        out_iters_ref[:] = iters_ref[:]
        out_iscw_ref[:] = iscw_ref[:]

    def _qc_engine(app_ref, lc2v_ref):
        """Shared machinery of the fast layered engine (round 5), used by
        the batch kernel (``kernel_layered_qc``) and its streaming
        counterpart (``kernel_stream_layered_qc``): embedded rolls,
        message clipping, the layer-blocked CN exclusion, the app-state
        syndrome, and one full layered iteration over ``ldc.qc_layers``
        with done-row freezing.  ``app_ref`` is the persistent
        ``[ft, nc_pad]`` f32 posterior (lattice units for int8 messages),
        ``lc2v_ref`` the persisted ``[ft, N]`` CN-space extrinsics."""
        Z = ldc.qc_z
        Zq = ldc.qc_zq
        iota_z = jax.lax.broadcasted_iota(jnp.int32, (1, Zq), 1)

        def eroll(seg32, s, fill):
            """Embedded Z-cyclic roll by ``s`` over a [ft, Zq] f32 block;
            lanes >= Z get ``fill``."""
            s = s % Z
            if s == 0:
                out = seg32
            else:
                a = pltpu.roll(seg32, s, axis=1)
                b = pltpu.roll(seg32, (s - Z) % Zq, axis=1)
                out = jnp.where(iota_z < s, b, a)
            if Z == Zq:
                return out
            return jnp.where(iota_z < Z, out, fill)

        def to_msg(x):
            """Clip/round an f32 value into the message dtype's domain
            (staying in f32 for compute — values are exactly
            representable)."""
            if quantized:
                return jnp.clip(jnp.round(x), -127.0, 127.0)
            if dtype == jnp.bfloat16:
                return x.astype(jnp.bfloat16).astype(compute)
            return x

        def excl_list(M):
            """CN exclusion over the layer's d aligned [ft, Zq] blocks
            (same op set as cn_exclusion, one degree group)."""
            d = len(M)
            if d == 1:
                return [jnp.full_like(M[0], PAD_LLR)]
            if phi:
                S = [1.0 - 2.0 * jnp.signbit(m).astype(compute) for m in M]
                A = [cn_ops.phi(jnp.abs(m)) for m in M]
                fs, fa = [S[0]], [A[0]]
                bs, ba = [S[d - 1]], [A[d - 1]]
                for j in range(1, d):
                    fs.append(fs[-1] * S[j])
                    fa.append(fa[-1] + A[j])
                    bs.append(bs[-1] * S[d - 1 - j])
                    ba.append(ba[-1] + A[d - 1 - j])
                out = [bs[d - 2] * cn_ops.phi_out(ba[d - 2])]
                for j in range(1, d - 1):
                    out.append(
                        fs[j - 1] * bs[d - 2 - j]
                        * cn_ops.phi_out(fa[j - 1] + ba[d - 2 - j])
                    )
                out.append(fs[d - 2] * cn_ops.phi_out(fa[d - 2]))
                return out
            Mi = [cn_ops.tanh_pre(m) for m in M] if tanh else M
            fwd = [Mi[0]]
            bwd = [Mi[d - 1]]
            for j in range(1, d):
                if tanh:
                    fwd.append(fwd[-1] * Mi[j])
                    bwd.append(bwd[-1] * Mi[d - 1 - j])
                else:
                    fwd.append(op(fwd[-1], Mi[j]))
                    bwd.append(op(bwd[-1], Mi[d - 1 - j]))
            out = [bwd[d - 2]]
            for j in range(1, d - 1):
                out.append(
                    fwd[j - 1] * bwd[d - 2 - j]
                    if tanh
                    else op(fwd[j - 1], bwd[d - 2 - j])
                )
            out.append(fwd[d - 2])
            if tanh:
                out = [cn_ops.tanh_post(o) for o in out]
            return out

        def syndrome_qc():
            """Violation count from the app state: one reverse roll per
            segment, parity per check circulant (fake lanes read the
            positive fill -> bit 0)."""
            viol = jnp.zeros((ft, 1), jnp.int32)
            for segs in ldc.qc_layers:
                bits = None
                for ac, nbc, s in segs:
                    acn = eroll(app_ref[:, nbc : nbc + Zq], Z - s, PAD_LLR)
                    b = (acn <= 0).astype(jnp.int32)
                    bits = b if bits is None else bits + b
                odd = jnp.bitwise_and(bits, 1)
                viol = viol + jnp.sum(odd, axis=1, keepdims=True)
            return jnp.where(viol == 0, 1, 0)

        def layered_pass(keep):
            """One full layered iteration; rows with ``keep`` frozen."""
            for segs in ldc.qc_layers:
                lv = []
                stale = []
                for ac, nbc, s in segs:
                    acn = eroll(
                        app_ref[:, nbc : nbc + Zq], Z - s, PAD_LLR
                    )
                    st = lc2v_ref[:, ac : ac + Zq].astype(compute)
                    lv.append(to_msg(acn - st))
                    stale.append(st)
                outs = excl_list(lv)
                for (ac, nbc, s), o, st in zip(segs, outs, stale):
                    o = cn_ops.cn_postprocess(o, minsum_mode)
                    if quantized:
                        o = jnp.clip(jnp.round(o), -127.0, 127.0)
                    elif dtype == jnp.bfloat16:
                        o = o.astype(jnp.bfloat16).astype(compute)
                    delta = eroll(o - st, s, 0.0)
                    blk = app_ref[:, nbc : nbc + Zq]
                    app_ref[:, nbc : nbc + Zq] = jnp.where(
                        keep, blk, blk + delta
                    )
                    lc2v_ref[:, ac : ac + Zq] = select_rows(
                        keep, lc2v_ref[:, ac : ac + Zq],
                        to_store(o),
                    )

        return syndrome_qc, layered_pass

    def kernel_layered_qc(*refs):
        """Fast layered engine for QC natural layers (round 5).

        The exact ``kernel_layered`` recomputes the FULL edge space per
        layer (cn_exclusion + two transports + vn_stage over all
        classes), costing ~n_layers x a flooding pass per iteration —
        measured 2.6-5x flooding (benchmarks/res_qc_deployed.txt, round
        4).  This engine is the app-update formulation hardware layered
        decoders use: the node posterior (APP) is persistent state, and
        layer ``r`` touches ONLY its own circulant blocks —

        * ``Lv2c[e] = clip(app[v(e)] - Lc2v_stale[e])`` gathered by one
          embedded cyclic roll per segment,
        * CN exclusion across the layer's d aligned ``[ft, Zq]`` blocks,
        * ``app[v] += roll_fwd(Lc2v_new - Lc2v_stale)`` scattered back.

        Per-layer cost is proportional to the LAYER's edges, so a full
        iteration costs ~one flooding pass (2 rolls per edge + CN work)
        regardless of layer count.  Differences from the exact kernel,
        by design (documented in docs/DESIGN.md): the posterior
        accumulates incrementally in f32 (wide-accumulator hardware
        style — for int8 messages the app is NOT requantised between
        layers), and early termination is evaluated once per full
        iteration (the reference CPU decoder's granularity,
        src/decoding/decoder.cpp:66-72) instead of per layer.
        Equivalence is pinned by tests against a NumPy golden of this
        exact recursion (tests/golden.py:layered_qc_golden) plus FER
        parity vs the full-recompute schedule.
        """
        (w_ref, llr_ref, out_llr_ref, out_iters_ref, out_iscw_ref,
         lc2v_ref, done_ref, iters_ref, iscw_ref, app_ref) = refs
        syndrome_qc, layered_pass = _qc_engine(app_ref, lc2v_ref)
        app_ref[:] = llr_ref[:].astype(jnp.float32) * prior_mul
        lc2v_ref[:] = jnp.zeros((ft, N), dtype)
        done_ref[:] = jnp.zeros((ft, 128), jnp.int32)
        iters_ref[:] = jnp.zeros((ft, 128), jnp.int32)
        iscw_ref[:] = jnp.zeros((ft, 128), jnp.int32)

        def body(it, carry):
            def iteration():
                done_i = done_ref[:, 0:1]
                keep = done_i > 0  # [ft, 1] broadcasts over lanes
                layered_pass(keep)
                if early_term:
                    is_cw = syndrome_qc()
                    newly = (1 - done_i) * is_cw
                    iters_ref[:, 0:1] = (
                        iters_ref[:, 0:1] + (1 - done_i) * (1 - newly)
                    )
                    done_ref[:, 0:1] = done_i + newly
                    iscw_ref[:, 0:1] = (
                        done_i * iscw_ref[:, 0:1] + (1 - done_i) * is_cw
                    )
                else:
                    @pl.when(it == iterations - 1)
                    def _():
                        iscw_ref[:, 0:1] = syndrome_qc()

            if early_term:
                active = jnp.sum(done_ref[:, 0:1]) < ft

                @pl.when(active)
                def _():
                    iteration()
            else:
                iteration()
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)
        if not early_term:
            iters_ref[:, 0:1] = jnp.full((ft, 1), iterations, jnp.int32)
        out_llr_ref[:] = app_ref[:]
        out_iters_ref[:] = iters_ref[:]
        out_iscw_ref[:] = iscw_ref[:]

    if stream:
        return kernel_stream_layered_qc if layered_fast else kernel_stream
    if layered_fast:
        return kernel_layered_qc
    if layered:
        return kernel_layered

    def kernel(*refs):
        if spill:
            if clos or qc:
                *refs, tmp_ref, tmp2_ref, tmpn_ref, tc1_ref, tc2_ref = refs
                chain_refs[:] = [tc1_ref, tc2_ref]
            else:
                *refs, tmp_ref, tmp2_ref, tmpn_ref = refs
        if clos:
            (p1_ref, p3_ref, w_ref, llr_ref, out_llr_ref, out_iters_ref,
             out_iscw_ref, lv2c_ref, done_ref, iters_ref, iscw_ref) = refs
        else:
            (w_ref, llr_ref, out_llr_ref, out_iters_ref, out_iscw_ref,
             lv2c_ref, done_ref, iters_ref, iscw_ref) = refs
            p1_ref = p3_ref = None
        llr = llr_ref[:]
        lv2c_ref[:] = force_pad(w_ref, init_lv2c(p1_ref, p3_ref, w_ref, llr))
        done_ref[:] = jnp.zeros((ft, 128), jnp.int32)
        iters_ref[:] = jnp.zeros((ft, 128), jnp.int32)
        iscw_ref[:] = jnp.zeros((ft, 128), jnp.int32)
        out_llr_ref[:] = jnp.zeros((ft, nc_pad), jnp.float32)

        def body(it, carry):
            def iteration():
                if spill:
                    # giant-edge-space form: every value crossing a
                    # transport chain is materialised through a spill ref —
                    # a dataflow edge connecting two Benes chains in one
                    # program is the measured Mosaic wall at n_pad = 131072
                    # (see SPILL_FREE_LIMIT / benchmarks/probe_lane_wall5)
                    tmp_ref[:] = cn_exclusion(lv2c_ref[:])
                    lc2v_v = transport_ref(p1_ref, p3_ref, w_ref, tmp_ref,
                                           reverse=False)
                    llr_out, post_v = vn_stage(llr_ref[:], lc2v_v)
                    tmp2_ref[:] = post_v
                    tmpn_ref[:] = llr_out.astype(jnp.float32)
                    q = transport_ref(p1_ref, p3_ref, w_ref, tmp2_ref,
                                      reverse=True)
                    lv2c_new = force_pad(
                        w_ref,
                        to_store(q.astype(compute)
                     - tmp_ref[:].astype(compute)),
                    )
                    lv2c = lv2c_ref[:]  # fresh read, not live across chains
                    llr_out = tmpn_ref[:]
                else:
                    lv2c = lv2c_ref[:]
                    lc2v_c = cn_exclusion(lv2c)
                    lc2v_v = transport(p1_ref, p3_ref, w_ref, lc2v_c,
                                       reverse=False)
                    llr_out, post_v = vn_stage(llr, lc2v_v)
                    q = transport(p1_ref, p3_ref, w_ref, post_v,
                                  reverse=True)
                    lv2c_new = force_pad(
                        w_ref,
                        to_store(q.astype(compute)
                     - lc2v_c.astype(compute)),
                    )
                    llr_out = llr_out.astype(jnp.float32)

                if early_term:
                    # BEC convergence is "no erasures left", not a
                    # syndrome check (src/decoding/decoder.cpp:169-186)
                    is_cw = resolved(llr_out) if bec_mode else syndrome(q)
                    done_i = done_ref[:, 0:1]
                    newly = (1 - done_i) * is_cw
                    iters_ref[:, 0:1] = (
                        iters_ref[:, 0:1] + (1 - done_i) * (1 - newly)
                    )
                    done_ref[:, 0:1] = done_i + newly
                    iscw_ref[:, 0:1] = (
                        done_i * iscw_ref[:, 0:1] + (1 - done_i) * is_cw
                    )
                    keep = done_i > 0  # [ft, 1] broadcasts over lanes
                    lv2c_ref[:] = select_rows(keep, lv2c, lv2c_new)
                    out_llr_ref[:] = jnp.where(
                        keep, out_llr_ref[:], llr_out
                    )
                else:
                    lv2c_ref[:] = lv2c_new
                    out_llr_ref[:] = llr_out

                    @pl.when(it == iterations - 1)
                    def _():
                        iscw_ref[:, 0:1] = (
                            resolved(llr_out) if bec_mode else syndrome(q)
                        )

            if early_term:
                active = jnp.sum(done_ref[:, 0:1]) < ft

                @pl.when(active)
                def _():
                    iteration()
            else:
                iteration()
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)
        if not early_term:
            iters_ref[:, 0:1] = jnp.full((ft, 1), iterations, jnp.int32)
        out_iters_ref[:] = iters_ref[:]
        out_iscw_ref[:] = iscw_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "early_term", "minsum_mode", "frame_tile",
                     "message_dtype", "interpret", "layered", "quant_scale"),
)
def bp_decode_lanes(
    ldc: LanesDeviceCode,
    llr_in: jnp.ndarray,  # f32 [nc, B], sorted VN labelling
    iterations: int = 50,
    early_term: bool = True,
    minsum_mode: bool = False,
    frame_tile: int = 0,
    message_dtype: str = "float32",
    interpret: bool = False,
    layered: bool = False,
    quant_scale: float = 0.1875,
) -> SortedDecodeOutput:
    """Fused lane-major BP decode; drop-in for :func:`bp_decode_pallas`
    at blocklengths the ``[edges, frames]`` kernel cannot compile.

    ``frame_tile=0`` picks a default per message dtype: 8 (one f32
    sublane tile) for float32, 32 for bfloat16/int8 (at least one packed
    sublane tile, and enough MXU rows to amortise the Clos transport's
    block matmuls).

    ``layered=True`` runs the layered (serial) schedule when the layout
    carries layer planes (``to_lanes_device(code, with_layers=True)`` on a
    code with a layerfile); otherwise it decodes flooding, mirroring the
    XLA decoder's behaviour on layer-less codes.

    ``message_dtype="int8"`` runs the integer-lattice quantized min-sum
    (messages and posteriors ``round(L / quant_scale)`` saturated +-127)
    — the same trade as the edge-major kernel's int8 mode, now available
    on arbitrary (unstructured) blocklengths.  Requires a min-sum-family
    CN form and the clos transport (int8 rides native s8 MXU matmuls;
    Mosaic's roll cannot exchange int8 lanes).
    """
    dtype = jnp.dtype(message_dtype)
    if dtype in (jnp.bfloat16, jnp.int8) and ldc.transport not in (
            "clos", "qc"):
        raise ValueError(
            f"{message_dtype} lane-major messages require the clos or qc "
            "transport (intra-lane sub-32-bit rolls are unsupported by "
            "Mosaic); build the layout with "
            'to_lanes_device(code, transport="clos")'
        )
    if dtype == jnp.int8:
        kind = minsum_mode[0] if isinstance(minsum_mode, tuple) \
            else minsum_mode
        if kind not in ("BP_MS", "BP_NMS", "BP_OMS", True):
            raise ValueError(
                "int8 messages require a min-sum-family CN form "
                "(BP_MS/BP_NMS/BP_OMS) — box-plus/tanh/phi forms are not "
                "scale-invariant on the integer lattice"
            )
    nc, B = llr_in.shape
    if frame_tile == 0:
        frame_tile = 8 if dtype == jnp.float32 else 32
    ft = min(frame_tile, B)
    if B % ft:
        raise ValueError(f"batch {B} not divisible by frame tile {ft}")
    if iterations == 0:
        zeros = jnp.zeros_like(llr_in)
        return SortedDecodeOutput(
            llr_out=zeros,
            hard=jnp.zeros(llr_in.shape, bool),
            iterations=jnp.zeros((B,), jnp.int32),
            is_codeword=jnp.zeros((B,), bool),
        )

    # sorted labels -> padded lanes, frames to rows
    llr_pad = jnp.take(
        llr_in, ldc.vn_of_lane, axis=0, mode="fill", fill_value=0.0
    )
    # fake lanes must read 0.0, not the label-0 LLR vn_of_lane points at
    real_lane = jnp.zeros((ldc.nc_pad, 1), llr_in.dtype)
    real_lane = real_lane.at[ldc.lane_of_vn].set(1.0)
    llr_pad = (llr_pad * real_lane).T  # [B, nc_pad]
    if dtype == jnp.int8:
        # channel priors enter in integer-lattice units (one multiply per
        # node here instead of per-edge dequant/requant in the kernel)
        llr_pad = llr_pad * (1.0 / quant_scale)

    use_layered = layered and len(ldc.layer_words) > 1
    # fast layered engine (round 5): app-update formulation when the
    # layout carries natural-QC layer metadata — per-layer cost is the
    # layer's own edges, not the full space (see kernel_layered_qc);
    # no full-space transport chains, so no spill form needed
    use_fast = use_layered and bool(ldc.qc_layers)
    spill = _spill_for(ldc) and not use_fast
    kernel = _make_kernel(ldc, iterations, early_term, minsum_mode, ft,
                          dtype, layered=use_layered, spill=spill,
                          qscale=quant_scale, layered_fast=use_fast)
    llr_out, iters, iscw = _batch_call(
        ldc, kernel, llr_pad, B, ft, dtype, interpret,
        extra_state=use_layered and not use_fast, spill=spill,
        app_state=use_fast,
    )

    llr_out = jnp.take(llr_out.T, ldc.lane_of_vn, axis=0)  # [nc, B]
    if dtype == jnp.int8:
        llr_out = llr_out * quant_scale  # dequantize posterior q-values
    return SortedDecodeOutput(
        llr_out=llr_out,
        hard=llr_out <= 0,
        iterations=iters[:, 0],
        is_codeword=iscw[:, 0] > 0,
    )


def _batch_call(ldc, kernel, llr_pad, B, ft, dtype, interpret,
                extra_state=False, spill=False, app_state=False):
    """Shared ``pallas_call`` plumbing for the batch decode wrappers
    (BP and BEC): standard specs over the frame-tile grid, the permutation
    operands of the layout's transport, and the kernel's scratch set
    (+ one more ``[ft, n_pad]`` state buffer when ``extra_state``, for the
    layered schedule's persisted Lc2v; + an ``[ft, nc_pad]`` f32 APP
    buffer when ``app_state``, for the fast layered engine's posterior)."""
    W = ldc.planes.shape[0]
    clos = ldc.transport == "clos"
    nb = ldc.n_pad // 128
    in_specs = []
    operands = []
    if clos:
        in_specs += [
            pl.BlockSpec((nb, 128, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 128, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [ldc.clos_p1, ldc.clos_p3]
    in_specs += [
        pl.BlockSpec((W, ldc.n_pad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ft, ldc.nc_pad), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [ldc.planes, llr_pad]
    return pl.pallas_call(
        kernel,
        grid=(B // ft,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ft, ldc.nc_pad), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, ldc.nc_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ft, ldc.n_pad), dtype),
            pltpu.VMEM((ft, 128), jnp.int32),
            pltpu.VMEM((ft, 128), jnp.int32),
            pltpu.VMEM((ft, 128), jnp.int32),
        ] + (
            # persisted Lc2v state for the layered schedule
            [pltpu.VMEM((ft, ldc.n_pad), dtype)] if extra_state else []
        ) + (
            # persistent APP posterior for the fast layered engine
            [pltpu.VMEM((ft, ldc.nc_pad), jnp.float32)] if app_state else []
        ) + (
            # spill refs for giant edge spaces (see SPILL_FREE_LIMIT):
            # CN extrinsics, transported posterior, node posterior
            [pltpu.VMEM((ft, ldc.n_pad), dtype),
             pltpu.VMEM((ft, ldc.n_pad), dtype),
             pltpu.VMEM((ft, ldc.nc_pad), jnp.float32)] if spill else []
        ) + (
            # chain refs: Clos sub-network boundaries / qc segment
            # writes spill too (clos_spill_transport, qc_spill_transport)
            [pltpu.VMEM((ft, ldc.n_pad), dtype),
             pltpu.VMEM((ft, ldc.n_pad), dtype)]
            if spill and ldc.transport in ("clos", "qc") else []
        ),
        compiler_params=pltpu.CompilerParams(
            # spill mode needs the full 128M physical VMEM near the
            # envelope edge (n_pad = 131072 measured; 262144 compiled once
            # at a 127.6M scoped stack during round-4 bring-up but crashes
            # the production toolchain — see
            # sim/driver.py:LANES_EDGE_SPACE_LIMIT); the default 100M
            # headroom is only needed when XLA co-schedules other
            # kernels, which the fused decoder never leaves room for
            vmem_limit_bytes=(128 if spill else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "early_term", "frame_tile",
                     "message_dtype", "interpret"),
)
def bec_decode_lanes(
    ldc: LanesDeviceCode,
    symbols_in: jnp.ndarray,  # int8 [nc, B] channel symbols, sorted labels
    codeword: jnp.ndarray,  # uint8 [nc, B] true codeword, sorted labels
    iterations: int = 50,
    early_term: bool = True,
    frame_tile: int = 0,
    message_dtype: str = "float32",
    interpret: bool = False,
):
    """Fused BEC peeling decode on the lane-major kernel.

    TPU-native reduction (no counterpart in the reference, which has a
    dedicated u8 decoder — ``src/decoding/decoder.cpp:91-192``): over the
    encoding ``bit 0 -> +1, bit 1 -> -1, ERASURE -> 0``, the BEC peeling
    algebra IS min-sum BP —

    * CN op ``xor-with-absorbing-erasure`` == ``sign(l)·sign(r)·
      min(|l|,|r|)`` (0 absorbs through the min; XOR is the sign
      product);
    * VN op ``reveal-if-any-neighbour-knows`` == the posterior/extrinsic
      sums (over a BEC every revealed message equals the true bit, so all
      nonzero terms share a sign and never cancel — a sum is 0 exactly
      when every input is an erasure).

    The only semantic difference from BP is the convergence predicate
    ("no erasures left", not a syndrome check), switched in-kernel by
    ``bec_mode``.  Decisions/iterations match
    :func:`libldpc_tpu.ops.bec_sorted.bec_decode_sorted` exactly
    (magnitudes may differ — only sign/zero carries meaning; zero is
    preserved exactly by min/add of same-sign values in f32 AND bf16).
    The reference's degree-1 stale-byte bug-compat mode is not
    representable here — the driver keeps that mode on the XLA path.

    Returns a :class:`~libldpc_tpu.ops.bec.BECDecodeOutput`; unresolved
    bits decide the WRONG bit so the frame counts as errored
    (``src/decoding/decoder.cpp:163-165``).
    """
    from ..bec import BECDecodeOutput
    from ..channel import BEC_ERASURE

    dtype = jnp.dtype(message_dtype)
    if dtype == jnp.bfloat16 and ldc.transport not in ("clos", "qc"):
        raise ValueError(
            "bfloat16 lane-major messages require the clos or qc transport"
        )
    nc, B = symbols_in.shape
    if frame_tile == 0:
        frame_tile = 32 if dtype == jnp.bfloat16 else 8
    ft = min(frame_tile, B)
    if B % ft:
        raise ValueError(f"batch {B} not divisible by frame tile {ft}")
    cw_bits = codeword.astype(jnp.int8)
    if iterations == 0:
        sym = symbols_in
        unresolved = sym == BEC_ERASURE
        hard = jnp.where(unresolved, 1 - cw_bits, sym).astype(jnp.uint8)
        return BECDecodeOutput(
            symbols_out=sym,
            hard=hard,
            iterations=jnp.zeros((B,), jnp.int32),
            resolved=~unresolved.any(axis=0),
        )

    # sign encoding, then sorted labels -> padded lanes (fake lanes 0 =
    # erasure; they are excluded from the resolved() predicate)
    llr = jnp.where(
        symbols_in == BEC_ERASURE,
        jnp.float32(0.0),
        1.0 - 2.0 * symbols_in.astype(jnp.float32),
    )
    llr_pad = jnp.take(
        llr, ldc.vn_of_lane, axis=0, mode="fill", fill_value=0.0
    )
    real_lane = jnp.zeros((ldc.nc_pad, 1), jnp.float32)
    real_lane = real_lane.at[ldc.lane_of_vn].set(1.0)
    llr_pad = (llr_pad * real_lane).T  # [B, nc_pad]

    spill = _spill_for(ldc)
    kernel = _make_kernel(ldc, iterations, early_term, "BP_MS", ft, dtype,
                          bec_mode=True, spill=spill)
    llr_out, iters, iscw = _batch_call(
        ldc, kernel, llr_pad, B, ft, dtype, interpret, spill=spill,
    )

    llr_out = jnp.take(llr_out.T, ldc.lane_of_vn, axis=0)  # [nc, B]
    unresolved = llr_out == 0.0
    sym_out = jnp.where(
        unresolved,
        jnp.int8(BEC_ERASURE),
        (llr_out < 0).astype(jnp.int8),
    )
    hard = jnp.where(unresolved, 1 - cw_bits, (llr_out < 0).astype(jnp.int8))
    return BECDecodeOutput(
        symbols_out=sym_out,
        hard=hard.astype(jnp.uint8),
        iterations=iters[:, 0],
        resolved=iscw[:, 0] > 0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "cap", "minsum_mode", "frame_tile", "interpret",
                     "message_dtype", "bec_mode", "quant_scale",
                     "layered"),
)
def bp_stream_chunk_lanes(
    ldc: LanesDeviceCode,
    llr_in: jnp.ndarray,  # f32 [B, nc_pad] carried channel LLRs (lanes)
    cw: jnp.ndarray,  # i32 [B, nc_pad] carried true codewords (lanes)
    lv2c: jnp.ndarray,  # dtype [B, n_pad] carried message state
    done: jnp.ndarray,  # i32 [B, 128] (col 0: finished flag)
    iters: jnp.ndarray,  # i32 [B, 128]
    age: jnp.ndarray,  # i32 [B, 128]
    avail: jnp.ndarray,  # i32 [B, 128] (col 0: pool entry unused)
    ctr: jnp.ndarray,  # i32 [B, 128] counters in cols 0..4
    fresh_llr: jnp.ndarray,  # f32 [B, nc_pad] fresh-frame pool
    fresh_cw: jnp.ndarray,  # i32 [B, nc_pad]
    fresh_lv2c: jnp.ndarray,  # dtype [B, n_pad] pre-gathered edge priors
    refill: jnp.ndarray,  # i32 scalar
    remaining: jnp.ndarray,  # i32 scalar: global starts remaining
    *,
    k: int,
    cap: int,
    minsum_mode=False,
    frame_tile: int = 0,
    interpret: bool = False,
    message_dtype: str = "float32",
    bec_mode: bool = False,
    quant_scale: float = 0.1875,
    layered: bool = False,
):
    """Run ``k`` self-refilling lane-major BP passes (``kernel_stream``
    above); all eight state operands are donated/aliased in place.  The
    lane-major counterpart of
    :func:`libldpc_tpu.ops.pallas.decode_fused.bp_stream_chunk_pallas` for
    blocklengths the edge-major kernel cannot compile.

    ``message_dtype="int8"`` streams on the integer lattice (round 4): the
    carried/pool ``llr_in``/``fresh_llr`` stay raw-LLR f32 (shared pool
    format), ``fresh_lv2c`` arrives lattice-quantized
    (:func:`...streaming_pallas._edge_prior_pool` with the same
    ``quant_scale``), and the kernel scales the prior in its VN stage —
    posteriors byte-match a batch-kernel decode of the same frames."""
    dtype = jnp.dtype(message_dtype)
    if dtype in (jnp.bfloat16, jnp.int8) and ldc.transport not in (
            "clos", "qc"):
        raise ValueError(
            f"{message_dtype} lane-major messages require the clos or qc "
            "transport"
        )
    if dtype == jnp.int8:
        kind = minsum_mode[0] if isinstance(minsum_mode, tuple) \
            else minsum_mode
        if kind not in ("BP_MS", "BP_NMS", "BP_OMS", True):
            raise ValueError(
                "int8 messages require a min-sum-family CN form "
                "(BP_MS/BP_NMS/BP_OMS)"
            )
    B = llr_in.shape[0]
    if frame_tile == 0:
        frame_tile = 8 if dtype == jnp.float32 else 32
    ft = min(frame_tile, B)
    if B % ft:
        raise ValueError(f"batch {B} not divisible by frame tile {ft}")
    if ft & (ft - 1):
        raise ValueError(f"frame tile {ft} must be a power of two")
    if layered:
        # streaming layered = the fast app-update engine only (round 5):
        # the llr_in state plane is reinterpreted as the persistent APP
        # posterior (see kernel_stream_layered_qc)
        if not getattr(ldc, "qc_layers", ()):
            raise ValueError(
                "streaming layered decoding requires the qc transport "
                "with natural-QC layer metadata (to_lanes_device(code, "
                'transport="qc", with_layers=True) on a code with '
                "qc_natural_layers)"
            )
        if bec_mode:
            raise ValueError("streaming layered decoding has no BEC form")
    spill = _spill_for(ldc) and not layered
    kernel = _make_kernel(ldc, k, True, minsum_mode, ft, dtype,
                          stream=True, cap=cap, bec_mode=bec_mode,
                          spill=spill, qscale=quant_scale,
                          scale_prior=True, layered_fast=layered)
    W = ldc.planes.shape[0]
    clos = ldc.transport == "clos"
    nb = ldc.n_pad // 128
    in_specs = []
    operands = []
    if clos:
        in_specs += [
            pl.BlockSpec((nb, 128, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 128, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [ldc.clos_p1, ldc.clos_p3]
    in_specs.append(
        pl.BlockSpec((W, ldc.n_pad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM)
    )
    operands.append(ldc.planes)
    n_perm = len(operands)

    # transmitted-bit mask in lane space (fake lanes excluded)
    is_tx = (
        jnp.zeros((1, ldc.nc_pad), jnp.int32)
        .at[0, ldc.lane_of_vn[ldc.sorted_dc.bit_pos]]
        .set(1)
    )
    for arr, spec in (
        (is_tx, pl.BlockSpec((1, ldc.nc_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)),
        (fresh_llr, pl.BlockSpec((ft, ldc.nc_pad), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)),
        (fresh_cw, pl.BlockSpec((ft, ldc.nc_pad), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)),
        (fresh_lv2c, pl.BlockSpec((ft, ldc.n_pad), lambda b: (b, 0),
                                  memory_space=pltpu.VMEM)),
        (jnp.asarray(refill, jnp.int32).reshape(1, 1),
         pl.BlockSpec((1, 1), lambda b: (0, 0),
                      memory_space=pltpu.SMEM)),
        (jnp.asarray(remaining, jnp.int32).reshape(1, 1),
         pl.BlockSpec((1, 1), lambda b: (0, 0),
                      memory_space=pltpu.SMEM)),
        (llr_in, pl.BlockSpec((ft, ldc.nc_pad), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)),
        (cw, pl.BlockSpec((ft, ldc.nc_pad), lambda b: (b, 0),
                          memory_space=pltpu.VMEM)),
        (lv2c, pl.BlockSpec((ft, ldc.n_pad), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)),
        (done, pl.BlockSpec((ft, 128), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)),
        (iters, pl.BlockSpec((ft, 128), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)),
        (age, pl.BlockSpec((ft, 128), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)),
        (avail, pl.BlockSpec((ft, 128), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)),
        (ctr, pl.BlockSpec((ft, 128), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)),
    ):
        operands.append(arr)
        in_specs.append(spec)
    out_specs = [
        pl.BlockSpec((ft, ldc.nc_pad), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ft, ldc.nc_pad), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ft, ldc.n_pad), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((ft, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
        for _ in range(5)
    ]
    out_shape = (
        jax.ShapeDtypeStruct((B, ldc.nc_pad), jnp.float32),
        jax.ShapeDtypeStruct((B, ldc.nc_pad), jnp.int32),
        jax.ShapeDtypeStruct((B, ldc.n_pad), dtype),
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
    )
    return pl.pallas_call(
        kernel,
        grid=(B // ft,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={
            n_perm + 6: 0,  # llr_in
            n_perm + 7: 1,  # cw
            n_perm + 8: 2,  # lv2c
            n_perm + 9: 3,  # done
            n_perm + 10: 4,  # iters
            n_perm + 11: 5,  # age
            n_perm + 12: 6,  # avail
            n_perm + 13: 7,  # ctr
        },
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)] + (
            # spill refs for giant edge spaces (see SPILL_FREE_LIMIT)
            [pltpu.VMEM((ft, ldc.n_pad), dtype),
             pltpu.VMEM((ft, ldc.n_pad), dtype),
             pltpu.VMEM((ft, ldc.nc_pad), jnp.float32)] if spill else []
        ) + (
            # chain refs (clos_spill_transport / qc_spill_transport)
            [pltpu.VMEM((ft, ldc.n_pad), dtype),
             pltpu.VMEM((ft, ldc.n_pad), dtype)]
            if spill and ldc.transport in ("clos", "qc") else []
        ),
        compiler_params=pltpu.CompilerParams(
            # spill mode needs the full 128M physical VMEM near the
            # envelope edge (n_pad = 131072 measured; 262144 compiled once
            # at a 127.6M scoped stack during round-4 bring-up but crashes
            # the production toolchain — see
            # sim/driver.py:LANES_EDGE_SPACE_LIMIT); the default 100M
            # headroom is only needed when XLA co-schedules other
            # kernels, which the fused decoder never leaves room for
            vmem_limit_bytes=(128 if spill else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
