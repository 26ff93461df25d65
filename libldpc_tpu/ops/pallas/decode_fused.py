"""Fused Pallas TPU decode kernel.

One kernel invocation decodes a whole tile of frames for *all* iterations
with the message state resident in VMEM — the HBM traffic per frame is just
the input LLRs and the outputs, where the XLA path re-streams every
``[nnz, batch]`` message tensor from HBM several times per iteration.

Structure per iteration (see :mod:`libldpc_tpu.ops.pallas.layout` for the
edge spaces):

1. CN exclusion combine — contiguous position-major class slices, the same
   forward/backward box-plus/min-sum order as the reference
   (``src/decoding/decoder.cpp:24-45``).
2. CN-space → VN-space edge permutation, by one of two transports:
   * **Beneš network**: ``2·log2(N)−1`` stages of ``pltpu.roll`` + select
     on the VPU (works for any permutation);
   * **MXU block matmuls**: when the permutation is block-local (the
     degree-class position-major layout makes it so — the bundled n=1024
     code touches only 60 of 1024 possible 128×128 block pairs), apply it
     as a handful of one-hot matmuls on the otherwise-idle MXU.
3. VN sums and posterior LLRs — contiguous slices; the ``LLROut[col]``
   expansion is a free broadcast in VN space.
4. VN-space → CN-space permutation (reverse transport) of the *posterior*
   ``q``; the extrinsic is reconstructed as ``Lv2c = q − Lc2v``.
5. Syndrome directly from the transported posterior's signs — transports
   move values unchanged and rounding to the storage dtype preserves
   signs, so the syndrome is exactly consistent with the stored decisions
   (reconstructing the posterior as ``bf16(llr−lc2v) + bf16(lc2v)``
   instead can flip near-zero signs and false-converge: measured 2.1e-3
   FER floor at −3 dB before this fix).  Per-frame early termination uses
   the reference's break-before-increment iteration counting and freezes
   finished frames.

The batch is tiled over the Pallas grid; each tile early-exits (predicated
iteration body) once every frame in it has converged.

Message dtype: ``float32`` (exact) or ``bfloat16`` — messages are stored and
transported in bf16 (Beneš exchanges run on the packed int32 view because
Mosaic's roll is 32-bit-only: distance-d exchange = d/2 word roll, d = 1 is
a 16-bit rotate of every word) while the CN/VN arithmetic always runs in
float32.

Practical scope: short/medium blocklengths with the Beneš transport
(padded edge space up to 4096 — the bundled n=1024 code; the unrolled
Beneš fails to compile on-chip at n_pad 8192, see
``sim/driver.py:FUSED_EDGE_SPACE_LIMIT``) and any size whose permutation
is MXU-block-local (n_pad 32768 QC measured).  Large unstructured codes
use the lane-major kernel (:mod:`.decode_lanes` — frames on sublanes,
any blocklength); the XLA sorted-layout decoder
(:func:`libldpc_tpu.ops.sorted.bp_decode_sorted`) remains the
correctness golden and the BEC/layered-large fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cn_ops
from ..sorted import SortedDecodeOutput
from .layout import PallasDeviceCode

#: int8 message lattice step (LLR units) — shared by every path that must
#: reproduce the kernel's quantisation outside it (fresh_lv2c pool regen)
DEFAULT_QUANT_SCALE = 0.1875


def _make_kernel(pdc: PallasDeviceCode, nc, iterations, early_term,
                 minsum_mode, bt, dtype=jnp.float32, nl=0, mxu=False,
                 clos=False, chunk=False, cap=0, stream=False,
                 qscale=DEFAULT_QUANT_SCALE):
    N = pdc.n_pad
    cn_blocks = pdc.cn_blocks
    vn_blocks = pdc.vn_blocks
    vn_node_base = pdc.vn_node_base
    nnz = pdc.nnz
    tanh = cn_ops.is_tanh_mode(minsum_mode)
    phi = cn_ops.is_phi_mode(minsum_mode)
    op = None if (tanh or phi) else cn_ops.get_op(minsum_mode)

    # active-stage-compressed network (quiet stages dropped at build time)
    act_dists = tuple(
        d for d, a in zip(pdc.benes_dists, pdc.benes_active) if a
    )
    Sa = len(act_dists)

    # messages may be stored/transported in bf16; the CN/VN arithmetic
    # always runs in float32 (upcast per class slice) so quantisation is
    # confined to the stored representation (~0.4% relative per message)
    compute = jnp.float32
    quantized = dtype == jnp.int8
    if quantized:
        # int8 quantized min-sum: messages (and posteriors) live as
        # q = round(L / qscale) saturated to +-127 — the TPU-native
        # analogue of hardware LDPC decoders' 4-8 bit messages (the
        # reference trades CN accuracy for speed the same way via its
        # CN_APPROX_* forms, gpu/ldpc/ldpc.cpp:232-241).  Min-sum is
        # scale-invariant, so after the input quantisation the integer
        # algebra is EXACT up to saturation: CN min/sign preserve the
        # lattice, VN sums/extrinsic subtractions are integer adds (done
        # in f32 — all values are small integers, exactly representable),
        # and only the NMS/OMS correction re-rounds.  int8 halves bf16's
        # VMEM residency and runs the one-hot transport as native s8
        # MXU matmuls.
        #
        # The whole kernel works directly on the integer lattice (values
        # are q, never q*qscale): min/sign/sum/subtract are
        # scale-invariant, so only the channel prior needs scaling — one
        # multiply per NODE per pass instead of two per EDGE for
        # dequantise/requantise.  The OMS offset is specified in LLR
        # units, so it shrinks by offset/qscale on the lattice.
        inv_q = 1.0 / qscale
        if isinstance(minsum_mode, tuple) and len(minsum_mode) == 3:
            minsum_mode = (minsum_mode[0], minsum_mode[1],
                           minsum_mode[2] * inv_q)

        def to_store(x):
            return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)

        def to_compute(x):
            return x.astype(compute)

        def prior(x):
            """Raw channel LLRs -> integer-lattice units."""
            return x.astype(compute) * inv_q
    else:

        def to_store(x):
            return x.astype(dtype)

        def to_compute(x):
            return x.astype(compute)

        def prior(x):
            return x.astype(compute)

    def benes(swap_ref, v, reverse, dists=act_dists):
        # Statically unrolled over the active stages.  (A fori_loop form with
        # traced roll shifts was tried and is NOT worth it: Mosaic compile
        # cost scales with the vector tile count, not the program length —
        # a trivial 60-roll loop kernel at N=32768 still takes ~3 minutes to
        # compile — and dynamic lane slicing of the switch planes is
        # unsupported anyway.  Large-N codes use the XLA sorted path.)
        ns = len(dists)
        order = range(ns - 1, -1, -1) if reverse else range(ns)
        if dtype == jnp.bfloat16:
            # Mosaic's roll is 32-bit-only; exchange bf16 rows through the
            # packed int32 view instead (sublane pairing: word w holds
            # bf16 rows 2w [low half] and 2w+1 [high half] — verified on
            # hardware).  A distance-d exchange (d even) is a distance-d/2
            # int32 exchange of whole words; d == 1 is a 16-bit rotate of
            # every word.  Selects stay at bf16 granularity because switch
            # planes are per-edge.  Halves the transport's register
            # traffic relative to float32.
            iota32 = jax.lax.broadcasted_iota(jnp.int32, (N // 2, 1), 0)
            for s in order:
                d = dists[s]
                if d == 1:
                    wu = pltpu.bitcast(v, jnp.uint32)  # [N//2, bt]
                    pw = (wu << 16) | (wu >> 16)
                    partner = pltpu.bitcast(pw, jnp.bfloat16)
                else:
                    d32 = d // 2
                    w = pltpu.bitcast(v, jnp.int32)
                    top = (iota32 & d32) == 0
                    pw = jnp.where(
                        top,
                        pltpu.roll(w, N // 2 - d32, axis=0),
                        pltpu.roll(w, d32, axis=0),
                    )
                    partner = pltpu.bitcast(pw, jnp.bfloat16)
                sw = swap_ref[:, s : s + 1] > 0  # [N, 1]
                v = jnp.where(sw, partner, v)
            return v
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        for s in order:
            d = dists[s]
            sw = swap_ref[:, s : s + 1] > 0  # [N, 1]
            top = (iota & d) == 0
            partner = jnp.where(
                top, pltpu.roll(v, N - d, axis=0), pltpu.roll(v, d, axis=0)
            )
            v = jnp.where(sw, partner, v)
        return v

    def mxu_permute(blocks_ref, plan, v):
        """``out[i] = in[perm[i]]`` as one-hot 128x128 block matmuls.

        One-hot selection is exact for bf16 operands (values pass through
        a single multiply by 1.0 and an f32 accumulate); for f32 messages
        HIGHEST precision keeps the f32 values exact through the MXU's
        bf16-decomposed passes.  int8 messages run native s8 x s8 -> s32
        MXU passes — also exact (values bounded at +-127).
        """
        int8 = dtype == jnp.int8
        precision = (
            jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
        )
        parts = []
        for d in range(N // 128):
            acc = None
            for p, s in plan[d]:
                c = jax.lax.dot_general(
                    blocks_ref[p].astype(dtype),
                    v[s * 128 : (s + 1) * 128, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if int8 else jnp.float32
                    ),
                    precision=precision,
                )
                acc = c if acc is None else acc + c
            parts.append(acc.astype(dtype))
        return jnp.concatenate(parts, axis=0)

    def clos_blockmul(pref, v, transpose):
        """Block-diagonal one-hot matmul of the Clos stage stacks: per
        ``K``-sublane block, ``out_b = P_b @ v_b`` (or ``P_b^T @ v_b`` for
        the inverse).  Exactness argument as in :func:`mxu_permute`."""
        precision = (
            None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        )
        K = pref.shape[1]
        parts = []
        for b in range(N // K):
            m = pref[b].astype(dtype)
            parts.append(
                jax.lax.dot_general(
                    m,
                    v[b * K : (b + 1) * K, :],
                    dimension_numbers=(
                        ((0,) if transpose else (1,), (0,)), ((), ())
                    ),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ).astype(dtype)
            )
        return jnp.concatenate(parts, axis=0)

    def transport(pref, v, reverse):
        """CN-space <-> VN-space edge permutation (see module docstring)."""
        if mxu:
            fwd_ref, rev_ref = pref
            if reverse:
                return mxu_permute(rev_ref, pdc.mxu_plan_rev, v)
            return mxu_permute(fwd_ref, pdc.mxu_plan_fwd, v)
        if clos:
            p1_ref, p3_ref, mid_ref = pref
            if reverse:
                v = clos_blockmul(p3_ref, v, transpose=True)
                v = benes(mid_ref, v, reverse=True, dists=pdc.clos_mid_dists)
                return clos_blockmul(p1_ref, v, transpose=True)
            v = clos_blockmul(p1_ref, v, transpose=False)
            v = benes(mid_ref, v, reverse=False, dists=pdc.clos_mid_dists)
            return clos_blockmul(p3_ref, v, transpose=False)
        (swap_ref,) = pref
        return benes(swap_ref, v, reverse)

    def cn_exclusion(lv2c):
        parts = []
        for base, count, d in cn_blocks:
            M = [
                to_compute(
                    lv2c[base + j * count : base + (j + 1) * count, :]
                )
                for j in range(d)
            ]
            if d == 1:
                parts.append(jnp.full_like(M[0], 1e30))
                continue
            if phi:
                # φ-domain combine: sign chains (±1 products) + magnitude
                # chains (sums of φ(|L|)); see cn_ops.exclusion_combine_phi
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
        if N > nnz:
            parts.append(jnp.zeros((N - nnz, lv2c.shape[1]), compute))
        return to_store(cn_ops.cn_postprocess(
            jnp.concatenate(parts, axis=0), minsum_mode
        ))

    def vn_stage(llr_ref, lc2v_v):
        """Posterior LLRs per node and per VN-space edge slot.

        Returns ``(llr_out [nc, bt], post_v [N, bt])`` where ``post_v``
        duplicates each node's posterior at its edge slots.  The extrinsic
        ``Lv2c`` is reconstructed *after* the reverse transport as
        ``q - Lc2v`` (same quantisation as subtracting here), which makes
        the transported posterior ``q`` available for the syndrome — its
        stored-dtype signs are exactly the stored decisions' signs, so
        early termination can never declare a non-codeword decision
        converged (a ``bf16(llr_out - lc2v) + bf16(lc2v)`` reconstruction
        could flip signs of near-zero posteriors and false-converge).
        """
        llr_parts = []
        post_parts = []
        for (base_e, count, d), nb in zip(vn_blocks, vn_node_base):
            lin = prior(llr_ref[nb : nb + count, :])
            if d == 0:
                llr_parts.append(to_store(lin))
                continue
            msgs = [
                to_compute(
                    lc2v_v[base_e + j * count : base_e + (j + 1) * count, :]
                )
                for j in range(d)
            ]
            tot = msgs[0]
            for j in range(1, d):
                tot = tot + msgs[j]
            llr_b = to_store(lin + tot)
            llr_parts.append(llr_b)
            for j in range(d):
                post_parts.append(llr_b)
        if N > nnz:
            post_parts.append(jnp.zeros((N - nnz, lc2v_v.shape[1]), dtype))
        return (
            jnp.concatenate(llr_parts, axis=0),
            jnp.concatenate(post_parts, axis=0),
        )

    def extrinsic(q, lc2v):
        """``Lv2c = q - Lc2v`` in f32, stored in the message dtype (an
        exact integer subtract for int8 — both operands are multiples of
        the quantisation step)."""
        return to_store(to_compute(q) - to_compute(lc2v))

    def init_lv2c(llr_ref, pref):
        parts = []
        for (base_e, count, d), nb in zip(vn_blocks, vn_node_base):
            if d == 0:
                continue
            lin = to_store(prior(llr_ref[nb : nb + count, :]))
            for _ in range(d):
                parts.append(lin)
        if N > nnz:
            parts.append(jnp.zeros((N - nnz, bt), dtype))
        return transport(pref, jnp.concatenate(parts, axis=0), reverse=True)

    def syndrome(llr_edge):
        viol = jnp.zeros((1, llr_edge.shape[1]), jnp.int32)
        for base, count, d in cn_blocks:
            bits = None
            for j in range(d):
                # compare in f32: Mosaic rejects cmpf on packed bf16 vectors
                b = (
                    llr_edge[base + j * count : base + (j + 1) * count, :]
                    .astype(jnp.float32)
                    <= 0
                ).astype(jnp.int32)
                bits = b if bits is None else bits + b
            odd = jnp.bitwise_and(bits, 1)
            viol = viol + jnp.sum(odd, axis=0, keepdims=True)
        # 0/1 int32 plane (avoid i1/i8 vectors — Mosaic rejects some of
        # their conversions)
        return jnp.where(viol == 0, 1, 0).astype(jnp.int32)  # [1, Bt]

    n_perm_refs = 2 if mxu else (3 if clos else 1)


    def kernel_stream(*args):
        """Self-refilling streaming chunk: ``iterations`` BP passes where
        idle lanes reload *in-kernel* from a lane-aligned fresh-frame pool
        and completed frames are counted in-kernel.

        This is the TPU-native equivalent of the reference's per-thread
        frame loop (``src/sim/ldpcsim.cpp:150-256``) pushed all the way
        into the kernel: the chunk-boundary XLA glue of the earlier scheme
        (full-batch channel materialisation, ``[n_pad, B]`` reload selects,
        host-visible counting) collapses to occasional pool regeneration,
        and a finished stream restarts on the *next pass* instead of
        idling ~``k/2`` passes until its chunk ends.

        Per-pass structure:

        1. **Reload phase** — lanes with ``done & avail`` take their pool
          entry.  The pool ships ``fresh_lv2c`` (edge-space gathered
          priors, pre-computed by XLA at pool regeneration via
          ``cn_edge_node``) so the reload is warm-up-free: the next pass
          is real iteration 1 (``age = 1``), one pass cheaper per frame
          than the zero-init reload of :mod:`libldpc_tpu.ops.streaming`
          (which still applies to externally injected ``age = 0``
          state).  An exact global
          ``max_frames`` quota is enforced with a per-lane inclusive scan
          (log2(bt) roll/add stages) against a running remaining-starts
          counter in SMEM scratch, which persists across the sequential
          grid — starts never exceed the quota, in any tile order.
        2. **Decode pass** — identical semantics to the batch streaming
          loop (warm-up gated checks, break-before-increment counts,
          cap at ``cap``), plus in-kernel counting at the finishing pass:
          transmitted-bit errors (``is_tx`` plane), frame errors, frames
          and iteration sums accumulate in per-lane int32 counter planes
          (row layout: bit_errors / frame_errors / frames / iter_sum /
          started).
        """
        pref = args[:n_perm_refs]
        (istx_ref, fresh_llr_ref, fresh_cw_ref, fresh_lv2c_ref, refill_ref,
         remaining_ref,
         llr_in, cw_in, lv2c_in, done_in, iters_in, age_in, avail_in,
         ctr_in,
         llr_ref, cw_ref, lv2c_ref, done_ref, iters_ref, age_ref,
         avail_ref, ctr_ref, rem_s) = args[n_perm_refs:]

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

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
        refill_on = refill_ref[0, 0] > 0

        def body(it, carry):
            # ---- phase 1: reload idle lanes from the fresh pool --------
            done_i = done_ref[0:1, :]
            avail_i = avail_ref[0:1, :]
            eligible = done_i * avail_i  # i32 0/1 [1, bt]

            @pl.when(refill_on & (jnp.sum(eligible) > 0))
            def _():
                # inclusive per-lane scan caps starts at the remaining
                # global quota exactly (lanes are granted in index order)
                cum = eligible
                d = 1
                while d < bt:
                    cum = cum + jnp.where(
                        lane >= d, pltpu.roll(cum, d, axis=1), 0
                    )
                    d *= 2
                allowed = eligible * jnp.where(cum <= rem_s[0], 1, 0)
                rs = allowed > 0
                llr_ref[:] = jnp.where(rs, fresh_llr_ref[:], llr_ref[:])
                cw_ref[:] = jnp.where(rs, fresh_cw_ref[:], cw_ref[:])
                # warm-up-free reload: the pool carries the edge-space
                # gathered prior (XLA pre-computes it at regen), so the
                # very next pass is real iteration 1 — age starts at 1
                # (check-eligible), saving one full pass per frame
                lv2c_ref[:] = jnp.where(rs, fresh_lv2c_ref[:], lv2c_ref[:])
                done_ref[0:1, :] = done_i * (1 - allowed)
                age_ref[0:1, :] = (
                    age_ref[0:1, :] * (1 - allowed) + allowed
                )
                iters_ref[0:1, :] = iters_ref[0:1, :] * (1 - allowed)
                avail_ref[0:1, :] = avail_i - allowed
                ctr_ref[4:5, :] = ctr_ref[4:5, :] + allowed
                rem_s[0] = rem_s[0] - jnp.sum(allowed)

            # ---- phase 2: one BP pass over the in-flight lanes ---------
            @pl.when(jnp.sum(done_ref[0:1, :]) < bt)
            def _():
                lv2c = lv2c_ref[:]
                lc2v_c = cn_exclusion(lv2c)
                lc2v_v = transport(pref, lc2v_c, reverse=False)
                llr_out, post_v = vn_stage(llr_ref, lc2v_v)
                q = transport(pref, post_v, reverse=True)
                lv2c_new = extrinsic(q, lc2v_c)

                done_i2 = done_ref[0:1, :]
                age_i = age_ref[0:1, :]
                is_cw = syndrome(q)
                checking = (1 - done_i2) * jnp.where(age_i >= 1, 1, 0)
                newly = checking * is_cw
                iters2 = iters_ref[0:1, :] + checking * (1 - is_cw)
                iters_ref[0:1, :] = iters2
                age2 = age_i + (1 - done_i2)
                age_ref[0:1, :] = age2
                finished = (1 - done_i2) * jnp.where(
                    (newly > 0) | (age2 >= cap + 1), 1, 0
                )
                done_ref[0:1, :] = done_i2 + finished
                # in-kernel error counting at the finishing pass: the
                # decisions of first convergence (or the iteration cap)
                err = jnp.where(
                    (llr_out.astype(jnp.float32) <= 0) != (cw_ref[:] > 0),
                    istx_ref[:],
                    0,
                )
                biterr = jnp.sum(err, axis=0, keepdims=True)  # [1, bt]
                ctr_ref[0:1, :] = ctr_ref[0:1, :] + finished * biterr
                ctr_ref[1:2, :] = ctr_ref[1:2, :] + finished * jnp.where(
                    biterr > 0, 1, 0
                )
                ctr_ref[2:3, :] = ctr_ref[2:3, :] + finished
                ctr_ref[3:4, :] = ctr_ref[3:4, :] + finished * iters2
                keep = done_i2 > 0
                lv2c_ref[:] = jnp.where(keep, lv2c, lv2c_new)
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)

    if stream:
        return kernel_stream

    def kernel_layered(*args):
        """Layered (serial) schedule: per iteration, each layer refreshes
        its checks' messages and the APP recomputes — the GPU stack's
        kernel capability (``gpu/device/kernel.cpp:54-74``), with the
        same per-layer freeze/early-termination semantics as the XLA
        layered decoder (:func:`.._bp_decode_sorted_layered`)."""
        pref = args[:n_perm_refs]
        (layer_ref, llr_ref, out_llr_ref, out_iters_ref, out_iscw_ref,
         lv2c_ref, lc2v_ref, done_ref, iters_ref, iscw_ref) = args[n_perm_refs:]
        lv2c_ref[:] = init_lv2c(llr_ref, pref)
        lc2v_ref[:] = jnp.zeros((N, bt), dtype)
        done_ref[:] = jnp.zeros((8, bt), jnp.int32)
        iters_ref[:] = jnp.zeros((8, bt), jnp.int32)
        iscw_ref[:] = jnp.zeros((8, bt), jnp.int32)
        out_llr_ref[:] = jnp.zeros((nc, bt), dtype)

        def body(it, carry):
            def iteration():
                done_start = done_ref[0:1, :]
                for l in range(nl):
                    lv2c = lv2c_ref[:]
                    lc2v_state = lc2v_ref[:]
                    lc2v_new = cn_exclusion(lv2c)
                    lp = layer_ref[:, l : l + 1] > 0
                    lc2v_l = jnp.where(lp, lc2v_new, lc2v_state)
                    lc2v_v = transport(pref, lc2v_l, reverse=False)
                    llr_out, post_v = vn_stage(llr_ref, lc2v_v)
                    q = transport(pref, post_v, reverse=True)
                    lv2c_l = extrinsic(q, lc2v_l)
                    done_i = done_ref[0:1, :]
                    keep = done_i > 0
                    if early_term:
                        is_cw = syndrome(q)
                        newly = (1 - done_i) * is_cw
                        done_ref[0:1, :] = done_i + newly
                        iscw_ref[0:1, :] = (
                            done_i * iscw_ref[0:1, :] + (1 - done_i) * is_cw
                        )
                    lv2c_ref[:] = jnp.where(keep, lv2c, lv2c_l)
                    lc2v_ref[:] = jnp.where(keep, lc2v_state, lc2v_l)
                    out_llr_ref[:] = jnp.where(keep, out_llr_ref[:], llr_out)
                    last_q = q
                if early_term:
                    # iteration counted iff unconverged at both the start
                    # and the end of the full iteration (XLA layered
                    # semantics, ops/sorted.py _bp_decode_sorted_layered)
                    iters_ref[0:1, :] = iters_ref[0:1, :] + (
                        (1 - done_start) * (1 - done_ref[0:1, :])
                    )
                else:
                    @pl.when(it == iterations - 1)
                    def _():
                        iscw_ref[0:1, :] = syndrome(last_q)

            if early_term:
                active = jnp.sum(done_ref[0:1, :]) < bt

                @pl.when(active)
                def _():
                    iteration()
            else:
                iteration()
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)
        if not early_term:
            iters_ref[0:1, :] = jnp.full((1, bt), iterations, jnp.int32)
        out_iters_ref[:] = iters_ref[:]
        out_iscw_ref[:] = iscw_ref[:]

    if nl:
        return kernel_layered

    def kernel(*args):
        pref = args[:n_perm_refs]
        (llr_ref, out_llr_ref, out_iters_ref, out_iscw_ref,
         lv2c_ref, done_ref, iters_ref, iscw_ref) = args[n_perm_refs:]
        lv2c_ref[:] = init_lv2c(llr_ref, pref)
        done_ref[:] = jnp.zeros((8, bt), jnp.int32)
        iters_ref[:] = jnp.zeros((8, bt), jnp.int32)
        iscw_ref[:] = jnp.zeros((8, bt), jnp.int32)
        out_llr_ref[:] = jnp.zeros((nc, bt), dtype)

        def body(it, carry):
            def iteration():
                lv2c = lv2c_ref[:]
                lc2v_c = cn_exclusion(lv2c)
                lc2v_v = transport(pref, lc2v_c, reverse=False)
                llr_out, post_v = vn_stage(llr_ref, lc2v_v)
                q = transport(pref, post_v, reverse=True)
                lv2c_new = extrinsic(q, lc2v_c)

                if early_term:
                    # pure int32 0/1 flag arithmetic
                    is_cw = syndrome(q)
                    done_i = done_ref[0:1, :]
                    newly = (1 - done_i) * is_cw
                    iters_ref[0:1, :] = (
                        iters_ref[0:1, :] + (1 - done_i) * (1 - newly)
                    )
                    done_ref[0:1, :] = done_i + newly
                    iscw_ref[0:1, :] = (
                        done_i * iscw_ref[0:1, :] + (1 - done_i) * is_cw
                    )
                    keep = done_i > 0
                    lv2c_ref[:] = jnp.where(keep, lv2c, lv2c_new)
                    out_llr_ref[:] = jnp.where(keep, out_llr_ref[:], llr_out)
                else:
                    lv2c_ref[:] = lv2c_new
                    out_llr_ref[:] = llr_out

                    @pl.when(it == iterations - 1)
                    def _():
                        iscw_ref[0:1, :] = syndrome(q)

            if early_term:
                active = jnp.sum(done_ref[0:1, :]) < bt

                @pl.when(active)
                def _():
                    iteration()
            else:
                iteration()
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)

        if not early_term:
            iters_ref[0:1, :] = jnp.full((1, bt), iterations, jnp.int32)
        out_iters_ref[:] = iters_ref[:]
        out_iscw_ref[:] = iscw_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "early_term", "minsum_mode", "batch_tile",
                     "interpret", "message_dtype", "layered", "permute",
                     "quant_scale"),
)
def bp_decode_pallas(
    pdc: PallasDeviceCode,
    llr_in: jnp.ndarray,  # f32 [nc, B], sorted VN labelling
    iterations: int = 50,
    early_term: bool = True,
    minsum_mode: bool = False,
    batch_tile: int = 256,
    interpret: bool = False,
    message_dtype: str = "float32",
    layered: bool = False,
    permute: str = "benes",
    quant_scale: float = 0.1875,
) -> SortedDecodeOutput:
    """See module docstring.

    ``message_dtype="bfloat16"`` stores and transports all messages in bf16
    — halving VMEM residency and the Beneš (dominant) pass cost at ~0.4%
    relative message quantisation (arithmetic stays float32).  BER impact
    must be validated statistically (see ``benchmarks/parity.py``); the
    default is exact float32.

    ``message_dtype="int8"`` stores/transports messages AND posteriors as
    ``round(L / quant_scale)`` saturated to +-127 — quantized min-sum, the
    TPU analogue of hardware decoders' sub-byte messages.  Requires a
    min-sum-family CN form (``BP_MS``/``BP_NMS``/``BP_OMS`` — min-sum is
    scale-invariant, so the integer algebra is exact after input
    quantisation) and the MXU transport (int8 rides native s8 matmul
    passes; Mosaic's roll cannot exchange int8 lanes).  Default
    ``quant_scale = 0.1875`` spans LLRs +-23.8 at resolution ~0.19.

    ``permute="mxu"`` runs the edge permutations as one-hot 128x128 block
    matmuls on the MXU instead of the Beneš network — available when the
    code's permutation is block-local (``pdc.mxu_blocks_fwd is not None``).
    """
    nc, B = llr_in.shape
    bt = min(batch_tile, B)
    if B % bt:
        raise ValueError(f"batch {B} not divisible by tile {bt}")
    if permute == "mxu" and pdc.mxu_blocks_fwd is None:
        raise ValueError(
            "permute='mxu' requires a block-local permutation plan "
            "(this code's plan exceeded the pair budget — use 'benes')"
        )
    if permute == "clos" and pdc.clos_p1 is None:
        raise ValueError(
            "permute='clos' requires the Clos factorisation — build the "
            "layout with to_pallas_device(code, with_clos=True)"
        )
    if message_dtype == "int8":
        kind = (
            minsum_mode[0] if isinstance(minsum_mode, tuple) else minsum_mode
        )
        if kind not in ("BP_MS", "BP_NMS", "BP_OMS", True):
            raise ValueError(
                "int8 messages require a min-sum-family CN form "
                "(BP_MS/BP_NMS/BP_OMS) — box-plus/tanh/phi forms are not "
                "scale-invariant"
            )
        if permute != "mxu":
            raise ValueError(
                "int8 messages require the MXU transport (permute='mxu')"
            )
    if iterations == 0:
        zeros = jnp.zeros_like(llr_in)
        return SortedDecodeOutput(
            llr_out=zeros,
            hard=jnp.zeros(llr_in.shape, bool),
            iterations=jnp.zeros((B,), jnp.int32),
            is_codeword=jnp.zeros((B,), bool),
        )

    swap = pdc.swap_planes  # int32 [N, S_active]
    Sa = swap.shape[1]
    dtype = jnp.dtype(message_dtype)
    mxu = permute == "mxu"
    clos = permute == "clos"

    use_layered = (
        layered
        and pdc.layer_planes is not None
        and pdc.layer_planes.shape[1] > 1
    )
    nl = int(pdc.layer_planes.shape[1]) if use_layered else 0
    kernel = _make_kernel(
        pdc, nc, iterations, early_term, minsum_mode, bt, dtype=dtype, nl=nl,
        mxu=mxu, clos=clos, qscale=quant_scale,
    )
    in_specs = []
    inputs = []
    if mxu:
        for blocks in (pdc.mxu_blocks_fwd, pdc.mxu_blocks_rev):
            if dtype == jnp.int8:
                # cast the one-hot blocks to s8 once outside the kernel
                # (the in-kernel astype would re-cast bf16->s8 per pass)
                blocks = blocks.astype(jnp.int8)
            in_specs.append(
                pl.BlockSpec(blocks.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(blocks)
    elif clos:
        for blocks in (pdc.clos_p1, pdc.clos_p3):
            in_specs.append(
                pl.BlockSpec(blocks.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(blocks)
        in_specs.append(
            pl.BlockSpec(pdc.clos_mid_planes.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(pdc.clos_mid_planes)
    else:
        in_specs.append(
            pl.BlockSpec((pdc.n_pad, Sa), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(swap)
    if use_layered:
        in_specs.append(
            pl.BlockSpec((pdc.n_pad, nl), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(pdc.layer_planes)
    in_specs.append(
        pl.BlockSpec((nc, bt), lambda b: (0, b), memory_space=pltpu.VMEM)
    )
    inputs.append(llr_in)
    scratch = [pltpu.VMEM((pdc.n_pad, bt), dtype)]
    if use_layered:
        scratch.append(pltpu.VMEM((pdc.n_pad, bt), dtype))  # lc2v state
    scratch += [
        pltpu.VMEM((8, bt), jnp.int32),
        pltpu.VMEM((8, bt), jnp.int32),
        pltpu.VMEM((8, bt), jnp.int32),
    ]
    llr_out, iters8, iscw8 = pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((nc, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nc, B), dtype),
            jax.ShapeDtypeStruct((8, B), jnp.int32),
            jax.ShapeDtypeStruct((8, B), jnp.int32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    llr_out = llr_out.astype(jnp.float32)
    if dtype == jnp.int8:
        llr_out = llr_out * quant_scale  # dequantize posterior q-values
    return SortedDecodeOutput(
        llr_out=llr_out,
        hard=llr_out <= 0,
        iterations=iters8[0],
        is_codeword=iscw8[0] > 0,
    )


def _perm_inputs(pdc, permute):
    """(in_specs, inputs) for the permutation tables of ``permute``."""
    in_specs = []
    inputs = []
    if permute == "mxu":
        if pdc.mxu_blocks_fwd is None:
            raise ValueError("permute='mxu' requires a block-local plan")
        for blocks in (pdc.mxu_blocks_fwd, pdc.mxu_blocks_rev):
            in_specs.append(
                pl.BlockSpec(blocks.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(blocks)
    elif permute == "clos":
        if pdc.clos_p1 is None:
            raise ValueError(
                "permute='clos' requires to_pallas_device(code, "
                "with_clos=True)"
            )
        for blocks in (pdc.clos_p1, pdc.clos_p3):
            in_specs.append(
                pl.BlockSpec(blocks.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(blocks)
        in_specs.append(
            pl.BlockSpec(pdc.clos_mid_planes.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(pdc.clos_mid_planes)
    else:
        swap = pdc.swap_planes
        in_specs.append(
            pl.BlockSpec((pdc.n_pad, swap.shape[1]), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(swap)
    return in_specs, inputs


@functools.partial(
    jax.jit,
    static_argnames=("k", "cap", "minsum_mode", "batch_tile", "interpret",
                     "message_dtype", "permute", "quant_scale"),
)
def bp_stream_chunk_pallas(
    pdc: PallasDeviceCode,
    llr_in: jnp.ndarray,  # f32 [nc, B] carried channel LLRs
    cw: jnp.ndarray,  # i32 [nc, B] carried true codewords
    lv2c: jnp.ndarray,  # dtype [n_pad, B] carried message state
    done8: jnp.ndarray,  # i32 [8, B] (row 0: finished flag)
    iters8: jnp.ndarray,  # i32 [8, B]
    age8: jnp.ndarray,  # i32 [8, B]
    avail8: jnp.ndarray,  # i32 [8, B] (row 0: pool entry unused)
    ctr8: jnp.ndarray,  # i32 [8, B] counter planes
    fresh_llr: jnp.ndarray,  # f32 [nc, B] fresh-frame pool
    fresh_cw: jnp.ndarray,  # i32 [nc, B]
    fresh_lv2c: jnp.ndarray,  # dtype [n_pad, B] pre-gathered edge priors
    refill: jnp.ndarray,  # i32 scalar: allow reloads
    remaining: jnp.ndarray,  # i32 scalar: global starts remaining (quota)
    *,
    k: int,
    cap: int,
    minsum_mode=False,
    batch_tile: int = 256,
    interpret: bool = False,
    message_dtype: str = "float32",
    permute: str = "benes",
    quant_scale: float = DEFAULT_QUANT_SCALE,
):
    """Run ``k`` self-refilling BP passes (see ``kernel_stream``).

    Returns the carried state ``(llr_in, cw, lv2c, done8, iters8, age8,
    avail8, ctr8)``; all eight operands are donated/aliased in place.
    Counter-plane rows: 0 bit_errors, 1 frame_errors, 2 frames,
    3 iter_sum, 4 started.
    """
    nc, B = llr_in.shape
    bt = min(batch_tile, B)
    if B % bt:
        raise ValueError(f"batch {B} not divisible by tile {bt}")
    if bt & (bt - 1):
        raise ValueError(f"batch tile {bt} must be a power of two")
    dtype = jnp.dtype(message_dtype)
    kernel = _make_kernel(
        pdc, nc, k, True, minsum_mode, bt, dtype=dtype,
        mxu=permute == "mxu", clos=permute == "clos", stream=True, cap=cap,
        qscale=quant_scale,
    )
    in_specs, inputs = _perm_inputs(pdc, permute)
    n_perm = len(inputs)

    is_tx = (
        jnp.zeros((nc, 1), jnp.int32).at[pdc.bit_pos, :].set(1)
    )
    for arr, spec in (
        (is_tx, pl.BlockSpec((nc, 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)),
        (fresh_llr, pl.BlockSpec((nc, bt), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)),
        (fresh_cw, pl.BlockSpec((nc, bt), lambda b: (0, b),
                                memory_space=pltpu.VMEM)),
        (fresh_lv2c, pl.BlockSpec((pdc.n_pad, bt), lambda b: (0, b),
                                  memory_space=pltpu.VMEM)),
        (jnp.asarray(refill, jnp.int32).reshape(1, 1),
         pl.BlockSpec((1, 1), lambda b: (0, 0),
                      memory_space=pltpu.SMEM)),
        (jnp.asarray(remaining, jnp.int32).reshape(1, 1),
         pl.BlockSpec((1, 1), lambda b: (0, 0),
                      memory_space=pltpu.SMEM)),
        (llr_in, pl.BlockSpec((nc, bt), lambda b: (0, b),
                              memory_space=pltpu.VMEM)),
        (cw, pl.BlockSpec((nc, bt), lambda b: (0, b),
                          memory_space=pltpu.VMEM)),
        (lv2c, pl.BlockSpec((pdc.n_pad, bt), lambda b: (0, b),
                            memory_space=pltpu.VMEM)),
        (done8, pl.BlockSpec((8, bt), lambda b: (0, b),
                             memory_space=pltpu.VMEM)),
        (iters8, pl.BlockSpec((8, bt), lambda b: (0, b),
                              memory_space=pltpu.VMEM)),
        (age8, pl.BlockSpec((8, bt), lambda b: (0, b),
                            memory_space=pltpu.VMEM)),
        (avail8, pl.BlockSpec((8, bt), lambda b: (0, b),
                              memory_space=pltpu.VMEM)),
        (ctr8, pl.BlockSpec((8, bt), lambda b: (0, b),
                            memory_space=pltpu.VMEM)),
    ):
        inputs.append(arr)
        in_specs.append(spec)
    out_specs = [
        pl.BlockSpec((nc, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((nc, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((pdc.n_pad, bt), lambda b: (0, b),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((8, bt), lambda b: (0, b), memory_space=pltpu.VMEM)
        for _ in range(5)
    ]
    out_shape = (
        jax.ShapeDtypeStruct((nc, B), jnp.float32),
        jax.ShapeDtypeStruct((nc, B), jnp.int32),
        jax.ShapeDtypeStruct((pdc.n_pad, B), dtype),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
    )
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={
            n_perm + 6: 0,  # llr_in
            n_perm + 7: 1,  # cw
            n_perm + 8: 2,  # lv2c
            n_perm + 9: 3,  # done8
            n_perm + 10: 4,  # iters8
            n_perm + 11: 5,  # age8
            n_perm + 12: 6,  # avail8
            n_perm + 13: 7,  # ctr8
        },
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
