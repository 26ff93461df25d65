"""Pallas in-kernel streaming decoder: per-frame semantics must match the
batch early-termination decoder bit-for-bit (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops.channel import simulate_channel
from libldpc_tpu.ops.pallas.layout import to_pallas_device
from libldpc_tpu.ops.sorted import bp_decode_sorted
from libldpc_tpu.ops.streaming_pallas import make_streaming_pallas_step
from libldpc_tpu.utils.params import DecoderParams


@pytest.fixture(scope="module")
def setup():
    code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    pdc = to_pallas_device(code)
    return code, pdc


def _drain_counts(pdc, dec, llr, cw, k):
    B = llr.shape[1]
    init_fn, step_fn = make_streaming_pallas_step(
        pdc, "AWGN", dec, B, chunk_iters=k, interpret=True, batch_tile=B,
    )
    state = init_fn()
    state = state._replace(
        llr_in=jnp.asarray(llr),
        codeword=jnp.asarray(cw).astype(jnp.int32),
        done8=jnp.zeros((8, B), jnp.int32),
    )
    totals = np.zeros(4, dtype=np.int64)
    for step in range(100):
        state, acc = step_fn(
            state, jax.random.PRNGKey(step), np.float32(0.0),
            jnp.asarray(False),
        )
        totals += np.array([
            int(acc.bit_errors), int(acc.frame_errors), int(acc.frames),
            int(acc.iter_sum),
        ])
        if int(acc.n_active) == 0:
            return totals
    raise AssertionError("streams did not drain")


class TestDrainEquivalence:
    @pytest.mark.parametrize("snr,iters,k", [(-2.0, 12, 5), (1.0, 12, 12),
                                             (3.0, 7, 3)])
    @pytest.mark.parametrize("dtype", ["BP", "BP_MS", "BP_TANH", "BP_PHI"])
    def test_matches_batch_decoder(self, setup, snr, iters, k, dtype):
        code, pdc = setup
        B = 64
        ch = simulate_channel(
            pdc, "AWGN", jax.random.PRNGKey(3), B, np.float32(snr)
        )
        dec = DecoderParams(iterations=iters, type=dtype)
        out = bp_decode_sorted(
            pdc.sorted_dc, ch.llr, iterations=iters, early_term=True,
            minsum_mode=dec.cn_mode,
        )
        bit_pos = np.asarray(pdc.sorted_dc.bit_pos)
        tx_hard = np.asarray(out.hard)[bit_pos]
        tx_true = np.asarray(ch.codeword)[bit_pos]
        errs = (tx_hard != tx_true).sum(axis=0)
        want = np.array(
            [errs.sum(), (errs > 0).sum(), B,
             np.asarray(out.iterations).sum()],
            dtype=np.int64,
        )
        got = _drain_counts(pdc, dec, np.asarray(ch.llr),
                            np.asarray(ch.codeword), k)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("mstype", ["BP_MS", "BP_OMS"])
    def test_int8_matches_int8_batch_kernel(self, setup, mstype):
        """int8 quantized min-sum streams on the edge-major kernel; the
        drained counts must match the int8 BATCH kernel exactly (same
        lattice, same semantics — the golden here is bp_decode_pallas
        with message_dtype='int8', not the f32 XLA decoder)."""
        from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas

        code, pdc = setup
        if pdc.mxu_blocks_fwd is None:
            pytest.skip("int8 needs the MXU-block-local plan")
        B = 64
        iters = 9
        ch = simulate_channel(
            pdc, "AWGN", jax.random.PRNGKey(11), B, np.float32(0.0)
        )
        dec = DecoderParams(iterations=iters, type=mstype,
                            message_dtype="int8")
        out = bp_decode_pallas(
            pdc, ch.llr, iterations=iters, early_term=True,
            minsum_mode=dec.cn_mode, message_dtype="int8", permute="mxu",
            interpret=True,
        )
        bit_pos = np.asarray(pdc.sorted_dc.bit_pos)
        tx_hard = np.asarray(out.hard)[bit_pos]
        tx_true = np.asarray(ch.codeword)[bit_pos]
        errs = (tx_hard != tx_true).sum(axis=0)
        want = np.array(
            [errs.sum(), (errs > 0).sum(), B,
             np.asarray(out.iterations).sum()],
            dtype=np.int64,
        )
        got = _drain_counts(pdc, dec, np.asarray(ch.llr),
                            np.asarray(ch.codeword), 4)
        np.testing.assert_array_equal(got, want)

    def test_driver_streams_int8(self, setup):
        """The Simulator keeps streaming ET enabled for int8 messages on
        the edge-major (MXU-plan) route and lands the exact quota."""
        from unittest import mock

        import libldpc_tpu.ops.streaming_pallas as sp
        import libldpc_tpu.sim.driver as drv
        from libldpc_tpu.utils.params import (
            ChannelParams, SimulationParams,
        )

        code, pdc = setup
        if pdc.mxu_blocks_fwd is None:
            pytest.skip("int8 needs the MXU-block-local plan")

        orig = sp.bp_stream_chunk_pallas

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(sp, "bp_stream_chunk_pallas", interp):
            sim = drv.Simulator(
                code,
                DecoderParams(iterations=6, early_term=True, type="BP_MS",
                              message_dtype="int8"),
                ChannelParams(type="AWGN", seed=3, x_range=(2.0, 2.1, 0.5)),
                SimulationParams(batch_size=32, max_frames=80, fec=10**9),
                use_pallas=True,
                verbose=False,
            )
            assert sim._streaming
            assert "dtype=int8" in sim.decode_path
            res = sim.start()
        assert int(res.frames[0]) == 80
        assert res.avg_iter[0] > 0

    def test_driver_streams_int8_on_lanes_route(self, setup):
        """The Simulator keeps streaming ET enabled for int8 messages on
        the LANE-MAJOR route too (round 4) and lands the exact quota —
        the driver-surface counterpart of
        test_int8_drain_matches_batch_int8_kernel."""
        import dataclasses
        from unittest import mock

        import libldpc_tpu.ops.pallas.decode_lanes as dl
        import libldpc_tpu.ops.streaming_pallas as sp
        import libldpc_tpu.sim.driver as drv
        from libldpc_tpu.ops.pallas import layout as pallas_layout
        from libldpc_tpu.ops.pallas.lanes_layout import LanesDeviceCode
        from libldpc_tpu.utils.params import (
            ChannelParams, SimulationParams,
        )

        code, _ = setup

        orig = dl.bp_stream_chunk_lanes

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        orig_tpd = pallas_layout.to_pallas_device
        with mock.patch.object(drv, "FUSED_EDGE_SPACE_LIMIT", 64), \
             mock.patch.object(
                 pallas_layout, "to_pallas_device",
                 lambda c, **kw: dataclasses.replace(
                     orig_tpd(c, **kw), mxu_blocks_fwd=None)), \
             mock.patch.object(dl, "bp_stream_chunk_lanes", interp), \
             mock.patch.object(sp, "bp_stream_chunk_lanes", interp,
                               create=True):
            sim = drv.Simulator(
                code,
                DecoderParams(iterations=6, early_term=True, type="BP_MS",
                              message_dtype="int8"),
                ChannelParams(type="AWGN", seed=3, x_range=(2.0, 2.1, 0.5)),
                SimulationParams(batch_size=32, max_frames=80, fec=10**9),
                use_pallas=True,
                verbose=False,
            )
            assert isinstance(sim.dcode, LanesDeviceCode)
            assert sim.dcode.transport == "clos"
            assert sim._streaming
            assert "dtype=int8" in sim.decode_path
            res = sim.start()
        assert int(res.frames[0]) == 80
        assert res.avg_iter[0] > 0

    def test_int8_requires_minsum_family(self, setup):
        code, pdc = setup
        if pdc.mxu_blocks_fwd is None:
            pytest.skip("int8 needs the MXU-block-local plan")
        with pytest.raises(ValueError, match="min-sum-family"):
            make_streaming_pallas_step(
                pdc, "AWGN",
                DecoderParams(iterations=5, type="BP",
                              message_dtype="int8"),
                32, interpret=True,
            )


class TestRefill:
    def test_streams_recycle(self, setup):
        code, pdc = setup
        B = 64
        init_fn, step_fn = make_streaming_pallas_step(
            pdc, "AWGN", DecoderParams(iterations=10), B, chunk_iters=5,
            interpret=True, batch_tile=B,
        )
        state = init_fn()
        frames = 0
        for s in range(6):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(2.0),
                jnp.asarray(True),
            )
            frames += int(acc.frames)
        # at 2 dB most frames converge quickly; slots must recycle
        assert frames > B
        assert int(acc.n_active) > 0

    def test_max_frames_quota(self, setup):
        code, pdc = setup
        B = 32
        init_fn, step_fn = make_streaming_pallas_step(
            pdc, "AWGN", DecoderParams(iterations=6), B, chunk_iters=6,
            interpret=True, batch_tile=B, max_frames=48,
        )
        state = init_fn()
        frames = 0
        for s in range(40):
            refill = frames < 48
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(3.0),
                jnp.asarray(refill),
            )
            frames += int(acc.frames)
            if not refill and int(acc.n_active) == 0:
                break
        assert frames == 48

    def test_quota_below_batch(self, setup):
        """max_frames smaller than the stream pool: the in-kernel scan
        must grant exactly that many starts on the very first pass."""
        code, pdc = setup
        B = 32
        init_fn, step_fn = make_streaming_pallas_step(
            pdc, "AWGN", DecoderParams(iterations=6), B, chunk_iters=6,
            interpret=True, batch_tile=B, max_frames=20,
        )
        state = init_fn()
        frames = 0
        for s in range(40):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(3.0),
                jnp.asarray(frames < 20),
            )
            frames += int(acc.frames)
            if frames >= 20 and int(acc.n_active) == 0:
                break
        assert frames == 20

    def test_multipoint_mesh(self, setup):
        """Point-parallel in-kernel streaming over a 2-D CPU mesh:
        per-point deltas, per-point refill gating, exact per-point
        max_frames quota."""
        import jax.numpy as jnp
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_pallas_multipoint_step,
        )
        from libldpc_tpu.ops.streaming import FRAME_AXIS, POINT_AXIS

        code, pdc = setup
        mesh = jax.make_mesh((2, 2), (POINT_AXIS, FRAME_AXIS))
        B = 16  # per frame-device
        init_fn, step_fn = make_streaming_pallas_multipoint_step(
            pdc, "AWGN", DecoderParams(iterations=6), B, mesh,
            chunk_iters=6, interpret=True, batch_tile=16, max_frames=40,
        )
        state = init_fn()
        frames = np.zeros(2, np.int64)
        fec = np.zeros(2, np.int64)
        for s in range(30):
            refill = jnp.asarray(frames < 40)
            state, acc = step_fn(
                state, jax.random.PRNGKey(s),
                jnp.asarray([0.0, 4.0], jnp.float32), refill,
            )
            fr = np.asarray(acc.frames)
            assert fr.shape == (2,)
            frames += fr
            fec += np.asarray(acc.frame_errors)
            if (frames >= 40).all() and (np.asarray(acc.n_active) == 0).all():
                break
        np.testing.assert_array_equal(frames, [40, 40])
        # the noisy point sees errors, the clean one (4 dB) far fewer
        assert fec[0] > fec[1]

    def test_watermark_statistics_unbiased(self, setup):
        """Pool-regeneration gating must not bias the counted population:
        long-run frame totals at a mid SNR agree with an independent batch
        estimate within Monte-Carlo tolerance."""
        code, pdc = setup
        B = 64
        init_fn, step_fn = make_streaming_pallas_step(
            pdc, "AWGN", DecoderParams(iterations=8), B, chunk_iters=4,
            interpret=True, batch_tile=B, gen_watermark=B // 4,
        )
        state = init_fn()
        tot = np.zeros(4, dtype=np.int64)
        for s in range(10):
            state, acc = step_fn(
                state, jax.random.PRNGKey(100 + s), np.float32(1.0),
                jnp.asarray(True),
            )
            tot += np.array([int(acc.bit_errors), int(acc.frame_errors),
                             int(acc.frames), int(acc.iter_sum)])
        # drain
        for s in range(50):
            state, acc = step_fn(
                state, jax.random.PRNGKey(200 + s), np.float32(1.0),
                jnp.asarray(False),
            )
            tot += np.array([int(acc.bit_errors), int(acc.frame_errors),
                             int(acc.frames), int(acc.iter_sum)])
            if int(acc.n_active) == 0:
                break
        assert int(acc.n_active) == 0
        n = tot[2]
        assert n > 2 * B  # streams recycled several times
        # independent estimate of FER / avg_iter from the batch decoder
        ch = simulate_channel(
            pdc, "AWGN", jax.random.PRNGKey(999), 512, np.float32(1.0)
        )
        out = bp_decode_sorted(
            pdc.sorted_dc, ch.llr, iterations=8, early_term=True
        )
        bit_pos = np.asarray(pdc.sorted_dc.bit_pos)
        errs = (
            np.asarray(out.hard)[bit_pos] != np.asarray(ch.codeword)[bit_pos]
        ).sum(axis=0)
        fer_ref = (errs > 0).mean()
        fer = tot[1] / n
        # two-proportion z-ish sanity bound (loose: both are MC estimates)
        sd = np.sqrt(fer_ref * (1 - fer_ref) * (1 / n + 1 / 512.0)) + 1e-9
        assert abs(fer - fer_ref) < 5 * sd, (fer, fer_ref)
        ai = tot[3] / n
        ai_ref = np.asarray(out.iterations).mean()
        assert abs(ai - ai_ref) < 1.0, (ai, ai_ref)


class TestLanesStreaming:
    """Lane-major in-kernel streaming (large-blocklength path): same
    semantics as the edge-major version, frames on sublanes."""

    @pytest.fixture(scope="class")
    def lsetup(self):
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

        code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
        ldc = to_lanes_device(code)
        return code, ldc

    def test_drain_matches_batch_decoder(self, lsetup):
        import jax.numpy as jnp
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_step,
        )

        code, ldc = lsetup
        B = 16
        ch = simulate_channel(
            ldc.sorted_dc, "AWGN", jax.random.PRNGKey(3), B,
            np.float32(-1.0),
        )
        iters = 9
        out = bp_decode_sorted(
            ldc.sorted_dc, ch.llr, iterations=iters, early_term=True
        )
        bit_pos = np.asarray(ldc.sorted_dc.bit_pos)
        errs = (
            np.asarray(out.hard)[bit_pos]
            != np.asarray(ch.codeword)[bit_pos]
        ).sum(axis=0)
        want = np.array(
            [errs.sum(), (errs > 0).sum(), B,
             np.asarray(out.iterations).sum()], dtype=np.int64,
        )
        init_fn, step_fn = make_streaming_lanes_step(
            ldc, "AWGN", DecoderParams(iterations=iters), B,
            chunk_iters=4, interpret=True, frame_tile=8,
        )
        state = init_fn()
        # preload the pool in lane space and mark every lane in-flight
        real = np.zeros((ldc.nc_pad, 1), np.float32)
        real[np.asarray(ldc.lane_of_vn)] = 1.0
        llr_l = (np.asarray(
            jnp.take(ch.llr, ldc.vn_of_lane, axis=0, mode="fill",
                     fill_value=0.0)) * real).T
        cw_l = (np.asarray(
            jnp.take(ch.codeword.astype(jnp.float32), ldc.vn_of_lane,
                     axis=0, mode="fill", fill_value=0.0)) * real).T
        state = state._replace(
            llr_in=jnp.asarray(llr_l, jnp.float32),
            codeword=jnp.asarray(cw_l).astype(jnp.int32),
            done=jnp.zeros((B, 128), jnp.int32),
        )
        totals = np.zeros(4, dtype=np.int64)
        for step in range(60):
            state, acc = step_fn(
                state, jax.random.PRNGKey(step), np.float32(-1.0),
                jnp.asarray(False),
            )
            totals += np.array([
                int(acc.bit_errors), int(acc.frame_errors),
                int(acc.frames), int(acc.iter_sum),
            ])
            if int(acc.n_active) == 0:
                break
        np.testing.assert_array_equal(totals, want)

    def test_int8_drain_matches_batch_int8_kernel(self, lsetup):
        """int8 integer-lattice min-sum streams on the lanes kernel
        (round 4): drained counts must match the batch int8 lanes decoder
        exactly.  The streaming pool carries raw-LLR f32 priors; the
        kernel scales them to lattice units in its VN stage
        (``scale_prior``), byte-matching the batch wrapper's pre-scaled
        entry."""
        import jax.numpy as jnp
        from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_step,
        )

        code, _ = lsetup
        ldc = to_lanes_device(code, transport="clos")
        B = 16
        iters = 9
        ch = simulate_channel(
            ldc.sorted_dc, "AWGN", jax.random.PRNGKey(3), B,
            np.float32(-1.0),
        )
        out = bp_decode_lanes(
            ldc, ch.llr, iterations=iters, early_term=True,
            minsum_mode="BP_MS", message_dtype="int8", interpret=True,
            frame_tile=8,
        )
        bit_pos = np.asarray(ldc.sorted_dc.bit_pos)
        errs = (
            np.asarray(out.hard)[bit_pos]
            != np.asarray(ch.codeword)[bit_pos]
        ).sum(axis=0)
        want = np.array(
            [errs.sum(), (errs > 0).sum(), B,
             np.asarray(out.iterations).sum()], dtype=np.int64,
        )
        init_fn, step_fn = make_streaming_lanes_step(
            ldc, "AWGN",
            DecoderParams(iterations=iters, type="BP_MS",
                          message_dtype="int8"),
            B, chunk_iters=4, interpret=True, frame_tile=8,
        )
        state = init_fn()
        # preload the pool in lane space (raw-LLR f32) and mark every
        # lane in-flight
        real = np.zeros((ldc.nc_pad, 1), np.float32)
        real[np.asarray(ldc.lane_of_vn)] = 1.0
        llr_l = (np.asarray(
            jnp.take(ch.llr, ldc.vn_of_lane, axis=0, mode="fill",
                     fill_value=0.0)) * real).T
        cw_l = (np.asarray(
            jnp.take(ch.codeword.astype(jnp.float32), ldc.vn_of_lane,
                     axis=0, mode="fill", fill_value=0.0)) * real).T
        state = state._replace(
            llr_in=jnp.asarray(llr_l, jnp.float32),
            codeword=jnp.asarray(cw_l).astype(jnp.int32),
            done=jnp.zeros((B, 128), jnp.int32),
        )
        assert state.lv2c.dtype == jnp.int8
        totals = np.zeros(4, dtype=np.int64)
        for step in range(60):
            state, acc = step_fn(
                state, jax.random.PRNGKey(step), np.float32(-1.0),
                jnp.asarray(False),
            )
            totals += np.array([
                int(acc.bit_errors), int(acc.frame_errors),
                int(acc.frames), int(acc.iter_sum),
            ])
            if int(acc.n_active) == 0:
                break
        np.testing.assert_array_equal(totals, want)

    def test_int8_self_refills_exact_quota(self, lsetup):
        """int8 lanes streaming with its own channel generation: exact
        frame quota and plausible error statistics (self-refill pools
        quantize fresh edge priors with the run's quant_scale)."""
        import jax.numpy as jnp
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_step,
        )

        code, _ = lsetup
        ldc = to_lanes_device(code, transport="clos")
        B = 16
        quota = 56  # not a multiple of B: exercises the in-kernel cap
        init_fn, step_fn = make_streaming_lanes_step(
            ldc, "AWGN",
            DecoderParams(iterations=8, type="BP_MS",
                          message_dtype="int8"),
            B, chunk_iters=4, max_frames=quota, interpret=True,
            frame_tile=8,
        )
        state = init_fn()
        frames = 0
        for step in range(80):
            state, acc = step_fn(
                state, jax.random.PRNGKey(step), np.float32(2.0),
                jnp.asarray(True),
            )
            frames += int(acc.frames)
            if frames >= quota and int(acc.n_active) == 0:
                break
        assert frames == quota

    def test_bec_drain_matches_batch_bec_kernel(self, lsetup):
        """BEC streams on the lanes kernel (sign-encoded min-sum ride):
        drained counts must match the batch fused BEC decoder exactly."""
        import jax.numpy as jnp
        from libldpc_tpu.ops.channel import BEC_ERASURE
        from libldpc_tpu.ops.pallas.decode_lanes import bec_decode_lanes
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_step,
        )

        code, ldc = lsetup
        B = 16
        iters = 9
        ch = simulate_channel(
            ldc.sorted_dc, "BEC", jax.random.PRNGKey(5), B,
            np.float32(0.45),
        )
        out = bec_decode_lanes(
            ldc, ch.llr, ch.codeword, iterations=iters, early_term=True,
            interpret=True, frame_tile=8,
        )
        bit_pos = np.asarray(ldc.sorted_dc.bit_pos)
        errs = (
            np.asarray(out.hard)[bit_pos]
            != np.asarray(ch.codeword)[bit_pos]
        ).sum(axis=0)
        want = np.array(
            [errs.sum(), (errs > 0).sum(), B,
             np.asarray(out.iterations).sum()], dtype=np.int64,
        )

        init_fn, step_fn = make_streaming_lanes_step(
            ldc, "BEC", DecoderParams(iterations=iters), B,
            chunk_iters=4, interpret=True, frame_tile=8,
        )
        state = init_fn()
        # inject the same frames: sign encoding, then lane space
        sign = jnp.where(
            ch.llr == BEC_ERASURE,
            jnp.float32(0.0),
            1.0 - 2.0 * ch.llr.astype(jnp.float32),
        )
        real = np.zeros((ldc.nc_pad, 1), np.float32)
        real[np.asarray(ldc.lane_of_vn)] = 1.0
        llr_l = (np.asarray(
            jnp.take(sign, ldc.vn_of_lane, axis=0, mode="fill",
                     fill_value=0.0)) * real).T
        cw_l = (np.asarray(
            jnp.take(ch.codeword.astype(jnp.float32), ldc.vn_of_lane,
                     axis=0, mode="fill", fill_value=0.0)) * real).T
        state = state._replace(
            llr_in=jnp.asarray(llr_l, jnp.float32),
            codeword=jnp.asarray(cw_l).astype(jnp.int32),
            done=jnp.zeros((B, 128), jnp.int32),
        )
        totals = np.zeros(4, dtype=np.int64)
        for step in range(60):
            state, acc = step_fn(
                state, jax.random.PRNGKey(step), np.float32(0.45),
                jnp.asarray(False),
            )
            totals += np.array([
                int(acc.bit_errors), int(acc.frame_errors),
                int(acc.frames), int(acc.iter_sum),
            ])
            if int(acc.n_active) == 0:
                break
        np.testing.assert_array_equal(totals, want)

    def test_bec_streaming_self_refills(self, lsetup):
        """BEC streaming with its own channel generation: exact quota,
        plausible erasure-rate error statistics."""
        import jax.numpy as jnp
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_step,
        )

        code, ldc = lsetup
        B = 16
        init_fn, step_fn = make_streaming_lanes_step(
            ldc, "BEC", DecoderParams(iterations=8), B, chunk_iters=4,
            interpret=True, frame_tile=8, max_frames=37,
        )
        state = init_fn()
        frames = fec = 0
        for s in range(60):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(0.55),
                jnp.asarray(frames < 37),
            )
            frames += int(acc.frames)
            fec += int(acc.frame_errors)
            if frames >= 37 and int(acc.n_active) == 0:
                break
        assert frames == 37
        assert fec > 0  # eps 0.55 > the (3,6) BEC threshold ~0.43

    def test_driver_keeps_bec_on_batch(self, lsetup):
        """The driver does NOT stream BEC (measured at best a tie with
        the batch fused path — see the gate comment in sim/driver.py and
        benchmarks/EARLY_TERM.md); the capability itself stays available
        through make_streaming_lanes_step (tests above)."""
        import libldpc_tpu.sim.driver as drv
        from libldpc_tpu.ops.pallas.lanes_layout import LanesDeviceCode
        from libldpc_tpu.utils.params import (
            ChannelParams, SimulationParams,
        )

        code, _ = lsetup
        sim = drv.Simulator(
            code,
            DecoderParams(iterations=8, early_term=True),
            ChannelParams(type="BEC", seed=3, x_range=(0.4, 0.41, 0.5)),
            SimulationParams(batch_size=32, max_frames=90, fec=10**9),
            use_pallas=True,
            verbose=False,
        )
        assert isinstance(sim.dcode, LanesDeviceCode)
        assert not sim._streaming
        assert "streaming=off" in sim.decode_path

    def test_refill_and_exact_quota(self, lsetup):
        import jax.numpy as jnp
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_step,
        )

        code, ldc = lsetup
        B = 16
        init_fn, step_fn = make_streaming_lanes_step(
            ldc, "AWGN", DecoderParams(iterations=6), B, chunk_iters=6,
            interpret=True, frame_tile=8, max_frames=21,
        )
        state = init_fn()
        frames = 0
        for s in range(40):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(3.0),
                jnp.asarray(frames < 21),
            )
            frames += int(acc.frames)
            if frames >= 21 and int(acc.n_active) == 0:
                break
        assert frames == 21

    def test_lanes_streaming_mesh(self, lsetup):
        """Lane-major streaming sharded over the frames axis: per-shard
        quotas, psum-reduced deltas."""
        import jax.numpy as jnp
        from libldpc_tpu.ops.streaming import FRAME_AXIS
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_step,
        )

        code, ldc = lsetup
        mesh = jax.make_mesh((4,), (FRAME_AXIS,))
        init_fn, step_fn = make_streaming_lanes_step(
            ldc, "AWGN", DecoderParams(iterations=6), 8, mesh=mesh,
            chunk_iters=6, interpret=True, frame_tile=8, max_frames=50,
        )
        state = init_fn()
        frames = 0
        for s in range(40):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(3.0),
                jnp.asarray(frames < 50),
            )
            frames += int(acc.frames)
            if frames >= 50 and int(acc.n_active) == 0:
                break
        # per-device quotas sum to min(max_frames, ...) within rounding
        # slack of the per-device split (13+13+12+12 = 50)
        assert frames == 50


class TestStreamingFuzz:
    """Drain equivalence on irregular structures (planted degree-1 checks,
    degree spread): the in-kernel bookkeeping must match the batch decoder
    for every degree-class layout, not just (3,6)-regular graphs."""

    @pytest.mark.parametrize("trial", [0, 1])
    def test_irregular_codes_drain_equivalence(self, trial):
        from libldpc_tpu.models import LDPCCode

        rng = np.random.default_rng(4200 + trial)
        while True:
            H = (rng.random((24, 48)) < 0.14).astype(np.uint8)
            for v in range(48):
                if not H[:, v].any():
                    H[rng.integers(0, 24), v] = 1
            # plant a degree-1 check
            H[5] = 0
            H[5, rng.integers(0, 48)] = 1
            if (H.sum(1) >= 1).all():
                break
        code = LDPCCode.from_dense(H)
        pdc = to_pallas_device(code)
        B = 32
        llr = rng.normal(size=(code.nc, B)).astype(np.float32) * 2.0
        cw = np.zeros((code.nc, B), np.uint8)  # all-zero is a codeword
        iters = 9
        out = bp_decode_sorted(
            pdc.sorted_dc, jnp.asarray(llr), iterations=iters,
            early_term=True,
        )
        bit_pos = np.asarray(pdc.sorted_dc.bit_pos)
        errs = (np.asarray(out.hard)[bit_pos] != 0).sum(axis=0)
        want = np.array(
            [errs.sum(), (errs > 0).sum(), B,
             np.asarray(out.iterations).sum()], dtype=np.int64,
        )
        got = _drain_counts(
            pdc, DecoderParams(iterations=iters), llr, cw, 4
        )
        # frames / frame errors / iteration sums must match exactly; bit
        # errors may differ at f32 knife edges (the kernel's class-slice
        # VN sums associate differently from XLA's segment sums on
        # irregular degree mixes — measured: 1 bit of 722 on trial 1)
        np.testing.assert_array_equal(got[1:], want[1:])
        assert abs(int(got[0]) - int(want[0])) <= 2, (got, want)


def test_streaming_with_modulation_drains(setup):
    """Higher-order modulation (4-ASK) through the in-kernel streaming
    driver path: pool regeneration must run the modulated pipeline."""
    from unittest import mock

    from libldpc_tpu.ops import modulation as mod
    from libldpc_tpu.ops import streaming_pallas as sp
    from libldpc_tpu.sim.driver import Simulator
    from libldpc_tpu.utils.params import (
        ChannelParams, SimulationParams,
    )

    code, pdc = setup
    c = mod.Constellation.mask(4, labels=[0, 1, 3, 2])
    n_sym = code.nct // 2
    mapper = code.bit_pos[mod.default_bit_mapper(2, n_sym)]

    orig = sp.bp_stream_chunk_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        kw["batch_tile"] = 32
        return orig(*a, **kw)

    with mock.patch.object(sp, "bp_stream_chunk_pallas", interp):
        sim = Simulator(
            code,
            DecoderParams(iterations=8),
            ChannelParams(seed=3, x_range=(5.0, 6.0, 1.0)),
            SimulationParams(batch_size=32, fec=10**9, max_frames=64),
            modulation=(c, mapper),
            use_pallas=True,
            verbose=False,
        )
        assert sim._streaming and sim._step is None
        res = sim.start()
    assert int(res.frames[0]) == 64  # exact quota landing
    assert 0 <= res.fer[0] <= 1


class TestLanesMultipoint:
    def test_lanes_multipoint_mesh(self):
        """Point-parallel lane-major streaming over a 2-D CPU mesh."""
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
        from libldpc_tpu.ops.streaming import FRAME_AXIS, POINT_AXIS
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_multipoint_step,
        )

        code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
        ldc = to_lanes_device(code)
        mesh = jax.make_mesh((2, 2), (POINT_AXIS, FRAME_AXIS))
        B = 8  # per frame-device
        init_fn, step_fn = make_streaming_lanes_multipoint_step(
            ldc, "AWGN", DecoderParams(iterations=6), B, mesh,
            chunk_iters=6, interpret=True, frame_tile=8, max_frames=20,
        )
        state = init_fn()
        frames = np.zeros(2, np.int64)
        fec = np.zeros(2, np.int64)
        for s in range(30):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s),
                jnp.asarray([0.0, 4.0], jnp.float32),
                jnp.asarray(frames < 20),
            )
            frames += np.asarray(acc.frames)
            fec += np.asarray(acc.frame_errors)
            if (frames >= 20).all() and (np.asarray(acc.n_active) == 0).all():
                break
        np.testing.assert_array_equal(frames, [20, 20])
        assert fec[0] > fec[1]

    def test_wide_driver_routes_lanes_streaming(self, monkeypatch):
        """start_wide on a large unstructured code with use_pallas must run
        the lane-major multipoint streaming path end-to-end."""
        from unittest import mock

        import libldpc_tpu.sim.driver as drv
        from libldpc_tpu.ops.pallas import decode_lanes as dl
        from libldpc_tpu.ops.pallas.lanes_layout import LanesDeviceCode
        from libldpc_tpu.ops.streaming import FRAME_AXIS, POINT_AXIS
        from libldpc_tpu.utils.params import (
            ChannelParams, SimulationParams,
        )

        monkeypatch.setattr(drv, "FUSED_EDGE_SPACE_LIMIT", 64)
        import dataclasses

        from libldpc_tpu.ops.pallas import layout as pallas_layout

        orig_tpd = pallas_layout.to_pallas_device
        monkeypatch.setattr(
            pallas_layout,
            "to_pallas_device",
            lambda cc, **kw: dataclasses.replace(
                orig_tpd(cc, **kw), mxu_blocks_fwd=None
            ),
        )
        code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
        mesh = jax.make_mesh((2, 2), (POINT_AXIS, FRAME_AXIS))

        orig = dl.bp_stream_chunk_lanes

        def interp(*a, **kw):
            kw["interpret"] = True
            kw["frame_tile"] = 8
            return orig(*a, **kw)

        with mock.patch.object(dl, "bp_stream_chunk_lanes", interp):
            sim = drv.Simulator(
                code,
                DecoderParams(iterations=6, early_term=True),
                ChannelParams(type="AWGN", seed=3, x_range=(2.0, 3.1, 1.0)),
                SimulationParams(batch_size=16, max_frames=40, fec=10**9),
                use_pallas=True,
                verbose=False,
            )
            assert isinstance(sim.dcode, LanesDeviceCode)
            res = sim.start_wide(mesh)
        np.testing.assert_array_equal(np.asarray(res.frames), [40, 40])


class TestLanesMultipointLayered:
    def test_lanes_multipoint_layered_engine(self):
        """Point-parallel streaming on the fast layered engine
        (round 5): exact per-point quotas over a 2-D CPU mesh."""
        from libldpc_tpu.models import (
            make_qc_benchmark_code, qc_natural_layers,
        )
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
        from libldpc_tpu.ops.streaming import FRAME_AXIS, POINT_AXIS
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_lanes_multipoint_step,
        )

        code = make_qc_benchmark_code(8 * 128, 128, dv=3, dc=6, seed=3)
        qc_natural_layers(code)
        ldc = to_lanes_device(code, transport="qc", with_layers=True)
        assert ldc.qc_layers
        mesh = jax.make_mesh((2, 2), (POINT_AXIS, FRAME_AXIS))
        init_fn, step_fn = make_streaming_lanes_multipoint_step(
            ldc, "AWGN", DecoderParams(iterations=5, layered=True),
            8, mesh, chunk_iters=5, interpret=True, frame_tile=8,
            max_frames=24,
        )
        state = init_fn()
        frames = np.zeros(2, np.int64)
        iters = np.zeros(2, np.int64)
        for s in range(30):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s),
                jnp.asarray([1.0, 2.0], jnp.float32),
                jnp.asarray(frames < 24),
            )
            frames += np.asarray(acc.frames)
            iters += np.asarray(acc.iter_sum)
            if (frames >= 24).all():
                break
        np.testing.assert_array_equal(frames, [24, 24])
        assert (iters > 0).all()
