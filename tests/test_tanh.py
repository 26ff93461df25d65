"""Tanh-product sum-product CN form (``BP_TANH``) — the reference GPU
stack's check-node update (``gpu/device/kernel.cpp:237-264``), exposed as a
runtime decoder type.  Mathematically the same sum-product algorithm as
``BP`` (pairwise box-plus) with different rounding; cross-path bit-exactness
and statistical agreement with ``BP`` are both asserted here."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops import cn_ops
from libldpc_tpu.ops.decoder import bp_decode
from libldpc_tpu.ops.device import PAD_LLR, to_device
from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device


class TestTanhOps:
    def test_get_op_raises(self):
        with pytest.raises(ValueError, match="BP_TANH"):
            cn_ops.get_op("BP_TANH")

    def test_is_tanh_mode(self):
        assert cn_ops.is_tanh_mode("BP_TANH")
        assert not cn_ops.is_tanh_mode("BP")
        assert not cn_ops.is_tanh_mode(False)
        assert not cn_ops.is_tanh_mode(("BP_NMS", 0.75, 0.0))

    def test_matches_boxplus_numerically(self):
        """Product-form exclusion vs pairwise box-plus chain on moderate
        LLRs: same math, agreement to f32 rounding."""
        rng = np.random.default_rng(0)
        M = jnp.asarray(rng.normal(size=(64, 6, 4)).astype(np.float32) * 3.0)
        out_t = np.asarray(cn_ops.exclusion_combine_tanh(M))
        out_b = np.asarray(cn_ops.exclusion_combine(M, cn_ops.boxplus))
        np.testing.assert_allclose(out_t, out_b, rtol=2e-4, atol=2e-4)

    def test_pad_is_identity(self):
        """Padding lanes (PAD_LLR) must not perturb real outputs —
        tanh(PAD/2) == 1.0 exactly."""
        rng = np.random.default_rng(1)
        real = rng.normal(size=(32, 4, 2)).astype(np.float32) * 2.0
        M = np.full((32, 6, 2), PAD_LLR, np.float32)
        M[:, :4] = real
        out_pad = np.asarray(cn_ops.exclusion_combine_tanh(jnp.asarray(M)))
        out_nopad = np.asarray(
            cn_ops.exclusion_combine_tanh(jnp.asarray(real))
        )
        np.testing.assert_array_equal(out_pad[:, :4], out_nopad)

    def test_output_capped(self):
        """Saturated products decode to the finite clip LLR, never inf."""
        M = jnp.full((4, 6, 2), 100.0, jnp.float32)
        out = np.asarray(cn_ops.exclusion_combine_tanh(M))
        assert np.all(np.isfinite(out))
        cap = float(np.log1p(cn_ops.TANH_CLIP) - np.log1p(-cn_ops.TANH_CLIP))
        assert np.all(np.abs(out) <= cap + 1e-6)

    def test_degree_one_matches_pairwise_semantics(self):
        M = jnp.asarray(np.random.default_rng(2)
                        .normal(size=(8, 1, 2)).astype(np.float32))
        out = np.asarray(cn_ops.exclusion_combine_tanh(M))
        np.testing.assert_array_equal(
            out, np.full((8, 1, 2), PAD_LLR, np.float32)
        )


@pytest.fixture(scope="module")
def tanh_setup():
    code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    rng = np.random.default_rng(3)
    B = 64
    sigma2 = 10 ** (-1.0 / 10)
    llr = np.zeros((code.nc, B), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, B)) * np.sqrt(sigma2)
    llr[code.bit_pos] = 2.0 * y / sigma2
    return code, llr


class TestTanhDecoders:
    def test_padded_equals_sorted_bitexact(self, tanh_setup):
        """Pad lanes are exact multiplicative identities, so the padded and
        sorted paths produce bit-identical BP_TANH outputs."""
        code, llr = tanh_setup
        dcode = to_device(code)
        sdc = to_sorted_device(code)
        out_p = bp_decode(
            dcode, jnp.asarray(llr), iterations=8, early_term=True,
            minsum_mode="BP_TANH",
        )
        vp = np.asarray(jax.device_get(sdc.vn_perm))
        out_s = bp_decode_sorted(
            sdc, jnp.asarray(llr[vp]), iterations=8, early_term=True,
            minsum_mode="BP_TANH",
        )
        inv = np.empty_like(vp)
        inv[vp] = np.arange(vp.size)
        np.testing.assert_array_equal(
            np.asarray(out_p.hard), np.asarray(out_s.hard)[inv]
        )
        np.testing.assert_array_equal(
            np.asarray(out_p.iterations), np.asarray(out_s.iterations)
        )

    def test_fused_kernels_match_sorted(self, tanh_setup):
        """Edge-major and lane-major Pallas kernels (interpret mode) agree
        with the XLA sorted decoder on BP_TANH bit-for-bit."""
        from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
        from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
        from libldpc_tpu.ops.pallas.layout import to_pallas_device

        code, llr = tanh_setup
        pdc = to_pallas_device(code, with_clos=True)
        sdc = pdc.sorted_dc
        vp = np.asarray(jax.device_get(sdc.vn_perm))
        llr_s = jnp.asarray(llr[vp])
        out_s = bp_decode_sorted(
            sdc, llr_s, iterations=8, early_term=True, minsum_mode="BP_TANH"
        )
        out_f = bp_decode_pallas(
            pdc, llr_s, iterations=8, early_term=True,
            minsum_mode="BP_TANH", batch_tile=64, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out_f.hard), np.asarray(out_s.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_f.iterations), np.asarray(out_s.iterations)
        )
        ldc = to_lanes_device(code, transport="clos")
        out_l = bp_decode_lanes(
            ldc, llr_s, iterations=8, early_term=True,
            minsum_mode="BP_TANH", interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out_l.hard), np.asarray(out_s.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_l.iterations), np.asarray(out_s.iterations)
        )

    def test_statistically_matches_bp(self, tanh_setup):
        """Same algorithm, different rounding: frame outcomes agree with BP
        on the overwhelming majority of frames."""
        code, llr = tanh_setup
        sdc = to_sorted_device(code)
        vp = np.asarray(jax.device_get(sdc.vn_perm))
        llr_s = jnp.asarray(llr[vp])
        out_t = bp_decode_sorted(
            sdc, llr_s, iterations=30, early_term=True,
            minsum_mode="BP_TANH",
        )
        out_b = bp_decode_sorted(
            sdc, llr_s, iterations=30, early_term=True, minsum_mode="BP"
        )
        agree = (
            np.asarray(out_t.is_codeword) == np.asarray(out_b.is_codeword)
        ).mean()
        assert agree > 0.9, f"codeword-flag agreement {agree}"

    def test_driver_end_to_end(self, tanh_setup):
        from libldpc_tpu.sim.driver import Simulator
        from libldpc_tpu.utils.params import (
            ChannelParams, DecoderParams, SimulationParams,
        )

        code, _ = tanh_setup
        res = Simulator(
            code,
            DecoderParams(iterations=10, type="BP_TANH"),
            ChannelParams(type="AWGN", seed=1, x_range=(2.0, 2.1, 0.5)),
            SimulationParams(batch_size=64, max_frames=128, fec=10**9),
            verbose=False,
        ).start()
        assert res.frames[0] == 128
        assert res.avg_iter[0] > 0
