"""Fused Pallas decoder: interpret-mode equivalence with the sorted decoder,
and the Beneš permutation network."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops.pallas.benes import apply_benes_numpy, build_benes
from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
from libldpc_tpu.ops.pallas.layout import to_pallas_device
from libldpc_tpu.ops.sorted import bp_decode_sorted


class TestBenes:
    @pytest.mark.parametrize("n", [2, 5, 16, 100, 1024])
    def test_routes_random_permutations(self, n):
        rng = np.random.default_rng(n)
        perm = rng.permutation(n)
        net = build_benes(perm)
        x = np.arange(net.n)
        out = apply_benes_numpy(net, x)
        assert np.array_equal(out[:n], perm)
        assert np.array_equal(out[n:], np.arange(n, net.n))
        back = apply_benes_numpy(net, out, reverse=True)
        assert np.array_equal(back, x)

    def test_stage_count(self):
        net = build_benes(np.random.default_rng(0).permutation(256))
        assert len(net.dists) == 2 * 8 - 1
        assert net.swap.shape == (15, 256)


@pytest.fixture(scope="module")
def pallas_setup():
    code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    pdc = to_pallas_device(code)
    rng = np.random.default_rng(3)
    B = 128
    sigma2 = 10 ** (-1.0 / 10)
    llr = np.zeros((code.nc, B), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, B)) * np.sqrt(sigma2)
    llr[code.bit_pos] = 2.0 * y / sigma2
    llr_s = jnp.asarray(llr[np.asarray(pdc.sorted_dc.vn_perm)])
    return code, pdc, llr_s


class TestFusedKernel:
    @pytest.mark.parametrize("early_term", [True, False])
    @pytest.mark.parametrize("minsum_mode", [False, True])
    def test_matches_sorted_decoder(self, pallas_setup, early_term, minsum_mode):
        code, pdc, llr_s = pallas_setup
        out_p = bp_decode_pallas(
            pdc, llr_s, iterations=12, early_term=early_term,
            minsum_mode=minsum_mode, batch_tile=128, interpret=True,
        )
        out_s = jax.jit(
            lambda l: bp_decode_sorted(
                pdc.sorted_dc, l, iterations=12, early_term=early_term,
                minsum_mode=minsum_mode,
            )
        )(llr_s)
        np.testing.assert_array_equal(
            np.asarray(out_p.hard), np.asarray(out_s.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_p.iterations), np.asarray(out_s.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(out_p.is_codeword), np.asarray(out_s.is_codeword)
        )
        np.testing.assert_allclose(
            np.asarray(out_p.llr_out),
            np.asarray(out_s.llr_out),
            rtol=1e-4,
            atol=1e-4,
        )

    def test_multiple_tiles(self, pallas_setup):
        code, pdc, llr_s = pallas_setup
        llr2 = jnp.concatenate([llr_s, -llr_s], axis=1)  # 2 tiles of 128
        out = bp_decode_pallas(
            pdc, llr2, iterations=8, batch_tile=128, interpret=True
        )
        out_s = jax.jit(
            lambda l: bp_decode_sorted(pdc.sorted_dc, l, iterations=8)
        )(llr2)
        np.testing.assert_array_equal(
            np.asarray(out.hard), np.asarray(out_s.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out.iterations), np.asarray(out_s.iterations)
        )

    def test_zero_iterations(self, pallas_setup):
        code, pdc, llr_s = pallas_setup
        out = bp_decode_pallas(pdc, llr_s, iterations=0, interpret=True)
        assert (np.asarray(out.iterations) == 0).all()
        assert (np.asarray(out.llr_out) == 0).all()


class TestLayeredKernel:
    def test_layered_matches_sorted_layered(self):
        """Fused-kernel layered schedule vs the XLA layered decoder
        (kernel capability of gpu/device/kernel.cpp:54-74)."""
        import dataclasses

        code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
        code = dataclasses.replace(code)
        code.layers = [
            np.arange(0, code.mc, 2, dtype=np.int32),
            np.arange(1, code.mc, 2, dtype=np.int32),
        ]
        pdc = to_pallas_device(code, with_layers=True)
        assert pdc.layer_planes is not None
        assert pdc.layer_planes.shape == (pdc.n_pad, 2)

        rng = np.random.default_rng(11)
        B = 128
        sigma2 = 10 ** (-1.0 / 10)
        y = 1.0 + rng.normal(size=(code.nc, B)) * np.sqrt(sigma2)
        llr = (2 * y / sigma2).astype(np.float32)
        vperm = np.asarray(jax.device_get(pdc.sorted_dc.vn_perm))
        llr_s = jnp.asarray(llr[vperm])

        for early_term in (True, False):
            out_p = bp_decode_pallas(
                pdc, llr_s, iterations=8, early_term=early_term,
                batch_tile=128, interpret=True, layered=True,
            )
            out_s = bp_decode_sorted(
                pdc.sorted_dc, llr_s, iterations=8, early_term=early_term,
                layered=True,
            )
            np.testing.assert_array_equal(
                np.asarray(out_p.hard), np.asarray(out_s.hard)
            )
            np.testing.assert_array_equal(
                np.asarray(out_p.iterations), np.asarray(out_s.iterations)
            )
            np.testing.assert_array_equal(
                np.asarray(out_p.is_codeword), np.asarray(out_s.is_codeword)
            )


class TestBf16Transport:
    def test_bf16_matches_f32_decisions(self, pallas_setup):
        """bf16 message transport: same convergence behaviour as f32 up to
        quantisation — hard decisions must agree on (nearly) all bits and
        codeword flags on (nearly) all frames.  Exact BER impact is
        validated statistically on hardware (benchmarks/parity.py)."""
        code, pdc, llr_s = pallas_setup
        out32 = bp_decode_pallas(
            pdc, llr_s, iterations=10, early_term=False,
            batch_tile=128, interpret=True,
        )
        out16 = bp_decode_pallas(
            pdc, llr_s, iterations=10, early_term=False,
            batch_tile=128, interpret=True, message_dtype="bfloat16",
        )
        mismatch = (
            np.asarray(out16.hard) != np.asarray(out32.hard)
        ).mean()
        assert mismatch < 0.01, mismatch
        agree = (
            np.asarray(out16.is_codeword) == np.asarray(out32.is_codeword)
        ).mean()
        assert agree > 0.95


class TestMxuPermute:
    def test_plan_covers_permutation(self):
        from libldpc_tpu.ops.pallas.layout import _block_permute_plan

        rng = np.random.default_rng(0)
        N = 512
        perm = rng.permutation(N)
        plan, blocks = _block_permute_plan(perm)
        x = rng.normal(size=(N, 4)).astype(np.float32)
        out = np.zeros_like(x)
        for d, entries in enumerate(plan):
            acc = np.zeros((128, 4), np.float32)
            for p, s in entries:
                acc += blocks[p] @ x[s * 128 : (s + 1) * 128]
            out[d * 128 : (d + 1) * 128] = acc
        np.testing.assert_array_equal(out, x[perm])

    @pytest.mark.parametrize("message_dtype", ["float32", "bfloat16"])
    def test_mxu_matches_benes(self, pallas_setup, message_dtype):
        """permute='mxu' (one-hot block matmuls on the MXU) must reproduce
        the Beneš transport exactly — one-hot selection is exact in both
        dtypes."""
        code, pdc, llr_s = pallas_setup
        assert pdc.mxu_blocks_fwd is not None  # the layout is block-local
        out_b = bp_decode_pallas(
            pdc, llr_s, iterations=10, early_term=True,
            batch_tile=128, interpret=True, message_dtype=message_dtype,
        )
        out_m = bp_decode_pallas(
            pdc, llr_s, iterations=10, early_term=True,
            batch_tile=128, interpret=True, message_dtype=message_dtype,
            permute="mxu",
        )
        np.testing.assert_array_equal(
            np.asarray(out_b.hard), np.asarray(out_m.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_b.iterations), np.asarray(out_m.iterations)
        )
        np.testing.assert_allclose(
            np.asarray(out_b.llr_out), np.asarray(out_m.llr_out),
            rtol=1e-5, atol=1e-5,
        )
