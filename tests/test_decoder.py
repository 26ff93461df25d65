"""Decoder correctness: batched TPU decoder vs the scalar golden oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import LDPCCode, make_benchmark_code
from libldpc_tpu.ops import cn_ops
from libldpc_tpu.ops.decoder import bp_decode_jit, syndrome_ok
from libldpc_tpu.ops.device import to_device

from golden import GoldenDecoder, jacobian


class TestCnOps:
    def test_boxplus_matches_scalar_jacobian(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=256) * 5
        y = rng.normal(size=256) * 5
        ref = np.array([jacobian(a, b) for a, b in zip(x, y)])
        got = np.asarray(cn_ops.boxplus(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_boxplus_identity(self):
        from libldpc_tpu.ops.device import PAD_LLR

        x = jnp.asarray(np.linspace(-30, 30, 101), dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(cn_ops.boxplus(x, jnp.float32(PAD_LLR))), np.asarray(x)
        )
        np.testing.assert_array_equal(
            np.asarray(cn_ops.minsum(x, jnp.float32(PAD_LLR))), np.asarray(x)
        )

    def test_exclusion_combine(self):
        rng = np.random.default_rng(1)
        M = rng.normal(size=(4, 5, 3)) * 3
        out = np.asarray(cn_ops.exclusion_combine(jnp.asarray(M), cn_ops.boxplus))
        for i in range(4):
            for j in range(5):
                acc = None
                for k in range(5):
                    if k == j:
                        continue
                    acc = M[i, k] if acc is None else np.array(
                        [jacobian(a, b) for a, b in zip(acc, M[i, k])]
                    )
                np.testing.assert_allclose(out[i, j], acc, rtol=1e-4, atol=1e-5)


def _decode_batch_vs_golden(code, minsum_mode, iterations, early_term, snr_db=2.0, B=8):
    rng = np.random.default_rng(42)
    dcode = to_device(code)
    sigma2 = 10 ** (-snr_db / 10)
    # all-zero codeword, BPSK +1, AWGN
    y = 1.0 + rng.normal(size=(code.nc, B)) * np.sqrt(sigma2)
    llr = (2.0 * y / sigma2).astype(np.float32)
    out = bp_decode_jit(
        dcode,
        jnp.asarray(llr),
        iterations=iterations,
        early_term=early_term,
        minsum_mode=minsum_mode,
    )
    golden = GoldenDecoder(
        code, iterations=iterations, early_term=early_term, minsum_mode=minsum_mode
    )
    for b in range(B):
        g_llr, g_hard, g_iters = golden.decode(llr[:, b].astype(np.float64))
        np.testing.assert_array_equal(
            np.asarray(out.hard[:, b]).astype(np.uint8), g_hard,
            err_msg=f"frame {b} hard decisions diverge",
        )
        assert int(out.iterations[b]) == g_iters, f"frame {b} iteration count"
        np.testing.assert_allclose(
            np.asarray(out.llr_out[:, b]), g_llr, rtol=2e-3, atol=2e-3,
            err_msg=f"frame {b} output LLRs diverge",
        )


class TestFloodingDecoder:
    @pytest.fixture(scope="class")
    def code(self):
        return make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)

    def test_bp_matches_golden(self, code):
        _decode_batch_vs_golden(code, minsum_mode=False, iterations=20, early_term=True)

    def test_minsum_matches_golden(self, code):
        _decode_batch_vs_golden(code, minsum_mode=True, iterations=20, early_term=True)

    def test_no_early_term_iteration_count(self, code):
        rng = np.random.default_rng(3)
        dcode = to_device(code)
        llr = rng.normal(size=(code.nc, 4)).astype(np.float32)
        out = bp_decode_jit(dcode, jnp.asarray(llr), iterations=7, early_term=False)
        assert (np.asarray(out.iterations) == 7).all()

    def test_zero_iterations(self, code):
        dcode = to_device(code)
        llr = jnp.ones((code.nc, 2), dtype=jnp.float32)
        out = bp_decode_jit(dcode, llr, iterations=0)
        assert (np.asarray(out.iterations) == 0).all()
        assert (np.asarray(out.llr_out) == 0).all()

    def test_clean_input_zero_iterations_reported(self, code):
        # a noise-free codeword converges in the 1st iteration and must
        # report 0 iterations (break-before-increment, decoder.cpp:66-77)
        dcode = to_device(code)
        llr = jnp.full((code.nc, 3), 8.0, dtype=jnp.float32)  # strong all-zero cw
        out = bp_decode_jit(dcode, llr, iterations=50, early_term=True)
        assert (np.asarray(out.iterations) == 0).all()
        assert (~np.asarray(out.hard)).all()
        assert np.asarray(out.is_codeword).all()

    def test_irregular_code_with_puncture(self, bundled_code):
        # smaller batch on the real bundled (irregular, punctured) code
        code = bundled_code
        rng = np.random.default_rng(0)
        dcode = to_device(code)
        sigma2 = 10 ** (-3.0 / 10)
        llr = np.zeros((code.nc, 2), dtype=np.float32)
        y = 1.0 + rng.normal(size=(code.nct, 2)) * np.sqrt(sigma2)
        llr[code.bit_pos] = 2.0 * y / sigma2
        out = bp_decode_jit(dcode, jnp.asarray(llr), iterations=10)
        golden = GoldenDecoder(code, iterations=10)
        for b in range(2):
            g_llr, g_hard, g_iters = golden.decode(llr[:, b].astype(np.float64))
            np.testing.assert_array_equal(
                np.asarray(out.hard[:, b]).astype(np.uint8), g_hard
            )
            assert int(out.iterations[b]) == g_iters


class TestLinearApprox:
    """BP_LIN: the GPU stack's piecewise-linear CN correction
    (``CN_APPROX_LIN``, ``gpu/ldpc/ldpc.cpp:232-259``) as a runtime type."""

    def test_lin_approx_matches_reference_pieces(self):
        from libldpc_tpu.ops.cn_ops import _lin_approx

        pts = np.array([0.0, 0.5, 1.0, 2.0, 2.625, 5.0])
        got = np.asarray(_lin_approx(jnp.asarray(pts)))
        want = []
        for L in pts:
            a = abs(L)
            if a < 1.0:
                want.append(-0.375 * a + 0.6825)
            elif a < 2.625:
                want.append(-0.1875 * a + 0.5)
            else:
                want.append(0.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_bp_lin_close_to_bp(self):
        from libldpc_tpu.ops.cn_ops import boxplus, boxplus_linear

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=512) * 4)
        y = jnp.asarray(rng.normal(size=512) * 4)
        exact = np.asarray(boxplus(x, y))
        lin = np.asarray(boxplus_linear(x, y))
        assert np.abs(exact - lin).max() < 0.1

    def test_bp_lin_decodes(self, small_code):
        code = small_code
        dcode = to_device(code)
        rng = np.random.default_rng(4)
        sigma2 = 10 ** (-4.0 / 10)
        y = 1.0 + rng.normal(size=(code.nc, 8)) * np.sqrt(sigma2)
        llr = jnp.asarray((2 * y / sigma2).astype(np.float32))
        out = bp_decode_jit(dcode, llr, iterations=30, minsum_mode="BP_LIN")
        assert np.asarray(out.is_codeword).all()
        assert (~np.asarray(out.hard)).all()  # all-zero codeword recovered


class TestNormalizedOffsetMinsum:
    """BP_NMS / BP_OMS: standard hardware min-sum corrections (not in the
    reference; min-sum exclusion + output scale/offset)."""

    @pytest.mark.parametrize("mode", [("BP_NMS", 0.75, 0.0), ("BP_OMS", 1.0, 0.15)])
    def test_decodes_and_differs_from_plain_minsum(self, small_code, mode):
        code = small_code
        dcode = to_device(code)
        rng = np.random.default_rng(8)
        sigma2 = 10 ** (-3.0 / 10)
        y = 1.0 + rng.normal(size=(code.nc, 8)) * np.sqrt(sigma2)
        llr = jnp.asarray((2 * y / sigma2).astype(np.float32))
        out = bp_decode_jit(dcode, llr, iterations=30, minsum_mode=mode)
        assert np.asarray(out.is_codeword).all()
        out_ms = bp_decode_jit(dcode, llr, iterations=30, minsum_mode="BP_MS")
        assert not np.allclose(
            np.asarray(out.llr_out), np.asarray(out_ms.llr_out)
        )

    def test_nms_scaling_math(self):
        from libldpc_tpu.ops.cn_ops import cn_postprocess

        x = jnp.asarray([-2.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(cn_postprocess(x, ("BP_NMS", 0.5, 0.0))), [-1.0, 1.5]
        )
        np.testing.assert_allclose(
            np.asarray(cn_postprocess(x, ("BP_OMS", 1.0, 0.5))), [-1.5, 2.5]
        )
        np.testing.assert_allclose(
            np.asarray(cn_postprocess(x, ("BP_OMS", 1.0, 5.0))), [-0.0, 0.0]
        )

    def test_nms_runs_on_bundled_code(self, bundled_code):
        # behavioural check at one waterfall point with a shared channel
        # draw.  (No superiority assertion: the classic alpha=0.75 NMS gain
        # applies to high-degree checks; this code's checks have degree 3-4,
        # where plain min-sum is already near-exact.)
        import jax

        from libldpc_tpu.ops.channel import awgn_channel

        code = bundled_code
        dcode = to_device(code)
        ch = awgn_channel(dcode, jax.random.PRNGKey(3), 256, jnp.float32(-5.0))
        tx = code.bit_pos
        cw = np.asarray(ch.codeword)
        for mode in [("BP_NMS", 0.9, 0.0), ("BP_OMS", 1.0, 0.1)]:
            out = bp_decode_jit(dcode, ch.llr, iterations=30, minsum_mode=mode)
            hard = np.asarray(out.hard).astype(np.uint8)
            fe = int(((hard[tx] != cw[tx]).sum(0) > 0).sum())
            assert 0 < fe < 256  # decodes some, not all, at -5 dB


class TestSyndrome:
    def test_syndrome_ok(self, small_code):
        code = small_code
        dcode = to_device(code)
        rng = np.random.default_rng(5)
        u = rng.integers(0, 2, size=(code.G.shape[0], 3)).astype(np.uint8)
        cw = (code.G.T.astype(np.int32) @ u) % 2  # [nc, 3]
        ok = np.asarray(syndrome_ok(dcode, jnp.asarray(cw.astype(bool))))
        assert ok.all()
        bad = cw.copy()
        bad[0, 1] ^= 1
        ok2 = np.asarray(syndrome_ok(dcode, jnp.asarray(bad.astype(bool))))
        assert ok2[0] and not ok2[1] and ok2[2]


class TestLayeredDecoder:
    def test_layered_single_layer_equals_flooding(self, small_code):
        code = small_code
        import dataclasses

        code2 = dataclasses.replace(code)
        # two-layer split: even rows then odd rows
        code2.layers = [
            np.arange(0, code.mc, 2, dtype=np.int32),
            np.arange(1, code.mc, 2, dtype=np.int32),
        ]
        dcode = to_device(code2, with_layers=True)
        rng = np.random.default_rng(9)
        sigma2 = 10 ** (-2.0 / 10)
        y = 1.0 + rng.normal(size=(code.nc, 4)) * np.sqrt(sigma2)
        llr = jnp.asarray((2 * y / sigma2).astype(np.float32))
        out = bp_decode_jit(dcode, llr, iterations=30, layered=True)
        # layered BP on a valid LLR input should still decode to a codeword
        assert np.asarray(out.is_codeword).all()
        # and converge at least as fast as flooding on average
        flood = bp_decode_jit(to_device(code), llr, iterations=30)
        assert np.asarray(out.iterations).mean() <= np.asarray(
            flood.iterations
        ).mean() + 1


class TestDegree1Checks:
    """Pinned semantics for degree-1 check nodes.

    A check row with a single nonzero pins its variable to 0; the extrinsic
    message of a degree-1 CN is the hard "bit is 0" message ``PAD_LLR``
    (`ops/cn_ops.py` exclusion_combine, `ops/pallas/decode_fused.py`
    cn_exclusion).  The reference instead reads uninitialised scratch for
    this case (``src/decoding/decoder.cpp:31-44`` with ``cw == 1`` reads
    ``mExMsgF[cw-2]``), so there is nothing to be bit-compatible with — all
    three device paths here must agree with each other and with the
    mathematically correct peeling behaviour.
    """

    def _code(self):
        H = np.array(
            [
                [1, 1, 0, 1, 0],
                [0, 1, 1, 0, 1],
                [1, 0, 0, 0, 0],  # degree-1 check pinning bit 0
                [0, 0, 1, 1, 1],
            ],
            dtype=np.uint8,
        )
        return LDPCCode.from_dense(H)

    def test_all_paths_agree_and_pin_bit(self):
        from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
        from libldpc_tpu.ops.pallas.layout import to_pallas_device
        from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device

        code = self._code()
        rng = np.random.default_rng(5)
        B = 128
        llr = rng.normal(size=(code.nc, B)).astype(np.float32) * 2.0
        # channel weakly votes bit 0 -> 1; the degree-1 check must win
        llr[0] = -0.5

        for minsum in (False, True):
            dout = bp_decode_jit(
                to_device(code), jnp.asarray(llr), iterations=6,
                early_term=False, minsum_mode=minsum,
            )
            hard_padded = np.asarray(dout.hard)

            sdc = to_sorted_device(code)
            vn_perm = np.asarray(sdc.vn_perm)
            llr_s = jnp.asarray(llr[vn_perm])
            sout = bp_decode_sorted(
                sdc, llr_s, iterations=6, early_term=False,
                minsum_mode=minsum,
            )
            hard_sorted = np.empty_like(hard_padded)
            hard_sorted[vn_perm] = np.asarray(sout.hard)

            pdc = to_pallas_device(code)
            pout = bp_decode_pallas(
                pdc, llr_s, iterations=6, early_term=False,
                minsum_mode=minsum, batch_tile=128, interpret=True,
            )
            hard_pallas = np.empty_like(hard_padded)
            hard_pallas[vn_perm] = np.asarray(pout.hard)

            np.testing.assert_array_equal(hard_padded, hard_sorted)
            np.testing.assert_array_equal(hard_padded, hard_pallas)
            # the pinned bit decodes to 0 in every frame despite the
            # channel voting 1
            assert not hard_padded[0].any()

    def test_fuzz_codes_with_degree1_checks(self):
        """Random irregular codes with planted degree-1 rows: padded and
        sorted paths agree bit-for-bit (incl. iteration counts)."""
        from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device

        for trial in range(3):
            rng = np.random.default_rng(900 + trial)
            while True:
                H = (rng.random((12, 24)) < 0.15).astype(np.uint8)
                for v in range(24):
                    if not H[:, v].any():
                        H[rng.integers(0, 12), v] = 1
                # plant two degree-1 checks
                for i in (3, 7):
                    H[i] = 0
                    H[i, rng.integers(0, 24)] = 1
                if (H.sum(1) >= 1).all():
                    break
            code = LDPCCode.from_dense(H)
            B = 32
            llr = rng.normal(size=(code.nc, B)).astype(np.float32) * 2.0
            dout = bp_decode_jit(
                to_device(code), jnp.asarray(llr), iterations=8,
                early_term=True,
            )
            sdc = to_sorted_device(code)
            vn_perm = np.asarray(sdc.vn_perm)
            sout = bp_decode_sorted(
                sdc, jnp.asarray(llr[vn_perm]), iterations=8, early_term=True,
            )
            hard_sorted = np.empty((code.nc, B), dtype=bool)
            hard_sorted[vn_perm] = np.asarray(sout.hard)
            np.testing.assert_array_equal(np.asarray(dout.hard), hard_sorted)
            np.testing.assert_array_equal(
                np.asarray(dout.iterations), np.asarray(sout.iterations)
            )
