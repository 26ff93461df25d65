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


class TestInt8Quantized:
    """int8 quantized min-sum: the kernel must match an exact integer
    golden — min-sum is scale-invariant, so after input quantisation the
    only approximations are the +-127 saturation and the NMS re-rounding,
    both mirrored here bit-for-bit."""

    @staticmethod
    def _golden(code, llr, iters, scale, nms_scale=None, early_term=True,
                oms_offset=None):
        rows = code.rows.astype(np.int64)
        cols = code.cols.astype(np.int64)
        B = llr.shape[1]
        clip = lambda q: np.clip(q, -127.0, 127.0)
        lv2c = clip(np.round(llr / scale))[cols]  # integer messages [nnz, B]
        done = np.zeros(B, bool)
        iters_c = np.zeros(B, np.int32)
        hard = np.zeros((code.nc, B), np.uint8)
        is_cw = np.zeros(B, bool)
        check_edges = [np.nonzero(rows == r)[0] for r in range(code.mc)]
        var_edges = [np.nonzero(cols == v)[0] for v in range(code.nc)]
        for _ in range(iters):
            lc2v = np.zeros_like(lv2c)
            for e_idx in check_edges:
                M = lv2c[e_idx]  # [deg, B]
                for j in range(len(e_idx)):
                    others = np.delete(M, j, axis=0)
                    sgn = np.prod(np.where(others < 0, -1.0, 1.0), axis=0)
                    lc2v[e_idx[j]] = sgn * np.abs(others).min(axis=0)
            if nms_scale is not None:
                lc2v = clip(np.round(nms_scale * lc2v))
            if oms_offset is not None:
                # OMS offset in LLR units shrinks by offset/scale on the
                # lattice, then re-rounds (kernel: cn_postprocess + to_store)
                lc2v = clip(np.round(
                    np.sign(lc2v)
                    * np.maximum(np.abs(lc2v) - oms_offset / scale, 0.0)
                ))
            post = np.zeros((code.nc, B))
            for v, e_idx in enumerate(var_edges):
                post[v] = clip(np.round(
                    (llr[v] + scale * lc2v[e_idx].sum(axis=0)) / scale
                ))
            hard_now = (post <= 0).astype(np.uint8)
            lv2c_new = clip(post[cols] - lc2v)
            synd_ok = np.ones(B, bool)
            for e_idx in check_edges:
                synd_ok &= hard_now[cols[e_idx]].sum(axis=0) % 2 == 0
            if early_term:
                newly = ~done & synd_ok
                iters_c += (~done & ~newly).astype(np.int32)
                keep = done[None, :]
                hard = np.where(keep, hard, hard_now)
                lv2c = np.where(keep, lv2c, lv2c_new)
                is_cw = np.where(done, is_cw, synd_ok)
                done = done | newly
                if done.all():
                    break
            else:
                hard, lv2c, is_cw = hard_now, lv2c_new, synd_ok
        if not early_term:
            iters_c[:] = iters
        return hard, iters_c, is_cw

    @pytest.mark.parametrize("early_term", [True, False])
    @pytest.mark.parametrize("mode,nms", [("BP_MS", None),
                                          (("BP_NMS", 0.75, 0.15), 0.75)])
    def test_matches_integer_golden(self, pallas_setup, early_term, mode,
                                    nms):
        code, pdc, llr_s = pallas_setup
        scale = 0.1875
        out = bp_decode_pallas(
            pdc, llr_s, iterations=8, early_term=early_term,
            minsum_mode=mode, batch_tile=128, interpret=True,
            message_dtype="int8", permute="mxu", quant_scale=scale,
        )
        llr_orig = np.zeros(llr_s.shape, np.float32)
        vn_perm = np.asarray(pdc.sorted_dc.vn_perm)
        llr_orig[vn_perm] = np.asarray(llr_s)
        hard_g, iters_g, iscw_g = self._golden(
            code, llr_orig, 8, scale, nms_scale=nms, early_term=early_term,
        )
        hard_k = np.zeros_like(hard_g)
        hard_k[vn_perm] = np.asarray(out.hard).astype(np.uint8)
        np.testing.assert_array_equal(hard_k, hard_g)
        np.testing.assert_array_equal(np.asarray(out.iterations), iters_g)
        np.testing.assert_array_equal(np.asarray(out.is_codeword), iscw_g)

    def test_int8_requires_minsum_and_mxu(self, pallas_setup):
        code, pdc, llr_s = pallas_setup
        with pytest.raises(ValueError, match="min-sum"):
            bp_decode_pallas(
                pdc, llr_s, iterations=4, minsum_mode="BP",
                message_dtype="int8", permute="mxu", interpret=True,
            )
        with pytest.raises(ValueError, match="MXU"):
            bp_decode_pallas(
                pdc, llr_s, iterations=4, minsum_mode="BP_MS",
                message_dtype="int8", permute="benes", interpret=True,
            )

    def test_int8_decodes_clean_frames(self, pallas_setup):
        """At a clean operating point the quantized decoder converges to
        codewords like the f32 decoder (end-to-end sanity beyond the
        bit-exact golden)."""
        code, pdc, _ = pallas_setup
        rng = np.random.default_rng(5)
        B = 128
        sigma2 = 10 ** (-3.0 / 10)
        llr = np.zeros((code.nc, B), dtype=np.float32)
        y = 1.0 + rng.normal(size=(code.nct, B)) * np.sqrt(sigma2)
        llr[code.bit_pos] = (2.0 * y / sigma2).astype(np.float32)
        llr_s = jnp.asarray(llr[np.asarray(pdc.sorted_dc.vn_perm)])
        out = bp_decode_pallas(
            pdc, llr_s, iterations=20, minsum_mode=("BP_NMS", 0.75, 0.15),
            batch_tile=128, interpret=True, message_dtype="int8",
            permute="mxu",
        )
        assert np.asarray(out.is_codeword).mean() > 0.9
