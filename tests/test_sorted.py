"""Sorted (degree-class) layout decoder: equivalence with the reference-path
decoder and the golden oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import LDPCCode, make_benchmark_code
from libldpc_tpu.ops.decoder import bp_decode_jit
from libldpc_tpu.ops.device import to_device
from libldpc_tpu.ops.sorted import (
    bp_decode_sorted,
    syndrome_ok_sorted,
    to_sorted_device,
)

from golden import GoldenDecoder


@pytest.fixture(scope="module", params=["regular", "bundled"])
def codes(request, bundled_code):
    if request.param == "regular":
        return make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    return bundled_code


class TestLayout:
    def test_sorted_tables_consistent(self, codes):
        code = codes
        sdc = to_sorted_device(code)
        col_sorted = np.asarray(sdc.col_sorted)
        perm = np.asarray(sdc.perm_c2v)
        vn_perm = np.asarray(sdc.vn_perm)
        vn_inv = np.asarray(sdc.vn_inv)
        assert np.array_equal(vn_inv[vn_perm], np.arange(code.nc))
        # every CN-space slot appears exactly once in the VN-space permutation
        assert np.array_equal(np.sort(perm), np.arange(code.nnz))
        # reconstruct H from the sorted tables: per-edge sorted row labels
        H = np.zeros((code.mc, code.nc), dtype=np.uint8)
        rows_sorted = np.concatenate(
            [
                np.repeat(np.arange(c), d) + off
                for (c, d), off in zip(
                    sdc.cn_classes,
                    np.cumsum([0] + [c for c, _ in sdc.cn_classes[:-1]]),
                )
            ]
        )
        H[rows_sorted, col_sorted] ^= 1
        # compare against original H with both axes permuted
        cn_deg = np.bincount(code.rows, minlength=code.mc)
        cn_perm = np.argsort(cn_deg, kind="stable")
        H_ref = code.H_dense[cn_perm][:, vn_perm]
        assert np.array_equal(H, H_ref)

    def test_class_partition(self, codes):
        sdc = to_sorted_device(codes)
        assert sum(c * d for c, d in sdc.cn_classes) == codes.nnz
        assert sum(c * d for c, d in sdc.vn_classes) == codes.nnz
        assert sum(c for c, _ in sdc.cn_classes) == codes.mc
        assert sum(c for c, _ in sdc.vn_classes) == codes.nc


def _awgn_llrs(code, B, snr_db, seed):
    rng = np.random.default_rng(seed)
    sigma2 = 10 ** (-snr_db / 10)
    llr = np.zeros((code.nc, B), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, B)) * np.sqrt(sigma2)
    llr[code.bit_pos] = 2.0 * y / sigma2
    return llr


class TestDecoderEquivalence:
    @pytest.mark.parametrize("minsum_mode", [False, True])
    def test_sorted_equals_reference_path(self, codes, minsum_mode):
        code = codes
        B = 8
        llr = _awgn_llrs(code, B, -4.0 if code.nc > 200 else 1.0, seed=3)
        sdc = to_sorted_device(code)
        vperm = np.asarray(sdc.vn_perm)
        out_s = jax.jit(
            lambda l: bp_decode_sorted(
                sdc, l, iterations=15, early_term=True, minsum_mode=minsum_mode
            )
        )(jnp.asarray(llr[vperm]))
        out_r = bp_decode_jit(
            to_device(code),
            jnp.asarray(llr),
            iterations=15,
            early_term=True,
            minsum_mode=minsum_mode,
        )
        # un-sort and compare
        vinv = np.asarray(sdc.vn_inv)
        hard_s = np.asarray(out_s.hard)[vinv]
        np.testing.assert_array_equal(hard_s, np.asarray(out_r.hard))
        np.testing.assert_array_equal(
            np.asarray(out_s.iterations), np.asarray(out_r.iterations)
        )
        np.testing.assert_allclose(
            np.asarray(out_s.llr_out)[vinv],
            np.asarray(out_r.llr_out),
            rtol=2e-3,
            atol=2e-3,
        )

    def test_sorted_matches_golden(self):
        code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
        B = 6
        llr = _awgn_llrs(code, B, 2.0, seed=11)
        sdc = to_sorted_device(code)
        vperm = np.asarray(sdc.vn_perm)
        vinv = np.asarray(sdc.vn_inv)
        out = jax.jit(
            lambda l: bp_decode_sorted(sdc, l, iterations=20)
        )(jnp.asarray(llr[vperm]))
        golden = GoldenDecoder(code, iterations=20)
        for b in range(B):
            g_llr, g_hard, g_iters = golden.decode(llr[:, b].astype(np.float64))
            np.testing.assert_array_equal(
                np.asarray(out.hard)[vinv, b].astype(np.uint8), g_hard
            )
            assert int(out.iterations[b]) == g_iters

    def test_layered_sorted_matches_padded(self, small_code):
        import dataclasses

        from libldpc_tpu.ops.device import to_device

        code = dataclasses.replace(small_code)
        code.layers = [
            np.arange(0, code.mc, 2, dtype=np.int32),
            np.arange(1, code.mc, 2, dtype=np.int32),
        ]
        sdc = to_sorted_device(code, with_layers=True)
        d = to_device(code, with_layers=True)
        rng = np.random.default_rng(4)
        sigma2 = 10 ** (-1.0 / 10)
        y = 1.0 + rng.normal(size=(code.nc, 8)) * np.sqrt(sigma2)
        llr = (2 * y / sigma2).astype(np.float32)
        vperm = np.asarray(sdc.vn_perm)
        vinv = np.asarray(sdc.vn_inv)
        out_s = jax.jit(
            lambda l: bp_decode_sorted(sdc, l, iterations=12, layered=True)
        )(jnp.asarray(llr[vperm]))
        out_p = bp_decode_jit(d, jnp.asarray(llr), iterations=12, layered=True)
        np.testing.assert_array_equal(
            np.asarray(out_s.hard)[vinv], np.asarray(out_p.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_s.iterations), np.asarray(out_p.iterations)
        )
        np.testing.assert_allclose(
            np.asarray(out_s.llr_out)[vinv],
            np.asarray(out_p.llr_out),
            rtol=2e-3, atol=2e-3,
        )

    def test_syndrome_sorted(self, small_code):
        code = small_code
        sdc = to_sorted_device(code)
        rng = np.random.default_rng(5)
        u = rng.integers(0, 2, size=(code.G.shape[0], 3)).astype(np.uint8)
        cw = (code.G.T.astype(np.int32) @ u) % 2
        cw_sorted = cw[np.asarray(sdc.vn_perm)]
        ok = np.asarray(syndrome_ok_sorted(sdc, jnp.asarray(cw_sorted.astype(bool))))
        assert ok.all()
        bad = cw_sorted.copy()
        bad[3, 0] ^= 1
        ok2 = np.asarray(syndrome_ok_sorted(sdc, jnp.asarray(bad.astype(bool))))
        assert not ok2[0] and ok2[1] and ok2[2]
