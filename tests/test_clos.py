"""Clos three-stage permutation factorisation: host-level exactness and
interpret-mode decoder equivalence for the lane-major kernel's MXU
transport (any permutation, no block-locality requirement)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops.pallas.clos import (
    BLOCK, apply_clos_numpy, build_clos,
)
from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
from libldpc_tpu.ops.sorted import bp_decode_sorted


class TestClosFactorisation:
    @pytest.mark.parametrize("n,seed", [(128, 0), (256, 1), (1024, 2),
                                        (4096, 3)])
    def test_random_permutation_roundtrip(self, n, seed):
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        net = build_clos(perm)
        x = rng.normal(size=(n, 3)).astype(np.float32)
        np.testing.assert_array_equal(apply_clos_numpy(net, x), x[perm])
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        np.testing.assert_array_equal(
            apply_clos_numpy(net, x, reverse=True), x[inv]
        )

    def test_identity(self):
        net = build_clos(np.arange(512))
        x = np.random.default_rng(0).normal(size=(512, 2)).astype(np.float32)
        np.testing.assert_array_equal(apply_clos_numpy(net, x), x)

    @pytest.mark.parametrize("block", [256, 512])
    def test_larger_switch_sizes(self, block):
        rng = np.random.default_rng(block)
        perm = rng.permutation(4096)
        net = build_clos(perm, block=block)
        assert net.p1.shape == (4096 // block, block, block)
        assert all(int(d) % block == 0 for d in net.mid_dists)
        x = rng.normal(size=(4096, 2)).astype(np.float32)
        np.testing.assert_array_equal(apply_clos_numpy(net, x), x[perm])
        inv = np.empty(4096, dtype=np.int64)
        inv[perm] = np.arange(4096)
        np.testing.assert_array_equal(
            apply_clos_numpy(net, x, reverse=True), x[inv]
        )

    def test_rejects_bad_block(self):
        with pytest.raises(ValueError):
            build_clos(np.arange(512), block=192)

    def test_stage_matrices_are_one_hot_bijections(self):
        perm = np.random.default_rng(5).permutation(1024)
        net = build_clos(perm)
        for stack in (net.p1, net.p3):
            assert stack.shape == (8, BLOCK, BLOCK)
            # each row and each column holds exactly one 1 (permutation)
            np.testing.assert_array_equal(stack.sum(axis=1), 1.0)
            np.testing.assert_array_equal(stack.sum(axis=2), 1.0)

    def test_mid_distances_are_tile_granular(self):
        net = build_clos(np.random.default_rng(6).permutation(2048))
        assert all(int(d) % BLOCK == 0 for d in net.mid_dists)
        assert len(net.mid_dists) == 2 * int(np.log2(2048 // BLOCK)) - 1

    def test_rejects_unaligned_size(self):
        with pytest.raises(ValueError):
            build_clos(np.arange(100))


@pytest.fixture(scope="module")
def clos_setup():
    code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    ldc_b = to_lanes_device(code, transport="benes")
    ldc_c = to_lanes_device(code, transport="clos")
    rng = np.random.default_rng(3)
    B = 32
    sigma2 = 10 ** (-1.0 / 10)
    llr = np.zeros((code.nc, B), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, B)) * np.sqrt(sigma2)
    llr[code.bit_pos] = 2.0 * y / sigma2
    llr_s = jnp.asarray(llr[np.asarray(ldc_b.sorted_dc.vn_perm)])
    return code, ldc_b, ldc_c, llr_s


class TestLanesClosDecoder:
    @pytest.mark.parametrize("early_term", [True, False])
    def test_clos_f32_matches_benes_bitexact(self, clos_setup, early_term):
        """Same kernel, transports swapped: outputs must be bit-identical
        (the Clos matmuls run at HIGHEST precision for f32 messages)."""
        code, ldc_b, ldc_c, llr_s = clos_setup
        out_b = bp_decode_lanes(
            ldc_b, llr_s, iterations=8, early_term=early_term,
            interpret=True,
        )
        out_c = bp_decode_lanes(
            ldc_c, llr_s, iterations=8, early_term=early_term,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out_c.llr_out), np.asarray(out_b.llr_out)
        )
        np.testing.assert_array_equal(
            np.asarray(out_c.iterations), np.asarray(out_b.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(out_c.is_codeword), np.asarray(out_b.is_codeword)
        )

    def test_clos_f32_matches_sorted(self, clos_setup):
        code, ldc_b, ldc_c, llr_s = clos_setup
        out_c = bp_decode_lanes(
            ldc_c, llr_s, iterations=8, early_term=True, interpret=True
        )
        out_s = bp_decode_sorted(
            ldc_c.sorted_dc, llr_s, iterations=8, early_term=True
        )
        np.testing.assert_array_equal(
            np.asarray(out_c.hard), np.asarray(out_s.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_c.iterations), np.asarray(out_s.iterations)
        )

    def test_clos_bf16_matches_fused_bf16(self, clos_setup):
        """bf16 lane-major (Clos transport) against bf16 edge-major
        (packed-Beneš transport): identical message quantisation points,
        so hard decisions and iteration counts must agree bit-for-bit."""
        from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
        from libldpc_tpu.ops.pallas.layout import to_pallas_device

        code, ldc_b, ldc_c, llr_s = clos_setup
        out_l = bp_decode_lanes(
            ldc_c, llr_s, iterations=8, early_term=True,
            message_dtype="bfloat16", interpret=True,
        )
        pdc = to_pallas_device(code)
        out_f = bp_decode_pallas(
            pdc, llr_s, iterations=8, early_term=True,
            batch_tile=32, interpret=True, message_dtype="bfloat16",
        )
        np.testing.assert_array_equal(
            np.asarray(out_l.hard), np.asarray(out_f.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_l.iterations), np.asarray(out_f.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(out_l.is_codeword), np.asarray(out_f.is_codeword)
        )

    def test_bf16_requires_clos(self, clos_setup):
        code, ldc_b, ldc_c, llr_s = clos_setup
        with pytest.raises(ValueError, match="clos"):
            bp_decode_lanes(
                ldc_b, llr_s, iterations=2, message_dtype="bfloat16",
                interpret=True,
            )

    def test_minsum_clos(self, clos_setup):
        code, ldc_b, ldc_c, llr_s = clos_setup
        out_c = bp_decode_lanes(
            ldc_c, llr_s, iterations=6, minsum_mode=True, interpret=True
        )
        out_s = bp_decode_sorted(
            ldc_c.sorted_dc, llr_s, iterations=6, minsum_mode=True
        )
        np.testing.assert_array_equal(
            np.asarray(out_c.hard), np.asarray(out_s.hard)
        )
