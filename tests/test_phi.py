"""φ-function sum-product CN form (``BP_PHI``) — exact sum-product with
log-domain check products: the tanh form's transcendental count with the
pairwise box-plus's extrinsic dynamic range (no 17.3 cap).  Cross-path
bit-exactness and numeric agreement with both other exact forms are
asserted here."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops import cn_ops
from libldpc_tpu.ops.decoder import bp_decode
from libldpc_tpu.ops.device import PAD_LLR, to_device
from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device


class TestPhiOps:
    def test_get_op_raises(self):
        with pytest.raises(ValueError, match="BP_PHI"):
            cn_ops.get_op("BP_PHI")

    def test_is_phi_mode(self):
        assert cn_ops.is_phi_mode("BP_PHI")
        assert not cn_ops.is_phi_mode("BP_TANH")
        assert not cn_ops.is_phi_mode("BP")
        assert not cn_ops.is_phi_mode(False)

    def test_phi_self_inverse(self):
        x = jnp.asarray(
            np.geomspace(1e-3, 40.0, 64, dtype=np.float32)
        )
        r = np.asarray(cn_ops.phi_out(cn_ops.phi(x)))
        # dphi/dx ~ -1/x near 0 amplifies the forward's ~1e-5 absolute
        # error; everywhere else the round trip is ~1e-5-tight — far
        # beyond the tanh form's hard 17.3 cap
        np.testing.assert_allclose(r, np.asarray(x), rtol=1e-2)
        big = np.asarray(x) > 1.0
        np.testing.assert_allclose(r[big], np.asarray(x)[big], rtol=1e-4)

    def test_matches_boxplus_numerically(self):
        rng = np.random.default_rng(0)
        M = jnp.asarray(rng.normal(size=(64, 6, 4)).astype(np.float32) * 3.0)
        out_p = np.asarray(cn_ops.exclusion_combine_phi(M))
        out_b = np.asarray(cn_ops.exclusion_combine(M, cn_ops.boxplus))
        np.testing.assert_allclose(out_p, out_b, rtol=2e-4, atol=2e-4)

    def test_dynamic_range_beyond_tanh_cap(self):
        """Strong inputs produce extrinsics far above the tanh form's
        ~17.3 cap — the whole point of the φ form."""
        M = jnp.full((4, 6, 2), 40.0, jnp.float32)
        out = np.asarray(cn_ops.exclusion_combine_phi(M))
        assert np.all(np.isfinite(out))
        assert np.all(out > 30.0), out.min()
        out_t = np.asarray(cn_ops.exclusion_combine_tanh(M))
        assert np.all(out_t < 18.0)  # tanh caps; phi does not

    def test_pad_is_identity(self):
        rng = np.random.default_rng(1)
        real = rng.normal(size=(32, 4, 2)).astype(np.float32) * 2.0
        M = np.full((32, 6, 2), PAD_LLR, np.float32)
        M[:, :4] = real
        out_pad = np.asarray(cn_ops.exclusion_combine_phi(jnp.asarray(M)))
        out_nopad = np.asarray(
            cn_ops.exclusion_combine_phi(jnp.asarray(real))
        )
        np.testing.assert_array_equal(out_pad[:, :4], out_nopad)

    def test_zero_input_erases_neighbours(self):
        """A zero-LLR input (e.g. a punctured bit) must force its
        neighbours' extrinsics to ~0 (box-plus gives exactly 0; the
        φ forward's 1e-6 input floor leaves ~3e-6) and stay finite."""
        M = np.full((2, 4, 1), 5.0, np.float32)
        M[:, 1] = 0.0
        out = np.asarray(cn_ops.exclusion_combine_phi(jnp.asarray(M)))
        assert np.all(np.isfinite(out[:, [0, 2, 3]]))
        np.testing.assert_allclose(out[:, [0, 2, 3]], 0.0, atol=1e-5)
        # the zero edge's own extrinsic combines the others normally
        assert np.all(out[:, 1] > 1.0)

    def test_degree_one_matches_pairwise_semantics(self):
        M = jnp.asarray(np.random.default_rng(2)
                        .normal(size=(8, 1, 2)).astype(np.float32))
        out = np.asarray(cn_ops.exclusion_combine_phi(M))
        np.testing.assert_array_equal(
            out, np.full((8, 1, 2), PAD_LLR, np.float32)
        )


@pytest.fixture(scope="module")
def phi_setup():
    code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    rng = np.random.default_rng(3)
    B = 64
    sigma2 = 10 ** (-1.0 / 10)
    llr = np.zeros((code.nc, B), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, B)) * np.sqrt(sigma2)
    llr[code.bit_pos] = 2.0 * y / sigma2
    return code, llr


class TestPhiDecoders:
    def test_padded_equals_sorted_bitexact(self, phi_setup):
        code, llr = phi_setup
        dcode = to_device(code)
        sdc = to_sorted_device(code)
        out_p = bp_decode(
            dcode, jnp.asarray(llr), iterations=8, early_term=True,
            minsum_mode="BP_PHI",
        )
        vp = np.asarray(jax.device_get(sdc.vn_perm))
        out_s = bp_decode_sorted(
            sdc, jnp.asarray(llr[vp]), iterations=8, early_term=True,
            minsum_mode="BP_PHI",
        )
        inv = np.empty_like(vp)
        inv[vp] = np.arange(vp.size)
        np.testing.assert_array_equal(
            np.asarray(out_p.hard), np.asarray(out_s.hard)[inv]
        )
        np.testing.assert_array_equal(
            np.asarray(out_p.iterations), np.asarray(out_s.iterations)
        )

    def test_fused_kernels_match_sorted(self, phi_setup):
        from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
        from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
        from libldpc_tpu.ops.pallas.layout import to_pallas_device

        code, llr = phi_setup
        pdc = to_pallas_device(code, with_clos=True)
        sdc = pdc.sorted_dc
        vp = np.asarray(jax.device_get(sdc.vn_perm))
        llr_s = jnp.asarray(llr[vp])
        out_s = bp_decode_sorted(
            sdc, llr_s, iterations=8, early_term=True, minsum_mode="BP_PHI"
        )
        out_f = bp_decode_pallas(
            pdc, llr_s, iterations=8, early_term=True,
            minsum_mode="BP_PHI", batch_tile=64, interpret=True,
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
            minsum_mode="BP_PHI", interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out_l.hard), np.asarray(out_s.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_l.iterations), np.asarray(out_s.iterations)
        )

    def test_statistically_matches_bp(self, phi_setup):
        code, llr = phi_setup
        sdc = to_sorted_device(code)
        vp = np.asarray(jax.device_get(sdc.vn_perm))
        llr_s = jnp.asarray(llr[vp])
        out_p = bp_decode_sorted(
            sdc, llr_s, iterations=30, early_term=True,
            minsum_mode="BP_PHI",
        )
        out_b = bp_decode_sorted(
            sdc, llr_s, iterations=30, early_term=True, minsum_mode="BP"
        )
        agree = (
            np.asarray(out_p.is_codeword) == np.asarray(out_b.is_codeword)
        ).mean()
        assert agree > 0.9, f"codeword-flag agreement {agree}"

    def test_streaming_drain_equivalence(self, phi_setup):
        """In-kernel streaming with BP_PHI drains to the batch decoder's
        exact counts (interpret mode)."""
        from libldpc_tpu.ops.channel import simulate_channel
        from libldpc_tpu.ops.pallas.layout import to_pallas_device
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_pallas_step,
        )
        from libldpc_tpu.utils.params import DecoderParams

        code, _ = phi_setup
        pdc = to_pallas_device(code)
        B = 32
        ch = simulate_channel(
            pdc, "AWGN", jax.random.PRNGKey(3), B, np.float32(-1.0)
        )
        iters = 9
        out = bp_decode_sorted(
            pdc.sorted_dc, ch.llr, iterations=iters, early_term=True,
            minsum_mode="BP_PHI",
        )
        bit_pos = np.asarray(pdc.sorted_dc.bit_pos)
        errs = (
            np.asarray(out.hard)[bit_pos]
            != np.asarray(ch.codeword)[bit_pos]
        ).sum(axis=0)
        want = np.array(
            [errs.sum(), (errs > 0).sum(), B,
             np.asarray(out.iterations).sum()], dtype=np.int64,
        )
        init_fn, step_fn = make_streaming_pallas_step(
            pdc, "AWGN", DecoderParams(iterations=iters, type="BP_PHI"),
            B, chunk_iters=4, interpret=True, batch_tile=B,
        )
        state = init_fn()
        state = state._replace(
            llr_in=ch.llr,
            codeword=ch.codeword.astype(jnp.int32),
            done8=jnp.zeros((8, B), jnp.int32),
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

    def test_driver_end_to_end(self, phi_setup):
        from libldpc_tpu.sim.driver import Simulator
        from libldpc_tpu.utils.params import (
            ChannelParams, DecoderParams, SimulationParams,
        )

        code, _ = phi_setup
        res = Simulator(
            code,
            DecoderParams(iterations=10, type="BP_PHI"),
            ChannelParams(type="AWGN", seed=1, x_range=(2.0, 2.1, 0.5)),
            SimulationParams(batch_size=64, max_frames=128, fec=10**9),
            verbose=False,
        ).start()
        assert res.frames[0] == 128
        assert res.avg_iter[0] > 0


def test_phi_layered_schedule(phi_setup):
    """The layered (serial) schedule composes with the φ CN form: sorted
    layered vs padded layered agree bit-for-bit."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.sorted import to_sorted_device

    code, llr = phi_setup
    # give the code layers (two halves of the checks)
    half = code.mc // 2
    code_l = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    code_l.layers = [list(range(half)), list(range(half, code_l.mc))]
    sdc = to_sorted_device(code_l, with_layers=True)
    vp = np.asarray(jax.device_get(sdc.vn_perm))
    out_flood = bp_decode_sorted(
        sdc, jnp.asarray(llr[vp]), iterations=8, early_term=True,
        minsum_mode="BP_PHI",
    )
    out_lyr = bp_decode_sorted(
        sdc, jnp.asarray(llr[vp]), iterations=8, early_term=True,
        minsum_mode="BP_PHI", layered=True,
    )
    # layered converges at least as fast on average (serial updates)
    assert (
        np.asarray(out_lyr.iterations).mean()
        <= np.asarray(out_flood.iterations).mean() + 0.5
    )
    # both decode; flags sane
    assert np.asarray(out_lyr.is_codeword).any()
