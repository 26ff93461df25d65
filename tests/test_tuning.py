"""Gradient-based NMS tuning: differentiability and learning progress."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops.channel import awgn_channel
from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device
from libldpc_tpu.ops.tuning import (
    decode_soft, decode_soft_oms, soft_ber, tune_nms_scales,
    tune_oms_offsets,
)


@pytest.fixture(scope="module")
def setup():
    code = make_benchmark_code(120, dv=3, dc=6, seed=2, with_G=True)
    return code, to_sorted_device(code)


class TestDecodeSoft:
    def test_matches_nms_decoder_at_constant_scale(self, setup):
        code, sdc = setup
        ch = awgn_channel(sdc, jax.random.PRNGKey(0), 16, jnp.float32(1.0))
        T = 6
        out_soft = decode_soft(sdc, ch.llr, jnp.full((T,), 0.8, jnp.float32))
        out_ref = bp_decode_sorted(
            sdc, ch.llr, iterations=T, early_term=False,
            minsum_mode=("BP_NMS", 0.8, 0.0),
        )
        np.testing.assert_allclose(
            np.asarray(out_soft), np.asarray(out_ref.llr_out),
            rtol=1e-4, atol=1e-4,
        )

    def test_gradient_exists_and_nonzero(self, setup):
        code, sdc = setup
        ch = awgn_channel(sdc, jax.random.PRNGKey(1), 8, jnp.float32(-1.0))

        def loss(s):
            return soft_ber(decode_soft(sdc, ch.llr, s), ch.codeword)

        g = jax.grad(loss)(jnp.full((5,), 1.0, jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestTuning:
    def test_tuned_beats_plain_minsum_on_high_dc_code(self):
        # high check degree is where min-sum overestimates most and learned
        # scales pay off; small instance keeps this CPU-fast
        code = make_benchmark_code(256, dv=4, dc=16, seed=5)
        sdc = to_sorted_device(code)
        T = 10
        res = tune_nms_scales(
            sdc, snr_db=5.5, iterations=T, steps=25, batch=128, seed=2,
            lr=0.03,
        )
        dec = jax.jit(lambda llr, s: __import__(
            "libldpc_tpu.ops.tuning", fromlist=["decode_soft"]
        ).decode_soft(sdc, llr, s))
        tx = np.asarray(sdc.bit_pos)

        def fer(scales):
            fe = n = 0
            for i in range(3):
                ch = awgn_channel(
                    sdc, jax.random.PRNGKey(3000 + i), 256, jnp.float32(5.5)
                )
                hard = (np.asarray(dec(ch.llr, scales)) <= 0).astype(np.uint8)
                cw = np.asarray(ch.codeword)
                fe += int(((hard[tx] != cw[tx]).sum(0) > 0).sum())
                n += 256
            return fe / n

        fer_plain = fer(jnp.ones((T,), jnp.float32))
        fer_tuned = fer(res.scales)
        assert fer_tuned < fer_plain * 0.7, (fer_tuned, fer_plain)
        # learned scales shrink toward the known-good NMS range
        assert 0.4 < float(np.asarray(res.scales).mean()) < 1.0

    def test_oms_soft_matches_oms_decoder_at_constant_offset(self, setup):
        code, sdc = setup
        ch = awgn_channel(sdc, jax.random.PRNGKey(4), 16, jnp.float32(1.0))
        T = 6
        out_soft = decode_soft_oms(
            sdc, ch.llr, jnp.full((T,), 0.3, jnp.float32)
        )[-1]
        out_ref = bp_decode_sorted(
            sdc, ch.llr, iterations=T, early_term=False,
            minsum_mode=("BP_OMS", 1.0, 0.3),
        )
        np.testing.assert_allclose(
            np.asarray(out_soft), np.asarray(out_ref.llr_out),
            rtol=1e-4, atol=1e-4,
        )

    def test_oms_lattice_ste_rounds_forward(self, setup):
        """With quant_scale, the forward pass applies the lattice-rounded
        offset (matching the int8 kernel) while gradients flow through."""
        code, sdc = setup
        ch = awgn_channel(sdc, jax.random.PRNGKey(5), 8, jnp.float32(0.0))
        q = 0.1875
        # 0.31 rounds to 2 lattice units = 0.375
        out_ste = decode_soft_oms(
            sdc, ch.llr, jnp.full((4,), 0.31, jnp.float32), quant_scale=q
        )[-1]
        out_rounded = decode_soft_oms(
            sdc, ch.llr, jnp.full((4,), 2 * q, jnp.float32)
        )[-1]
        np.testing.assert_allclose(
            np.asarray(out_ste), np.asarray(out_rounded), rtol=1e-5
        )

        def loss(b):
            return soft_ber(
                decode_soft_oms(sdc, ch.llr, b, quant_scale=q)[-1],
                ch.codeword,
            )

        g = jax.grad(loss)(jnp.full((4,), 0.31, jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0  # STE passes gradient

    def test_oms_tuning_runs_and_stays_in_range(self, setup):
        code, sdc = setup
        res = tune_oms_offsets(
            sdc, snr_db=-1.0, iterations=6, steps=8, batch=64, seed=3,
            quant_scale=0.1875,
        )
        off = np.asarray(res.scales)
        assert np.isfinite(np.asarray(res.losses)).all()
        assert (off >= 0.0).all() and (off <= 1.5).all()

    def test_loss_decreases(self, setup):
        code, sdc = setup
        res = tune_nms_scales(
            sdc, snr_db=-1.0, iterations=6, steps=12, batch=64, seed=3
        )
        losses = np.asarray(res.losses)
        assert np.isfinite(losses).all()
        # averaged late loss below averaged early loss (per-batch noise)
        assert losses[-4:].mean() < losses[:4].mean()
        # scales moved away from the 1.0 init
        assert np.abs(np.asarray(res.scales) - 1.0).max() > 1e-3
