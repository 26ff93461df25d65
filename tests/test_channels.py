"""Channel simulation and BEC decoder tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops.bec import bec_decode_jit
from libldpc_tpu.ops.channel import (
    BEC_ERASURE,
    awgn_channel,
    bec_channel,
    bsc_channel,
    encode_batch,
    simulate_channel,
)
from libldpc_tpu.ops.device import to_device
from libldpc_tpu.utils.params import SHORTEN_LLR

from golden import ERASURE, GoldenBECDecoder


@pytest.fixture(scope="module")
def code():
    return make_benchmark_code(120, dv=3, dc=6, seed=2, with_G=True)


@pytest.fixture(scope="module")
def dcode(code):
    return to_device(code)


class TestEncode:
    def test_encoded_words_are_codewords(self, code, dcode):
        cw = np.asarray(encode_batch(dcode, jax.random.PRNGKey(0), 16))
        assert cw.shape == (code.nc, 16)
        for b in range(16):
            assert not code.syndrome(cw[:, b]).any()
        # not all-zero with overwhelming probability
        assert cw.any()

    def test_no_generator_all_zero(self, code):
        import dataclasses

        code0 = dataclasses.replace(code, G=None)
        d0 = to_device(code0)
        cw = np.asarray(encode_batch(d0, jax.random.PRNGKey(0), 4))
        assert not cw.any()


class TestAWGN:
    def test_llr_statistics(self, code, dcode):
        snr = 4.0
        sigma2 = 10 ** (-snr / 10)
        out = awgn_channel(dcode, jax.random.PRNGKey(1), 512, jnp.float32(snr))
        llr = np.asarray(out.llr)
        cw = np.asarray(out.codeword)
        # E[LLR | bit] = ±2/σ², Var = 4/σ²
        signs = 1 - 2 * cw.astype(np.float64)
        normalized = llr * signs
        assert abs(normalized.mean() - 2 / sigma2) < 0.1 * 2 / sigma2
        assert abs(normalized.var() - 4 / sigma2) < 0.15 * 4 / sigma2

    def test_puncture_shorten_overrides(self):
        code = make_benchmark_code(120, dv=3, dc=6, seed=3, with_G=True)
        code.puncture = np.array([0, 5], dtype=np.int32)
        code.shorten = np.array([7], dtype=np.int32)
        # shortened bits must actually be 0 in every codeword for the
        # override to be consistent; force info bits to zero via all-zero mode
        import dataclasses

        code = dataclasses.replace(code, G=None)
        d = to_device(code)
        out = awgn_channel(d, jax.random.PRNGKey(0), 8, jnp.float32(2.0))
        llr = np.asarray(out.llr)
        assert (llr[[0, 5]] == 0).all()  # punctured = erasure LLR 0
        assert (llr[7] == np.float32(SHORTEN_LLR)).all()
        assert (llr[np.asarray(d.bit_pos)] != 0).all()


class TestBSC:
    def test_flip_rate_and_llrs(self, code, dcode):
        eps = 0.15
        out = bsc_channel(dcode, jax.random.PRNGKey(2), 256, jnp.float32(eps))
        llr = np.asarray(out.llr)
        cw = np.asarray(out.codeword)
        delta = np.log((1 - eps) / eps)
        vals = np.unique(np.round(np.abs(llr), 5))
        assert np.allclose(vals, np.round(delta, 5))
        # flip rate: llr sign disagrees with bit in ~eps of positions
        sent = 1 - 2 * cw.astype(np.float64)
        flipped = (np.sign(llr) != sent).mean()
        assert abs(flipped - eps) < 0.02


class TestBECChannel:
    def test_erasure_rate(self, code, dcode):
        eps = 0.3
        out = bec_channel(dcode, jax.random.PRNGKey(3), 256, jnp.float32(eps))
        sym = np.asarray(out.llr)
        cw = np.asarray(out.codeword)
        erased = (sym == int(BEC_ERASURE)).mean()
        assert abs(erased - eps) < 0.03
        keep = sym != int(BEC_ERASURE)
        assert np.array_equal(sym[keep], cw[keep])


class TestBECDecoder:
    def test_matches_golden(self, code, dcode):
        rng = np.random.default_rng(0)
        B = 6
        golden = GoldenBECDecoder(code, iterations=30)
        u = rng.integers(0, 2, size=(code.G.shape[0], B)).astype(np.uint8)
        cw = (code.G.T.astype(np.int64) @ u % 2).astype(np.uint8)
        sym = cw.astype(np.int8).copy()
        erase = rng.random(sym.shape) < 0.35
        sym[erase] = ERASURE
        out = bec_decode_jit(
            dcode, jnp.asarray(sym), jnp.asarray(cw), iterations=30
        )
        for b in range(B):
            g_sym, g_hard, g_iters = golden.decode(sym[:, b], cw[:, b])
            np.testing.assert_array_equal(
                np.asarray(out.symbols_out[:, b]), g_sym,
                err_msg=f"frame {b} symbols",
            )
            np.testing.assert_array_equal(
                np.asarray(out.hard[:, b]), g_hard, err_msg=f"frame {b} hard"
            )
            assert int(out.iterations[b]) == g_iters, f"frame {b} iters"

    def test_no_erasures_resolves_immediately(self, code, dcode):
        cw = np.zeros((code.nc, 3), dtype=np.uint8)
        sym = cw.astype(np.int8)
        out = bec_decode_jit(dcode, jnp.asarray(sym), jnp.asarray(cw), iterations=10)
        assert np.asarray(out.resolved).all()
        assert (np.asarray(out.iterations) == 0).all()
        assert not np.asarray(out.hard).any()

    def test_heavy_erasure_forces_errors(self, code, dcode):
        rng = np.random.default_rng(1)
        cw = np.zeros((code.nc, 4), dtype=np.uint8)
        sym = cw.astype(np.int8).copy()
        erase = rng.random(sym.shape) < 0.9
        sym[erase] = ERASURE
        out = bec_decode_jit(dcode, jnp.asarray(sym), jnp.asarray(cw), iterations=50)
        # unresolved bits decide the wrong value -> errors counted
        assert np.asarray(out.hard).any()
        assert not np.asarray(out.resolved).all()


class TestBECRefBugCompat:
    """The reference's BEC decoder reads out-of-bounds scratch for degree-1
    VNs (src/decoding/decoder.cpp:155-160 with vw==1), which acts as a genie
    hint on codes with degree-1 VNs.  The compat mode must reproduce that
    behaviour's dramatic FER difference on the bundled code."""

    def test_compat_unsticks_degree1_codes(self, bundled_code):
        from libldpc_tpu.ops.bec import bec_decode_jit

        code = bundled_code
        d = to_device(code)
        tx = code.bit_pos
        errs = {}
        for compat in (False, True):
            fe = 0
            for i in range(2):
                ch = bec_channel(d, jax.random.PRNGKey(40 + i), 512,
                                 jnp.float32(0.80))
                dec = bec_decode_jit(
                    d, ch.llr, ch.codeword, iterations=50,
                    degree1_stale_byte=0 if compat else None,
                )
                hard = np.asarray(dec.hard)
                cw = np.asarray(ch.codeword)
                fe += int(((hard[tx] != cw[tx]).sum(0) > 0).sum())
            errs[compat] = fe
        # reference-measured: FER < 2e-5 with the bug, ~3.5e-2 without
        assert errs[True] == 0
        assert errs[False] >= 10

    def test_compat_error_bits_are_constant_one(self, bundled_code):
        # unresolved bits decide constant 1 in compat mode (gf2 unary minus
        # quirk, src/core/gf2.cpp:5-8), so bit errors land only on true-0
        # bits
        from libldpc_tpu.ops.bec import bec_decode_jit
        from libldpc_tpu.ops.channel import BEC_ERASURE as E

        code = bundled_code
        d = to_device(code)
        ch = bec_channel(d, jax.random.PRNGKey(99), 256, jnp.float32(0.88))
        dec = bec_decode_jit(d, ch.llr, ch.codeword, iterations=50,
                             degree1_stale_byte=0)
        hard = np.asarray(dec.hard)
        cw = np.asarray(ch.codeword)
        unresolved = np.asarray(dec.symbols_out) == int(E)
        assert unresolved.any()
        assert (hard[unresolved] == 1).all()
        wrong = hard != cw
        assert (cw[wrong] == 0).all()


class TestBECSortedLayout:
    """bec_decode_sorted must match the padded-layout decoder exactly."""

    @pytest.mark.parametrize("compat", [None, 0])
    def test_matches_padded(self, bundled_code, compat):
        from libldpc_tpu.ops.bec_sorted import bec_decode_sorted_jit
        from libldpc_tpu.ops.sorted import to_sorted_device

        code = bundled_code
        d = to_device(code)
        sdc = to_sorted_device(code)
        rng = np.random.default_rng(5)
        B = 64
        cw = np.zeros((code.nc, B), dtype=np.uint8)
        sym = cw.astype(np.int8).copy()
        sym[rng.random(sym.shape) < 0.82] = 2
        sym[code.puncture] = 2
        out_p = jax.jit(
            lambda s, c: __import__("libldpc_tpu.ops.bec", fromlist=["bec_decode"]).bec_decode(
                d, s, c, iterations=30, degree1_stale_byte=compat
            )
        )(jnp.asarray(sym), jnp.asarray(cw))
        vperm = np.asarray(sdc.vn_perm)
        vinv = np.asarray(sdc.vn_inv)
        out_s = bec_decode_sorted_jit(
            sdc,
            jnp.asarray(sym[vperm]),
            jnp.asarray(cw[vperm]),
            iterations=30,
            degree1_stale_byte=compat,
        )
        np.testing.assert_array_equal(
            np.asarray(out_s.symbols_out)[vinv], np.asarray(out_p.symbols_out)
        )
        np.testing.assert_array_equal(
            np.asarray(out_s.hard)[vinv], np.asarray(out_p.hard)
        )
        np.testing.assert_array_equal(
            np.asarray(out_s.iterations), np.asarray(out_p.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(out_s.resolved), np.asarray(out_p.resolved)
        )


class TestDispatch:
    def test_unknown_channel_raises(self, dcode):
        with pytest.raises(ValueError):
            simulate_channel(dcode, "QAM???", jax.random.PRNGKey(0), 4, 1.0)
