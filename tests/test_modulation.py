"""Constellations, bit mapping, higher-order LLRs, and modulated simulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops import modulation as mod
from libldpc_tpu.ops.channel import awgn_channel, modulated_awgn_channel
from libldpc_tpu.ops.device import to_device
from libldpc_tpu.sim import Simulator
from libldpc_tpu.utils import ChannelParams, DecoderParams, SimulationParams


class TestConstellation:
    def test_mask_unit_energy(self):
        for M in (2, 4, 8, 16):
            c = mod.Constellation.mask(M)
            assert abs((c.points**2 * c.priors).sum() - 1.0) < 1e-12
            assert c.bits_per_symbol == int(np.log2(M))
            # uniform spacing (gpu/sim/ldpcsim.cpp:9-13)
            d = np.diff(c.points)
            assert np.allclose(d, d[0])

    def test_labels_validation(self):
        with pytest.raises(ValueError):
            mod.Constellation.mask(4, labels=[0, 1, 2, 2])
        with pytest.raises(ValueError):
            mod.Constellation.mask(3)

    def test_gray_labels(self):
        c = mod.Constellation.mask(4, labels=[0, 1, 3, 2])
        assert np.array_equal(c.labels_rev[c.labels], np.arange(4))


class TestMappingAndLLRs:
    def test_map_bits_roundtrip(self):
        c = mod.Constellation.mask(4)
        n_sym, B = 8, 3
        mapper = jnp.asarray(mod.default_bit_mapper(2, n_sym))
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, size=(16, B)).astype(np.uint8)
        idx = np.asarray(mod.map_bits_to_symbols(c, mapper, jnp.asarray(bits)))
        # natural labelling: label == point index
        for l in range(n_sym):
            for b in range(B):
                want = bits[2 * l, b] * 2 + bits[2 * l + 1, b]
                assert idx[l, b] == want

    def test_bpsk_reduces_to_reference_llr(self):
        # M=2 with labels [1, 0] puts bit 0 on +1 — the reference BPSK map
        # (src/sim/channel.cpp:54-59); bitwise LLR must equal 2y/sigma2
        c = mod.Constellation.mask(2, labels=[1, 0])
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        sigma2 = jnp.float32(0.5)
        llr = np.asarray(mod.bitwise_llrs(c, y, sigma2))[0]
        np.testing.assert_allclose(llr, 2 * np.asarray(y) / 0.5, rtol=1e-4, atol=1e-3)

    def test_llr_sign_matches_nearest_point_bit(self):
        c = mod.Constellation.mask(4)
        y = jnp.asarray(c.points[None, :].astype(np.float32)).T  # [4,1] exact points
        llr = np.asarray(mod.bitwise_llrs(c, y, jnp.float32(0.01)))
        # at high SNR, llr sign encodes the bit of the transmitted label:
        # positive -> bit 0
        for j in range(4):
            label = c.labels[j]
            for k in range(2):
                bit = (label >> (1 - k)) & 1
                assert (llr[k, j, 0] < 0) == bool(bit)

    def test_llr_clamping(self):
        from libldpc_tpu.utils.params import MAX_LLR, MIN_LLR

        c = mod.Constellation.mask(4)
        y = jnp.full((4, 1), 100.0, dtype=jnp.float32)
        llr = np.asarray(mod.bitwise_llrs(c, y, jnp.float32(1e-6)))
        assert llr.max() <= MAX_LLR and llr.min() >= MIN_LLR


@pytest.fixture(scope="module")
def mod_code():
    # nct divisible by 2 (4-ASK with 2 bits/symbol)
    return make_benchmark_code(120, dv=3, dc=6, seed=2, with_G=True)


class TestModulatedChannel:
    def test_bpsk_equivalence(self, mod_code):
        code = mod_code
        d = to_device(code)
        c = mod.Constellation.mask(2, labels=[1, 0])
        mapper = jnp.asarray(code.bit_pos.reshape(1, -1).astype(np.int32))
        key = jax.random.PRNGKey(5)
        out_m = modulated_awgn_channel(d, key, 64, jnp.float32(3.0), c, mapper)
        out_b = awgn_channel(d, key, 64, jnp.float32(3.0))
        np.testing.assert_array_equal(
            np.asarray(out_m.codeword), np.asarray(out_b.codeword)
        )
        np.testing.assert_allclose(
            np.asarray(out_m.llr), np.asarray(out_b.llr), rtol=1e-4, atol=2e-2
        )

    def test_4ask_decodes_at_high_snr(self, mod_code):
        code = mod_code
        d = to_device(code)
        c = mod.Constellation.mask(4, labels=[0, 1, 3, 2])  # Gray
        n_sym = code.nct // 2
        mapper = jnp.asarray(
            code.bit_pos[mod.default_bit_mapper(2, n_sym)].astype(np.int32)
        )
        from libldpc_tpu.ops.decoder import bp_decode_jit

        out = modulated_awgn_channel(
            d, jax.random.PRNGKey(0), 32, jnp.float32(16.0), c, mapper
        )
        dec = bp_decode_jit(d, out.llr, iterations=30)
        hard = np.asarray(dec.hard).astype(np.uint8)
        cw = np.asarray(out.codeword)
        tx = code.bit_pos
        assert (hard[tx] == cw[tx]).all()


class TestModulatedSimulator:
    def test_sweep_with_modulation(self, mod_code):
        code = mod_code
        c = mod.Constellation.mask(4, labels=[0, 1, 3, 2])
        n_sym = code.nct // 2
        mapper = code.bit_pos[mod.default_bit_mapper(2, n_sym)]
        sim = Simulator(
            code,
            DecoderParams(iterations=15),
            ChannelParams(seed=3, x_range=(4.0, 5.0, 1.0)),
            SimulationParams(batch_size=64, fec=5, max_frames=1024),
            modulation=(c, mapper),
            verbose=False,
        )
        res = sim.start()
        assert res.frames[0] > 0
        # 4-ASK at 4 dB on this code should produce some errors but decode
        # a nontrivial fraction
        assert 0 <= res.fer[0] <= 1

    def test_mapper_size_validation(self, mod_code):
        c = mod.Constellation.mask(4)
        with pytest.raises(ValueError):
            Simulator(
                mod_code,
                DecoderParams(),
                ChannelParams(),
                SimulationParams(batch_size=32),
                modulation=(c, np.zeros((2, 3), np.int64)),
                verbose=False,
            )
