"""Deployed-standard code bundle: 802.11n tables, 5G-NR machinery.

Validation strategy per models/standards.py's provenance note: the
bundled tables are checked structurally (dimensions, rate, full GF(2)
rank, the standard's dual-diagonal parity prototype, girth >= 6) and
behaviourally (decoding waterfall at the expected SNR, bit-exact fused
equivalence through the arbitrary-Z qc transport)."""

import numpy as np
import pytest

from libldpc_tpu.models import (
    count_4cycles,
    girth,
    load_base_matrix,
    load_nr_shift_table,
    make_nr_like_code,
    nr_lifting_sizes,
    nr_set_index,
    wifi_code,
)


class TestWifiTables:
    @pytest.mark.parametrize("n,Z", [(648, 27), (1296, 54), (1944, 81)])
    def test_structure(self, n, Z):
        code = wifi_code(n, with_G=False, with_layers=True)
        assert code.nc == n and code.mc == n // 2
        assert code.qc is not None and code.qc[0] == Z
        base = code.qc[1]
        assert base.shape == (12, 24)
        # the standard's encoding prototype: column 12 hits rows
        # {0, 6, 11} with shifts {1, 0, 1}; shift-0 dual diagonal
        col12 = base[:, 12]
        assert (np.nonzero(col12 >= 0)[0] == [0, 6, 11]).all()
        assert col12[0] == 1 and col12[6] == 0 and col12[11] == 1
        for i in range(11):
            assert base[i, 13 + i] == 0 and base[i + 1, 13 + i] == 0
        # full rank (kct == n/2 information bits), no 4-cycles
        assert code.rank() == code.mc
        assert count_4cycles(code) == 0
        assert girth(code) >= 6
        # natural layered schedule: one layer per base row
        assert len(code.layers) == 12

    def test_encoding(self):
        code = wifi_code(648)
        rng = np.random.default_rng(0)
        u = rng.integers(0, 2, code.kc).astype(np.uint8)
        cw = code.encode(u)
        assert not code.syndrome(cw).any()

    def test_waterfall(self):
        """BP on the n=648 rate-1/2 code: reliable at 3 dB, failing at
        -2 dB — the coarse Monte-Carlo sanity that a mistranscribed
        table cannot fake (a broken code would not decode at 3 dB)."""
        import jax

        from libldpc_tpu.ops.channel import simulate_channel
        from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device

        code = wifi_code(648, with_G=False)
        sdc = to_sorted_device(code)
        B = 64

        def fer(snr):
            ch = simulate_channel(
                sdc, "AWGN", jax.random.PRNGKey(7), B, np.float32(snr)
            )
            out = bp_decode_sorted(sdc, ch.llr, iterations=30)
            errs = (
                np.asarray(out.hard) != np.asarray(ch.codeword)
            ).any(axis=0)
            return errs.mean()

        assert fer(3.0) <= 0.05
        assert fer(-2.0) >= 0.9

    def test_qc_transport_bit_exact(self):
        """The 802.11n Z=81 code rides the arbitrary-Z qc transport and
        matches the XLA sorted decoder bit-exactly (interpret mode; the
        on-chip twin lives in tests_tpu/test_hw_equivalence.py)."""
        import jax
        import jax.numpy as jnp

        from libldpc_tpu.ops.channel import simulate_channel
        from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
        from libldpc_tpu.ops.sorted import bp_decode_sorted

        code = wifi_code(1944, with_G=False)
        ldc = to_lanes_device(code, transport="qc")
        assert ldc.qc_z == 81 and ldc.qc_zq == 128
        ch = simulate_channel(
            ldc.sorted_dc, "AWGN", jax.random.PRNGKey(3), 8,
            np.float32(1.2),
        )
        out_q = bp_decode_lanes(
            ldc, ch.llr, iterations=6, early_term=True, interpret=True
        )
        out_s = bp_decode_sorted(
            ldc.sorted_dc, ch.llr, iterations=6, early_term=True
        )
        np.testing.assert_array_equal(
            np.asarray(out_q.hard), np.asarray(out_s.hard))
        np.testing.assert_array_equal(
            np.asarray(out_q.iterations), np.asarray(out_s.iterations))

    def test_driver_routes_wifi_to_qc_transport(self):
        """End-to-end: the driver picks the structure-aware transport for
        the real 802.11n code (Z=81 — not a 128-multiple; round-4 would
        have fallen back to the generic transports here)."""
        import libldpc_tpu.sim.driver as drv
        from libldpc_tpu.ops.pallas.lanes_layout import LanesDeviceCode
        from libldpc_tpu.utils.params import (
            ChannelParams, DecoderParams, SimulationParams,
        )

        code = wifi_code(1944, with_G=False)
        sim = drv.Simulator(
            code,
            DecoderParams(iterations=8),
            ChannelParams(seed=1, x_range=(1.0, 2.0, 1.0)),
            SimulationParams(batch_size=32, fec=3, max_frames=128),
            use_pallas=True,
            verbose=False,
        )
        assert isinstance(sim.dcode, LanesDeviceCode)
        assert sim.dcode.transport == "qc"
        assert "transport=qc" in sim.decode_path

    def test_unbundled_rate_raises(self):
        with pytest.raises(ValueError, match="no bundled 802.11n"):
            wifi_code(1944, rate=(5, 6))

    def test_load_base_matrix_roundtrip(self, tmp_path):
        from libldpc_tpu.models.standards import WIFI_648_12

        p = tmp_path / "base.txt"
        with open(p, "w") as f:
            f.write("# comment\n")
            for row in WIFI_648_12:
                f.write(" ".join(str(v) for v in row) + "\n")
        got = load_base_matrix(str(p))
        np.testing.assert_array_equal(got, WIFI_648_12)


class TestNRMachinery:
    def test_lifting_sets(self):
        zs = nr_lifting_sizes()
        assert len(zs) == 51
        assert zs[0] == 2 and zs[-1] == 384
        assert nr_set_index(384) == 1
        assert nr_set_index(208) == 6
        with pytest.raises(ValueError):
            nr_set_index(100)
        # only 3 of 51 are 128-multiples — the round-4 wall the
        # arbitrary-Z transport removes
        assert sum(1 for z in zs if z % 128 == 0) == 3
        # 21 of 51 (every Z >= 64) sit within the qc transport's 2x
        # inflation cap; the rest decode on the generic transports at
        # small blocklengths
        assert sum(1 for z in zs if -(-z // 128) * 128 <= 2 * z) == 21

    def test_shift_table_loader(self, tmp_path):
        p = tmp_path / "bg2.txt"
        with open(p, "w") as f:
            f.write("# row col V0..V7\n")
            f.write("0 0 9 174 0 72 3 156 143 145\n")
            f.write("0 1 117 97 0 110 26 143 19 131\n")
            f.write("1 0 21 167 0 23 6 25 14 24\n")
        with pytest.warns(UserWarning, match="197"):
            base = load_nr_shift_table(str(p), Z=208, bg=2)
        assert base.shape == (42, 52)
        assert base[0, 0] == 143 % 208
        assert base[0, 1] == 19 % 208
        assert base[1, 0] == 14
        # pre-resolved single-V format
        p2 = tmp_path / "bg2b.txt"
        with open(p2, "w") as f:
            f.write("0 0 5\n")
        with pytest.warns(UserWarning):
            base2 = load_nr_shift_table(str(p2), Z=104, bg=2)
        assert base2[0, 0] == 5

    def test_nr_like_structure(self):
        code = make_nr_like_code(bg=2, Z=104, seed=2, with_G=False)
        assert code.nc == 52 * 104 and code.mc == 42 * 104
        assert code.qc[0] == 104
        # first 2Z info bits punctured (NR transmission shape)
        assert len(code.puncture) == 2 * 104
        assert code.nct == code.nc - 2 * 104
        assert len(code.layers) == 42
        assert code.rank() == code.mc

    def test_nr_like_rides_qc_transport(self):
        from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

        code = make_nr_like_code(bg=2, Z=104, seed=2, with_G=False,
                                 puncture_info=False)
        ldc = to_lanes_device(code, transport="qc")
        assert ldc.qc_z == 104 and ldc.qc_zq == 128


class TestFileLoadedWifi:
    def test_file_roundtrip_auto_z_full_speed(self, tmp_path, monkeypatch):
        """The reference loads any codefile and decodes it at full speed
        (gpu/ldpc/ldpc.cpp:32-83).  Same capability end to end here with
        the REAL 802.11n matrix: write H to a plain codefile (no
        metadata), reload, auto-detect Z, derive the natural layers, and
        the driver constructs the flagship path — qc transport +
        fast layered engine + streaming."""
        import libldpc_tpu.sim.driver as drv
        from libldpc_tpu.models import (
            LDPCCode, detect_qc, qc_natural_layers, wifi_code,
        )
        from libldpc_tpu.models.io import write_codefile
        from libldpc_tpu.ops.pallas.lanes_layout import LanesDeviceCode
        from libldpc_tpu.utils.params import (
            ChannelParams, DecoderParams, SimulationParams,
        )

        orig = wifi_code(1944, with_G=False)
        path = tmp_path / "wifi1944.txt"
        write_codefile(str(path), orig.rows, orig.cols, orig.nc, orig.mc,
                       headered=False)
        code = LDPCCode.from_files(str(path))
        assert code.qc is None  # plain file: no side-channel metadata
        detect_qc(code)  # auto-Z
        assert code.qc[0] == 81
        qc_natural_layers(code)
        assert len(code.layers) == 12  # one per base row

        sim = drv.Simulator(
            code,
            DecoderParams(iterations=8, layered=True,
                          type="BP_OMS", ms_offset=0.375,
                          message_dtype="int8"),
            ChannelParams(seed=1, x_range=(2.0, 2.1, 1.0)),
            SimulationParams(batch_size=32, fec=3, max_frames=128),
            use_pallas=True,
            verbose=False,
        )
        assert isinstance(sim.dcode, LanesDeviceCode)
        assert sim.dcode.transport == "qc"
        assert sim.dcode.qc_z == 81 and sim.dcode.qc_zq == 128
        assert sim.dcode.qc_layers
        assert "schedule=layered-fast" in sim.decode_path
        assert "streaming=on" in sim.decode_path
        assert "fallback" not in sim.decode_path
