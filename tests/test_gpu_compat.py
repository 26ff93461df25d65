"""simfile/mapfile-driven simulation (GPU-stack compatibility surface)."""

import numpy as np
import pytest

from libldpc_tpu.models import io, make_benchmark_code
from libldpc_tpu.sim.gpu_compat import build_simulator_from_files


def _write_code_files(tmp_path, code):
    h = tmp_path / "h.txt"
    lines = [
        f"nc: {code.nc}",
        f"mc: {code.mc}",
        f"nct: {code.nct}",
        f"mct: {code.mct}",
        f"nnz: {code.nnz}",
        "puncture [0]: ",
        "shorten [0]: ",
    ]
    lines += [f"{r} {c}" for r, c in zip(code.rows, code.cols)]
    h.write_text("\n".join(lines) + "\n")
    g = tmp_path / "g.txt"
    rr, cc = np.nonzero(code.G)
    g.write_text("\n".join(f"{r} {c}" for r, c in zip(rr, cc)) + "\n")
    return str(h), str(g)


def _write_sim_map_files(tmp_path, code, bits=2, snrs=(6.0, 8.0)):
    n_sym = code.nct // bits
    sim = tmp_path / "sim.txt"
    sim.write_text(
        "\n".join(
            [
                f"name: {tmp_path}/res_gpu.txt",
                "M: 4",
                f"bits: {bits}",
                "labels: 0, 1, 3, 2",
                "snrs: " + ", ".join(str(s) for s in snrs),
                "max frames: 512",
                "min fec: 3",
                "bp iter: 20",
                "early term: 1",
            ]
        )
        + "\n"
    )
    mapper = code.bit_pos[np.arange(bits * n_sym).reshape(n_sym, bits).T]
    mp = tmp_path / "map.txt"
    mp.write_text(", ".join(str(v) for v in mapper.reshape(-1)) + "\n")
    return str(sim), str(mp)


@pytest.fixture(scope="module")
def code():
    return make_benchmark_code(120, dv=3, dc=6, seed=2, with_G=True)


class TestSimfileParsing:
    def test_parse_roundtrip(self, code, tmp_path):
        simf, mapf = _write_sim_map_files(tmp_path, code)
        sf = io.parse_simfile(simf)
        assert sf.M == 4 and sf.bits == 2
        assert list(sf.labels) == [0, 1, 3, 2]
        assert sf.min_fec == 3 and sf.bp_iter == 20 and sf.early_term
        mapper = io.parse_mapfile(mapf, sf.bits, code.nct // sf.bits)
        assert mapper.shape == (2, 60)

    def test_label_count_mismatch_raises(self, tmp_path):
        bad = tmp_path / "bad_sim.txt"
        bad.write_text(
            "name: x\nM: 4\nbits: 2\nlabels: 0, 1\nsnrs: 1\n"
            "max frames: 10\nmin fec: 1\nbp iter: 5\nearly term: 1\n"
        )
        with pytest.raises(ValueError):
            io.parse_simfile(str(bad))


class TestSimCudaCLI:
    def test_main_runs(self, code, tmp_path):
        from libldpc_tpu.sim_cuda import main

        h, g = _write_code_files(tmp_path, code)
        simf, mapf = _write_sim_map_files(tmp_path, code, snrs=(8.0,))
        rc = main([
            "-code", h, "-sim", simf, "-map", mapf, "-G", g,
            "-threads", "64",
        ])
        assert rc == 0


class TestFileDrivenSimulation:
    def test_end_to_end(self, code, tmp_path):
        h, g = _write_code_files(tmp_path, code)
        simf, mapf = _write_sim_map_files(tmp_path, code)
        sim = build_simulator_from_files(
            h, simf, mapf, gen_file=g, batch_size=64, verbose=False
        )
        res = sim.start()
        assert len(res.x_values) == 2
        assert list(res.x_values) == [6.0, 8.0]  # file order, no reversal
        assert (res.frames > 0).all()

    def test_bits_divisibility_check(self, code, tmp_path):
        h, g = _write_code_files(tmp_path, code)
        simf, mapf = _write_sim_map_files(tmp_path, code)
        # rewrite simfile with bits=7 (does not divide nct=120)
        text = open(simf).read().replace("bits: 2", "bits: 7")
        open(simf, "w").write(text)
        with pytest.raises(ValueError):
            build_simulator_from_files(h, simf, mapf, gen_file=g, verbose=False)
