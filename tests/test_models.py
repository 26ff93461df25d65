"""Tests for code loading, GF(2) algebra and the padded edge layout.

Re-creates the reference's integration-test invariants
(``tests/ldpctest.cpp``): GF(2) identities, rank, H·Gᵀ=0, and
encode→zero-syndrome, plus structural checks of the TPU edge layout.
"""

import numpy as np
import pytest

from libldpc_tpu.models import (
    LDPCCode,
    gf2,
    make_benchmark_code,
    make_regular_code,
    systematic_generator,
)


class TestGF2:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        m = rng.integers(0, 2, size=(13, 200)).astype(np.uint8)
        assert np.array_equal(gf2.unpack_rows(gf2.pack_rows(m), 200), m)

    def test_rank_identity(self):
        assert gf2.rank(np.eye(17, dtype=np.uint8)) == 17

    def test_rank_vs_numpy_float(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            m = rng.integers(0, 2, size=(20, 30)).astype(np.uint8)
            # brute-force rank over GF(2) by row reduction with fractions-free
            # elimination in int space
            r_ref = _rank_bruteforce(m)
            assert gf2.rank(m) == r_ref

    def test_matvec_xor_semantics(self):
        H = np.array([[1, 1, 0], [0, 1, 1]], dtype=np.uint8)
        v = np.array([1, 1, 1], dtype=np.uint8)
        assert np.array_equal(gf2.mat_vec(H, v), np.array([0, 0]))


def _rank_bruteforce(m):
    m = m.copy().astype(np.uint8)
    rank = 0
    rows, cols = m.shape
    for c in range(cols):
        piv = None
        for r in range(rank, rows):
            if m[r, c]:
                piv = r
                break
        if piv is None:
            continue
        m[[rank, piv]] = m[[piv, rank]]
        for r in range(rows):
            if r != rank and m[r, c]:
                m[r] ^= m[rank]
        rank += 1
    return rank


class TestLayout:
    def test_layout_roundtrip_small(self):
        H = np.array(
            [
                [1, 1, 0, 1, 0, 0],
                [0, 1, 1, 0, 1, 0],
                [1, 0, 0, 0, 1, 1],
            ],
            dtype=np.uint8,
        )
        code = LDPCCode.from_dense(H)
        lay = code.layout
        E = code.mc * code.max_dc
        assert lay.pad_col.shape == (E,)
        # every real edge appears exactly once with correct column
        recon = np.zeros_like(H)
        for i in range(code.mc):
            for j in range(code.max_dc):
                if lay.cn_mask[i, j]:
                    recon[i, lay.pad_col[i * code.max_dc + j]] ^= 1
        assert np.array_equal(recon, H)
        # vn tables are consistent: each valid (v, j) slot maps to an edge
        # whose pad_col is v
        for v in range(code.nc):
            for j in range(code.max_dv):
                if lay.vn_mask[v, j]:
                    assert lay.pad_col[lay.vn_edges[v, j]] == v
        # degrees
        assert np.array_equal(lay.cn_degree, H.sum(1))
        assert np.array_equal(lay.vn_degree, H.sum(0))

    def test_layout_preserves_row_file_order(self):
        # edges of one row must occupy its padded slots in file order,
        # matching the reference's row_neighbor order (sparse.h:133)
        rows = np.array([0, 1, 0, 0, 1], dtype=np.int32)
        cols = np.array([3, 1, 0, 2, 4], dtype=np.int32)
        code = LDPCCode(rows=rows, cols=cols, nc=5, mc=2)
        lay = code.layout
        assert list(lay.pad_col[: code.max_dc]) == [3, 0, 2]
        assert list(lay.pad_col[code.max_dc : code.max_dc + 2]) == [1, 4]


class TestConstruct:
    def test_regular_code_structure(self):
        code = make_regular_code(120, dv=3, dc=6, seed=3)
        assert code.nc == 120 and code.mc == 60
        lay = code.layout
        assert (lay.cn_degree == 6).all()
        assert (lay.vn_degree == 3).all()
        # no duplicate edges
        keys = code.rows.astype(np.int64) * code.nc + code.cols
        assert len(np.unique(keys)) == len(keys)

    def test_systematic_generator(self):
        code = make_regular_code(48, dv=3, dc=6, seed=5)
        G = systematic_generator(code)
        if G is None:
            pytest.skip("rank-deficient draw")
        assert gf2.is_generator_matrix(code.H_dense, G)
        rng = np.random.default_rng(0)
        u = rng.integers(0, 2, size=G.shape[0]).astype(np.uint8)
        cw = gf2.vec_mat(u, G)
        assert not code.syndrome(cw).any()

    def test_benchmark_code_encodes(self):
        code = make_benchmark_code(96, with_G=True, seed=11)
        u = np.ones(code.G.shape[0], dtype=np.uint8)
        cw = code.encode(u)
        assert not code.syndrome(cw).any()


class TestQCExpansion:
    def test_block_structure(self):
        from libldpc_tpu.models import expand_qc

        base = np.array([[0, 1, -1], [2, -1, 0]])
        Z = 4
        code = expand_qc(base, Z)
        assert code.nc == 12 and code.mc == 8
        H = code.H_dense
        # block (0,0) shift 0 = identity
        assert np.array_equal(H[:4, :4], np.eye(4, dtype=np.uint8))
        # block (0,1) shift 1: row i connects to col (i+1) % Z
        blk = H[:4, 4:8]
        for i in range(4):
            assert blk[i, (i + 1) % 4] == 1 and blk[i].sum() == 1
        # -1 block is empty
        assert not H[:4, 8:].any()
        # every row/col degree equals base-row/col nonzero count
        assert (H.sum(1)[:4] == 2).all() and (H.sum(1)[4:] == 2).all()

    def test_qc_code_decodes(self):
        import jax
        import jax.numpy as jnp

        from libldpc_tpu.models import expand_qc
        from libldpc_tpu.ops.decoder import bp_decode_jit
        from libldpc_tpu.ops.device import to_device

        # small rate-1/2-ish QC code: 2x4 base, Z=8
        base = np.array([[0, 3, 1, -1], [5, -1, 2, 7]])
        code = expand_qc(base, 8)
        d = to_device(code)
        rng = np.random.default_rng(0)
        sigma2 = 10 ** (-6.0 / 10)
        y = 1.0 + rng.normal(size=(code.nc, 8)) * np.sqrt(sigma2)
        llr = jnp.asarray((2 * y / sigma2).astype(np.float32))
        out = bp_decode_jit(d, llr, iterations=30)
        assert (~np.asarray(out.hard)).all()  # all-zero cw recovered

    def test_expand_qc_stamps_metadata(self):
        from libldpc_tpu.models import expand_qc

        base = np.array([[0, 3, 1, -1], [5, -1, 2, 7]])
        code = expand_qc(base, 8)
        assert code.qc is not None
        assert code.qc[0] == 8
        assert np.array_equal(code.qc[1], base)

    def test_detect_qc_recovers_structure(self):
        """A file-loaded QC code has no metadata; detect_qc must verify H
        and recover the exact base (the CLI's --qc-z path)."""
        from libldpc_tpu.models import detect_qc, expand_qc

        rng = np.random.default_rng(4)
        base = rng.integers(-1, 16, size=(4, 8))
        code = expand_qc(base, 16)
        code.qc = None  # simulate a file load
        got = detect_qc(code, 16)
        assert np.array_equal(got, base)
        assert code.qc[0] == 16

    def test_detect_qc_rejects_non_qc(self):
        from libldpc_tpu.models import detect_qc, make_benchmark_code

        code = make_benchmark_code(96, dv=3, dc=6, seed=7)
        with pytest.raises(ValueError):
            detect_qc(code, 8)
        # wrong Z on a real QC code
        from libldpc_tpu.models import expand_qc

        qc = expand_qc(np.array([[0, 3, 1, 2]]), 8)
        qc.qc = None
        with pytest.raises(ValueError):
            detect_qc(qc, 4)

    def test_cli_qc_z_flag(self, tmp_path):
        """--qc-z verifies H and unlocks the qc metadata from the CLI
        (the codefile format carries no lifting structure)."""
        from libldpc_tpu import cli
        from libldpc_tpu.models import expand_qc

        rng = np.random.default_rng(2)
        base = rng.integers(0, 8, size=(2, 4))
        code = expand_qc(base, 8)
        pc = tmp_path / "qc_h.txt"
        code.save(str(pc))
        out = tmp_path / "res.txt"
        rc = cli.main([
            str(pc), str(out), "4", "4.1", "1", "-i", "8",
            "--batch-size", "16", "--max-frames", "32",
            "--frame-error-count", "2", "--qc-z", "8",
        ])
        assert rc == 0 and out.exists()
        with pytest.raises(ValueError):
            cli.main([
                str(pc), str(out), "4", "4.1", "1", "-i", "8",
                "--batch-size", "16", "--max-frames", "32",
                "--frame-error-count", "2", "--qc-z", "4",
            ])

    def test_detect_qc_auto_finds_z(self):
        """Z=None/auto searches divisors of gcd(nc, mc) largest-first and
        recovers the lifting size with no side-channel metadata (matching
        the reference loader's file-only capability,
        gpu/ldpc/ldpc.cpp:32-83)."""
        from libldpc_tpu.models import detect_qc, expand_qc

        rng = np.random.default_rng(11)
        base = rng.integers(-1, 24, size=(5, 10))
        base[0, 0] = 3  # ensure at least one circulant
        code = expand_qc(base, 24)
        code.qc = None  # simulate a file load
        got = detect_qc(code)  # no Z given
        assert code.qc[0] == 24
        assert np.array_equal(got, base)
        # the "auto" spelling and 0 behave identically
        code.qc = None
        detect_qc(code, "auto")
        assert code.qc[0] == 24
        code.qc = None
        detect_qc(code, 0)
        assert code.qc[0] == 24

    def test_detect_qc_auto_rejects_non_qc(self):
        """Non-QC codes raise (Z=1 is never reported — trivially true for
        every code and structurally useless)."""
        from libldpc_tpu.models import detect_qc, make_benchmark_code

        code = make_benchmark_code(96, dv=3, dc=6, seed=7)
        with pytest.raises(ValueError, match="no QC structure"):
            detect_qc(code)

    def test_cli_qc_z_auto(self, tmp_path, capsys):
        """--qc-z auto wires the search through the CLI."""
        from libldpc_tpu import cli
        from libldpc_tpu.models import expand_qc

        rng = np.random.default_rng(2)
        base = rng.integers(0, 8, size=(2, 4))
        code = expand_qc(base, 8)
        pc = tmp_path / "qc_h.txt"
        code.save(str(pc))
        out = tmp_path / "res.txt"
        rc = cli.main([
            str(pc), str(out), "4", "4.1", "1", "-i", "8",
            "--batch-size", "16", "--max-frames", "32",
            "--frame-error-count", "2", "--qc-z", "auto",
        ])
        assert rc == 0 and out.exists()
        assert "QC structure detected: Z = 8" in capsys.readouterr().out


class TestNativeRuntime:
    def test_native_parser_matches_python(self, tmp_path):
        from libldpc_tpu.runtime import native

        if not native.available():
            pytest.skip("native toolchain not available")
        code = make_regular_code(60, dv=3, dc=6, seed=13)
        code.puncture = np.array([1, 4], dtype=np.int32)
        path = str(tmp_path / "h.txt")
        code.save(path)
        rows_n, cols_n = native.parse_pairs(path)
        # python fallback: parse the same file with the native path disabled
        import libldpc_tpu.models.io as io_mod

        saved = io_mod._native
        try:
            io_mod._native = None
            parsed = io_mod.parse_codefile(path)
        finally:
            io_mod._native = saved
        np.testing.assert_array_equal(rows_n, parsed.rows)
        np.testing.assert_array_equal(cols_n, parsed.cols)

    def test_native_rank_matches_numpy(self):
        from libldpc_tpu.models import gf2
        from libldpc_tpu.runtime import native

        if not native.available():
            pytest.skip("native toolchain not available")
        rng = np.random.default_rng(3)
        m = rng.integers(0, 2, size=(40, 70)).astype(np.uint8)
        assert native.gf2_rank(gf2.pack_rows(m), 70) == _rank_bruteforce(m)


class TestFileRoundtrips:
    def test_codefile_roundtrip(self, tmp_path):
        code = make_regular_code(60, dv=3, dc=6, seed=9)
        code.puncture = np.array([2, 5], dtype=np.int32)
        path = str(tmp_path / "h.txt")
        code.save(path)
        code2 = LDPCCode.from_files(path)
        assert code2.nc == code.nc and code2.mc == code.mc
        assert np.array_equal(code2.H_dense, code.H_dense)
        assert list(code2.puncture) == [2, 5]
        assert code2.nct == code.nc - 2

    def test_codefile_bare(self, tmp_path):
        code = make_regular_code(60, dv=3, dc=6, seed=9)
        path = str(tmp_path / "h_bare.txt")
        code.save(path, headered=False)
        code2 = LDPCCode.from_files(path)
        assert np.array_equal(code2.H_dense, code.H_dense)

    def test_alist_roundtrip(self, tmp_path):
        code = make_regular_code(48, dv=3, dc=6, seed=4)
        path = str(tmp_path / "h.alist")
        code.save_alist(path)
        code2 = LDPCCode.from_alist(path)
        assert np.array_equal(code2.H_dense, code.H_dense)


class TestBundledCode:
    """Checks against the reference's bundled sample code — the same
    invariants as ``tests/ldpctest.cpp`` plus known constants from
    ``tests/code/h.txt:1-7``."""

    def test_dimensions(self, bundled_code):
        code = bundled_code
        assert code.nc == 1152
        assert code.mc == 1024
        assert code.kc == 128
        assert code.nnz == 3456
        assert len(code.puncture) == 128
        assert code.nct == 1024
        assert code.mct == 896
        assert code.kct == 128
        assert code.bit_pos.shape == (1024,)
        # puncture block is columns 256..383
        assert code.puncture.min() == 256 and code.puncture.max() == 383

    def test_is_generator_matrix(self, bundled_code):
        code = bundled_code
        assert code.G.shape[0] == 128
        assert gf2.is_generator_matrix(code.H_dense, code.G)

    def test_encode_zero_syndrome(self, bundled_code):
        code = bundled_code
        rng = np.random.default_rng(42)
        u = rng.integers(0, 2, size=code.kc).astype(np.uint8)
        cw = code.encode(u)
        assert not code.syndrome(cw).any()

    def test_degrees(self, bundled_code):
        lay = bundled_code.layout
        assert bundled_code.max_dc == 4
        assert bundled_code.max_dv == 15
        assert sorted(np.unique(lay.cn_degree)) == [3, 4]

    def test_rank(self, bundled_code):
        # The bundled H is rank-deficient by 3 (1021 < mc = 1024); verified
        # independently with the NumPy and native elimination kernels.  The
        # reference's ldpctest only prints the rank without asserting
        # (tests/ldpctest.cpp:22-25).
        assert bundled_code.rank() == 1021


class TestPEGConstruction:
    """PEG edge growth (make_peg_code) and the girth/4-cycle analyzers."""

    def test_girth_detects_known_4cycle(self):
        from libldpc_tpu.models import LDPCCode, count_4cycles, girth

        H = np.array([[1, 1, 0], [1, 1, 1]], dtype=np.uint8)
        code = LDPCCode.from_dense(H)
        assert girth(code) == 4
        assert count_4cycles(code) == 1

    def test_girth_cap_on_tree(self):
        from libldpc_tpu.models import LDPCCode, count_4cycles, girth

        H = np.array([[1, 1, 0], [0, 1, 1]], dtype=np.uint8)  # acyclic
        code = LDPCCode.from_dense(H)
        assert girth(code, cap=16) == 16
        assert count_4cycles(code) == 0

    def test_peg_regular_structure_and_girth(self):
        from libldpc_tpu.models import (
            count_4cycles, girth, make_peg_code, make_regular_code,
        )

        code = make_peg_code(96, dv=3, rate=0.5, seed=1)
        assert code.nc == 96 and code.mc == 48
        # exact variable degrees, near-balanced check degrees
        vdeg = np.bincount(code.cols, minlength=96)
        np.testing.assert_array_equal(vdeg, 3)
        cdeg = np.bincount(code.rows, minlength=48)
        # PEG balances check degrees greedily but the max-distance
        # constraint allows a small spread
        assert cdeg.max() - cdeg.min() <= 2
        # PEG at this rate/size places all edges without any 4-cycle
        assert count_4cycles(code) == 0
        g = girth(code)
        assert g >= 6
        # the configuration-model ensemble at the same parameters has
        # short cycles PEG avoids
        rnd = make_regular_code(96, dv=3, dc=6, seed=1)
        assert girth(rnd) <= g

    def test_peg_irregular_degree_sequence(self):
        from libldpc_tpu.models import make_peg_code

        degs = np.array([2] * 48 + [3] * 32 + [4] * 16)
        code = make_peg_code(96, dv=degs, mc=48, seed=2)
        vdeg = np.bincount(code.cols, minlength=96)
        np.testing.assert_array_equal(np.sort(vdeg), np.sort(degs))

    def test_peg_code_decodes_end_to_end(self):
        import jax

        from libldpc_tpu.models import make_peg_code, systematic_generator
        from libldpc_tpu.ops.channel import simulate_channel
        from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device
        from libldpc_tpu.models import gf2

        code = make_peg_code(128, dv=3, rate=0.5, seed=3)
        G = systematic_generator(code)
        assert G is not None
        code.G = G
        sdc = to_sorted_device(code)
        ch = simulate_channel(sdc, "AWGN", jax.random.PRNGKey(0), 64,
                              np.float32(4.0))
        out = bp_decode_sorted(sdc, ch.llr, iterations=20, early_term=True)
        # at 4 dB, rate 1/2: essentially everything decodes
        errs = (np.asarray(out.hard) != (np.asarray(ch.codeword) > 0)).any(0)
        assert errs.mean() < 0.2

    def test_peg_validates_args(self):
        import pytest

        from libldpc_tpu.models import make_peg_code

        with pytest.raises(ValueError):
            make_peg_code(96, dv=3)  # neither mc nor rate
        with pytest.raises(ValueError):
            make_peg_code(96, dv=3, mc=48, rate=0.5)  # both
        with pytest.raises(ValueError):
            make_peg_code(96, dv=np.full(95, 3), mc=48)  # wrong length


class TestCount4CyclesSparse:
    def test_matches_dense_formula(self):
        """Sparse 4-cycle count (edge-list pair enumeration) vs the dense
        H @ H.T overlap formula on a random irregular code."""
        import numpy as np

        from libldpc_tpu.models import LDPCCode, count_4cycles

        rng = np.random.default_rng(9)
        nc, mc = 60, 30
        rows_l, cols_l = [], []
        for v in range(nc):
            for r in rng.choice(mc, size=int(rng.integers(1, 5)),
                                replace=False):
                rows_l.append(r)
                cols_l.append(v)
        pairs = sorted(set(zip(rows_l, cols_l)))
        rows = np.array([p[0] for p in pairs], dtype=np.int64)
        cols = np.array([p[1] for p in pairs], dtype=np.int64)
        code = LDPCCode(rows=rows, cols=cols, nc=nc, mc=mc)

        H = np.zeros((mc, nc), np.int64)
        H[rows, cols] = 1
        overlap = H @ H.T
        np.fill_diagonal(overlap, 0)
        dense = int((overlap * (overlap - 1) // 2).sum() // 2)
        assert count_4cycles(code) == dense
