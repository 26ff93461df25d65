"""Randomised property tests: every decode path vs the scalar golden oracle
on randomly structured codes (regular and irregular, with and without
degree-1 nodes and punctures)."""

import numpy as np
import pytest

import jax.numpy as jnp

from libldpc_tpu.models import LDPCCode, make_regular_code
from libldpc_tpu.ops.bec import bec_decode_jit
from libldpc_tpu.ops.decoder import bp_decode_jit
from libldpc_tpu.ops.device import to_device
from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device

from golden import ERASURE, GoldenBECDecoder, GoldenDecoder


def _random_irregular_code(rng, nc=32, mc=20):
    """Random sparse H with degree spread, ensuring no empty rows/cols."""
    while True:
        H = (rng.random((mc, nc)) < 0.12).astype(np.uint8)
        # ensure min degree 1 everywhere by planting a diagonal-ish band
        for i in range(mc):
            H[i, rng.integers(0, nc)] = 1
        for v in range(nc):
            if not H[:, v].any():
                H[rng.integers(0, mc), v] = 1
        if (H.sum(1) >= 2).all():
            return LDPCCode.from_dense(H)


@pytest.mark.parametrize("trial", range(4))
def test_bp_paths_match_golden_on_random_codes(trial):
    rng = np.random.default_rng(100 + trial)
    if trial % 2 == 0:
        code = make_regular_code(30, dv=3, dc=5, seed=trial)
    else:
        code = _random_irregular_code(rng)
    minsum = bool(trial % 2)
    B = 3
    llr = (rng.normal(size=(code.nc, B)) * 3).astype(np.float32)
    iters = int(rng.integers(1, 12))

    golden = GoldenDecoder(code, iterations=iters, minsum_mode=minsum)
    out_p = bp_decode_jit(
        to_device(code), jnp.asarray(llr), iterations=iters,
        minsum_mode=minsum,
    )
    sdc = to_sorted_device(code)
    vperm = np.asarray(sdc.vn_perm)
    vinv = np.asarray(sdc.vn_inv)
    out_s = bp_decode_sorted(
        sdc, jnp.asarray(llr[vperm]), iterations=iters, minsum_mode=minsum
    )
    for b in range(B):
        g_llr, g_hard, g_it = golden.decode(llr[:, b].astype(np.float64))
        np.testing.assert_array_equal(
            np.asarray(out_p.hard[:, b]).astype(np.uint8), g_hard,
            err_msg=f"padded path, trial {trial} frame {b}",
        )
        np.testing.assert_array_equal(
            np.asarray(out_s.hard)[vinv, b].astype(np.uint8), g_hard,
            err_msg=f"sorted path, trial {trial} frame {b}",
        )
        assert int(out_p.iterations[b]) == g_it
        assert int(out_s.iterations[b]) == g_it


@pytest.mark.parametrize("trial", range(3))
def test_bec_matches_golden_on_random_codes(trial):
    rng = np.random.default_rng(200 + trial)
    code = (
        make_regular_code(30, dv=3, dc=5, seed=trial)
        if trial == 0
        else _random_irregular_code(rng)
    )
    dcode = to_device(code)
    B = 3
    cw = np.zeros((code.nc, B), dtype=np.uint8)  # all-zero codeword
    sym = cw.astype(np.int8).copy()
    sym[rng.random(sym.shape) < 0.45] = ERASURE
    iters = int(rng.integers(1, 10))
    out = bec_decode_jit(
        dcode, jnp.asarray(sym), jnp.asarray(cw), iterations=iters
    )
    golden = GoldenBECDecoder(code, iterations=iters)
    for b in range(B):
        g_sym, g_hard, g_it = golden.decode(sym[:, b], cw[:, b])
        np.testing.assert_array_equal(np.asarray(out.symbols_out[:, b]), g_sym)
        np.testing.assert_array_equal(np.asarray(out.hard[:, b]), g_hard)
        assert int(out.iterations[b]) == g_it
