"""Streaming compaction decoder: per-frame semantics must match the batch
early-termination decoder bit-for-bit (decisions AND iteration counts), and
the refill machinery must keep every stream busy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops.channel import simulate_channel
from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device
from libldpc_tpu.ops.streaming import (
    StreamState,
    make_streaming_step,
    _init_state,
)
from libldpc_tpu.utils.params import DecoderParams


@pytest.fixture(scope="module")
def setup():
    code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    sdc = to_sorted_device(code)
    return code, sdc


def _drain_counts(sdc, dec, llr, cw, chunk_iters=7):
    """Run the streaming decoder on a fixed pool (no refills) and return
    (bec, fec, frames, iter_sum) once every stream drains."""
    B = llr.shape[1]
    init_fn, step_fn = make_streaming_step(
        sdc, "AWGN", dec, B, chunk_iters=chunk_iters
    )
    state = init_fn()
    state = state._replace(
        llr_in=jnp.asarray(llr),
        codeword=jnp.asarray(cw),
        active=jnp.ones((B,), bool),
    )
    totals = np.zeros(4, dtype=np.int64)
    for step in range(200):
        state, acc = step_fn(
            state, jax.random.PRNGKey(step), np.float32(0.0), jnp.asarray(False)
        )
        totals += np.array(
            [int(acc.bit_errors), int(acc.frame_errors), int(acc.frames),
             int(acc.iter_sum)]
        )
        if int(acc.n_active) == 0:
            return totals
    raise AssertionError("streams did not drain")


class TestDrainEquivalence:
    @pytest.mark.parametrize("snr,iters", [(-2.0, 12), (1.0, 12), (3.0, 5)])
    @pytest.mark.parametrize("minsum", [False, True])
    def test_matches_batch_decoder(self, setup, snr, iters, minsum):
        code, sdc = setup
        B = 64
        ch = simulate_channel(
            sdc, "AWGN", jax.random.PRNGKey(3), B, np.float32(snr)
        )
        dec = DecoderParams(
            iterations=iters, type="BP_MS" if minsum else "BP"
        )
        out = bp_decode_sorted(
            sdc, ch.llr, iterations=iters, early_term=True,
            minsum_mode=dec.cn_mode,
        )
        tx_hard = np.asarray(out.hard)[np.asarray(sdc.bit_pos)]
        tx_true = np.asarray(ch.codeword)[np.asarray(sdc.bit_pos)]
        errs = (tx_hard != tx_true).sum(axis=0)
        want = np.array(
            [errs.sum(), (errs > 0).sum(), B, np.asarray(out.iterations).sum()],
            dtype=np.int64,
        )
        got = _drain_counts(sdc, dec, np.asarray(ch.llr),
                            np.asarray(ch.codeword))
        np.testing.assert_array_equal(got, want)

    def test_bsc_channel(self, setup):
        code, sdc = setup
        B = 32
        ch = simulate_channel(
            sdc, "BSC", jax.random.PRNGKey(9), B, np.float32(0.08)
        )
        dec = DecoderParams(iterations=10)
        out = bp_decode_sorted(sdc, ch.llr, iterations=10, early_term=True)
        want_iters = int(np.asarray(out.iterations).sum())
        got = _drain_counts(sdc, dec, np.asarray(ch.llr),
                            np.asarray(ch.codeword))
        assert got[2] == B
        assert got[3] == want_iters


class TestRefill:
    def test_streams_stay_busy_and_counters_grow(self, setup):
        code, sdc = setup
        B = 64
        init_fn, step_fn = make_streaming_step(
            sdc, "AWGN", DecoderParams(iterations=10), B, chunk_iters=10
        )
        state = init_fn()
        total_frames = 0
        for s in range(4):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(2.0),
                jnp.asarray(True),
            )
            total_frames += int(acc.frames)
            # refill keeps streams busy up to the reload-burst threshold
            # (idle slots below gen_threshold wait for the next burst)
            assert int(acc.n_active) >= B - max(1, B // 16)
        # at 2 dB most frames converge in ~a few iterations: streams must
        # recycle well beyond one frame per slot per chunk
        assert total_frames > 2 * B
        # iteration accounting is self-consistent
        assert 0 < int(acc.iter_sum) <= total_frames * 10

    def test_drain_after_refill_counts_everything(self, setup):
        code, sdc = setup
        B = 32
        init_fn, step_fn = make_streaming_step(
            sdc, "AWGN", DecoderParams(iterations=8), B, chunk_iters=8
        )
        state = init_fn()
        frames = 0
        state, acc = step_fn(
            state, jax.random.PRNGKey(0), np.float32(0.0), jnp.asarray(True)
        )
        frames += int(acc.frames)
        for s in range(1, 50):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(0.0),
                jnp.asarray(False),
            )
            frames += int(acc.frames)
            if int(acc.n_active) == 0:
                break
        assert int(acc.n_active) == 0
        # every started frame was eventually counted: started = B streams
        # plus every reload that happened during the refill step
        assert frames >= B


class TestSharded:
    def test_mesh_statistics_match_single_device(self, setup):
        from libldpc_tpu.parallel.mesh import default_mesh

        code, sdc = setup
        mesh = default_mesh()
        B = 64
        n_dev = mesh.devices.size
        init_fn, step_fn = make_streaming_step(
            sdc, "AWGN", DecoderParams(iterations=10), B // n_dev,
            mesh=mesh, chunk_iters=10,
        )
        state = init_fn()
        tot = np.zeros(2, dtype=np.int64)
        for s in range(6):
            state, acc = step_fn(
                state, jax.random.PRNGKey(s), np.float32(-1.0),
                jnp.asarray(True),
            )
            tot += np.array([int(acc.frame_errors), int(acc.frames)])
        assert int(acc.n_active) == B

        init1, step1 = make_streaming_step(
            sdc, "AWGN", DecoderParams(iterations=10), B, chunk_iters=10
        )
        s1 = init1()
        tot1 = np.zeros(2, dtype=np.int64)
        for s in range(6):
            s1, acc1 = step1(
                s1, jax.random.PRNGKey(s), np.float32(-1.0), jnp.asarray(True)
            )
            tot1 += np.array([int(acc1.frame_errors), int(acc1.frames)])
        # same frame throughput (up to reload-burst threshold rounding,
        # which differs between per-device and whole-batch pools), FER
        # within Monte-Carlo noise
        assert abs(tot[1] - tot1[1]) <= B
        f_mesh = tot[0] / tot[1]
        f_one = tot1[0] / tot1[1]
        assert f_mesh > 0 and f_one > 0
        assert 0.25 < f_mesh / f_one < 4.0
