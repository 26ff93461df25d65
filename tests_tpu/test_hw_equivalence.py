"""On-chip equivalence of the fused Pallas kernel with the XLA sorted
decoder.

The CPU suite validates the Pallas kernel in ``interpret=True`` mode
(``tests/test_pallas.py``); this closes the Mosaic-vs-interpreter gap by
asserting, on real TPU hardware, that the compiled kernel produces the
same hard decisions, iteration counts and codeword flags as the XLA
sorted-layout decoder on the same inputs (reference decode semantics:
``src/decoding/decoder.cpp:11-78``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_tpu


def _awgn_llrs(code, B, snr_db, seed):
    rng = np.random.default_rng(seed)
    sigma2 = 10 ** (-snr_db / 10)
    llr = np.zeros((code.nc, B), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, B)) * np.sqrt(sigma2)
    llr[code.bit_pos] = (2.0 * y / sigma2).astype(np.float32)
    return llr


@requires_tpu
@pytest.mark.parametrize("early_term", [False, True])
@pytest.mark.parametrize("minsum", [False, True])
def test_pallas_matches_sorted_on_chip(early_term, minsum):
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
    from libldpc_tpu.ops.pallas.layout import to_pallas_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted

    code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=False)
    pdc = to_pallas_device(code)
    B = 256
    # -1 dB: a mix of converging and non-converging frames at 20 iters
    llr = _awgn_llrs(code, B, snr_db=-1.0, seed=11)
    vn_perm = np.asarray(jax.device_get(pdc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_p = bp_decode_pallas(
        pdc, llr_s, iterations=20, early_term=early_term,
        minsum_mode=minsum, batch_tile=256,
    )
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            pdc.sorted_dc, l, iterations=20, early_term=early_term,
            minsum_mode=minsum,
        )
    )(llr_s)

    hard_p = np.asarray(jax.device_get(out_p.hard))
    hard_s = np.asarray(jax.device_get(out_s.hard))
    # both paths are float32 with the same association order; knife-edge
    # sign flips from instruction-scheduling differences are possible in
    # principle, so allow a vanishing fraction of differing bits
    mismatch = (hard_p != hard_s).mean()
    assert mismatch < 1e-4, f"hard-decision mismatch rate {mismatch}"
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_p.is_codeword)),
        np.asarray(jax.device_get(out_s.is_codeword)),
    )
    if early_term:
        it_p = np.asarray(jax.device_get(out_p.iterations))
        it_s = np.asarray(jax.device_get(out_s.iterations))
        assert (it_p == it_s).mean() > 0.999, "iteration counts diverge"


@requires_tpu
@pytest.mark.parametrize("early_term", [False, True])
def test_lanes_matches_sorted_on_chip(early_term):
    """Compiled lane-major kernel (arbitrary-blocklength path) vs the XLA
    sorted decoder on hardware — the large-n analogue of the test above
    (capability target: gpu/device/kernel.cpp:237-293)."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted

    code = make_benchmark_code(2048, dv=3, dc=6, seed=5, with_G=False)
    ldc = to_lanes_device(code)
    B = 64
    llr = _awgn_llrs(code, B, snr_db=-0.5, seed=13)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_l = bp_decode_lanes(
        ldc, llr_s, iterations=20, early_term=early_term
    )
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            ldc.sorted_dc, l, iterations=20, early_term=early_term
        )
    )(llr_s)

    hard_l = np.asarray(jax.device_get(out_l.hard))
    hard_s = np.asarray(jax.device_get(out_s.hard))
    mismatch = (hard_l != hard_s).mean()
    assert mismatch < 1e-4, f"hard-decision mismatch rate {mismatch}"
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.is_codeword)),
        np.asarray(jax.device_get(out_s.is_codeword)),
    )
    if early_term:
        it_l = np.asarray(jax.device_get(out_l.iterations))
        it_s = np.asarray(jax.device_get(out_s.iterations))
        assert (it_l == it_s).mean() > 0.999, "iteration counts diverge"


@requires_tpu
def test_lanes_spill_matches_sorted_on_chip():
    """Compiled giant-edge-space (spill) lane-major kernel at n = 32768
    (n_pad = 131072, past round-3's fused wall) vs the XLA sorted decoder
    on hardware — the round-4 envelope extension (every cross-chain value
    materialised through VMEM spill refs, decode_lanes.SPILL_FREE_LIMIT).
    Slow: one cold Mosaic compile of ~2 minutes."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas import decode_lanes as dl
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted

    code = make_benchmark_code(32768, dv=3, dc=6, seed=7, with_G=False)
    ldc = to_lanes_device(code, transport="benes")
    assert ldc.n_pad > dl.SPILL_FREE_LIMIT  # really exercises spill
    B = 8
    llr = _awgn_llrs(code, B, snr_db=1.4, seed=17)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_l = dl.bp_decode_lanes(
        ldc, llr_s, iterations=12, early_term=True, minsum_mode="BP_MS"
    )
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            ldc.sorted_dc, l, iterations=12, early_term=True,
            minsum_mode="BP_MS",
        )
    )(llr_s)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.hard)),
        np.asarray(jax.device_get(out_s.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.iterations)),
        np.asarray(jax.device_get(out_s.iterations)),
    )


@requires_tpu
@pytest.mark.parametrize("early_term", [False, True])
def test_lanes_layered_matches_sorted_on_chip(early_term):
    """Compiled lane-major LAYERED kernel at n=8192 vs the XLA layered
    sorted decoder — the round-3 capability closure: layered schedules at
    blocklengths beyond the edge-major kernel's envelope now run fused
    (reference capability: gpu/device/kernel.cpp:57-74 layer loop at any
    n)."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device

    code = make_benchmark_code(8192, dv=3, dc=6, seed=5, with_G=False)
    code.layers = [
        np.arange(0, code.mc, 2, dtype=np.int32),
        np.arange(1, code.mc, 2, dtype=np.int32),
    ]
    ldc = to_lanes_device(code, with_layers=True)
    assert len(ldc.layer_words) == 2
    B = 32
    llr = _awgn_llrs(code, B, snr_db=-0.5, seed=13)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_l = bp_decode_lanes(
        ldc, llr_s, iterations=15, early_term=early_term, layered=True,
    )
    sdc = to_sorted_device(code, with_layers=True)
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            sdc, l, iterations=15, early_term=early_term, layered=True,
        )
    )(llr_s)

    hard_l = np.asarray(jax.device_get(out_l.hard))
    hard_s = np.asarray(jax.device_get(out_s.hard))
    mismatch = (hard_l != hard_s).mean()
    assert mismatch < 1e-4, f"hard-decision mismatch rate {mismatch}"
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.is_codeword)),
        np.asarray(jax.device_get(out_s.is_codeword)),
    )
    if early_term:
        it_l = np.asarray(jax.device_get(out_l.iterations))
        it_s = np.asarray(jax.device_get(out_s.iterations))
        assert (it_l == it_s).mean() > 0.999, "iteration counts diverge"


@requires_tpu
@pytest.mark.parametrize("mdtype", ["float32", "bfloat16"])
def test_bec_lanes_matches_sorted_on_chip(mdtype):
    """Compiled fused BEC (min-sum over the sign encoding) vs the XLA
    peeling decoder: the sign/zero algebra is exact in both dtypes, so
    symbols, decisions, iteration counts and resolution flags must be
    bit-identical on hardware too."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.bec_sorted import bec_decode_sorted_jit
    from libldpc_tpu.ops.channel import BEC_ERASURE
    from libldpc_tpu.ops.pallas.decode_lanes import bec_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

    code = make_benchmark_code(2048, dv=3, dc=6, seed=5, with_G=False)
    ldc = to_lanes_device(
        code, transport="clos" if mdtype == "bfloat16" else "benes"
    )
    B = 64
    rng = np.random.default_rng(23)
    cw = np.zeros((code.nc, B), np.uint8)
    erased = rng.random((code.nc, B)) < 0.42
    sym = np.where(erased, np.int8(BEC_ERASURE), cw.astype(np.int8))
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    sym_s = jnp.asarray(sym[vn_perm])
    cw_s = jnp.asarray(cw)

    out_l = bec_decode_lanes(
        ldc, sym_s, cw_s, iterations=15, message_dtype=mdtype,
    )
    out_s = bec_decode_sorted_jit(ldc.sorted_dc, sym_s, cw_s, iterations=15)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.hard)),
        np.asarray(jax.device_get(out_s.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.iterations)),
        np.asarray(jax.device_get(out_s.iterations)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.resolved)),
        np.asarray(jax.device_get(out_s.resolved)),
    )


@requires_tpu
@pytest.mark.parametrize("message_dtype", ["float32", "bfloat16"])
def test_clos_matches_benes_on_chip(message_dtype):
    """Compiled Clos transport (block matmuls + tile moves) vs the Beneš
    network on a random (non-block-local) code: same permutation, so hard
    decisions and iteration counts must be bit-identical per dtype."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
    from libldpc_tpu.ops.pallas.layout import to_pallas_device

    code = make_benchmark_code(1024, dv=3, dc=6, seed=1, with_G=False)
    pdc = to_pallas_device(code, with_clos=True)
    assert pdc.mxu_blocks_fwd is None, "random code unexpectedly block-local"
    B = 256
    llr = _awgn_llrs(code, B, snr_db=-0.5, seed=17)
    vn_perm = np.asarray(jax.device_get(pdc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_b = bp_decode_pallas(
        pdc, llr_s, iterations=20, early_term=True, batch_tile=256,
        message_dtype=message_dtype, permute="benes",
    )
    out_c = bp_decode_pallas(
        pdc, llr_s, iterations=20, early_term=True, batch_tile=256,
        message_dtype=message_dtype, permute="clos",
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_c.hard)),
        np.asarray(jax.device_get(out_b.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_c.iterations)),
        np.asarray(jax.device_get(out_b.iterations)),
    )


@requires_tpu
def test_lanes_clos_bf16_matches_fused_on_chip():
    """Compiled lane-major Clos/bf16 kernel vs the edge-major bf16 kernel
    on a code both accept: identical quantisation points, so outputs must
    agree bit-for-bit."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.pallas.layout import to_pallas_device

    # n=1024 keeps the edge-major side inside its reliable envelope
    # (n_pad 4096; the 25-stage Benes at n_pad 8192 fails to compile
    # on-chip — see sim/driver.py FUSED_EDGE_SPACE_LIMIT)
    code = make_benchmark_code(1024, dv=3, dc=6, seed=5, with_G=False)
    ldc = to_lanes_device(code, transport="clos")
    pdc = to_pallas_device(code)
    B = 64
    llr = _awgn_llrs(code, B, snr_db=-0.5, seed=13)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_l = bp_decode_lanes(
        ldc, llr_s, iterations=20, early_term=True,
        message_dtype="bfloat16",
    )
    out_f = bp_decode_pallas(
        pdc, llr_s, iterations=20, early_term=True, batch_tile=64,
        message_dtype="bfloat16",
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.hard)),
        np.asarray(jax.device_get(out_f.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_l.iterations)),
        np.asarray(jax.device_get(out_f.iterations)),
    )


@requires_tpu
def test_tanh_pallas_matches_sorted_on_chip():
    """Compiled BP_TANH (tanh-product CN form, the GPU reference's update)
    vs the XLA sorted decoder running the same form."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
    from libldpc_tpu.ops.pallas.layout import to_pallas_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted

    code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=False)
    pdc = to_pallas_device(code)
    B = 256
    llr = _awgn_llrs(code, B, snr_db=-1.0, seed=11)
    vn_perm = np.asarray(jax.device_get(pdc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_p = bp_decode_pallas(
        pdc, llr_s, iterations=20, early_term=True,
        minsum_mode="BP_TANH", batch_tile=256,
    )
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            pdc.sorted_dc, l, iterations=20, early_term=True,
            minsum_mode="BP_TANH",
        )
    )(llr_s)
    mismatch = (
        np.asarray(jax.device_get(out_p.hard))
        != np.asarray(jax.device_get(out_s.hard))
    ).mean()
    assert mismatch < 1e-4, f"hard-decision mismatch rate {mismatch}"
    it_p = np.asarray(jax.device_get(out_p.iterations))
    it_s = np.asarray(jax.device_get(out_s.iterations))
    assert (it_p == it_s).mean() > 0.999, "iteration counts diverge"


@requires_tpu
def test_pallas_sharded_step_on_chip():
    """One real sharded simulation step with use_pallas=True on the chip
    (single-device mesh — the multi-device sharding of the same step is
    exercised on the virtual CPU mesh in ``tests/test_sim.py``)."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas.layout import to_pallas_device
    from libldpc_tpu.parallel.mesh import FRAME_AXIS, make_sim_step
    from libldpc_tpu.utils.params import DecoderParams

    code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=True)
    pdc = to_pallas_device(code)
    mesh = jax.make_mesh((1,), (FRAME_AXIS,), devices=jax.devices()[:1])
    step = make_sim_step(
        pdc, "AWGN", DecoderParams(iterations=10), 256, mesh=mesh,
        use_pallas=True,
    )
    out = step(jax.random.PRNGKey(0), np.float32(2.0))
    frames = int(jax.device_get(out.frames))
    assert frames == 256
    assert int(jax.device_get(out.iter_sum)) > 0


@requires_tpu
def test_stream_kernels_match_batch_decoder_on_chip():
    """Compiled in-kernel streaming (edge-major AND lane-major) drained on
    preloaded frames must reproduce the batch decoder's error counts and
    iteration sums exactly — the Mosaic-mode twin of the interpret-mode
    drain-equivalence tests (tests/test_streaming_pallas.py)."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.channel import simulate_channel
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.pallas.layout import to_pallas_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted
    from libldpc_tpu.ops.streaming_pallas import (
        make_streaming_lanes_step, make_streaming_pallas_step,
    )
    from libldpc_tpu.utils.params import DecoderParams

    code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=True)
    pdc = to_pallas_device(code)
    ldc = to_lanes_device(code, transport="clos")
    B = 256
    iters = 12
    ch = simulate_channel(
        pdc, "AWGN", jax.random.PRNGKey(5), B, np.float32(-1.0)
    )
    out = bp_decode_sorted(
        pdc.sorted_dc, ch.llr, iterations=iters, early_term=True
    )
    # snapshot before the streaming states consume (donate) the arrays
    llr_np = np.asarray(jax.device_get(ch.llr))
    cw_np = np.asarray(jax.device_get(ch.codeword))
    bit_pos = np.asarray(jax.device_get(pdc.sorted_dc.bit_pos))
    errs = (
        np.asarray(jax.device_get(out.hard))[bit_pos] != cw_np[bit_pos]
    ).sum(axis=0)
    want = np.array(
        [errs.sum(), (errs > 0).sum(), B,
         np.asarray(jax.device_get(out.iterations)).sum()],
        dtype=np.int64,
    )

    def drain(init_fn, step_fn, preload):
        state = preload(init_fn())
        totals = np.zeros(4, dtype=np.int64)
        for step in range(40):
            state, acc = step_fn(
                state, jax.random.PRNGKey(step), np.float32(-1.0),
                np.bool_(False),
            )
            vals = jax.device_get(
                (acc.bit_errors, acc.frame_errors, acc.frames,
                 acc.iter_sum, acc.n_active)
            )
            totals += np.array([int(v) for v in vals[:4]])
            if int(vals[4]) == 0:
                return totals
        raise AssertionError("did not drain")

    # edge-major (the n=1024-class fast path), bf16 + MXU transport
    init_e, step_e = make_streaming_pallas_step(
        pdc, "AWGN",
        DecoderParams(iterations=iters, message_dtype="bfloat16"),
        B, chunk_iters=4,
    )

    def preload_e(st):
        return st._replace(
            llr_in=jnp.asarray(llr_np),
            codeword=jnp.asarray(cw_np.astype(np.int32)),
            done8=jnp.zeros((8, B), jnp.int32),
        )

    got_e = drain(init_e, step_e, preload_e)

    # lane-major (the large-n path), bf16 + Clos transport
    init_l, step_l = make_streaming_lanes_step(
        ldc, "AWGN",
        DecoderParams(iterations=iters, message_dtype="bfloat16"),
        B, chunk_iters=4,
    )
    real = np.zeros((ldc.nc_pad, 1), np.float32)
    real[np.asarray(jax.device_get(ldc.lane_of_vn))] = 1.0

    vn_of_lane = np.asarray(jax.device_get(ldc.vn_of_lane))

    def to_lanes(arr_np):
        v = arr_np.astype(np.float32)[np.clip(vn_of_lane, 0, code.nc - 1)]
        return (v * real).T

    def preload_l(st):
        return st._replace(
            llr_in=jnp.asarray(to_lanes(llr_np), jnp.float32),
            codeword=jnp.asarray(to_lanes(cw_np)).astype(jnp.int32),
            done=jnp.zeros((B, 128), jnp.int32),
        )

    got_l = drain(init_l, step_l, preload_l)

    # bf16 messages quantise identically across both stream kernels and
    # differently from the f32 batch decoder only at knife-edge frames;
    # on this input set the decisions coincide (asserted), so the counts
    # must match the batch decoder exactly
    np.testing.assert_array_equal(got_e, got_l)
    # frames always match; bit/frame/iter counts may differ from the f32
    # batch decoder only via bf16 knife-edge sign flips (measured: 4 bits
    # of ~50K at -1 dB) — require exact frame count and <=0.1% relative
    # deviation elsewhere
    assert got_e[2] == want[2]
    assert abs(int(got_e[0]) - int(want[0])) <= max(8, want[0] // 1000), (
        got_e, want)
    assert abs(int(got_e[1]) - int(want[1])) <= 2, (got_e, want)
    assert abs(int(got_e[3]) - int(want[3])) <= max(8, want[3] // 1000), (
        got_e, want)


@requires_tpu
@pytest.mark.parametrize("early_term", [False, True])
def test_qc_lanes_matches_sorted_on_chip(early_term):
    """Compiled structure-aware QC transport (one Z-lane cyclic roll per
    base edge, round 4) vs the XLA sorted decoder on hardware, f32
    bit-exact — the Mosaic twin of
    tests/test_lanes.py::TestQCTransport::test_f32_matches_sorted_bitexact
    at a deployed-code-class size (n=8192, Z=512)."""
    from libldpc_tpu.models import make_qc_benchmark_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted

    code = make_qc_benchmark_code(8192, 512, dv=3, dc=6, seed=3)
    ldc = to_lanes_device(code, transport="qc")
    assert ldc.transport == "qc" and ldc.qc_z == 512
    B = 64
    llr = _awgn_llrs(code, B, snr_db=1.2, seed=23)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_q = bp_decode_lanes(
        ldc, llr_s, iterations=16, early_term=early_term
    )
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            ldc.sorted_dc, l, iterations=16, early_term=early_term
        )
    )(llr_s)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.hard)),
        np.asarray(jax.device_get(out_s.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.iterations)),
        np.asarray(jax.device_get(out_s.iterations)),
    )


@requires_tpu
@pytest.mark.parametrize("dtype,mode", [
    ("bfloat16", "BP"), ("int8", "BP_MS")])
def test_qc_sub32_matches_clos_on_chip(dtype, mode):
    """Compiled QC transport vs the generic Clos transport at reduced
    message precision: both move exact byte patterns, so hard decisions
    and iteration counts must agree bit-for-bit on hardware too."""
    from libldpc_tpu.models import make_qc_benchmark_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

    code = make_qc_benchmark_code(1536, 256, dv=3, dc=6, seed=5)
    ldc_q = to_lanes_device(code, transport="qc")
    ldc_c = to_lanes_device(code, transport="clos")
    assert ldc_q.transport == "qc" and ldc_c.transport == "clos"
    B = 64
    llr = _awgn_llrs(code, B, snr_db=0.5, seed=29)
    vn_perm = np.asarray(jax.device_get(ldc_q.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    kw = dict(iterations=12, early_term=True, minsum_mode=mode,
              message_dtype=dtype)
    out_q = bp_decode_lanes(ldc_q, llr_s, **kw)
    out_c = bp_decode_lanes(ldc_c, llr_s, **kw)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.hard)),
        np.asarray(jax.device_get(out_c.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.iterations)),
        np.asarray(jax.device_get(out_c.iterations)),
    )


@requires_tpu
@pytest.mark.parametrize("early_term", [False, True])
def test_wifi_z81_qc_lanes_matches_sorted_on_chip(early_term):
    """Round 5: the REAL 802.11n n=1944 Z=81 code on the arbitrary-Z qc
    transport (embedded two-roll form, Zq=128 > Z=81 — fake lanes inside
    every circulant) vs the XLA sorted decoder on hardware, f32
    bit-exact.  Z=81 is not a 128-multiple: round 4 could not run this
    code on the structure-aware transport at all."""
    from libldpc_tpu.models import wifi_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted

    code = wifi_code(1944, with_G=False)
    ldc = to_lanes_device(code, transport="qc")
    assert ldc.transport == "qc" and ldc.qc_z == 81 and ldc.qc_zq == 128
    B = 64
    llr = _awgn_llrs(code, B, snr_db=1.2, seed=37)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_q = bp_decode_lanes(
        ldc, llr_s, iterations=16, early_term=early_term
    )
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            ldc.sorted_dc, l, iterations=16, early_term=early_term
        )
    )(llr_s)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.hard)),
        np.asarray(jax.device_get(out_s.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.iterations)),
        np.asarray(jax.device_get(out_s.iterations)),
    )


@requires_tpu
@pytest.mark.parametrize("dtype,mode", [
    ("bfloat16", "BP"), ("int8", "BP_MS")])
def test_wifi_z81_sub32_matches_clos_on_chip(dtype, mode):
    """802.11n Z=81 at reduced message precision: qc (embedded rolls) vs
    the generic Clos transport — exact byte movement either way, so hard
    decisions and iteration counts must agree bit-for-bit on chip."""
    from libldpc_tpu.models import wifi_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

    code = wifi_code(1944, with_G=False)
    ldc_q = to_lanes_device(code, transport="qc")
    ldc_c = to_lanes_device(code, transport="clos")
    assert ldc_q.transport == "qc" and ldc_c.transport == "clos"
    B = 64
    llr = _awgn_llrs(code, B, snr_db=1.0, seed=41)
    vn_perm = np.asarray(jax.device_get(ldc_q.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    kw = dict(iterations=12, early_term=True, minsum_mode=mode,
              message_dtype=dtype)
    out_q = bp_decode_lanes(ldc_q, llr_s, **kw)
    out_c = bp_decode_lanes(ldc_c, llr_s, **kw)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.hard)),
        np.asarray(jax.device_get(out_c.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.iterations)),
        np.asarray(jax.device_get(out_c.iterations)),
    )


@requires_tpu
@pytest.mark.parametrize("dtype,mode", [
    ("float32", "BP_MS"), ("int8", "BP_MS")])
def test_wifi_z81_layered_fast_engine_on_chip(dtype, mode):
    """802.11n Z=81 on the FAST layered engine (app-update formulation,
    round 5 — kernel_layered_qc) through the arbitrary-Z qc transport:
    the compiled Mosaic kernel must reproduce the engine's NumPy golden
    recursion bit-for-bit on hardware (min-sum family — exact algebra)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    from golden import layered_qc_golden

    from libldpc_tpu.models import wifi_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

    code = wifi_code(1944, with_G=False)
    ldc = to_lanes_device(code, transport="qc", with_layers=True)
    assert ldc.transport == "qc" and len(ldc.qc_layers) == 12
    B = 64
    llr = _awgn_llrs(code, B, snr_db=1.2, seed=43)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    vinv = np.empty_like(vn_perm)
    vinv[vn_perm] = np.arange(code.nc)
    llr_s = jnp.asarray(llr[vn_perm])

    out_q = bp_decode_lanes(
        ldc, llr_s, iterations=12, early_term=True, layered=True,
        minsum_mode=mode, message_dtype=dtype,
    )
    g_llr, g_it, g_cw = layered_qc_golden(
        code, llr, iterations=12, early_term=True, minsum_mode=mode,
        message_dtype=dtype,
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.iterations)), g_it)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.is_codeword)), g_cw)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.llr_out))[vinv], g_llr)


@requires_tpu
def test_clos_chain_spill_matches_sorted_on_chip():
    """Compiled bf16/Clos kernel past the round-4 fill wall (n = 18432,
    fill 55296 — crashed the remote compiler before the round-5 chain
    spill, benchmarks/res_tp_bl_scale.txt) vs the XLA sorted decoder on
    hardware: hard decisions must track (bf16 message quantisation may
    flip rare marginal frames; convergence flags/iterations must agree
    where both converge).  Slow: one cold Mosaic compile of ~1 minute."""
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.pallas import decode_lanes as dl
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted

    code = make_benchmark_code(18432, dv=3, dc=6, seed=7, with_G=False)
    ldc = to_lanes_device(code, transport="clos")
    assert dl._spill_for(ldc)  # really exercises the chain spill
    assert ldc.n_pad <= dl.SPILL_FREE_LIMIT  # ... via the FILL trigger
    B = 8
    llr = _awgn_llrs(code, B, snr_db=1.4, seed=23)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_l = dl.bp_decode_lanes(
        ldc, llr_s, iterations=12, early_term=True, minsum_mode="BP_MS",
        message_dtype="bfloat16",
    )
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            ldc.sorted_dc, l, iterations=12, early_term=True,
            minsum_mode="BP_MS",
        )
    )(llr_s)
    hard_l = np.asarray(jax.device_get(out_l.hard))
    hard_s = np.asarray(jax.device_get(out_s.hard))
    # bf16 message quantisation diverges bit-wise on NON-converged
    # frames at a waterfall operating point (measured 0.94% raw bit
    # mismatch here, all of it on errored frames); the record's own
    # oracle (res_tp_bl_scale.txt fer columns) is per-frame error
    # status — the all-zero codeword was sent, so an errored frame is
    # one with any 1 decision
    err_l = hard_l.any(axis=0)
    err_s = hard_s.any(axis=0)
    np.testing.assert_array_equal(err_l, err_s)
    # clean frames agree exactly (all-zero on both paths)
    clean = ~err_l
    if clean.any():
        np.testing.assert_array_equal(hard_l[:, clean], hard_s[:, clean])


@requires_tpu
def test_nr_z208_qc_lanes_matches_sorted_on_chip():
    """Round 5: a 5G-NR-structured code at Z=208 — a lifting size whose
    circulants span TWO 128-lane tiles (Zq=256), so the embedded rolls
    cross tile boundaries — vs the XLA sorted decoder on hardware, f32
    bit-exact at a converging operating point (the committed record's
    check, benchmarks/res_qc_deployed.txt Z=208 section)."""
    from libldpc_tpu.models import make_nr_like_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted

    code = make_nr_like_code(bg=2, Z=208, seed=7, with_G=False,
                             with_layers=True)
    ldc = to_lanes_device(code, transport="qc")
    assert ldc.transport == "qc" and ldc.qc_z == 208 and ldc.qc_zq == 256
    B = 64
    llr = _awgn_llrs(code, B, snr_db=-3.0, seed=41)
    llr[np.asarray(code.puncture)] = 0.0  # NR 2Z info puncture
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])

    out_q = bp_decode_lanes(ldc, llr_s, iterations=16, early_term=True)
    out_s = jax.jit(
        lambda l: bp_decode_sorted(
            ldc.sorted_dc, l, iterations=16, early_term=True
        )
    )(llr_s)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.hard)),
        np.asarray(jax.device_get(out_s.hard)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out_q.iterations)),
        np.asarray(jax.device_get(out_s.iterations)),
    )


@requires_tpu
def test_stream_layered_fast_matches_batch_on_chip():
    """Compiled streaming x fast-layered-engine chunk
    (kernel_stream_layered_qc) drained on preloaded frames must
    reproduce the batch layered-fast decoder's counts exactly — the
    Mosaic-mode twin of tests/test_lanes.py::TestStreamingLayeredFast,
    on the real 802.11n code."""
    from libldpc_tpu.models import wifi_code
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.streaming_pallas import make_streaming_lanes_step
    from libldpc_tpu.utils.params import DecoderParams

    code = wifi_code(1944, with_G=False)
    ldc = to_lanes_device(code, transport="qc", with_layers=True)
    assert ldc.qc_layers
    B = 256
    iters = 12
    llr = _awgn_llrs(code, B, snr_db=1.5, seed=53)
    vn_perm = np.asarray(jax.device_get(ldc.sorted_dc.vn_perm))
    llr_s = jnp.asarray(llr[vn_perm])
    mode = ("BP_OMS", 1.0, 0.375)
    out = bp_decode_lanes(
        ldc, llr_s, iterations=iters, early_term=True, layered=True,
        minsum_mode=mode, message_dtype="int8",
    )
    bit_pos = np.asarray(jax.device_get(ldc.sorted_dc.bit_pos))
    hard = np.asarray(jax.device_get(out.hard))
    errs = (hard[bit_pos] != 0).sum(axis=0)  # all-zero codeword sent
    want = np.array(
        [errs.sum(), (errs > 0).sum(), B,
         np.asarray(jax.device_get(out.iterations)).sum()],
        dtype=np.int64,
    )

    init_fn, step_fn = make_streaming_lanes_step(
        ldc, "AWGN",
        DecoderParams(iterations=iters, type=mode[0], ms_scale=mode[1],
                      ms_offset=mode[2], message_dtype="int8",
                      layered=True),
        B, chunk_iters=4,
    )
    # DecoderParams carries the offset separately; make sure the stream
    # uses the identical CN form tuple
    state = init_fn()
    real = np.zeros((ldc.nc_pad, 1), np.float32)
    real[np.asarray(jax.device_get(ldc.lane_of_vn))] = 1.0
    llr_l = (np.asarray(jax.device_get(
        jnp.take(llr_s, ldc.vn_of_lane, axis=0, mode="fill",
                 fill_value=0.0))) * real).T
    state = state._replace(
        llr_in=jnp.asarray(llr_l, jnp.float32),
        codeword=jnp.zeros((B, ldc.nc_pad), jnp.int32),
        done=jnp.zeros((B, 128), jnp.int32),
    )
    totals = np.zeros(4, dtype=np.int64)
    for step in range(40):
        state, acc = step_fn(
            state, jax.random.PRNGKey(step), np.float32(1.5),
            np.bool_(False),
        )
        vals = jax.device_get(
            (acc.bit_errors, acc.frame_errors, acc.frames,
             acc.iter_sum, acc.n_active)
        )
        totals += np.array([int(v) for v in vals[:4]])
        if int(vals[4]) == 0:
            break
    np.testing.assert_array_equal(totals, want)
