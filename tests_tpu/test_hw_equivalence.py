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
