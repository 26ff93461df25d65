"""Headline benchmark: decoded frames/s on the flagship config.

Config (BASELINE.json config 1): bundled k=128 / transmitted-n=1024 code,
AWGN channel, sum-product BP, 50 iterations, single SNR point.  The timed
unit is the full simulation step — on-device encode + AWGN + LLRs + decode +
error counting — i.e. the same work the reference does per frame in
``ldpc_sim::start``.  Early termination is DISABLED so every frame runs all
50 iterations (deterministic workload, directly comparable to the
reference's ``--no-early-term`` run recorded in ``baseline_measured.json``).

Prints exactly one JSON line:
``{"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}``
where ``vs_baseline`` is the speedup over the reference's single-thread CPU
simulator on the identical workload (the north-star target is >= 100).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    try:  # persistent compile cache: cold axon compiles can take minutes
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from libldpc_tpu.models import LDPCCode, make_benchmark_code
    from libldpc_tpu.parallel.mesh import make_sim_step
    from libldpc_tpu.ops.sorted import to_sorted_device
    from libldpc_tpu.utils.params import DecoderParams

    h = "/root/reference/tests/code/h.txt"
    g = "/root/reference/tests/code/g.txt"
    if os.path.exists(h):
        code = LDPCCode.from_files(h, g)
    else:
        code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=True)

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    # batch sized so per-step compute (~30 ms) dominates per-dispatch
    # latency (~15-20 ms on tunneled backends; negligible locally)
    batch = int(os.environ.get("BENCH_BATCH", 16384 if on_tpu else 256))
    dec = DecoderParams(early_term=False, iterations=50, type="BP")
    key = jax.random.PRNGKey(0)
    snr = np.float32(0.0)

    def measure(step):
        # compile + warmup (pre-split the step keys off the timed path);
        # int() forces a real host read — block_until_ready over a
        # tunneled backend may return before the kernel finishes
        int(step(key, snr).bit_errors)
        max_steps = 64
        keys = [jax.random.fold_in(key, i) for i in range(max_steps)]
        jax.block_until_ready(keys)
        # estimate single-step time, then size the timed run to ~3s
        t0 = time.perf_counter()
        int(step(keys[-1], snr).bit_errors)
        t_step = time.perf_counter() - t0
        n_steps = max(3, min(max_steps - 1, int(3.0 / max(t_step, 1e-4))))
        # timed steps, async-dispatched; ONE stream-ordered host read at
        # the end (device execution is in-order, so the last step's
        # counters completing implies all prior steps completed — per-step
        # reads would serialise ~20 ms of tunnel round-trip into every
        # step and understate throughput ~2x)
        t0 = time.perf_counter()
        outs = [step(keys[i], snr) for i in range(n_steps)]
        frames = n_steps * batch + int(outs[-1].frames) - batch
        return frames / (time.perf_counter() - t0), n_steps

    sdc = to_sorted_device(code)
    fps, n_steps = measure(make_sim_step(sdc, "AWGN", dec, batch))
    pallas_on = False

    # Opportunistically try the fused Pallas kernel under a watchdog: warm
    # compile caches make it a few seconds, but a cold Mosaic compile on a
    # tunneled backend can take many minutes — fall back on timeout.
    # BENCH_PALLAS=0 disables the attempt, =1 forces it with no watchdog.
    # bf16 message transport + (when the code is block-local) the MXU
    # one-hot-matmul permutation is the fastest configuration — measured
    # bit-identical hard decisions to float32+Benes at 50 iterations
    # (benchmarks/kernel_variants_r2.txt); float32 is the fallback.
    # The sum-product CN update is computed in the phi (log-tanh) domain
    # — Gallager's f-function form — when it measures faster: it carries
    # the pairwise box-plus's extrinsic dynamic range (measured floor
    # FER 1.9e-5 vs box-plus 2.0e-5 at -3 dB) at ~1.26x its speed.  The
    # tanh-product form (the reference GPU's own update) is faster still
    # but its 17.3 extrinsic cap measurably raises the deep error floor
    # (6.1e-5 at -3 dB) and is therefore NOT used for the headline — see
    # benchmarks/soak_sweep_tanh.txt.
    want_pallas = os.environ.get("BENCH_PALLAS", "auto")
    message_dtype = "float32"
    cn_form = "boxplus"
    if on_tpu and want_pallas != "0":
        import dataclasses
        import signal

        def _timeout(signum, frame):
            raise TimeoutError

        try:
            if want_pallas != "1":
                signal.signal(signal.SIGALRM, _timeout)
                signal.alarm(420)
            from libldpc_tpu.ops.pallas.layout import to_pallas_device

            pdc = to_pallas_device(code)
            for dt, md in (("BP_PHI", "bfloat16"), ("BP", "bfloat16"),
                           ("BP", "float32")):
                dec_p = dataclasses.replace(
                    dec, message_dtype=md, type=dt
                )
                fps_p, n_p = measure(
                    make_sim_step(pdc, "AWGN", dec_p, batch, use_pallas=True)
                )
                if fps_p > fps:
                    fps, n_steps, pallas_on = fps_p, n_p, True
                    message_dtype = md
                    cn_form = "phi" if dt == "BP_PHI" else "boxplus"
        except Exception:
            pass
        finally:
            signal.alarm(0)

    baseline_fps = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "baseline_measured.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            baseline_fps = json.load(f)["frames_per_s"]["bp_no_early_term"]

    # VPU roofline accounting (see libldpc_tpu/utils/roofline.py and
    # docs/DESIGN.md "Performance model"): price the winning path's work
    # per frame and relate measured frames/s to the assumed VPU peak
    from libldpc_tpu.utils import roofline as rl

    if pallas_on:
        mxu_pairs = (
            0 if pdc.mxu_blocks_fwd is None
            else int(pdc.mxu_blocks_fwd.shape[0])
        )
        cost = rl.decode_frame_cost(
            nc=sdc.nc, nnz=sdc.nnz, cn_classes=sdc.cn_classes,
            iterations=50, cn_form=cn_form, early_term=False,
            n_pad=pdc.n_pad, benes_stages=sum(pdc.benes_active),
            mxu_pairs=mxu_pairs,
        )
    else:
        cost = rl.decode_frame_cost(
            nc=sdc.nc, nnz=sdc.nnz, cn_classes=sdc.cn_classes,
            iterations=50, minsum=False, early_term=False,
        )

    result = {
        "metric": "decoded frames/s (n=1024, BP, 50 iters, AWGN, no early-term)",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2) if baseline_fps else None,
        "batch": batch,
        "platform": platform,
        "pallas": pallas_on,
        "message_dtype": message_dtype if pallas_on else None,
        "cn_form": cn_form,
        "steps": n_steps,
        "model_flops_per_frame": round(cost.total_ops),
        "model_split": cost.as_dict(),
        "vpu_peak_ops_assumed": rl.VPU_PEAK_OPS,
        "roofline_pct": round(rl.roofline_pct(fps, cost), 1),
        "mxu_pct": round(
            100.0 * fps * cost.mxu_flops / rl.MXU_PEAK_FLOPS, 2
        ) if cost.mxu_flops else 0.0,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
