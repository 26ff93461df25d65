"""int8 integer-lattice min-sum on the lane-major kernel: parity + speed.

Round-4 capability (verdict item: "int8 on the lane-major kernel"): the
fastest message dtype, previously MXU-block-local-only (edge-major kernel),
now runs on arbitrary unstructured blocklengths via s8 one-hot Clos
matmuls.  This harness produces, on one chip at n = 8192 (3,6)-regular
unstructured:

1. a waterfall FER parity table int8 vs float32 (same driver, same seeds,
   identical everything but the message lattice) + one deeper point;
2. a throughput row per dtype (batch decode, fixed iterations) so the
   speed side of the trade is recorded next to the accuracy side.

Writes ``res_int8_lanes.txt``.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--fec", type=int, default=100)
    ap.add_argument("--max-frames", type=int, default=400_000)
    ap.add_argument("--snrs", default="0.8,1.2,1.6,2.0")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--tp-iters", type=int, default=32)
    ap.add_argument("--outdir",
                    default=os.path.dirname(os.path.abspath(__file__)))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.sim.driver import Simulator
    from libldpc_tpu.utils.params import (
        ChannelParams, DecoderParams, SimulationParams,
    )

    code = make_benchmark_code(args.n, dv=3, dc=6, seed=1, with_G=False)
    snrs = [float(v) for v in args.snrs.split(",")]
    rows = []

    results = {}
    for dtype in ("float32", "int8"):
        sim = Simulator(
            code,
            DecoderParams(iterations=args.iters, type="BP_MS",
                          message_dtype=dtype),
            ChannelParams(seed=3, x_values=snrs),
            SimulationParams(
                batch_size=args.batch, fec=args.fec,
                max_frames=args.max_frames,
                # both dtypes batch-stepped for a like-for-like parity run
                # (streaming changes the frame schedule, not the decode)
                streaming=False,
            ),
            use_pallas=True,
            verbose=False,
        )
        print(f"[{dtype}] decode_path: {sim.decode_path}", flush=True)
        res = sim.start()
        results[dtype] = res
        for i, s in enumerate(snrs):
            print(f"[{dtype}] snr={s:g} fer={res.fer[i]:.3e} "
                  f"({int(res.fec[i])}/{int(res.frames[i])}) "
                  f"ber={res.ber[i]:.3e} avg_iter={res.avg_iter[i]:.1f}",
                  flush=True)

    rf, ri = results["float32"], results["int8"]
    for i, s in enumerate(snrs):
        # two-proportion z on FER
        p1, n1 = rf.fer[i], rf.frames[i]
        p2, n2 = ri.fer[i], ri.frames[i]
        p = (rf.fec[i] + ri.fec[i]) / max(n1 + n2, 1)
        se = np.sqrt(max(p * (1 - p) * (1 / max(n1, 1) + 1 / max(n2, 1)),
                         1e-30))
        z = (p1 - p2) / se
        rows.append(
            f"{s:g} {p1:.4e} {int(rf.fec[i])}/{int(n1)} "
            f"{p2:.4e} {int(ri.fec[i])}/{int(n2)} "
            f"{rf.avg_iter[i]:.2f} {ri.avg_iter[i]:.2f} {z:+.2f}")

    # ---- throughput rows: fixed-iteration batch decode per dtype --------
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.channel import awgn_channel
    from libldpc_tpu.ops.sorted import to_sorted_device

    sdc = to_sorted_device(code)
    ch = awgn_channel(sdc, jax.random.PRNGKey(0), args.batch,
                      jnp.float32(1.4))
    tp_rows = []
    for dtype, transport in (("float32", "benes"), ("bfloat16", "clos"),
                             ("int8", "clos")):
        ldc = to_lanes_device(code, transport=transport)
        fn = functools.partial(
            bp_decode_lanes, ldc, ch.llr, iterations=args.tp_iters,
            early_term=False, minsum_mode="BP_MS", message_dtype=dtype,
        )
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out.llr_out))
        tc = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn()
            float(jnp.sum(out.llr_out))
            dt = (time.perf_counter() - t0) / 4
            best = dt if best is None else min(best, dt)
        fps = args.batch / best
        tp_rows.append(
            f"{dtype} {transport} {best / args.batch * 1e6:.2f} {fps:.0f} "
            f"{fps * code.nct / 1e6:.2f}")
        print(f"tp {dtype:9s}/{transport}: {best/args.batch*1e6:8.2f} "
              f"us/frame  {fps:8.0f} frames/s  "
              f"{fps*code.nct/1e6:8.2f} Mbits/s (compile {tc:.0f}s)",
              flush=True)

    # ---- streaming ET rows: driver-level sustained sweep per dtype ------
    # int8 rides the lane-major in-kernel streaming path since round 4
    # (sim/driver.py routes int8+lanes through make_streaming_lanes_step);
    # one waterfall point, device-window TIME/FRAME from the results
    st_rows = []
    for dtype in ("bfloat16", "int8"):
        sim = Simulator(
            code,
            DecoderParams(iterations=args.iters, type="BP_MS",
                          message_dtype=dtype),
            ChannelParams(seed=5, x_values=[snrs[-1]]),
            SimulationParams(
                batch_size=args.batch, fec=args.fec,
                max_frames=args.max_frames, streaming=True,
            ),
            use_pallas=True,
            verbose=False,
        )
        assert sim._streaming, sim.decode_path
        res = sim.start()
        us = res.time[0] * 1e6
        st_rows.append(
            f"{dtype} {snrs[-1]:g} {us:.2f} {1e6 / us:.0f} "
            f"{res.avg_iter[0]:.2f} {int(res.frames[0])}")
        print(f"stream {dtype:9s}: {us:8.2f} us/frame  "
              f"{1e6 / us:8.0f} frames/s  avg_iter {res.avg_iter[0]:.2f} "
              f"({int(res.frames[0])} frames)", flush=True)

    path = os.path.join(args.outdir, "res_int8_lanes.txt")
    with open(path, "w") as f:
        f.write(
            f"# int8 lane-major kernel at n={args.n} (3,6)-regular "
            f"unstructured, BP_MS, {args.iters} iters ET, one v5e chip\n"
            f"# parity: snr fer_f32 k/n_f32 fer_int8 k/n_int8 "
            f"avgiter_f32 avgiter_int8 z\n"
            + "\n".join(rows) + "\n"
            f"# throughput ({args.tp_iters} iters no-ET, batch "
            f"{args.batch}): dtype transport us/frame frames/s Mbits/s\n"
            + "\n".join(tp_rows) + "\n"
            f"# in-kernel streaming ET (driver sweep, snr {snrs[-1]:g}): "
            f"dtype snr us/frame frames/s avg_iter frames\n"
            + "\n".join(st_rows) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
