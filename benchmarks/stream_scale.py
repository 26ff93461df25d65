"""In-kernel streaming ET at giant blocklengths: lanes (spill) vs XLA.

The driver's default path for early-terminating sweeps is streaming
compaction; round 3 measured the lane-major in-kernel version at 2.4-3.1x
the XLA streaming path at n = 8192.  Round 4's spill form extends the
fused kernel to n_pad = 131072 (the guarded envelope — n_pad = 262144
compiled once during round-4 bring-up but crashes the production
toolchain, see sim/driver.py:LANES_EDGE_SPACE_LIMIT and the failure rows
in res_tp_bl_scale.txt) — this harness measures whether the streaming
advantage survives at n = 32768 (batch-mode f32/Benes measures only
0.53-0.70x XLA per pass, so streaming is where the fused routing must
earn its keep).  n = 65536 (n_pad 262144) rows hit the guarded XLA
fallback by design.

Per n: sustained frames/s over a fixed frame quota at an SNR with a
realistic avg_iter, for (a) the XLA streaming step and (b) the lane-major
in-kernel streaming step (f32/Benes — bf16/Clos stays walled by the
blockmul program-size limit at these sizes).  Writes
``res_stream_scale.txt``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bl-list", default="8192,32768")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--snr-db", type=float, default=1.8,
                    help="above the (3,6) threshold: typical avg_iter ~10")
    ap.add_argument("--frames", type=int, default=50_000)
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
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import to_sorted_device
    from libldpc_tpu.ops.streaming import make_streaming_step
    from libldpc_tpu.ops.streaming_pallas import make_streaming_lanes_step
    from libldpc_tpu.utils.params import DecoderParams

    B = args.batch
    dec = DecoderParams(iterations=args.iters, type="BP_MS")
    rows = []

    def run(name, init_fn, step_fn, x):
        # warm (compile) outside the clock
        state = init_fn()
        state, acc = step_fn(state, jax.random.PRNGKey(999),
                             np.float32(x), np.bool_(True))
        int(jax.device_get(acc.frames))
        state = init_fn()
        frames = 0
        iters_sum = 0
        pending = []
        t0 = time.perf_counter()
        k = 0
        while frames < args.frames:
            while len(pending) < 4:
                state, acc = step_fn(state, jax.random.PRNGKey(k),
                                     np.float32(x), np.bool_(True))
                k += 1
                pending.append(acc)
            a = pending.pop(0)
            fr, it = jax.device_get((a.frames, a.iter_sum))
            frames += int(fr)
            iters_sum += int(it)
        for a in pending:
            fr, it = jax.device_get((a.frames, a.iter_sum))
            frames += int(fr)
            iters_sum += int(it)
        dt = time.perf_counter() - t0
        fps = frames / dt
        avg_iter = iters_sum / max(frames, 1)
        print(f"  {name:22s} {fps:9.0f} frames/s  "
              f"{dt / frames * 1e6:8.2f} us/frame  avg_iter {avg_iter:.1f} "
              f"({frames} frames)", flush=True)
        return fps, avg_iter, frames

    for n in [int(v) for v in args.bl_list.split(",")]:
        print(f"--- n = {n}, snr {args.snr_db} dB ---", flush=True)
        code = make_benchmark_code(n, dv=3, dc=6, seed=1)
        sdc = to_sorted_device(code)
        init_x, step_x = make_streaming_step(
            sdc, "AWGN", dec, B, chunk_iters=0,
        )
        fps_x, ai_x, _ = run("xla_streaming", init_x, step_x, args.snr_db)
        ldc = to_lanes_device(code, transport="benes")
        init_l, step_l = make_streaming_lanes_step(
            ldc, "AWGN", dec, B, chunk_iters=0,
        )
        fps_l, ai_l, _ = run("lanes_streaming_f32", init_l, step_l,
                             args.snr_db)
        rows.append(
            f"{n} {args.snr_db:g} {fps_x:.0f} {ai_x:.2f} "
            f"{fps_l:.0f} {ai_l:.2f} {fps_l / fps_x:.2f}x")

    path = os.path.join(args.outdir, "res_stream_scale.txt")
    with open(path, "w") as f:
        f.write(
            f"# streaming ET at scale: XLA vs lane-major in-kernel "
            f"(f32/benes), (3,6)-regular, BP_MS {args.iters} iters cap, "
            f"batch {B}, {args.frames}+ frames/point, one v5e chip\n"
            "n snr xla_fps xla_avgiter lanes_fps lanes_avgiter vs_xla\n"
            + "\n".join(rows) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
