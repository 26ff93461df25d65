"""Sustained soak: the full driver surface under load.

Bundled k=128/n=1024 code, AWGN, BP, 50 iterations, early termination,
fec 3000 / max 2M frames per point, with results file and JSON
checkpointing active — the everything-on configuration a long production
sweep would use.  (Per-error forensic logging forces the batch path and
is exercised separately; the streaming driver is the ET default.)

Usage: python benchmarks/soak.py [--batch 8192] [--pallas 1]
Writes ``benchmarks/soak_sweep.txt``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--type", default="BP",
                    help="decoder type (BP / BP_TANH / BP_MS / ...)")
    ap.add_argument("--ms-scale", type=float, default=None,
                    help="NMS/OMS alpha (defaults to DecoderParams').")
    ap.add_argument("--ms-offset", type=float, default=None,
                    help="NMS/OMS beta (defaults to DecoderParams').")
    ap.add_argument("--fec", type=int, default=3000)
    ap.add_argument("--max-frames", type=int, default=2_000_000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "soak_sweep.txt"))
    args = ap.parse_args()

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from libldpc_tpu.models import LDPCCode, make_benchmark_code
    from libldpc_tpu.sim.driver import Simulator
    from libldpc_tpu.utils.params import (
        ChannelParams, DecoderParams, SimulationParams,
    )

    h = "/root/reference/tests/code/h.txt"
    g = "/root/reference/tests/code/g.txt"
    if os.path.exists(h):
        code = LDPCCode.from_files(h, g)
    else:
        code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=True)

    tmp_res = args.out + ".res.tmp"
    tmp_ckpt = args.out + ".ckpt.tmp"
    ms_kw = {}
    if args.ms_scale is not None:
        ms_kw["ms_scale"] = args.ms_scale
    if args.ms_offset is not None:
        ms_kw["ms_offset"] = args.ms_offset
    sim = Simulator(
        code,
        DecoderParams(iterations=50, early_term=True, type=args.type,
                      message_dtype=args.dtype, **ms_kw),
        ChannelParams(seed=3, x_range=(-8.0, -2.9, 1.0), type="AWGN"),
        SimulationParams(
            batch_size=args.batch, fec=args.fec, max_frames=args.max_frames,
            result_file=tmp_res, checkpoint_file=tmp_ckpt,
        ),
        use_pallas=bool(args.pallas),
        verbose=True,
    )
    t0 = time.perf_counter()
    res = sim.start()
    wall = time.perf_counter() - t0
    total = int(res.frames.sum())

    with open(args.out, "w") as f:
        f.write(
            "# Sustained soak: bundled k=128/n=1024 code, AWGN, BP, 50\n"
            "# iterations, early termination, "
            f"batch {args.batch}, fec {args.fec} / max "
            f"{args.max_frames} frames per point — with results file and\n"
            "# JSON checkpointing active.  One TPU v5e chip, in-kernel\n"
            f"# streaming driver (pallas={bool(args.pallas)}, "
            f"dtype={args.dtype}, type={args.type}).\n#\n"
            f"# {total:,} frames decoded in {wall:.1f} s "
            f"({total / wall / 1e3:.1f}K frames/s sustained across the\n"
            "# whole sweep; per-point frame_time below is the IO-excluded\n"
            "# device-window clock).\n#\n"
            "#   snr  fer        ber        frames    avg_iter  frame_time\n"
        )
        for i, x in enumerate(res.x_values):
            f.write(
                f"{x:.1f}  {res.fer[i]:.3e}  {res.ber[i]:.3e}  "
                f"{int(res.frames[i]):<9} {res.avg_iter[i]:<9.1f} "
                f"{res.time[i]:.6f}\n"
            )
    for t in (tmp_res, tmp_ckpt):
        if os.path.exists(t):
            os.remove(t)
    print(f"\nwrote {args.out}: {total:,} frames in {wall:.1f}s "
          f"= {total / wall / 1e3:.1f}K f/s")


if __name__ == "__main__":
    main()
