"""int8 OMS parity at deployed scale: real 802.11n through the QC transport.

Round-4 left the int8 lattice with bit-level anchors at n <= 8192 and a
statistical parity table only for the n=1024 edge-major path
(``PARITY_int8.md``); this harness closes the gap at deployed scale: the
REAL bundled IEEE 802.11n rate-1/2 n=1944 (Z=81) code, decoded by the
arbitrary-Z structure-aware ``"qc"`` lane-major transport, BP_OMS
(offset min-sum — the correction that recovers most of plain min-sum's
FER gap on the int8 lattice, see PARITY_int8.md round-3 addendum), f32 vs
int8 at the *identical* algorithm: the f32 offset is set to an exact
multiple of the int8 lattice (offset = units * quant_scale) so the only
difference between the columns is message quantisation.

Reference capability matched: speed/accuracy CN trades in the main
decode path (``gpu/ldpc/ldpc.cpp:232-241``), measured at the deployed
code family the QC transport exists for.

Points: a waterfall ladder (steep-curve region — quantisation shows as
horizontal shift) plus a deep-floor anchor (high-SNR; the +-127 clip and
coarse lattice would surface as an error floor).  |z| < 3 per point means
the int8 lattice costs nothing measurable.  Appends a section to
``PARITY_int8.md`` and writes ``res_parity_int8_wifi.txt``.

Usage: ``python benchmarks/quant_parity_wifi.py [--fec 300] [--points ...]``
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import z_two_proportion  # noqa: E402


def run(code, x, fec, max_frames, batch, message_dtype, qscale, offset,
        iterations, seed=123, layered=False):
    from libldpc_tpu.sim import Simulator
    from libldpc_tpu.utils import (
        ChannelParams, DecoderParams, SimulationParams,
    )

    sim = Simulator(
        code,
        DecoderParams(iterations=iterations, type="BP_OMS",
                      ms_offset=offset, message_dtype=message_dtype,
                      quant_scale=qscale, layered=layered),
        ChannelParams(seed=seed, x_range=(x, x + 1e-6, 1.0), type="AWGN"),
        SimulationParams(batch_size=batch, fec=fec, max_frames=max_frames),
        use_pallas=True,
        verbose=False,
    )
    t0 = time.perf_counter()
    res = sim.start()
    dt = time.perf_counter() - t0
    prov = getattr(sim, "decode_path", None)
    return (int(res.fec[0]), int(res.frames[0]), float(res.ber[0]),
            float(res.avg_iter[0]), float(res.time[0]), dt, prov)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fec", type=int, default=300)
    ap.add_argument("--max-frames", type=int, default=2_000_000)
    ap.add_argument("--anchor-max-frames", type=int, default=4_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--qscale", type=float, default=0.1875)
    ap.add_argument("--offset-units", type=int, default=2,
                    help="OMS offset in int8 lattice units (f32 runs the "
                    "same offset = units * qscale)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--n", type=int, default=1944)
    ap.add_argument("--points", type=float, nargs="*",
                    default=[1.0, 1.5, 2.0])
    ap.add_argument("--anchor", type=float, default=3.0,
                    help="deep-floor anchor SNR (dB); skipped if nan")
    ap.add_argument("--layered", action="store_true",
                    help="run the streaming layered engine instead of "
                    "flooding (the round-5 flagship path)")
    ap.add_argument("--probe", action="store_true",
                    help="quick FER probe at the points (small fec) "
                    "instead of the full table")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "PARITY_int8.md"))
    args = ap.parse_args()

    import math

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

    from libldpc_tpu.models import wifi_code

    code = wifi_code(args.n)
    offset = args.offset_units * args.qscale
    print(f"802.11n n={code.nc} k={code.kc} Z={code.qc[0]} "
          f"BP_OMS offset={offset:g} ({args.offset_units} lattice units) "
          f"iters={args.iters} ET", flush=True)

    if args.probe:
        for x in args.points + ([args.anchor] if not math.isnan(args.anchor)
                                else []):
            k, n, ber, ai, tpf, dt, prov = run(
                code, x, min(args.fec, 30), 200_000, args.batch,
                "int8", args.qscale, offset, args.iters,
            )
            print(f"  probe {x:g} dB: fer={k/max(n,1):.3e} ({k}/{n}) "
                  f"ber={ber:.2e} iters={ai:.1f} "
                  f"{1e6*tpf:.2f} us/frame [{dt:.0f}s] prov={prov}",
                  flush=True)
        return

    points = list(args.points)
    anchors = [] if math.isnan(args.anchor) else [args.anchor]
    rows = []
    sched = ("streaming layered engine" if args.layered else "flooding")
    res_lines = [
        "# int8 OMS parity at deployed scale: bundled 802.11n "
        f"n={code.nc} Z={code.qc[0]}, qc transport, {sched}, BP_OMS "
        f"offset={offset:g}, {args.iters} iters ET, batch {args.batch}",
        "# snr dtype fec frames fer ber avg_iter us/frame wall_s",
    ]
    worst_z = 0.0
    for x in points + anchors:
        mf = args.anchor_max_frames if x in anchors else args.max_frames
        k1, n1, ber1, ai1, tpf1, dt1, _ = run(
            code, x, args.fec, mf, args.batch, "float32", args.qscale,
            offset, args.iters, layered=args.layered,
        )
        k2, n2, ber2, ai2, tpf2, dt2, _ = run(
            code, x, args.fec, mf, args.batch, "int8", args.qscale,
            offset, args.iters, layered=args.layered,
        )
        z = z_two_proportion(k1, n1, k2, n2)
        worst_z = max(worst_z, abs(z))
        rows.append(
            f"| {x:g} | {k1/n1:.3e} ({k1}/{n1}) | {k2/n2:.3e} "
            f"({k2}/{n2}) | {ber1:.3e} | {ber2:.3e} | {ai1:.1f} | "
            f"{ai2:.1f} | {1e6*tpf1:.1f} | {1e6*tpf2:.1f} | {z:+.2f} |"
        )
        res_lines.append(f"{x:g} float32 {k1} {n1} {k1/n1:.4e} {ber1:.4e} "
                         f"{ai1:.2f} {1e6*tpf1:.2f} {dt1:.1f}")
        res_lines.append(f"{x:g} int8 {k2} {n2} {k2/n2:.4e} {ber2:.4e} "
                         f"{ai2:.2f} {1e6*tpf2:.2f} {dt2:.1f}")
        print(rows[-1], flush=True)
        print(f"  wall: f32 {dt1:.1f}s, int8 {dt2:.1f}s", flush=True)

    res_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "res_parity_int8_wifi_layered.txt" if args.layered
        else "res_parity_int8_wifi.txt",
    )
    with open(res_path, "w") as f:
        f.write("\n".join(res_lines) + "\n")

    speedup = (rows and tpf1 and tpf2) and (tpf1 / tpf2) or float("nan")
    section = [
        "",
        "## Round-5 addendum: OMS-int8 at deployed scale "
        + ("(real 802.11n, STREAMING LAYERED engine)" if args.layered
           else "(real 802.11n, qc transport)"),
        "",
        f"Bundled IEEE 802.11n rate-1/2 n={code.nc} (Z={code.qc[0]}) through "
        "the arbitrary-Z structure-aware qc lane-major transport — the "
        "deployed code family.  BP_OMS f32 vs int8 at the identical "
        f"algorithm (offset {offset:g} = {args.offset_units} int8 lattice "
        f"units at quant_scale {args.qscale:g}), {args.iters} iterations, "
        f"ET on, full driver, fec {args.fec}.  The last row is the "
        "deep-floor anchor.  Raw rows in `res_parity_int8_wifi.txt`; "
        "speed ladder for the same code/transport in "
        "`res_qc_deployed.txt`.",
        "",
        "| SNR (dB) | FER f32 (k/n) | FER int8 (k/n) | BER f32 | BER int8 "
        "| iters f32 | iters int8 | us/fr f32 | us/fr int8 | z |",
        "|---|---|---|---|---|---|---|---|---|---|",
        *rows,
        "",
        f"Worst |z| = {worst_z:.2f}.",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(section) + "\n")
    print(f"\nworst |z| = {worst_z:.2f}; appended to {args.out}; "
          f"raw -> {res_path}; last-point int8 speedup vs f32 "
          f"{speedup:.2f}x")


if __name__ == "__main__":
    main()
