"""BER/FER curve-parity harness.

Runs the TPU simulator at every sweep point where the reference simulator's
FER was measured (``reference_curves.json``) and tests agreement with a
two-proportion z-test on the frame-error counts.  Writes ``PARITY.md``.

Usage: ``python benchmarks/parity.py [--fec 300] [--max-frames 300000]``
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H_FILE = "/root/reference/tests/code/h.txt"
G_FILE = "/root/reference/tests/code/g.txt"


def z_two_proportion(k1, n1, k2, n2):
    """z statistic for H0: p1 == p2 (pooled)."""
    p1, p2 = k1 / n1, k2 / n2
    p = (k1 + k2) / (n1 + n2)
    se = math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    if se == 0:
        return 0.0
    return (p1 - p2) / se


def run_config(code, channel, dec_type, x, fec, max_frames, batch,
               bec_compat=False, seed=123, use_pallas=False,
               message_dtype="float32"):
    from libldpc_tpu.sim import Simulator
    from libldpc_tpu.utils import ChannelParams, DecoderParams, SimulationParams

    sim = Simulator(
        code,
        DecoderParams(iterations=50, type=dec_type,
                      bec_ref_bug_compat=bec_compat,
                      message_dtype=message_dtype),
        ChannelParams(seed=seed, x_range=(x, x + 1e-6, 1.0), type=channel),
        SimulationParams(batch_size=batch, fec=fec, max_frames=max_frames),
        use_pallas=use_pallas and channel != "BEC",
        verbose=False,
    )
    res = sim.start()
    return int(res.fec[0]), int(res.frames[0]), float(res.ber[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fec", type=int, default=300)
    ap.add_argument("--max-frames", type=int, default=400000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "PARITY.md"))
    ap.add_argument("--pallas", action="store_true",
                    help="Run the AWGN/BSC configs through the fused "
                         "Pallas kernel (streaming ET path).")
    ap.add_argument("--message-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from libldpc_tpu.models import LDPCCode

    code = LDPCCode.from_files(H_FILE, G_FILE)
    with open(os.path.join(os.path.dirname(__file__), "reference_curves.json")) as f:
        ref = json.load(f)

    configs = [
        ("AWGN_BP", "AWGN", "BP", False),
        ("AWGN_BP_MS", "AWGN", "BP_MS", False),
        ("BSC_BP", "BSC", "BP", False),
        ("BEC", "BEC", "BP", True),
    ]

    rows = []
    worst_z = 0.0
    for name, channel, dec_type, bec_compat in configs:
        for pt in ref["points"][name]:
            x = pt["x"]
            k2 = round(pt["fer"] * pt["frames"])
            n2 = pt["frames"]
            k1, n1, ber1 = run_config(
                code, channel, dec_type, x, args.fec, args.max_frames,
                args.batch, bec_compat=bec_compat,
                use_pallas=args.pallas, message_dtype=args.message_dtype,
            )
            z = z_two_proportion(k1, n1, k2, n2)
            worst_z = max(worst_z, abs(z))
            fer1 = k1 / n1
            rows.append(
                f"| {name} | {x:g} | {fer1:.3e} ({k1}/{n1}) | "
                f"{pt['fer']:.3e} ({k2}/{n2}) | {ber1:.3e} | {pt['ber']:.3e} | "
                f"{z:+.2f} |"
            )
            print(rows[-1], flush=True)

    # BEC correct-algorithm point for the divergence note
    k1, n1, _ = run_config(code, "BEC", "BP", 0.84, args.fec,
                           args.max_frames, args.batch, bec_compat=False)

    with open(args.out, "w") as f:
        f.write(
            "# BER/FER curve parity vs reference\n\n"
            "Reference: heat1q/libldpc CPU simulator (4 threads) on the "
            "bundled k=128 / n=1024 code, 50 iterations, early termination "
            "on.  Ours: TPU simulator, same configs.  |z| < 3 means the "
            "frame-error rates agree within Monte-Carlo confidence "
            "(two-proportion z-test).\n\n"
            "| config | x | FER ours (k/n) | FER reference (k/n) | "
            "BER ours | BER ref | z |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(r + "\n")
        f.write(
            f"\nWorst |z| = {worst_z:.2f}.\n\n"
            "## BEC note\n\n"
            "The BEC rows above run with `bec_ref_bug_compat=True`, which "
            "reproduces the reference's out-of-bounds scratch read for "
            "degree-1 variable nodes (`src/decoding/decoder.cpp:155-160` "
            "indexes `mExMsgF[vw-2]` with `vw == 1`; the stale byte makes "
            "degree-1 erased VNs emit a hard 0 instead of an erasure, a "
            "genie hint that inflates performance on this code, which has "
            "512 degree-1 VNs).  With the *correct* peeling algorithm "
            f"(default), FER at eps=0.84 is {k1/n1:.3e} ({k1}/{n1}) — far "
            "higher, because unresolvable degree-1 erasures poison their "
            "checks.\n"
        )
    print(f"\nworst |z| = {worst_z:.2f}; wrote {args.out}")


if __name__ == "__main__":
    main()
