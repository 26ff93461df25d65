"""Higher-order modulation throughput — the GPU stack's constellation path.

The reference GPU stack simulates M-ASK constellations with full bitwise
LLRs (``gpu/device/kernel.cpp:141-189``) but ships no numbers.  This
harness sweeps the bundled code with 4-ASK (Gray labels) through the full
driver (in-kernel streaming on TPU) and prints per-point device windows
next to the BPSK (2-ASK-equivalent) run of the same config — the exact
bitwise-LLR demapper (logsumexp over constellation points per bit) is the
only extra per-frame work.

Writes ``res_modulation.txt``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--fec", type=int, default=500)
    ap.add_argument("--max-frames", type=int, default=2_000_000)
    ap.add_argument("--outdir",
                    default=os.path.dirname(os.path.abspath(__file__)))
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
    from libldpc_tpu.ops import modulation as mod
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

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    rows = []
    for name, modulation, points in (
        # 4-ASK carries 2 bits/symbol at half the symbol energy spacing:
        # its waterfall sits ~5 dB above BPSK's on this code
        ("bpsk", None, (-5.0, -2.9, 1.0)),
        ("4ask_gray", "build", (0.0, 3.1, 1.0)),
    ):
        if modulation == "build":
            c = mod.Constellation.mask(4, labels=[0, 1, 3, 2])
            n_sym = code.nct // 2
            mapper = code.bit_pos[mod.default_bit_mapper(2, n_sym)]
            modulation = (c, mapper)
        sim = Simulator(
            code,
            DecoderParams(iterations=50, early_term=True,
                          message_dtype="bfloat16" if on_tpu else "float32"),
            ChannelParams(seed=5, x_range=points),
            SimulationParams(batch_size=args.batch, fec=args.fec,
                             max_frames=args.max_frames),
            modulation=modulation,
            use_pallas=on_tpu,
            verbose=False,
        )
        t0 = time.time()
        res = sim.start()
        wall = time.time() - t0
        tot = int(res.frames.sum())
        print(f"{name}: {tot} frames in {wall:.1f}s "
              f"({tot / wall / 1e3:.1f}K f/s end-to-end)", flush=True)
        for i, x in enumerate(res.x_values):
            rows.append(
                f"{name} {x:.1f} {res.fer[i]:.3e} {int(res.frames[i])} "
                f"{res.avg_iter[i]:.1f} {res.time[i] * 1e6:.2f}")
            print(f"  {x:5.1f} dB  fer {res.fer[i]:.3e}  "
                  f"ai {res.avg_iter[i]:5.1f}  "
                  f"t/frame {res.time[i]*1e6:.2f}us", flush=True)

    path = os.path.join(args.outdir, "res_modulation.txt")
    with open(path, "w") as f:
        f.write(
            f"# M-ASK modulation through the full driver (streaming ET), "
            f"bundled code, batch {args.batch}, fec {args.fec}, one chip\n"
            "scheme snr fer frames avg_iter us/frame\n" + "\n".join(rows)
            + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
