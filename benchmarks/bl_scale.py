"""Blocklength scaling of the lane-major fused kernel past n=8192.

The reference's scaling axis was blocklength (``gpu/tests/tp.cpp:217-273``
sweeps generated (3,6)-regular codes); round 2 measured the fused path flat
to n=8192.  This harness extends the record to n=16384-65536 unstructured:
per (n, message dtype/transport) it reports compile time, decode time and
throughput, records failures (the VMEM / Mosaic limit curve) instead of
crashing, and runs one correctness point per n — the f32 lanes kernel must
produce bit-identical hard decisions to the XLA sorted decoder, and the
bf16 variant's FER is reported next to f32's at the same noise draw.

Writes ``res_tp_bl_scale.txt``.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bl-list", default="16384,32768,65536")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--best", type=int, default=3)
    ap.add_argument("--snr-db", type=float, default=1.4,
                    help="AWGN point for the correctness column (the (3,6) "
                         "BP threshold is ~1.1 dB, so 1.4 dB sits in the "
                         "waterfall with a non-trivial FER at these n).")
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
    from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
    from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device
    from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device

    B = args.batch
    rows = []

    def timed(fn, read):
        t0 = time.perf_counter()
        out = fn()
        read(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn() for _ in range(4)]
        read(outs[-1])
        return tc, (time.perf_counter() - t0) / 4, out

    read_f = lambda o: float(jnp.sum(o.llr_out.astype(jnp.float32)))

    for n in [int(v) for v in args.bl_list.split(",")]:
        code = make_benchmark_code(n, dv=3, dc=6, seed=1)
        rng = np.random.default_rng(n)
        # all-zero codeword (BPSK +1), AWGN at --snr-db: errors appear in the
        # waterfall so the correctness column exercises non-trivial decoding
        sigma2 = 10.0 ** (-args.snr_db / 10.0)
        y = 1.0 + rng.normal(size=(code.nc, B)) * np.sqrt(sigma2)
        llr = (2.0 * y / sigma2).astype(np.float32)

        sdc = to_sorted_device(code)
        llr_s = jnp.asarray(llr[np.asarray(sdc.vn_perm)])
        xla = jax.jit(functools.partial(
            bp_decode_sorted, sdc, iterations=args.iters, early_term=False))
        out_x = xla(llr_s)
        dec_x = np.asarray(out_x.llr_out <= 0)
        fer_x = float(np.mean(np.any(dec_x, axis=0)))
        # XLA decode time at the same point — the denominator of the
        # fused-kernel advantage column
        _, dt_x, _ = timed(lambda: xla(llr_s), read_f)
        dt_x = min([dt_x] + [timed(lambda: xla(llr_s), read_f)[1]
                             for _ in range(args.best - 1)])
        print(f"n={n:6d} {'xla_sorted':18s} {dt_x/B*1e6:8.2f} us/frame  "
              f"{B/dt_x:8.0f} frames/s", flush=True)

        for dtype, transport in (("float32", "benes"), ("bfloat16", "clos")):
            tag = f"lanes_{'f32' if dtype == 'float32' else 'bf16'}_{transport}"
            try:
                t0 = time.perf_counter()
                ldc = to_lanes_device(code, transport=transport)
                t_layout = time.perf_counter() - t0
                llr_l = jnp.asarray(llr[np.asarray(ldc.sorted_dc.vn_perm)])
                fn = functools.partial(
                    bp_decode_lanes, ldc, llr_l, iterations=args.iters,
                    early_term=False, message_dtype=dtype)
                tc, dt, out = timed(fn, read_f)
                dt = min([dt] + [timed(fn, read_f)[1]
                                 for _ in range(args.best - 1)])
                dec = np.asarray(out.llr_out <= 0)
                fer = float(np.mean(np.any(dec, axis=0)))
                exact = bool((dec == dec_x).all())
                fps = B / dt
                mbps = fps * code.nct / 1e6
                check = ("bitexact" if exact else f"fer={fer:.4f}")
                rows.append(
                    f"{n} {tag} {ldc.n_pad} {t_layout:.1f} {tc:.1f} "
                    f"{dt / B * 1e6:.2f} {fps:.0f} {mbps:.2f} "
                    f"{check} xla_fer={fer_x:.4f} "
                    f"xla_us={dt_x / B * 1e6:.2f} vs_xla={dt_x / dt:.2f}x")
                print(f"n={n:6d} {tag:18s} n_pad={ldc.n_pad:7d} "
                      f"layout {t_layout:5.1f}s compile {tc:6.1f}s  "
                      f"{dt/B*1e6:8.2f} us/frame  {fps:8.0f} frames/s  "
                      f"{mbps:8.2f} Mbits/s  {check} (xla fer={fer_x:.4f}, "
                      f"vs xla {dt_x/dt:.2f}x)",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — the limit curve IS the data
                import re

                msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
                msg = msg.split("\n")[0][:120].replace(" ", "_")
                rows.append(f"{n} {tag} - - - - - - FAIL:{msg}")
                print(f"n={n:6d} {tag:18s} FAILED: {msg}", flush=True)

    path = os.path.join(args.outdir, "res_tp_bl_scale.txt")
    with open(path, "w") as f:
        f.write(
            f"# lane-major kernel blocklength scaling, (3,6)-regular, BP, "
            f"{args.iters} iters no-ET, batch {B}, one v5e chip\n"
            "# check column: 'bitexact' = hard decisions identical to the "
            "XLA sorted decoder on the full batch\n"
            "n variant n_pad layout_s compile_s us/frame frames/s Mbits/s "
            "check xla\n" + "\n".join(rows) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
