"""Layered-schedule throughput on the lane-major fused kernel.

The round-2 verdict's #1 capability gap was the layered schedule at large
unstructured blocklengths (it fell back to XLA).  This harness times the
closed gap: ``bp_decode_lanes(layered=True)`` at n=8192 vs (a) the same
kernel flooding and (b) the XLA layered sorted decoder — fixed iterations,
early termination off, best-of-N with one stream-ordered host read
(reference capability: ``gpu/device/kernel.cpp:57-74`` layer loop).

Writes ``res_tp_layered_lanes.txt``.
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--best", type=int, default=3)
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

    code = make_benchmark_code(args.n, dv=3, dc=6, seed=1)
    code.layers = [
        np.arange(li, code.mc, args.layers, dtype=np.int32)
        for li in range(args.layers)
    ]
    B = args.batch
    rng = np.random.default_rng(0)
    llr = np.zeros((code.nc, B), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, B))
    llr[code.bit_pos] = (2.0 * y).astype(np.float32)

    def timed(fn, read):
        t0 = time.perf_counter()
        out = fn()
        read(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn() for _ in range(4)]
        read(outs[-1])
        return tc, (time.perf_counter() - t0) / 4

    rows = []

    def record(name, fn, read):
        tc, dt = timed(fn, read)
        dt = min(
            [dt] + [timed(fn, read)[1] for _ in range(args.best - 1)]
        )
        fps = B / dt
        rows.append(f"{name} {tc:.1f} {dt * 1e3:.2f} {fps:.0f} "
                    f"{dt / B * 1e6:.2f}")
        print(f"{name:22s} compile {tc:6.1f}s  {dt*1e3:8.2f} ms  "
              f"{fps:8.0f} frames/s  {dt/B*1e6:7.2f} us/frame", flush=True)

    read_f = lambda o: float(jnp.sum(o.llr_out.astype(jnp.float32)))

    ldc = to_lanes_device(code, with_layers=True)
    llr_l = jnp.asarray(llr[np.asarray(ldc.sorted_dc.vn_perm)])
    record(
        "lanes_layered_f32",
        functools.partial(bp_decode_lanes, ldc, llr_l,
                          iterations=args.iters, early_term=False,
                          layered=True),
        read_f,
    )
    record(
        "lanes_flooding_f32",
        functools.partial(bp_decode_lanes, ldc, llr_l,
                          iterations=args.iters, early_term=False),
        read_f,
    )
    # the driver's actual large-code route: clos transport + bf16 messages
    ldc_c = to_lanes_device(code, with_layers=True, transport="clos")
    llr_c = jnp.asarray(llr[np.asarray(ldc_c.sorted_dc.vn_perm)])
    record(
        "lanes_layered_bf16",
        functools.partial(bp_decode_lanes, ldc_c, llr_c,
                          iterations=args.iters, early_term=False,
                          layered=True, message_dtype="bfloat16"),
        read_f,
    )
    record(
        "lanes_flooding_bf16",
        functools.partial(bp_decode_lanes, ldc_c, llr_c,
                          iterations=args.iters, early_term=False,
                          message_dtype="bfloat16"),
        read_f,
    )
    sdc = to_sorted_device(code, with_layers=True)
    xla_layered = jax.jit(functools.partial(
        bp_decode_sorted, sdc, iterations=args.iters, early_term=False,
        layered=True,
    ))
    record("xla_layered", lambda: xla_layered(llr_l), read_f)

    path = os.path.join(args.outdir, "res_tp_layered_lanes.txt")
    with open(path, "w") as f:
        f.write(
            f"# n={args.n} (3,6)-regular, {args.layers} layers, "
            f"{args.iters} iters no-ET, batch {B}, one v5e chip\n"
            "variant compile_s ms/call frames/s us/frame\n"
            + "\n".join(rows) + "\n"
        )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
