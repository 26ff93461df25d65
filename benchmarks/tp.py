"""Decode-throughput benchmark harness — the ``gpu/tests/tp.cpp`` equivalent.

Two modes, mirroring the reference harness:

* ``--mode iter`` — throughput vs BP iteration count (reference sweeps 1-200,
  ``tp.cpp:103-191``) on the bundled k=128/n=1024 code; writes
  ``res_tp_iter_tpu.txt`` with ``iters  Mbits/s  frames/s``.
* ``--mode bl`` — throughput vs blocklength on generated (3,6)-regular codes
  (reference used pre-generated ``dat/code_dv3_dc6_i=*.txt``,
  ``tp.cpp:217-273``, data not shipped; we construct them on the fly with
  :func:`libldpc_tpu.models.make_benchmark_code`); writes
  ``res_tp_bl_tpu.txt``.

Throughput counts *transmitted* bits (``nct`` per frame), best-of-``--best``
like the reference's best-of-15/25 accounting.  Decoder: sum-product BP,
early termination off (fixed work per frame).  ``--pallas`` switches to the
fused kernel.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_decode(decode_fn, llr, n_calls=4):
    import jax.numpy as jnp

    out = decode_fn(llr)
    float(jnp.sum(out.llr_out.astype(jnp.float32)))  # compile + real sync
    t0 = time.perf_counter()
    outs = [decode_fn(llr) for _ in range(n_calls)]
    # ONE stream-ordered host read: device execution is in-order, so the
    # last call completing implies all completed; per-call reads would
    # serialise host/tunnel round-trips into every call
    float(jnp.sum(outs[-1].llr_out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n_calls


def build_decode(code, iterations, use_pallas, batch, decoder="BP",
                 message_dtype="float32", permute="auto"):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    llr = np.zeros((code.nc, batch), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, batch))
    llr[code.bit_pos] = (2.0 * y).astype(np.float32)

    if use_pallas:
        from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
        from libldpc_tpu.ops.pallas.layout import to_pallas_device
        from libldpc_tpu.sim.driver import FUSED_EDGE_SPACE_LIMIT

        pdc = to_pallas_device(code)
        if (
            pdc.n_pad > FUSED_EDGE_SPACE_LIMIT
            and pdc.mxu_blocks_fwd is None
        ):
            # same routing as the driver: large unstructured codes run the
            # lane-major kernel (the edge-major Benes kernel fails to
            # compile on-chip beyond n_pad 4096)
            from libldpc_tpu.ops.pallas.decode_lanes import bp_decode_lanes
            from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

            ldc = to_lanes_device(
                code,
                transport="clos" if message_dtype == "bfloat16" else "benes",
            )
            llr_j = jnp.asarray(llr[np.asarray(ldc.sorted_dc.vn_perm)])
            fn = functools.partial(
                bp_decode_lanes, ldc, iterations=iterations,
                early_term=False, minsum_mode=decoder,
                message_dtype=message_dtype,
            )
            return fn, llr_j
        if permute == "auto":
            permute = "mxu" if pdc.mxu_blocks_fwd is not None else "benes"
        llr_j = jnp.asarray(llr[np.asarray(pdc.sorted_dc.vn_perm)])
        fn = functools.partial(
            bp_decode_pallas, pdc, iterations=iterations, early_term=False,
            minsum_mode=decoder, message_dtype=message_dtype,
            permute=permute,
        )
    else:
        from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device

        sdc = to_sorted_device(code)
        llr_j = jnp.asarray(llr[np.asarray(sdc.vn_perm)])
        fn = jax.jit(
            functools.partial(
                bp_decode_sorted, sdc, iterations=iterations,
                early_term=False, minsum_mode=decoder,
            )
        )
    return fn, llr_j


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["iter", "bl", "both"], default="both")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--best", type=int, default=3)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--decoder", default="BP",
                    help="BP | BP_MS | BP_LIN (decode throughput varies with "
                         "the CN operator's transcendental cost)")
    ap.add_argument("--permute", default="auto",
                    choices=["auto", "benes", "mxu"])
    ap.add_argument("--message-dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"],
                    help="Fused-kernel message dtype (bf16 transport; int8 "
                         "integer lattice — min-sum family + MXU plan only).")
    ap.add_argument("--iters-list", default="1,2,5,10,25,50,100,200")
    ap.add_argument("--bl-list", default="256,512,1024,2048,4096,8192")
    ap.add_argument("--bl-iters", type=int, default=32)
    ap.add_argument("--outdir", default=os.path.dirname(os.path.abspath(__file__)))
    args = ap.parse_args()

    from libldpc_tpu.models import LDPCCode, make_benchmark_code

    suffix = "pallas" if args.pallas else "tpu"
    if args.decoder != "BP":
        suffix += "_" + args.decoder.lower()
    if args.message_dtype == "bfloat16":
        suffix += "_bf16"
    elif args.message_dtype == "int8":
        suffix += "_int8"

    if args.mode in ("iter", "both"):
        h = "/root/reference/tests/code/h.txt"
        code = (
            LDPCCode.from_files(h)
            if os.path.exists(h)
            else make_benchmark_code(1152, dv=3, dc=6, seed=0)
        )
        rows = []
        for iters in [int(v) for v in args.iters_list.split(",")]:
            fn, llr = build_decode(code, iters, args.pallas, args.batch,
                                   args.decoder, args.message_dtype,
                                   args.permute)
            dt = min(_time_decode(fn, llr) for _ in range(args.best))
            fps = args.batch / dt
            mbps = fps * code.nct / 1e6
            rows.append(f"{iters} {mbps:.2f} {fps:.0f}")
            print(f"iters={iters:4d}  {mbps:10.2f} Mbits/s  {fps:10.0f} frames/s",
                  flush=True)
        path = os.path.join(args.outdir, f"res_tp_iter_{suffix}.txt")
        with open(path, "w") as f:
            f.write("iterations Mbits/s frames/s\n" + "\n".join(rows) + "\n")
        print(f"wrote {path}")

    if args.mode in ("bl", "both"):
        rows = []
        for n in [int(v) for v in args.bl_list.split(",")]:
            code = make_benchmark_code(n, dv=3, dc=6, seed=1)
            fn, llr = build_decode(code, args.bl_iters, args.pallas, args.batch,
                                   args.decoder, args.message_dtype,
                                   args.permute)
            dt = min(_time_decode(fn, llr) for _ in range(args.best))
            fps = args.batch / dt
            mbps = fps * code.nct / 1e6
            rows.append(f"{n} {mbps:.2f} {fps:.0f}")
            print(f"n={n:6d}  {mbps:10.2f} Mbits/s  {fps:10.0f} frames/s",
                  flush=True)
        path = os.path.join(args.outdir, f"res_tp_bl_{suffix}.txt")
        with open(path, "w") as f:
            f.write("blocklength Mbits/s frames/s\n" + "\n".join(rows) + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
