"""BEC peeling-decoder throughput — the missing decoder-family record.

Every other decode path has a committed frames/s record; this harness
measures the XLA BEC decoder (``ops/bec_sorted.py``, the driver's BEC
path) the same way ``tp.py`` measures BP: fixed iterations (early
termination off), best-of-N timing with one stream-ordered host read.

It also prices one BEC frame in VPU ops (the int8 peeling algebra is
pure elementwise select/xor — same roofline currency as the BP model in
:mod:`libldpc_tpu.utils.roofline`) and reports the measured fraction of
VPU peak, plus the f32 BP decoder on the same code as a context ratio.
This is the evidence base for the fuse-or-justify decision on a Pallas
BEC kernel (reference decoder: ``src/decoding/decoder.cpp:91-192``).

Op-count conventions (per frame per iteration):

* CN pairwise op (erasure-absorbing XOR): 2 eq-compares + or + xor +
  select = 5 ops; exclusion combine over degree d = ``3d - 4`` pairwise.
* VN pairwise op (reveal-if-either-matches): 2 eq-compares + or +
  select = 4 ops; plus per-edge known-override select (2) and per-node
  posterior select (2).
* Gathers: 2 ops/element, 2 per iteration (same lower-bound convention
  as the BP model — flatters the XLA path).
* NOTE the VPU datapath is 32-bit: int8 elements do NOT pack 4/lane on
  the VPU (only the MXU has sub-word feeds), so int8 peeling has the
  same ops/s peak as f32 BP — its advantage is doing ~5 ops per pairwise
  combine where box-plus does ~18.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bec_frame_cost(nc, nnz, cn_classes, vn_classes, iterations):
    cn = sum(c * (3 * d - 4) for c, d in cn_classes if d >= 2) * 5
    vn_pair = sum(c * (3 * d - 4) for c, d in vn_classes if d >= 2) * 4
    vn = vn_pair + 2 * nnz + 2 * nc
    gathers = 2 * nnz * 2
    return (cn + vn + gathers) * iterations


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--best", type=int, default=3)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--bl-list", default="1024,8192")
    ap.add_argument("--eps", type=float, default=0.3,
                    help="erasure probability of the timed input set")
    ap.add_argument("--pallas", action="store_true",
                    help="also time the fused lane-major BEC kernel "
                         "(min-sum over the sign encoding) in f32/benes "
                         "and bf16/clos")
    ap.add_argument("--outdir",
                    default=os.path.dirname(os.path.abspath(__file__)))
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.bec_sorted import bec_decode_sorted
    from libldpc_tpu.ops.channel import BEC_ERASURE
    from libldpc_tpu.ops.sorted import bp_decode_sorted, to_sorted_device
    from libldpc_tpu.utils.roofline import VPU_PEAK_OPS, decode_frame_cost

    B = args.batch
    rows = []
    for n in [int(v) for v in args.bl_list.split(",")]:
        code = make_benchmark_code(n, dv=3, dc=6, seed=1)
        sdc = to_sorted_device(code)
        rng = np.random.default_rng(0)
        cw = np.zeros((code.nc, B), np.uint8)  # all-zero codeword mode
        erased = rng.random((code.nc, B)) < args.eps
        sym = np.where(erased, np.int8(BEC_ERASURE), cw.astype(np.int8))
        sym_j = jnp.asarray(sym[np.asarray(sdc.vn_perm)])
        cw_j = jnp.asarray(cw)

        fn = jax.jit(functools.partial(
            bec_decode_sorted, sdc, iterations=args.iters, early_term=False,
        ))

        def timed(call, read):
            out = call()
            read(out)  # compile + sync
            t0 = time.perf_counter()
            outs = [call() for _ in range(4)]
            read(outs[-1])  # one stream-ordered read
            return (time.perf_counter() - t0) / 4

        dt = min(
            timed(lambda: fn(sym_j, cw_j),
                  lambda o: int(jnp.sum(o.iterations)))
            for _ in range(args.best)
        )
        fps = B / dt
        cost = bec_frame_cost(
            code.nc, code.nnz, sdc.cn_classes, sdc.vn_classes, args.iters
        )
        pct = 100.0 * fps * cost / VPU_PEAK_OPS

        # f32 BP on the same code for the context ratio
        llr = np.zeros((code.nc, B), np.float32)
        llr[code.bit_pos] = 2.0 * (
            1.0 + rng.normal(size=(code.nct, B))
        ).astype(np.float32)
        llr_j = jnp.asarray(llr[np.asarray(sdc.vn_perm)])
        bp = jax.jit(functools.partial(
            bp_decode_sorted, sdc, iterations=args.iters, early_term=False,
        ))
        dt_bp = min(
            timed(lambda: bp(llr_j),
                  lambda o: float(jnp.sum(o.llr_out.astype(jnp.float32))))
            for _ in range(args.best)
        )
        fps_bp = B / dt_bp
        bp_cost = decode_frame_cost(
            nc=code.nc, nnz=code.nnz, cn_classes=sdc.cn_classes,
            iterations=args.iters, early_term=False, channel=False,
        )
        bp_pct = 100.0 * fps_bp * bp_cost.total_ops / VPU_PEAK_OPS
        row = (
            f"{n} {fps:.0f} {pct:.2f} {fps_bp:.0f} {bp_pct:.2f} "
            f"{fps / fps_bp:.2f}"
        )
        print(
            f"n={n:6d}  BEC {fps:9.0f} frames/s ({pct:5.2f}% VPU peak)  "
            f"BP {fps_bp:9.0f} frames/s ({bp_pct:5.2f}%)  "
            f"BEC/BP = {fps / fps_bp:.2f}x",
            flush=True,
        )

        if args.pallas:
            from libldpc_tpu.ops.pallas.decode_lanes import bec_decode_lanes
            from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

            for transport, mdtype in (("benes", "float32"),
                                      ("clos", "bfloat16")):
                ldc = to_lanes_device(code, transport=transport)
                fnp = functools.partial(
                    bec_decode_lanes, ldc, iterations=args.iters,
                    early_term=False, message_dtype=mdtype,
                )
                dtp = min(
                    timed(lambda: fnp(sym_j, cw_j),
                          lambda o: int(jnp.sum(o.iterations)))
                    for _ in range(args.best)
                )
                fpsp = B / dtp
                pctp = 100.0 * fpsp * cost / VPU_PEAK_OPS
                row += f" {fpsp:.0f}"
                print(
                    f"          fused BEC [{transport}/{mdtype}] "
                    f"{fpsp:9.0f} frames/s ({pctp:5.2f}% of the XLA op "
                    f"budget)  {fpsp / fps:.2f}x XLA",
                    flush=True,
                )
        rows.append(row)

    path = os.path.join(args.outdir, "res_tp_bec.txt")
    header = (
        "blocklength bec_frames/s bec_vpu_pct bp_frames/s bp_vpu_pct "
        "bec_over_bp"
    )
    if args.pallas:
        header += " fused_f32_frames/s fused_bf16_frames/s"
    with open(path, "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
