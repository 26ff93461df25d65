"""Structure-aware QC transport vs every other decode route.

Round-4 kernel: for quasi-cyclic codes (Z % 128 == 0) the lane-major
CN<->VN edge permutation factors into ONE Z-lane cyclic roll per base
edge (``lanes_layout._derive_qc_segments``) — no Beneš stages, no Clos
one-hot matmuls, no fill wall, edge space 128-aligned instead of
power-of-two.  Deployed LDPC codes (802.11n/802.16e/5G-NR/DVB) are
overwhelmingly QC, so this is the transport real codes get.

This harness measures, per blocklength on one chip:

* the XLA sorted decoder (baseline),
* the generic lane-major transports (bf16/clos at n=8192; at larger n
  see ``res_tp_bl_scale.txt`` for the generic walls),
* the edge-major MXU one-hot kernel (n=8192 — the pre-round-4 routing
  winner for block-local codes; its compile wall keeps it out of the
  larger rows),
* the qc transport at f32 (bit-exactness vs XLA), bf16, and int8
  (BP_MS, the integer lattice).

Writes ``res_qc_transport.txt``.
"""

import argparse
import functools
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="8192:512,32768:2048,65536:4096,131072:8192",
                    help="comma list of n:Z")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--best", type=int, default=3)
    ap.add_argument("--snr-db", type=float, default=1.4)
    ap.add_argument("--with-edge-major", action="store_true", default=True)
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

    from libldpc_tpu.models import make_qc_benchmark_code
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

    def record(n, tag, ldc_n_pad, t_layout, fn, dec_x, fer_x, dt_x,
               nct):
        try:
            tc, dt, out = timed(fn, read_f)
            dt = min([dt] + [timed(fn, read_f)[1]
                             for _ in range(args.best - 1)])
            dec = np.asarray(out.llr_out <= 0)
            fer = float(np.mean(np.any(dec, axis=0)))
            exact = bool((dec == dec_x).all())
            fps = B / dt
            mbps = fps * nct / 1e6
            check = "bitexact" if exact else f"fer={fer:.4f}"
            rows.append(
                f"{n} {tag} {ldc_n_pad} {t_layout:.1f} {tc:.1f} "
                f"{dt / B * 1e6:.2f} {fps:.0f} {mbps:.2f} {check} "
                f"xla_fer={fer_x:.4f} xla_us={dt_x / B * 1e6:.2f} "
                f"vs_xla={dt_x / dt:.2f}x")
            print(f"n={n:6d} {tag:18s} n_pad={ldc_n_pad:7d} "
                  f"layout {t_layout:5.1f}s compile {tc:6.1f}s  "
                  f"{dt/B*1e6:8.2f} us/frame  {fps:8.0f} frames/s  "
                  f"{mbps:8.2f} Mbits/s  {check} (vs xla {dt_x/dt:.2f}x)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — the limit curve IS the data
            msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
            msg = msg.split("\n")[0][:120].replace(" ", "_")
            rows.append(f"{n} {tag} - - - - - - FAIL:{msg}")
            print(f"n={n:6d} {tag:18s} FAILED: {msg}", flush=True)

    for cfg in args.configs.split(","):
        n, Z = (int(v) for v in cfg.split(":"))
        code = make_qc_benchmark_code(n, Z, dv=3, dc=6, seed=1)
        rng = np.random.default_rng(n)
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
        _, dt_x, _ = timed(lambda: xla(llr_s), read_f)
        dt_x = min([dt_x] + [timed(lambda: xla(llr_s), read_f)[1]
                             for _ in range(args.best - 1)])
        print(f"n={n:6d} {'xla_sorted':18s} {dt_x/B*1e6:8.2f} us/frame  "
              f"{B/dt_x:8.0f} frames/s", flush=True)

        variants = [("float32", "qc", "BP", "lanes_f32_qc"),
                    ("bfloat16", "qc", "BP", "lanes_bf16_qc"),
                    ("int8", "qc", "BP_MS", "lanes_int8_qc")]
        if n <= 16384:
            variants.insert(0, ("bfloat16", "clos", "BP",
                                "lanes_bf16_clos"))
        for dtype, transport, mode, tag in variants:
            try:
                t0 = time.perf_counter()
                ldc = to_lanes_device(code, transport=transport)
                t_layout = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                rows.append(f"{n} {tag} - - - - - - "
                            f"FAIL:{str(e)[:120].replace(' ', '_')}")
                continue
            llr_l = jnp.asarray(llr[np.asarray(ldc.sorted_dc.vn_perm)])
            fn = functools.partial(
                bp_decode_lanes, ldc, llr_l, iterations=args.iters,
                early_term=False, minsum_mode=mode, message_dtype=dtype)
            record(n, tag, ldc.n_pad, t_layout, fn, dec_x, fer_x, dt_x,
                   code.nct)

        if n <= 8192 and args.with_edge_major:
            # the pre-round-4 routing winner for block-local codes: the
            # edge-major kernel with the one-hot MXU permutation
            from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
            from libldpc_tpu.ops.pallas.layout import to_pallas_device

            try:
                t0 = time.perf_counter()
                pdc = to_pallas_device(code)
                t_layout = time.perf_counter() - t0
                assert pdc.mxu_blocks_fwd is not None
                llr_p = jnp.asarray(llr[np.asarray(pdc.sorted_dc.vn_perm)])
                fn = functools.partial(
                    bp_decode_pallas, pdc, llr_p, iterations=args.iters,
                    early_term=False, message_dtype="bfloat16",
                    permute="mxu")
                record(n, "edge_mxu_bf16", pdc.n_pad, t_layout, fn,
                       dec_x, fer_x, dt_x, code.nct)
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:120].replace(" ", "_")
                rows.append(f"{n} edge_mxu_bf16 - - - - - - FAIL:{msg}")
                print(f"n={n:6d} edge_mxu_bf16 FAILED: {msg}", flush=True)

    path = os.path.join(args.outdir, "res_qc_transport.txt")
    with open(path, "w") as f:
        f.write(
            f"# qc transport vs generic routes, (3,6)-regular QC "
            f"(make_qc_benchmark_code), BP {args.iters} iters no-ET "
            f"(int8 rows: BP_MS), batch {B}, one v5e chip\n"
            "# check column: 'bitexact' = hard decisions identical to the "
            "XLA sorted decoder on the full batch\n"
            "n variant n_pad layout_s compile_s us/frame frames/s Mbits/s "
            "check xla\n" + "\n".join(rows) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
