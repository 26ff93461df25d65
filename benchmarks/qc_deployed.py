"""Deployed-class QC codes through every marquee path.

Deployed LDPC codes (802.11n / 802.16e / 5G-NR / DVB) are quasi-cyclic
protographs — the code family the structure-aware ``"qc"`` lane-major
transport (one cyclic roll per base edge) and the free natural layered
schedule (``models.construct.qc_natural_layers``) exist for.  This
harness measures them end to end on one chip:

* the REAL bundled IEEE 802.11n rate-1/2 codes (round 5):
  n = 1296 (Z=54 — below the qc transport's 2x inflation cap, rides the
  generic transports by design) and n = 1944 (Z=81 — the arbitrary-Z
  embedded-roll transport, Zq=128),
* an 802.11n-style rate-1/2 protograph (6x12 base, dual-diagonal
  parity part) lifted at Z=128 (n=1536) and Z=512 (n=6144) — the
  synthetic 128-multiple ladder kept for round-4 comparability,
* the QC lane-major kernel at f32 (bit-exact vs the XLA sorted
  decoder), bf16, and int8 (integer-lattice min-sum), fixed 32
  iterations — the serving-throughput ladder,
* flooding vs the natural layered schedule: mean iterations to
  convergence AND the early-termination WALL-CLOCK (us/frame with ET)
  for both schedules — the number that decides whether the layered
  schedule's ~2x convergence advantage survives its per-iteration cost
  (reference capability: layerfiles, ``gpu/ldpc/ldpc.cpp:111-138``).

Writes ``res_qc_deployed.txt``.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 802.11n-style rate-1/2 protograph: systematic left half + dual-diagonal
# parity structure (same shape as examples/qc_code_sweep.py).
BASE = [
    [ 0, -1, 13,  7, -1,  0,  0, -1, -1, -1, -1, -1],
    [22,  0, -1,  5,  3, -1,  0,  0, -1, -1, -1, -1],
    [-1, 11,  9, -1,  0, -1, -1,  0,  0, -1, -1, -1],
    [ 4, -1, -1,  1, -1, 17, -1, -1,  0,  0, -1, -1],
    [-1,  8,  2, -1, 19, -1, -1, -1, -1,  0,  0, -1],
    [14, -1, -1,  6, -1, 21,  0, -1, -1, -1,  0,  0],
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--z-list", default="128,512",
                    help="synthetic-protograph lifting sizes ('' to skip)")
    ap.add_argument("--wifi-list", default="1296,1944",
                    help="bundled 802.11n codeword lengths ('' to skip)")
    ap.add_argument("--nr-list", default="",
                    help="5G-NR-structured synthetic specs 'bg:Z' "
                    "(models.make_nr_like_code — NR skeleton, arbitrary "
                    "NR lifting sizes; '' to skip)")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--best", type=int, default=3)
    ap.add_argument("--snr-db", type=float, default=2.5,
                    help="waterfall point of this protograph (threshold "
                    "~1.7 dB): non-trivial convergence work, most frames "
                    "decodable — where layered-vs-flooding matters")
    ap.add_argument("--outdir",
                    default=os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke test)")
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

    from libldpc_tpu.models import (
        expand_qc, make_nr_like_code, qc_natural_layers, wifi_code,
    )
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

    specs = [("synthetic", int(v)) for v in args.z_list.split(",") if v]
    specs += [("wifi", int(v)) for v in args.wifi_list.split(",") if v]
    specs += [("nr", v) for v in args.nr_list.split(",") if v]
    for kind, param in specs:
        if kind == "synthetic":
            Z = param
            code = expand_qc(np.asarray(BASE, dtype=np.int64), Z)
            qc_natural_layers(code)
        elif kind == "nr":
            bg, Z = (int(t) for t in param.split(":"))
            code = make_nr_like_code(bg=bg, Z=Z, seed=7, with_G=False,
                                     with_layers=True)
        else:
            code = wifi_code(param, with_G=False, with_layers=True)
            Z = code.qc[0]
        n = code.nc
        rng = np.random.default_rng(Z)
        sigma2 = 10.0 ** (-args.snr_db / 10.0)
        y = 1.0 + rng.normal(size=(n, B)) * np.sqrt(sigma2)
        llr = (2.0 * y / sigma2).astype(np.float32)
        if code.puncture is not None and len(code.puncture):
            llr[np.asarray(code.puncture)] = 0.0  # NR 2Z info puncture

        sdc = to_sorted_device(code)
        llr_s = jnp.asarray(llr[np.asarray(sdc.vn_perm)])
        xla = jax.jit(functools.partial(
            bp_decode_sorted, sdc, iterations=args.iters, early_term=False))
        out_x = xla(llr_s)
        dec_x = np.asarray(out_x.llr_out <= 0)
        _, dt_x, _ = timed(lambda: xla(llr_s), read_f)
        dt_x = min([dt_x] + [timed(lambda: xla(llr_s), read_f)[1]
                             for _ in range(args.best - 1)])
        print(f"Z={Z:4d} n={n:6d} {'xla_flooding':22s} "
              f"{dt_x/B*1e6:8.2f} us/frame {B/dt_x:9.0f} frames/s",
              flush=True)
        rows.append(f"{Z} {n} xla_flooding f32 {args.iters} "
                    f"{dt_x/B*1e6:.2f} {B/dt_x:.0f} "
                    f"{B/dt_x*code.nct/1e6:.1f} - -")

        # driver-style transport selection: qc when in-envelope (any Z
        # since round 5), else the generic transports (Z=54's 2.37x lane
        # inflation is past the 2x cap by design — benes for f32, clos
        # for bf16/int8)
        try:
            ldc = to_lanes_device(code, transport="qc", with_layers=True)
            ldc_f32 = ldc_sub = ldc
            tname_f32 = tname_sub = "qc"
        except ValueError:
            ldc_f32 = to_lanes_device(code, transport="benes",
                                      with_layers=True)
            ldc_sub = to_lanes_device(code, transport="clos",
                                      with_layers=True)
            tname_f32, tname_sub = "benes", "clos"

        def pick(dtype):
            if dtype == "float32":
                return ldc_f32, tname_f32
            return ldc_sub, tname_sub

        # --- serving-throughput ladder: fixed iterations, flooding ------
        # int8 rides plain BP_MS for the synthetic/wifi rate-1/2 rows
        # (round-4 comparability); the low-rate NR mother code sits below
        # the plain-min-sum threshold at its waterfall point, so its int8
        # rows use the offset correction (2 lattice units — the
        # PARITY_int8.md round-5 recommendation)
        int8_mode = ("BP_OMS", 1.0, 0.375) if kind == "nr" else "BP_MS"
        variants = [
            ("flooding", "float32", "BP", False),
            ("flooding", "bfloat16", "BP", False),
            ("flooding", "int8", int8_mode, False),
            ("layered", "bfloat16", "BP", True),
            ("layered", "int8", int8_mode, True),
        ]
        for sched, dtype, mode, layered in variants:
            ldc_v, tname = pick(dtype)
            tag = f"{tname}_{sched}"
            try:
                fn = functools.partial(
                    bp_decode_lanes, ldc_v, llr_s, iterations=args.iters,
                    early_term=False, message_dtype=dtype,
                    minsum_mode=mode, layered=layered,
                    interpret=args.interpret)
                tc, dt, out = timed(fn, read_f)
                dt = min([dt] + [timed(fn, read_f)[1]
                                 for _ in range(args.best - 1)])
                dec = np.asarray(out.llr_out <= 0)
                check = ("bitexact" if (dec == dec_x).all() and not layered
                         else f"fer={float(np.mean(np.any(dec, 0))):.4f}")
                fps = B / dt
                print(f"Z={Z:4d} n={n:6d} {tag + '/' + dtype:22s} "
                      f"{dt/B*1e6:8.2f} us/frame {fps:9.0f} frames/s  "
                      f"{check} (vs xla {dt_x/dt:.2f}x)", flush=True)
                rows.append(
                    f"{Z} {n} {tag} {dtype} {args.iters} {dt/B*1e6:.2f} "
                    f"{fps:.0f} {fps*code.nct/1e6:.1f} {check} "
                    f"vs_xla={dt_x/dt:.2f}x")
            except Exception as e:  # noqa: BLE001 — record the wall
                msg = str(e).split("\n")[0][:110].replace(" ", "_")
                print(f"Z={Z:4d} {tag}/{dtype} FAILED: {msg}", flush=True)
                rows.append(f"{Z} {n} {tag} {dtype} {args.iters} - - - "
                            f"FAIL:{msg} -")

        # --- convergence AND wall-clock: flooding vs natural layered ----
        # mean iterations to convergence at the same SNR, plus the
        # EARLY-TERMINATION us/frame — the deployment-relevant number:
        # the layered schedule converges in ~2x fewer iterations, and
        # this row shows whether that survives its per-iteration cost.
        for dtype, mode in (("bfloat16", "BP"), ("int8", int8_mode)):
            ldc_v, tname = pick(dtype)
            for layered in (False, True):
                tag = "layered" if layered else "flooding"
                try:
                    fn = functools.partial(
                        bp_decode_lanes, ldc_v, llr_s,
                        iterations=args.iters, early_term=True,
                        message_dtype=dtype, minsum_mode=mode,
                        layered=layered, interpret=args.interpret)
                    tc, dt, out = timed(fn, read_f)
                    dt = min([dt] + [timed(fn, read_f)[1]
                                     for _ in range(args.best - 1)])
                    it = np.asarray(jax.device_get(out.iterations),
                                    np.float64)
                    ok = np.asarray(jax.device_get(out.is_codeword))
                    mean_it = (float(it[ok].mean()) if ok.any()
                               else float("nan"))
                    fps = B / dt
                    print(f"Z={Z:4d} {tname}_{tag}_et/{dtype:9s} "
                          f"{dt/B*1e6:8.2f} us/frame {fps:9.0f} frames/s "
                          f"mean_iter={mean_it:.2f} "
                          f"converged={ok.mean():.3f}", flush=True)
                    rows.append(
                        f"{Z} {n} {tname}_{tag}_et {dtype} ET "
                        f"{dt/B*1e6:.2f} {fps:.0f} "
                        f"{fps*code.nct/1e6:.1f} "
                        f"mean_iter={mean_it:.2f} "
                        f"converged={ok.mean():.3f}")
                except Exception as e:  # noqa: BLE001 — record the wall
                    msg = str(e).split("\n")[0][:110].replace(" ", "_")
                    print(f"Z={Z:4d} {tag}_et/{dtype} FAILED: {msg}",
                          flush=True)
                    rows.append(f"{Z} {n} {tname}_{tag}_et {dtype} ET - "
                                f"- - FAIL:{msg} -")

    path = os.path.join(args.outdir, "res_qc_deployed.txt")
    with open(path, "w") as f:
        f.write(
            "# deployed-class QC codes: REAL bundled 802.11n rate-1/2 "
            "(n=1296 Z=54, n=1944 Z=81 — arbitrary-Z qc transport, round "
            "5) + synthetic 802.11n-style protograph (6x12 base, Z=128/"
            "512)\n"
            f"# batch {B}, {args.iters} iters fixed (ladder) / ET "
            f"(convergence + wall-clock), AWGN {args.snr_db} dB, one v5e "
            "chip\n"
            "# ladder columns: Z n variant dtype iters us/frame frames/s "
            "Mbits/s check note\n"
            "# *_et columns:   Z n variant dtype ET us/frame frames/s "
            "Mbits/s mean_iter converged\n" + "\n".join(rows) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
