"""Command-line simulator — the ``ldpcsim`` executable's TPU-native twin.

Flags mirror ``src/sim_cpu.cpp:5-85`` (positional ``codefile output-file
snr-range``, ``-G``, ``-i/--num-iterations``, ``-s/--seed``, ``--channel``,
``--decoding``, ``--max-frames``, ``--frame-error-count``,
``--no-early-term``) with TPU-native additions: ``--batch-size`` (replaces
``-t/--num-threads``; the old flag is still accepted and folded into the
batch), ``--devices``, ``--points-parallel``, ``--pallas``,
``--message-dtype``, ``--checkpoint``, ``--error-log``; ``--layer-file``
both loads the decoding layers and enables the layered (serial) schedule,
like the GPU stack's ``-layer`` (``gpu/sim_cuda.cpp``).

Usage::

    python -m libldpc_tpu.cli codefile.txt results.txt 0 6 0.2 -G gen.txt
"""

from __future__ import annotations

import argparse
import sys
import threading


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ldpcsim",
        description="TPU-native LDPC Monte-Carlo BER/FER simulator",
    )
    p.add_argument("codefile", help="LDPC parity-check matrix file containing all non-zero entries.")
    p.add_argument("output_file", metavar="output-file", help="Results output file.")
    p.add_argument("snr_range", metavar="snr-range", nargs=3, type=float,
                   help="{MIN} {MAX} {STEP}")
    p.add_argument("-G", "--gen-matrix", default="", help="Generator matrix file.")
    p.add_argument("-i", "--num-iterations", type=int, default=50,
                   help="Number of iterations for decoding. (Default: 50)")
    p.add_argument("-s", "--seed", type=int, default=0, help="RNG seed. (Default: 0)")
    p.add_argument("-t", "--num-threads", type=int, default=0,
                   help="Deprecated alias; frames are batched on device. "
                        "If set, used as the batch size.")
    p.add_argument("--batch-size", type=int, default=1024,
                   help="Frames decoded per device step. (Default: 1024)")
    p.add_argument("--channel", default="AWGN",
                   help='Specifies channel: "AWGN", "BSC", "BEC" (Default: AWGN)')
    p.add_argument("--decoding", default="BP",
                   help='Specifies decoding algorithm: "BP", "BP_MS" '
                        '(reference set); also "BP_PHI" (exact '
                        'sum-product, fastest clean form), "BP_TANH", '
                        '"BP_LIN", "BP_NMS", "BP_OMS" (Default: BP)')
    p.add_argument("--max-frames", type=float, default=10e9,
                   help="Limit number of decoded frames.")
    p.add_argument("--frame-error-count", type=int, default=50,
                   help="Maximum frame errors for given simulation point.")
    p.add_argument("--no-early-term", action="store_true",
                   help="Disable early termination for decoding.")
    p.add_argument("--devices", type=int, default=0,
                   help="Shard frames over this many devices (0 = all).")
    p.add_argument("--points-parallel", type=int, default=1,
                   help="Simulate this many sweep points concurrently over a "
                        "2-D (points x frames) device mesh (the reference "
                        "runs points strictly sequentially, "
                        "src/sim/ldpcsim.cpp:141).")
    p.add_argument("--multihost", action="store_true",
                   help="Initialize jax.distributed and shard over every "
                        "device of the job (run one process per host).")
    p.add_argument("--pallas", action="store_true",
                   help="Use the fused Pallas decode kernel.")
    p.add_argument("--message-dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="Message dtype for the fused kernel (bfloat16 "
                        "halves transport cost at ~0.4%% quantisation; "
                        "int8 is quantized min-sum — requires a "
                        "min-sum-family --decoding and a block-local "
                        "code, see benchmarks/PARITY_int8.md).")
    p.add_argument("--quant-scale", type=float, default=0.1875,
                   help="int8 message lattice step in LLR units.")
    p.add_argument("--layer-file", default="", help="Decoding-layer file for the layered schedule.")
    p.add_argument("--qc-z", default="",
                   help="Declare the code quasi-cyclic with this lifting "
                        "size: verified against H (every ZxZ block a "
                        "zero or single-shift circulant), then the fused "
                        "decoder rides the structure-aware qc transport. "
                        "'auto' searches the divisors of gcd(nc, mc) "
                        "largest-first and finds Z itself (codefiles "
                        "carry no lifting structure).")
    p.add_argument("--checkpoint", default="", help="Sweep checkpoint file (enables --resume).")
    p.add_argument("--resume", action="store_true", help="Resume from checkpoint.")
    p.add_argument("--error-log", default="", help="Per-error-frame forensic log file.")
    p.add_argument("--log-codewords", action="store_true",
                   help="Also dump the decided and true codewords "
                        "(hex-packed) per errored frame in the error log — "
                        "the GPU stack's LOG_CW compile flag, at runtime.")
    p.add_argument("--results-dir", default="",
                   help="Provision a per-run results directory (created, "
                        "must not already exist) and place the output/"
                        "checkpoint/error-log files inside it — the "
                        "capability of gpu/sim_cuda.sh's results-dir setup.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    snr = args.snr_range
    if snr[0] > snr[1]:
        print("snr min > snr max", file=sys.stderr)
        return 1

    if args.results_dir:
        # gpu/sim_cuda.sh capability: provision a fresh per-run directory
        # and keep every artifact of the run together (it refuses to reuse
        # an existing simulation name, gpu/sim_cuda.sh:36-43)
        import os

        if os.path.exists(args.results_dir):
            print(
                f"results dir {args.results_dir!r} already exists — "
                "refusing to overwrite a previous run",
                file=sys.stderr,
            )
            return 1
        os.makedirs(args.results_dir)
        args.output_file = os.path.join(
            args.results_dir, os.path.basename(args.output_file)
        )
        if args.checkpoint:
            args.checkpoint = os.path.join(
                args.results_dir, os.path.basename(args.checkpoint)
            )
        if args.error_log:
            args.error_log = os.path.join(
                args.results_dir, os.path.basename(args.error_log)
            )

    # import late so --help works without jax initialisation
    import jax

    from .models.code import LDPCCode
    from .parallel.mesh import default_mesh
    from .sim.driver import Simulator
    from .utils.params import ChannelParams, DecoderParams, SimulationParams

    primary = True
    mesh = None
    if args.multihost:
        from .parallel import distributed

        distributed.initialize()
        primary = distributed.is_primary()
        mesh = distributed.global_mesh()

    code = LDPCCode.from_files(args.codefile, args.gen_matrix, args.layer_file)
    if args.qc_z:
        from .models import detect_qc

        # raises when H is not QC at this Z (or, for 'auto', at any Z)
        detect_qc(code, None if args.qc_z == "auto" else int(args.qc_z))
        if primary and args.qc_z == "auto":
            print(f"QC structure detected: Z = {code.qc[0]}")
    if primary:
        bar = "=" * 88
        print(bar)
        print(f"Parity-Check Matrix: {args.codefile}")
        print(f"Generator Matrix: {args.gen_matrix}")
        print(code.summary())
        print(bar)

    n_dev = len(jax.devices())
    wide_mesh = None
    if args.points_parallel > 1:
        from .parallel.mesh import FRAME_AXIS, POINT_AXIS

        use = args.devices or n_dev
        if use % args.points_parallel:
            print(
                f"--points-parallel {args.points_parallel} does not divide "
                f"{use} devices", file=sys.stderr,
            )
            return 1
        wide_mesh = jax.make_mesh(
            (args.points_parallel, use // args.points_parallel),
            (POINT_AXIS, FRAME_AXIS),
            devices=jax.devices()[:use],
        )
    elif mesh is None and args.devices != 1 and n_dev > 1:
        mesh = default_mesh(args.devices or None)

    batch = args.num_threads if args.num_threads > 0 else args.batch_size
    sim = Simulator(
        code,
        DecoderParams(
            early_term=not args.no_early_term,
            iterations=args.num_iterations,
            type=args.decoding,
            layered=bool(args.layer_file),
            message_dtype=args.message_dtype,
            quant_scale=args.quant_scale,
        ),
        ChannelParams(seed=args.seed, x_range=tuple(snr), type=args.channel),
        SimulationParams(
            batch_size=batch,
            max_frames=int(args.max_frames),
            fec=args.frame_error_count,
            result_file=args.output_file if primary else None,
            checkpoint_file=(args.checkpoint or None) if primary else None,
            error_log_file=(args.error_log or None) if primary else None,
            error_log_codewords=args.log_codewords,
        ),
        mesh=mesh,
        use_pallas=args.pallas,
        verbose=primary,
    )

    if primary:
        # config dump like the reference's `std::cout << sim`
        # (src/sim/ldpcsim.cpp:84-95)
        print("== Decoder Parameters")
        print(f"Type: {args.decoding}\nIterations: {args.num_iterations}\n"
              f"Early Termination: {int(not args.no_early_term)}")
        print("== Channel Parameters")
        print(f"Type: {args.channel}\nSeed: {args.seed}\n"
              f"Range: [{snr[0]}, {snr[1]}], step {snr[2]}")
        print("== Simulation Parameters")
        print(f"Batch size: {batch}\nMax frames: {int(args.max_frames)}\n"
              f"Frame error count: {args.frame_error_count}\n"
              f"Result file: {args.output_file}")
        print("=" * 88)

    stop = threading.Event()
    try:
        if wide_mesh is not None:
            sim.start_wide(wide_mesh, stop_flag=stop.is_set,
                           resume=args.resume)
        else:
            sim.start(stop_flag=stop.is_set, resume=args.resume)
    except KeyboardInterrupt:
        stop.set()
        print("\ninterrupted — partial results written", file=sys.stderr)
        return 130
    return 0


if __name__ == "__main__":
    sys.exit(main())
