"""File-driven CLI — the ``sim_cuda`` executable's TPU-native twin.

Mirrors ``gpu/sim_cuda.cpp``: ``-code``, ``-sim``, ``-map`` are required,
``-layer`` optional, ``-threads`` maps to the device batch size.  Unlike the
reference there are no compile-time buffer limits to validate
(``gpu/sim_cuda.cpp:131-145``) — shapes are runtime-static per code.

Usage::

    python -m libldpc_tpu.sim_cuda -code h.txt -sim sim.txt -map map.txt
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sim_cuda")
    p.add_argument("-code", required=True, help="codefile (headered dialect ok)")
    p.add_argument("-sim", required=True, help="simfile")
    p.add_argument("-map", dest="mapfile", required=True, help="mapfile")
    p.add_argument("-layer", default="", help="layerfile (layered schedule)")
    p.add_argument("-G", "--gen-matrix", default="", help="generator matrix file")
    p.add_argument("-threads", type=int, default=1024,
                   help="parallel frames per device step (reference: <=64 "
                        "CUDA blocks; here the device batch size)")
    p.add_argument("-seed", type=int, default=0)
    args = p.parse_args(argv)

    from .sim.gpu_compat import run_from_simfiles

    run_from_simfiles(
        args.code,
        args.sim,
        args.mapfile,
        layer_file=args.layer,
        gen_file=args.gen_matrix,
        batch_size=args.threads,
        seed=args.seed,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
