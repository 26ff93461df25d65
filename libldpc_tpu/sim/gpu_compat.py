"""GPU-stack-compatible simulation entry: simfile + mapfile (+ layerfile).

The reference's CUDA simulator is configured by files instead of flags
(``gpu/sim_cuda.cpp``, formats in ``gpu/sim/ldpcsim.cpp:26-198``):

* **simfile** — logfile name, constellation size M, bits per symbol, labels,
  SNR list, max frames, min FEC, BP iterations, early-term flag;
* **mapfile** — bit-to-symbol mapping ``[bits, n_sym]`` over codeword-bit
  positions;
* **layerfile** — CN layers for the layered decoding schedule.

:func:`run_from_simfiles` reproduces that entry point on the TPU simulator.
"""

from __future__ import annotations

from ..models.code import LDPCCode
from ..models.io import parse_mapfile, parse_simfile
from ..ops.modulation import Constellation
from ..utils.params import ChannelParams, DecoderParams, SimulationParams
from .driver import Simulator
from .results import SimResults


def build_simulator_from_files(
    code_file: str,
    sim_file: str,
    map_file: str,
    layer_file: str = "",
    gen_file: str = "",
    batch_size: int = 1024,
    seed: int = 0,
    mesh=None,
    use_pallas: bool = False,
    verbose: bool = True,
) -> Simulator:
    code = LDPCCode.from_files(code_file, gen_file, layer_file)
    sf = parse_simfile(sim_file)
    if code.nct % sf.bits != 0:
        # gpu/sim/ldpcsim.cpp:117-119
        raise ValueError(
            "Chosen setting m with n_c does not work. Please correct."
        )
    n_sym = code.nct // sf.bits
    mapper = parse_mapfile(map_file, sf.bits, n_sym)
    cstl = Constellation.mask(sf.M, labels=sf.labels)

    # BPSK with the natural map needs no modulation pipeline, but using it
    # uniformly keeps simfile semantics exact (labels may reorder points)
    return Simulator(
        code,
        DecoderParams(
            early_term=sf.early_term,
            iterations=sf.bp_iter,
            type="BP",
            layered=layer_file != "",
        ),
        ChannelParams(seed=seed, x_values=tuple(sf.snrs), type="AWGN"),
        SimulationParams(
            batch_size=batch_size,
            max_frames=sf.max_frames,
            fec=sf.min_fec,
            result_file=sf.name or None,
        ),
        mesh=mesh,
        use_pallas=use_pallas,
        modulation=(cstl, mapper),
        verbose=verbose,
    )


def run_from_simfiles(
    code_file: str,
    sim_file: str,
    map_file: str,
    layer_file: str = "",
    gen_file: str = "",
    batch_size: int = 1024,
    seed: int = 0,
    stop_flag=None,
    verbose: bool = True,
) -> SimResults:
    sim = build_simulator_from_files(
        code_file,
        sim_file,
        map_file,
        layer_file=layer_file,
        gen_file=gen_file,
        batch_size=batch_size,
        seed=seed,
        verbose=verbose,
    )
    return sim.start(stop_flag=stop_flag)
