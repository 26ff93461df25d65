from .code import EdgeLayout, LDPCCode
from .construct import (
    count_4cycles,
    expand_qc,
    girth,
    detect_qc,
    make_benchmark_code,
    make_qc_benchmark_code,
    qc_natural_layers,
    make_peg_code,
    make_regular_code,
    systematic_generator,
)
from . import gf2, io

__all__ = [
    "EdgeLayout",
    "LDPCCode",
    "count_4cycles",
    "expand_qc",
    "girth",
    "gf2",
    "io",
    "detect_qc",
    "make_benchmark_code",
    "make_qc_benchmark_code",
    "qc_natural_layers",
    "make_peg_code",
    "make_regular_code",
    "systematic_generator",
]
