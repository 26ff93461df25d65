from .code import EdgeLayout, LDPCCode
from .construct import (
    expand_qc,
    make_benchmark_code,
    make_regular_code,
    systematic_generator,
)
from . import gf2, io

__all__ = [
    "EdgeLayout",
    "LDPCCode",
    "expand_qc",
    "gf2",
    "io",
    "make_benchmark_code",
    "make_regular_code",
    "systematic_generator",
]
