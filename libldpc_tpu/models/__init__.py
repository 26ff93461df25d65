from .code import EdgeLayout, LDPCCode
from .construct import make_benchmark_code, make_regular_code, systematic_generator
from . import gf2, io

__all__ = [
    "EdgeLayout",
    "LDPCCode",
    "gf2",
    "io",
    "make_benchmark_code",
    "make_regular_code",
    "systematic_generator",
]
