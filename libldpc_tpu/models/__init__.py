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
from .standards import (
    load_base_matrix,
    load_nr_shift_table,
    make_nr_like_code,
    nr_lifting_sizes,
    nr_set_index,
    wifi_code,
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
    "load_base_matrix",
    "load_nr_shift_table",
    "make_benchmark_code",
    "make_nr_like_code",
    "make_qc_benchmark_code",
    "nr_lifting_sizes",
    "nr_set_index",
    "qc_natural_layers",
    "make_peg_code",
    "make_regular_code",
    "systematic_generator",
    "wifi_code",
]
