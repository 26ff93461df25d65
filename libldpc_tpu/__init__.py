"""libldpc_tpu — a TPU-native LDPC simulation and decoding framework.

A from-scratch rebuild of the capabilities of heat1q/libldpc (Monte-Carlo
LDPC BER/FER simulation with belief-propagation decoding over AWGN/BSC/BEC
channels), designed for TPUs: the parity-check structure lives as padded
edge-index tensors, decoding is a batched, masked, fully-vectorised JAX
program (with fused Pallas kernels on the hot path), channels and encoding
run on-device, and Monte-Carlo scale-out is data-parallel over a
``jax.sharding.Mesh`` with ``psum``-aggregated error counters.
"""

__version__ = "0.1.0"

from .models import LDPCCode, make_benchmark_code, make_regular_code
from .utils import ChannelParams, DecoderParams, SimulationParams

__all__ = [
    "LDPC",
    "LDPCCode",
    "ChannelParams",
    "DecoderParams",
    "SimulationParams",
    "Simulator",
    "make_benchmark_code",
    "make_regular_code",
]

_LAZY = {
    "LDPC": ("api", "LDPC"),
    "Simulator": ("sim", "Simulator"),
}


def __getattr__(name):
    # Lazy: importing the API pulls in jax; keep models importable without it.
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(name)
