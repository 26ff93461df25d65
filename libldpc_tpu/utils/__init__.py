from .params import (
    MAX_LLR,
    MIN_LLR,
    SHORTEN_LLR,
    ChannelParams,
    DecoderParams,
    SimulationParams,
)

__all__ = [
    "MAX_LLR",
    "MIN_LLR",
    "SHORTEN_LLR",
    "ChannelParams",
    "DecoderParams",
    "SimulationParams",
]
