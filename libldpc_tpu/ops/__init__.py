from .device import PAD_LLR, DeviceCode, to_device
from .decoder import DecodeOutput, bp_decode, bp_decode_jit
from . import cn_ops

__all__ = [
    "PAD_LLR",
    "DeviceCode",
    "DecodeOutput",
    "bp_decode",
    "bp_decode_jit",
    "cn_ops",
    "to_device",
]
