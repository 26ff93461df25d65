"""Device-resident code structure.

``DeviceCode`` is the jit-traversable pytree of static index tables the
decoder kernels consume.  It is the TPU analogue of the reference's
``ldpc_code`` + ``sparse_csr`` adjacency (``src/core/sparse.h:32-81``) after
the representational shift to padded CN-major edge tensors
(see :mod:`libldpc_tpu.models.code`).

All shape information is carried by the arrays themselves, so jitted
functions need no static arguments for the code structure.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..models.code import LDPCCode

#: Large-but-finite LLR used as the box-plus / min-sum identity on padding
#: lanes and as the "known bit" pin.  boxplus(x, PAD_LLR) == x exactly in
#: float32 because the correction term underflows and min(|x|, PAD) = |x|.
PAD_LLR = 1e30


class DeviceCode(NamedTuple):
    """Static index tables as device arrays (a pytree).

    Shapes: ``E = mc * max_dc`` padded CN-major edge slots.
    """

    pad_col: jnp.ndarray  # int32 [E]   VN index per slot; nc = dummy VN
    cn_mask: jnp.ndarray  # bool  [mc, max_dc]
    vn_edges: jnp.ndarray  # int32 [nc, max_dv]  (E sentinel for padding)
    vn_mask: jnp.ndarray  # bool  [nc, max_dv]
    edge_vslot: jnp.ndarray  # int32 [E] -> flattened [nc*max_dv] slot
    #                          (nc*max_dv sentinel for padding)
    bit_pos: jnp.ndarray  # int32 [nct]
    puncture: jnp.ndarray  # int32 [P]
    shorten: jnp.ndarray  # int32 [S]
    G: Optional[jnp.ndarray]  # float32 [kc, nc] 0/1 values, or None
    layer_masks: Optional[jnp.ndarray]  # bool [nl, mc], or None

    # ------------------------------------------------------------ dimensions
    @property
    def E(self) -> int:
        return self.pad_col.shape[0]

    @property
    def mc(self) -> int:
        return self.cn_mask.shape[0]

    @property
    def max_dc(self) -> int:
        return self.cn_mask.shape[1]

    @property
    def nc(self) -> int:
        return self.vn_edges.shape[0]

    @property
    def max_dv(self) -> int:
        return self.vn_edges.shape[1]

    @property
    def nct(self) -> int:
        return self.bit_pos.shape[0]

    @property
    def kc(self) -> int:
        if self.G is None:
            raise RuntimeError("code has no generator matrix")
        return self.G.shape[0]


def to_device(code: LDPCCode, with_layers: bool = False) -> DeviceCode:
    """Build the device pytree from a host :class:`LDPCCode`."""
    lay = code.layout

    # convert on the host before uploading: device-side dtype conversion
    # dispatches tiny remote compiles on tunneled backends
    def dev(x, dtype):
        return jnp.asarray(np.ascontiguousarray(np.asarray(x, dtype=dtype)))

    return DeviceCode(
        pad_col=dev(lay.pad_col, np.int32),
        cn_mask=dev(lay.cn_mask, bool),
        vn_edges=dev(lay.vn_edges, np.int32),
        vn_mask=dev(lay.vn_mask, bool),
        edge_vslot=dev(lay.edge_vslot, np.int32),
        bit_pos=dev(code.bit_pos, np.int32),
        puncture=dev(code.puncture, np.int32),
        shorten=dev(code.shorten, np.int32),
        G=None if code.G is None else dev(code.G, np.float32),
        layer_masks=(
            dev(code.layer_masks(), bool) if with_layers else None
        ),
    )


def degrees_from_mask(mask: np.ndarray) -> np.ndarray:
    return mask.sum(axis=1).astype(np.int32)
