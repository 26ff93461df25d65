"""Quasi-cyclic (protograph) code sweep — the deployed-LDPC workflow.

Production LDPC codes (802.11n/ax, 802.16e, 5G-NR, DVB-S2) are
overwhelmingly quasi-cyclic: a small base matrix of cyclic-shift
coefficients expanded by a lift size Z.  The reference has no QC support;
here the whole path is three lines — expand, (optionally) solve a
systematic generator, sweep — and the degree-class position-major layout
makes the expanded code's CN<->VN edge permutation block-local, so the
fused kernel's transport runs as one-hot 128x128 matmuls on the MXU
(``permute='auto'`` picks it; see ops/pallas/layout.py).

Run on TPU as-is, or on CPU with
``env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/qc_code_sweep.py``
(the CPU run drops --pallas automatically).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from libldpc_tpu import (
    ChannelParams,
    DecoderParams,
    SimulationParams,
    Simulator,
)
from libldpc_tpu.models import expand_qc, systematic_generator


def main():
    # a small rate-1/2 protograph in the 802.11n style: -1 = zero block,
    # s >= 0 = identity right-shifted by s.  Z = 128 lifts it to n = 1536.
    base = np.array([
        [ 0, -1, 13,  7, -1,  0,  0, -1, -1, -1, -1, -1],
        [22,  0, -1,  5,  3, -1,  0,  0, -1, -1, -1, -1],
        [-1, 11,  9, -1,  0, -1, -1,  0,  0, -1, -1, -1],
        [ 4, -1, -1,  1, -1, 17, -1, -1,  0,  0, -1, -1],
        [-1,  8,  2, -1, 19, -1, -1, -1, -1,  0,  0, -1],
        [14, -1, -1,  6, -1, 21,  0, -1, -1, -1,  0,  0],
    ])
    Z = 128
    code = expand_qc(base, Z)
    G = systematic_generator(code)
    if G is not None:
        code.G = G
    print(code.summary())

    import jax

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    sim = Simulator(
        code,
        DecoderParams(iterations=50, early_term=True,
                      message_dtype="bfloat16" if on_tpu else "float32"),
        ChannelParams(type="AWGN", seed=0, x_range=(0.0, 2.1, 1.0)),
        SimulationParams(batch_size=4096 if on_tpu else 256,
                         max_frames=200_000, fec=100),
        use_pallas=on_tpu,
    )
    print("decode path:", sim.decode_path)
    res = sim.start()
    for i, x in enumerate(res.x_values):
        print(f"SNR {x:5.1f} dB   FER {res.fer[i]:.3e}   "
              f"avg_iter {res.avg_iter[i]:5.1f}   "
              f"({int(res.frames[i])} frames)")


if __name__ == "__main__":
    main()
