"""Real deployed code end to end: bundled IEEE 802.11n LDPC.

Round 5 ships the actual 802.11n rate-1/2 base matrices (IEEE Std
802.11-2012 Annex F) as first-class constructions — no codefile needed —
and the arbitrary-Z structure-aware ``qc`` transport decodes them at
full fused-kernel speed (Z = 81 is not a 128-multiple; each circulant
embeds in a 128-aligned lane block).  This example runs the deployment
recipe from the measured records:

* ``wifi_code(1944)`` — n = 1944, k = 972, Z = 81, with the natural
  one-layer-per-base-row layered schedule and a systematic generator,
* int8 offset-min-sum (BP_OMS), the fastest serving config at no
  measurable accuracy cost down to FER 2e-5
  (``benchmarks/PARITY_int8.md`` round-5 addendum),
* the layered schedule + early termination — the wall-clock winner
  (7.86 vs 9.42 µs/frame on one v5e chip,
  ``benchmarks/res_qc_deployed.txt``).

Run on TPU as-is, or on CPU with
``env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/wifi_sweep.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libldpc_tpu import (
    ChannelParams,
    DecoderParams,
    SimulationParams,
    Simulator,
)
from libldpc_tpu.models import wifi_code


def main():
    code = wifi_code(1944)  # also bundled: 648 (Z=27), 1296 (Z=54)
    print(code.summary())
    print(f"QC: Z={code.qc[0]}, {len(code.layers)} natural layers")

    import jax

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    sim = Simulator(
        code,
        DecoderParams(
            iterations=50,
            early_term=True,
            type="BP_OMS",
            ms_offset=0.375,  # 2 int8 lattice units at quant_scale 0.1875
            message_dtype="int8" if on_tpu else "float32",
            layered=True,
        ),
        ChannelParams(type="AWGN", seed=0,
                      x_range=(1.0, 2.6, 0.5) if on_tpu
                      else (2.0, 2.1, 0.5)),  # CPU demo: one point
        SimulationParams(batch_size=4096 if on_tpu else 256,
                         max_frames=500_000 if on_tpu else 512,
                         fec=100 if on_tpu else 10),
        use_pallas=on_tpu,
    )
    print(f"decode path: {sim.decode_path}")
    res = sim.start()
    for x, fer, ber, it in zip(res.x_values, res.fer, res.ber,
                               res.avg_iter):
        print(f"  {x:4.1f} dB  FER {fer:.3e}  BER {ber:.3e}  "
              f"avg_iter {it:.1f}")


if __name__ == "__main__":
    main()
