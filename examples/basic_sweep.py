"""Basic BER/FER sweep — the reference's headline use case.

Equivalent reference invocation:
    ./ldpcsim h.txt res.txt -7 -4.9 1 -G g.txt -i 50 -t 8
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from libldpc_tpu import (
    ChannelParams,
    DecoderParams,
    LDPCCode,
    SimulationParams,
    Simulator,
)

H = "/root/reference/tests/code/h.txt"
G = "/root/reference/tests/code/g.txt"

if not os.path.exists(H):
    raise SystemExit("bundled reference code files not found")

code = LDPCCode.from_files(H, G)
print(code.summary())

sim = Simulator(
    code,
    DecoderParams(iterations=50, type="BP"),       # or BP_MS / BP_LIN / ...
    ChannelParams(seed=0, x_range=(-7.0, -4.9, 1.0), type="AWGN"),
    SimulationParams(batch_size=4096, fec=100, result_file="results.txt"),
)
results = sim.start()

for x, fer, ber, frames in zip(
    results.x_values, results.fer, results.ber, results.frames
):
    print(f"SNR {x:5.1f} dB   FER {fer:.3e}   BER {ber:.3e}   ({frames} frames)")
