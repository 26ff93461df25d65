"""Point-parallel streaming sweep over a 2-D device mesh.

Two capabilities the reference lacks, composed: sweep points running
concurrently (the reference is strictly sequential per point,
``src/sim/ldpcsim.cpp:141``) and streaming-compaction early termination
(device work per frame tracks ``avg_iter``).  Each point group runs its
own stream pool at its own SNR with per-point refill gating, drain and
exact ``max_frames`` quotas.

Equivalent CLI:
    python -m libldpc_tpu.cli h.txt res.txt -7 -3.9 1 -G g.txt \
        --points-parallel 2 --batch-size 4096

Runs on any device set — on a single host, set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to try it on a virtual CPU mesh.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax

from libldpc_tpu import (
    ChannelParams,
    DecoderParams,
    LDPCCode,
    SimulationParams,
    Simulator,
)
from libldpc_tpu.parallel.mesh import FRAME_AXIS, POINT_AXIS

H = "/root/reference/tests/code/h.txt"
G = "/root/reference/tests/code/g.txt"

if not os.path.exists(H):
    raise SystemExit("bundled reference code files not found")

devs = jax.devices()
n_points_parallel = 2 if len(devs) >= 2 else 1
n_frame_dev = len(devs) // n_points_parallel
mesh = jax.make_mesh(
    (n_points_parallel, n_frame_dev), (POINT_AXIS, FRAME_AXIS)
)

code = LDPCCode.from_files(H, G)
sim = Simulator(
    code,
    DecoderParams(iterations=50, early_term=True),
    ChannelParams(seed=0, x_range=(-7.0, -3.9, 1.0), type="AWGN"),
    SimulationParams(batch_size=64 * n_frame_dev, fec=50, max_frames=20_000),
)
results = sim.start_wide(mesh)

for x, fer, frames, ai in zip(
    results.x_values, results.fer, results.frames, results.avg_iter
):
    print(f"SNR {x:5.1f} dB   FER {fer:.3e}   avg_iter {ai:5.1f}   "
          f"({frames} frames)")
