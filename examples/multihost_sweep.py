"""Multi-device / multi-host sweep.

Run one copy of this script per host of a TPU pod slice (or test locally on
virtual CPU devices: ``JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8 python
examples/multihost_sweep.py``).

Frames shard over every device of the job; error counters psum-reduce over
ICI/DCN; the frame-error-count stopping rule reads globally-reduced scalars,
so all hosts stop in lockstep with no control messages.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libldpc_tpu import (
    ChannelParams,
    DecoderParams,
    SimulationParams,
    Simulator,
    make_benchmark_code,
)
from libldpc_tpu.parallel import distributed

distributed.initialize()  # no-op single-process; pod metadata on TPU
mesh = distributed.global_mesh()
primary = distributed.is_primary()
if primary:
    print("topology:", distributed.process_info())

code = make_benchmark_code(1024, dv=3, dc=6, seed=0, with_G=True)
sim = Simulator(
    code,
    DecoderParams(iterations=50),
    ChannelParams(seed=0, x_range=(1.0, 2.6, 0.5)),
    SimulationParams(
        batch_size=64 * mesh.devices.size,
        fec=100,
        result_file="results_multihost.txt" if primary else None,
    ),
    mesh=mesh,
    verbose=primary,
)
results = sim.start()
if primary:
    print({k: v.tolist() for k, v in results.as_dict().items()})
