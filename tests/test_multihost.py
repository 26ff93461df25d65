"""Real multi-process `jax.distributed` smoke test.

Launches two worker processes (4 virtual CPU devices each) that initialise a
coordination service, build the global 8-device mesh, and run one sharded
simulation step.  Both must report identical globally psum-reduced counters —
the multi-host contract the sweep driver's stopping rule relies on.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ.pop('PALLAS_AXON_POOL_IPS', None)
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=f'localhost:{{port}}',
                               num_processes=nproc, process_id=proc_id)
    import numpy as np
    sys.path.insert(0, {repo!r})
    from libldpc_tpu.models import make_benchmark_code
    from libldpc_tpu.ops.sorted import to_sorted_device
    from libldpc_tpu.parallel import distributed
    from libldpc_tpu.parallel.mesh import make_sim_step
    from libldpc_tpu.utils.params import DecoderParams
    mesh = distributed.global_mesh()
    code = make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)
    sdc = to_sorted_device(code)
    step = make_sim_step(sdc, "AWGN", DecoderParams(iterations=8), 16, mesh=mesh)
    out = step(jax.random.PRNGKey(0), np.float32(0.0))
    print(f"RESULT {{jax.process_count()}} {{len(jax.devices())}} "
          f"{{int(out.frames)}} {{int(out.frame_errors)}}", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_sim(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out[-2000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-2000:]
        results.append(line[0].split()[1:])

    # both processes: 2 procs, 8 global devices, identical global counters
    assert results[0] == results[1]
    nproc, ndev, frames, fec = map(int, results[0])
    assert nproc == 2 and ndev == 8
    assert frames == 16 * 8
