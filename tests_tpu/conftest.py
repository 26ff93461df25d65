"""Hardware-gated test harness.

Unlike ``tests/`` (which forces the CPU backend and a virtual 8-device
mesh), this suite runs on whatever platform JAX selects — on a TPU host
that is the real chip.  Every test skips unless a TPU is present, so
``pytest tests_tpu/`` is safe (and a no-op) on CPU-only machines.

Run:  ``python -m pytest tests_tpu/ -x -q``  (from the repo root, on TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

try:  # persistent compile cache: cold Mosaic compiles through the axon
    # tunnel can take minutes; warm re-runs are seconds
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(not on_tpu(), reason="needs TPU hardware")
