"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware.  Must run before any JAX backend is
initialised; the axon sitecustomize force-selects the TPU platform via
``jax.config.update('jax_platforms', ...)``, so we override the config (not
just the env var) here.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_CODE_DIR = "/root/reference/tests/code"


def reference_code_available() -> bool:
    return os.path.exists(os.path.join(REFERENCE_CODE_DIR, "h.txt"))


requires_reference_code = pytest.mark.skipif(
    not reference_code_available(),
    reason="bundled reference code files not available",
)


@pytest.fixture(scope="session")
def bundled_code():
    """The reference's bundled k=128 / transmitted-n=1024 test code."""
    from libldpc_tpu.models import LDPCCode

    if not reference_code_available():
        pytest.skip("reference code files not available")
    return LDPCCode.from_files(
        os.path.join(REFERENCE_CODE_DIR, "h.txt"),
        os.path.join(REFERENCE_CODE_DIR, "g.txt"),
    )


@pytest.fixture(scope="session")
def small_code():
    """A small random regular code with a generator, for fast unit tests."""
    from libldpc_tpu.models import make_benchmark_code

    return make_benchmark_code(96, dv=3, dc=6, seed=7, with_G=True)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_cache_growth():
    """Clear jax's in-process caches after each test module.

    The suite compiles hundreds of distinct programs (incl. large
    interpret-mode Pallas graphs); accumulated compiler state aborted
    the XLA CPU backend (SIGABRT in backend_compile) near the end of
    the full run on 2026-08-20 while every module passed in isolation.
    Bounding the cache keeps peak compiler state at one module's worth;
    cross-module cache reuse is negligible here (modules build distinct
    codes/layouts)."""
    yield
    jax.clear_caches()
