"""Probe which kernel op class hits the Mosaic wall at large lane extents.

Round-3 measured: the lane-major fused kernel compiles at n_pad = 65536 and
crashes the remote tpu_compile_helper at n_pad = 131072 for every variant
(f32/Benes and bf16/Clos, down to 1 iteration x 8 frames) — suggesting the
wall is the lane extent itself.  This probe compiles minimal kernels that
each exercise ONE op class on a [8, N] f32 buffer and reports pass/fail per
lane extent, so the round-4 edge-tiled kernel targets the real constraint.

Usage:  python benchmarks/probe_lane_wall.py [N ...]
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, N, ft=8, extra_specs=(), extra_args=()):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ft, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + list(extra_specs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(jnp.ones((ft, N), jnp.float32), *extra_args)
        float(jnp.sum(out))  # force execution
        print(f"  {name:28s} N={N:7d}  OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"  {name:28s} N={N:7d}  FAIL: {msg}")
        return False


def probe(N):
    print(f"--- lane extent N = {N} ---")

    def k_copy(x, o):
        o[:] = x[:] * 2.0

    run("copy+mul", k_copy, N)

    def k_iota(x, o):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        o[:] = jnp.where((iota & 4) == 0, x[:], -x[:])

    run("broadcasted_iota+where", k_iota, N)

    def k_concat_roll(x, o):
        k = N // 2
        v = x[:]
        o[:] = jnp.concatenate([v[:, N - k:], v[:, : N - k]], axis=1)

    run("tile-aligned concat roll", k_concat_roll, N)

    def k_roll_small(x, o):
        o[:] = pltpu.roll(x[:], 1, axis=1)

    run("pltpu.roll d=1", k_roll_small, N)

    def k_roll_big(x, o):
        o[:] = pltpu.roll(x[:], N // 2, axis=1)

    run("pltpu.roll d=N/2", k_roll_big, N)

    def k_sub_roll(x, o):
        o[:] = pltpu.roll(x[:], 1, axis=0)

    run("pltpu.roll sublane", k_sub_roll, N)

    def k_plane_mask(x, w, o):
        sw = ((w[0:1, :] >> 3) & 1) > 0
        o[:] = jnp.where(sw, -x[:], x[:])

    run(
        "plane mask read+where", k_plane_mask, N,
        extra_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        extra_args=[jnp.ones((3, N), jnp.int32)],
    )

    def k_blockmul(x, p, o):
        parts = []
        v = x[:]
        for b in range(N // 128):
            m = p[b]
            parts.append(
                jax.lax.dot_general(
                    v[:, b * 128: (b + 1) * 128], m,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
        o[:] = jnp.concatenate(parts, axis=1)

    run(
        "blockmul one-hot loop", k_blockmul, N,
        extra_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        extra_args=[
            jnp.broadcast_to(
                jnp.eye(128, dtype=jnp.bfloat16), (N // 128, 128, 128)
            )
        ],
    )

    def k_lane_sum(x, o):
        s = jnp.sum(x[:], axis=1, keepdims=True)
        o[:] = x[:] + s

    run("lane reduction", k_lane_sum, N)


if __name__ == "__main__":
    sizes = [int(v) for v in sys.argv[1:]] or [65536, 131072, 262144]
    print("devices:", jax.devices())
    for N in sizes:
        probe(N)
