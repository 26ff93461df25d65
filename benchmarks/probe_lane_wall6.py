"""Sixth-stage probe (round 5): can the n_pad = 131072 bf16/Clos compile
crash be cleared by chunking the block-diagonal one-hot matmuls?

Findings (one v5e chip, 2026-08-20):

* A ``fori_loop`` blockmul with 128-aligned DYNAMIC lane slices
  (``pl.ds(b * 128, 128)`` reads/writes on ``[ft, N]`` VMEM refs,
  dynamic leading-dim indexing of the ``[nb, 128, 128]`` one-hot planes)
  **lowers and runs correctly** — Mosaic accepts tile-aligned dynamic
  lane offsets.
* The full chained form (blockmul -> 17-stage tile-granular middle
  network -> blockmul, twice per iteration, 8 iterations in-kernel)
  then **COMPILES at n_pad = 131072** — the round-4/5 static-unroll
  crash is a program-size/liveness wall, not a VMEM wall.
* But it is catastrophically slow: ~240 ms/frame/iteration (measured
  identically at chunk unroll factors 1 and 16) vs ~3.5 us/frame/iter
  for the static-slice kernel at n_pad 65536 — dynamic-lane-offset
  stores serialise on the scalar core instead of vectorising, and no
  unroll factor recovers it.

Conclusion: the Clos n_pad = 131072 wall STANDS as a measured negative
(benchmarks/res_tp_bl_scale.txt failure rows); past n_pad 65536 the
driver's f32/Benes-lanes fallback (0.70x XLA batch, streaming-competitive
with ET) remains the right route, and unstructured bf16 jobs that need
more should use the QC transport's structure when available.

Run: ``python benchmarks/probe_lane_wall6.py [N] [U]``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
U = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ft = 8
nb = N // 128
K = 8
NSTAGE = 17


def kernel(p1_ref, p3_ref, w_ref, x_ref, o_ref, s1, s2, s3):
    def blockmul_fori(src_ref, pref, out_ref, cd):
        def body(c, _):
            for j in range(U):
                sl = pl.ds(c * (128 * U) + j * 128, 128)
                m = pref[c * U + j].astype(jnp.bfloat16)
                out_ref[:, sl] = jax.lax.dot_general(
                    src_ref[:, sl], m, (((1,), (cd,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            return _

        jax.lax.fori_loop(0, nb // U, body, 0)

    def mid(v, reverse):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        rng = range(NSTAGE - 1, -1, -1) if reverse else range(NSTAGE)
        for s in rng:
            d = 128 << (s % 10)
            d = d % N or 128
            sw = ((w_ref[s // 31 : s // 31 + 1, :] >> (s % 31)) & 1) > 0
            top = (iota & d) == 0
            l_ = jnp.concatenate([v[:, d:], v[:, :d]], axis=1)
            r_ = jnp.concatenate([v[:, N - d :], v[:, : N - d]], axis=1)
            partner = jnp.where(top, l_, r_)
            v = jnp.where(sw, partner, v)
        return v

    s3[:] = x_ref[:]

    def it(i, _):
        s1[:] = (s3[:].astype(jnp.float32) * 0.9).astype(jnp.bfloat16)
        blockmul_fori(s1, p1_ref, s2, 1)
        s1[:] = mid(s2[:], False)
        blockmul_fori(s1, p3_ref, s2, 1)
        s3[:] = (s2[:].astype(jnp.float32)
                 + x_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        blockmul_fori(s3, p3_ref, s1, 0)
        s2[:] = mid(s1[:], True)
        blockmul_fori(s2, p1_ref, s1, 0)
        s3[:] = (s1[:].astype(jnp.float32)
                 - s3[:].astype(jnp.float32) * 0.5).astype(jnp.bfloat16)
        return _

    jax.lax.fori_loop(0, K, it, 0)
    o_ref[:] = s3[:]


def main():
    x = jnp.asarray(np.random.randn(ft, N), jnp.bfloat16)
    p = jnp.asarray(np.stack([np.eye(128)] * nb), jnp.int8)
    w = jnp.asarray(np.random.randint(0, 2 ** 30, size=(1, N)), jnp.int32)

    def call():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ft, N), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ft, N), jnp.bfloat16)] * 3,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(p, p, w, x)

    t0 = time.time()
    out = call()
    val = float(jnp.sum(out.astype(jnp.float32)))
    print(f"N={N} U={U} compiled+ran in {time.time()-t0:.1f}s "
          f"checksum={val:.3e}")
    t0 = time.time()
    for _ in range(3):
        out = call()
        float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / 3
    print(f"warm {dt:.2f}s/call -> {dt/K/ft*1e6:.0f} us/frame/iter")


if __name__ == "__main__":
    main()
