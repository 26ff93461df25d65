"""Second-stage probe: isolate WHY blockmul fails at N=131072 and whether a
full Benes stage chain + CN/VN-like slicing survives (see probe_lane_wall).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, N, ft=8, extra_specs=(), extra_args=(), sec=None):
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
        float(jnp.sum(out))
        print(f"  {name:36s} N={N:7d}  OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:100]
        print(f"  {name:36s} N={N:7d}  FAIL: {msg}")
        return False


def probe(N):
    print(f"--- N = {N} ---")
    nb = N // 128
    eye = jnp.broadcast_to(jnp.eye(128, dtype=jnp.bfloat16), (nb, 128, 128))
    pspec = [pl.BlockSpec(memory_space=pltpu.VMEM)]

    def k_blockmul_store(x, p, o):
        v = x[:]
        for b in range(nb):
            o[:, b * 128: (b + 1) * 128] = jax.lax.dot_general(
                v[:, b * 128: (b + 1) * 128], p[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    run("blockmul -> ref-slice stores", k_blockmul_store, N,
        extra_specs=pspec, extra_args=[eye])

    def k_concat_many(x, o):
        v = x[:]
        parts = [v[:, b * 128: (b + 1) * 128] * 2.0 for b in range(nb)]
        o[:] = jnp.concatenate(parts, axis=1)

    run(f"concat of {nb} slices (no matmul)", k_concat_many, N)

    def k_blockmul_grouped(x, p, o):
        # contract whole [ft, N] against block-diag as batched dot:
        # reshape to [nb, ft, 128] and batch over nb on the MXU
        v = x[:].reshape(ft_, nb, 128).swapaxes(0, 1)
        out = jax.lax.dot_general(
            v, p,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o[:] = out.swapaxes(0, 1).reshape(ft_, N)

    ft_ = 8
    run("blockmul batched dot_general", k_blockmul_grouped, N,
        extra_specs=pspec, extra_args=[eye])

    def k_benes_chain(x, w, o):
        v = x[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        d = 1
        s = 0
        while d < N:
            sw = ((w[s // 31: s // 31 + 1, :] >> (s % 31)) & 1) > 0
            top = (iota & d) == 0
            if d % 128 == 0:
                left = jnp.concatenate([v[:, d:], v[:, :d]], axis=1)
                right = jnp.concatenate([v[:, N - d:], v[:, : N - d]], axis=1)
            else:
                left = pltpu.roll(v, N - d, axis=1)
                right = pltpu.roll(v, d, axis=1)
            partner = jnp.where(top, left, right)
            v = jnp.where(sw, partner, v)
            d *= 2
            s += 1
        o[:] = v

    W = 2
    run("benes-like chain (17 stages)", k_benes_chain, N,
        extra_specs=pspec, extra_args=[jnp.ones((W, N), jnp.int32)])

    def k_benes_full(x, w, o):
        # 2*log2(N)-1 stages, as the real network
        v = x[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        dists = []
        d = N // 2
        while d >= 1:
            dists.append(d)
            d //= 2
        dists += dists[-2::-1]
        for s, d in enumerate(dists):
            sw = ((w[s // 31: s // 31 + 1, :] >> (s % 31)) & 1) > 0
            top = (iota & d) == 0
            if d % 128 == 0:
                left = jnp.concatenate([v[:, d:], v[:, :d]], axis=1)
                right = jnp.concatenate([v[:, N - d:], v[:, : N - d]], axis=1)
            else:
                left = pltpu.roll(v, N - d, axis=1)
                right = pltpu.roll(v, d, axis=1)
            partner = jnp.where(top, left, right)
            v = jnp.where(sw, partner, v)
        o[:] = v

    run("benes full (2k-1 stages)", k_benes_full, N,
        extra_specs=pspec, extra_args=[jnp.ones((2, N), jnp.int32)])

    def k_iterated(x, w, o):
        # the real kernel shape: fori_loop with 4 'transports' per pass
        def transport(v):
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
            d = 1
            s = 0
            while d < N:
                sw = ((w[s // 31: s // 31 + 1, :] >> (s % 31)) & 1) > 0
                top = (iota & d) == 0
                if d % 128 == 0:
                    l_ = jnp.concatenate([v[:, d:], v[:, :d]], axis=1)
                    r_ = jnp.concatenate([v[:, N - d:], v[:, : N - d]],
                                         axis=1)
                else:
                    l_ = pltpu.roll(v, N - d, axis=1)
                    r_ = pltpu.roll(v, d, axis=1)
                v = jnp.where(sw, jnp.where(top, l_, r_), v)
                d *= 2
                s += 1
            return v

        def body(i, v):
            v = transport(v)
            v = jnp.maximum(v, -v)  # stand-in compute
            v = transport(v)
            return v

        o[:] = jax.lax.fori_loop(0, 10, body, x[:])

    run("10-iter fori 2x17-stage chains", k_iterated, N,
        extra_specs=pspec, extra_args=[jnp.ones((2, N), jnp.int32)])


if __name__ == "__main__":
    sizes = [int(v) for v in sys.argv[1:]] or [131072]
    print("devices:", jax.devices())
    for N in sizes:
        probe(N)
