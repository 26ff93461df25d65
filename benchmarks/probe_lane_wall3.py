"""Third-stage probe: fori_loop interactions and the batched blockmul fix."""

import sys

import jax
import jax.numpy as jnp
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
        float(jnp.sum(out))
        print(f"  {name:44s} N={N:7d}  OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:90]
        print(f"  {name:44s} N={N:7d}  FAIL: {msg}")
        return False


def chain(v, w, N, n_stages):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    d = 1
    for s in range(n_stages):
        sw = ((w[s // 31: s // 31 + 1, :] >> (s % 31)) & 1) > 0
        top = (iota & d) == 0
        if d % 128 == 0:
            l_ = jnp.concatenate([v[:, d:], v[:, :d]], axis=1)
            r_ = jnp.concatenate([v[:, N - d:], v[:, : N - d]], axis=1)
        else:
            l_ = pltpu.roll(v, N - d, axis=1)
            r_ = pltpu.roll(v, d, axis=1)
        v = jnp.where(sw, jnp.where(top, l_, r_), v)
        d = d * 2 if d * 2 < N else 1
    return v


def probe(N):
    print(f"--- N = {N} ---")
    nb = N // 128
    eye = jnp.broadcast_to(jnp.eye(128, dtype=jnp.bfloat16), (nb, 128, 128))
    pspec = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    wspec = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    w = jnp.ones((2, N), jnp.int32)

    def k_batched_fixed(x, p, o):
        v = x[:].reshape(8, nb, 128).swapaxes(0, 1)
        out = jax.lax.dot_general(
            v, p[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o[:] = out.swapaxes(0, 1).reshape(8, N)

    run("blockmul batched dot_general (p[:])", k_batched_fixed, N,
        extra_specs=pspec, extra_args=[eye])

    for iters, nst in [(2, 17), (10, 17), (2, 34), (10, 34), (50, 34)]:
        def k(x, wr, o, iters=iters, nst=nst):
            def body(i, v):
                return chain(v, wr, N, nst)

            o[:] = jax.lax.fori_loop(0, iters, body, x[:])

        run(f"fori({iters}) x {nst}-stage chain", k, N,
            extra_specs=wspec, extra_args=[w])

    def k_scratch(x, wr, o, st):
        st[:] = x[:]

        def body(i, c):
            st[:] = chain(st[:], wr, N, 34)
            return c

        jax.lax.fori_loop(0, 10, body, 0)
        o[:] = st[:]

    try:
        out = pl.pallas_call(
            k_scratch,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + wspec,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(jnp.ones((8, N), jnp.float32), w)
        float(jnp.sum(out))
        print(f"  {'fori(10) x 34-chain via scratch ref':44s} N={N:7d}  OK")
    except Exception as e:  # noqa: BLE001
        print(f"  {'fori(10) x 34-chain via scratch ref':44s} N={N:7d}  "
              f"FAIL: {str(e).split(chr(10))[0][:90]}")


if __name__ == "__main__":
    sizes = [int(v) for v in sys.argv[1:]] or [131072]
    print("devices:", jax.devices())
    for N in sizes:
        probe(N)
