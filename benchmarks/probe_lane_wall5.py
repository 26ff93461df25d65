"""Fifth-stage probe: does materialising through a VMEM scratch ref between
transport chains unblock two+ chains per program at N = 131072?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
ft = 8
w = jnp.ones((2, N), jnp.int32)


def chain(v, wr, n_stages):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    d = 1
    for s in range(n_stages):
        sw = ((wr[s // 31: s // 31 + 1, :] >> (s % 31)) & 1) > 0
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


def run(name, kernel, n_scratch=0):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ft, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ft, N), jnp.float32)
                            for _ in range(n_scratch)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(jnp.ones((ft, N), jnp.float32), w)
        float(jnp.sum(out))
        print(f"  {name:44s} OK")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {name:44s} FAIL: {str(e).split(chr(10))[0][:80]}")
        return False


def k2_plain(x, wr, o):
    v = chain(x[:], wr, 33)
    v = jnp.maximum(v, -v)
    o[:] = chain(v, wr, 33)


def k2_scratch(x, wr, o, st):
    st[:] = chain(x[:], wr, 33)
    v = jnp.maximum(st[:], -st[:])
    o[:] = chain(v, wr, 33)


def k4_scratch(x, wr, o, st):
    st[:] = chain(x[:], wr, 33)
    st[:] = chain(jnp.maximum(st[:], -st[:]), wr, 33)
    st[:] = chain(st[:] + 1.0, wr, 33)
    o[:] = chain(st[:] * 0.5, wr, 33)


def k4_fori_scratch(x, wr, o, st):
    st[:] = x[:]

    def body(i, c):
        st[:] = chain(st[:], wr, 33)
        st[:] = chain(jnp.maximum(st[:], -st[:]), wr, 33)
        st[:] = chain(st[:] + 1.0, wr, 33)
        st[:] = chain(st[:] * 0.5, wr, 33)
        return c

    jax.lax.fori_loop(0, 10, body, 0)
    o[:] = st[:]


def k2_per_stage_scratch(x, wr, o, st):
    # store after EVERY stage (chain split through the ref)
    st[:] = x[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    for rep in range(2):
        d = 1
        for s in range(33):
            v = st[:]
            sw = ((wr[s // 31: s // 31 + 1, :] >> (s % 31)) & 1) > 0
            top = (iota & d) == 0
            if d % 128 == 0:
                l_ = jnp.concatenate([v[:, d:], v[:, :d]], axis=1)
                r_ = jnp.concatenate([v[:, N - d:], v[:, : N - d]], axis=1)
            else:
                l_ = pltpu.roll(v, N - d, axis=1)
                r_ = pltpu.roll(v, d, axis=1)
            st[:] = jnp.where(sw, jnp.where(top, l_, r_), v)
            d = d * 2 if d * 2 < N else 1
    o[:] = st[:]


print("devices:", jax.devices(), "N =", N)
run("2 chains, no scratch", k2_plain)
run("2 chains via scratch ref", k2_scratch, n_scratch=1)
run("4 chains via scratch ref", k4_scratch, n_scratch=1)
run("fori(10) x 4 chains via scratch", k4_fori_scratch, n_scratch=1)
run("2 chains, store per stage", k2_per_stage_scratch, n_scratch=1)
