"""Fourth-stage probe: bisect the REAL lane-major kernel's components at
n_pad = 131072 (n = 32768 (3,6)-regular, f32/Benes) to find which one the
remote compiler dies on."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libldpc_tpu.models import make_benchmark_code
from libldpc_tpu.ops import cn_ops
from libldpc_tpu.ops.device import PAD_LLR
from libldpc_tpu.ops.pallas.lanes_layout import to_lanes_device

n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
code = make_benchmark_code(n, dv=3, dc=6, seed=7, with_G=False)
t0 = time.time()
ldc = to_lanes_device(code, transport="benes")
print("n_pad", ldc.n_pad, "layout", round(time.time() - t0, 1), "s",
      "active stages", len(ldc.benes_dists))
N = ldc.n_pad
nc_pad = ldc.nc_pad
ft = 8
mask_word = ldc.n_words
op = cn_ops.get_op("BP_MS")


def roll_lanes(v, k):
    k = k % N
    if k == 0:
        return v
    if k % 128 == 0:
        return jnp.concatenate([v[:, N - k:], v[:, : N - k]], axis=1)
    return pltpu.roll(v, k, axis=1)


def mid_stages(w_ref, v, reverse):
    stages = list(zip(ldc.benes_dists, ldc.benes_words))
    if reverse:
        stages = stages[::-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    for d, (w, b) in stages:
        sw = ((w_ref[w: w + 1, :] >> b) & 1) > 0
        top = (iota & d) == 0
        partner = jnp.where(top, roll_lanes(v, N - d), roll_lanes(v, d))
        v = jnp.where(sw, partner, v)
    return v


def force_pad(w_ref, v):
    real = ((w_ref[mask_word: mask_word + 1, :]) & 1) > 0
    return jnp.where(real, v, jnp.asarray(PAD_LLR, v.dtype))


def cn_exclusion(v):
    parts = []
    for base, cp, d in ldc.cn_blocks:
        M = [v[:, base + j * cp: base + (j + 1) * cp] for j in range(d)]
        if d == 1:
            parts.append(jnp.full_like(M[0], PAD_LLR))
            continue
        fwd = [M[0]]
        bwd = [M[d - 1]]
        for j in range(1, d):
            fwd.append(op(fwd[-1], M[j]))
            bwd.append(op(bwd[-1], M[d - 1 - j]))
        out = [bwd[d - 2]]
        for j in range(1, d - 1):
            out.append(op(fwd[j - 1], bwd[d - 2 - j]))
        out.append(fwd[d - 2])
        parts.extend(out)
    cn_end = sum(cp * d for _, cp, d in ldc.cn_blocks)
    if N > cn_end:
        parts.append(jnp.full((v.shape[0], N - cn_end), PAD_LLR, jnp.float32))
    return jnp.concatenate(parts, axis=1)


def vn_stage(llr, lc2v_v):
    llr_parts = []
    post_parts = []
    for (base_e, cp, d), nb in zip(ldc.vn_blocks, ldc.vn_node_base):
        lin = llr[:, nb: nb + cp]
        if d == 0:
            llr_parts.append(lin)
            continue
        tot = lc2v_v[:, base_e: base_e + cp]
        for j in range(1, d):
            tot = tot + lc2v_v[:, base_e + j * cp: base_e + (j + 1) * cp]
        llr_b = lin + tot
        llr_parts.append(llr_b)
        for _ in range(d):
            post_parts.append(llr_b)
    vn_end = sum(cp * d for _, cp, d in ldc.vn_blocks)
    if N > vn_end:
        post_parts.append(jnp.full((llr.shape[0], N - vn_end), PAD_LLR,
                                   jnp.float32))
    return (jnp.concatenate(llr_parts, axis=1),
            jnp.concatenate(post_parts, axis=1))


def init_lv2c(w_ref, llr):
    parts = []
    for (base_e, cp, d), nb in zip(ldc.vn_blocks, ldc.vn_node_base):
        if d == 0:
            continue
        lin = llr[:, nb: nb + cp]
        for _ in range(d):
            parts.append(lin)
    vn_end = sum(cp * d for _, cp, d in ldc.vn_blocks)
    if N > vn_end:
        parts.append(jnp.zeros((llr.shape[0], N - vn_end), jnp.float32))
    return mid_stages(w_ref, jnp.concatenate(parts, axis=1), reverse=True)


def syndrome(q):
    viol = jnp.zeros((q.shape[0], 1), jnp.int32)
    for base, cp, d in ldc.cn_blocks:
        bits = None
        for j in range(d):
            b = (q[:, base + j * cp: base + (j + 1) * cp] <= 0).astype(
                jnp.int32)
            bits = b if bits is None else bits + b
        odd = jnp.bitwise_and(bits, 1)
        viol = viol + jnp.sum(odd, axis=1, keepdims=True)
    return jnp.where(viol == 0, 1, 0)


def run(name, kernel):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ft, N), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(jnp.ones((ft, nc_pad), jnp.float32), ldc.planes)
        float(jnp.sum(out))
        print(f"  {name:40s} OK")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {name:40s} FAIL: {str(e).split(chr(10))[0][:80]}")
        return False


def k_init(llr_ref, w_ref, o):
    o[:] = init_lv2c(w_ref, llr_ref[:])


def k_init_pad(llr_ref, w_ref, o):
    o[:] = force_pad(w_ref, init_lv2c(w_ref, llr_ref[:]))


def k_cn(llr_ref, w_ref, o):
    lv2c = force_pad(w_ref, init_lv2c(w_ref, llr_ref[:]))
    o[:] = cn_exclusion(lv2c)


def k_cn_fwd(llr_ref, w_ref, o):
    lv2c = force_pad(w_ref, init_lv2c(w_ref, llr_ref[:]))
    lc2v_c = cn_exclusion(lv2c)
    o[:] = mid_stages(w_ref, lc2v_c, reverse=False)


def k_vn(llr_ref, w_ref, o):
    llr = llr_ref[:]
    lv2c = force_pad(w_ref, init_lv2c(w_ref, llr))
    lc2v_c = cn_exclusion(lv2c)
    lc2v_v = mid_stages(w_ref, lc2v_c, reverse=False)
    llr_out, post_v = vn_stage(llr, lc2v_v)
    o[:] = post_v


def k_full_pass(llr_ref, w_ref, o):
    llr = llr_ref[:]
    lv2c = force_pad(w_ref, init_lv2c(w_ref, llr))
    lc2v_c = cn_exclusion(lv2c)
    lc2v_v = mid_stages(w_ref, lc2v_c, reverse=False)
    llr_out, post_v = vn_stage(llr, lc2v_v)
    q = mid_stages(w_ref, post_v, reverse=True)
    lv2c_new = force_pad(w_ref, q - lc2v_c)
    o[:] = lv2c_new + syndrome(q).astype(jnp.float32)


for nm, k in [("init_lv2c+transport", k_init),
              ("init+force_pad", k_init_pad),
              ("init+cn_exclusion", k_cn),
              ("init+cn+fwd transport", k_cn_fwd),
              ("init+cn+fwd+vn_stage", k_vn),
              ("one full pass (no loop)", k_full_pass)]:
    run(nm, k)
