"""Microbenchmark: per-pass cost decomposition of the ET machinery.

Times, on the bundled n=1024 code at a non-converging SNR (every frame
runs all 50 passes, so per-pass cost is directly comparable):

  noet    — fused kernel, early_term=False        (the floor)
  et      — fused kernel, early_term=True          (+syndrome+freeze)
  stream  — self-refilling stream kernel, refill=0 (+counting+reload phase)
  stream+ — stream kernel with refill=1 and a full pool (reloads active)

Usage: python benchmarks/micro_et.py [--batch 8192] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--permute", default="mxu")
    ap.add_argument("--type", default="BP",
                    help="decoder type (BP / BP_PHI / BP_TANH / BP_MS)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from libldpc_tpu.models import LDPCCode, make_benchmark_code
    from libldpc_tpu.ops.channel import simulate_channel
    from libldpc_tpu.ops.pallas.layout import to_pallas_device
    from libldpc_tpu.ops.pallas.decode_fused import (
        bp_decode_pallas, bp_stream_chunk_pallas,
    )
    from libldpc_tpu.utils.params import DecoderParams

    cn_mode = DecoderParams(type=args.type).cn_mode

    h = "/root/reference/tests/code/h.txt"
    g = "/root/reference/tests/code/g.txt"
    if os.path.exists(h):
        code = LDPCCode.from_files(h, g)
    else:
        code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=True)
    pdc = to_pallas_device(code)
    B = args.batch
    it = args.iters
    dt = args.dtype
    perm = args.permute

    ch = simulate_channel(pdc, "AWGN", jax.random.PRNGKey(0), B,
                          np.float32(-10.0))  # nothing converges
    llr = ch.llr
    cw = ch.codeword.astype(jnp.int32)

    def timeit(fn, *a, **kw):
        r = fn(*a, **kw)
        jax.block_until_ready(jax.tree.leaves(r))
        # host-read sync (block_until_ready unreliable over the tunnel)
        float(jnp.asarray(jax.tree.leaves(r)[0]).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        outs = [fn(*a, **kw) for _ in range(args.reps)]
        float(jnp.asarray(
            jax.tree.leaves(outs[-1])[0]).astype(jnp.float32).sum())
        dt_s = (time.perf_counter() - t0) / args.reps
        return dt_s

    rows = []

    t = timeit(bp_decode_pallas, pdc, llr, iterations=it, early_term=False,
               message_dtype=dt, permute=perm, minsum_mode=cn_mode)
    rows.append(("noet", t))

    t = timeit(bp_decode_pallas, pdc, llr, iterations=it, early_term=True,
               message_dtype=dt, permute=perm, minsum_mode=cn_mode)
    rows.append(("et", t))

    zero8 = jnp.zeros((8, B), jnp.int32)
    lv2c0 = jnp.zeros((pdc.n_pad, B), jnp.dtype(dt))
    pool_llr = jnp.zeros((pdc.nc, B), jnp.float32)
    pool_cw = jnp.zeros((pdc.nc, B), jnp.int32)
    pool_lv2c = jnp.zeros((pdc.n_pad, B), jnp.dtype(dt))

    def stream(refill, avail):
        return bp_stream_chunk_pallas(
            pdc, llr, cw, lv2c0, zero8, zero8, zero8, avail, zero8,
            pool_llr, pool_cw, pool_lv2c, jnp.int32(refill), jnp.int32(2**30),
            k=it, cap=it, message_dtype=dt, permute=perm,
            minsum_mode=cn_mode,
        )

    t = timeit(stream, 0, zero8)
    rows.append(("stream", t))

    ones8 = jnp.zeros((8, B), jnp.int32).at[0].set(1)
    t = timeit(stream, 1, ones8)
    rows.append(("stream+", t))

    base = rows[0][1]
    print(f"batch {B}, {it} passes, dtype {dt}, permute {perm}, "
          f"type {args.type}")
    for name, t in rows:
        print(f"{name:>8}: {t*1e3:8.2f} ms/call  {t/B*1e6:6.3f} us/frame "
              f"{t/base:6.2f}x")


if __name__ == "__main__":
    main()
