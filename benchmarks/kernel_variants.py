"""Fused-kernel variant benchmark: message dtype x permutation transport.

Times the fused Pallas decode kernel (bundled n=1024 code, BP, 50
iterations, no early termination, batch 4096) for every combination of

* message dtype: float32 | bfloat16 (bf16 halves VMEM residency and
  transport register traffic; arithmetic stays f32);
* permutation transport: Beneš roll/select network on the VPU | one-hot
  128x128 block matmuls on the MXU (available because the degree-class
  position-major layout makes the edge permutation block-local — 60 of
  1024 possible block pairs for the bundled code).

Timing forces host reads (a bare ``block_until_ready`` does not reliably
await kernel completion over tunneled backends).  Writes
``benchmarks/kernel_variants_r2.txt``.

Env knobs: ``KV_CODE=random`` benchmarks a random (3,6)-regular n=1024
code instead of the bundled one (no block-local MXU plan — the ``clos``
transport's target case; output file gains a ``_random`` suffix);
``KV_DECODER`` selects the CN form (``BP`` default, ``BP_TANH``,
``BP_MS``, ...; non-BP decoders gain a ``_<type>`` suffix);
``KV_BATCH`` the batch size.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    from libldpc_tpu.ops.pallas.decode_fused import bp_decode_pallas
    from libldpc_tpu.ops.pallas.layout import to_pallas_device

    kv_code = os.environ.get("KV_CODE", "bundled")
    decoder = os.environ.get("KV_DECODER", "BP")
    h = "/root/reference/tests/code/h.txt"
    if kv_code == "random":
        code = make_benchmark_code(1024, dv=3, dc=6, seed=1)
    elif os.path.exists(h):
        code = LDPCCode.from_files(h, "/root/reference/tests/code/g.txt")
    else:
        code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=True)
    pdc = to_pallas_device(code, with_clos=True)
    B = int(os.environ.get("KV_BATCH", 4096))
    rng = np.random.default_rng(3)
    llr = np.zeros((code.nc, B), dtype=np.float32)
    y = 1.0 + rng.normal(size=(code.nct, B))
    llr[code.bit_pos] = (2.0 * y).astype(np.float32)
    vn_deg = np.bincount(code.cols.astype(np.int64), minlength=code.nc)
    vperm = np.argsort(vn_deg, kind="stable")
    llr_s = jnp.asarray(llr[vperm])

    rows = []
    ref_hard = None
    minsum_family = decoder in ("BP_MS", "BP_NMS", "BP_OMS")
    dtypes = ("float32", "bfloat16") + (
        ("int8",) if minsum_family else ()
    )
    for md in dtypes:
        for perm in ("benes", "mxu", "clos"):
            if perm == "mxu" and pdc.mxu_blocks_fwd is None:
                continue
            if md == "int8" and perm != "mxu":
                continue  # int8 rides the s8 MXU transport only

            mode = (
                (decoder, 0.75, 0.15)
                if decoder in ("BP_NMS", "BP_OMS") else decoder
            )

            def f():
                return bp_decode_pallas(
                    pdc, llr_s, iterations=50, early_term=False,
                    batch_tile=256, message_dtype=md, permute=perm,
                    minsum_mode=mode,
                )

            t0 = time.perf_counter()
            out = f()
            float(jnp.sum(out.llr_out))  # host read = real sync
            tc = time.perf_counter() - t0
            n = 8
            t0 = time.perf_counter()
            outs = [f() for _ in range(n)]
            float(jnp.sum(outs[-1].llr_out))  # stream-ordered sync
            t = (time.perf_counter() - t0) / n
            hard = np.asarray(jax.device_get(out.hard))
            if ref_hard is None:
                ref_hard = hard
                mism = 0.0
            else:
                mism = float((hard != ref_hard).mean())
            row = (md, perm, tc, t * 1e3, B / t, t / B * 1e6, mism)
            rows.append(row)
            print(
                f"{md:9s} {perm:6s}: compile {tc:6.1f}s  {t*1e3:7.2f} ms  "
                f"{B/t:9.0f} f/s  {t/B*1e6:6.2f} us/frame  "
                f"hard-mismatch {mism:.2e}",
                flush=True,
            )

    suffix = ("_random" if kv_code == "random" else "") + (
        "" if decoder == "BP" else f"_{decoder}"
    )
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"kernel_variants{suffix}_r2.txt")
    with open(out_path, "w") as fh:
        fh.write(
            f"# Fused-kernel variants, {kv_code} n=1024 code, {decoder}, "
            "50 iters, "
            f"no early term, batch {B}, one v5e chip.\n"
            "# hard-mismatch is vs the float32+benes decisions.\n"
            f"{'dtype':>9} {'permute':>7} {'compile_s':>9} {'ms/call':>8} "
            f"{'frames/s':>9} {'us/frame':>8} {'mismatch':>9}\n"
        )
        for md, perm, tc, ms, fps, us, mism in rows:
            fh.write(f"{md:>9} {perm:>7} {tc:9.1f} {ms:8.2f} {fps:9.0f} "
                     f"{us:8.2f} {mism:9.2e}\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
