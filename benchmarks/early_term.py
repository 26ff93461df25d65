"""Early-termination throughput: streaming compaction vs fixed iterations.

Round-1 finding (VERDICT): sustained early-term sweeps ran ~3x slower than
the fixed-50-iteration fast path (28 vs 10.8 us/frame) because the batch
decoder's while_loop is gated by the slowest frame of the batch.  The
reference's early termination only ever saves work per frame
(``src/decoding/decoder.cpp:66-72``); the streaming compaction decoder
(:mod:`libldpc_tpu.ops.streaming`) restores that property on TPU.

This harness measures, per sweep point of the soak configuration
(bundled k=128/n=1024 code, AWGN, BP, 50 iterations, batch 4096):

* ``et_us``   — us/frame with early termination on the *driver default*
  path (streaming compaction);
* ``noet_us`` — us/frame for fixed 50 iterations, no early termination
  (the XLA sorted fast path — the number ET must beat);
* ``avg_iter`` — mean reference-semantics iterations at that point.

Success criterion (VERDICT round-1 item 1): ``et_us < noet_us`` at every
point with ``avg_iter < 50``.

Usage:  python benchmarks/early_term.py [--points "-8,-7,-6,-5,-4,-3"]
Writes ``benchmarks/early_term_r2.txt``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="-8,-7,-6,-5,-4,-3")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--frames-per-point", type=int, default=200_000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "early_term_r2.txt"))
    args = ap.parse_args()

    import jax
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
    from libldpc_tpu.ops.sorted import to_sorted_device
    from libldpc_tpu.ops.streaming import make_streaming_step
    from libldpc_tpu.parallel.mesh import make_sim_step
    from libldpc_tpu.utils.params import DecoderParams

    h = "/root/reference/tests/code/h.txt"
    g = "/root/reference/tests/code/g.txt"
    if os.path.exists(h):
        code = LDPCCode.from_files(h, g)
    else:
        code = make_benchmark_code(1152, dv=3, dc=6, seed=0, with_G=True)
    sdc = to_sorted_device(code)
    batch = args.batch
    points = [float(p) for p in args.points.split(",")]

    use_pallas = os.environ.get("ET_PALLAS", "0") == "1"
    dec_kw = dict(message_dtype="bfloat16") if use_pallas else {}
    if os.environ.get("ET_TYPE"):
        dec_kw["type"] = os.environ["ET_TYPE"]
    if os.environ.get("ET_DTYPE"):
        dec_kw["message_dtype"] = os.environ["ET_DTYPE"]
    if use_pallas:
        from libldpc_tpu.ops.pallas.layout import to_pallas_device
        from libldpc_tpu.ops.streaming_pallas import (
            make_streaming_pallas_step,
        )

        pdc = to_pallas_device(code)
        # fixed-iteration fast path on the fused kernel (the bar to beat)
        noet_step = make_sim_step(
            pdc, "AWGN",
            DecoderParams(early_term=False, iterations=50, **dec_kw),
            batch, use_pallas=True,
        )
        wm = os.environ.get("ET_WATERMARK")
        init_fn, et_step = make_streaming_pallas_step(
            pdc, "AWGN",
            DecoderParams(early_term=True, iterations=50, **dec_kw),
            batch,
            gen_watermark=int(float(wm) * batch) if wm else None,
            chunk_iters=int(os.environ.get("ET_CHUNK", "0")),
        )
    else:
        # fixed-iteration fast path (the bar to beat)
        noet_step = make_sim_step(
            sdc, "AWGN", DecoderParams(early_term=False, iterations=50),
            batch,
        )
        # streaming early termination (driver default for ET sweeps)
        init_fn, et_step = make_streaming_step(
            sdc, "AWGN", DecoderParams(early_term=True, iterations=50),
            batch,
        )

    key = jax.random.PRNGKey(0)
    rows = []
    print(f"{'snr':>6} {'avg_iter':>8} {'et_us':>8} {'noet_us':>8} "
          f"{'speedup':>8} {'fer':>10}")
    for x in points:
        xv = np.float32(x)
        # ---- no-early-term fixed 50 iterations --------------------------
        # ONE stream-ordered host read at the end: per-step int() reads
        # each pay a full tunnel round trip (~40 ms) and would dominate
        # the measurement (device execution is in-order, so the last
        # step's counters completing implies all prior steps completed)
        jax.block_until_ready(noet_step(key, xv).bit_errors)  # compile+warm
        n_steps = max(2, args.frames_per_point // batch)
        keys = [jax.random.fold_in(key, 1000 + i) for i in range(n_steps)]
        t0 = time.perf_counter()
        outs = [noet_step(k, xv) for k in keys]
        frames = (n_steps - 1) * batch + int(outs[-1].frames)
        noet_us = (time.perf_counter() - t0) / frames * 1e6

        # ---- streaming early termination --------------------------------
        state = init_fn()
        state, acc = et_step(state, jax.random.fold_in(key, 7), xv,
                             np.bool_(True))
        int(acc.frames)  # compile+warm (state keeps its in-flight pool)
        t0 = time.perf_counter()
        frames = iters = fec = 0
        pending = []
        si = 0

        def absorb(n):
            # ONE round trip for n supersteps' counters: per-superstep
            # reads would serialise a full tunnel RTT (~superstep time at
            # slow points) into every step
            nonlocal frames, iters, fec
            accs = [pending.pop(0) for _ in range(n)]
            vals = jax.device_get(
                [(a.frames, a.iter_sum, a.frame_errors) for a in accs]
            )
            for fr, it_, fe in vals:
                frames += int(fr)
                iters += int(it_)
                fec += int(fe)

        while frames < args.frames_per_point:
            state, acc = et_step(
                state, jax.random.fold_in(key, 100 + si), xv, np.bool_(True)
            )
            si += 1
            pending.append(acc)
            if len(pending) >= 6:
                absorb(len(pending) - 2)
        if pending:
            absorb(len(pending))
        et_us = (time.perf_counter() - t0) / frames * 1e6
        avg_iter = iters / frames
        fer = fec / frames
        rows.append((x, avg_iter, et_us, noet_us, noet_us / et_us, fer))
        print(f"{x:6.1f} {avg_iter:8.1f} {et_us:8.2f} {noet_us:8.2f} "
              f"{noet_us / et_us:8.2f} {fer:10.3e}")

    with open(args.out, "w") as f:
        f.write(
            "# Early-termination vs fixed-iteration throughput, one chip.\n"
            f"# bundled n=1024 code, AWGN, BP, 50 iters, batch {batch}.\n"
            "# et_us = streaming compaction ET; noet_us = fixed 50-iter "
            "fast path.\n"
            "# criterion: et_us < noet_us wherever avg_iter < 50.\n"
            f"{'snr':>6} {'avg_iter':>9} {'et_us':>8} {'noet_us':>8} "
            f"{'speedup':>8} {'fer':>11}\n"
        )
        for x, ai, et, noet, sp, fer in rows:
            f.write(f"{x:6.1f} {ai:9.2f} {et:8.2f} {noet:8.2f} {sp:8.2f} "
                    f"{fer:11.3e}\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
