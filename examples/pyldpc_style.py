"""The pyLDPC-style API: threaded simulation, one-shot encode/decode.

Mirrors the reference's Python usage (pyLDPC/ldpc.py): start a simulation on
a background thread, poll live results, stop cooperatively; encode an info
word; decode LLRs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from libldpc_tpu import LDPC

ldpc = LDPC(
    "/root/reference/tests/code/h.txt",
    "/root/reference/tests/code/g.txt",
)
print(f"n={ldpc.n} m={ldpc.m} k={ldpc.k} (transmitted n={ldpc.nct})")
print("rank(H) =", ldpc.rank())

# --- threaded simulation with live polling -------------------------------
ldpc.simulate(snr=[-7.0, -4.9, 1.0], fec=50, batchSize=4096)
for _ in range(10):
    time.sleep(2.0)
    res = ldpc.get_results()
    if res and len(res.get("frames", [])):
        print("live:", {k: np.asarray(v).round(4).tolist() for k, v in res.items()})
ldpc.stop_simulation()
print("final:", ldpc.get_results())

# --- one-shot encode / decode --------------------------------------------
rng = np.random.default_rng(0)
u = rng.integers(0, 2, ldpc.kct).astype(np.uint8)
tx = ldpc.encode(u)

snr_db, sigma2 = 2.0, 10 ** (-2.0 / 10)
y = (1.0 - 2.0 * tx) + rng.normal(size=tx.shape) * np.sqrt(sigma2)
llr_out, iters = ldpc.decode(2 * y / sigma2)
decoded = (llr_out <= 0).astype(np.uint8)
print(f"decoded in {iters} iterations; bit errors: {(decoded != tx).sum()}")
