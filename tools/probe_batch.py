"""Probe: batch size vs epochs and wall for small dense problems (abalone).

The per-step fixed cost on the relay-attached v5e is ~5us, so a 20-lambda
abalone path at B=32 (131 steps/epoch) spends most of its in-path time on
step dispatch overhead.  Bigger batches cut steps/epoch; SAGA epochs-to-
converge grow only mildly (expected-smoothness step sizes).  Run from repo.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


d = np.load("/root/repo/sgdnet_tpu/data/abalone.npz")
x, y = d["x"], d["y"]

import sgdnet_tpu as st

for B in (128, 512):
    best = 1e9
    eps = None
    f = None
    for r in range(3):
        t0 = time.perf_counter()
        f = st.fit(x, y, family="gaussian", alpha=0.8, nlambda=20, seed=r, batch_size=B)
        dt = time.perf_counter() - t0
        if r:  # skip compile rep
            best = min(best, dt)
        eps = f.stats["epochs"]
    log(f"B={B}: best {best*1e3:.0f} ms, epochs {eps}, dev_ratio[-1]={f.dev_ratio[-1]:.4f}")

# correctness spot-check at B=512 vs B=32 on the same lambda path
f32 = st.fit(x, y, family="gaussian", alpha=0.8, nlambda=20, batch_size=32)
f512 = st.fit(x, y, family="gaussian", alpha=0.8, nlambda=20, batch_size=512,
              lambda_path=f32.lambda_)
scale = max(1.0, np.abs(f32.beta).max())
log(f"B=512 vs B=32 max rel diff: {np.abs(f512.beta - f32.beta).max() / scale:.2e}")
