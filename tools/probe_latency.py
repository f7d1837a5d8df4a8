"""Probe: where does a small-problem fit's wall-clock go on the TPU relay?

Measures (1) scalar readback latency, (2) end-to-end st.fit on abalone,
(3) a bare fit_path dispatch on prebuilt device inputs, (4) dispatch counts
via a crude sync counter.  Run from /root/repo."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


d = np.load("/root/repo/sgdnet_tpu/data/abalone.npz")
x, y = d["x"], d["y"]
log(f"abalone: {x.shape}")

# 1) scalar readback latency
a = jnp.ones((8, 8))
float(jnp.sum(a))
ts = []
for i in range(10):
    t0 = time.perf_counter()
    float(jnp.sum(a * (i + 1)))
    ts.append(time.perf_counter() - t0)
log(f"scalar readback latency: min {min(ts)*1e3:.1f} ms, med {sorted(ts)[5]*1e3:.1f} ms")

# 2) end-to-end fit, 20-lambda path
import sgdnet_tpu as st

for r in range(4):
    t0 = time.perf_counter()
    f = st.fit(x, y, family="gaussian", alpha=0.8, nlambda=20, seed=r)
    dt = time.perf_counter() - t0
    log(f"fit rep {r}: {dt*1e3:.0f} ms (epochs {f.stats['epochs']})")

# 3) bare fit_path on prebuilt inputs (same shapes/config as the fit above)
from sgdnet_tpu.families import get_family
from sgdnet_tpu.penalties import select_penalty
from sgdnet_tpu.solver.saga import SolverConfig, fit_path, init_state

n, p = x.shape
B = 32
n_pad = ((n + B - 1) // B) * B
xm, xs = x.mean(0), x.std(0)
xs[xs == 0] = 1
x_std = np.zeros((n_pad, p), np.float32)
x_std[:n] = (x - xm) / xs
ym, ysd = y.mean(), y.std()
y_std = np.zeros((n_pad, 1), np.float32)
y_std[:n, 0] = (y - ym) / ysd
w = np.zeros((n_pad,), np.float32)
w[:n] = 1.0

fam = get_family("gaussian")
pen = select_penalty(0.8, "gaussian")
config = SolverConfig(batch_size=B, max_iter=1000, fit_intercept=True)
lam = np.asarray(f.lambda_) / ysd
l1s = jnp.asarray(0.8 * lam, jnp.float32)
l2s = jnp.asarray(0.2 * lam, jnp.float32)
gammas = jnp.full((20,), 3e-3, jnp.float32)
xd = jnp.asarray(x_std)
yd = jnp.asarray(y_std)
wd = jnp.asarray(w)
state0 = init_state(n_pad, p, 1, jnp.float32)

for r in range(4):
    t0 = time.perf_counter()
    state, n_iter, results = fit_path(
        xd, yd, wd, None, gammas, l1s, l2s, jnp.float32(1e-3),
        jax.random.PRNGKey(r), state0, fam, pen, config,
    )
    got = jax.device_get(results)
    dt = time.perf_counter() - t0
    log(f"bare fit_path rep {r}: {dt*1e3:.0f} ms (epochs {int(n_iter)})")

# 4) readback cost of the results tuple alone
t0 = time.perf_counter()
got = jax.device_get(results)
log(f"device_get(results): {(time.perf_counter()-t0)*1e3:.0f} ms")
