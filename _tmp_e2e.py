import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import numpy as np
from bench import _to_scipy, log, make_sparse_binomial
from bench_path_e2e import run_one
import jax, jax.numpy as jnp, time
log(f"backend: {jax.default_backend()}")
t0 = time.perf_counter()
_ = float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
log(f"device warmup: {time.perf_counter()-t0:.1f}s")
data, y = make_sparse_binomial(n=100_000, p=47_000, nnz_per_row=76, seed=3)
xs = _to_scipy(data); yv = np.asarray(y).ravel()
log(f"workload: {xs.shape}, {xs.nnz/1e6:.1f}M nnz")
for D in (32768, 16384):
    r = run_one(xs, yv, xs.nnz, D, screen_after=False)
    log(f"RESULT {r}")
