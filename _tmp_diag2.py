import sys, time, numpy as np
T0=time.monotonic()
def log(*a): print(f"[{time.monotonic()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)
import jax
import sgdnet_tpu as st
sys.path.insert(0, "/root/repo")
from bench import _to_scipy, make_sparse_binomial
log(f"backend: {jax.default_backend()}")
data, y = make_sparse_binomial(n=100_000, p=47_000, nnz_per_row=76, seed=3)
xs = _to_scipy(data); yv = np.asarray(y).ravel()
log(f"data built: {xs.nnz/1e6:.1f}M nnz")
kw = dict(family="binomial", alpha=1.0, nlambda=10, thresh=1e-3, batch_size=8192,
          sampling="block", hybrid_head_dtype="int8", hybrid_max_head=8192,
          hybrid_coverage=0.995, g_sum_refresh_every=8, seed=0)
t0=time.monotonic()
f = st.fit(xs, yv, **kw)
s = float(np.asarray(f.beta[-1]).sum())
log(f"n=100k 10-lambda int8 fit done in {time.monotonic()-t0:.1f}s, epochs={f.stats['epochs']}, "
    f"solver {f.stats['nnz_per_s']:.3e} nnz/s, sum={s:.3f}")
