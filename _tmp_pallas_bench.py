import sys
sys.path.insert(0, ".")
from bench import bench_sparse_epoch, make_sparse_binomial, log
import jax.numpy as jnp

data = make_sparse_binomial()
common = dict(batch_size=8192, hybrid=True, max_head=16384, coverage=0.98,
              sampling="block", g_sum_refresh_every=4, data=data, epochs=5)
for hd in (jnp.bfloat16, None):
    try:
        v = bench_sparse_epoch(**common, head_dtype=hd, use_pallas=True)
        log(f"RESULT head={hd} pallas=True: {v:.3e} nnz/s")
    except Exception as e:
        log(f"head={hd} pallas FAILED: {type(e).__name__}: {str(e)[:300]}")
