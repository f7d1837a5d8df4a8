"""Head-to-head: fused Pallas head kernel vs XLA two-pass schedule.

Runs the winning bench config (hybrid D=16384, B=8192, block sampling,
refresh/4) with and without the fused Pallas head step, for f32 and bf16
head storage, on the real chip.  Run from /root/repo:

    python tools/bench_pallas_vs_xla.py
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from bench import bench_sparse_epoch, log, make_sparse_binomial  # noqa: E402

data = make_sparse_binomial()
common = dict(
    batch_size=8192,
    hybrid=True,
    max_head=16384,
    coverage=0.98,
    sampling="block",
    g_sum_refresh_every=4,
    data=data,
    epochs=5,
)
for hd in (jnp.bfloat16, None):
    for pallas in (True, False):
        try:
            v = bench_sparse_epoch(**common, head_dtype=hd, use_pallas=pallas)
            log(f"RESULT head={hd} pallas={pallas}: {v:.3e} nnz/s")
        except Exception as e:  # noqa: BLE001
            log(f"RESULT head={hd} pallas={pallas} FAILED: {type(e).__name__}: {str(e)[:300]}")
