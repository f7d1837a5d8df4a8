"""End-to-end large-scale path headline (VERDICT r2 #2).

One user-facing number: wall-clock for a full 50-lambda lasso path on the
bench workload (n=100k, p=47k sparse binomial, 7.6M nnz) with the round-2
performance stack engaged — int8 hybrid head, block sampling, refresh/8 —
with and without strong-rule screening.  Reports wall time, epochs,
effective nnz/s, and screened-vs-full coefficient agreement.

The reference's analogous loop is the sgdnet path driver
(/root/reference/src/sgdnet.cpp:217-273) running sequential C++ SAGA.

Usage: python tools/bench_path_e2e.py [quick]   (from /root/repo, TPU)
`quick` drops to n=20k for a fast smoke.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _to_scipy, log, make_sparse_binomial  # noqa: E402


def main(quick=False):
    import jax

    import sgdnet_tpu as st

    log(f"backend: {jax.default_backend()}")
    n = 20_000 if quick else 100_000
    p, nnz_row = 47_000, 76
    data, y = make_sparse_binomial(n=n, p=p, nnz_per_row=nnz_row, seed=3)
    xs = _to_scipy(data)
    yv = np.asarray(y).ravel()
    nnz = xs.nnz
    log(f"workload: {n}x{p}, {nnz/1e6:.1f}M nnz")

    # D=8192 (not the epoch-bench winner's 32768): fit() standardizes and
    # row-shuffles the f32 head ON DEVICE before int8 quantization, so the
    # transient peak is ~2 f32 head copies + tail + path outputs — ~8 GB at
    # D=8192.  D=16384 (~14.5 GB peak) crashed the 16 GB chip's runtime
    # mid-path; bench.py's epoch bench quantizes host-side and skips
    # standardization, which is why IT can go to 32768.  Closing this gap
    # needs host-side standardize+quantize assembly in fit() ingestion —
    # noted as future work in docs/design.md.
    kw = dict(
        family="binomial", alpha=1.0, nlambda=50, thresh=1e-3, batch_size=8192,
        sampling="block", hybrid_head_dtype="int8", hybrid_max_head=8192,
        hybrid_coverage=0.995, g_sum_refresh_every=8, seed=0,
    )

    t0 = time.perf_counter()
    full = st.fit(xs, yv, **kw)
    _ = float(np.asarray(full.beta[-1]).sum())
    t_full = time.perf_counter() - t0
    ep_full = full.stats["epochs"]
    log(f"FULL path: {t_full:.1f}s wall (incl. build+compile), {ep_full} epochs, "
        f"effective {nnz * ep_full / t_full:.3e} nnz/s end-to-end, "
        f"solver-only {full.stats['nnz_per_s']:.3e} nnz/s")

    t0 = time.perf_counter()
    scr = st.fit(xs, yv, screen=True, lambda_path=full.lambda_, **kw)
    _ = float(np.asarray(scr.beta[-1]).sum())
    t_scr = time.perf_counter() - t0
    ep_scr = scr.stats["epochs"]
    sstats = scr.stats.get("screening", {})
    log(f"SCREENED path: {t_scr:.1f}s wall, {ep_scr} epochs, "
        f"stats {sstats}")

    scale = max(np.abs(full.beta).max(), 1.0)
    diff = np.abs(scr.beta - full.beta).max()
    log(f"screened vs full: max|diff| {diff:.3e} ({diff/scale:.2e} relative; "
        f"contract 2e-3)")
    log(f"HEADLINE: full {t_full:.1f}s / screened {t_scr:.1f}s -> "
        f"{t_full/t_scr:.2f}x; agreement {'PASS' if diff <= 2e-3*scale else 'FAIL'}")


if __name__ == "__main__":
    main(quick="quick" in sys.argv[1:])
