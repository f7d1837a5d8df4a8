"""Measured screening effectiveness on a sparse p >= 10k workload.

The round-1 verdict asked for strong-rule screening to 'earn its name':
screened == full at the coefficient contract on a large sparse problem,
WITH a measured epoch-work reduction.  This runs a 50-lambda lasso path
on a 20k x 47k sparse binomial problem (the bench generator's Zipf
statistics), screened vs full, compares coefficients, and reports wall
time plus the active-set fraction from fit.stats["screening"].

Usage: python tools/bench_screening.py  (from /root/repo; TPU or CPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _to_scipy, log, make_sparse_binomial  # noqa: E402


def main():
    import jax

    import sgdnet_tpu as st

    log(f"backend: {jax.default_backend()}")
    import jax.numpy as jnp

    t0 = time.perf_counter()  # one-time relay first-use cost, not fit() work
    _ = float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s (excluded)")
    n, p, nnz_row = 20_000, 47_000, 40
    data, y = make_sparse_binomial(n=n, p=p, nnz_per_row=nnz_row, seed=3)
    xs = _to_scipy(data)
    yv = np.asarray(y).ravel()

    # thresh=1e-3 (fit()'s default, the reference's own tolerance): a
    # thresh=1e-4 full path is one multi-minute device dispatch, and the
    # relay's worker died mid-dispatch twice at that depth (2026-08-20)
    kw = dict(
        family="binomial", alpha=1.0, nlambda=50, thresh=1e-3, batch_size=2048,
        seed=0,
    )
    log("fitting FULL path...")
    t0 = time.perf_counter()
    full = st.fit(xs, yv, **kw)
    _ = float(np.asarray(full.beta).sum())
    t_full = time.perf_counter() - t0
    log(f"full path done: {t_full:.1f}s, {full.stats['epochs']} epochs, "
        f"in-path {full.stats['wall_time_s']:.1f}s, "
        f"solver {full.stats['nnz_per_s']:.3e} nnz/s, "
        f"layout {full.stats['layout']}")

    log("fitting SCREENED path...")
    t0 = time.perf_counter()
    scr = st.fit(xs, yv, screen=True, lambda_path=full.lambda_, **kw)
    _ = float(np.asarray(scr.beta).sum())
    t_scr = time.perf_counter() - t0
    log(f"screened path done: {t_scr:.1f}s, {scr.stats['epochs']} epochs, "
        f"work-based {scr.stats['nnz_per_s']:.3e} elem/s")

    scale = max(np.abs(full.beta).max(), 1.0)
    diff = np.abs(scr.beta - full.beta).max()
    stats = scr.stats.get("screening", {})
    # at thresh=1e-3 BOTH runs are only 1e-3-converged, so their mutual
    # distance measures stopping noise, not screening error (KKT-clean
    # makes the screened solution exact up to solver tolerance; the tight
    # 2e-3 exactness contract is pinned at thresh<=1e-6 in
    # tests/test_screening.py).  Sanity bound here: a few stopping radii.
    log(f"coefficient agreement: max|diff| = {diff:.3e} (scale {scale:.3f}, "
        f"{diff/scale:.2e} relative; both runs thresh=1e-3-converged)")
    log(f"wall: full = {t_full:.1f}s (incl. compile), screened = {t_scr:.1f}s "
        f"-> {t_full/t_scr:.2f}x")
    log(f"screening stats: {stats}")
    assert diff <= 1e-2 * scale, "screened path outside stopping-noise bound"

    # --- sparse-regime leg: the top of the path (lambda[:28], where the
    # strong rule keeps <= ~10% of features) is the regime screening was
    # built for; the full 50-lambda path's dense tail (~48% active) is
    # where the full-layout fallback keeps it from losing badly ---
    lam_head = full.lambda_[:28]
    t0 = time.perf_counter()
    f28 = st.fit(xs, yv, lambda_path=lam_head, **kw)
    _ = float(np.asarray(f28.beta).sum())
    t_f28 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s28 = st.fit(xs, yv, screen=True, lambda_path=lam_head, **kw)
    _ = float(np.asarray(s28.beta).sum())
    t_s28 = time.perf_counter() - t0
    d28 = np.abs(s28.beta - f28.beta).max()
    log(f"sparse-regime (28-lambda head): full {t_f28:.1f}s "
        f"({f28.stats['epochs']} ep) vs screened {t_s28:.1f}s "
        f"({s28.stats['epochs']} ep) -> {t_f28/t_s28:.2f}x, "
        f"mean_active {s28.stats['screening']['mean_active']:.0f}, "
        f"agreement {d28/scale:.2e} rel")
    log("PASS")


if __name__ == "__main__":
    main()
