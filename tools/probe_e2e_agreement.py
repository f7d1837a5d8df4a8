"""Diagnose the screened-vs-full disagreement on the e2e bench workload.

Round-5 observation: at n=100k D=16384 int8, the screened and screen='auto'
paths agree exactly with each other but differ from the plain chunked path
by ~0.19 relative at depth.  Both are warm-started chunked schedules, so
one of them is under-converged.  This reruns both fits and, for every
lambda, computes the PENALIZED objective on the original data host-side —
the ground truth for which solver got closer — plus return codes.

Usage: python tools/probe_e2e_agreement.py   (from /root/repo, TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _to_scipy, log, make_sparse_binomial  # noqa: E402


def penalized_objective(xs, yv, fit, sd, alpha=1.0):
    """Objective per lambda on the solver's standardized scale, computed
    host-side: mean logloss + lambda * (alpha*|w|_1 + (1-alpha)/2*|w|_2^2)
    with w = beta * sd (binomial: y unscaled)."""
    objs = []
    n = xs.shape[0]
    a0s = np.asarray(fit.a0).reshape(len(fit.lambda_), -1)
    for i in range(fit.beta.shape[0]):
        beta = fit.beta[i, 0]
        a0 = float(a0s[i, 0])
        lp = xs @ beta + a0  # (n,)
        # stable logloss
        ll = np.logaddexp(0.0, lp) - yv * lp
        w_std = beta * sd
        lam = float(fit.lambda_[i])
        pen = lam * (alpha * np.abs(w_std).sum() + (1 - alpha) / 2 * (w_std**2).sum())
        objs.append(ll.mean() + pen)
    return np.asarray(objs)


def main():
    import jax
    import jax.numpy as jnp

    import sgdnet_tpu as st

    log(f"backend: {jax.default_backend()}")
    t0 = time.perf_counter()
    _ = float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
    log(f"warmup {time.perf_counter()-t0:.1f}s")

    data, y = make_sparse_binomial(n=100_000, p=47_000, nnz_per_row=76, seed=3)
    xs = _to_scipy(data)
    yv = np.asarray(y).ravel()
    sd_all = np.sqrt(np.asarray(xs.power(2).mean(axis=0)).ravel()
                     - np.asarray(xs.mean(axis=0)).ravel() ** 2)
    sd_all[sd_all == 0] = 1.0

    D = 16384
    kw = dict(
        family="binomial", alpha=1.0, nlambda=50, thresh=1e-3, batch_size=8192,
        sampling="block", hybrid_head_dtype="int8", hybrid_max_head=D,
        hybrid_coverage=0.995, hybrid_memory_budget=4e9,
        g_sum_refresh_every=8, seed=0, lambda_chunk=4, maxit=200,
    )
    full = st.fit(xs, yv, **kw)
    log(f"full: codes {np.asarray(full.return_codes)}")
    scr = st.fit(xs, yv, screen="auto", lambda_path=full.lambda_, **kw)
    log(f"auto: codes {np.asarray(scr.return_codes)}")
    np.savez("/tmp/e2e_agree_fits.npz",
             beta_f=full.beta, a0_f=np.asarray(full.a0),
             beta_s=scr.beta, a0_s=np.asarray(scr.a0),
             lam=np.asarray(full.lambda_), codes_f=full.return_codes,
             codes_s=scr.return_codes)

    obj_f = penalized_objective(xs, yv, full, sd_all)
    obj_s = penalized_objective(xs, yv, scr, sd_all)
    dif = np.abs(scr.beta - full.beta).max(axis=(1, 2))
    scale = np.abs(full.beta).max()
    log("lam_i  obj_full    obj_scr     d_obj(scr-full)  max|dbeta|  code_f code_s")
    for i in range(len(obj_f)):
        log(f"{i:3d}  {obj_f[i]:.6f}  {obj_s[i]:.6f}  {obj_s[i]-obj_f[i]:+.2e}  "
            f"{dif[i]:.3e}  {full.return_codes[i]} {scr.return_codes[i]}")
    log(f"scale {scale:.3f}; total obj full {obj_f.sum():.4f} vs scr {obj_s.sum():.4f}")


if __name__ == "__main__":
    main()
