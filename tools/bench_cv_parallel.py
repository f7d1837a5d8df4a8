"""Measured fold-parallel CV timing (VERDICT r3 #7).

The fold-parallel machinery (parallel/cv.py) was correctness-complete for
two rounds but never timed on chip.  This times a 10-fold binomial CV on a
mid-size dense problem (20k x 2k) two ways through the public API:

  * serial        — cv_fit(parallel=False): the reference's structure
                    (R/cv_sgdnet.R:178-200), one fit() dispatch per fold;
  * fold-parallel — cv_fit(parallel=True, cv_mesh=None): all folds inside
                    ONE compiled lax.map program on the single chip — no
                    extra FLOPs, but the per-fold dispatch/readback floor
                    (~25 ms/sync through the relay) is paid once, not 10x.

Both are run twice; the second (warm-cache) run is the headline since the
first includes compilation.  Results go to RESULTS.md.

Usage: python tools/bench_cv_parallel.py   (from /root/repo, TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import sgdnet_tpu as st

    log(f"backend: {jax.default_backend()}")
    t0 = time.perf_counter()  # one-time relay first-use cost, not CV work
    _ = float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s (excluded)")

    rng = np.random.default_rng(0)
    n, p, nfolds = 20_000, 2_000, 10
    x = rng.normal(size=(n, p)).astype(np.float32)
    beta = np.zeros(p)
    beta[:40] = rng.normal(size=40)
    yp = 1.0 / (1.0 + np.exp(-(x @ beta) * 0.25))
    y = (rng.random(n) < yp).astype(np.float32)
    foldid = np.arange(n) % nfolds
    log(f"workload: {n}x{p} dense binomial, {nfolds} folds")

    kw = dict(
        family="binomial", alpha=1.0, nlambda=20, thresh=1e-3,
        batch_size=2048, foldid=foldid, seed=0,
    )

    results = {}
    for label, extra in (("serial", {}), ("fold-parallel", {"parallel": True})):
        walls = []
        for rep in range(2):
            t0 = time.perf_counter()
            cv = st.cv_fit(x, y, **kw, **extra)
            _ = float(np.asarray(cv.cv_summary["mean"]).sum())  # force full readback
            walls.append(time.perf_counter() - t0)
        results[label] = (walls, float(cv.lambda_min))
        log(f"{label}: cold {walls[0]:.2f}s, warm {walls[1]:.2f}s "
            f"(lambda_min {cv.lambda_min:.5g})")

    (ws, lam_s), (wp, lam_p) = results["serial"], results["fold-parallel"]
    log(f"HEADLINE: warm serial {ws[1]:.2f}s vs fold-parallel {wp[1]:.2f}s "
        f"-> {ws[1]/wp[1]:.2f}x; lambda_min agreement "
        f"{'PASS' if abs(np.log(lam_s) - np.log(lam_p)) < 1e-6 else f'{lam_s} vs {lam_p}'}")


if __name__ == "__main__":
    main()
