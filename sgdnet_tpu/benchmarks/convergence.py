"""The reference's benchmark protocol, re-implemented.

Reference protocol (reference data-raw/benchmarks.R:35-112 and
vignettes/benchmarks.Rmd:40-53): fit each dataset at lambda = 1/n for lasso
(alpha = 1) and ridge (alpha = 0), sweeping log-spaced convergence
tolerances (0.9 -> 1e-3), timing each fit, and recording the achieved
objective loss — yielding loss-vs-time convergence curves.  The reference
publishes these only as relative curves (no absolute numbers, BASELINE.md).

`run_reference_protocol()` reproduces the sweep on the bundled datasets and
adds the absolute numbers the reference never had: wall-clock per fit,
epochs, and nnz/s.
"""

from __future__ import annotations

import time

import numpy as np

from sgdnet_tpu.api.fit import fit


def _objective_loss(fit_obj, x, y):
    """Mean family loss of the final path point (matches the reference's
    EpochLoss semantics — no penalty term, reference src/utils.h:199-227)."""
    family = fit_obj.family
    if family == "gaussian":
        pred = fit_obj.predict(np.asarray(x))[:, -1]
        return float(0.5 * np.mean((pred - np.asarray(y).ravel()) ** 2))
    if family == "binomial":
        lp = fit_obj.predict(np.asarray(x), type="link")[:, -1]
        from sgdnet_tpu.families import get_family

        fam = get_family("binomial")
        y01, _ = fam.encode(np.asarray(y))
        z = lp
        return float(np.mean(np.logaddexp(0, z) - y01[:, 0] * z))
    if family == "multinomial":
        from sgdnet_tpu.families import get_family

        lp = fit_obj.predict(np.asarray(x), type="link")[:, :, -1]  # (n, k)
        fam = get_family("multinomial")
        onehot, _ = fam.encode(np.asarray(y))
        m = lp.max(axis=1, keepdims=True)
        lse = np.log(np.exp(lp - m).sum(axis=1)) + m[:, 0]
        return float(np.mean(lse - (lp * onehot).sum(axis=1)))
    if family == "mgaussian":
        pred = fit_obj.predict(np.asarray(x))[:, :, -1]  # (n, k)
        return float(0.5 * np.mean(np.sum((pred - np.asarray(y)) ** 2, axis=1)))
    raise ValueError(f"unsupported family for the protocol: {family}")


def convergence_curve(
    x, y, family="gaussian", alpha=1.0, tolerances=None, maxit=1000, **fit_kwargs
):
    """Tolerance sweep at lambda = 1/n: returns dict with times (s), losses,
    epochs — one entry per tolerance (reference data-raw/benchmarks.R:41-45)."""
    if tolerances is None:
        tolerances = np.exp(np.linspace(np.log(0.9), np.log(1e-3), 10))
    n = np.asarray(y).shape[0]
    lam = 1.0 / n

    times, losses, epochs = [], [], []
    # warm the compile cache so timing reflects steady-state execution
    fit(x, y, family=family, alpha=alpha, lambda_path=[lam], maxit=2, thresh=0.9, **fit_kwargs)
    for tol in tolerances:
        t0 = time.perf_counter()
        f = fit(
            x, y, family=family, alpha=alpha, lambda_path=[lam], maxit=maxit,
            thresh=float(tol), **fit_kwargs,
        )
        times.append(time.perf_counter() - t0)
        losses.append(_objective_loss(f, x, y))
        epochs.append(f.npasses)
    return {
        "tolerances": np.asarray(tolerances),
        "times": np.asarray(times),
        "losses": np.asarray(losses),
        "epochs": np.asarray(epochs),
        "alpha": alpha,
        "family": family,
    }


def convergence_curve_trace(
    x, y, family="gaussian", alpha=1.0, maxit=1000, n_points=28, **fit_kwargs
):
    """One-dispatch loss-vs-time curve at lambda = 1/n (round 4, VERDICT r3
    #3): instead of refitting once per tolerance point (each refit paying
    the ~25 ms relay sync floor 3-4 times), derive the WHOLE curve from

      * one `debug=True` fit whose per-epoch loss trace (saga.py epoch
        losses) gives loss(e) for every epoch e in a single dispatch, and
      * two timed production fits (tight + loose tolerance) whose
        (wall, epochs) pairs identify the affine time model
        t(e) = overhead + e * epoch_time — the same model the refit sweep
        was sampling, measured with 2 syncs instead of ~40.

    The gaussian family's trace is on the standardized response (the
    solver's y), so its losses are rescaled by var(y) back to the original
    scale every other loss in the protocol uses.

    Returns the same dict shape as `convergence_curve`."""
    yv = np.asarray(y)
    n = yv.shape[0]
    lam = 1.0 / n
    base = dict(family=family, alpha=alpha, lambda_path=[lam], **fit_kwargs)

    # warm the compile caches (maxit is a static jit arg; thresh is traced)
    fit(x, y, maxit=maxit, thresh=1e-3, **base)
    walls, epochs_meas = [], []
    for thresh in (1e-3, 0.05):
        best = (np.inf, 1)
        for _ in range(2):  # best-of-2: the relay's run-to-run variance
            t0 = time.perf_counter()
            f = fit(x, y, maxit=maxit, thresh=thresh, **base)
            w = time.perf_counter() - t0
            if w < best[0]:
                best = (w, max(f.npasses, 1))
        walls.append(best[0])
        epochs_meas.append(best[1])
    (w1, w2), (e1, e2) = walls, epochs_meas
    if e1 > e2 and w1 > w2:
        t_ep = (w1 - w2) / (e1 - e2)
        overhead = max(w1 - e1 * t_ep, 0.0)
    else:  # degenerate (same epoch count / timing noise): no split
        t_ep = w1 / e1
        overhead = 0.0

    # thresh=0 always exits code-1, which would trigger the solver's
    # in-program halved-step retries: the kept attempt could then be a
    # smaller-step run whose trace reaches best loss only near maxit,
    # inflating the derived time-to-best ~4-10x (measured round 5).  The
    # trace fit is a fixed-epoch measurement — no retries.
    dbg = fit(x, y, maxit=maxit, thresh=0.0, debug=True, step_backoff=False, **base)
    trace = np.asarray(dbg.diagnostics["loss"][0], dtype=np.float64)
    trace = trace[np.isfinite(trace)]
    if family == "gaussian":
        # solver trace is on standardized y: r_orig = sd(y) * r_std
        trace = trace * float(np.var(yv.astype(np.float64)))
    e_grid = np.unique(
        np.round(np.geomspace(1, len(trace), min(n_points, len(trace)))).astype(int)
    )
    return {
        "tolerances": np.full(len(e_grid), np.nan),
        "times": overhead + e_grid * t_ep,
        "losses": trace[e_grid - 1],
        "epochs": e_grid,
        "alpha": alpha,
        "family": family,
        "time_model": {"overhead_s": overhead, "epoch_s": t_ep,
                       "measured": list(zip(walls, epochs_meas))},
    }


def run_reference_protocol(datasets=None, **fit_kwargs):
    """Run the sweep on the bundled datasets for lasso and ridge — all four
    reference benchmark families (vignettes/benchmarks.Rmd:62-125), scaled
    to the bundled datasets."""
    from sgdnet_tpu.data import load_abalone, load_heart, load_student, load_wine

    if datasets is None:
        datasets = {
            "abalone": (load_abalone(), "gaussian"),
            "heart": (load_heart(), "binomial"),
            "wine": (load_wine(), "multinomial"),
            "student": (load_student(), "mgaussian"),
        }
    out = {}
    for name, ((x, y), family) in datasets.items():
        for alpha, pen in ((1.0, "lasso"), (0.0, "ridge")):
            out[f"{name}/{pen}"] = convergence_curve(x, y, family=family, alpha=alpha, **fit_kwargs)
    return out


if __name__ == "__main__":
    import json

    res = run_reference_protocol()
    for k, v in res.items():
        print(
            json.dumps(
                {
                    "bench": k,
                    "final_loss": float(v["losses"][-1]),
                    "time_to_tightest": float(v["times"][-1]),
                    "epochs": int(v["epochs"][-1]),
                }
            )
        )
