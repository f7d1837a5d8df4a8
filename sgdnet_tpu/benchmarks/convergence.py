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
