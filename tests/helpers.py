"""Shared test fixtures and oracles.

Mirrors the reference's test strategy (reference tests/testthat/setup.R):
a controllable GLM data simulator (`random_data`, setup.R:6-54) and oracle
solvers.  The reference uses glmnet as its reference implementation; here
scikit-learn's coordinate-descent / SAGA solvers play that role, with the
penalty-scale mapping derived from the reference's internal objective
(reference src/utils.h:174-180): on the standardized problem the reference
solves  (1/n) sum loss + l2/2 ||w||^2 + l1 ||w||_1  with
l2 = (1-mix) * lambda / sd(y), l1 = mix * lambda / sd(y).
"""

from __future__ import annotations

import numpy as np


def pop_sd(x, axis=0):
    """Population SD with the reference's zero-variance -> 1.0 guard."""
    sd = np.asarray(np.std(x, axis=axis))
    return np.where(sd == 0.0, 1.0, sd)


def random_data(n=100, p=4, family="gaussian", density=1.0, intercept=1.0, n_classes=3, seed=0):
    """GLM data simulator (reference setup.R:6-54)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, p))
    if density < 1.0:
        mask = rng.random((n, p)) < density
        x = x * mask
    beta = rng.normal(size=(p, 1))
    lp = x @ beta + intercept
    if family == "gaussian":
        y = lp[:, 0] + rng.normal(scale=0.5, size=n)
    elif family == "binomial":
        prob = 1 / (1 + np.exp(-lp[:, 0]))
        y = (rng.random(n) < prob).astype(float)
    elif family == "multinomial":
        betas = rng.normal(size=(p, n_classes))
        lps = x @ betas + intercept
        e = np.exp(lps - lps.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        y = np.array([rng.choice(n_classes, p=probs[i]) for i in range(n)]).astype(float)
    elif family == "mgaussian":
        betas = rng.normal(size=(p, 2))
        y = x @ betas + intercept + rng.normal(scale=0.5, size=(n, 2))
    else:
        raise ValueError(family)
    return x, y


def internal_problem(x, y, standardize=True):
    """Reproduce the reference's internal standardization for gaussian:
    x standardized (population SD), y centered/scaled always."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    if standardize:
        xc, xs = x.mean(0), pop_sd(x)
        xt = (x - xc) / xs
    else:
        xc, xs = np.zeros(x.shape[1]), np.ones(x.shape[1])
        xt = x
    yc, ys = y.mean(), float(pop_sd(y.reshape(-1, 1))[0])
    yt = (y - yc) / ys
    return xt, yt, xc, xs, yc, ys


def sklearn_enet_path(x, y, lambdas, mix=1.0, standardize=True, intercept=True, tol=1e-10):
    """Gaussian elastic-net oracle on the original scale via sklearn
    coordinate descent (glmnet-equivalent).  Returns (a0 (nl,), beta (nl, p))."""
    from sklearn.linear_model import ElasticNet, Ridge

    xt, yt, xc, xs, yc, ys = internal_problem(x, y, standardize)
    n, p = xt.shape
    a0s, betas = [], []
    for lam in np.atleast_1d(lambdas):
        alpha_sk = lam / ys
        if alpha_sk == 0:
            coef = np.linalg.lstsq(
                np.column_stack([np.ones(n), xt]) if intercept else xt, yt, rcond=None
            )[0]
            w = coef[1:] if intercept else coef
            b = coef[0] if intercept else 0.0
        elif mix == 0.0:
            # Ridge: sklearn Ridge solves ||y-Xw||^2/1 + alpha ||w||^2;
            # our objective * 2n: ||yt-Xw||^2 + n*l2*||w||^2, l2 = lam/ys
            r = Ridge(alpha=n * alpha_sk, fit_intercept=intercept, tol=tol, solver="cholesky")
            r.fit(xt, yt)
            w, b = r.coef_, (r.intercept_ if intercept else 0.0)
        else:
            en = ElasticNet(
                alpha=alpha_sk, l1_ratio=mix, fit_intercept=intercept, tol=tol, max_iter=100000
            )
            en.fit(xt, yt)
            w, b = en.coef_, (en.intercept_ if intercept else 0.0)
        beta = w * ys / xs
        a0 = b * ys + yc - np.sum(xc * beta) if intercept else 0.0
        a0s.append(a0)
        betas.append(beta)
    return np.asarray(a0s), np.asarray(betas)


def sklearn_logistic(x, y01, lam, mix=1.0, standardize=True, intercept=True, tol=1e-10):
    """Binomial oracle: sklearn SAGA logistic with C = 1/(n*lambda)
    (derivation in module docstring; y_scale = 1 for binomial)."""
    from sklearn.linear_model import LogisticRegression

    x = np.asarray(x, dtype=np.float64)
    if standardize:
        xc, xs = x.mean(0), pop_sd(x)
        xt = (x - xc) / xs
    else:
        xc, xs = np.zeros(x.shape[1]), np.ones(x.shape[1])
        xt = x
    n = x.shape[0]
    if mix == 0.0:
        penalty, l1_ratio = "l2", None
    elif mix == 1.0:
        penalty, l1_ratio = "l1", None
    else:
        penalty, l1_ratio = "elasticnet", mix
    lr = LogisticRegression(
        penalty=penalty,
        l1_ratio=l1_ratio,
        C=1.0 / (n * lam),
        solver="saga",
        fit_intercept=intercept,
        tol=tol,
        max_iter=100000,
    )
    lr.fit(xt, y01)
    w = lr.coef_[0]
    b = lr.intercept_[0] if intercept else 0.0
    beta = w / xs
    a0 = b - np.sum(xc * beta) if intercept else 0.0
    return a0, beta
