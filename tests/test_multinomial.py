"""Multinomial family tests (reference tests/testthat/test-multinomial.R)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import pop_sd, random_data


def test_response_probabilities_sum_to_one():
    """(reference test-multinomial.R:8-13)"""
    x, y = random_data(n=150, p=4, family="multinomial", n_classes=3, seed=1)
    fit = st.fit(x, y, family="multinomial", nlambda=8, dtype=np.float64)
    resp = fit.predict(x, type="response")  # (n, k, nl)
    np.testing.assert_allclose(resp.sum(axis=1), 1.0, atol=1e-10)


def test_intercepts_sum_to_zero():
    """Multinomial intercepts are centered (reference R/sgdnet.R:409-410)."""
    x, y = random_data(n=150, p=4, family="multinomial", n_classes=3, seed=2)
    fit = st.fit(x, y, family="multinomial", nlambda=8, dtype=np.float64)
    np.testing.assert_allclose(fit.a0.sum(axis=1), 0.0, atol=1e-10)


def test_against_sklearn():
    """Coefficient agreement with sklearn multinomial SAGA at the reference's
    1e-3 tolerance (reference test-families.R uses glmnet)."""
    from sklearn.linear_model import LogisticRegression

    x, y = random_data(n=300, p=5, family="multinomial", n_classes=3, seed=3)
    lam = 0.01
    fit = st.fit(
        x,
        y,
        family="multinomial",
        alpha=0.0,
        lambda_path=[lam],
        thresh=1e-7,
        maxit=5000,
        dtype=np.float64,
    )
    xc, xs = x.mean(0), pop_sd(x)
    xt = (x - xc) / xs
    n = len(y)
    lr = LogisticRegression(C=1.0 / (n * lam), solver="lbfgs", fit_intercept=True, tol=1e-10, max_iter=10000)
    lr.fit(xt, y)
    # sklearn multinomial coefficients are sum-zero over classes, same as the
    # symmetric parametrization SAGA converges to under an L2 penalty
    beta_o = lr.coef_ / xs  # (k, p)
    a0_o = lr.intercept_ - np.sum(xc * beta_o, axis=1)
    a0_o = a0_o - a0_o.mean()
    np.testing.assert_allclose(fit.beta[0], beta_o, atol=2e-3)
    np.testing.assert_allclose(fit.a0[0], a0_o, atol=2e-3)


def test_wine_reference_fit():
    """Wine multinomial path (BASELINE.json configs[2])."""
    from sgdnet_tpu.data import load_wine

    x, y = load_wine()
    fit = st.fit(x, y, family="multinomial", alpha=0.8, nlambda=20, dtype=np.float64)
    assert (fit.return_codes == 0).all()
    assert fit.dev_ratio[-1] > 0.8
    assert fit.n_classes == 3
    cls = fit.predict(x, type="class")
    assert (cls[:, -1] == y).mean() > 0.9
    assert fit.dfmat is not None and fit.dfmat.shape[0] == 3


def test_grouped_multinomial():
    """Grouped multinomial penalty — reachable here, unlike the reference R
    layer (reference R/sgdnet.R:265-272, src/sgdnet.cpp:80-82)."""
    x, y = random_data(n=150, p=6, family="multinomial", n_classes=3, seed=4)
    fit = st.fit(
        x, y, family="multinomial", type_multinomial="grouped", nlambda=10, dtype=np.float64
    )
    assert fit.grouped
    # group sparsity: a feature is zero in all classes or none
    nz = np.abs(fit.beta) > 1e-12
    per_class = nz.any(axis=1)
    all_class = nz.all(axis=1)
    np.testing.assert_array_equal(per_class, all_class)


def test_errors():
    x, _ = random_data(n=30, p=3, seed=5)
    with pytest.raises(ValueError, match="binomial"):
        st.fit(x, np.arange(30) % 2, family="multinomial")


def test_iris_reference_fit():
    """Iris multinomial alpha=0.8 (BASELINE.json configs[2]) with an sklearn
    ridge-limit coefficient check."""
    from sklearn.datasets import load_iris

    d = load_iris()
    x, y = d.data, d.target.astype(float)
    fit = st.fit(x, y, family="multinomial", alpha=0.8, nlambda=20, dtype=np.float64)
    assert (fit.return_codes == 0).all()
    assert fit.dev_ratio[-1] > 0.9
    cls = fit.predict(x, type="class")
    assert (cls[:, -1].astype(float) == y).mean() > 0.95
    # coefficient check at an interior lambda against sklearn SAGA elasticnet
    from sklearn.linear_model import LogisticRegression

    from tests.helpers import pop_sd

    lam = 0.01
    f1 = st.fit(
        x, y, family="multinomial", alpha=0.5, lambda_path=[lam],
        thresh=1e-7, maxit=8000, dtype=np.float64,
    )
    xc, xs = x.mean(0), pop_sd(x)
    lr = LogisticRegression(
        solver="saga", l1_ratio=0.5, C=1.0 / (len(y) * lam),
        tol=1e-10, max_iter=200000,
    )
    lr.fit((x - xc) / xs, y)
    beta_o = lr.coef_ / xs
    a0_o = lr.intercept_ - np.sum(xc * beta_o, axis=1)
    a0_o = a0_o - a0_o.mean()
    # sklearn's penalized multinomial is already sum-centered; class order matches
    np.testing.assert_allclose(f1.beta[0], beta_o, atol=5e-3)
    np.testing.assert_allclose(f1.a0[0], a0_o, atol=5e-3)
