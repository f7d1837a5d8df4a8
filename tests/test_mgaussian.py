"""Multivariate-gaussian family tests (reference tests/testthat/test-mgaussian.R)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import random_data


def test_multivariate_ridge_closed_form():
    """(reference test-mgaussian.R:3-29)"""
    rng = np.random.default_rng(1)
    n, p = 500, 3
    b = np.column_stack([[-5.0, 3.0, 2.0], [0.0, -5.0, 9.0]])
    x = rng.normal(size=(n, p))
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    e = x @ b
    y = np.column_stack(
        [rng.normal(loc=e[:, 0].mean(), size=n), rng.normal(loc=e[:, 1].mean(), size=n)]
    )
    lam = 0.01
    beta_theory = np.linalg.solve(x.T @ x + lam * np.eye(p), x.T @ y)  # (p, 2)
    fit = st.fit(
        x,
        y,
        family="mgaussian",
        alpha=0.0,
        lambda_path=[lam / n],
        intercept=False,
        thresh=1e-7,
        maxit=10000,
        dtype=np.float64,
    )
    np.testing.assert_allclose(fit.beta[0].T, beta_theory, atol=1e-5)


def test_group_sparsity():
    """mgaussian uses the group-lasso penalty: features drop out across all
    responses together (reference src/sgdnet.cpp:89-92)."""
    x, y = random_data(n=200, p=8, family="mgaussian", seed=2)
    fit = st.fit(x, y, family="mgaussian", alpha=1.0, nlambda=15, dtype=np.float64)
    assert fit.grouped
    nz = np.abs(fit.beta) > 1e-12
    np.testing.assert_array_equal(nz.any(axis=1), nz.all(axis=1))


def test_standardize_response():
    """(reference test-mgaussian.R:31-46)"""
    from sgdnet_tpu.data import load_student

    x, y = load_student()
    fit = st.fit(x, y, family="mgaussian", standardize_response=True, nlambda=20, dtype=np.float64)
    fit2 = st.fit(x, y, family="mgaussian", standardize_response=False, nlambda=20, dtype=np.float64)
    assert (fit.return_codes == 0).all()
    # standardized-response path differs and its lambda path reflects scaling
    assert not np.allclose(fit.lambda_, fit2.lambda_)


def test_student_dataset():
    from sgdnet_tpu.data import load_student

    x, y = load_student()
    fit = st.fit(x, y, family="mgaussian", nlambda=20, dtype=np.float64)
    assert (fit.return_codes == 0).all()
    assert fit.dev_ratio[-1] > 0.12  # OLS bound for this dataset is 0.1421
    pred = fit.predict(x)
    assert pred.shape == (x.shape[0], 2, 20)


def test_errors():
    x, y = random_data(n=30, p=3, seed=5)
    with pytest.raises(ValueError, match="one-dimensional"):
        st.fit(x, y, family="mgaussian")


def test_against_sklearn_multitask_elastic_net():
    """Our mgaussian group-lasso objective matches sklearn's
    MultiTaskElasticNet (L21 + L2 mixed penalty) with alpha_sk = lambda,
    l1_ratio = mix, on the standardized problem."""
    from sklearn.linear_model import MultiTaskElasticNet

    from tests.helpers import pop_sd

    rng = np.random.default_rng(7)
    n, p, m = 300, 6, 3
    x = rng.normal(size=(n, p))
    w_true = rng.normal(size=(p, m)) * (rng.random((p, 1)) < 0.6)
    y = x @ w_true + 0.3 * rng.normal(size=(n, m))
    lam, mix = 0.05, 0.7

    fit = st.fit(
        x, y, family="mgaussian", alpha=mix, lambda_path=[lam],
        thresh=1e-7, maxit=5000, dtype=np.float64,
    )

    xc, xs = x.mean(0), pop_sd(x)
    xt = (x - xc) / xs
    sk = MultiTaskElasticNet(alpha=lam, l1_ratio=mix, tol=1e-12, max_iter=100000)
    sk.fit(xt, y)
    beta_o = sk.coef_ / xs  # (m, p)
    a0_o = sk.intercept_ - beta_o @ xc
    np.testing.assert_allclose(fit.beta[0], beta_o, atol=2e-3)
    np.testing.assert_allclose(fit.a0[0], a0_o, atol=2e-3)
