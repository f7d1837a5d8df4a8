"""Gaussian family tests (reference tests/testthat/test-gaussian.R)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import pop_sd, random_data, sklearn_enet_path


def test_ols_solution():
    """Near-zero penalty reproduces OLS (reference test-gaussian.R:4-15)."""
    x, y = random_data(n=200, p=5, seed=1)
    fit = st.fit(x, y, lambda_path=[0.0], thresh=1e-6, maxit=2000, dtype=np.float64)
    X1 = np.column_stack([np.ones(len(y)), x])
    ols = np.linalg.lstsq(X1, y, rcond=None)[0]
    assert abs(fit.a0[0] - ols[0]) < 1e-3
    np.testing.assert_allclose(fit.beta[0, 0], ols[1:], atol=1e-3)


def test_lambda_max_gives_zero_solution():
    """All weights zero at lambda_max (reference test-gaussian.R:17-36)."""
    x, y = random_data(n=150, p=3, seed=2)
    sy = float(pop_sd(y.reshape(-1, 1))[0])
    xt = (x - x.mean(0)) / pop_sd(x)
    yt = (y - y.mean()) / sy
    lambda_max = np.max(np.abs(yt @ xt)) * sy / len(y)

    fit = st.fit(x, y, maxit=1000, thresh=1e-4, dtype=np.float64)
    assert fit.lambda_.max() == pytest.approx(lambda_max, rel=1e-6)
    np.testing.assert_allclose(fit.beta[0], 0.0, atol=1e-10)


def test_ridge_closed_form():
    """Closed-form ridge match (reference test-gaussian.R:38-60)."""
    rng = np.random.default_rng(1)
    n, p = 500, 3
    b = np.array([-5.0, 3.0, 2.0])
    x = rng.normal(size=(n, p))
    x = (x - x.mean(0)) / x.std(0, ddof=1)
    y = x @ b + rng.normal(size=n)
    lam = 0.01
    sd_y = float(pop_sd(y.reshape(-1, 1))[0])

    beta_theory = np.linalg.solve(x.T @ x + lam * np.eye(p), x.T @ y)
    fit = st.fit(
        x,
        y,
        alpha=0.0,
        lambda_path=[sd_y * lam / n],
        intercept=False,
        thresh=1e-5,
        maxit=1000,
        dtype=np.float64,
    )
    np.testing.assert_allclose(fit.beta[0, 0], beta_theory, atol=1e-3)


def test_constant_response_degenerate():
    """Constant y -> zero path, a0 = mean(y) (reference test-gaussian.R:62-71)."""
    x, _ = random_data(n=60, p=4, seed=3)
    y = np.full(60, 5.0)
    fit = st.fit(x, y, dtype=np.float64)
    np.testing.assert_allclose(fit.lambda_, 0.0)
    np.testing.assert_allclose(fit.beta, 0.0)
    np.testing.assert_allclose(fit.a0, 5.0)


@pytest.mark.parametrize("alpha", [1.0, 0.5, 0.0])
@pytest.mark.parametrize("standardize", [True, False])
def test_against_sklearn_path(alpha, standardize):
    """Coefficient agreement with the coordinate-descent oracle over the
    alpha x standardize grid at 1e-3 (the reference's glmnet tolerance,
    reference setup.R:97, test-families.R:3-40)."""
    x, y = random_data(n=300, p=8, seed=4)
    fit = st.fit(
        x,
        y,
        alpha=alpha,
        nlambda=12,
        standardize=standardize,
        thresh=1e-6,
        maxit=3000,
        dtype=np.float64,
    )
    # skip the first ridge path point (reference setup.R:86-91)
    lams = fit.lambda_[1:] if alpha == 0 else fit.lambda_
    a0_o, beta_o = sklearn_enet_path(x, y, lams, mix=alpha, standardize=standardize)
    sel = slice(1, None) if alpha == 0 else slice(None)
    scale = max(1.0, np.abs(beta_o).max())
    np.testing.assert_allclose(fit.beta[sel, 0, :], beta_o, atol=2e-3 * scale)
    np.testing.assert_allclose(fit.a0[sel], a0_o, atol=2e-3 * max(1.0, np.abs(a0_o).max()))


def test_predictions_match_manual():
    x, y = random_data(n=120, p=4, seed=5)
    fit = st.fit(x, y, nlambda=5, dtype=np.float64)
    pred = fit.predict(x)
    manual = x @ fit.beta[:, 0, :].T + fit.a0
    np.testing.assert_allclose(pred, manual, rtol=1e-10)


def test_abalone_fit_converges():
    """Abalone end-to-end slice (BASELINE.json configs[0])."""
    from sgdnet_tpu.data import load_abalone

    x, y = load_abalone()
    fit = st.fit(x, y, alpha=0.8, nlambda=20, dtype=np.float64)
    assert fit.dev_ratio[-1] > 0.4
    assert (fit.return_codes == 0).all()
    assert np.all(np.diff(fit.dev_ratio) > -1e-8)
