"""Lambda-path tests (reference tests/testthat/test-lambda-path.R)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import pop_sd, random_data


def test_path_length_and_spacing():
    x, y = random_data(n=120, p=5, seed=1)
    fit = st.fit(x, y, nlambda=25, dtype=np.float64)
    assert len(fit.lambda_) == 25
    # log-spaced, decreasing
    logs = np.log(fit.lambda_)
    np.testing.assert_allclose(np.diff(logs), np.diff(logs)[0], rtol=1e-8)
    assert np.all(np.diff(fit.lambda_) < 0)


def test_lambda_min_ratio_rules():
    """Default lambda_min_ratio: 0.01 when n < p else 1e-4
    (reference R/sgdnet.R:191-192)."""
    x, y = random_data(n=120, p=5, seed=2)
    fit = st.fit(x, y, nlambda=10, dtype=np.float64)
    np.testing.assert_allclose(fit.lambda_[-1] / fit.lambda_[0], 1e-4, rtol=1e-6)

    x2, y2 = random_data(n=10, p=20, seed=3)
    fit2 = st.fit(x2, y2, nlambda=10, dtype=np.float64)
    np.testing.assert_allclose(fit2.lambda_[-1] / fit2.lambda_[0], 0.01, rtol=1e-6)


def test_gaussian_lambda_max_algebra():
    """Hand-computed lambda_max including the standardization algebra
    (reference test-lambda-path.R:49-146)."""
    x, y = random_data(n=100, p=4, seed=4)
    sy = float(pop_sd(y.reshape(-1, 1))[0])
    xt = (x - x.mean(0)) / pop_sd(x)
    yt = (y - y.mean()) / sy
    expected = np.max(np.abs(xt.T @ yt)) * sy / len(y)
    fit = st.fit(x, y, alpha=1.0, nlambda=5, dtype=np.float64)
    assert fit.lambda_[0] == pytest.approx(expected, rel=1e-8)

    # unstandardized: lambda_max on raw x
    expected_raw = np.max(np.abs(x.T @ yt)) * sy / len(y)
    fit_raw = st.fit(x, y, alpha=1.0, nlambda=5, standardize=False, dtype=np.float64)
    assert fit_raw.lambda_[0] == pytest.approx(expected_raw, rel=1e-8)


def test_binomial_lambda_max_algebra():
    """(reference src/families.h:203-220)"""
    x, y = random_data(n=150, p=4, family="binomial", seed=5)
    xt = (x - x.mean(0)) / pop_sd(x)
    ystd = float(pop_sd(y.reshape(-1, 1))[0])
    ymap = (y - y.mean()) / ystd
    expected = ystd * np.max(np.abs(xt.T @ ymap)) / len(y)
    fit = st.fit(x, y, family="binomial", nlambda=5, dtype=np.float64)
    assert fit.lambda_[0] == pytest.approx(expected, rel=1e-8)


def test_multinomial_lambda_max_algebra():
    """(reference src/families.h:300-325)"""
    x, y = random_data(n=150, p=4, family="multinomial", n_classes=3, seed=6)
    xt = (x - x.mean(0)) / pop_sd(x)
    onehot = np.eye(3)[y.astype(int)]
    ybar = onehot.mean(0)
    ystd = pop_sd(onehot)
    ymap = (onehot - ybar) / ystd
    inner = (xt.T @ ymap) * ystd
    expected = np.max(np.abs(inner)) / len(y)
    fit = st.fit(x, y, family="multinomial", alpha=1.0, nlambda=5, dtype=np.float64)
    assert fit.lambda_[0] == pytest.approx(expected, rel=1e-8)


def test_ridge_lambda_max_divisor():
    """alpha=0 divides lambda_max by 0.001 (reference src/utils.h:157-159)."""
    x, y = random_data(n=100, p=4, seed=7)
    f1 = st.fit(x, y, alpha=1.0, nlambda=5, dtype=np.float64)
    f0 = st.fit(x, y, alpha=0.0, nlambda=5, dtype=np.float64)
    assert f0.lambda_[0] == pytest.approx(f1.lambda_[0] / 0.001, rel=1e-8)
    f5 = st.fit(x, y, alpha=0.5, nlambda=5, dtype=np.float64)
    assert f5.lambda_[0] == pytest.approx(f1.lambda_[0] / 0.5, rel=1e-8)


def test_first_lasso_point_fully_sparse():
    """(reference test-lambda-path.R:148-192)"""
    for family in ["gaussian", "binomial"]:
        x, y = random_data(n=100, p=6, family=family, seed=8)
        fit = st.fit(x, y, family=family, alpha=1.0, nlambda=10, dtype=np.float64)
        assert fit.df[0] == 0
        np.testing.assert_array_equal(fit.beta[0], 0.0)


def test_path_refit_idempotence():
    """Refitting with the returned lambda path reproduces the fit
    (reference test-lambda-path.R:195-221)."""
    x, y = random_data(n=120, p=5, seed=9)
    fit = st.fit(x, y, nlambda=8, thresh=1e-6, dtype=np.float64)
    fit2 = st.fit(x, y, lambda_path=fit.lambda_, thresh=1e-6, dtype=np.float64)
    np.testing.assert_allclose(fit2.beta, fit.beta, atol=1e-4)


def test_explicit_lambda_used_verbatim():
    x, y = random_data(n=80, p=4, seed=10)
    lams = [0.5, 0.1, 0.01]
    fit = st.fit(x, y, lambda_path=lams, dtype=np.float64)
    np.testing.assert_allclose(fit.lambda_, lams)


def test_lambda_chunked_path_matches_single_dispatch():
    """lambda_chunk splits the path into warm-started chunked dispatches;
    the result must match the one-dispatch path (same seed, same solver —
    only the per-lambda PRNG folding differs, so agreement is at the
    solver-tolerance level, not bitwise)."""
    import numpy as np

    import sgdnet_tpu as st
    from tests.helpers import random_data

    x, y = random_data(n=200, p=12, seed=8)
    kw = dict(nlambda=9, thresh=1e-7, maxit=3000, dtype=np.float64, seed=1)
    one = st.fit(x, y, **kw)
    chunked = st.fit(x, y, lambda_chunk=4, **kw)
    assert chunked.npasses > 0
    scale = max(1.0, np.abs(one.beta).max())
    np.testing.assert_allclose(chunked.beta, one.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(chunked.dev_ratio, one.dev_ratio, atol=1e-3)
    np.testing.assert_array_equal(chunked.lambda_, one.lambda_)


def test_lambda_chunk_backoff_mechanics():
    """With maxit=1 every lambda reports code 1 with a large final change,
    so each chunk triggers at least one try-and-keep-the-better retry;
    npasses counts every attempted epoch and the final return codes stay
    an honest 1."""
    import numpy as np

    import sgdnet_tpu as st
    from tests.helpers import random_data

    x, y = random_data(n=64, p=6, seed=3)
    f = st.fit(x, y, nlambda=4, maxit=1, lambda_chunk=2, thresh=1e-12,
               dtype=np.float64)
    # two backoff layers compound here: per-lambda IN-PROGRAM retries
    # (saga.py fit_one_robust, up to 3 attempts) x chunk-level retries
    # (up to 3 runs per chunk) x 2 chunks x 2 lambdas x 1 epoch
    assert 8 <= f.npasses <= 36
    assert (f.return_codes == 1).all()


def test_lambda_chunk_backoff_recovers_convergence():
    """A chunked fit whose first attempt cannot converge (tiny maxit) still
    returns code-1 honestly, while a converging chunked fit reports 0."""
    import numpy as np

    import sgdnet_tpu as st
    from tests.helpers import random_data

    x, y = random_data(n=200, p=8, seed=4)
    ok = st.fit(x, y, nlambda=6, lambda_chunk=3, thresh=1e-5, maxit=2000,
                dtype=np.float64)
    assert (ok.return_codes == 0).all()
