"""Null-deviance and deviance tests (reference tests/testthat/test-deviance.R)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import random_data


def test_gaussian_null_deviance():
    """nulldev = sum((y - mean(y))^2) (reference test-deviance.R:17-56)."""
    x, y = random_data(n=100, p=4, seed=1)
    fit = st.fit(x, y, nlambda=5, dtype=np.float64)
    expected = np.sum((y - y.mean()) ** 2)
    assert fit.nulldev == pytest.approx(expected, rel=1e-10)


def test_binomial_null_deviance():
    """nulldev = 2 * sum(loglik saturated - null) with the logit of the
    class rate (reference src/families.h:170-188)."""
    x, y = random_data(n=150, p=4, family="binomial", seed=2)
    fit = st.fit(x, y, family="binomial", nlambda=5, dtype=np.float64)
    p_bar = y.mean()
    lp0 = np.log(p_bar / (1 - p_bar))
    loss = np.log1p(np.exp(lp0)) - y * lp0
    assert fit.nulldev == pytest.approx(2 * loss.sum(), rel=1e-10)


def test_binomial_null_deviance_no_intercept():
    x, y = random_data(n=150, p=4, family="binomial", seed=3)
    fit = st.fit(x, y, family="binomial", intercept=False, nlambda=5, dtype=np.float64)
    loss = np.log(2.0) * np.ones_like(y)  # lp0 = 0
    assert fit.nulldev == pytest.approx(2 * loss.sum(), rel=1e-10)


def test_multinomial_null_deviance():
    """Centered log-proportions null model (reference src/families.h:262-285)."""
    x, y = random_data(n=150, p=4, family="multinomial", n_classes=3, seed=4)
    fit = st.fit(x, y, family="multinomial", nlambda=5, dtype=np.float64)
    onehot = np.eye(3)[y.astype(int)]
    prop = onehot.mean(0)
    lp0 = np.log(prop) - np.log(prop).mean()
    lse = np.log(np.exp(lp0).sum())
    loss = lse - onehot @ lp0
    assert fit.nulldev == pytest.approx(2 * loss.sum(), rel=1e-10)


def test_mgaussian_null_deviance():
    x, y = random_data(n=120, p=4, family="mgaussian", seed=5)
    fit = st.fit(x, y, family="mgaussian", nlambda=5, dtype=np.float64)
    expected = np.sum((y - y.mean(0)) ** 2)
    assert fit.nulldev == pytest.approx(expected, rel=1e-10)


def test_deviance_consistent_with_dev_ratio():
    """deviance() = (1 - dev_ratio) * nulldev and decreases along the path
    (reference R/deviance.sgdnet.R:33-35, test-deviance.R:88-99)."""
    for family in ["gaussian", "binomial"]:
        x, y = random_data(n=120, p=5, family=family, seed=6)
        fit = st.fit(x, y, family=family, nlambda=10, dtype=np.float64)
        dev = fit.deviance()
        np.testing.assert_allclose(dev, (1 - fit.dev_ratio) * fit.nulldev, rtol=1e-10)
        assert dev[0] == pytest.approx(fit.nulldev, rel=0.05)  # null-ish at lambda_max
        assert np.all(np.diff(dev) <= 1e-6 * fit.nulldev)


def test_cv_deviance_delegates_to_winning_fit():
    """CvFit.deviance == deviance of the winning full-data fit
    (reference R/deviance.sgdnet.R:39-41)."""
    from tests.helpers import random_data

    x, y = random_data(80, 5, seed=30)
    cv = st.cv_fit(x, y, nfolds=3, nlambda=6, thresh=1e-4)
    np.testing.assert_allclose(cv.deviance(), cv.fit.deviance())
    assert cv.deviance().shape == (6,)
